package graft

import java.nio.file.Files

import graft.api.RestServer
import graft.core.GraphIO
import graft.tools.GraphImporterCli
import graft.tools.GraphImporterCli.Args

/** graph-import tool port (reference GraphImporter.java): file → staging
  * store in both modes — bucketed-parquet local staging and the REST
  * /import + /prepare path against a live server. */
class ImporterSpec extends SparkSpec {

  private def writeTemp(lines: Seq[String], suffix: String): String = {
    val f = Files.createTempFile("graft-import", suffix)
    Files.writeString(f, lines.mkString("\n"))
    f.toFile.deleteOnExit()
    f.toString
  }

  test("local mode stages a bucketed graph that round-trips") {
    val ef = writeTemp(Seq("1 2 12", "2 3 23", "3 1 31"), ".edges")
    val vf = writeTemp(Seq("1 10", "2 20", "3 30"), ".vertices")
    val name = s"imp_${System.nanoTime()}"
    try {
      val g = GraphImporterCli.importLocal(spark,
        Args(edgesFile = ef, verticesFile = Some(vf), name = name, buckets = 2))
      assert(g.vertices.count() === 3)
      val loaded = GraphIO.loadBucketed(spark, name)
      assert(loaded.edges.count() === 3)
      assert(loaded.vertices.count() === 3)
    } finally Seq("edges", "vertices").foreach(s =>
      // managed tables: DROP also deletes the warehouse dir — without this
      // every suite run leaked an imp_<nanotime> table pair
      spark.sql(s"DROP TABLE IF EXISTS ${name}_$s"))
  }

  test("rest mode imports and prepares through a live server") {
    val srv = new RestServer(spark).start()
    try {
      val ef = writeTemp((0 until 9).map(i => s"$i ${i + 1} 1.0"), ".edges")
      val out = GraphImporterCli.importViaRest(Args(edgesFile = ef,
        name = "cli", partitions = 2,
        rest = Some(s"http://127.0.0.1:${srv.boundPort}")))
      assert(out.contains("\"edges\":9"))
    } finally srv.stop()
  }

  test("argument parsing rejects unknown flags and requires edges") {
    intercept[IllegalArgumentException](GraphImporterCli.parse(Seq("--bogus", "x")))
    intercept[IllegalArgumentException](GraphImporterCli.parse(Seq.empty))
    val a = GraphImporterCli.parse(Seq("--edgesFile", "e", "--buckets", "4"))
    assert(a.buckets === 4 && a.edgesFile === "e")
  }
}

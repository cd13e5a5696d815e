package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev tool: write `.explain("formatted")` for named queries (or drills,
  * prefixed `drill:`) to `<outDir>/<name>_<tag>.txt` — the plan-shape
  * evidence the optimization rounds commit under plans/. Usage:
  *
  *   runMain graft.tools.ExplainDump <sfDir> <outDir> <tag> <query ...>
  *
  * Plans are captured WITHOUT executing the query (initial AQE plan). */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1); val tag = args(2)
    val names = args.drop(3).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val drills = SparkEntry.scaleDrill.toMap
    names.foreach { name =>
      val fn = if (name.startsWith("drill:"))
        drills.get(name.stripPrefix("drill:"))
      else SparkEntry.queries.get(name)
      fn match {
        case None => println(s"[explain] $name UNKNOWN")
        case Some(f) =>
          try {
            val plan = f(spark, sfDir).queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            val file = name.replace(':', '_') + s"_$tag.txt"
            Files.writeString(Paths.get(outDir, file), plan)
            println(s"[explain] wrote $outDir/$file (${plan.length} chars)")
          } catch { case scala.util.control.NonFatal(e) =>
            println(s"[explain] $name FAILED: ${e.getMessage}")
          }
      }
    }
    spark.stop()
  }
}

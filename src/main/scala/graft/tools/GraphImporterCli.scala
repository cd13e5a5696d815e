package graft.tools

import java.net.{URI, URLEncoder}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Paths

import org.apache.spark.sql.SparkSession

import graft.core.{GraphIO, KGraph}

/**
 * Graph import CLI — the Spark port of the reference's graph-import tool
 * (kafka-graphs-rest-app .../tools/importer/GraphImporter.java): the
 * reference parses local vertex/edge files and produces them to the
 * cluster's staging topics; here the staging store is bucketed parquet
 * (shuffle-free joins on load), and `--rest` posts the edge file to a
 * running RestServer's /import + /prepare verbs instead (the REST
 * importGraph path, GraphAlgorithmHandler.java:119-251).
 *
 * usage: runMain graft.tools.GraphImporterCli --edgesFile F [options]
 *   --edgesFile F       whitespace "src dst [value]" lines (required)
 *   --verticesFile F    whitespace "id value" lines (optional)
 *   --name G            staged graph name            (default "imported")
 *   --buckets N         bucket count for the parquet store (default 8)
 *   --rest URL          POST to a RestServer instead of writing parquet
 *   --partitions N      co-partitioning for REST prepare (default 8)
 */
object GraphImporterCli {

  case class Args(edgesFile: String = null, verticesFile: Option[String] = None,
                  name: String = "imported", buckets: Int = 8,
                  rest: Option[String] = None, partitions: Int = 8)

  def parse(argv: Seq[String]): Args = {
    def loop(a: Args, rest: List[String]): Args = rest match {
      case "--edgesFile" :: v :: t    => loop(a.copy(edgesFile = v), t)
      case "--verticesFile" :: v :: t => loop(a.copy(verticesFile = Some(v)), t)
      case "--name" :: v :: t         => loop(a.copy(name = v), t)
      case "--buckets" :: v :: t      => loop(a.copy(buckets = v.toInt), t)
      case "--rest" :: v :: t         => loop(a.copy(rest = Some(v)), t)
      case "--partitions" :: v :: t   => loop(a.copy(partitions = v.toInt), t)
      case Nil                        => a
      case other :: _ =>
        throw new IllegalArgumentException(s"unknown argument $other")
    }
    val a = loop(Args(), argv.toList)
    require(a.edgesFile != null, "--edgesFile is required")
    a
  }

  /** REST mode: ship the edge lines to /import, then co-partition. The file
    * streams from disk (the reference importer streams records too — a
    * multi-GB edge file must not be materialized as one String) and the
    * graph name is URL-encoded (spaces/&/# would otherwise split the query
    * string). */
  def importViaRest(a: Args): String = {
    val client = HttpClient.newHttpClient()
    val name = URLEncoder.encode(a.name, UTF_8)
    val imp = client.send(
      HttpRequest.newBuilder(URI.create(
          s"${a.rest.get}/import?name=$name&type=edges"))
        .POST(HttpRequest.BodyPublishers.ofFile(Paths.get(a.edgesFile)))
        .build(),
      HttpResponse.BodyHandlers.ofString())
    require(imp.statusCode() == 200, s"import failed: ${imp.body()}")
    val prep = client.send(
      HttpRequest.newBuilder(URI.create(
          s"${a.rest.get}/prepare?name=$name&partitions=${a.partitions}"))
        .POST(HttpRequest.BodyPublishers.noBody()).build(),
      HttpResponse.BodyHandlers.ofString())
    require(prep.statusCode() == 200, s"prepare failed: ${prep.body()}")
    imp.body()
  }

  /** Local mode: parse with the GraphIO loaders, stage as bucketed parquet. */
  def importLocal(spark: SparkSession, a: Args): KGraph = {
    val edges = GraphIO.readEdges(spark, a.edgesFile)
    val vertices = a.verticesFile.map(GraphIO.readVertices(spark, _))
    val g = vertices match {
      case Some(v) => KGraph(v, edges)
      case None    => KGraph.fromEdges(edges, identity)
    }
    GraphIO.saveBucketed(g, a.name, a.buckets)
    g
  }

  def main(argv: Array[String]): Unit = {
    val a = parse(argv.toIndexedSeq)
    a.rest match {
      case Some(_) =>
        println(importViaRest(a))
      case None =>
        val spark = SparkSession.builder()
          .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[4]"))
          .config("spark.sql.shuffle.partitions", "8")
          .config("spark.ui.enabled", "false")
          .getOrCreate()
        spark.sparkContext.setLogLevel("WARN")
        val g = importLocal(spark, a)
        println(s"imported ${a.name}: vertices=${g.vertices.count()} edges=${g.edges.count()}")
        spark.stop()
    }
  }
}

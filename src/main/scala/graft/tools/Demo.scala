package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.algos.GraphAlgorithms
import graft.core.KGraph

/** Smoke driver: exercises the public API end-to-end on the driver-provided
  * testdata (supplier→part graph derived from lineitem). */
object Demo {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-demo")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val edges = li.groupBy(col("l_suppkey").as("src"), (col("l_partkey") + 1000000L).as("dst"))
      .agg(min(col("l_quantity")).as("value"))
    val g = KGraph.fromEdges(edges, id => id)

    println(s"vertices=${g.vertices.count()} edges=${g.edges.count()}")
    println("outDegrees top5:")
    g.outDegrees.orderBy(desc("value")).show(5, false)
    val wcc = GraphAlgorithms.wcc(g)
    println(s"wcc components=${wcc.select(col("value")).distinct().count()}")
    val pr = GraphAlgorithms.pageRank(g, tolerance = 0.001)
    println("pagerank top5:")
    pr.orderBy(desc("value")).show(5, false)
    println(s"globalTriangles=${GraphAlgorithms.globalTriangleCount(g)}")
    spark.stop()
  }
}

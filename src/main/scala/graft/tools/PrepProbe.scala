package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.algos.GraphAlgorithms
import graft.core.KGraph

/** Dev tool: stage split of the co-purchase prepare path that g_lcc (the
  * first intersection-family query in a session) pays — graph build vs
  * neighborhood prepare vs the LCC query itself. */
object PrepProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prep] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")
    lineitem.count()
    val byOrder = lineitem
      .groupBy(col("l_orderkey")).agg(array_sort(collect_set(col("l_partkey"))).as("ps"))
    val pairs = time("saltedPairs+distinct") {
      graft.core.SkewUtils.saltedPairs(byOrder, "ps", 512)
        .distinct().withColumn("value", lit(1L)).localCheckpoint(true)
    }
    println(s"[prep] edges=${pairs.count()}")
    val g = time("fromEdges+cp(vertices)") {
      val g0 = KGraph.fromEdges(pairs, id => id)
      KGraph(g0.vertices.localCheckpoint(true), g0.edges)
    }
    val p = time("prepareNeighborhood") { GraphAlgorithms.prepareNeighborhood(g) }
    time("lcc") {
      GraphAlgorithms.localClusteringCoefficient(g, p).count()
    }
    time("triangles") { GraphAlgorithms.globalTriangleCount(p) }
    time("jaccard") {
      GraphAlgorithms.jaccard(p, conversionEnabled = false).count()
    }
    spark.stop()
  }
}

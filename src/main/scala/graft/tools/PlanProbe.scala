package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.algos.GraphAlgorithms
import graft.functions.GraphSetExpressions

/** Dev tool: time + plan-summarize the triangle-family building blocks on
  * the co-purchase graph (join strategies, exchange counts). */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val e0 = lineitem
      .groupBy(col("l_orderkey")).agg(array_sort(collect_set(col("l_partkey"))).as("ps"))
      .select(explode(GraphSetExpressions.arrayPairs(col("ps"))).as("p"))
      .select(col("p.src").as("src"), col("p.dst").as("dst")).distinct()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[plan] $label%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val e = time("build+checkpoint") {
      e0.select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b")).distinct().localCheckpoint(true)
    }
    val adj = e.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(e.select(col("b").as("src"), col("a").as("dst")))
      .groupBy(col("src")).agg(array_sort(collect_set(col("dst"))).as("nbrs"))
    val joined = e
      .join(adj.select(col("src").as("a"), col("nbrs").as("na")), Seq("a"))
      .join(adj.select(col("src").as("b"), col("nbrs").as("nb")), Seq("b"))
    val cnt = joined.agg(sum(GraphSetExpressions
      .sortedIntersectCount(col("na"), col("nb")).cast("long")).as("s"))
    for (rep <- 1 to 3) time(s"intersect agg rep$rep") { cnt.head() }
    val ex = cnt.queryExecution.executedPlan.toString
    ex.linesIterator.filter(l => l.contains("Join") || l.contains("Exchange"))
      .map(_.trim.replaceAll("\\[plan_id=\\d+\\]", "").take(110))
      .foreach(l => println(s"[plan]   $l"))
    spark.stop()
  }
}

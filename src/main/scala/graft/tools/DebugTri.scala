package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: stage timings for the co-purchase triangle/similarity trio. */
object DebugTri {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[dbg] $label%-20s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val e = li.toDF("ok", "p1").join(li.toDF("ok", "p2"), Seq("ok"))
      .filter(col("p1") < col("p2"))
      .select(col("p1").as("src"), col("p2").as("dst")).distinct()
    val n = time("copurchase")(e.count())
    println(s"[dbg] edges=$n")
    val can = e.select(least(col("src"), col("dst")).as("a"), greatest(col("src"), col("dst")).as("b")).distinct()
      .localCheckpoint(true)
    val adj = can.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(can.select(col("b").as("src"), col("a").as("dst")))
      .groupBy(col("src")).agg(array_sort(collect_set(col("dst"))).as("nbrs"))
    time("adjacency")(adj.count())
    val common = can
      .join(adj.select(col("src").as("a"), col("nbrs").as("na")), Seq("a"))
      .join(adj.select(col("src").as("b"), col("nbrs").as("nb")), Seq("b"))
      .select(col("a"), col("b"), array_intersect(col("na"), col("nb")).as("common"))
    time("intersect+count")(common.agg(sum(size(col("common")))).head())
    val deg = adj.select(col("src"), size(col("nbrs")).as("d"))
    time("deg")(deg.count())
    spark.stop()
  }
}

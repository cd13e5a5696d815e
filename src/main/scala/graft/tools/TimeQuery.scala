package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time individual SparkEntry queries.
  * usage: runMain graft.tools.TimeQuery <sfDir> <query>[,<query>...] [reps]
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val reps = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup
    graft.SparkEntry.queries("q3_top_customers")(spark, sfDir).count()
    val explain = sys.env.get("SPARK_GRAFT_EXPLAIN").exists(_ == "1")
    for (_ <- 1 to reps; name <- names) {
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      if (explain) { println(s"==== $name ===="); df.explain("formatted") }
      val n = df.count()
      println(f"[time] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    spark.stop()
  }
}

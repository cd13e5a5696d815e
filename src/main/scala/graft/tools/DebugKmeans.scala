package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: where does g_kmeans_clusters spend its time? */
object DebugKmeans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.algos.compute.AdvancedAlgorithms.{KMeans, KMeansValue}
    import graft.pregel.Pregel

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[dbg] $label%-16s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }

    val sc = spark.sparkContext
    val pts = time("collect") {
      spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select(col("vec_id"), col("embedding").cast("array<double>"))
        .collect().map(r => (r.getLong(0), KMeansValue(r.getSeq[Double](1).toVector, 0)))
    }
    val init = pts.sortBy(_._1).take(4).map(_._2.coords).toSeq
    val res = time("pregel") {
      val r = Pregel.run(spark,
        new KMeans(k = 4, maxIterations = 8, initialCenters = Some(init)),
        sc.parallelize(pts.toSeq), sc.parallelize(Seq.empty[(Long, (Long, Double))]),
        numPartitions = 8, maxIterations = 10, checkpointInterval = sys.env.getOrElse("CPI", "10").toInt)
      r.vertices.count(); r
    }
    println(s"[dbg] supersteps=${res.superstep} state=${res.state}")
    import spark.implicits._
    time("toDF")(res.vertices.map { case (id, v) => (id, v.clusterId) }.toDF("vec_id", "cluster").count())
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.pipeline.Dedup

/** Dev tool: stage-by-stage timing of the simhash dedup pipeline. */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count()

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    for (rep <- 1 to 2) {
      println(s"--- rep $rep ---")
      val spreadDocs = docs.repartition(32)
      time("tokenHashes(poly)") {
        spreadDocs.select(col("doc_id").as("id"),
          Dedup.simHashTokenHashes(col("text"), poly = true).as("hs")).count()
      }
      val withSh = spreadDocs.select(col("doc_id").as("id"),
        Dedup.simHashTokenHashes(col("text"), poly = true).as("hs"))
        .select(col("id"), Dedup.simHashFromHashes(col("hs")).as("sh"))
      time("simhash64") { withSh.count() }
      val p = withSh.persist(StorageLevel.MEMORY_AND_DISK)
      time("persist+count") { p.count() }
      val chunked = p.select(col("id"), col("sh"), posexplode(
        transform(sequence(lit(0), lit(3)),
          c => call_function("shiftright", col("sh"), c * 16).bitwiseAND(lit(0xFFFFL)))))
        .toDF("id", "sh", "chunk", "ckey")
      val l = chunked.select(col("id").as("a"), col("sh").as("shA"), col("chunk"), col("ckey"))
      val r = chunked.select(col("id").as("b"), col("sh").as("shB"), col("chunk"), col("ckey"))
      val pairs0 = l.join(r, Seq("chunk", "ckey")).filter(col("a") < col("b"))
        .select(col("a"), col("b"), col("shA"), col("shB")).distinct()
      time("chunk join+distinct") { pairs0.count() }
      val pairs = pairs0
        .withColumn("hamming", bit_count(col("shA").bitwiseXOR(col("shB"))))
        .filter(col("hamming") <= 3)
        .select(col("a").as("src"), col("b").as("dst"), col("hamming").cast("double").as("value"))
      time("hamming filter") { pairs.count() }
      time("wcc clusters") {
        Dedup.clustersFromPairs(docs.select(col("doc_id").as("id")), pairs).count()
      }
      p.unpersist()
    }
    spark.stop()
  }
}

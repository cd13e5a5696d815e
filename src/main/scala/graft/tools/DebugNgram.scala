package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: stage-by-stage timing of ngramJaccardPairs. */
object DebugNgram {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.pipeline.Dedup

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[dbg] $label%-20s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    time("read+count")(docs.count())
    val sh = docs.select(col("doc_id").as("id"), Dedup.normTokens(col("text")).as("toks"))
      .select(col("id"), Dedup.shinglesFromTokens(col("toks"), 3).as("sh"))
      .filter(size(col("sh")) >= 1)
    time("shingles")(sh.count())
    val inv = sh.select(col("id"), explode(col("sh")).as("g"))
      .select(col("id"), xxhash64(col("g")).as("g"))
    time("inv")(inv.count())
    val common = inv.toDF("a", "g").join(inv.toDF("b", "g"), Seq("g"))
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("common"))
    time("common")(common.count())
    val full = Dedup.ngramJaccardPairs(docs, threshold = 0.1)
    time("full")(full.count())
    time("full2")(full.count())
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Dev tool: stage-by-stage timing of the edit-distance similarity join. */
object EditProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val (q, k) = (5, 8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    for (rep <- 1 to 2) {
      println(s"--- rep $rep ---")
      val base = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id").as("id"), col("text").as("txt"))
        .withColumn("len", length(col("txt")))
        .repartition(32)
        .persist(StorageLevel.MEMORY_AND_DISK)
      time("base")(base.count())
      val multiset = base.filter(col("len") >= q)
        .select(col("id"), explode(expr(
          s"transform(sequence(1, len - ${q - 1}), i -> xxhash64(substring(txt, i, $q)))")).as("gh"))
        .groupBy(col("id"), col("gh")).agg(count(lit(1)).as("c"))
        .select(col("id"), explode(expr(
          "transform(sequence(1, CAST(c AS INT)), o -> xxhash64(gh, o))")).as("h"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      time("multiset")(multiset.count())
      val dfreq = multiset.groupBy(col("h")).agg(count(lit(1)).as("df"))
      time("dfreq")(dfreq.count())
      val pref = multiset.join(dfreq, "h")
        .groupBy(col("id"))
        .agg(sort_array(collect_list(struct(col("df"), col("h")))).as("o"))
        .select(col("id"),
          expr(s"transform(slice(o, 1, ${q * k + 1}), x -> x.h)").as("ph"))
        .join(base.select(col("id"), col("len")), Seq("id"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      time("pref")(pref.count())
      val prefExpl = pref
        .select(col("id"), col("len"), explode(col("ph")).as("h"))
      val gramCand = prefExpl.toDF("a", "lenA", "h")
        .join(prefExpl.toDF("b", "lenB", "h"), Seq("h"))
        .filter(col("a") < col("b") &&
          abs(col("lenA") - col("lenB")) <= k)
        .select(col("a"), col("b"))
      time("gramCand-raw")(gramCand.count())
      val dedup = gramCand.distinct().persist(StorageLevel.MEMORY_AND_DISK)
      time("gramCand-distinct")(dedup.count())
      val verified = dedup
        .join(base.select(col("id").as("a"), col("txt").as("ta")), Seq("a"))
        .join(base.select(col("id").as("b"), col("txt").as("tb")), Seq("b"))
        .select(col("a"), col("b"),
          levenshtein(col("ta"), col("tb"), k).cast("long").as("lev"))
        .filter(col("lev") >= 0 && col("lev") <= k)
      time("verify")(verified.count())
      base.unpersist(); multiset.unpersist(); pref.unpersist(); dedup.unpersist()
    }
    spark.stop()
  }
}

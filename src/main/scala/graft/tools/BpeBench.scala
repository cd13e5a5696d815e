package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Micro-bench for [[graft.pipeline.TextAnalysis.bpeLearn]]: wall time and
  * Spark job counts for an `iters`-merge vocabulary over the `documents`
  * table. `mode` selects the production hybrid loop (`hybrid`, the library
  * path) or an inline replica of the pre-r10 recount-every-merge loop
  * (`naive`) — the jobs-per-merge / shuffle-per-merge comparison behind the
  * incremental-maintenance change. Both print the same merge table; any
  * divergence is a bug.
  *
  * Usage: runMain graft.tools.BpeBench <sfDir> [iters] [hybrid|naive]
  */
object BpeBench {

  /** The pre-r10 loop: one full corpus-pair shuffle + argmax per merge. */
  private def naiveLearn(docs: DataFrame, iters: Int): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val spark = docs.sparkSession
    val norm = regexp_replace(lower(trim(col("text"))), "\\s+", " ")
    var state = docs.filter(col("text").isNotNull)
      .select(graft.functions.BpeExpression.charSymbols(norm).as("tk"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var it = 1
    var done = false
    while (it <= iters && !done) {
      val top = state
        .select(explode(when(size(col("tk")) >= 2,
          transform(sequence(lit(0), size(col("tk")) - 2),
            i => struct(element_at(col("tk"), i + 1).as("l"),
              element_at(col("tk"), i + 2).as("r"))))).as("p"))
        .select(col("p.l").as("l"), col("p.r").as("r"))
        .filter(!col("l").contains("¶") && !col("r").contains("¶"))
        .groupBy(col("l"), col("r")).agg(count(lit(1)).as("cnt"))
        .orderBy(desc("cnt"), asc("l"), asc("r")).limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (l, r, cnt) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((it, l, r, l + r, cnt))
        val next = state
          .select(graft.functions.BpeExpression.mergePair(col("tk"), l, r).as("tk"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        next.count()
        state.unpersist()
        state = next
        it += 1
      }
    }
    state.unpersist()
    import spark.implicits._
    merges.toSeq.toDF("it", "lhs", "rhs", "merged", "cnt")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val iters = args.lift(1).map(_.toInt).getOrElse(32)
    val mode = args.lift(2).getOrElse("hybrid")
    val spark = SparkSession.builder()
      .master("local[" + sys.env.getOrElse("SPARK_GRAFT_CPUS", "4") + "]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count() // warm the scan
    val sc = spark.sparkContext
    val jobs0 = sc.statusTracker.getJobIdsForGroup(null).length
    val t0 = System.nanoTime()
    val merges =
      if (mode == "naive") naiveLearn(docs, iters)
      else graft.pipeline.TextAnalysis.bpeLearn(docs, iters)
    val n = merges.count()
    val secs = (System.nanoTime() - t0) / 1e9
    val jobs = sc.statusTracker.getJobIdsForGroup(null).length - jobs0
    println(f"[bpebench] mode=$mode iters=$iters merges=$n jobs=$jobs " +
      f"jobs/merge=${jobs.toDouble / math.max(n, 1)}%.2f total=$secs%.1f s")
    merges.show(8, truncate = false)
    spark.stop()
  }
}

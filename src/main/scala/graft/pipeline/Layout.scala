package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Data-layout operators: Z-order (Morton) clustering for multi-dimensional
 * data skipping. At 100 TB the dominant cost of a selective scan is files
 * read, not rows filtered — parquet min/max zone maps prune files only when
 * rows with nearby key values sit in the same file. A lexicographic sort
 * clusters the FIRST key only; interleaving the key bits (Morton order)
 * bounds every file to a small hyper-rectangle in ALL dimensions at once, so
 * a predicate on any of the interleaved columns prunes ~√-proportionally
 * rather than not at all (the technique behind clustering/Z-ORDER layout
 * features in modern lakehouse engines; Morton 1966).
 *
 * Everything here is integer Column arithmetic (codegen'd, oracle-
 * reproducible): explicit bucket bounds instead of sampled quantiles so the
 * layout is a pure function of the row — reruns, backfills, and cross-engine
 * checks all agree bit-for-bit.
 */
object Layout {

  /** Clamped fixed-bound bucketizer: maps `v` ∈ [lo, hi) to an integer
    * bucket in [0, 2^bits). Out-of-range values clamp to the edge buckets
    * (a layout must place every row somewhere; clamping keeps outliers from
    * poisoning the interleave resolution for everyone else). Double
    * arithmetic then floor — both steps IEEE-identical across engines. */
  def bucketize(v: Column, lo: Double, hi: Double, bits: Int): Column = {
    require(bits >= 1 && bits <= 20, "bits must be in [1, 20]")
    require(hi > lo, "hi must exceed lo")
    val nb = (1L << bits).toDouble
    val raw = floor((v.cast("double") - lit(lo)) * lit(nb) / lit(hi - lo))
    least(greatest(raw, lit(0.0)), lit(nb - 1.0)).cast("long")
  }

  /** Morton interleave of two bucket ids (each < 2^bits): bit i of `x`
    * lands at position 2i, bit i of `y` at 2i+1. Pure shift/and/or fold —
    * one codegen'd expression, no UDF. */
  def mortonCode(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 20, "bits must be in [1, 20]")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** Z-order layout assignment: buckets the two dimensions against their
    * declared bounds, interleaves, and derives the target file id by a
    * fixed right shift — file f holds exactly the Morton range
    * [f·2^s, (f+1)·2^s), i.e. a contiguous Z-curve segment whose bounding
    * box in (x, y) space is a small power-of-two tile. The shift-based
    * assignment is a pure function of the row (no sampling, no sort), so
    * incremental appends land in the same file partitions as the original
    * layout — the property that makes Z-order maintainable under ingest.
    * Adds (xbCol, ybCol, morton, file_id). */
  def zorderAssign(df: DataFrame, xCol: String, xLo: Double, xHi: Double,
                   yCol: String, yLo: Double, yHi: Double,
                   bits: Int = 8, fileBits: Int = 4): DataFrame = {
    require(fileBits >= 0 && fileBits <= 2 * bits, "fileBits out of range")
    val xb = bucketize(col(xCol), xLo, xHi, bits)
    val yb = bucketize(col(yCol), yLo, yHi, bits)
    df.withColumn("xb", xb).withColumn("yb", yb)
      .withColumn("morton", mortonCode(col("xb"), col("yb"), bits))
      .withColumn("file_id", shiftright(col("morton"), 2 * bits - fileBits))
  }

  /** Zone-map table for a file assignment: per file, row count and min/max
    * of each listed column — exactly the metadata a scan planner prunes
    * with (parquet row-group stats, externalized). Over a Z-ordered
    * assignment the boxes are provably small: with `fileBits` = 2f, a file
    * fixes the top f bits of BOTH dimensions, so each range spans at most
    * 2^(bits−f) buckets. One combinable aggregate; emit it after every
    * ingest batch and the skipping index is always current. */
  def zoneMaps(df: DataFrame, fileCol: String, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column to profile")
    val aggs = count(lit(1)).as("n") +: cols.flatMap(c =>
      Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max")))
    df.groupBy(col(fileCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Physically cluster by an existing morton column: range-shuffle into
    * `numFiles` output partitions and sort within each so parquet row-group
    * min/max stats are tight on BOTH interleaved dimensions. The shuffle is
    * one range exchange — the same cost as any global sort-write — and the
    * payoff is permanent for every future selective scan of the output. */
  def clusterWrite(df: DataFrame, mortonCol: String, numFiles: Int): DataFrame =
    df.repartitionByRange(numFiles, col(mortonCol))
      .sortWithinPartitions(col(mortonCol))
}

package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.{Dataset => ClassicDataset}

/**
 * Stats barrier for iterative driver loops — the one place this library
 * reaches into `private[sql]` internals (hence the package).
 *
 * Why it exists: `Dataset.localCheckpoint` cuts the EXECUTION lineage but
 * carries the origin plan's `Statistics` onto the resulting `LogicalRDD`
 * (`LogicalRDD.fromDataset` → `rewriteStatsAndConstraints`). Size-only
 * estimation multiplies child sizes at every join, so in an iterative
 * peel where round r+1's plan joins several relations all derived from
 * round r's checkpoint, the carried `sizeInBytes` COMPOUNDS
 * multiplicatively across rounds: digits(r+1) ≈ k · digits(r) with k =
 * (join fan-in referencing the previous checkpoint). By round ~6 of a
 * k-truss peel (k ≈ 15) the BigInteger has millions of digits and the
 * PLANNER spends minutes in Toom-Cook multiplication inside
 * `canBroadcastBySize` — observed as a single-core planning stall, no
 * tasks running.
 *
 * `freshLeaf` re-wraps an (already-checkpointed) DataFrame's physical
 * RDD as a new `LogicalRDD` WITHOUT origin stats: its size estimate
 * falls back to the constant `spark.sql.defaultSizeInBytes`, so
 * per-round planning cost is flat forever. The trade — losing real size
 * stats means the planner never AUTO-broadcasts such a frame — is
 * irrelevant in the loops that use this barrier: every broadcastable
 * join there carries an explicit `broadcast()`/`shuffle_hash` hint
 * decided from exact counts (`adjSide`/`degSide`).
 *
 * VERSION PIN: this is written against Spark 4.x's `private[sql]` class
 * layout (`org.apache.spark.sql.classic.Dataset`,
 * `internalCreateDataFrame`), and it deliberately discards constraints
 * and output ordering along with the stats (harmless for the hint-driven
 * loops that call it). `StatsBarrierSpec` asserts the major version and
 * the stats-reset behavior so a Spark upgrade fails loudly in the suite,
 * not silently at runtime.
 */
object StatsBarrier {

  /** Re-wrap `df`'s physical rows as a stats-free leaf. Call on a frame
    * whose plan is already materialized (a localCheckpoint): executing
    * the returned frame then just rescans the checkpoint blocks. */
  def freshLeaf(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[ClassicDataset[org.apache.spark.sql.Row]]
    ds.sparkSession.internalCreateDataFrame(
      ds.queryExecution.toRdd, ds.schema, isStreaming = false)
  }
}

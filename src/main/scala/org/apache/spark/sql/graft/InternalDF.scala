package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSession}
import org.apache.spark.sql.types.StructType

/**
 * InternalRow-level DataFrame ⇄ RDD bridge (the third sanctioned
 * `private[sql]` reach next to [[StatsBarrier]] and [[ScopedSession]]) for
 * the k-truss triangle sweep's cogroup-style formulation: the sweep reads a
 * keyed checkpoint's rows partition-aligned (`internalRdd` — partition i of
 * the returned RDD IS hashpartitioning partition i, a 1:1 mapping the
 * physical scan preserves) and hands partially-aggregated credit rows back
 * to Catalyst for the final combine (`ofRows` over `internalCreateDataFrame`
 * — RDDScanExec applies an UnsafeProjection, so reused GenericInternalRow
 * buffers from the RDD iterator are safe).
 */
object InternalDF {

  /** The DataFrame's execution RDD — same object on repeat calls (lazy val
    * on QueryExecution), partition indices identical to the plan's output
    * partitioning. InternalRows are REUSED buffers: extract primitives
    * before advancing the iterator. */
  def internalRdd(df: DataFrame): RDD[InternalRow] =
    df.asInstanceOf[ClassicDataset[Row]].queryExecution.toRdd

  /** Wrap an InternalRow RDD as a DataFrame of `schema`. */
  def ofInternalRows(spark: SparkSession, rdd: RDD[InternalRow],
                     schema: StructType): DataFrame =
    spark.asInstanceOf[ClassicSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = false)
}

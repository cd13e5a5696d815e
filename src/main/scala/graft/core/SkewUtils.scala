package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew mitigation for hot-key joins at 100 TB scale.
 *
 * AQE's skew-join handling splits oversized SORT-MERGE partitions
 * automatically, but (a) only for sort-merge joins and (b) only when stats
 * surface at runtime. `saltedJoin` is the explicit fallback for known-skewed
 * equi-joins (power-law graphs, frequent shingles): the hot side's key is
 * salted into `buckets` sub-keys and the small side is replicated per salt,
 * so a single hot key spreads over `buckets` tasks instead of one straggler.
 */
object SkewUtils {

  /** Inner equi-join of a skewed LEFT frame against a smaller RIGHT frame on
    * `key`, spreading each left key over `buckets` salted partitions and
    * replicating right rows per salt. Result ≡ left.join(right, key).
    *
    * The salt is xxhash64 over ALL left columns — a pure function of row
    * content — so task re-execution (fetch-failure retry, speculation)
    * re-derives the identical salt and the shuffle stays deterministic.
    * Identical duplicate rows share a salt; that only narrows spreading when
    * the hot key's rows are literal duplicates, in which case pre-aggregating
    * them is the right fix anyway. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 buckets: Int): DataFrame = {
    val salted = left.withColumn("_salt", pmod(xxhash64(left.columns.map(col).toIndexedSeq: _*), lit(buckets)).cast("int"))
    val replicated = right.withColumn("_salt", explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Top-`n` most frequent values of `key` with counts — the skew probe to
    * run before choosing `buckets` (drive by measurement, not guesswork). */
  def keyHistogram(df: DataFrame, key: String, n: Int = 20): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("cnt")).orderBy(desc("cnt")).limit(n)
}

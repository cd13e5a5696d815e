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

  /** All within-group ordered pairs (x, y), x before y, from per-group SORTED
    * DISTINCT item arrays — the co-occurrence pair expansion (items per
    * order/basket/document → co-occurrence edges) — SALTED: a group larger
    * than `chunk` items is O(k²) pairs, and unsalted a 10⁵-item mega-group
    * materializes its 5·10⁹ pairs in the single task holding the group row.
    * Here big groups explode into (ci ≤ cj) chunk-index pairs carrying only
    * the two C-item slices, a hash repartition spreads those rows across the
    * cluster, and THEN each row expands its ≤C² pairs (codegen'd ArrayPairs /
    * ArrayCrossPairs — contiguous slices of a sorted array, so cross-chunk
    * pairs are ordered by construction). Groups ≤ `chunk` skip the extra
    * shuffle entirely — at 100 TB the salt costs nothing until a group
    * actually needs it.
    *
    * Input: one row per group with `itemsCol: array<long>` sorted ascending.
    * Output: (src, dst) pair rows (not deduped across groups). */
  def saltedPairs(grouped: DataFrame, itemsCol: String, chunk: Int = 512): DataFrame = {
    import graft.functions.GraphSetExpressions.{arrayPairs, arrayCrossPairs}
    val ps = col(itemsCol)
    val small = grouped.filter(size(ps) <= chunk)
      .select(explode(arrayPairs(ps)).as("p"))
    val nChunks = ceil(size(ps) / chunk.toDouble).cast("int")
    val big = grouped.filter(size(ps) > chunk)
      .select(ps.as("_ps"),
        explode(flatten(transform(sequence(lit(0), nChunks - 1),
          ci => transform(sequence(ci, nChunks - 1),
            cj => struct(ci.as("ci"), cj.as("cj")))))).as("cc"))
      .select(col("cc.ci").as("ci"), col("cc.cj").as("cj"),
        slice(col("_ps"), col("cc.ci") * chunk + 1, lit(chunk)).as("xs"),
        slice(col("_ps"), col("cc.cj") * chunk + 1, lit(chunk)).as("ys"))
      // content-hash salt: deterministic under task retry/speculation
      .repartition(col("ci"), col("cj"), xxhash64(col("xs"), col("ys")))
      .select(explode(when(col("ci") === col("cj"), arrayPairs(col("xs")))
        .otherwise(arrayCrossPairs(col("xs"), col("ys")))).as("p"))
    small.unionByName(big)
      .select(col("p.src").as("src"), col("p.dst").as("dst"))
  }
}

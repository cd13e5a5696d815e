package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.algos.GraphAlgorithms
import graft.core.KGraph

/**
 * Deduplication operators for training-data pipelines: exact, MinHash+LSH,
 * SimHash, n-gram Jaccard verification, embedding-cosine near-dup.
 *
 * Scale design: every stage is a DataFrame expression (codegen'd higher-order
 * functions over shingle arrays — no Scala UDFs); candidate generation is
 * banded LSH so the only join is an equi-join on (band, signature) buckets —
 * never an all-pairs product; duplicate clusters come from connected
 * components over the candidate-pair graph (GraphAlgorithms.wcc), so at
 * 100 TB the whole flow is shuffles on hash keys with map-side combine.
 */
object Dedup {

  // -------------------------------------------------------------------------
  // Exact dedup
  // -------------------------------------------------------------------------

  /** Exact dedup on normalized text: keeps the row with the smallest `idCol`
    * per fingerprint. Hash-groupBy — one shuffle on a 64-bit key. */
  def exact(df: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val fp = TextAnalysis.fingerprint(col(textCol))
    spread(df).withColumn("_fp", fp)
      .groupBy(col("_fp"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_dups"))
      .drop("_fp")
  }

  /** Incremental exact dedup over a STREAMING corpus: the first-seen document
    * per normalized-content fingerprint survives; later duplicates are dropped
    * by Structured Streaming's stateful dropDuplicates. The seen-fingerprint
    * set lives in the state store, hash-partitioned across executors — never
    * driver memory — so a continuously-ingested 100 TB corpus dedups with the
    * same shuffle shape as the batch path.
    *
    * With `eventTime = Some((col, delay))` the stream is watermarked and
    * dropDuplicatesWithinWatermark bounds state: a fingerprint older than the
    * watermark is GC'd, trading unbounded-history dedup for bounded state —
    * the standard contract for unbounded streams. */
  def streamingExact(stream: DataFrame, textCol: String = "text",
                     eventTime: Option[(String, String)] = None): DataFrame =
    streamingDedupBy(stream, TextAnalysis.fingerprint(col(textCol)), eventTime)

  /** Incremental NEAR-dup dedup over a streaming corpus: drops later documents
    * whose 64-bit SimHash exactly equals an earlier one's (catches
    * whitespace/case rewrites and token reorderings that hash identically).
    * Same state-store mechanics as [[streamingExact]]. */
  def streamingSimHash(stream: DataFrame, textCol: String = "text",
                       eventTime: Option[(String, String)] = None): DataFrame =
    streamingDedupBy(stream, simHash(col(textCol), poly = true), eventTime)

  /** Batch analog of [[streamingExact]]: the rows that SURVIVE streaming
    * first-seen dedup when arrival order = ascending `idCol` — the
    * minimum-id row per content fingerprint, all columns intact. This is
    * the oracle gate for the streaming operator (PipelineSpec asserts the
    * MemoryStream output of streamingExact, fed in id order, equals exactly
    * this frame). Shape: one hash-groupBy on the 64-bit fingerprint + a
    * left-semi join back, co-partitioned on the same key — no window. */
  def firstSeen(df: DataFrame, idCol: String = "doc_id",
                textCol: String = "text"): DataFrame = {
    val keyed = spread(df)
      .withColumn("_fp", TextAnalysis.fingerprint(col(textCol)))
    val firsts = keyed.groupBy(col("_fp")).agg(min(col(idCol)).as(idCol))
    keyed.join(firsts, Seq("_fp", idCol), "left_semi").drop("_fp")
  }

  private def streamingDedupBy(stream: DataFrame, key: Column,
                               eventTime: Option[(String, String)]): DataFrame = {
    val keyed = stream.withColumn("_dk", key)
    val out = eventTime match {
      case Some((tsCol, delay)) =>
        keyed.withWatermark(tsCol, delay).dropDuplicatesWithinWatermark("_dk")
      case None => keyed.dropDuplicates("_dk")
    }
    out.drop("_dk")
  }

  /** Retention-policy exact dedup: per normalized-content group keep the
    * LARGEST document (max `sizeCol`, ties → smallest `idCol`) — the common
    * curation policy of retaining the best representative rather than the
    * first-seen one. Same one-shuffle hash-groupBy shape as [[exact]]; the
    * argmax rides a struct-max aggregate so map-side combine applies. */
  def exactKeepBest(df: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text", sizeCol: String = "n_chars"): DataFrame = {
    val fp = TextAnalysis.fingerprint(col(textCol))
    spread(df).withColumn("_fp", fp)
      .groupBy(col("_fp"))
      .agg(
        max(struct(col(sizeCol).cast("long").as("c"), (-col(idCol)).as("ni"))).as("_m"),
        count(lit(1)).as("n_dups"))
      .select((-col("_m.ni")).as(idCol), col("_m.c").as("kept_chars"), col("n_dups"))
  }

  // -------------------------------------------------------------------------
  // Shingles + MinHash
  // -------------------------------------------------------------------------

  /** Normalized whitespace tokens (lowercase, collapsed spaces). */
  def normTokens(text: Column): Column =
    split(regexp_replace(lower(trim(text)), "\\s+", " "), " ")

  /** Shingles from an ALREADY-TOKENIZED array column: one codegen'd pass
    * (graft.functions.ShingleExpression) — same result as the declarative
    * HOF formulation below, which `PipelineSpec` keeps as the equivalence
    * oracle. Docs with fewer than n tokens yield an EMPTY array. */
  def shinglesFromTokens(toks: Column, n: Int): Column =
    graft.functions.ShingleExpression.wordShingles(toks, n)

  /** Declarative reference formulation of `shinglesFromTokens` (interpreted
    * HOFs; kept for the equivalence spec + as documentation of semantics). */
  private[graft] def shinglesFromTokensHof(toks: Column, n: Int): Column = {
    val full = array_distinct(
      filter(
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n)))),
        s => length(s) > 0))
    // docs with fewer than n tokens yield an EMPTY array (no truncated
    // shingle) — keeps Spark and the SQL oracles agreeing on short docs
    when(size(toks) >= n, full).otherwise(array().cast("array<string>"))
  }

  /** Distinct word n-gram shingles of normalized text, as array<string>. */
  def wordShingles(text: Column, n: Int = 3): Column =
    shinglesFromTokens(normTokens(text), n)

  /** (id, sh) with tokenization staged in its own projection (run once). */
  private def shingled(docs: DataFrame, idCol: String, textCol: String,
                       n: Int): DataFrame =
    docs.select(col(idCol).as("id"), normTokens(col(textCol)).as("toks"))
      .select(col("id"), shinglesFromTokens(col("toks"), n).as("sh"))

  /** Spread a degenerate-partitioned input (e.g. a one-row-group parquet
    * file) across the cluster BEFORE per-row-expensive expression work —
    * otherwise the whole shingle/hash pipeline runs in a single task. No-op
    * when the source already has reasonable parallelism (the 100 TB case:
    * never pay an extra shuffle there). */
  private[pipeline] def spread(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 >= p) df else df.repartition(p)
  }

  /** Keeper-ordinal pack `(id << posBits) + pos` with a LOUD overflow
    * guard: a position that would bleed into the id bits raises instead of
    * silently electing a wrong keeper (the gram_n-stamp fail-loudly
    * convention — the scaladoc'd "~1M-token limit" is now enforced, not
    * advisory). The id is cast to long BEFORE the shift: an IntegerType id
    * column would shift at Int width and overflow at id 2^(32-posBits). */
  private[graft] def packOrd(id: Column, pos: Column, posBits: Int): Column =
    when(pos.cast("long") < lit(1L << posBits),
      shiftleft(id.cast("long"), posBits) + pos.cast("long"))
      .otherwise(raise_error(concat(
        lit(s"ordinal pack overflow: position "), pos.cast("string"),
        lit(s" >= 2^$posBits — document exceeds the $posBits-bit position" +
          " pack; chunk it (chunkDocuments) before dedup"))))

  /** MinHash signature: k per-slot minima over the shingle set, computed by
    * the one-pass codegen'd expression (graft.functions.MinHashExpression —
    * Carter–Wegman h1 + i·h2 family). array<bigint> of numHashes. */
  def minHashSignature(shingles: Column, numHashes: Int = 64,
                       poly: Boolean = false): Column =
    graft.functions.MinHashExpression.minHashSignature(shingles, numHashes, poly)

  /** (id, band, bucket) LSH band-bucket rows of a signature frame — the
    * candidate-generation key material, shared by the in-flight join
    * ([[lshCandidates]]) and the persisted index ([[saveLshIndex]]).
    * `poly = true` → the band bucket is a base-31 Horner fold of the band's
    * slots seeded with band+1 (wraparound Long = mod 2^64): slot values are
    * already uniform 64-bit so the bucket only needs injectivity-ish mixing,
    * and the fold is reproducible in the external SQL oracle. */
  private[pipeline] def bandedBuckets(df: DataFrame, idCol: String, sigCol: String,
                                      bands: Int, rowsPerBand: Int,
                                      poly: Boolean): DataFrame = {
    val buckets: Column =
      if (poly) graft.functions.MinHashExpression.bandBuckets(col("sig"), bands, rowsPerBand)
      else transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(b, slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))))
    df.select(col(idCol).as("id"), col(sigCol).as("sig"))
      .select(col("id"), posexplode(buckets))
      .toDF("id", "band", "bucket")
  }

  /** Banded LSH candidate pairs: signature split into `bands` bands of
    * `rowsPerBand` rows; docs sharing any band bucket become a candidate
    * pair (a < b). One equi-join on (band, bandHash). */
  def lshCandidates(df: DataFrame, idCol: String, sigCol: String,
                    bands: Int, rowsPerBand: Int, poly: Boolean = false): DataFrame = {
    val banded = bandedBuckets(df, idCol, sigCol, bands, rowsPerBand, poly)
    val l = banded.toDF("a", "band", "bucket")
    val r = banded.toDF("b", "band", "bucket")
    l.join(r, Seq("band", "bucket")).filter(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
  }

  /** Estimated Jaccard from two MinHash signatures (fraction of equal slots). */
  def estimatedJaccard(sigA: Column, sigB: Column): Column =
    size(filter(zip_with(sigA, sigB, (x, y) => x === y), b => b)).cast("double") /
      size(sigA)

  /**
   * MinHash+LSH near-dup clusters.
   * Returns (idCol, rep): every surviving doc maps to its cluster
   * representative (minimum id of its near-dup connected component).
   *
   * shingle→minhash→band→bucket-join→verify→connected-components.
   */
  def minHashLSH(df: DataFrame, idCol: String = "doc_id", textCol: String = "text",
                 shingleLen: Int = 3, numHashes: Int = 64, bands: Int = 16,
                 threshold: Double = 0.7, poly: Boolean = false): DataFrame = {
    val sigs = signatures(df, idCol, textCol, shingleLen, numHashes, poly)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val cands = lshCandidates(sigs, "id", "sig", bands, numHashes / bands, poly)
    val verified = verifiedPairs(cands, sigs, threshold)
    clustersFromPairs(df.select(col(idCol).as("id")), verified)
  }

  /** (id, sig) MinHash signature frame of docs with ≥1 shingle. */
  private def signatures(df: DataFrame, idCol: String, textCol: String,
                         shingleLen: Int, numHashes: Int,
                         poly: Boolean): DataFrame =
    shingled(spread(df), idCol, textCol, shingleLen)
      .filter(size(col("sh")) > 0)
      .select(col("id"), minHashSignature(col("sh"), numHashes, poly).as("sig"))

  /** Candidate (a, b) pairs verified by signature-estimated Jaccard ≥
    * threshold → (src, dst, value) near-dup edges. Pure pairwise filter:
    * composition over corpus splits is lossless (the incremental-index
    * correctness argument). */
  private def verifiedPairs(cands: DataFrame, sigs: DataFrame,
                            threshold: Double): DataFrame =
    cands
      .join(sigs.toDF("a", "sigA"), Seq("a"))
      .join(sigs.toDF("b", "sigB"), Seq("b"))
      .withColumn("jac", estimatedJaccard(col("sigA"), col("sigB")))
      .filter(col("jac") >= threshold)
      .select(col("a").as("src"), col("b").as("dst"), col("jac").as("value"))

  // -------------------------------------------------------------------------
  // Incremental LSH maintenance (production ingest loop)
  // -------------------------------------------------------------------------

  /** Build and PERSIST the MinHash-LSH maintenance index of a corpus
    * snapshot into the session catalog (the saveBucketed pattern,
    * core/GraphIO.scala:103-110, applied to the dedup index):
    * `<name>_bands` (id, band, bucket) bucketed AND sorted by the candidate
    * join key (band, bucket); `<name>_sigs` (id, sig) and
    * `<name>_clusters` (id, rep) bucketed by id.
    * [[incrementalMinHashLSH]] then folds deltas in without rescanning
    * base text or reshuffling the base side of any join — at 100 TB the
    * index streams from disk pre-partitioned while only the delta hashes
    * and shuffles. */
  def saveLshIndex(df: DataFrame, name: String,
                   idCol: String = "doc_id", textCol: String = "text",
                   shingleLen: Int = 3, numHashes: Int = 64, bands: Int = 16,
                   threshold: Double = 0.7, poly: Boolean = false,
                   buckets: Int = 32): Unit = {
    val spark = df.sparkSession
    Seq("bands", "sigs", "clusters", "meta")
      .foreach(s => replaceTable(spark, s"${name}_$s"))
    // Persist the build parameters: an incremental merge with different
    // shingle/hash/band/threshold settings would join garbage against the
    // base index, so incrementalMinHashLSH validates against this row.
    import spark.implicits._
    Seq((shingleLen, numHashes, bands, threshold, poly, buckets))
      .toDF("shingle_len", "num_hashes", "bands", "threshold", "poly", "buckets")
      .write.mode("overwrite").saveAsTable(s"${name}_meta")
    val sigs = signatures(df, idCol, textCol, shingleLen, numHashes, poly)
      .persist(StorageLevel.MEMORY_AND_DISK)
    bandedBuckets(sigs, "id", "sig", bands, numHashes / bands, poly)
      .write.mode("overwrite").bucketBy(buckets, "band", "bucket")
      .sortBy("band", "bucket").saveAsTable(s"${name}_bands")
    sigs.write.mode("overwrite").bucketBy(buckets, "id").sortBy("id")
      .saveAsTable(s"${name}_sigs")
    val cands = lshCandidates(sigs, "id", "sig", bands, numHashes / bands, poly)
    clustersFromPairs(df.select(col(idCol).as("id")),
        verifiedPairs(cands, sigs, threshold))
      .write.mode("overwrite").bucketBy(buckets, "id").sortBy("id")
      .saveAsTable(s"${name}_clusters")
    sigs.unpersist()
  }

  /** Drop `table` from the catalog AND delete its default warehouse location
    * if a stale directory survives the drop (a crashed writer, or a fresh
    * in-memory catalog meeting a previous session's output dir). Without
    * this, `bucketBy().mode("overwrite").saveAsTable` is NON-idempotent:
    * when the catalog doesn't know the table, "overwrite" takes the CREATE
    * path and dies with LOCATION_ALREADY_EXISTS on the orphaned directory —
    * so any ingest loop re-running [[saveLshIndex]] after a crash would
    * wedge permanently. */
  private[pipeline] def replaceTable(spark: org.apache.spark.sql.SparkSession,
                                     table: String): Unit = {
    // invalidate any cached file listing FIRST — a later read planned off
    // the stale cache would chase deleted part-files
    if (spark.catalog.tableExists(table)) spark.catalog.refreshTable(table)
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      table.toLowerCase(java.util.Locale.ROOT))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
  }

  /** Incremental MinHash-LSH maintenance — the ingest loop: fold a DELTA of
    * new documents (ids disjoint from the base snapshot) into a persisted
    * index ([[saveLshIndex]], same parameters) and return merged clusters
    * (id, rep) over base ∪ delta, EXACTLY equal to a full recompute over
    * the union: band bucketing and signature verification are pairwise, so
    * the union's pair set splits losslessly into base×base (already in the
    * index), delta×delta, and delta×base — and base connectivity folds in
    * as (id → rep) star edges, which have the same connected components as
    * the original base pair graph.
    *
    * Scale shape: only the delta is shingled/hashed/shuffled. Delta×delta
    * candidates come from the in-flight banded self-join; delta×base
    * candidates equi-join the delta's band rows against `<name>_bands` ON
    * ITS BUCKET KEY — the base side streams from disk pre-partitioned (no
    * exchange, no text rescan). Cluster merge is one WCC over (new verified
    * pairs + collapsed stars), never a corpus-wide rebuild. */
  def incrementalMinHashLSH(spark: org.apache.spark.sql.SparkSession,
                            name: String, delta: DataFrame,
                            idCol: String = "doc_id", textCol: String = "text",
                            shingleLen: Int = 3, numHashes: Int = 64,
                            bands: Int = 16, threshold: Double = 0.7,
                            poly: Boolean = false): DataFrame =
    incrementalMerge(spark, name, delta, idCol, textCol, shingleLen,
      numHashes, bands, threshold, poly)._1

  /** [[incrementalMinHashLSH]]'s body, ALSO returning the persisted delta
    * signatures so [[appendToLshIndex]] reuses them for its index writes
    * instead of re-shingling and re-hashing the whole delta a second time
    * (the returned clusters frame is LAZY and references the signatures —
    * the caller owns the unpersist, after its terminal action). */
  private def incrementalMerge(spark: org.apache.spark.sql.SparkSession,
                               name: String, delta: DataFrame,
                               idCol: String, textCol: String,
                               shingleLen: Int, numHashes: Int,
                               bands: Int, threshold: Double,
                               poly: Boolean): (DataFrame, DataFrame) = {
    val meta = spark.table(s"${name}_meta").head()
    require(meta.getAs[Int]("shingle_len") == shingleLen &&
        meta.getAs[Int]("num_hashes") == numHashes &&
        meta.getAs[Int]("bands") == bands &&
        meta.getAs[Double]("threshold") == threshold &&
        meta.getAs[Boolean]("poly") == poly,
      s"incrementalMinHashLSH('$name'): parameters differ from the ones the " +
        s"index was built with (saveLshIndex used shingleLen=" +
        s"${meta.getAs[Int]("shingle_len")}, numHashes=" +
        s"${meta.getAs[Int]("num_hashes")}, bands=${meta.getAs[Int]("bands")}, " +
        s"threshold=${meta.getAs[Double]("threshold")}, poly=" +
        s"${meta.getAs[Boolean]("poly")}) — delta band rows would join " +
        "garbage against the base index")
    val baseBands = spark.table(s"${name}_bands")
    val baseSigs = spark.table(s"${name}_sigs")
    val baseClusters = spark.table(s"${name}_clusters")
    val rowsPerBand = numHashes / bands
    val dSigs = signatures(delta, idCol, textCol, shingleLen, numHashes, poly)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val dd = lshCandidates(dSigs, "id", "sig", bands, rowsPerBand, poly)
    val db = bandedBuckets(dSigs, "id", "sig", bands, rowsPerBand, poly)
      .toDF("a", "band", "bucket")
      .join(baseBands.toDF("b", "band", "bucket"), Seq("band", "bucket"))
      .select(col("a"), col("b")).distinct()
    val verified =
      verifiedPairs(dd.unionByName(db), dSigs.unionByName(baseSigs), threshold)
    val stars = baseClusters.filter(col("id") =!= col("rep"))
      .select(col("id").as("src"), col("rep").as("dst"), lit(1.0).as("value"))
    val allIds = baseClusters.select(col("id"))
      .unionByName(delta.select(col(idCol).as("id")))
    (clustersFromPairs(allIds, verified.unionByName(stars)), dSigs)
  }

  /** COMMIT a delta into the persisted index — the ingest loop's write step,
    * [[incrementalMinHashLSH]]'s read-compute plus the index update: merged
    * clusters REPLACE `<name>_clusters`; the delta's band rows and
    * signatures APPEND to the bucketed `<name>_bands` / `<name>_sigs`
    * (an append to a bucketed table writes only the delta's own bucket
    * files — base files untouched, no index rewrite). After the call the
    * index describes base ∪ delta, so the NEXT delta folds against it the
    * same way: exactly the repeated-micro-batch maintenance a streaming
    * corpus needs (see the foreachBatch composition in PipelineSpec).
    * Returns the merged (id, rep) clusters. */
  def appendToLshIndex(spark: org.apache.spark.sql.SparkSession,
                       name: String, delta: DataFrame,
                       idCol: String = "doc_id", textCol: String = "text",
                       shingleLen: Int = 3, numHashes: Int = 64,
                       bands: Int = 16, threshold: Double = 0.7,
                       poly: Boolean = false): DataFrame = {
    val buckets = spark.table(s"${name}_meta").head().getAs[Int]("buckets")
    // eager localCheckpoint, not persist: DROP TABLE cascades cache
    // invalidation to every cached plan REFERENCING the table, so a merely
    // persisted `merged` would be evicted by the clusters replacement below
    // and recompute from the deleted files; the checkpoint cuts the lineage.
    // The merge's persisted delta signatures are REUSED for the index
    // writes below (one shingle+minhash pass per batch, not two) and
    // unpersisted at the end.
    val (mergedLazy, dSigs) = incrementalMerge(spark, name, delta, idCol,
      textCol, shingleLen, numHashes, bands, threshold, poly)
    val merged = mergedLazy.localCheckpoint(true)
    bandedBuckets(dSigs, "id", "sig", bands, numHashes / bands, poly)
      .write.mode("append").bucketBy(buckets, "band", "bucket")
      .sortBy("band", "bucket").saveAsTable(s"${name}_bands")
    dSigs.write.mode("append").bucketBy(buckets, "id").sortBy("id")
      .saveAsTable(s"${name}_sigs")
    replaceTable(spark, s"${name}_clusters")
    merged.write.mode("overwrite").bucketBy(buckets, "id").sortBy("id")
      .saveAsTable(s"${name}_clusters")
    merged.unpersist()
    dSigs.unpersist(false)
    // drop stale cached file listings so the NEXT delta's reads see the
    // appended/rewritten state
    Seq("bands", "sigs", "clusters")
      .foreach(s => spark.catalog.refreshTable(s"${name}_$s"))
    spark.table(s"${name}_clusters")
  }

  /** End-to-end near-dup curation: MinHash+LSH clusters, then the retention
    * policy of [[exactKeepBest]] applied per CLUSTER — keep the largest
    * member (ties → smallest id). Returns (idCol, kept_chars, n_members),
    * one row per near-dup cluster (singletons included). Cluster formation
    * is [[minHashLSH]]'s banded equi-join; retention adds one groupBy on the
    * cluster rep — no new scale surface. */
  def minHashKeepBest(df: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text", sizeCol: String = "n_chars",
                      shingleLen: Int = 3, numHashes: Int = 64, bands: Int = 16,
                      threshold: Double = 0.7, poly: Boolean = false): DataFrame =
    keepBestPerCluster(
      minHashLSH(df, idCol, textCol, shingleLen, numHashes, bands, threshold,
        poly).toDF(idCol, "rep"), df, idCol, sizeCol)

  /** [[minHashKeepBest]] with SimHash cluster formation — same retention
    * policy over the Hamming-distance near-dup clusters. */
  def simHashKeepBest(df: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text", sizeCol: String = "n_chars",
                      maxHamming: Int = 3, poly: Boolean = false): DataFrame =
    keepBestPerCluster(
      simHashDedup(df, idCol, textCol, maxHamming, poly).toDF(idCol, "rep"),
      df, idCol, sizeCol)

  /** Keep-largest retention over ANY (id, rep) cluster frame: per cluster,
    * the member with max `sizeCol` (ties → smallest id) survives, with the
    * member count. One groupBy on the cluster rep; argmax rides a struct-max
    * aggregate (map-side combine). */
  def keepBestPerCluster(clusters: DataFrame, docs: DataFrame,
                         idCol: String = "doc_id",
                         sizeCol: String = "n_chars"): DataFrame =
    clusters.join(docs.select(col(idCol), col(sizeCol)), Seq(idCol))
      .groupBy(col("rep"))
      .agg(
        max(struct(col(sizeCol).cast("long").as("c"), (-col(idCol)).as("ni"))).as("_m"),
        count(lit(1)).as("n_members"))
      .select((-col("_m.ni")).as(idCol), col("_m.c").as("kept_chars"),
        col("n_members"))

  /** Exact n-gram Jaccard similarity for given candidate pairs (a, b):
    * |S(a)∩S(b)| / |S(a)∪S(b)| over word shingles. */
  def ngramJaccardVerify(docs: DataFrame, pairs: DataFrame,
                         idCol: String = "doc_id", textCol: String = "text",
                         shingleLen: Int = 3): DataFrame = {
    val sh = docs.select(col(idCol).as("id"), wordShingles(col(textCol), shingleLen).as("sh"))
    pairs.toDF("a", "b")
      .join(sh.toDF("a", "shA"), Seq("a"))
      .join(sh.toDF("b", "shB"), Seq("b"))
      .select(col("a"), col("b"),
        (size(array_intersect(col("shA"), col("shB"))).cast("double") /
          size(array_union(col("shA"), col("shB")))).as("jaccard"))
  }

  /** Exact all-pairs n-gram Jaccard ≥ threshold via an INVERTED INDEX on
    * shingles: any pair with jaccard > 0 shares ≥1 shingle, so exploding
    * doc→shingle and self-joining on the shingle enumerates exactly the pairs
    * with nonzero intersection — never the full O(n²) product. Common counts
    * come out of the same join (one groupBy), sizes join in after.
    * At 100 TB this is the standard similarity-join plan: shuffle on shingle
    * hash, skew-prone frequent shingles can be dropped by `maxDocFreq`
    * (a shingle in >maxDocFreq docs contributes pairs that will be found via
    * their rarer shingles — only fully-stopword pairs are lost; keep 0 to
    * disable for exact-oracle parity). */
  def ngramJaccardPairs(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
                        shingleLen: Int = 3, threshold: Double = 0.1,
                        maxDocFreq: Long = 0L): DataFrame = {
    val sh = shingled(spread(docs), idCol, textCol, shingleLen)
      .filter(size(col("sh")) >= 1)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val sizes = sh.select(col("id"), size(col("sh")).as("sz"))
    val inv0 = sh.select(col("id"), explode(col("sh")).as("g"))
      .select(col("id"), xxhash64(col("g")).as("g"))
    val inv =
      if (maxDocFreq <= 0) inv0
      else {
        val rare = inv0.groupBy(col("g")).agg(count(lit(1)).as("df"))
          .filter(col("df") <= maxDocFreq).select(col("g"))
        inv0.join(rare, Seq("g"), "left_semi")
      }
    val common = inv.toDF("a", "g").join(inv.toDF("b", "g"), Seq("g"))
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("common"))
    common
      .join(sizes.toDF("a", "szA"), Seq("a"))
      .join(sizes.toDF("b", "szB"), Seq("b"))
      .select(col("a"), col("b"),
        (col("common").cast("double") / (col("szA") + col("szB") - col("common"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Cross-source duplication matrix: for every source pair (src_a ≤ src_b),
    * how many EXACT-duplicate document pairs span them — the "where is my
    * duplication coming from" diagnostic that decides which feeds to
    * de-prioritize. Counting is closed-form over per-(fingerprint, source)
    * counts (cross pairs = c_a·c_b, within = C(c,2)) — the duplicate-group
    * join never expands to individual pairs, so a pathological million-copy
    * document costs one row per source, not 10¹² pair rows. */
  def crossSourceDupMatrix(docs: DataFrame, idCol: String = "doc_id",
                           textCol: String = "text",
                           srcCol: String = "source"): DataFrame = {
    val g = spread(docs)
      .select(TextAnalysis.fingerprint(col(textCol)).as("fp"), col(srcCol).as("src"))
      .groupBy(col("fp"), col("src")).agg(count(lit(1)).as("c"))
    val cross = g.toDF("fp", "src_a", "ca")
      .join(g.toDF("fp", "src_b", "cb"), Seq("fp"))
      .filter(col("src_a") < col("src_b"))
      .select(col("src_a"), col("src_b"), (col("ca") * col("cb")).as("p"))
    val within = g.select(col("src").as("src_a"), col("src").as("src_b"),
      expr("c * (c - 1) DIV 2").as("p"))
    cross.unionByName(within)
      .groupBy(col("src_a"), col("src_b")).agg(sum(col("p")).as("n_pairs"))
      .filter(col("n_pairs") > 0)
  }

  /** Exact duplicated-span coverage (the ExactSubstr signal of Lee et al.
    * 2022, "Deduplicating Training Data Makes Language Models Better",
    * re-expressed relationally — no suffix array): every sliding
    * `spanTokens`-token window is fingerprinted; a window whose fingerprint
    * occurs ≥ 2 times anywhere in the corpus (cross-doc or self-repetition)
    * is a duplicated span; per doc we report how many token positions fall
    * under the UNION of its duplicated spans (`dup_tokens`, plus ppm) — the
    * quantity a span-removal pass would delete. Returns
    * (doc_id, n_tokens, dup_tokens, dup_ppm).
    *
    * Scale shape: windows are emitted rowwise (one codegen'd pass, ~1
    * window per token); the global occurrence count is a combinable
    * hash-groupBy on the 8-byte fingerprint; the count≥2 filter runs
    * BEFORE the join back, so only duplicated windows re-shuffle; the
    * interval-union is a per-doc window over pos — sort groups bounded by
    * a single document's length, never corpus-sized. */
  def spanCoverage(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text", spanTokens: Int = 16): DataFrame = {
    val L = spanTokens
    val base = spread(docs).select(col(idCol).as("doc_id"),
        normTokens(col(textCol)).as("toks"))
      .select(col("doc_id"), col("toks"),
        coalesce(size(col("toks")), lit(0)).as("n_tokens"))
    val wins = base.filter(col("n_tokens") >= L)
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(1), col("n_tokens") - (L - 1)),
          i => xxhash64(concat_ws(" ", slice(col("toks"), i, lit(L))))))
          .as(Seq("pos", "fp")))
    val counts = wins.groupBy(col("fp")).agg(count(lit(1)).as("cnt"))
    val dup = wins.join(counts.filter(col("cnt") >= 2).select(col("fp")), "fp")
    import org.apache.spark.sql.expressions.Window
    val before = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val per = dup
      .withColumn("prev_end", max(col("pos") + (L - 1)).over(before))
      .withColumn("c", when(col("prev_end").isNull, lit(L))
        .otherwise(greatest(lit(0), least(lit(L),
          col("pos") + (L - 1) - col("prev_end")))))
      .groupBy(col("doc_id")).agg(sum(col("c")).as("dup_tokens"))
    base.select(col("doc_id"), col("n_tokens"))
      .join(per, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
        coalesce(col("dup_tokens"), lit(0L)).cast("long").as("dup_tokens"))
      .withColumn("dup_ppm",
        expr("CAST(dup_tokens * 1000000 DIV greatest(n_tokens, 1) AS BIGINT)"))
  }

  /** Prefix-filtered n-gram Jaccard pair join (PPJoin-family, Xiao et al.
    * 2008; Chaudhuri et al. 2006): same output as [[ngramJaccardPairs]] —
    * every unordered pair with Jaccard ≥ `threshold` — but the inverted
    * index holds only each document's PREFIX under a global shingle order
    * (document frequency ascending, hash tiebreak), length
    * `|S| − ⌈t·|S|⌉ + 1`. Any pair with J ≥ t must share a prefix shingle,
    * so the candidate set shrinks from Σ df² over ALL shingles (the full
    * index join, dominated by common shingles) to Σ df² over RARE prefix
    * shingles — at corpus scale this is the difference between a quadratic
    * blowup on boilerplate n-grams and a near-linear candidate stream.
    * Candidates are then verified EXACTLY with the codegen'd galloping
    * sorted-intersection kernel over the full (sorted, hashed) shingle
    * arrays — per-row work bounded by document length, no second shuffle
    * of the corpus. The ⌈·⌉ is computed as `floor(t·|S| − 1e−9)` (one
    * element longer at exact-integer boundaries — extra candidates, never
    * missed ones, and FP rounding at a power boundary can't drop a pair).
    *
    * Both the df ranking and the verify join reuse one shingled scan
    * (persisted); skew note: a prefix shingle's df is ≤ the rarest-first
    * cutoff by construction, so no single inverted-index key explodes. */
  def ngramJaccardPairsPrefix(docs: DataFrame, idCol: String = "doc_id",
                              textCol: String = "text", shingleLen: Int = 3,
                              threshold: Double = 0.1): DataFrame = {
    val sh = shingled(spread(docs), idCol, textCol, shingleLen)
      .filter(size(col("sh")) >= 1)
      .select(col("id"),
        sort_array(transform(col("sh"), g => xxhash64(g))).as("hs"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val inv = sh.select(col("id"), explode(col("hs")).as("g"))
    val dfreq = inv.groupBy(col("g")).agg(count(lit(1)).as("df"))
    // per-doc global ordering (df asc, hash asc) → prefix of the rarest
    val pref = inv.join(dfreq, "g")
      .groupBy(col("id"))
      .agg(sort_array(collect_list(struct(col("df"), col("g")))).as("o"))
      .select(col("id"), expr(
        s"slice(o, 1, greatest(size(o) - greatest(CAST(floor($threshold * size(o) - 1e-9) AS INT), 0), 1))").as("p"))
      .select(col("id"), expr("transform(p, x -> x.g)").as("pg"))
    val cand = pref.select(col("id").as("a"), explode(col("pg")).as("g"))
      .join(pref.select(col("id").as("b"), explode(col("pg")).as("g")), Seq("g"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
    // exact verify: galloping intersection over the full sorted shingle arrays
    cand
      .join(sh.select(col("id").as("a"), col("hs").as("hsA")), Seq("a"))
      .join(sh.select(col("id").as("b"), col("hs").as("hsB")), Seq("b"))
      .select(col("a"), col("b"),
        graft.functions.GraphSetExpressions
          .sortedIntersectCount(col("hsA"), col("hsB")).cast("long").as("common"),
        size(col("hsA")).cast("long").as("szA"), size(col("hsB")).cast("long").as("szB"))
      .select(col("a"), col("b"),
        (col("common").cast("double") / (col("szA") + col("szB") - col("common")))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Asymmetric shingle-containment pairs: for every ordered pair (src, dst),
    * `containment = |S_src ∩ S_dst| / |S_src|` — the quote/subset-duplication
    * signal Jaccard misses (a short doc fully contained in a long one has low
    * Jaccard but containment 1.0; this is how boilerplate inclusion and
    * near-verbatim quoting are found in web-corpus curation).
    *
    * Candidate generation goes through the shingle inverted index RESTRICTED
    * TO RARE SHINGLES (document frequency ≤ `maxDocFreq`, same guard as
    * [[ngramJaccardPairs]]' `maxDocFreq` and cdcChunkPairs' chunk cap): a
    * stop-shingle appearing in df docs would otherwise expand df² candidate
    * rows — the one quadratic a web corpus reliably manufactures ("the of
    * the…" 3-grams in 10⁶ docs → 10¹² rows). Survivor pairs are then verified
    * EXACTLY with the codegen'd galloping sorted-intersection kernel over the
    * full hashed shingle arrays, so reported containment values are exact —
    * the cap only affects RECALL, and only for pairs whose ENTIRE shared
    * shingle set is hot (every common shingle in > maxDocFreq docs): pairs
    * sharing even one rare shingle are always found. `maxDocFreq ≤ 0`
    * (the default, matching [[ngramJaccardPairs]]: exact semantics unless
    * the caller opts into the recall cut) disables the cap — ALWAYS pass a
    * positive cap at web-corpus scale, where the full inverted index is the
    * df² trap the scaladoc above describes.
    *
    * @note BREAKING default change (r10): `maxDocFreq` defaulted to 1024
    *       before r10; callers relying on the old implicit cap silently
    *       switch to the full (exact, df²-prone) index — pass 1024 (or any
    *       positive cap) explicitly to keep the capped behavior. */
  def containmentPairs(docs: DataFrame, idCol: String = "doc_id",
                       textCol: String = "text", shingleLen: Int = 3,
                       threshold: Double = 0.5,
                       maxDocFreq: Long = 0L): DataFrame = {
    val sh = shingled(spread(docs), idCol, textCol, shingleLen)
      .filter(size(col("sh")) >= 1)
      .select(col("id"),
        sort_array(transform(col("sh"), g => xxhash64(g))).as("hs"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val inv = sh.select(col("id"), explode(col("hs")).as("g"))
    val candIdx =
      if (maxDocFreq <= 0) inv
      else {
        val rare = inv.groupBy(col("g")).agg(count(lit(1)).as("df"))
          .filter(col("df") <= maxDocFreq).select(col("g"))
        inv.join(rare, Seq("g"), "left_semi").select(col("id"), col("g"))
      }
    val cand = candIdx.select(col("id").as("a"), col("g"))
      .join(candIdx.select(col("id").as("b"), col("g")), Seq("g"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
    val both = cand
      .join(sh.select(col("id").as("a"), col("hs").as("hsA")), Seq("a"))
      .join(sh.select(col("id").as("b"), col("hs").as("hsB")), Seq("b"))
      .select(col("a"), col("b"),
        graft.functions.GraphSetExpressions
          .sortedIntersectCount(col("hsA"), col("hsB")).cast("long").as("common"),
        size(col("hsA")).cast("long").as("szA"),
        size(col("hsB")).cast("long").as("szB"))
    val ab = both.select(col("a").as("src"), col("b").as("dst"),
      (col("common").cast("double") / col("szA")).as("containment"))
    val ba = both.select(col("b").as("src"), col("a").as("dst"),
      (col("common").cast("double") / col("szB")).as("containment"))
    ab.union(ba).filter(col("containment") >= threshold)
  }

  /** Brute-force exact n-gram Jaccard dedup (all-pairs within LSH buckets is
    * the scale path; this is the small-data oracle-friendly variant). */
  def ngramJaccard(df: DataFrame, idCol: String = "doc_id", textCol: String = "text",
                   shingleLen: Int = 3, threshold: Double = 0.8): DataFrame = {
    val sh = shingled(spread(df), idCol, textCol, shingleLen)
      .filter(size(col("sh")) > 0)
    val pairs = sh.toDF("a", "shA").join(sh.toDF("b", "shB"), col("a") < col("b"))
      .select(col("a"), col("b"),
        (size(array_intersect(col("shA"), col("shB"))).cast("double") /
          size(array_union(col("shA"), col("shB")))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .select(col("a").as("src"), col("b").as("dst"), col("jaccard").as("value"))
    clustersFromPairs(df.select(col(idCol).as("id")), pairs)
  }

  /** Exact edit-distance similarity join (Ed-Join-family count filtering,
    * Xiao/Wang/Lin 2008): every unordered pair with
    * `levenshtein(a, b) ≤ maxDist`, found WITHOUT an all-pairs product.
    *
    * Filter argument: one edit operation destroys at most `q` of a string's
    * positional character q-grams and creates at most `q` in the result, so
    * `lev(a,b) ≤ k` bounds BOTH multiset differences by `q·k`:
    * `|G(a) ∩ G(b)| ≥ max(|G(a)|, |G(b)|) − q·k`. By the sorted-prefix
    * lemma (Chaudhuri et al. 2006), under ANY shared total order the two
    * `q·k+1`-element prefixes must then intersect — so the candidate join
    * is PREFIX × PREFIX, never prefix × full index (the full-index probe is
    * the difference between Σ df over rare grams and Σ df over everything).
    * We order by document frequency ascending so the prefixes hold each
    * document's rarest grams. Multiset semantics come from occurrence
    * numbering — gram key = hash(gram, occurrence#), so `aaa…` can't
    * over-match (hash collisions only ever ADD candidates, never drop one).
    * The `|len(a)−len(b)| ≤ k` length filter runs INSIDE the candidate join
    * (before the dedup shuffle), and survivors are verified with the
    * thresholded native `levenshtein(l, r, k)` — the DP early-exits past k,
    * so verify cost per candidate is O(k·len), not O(len²).
    *
    * Strings shorter than `q` have no grams and bypass the filter through a
    * broadcast length-band join (any partner is ≤ q−1+k chars — a corpus's
    * sub-q-gram slice is vanishingly small and the band bound keeps it so).
    *
    * Scale shape: gram index and df ranking are linear scans + hash
    * aggregates; the candidate join keys on rare grams only (a prefix
    * gram's df is minimal for its doc by construction), so no inverted-
    * index key explodes the way boilerplate n-grams do in the full-index
    * join. Returns (src, dst, lev), src < dst. */
  def editDistancePairs(docs: DataFrame, idCol: String = "doc_id",
                        textCol: String = "text", maxDist: Int = 8,
                        q: Int = 5): DataFrame = {
    require(maxDist >= 0, "maxDist must be non-negative")
    require(q >= 1, "q-gram length must be positive")
    val base = spread(docs)
      .select(col(idCol).as("id"), col(textCol).as("txt"))
      .withColumn("len", length(col("txt")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val prefLen = q * maxDist + 1
    // positional-multiset gram index: key = hash(hash(gram), occurrence#).
    // Grams hash to longs BEFORE the (id, gram) shuffle — the exchange
    // carries 8-byte keys, never q-char strings.
    val multiset = base.filter(col("len") >= q)
      .select(col("id"), explode(expr(
        s"transform(sequence(1, len - ${q - 1}), i -> xxhash64(substring(txt, i, $q)))")).as("gh"))
      .groupBy(col("id"), col("gh")).agg(count(lit(1)).as("c"))
      .select(col("id"), explode(expr(
        "transform(sequence(1, CAST(c AS INT)), o -> xxhash64(gh, o))")).as("h"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val dfreq = multiset.groupBy(col("h")).agg(count(lit(1)).as("df"))
    val pref = multiset.join(dfreq, "h")
      .groupBy(col("id"))
      .agg(sort_array(collect_list(struct(col("df"), col("h")))).as("o"))
      .select(col("id"),
        expr(s"transform(slice(o, 1, $prefLen), x -> x.h)").as("ph"))
      .join(base.select(col("id"), col("len")), Seq("id"))
    val prefExpl = pref
      .select(col("id"), col("len"), explode(col("ph")).as("h"))
    val gramCand = prefExpl.toDF("a", "lenA", "h")
      .join(prefExpl.toDF("b", "lenB", "h"), Seq("h"))
      .filter(col("a") < col("b") &&
        abs(col("lenA") - col("lenB")) <= maxDist)
      .select(col("a"), col("b"))
      .distinct()
    // sub-q-gram strings: tiny by the length-band bound — broadcast join
    val shorts = base.filter(col("len") < q)
      .select(col("id").as("a"), col("len").as("lenA"))
    val shortCand = broadcast(shorts)
      .join(base.select(col("id").as("b"), col("len").as("lenB")),
        col("a") =!= col("b") &&
          abs(col("lenA") - col("lenB")) <= maxDist)
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .distinct()
    gramCand.union(shortCand).distinct()
      .join(base.select(col("id").as("a"), col("txt").as("ta"),
        col("len").as("lenA")), Seq("a"))
      .join(base.select(col("id").as("b"), col("txt").as("tb"),
        col("len").as("lenB")), Seq("b"))
      .filter(abs(col("lenA") - col("lenB")) <= maxDist)
      .select(col("a").as("src"), col("b").as("dst"),
        levenshtein(col("ta"), col("tb"), maxDist).cast("long").as("lev"))
      .filter(col("lev") >= 0 && col("lev") <= maxDist)
  }

  // -------------------------------------------------------------------------
  // SimHash
  // -------------------------------------------------------------------------

  /** Per-token 64-bit hashes for SimHash. Stage this in its own projection:
    * the bit loop below references it 64 times, and an attribute read is
    * free where re-tokenizing + re-hashing is not.
    * `poly = true` → Poly64 Rabin hashes (SQL-oracle-reproducible). */
  def simHashTokenHashes(text: Column, poly: Boolean = false): Column =
    transform(TextAnalysis.wsTokens(lower(text)),
      t => if (poly) graft.functions.Poly64.poly64(t) else xxhash64(t))

  /** 64-bit SimHash from pre-hashed tokens: bit b is set iff the sum over
    * tokens of ±1 (sign of bit b of the token hash) is non-negative.
    * One-pass codegen'd expression (graft.functions.SimHashExpression);
    * `simHashFromHashesHof` below is the declarative reference formulation
    * it is spec-pinned against (HOFs run interpreted — 64×|tokens| closure
    * dispatches made this the slowest dedup stage). */
  def simHashFromHashes(hashes: Column): Column =
    graft.functions.SimHashExpression.simHash64(hashes)

  /** Declarative HOF reference formulation of `simHashFromHashes` (kept for
    * the equivalence spec + as documentation of semantics). */
  private[graft] def simHashFromHashesHof(hashes: Column): Column =
    // shift amounts are data-dependent → SQL shiftright/shiftleft via
    // call_function (the Scala wrappers only take literal Int amounts)
    aggregate(
      sequence(lit(0), lit(63)),
      lit(0L),
      (acc, b) => acc + when(
        aggregate(hashes, lit(0L),
          (s, h) => s + when(
            call_function("shiftright", h, b).bitwiseAND(lit(1L)) === 1L, 1L)
            .otherwise(-1L)) >= 0,
        call_function("shiftleft", lit(1L), b)).otherwise(0L))

  /** 64-bit SimHash over whitespace tokens. */
  def simHash(text: Column, poly: Boolean = false): Column =
    simHashFromHashes(simHashTokenHashes(text, poly))

  /** SimHash near-dup pairs: candidates share one of 4 16-bit chunks
    * (any pair with Hamming distance ≤ 3 must agree on ≥1 chunk), verified by
    * exact Hamming distance ≤ maxHamming. Returns clusters (id, rep). */
  def simHashDedup(df: DataFrame, idCol: String = "doc_id", textCol: String = "text",
                   maxHamming: Int = 3, poly: Boolean = false): DataFrame = {
    val withSh = spread(df).select(col(idCol).as("id"),
      simHashTokenHashes(col(textCol), poly).as("hs"))
      .select(col("id"), simHashFromHashes(col("hs")).as("sh"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val chunked = withSh.select(col("id"), col("sh"), posexplode(
      transform(sequence(lit(0), lit(3)),
        c => call_function("shiftright", col("sh"), c * 16).bitwiseAND(lit(0xFFFFL)))))
      .toDF("id", "sh", "chunk", "ckey")
    val l = chunked.select(col("id").as("a"), col("sh").as("shA"), col("chunk"), col("ckey"))
    val r = chunked.select(col("id").as("b"), col("sh").as("shB"), col("chunk"), col("ckey"))
    val pairs = l.join(r, Seq("chunk", "ckey")).filter(col("a") < col("b"))
      .select(col("a"), col("b"), col("shA"), col("shB")).distinct()
      .withColumn("hamming", bit_count(col("shA").bitwiseXOR(col("shB"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("a").as("src"), col("b").as("dst"), col("hamming").cast("double").as("value"))
    clustersFromPairs(df.select(col(idCol).as("id")), pairs)
  }

  // -------------------------------------------------------------------------
  // Embedding cosine near-dup
  // -------------------------------------------------------------------------

  /** Near-dup clusters over an embedding column via cosine ≥ threshold.
    * Candidates from random-hyperplane LSH (sign-bit buckets) when `lshBits`
    * > 0, else brute force all-pairs (small data / oracle path). */
  def embeddingDedup(df: DataFrame, idCol: String = "vec_id", vecCol: String = "embedding",
                     threshold: Double = 0.95, lshBits: Int = 0): DataFrame = {
    // normalize ONCE per vector; the O(n²) inner loop is a bare dot product
    val v = spread(df).select(col(idCol).as("id"),
      Ann.l2normalize(col(vecCol).cast("array<double>")).as("v"))
    val pairsAll =
      if (lshBits <= 0) v.toDF("a", "vA").join(v.toDF("b", "vB"), col("a") < col("b"))
      else {
        val bucketed = v.withColumn("bucket", Ann.hyperplaneBucket(col("v"), lshBits))
        bucketed.toDF("a", "vA", "bucket")
          .join(bucketed.toDF("b", "vB", "bucket"), Seq("bucket"))
          .filter(col("a") < col("b")).drop("bucket")
      }
    val pairs = pairsAll
      .withColumn("cos", graft.functions.VectorExpressions.dot(col("vA"), col("vB")))
      .filter(col("cos") >= threshold)
      .select(col("a").as("src"), col("b").as("dst"), col("cos").as("value"))
    clustersFromPairs(df.select(col(idCol).as("id")), pairs)
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): k-means partitions the embedding space into `nlist`
    * cells, then within each cell a vector is pruned iff a LOWER-id
    * cell-mate has cosine similarity ≥ `threshold` (greedy
    * canonical-minimum retention — deterministic, no transitive closure, so
    * a kept representative is always the smallest id among the cell-local
    * near-dups that reach it directly). Returns survivors (idCol, cell).
    *
    * Scale design: the clustering bounds the quadratic term that makes
    * [[embeddingDedup]]'s brute path single-node-only. With nlist chosen as
    * ~N / targetCellSize the within-cell all-pairs work is O(N ·
    * targetCellSize) rows TOTAL — independent of corpus size — and it
    * shuffles on `cell`, so a 1000-executor cluster spreads cells evenly.
    * Vectors are L2-normalized once per row (O(N) array passes); the pair
    * loop is a bare codegen'd dot product. No global all-pairs anywhere.
    */
  def semDedup(df: DataFrame, nlist: Int, threshold: Double = 0.95,
               iters: Int = 2, idCol: String = "vec_id",
               vecCol: String = "embedding", hashInit: Boolean = true): DataFrame = {
    val centroids = Ann.trainCentroids(df, nlist, iters, idCol, vecCol, hashInit)
    val v = df.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
    val cells = Ann.assignCells(v, centroids, "v")
    val nv = v.select(col("id"), Ann.l2normalize(col("v")).as("u"))
    // both sides of the pair self-join and the final anti-join read this
    val au = cells.join(nv, Seq("id")).select(col("id"), col("cell"), col("u"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val killed = au.toDF("a", "cell", "uA")
      .join(au.toDF("b", "cell", "uB"), Seq("cell"))
      .filter(col("b") < col("a"))
      .filter(graft.functions.VectorExpressions.dot(col("uA"), col("uB")) >= threshold)
      .select(col("a").as("id")).distinct()
    au.join(killed, Seq("id"), "left_anti")
      .select(col("id").as(idCol), col("cell"))
  }

  /** Persist a [[semDedup]] index for incremental maintenance — the
    * embeddings ingest-loop analog of [[saveLshIndex]] / Ann.saveIvfIndex:
    * `<name>_meta` (build parameters), `<name>_centroids` (the frozen
    * quantizer), and `<name>_cells` = (id, cell, u) with the vector
    * L2-normalized ONCE at write time, bucketed by `cell` so the
    * within-cell pair join at [[semDedupSurvivors]] time reads the table
    * with no base-side exchange. Idempotent (table drop + stale-location
    * cleanup first) — safe in a crash-retry ingest loop. */
  def saveSemDedupIndex(corpus: DataFrame, name: String, nlist: Int,
                        threshold: Double = 0.95, iters: Int = 2,
                        idCol: String = "vec_id", vecCol: String = "embedding",
                        hashInit: Boolean = true, buckets: Int = 32): Unit = {
    val spark = corpus.sparkSession
    Seq("centroids", "cells", "meta")
      .foreach(s => replaceTable(spark, s"${name}_$s"))
    import spark.implicits._
    Seq((nlist, threshold, iters, hashInit, buckets))
      .toDF("nlist", "threshold", "iters", "hash_init", "buckets")
      .write.mode("overwrite").saveAsTable(s"${name}_meta")
    val centroids = Ann.trainCentroids(corpus, nlist, iters, idCol, vecCol, hashInit)
      .coalesce(1).localCheckpoint(true)
    centroids.write.mode("overwrite").saveAsTable(s"${name}_centroids")
    indexedSemRows(corpus, centroids, idCol, vecCol)
      .write.mode("overwrite").bucketBy(buckets, "cell").sortBy("cell")
      .saveAsTable(s"${name}_cells")
  }

  /** Scoring-ready cells rows: frozen-quantizer assignment + one-time L2
    * normalization (shared by the base build and every delta append). */
  private def indexedSemRows(vectors: DataFrame, centroids: DataFrame,
                             idCol: String, vecCol: String): DataFrame = {
    val v = vectors.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
    Ann.assignCells(v, centroids, "v")
      .join(v.select(col("id"), Ann.l2normalize(col("v")).as("u")), Seq("id"))
      .select(col("id"), col("cell"), col("u"))
  }

  /** Fold a delta of NEW vectors (ids disjoint from the base, the
    * [[incrementalMinHashLSH]] contract) into a persisted semDedup index:
    * assign against the FROZEN quantizer and APPEND bucket files — the
    * base side is never read or reshuffled. The maintained cells table is
    * identical to one-pass assignment of base ∪ delta against the same
    * centroids, since per-vector assignment is independent and
    * deterministic. */
  def appendToSemDedupIndex(spark: org.apache.spark.sql.SparkSession,
                            name: String, delta: DataFrame,
                            idCol: String = "vec_id",
                            vecCol: String = "embedding"): Unit = {
    require(spark.catalog.tableExists(s"${name}_meta"),
      s"appendToSemDedupIndex('$name'): no such index — run saveSemDedupIndex first")
    val centroids = spark.table(s"${name}_centroids")
    indexedSemRows(delta, centroids, idCol, vecCol)
      .write.mode("append").format("parquet")
      .bucketBy(spark.table(s"${name}_meta").head().getAs[Int]("buckets"),
        "cell").sortBy("cell")
      .saveAsTable(s"${name}_cells")
    // the next reader must see the appended files, not a cached listing
    spark.catalog.refreshTable(s"${name}_cells")
  }

  /** Survivors of the maintained corpus under the index's stored threshold:
    * the same greedy lowest-id rule as [[semDedup]], evaluated over the
    * bucketed cells table — the pair self-join keys on `cell`, which BOTH
    * sides are bucketed by, so the 100 TB table joins against itself
    * without reshuffling. Equal to [[semDedup]] run with the index's
    * frozen centroids over everything ingested so far. */
  def semDedupSurvivors(spark: org.apache.spark.sql.SparkSession,
                        name: String, idCol: String = "vec_id"): DataFrame = {
    val threshold = spark.table(s"${name}_meta").head().getAs[Double]("threshold")
    val cells = spark.table(s"${name}_cells")
    val killed = cells.toDF("a", "cell", "uA")
      .join(cells.toDF("b", "cell", "uB"), Seq("cell"))
      .filter(col("b") < col("a"))
      .filter(graft.functions.VectorExpressions.dot(col("uA"), col("uB")) >= threshold)
      .select(col("a").as("id")).distinct()
    cells.join(killed, Seq("id"), "left_anti")
      .select(col("id").as(idCol), col("cell"))
  }

  // -------------------------------------------------------------------------

  /** Duplicate clusters from a near-dup pair graph: connected components with
    * singletons mapping to themselves; rep = minimum id of the component.
    * Returns (id, rep).
    *
    * Scale design: the VERIFIED pair graph is orders of magnitude smaller
    * than the corpus by construction (only near-dups survive banding +
    * verification), so clustering it with iterative WCC pays several
    * fixed-cost Spark jobs for a graph that usually fits in one task. Up to
    * `maxLocalPairs` the components come from a single-task union-find
    * (one job, executor-side mapPartitions — not a driver collect); above
    * it, distributed WCC runs over the PAIR VERTICES ONLY — never iterate
    * the full corpus id list, singletons join back in afterwards. */
  def clustersFromPairs(ids: DataFrame, pairs: DataFrame,
                        maxLocalPairs: Long = 10000000L): DataFrame = {
    val p = pairs.select(col("src"), col("dst")).persist(StorageLevel.MEMORY_AND_DISK)
    val n = p.count()
    val reps: DataFrame =
      if (n <= maxLocalPairs) {
        val sess = ids.sparkSession
        import sess.implicits._
        p.as[(Long, Long)].repartition(1).mapPartitions { it =>
          val parent = scala.collection.mutable.LongMap.empty[Long]
          def find(x: Long): Long = {
            var r = x
            while (parent.getOrElse(r, r) != r) r = parent(r)
            var c = x // path compression
            while (parent.getOrElse(c, c) != r) { val nx = parent(c); parent(c) = r; c = nx }
            r
          }
          it.foreach { case (a, b) =>
            val ra = find(a); val rb = find(b)
            if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
            parent.getOrElseUpdate(a, find(a)); parent.getOrElseUpdate(b, find(b))
          }
          // roots union by min id, so find() already yields the component min
          parent.keysIterator.map(id => (id, find(id)))
        }.toDF("id", "rep")
      } else {
        val verts = p.select(explode(array(col("src"), col("dst"))).as("id")).distinct()
        val g = KGraph(verts.select(col("id"), col("id").as("value")),
          p.select(col("src"), col("dst"), lit(1.0).as("value")))
        GraphAlgorithms.wcc(g).toDF("id", "rep")
      }
    val out = ids.join(reps, Seq("id"), "left_outer")
      .select(col("id"), coalesce(col("rep"), col("id")).as("rep"))
    out
  }

  // -------------------------------------------------------------------------
  // Line-level exact dedup (C4 / RefinedWeb style)
  // -------------------------------------------------------------------------

  /** Remove every line that already occurred EARLIER in the corpus — the
    * C4/RefinedWeb boilerplate killer (nav bars, cookie banners, license
    * headers repeat across millions of pages; document-level dedup never
    * sees them). "Earlier" is the total order (idCol, line position): the
    * first occurrence survives, all later copies are dropped, so the corpus
    * keeps exactly one copy of every distinct line and the result is
    * independent of partitioning.
    *
    * Returns one row per input document: (idCol, n_kept, n_dropped,
    * text_fp) where text_fp is the Poly64 fingerprint of the surviving
    * lines rejoined with '\n' (documents whose every line was dropped
    * fingerprint the empty string). Returning the fingerprint instead of
    * the rebuilt text keeps the gated result narrow; callers that want the
    * text itself use [[lineDedupKept]].
    *
    * Scale shape: lines explode once; the winner per line-hash is a
    * map-side-combinable min aggregate (hot boilerplate lines collapse to
    * one row per partition before the shuffle); the winner relation (one
    * row per DISTINCT line) joins back on the 64-bit hash — a hot line is
    * heavy only on the probe side, which AQE skew-split handles, and the
    * reassembly groupBy shuffles on doc id, which is as uniform as the
    * corpus itself. No sort over hot-line groups anywhere (a row_number
    * window over the line hash would funnel every copy of a boilerplate
    * line into one sort group).
    *
    * Line position must fit in 2^20 (a "document" with a million lines is
    * a concatenation bug, not a document) — positions pack with the id
    * into one orderable long so the min-aggregate stays a primitive. */
  def lineDedup(docs: DataFrame, idCol: String = "doc_id",
                textCol: String = "text"): DataFrame = {
    val kept = lineDedupKeptLines(docs, idCol, textCol)
    val counts = docs.select(col(idCol).as("_id"),
      size(split(col(textCol), "\n", -1)).cast("long").as("_n_lines"))
    val reassembled = kept
      .groupBy(col("_id"))
      .agg(count(lit(1)).as("_n_kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("_pos"), col("_line")))),
            x => x("_line")), "\n").as("_text"))
    counts.join(reassembled, Seq("_id"), "left_outer")
      .select(col("_id").as(idCol),
        coalesce(col("_n_kept"), lit(0L)).as("n_kept"),
        (col("_n_lines") - coalesce(col("_n_kept"), lit(0L))).as("n_dropped"),
        graft.functions.Poly64.poly64(coalesce(col("_text"), lit("")))
          .as("text_fp"))
  }

  /** Persist the seen-line index for the STREAMING form of [[lineDedup]]:
    * table `<name>_lines` holds the distinct line hashes of the base
    * corpus, bucketed by hash so later deltas anti-join it without
    * shuffling the (corpus-sized) index side. Idempotent like the other
    * index builders: replaces table + stale warehouse dirs. */
  def saveLineIndex(spark: org.apache.spark.sql.SparkSession, name: String,
                    docs: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text"): Unit = {
    replaceTable(spark, s"${name}_lines")
    docs.select(posexplode(split(col(textCol), "\n", -1)).as(Seq("_pos", "_line")))
      .select(graft.functions.Poly64.poly64(col("_line")).as("lh"))
      .distinct()
      // bucket count fixed at 8 so appends never drift from the builder
      // (the other indexes persist tunables in a _meta table; this one has
      // none — the hash family is fixed)
      .write.mode("overwrite").bucketBy(8, "lh").sortBy("lh")
      .saveAsTable(s"${name}_lines")
  }

  /** One ingest-loop step of streaming line dedup: drop every line of
    * `delta` already in the `<name>_lines` index OR duplicated earlier
    * within the delta itself (first (id, pos) wins), append the delta's
    * genuinely-new line hashes to the index (delta-only bucket files — the
    * base index is never rescanned or rewritten), and return the deltas'
    * per-doc survival summary in [[lineDedup]]'s shape.
    *
    * Feeding batches in id order reproduces batch [[lineDedup]] over the
    * concatenated corpus EXACTLY (spec-pinned): the index is precisely
    * "every line seen by earlier batches", and the within-delta rule is
    * the same packed-(id, pos) combinable min. Designed for foreachBatch:
    * the sixth stream-driven maintenance loop next to the LSH/IVF/IVF-PQ/
    * semDedup indexes and the MG/HLL/CMS summaries. */
  def appendToLineIndex(spark: org.apache.spark.sql.SparkSession, name: String,
                        delta: DataFrame, idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    val PosBits = 20
    val seen = spark.table(s"${name}_lines")
    val lines = delta.select(col(idCol).as("_id"),
        posexplode(split(col(textCol), "\n", -1)).as(Seq("_pos", "_line")))
      .withColumn("_h", graft.functions.Poly64.poly64(col("_line")))
      .withColumn("_ord", packOrd(col("_id"), col("_pos"), PosBits))
    // localCheckpoint BEFORE the append: winners anti-joins the very table
    // the append grows — a lazy plan re-evaluated after the write would see
    // its own lines in the index and drop everything it just kept
    val winners = lines.groupBy(col("_h")).agg(min(col("_ord")).as("_w"))
      .join(seen, col("_h") === col("lh"), "left_anti")
      .localCheckpoint(true)
    val kept = lines.join(winners, Seq("_h")).filter(col("_ord") === col("_w"))
    winners.select(col("_h").as("lh"))
      .write.mode("append").bucketBy(8, "lh").sortBy("lh")
      .saveAsTable(s"${name}_lines")
    spark.catalog.refreshTable(s"${name}_lines")
    val counts = delta.select(col(idCol).as("_id"),
      size(split(col(textCol), "\n", -1)).cast("long").as("_n_lines"))
    val reassembled = kept.groupBy(col("_id"))
      .agg(count(lit(1)).as("_n_kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("_pos"), col("_line")))),
            x => x("_line")), "\n").as("_text"))
    counts.join(reassembled, Seq("_id"), "left_outer")
      .select(col("_id").as(idCol),
        coalesce(col("_n_kept"), lit(0L)).as("n_kept"),
        (col("_n_lines") - coalesce(col("_n_kept"), lit(0L))).as("n_dropped"),
        graft.functions.Poly64.poly64(coalesce(col("_text"), lit("")))
          .as("text_fp"))
  }

  /** The surviving (idCol, pos, line) rows of [[lineDedup]]'s keep rule —
    * for callers that rebuild text or feed the lines onward. */
  def lineDedupKept(docs: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame =
    lineDedupKeptLines(docs, idCol, textCol)
      .select(col("_id").as(idCol), col("_pos").as("pos"), col("_line").as("line"))

  private def lineDedupKeptLines(docs: DataFrame, idCol: String,
                                 textCol: String): DataFrame = {
    val PosBits = 20
    val lines = docs.select(col(idCol).as("_id"),
        posexplode(split(col(textCol), "\n", -1)).as(Seq("_pos", "_line")))
      .withColumn("_h", graft.functions.Poly64.poly64(col("_line")))
      .withColumn("_ord", packOrd(col("_id"), col("_pos"), PosBits))
    val winners = lines.groupBy(col("_h"))
      .agg(min(col("_ord")).as("_w"))
    lines.join(winners, Seq("_h"))
      .filter(col("_ord") === col("_w"))
      .select(col("_id"), col("_pos"), col("_line"))
  }

  // -------------------------------------------------------------------------
  // Cross-document repeated n-gram spans (substring-granularity dedup)
  // -------------------------------------------------------------------------

  /** Maximal token spans covered by n-grams that occur in ≥ `minDocs`
    * DISTINCT documents — the substring-granularity dedup marker (Lee et
    * al., "Deduplicating Training Data Makes Language Models Better",
    * ACL'22: repeated ≥ n-token substrings are memorization fuel that
    * document- and line-level dedup both miss when the surrounding text
    * differs). Output: one row per maximal span, (idCol, start_tok,
    * end_tok, n_grams) over 0-based normalized-token positions — the
    * removal mask a training pipeline applies before tokenization.
    *
    * Semantics: every n-token window of the normalized token stream is a
    * positional gram (NOT distinct — positions matter, and a doc-internal
    * repeat of a cross-doc-hot gram is marked at every position); grams
    * whose document frequency (distinct docs) ≥ minDocs mark the interval
    * [pos, pos+n−1]; overlapping or exactly-adjacent marked intervals
    * (gram-start gap ≤ n) merge into maximal spans.
    *
    * Scale shape — LINEAR end to end, unlike the pair generators, so no
    * df cap is needed: the inverted index is a partial-aggregated
    * count-distinct on the 64-bit gram hash (a boilerplate gram in a
    * million docs is ONE index row, and it never expands pairs); marking
    * is a semi-join of the positional gram stream against the hot-key
    * side; span merging is a per-document window (state = one doc's
    * marked gram starts, bounded by doc length). Grams are compared by
    * the codegen'd [[graft.functions.GramHash]] window hash (per-token
    * hash once + O(n) fold per window — never a materialized gram
    * string) — the [[exact]]-dedup precedent for internal 64-bit
    * equality keys: a collision could in principle mark a false span,
    * at ~(corpus grams)²/2⁶⁴ odds, and would surface as a loud gate
    * mismatch, never a silent one.
    *
    * Fixed-n windows vs Lee et al.'s variable-length suffix array — the
    * coverage is PROVABLY IDENTICAL under the cross-document criterion,
    * so islands need no left/right maximal extension: a token sits inside
    * a length-≥n substring repeated in ≥ minDocs docs iff it sits inside
    * an n-token window with df ≥ minDocs (every n-window of a repeated
    * substring is itself repeated in the same docs; every hot window is
    * itself a length-n repeated substring). The PipelineSpec audit drill
    * verifies the equality exactly on randomized corpora (seed 47: all
    * 215 cross-doc-covered positions match over 10 trials). The one real
    * semantic gap is the CRITERION, not the span shape: Lee et al. count
    * ≥ 2 occurrences anywhere (within-document repeats included); this
    * family counts distinct documents — deliberate (doc-internal
    * repetition is [[graft.pipeline.TextAnalysis.repetition]]'s signal,
    * not dedup's). Measured on the drill's repeat-dense fixtures, the
    * cross-doc mask covers 64% of the any-repeat mask; the remainder is
    * entirely within-doc-only repeats. [[repeatedSpansAnyRepeat]] is the
    * paper-literal criterion for callers that want that remainder. */
  def repeatedSpans(docs: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text", n: Int = 8,
                    minDocs: Int = 2): DataFrame = {
    require(n >= 2, s"n must be >= 2, got $n")
    require(minDocs >= 2, s"minDocs must be >= 2 (cross-document), got $minDocs")
    val grams = positionalGrams(docs, idCol, textCol, n)
    val hot = grams.groupBy(col("_gh"))
      .agg(countDistinct(col("_id")).as("_df"))
      .filter(col("_df") >= minDocs)
      .select(col("_gh"))
    val marked = grams.join(hot, Seq("_gh"), "left_semi")
      .select(col("_id"), col("_pos"))
    mergeIslands(marked, n, idCol)
  }

  /** [[repeatedSpans]] under Lee et al. ACL'22's literal ANY-REPEAT
    * criterion: a gram is hot when it occurs at >= `minCount` positions
    * ANYWHERE in the corpus — within-document repeats included — instead
    * of in >= minDocs DISTINCT documents. This is the suffix-array paper's
    * actual count (>= 2 occurrences of a length->=n substring, wherever
    * they fall) and closes the measured within-doc-repeat gap of the
    * cross-doc criterion (recall 0.642 on the PipelineSpec audit's
    * repeat-dense fixtures; the spec's companion drill verifies THIS
    * variant's token coverage is EXACTLY the any-repeat maximal-substring
    * reference — the window⟺substring containment argument survives the
    * criterion change because two overlapping occurrences of a substring
    * still place each inner n-window at two distinct (doc, pos)
    * positions).
    *
    * Choose deliberately: [[repeatedSpans]] when doc-internal repetition
    * is [[graft.pipeline.TextAnalysis.repetition]]'s signal and dedup
    * should only see cross-document boilerplate; this variant when the
    * goal is the paper's de-memorization guarantee (no length->=n
    * substring appears twice in the surviving corpus, modulo island
    * granularity).
    *
    * Scale shape: identical to [[repeatedSpans]] — the ONLY change is the
    * inverted-index aggregate (count(*) instead of countDistinct(doc)),
    * which is cheaper: a plain count partial-aggregates map-side with no
    * distinct expansion, still one index row per distinct gram, and the
    * mark remains a linear semi-join. */
  def repeatedSpansAnyRepeat(docs: DataFrame, idCol: String = "doc_id",
                             textCol: String = "text", n: Int = 8,
                             minCount: Int = 2): DataFrame = {
    require(n >= 2, s"n must be >= 2, got $n")
    require(minCount >= 2, s"minCount must be >= 2 (a repeat), got $minCount")
    val grams = positionalGrams(docs, idCol, textCol, n)
    val hot = grams.groupBy(col("_gh"))
      .agg(count(lit(1)).as("_cnt"))
      .filter(col("_cnt") >= minCount)
      .select(col("_gh"))
    val marked = grams.join(hot, Seq("_gh"), "left_semi")
      .select(col("_id"), col("_pos"))
    mergeIslands(marked, n, idCol)
  }

  /** Positional n-gram hash stream (_id, _pos, _gh) — shared by the batch,
    * incremental, and index builders. */
  private[pipeline] def positionalGrams(docs: DataFrame, idCol: String, textCol: String,
                              n: Int): DataFrame =
    spread(docs)
      .select(col(idCol).as("_id"), normTokens(col(textCol)).as("_toks"))
      .filter(size(col("_toks")) >= n)
      .select(col("_id"),
        posexplode(graft.functions.GramHash.gramHashes(col("_toks"), n))
          .as(Seq("_pos", "_gh")))
      .select(col("_id"), col("_pos").cast("long").as("_pos"), col("_gh"))

  /** Merge marked gram starts (gap ≤ n) into maximal spans — per-doc
    * window, state bounded by one doc's marked grams. */
  private[pipeline] def mergeIslands(marked: DataFrame, n: Int, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("_id")).orderBy(col("_pos"))
    marked
      .withColumn("_brk",
        when(col("_pos") - lag(col("_pos"), 1).over(w) <= n, lit(0))
          .otherwise(lit(1)))
      .withColumn("_grp", sum(col("_brk")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("_id"), col("_grp"))
      .agg(min(col("_pos")).as("start_tok"),
        (max(col("_pos")) + (n - 1)).cast("long").as("end_tok"),
        count(lit(1)).as("n_grams"))
      .select(col("_id").as(idCol), col("start_tok"), col("end_tok"),
        col("n_grams"))
  }

  /** Mergeable gram document-frequency index for the repeated-span family:
    * (gh BIGINT, df BIGINT) — df = number of distinct documents containing
    * the n-gram. Indexes built over DISJOINT document sets AND THE SAME
    * GRAM LENGTH n merge by pointwise SUM (a document is assumed to arrive
    * whole in one batch — the same document-atomic ingestion contract as
    * the LSH/semDedup incremental indexes), which is what makes
    * [[repeatedSpansIncremental]] a maintained-profile operation instead
    * of a corpus rescan. The gram length is stamped into the `gh` column's
    * metadata (key `gram_n`) so a mismatched merge fails loudly instead of
    * silently summing frequencies of different-length grams; indexes built
    * by hand (without the stamp) fall back to the documented same-n
    * contract. */
  def gramDfIndex(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text", n: Int = 8): DataFrame =
    positionalGrams(docs, idCol, textCol, n)
      .select(col("_id"), col("_gh")).distinct()
      .groupBy(col("_gh")).agg(count(lit(1)).as("df"))
      .select(col("_gh").as("gh", gramNMeta(n)), col("df"))

  /** Column-metadata stamp carrying the index's gram length — survives
    * select/parquet roundtrips on the standard path; absent on hand-built
    * frames, where the scaladoc contract applies. */
  private def gramNMeta(n: Int): org.apache.spark.sql.types.Metadata =
    new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("gram_n", n.toLong).build()

  /** Loud guard: if `idx` carries a `gram_n` stamp on `gh`, it must equal
    * the caller's n. */
  private def requireSameGramN(idx: DataFrame, n: Int): Unit = {
    val f = idx.schema.fields.find(_.name == "gh")
    f.foreach { fld =>
      if (fld.metadata.contains("gram_n")) {
        val idxN = fld.metadata.getLong("gram_n")
        require(idxN == n.toLong,
          s"gram-length mismatch: baseIndex was built with n=$idxN but this " +
            s"call uses n=$n — a pointwise df merge across different gram " +
            "lengths silently corrupts hotness; rebuild one side")
      }
    }
  }

  /** CDC member of the span family (the d_minhash_incr /
    * appendToLshIndex shape): given the maintained [[gramDfIndex]] of the
    * BASE corpus and a batch of NEW documents, return
    * (mergedIndex, spans) where `spans` are [[repeatedSpans]] over the
    * NEW documents with hotness judged against base ∪ delta — identical
    * to what a full-corpus run would emit for those documents. The
    * standard incremental caveat applies symmetrically to the base side:
    * spans inside OLD documents whose grams only now crossed `minDocs`
    * are not re-emitted (re-mask the base on its own maintenance
    * schedule, exactly like the LSH index's periodic recluster).
    *
    * Scale shape: one scan of the DELTA only; the index join is
    * gh-keyed (bounded by distinct grams, never positions); nothing
    * base-corpus-proportional is rescanned.
    *
    * Contract: `baseIndex` must have been built with the SAME gram length
    * `n` and over documents DISJOINT from `newDocs` — the merge is a blind
    * pointwise df sum on gh, so a violated contract produces wrong hotness,
    * not an error. The standard builder stamps n into the index
    * ([[gramDfIndex]]); a stamped mismatch fails loudly here. */
  def repeatedSpansIncremental(baseIndex: DataFrame, newDocs: DataFrame,
                               idCol: String = "doc_id",
                               textCol: String = "text", n: Int = 8,
                               minDocs: Int = 2): (DataFrame, DataFrame) = {
    require(n >= 2, s"n must be >= 2, got $n")
    require(minDocs >= 2, s"minDocs must be >= 2 (cross-document), got $minDocs")
    requireSameGramN(baseIndex, n)
    val grams = positionalGrams(newDocs, idCol, textCol, n)
    val deltaIdx = grams.select(col("_id"), col("_gh")).distinct()
      .groupBy(col("_gh")).agg(count(lit(1)).as("df"))
      .select(col("_gh").as("gh"), col("df"))
    val merged = baseIndex.select(col("gh"), col("df"))
      .unionByName(deltaIdx)
      .groupBy(col("gh")).agg(sum(col("df")).as("df"))
      .select(col("gh").as("gh", gramNMeta(n)), col("df"))
    val hot = merged.filter(col("df") >= minDocs).select(col("gh").as("_gh"))
    val marked = grams.join(hot, Seq("_gh"), "left_semi")
      .select(col("_id"), col("_pos"))
    (merged, mergeIslands(marked, n, idCol))
  }

  /** Apply the [[repeatedSpans]] mask: drop every token covered by a
    * cross-document repeated n-gram — in EVERY document (the conservative
    * de-memorization variant: repeated substrings are removed everywhere,
    * the policy for boilerplate/license blocks where no copy is wanted;
    * [[removeRepeatedSpansKeepOne]] is the keep-one-copy variant that
    * retains each repeated substring's first corpus occurrence).
    *
    * Returns one row per input document: (idCol, n_kept, text_fp) —
    * n_kept = surviving token count, text_fp = Poly64+mix64 fingerprint
    * of the surviving tokens rejoined with single spaces (fully-covered
    * and NULL-text docs fingerprint the empty string) — the same narrow
    * gated shape as [[lineDedup]].
    *
    * Scale shape: the mask join is a position-level left_anti on
    * (doc, pos) — shuffles ∝ corpus tokens, hash-uniform on doc id; the
    * rebuild groupBy collects one doc's surviving tokens (bounded by doc
    * length, the lineDedup reassembly bound). */
  def removeRepeatedSpans(docs: DataFrame, idCol: String = "doc_id",
                          textCol: String = "text", n: Int = 8,
                          minDocs: Int = 2): DataFrame =
    applySpanMask(docs, repeatedSpans(docs, idCol, textCol, n, minDocs),
      idCol, textCol)

  /** The applied [[repeatedSpansAnyRepeat]] mask — remove-everywhere under
    * the any-repeat criterion (within-document repeats masked too): the
    * paper-literal de-memorization pass. Same narrow output shape and
    * position-level left_anti scale shape as [[removeRepeatedSpans]]. */
  def removeRepeatedSpansAny(docs: DataFrame, idCol: String = "doc_id",
                             textCol: String = "text", n: Int = 8,
                             minCount: Int = 2): DataFrame =
    applySpanMask(docs,
      repeatedSpansAnyRepeat(docs, idCol, textCol, n, minCount),
      idCol, textCol)

  /** The keep-one-copy span policy (Lee et al. ACL'22's deployed variant:
    * one canonical occurrence of each repeated substring survives, the
    * rest are removed) — the [[lineDedup]] winner rule lifted to span
    * grams: per cross-document-hot n-gram, the first corpus occurrence
    * (min packed (doc, pos), the lineDedup ord) is the KEEPER and its
    * positions stay; every other occurrence is masked. Same output shape
    * as [[removeRepeatedSpans]]: (idCol, n_kept, text_fp).
    *
    * A keeper's tokens survive only if no OTHER hot gram's non-keeper
    * occurrence covers them — the mask is the union of non-keeper
    * intervals, so overlapping boilerplate still wins conservatively.
    *
    * Scale shape: identical to the remove-everywhere path plus one min
    * aggregate on the SAME gram-hash groupBy (the keeper argmin rides the
    * df shuffle for free); the keeper filter is rowwise after the hot
    * semi-join. Positions are packed as (doc_id << 20) + pos — the
    * lineDedup 20-bit position convention; a doc longer than 2^20 tokens
    * raises loudly ([[packOrd]]) instead of silently electing a wrong
    * keeper — chunk such documents first. */
  def removeRepeatedSpansKeepOne(docs: DataFrame, idCol: String = "doc_id",
                                 textCol: String = "text", n: Int = 8,
                                 minDocs: Int = 2): DataFrame = {
    require(n >= 2, s"n must be >= 2, got $n")
    require(minDocs >= 2, s"minDocs must be >= 2 (cross-document), got $minDocs")
    val PosBits = 20
    val grams = positionalGrams(docs, idCol, textCol, n)
      .withColumn("_ord", packOrd(col("_id"), col("_pos"), PosBits))
    val hot = grams.groupBy(col("_gh"))
      .agg(countDistinct(col("_id")).as("_df"), min(col("_ord")).as("_w"))
      .filter(col("_df") >= minDocs)
      .select(col("_gh"), col("_w"))
    val marked = grams.join(hot, Seq("_gh"))
      .filter(col("_ord") =!= col("_w"))
      .select(col("_id"), col("_pos"))
    applySpanMask(docs, mergeIslands(marked, n, idCol), idCol, textCol)
  }

  /** Shared mask applier: drop every token position covered by `spans`
    * ([idCol, start_tok, end_tok, ...] over 0-based normalized-token
    * positions), rebuild the survivors in position order, and fingerprint —
    * the (idCol, n_kept, text_fp) gated shape. Position-level left_anti ∝
    * corpus tokens; per-doc rebuild bounded by doc length. */
  private[pipeline] def applySpanMask(docs: DataFrame, spans: DataFrame,
                            idCol: String, textCol: String): DataFrame = {
    val covered = spans.select(col(idCol).as("_id"),
      explode(sequence(col("start_tok"), col("end_tok"))).as("_pos"))
    // spread() before the row expansion, same as the span-detection branch:
    // a one-row-group parquet corpus would otherwise tokenize+explode in a
    // single task
    val pos = spread(docs)
      .select(col(idCol).as("_id"), normTokens(col(textCol)).as("_toks"))
      .select(col("_id"), posexplode(col("_toks")).as(Seq("_pos", "_tok")))
      .withColumn("_pos", col("_pos").cast("long"))
    val rebuilt = pos.join(covered, Seq("_id", "_pos"), "left_anti")
      .groupBy(col("_id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("_pos"), col("_tok")))),
          s => s.getField("_tok")), " ").as("_txt"))
    docs.select(col(idCol).as("_id"))
      .join(rebuilt, Seq("_id"), "left_outer")
      .select(col("_id").as(idCol),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        graft.functions.Poly64.mix64(graft.functions.Poly64.poly64(
          coalesce(col("_txt"), lit("")))).as("text_fp"))
  }

  /** C4's deduplication unit (Raffel et al. JMLR'20 §2.2: "we discarded
    * all but one of any three-sentence span occurring more than once in
    * the data set") — keep-one dedup over n-SENTENCE windows. Sentences
    * are newline-separated units (run a sentence segmenter upstream — the
    * [[lineDedup]] contract). Hotness is the paper's any-repeat criterion
    * (>= 2 occurrences anywhere, within-document included); the keeper is
    * the first corpus occurrence (min packed (doc, sentence) ordinal, the
    * lineDedup winner rule); every other occurrence drops its whole
    * [pos, pos+n-1] sentence window. Survivors rebuild in order, joined
    * by newlines. Output: (idCol, n_kept, text_fp) — n_kept = surviving
    * SENTENCE count, text_fp = Poly64+mix64 of the rebuilt text.
    *
    * Scale shape: [[removeRepeatedSpansKeepOne]] lifted one granularity
    * level — the window-hash stream is linear (codegen'd GramHash over
    * the sentence array: per-sentence hash once + O(n) fold per window),
    * hotness AND the keeper argmin ride ONE groupBy on the 64-bit window
    * hash, masking is a position-level left_anti, the rebuild groupBy is
    * bounded by one document's sentence count. A boilerplate block in a
    * million documents is one index row — never pair expansion. */
  def sentenceSpanDedup(docs: DataFrame, idCol: String = "doc_id",
                        textCol: String = "text", n: Int = 3): DataFrame = {
    require(n >= 2, s"n must be >= 2, got $n")
    val PosBits = 20
    val base = spread(docs).select(col(idCol).as("_id"),
      split(coalesce(col(textCol), lit("")), "\n", -1).as("_lines"))
    val grams = base
      .filter(size(col("_lines")) >= n)
      .select(col("_id"),
        posexplode(graft.functions.GramHash.gramHashes(col("_lines"), n))
          .as(Seq("_pos", "_gh")))
      .select(col("_id"), col("_pos").cast("long").as("_pos"), col("_gh"))
      .withColumn("_ord", packOrd(col("_id"), col("_pos"), PosBits))
    val hot = grams.groupBy(col("_gh"))
      .agg(count(lit(1)).as("_cnt"), min(col("_ord")).as("_w"))
      .filter(col("_cnt") >= 2)
      .select(col("_gh"), col("_w"))
    val covered = grams.join(hot, Seq("_gh"))
      .filter(col("_ord") =!= col("_w"))
      .select(col("_id"),
        explode(sequence(col("_pos"), col("_pos") + (n - 1))).as("_pos"))
    val pos = base.select(col("_id"),
        posexplode(col("_lines")).as(Seq("_pos", "_line")))
      .withColumn("_pos", col("_pos").cast("long"))
    val rebuilt = pos.join(covered, Seq("_id", "_pos"), "left_anti")
      .groupBy(col("_id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("_pos"), col("_line")))),
          s => s.getField("_line")), "\n").as("_txt"))
    docs.select(col(idCol).as("_id"))
      .join(rebuilt, Seq("_id"), "left_outer")
      .select(col("_id").as(idCol),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        graft.functions.Poly64.mix64(graft.functions.Poly64.poly64(
          coalesce(col("_txt"), lit("")))).as("text_fp"))
  }

  // -------------------------------------------------------------------------
  // CDC chunk-fingerprint dedup candidates
  // -------------------------------------------------------------------------

  /** Chunk-level near-dup candidate pairs: documents sharing ≥ 1
    * content-defined chunk (Rabin-style rolling-hash boundaries, so the
    * shared-span detection is insertion-stable) of ≥ `minChunkLen` code
    * points. Same inverted-index shape as the n-gram pipeline — pairs come
    * from an equi-join on the chunk fingerprint, never an O(n²) text
    * compare.
    *
    * `maxDf` is the HOT-FINGERPRINT cap, the exact analog of the n-gram
    * pipeline's stop-shingle cut: a boilerplate chunk (license header,
    * nav bar) shared by B documents would otherwise emit B² candidate
    * pairs through the self-join — the one unbounded blowup this index
    * shape admits. Fingerprints with document frequency > maxDf are
    * dropped from the index BEFORE the join, bounding any fingerprint's
    * contribution to maxDf² pairs; a boilerplate chunk is definitionally
    * not dedup evidence, exactly as a stop-shingle is not similarity
    * evidence. Returns (a, b, shared) with a < b, shared = number of
    * co-occurring (non-hot) chunk fingerprints. */
  def cdcChunkPairs(docs: DataFrame, textCol: String = "text",
                    idCol: String = "doc_id", minChunkLen: Int = 16,
                    maxDf: Int = 1024): DataFrame = {
    require(minChunkLen >= 1, "minChunkLen must be positive")
    require(maxDf >= 2, "maxDf must be at least 2 (a pair needs df 2)")
    val ch = docs
      .select(col(idCol),
        explode(graft.functions.Poly64.cdcChunkInfoCol(col(textCol))).as("c"))
      .filter(col("c.chunk_len") >= minChunkLen)
      .select(col(idCol), col("c.chunk_fp").as("fp"))
      .distinct()
    val hot = ch.groupBy(col("fp")).agg(count(lit(1)).as("_df"))
      .filter(col("_df") > maxDf).select(col("fp"))
    val kept = ch.join(hot, Seq("fp"), "left_anti")
    kept.as("x").join(kept.as("y"),
        col("x.fp") === col("y.fp") && col(s"x.$idCol") < col(s"y.$idCol"))
      .groupBy(col(s"x.$idCol").as("a"), col(s"y.$idCol").as("b"))
      .agg(count(lit(1)).as("shared"))
  }
}

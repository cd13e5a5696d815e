package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/**
 * Similarity search over an embedding column (array<float|double>).
 *
 * - `bruteForceKnn` — exact cosine top-k: a crossJoin + codegen'd
 *   zip_with/aggregate dot product + per-query window top-k. The correctness
 *   baseline; O(N·Q) — use only when one side is small enough to broadcast.
 * - `ivfKnn` — the scale path: k-means-style coarse quantizer (IVF). Vectors
 *   are partitioned into nlist cells by nearest centroid; a query only scans
 *   its nprobe closest cells, so the join is an equi-join on cell id and each
 *   probe touches ~nprobe/nlist of the corpus. Centroids are tiny and
 *   broadcast; at 100 TB the big side shuffles ONCE at index build.
 * - `lshKnn` — random-hyperplane bucket variant (no training pass): sign-bit
 *   bucket equality as the candidate filter, multi-probe over Hamming-adjacent
 *   buckets for recall.
 */
object Ann {
  import graft.functions.VectorExpressions.{dot => vdot, l2norm, squaredDistance}

  /** Cosine similarity of two equally-sized numeric array columns — native
    * codegen'd expressions (graft.functions.VectorExpressions), not
    * interpreted HOFs: this runs N·Q times in brute-force KNN. */
  def cosine(a: Column, b: Column): Column = {
    val na = l2norm(a); val nb = l2norm(b)
    when(na > 0 && nb > 0, vdot(a, b) / (na * nb)).otherwise(lit(0.0))
  }

  /** Deterministic random-hyperplane bucket: `bits` sign bits, one per
    * Rademacher (±1) hyperplane (Achlioptas 2003: ±1 projections carry the
    * same JL/angle guarantees as Gaussian ones). Component i of hyperplane b
    * is ±1 chosen by one bit of an integer mix of (b, i) — no stored model,
    * identical on every executor and every run, and exactly reproducible in
    * an external SQL oracle (plain 64-bit integer arithmetic, no float RNG).
    *
    * Codegen'd native expression (VectorExpressions.HyperplaneBucket): this
    * runs per corpus row AND per multi-probe query row in lshKnn /
    * embeddingDedup, and the interpreted HOF stack (`hyperplaneBucketHof`,
    * kept as the spec-pinned reference formulation) was the #2 bench query. */
  def hyperplaneBucket(v: Column, bits: Int): Column =
    graft.functions.VectorExpressions.hyperplaneBucket(v, bits)

  /** Declarative HOF reference formulation of `hyperplaneBucket` (kept for
    * the equivalence spec + as documentation of semantics). */
  private[graft] def hyperplaneBucketHof(v: Column, bits: Int): Column = {
    // sign(b, i) = bit 16 of (b·1000003 + i)·2654435761  →  ±1.0
    def sign(b: Int, i: Column): Column =
      when(shiftright((lit(b * 1000003L) + i) * lit(2654435761L), 16) % 2 === 0,
        lit(1.0)).otherwise(lit(-1.0))
    def proj(b: Int): Column = aggregate(
      zip_with(v, sequence(lit(0), size(v) - 1), (x, i) => x * sign(b, i)),
      lit(0.0d), (acc, x) => acc + x)
    (0 until bits).map(b => when(proj(b) >= 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ + _)
  }

  /** L2-normalize a vector column (zero vectors pass through unchanged). */
  def l2normalize(v: Column): Column = {
    val n = l2norm(v.cast("array<double>"))
    when(n > 0, transform(v, x => x / n)).otherwise(v)
  }

  /** Exact cosine top-k neighbors for every query vector.
    * Returns (queryIdCol, neighborId, sim, rank). Self-matches excluded when
    * queries and corpus share ids.
    *
    * Perf: vectors are L2-normalized ONCE per side (O(N+Q) array passes), so
    * the O(N·Q) inner loop is a single dot product; k=1 skips the per-query
    * sort entirely (max_by-style aggregation instead of a window). */
  def bruteForceKnn(corpus: DataFrame, queries: DataFrame, k: Int,
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    excludeSelf: Boolean = true): DataFrame = {
    val c = corpus.select(col(idCol).as("nbr_id"), l2normalize(col(vecCol)).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), l2normalize(col(vecCol)).as("qv"))
    val joined = q.join(broadcast(c),
      if (excludeSelf) col("query_id") =!= col("nbr_id") else lit(true))
      .withColumn("sim", vdot(col("qv").cast("array<double>"), col("cv").cast("array<double>")))
    if (k == 1) {
      // argmax by (sim desc, nbr_id asc): one hash-agg pass, no sort
      joined.groupBy(col("query_id"))
        .agg(max(struct(col("sim"), (-col("nbr_id")).as("negId"))).as("best"))
        .select(col("query_id"), (-col("best.negId")).cast("long").as("nbr_id"),
          col("best.sim").as("sim"), lit(1).as("rank"))
    } else {
      val w = Window.partitionBy(col("query_id")).orderBy(desc("sim"), asc("nbr_id"))
      joined.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select(col("query_id"), col("nbr_id"), col("sim"), col("rank"))
    }
  }

  /** Train `nlist` centroids with `iters` Lloyd iterations (k-means over the
    * embedding column; deterministic hash-based init). Returns
    * (centroid_id, centroid array<double>). Centroid count is small — this is
    * the IVF coarse quantizer, not a general-purpose k-means. */
  def trainCentroids(corpus: DataFrame, nlist: Int, iters: Int = 5,
                     idCol: String = "vec_id", vecCol: String = "embedding",
                     hashInit: Boolean = true): DataFrame = {
    val v = corpus.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // deterministic init: hashInit=true seeds from the nlist vectors with the
    // smallest xxhash64(id) (decorrelates the seed set from id order);
    // hashInit=false seeds from the nlist smallest ids — same quality on
    // unordered data, and expressible in ANSI SQL for oracle verification.
    var centroids =
      if (hashInit)
        v.withColumn("h", xxhash64(col("id")))
          .orderBy("h").limit(nlist)
          .select((row_number().over(Window.orderBy("h")) - 1).as("centroid_id"), col("v").as("centroid"))
      else
        v.orderBy("id").limit(nlist)
          .select((row_number().over(Window.orderBy("id")) - 1).as("centroid_id"), col("v").as("centroid"))
    for (_ <- 0 until iters) {
      // materialize centroids per Lloyd round: they are joined twice and the
      // plan would otherwise re-run every previous round on each action
      centroids = centroids.localCheckpoint(true)
      val assigned = assignCells(v, centroids, "v")
      // element-wise mean per cell: posexplode → avg per (cell, pos) →
      // reassemble in position order. Two shuffles on small keys.
      centroids = assigned.join(v, Seq("id"))
        .select(col("cell"), posexplode(col("v")))
        .groupBy(col("cell"), col("pos")).agg(avg(col("col")).as("m"))
        .groupBy(col("cell").as("centroid_id"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("centroid"))
    }
    centroids
  }

  /** Assign each vector to its nearest centroid (L2). Centroids are broadcast. */
  def assignCells(vectors: DataFrame, centroids: DataFrame, vecCol: String): DataFrame = {
    val joined = vectors.crossJoin(broadcast(centroids))
      .withColumn("d2", squaredDistance(col(vecCol), col("centroid")))
    val w = Window.partitionBy(col("id")).orderBy(asc("d2"), asc("centroid_id"))
    joined.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("id"), col("centroid_id").as("cell"))
  }

  /** IVF approximate top-k: index = assign corpus to cells; query probes its
    * `nprobe` nearest cells only. */
  def ivfKnn(corpus: DataFrame, queries: DataFrame, k: Int,
             nlist: Int = 64, nprobe: Int = 8, iters: Int = 3,
             idCol: String = "vec_id", vecCol: String = "embedding",
             excludeSelf: Boolean = true, hashInit: Boolean = true): DataFrame = {
    val c = corpus.select(col(idCol).as("nbr_id"), col(vecCol).cast("array<double>").as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("qv"))
    val centroids = trainCentroids(corpus, nlist, iters, idCol, vecCol, hashInit)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val corpusCells = assignCells(c.withColumnRenamed("nbr_id", "id"), centroids, "cv")
      .toDF("nbr_id", "cell")
    val indexed = c.join(corpusCells, Seq("nbr_id"))
    // query → nprobe nearest cells
    val qCells = q.crossJoin(broadcast(centroids))
      .withColumn("d2", squaredDistance(col("qv"), col("centroid")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(asc("d2"), asc("centroid_id"))))
      .filter(col("rn") <= nprobe)
      .select(col("query_id"), col("qv"), col("centroid_id").as("cell"))
    val joined = qCells.join(indexed, Seq("cell"))
      .filter(if (excludeSelf) col("query_id") =!= col("nbr_id") else lit(true))
      .withColumn("sim", cosine(col("qv"), col("cv")))
    joined.withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(desc("sim"), asc("nbr_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("nbr_id"), col("sim"), col("rank"))
  }

  /** LSH-bucketed approximate top-k (no training pass): candidates share the
    * hyperplane sign bucket; `probes` extra buckets within Hamming distance 1
    * improve recall. */
  def lshKnn(corpus: DataFrame, queries: DataFrame, k: Int, bits: Int = 12,
             multiProbe: Boolean = true,
             idCol: String = "vec_id", vecCol: String = "embedding",
             excludeSelf: Boolean = true): DataFrame = {
    val c = corpus.select(col(idCol).as("nbr_id"), col(vecCol).cast("array<double>").as("cv"))
      .withColumn("bucket", hyperplaneBucket(col("cv"), bits))
    val q0 = queries.select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("qv"))
      .withColumn("b0", hyperplaneBucket(col("qv"), bits))
    // multi-probe: original bucket + each single-bit flip
    val q = if (!multiProbe) q0.withColumn("bucket", col("b0"))
      else q0.select(col("query_id"), col("qv"), col("b0"), explode(
        array((lit(-1) +: (0 until bits).map(lit(_))): _*)).as("flip"))
        .withColumn("bucket",
          when(col("flip") === -1, col("b0"))
            .otherwise(col("b0").bitwiseXOR(call_function("shiftleft", lit(1L), col("flip")))))
    val joined = q.join(c, Seq("bucket"))
      .filter(if (excludeSelf) col("query_id") =!= col("nbr_id") else lit(true))
      .withColumn("sim", cosine(col("qv"), col("cv")))
      .select(col("query_id"), col("nbr_id"), col("sim")).distinct()
    joined.withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(desc("sim"), asc("nbr_id"))))
      .filter(col("rank") <= k)
  }
}

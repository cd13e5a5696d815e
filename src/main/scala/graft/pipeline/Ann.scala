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

  /** Johnson–Lindenstrauss Rademacher projection (Achlioptas 2003 ±1
    * form): project each embedding onto `outDim` deterministic ±1
    * hyperplanes — the standard dimensionality squeeze for cluster-scale
    * embedding pipelines: pairwise distances survive within (1 ± ε) at
    * outDim = O(ln n / ε²), so candidate generation runs on vectors
    * dim/outDim× smaller and full-dim cosine re-verifies survivors only.
    * Component signs are [[hyperplaneBucket]]'s integer mix — no stored
    * model, identical on every executor and run, SQL-replayable. Returns
    * (idCol, proj) with proj[b] = Σ_i v_i·sign(b, i) / √outDim (the JL
    * scaling). Rowwise, zero shuffle. */
  def rpProject(vecs: DataFrame, outDim: Int, idCol: String = "vec_id",
                vecCol: String = "embedding"): DataFrame = {
    require(outDim >= 1 && outDim <= 512, s"outDim must be in [1, 512], got $outDim")
    val v = col(vecCol).cast("array<double>")
    val scale = 1.0 / math.sqrt(outDim.toDouble)
    def sign(b: Int, i: Column): Column =
      when(shiftright((lit(b * 1000003L) + i) * lit(2654435761L), 16) % 2 === 0,
        lit(1.0)).otherwise(lit(-1.0))
    val comps = (0 until outDim).map { b =>
      aggregate(zip_with(v, sequence(lit(0), size(v) - 1),
          (x, i) => x * sign(b, i)),
        lit(0.0d), (acc, x) => acc + x) * lit(scale)
    }
    vecs.select(col(idCol), array(comps: _*).as("proj"))
  }

  /** The exact-integer shadow of [[rpProject]]: inputs micro-quantized
    * (⌊x·10⁶ + 0.5⌋ — the engine-agreed floor(+0.5) convention), each
    * component accumulated as a LONG (exact — no float association
    * anywhere), unscaled by √outDim. Returns (idCol, b, y_micro) rows —
    * the hash-gateable form (the hitsCounts / hyperBallTrajectory
    * integer-shadow discipline). */
  def rpProjectMicro(vecs: DataFrame, outDim: Int, idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    require(outDim >= 1 && outDim <= 512, s"outDim must be in [1, 512], got $outDim")
    val q = transform(col(vecCol).cast("array<double>"),
      x => floor(x * 1e6 + 0.5).cast("long"))
    def signL(b: Int, i: Column): Column =
      when(shiftright((lit(b * 1000003L) + i) * lit(2654435761L), 16) % 2 === 0,
        lit(1L)).otherwise(lit(-1L))
    val comps = (0 until outDim).map { b =>
      aggregate(zip_with(q, sequence(lit(0), size(q) - 1),
        (x, i) => x * signL(b, i)), lit(0L), (acc, x) => acc + x)
    }
    vecs.select(col(idCol), posexplode(array(comps: _*)).as(Seq("b", "y_micro")))
      .select(col(idCol), col("b").cast("int").as("b"), col("y_micro"))
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
      // bounded top-k aggregate (O(k) state, map-side combinable) — same
      // (sim desc, nbr_id asc) order a row_number window gives, without
      // sorting all |Q|·|N| scored rows
      Curation.topKRanked(joined.select(col("query_id"), col("nbr_id"),
          col("sim").cast("double").as("sim")), "query_id", "sim", "nbr_id", k)
        .select(col("query_id"), col("nbr_id"), col("sim"), col("rank"))
    }
  }

  /** Per-dimension SQ8 (scalar 8-bit) quantizer bounds: (lo, step) arrays
    * with `step = (hi − lo)/255` from the corpus min/max of each dimension.
    * One combinable posexplode + groupBy pass; the result is `dim` rows —
    * collected once and broadcast as literals into the encode/decode
    * expressions (same broadcast-basis shape as the PCA projection). */
  def sq8Train(corpus: DataFrame, vecCol: String = "embedding"): (Array[Double], Array[Double]) = {
    val stats = corpus
      .select(posexplode(col(vecCol).cast("array<double>")).as(Seq("i", "x")))
      .groupBy(col("i")).agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
      .orderBy(col("i")).collect()
    (stats.map(_.getDouble(1)),
      stats.map(r => (r.getDouble(2) - r.getDouble(1)) / 255.0))
  }

  /** SQ8 encode: `code[i] = round((x[i] − lo[i]) / step[i])` ∈ [0, 255] as
    * array<int> — 4× (8× vs double) memory compression for ANN state, the
    * standard faiss `SQ8` trade. Rowwise codegen'd zip_with chain over the
    * broadcast bounds; constant dimensions (step 0) encode as 0. */
  def sq8Encode(vectors: DataFrame, los: Array[Double], steps: Array[Double],
                idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val lo = typedLit(los.toSeq); val st = typedLit(steps.toSeq)
    vectors.select(col(idCol),
      zip_with(
        zip_with(col(vecCol).cast("array<double>"), lo, (x, l) => x - l),
        st, (d, s) => when(s > 0, round(d / s)).otherwise(lit(0.0)).cast("int"))
        .as("code"))
  }

  /** SQ8 asymmetric kNN: corpus vectors are dequantized from their 8-bit
    * codes (`lo + code·step`), queries stay full-precision — the accuracy-
    * preserving direction (only one side carries quantization error).
    * Search itself is delegated to [[bruteForceKnn]] over the reconstructed
    * corpus; at graph scale feed the reconstruction into
    * [[knnGraphBlocked]] instead. */
  def sq8Knn(corpus: DataFrame, queries: DataFrame, k: Int,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val (los, steps) = sq8Train(corpus, vecCol)
    val lo = typedLit(los.toSeq); val st = typedLit(steps.toSeq)
    val recon = sq8Encode(corpus, los, steps, idCol, vecCol)
      .select(col(idCol),
        zip_with(
          zip_with(col("code").cast("array<double>"), st, (c, s) => c * s),
          lo, (y, l) => y + l).as(vecCol))
    bruteForceKnn(recon, queries, k, idCol, vecCol)
  }

  /** Full k-NN GRAPH over a corpus — every vector's `k` nearest others —
    * WITHOUT broadcasting the corpus (the [[bruteForceKnn]] precondition that
    * breaks first at scale: a kNN graph's "query set" IS the corpus).
    * Block-nested-loop join: vectors are hashed into `blocks` buckets; the
    * query side is replicated once per bucket (communication O(B·n), tunable)
    * and equi-joined on the bucket id, so each task scores one bounded
    * |corpus|/B tile — never an unpartitioned cartesian. Per-tile top-k
    * partials come from the bounded-heap aggregate's map-side combine
    * (O(k) state per query per partition) and merge into the global top-k in
    * one shuffle of n·B·k partial rows. At 1000 executors, raise `blocks` so
    * a tile fits in memory; total work stays the same O(n²) dot products —
    * this is the exact-graph baseline the IVF/PQ paths approximate. */
  def knnGraphBlocked(corpus: DataFrame, k: Int, blocks: Int = 8,
                      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val v = corpus.select(col(idCol).as("id"),
      l2normalize(col(vecCol)).cast("array<double>").as("v"))
    val blockIds = corpus.sparkSession.range(0, blocks)
      .select(col("id").cast("int").as("cb"))
    val q = v.select(col("id").as("query_id"), col("v").as("qv"))
      .crossJoin(broadcast(blockIds))
    val c = v.select(col("id").as("nbr_id"), col("v").as("cv"),
      pmod(xxhash64(col("id")), lit(blocks)).cast("int").as("cb"))
    val scored = q.join(c, Seq("cb"))
      .filter(col("query_id") =!= col("nbr_id"))
      .select(col("query_id"), col("nbr_id"),
        vdot(col("qv"), col("cv")).as("sim"))
    Curation.topKRanked(scored, "query_id", "sim", "nbr_id", k)
      .select(col("query_id"), col("nbr_id"), col("sim"), col("rank"))
  }

  /** Mutual-kNN clustering: connected components over the UNDIRECTED graph
    * whose edges are RECIPROCATED kNN links (a ∈ knn(b) ∧ b ∈ knn(a)) — the
    * classic density-robust grouping for embedding-space corpus exploration
    * (mutuality prunes hub-induced chains that plain kNN-CC would merge).
    * Graph from [[knnGraphBlocked]]; mutuality via a self left-semi join on
    * the reversed pair; components from the library's own log-rounds WCC
    * (large/small-star contraction — mutual-kNN chains give min-label
    * propagation its worst case, O(chain length) supersteps, where the
    * contraction converges in O(log n) rounds). Returns (id, value =
    * component min id) over ALL vectors — isolated ones stay singleton
    * components. */
  def mutualKnnComponents(corpus: DataFrame, k: Int, blocks: Int = 8,
                          idCol: String = "vec_id",
                          vecCol: String = "embedding"): DataFrame = {
    // localCheckpoint: the graph feeds BOTH sides of the mutuality
    // self-join and then an iterative WCC — without truncation the full
    // blocked kNN recomputes once per reference
    val ed = knnGraphBlocked(corpus, k, blocks, idCol, vecCol)
      .select(col("query_id").as("a"), col("nbr_id").as("b"))
      .localCheckpoint(true)
    val mutual = ed
      .join(ed.select(col("b").as("a"), col("a").as("b")), Seq("a", "b"), "left_semi")
      .filter(col("a") < col("b"))
      .select(col("a").as("src"), col("b").as("dst"), lit(1L).as("value"))
      .localCheckpoint(true)
    val verts = corpus.select(col(idCol).as("id"), col(idCol).as("value"))
      .localCheckpoint(true)
    graft.algos.GraphAlgorithms.wccLogRounds(graft.core.KGraph(verts, mutual))
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
      // plan would otherwise re-run every previous round on each action.
      // coalesce(1) first — the frame is nlist rows and always broadcast
      // downstream, so its partitioning is irrelevant, and the eager
      // checkpoint job schedules 1 task instead of shuffle.partitions tasks
      centroids = centroids.coalesce(1).localCheckpoint(true)
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

  /** Assign each vector to its nearest centroid (L2). Centroids are broadcast.
    * Argmin = `min(struct(d2, centroid_id))` — ties to the lowest id, same
    * ordering a `row_number` window would give, but as a hash aggregate with
    * map-side combine instead of a per-vector sort (at 100 TB the sort is a
    * full extra pass; the aggregate folds during the broadcast-join scan). */
  def assignCells(vectors: DataFrame, centroids: DataFrame, vecCol: String): DataFrame =
    vectors.crossJoin(broadcast(centroids))
      .withColumn("d2", squaredDistance(col(vecCol), col("centroid")))
      .groupBy(col("id"))
      .agg(min(struct(col("d2"), col("centroid_id"))).as("_m"))
      .select(col("id"), col("_m.centroid_id").as("cell"))

  /** Recall@k report: fraction of the EXACT top-k each approximate search
    * recovered, per query — the number that justifies (or indicts) an ANN
    * configuration before it ships. Both inputs are (query_id, nbr_id)
    * result sets; output is (query_id, hits, k) with hits = |exact ∩
    * approx| and k = |exact| for that query — exact integers, so the report
    * hash-gates across engines (a ratio would not). Aggregate recall =
    * Σhits/Σk, computed downstream. Scale: one hash join on the RESULT
    * frames (|Q|·k rows), independent of corpus size. */
  def recallAtK(exact: DataFrame, approx: DataFrame): DataFrame =
    exact.join(approx.withColumn("hit", lit(1)), Seq("query_id", "nbr_id"), "left")
      .groupBy(col("query_id"))
      .agg(sum(coalesce(col("hit"), lit(0))).cast("long").as("hits"),
        count(lit(1)).as("k"))

  /** Reciprocal-rank fusion (Cormack et al. 2009) — THE standard hybrid
    * retrieval combiner: each ranking contributes 1/(c + rank) per doc, so
    * scores from incommensurable systems (BM25 vs cosine) fuse without any
    * scale calibration. Computed in exact integer micro-units
    * (`1e6 DIV (c + rank)`) so the fused score is engine- and
    * order-exact. Inputs are (id, rank) frames; absent ranks contribute 0
    * and surface as rank 0. One full-outer hash join on id. */
  def rrfFuse(a: DataFrame, b: DataFrame, c: Int = 60): DataFrame = {
    require(c >= 1, "rrf constant must be positive")
    a.select(col("id"), col("rank").cast("long").as("rank_a"))
      .join(b.select(col("id"), col("rank").cast("long").as("rank_b")),
        Seq("id"), "full_outer")
      .select(col("id"),
        coalesce(col("rank_a"), lit(0L)).as("rank_a"),
        coalesce(col("rank_b"), lit(0L)).as("rank_b"),
        (coalesce(expr(s"1000000 DIV ($c + rank_a)"), lit(0L)) +
          coalesce(expr(s"1000000 DIV ($c + rank_b)"), lit(0L))).as("rrf_micro"))
  }

  /** Global top-k with dense 1..k ranks, WITHOUT a global window. An
    * unpartitioned `row_number().over(Window.orderBy(...))` forces the whole
    * scored corpus into ONE task (Spark's `WindowExec: No Partition Defined`
    * warning) — a single-task sort of the corpus at 100 TB. Instead:
    * `orderBy(...).limit(k)` plans as TakeOrderedAndProject — every partition
    * keeps a bounded k-row heap, the driver merges ≤ k rows per partition —
    * then ranks are assigned by sorting the ≤ k survivors inside one
    * `sort_array(collect_list(...))` + `posexplode`. Zero WindowExec nodes in
    * the plan; only ever k rows cross the final single-partition boundary.
    *
    * Ordering is (score DESC, id ASC) — the retrieval tie-break used by every
    * ranked arm here — implemented as an ascending struct sort on
    * (-score, id), so `score` must be numeric (negation-safe: bigint micro
    * scores, finite doubles). Output: (id, rank) with rank 1..k, the shape
    * [[rrfFuse]] consumes. */
  def rankTopK(scored: DataFrame, scoreCol: String, idCol: String,
               k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    scored
      .orderBy(col(scoreCol).desc, col(idCol).asc)
      .limit(k)
      .agg(sort_array(collect_list(struct(
        negate(col(scoreCol)).as("ns"), col(idCol).as("id")))).as("top"))
      .select(posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("s.id").as("id"), (col("pos") + 1).cast("long").as("rank"))
  }

  /** IVF approximate top-k: index = assign corpus to cells; query probes its
    * `nprobe` nearest cells only. */
  def ivfKnn(corpus: DataFrame, queries: DataFrame, k: Int,
             nlist: Int = 64, nprobe: Int = 8, iters: Int = 3,
             idCol: String = "vec_id", vecCol: String = "embedding",
             excludeSelf: Boolean = true, hashInit: Boolean = true): DataFrame = {
    val c = corpus.select(col(idCol).as("nbr_id"), col(vecCol).cast("array<double>").as("cv"))
    val centroids = trainCentroids(corpus, nlist, iters, idCol, vecCol, hashInit)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val corpusCells = assignCells(c.withColumnRenamed("nbr_id", "id"), centroids, "cv")
      .toDF("nbr_id", "cell")
    val indexed = c.join(corpusCells, Seq("nbr_id"))
    probeCells(indexed, centroids, queries, k, nprobe, idCol, vecCol, excludeSelf)
  }

  /** Shared IVF search tail: route each query to its `nprobe` nearest cells,
    * score only the vectors indexed in those cells, bounded top-k. */
  private def probeCells(indexed: DataFrame, centroids: DataFrame,
                         queries: DataFrame, k: Int, nprobe: Int,
                         idCol: String, vecCol: String,
                         excludeSelf: Boolean): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("qv"))
    val qCells = q.crossJoin(broadcast(centroids))
      .withColumn("d2", squaredDistance(col("qv"), col("centroid")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(asc("d2"), asc("centroid_id"))))
      .filter(col("rn") <= nprobe)
      .select(col("query_id"), col("qv"), col("centroid_id").as("cell"))
    val joined = qCells.join(indexed, Seq("cell"))
      .filter(if (excludeSelf) col("query_id") =!= col("nbr_id") else lit(true))
      .withColumn("sim", cosine(col("qv"), col("cv")))
    Curation.topKRanked(joined.select(col("query_id"), col("nbr_id"),
        col("sim").cast("double").as("sim")), "query_id", "sim", "nbr_id", k)
      .select(col("query_id"), col("nbr_id"), col("sim"), col("rank"))
  }

  // ---- persisted / incremental IVF index ----------------------------------

  /** Persist an IVF index for incremental maintenance — the embeddings
    * analog of [[Dedup.saveLshIndex]]: `<name>_centroids` (the trained
    * coarse quantizer, nlist rows), `<name>_cells` (nbr_id, cell, cv)
    * bucketed AND sorted by the probe-join key `cell`, and `<name>_meta`
    * with the build parameters ([[appendToIvfIndex]] validates against it —
    * a delta assigned under different nlist/iters/init would corrupt the
    * index). Idempotent: tables + stale warehouse locations are replaced.
    *
    * Scale shape: the corpus shuffles ONCE at build (the assignment
    * groupBy); afterwards every search streams `<name>_cells` from disk
    * pre-partitioned on `cell`, and every delta batch touches only its own
    * new files. */
  def saveIvfIndex(corpus: DataFrame, name: String,
                   nlist: Int = 64, iters: Int = 3,
                   idCol: String = "vec_id", vecCol: String = "embedding",
                   hashInit: Boolean = true, buckets: Int = 32): Unit = {
    val spark = corpus.sparkSession
    Seq("centroids", "cells", "meta")
      .foreach(s => Dedup.replaceTable(spark, s"${name}_$s"))
    import spark.implicits._
    Seq((nlist, iters, hashInit, buckets))
      .toDF("nlist", "iters", "hash_init", "buckets")
      .write.mode("overwrite").saveAsTable(s"${name}_meta")
    val centroids = trainCentroids(corpus, nlist, iters, idCol, vecCol, hashInit)
      .coalesce(1).localCheckpoint(true)
    centroids.write.mode("overwrite").saveAsTable(s"${name}_centroids")
    val c = corpus.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("cv"))
    assignCells(c.select(col("id"), col("cv").as("v")), centroids, "v")
      .join(c, Seq("id"))
      .select(col("id").as("nbr_id"), col("cell"), col("cv"))
      .write.mode("overwrite").bucketBy(buckets, "cell").sortBy("cell")
      .saveAsTable(s"${name}_cells")
  }

  /** Fold a delta of new vectors (ids disjoint from the base snapshot, like
    * [[Dedup.incrementalMinHashLSH]]'s contract) into a persisted IVF index:
    * assign against the FROZEN quantizer (centroids broadcast, delta-only
    * scan — the base side is not read at all) and APPEND to the bucketed
    * cells table (only the delta's own files are written). After the call
    * the index describes
    * base ∪ delta — by construction identical to assigning base ∪ delta
    * against the same centroids in one pass, since per-vector assignment is
    * independent and deterministic. Centroids deliberately do NOT drift:
    * re-train (a fresh [[saveIvfIndex]]) when the corpus distribution moves
    * enough to matter, exactly like a production IVF deployment. */
  def appendToIvfIndex(spark: org.apache.spark.sql.SparkSession,
                       name: String, delta: DataFrame,
                       idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    require(spark.catalog.tableExists(s"${name}_meta"),
      s"appendToIvfIndex('$name'): no such index — run saveIvfIndex first")
    val centroids = spark.table(s"${name}_centroids")
    val d = delta.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("cv"))
    assignCells(d.select(col("id"), col("cv").as("v")), centroids, "v")
      .join(d, Seq("id"))
      .select(col("id").as("nbr_id"), col("cell"), col("cv"))
      .write.mode("append").format("parquet")
      .bucketBy(spark.table(s"${name}_meta").head().getAs[Int]("buckets"),
        "cell").sortBy("cell")
      .saveAsTable(s"${name}_cells")
    // the next reader must see the appended files, not a cached listing
    spark.catalog.refreshTable(s"${name}_cells")
  }

  /** Search a persisted IVF index ([[saveIvfIndex]] + any number of
    * [[appendToIvfIndex]] deltas): same probe path as [[ivfKnn]], with the
    * indexed side streaming from the bucketed cells table. */
  def ivfKnnIndexed(spark: org.apache.spark.sql.SparkSession,
                    name: String, queries: DataFrame, k: Int, nprobe: Int = 8,
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    excludeSelf: Boolean = true): DataFrame =
    probeCells(spark.table(s"${name}_cells"), spark.table(s"${name}_centroids"),
      queries, k, nprobe, idCol, vecCol, excludeSelf)

  // ---- product quantization (PQ) ------------------------------------------

  /** Slice subspace `s` (0-based) of an m-way split `dim`-vector. */
  private def subVec(v: Column, s: Int, subDim: Int): Column =
    slice(v, s * subDim + 1, subDim)

  /**
   * Train a product-quantization codebook: the vector is split into `m`
   * equal subspaces and each subspace gets its own `ncodes`-centroid k-means
   * (Jégou et al., "Product quantization for nearest neighbor search",
   * TPAMI 2011). Returns (subspace, code, codeword array<double>).
   *
   * The per-subspace k-means reuses [[trainCentroids]] (deterministic init,
   * Lloyd with empty-cell drop), so `hashInit = false` keeps the whole
   * codebook reproducible in an external SQL oracle.
   */
  def pqTrainCodebook(corpus: DataFrame, m: Int, ncodes: Int, iters: Int = 3,
                      idCol: String = "vec_id", vecCol: String = "embedding",
                      hashInit: Boolean = true): DataFrame = {
    val v = corpus.select(col(idCol).as(idCol), col(vecCol).cast("array<double>").as("v"))
    val dim = v.select(size(col("v"))).first().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
    val subDim = dim / m
    (0 until m).map { s =>
      trainCentroids(v.select(col(idCol), subVec(col("v"), s, subDim).as("sv")),
        ncodes, iters, idCol, "sv", hashInit)
        .select(lit(s).as("subspace"), col("centroid_id").as("code"),
          col("centroid").as("codeword"))
    }.reduce(_ union _)
  }

  /** Encode vectors against a PQ codebook: nearest codeword per subspace
    * (ties → lowest code). Returns (id, subspace, code) — m rows per vector,
    * 1 byte of information each at ncodes ≤ 256: the 100 TB corpus shrinks
    * to m bytes/vector for the scoring scan. Codebook is broadcast. */
  def pqEncode(vectors: DataFrame, codebook: DataFrame, m: Int,
               idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val v = vectors.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
    val subDim = v.select(size(col("v"))).first().getInt(0) / m
    val subs = v.select(col("id"), posexplode(
      array((0 until m).map(s => subVec(col("v"), s, subDim)): _*)).as(Seq("subspace", "sv")))
    subs.join(broadcast(codebook), Seq("subspace"))
      .withColumn("d2", squaredDistance(col("sv"), col("codeword")))
      .groupBy(col("id"), col("subspace"))
      .agg(min(struct(col("d2"), col("code"))).as("_m"))
      .select(col("id"), col("subspace"), col("_m.code").as("code"))
  }

  /**
   * PQ approximate top-k by asymmetric distance computation (ADC): each query
   * precomputes an m×ncodes lookup table of squared L2 distances to every
   * codeword, and a candidate's distance is the sum of m table lookups over
   * its codes — the corpus is scanned as codes (m bytes/vector), never as
   * floats. Distances are L2 (the PQ-native metric). Returns
   * (query_id, nbr_id, rank), rank by (adc asc, nbr_id asc).
   *
   * Plan shape: corpus→codes once (argmin vs broadcast codebook);
   * query LUT = queries × codebook (Q·m·ncodes rows, broadcast); scoring =
   * codes ⋈ LUT on (subspace, code) + a map-side-combinable sum. Pure PQ
   * scans every candidate (ADC cuts per-candidate cost, not candidate
   * count) — [[ivfPqKnn]] adds the IVF cell prefilter for the 100 TB shape.
   */
  def pqKnn(corpus: DataFrame, queries: DataFrame, k: Int,
            m: Int = 8, ncodes: Int = 256, iters: Int = 3,
            idCol: String = "vec_id", vecCol: String = "embedding",
            excludeSelf: Boolean = true, hashInit: Boolean = true,
            broadcastLut: Boolean = true): DataFrame = {
    val codebook = pqTrainCodebook(corpus, m, ncodes, iters, idCol, vecCol, hashInit)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val corpusCodes = pqEncode(corpus, codebook, m, idCol, vecCol)
      .toDF("nbr_id", "subspace", "code")
    val lut = pqLut(queries, codebook, m, idCol, vecCol)
    scoreAdc(corpusCodes, lut, m, k, excludeSelf, candidates = None, broadcastLut)
  }

  /** Per-query distance lookup table: (query_id, subspace, code, pd2). */
  private def pqLut(queries: DataFrame, codebook: DataFrame, m: Int,
                    idCol: String, vecCol: String): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("qv"))
    val subDim = q.select(size(col("qv"))).first().getInt(0) / m
    q.select(col("query_id"), posexplode(
        array((0 until m).map(s => subVec(col("qv"), s, subDim)): _*)).as(Seq("subspace", "sv")))
      .join(broadcast(codebook), Seq("subspace"))
      .select(col("query_id"), col("subspace"), col("code"),
        squaredDistance(col("sv"), col("codeword")).as("pd2"))
  }

  /** ADC scoring. Candidates are pivoted to ONE row with m code columns, and
    * the per-subspace distances arrive as m chained LUT-lookup joins — with
    * `broadcastLut` (default) all pipelined inside a single codegen stage, so
    * the |Q|·|candidates| scoring frame is never shuffled or group-aggregated
    * (the old shape hash-aggregated m rows per pair). The final top-k is a
    * bounded aggregate on negated distance ((adc asc, id asc) ≡ (−adc desc,
    * id asc)) — never a sort of the scored frame. With `candidates` set
    * (IVF-PQ), only those (query, nbr) pairs are scored.
    *
    * The LUT is |Q|·ncodes rows PER SUBSPACE — broadcasting it assumes a
    * BOUNDED query set (the search-serving shape). When |Q| scales with the
    * corpus (all-pairs self-join shapes), pass `broadcastLut = false`: the
    * lookups become ordinary equi-joins on (query_id, code) that AQE plans
    * from observed sizes, instead of a broadcast that grows past the 8 GB
    * limit / driver memory with the corpus. */
  private def scoreAdc(corpusCodes: DataFrame, lut: DataFrame, m: Int, k: Int,
                       excludeSelf: Boolean,
                       candidates: Option[DataFrame],
                       broadcastLut: Boolean): DataFrame = {
    val wide = pivotCodes(corpusCodes, m)
    val seeded = candidates match {
      case Some(cand) => wide.join(cand, Seq("nbr_id"))  // carries query_id in
      case None       => wide
    }
    scoreAdcSeeded(seeded, lut, m, k, excludeSelf, broadcastLut,
      fanout = candidates.isEmpty)
  }

  /** (id, subspace, code) → one row per vector with m `_c<s>` code columns —
    * the scoring-ready shape (also what the persisted IVF-PQ index stores,
    * so a search never re-pivots the corpus). */
  private def pivotCodes(codes: DataFrame, m: Int): DataFrame = {
    val codeCols = (0 until m).map(s =>
      max(when(col("subspace") === s, col("code"))).as(s"_c$s"))
    codes.groupBy(col("nbr_id")).agg(codeCols.head, codeCols.tail: _*)
  }

  /** ADC tail over an already-seeded wide frame (`_c0.._c{m-1}` + query_id
    * unless `fanout`): the m chained LUT-lookup joins + bounded top-k. */
  private def scoreAdcSeeded(seeded: DataFrame, lut: DataFrame, m: Int, k: Int,
                             excludeSelf: Boolean, broadcastLut: Boolean,
                             fanout: Boolean): DataFrame = {
    val scored = (0 until m).foldLeft(seeded) { (df, s) =>
      val l = lut.filter(col("subspace") === s).select(col("query_id"),
        col("code").as(s"_c$s"), col("pd2").as(s"_p$s"))
      // a fanout first join spreads each candidate to every query (pure PQ
      // scans all candidates per query); later joins are per-query lookups
      val keys = if (fanout && s == 0) Seq(s"_c$s")
                 else Seq("query_id", s"_c$s")
      df.join(if (broadcastLut) broadcast(l) else l, keys)
    }
    val adc = (0 until m).map(s => col(s"_p$s")).reduce(_ + _)
    val ranked = scored.withColumn("adc", adc)
      .filter(if (excludeSelf) col("query_id") =!= col("nbr_id") else lit(true))
    Curation.topKRanked(ranked.withColumn("nadc", -col("adc")),
        "query_id", "nadc", "nbr_id", k)
      .select(col("query_id"), col("nbr_id"), col("rank"))
  }

  /** IVF-PQ: the FAISS-style composition — IVF coarse cells bound WHICH
    * candidates are scored (nprobe/nlist of the corpus), PQ-ADC bounds the
    * COST per candidate (m byte-codes instead of dim floats). This is the
    * 100 TB configuration: the float corpus is read once at index build;
    * every search after that touches codes only. */
  def ivfPqKnn(corpus: DataFrame, queries: DataFrame, k: Int,
               nlist: Int = 64, nprobe: Int = 8,
               m: Int = 8, ncodes: Int = 256, iters: Int = 3,
               idCol: String = "vec_id", vecCol: String = "embedding",
               excludeSelf: Boolean = true, hashInit: Boolean = true,
               broadcastLut: Boolean = true): DataFrame = {
    val c = corpus.select(col(idCol).as("nbr_id"), col(vecCol).cast("array<double>").as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("qv"))
    val centroids = trainCentroids(corpus, nlist, iters, idCol, vecCol, hashInit)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val corpusCells = assignCells(c.withColumnRenamed("nbr_id", "id"), centroids, "cv")
      .toDF("nbr_id", "cell")
    val qCells = q.crossJoin(broadcast(centroids))
      .withColumn("d2", squaredDistance(col("qv"), col("centroid")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(asc("d2"), asc("centroid_id"))))
      .filter(col("rn") <= nprobe)
      .select(col("query_id"), col("centroid_id").as("cell"))
    val codebook = pqTrainCodebook(corpus, m, ncodes, iters, idCol, vecCol, hashInit)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val corpusCodes = pqEncode(corpus, codebook, m, idCol, vecCol)
      .toDF("nbr_id", "subspace", "code")
    val lut = pqLut(queries, codebook, m, idCol, vecCol)
    // candidate pairs from cell match, then ADC over the m code rows
    val cand = qCells.join(corpusCells, Seq("cell"))
      .select(col("query_id"), col("nbr_id")).distinct()
    scoreAdc(corpusCodes, lut, m, k, excludeSelf, candidates = Some(cand),
      broadcastLut)
  }

  // ---- persisted / incremental IVF-PQ index -------------------------------

  /** Persist the full 100 TB ANN configuration for incremental maintenance:
    * `<name>_centroids` (IVF quantizer) + `<name>_codebook` (PQ) +
    * `<name>_cells` — one SCORING-READY row per vector
    * (nbr_id, cell, _c0.._c{m-1}), bucketed AND sorted by the probe key
    * `cell`. The float corpus is read exactly once, at build; every search
    * and every delta append after that touches codes only. Idempotent like
    * [[saveIvfIndex]]; parameters persisted in `<name>_meta` and validated
    * on append. */
  def saveIvfPqIndex(corpus: DataFrame, name: String,
                     nlist: Int = 64, m: Int = 8, ncodes: Int = 256,
                     iters: Int = 3,
                     idCol: String = "vec_id", vecCol: String = "embedding",
                     hashInit: Boolean = true, buckets: Int = 32): Unit = {
    val spark = corpus.sparkSession
    Seq("centroids", "codebook", "cells", "meta")
      .foreach(s => Dedup.replaceTable(spark, s"${name}_$s"))
    import spark.implicits._
    Seq((nlist, m, ncodes, iters, hashInit, buckets))
      .toDF("nlist", "m", "ncodes", "iters", "hash_init", "buckets")
      .write.mode("overwrite").saveAsTable(s"${name}_meta")
    val centroids = trainCentroids(corpus, nlist, iters, idCol, vecCol, hashInit)
      .coalesce(1).localCheckpoint(true)
    centroids.write.mode("overwrite").saveAsTable(s"${name}_centroids")
    val codebook = pqTrainCodebook(corpus, m, ncodes, iters, idCol, vecCol, hashInit)
      .coalesce(1).localCheckpoint(true)
    codebook.write.mode("overwrite").saveAsTable(s"${name}_codebook")
    indexedPqRows(corpus, centroids, codebook, m, idCol, vecCol)
      .write.mode("overwrite").bucketBy(buckets, "cell").sortBy("cell")
      .saveAsTable(s"${name}_cells")
  }

  /** (nbr_id, cell, _c0.._c{m-1}) for `vectors` against FROZEN quantizer +
    * codebook — the persisted index's row shape. */
  private def indexedPqRows(vectors: DataFrame, centroids: DataFrame,
                            codebook: DataFrame, m: Int,
                            idCol: String, vecCol: String): DataFrame = {
    val c = vectors.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("cv"))
    val cells = assignCells(c.select(col("id"), col("cv").as("v")), centroids, "v")
      .toDF("nbr_id", "cell")
    pivotCodes(pqEncode(vectors, codebook, m, idCol, vecCol)
        .toDF("nbr_id", "subspace", "code"), m)
      .join(cells, Seq("nbr_id"))
  }

  /** Fold a delta of new vectors (ids disjoint from the base) into a
    * persisted IVF-PQ index: assign + encode against the FROZEN quantizer
    * and codebook (both broadcast; delta-only scan) and append the delta's
    * own bucket files. */
  def appendToIvfPqIndex(spark: org.apache.spark.sql.SparkSession,
                         name: String, delta: DataFrame,
                         idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    require(spark.catalog.tableExists(s"${name}_meta"),
      s"appendToIvfPqIndex('$name'): no such index — run saveIvfPqIndex first")
    val meta = spark.table(s"${name}_meta").head()
    indexedPqRows(delta, spark.table(s"${name}_centroids"),
        spark.table(s"${name}_codebook"), meta.getAs[Int]("m"), idCol, vecCol)
      .write.mode("append").format("parquet")
      .bucketBy(meta.getAs[Int]("buckets"), "cell").sortBy("cell")
      .saveAsTable(s"${name}_cells")
    spark.catalog.refreshTable(s"${name}_cells")
  }

  /** Search a persisted IVF-PQ index: route each query to its nprobe
    * nearest cells (broadcast centroids), read ONLY those cells' rows from
    * the bucketed table (already scoring-ready — no pivot), ADC-score via
    * the chained LUT joins. */
  def ivfPqKnnIndexed(spark: org.apache.spark.sql.SparkSession,
                      name: String, queries: DataFrame, k: Int, nprobe: Int = 8,
                      idCol: String = "vec_id", vecCol: String = "embedding",
                      excludeSelf: Boolean = true,
                      broadcastLut: Boolean = true): DataFrame = {
    val meta = spark.table(s"${name}_meta").head()
    val m = meta.getAs[Int]("m")
    val centroids = spark.table(s"${name}_centroids")
    val codebook = spark.table(s"${name}_codebook")
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("qv"))
    val qCells = q.crossJoin(broadcast(centroids))
      .withColumn("d2", squaredDistance(col("qv"), col("centroid")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(asc("d2"), asc("centroid_id"))))
      .filter(col("rn") <= nprobe)
      .select(col("query_id"), col("centroid_id").as("cell"))
    val seeded = qCells.join(spark.table(s"${name}_cells"), Seq("cell"))
      .drop("cell")
    val lut = pqLut(queries, codebook, m, idCol, vecCol)
    scoreAdcSeeded(seeded, lut, m, k, excludeSelf, broadcastLut, fanout = false)
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
    Curation.topKRanked(joined.select(col("query_id"), col("nbr_id"),
        col("sim").cast("double").as("sim")), "query_id", "sim", "nbr_id", k)
      .select(col("query_id"), col("nbr_id"), col("sim"), col("rank"))
  }
}

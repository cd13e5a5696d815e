package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.algos.GraphAlgorithms
import graft.core.{KGraph, SkewUtils}

/**
 * Hub-degree skew hardening for the adjacency-intersection family
 * (triangles / LCC / Adamic-Adar / Jaccard) and the salted co-occurrence
 * pair expansion: bucket partials must be EXACTLY equivalent to the
 * whole-array plan, and a hub's work must spread over HubBuckets shuffle
 * keys instead of one straggler task.
 */
class SkewSpec extends SparkSpec {

  /** Hub-star + ring: (1, c) for 2..n plus (c, c+1) for 2..n-1 — vertex 1
    * has degree n-1 and every ring edge closes a triangle through it. */
  private def starRing(n: Int): KGraph = {
    import spark.implicits._
    val star = (2 to n).map(c => (1L, c.toLong, 1.0))
    val ring = (2 until n).map(c => (c.toLong, c.toLong + 1, 1.0))
    KGraph.fromEdges((star ++ ring).toDF("src", "dst", "value"), id => id)
  }

  test("hub-split LCC matches the closed form on star+ring") {
    val n = 600 // hub degree 599 > cap 64 → split into HubBuckets partials
    val g = starRing(n)
    val p = GraphAlgorithms.prepareNeighborhood(g, hubDegreeCap = 64)
    val lcc = GraphAlgorithms.localClusteringCoefficient(g, p)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // same IEEE ops as the engine: 2.0·tri/(deg·(deg−1))
    assert(lcc(1L) === 2.0 * (n - 2) / ((n - 1) * (n - 2)))
    assert(lcc(2L) === 1.0)          // nbrs {1,3}, one triangle
    assert(lcc(n.toLong) === 1.0)    // nbrs {1,n-1}, one triangle
    for (c <- 3 until n)             // nbrs {1,c-1,c+1}, two triangles
      assert(lcc(c.toLong) === 2.0 * 2 / (3 * 2), s"vertex $c")
  }

  test("hub-split ≡ unsplit for jaccard / adamic-adar / triangle counts") {
    val g = starRing(300)
    val split = GraphAlgorithms.prepareNeighborhood(g, hubDegreeCap = 32)
    val whole = GraphAlgorithms.prepareNeighborhood(g, hubDegreeCap = Int.MaxValue)
    assert(split.hubCount === 1L)
    assert(whole.hubCount === 0L)

    def edgeMap(df: DataFrame): Map[(Long, Long), Double] =
      df.collect().map(r => (r.getLong(0), r.getLong(1)) ->
        math.round(r.getDouble(2) * 1e6) / 1e6).toMap

    assert(edgeMap(GraphAlgorithms.jaccard(split, conversionEnabled = false)) ===
      edgeMap(GraphAlgorithms.jaccard(whole, conversionEnabled = false)))
    assert(edgeMap(GraphAlgorithms.adamicAdar(split, conversionEnabled = false)) ===
      edgeMap(GraphAlgorithms.adamicAdar(whole, conversionEnabled = false)))
    assert(GraphAlgorithms.globalTriangleCount(split) ===
      GraphAlgorithms.globalTriangleCount(whole))
    assert(collectMap(GraphAlgorithms.triangleCounts(g, split)) ===
      collectMap(GraphAlgorithms.triangleCounts(g, whole)))
  }

  test("hub adjacency is bucket-partitioned and hub edges spread over buckets") {
    val n = 600
    val B = GraphAlgorithms.HubBuckets
    val p = GraphAlgorithms.prepareNeighborhood(starRing(n), hubDegreeCap = 64)

    // all B bucket rows present (empty ones filled), partials partition N(1)
    val hubAdj = p.adj.filter(col("src") === 1L)
      .select(col("bucket"), col("nbrs")).collect()
    assert(hubAdj.map(_.getInt(0)).sorted === (0 until B).toArray)
    val members = hubAdj.flatMap(_.getSeq[Long](1)).sorted
    assert(members === (2 to n).map(_.toLong).toArray)
    // non-hub vertices keep one whole row with bucket -1
    assert(p.adj.filter(col("src") =!= 1L && col("bucket") =!= -1).count() === 0L)

    // every hub-incident edge expands to B aligned rows, evenly keyed: the
    // downstream join key is (vertex, bucket), so no single task sees more
    // than ~1/B of the hub's intersections (the straggler bound)
    val hubRows = GraphAlgorithms.expandEdgesByBucket(p).filter(col("a") === 1L)
    val perBucket = hubRows.groupBy(col("ja")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(perBucket.keySet === (0 until B).toSet)
    assert(perBucket.values.max === perBucket.values.min) // 1 row per edge per bucket
    // and those keys hash across the shuffle space, not to one partition
    val pids = hubRows.repartition(B, col("a"), col("ja"))
      .select(spark_partition_id()).distinct().count()
    assert(pids > B / 2, s"hub bucket keys landed on only $pids partitions")
  }

  test("2·10⁴-degree hub: per-partition work bounded (max ≤ 2× median)") {
    // The straggler bound, asserted on the deterministic quantity that
    // decides task runtime: rows per shuffle partition of the bucket-aligned
    // intersection join, keyed by (vertex, bucket). Per-ROW cost is bounded
    // separately — mixed hub/non-hub intersections take the galloping
    // O(small·log big) path (GraphSetOps, pinned by GraphSetExprSpec) — so
    // bounded rows/partition ⇒ bounded task time at ANY hub degree.
    val n = 20001 // hub degree 2·10⁴, 78× over the cap → full split machinery
    val p = GraphAlgorithms.prepareNeighborhood(starRing(n), hubDegreeCap = 256)
    assert(p.hubCount === 1L)
    val parts = 32
    val counts = GraphAlgorithms.expandEdgesByBucket(p)
      .repartition(parts, col("a"), col("ja"))
      .groupBy(spark_partition_id().as("pid")).count()
      .collect().map(_.getLong(1)).sorted
    assert(counts.length > parts / 2, "expansion collapsed onto few partitions")
    val median = counts(counts.length / 2)
    assert(counts.last <= 2 * median,
      s"straggler partition: max=${counts.last} median=$median")
    // and the hub's own LCC comes out exact through the split + gallop path
    val lcc = GraphAlgorithms.localClusteringCoefficient(starRing(n), p)
      .filter(col("id") === 1L).head().getDouble(1)
    assert(lcc === 2.0 * (n - 2) / ((n - 1).toLong * (n - 2)))
  }

  test("saltedPairs ≡ direct pair expansion (chunked mega-groups included)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // group sizes straddle the chunk boundary: 3, 8 (=chunk), 9, 20, 35
    val groups = Seq(3, 8, 9, 20, 35).zipWithIndex.map { case (sz, i) =>
      (i.toLong, rnd.shuffle((1 to 500).map(_.toLong).toList).take(sz).sorted.toArray)
    }
    val df = groups.toDF("k", "ps")
    val got = SkewUtils.saltedPairs(df, "ps", chunk = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(identity).map { case (k, v) => k -> v.length }
    val expected = groups.flatMap { case (_, ps) =>
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).map { case (k, v) => k -> v.length }
    assert(got === expected)
  }
}

package graft

import graft.algos.compute.AdvancedAlgorithms._
import graft.algos.compute.Cf
import graft.algos.compute.Cf.{CfId, FMsg, SvdppValue}
import graft.pregel.Pregel

/** Golden-value tests for LCC, SybilRank, MaxBMatching, KMeans,
  * SemiClustering and the CF algorithms, from the reference test suites. */
class AdvancedSpec extends SparkSpec {

  def sc = spark.sparkContext

  test("LCC matches LocalClusteringCoefficientTest goldens") {
    // getLCCEdges (TestGraphUtils.java:39-50)
    val edges = Seq((0L, 1L), (0L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (3L, 4L), (5L, 3L))
    val verts = sc.parallelize((0L to 5L).map(i => (i, 1.0)))
    val e = sc.parallelize(edges.map { case (s, d) => (s, (d, 1.0)) })
    val res = Pregel.run(spark, new Lcc, verts, e, maxIterations = 10)
    val got = res.vertices.collect().toMap
    assert(got(0L) === 0.5)
    assert(math.abs(got(1L) - 0.3333333333333333) < 1e-12)
    assert(math.abs(got(2L) - 0.3333333333333333) < 1e-12)
    assert(math.abs(got(3L) - 0.08333333333333333) < 1e-12)
    assert(got(4L) === 0.0)
    assert(got(5L) === 0.0)
  }

  test("MaxBMatching matches MaxBMatchingTest golden (included edges)") {
    // MaxBMatchingTest.java:66-78; capacities: reference InitVertices → 2
    val weights = Seq(
      (1L, 2L, 3.0), (1L, 3L, 1.0), (2L, 1L, 3.0), (2L, 4L, 1.0), (2L, 5L, 1.0),
      (3L, 1L, 1.0), (3L, 5L, 3.0), (4L, 2L, 1.0), (4L, 5L, 2.0),
      (5L, 2L, 1.0), (5L, 3L, 3.0), (5L, 4L, 2.0))
    val verts = sc.parallelize((1L to 5L).map(i => (i, 2)))
    val e = sc.parallelize(weights.map { case (s, d, w) =>
      (s, (d, MbmEdge(w, MbmState.Default))) })
    val res = Pregel.run(spark, new MaxBMatching, verts, e, maxIterations = 20)
    val included = res.edges
      .filter { case (_, edge) => edge.value.state == MbmState.Included }
      .map { case (s, edge) => (s, edge.target, edge.value.weight) }
      .collect().toSet
    // NOTE: the reference test's golden VIOLATES b=2 (vertex 5 ends with 3
    // INCLUDED edges, MaxBMatchingTest.java:108) — an artifact of its
    // nondeterministic execution. We assert the algorithm's invariants
    // instead: symmetry, capacity, and greedy inclusion of heaviest edges.
    val dirs = included.map { case (s, d, _) => (s, d) }
    dirs.foreach { case (s, d) => assert(dirs.contains((d, s)), s"($s,$d) not symmetric") }
    val perVertex = dirs.groupBy(_._1).view.mapValues(_.size).toMap
    perVertex.foreach { case (v, n) => assert(n <= 2, s"vertex $v over capacity: $n") }
    assert(dirs.contains((1L, 2L)), "heaviest edge (1,2,w=3) must be matched")
    assert(dirs.contains((3L, 5L)), "heaviest edge (3,5,w=3) must be matched")
    assert(res.state === "CONVERGED" || res.state === "MAX_ITERATIONS")
  }

  test("KMeans matches KMeansClusteringTest test1 golden") {
    val points = Seq(
      1L -> Vector(1.0, 1.0), 2L -> Vector(1.5, 2.0), 3L -> Vector(3.0, 4.0),
      4L -> Vector(5.0, 7.0), 5L -> Vector(3.5, 5.0), 6L -> Vector(4.5, 5.0),
      7L -> Vector(3.5, 4.5))
    val verts = sc.parallelize(points.map { case (id, c) => (id, KMeansValue(c, 0)) })
    val e = sc.parallelize(Seq.empty[(Long, (Long, Double))])
    val cf = new KMeans(k = 2, maxIterations = 100,
      initialCenters = Some(Seq(Vector(1.0, 1.0), Vector(1.5, 2.0))))
    val res = Pregel.run(spark, cf, verts, e, maxIterations = 100)
    val got = res.vertices.collect().toMap.view.mapValues(_.clusterId).toMap
    assert(got === Map(1L -> 0, 2L -> 0, 3L -> 1, 4L -> 1, 5L -> 1, 6L -> 1, 7L -> 1))
  }

  test("KMeans matches KMeansClusteringTest test2 golden (k=3)") {
    // KMeansClusteringTest.java:124-131; initial centers = points 1..3
    val points = Seq(
      1L -> Vector(2.0, 10.0), 2L -> Vector(2.0, 5.0), 3L -> Vector(8.0, 4.0),
      4L -> Vector(5.0, 8.0), 5L -> Vector(7.0, 5.0), 6L -> Vector(6.0, 4.0),
      7L -> Vector(1.0, 2.0), 8L -> Vector(4.0, 9.0))
    val verts = sc.parallelize(points.map { case (id, c) => (id, KMeansValue(c, 0)) })
    val e = sc.parallelize(Seq.empty[(Long, (Long, Double))])
    val cf = new KMeans(k = 3, maxIterations = 100,
      initialCenters = Some(Seq(Vector(2.0, 10.0), Vector(2.0, 5.0), Vector(8.0, 4.0))))
    val res = Pregel.run(spark, cf, verts, e, maxIterations = 100)
    val got = res.vertices.collect().toMap.view.mapValues(_.clusterId).toMap
    // KMeansClusteringTest.java:175
    assert(got === Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 0, 5L -> 2, 6L -> 2,
      7L -> 1, 8L -> 0))
  }

  test("KMeans matches KMeansClusteringTest test3 golden (3 dims)") {
    // KMeansClusteringTest.java:183-192; initial centers = points 1..2
    val points = Seq(
      1L -> Vector(-4.31568, -0.396959, -6.29507),
      2L -> Vector(-4.56112, -1.74917, -4.57874),
      3L -> Vector(4.54508, 0.102845, 6.35385),
      4L -> Vector(4.87746, -0.832591, 7.06942),
      5L -> Vector(-5.91254, -0.278006, -4.25934),
      6L -> Vector(6.95139, 0.120139, 4.89531),
      7L -> Vector(-6.28538, -0.88527, -4.74988),
      8L -> Vector(-6.84791, 0.887664, -4.91919),
      9L -> Vector(7.47117, 1.67911, 6.02221),
      10L -> Vector(-4.78011, 1.2099, -4.55519))
    val verts = sc.parallelize(points.map { case (id, c) => (id, KMeansValue(c, 0)) })
    val e = sc.parallelize(Seq.empty[(Long, (Long, Double))])
    val cf = new KMeans(k = 2, maxIterations = 100,
      initialCenters = Some(Seq(points(0)._2, points(1)._2)))
    val res = Pregel.run(spark, cf, verts, e, maxIterations = 100)
    val got = res.vertices.collect().toMap.view.mapValues(_.clusterId).toMap
    // KMeansClusteringTest.java:235
    assert(got === Map(1L -> 0, 2L -> 0, 3L -> 1, 4L -> 1, 5L -> 0, 6L -> 1,
      7L -> 0, 8L -> 0, 9L -> 1, 10L -> 0))
  }

  test("KMeans matches KMeansClusteringTest test4 golden (60 points, k=3)") {
    // KMeansClusteringTest.java:243-325: three planted blobs interleaved in
    // id order; initial centers = points 1, 11, 12. Golden :347 assigns
    // every id to cluster (id−1) % 3.
    val coords = Seq(
      (-3.78, -42.01), (-45.96, 30.67), (56.37, -46.62), (8.78, -37.95),
      (-26.95, 43.10), (37.87, -51.30), (-2.61, -30.43), (-23.33, 26.23),
      (38.19, -36.27), (-13.63, -42.26), (-36.57, 32.63), (50.65, -52.40),
      (-5.76, -51.83), (-34.43, 42.66), (40.35, -47.14), (-23.40, -48.70),
      (-29.58, 17.77), (43.08, -61.96), (9.06, -49.26), (-20.13, 44.16),
      (41.62, -45.84), (5.23, -41.20), (-23.00, 38.15), (44.55, -51.50),
      (-15.63, -26.81), (-24.33, 22.63), (52.51, -54.75), (-0.04, -39.69),
      (-32.92, 43.87), (47.99, -36.93), (-7.34, -57.90), (-36.17, 34.74),
      (51.52, -41.83), (-21.91, -49.01), (-46.68, 46.04), (48.52, -43.67),
      (-0.20, -36.62), (-27.71, 35.12), (41.29, -42.00), (-9.17, -43.28),
      (-41.16, 50.66), (49.63, -45.28), (-8.10, -29.83), (-49.38, 38.57),
      (35.38, -34.90), (-6.51, -55.58), (-38.17, 40.21), (47.47, -45.95),
      (-17.66, -51.12), (-32.60, 41.13), (40.68, -49.10), (-10.31, -40.69),
      (-22.05, 42.91), (51.16, -47.58), (-12.42, -57.29), (-17.72, 39.90),
      (44.57, -41.75), (3.14, -35.46), (-53.73, 32.84), (53.16, -50.16))
    val points = coords.zipWithIndex.map { case ((x, y), i) =>
      (i + 1L) -> Vector(x, y) }
    val verts = sc.parallelize(points.map { case (id, c) => (id, KMeansValue(c, 0)) })
    val e = sc.parallelize(Seq.empty[(Long, (Long, Double))])
    val cf = new KMeans(k = 3, maxIterations = 100,
      initialCenters = Some(Seq(Vector(-3.78, -42.01), Vector(-36.57, 32.63),
        Vector(50.65, -52.40))))
    val res = Pregel.run(spark, cf, verts, e, maxIterations = 100)
    val got = res.vertices.collect().toMap.view.mapValues(_.clusterId).toMap
    assert(got === points.map { case (id, _) => id -> ((id - 1) % 3).toInt }.toMap)
  }

  test("KMeans matches KMeansClusteringTest test5 golden (10 points, k=3)") {
    // KMeansClusteringTest.java:355-368: first 10 of the test4 sequence;
    // initial centers = points 1, 5, 3. Golden :409: (id−1) % 3.
    val coords = Seq(
      (-3.78, -42.01), (-45.96, 30.67), (56.37, -46.62), (8.78, -37.95),
      (-26.95, 43.10), (37.87, -51.30), (-2.61, -30.43), (-23.33, 26.23),
      (38.19, -36.27), (-13.63, -42.26))
    val points = coords.zipWithIndex.map { case ((x, y), i) => (i + 1L) -> Vector(x, y) }
    val verts = sc.parallelize(points.map { case (id, c) => (id, KMeansValue(c, 0)) })
    val e = sc.parallelize(Seq.empty[(Long, (Long, Double))])
    val cf = new KMeans(k = 3, maxIterations = 100,
      initialCenters = Some(Seq(Vector(-3.78, -42.01), Vector(-26.95, 43.10),
        Vector(56.37, -46.62))))
    val res = Pregel.run(spark, cf, verts, e, maxIterations = 100)
    val got = res.vertices.collect().toMap.view.mapValues(_.clusterId).toMap
    assert(got === points.map { case (id, _) => id -> ((id - 1) % 3).toInt }.toMap)
  }

  test("SybilRank: trusted seeds rank higher than sybils") {
    // honest region 1-4 (clique-ish), sybil region 5-6, one attack edge
    val edges = Seq(
      (1L, 2L, 1.0), (2L, 1L, 1.0), (2L, 3L, 1.0), (3L, 2L, 1.0),
      (3L, 4L, 1.0), (4L, 3L, 1.0), (1L, 4L, 1.0), (4L, 1L, 1.0),
      (4L, 5L, 1.0), (5L, 4L, 1.0), (5L, 6L, 1.0), (6L, 5L, 1.0))
    val verts = sc.parallelize(
      (1L to 6L).map(i => (i, SybilValue(0.0, isTrusted = i <= 2))))
    val e = sc.parallelize(edges.map { case (s, d, w) => (s, (d, w)) })
    val res = Pregel.run(spark, new SybilRank(), verts, e, maxIterations = 30)
    val got = res.vertices.collect().toMap
    assert(res.state === "HALTED")
    val honest = (1L to 4L).map(got(_).rank).min
    val sybil = (5L to 6L).map(got(_).rank).max
    assert(honest > sybil, s"honest min $honest should exceed sybil max $sybil")
  }

  test("SybilRank matches SybilRankTest golden ranks") {
    // the reference fixture (SybilRankTest.java:68-84): weighted social
    // graph, trusted seeds {1, 2, 5} (InitVertices:127-138) — note 5 sits in
    // the sybil-side cut and still converges to rank 0
    val edges = Seq(
      (1L, 2L, 5.0), (2L, 4L, 4.0), (4L, 5L, 3.0), (3L, 5L, 3.0),
      (1L, 3L, 2.0), (3L, 7L, 1.0), (6L, 7L, 3.0), (6L, 9L, 3.0),
      (8L, 9L, 2.0), (7L, 8L, 3.0))
    val bidir = edges.flatMap { case (s, d, w) => Seq((s, (d, w)), (d, (s, w))) }
    val trusted = Set(1L, 2L, 5L)
    val verts = sc.parallelize(
      (1L to 9L).map(i => (i, SybilValue(0.0, isTrusted = trusted(i)))))
    val res = Pregel.run(spark, new SybilRank(), verts, sc.parallelize(bidir),
      maxIterations = 30)
    val got = res.vertices.collect().toMap
    // SybilRankTest.java:119
    val gold = Map(
      1L -> 0.2380952380952381, 2L -> 0.23809523809523808,
      3L -> 0.39285714285714285, 4L -> 0.4047619047619047,
      5L -> 0.0, 6L -> 0.0, 7L -> 0.0, 8L -> 0.0, 9L -> 0.0)
    assert(got.keySet === gold.keySet)
    gold.foreach { case (k, v) =>
      assert(math.abs(got(k).rank - v) < 1e-12, s"vertex $k: ${got(k).rank} != $v")
    }
  }

  test("SemiClustering on the SemiClusteringTest fixture: exact scores, " +
       "bounded sets, deterministic") {
    // reference fixture (SemiClusteringTest.java:70-82): 6 undirected
    // weighted edges; ITERATIONS=10, MAX_CLUSTERS=2, CLUSTER_CAPACITY=2,
    // default score factor 0.5. The reference's EXACT golden cluster sets
    // (SemiClusteringTest.java:116) cannot be pinned faithfully: its
    // ClusterScoreComparator (SemiClustering.java:207-218) returns 1 for
    // ANY distinct equal-score pair — an asymmetric comparator whose
    // TreeSet order (and therefore which equal-score cluster the
    // keep-top-k prune drops) depends on Kafka message-arrival order. The
    // port uses a consistent total order (score, then vertex set), so we
    // pin instead: (a) every reported cluster's (score, inner, boundary)
    // EXACTLY matches the reference's addVertex formula recomputed from
    // the edge set, (b) the reference test's structural assertions, and
    // (c) our own deterministic output across runs.
    val edges = Seq(
      (1L, 2L, 1.0), (1L, 3L, 1.0), (2L, 3L, 2.0),
      (3L, 4L, 2.0), (3L, 5L, 1.0), (4L, 5L, 1.0))
    val w = edges.flatMap { case (s, d, x) => Seq((s, d) -> x, (d, s) -> x) }.toMap
    val bidir = edges.flatMap { case (s, d, x) => Seq((s, (d, x)), (d, (s, x))) }
    def run(): Map[Long, Set[(Set[Long], Double, Double, Double)]] = {
      val verts = sc.parallelize((1L to 5L).map(i => (i, Set.empty[SemiCluster])))
      val res = Pregel.run(spark,
        new SemiClustering(iterations = 10, maxClusters = 2, clusterCapacity = 2),
        verts, sc.parallelize(bidir), maxIterations = 20)
      res.vertices.collect().toMap.map { case (id, cs) =>
        id -> cs.map(c => (c.vertices, c.score, c.innerScore, c.boundaryScore))
      }
    }
    val got = run()
    assert(got.keySet === (1L to 5L).toSet)
    got.foreach { case (id, clusters) =>
      assert(clusters.nonEmpty && clusters.size <= 2)
      clusters.foreach { case (vs, score, inner, boundary) =>
        assert(vs.contains(id) && vs.size <= 2)
        // reference formula (SemiClustering.java:244-270): inner = Σ intra
        // edge weight, boundary = Σ weight of edges leaving the cluster,
        // score = (inner − 0.5·boundary) / (|C|·(|C|−1)/2); singleton = 0
        val expInner = (for (a <- vs; b <- vs if a < b) yield w.getOrElse((a, b), 0.0)).sum
        val expBoundary = vs.toSeq.map(v =>
          w.collect { case ((s, d), x) if s == v && !vs(d) => x }.sum).sum
        val expScore = if (vs.size == 1) 0.0
          else (expInner - 0.5 * expBoundary) / (vs.size * (vs.size - 1) / 2.0)
        assert(math.abs(inner - expInner) < 1e-12, s"$id inner $vs")
        assert(math.abs(boundary - expBoundary) < 1e-12, s"$id boundary $vs")
        assert(math.abs(score - expScore) < 1e-12, s"$id score $vs")
      }
    }
    // reference-agreeing rows where no tie is involved: vertex 5's set is
    // order-independent and matches SemiClusteringTest.java:116 exactly
    assert(got(5L) === Set((Set(4L, 5L), -0.5, 1.0, 3.0), (Set(5L), 0.0, 0.0, 2.0)))
    // deterministic across runs
    assert(run() === got)
  }

  test("SemiClustering produces capacity-bounded scored clusters") {
    val edges = Seq(
      (1L, 2L, 1.0), (2L, 1L, 1.0), (2L, 3L, 1.0), (3L, 2L, 1.0),
      (1L, 3L, 1.0), (3L, 1L, 1.0), (3L, 4L, 0.1), (4L, 3L, 0.1))
    val verts = sc.parallelize((1L to 4L).map(i => (i, Set.empty[SemiCluster])))
    val e = sc.parallelize(edges.map { case (s, d, w) => (s, (d, w)) })
    val res = Pregel.run(spark,
      new SemiClustering(iterations = 6, maxClusters = 2, clusterCapacity = 3),
      verts, e, maxIterations = 10)
    val got = res.vertices.collect().toMap
    got.values.foreach { clusters =>
      assert(clusters.size <= 2)
      clusters.foreach(c => assert(c.size <= 3))
    }
    // triangle 1-2-3 should appear as a cluster for its members
    val triangle = Set(1L, 2L, 3L)
    assert(got(1L).exists(_.vertices == triangle))
  }

  // ---- CF ----------------------------------------------------------------

  /** ratings_simple.txt-style bipartite fixture */
  def ratings: Seq[(CfId, CfId, Float)] = Seq(
    (CfId.user(1), CfId.item(1), 1.0f), (CfId.user(1), CfId.item(2), 2.0f),
    (CfId.user(2), CfId.item(1), 2.0f), (CfId.user(2), CfId.item(2), 4.0f),
    (CfId.user(3), CfId.item(1), 3.0f), (CfId.user(3), CfId.item(2), 5.0f))

  def cfGraph = {
    val verts = sc.parallelize(
      (ratings.map(_._1) ++ ratings.map(_._2)).distinct.map(id => (id, Array.empty[Float])))
    val e = sc.parallelize(ratings.map { case (u, i, r) => (u, (i, r)) })
    (verts, e)
  }

  test("SGD matches SgdTest golden factors (seed 0)") {
    // reference fixture (SgdTest.java:68-71) and config (:86-91): ratings
    // u1→i1=1, u1→i2=2, u2→i1=3, u2→i2=4; γ=0.005, λ=0.01, dim=2,
    // RANDOM_SEED=0, ITERATIONS=5. Every vertex seeds an identical
    // java.util.Random(0) (Sgd.java:257-260), which our init reproduces
    // bit-for-bit, so after 5 alternations the float factor matrices agree
    // with SgdTest.java:108's golden to its printed 6 decimals.
    val ratings = Seq(
      (CfId.user(1), CfId.item(1), 1.0f), (CfId.user(1), CfId.item(2), 2.0f),
      (CfId.user(2), CfId.item(1), 3.0f), (CfId.user(2), CfId.item(2), 4.0f))
    val verts = sc.parallelize(
      (ratings.map(_._1) ++ ratings.map(_._2)).distinct.map(id => (id, Array.empty[Float])))
    val e = sc.parallelize(ratings.map { case (u, i, r) => (u, (i, r)) })
    val cf = new Cf.Sgd(dim = 2, iterations = 5, lambda = 0.01f, gamma = 0.005f,
      randomSeed = Some(0L))
    val res = Pregel.run(spark, cf, verts, e, maxIterations = 30)
    val got = res.vertices.collect().toMap
      .map { case (id, v) => (id.typ, id.id) -> v.toSeq }
    got.toSeq.sortBy(_._1).foreach { case (k, v) =>
      info(s"$k -> ${v.map(x => f"$x%.6f").mkString("[", "; ", "]")}") }
    // SgdTest.java:108: {(1, 0)=[0.007530; 0.008566], (2, 0)=[0.007827;
    // 0.008902], (1, 1)=[0.007459; 0.008485], (2, 1)=[0.007534; 0.008570]}
    val gold = Map[(Byte, Long), Seq[Double]](
      (0.toByte, 1L) -> Seq(0.007530, 0.008566),
      (0.toByte, 2L) -> Seq(0.007827, 0.008902),
      (1.toByte, 1L) -> Seq(0.007459, 0.008485),
      (1.toByte, 2L) -> Seq(0.007534, 0.008570))
    assert(got.keySet === gold.keySet)
    gold.foreach { case (k, exp) =>
      exp.zip(got(k)).foreach { case (g, a) =>
        assert(math.abs(g - a) < 1e-6, s"$k: got ${got(k)} expected $exp")
      }
    }
  }

  test("ALS matches AlsTest golden factors (seed 0)") {
    // same fixture; AlsTest.java:89-92: λ=0.01, dim=2, seed=0, ITERATIONS=5.
    // Golden (AlsTest.java:109). EXACT float equality is unattainable even
    // for the reference itself: AlsTest.java:112 carries a second,
    // commented-out golden from another run differing at the 5th decimal
    // (1.100964 vs 1.100902 — message-order float drift). We assert to
    // 5e-4, an order tighter than the factors' scale and consistent with
    // the reference's own run-to-run spread.
    val ratings = Seq(
      (CfId.user(1), CfId.item(1), 1.0f), (CfId.user(1), CfId.item(2), 2.0f),
      (CfId.user(2), CfId.item(1), 3.0f), (CfId.user(2), CfId.item(2), 4.0f))
    val verts = sc.parallelize(
      (ratings.map(_._1) ++ ratings.map(_._2)).distinct.map(id => (id, Array.empty[Float])))
    val e = sc.parallelize(ratings.map { case (u, i, r) => (u, (i, r)) })
    val cf = new Cf.Als(dim = 2, iterations = 5, lambda = 0.01f, randomSeed = Some(0L))
    val res = Pregel.run(spark, cf, verts, e, maxIterations = 30)
    val got = res.vertices.collect().toMap
      .map { case (id, v) => (id.typ, id.id) -> v.toSeq }
    got.toSeq.sortBy(_._1).foreach { case (k, v) =>
      info(s"$k -> ${v.map(x => f"$x%.6f").mkString("[", "; ", "]")}") }
    // AlsTest.java:109: {(1, 0)=[1.100964; 1.252018], (2, 0)=[2.488711;
    // 2.831024], (1, 1)=[0.499041; 0.567667], (2, 1)=[0.706991; 0.804180]}
    val gold = Map[(Byte, Long), Seq[Double]](
      (0.toByte, 1L) -> Seq(1.100964, 1.252018),
      (0.toByte, 2L) -> Seq(2.488711, 2.831024),
      (1.toByte, 1L) -> Seq(0.499041, 0.567667),
      (1.toByte, 2L) -> Seq(0.706991, 0.804180))
    assert(got.keySet === gold.keySet)
    gold.foreach { case (k, exp) =>
      exp.zip(got(k)).foreach { case (g, a) =>
        assert(math.abs(g - a) < 5e-4, s"$k: got ${got(k)} expected $exp")
      }
    }
  }

  test("SVD++ matches SvdppTest golden baselines and factors (seed 0)") {
    // same fixture; SvdppTest.java:93-101: biasλ=0.005, biasγ=0.01,
    // factorλ=0.005, factorγ=0.01, ratings clamped [0,5], dim=2, seed=0,
    // ITERATIONS=6
    val ratings = Seq(
      (CfId.user(1), CfId.item(1), 1.0f), (CfId.user(1), CfId.item(2), 2.0f),
      (CfId.user(2), CfId.item(1), 3.0f), (CfId.user(2), CfId.item(2), 4.0f))
    val verts = sc.parallelize(
      (ratings.map(_._1) ++ ratings.map(_._2)).distinct
        .map(id => (id, Cf.SvdppValue(0f, Array.empty[Float], Array.empty[Float]))))
    val e = sc.parallelize(ratings.map { case (u, i, r) => (u, (i, r)) })
    val cf = new Cf.Svdpp(dim = 2, iterations = 6,
      factorLambda = 0.005f, factorGamma = 0.01f,
      biasLambda = 0.005f, biasGamma = 0.01f,
      minRating = 0f, maxRating = 5f, randomSeed = Some(0L))
    val res = Pregel.run(spark, cf, verts, e, maxIterations = 30)
    val got = res.vertices.collect().toMap
      .map { case (id, v) => (id.typ, id.id) -> (v.baseline, v.factors.toSeq) }
    got.toSeq.sortBy(_._1).foreach { case (k, (b, f)) =>
      info(s"$k -> ($b%.8f, ${f.map(x => f"$x%.6f").mkString("[", ", ", "]")})") }
    // SvdppTest.java:118: {(1, 0)=(0.26593804, [0.007494, 0.008374]),
    // (2, 0)=(0.18473601, [0.006907, 0.008184]), (1, 1)=(0.6420079,
    // [0.007407, 0.002487]), (2, 1)=(0.6016106, [0.006642, 0.001807])}
    val gold = Map[(Byte, Long), (Double, Seq[Double])](
      (0.toByte, 1L) -> (0.26593804, Seq(0.007494, 0.008374)),
      (0.toByte, 2L) -> (0.18473601, Seq(0.006907, 0.008184)),
      (1.toByte, 1L) -> (0.6420079, Seq(0.007407, 0.002487)),
      (1.toByte, 2L) -> (0.6016106, Seq(0.006642, 0.001807)))
    assert(got.keySet === gold.keySet)
    gold.foreach { case (k, (gb, gf)) =>
      // 1e-5: same float message-order drift as ALS (see comment there)
      assert(math.abs(got(k)._1 - gb) < 1e-5, s"$k baseline ${got(k)._1} != $gb")
      gf.zip(got(k)._2).foreach { case (g, a) =>
        assert(math.abs(g - a) < 1e-5, s"$k factors ${got(k)._2} expected $gf")
      }
    }
  }

  test("SGD alternation runs and reduces RMSE") {
    val (verts, e) = cfGraph
    // reference defaults (γ=0.005, 0.01-scale init) move imperceptibly in a
    // few iterations — crank γ to observe actual learning in-test
    val cf = new Cf.Sgd(dim = 5, iterations = 30, gamma = 0.1f, randomSeed = Some(42L))
    val res = Pregel.run(spark, cf, verts, e, maxIterations = 40)
    val n = res.aggregates(Cf.EdgeCountAggregator).asInstanceOf[Long]
    assert(n === 6L)
    val rmse = math.sqrt(res.aggregates(Cf.RmseAggregator).asInstanceOf[Double] / n)
    // initial error ≈ sqrt(mean r²) ≈ 3.14 with near-zero factors
    assert(rmse < 2.0, s"rmse $rmse should improve below the ~3.14 of random init")
    // reverse edges were created: items now have out-edges to users
    val itemEdges = res.edges.filter(_._1.typ == 1).count()
    assert(itemEdges === 6L)
  }

  test("ALS solves least squares per vertex and improves RMSE") {
    val (verts, e) = cfGraph
    val cf = new Cf.Als(dim = 3, iterations = 8, lambda = 0.05f, randomSeed = Some(42L))
    val res = Pregel.run(spark, cf, verts, e, maxIterations = 30)
    val n = res.aggregates(Cf.EdgeCountAggregator).asInstanceOf[Long]
    val rmse = math.sqrt(res.aggregates(Cf.RmseAggregator).asInstanceOf[Double] / n)
    assert(rmse < 0.5, s"ALS should fit rank-3 on 6 ratings, rmse=$rmse")
  }

  test("SVD++ runs its phase schedule and improves RMSE") {
    val verts = sc.parallelize(
      (ratings.map(_._1) ++ ratings.map(_._2)).distinct
        .map(id => (id, SvdppValue(0f, Array.empty[Float], Array.empty[Float]))))
    val e = sc.parallelize(ratings.map { case (u, i, r) => (u, (i, r)) })
    val cf = new Cf.Svdpp(dim = 5, iterations = 12, minRating = 0f, maxRating = 5f,
      randomSeed = Some(42L))
    val res = Pregel.run(spark, cf, verts, e, maxIterations = 40)
    val n = res.aggregates(Cf.EdgeCountAggregator).asInstanceOf[Long]
    val rmse = math.sqrt(res.aggregates(Cf.RmseAggregator).asInstanceOf[Double] / n)
    assert(n === 6L)
    assert(rmse < 1.6, s"svd++ rmse=$rmse")
  }

  test("svdppPredict applies the reference predictor formula with clamping") {
    // hand-built trained state: mean = 12 / (2·2) = 3.0
    val verts = sc.parallelize(Seq(
      (CfId.user(1), SvdppValue(0.5f, Array(0.1f, 0.2f), Array.empty[Float])),
      (CfId.user(2), SvdppValue(3.0f, Array(1.0f, 1.0f), Array.empty[Float])),
      (CfId.item(7), SvdppValue(0.25f, Array(0.4f, 0.3f), Array(0f, 0f)))))
    val res = Pregel.Result[CfId, SvdppValue, Float](
      verts, sc.emptyRDD, superstep = 0, runningTimeMs = 0L,
      aggregates = Map(Cf.OverallRatingAggregator -> 12.0,
        Cf.EdgeCountAggregator -> 2L),
      state = "COMPLETED")(() => ())
    val out = Cf.svdppPredict(res, sc.parallelize(Seq((1L, 7L), (2L, 7L))))
      .collect().map(t => (t._1, t._2) -> t._3).toMap
    // u1: 3.0 + 0.5 + 0.25 + (0.4·0.1 + 0.3·0.2) = 3.85
    assert(math.abs(out((1L, 7L)) - 3.85f) < 1e-6)
    // u2: 3.0 + 3.0 + 0.25 + 0.7 = 6.95 → clamped to maxRating 5.0
    assert(out((2L, 7L)) === 5.0f)
  }

  test("svdppPredict on a trained run is deterministic and in range") {
    val verts = sc.parallelize(
      (ratings.map(_._1) ++ ratings.map(_._2)).distinct
        .map(id => (id, SvdppValue(0f, Array.empty[Float], Array.empty[Float]))))
    val e = sc.parallelize(ratings.map { case (u, i, r) => (u, (i, r)) })
    val cf = new Cf.Svdpp(dim = 5, iterations = 8, randomSeed = Some(42L))
    val res = Pregel.run(spark, cf, verts, e, maxIterations = 40)
    val pairs = sc.parallelize(for (u <- 1L to 3L; i <- 1L to 2L) yield (u, i))
    val p1 = Cf.svdppPredict(res, pairs).collect().sortBy(t => (t._1, t._2))
    assert(p1.length === 6)
    assert(p1.forall(t => t._3 >= 0.0f && t._3 <= 5.0f))
    val p2 = Cf.svdppPredict(res, pairs).collect().sortBy(t => (t._1, t._2))
    assert(p1.toSeq === p2.toSeq)
    res.unpersistState()
  }
}

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

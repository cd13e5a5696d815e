package graft

import org.apache.spark.sql.functions._
import graft.algos.GraphAlgorithms
import graft.core.KGraph

/** Golden-value tests for DataFrame-native algorithms, mirroring the
  * reference's library tests (ConnectedComponentsTest.java:60-110,
  * PageRankTest.java:66-130, SingleSourceShortestPathsTest, BFS/LP tests). */
class AlgoSpec extends SparkSpec {

  def twoChains: KGraph = KGraph.fromEdges(twoChainsEdges, id => id)

  test("wcc: two chains → components 0 and 10 (reference golden)") {
    val got = collectMap(GraphAlgorithms.wcc(twoChains))
    (0L to 9L).foreach(i => assert(got(i) === 0L, s"vertex $i"))
    (10L to 20L).foreach(i => assert(got(i) === 10L, s"vertex $i"))
  }

  test("sssp on chain from 0: dist = id (reference golden)") {
    val g = KGraph.fromEdges(chainEdges(10), _ => lit(Double.PositiveInfinity))
    val got = collectMap(GraphAlgorithms.sssp(g, 0L))
    (0L to 9L).foreach(i => assert(got(i) === i.toDouble))
  }

  test("bfs on two chains from 10: hops within chain 2, unreached null") {
    val got = GraphAlgorithms.bfs(twoChains, 10L).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getLong(1))).toMap
    (10L to 20L).foreach(i => assert(got(i) === i - 10))
    (0L to 9L).foreach(i => assert(got(i) === null))
  }

  test("pagerank on chain of 10 matches reference goldens (PageRankTest.java:94-128)") {
    val g = KGraph.fromEdges(chainEdges(10), _ => lit(0.0))
    val got = GraphAlgorithms.pageRank(g, tolerance = 0.0001, resetProb = 0.15)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // reference golden first two values on the chain
    assert(math.abs(got(0L) - 0.15) < 1e-12)
    assert(math.abs(got(1L) - 0.27749999999999997) < 1e-9)
    // ranks increase along the chain
    (1L to 9L).foreach(i => assert(got(i) > got(i - 1)))
  }

  test("label propagation: upward-only moves (LabelPropagation.java:41-50)") {
    import spark.implicits._
    // increasing chain: incoming labels are always smaller → nothing moves
    val got = collectMap(GraphAlgorithms.labelPropagation(twoChains, 50))
    (0L to 20L).foreach(i => assert(got(i) === i))
    // star leaves→root: root adopts the max leaf label (ties → larger label)
    val star = KGraph.fromEdges(
      Seq((1L, 0L, 1L), (2L, 0L, 1L), (3L, 0L, 1L)).toDF("src", "dst", "value"), id => id)
    val got2 = collectMap(GraphAlgorithms.labelPropagation(star, 10))
    assert(got2(0L) === 3L)
    assert(got2(1L) === 1L)
  }

  test("mssp on two chains, landmarks 0 and 10") {
    val got = GraphAlgorithms.mssp(twoChains, Seq(0L, 10L)).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    (0L to 9L).foreach(i => assert(got((i, 0L)) === i.toDouble))
    (10L to 20L).foreach(i => assert(got((i, 10L)) === (i - 10).toDouble))
    assert(!got.contains((5L, 10L)))
  }

  test("triangles + lcc on triangle graph") {
    import spark.implicits._
    // triangle 1-2-3 plus pendant 4
    val e = Seq((1L, 2L, 1L), (2L, 3L, 1L), (1L, 3L, 1L), (3L, 4L, 1L)).toDF("src", "dst", "value")
    val g = KGraph.fromEdges(e, id => id)
    assert(GraphAlgorithms.globalTriangleCount(g) === 1L)
    val tri = collectMap(GraphAlgorithms.triangleCounts(g))
    assert(tri === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 0L))
    val lcc = GraphAlgorithms.localClusteringCoefficient(g).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(lcc(1L) === 1.0)   // deg 2, 1 triangle
    assert(lcc(2L) === 1.0)
    assert(math.abs(lcc(3L) - 1.0 / 3.0) < 1e-12) // deg 3, 1 of 3 pairs closed
    assert(lcc(4L) === 0.0)
  }

  test("triangles + lcc on K4 plus pendant (multi-triangle corners)") {
    import spark.implicits._
    // K4 on 1..4 (every vertex in 3 triangles) + pendant 5 off vertex 4
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
      .map { case (a, b) => (a, b, 1L) }.toDF("src", "dst", "value")
    val g = KGraph.fromEdges(e, id => id)
    assert(GraphAlgorithms.globalTriangleCount(g) === 4L)
    val tri = collectMap(GraphAlgorithms.triangleCounts(g))
    assert(tri === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L, 5L -> 0L))
    val lcc = GraphAlgorithms.localClusteringCoefficient(g).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(lcc(1L) === 1.0)                            // deg 3, all 3 pairs closed
    assert(math.abs(lcc(4L) - 0.5) < 1e-12)            // deg 4, 3 of 6 pairs closed
    assert(lcc(5L) === 0.0)
  }

  test("adamic-adar and jaccard on square with diagonal") {
    import spark.implicits._
    // square 1-2-3-4-1 plus diagonal 1-3: common neighbors of (1,3) = {2,4}
    val e = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L), (4L, 1L, 1L), (1L, 3L, 1L))
      .toDF("src", "dst", "value")
    val g = KGraph.fromEdges(e, id => id)
    val aa = GraphAlgorithms.adamicAdar(g).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // deg(2)=deg(4)=2 ⇒ score(1,3) = 2·log(1/2)
    assert(math.abs(aa((1L, 3L)) - 2 * math.log(0.5)) < 1e-12)
    val jc = GraphAlgorithms.jaccard(g).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // N(1)={2,3,4}, N(3)={1,2,4}: common {2,4}=2, union size 3+3-2=4 → 0.5
    assert(math.abs(jc((1L, 3L)) - 0.5) < 1e-12)
  }

  test("hyperBall: converged counters equal the registers of each vertex's " +
       "exact reachable set (counter merge is a set-union homomorphism)") {
    import spark.implicits._
    import graft.pipeline.Sketches
    val p = 6
    // chain 0→…→9 plus a side branch 3→20→21: reachability is closed-form
    val e = (chainEdges(10).select(col("src"), col("dst")) unionByName
      Seq((3L, 20L), (20L, 21L)).toDF("src", "dst"))
    val g = KGraph.fromEdges(e.withColumn("value", lit(1.0)), id => id)
    val got = GraphAlgorithms.hyperBall(g, p = p).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    def reach(v: Long): Seq[Long] = v match {
      case x if x <= 3 => (x to 9L) ++ Seq(20L, 21L)
      case x if x <= 9 => x to 9L
      case 20L         => Seq(20L, 21L)
      case 21L         => Seq(21L)
    }
    val want = (0L to 9L).++(Seq(20L, 21L)).flatMap { v =>
      Sketches.hllRegisters(
          reach(v).map(u => Tuple1(u.toString)).toDF("k"), "k", p)
        .collect().map(r => (v, r.getLong(0), r.getInt(1)))
    }.toSet
    assert(got === want)
  }

  test("hyperBallTrajectory is a strictly-increasing contiguous prefix; " +
       "neighborhoodFunction/effectiveDiameter track exact BFS on chain " +
       "and star fixtures") {
    import spark.implicits._
    val chain = KGraph.fromEdges(chainEdges(10), id => id)
    val traj = GraphAlgorithms.hyperBallTrajectory(chain).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(traj.map(_._1).toSeq === (0L until traj.length).toSeq)
    traj.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 > a._2 || (b._2 == a._2 && b._3 > a._3),
        s"round ${b._1} did not grow: $a -> $b")
    case _ => ()
    }
    // p=8 (m=256): tiny balls sit deep in the linear-counting regime,
    // so estimates are near-exact and the drill pins accuracy, not luck
    val nf = GraphAlgorithms.neighborhoodFunction(chain, p = 8).toMap
    (0 until 9).foreach { t =>
      val exact = (0 until 10).map(v => math.min(10 - v, t + 1)).sum.toDouble
      assert(math.abs(nf(t) - exact) / exact < 0.05, s"N($t)=${nf(t)} vs $exact")
    }
    // directed chain: N grows through t=9 (every round adds pairs), so the
    // 0.9-effective diameter lands in (5, 9]; exact-N crossing is ~7.9
    val ed = GraphAlgorithms.effectiveDiameter(chain, p = 8)
    assert(ed > 5.0 && ed <= 9.0, s"chain effective diameter $ed")
    // star center→leaves: everything reachable in 1 hop → diameter ≤ 1
    val star = KGraph.fromEdges(
      (1L to 8L).map(i => (0L, i, 1.0)).toDF("src", "dst", "value"), id => id)
    val edStar = GraphAlgorithms.effectiveDiameter(star, p = 8)
    assert(edStar <= 1.0, s"star effective diameter $edStar")
    val starTraj = GraphAlgorithms.hyperBallTrajectory(star).collect()
    assert(starTraj.length === 2, "star converges after exactly one round")
  }

  test("geometricCentralities: closed-form closeness/harmonic on chain and " +
       "star (HyperBall's titular application; p=8 → near-exact)") {
    import spark.implicits._
    def asMap(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    val chain = KGraph.fromEdges(chainEdges(10), id => id)
    val gc = asMap(GraphAlgorithms.geometricCentralities(chain, p = 8))
    (0 until 10).foreach { v =>
      val k = 9 - v // reachable successors
      val (ball, sd, h, cl) = gc(v.toLong)
      val wantSd = k * (k + 1) / 2.0
      val wantH = (1 to k).map(1.0 / _).sum
      assert(math.abs(ball - (k + 1)) / (k + 1) < 0.05, s"v=$v ball $ball")
      assert(math.abs(sd - wantSd) <= math.max(0.05 * wantSd, 1e-9), s"v=$v sum_dist $sd vs $wantSd")
      assert(math.abs(h - wantH) <= math.max(0.05 * wantH, 1e-9), s"v=$v harmonic $h vs $wantH")
      val wantCl = if (k == 0) 0.0 else 2.0 / (10 - v)
      assert(math.abs(cl - wantCl) <= math.max(0.06 * wantCl, 1e-9), s"v=$v closeness $cl vs $wantCl")
    }
    // star 0→1..8: center reaches everything at distance 1
    val star = KGraph.fromEdges(
      (1L to 8L).map(i => (0L, i, 1.0)).toDF("src", "dst", "value"), id => id)
    val sc0 = asMap(GraphAlgorithms.geometricCentralities(star, p = 8))
    val (b0, sd0, h0, cl0) = sc0(0L)
    assert(math.abs(b0 - 9) < 0.5 && math.abs(sd0 - 8) < 0.5 &&
      math.abs(h0 - 8) < 0.5 && math.abs(cl0 - 1.0) < 0.07)
    (1L to 8L).foreach { v =>
      val (b, sd, h, cl) = sc0(v)
      assert(math.abs(b - 1) < 0.1 && sd === 0.0 && h === 0.0 && cl === 0.0, s"leaf $v")
    }
  }

  test("hits: closed-form normalized hubs/authorities on two disjoint " +
       "stars; the integer shadow matches n^k; normalization-per-round ≡ " +
       "scale-invariance of the power iteration") {
    import spark.implicits._
    // stars: members 101,102 → root 100 (n=2); 201,202,203 → root 200 (n=3)
    val edges = (Seq(101L, 102L).map(m => (m, 100L)) ++
      Seq(201L, 202L, 203L).map(m => (m, 200L)))
      .map { case (s, d) => (s, d, 1.0) }.toDF("src", "dst", "value")
    val g = KGraph.fromEdges(edges, id => id)
    val k = 4
    // closed form after k rounds: a(root_n) = n^k, h(member of star_n) =
    // n^k, zeros elsewhere; L2 normalization divides each side by its norm
    val aN = math.sqrt(math.pow(2, 2 * k) + math.pow(3, 2 * k))
    val hN = math.sqrt(2 * math.pow(2, 2 * k) + 3 * math.pow(3, 2 * k))
    val got = GraphAlgorithms.hits(g, iterations = k).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    def near(x: Double, want: Double): Boolean = math.abs(x - want) < 1e-9
    assert(near(got(100L)._2, math.pow(2, k) / aN) && got(100L)._1 === 0.0)
    assert(near(got(200L)._2, math.pow(3, k) / aN) && got(200L)._1 === 0.0)
    Seq(101L, 102L).foreach { m =>
      assert(near(got(m)._1, math.pow(2, k) / hN) && got(m)._2 === 0.0, s"m=$m") }
    Seq(201L, 202L, 203L).foreach { m =>
      assert(near(got(m)._1, math.pow(3, k) / hN) && got(m)._2 === 0.0, s"m=$m") }
    // integer shadow: exactly n^k, no normalization
    val cnt = GraphAlgorithms.hitsCounts(g, iterations = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(cnt(100L) === ((0L, 8L)) && cnt(200L) === ((0L, 27L)))
    assert(cnt(101L) === ((8L, 0L)) && cnt(203L) === ((27L, 0L)))
  }

  test("hits ≡ driver-side power iteration on a random digraph; " +
       "hitsCounts guards: iteration cap and loud 2^40 overflow") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val n = 14
    val es = (for (s <- 0 until n; d <- 0 until n
                   if s != d && rng.nextDouble() < 0.25) yield (s.toLong, d.toLong))
    val g = KGraph.fromEdges(es.map { case (s, d) => (s, d, 1.0) }
      .toDF("src", "dst", "value"), id => id)
    val k = 8
    // driver reference: unnormalized mutual reinforcement, normalize once
    // (per-round L2 only rescales, so directions agree)
    var h = Array.fill(n)(1.0)
    var a = Array.fill(n)(0.0)
    (1 to k).foreach { _ =>
      a = Array.tabulate(n)(v => es.filter(_._2 == v).map(e => h(e._1.toInt)).sum)
      val an = math.sqrt(a.map(x => x * x).sum); a = a.map(_ / an)
      h = Array.tabulate(n)(v => es.filter(_._1 == v).map(e => a(e._2.toInt)).sum)
      val hn = math.sqrt(h.map(x => x * x).sum); h = h.map(_ / hn)
    }
    val got = GraphAlgorithms.hits(g, iterations = k).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    (0 until n).foreach { v =>
      assert(math.abs(got(v.toLong)._1 - h(v)) < 1e-6, s"hub v=$v")
      assert(math.abs(got(v.toLong)._2 - a(v)) < 1e-6, s"auth v=$v")
    }
    intercept[IllegalArgumentException] {
      GraphAlgorithms.hitsCounts(g, iterations = 7)
    }
    // star with 102 members: 102^6 > 2^40 — the guard must fire loudly
    val big = KGraph.fromEdges((1L to 102L).map(m => (m, 0L, 1.0))
      .toDF("src", "dst", "value"), id => id)
    intercept[IllegalArgumentException] {
      GraphAlgorithms.hitsCounts(big, iterations = 6)
    }
  }
}

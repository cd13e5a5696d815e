package graft

import org.apache.spark.sql.functions._

import graft.algos.GraphAlgorithms
import graft.core.{GraphGenerators, KGraph}

/** Generator-graph goldens from the reference: grid WCC
  * (ConnectedComponentsTest.java:125-162, 10×10 grid → all component 0) and
  * star PageRank (PageRankTest.java:419-470, n=100: hub 12.7725…, leaves
  * 0.15). */
class GeneratorGoldenSpec extends SparkSpec {

  test("grid 10x10 WCC: single component 0 (reference golden)") {
    val grid = GraphGenerators.gridGraph(spark, 10, 10)
    val g = KGraph(grid.vertices.select(col("id"), col("id").as("value")), grid.edges)
    val got = collectMap(GraphAlgorithms.wcc(g))
    assert(got.size === 100)
    got.foreach { case (id, comp) => assert(comp === 0L, s"vertex $id") }
  }

  test("star n=100 PageRank: hub 12.7725, leaves 0.15 (reference golden)") {
    val star = GraphGenerators.starGraph(spark, 100)
    val g = KGraph(star.vertices.select(col("id"), lit(0.0).as("value")), star.edges)
    val got = GraphAlgorithms.pageRank(g, tolerance = 0.0001, resetProb = 0.15)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // reference: 12.77250000000002 (the same sum up to FP association)
    assert(math.abs(got(0L) - 12.7725) < 1e-9)
    (1L until 100L).foreach(i => assert(got(i) === 0.15, s"leaf $i"))
  }

  test("complete K25 PageRank: every vertex 0.9935138543444264 (reference golden)") {
    // PageRankTest.testCompletePageRank (PageRankTest.java:267-316):
    // 25-vertex complete graph, reset 0.15, run(31) → per-vertex golden
    // (0.9935138543444264, delta 0.0011446139392183863) at :314. The delta
    // exceeds the 1e-4 tolerance, so the reference stopped at its
    // iteration CAP — whose superstep 0 is the init round: 31 reference
    // supersteps = 30 rank updates. Our 30-iteration run reproduces the
    // golden to FP-association noise (measured 2.4e-15).
    val k25 = GraphGenerators.completeGraph(spark, 25)
    val g = KGraph(k25.vertices.select(col("id"), lit(0.0).as("value")), k25.edges)
    val got = GraphAlgorithms.pageRank(g, tolerance = 0.0, resetProb = 0.15,
        maxIterations = 30)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.size === 25)
    got.foreach { case (id, r) =>
      assert(math.abs(r - 0.9935138543444264) < 1e-12, s"vertex $id: $r")
    }
  }

test("grid 10x10 PageRank matches testGridPageRank golden ranks") {
    // PageRankTest.testGridPageRank (PageRankTest.java:319-415): 10×10
    // directed grid, reset 0.15, tolerance 1e-4; golden map :405-414. The
    // golden is a TOLERANCE-TRUNCATED fixpoint (full DAG convergence
    // differs by up to 5.8e-5): matching it to 3.6e-15 pins not just the
    // rank recurrence but the per-vertex tolerance-halting semantics.
    val grid = GraphGenerators.gridGraph(spark, 10, 10)
    val g = KGraph(grid.vertices.select(col("id"), lit(0.0).as("value")), grid.edges)
    val gold = Map[Long, Double](
      0L -> 0.15,
      1L -> 0.21375,
      2L -> 0.24084375,
      3L -> 0.25235859374999997,
      4L -> 0.25725240234374996,
      5L -> 0.2593322709960937,
      6L -> 0.26021621517333976,
      7L -> 0.26059189144866934,
      8L -> 0.26075155386568444,
      9L -> 0.26081941039291584,
      10L -> 0.21375,
      11L -> 0.33168749999999997,
      12L -> 0.39332578124999995,
      13L -> 0.4244158593749999,
      14L -> 0.4397090112304687,
      15L -> 0.447092544946289,
      16L -> 0.4506062230508422,
      17L -> 0.45225919866229236,
      18L -> 0.45302956982439013,
      19L -> 0.5641763879611975,
      20L -> 0.24084375,
      21L -> 0.39332578124999995,
      22L -> 0.48432691406249995,
      23L -> 0.5362156787109374,
      24L -> 0.5647679932250975,
      25L -> 0.5800407287228392,
      26L -> 0.5880249545038145,
      27L -> 0.5921207650955954,
      28L -> 0.5941888923409938,
      29L -> 0.8820802090119402,
      30L -> 0.25235859374999997,
      31L -> 0.4244158593749999,
      32L -> 0.5362156787109374,
      33L -> 0.6057833269042968,
      34L -> 0.6474843110549925,
      35L -> 0.6716981419055784,
      36L -> 0.685382315973992,
      37L -> 0.6929388094545746,
      38L -> 0.6970292732631166,
      39L -> 1.1960056187969734,
      40L -> 0.25725240234374996,
      41L -> 0.4397090112304687,
      42L -> 0.5647679932250975,
      43L -> 0.6474843110549925,
      44L -> 0.7003616643967435,
      45L -> 0.7331254176784868,
      46L -> 0.7528657868023035,
      47L -> 0.7644669534091731,
      48L -> 0.771135896335723,
      49L -> 1.4943375319201095,
      50L -> 0.2593322709960937,
      51L -> 0.447092544946289,
      52L -> 0.5800407287228392,
      53L -> 0.6716981419055784,
      54L -> 0.7331254176784868,
      55L -> 0.7731566050267139,
      56L -> 0.7985595165273324,
      57L -> 0.8142862497230148,
      58L -> 0.8238044120749636,
      59L -> 1.7703037772639525,
      60L -> 0.26021621517333976,
      61L -> 0.4506062230508422,
      62L -> 0.5880249545038145,
      63L -> 0.685382315973992,
      64L -> 0.7528657868023035,
      65L -> 0.7985595165273324,
      66L -> 0.8287755890482327,
      67L -> 0.8483012814777801,
      68L -> 0.8606449197599159,
      69L -> 2.020532301572323,
      70L -> 0.26059189144866934,
      71L -> 0.45225919866229236,
      72L -> 0.5921207650955954,
      73L -> 0.6929388094545746,
      74L -> 0.7644669534091731,
      75L -> 0.8142862497230148,
      76L -> 0.8483012814777801,
      77L -> 0.8710560892561131,
      78L -> 0.8859729288318124,
      79L -> 2.2439909510899945,
      80L -> 0.26075155386568444,
      81L -> 0.45302956982439013,
      82L -> 0.5941888923409938,
      83L -> 0.6970292732631166,
      84L -> 0.771135896335723,
      85L -> 0.8238044120749636,
      86L -> 0.8606449197599159,
      87L -> 0.8859729288318124,
      88L -> 0.9030769895070407,
      89L -> 2.4412000289669873,
      90L -> 0.26081941039291584,
      91L -> 0.5641763879611975,
      92L -> 0.8820802090119402,
      93L -> 1.1960056187969734,
      94L -> 1.4943375319201095,
      95L -> 1.7703037772639525,
      96L -> 2.020532301572323,
      97L -> 2.2439909510899945,
      98L -> 2.4412000289669873,
      99L -> 4.300040049243878)
    val got = GraphAlgorithms.pageRank(g, tolerance = 0.0001, resetProb = 0.15,
        maxIterations = 51)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.size === 100)
    gold.foreach { case (k, v) =>
      assert(math.abs(got(k) - v) < 1e-12, s"vertex $k: ${got(k)} != $v")
    }
  }

  test("complete graph K5 degrees and triangles") {
    val k5 = GraphGenerators.completeGraph(spark, 5)
    assert(collectMap(k5.outDegrees).values.forall(_ == 4L))
    // K5 has C(5,3) = 10 triangles
    assert(GraphAlgorithms.globalTriangleCount(k5) === 10L)
  }

  test("rmatGraph: deterministic (pure function of params), ids bounded by " +
       "2^scale, self-loop-free, heavy-tailed degrees") {
    val scale = 12; val m = 16384L
    val g1 = GraphGenerators.rmatGraph(spark, scale, m)
    val e1 = g1.edges.select("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val e2 = GraphGenerators.rmatGraph(spark, scale, m).edges
      .select("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(e1 === e2, "same params must reproduce the identical edge multiset")
    assert(e1.nonEmpty && e1.size <= m)
    e1.foreach { case (s, d) =>
      assert(s >= 0 && s < (1L << scale) && d >= 0 && d < (1L << scale))
      assert(s != d)
    }
    // heavy tail: the hottest vertex concentrates far above the mean
    // (a=0.57 biases every level toward the low quadrant)
    val degs = e1.flatMap { case (s, d) => Seq(s, d) }
      .groupBy(identity).view.mapValues(_.size).values.toSeq
    val mean = degs.sum.toDouble / degs.size
    assert(degs.max > 20 * mean,
      s"max degree ${degs.max} vs mean $mean — expected R-MAT skew")
    // different params → different graph
    val g3 = GraphGenerators.rmatGraph(spark, scale, m, a = 0.25, b = 0.25, c = 0.25)
      .edges.select("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(g3 !== e1)
  }
}

package graft

import graft.algos.GraphAlgorithms
import graft.algos.compute.BasicAlgorithms
import graft.core.KGraph
import graft.pregel.Pregel
import org.apache.spark.sql.functions._

/** Personalized PageRank goldens from the reference
  * (PageRankTest.testChainPersonalPageRank, PageRankTest.java:198-266):
  * chain 0→…→9, source 4, resetProb 0.15, tol 0.0001, 4 reference
  * supersteps → sorted ranks [0×6, 0.614125, 0.7225, 0.85, 1.0]. */
class PersonalizedPrSpec extends SparkSpec {

  val expected = Seq(0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
    0.6141249999999999, 0.7224999999999999, 0.85, 1.0)

  test("pregel personalized PageRank matches reference goldens") {
    val sc = spark.sparkContext
    // initial VV: (0.0, src → -Infinity else 0.0); initial message 0.0
    val verts = sc.parallelize((0L to 9L).map(i =>
      (i, (0.0, if (i == 4L) Double.NegativeInfinity else 0.0))))
    val edges = sc.parallelize((0L until 9L).map(i => (i, (i + 1, 1.0))))
    val cf = new BasicAlgorithms.PageRank(0.0001, 0.15, srcVertexId = Some(4L))
    // reference run(maxIterations=4) executes supersteps 0..4
    val res = Pregel.run(spark, cf, verts, edges,
      initialMessage = Some(0.0), maxIterations = 5)
    val got = res.vertices.collect().toMap
    val sorted = got.values.map(_._1).toSeq.sorted
    sorted.zip(expected).foreach { case (g, e) => assert(math.abs(g - e) < 1e-12, s"$g != $e") }
    assert(got(4L)._1 === 1.0)
  }

  test("DataFrame personalized PageRank matches the same goldens") {
    val g = KGraph.fromEdges(chainEdges(10), _ => lit(0.0))
    // 3 message rounds ≡ reference supersteps 1..4 after init
    val got = GraphAlgorithms.pageRank(g, tolerance = 0.0001, resetProb = 0.15,
      srcVertexId = Some(4L), maxIterations = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val sorted = got.values.toSeq.sorted
    sorted.zip(expected).foreach { case (gv, e) => assert(math.abs(gv - e) < 1e-12, s"$gv != $e") }
  }

  test("non-personalized DataFrame path unchanged by the seeding rework") {
    val g = KGraph.fromEdges(chainEdges(10), _ => lit(0.0))
    val got = GraphAlgorithms.pageRank(g, tolerance = 0.0001, resetProb = 0.15)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(got(0L) - 0.15) < 1e-12)
    assert(math.abs(got(1L) - 0.27749999999999997) < 1e-9)
  }
}

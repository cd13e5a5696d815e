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

  test("complete graph K5 degrees and triangles") {
    val k5 = GraphGenerators.completeGraph(spark, 5)
    assert(collectMap(k5.outDegrees).values.forall(_ == 4L))
    // K5 has C(5,3) = 10 triangles
    assert(GraphAlgorithms.globalTriangleCount(k5) === 10L)
  }
}

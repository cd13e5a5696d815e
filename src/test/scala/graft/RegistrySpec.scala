package graft

import graft.algos.compute.AlgorithmRegistry

/** GraphAlgorithmType registry parity: run every named algorithm end-to-end
  * from a bare edge RDD (the REST surface's dispatch path). */
class RegistrySpec extends SparkSpec {

  def edges = spark.sparkContext.parallelize(
    (0L until 9L).map(i => (i, i + 1, 1.0)) ++ (10L until 20L).map(i => (i, i + 1, 1.0)))

  test("registry runs every named algorithm") {
    val wcc = AlgorithmRegistry.run(spark, "wcc", edges).collect().toMap
    assert(wcc(5L) === 0L && wcc(15L) === 10L)
    val bfs = AlgorithmRegistry.run(spark, "bfs", edges,
      Map("srcVertexId" -> 10L)).collect().toMap
    assert(bfs(13L) === 3L)
    val sssp = AlgorithmRegistry.run(spark, "sssp", edges,
      Map("srcVertexId" -> 0L)).collect().toMap
    assert(sssp(7L) === 7.0)
    val mssp = AlgorithmRegistry.run(spark, "mssp", edges,
      Map("landmarkVertexIds" -> Set(0L, 10L))).collect().toMap
    assert(mssp(5L).asInstanceOf[Map[Long, Double]](0L) === 5.0)
    val pr = AlgorithmRegistry.run(spark, "pagerank", edges,
      Map("tolerance" -> 0.0001, "resetProbability" -> 0.15)).collect().toMap
    assert(math.abs(pr(0L).asInstanceOf[(Double, Double)]._1 - 0.15) < 1e-12)
    val lp = AlgorithmRegistry.run(spark, "lp", edges).collect().toMap
    assert(lp(0L) === 0L)
    val lcc = AlgorithmRegistry.run(spark, "lcc", edges, maxIterations = 10).collect().toMap
    assert(lcc(5L) === 0.0) // chains have no triangles
    // svdpp over a small bipartite rating set: users 1-2, items 10-11
    val ratings = spark.sparkContext.parallelize(Seq(
      (1L, 10L, 5.0), (1L, 11L, 3.0), (2L, 10L, 4.0)))
    val svdpp = AlgorithmRegistry.run(spark, "svdpp", ratings,
      Map("vector.size" -> 4, "iterations" -> 2, "random.seed" -> 42L),
      maxIterations = 10).collect().toMap
    assert(svdpp.keySet === Set(1L, 2L, -11L, -12L)) // users as id, items as -id-1
    svdpp.values.foreach { v =>
      val sv = v.asInstanceOf[graft.algos.compute.Cf.SvdppValue]
      assert(sv.factors.length === 4)
    }
    intercept[IllegalArgumentException] {
      AlgorithmRegistry.run(spark, "nope", edges)
    }
    assert(AlgorithmRegistry.initialVertexValue("bfs", 7L) === Long.MaxValue)
    assert(AlgorithmRegistry.algorithms.size === 8) // GraphAlgorithmType parity
  }
}

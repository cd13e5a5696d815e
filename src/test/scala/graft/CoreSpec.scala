package graft

import org.apache.spark.sql.functions._
import graft.core.{GraphGenerators, GraphIO, KGraph}
import graft.core.KGraph.EdgeDirection

/** Golden-value ports of the reference's GraphOperationsITCase
  * (src/test/java/io/kgraph/GraphOperationsITCase.java:42-243). */
class CoreSpec extends SparkSpec {

  def graph: KGraph = KGraph(longLongVertices, longLongEdges)

  test("outDegrees matches reference golden") {
    assert(collectMap(graph.outDegrees) ===
      Map(1L -> 2L, 2L -> 1L, 3L -> 2L, 4L -> 1L, 5L -> 1L))
  }

  test("inDegrees matches reference golden") {
    assert(collectMap(graph.inDegrees) ===
      Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 1L, 5L -> 2L))
  }

  test("undirected matches reference golden (14 edges, values preserved)") {
    val got = graph.undirected.edges.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val expected = Set(
      (1L, 2L, 12L), (2L, 1L, 12L), (1L, 3L, 13L), (3L, 1L, 13L),
      (2L, 3L, 23L), (3L, 2L, 23L), (3L, 4L, 34L), (4L, 3L, 34L),
      (3L, 5L, 35L), (5L, 3L, 35L), (4L, 5L, 45L), (5L, 4L, 45L),
      (5L, 1L, 51L), (1L, 5L, 51L))
    assert(got === expected)
  }

  test("subgraph(v>2, e>34) matches reference golden") {
    val got = graph.subgraph(col("value") > 2, col("value") > 34)
      .edges.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((3L, 5L, 35L), (4L, 5L, 45L)))
  }

  test("filterOnVertices(v>2) matches reference golden") {
    val got = graph.filterOnVertices(col("value") > 2)
      .edges.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((3L, 4L, 34L), (3L, 5L, 35L), (4L, 5L, 45L)))
  }

  test("filterOnEdges(e>34) keeps 2 edges") {
    val got = graph.filterOnEdges(col("value") > 34)
      .edges.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((3L, 5L, 35L), (4L, 5L, 45L), (5L, 1L, 51L)))
  }

  test("fromEdges derives vertex table with initializer") {
    val g = KGraph.fromEdges(longLongEdges, id => id * 10)
    assert(collectMap(g.vertices) ===
      Map(1L -> 10L, 2L -> 20L, 3L -> 30L, 4L -> 40L, 5L -> 50L))
  }

  test("joinWithVertices combines matched, keeps unmatched") {
    import spark.implicits._
    val input = Seq((1L, 100L), (3L, 300L)).toDF("id", "value")
    val got = collectMap(graph.joinWithVertices(input, (v, in) => v + in).vertices)
    assert(got === Map(1L -> 101L, 2L -> 2L, 3L -> 303L, 4L -> 4L, 5L -> 5L))
  }

  test("mapVertices / mapEdges") {
    assert(collectMap(graph.mapVertices((_, v) => v * 2).vertices) ===
      Map(1L -> 2L, 2L -> 4L, 3L -> 6L, 4L -> 8L, 5L -> 10L))
    val e = graph.mapEdges((_, _, v) => v + 1).edges.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(e.contains((1L, 2L, 13L)))
  }

  test("reduceOnEdges(min, IN) per-vertex") {
    // reference ReduceOnEdgesMethodsITCase: lowest in-edge value per vertex
    val got = collectMap(graph.reduceOnEdges(min, EdgeDirection.In))
    assert(got === Map(2L -> 12L, 3L -> 13L, 4L -> 34L, 5L -> 35L, 1L -> 51L))
  }

  test("reduceOnNeighbors(sum, In) per-vertex: sum of in-neighbor values") {
    val got = collectMap(graph.reduceOnNeighbors(sum, EdgeDirection.In))
    // in-neighbors: 1←5; 2←1; 3←1,2; 4←3; 5←3,4
    assert(got === Map(1L -> 5L, 2L -> 1L, 3L -> 3L, 4L -> 3L, 5L -> 7L))
  }

  test("edgesGroupedBySource adjacency") {
    val row = graph.edgesGroupedBySource.filter(col("id") === 3L).collect()(0)
    val targets = row.getSeq[org.apache.spark.sql.Row](1).map(_.getLong(0)).toSet
    assert(targets === Set(4L, 5L))
  }

  test("generators: complete, grid, star, chain") {
    assert(GraphGenerators.completeGraph(spark, 4).edges.count() === 12)
    assert(GraphGenerators.gridGraph(spark, 3, 3).edges.count() === 12)
    assert(GraphGenerators.starGraph(spark, 5).edges.count() === 4)
    assert(GraphGenerators.chain(spark, 10).edges.count() === 9)
  }

  test("bucketed save/load: vertex-edge join plans without a shuffle") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val g = KGraph.fromEdges(
      Seq((1L, 2L, 1L), (2L, 3L, 2L), (3L, 1L, 3L), (1L, 3L, 4L))
        .toDF("src", "dst", "value"), id => id)
    GraphIO.saveBucketed(g, "bspec", 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val loaded = GraphIO.loadBucketed(spark, "bspec")
      // vertices ⋈ edges on the bucket key: co-located, no Exchange
      val joined = loaded.edges.join(
        loaded.vertices.withColumnRenamed("id", "src"), Seq("src"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected shuffle-free bucketed join, got:\n$plan")
      assert(joined.count() === 4)
      // degrees off the bucketed edge table also skip the groupBy exchange
      val deg = loaded.edges.groupBy(col("src")).agg(count(lit(1)))
      assert(!deg.queryExecution.executedPlan.toString.contains("Exchange"))
      assert(deg.count() === 3)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bspec_vertices")
      spark.sql("DROP TABLE IF EXISTS bspec_edges")
    }
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.algos.GraphAlgorithms
import graft.core.{GraphGenerators, KGraph}

/** wccLogRounds ≡ wcc on every graph shape, including the adversarial
  * high-diameter cases it exists for. */
class WccLogRoundsSpec extends SparkSpec {

  private def compare(g: KGraph): Unit = {
    val a = collectMap(GraphAlgorithms.wcc(g))
    val b = collectMap(GraphAlgorithms.wccLogRounds(g))
    assert(a === b)
  }

  test("two chains: components 0 and 10") {
    val g = KGraph.fromEdges(twoChainsEdges, id => id)
    compare(g)
    val got = collectMap(GraphAlgorithms.wccLogRounds(g))
    assert(got(9L) === 0L && got(20L) === 10L)
  }

  test("long path (diameter 200) converges in far fewer than 200 rounds") {
    import spark.implicits._
    val path = (0L until 200L).map(i => (i, i + 1, 1.0)).toDF("src", "dst", "value")
    val g = KGraph.fromEdges(path, id => id)
    val got = collectMap(GraphAlgorithms.wccLogRounds(g, maxRounds = 12))
    (0L to 200L).foreach(i => assert(got(i) === 0L, s"vertex $i"))
  }

  test("grid, star clusters, random graphs, isolated vertices") {
    compare(GraphGenerators.gridGraph(spark, 8, 8))
    import spark.implicits._
    val stars = (1L to 300L).filter(_ % 100 != 0)
      .map(c => (c, c - c % 100, 1.0)).toDF("src", "dst", "value")
    compare(KGraph.fromEdges(stars, id => id))
    val rnd = new scala.util.Random(7)
    val edges = (1 to 300).map(_ => (rnd.nextInt(80).toLong, rnd.nextInt(80).toLong, 1.0))
      .filter(e => e._1 != e._2).toDF("src", "dst", "value")
    compare(KGraph.fromEdges(edges, id => id))
    // isolated vertex keeps its own id as label
    val g = KGraph(
      Seq((1L, 1L), (2L, 2L), (99L, 99L)).toDF("id", "value"),
      Seq((1L, 2L, 1.0)).toDF("src", "dst", "value"))
    val got = collectMap(GraphAlgorithms.wccLogRounds(g))
    assert(got === Map(1L -> 1L, 2L -> 1L, 99L -> 99L))
  }
}

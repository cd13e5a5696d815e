package graft

import org.apache.spark.sql.functions._

import graft.algos.GraphAlgorithms
import graft.core.KGraph
import graft.core.KGraph.EdgeDirection
import graft.pregel.{Aggregators, ComputeFunction, Pregel}
import graft.pregel.Pregel.{Callback, MasterCallback, OutEdge}

/** Additional reference-parity coverage: groupReduce neighborhood ops
  * (ReduceOnEdges/ReduceOnNeighborsMethodsITCase analogs), msspAsMap shape,
  * and aggregator persistent-vs-reset semantics
  * (pregel/aggregators/AggregatorTest.java:59-225). */
class ParitySpec extends SparkSpec {

  def graph: KGraph = KGraph(longLongVertices, longLongEdges)

  test("groupReduceOnEdges OUT: per-vertex view of own value + edge list") {
    val out = graph.groupReduceOnEdges(EdgeDirection.Out) { df =>
      df.select(col("id"),
        (col("value") + aggregate(col("edges"), lit(0L), (acc, e) => acc + e.getField("value")))
          .as("value"))
    }
    // vertex 1 (value 1) with out-edges 12+13 → 26; vertex 3 (3) + 34+35 → 72
    val got = collectMap(out)
    assert(got(1L) === 26L)
    assert(got(3L) === 72L)
    assert(!got.contains(2L) || got(2L) === 25L) // 2 + 23
  }

  test("groupReduceOnNeighbors IN: max neighbor value per vertex") {
    val out = graph.groupReduceOnNeighbors(EdgeDirection.In) { df =>
      df.select(col("id"),
        aggregate(col("neighbors"), lit(Long.MinValue),
          (acc, n) => greatest(acc, n.getField("nvalue"))).as("value"))
    }
    // in-neighbors: 1←{5}; 3←{1,2}; 5←{3,4}
    val got = collectMap(out)
    assert(got(1L) === 5L)
    assert(got(3L) === 2L)
    assert(got(5L) === 4L)
  }

  test("groupReduce left-join parity: edge-less vertices reach the user " +
       "fold with an EMPTY list (KGraph.java:415-423,553-571 " +
       "vertices().leftJoin + ApplyEdgeLeftJoinFunction emptyList)") {
    import spark.implicits._
    // vertex 2 is a sink (no OUT edges), vertex 3 is fully isolated
    val v = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "value")
    val e = Seq((1L, 2L, 12L)).toDF("src", "dst", "value")
    val g = KGraph(v, e)

    val edgesOut = g.groupReduceOnEdges(EdgeDirection.Out) { df =>
      df.select(col("id"),
        size(col("edges")).cast("long").as("n"),
        aggregate(col("edges"), lit(0L), (acc, x) => acc + x.getField("value")).as("s"))
    }.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // all three vertices present; sink + isolated see the empty list
    assert(edgesOut === Map(1L -> ((1L, 12L)), 2L -> ((0L, 0L)), 3L -> ((0L, 0L))))

    val nbrsIn = g.groupReduceOnNeighbors(EdgeDirection.In) { df =>
      df.select(col("id"),
        size(col("neighbors")).cast("long").as("n"),
        aggregate(col("neighbors"), lit(0L), (acc, x) => acc + x.getField("nvalue")).as("s"))
    }.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // vertex 1 has no IN edges; neighbor value of 2's in-neighbor 1 is 10
    assert(nbrsIn === Map(1L -> ((0L, 0L)), 2L -> ((1L, 10L)), 3L -> ((0L, 0L))))
  }

  test("reduceOnEdges OUT max / reduceOnNeighbors OUT min") {
    val got = collectMap(graph.reduceOnEdges(max, EdgeDirection.Out))
    assert(got === Map(1L -> 13L, 2L -> 23L, 3L -> 35L, 4L -> 45L, 5L -> 51L))
    val got2 = collectMap(graph.reduceOnNeighbors(min, EdgeDirection.Out))
    // out-neighbors: 1→{2,3} min 2; 3→{4,5} min 4; 5→{1} min 1
    assert(got2(1L) === 2L && got2(3L) === 4L && got2(5L) === 1L)
  }

  test("foldNeighborsWith: arbitrary user fold per window-vertex " +
       "(EdgeFoldFunction.java:30-44 contract)") {
    import graft.streaming.EdgeStreamOps._
    import spark.implicits._
    val t0 = 1700000000000L
    // two tumbling 1-minute windows for vertex 1; one for vertex 2
    val edges = Seq(
      (1L, 2L, 12.0, new java.sql.Timestamp(t0)),
      (1L, 3L, 13.0, new java.sql.Timestamp(t0 + 1000)),
      (1L, 4L, 14.0, new java.sql.Timestamp(t0 + 61000)),
      (2L, 3L, 23.0, new java.sql.Timestamp(t0 + 2000))
    ).toDF("src", "dst", "value", "ts")
    // non-commutative fold proves sequential aggregate() semantics: the
    // accumulator records (vertex, neighbor, value) visit order
    val folded = edges.slice(col("ts"), "1 minute")
      .foldNeighborsWith("")((acc, v, nbr, ev) => s"$acc|$v->$nbr:$ev")
      .collect().map(r => (r.getTimestamp(0).getTime, r.getLong(1)) -> r.getString(2)).toMap
    val w0 = t0 - t0 % 60000 // window aligned to the epoch minute
    assert(folded((w0, 1L)) === "|1->2:12.0|1->3:13.0")
    assert(folded((w0 + 60000, 1L)) === "|1->4:14.0")
    assert(folded((w0, 2L)) === "|2->3:23.0")
    // numeric fold parity with reduceOnEdges(sum)
    val sums = edges.slice(col("ts"), "1 minute")
      .foldNeighborsWith(0.0)((acc, _, _, ev) => acc + ev)
      .collect().map(r => (r.getTimestamp(0).getTime, r.getLong(1)) -> r.getDouble(2)).toMap
    val viaReduce = edges.slice(col("ts"), "1 minute").reduceOnEdges(sum)
      .collect().map(r => (r.getStruct(0).getTimestamp(0).getTime, r.getLong(1)) -> r.getDouble(2)).toMap
    assert(sums === viaReduce)
  }

  test("slice supports sliding (hopping) windows, not just tumbling") {
    import graft.streaming.EdgeStreamOps._
    import spark.implicits._
    val t0 = 1699999980000L // epoch-minute aligned (t0 % 60000 == 0)
    val edges = Seq((1L, 2L, 10.0, new java.sql.Timestamp(t0 + 35000)))
      .toDF("src", "dst", "value", "ts")
    // 1-minute window sliding every 30s: the edge at +35s lands in the
    // [t0, t0+60s) and [t0+30s, t0+90s) windows → two rows
    val slid = edges.slice(col("ts"), "1 minute", "OUT", Some("30 seconds"))
      .reduceOnEdges(sum)
      .collect().map(r => r.getStruct(0).getTimestamp(0).getTime -> r.getDouble(2)).toMap
    assert(slid === Map(t0 -> 10.0, t0 + 30000 -> 10.0))
    // tumbling default unchanged: one row
    val tum = edges.slice(col("ts"), "1 minute").reduceOnEdges(sum).collect()
    assert(tum.length === 1)
  }

  test("msspAsMap reassembles the reference map-valued vertex shape") {
    val g = KGraph.fromEdges(twoChainsEdges, id => id)
    val got = GraphAlgorithms.msspAsMap(g, Seq(0L, 10L)).collect()
      .map(r => r.getLong(0) -> r.getMap[Long, Double](1)).toMap
    assert(got(5L) === Map(0L -> 5.0))
    assert(got(15L) === Map(10L -> 5.0))
    assert(got(0L) === Map(0L -> 0.0))
  }

  test("persistent aggregators accumulate; reset aggregators do not") {
    val verts = sc.parallelize((0L until 5L).map(i => (i, i)))
    val edges = sc.parallelize(Seq.empty[(Long, (Long, Double))])
    val res = Pregel.run(spark, new ParitySpec.AggProbe, verts, edges, maxIterations = 10)
    // 3 supersteps × 5 vertices persistent; last superstep only for reset
    assert(res.superstep === 3)
    assert(res.aggregates("persistent.sum") === 15L)
    assert(res.aggregates("reset.sum") === 5L)
    assert(res.aggregates("min.track") === 0L)
  }

  test("ReverseEdges matches ReverseEdgesTest golden adjacency (two chains)") {
    // ReverseEdgesTest.java:93-115: two directed chains 0→…→9 and
    // 10→…→20; after the mutation every vertex's out-adjacency is the
    // undirected neighborhood (forward target + added reverse edge)
    val chains = (0L until 9L).map(i => (i, i + 1)) ++
      (10L until 20L).map(i => (i, i + 1))
    val verts = sc.parallelize((0L to 20L).map(i => (i, i)))
    val e = sc.parallelize(chains.map { case (s, d) => (s, (d, 1.0)) })
    val res = Pregel.run(spark,
      new graft.algos.compute.BasicAlgorithms.ReverseEdges, verts, e,
      maxIterations = 10)
    val adj = res.edges.map { case (s, edge) => (s, edge.target) }
      .collect().toSeq.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def expect(lo: Long, hi: Long): Map[Long, Set[Long]] =
      (lo to hi).map { i =>
        i -> (Seq(i - 1, i + 1).filter(j => j >= lo && j <= hi).map(_.toLong).toSet)
      }.toMap
    assert(adj === expect(0L, 9L) ++ expect(10L, 20L))
  }

  test("jaccard matches JaccardTest goldens, similarity and distance modes") {
    import spark.implicits._
    // the reference test graph (JaccardTest.java:68-83): 8 undirected edges
    // incl. the pendant 5–6 whose jaccard is 0 (no common neighbor)
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 4L), (2L, 5L), (3L, 4L),
      (4L, 5L), (5L, 6L)).map { case (s, d) => (s, d, 1L) }
      .toDF("src", "dst", "value")
    val g = KGraph.fromEdges(e, id => id)
    def run(conv: Boolean): Map[(Long, Long), Double] =
      GraphAlgorithms.jaccard(g, conversionEnabled = conv).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // JaccardTest.java:113 (canonical-edge projection of the per-vertex maps)
    val sim = run(conv = false)
    val simGold = Map(
      (1L, 2L) -> 0.2, (1L, 3L) -> 0.25, (1L, 4L) -> 0.4, (2L, 4L) -> 0.4,
      (2L, 5L) -> 0.2, (3L, 4L) -> 0.2, (4L, 5L) -> 0.16666666666666666,
      (5L, 6L) -> 0.0)
    assert(sim.keySet === simGold.keySet)
    simGold.foreach { case (k, v) => assert(math.abs(sim(k) - v) < 1e-12, k) }
    // JaccardTest.java:169: distance = 1/v − 1, zero → Double.MAX_VALUE
    val dist = run(conv = true)
    val distGold = Map(
      (1L, 2L) -> 4.0, (1L, 3L) -> 3.0, (1L, 4L) -> 1.5, (2L, 4L) -> 1.5,
      (2L, 5L) -> 4.0, (3L, 4L) -> 4.0, (4L, 5L) -> 5.0,
      (5L, 6L) -> Double.MaxValue)
    assert(dist.keySet === distGold.keySet)
    distGold.foreach { case (k, v) => assert(math.abs(dist(k) - v) < 1e-12, k) }
  }

  test("adamic-adar matches AdamicAdarTest goldens, both conversion modes") {
    import spark.implicits._
    // the reference test graph (AdamicAdarTest.java:62-76): 7 undirected edges
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 4L), (2L, 5L), (3L, 4L),
      (4L, 5L)).map { case (s, d) => (s, d, 1L) }.toDF("src", "dst", "value")
    val g = KGraph.fromEdges(e, id => id)
    def run(conv: Boolean): Map[(Long, Long), Double] =
      GraphAlgorithms.adamicAdar(g, conversionEnabled = conv).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // AdamicAdarTest.java:118 (exact, Σ ln(1/deg(common)) — negative)
    val gold = Map(
      (1L, 2L) -> -1.3862943611198906, (1L, 3L) -> -1.3862943611198906,
      (1L, 4L) -> -1.791759469228055, (2L, 4L) -> -1.791759469228055,
      (2L, 5L) -> -1.3862943611198906, (3L, 4L) -> -1.0986122886681098,
      (4L, 5L) -> -1.0986122886681098)
    val aa = run(conv = false)
    assert(aa.keySet === gold.keySet)
    gold.foreach { case (k, v) => assert(math.abs(aa(k) - v) < 1e-12, k) }
    // AdamicAdarTest.java:175 (conversion = ×(−1), AdamicAdar.java:195)
    val conv = run(conv = true)
    gold.foreach { case (k, v) => assert(math.abs(conv(k) + v) < 1e-12, k) }
  }

  def sc = spark.sparkContext
}

object ParitySpec {
  /** AggregatorTest analog: a persistent aggregator accumulates across
    * supersteps; a reset aggregator starts from zero each superstep.
    * Top-level so the closure serializes without the suite instance. */
  class AggProbe extends ComputeFunction[Long, Long, Double, Long] {
    override def init(configs: Map[String, Any], cb: MasterCallback): Unit = {
      cb.registerAggregator("persistent.sum", Aggregators.LongSum, persistent = true)
      cb.registerAggregator("reset.sum", Aggregators.LongSum)
      cb.registerAggregator("min.track", Aggregators.LongMin)
    }
    def compute(superstep: Int, id: Long, value: Long, messages: Iterable[Long],
                edges: Iterable[OutEdge[Long, Double]],
                cb: Callback[Long, Long, Double, Long]): Unit = {
      cb.aggregate("persistent.sum", 1L)
      cb.aggregate("reset.sum", 1L)
      cb.aggregate("min.track", id)
      if (superstep >= 2) cb.voteToHalt()
      // stay active without messages for 3 supersteps
    }
  }
}

package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming._
import graft.streaming.EdgeStreamOps._

/** Streaming module tests: pure summary logic (reference DisjointSetTest,
  * AdjacencyListGraphTest, BipartitenessCheckTest goldens) + the ops running
  * over an actual Structured Streaming query. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("DisjointSet union-find with rank and path compression") {
    val ds = new DisjointSet[Long]
    ds.union(1L, 2L); ds.union(3L, 4L); ds.union(2L, 3L)
    val comps = ds.components
    assert(comps.values.toSet.size === 1)
    ds.union(10L, 11L)
    assert(ds.components.values.toSet.size === 2)
    // merge two partial summaries
    val other = new DisjointSet[Long]
    other.union(4L, 10L)
    val merged = ds.merge(other)
    assert(merged.components.values.toSet.size === 1)
    assert(ds.components.values.toSet.size === 2) // original untouched
  }

  test("Candidates: bipartite merge succeeds, odd cycle fails") {
    // bipartite fixture (BipartitenessCheckTest.java:83-99)
    val bipartiteEdges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (4L, 5L), (4L, 7L), (4L, 9L))
    val summary = bipartiteEdges.foldLeft(new Candidates(true)) {
      case (acc, (s, d)) => acc.merge(Candidates.of(s, d))
    }
    assert(summary.success)
    // two-coloring: 1 and 4 opposite signs of their neighbors
    val colors = summary.groups.values.head
    assert(colors(2L) === colors(3L))
    assert(colors(1L) !== colors(2L))
    // odd cycle → fail (non-bipartite fixture adds e.g. 2-3)
    val bad = summary.merge(Candidates.of(2L, 3L))
    assert(!bad.success)
  }

  test("DisjointSet matches streaming ConnectedComponentsTest golden components") {
    // streaming/library/ConnectedComponentsTest.java:69-74 fixture; golden
    // :57 "1, 2, 3, 5 / 6, 7 / 8, 9"
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 5L), (6L, 7L), (8L, 9L))
    val ds = new DisjointSet[Long]
    edges.foreach { case (s, d) => ds.union(s, d) }
    val comps = ds.components.toSeq.groupBy(_._2).values
      .map(_.map(_._1).toSet).toSet
    assert(comps === Set(Set(1L, 2L, 3L, 5L), Set(6L, 7L), Set(8L, 9L)))
  }

  test("Candidates matches BipartitenessCheckTest golden two-coloring") {
    // exact golden (BipartitenessCheckTest.java:57-60): component rooted at
    // 1 with signs 1=true, 2/3/4=false, 5/7/9=true
    val bipartiteEdges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (4L, 5L), (4L, 7L), (4L, 9L))
    val summary = bipartiteEdges.foldLeft(new Candidates(true)) {
      case (acc, (s, d)) => acc.merge(Candidates.of(s, d))
    }
    assert(summary.success)
    assert(summary.groups.keySet === Set(1L))
    assert(summary.groups(1L) === Map(
      1L -> true, 2L -> false, 3L -> false, 4L -> false,
      5L -> true, 7L -> true, 9L -> true))
    // non-bipartite fixture (:113-118, triangle 1-2-3) → (false, {})
    val odd = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L), (5L, 7L), (4L, 1L))
      .foldLeft(new Candidates(true)) {
        case (acc, (s, d)) => acc.merge(Candidates.of(s, d))
      }
    assert(!odd.success)
    assert(odd.groups.isEmpty)
  }

  test("Spanner offer sequence matches SpannerTest golden adjacency (k=3)") {
    // SpannerTest.java:70-85 edge order; single ordered stream = the
    // 1-partition case of the reference's order-dependent summary
    val edges = Seq((1L, 4L), (4L, 7L), (7L, 8L), (4L, 8L), (4L, 5L), (5L, 6L),
      (2L, 3L), (3L, 4L), (3L, 6L), (8L, 9L), (6L, 8L), (5L, 9L))
    val g = new AdjacencyListGraph(3)
    edges.foreach { case (s, d) => g.offer(s, d) }
    // SpannerTest.java:63
    val gold = Map(
      1L -> Set(4L), 2L -> Set(3L), 3L -> Set(2L, 4L), 4L -> Set(1L, 3L, 5L, 7L),
      5L -> Set(4L, 6L), 6L -> Set(5L, 8L), 7L -> Set(4L, 8L),
      8L -> Set(6L, 7L, 9L), 9L -> Set(8L))
    val got = g.edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    assert(got === gold)
  }

  test("triangle counts match ExactTriangleCountTest goldens") {
    import spark.implicits._
    // ExactTriangleCountTest.java:66-74; golden :56-59:
    // global 4, per-vertex (1,2) (2,2) (3,4) (4,1) (5,1) (6,2)
    val e = Seq((1L, 2L), (2L, 3L), (2L, 6L), (5L, 6L), (1L, 4L), (5L, 3L),
      (3L, 4L), (3L, 6L), (1L, 3L)).map { case (s, d) => (s, d, 1L) }
      .toDF("src", "dst", "value")
    val global = EdgeStreamOps.triangleCount(e.select("src", "dst"))
      .head().getLong(0)
    assert(global === 4L)
    val g = graft.core.KGraph.fromEdges(e, id => id)
    val perVertex = graft.algos.GraphAlgorithms.triangleCounts(g)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perVertex === Map(1L -> 2L, 2L -> 2L, 3L -> 4L, 4L -> 1L,
      5L -> 1L, 6L -> 2L))
  }

  test("AdjacencyListGraph boundedBFS + spanner offer") {
    val g = new AdjacencyListGraph(2)
    g.addEdge(1L, 2L); g.addEdge(2L, 3L)
    assert(g.boundedBFS(1L, 3L))      // 2 hops ≤ k
    assert(!g.boundedBFS(1L, 4L))
    g.offer(1L, 3L)                    // already 2-spanned → not added
    assert(g.edges === Set((1L, 2L), (2L, 3L)))
    g.offer(3L, 4L)
    assert(g.edges.contains((3L, 4L)))
  }

  test("summary aggregators over Datasets (SummaryBulkAggregation analog)") {
    val edges = Seq((0L, 1L), (1L, 2L), (10L, 11L)).toDS()
    val cc = EdgeStreamOps.aggregateSummary(edges, new ConnectedComponentsAgg).head()
    assert(cc.values.toSet.size === 2)
    val bp = EdgeStreamOps.aggregateSummary(edges, new BipartitenessAgg).head()
    assert(bp._1 === true)
    val triangle = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDS()
    val bp2 = EdgeStreamOps.aggregateSummary(triangle, new BipartitenessAgg).head()
    assert(bp2._1 === false)
    val sp = EdgeStreamOps.aggregateSummary(
      Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDS(), new SpannerAgg(2)).head()
    assert(sp.size === 2) // 1-3 spanned via 2
  }

  test("edge stream ops over an actual streaming query (memory sink)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Double)]
    val edges = input.toDF().toDF("src", "dst", "value")

    val q = edges.degrees.writeStream
      .outputMode("complete").format("memory").queryName("deg_out").start()
    input.addData((1L, 2L, 1.0), (1L, 3L, 1.0), (2L, 3L, 1.0))
    q.processAllAvailable()
    input.addData((3L, 4L, 1.0))
    q.processAllAvailable()
    val got = spark.table("deg_out").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    q.stop()
    assert(got === Map(1L -> 2L, 2L -> 2L, 3L -> 3L, 4L -> 1L))
  }

  test("Kafka seam parse parity: edgesFromRaw on a Kafka-SHAPED streaming " +
       "frame (binary value + record timestamp as event time), operators " +
       "run unchanged (GraphUtils.java:62-143 wire format)") {
    implicit val sqlCtx = spark.sqlContext
    // exactly the columns the spark-sql-kafka source emits — everything
    // short of the broker connection itself
    val input = MemoryStream[(Array[Byte], Array[Byte], String, Int, Long,
      java.sql.Timestamp, Int)]
    val raw = input.toDF().toDF("key", "value", "topic", "partition",
      "offset", "timestamp", "timestampType")
    val q = graft.core.GraphIO.edgesFromRaw(raw)
      .writeStream.outputMode("append").format("memory")
      .queryName("kafka_raw").start()
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:01")
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 00:00:05")
    input.addData(
      (Array.empty[Byte], "1 2 12.5".getBytes("UTF-8"), "edges", 0, 0L, t0, 0),
      (Array.empty[Byte], "  3   4  7.0 ".getBytes("UTF-8"), "edges", 0, 1L, t1, 0),
      (Array.empty[Byte], "   ".getBytes("UTF-8"), "edges", 0, 2L, t0, 0)) // blank → dropped
    q.processAllAvailable()
    val got = spark.table("kafka_raw").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getTimestamp(3)))
    q.stop()
    // whitespace-tolerant parse of the reference's "src dst value" lines;
    // event time = the BROKER record time, not processing time
    assert(got.toSet === Set((1L, 2L, 12.5, t0), (3L, 4L, 7.0, t1)))
    // ...and the EdgeStreamOps surface runs unchanged on the parsed frame
    val input2 = MemoryStream[(Array[Byte], Array[Byte], String, Int, Long,
      java.sql.Timestamp, Int)]
    val raw2 = input2.toDF().toDF("key", "value", "topic", "partition",
      "offset", "timestamp", "timestampType")
    val q2 = graft.core.GraphIO.edgesFromRaw(raw2).degrees
      .writeStream.outputMode("complete").format("memory")
      .queryName("kafka_deg").start()
    input2.addData(
      (Array.empty[Byte], "1 2 1.0".getBytes("UTF-8"), "edges", 0, 0L, t0, 0),
      (Array.empty[Byte], "1 3 1.0".getBytes("UTF-8"), "edges", 0, 1L, t0, 0))
    q2.processAllAvailable()
    val deg = spark.table("kafka_deg").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    q2.stop()
    assert(deg === Map(1L -> 2L, 2L -> 1L, 3L -> 1L))
  }

  test("numberOfVertices is EXACT across batches (EdgeStream.java:189-207 " +
       "HashSet-cardinality parity; was approx_count_distinct)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Double)]
    val edges = input.toDF().toDF("src", "dst", "value")

    val q = edges.numberOfVertices.writeStream
      .outputMode("complete").format("memory").queryName("nv_out").start()
    input.addData((1L, 2L, 1.0), (1L, 3L, 1.0), (2L, 3L, 1.0))
    q.processAllAvailable()
    val after1 = spark.table("nv_out").collect().map(_.getLong(0)).toSeq
    input.addData((3L, 4L, 1.0), (1L, 2L, 9.0)) // one new vertex, one repeat edge
    q.processAllAvailable()
    val after2 = spark.table("nv_out").collect().map(_.getLong(0)).toSeq
    q.stop()
    assert(after1 === Seq(3L)) // {1,2,3}
    assert(after2 === Seq(4L)) // {1,2,3,4} — exact, repeats don't inflate
    // batch parity: same code path, exact count
    val batch = Seq((1L, 2L, 1.0), (2L, 3L, 1.0), (3L, 1L, 1.0))
      .toDF("src", "dst", "value")
    assert(batch.numberOfVertices.head().getLong(0) === 3L)
  }

  test("windowed slice + reduceOnEdges over a streaming query") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Double, java.sql.Timestamp)]
    val edges = input.toDF().toDF("src", "dst", "value", "ts")
    val windowed = edges.slice(col("ts"), "10 seconds", "OUT").reduceOnEdges(sum)
    val q = windowed.writeStream.outputMode("complete").format("memory")
      .queryName("win_out").start()
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:01")
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 00:00:05")
    val t2 = java.sql.Timestamp.valueOf("2024-01-01 00:00:15")
    input.addData((1L, 2L, 2.0, t0), (1L, 3L, 3.0, t1), (1L, 4L, 7.0, t2))
    q.processAllAvailable()
    val got = spark.table("win_out")
      .select(col("id"), col("value")).collect().map(r => r.getLong(0) -> r.getDouble(1))
    q.stop()
    assert(got.toSet === Set(1L -> 5.0, 1L -> 7.0)) // two tumbling windows
  }

  test("batch/stream parity: triangle count and vertex set") {
    val batch = Seq((1L, 2L, 1.0), (2L, 3L, 1.0), (1L, 3L, 1.0), (3L, 4L, 1.0))
      .toDF("src", "dst", "value")
    assert(EdgeStreamOps.triangleCount(batch).head().getLong(0) === 1L)
    assert(batch.vertexSet.count() === 4L)
    assert(batch.undirected.count() === 8L)
    assert(batch.numberOfEdges.head().getLong(0) === 4L)
  }

  test("watermarked windowed slice drops late data; no-watermark default keeps it") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // reference semantics: processing-time tumbling windows, no late-data
    // handling (SummaryBulkAggregation.java:81,86). Structured Streaming adds
    // event-time watermarks — opt-in; the unwatermarked default matches the
    // reference (every record lands in its window whenever it arrives).
    val t = (sec: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 00:00:$sec%02d")

    val lateIn = MemoryStream[(Long, Long, Double, java.sql.Timestamp)]
    val late = lateIn.toDF().toDF("src", "dst", "value", "ts")
      .withWatermark("ts", "5 seconds")
      .slice(col("ts"), "10 seconds", "OUT").reduceOnEdges(sum)
    val q1 = late.writeStream.outputMode("append").format("memory")
      .queryName("wm_out").start()
    lateIn.addData((1L, 2L, 2.0, t(1)))
    q1.processAllAvailable()
    lateIn.addData((1L, 3L, 7.0, t(35))) // advances watermark past window [0,10)
    q1.processAllAvailable()
    lateIn.addData((1L, 4L, 100.0, t(2))) // LATE: before watermark → dropped
    q1.processAllAvailable()
    lateIn.addData((1L, 5L, 1.0, t(55))) // closes the [30,40) window too
    q1.processAllAvailable()
    q1.stop()
    val emitted = spark.table("wm_out")
      .select(col("id"), col("value")).collect().map(r => r.getLong(0) -> r.getDouble(1)).toSet
    // window [0,10) finalized with ONLY the on-time 2.0 — late 100.0 dropped
    assert(emitted.contains(1L -> 2.0))
    assert(!emitted.exists(_._2 == 102.0))

    val openIn = MemoryStream[(Long, Long, Double, java.sql.Timestamp)]
    val open = openIn.toDF().toDF("src", "dst", "value", "ts")
      .slice(col("ts"), "10 seconds", "OUT").reduceOnEdges(sum)
    val q2 = open.writeStream.outputMode("complete").format("memory")
      .queryName("nowm_out").start()
    openIn.addData((1L, 2L, 2.0, t(1)), (1L, 3L, 7.0, t(35)))
    q2.processAllAvailable()
    openIn.addData((1L, 4L, 100.0, t(2))) // "late" but no watermark → counted
    q2.processAllAvailable()
    q2.stop()
    val kept = spark.table("nowm_out")
      .select(col("id"), col("value")).collect().map(r => r.getLong(0) -> r.getDouble(1)).toSet
    assert(kept === Set(1L -> 102.0, 1L -> 7.0))
  }
}

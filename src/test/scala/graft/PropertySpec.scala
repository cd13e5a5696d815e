package graft

import org.scalacheck.Gen

import graft.streaming.{AdjacencyListGraph, Candidates, DisjointSet}

/** Property-based checks for the mergeable summaries (SURVEY §5 port
  * strategy): merge order must not change results. Uses raw ScalaCheck
  * generators with a manual sampling loop (no scalatestplus bridge in the
  * offline dependency cache). */
class PropertySpec extends SparkSpec {

  def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    (0 until 60).foreach { _ =>
      (ga.sample, gb.sample) match {
        case (Some(a), Some(b)) => f(a, b)
        case _ =>
      }
    }
  def forAll[A](ga: Gen[A])(f: A => Unit): Unit =
    (0 until 60).foreach(_ => ga.sample.foreach(f))
  def whenever(cond: Boolean)(body: => Unit): Unit = if (cond) body

  val edgeList: Gen[List[(Long, Long)]] =
    Gen.listOfN(40, for {
      a <- Gen.choose(0L, 19L); b <- Gen.choose(0L, 19L) if a != b
    } yield (a, b))

  test("DisjointSet: same components regardless of union order and split point") {
    forAll(edgeList, Gen.choose(0, 40)) { (edges, split) =>
      whenever(edges.nonEmpty) {
        val whole = new DisjointSet[Long]
        edges.foreach { case (a, b) => whole.union(a, b) }

        val (l, r) = edges.splitAt(split min edges.size)
        val left = new DisjointSet[Long]; l.foreach { case (a, b) => left.union(a, b) }
        val right = new DisjointSet[Long]; r.foreach { case (a, b) => right.union(a, b) }
        val merged = left.merge(right)

        def groups(ds: DisjointSet[Long]): Set[Set[Long]] =
          ds.components.groupBy(_._2).values.map(_.keySet).toSet
        assert(groups(merged) === groups(whole))
      }
    }
  }

  test("Candidates: bipartiteness verdict matches odd-cycle-freeness and is split-invariant") {
    forAll(edgeList, Gen.choose(0, 40)) { (edges, split) =>
      whenever(edges.nonEmpty) {
        def fold(es: List[(Long, Long)]): Candidates =
          es.foldLeft(new Candidates(true)) { case (acc, (a, b)) =>
            acc.merge(Candidates.of(a, b))
          }
        val whole = fold(edges)
        val (l, r) = edges.splitAt(split min edges.size)
        val merged = fold(l).merge(fold(r))
        assert(merged.success === whole.success)

        // ground truth: 2-colorability via BFS
        val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
          .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
        val color = scala.collection.mutable.Map.empty[Long, Boolean]
        var bipartite = true
        adj.keys.foreach { start =>
          if (!color.contains(start)) {
            color(start) = true
            val queue = scala.collection.mutable.Queue(start)
            while (queue.nonEmpty) {
              val v = queue.dequeue()
              adj(v).foreach { n =>
                if (!color.contains(n)) { color(n) = !color(v); queue.enqueue(n) }
                else if (color(n) == color(v)) bipartite = false
              }
            }
          }
        }
        assert(whole.success === bipartite)
      }
    }
  }

  test("Spanner: k-spanner preserves connectivity, never adds spanned edges") {
    forAll(edgeList) { edges =>
      whenever(edges.nonEmpty) {
        val g = new AdjacencyListGraph(3)
        edges.foreach { case (a, b) => g.offer(a, b) }
        // every original edge's endpoints are within k hops in the spanner
        edges.foreach { case (a, b) =>
          assert(g.boundedBFS(a, b) || g.edges.contains((a min b, a max b)) ||
            g.edges.contains((a max b, a min b)),
            s"($a,$b) not $g-spanned")
        }
        // spanner is a subgraph-size reduction: no more edges than input
        assert(g.edges.size <= edges.map { case (a, b) => (a min b, a max b) }.distinct.size)
      }
    }
  }

  test("MinHash signature estimates Jaccard within tolerance on known pairs") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.pipeline.Dedup
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val half = (1 to 30).map(i => s"w$i").mkString(" ") + " " +
      (100 to 129).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, base), (2L, base), (3L, half)).toDF("doc_id", "text")
      .withColumn("sh", Dedup.wordShingles(col("text")))
      .withColumn("sig", Dedup.minHashSignature(col("sh"), 256))
    val sigs = df.select("doc_id", "sig").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    def est(a: Seq[Long], b: Seq[Long]): Double =
      a.zip(b).count { case (x, y) => x == y }.toDouble / a.size
    assert(est(sigs(1L), sigs(2L)) === 1.0)           // identical docs
    val e13 = est(sigs(1L), sigs(3L))
    // true shingle jaccard of base vs half ≈ |28 shared 3-grams|/|88 union|
    assert(e13 > 0.1 && e13 < 0.55, s"estimate $e13 out of plausible band")
  }

  test("Pregel WCC equals DataFrame WCC on random graphs (fused-loop invariants)") {
    import org.apache.spark.sql.functions._
    import graft.algos.compute.BasicAlgorithms.Wcc
    import graft.algos.GraphAlgorithms
    import graft.core.KGraph
    import graft.pregel.Pregel
    val rnd = new scala.util.Random(20260812L)
    for (_ <- 1 to 4) {
      val n = 12 + rnd.nextInt(20)
      val edges = (1 to 30).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }.distinct
      val ids = (edges.map(_._1) ++ edges.map(_._2)).distinct
      // Pregel port: undirected message flow needs symmetric adjacency
      val sym = (edges ++ edges.map(_.swap)).distinct
      val verts = spark.sparkContext.parallelize(ids.map(i => (i, i)))
      val adj = spark.sparkContext.parallelize(sym.map { case (a, b) => (a, (b, 1.0)) })
      // NB the reference's WCC message rule (send when label < target id)
      // ping-pongs forever on symmetric adjacency — values stabilize but the
      // run ends at maxIterations, exactly like the reference would
      val pregelRes = Pregel.run(spark, new Wcc, verts, adj,
        numPartitions = 3, maxIterations = 40, checkpointInterval = 4)
      val got = pregelRes.vertices.collect().toMap
      import spark.implicits._
      val g = KGraph.fromEdges(
        edges.toDF("src", "dst").withColumn("value", lit(1.0)), id => id)
      val want = GraphAlgorithms.wcc(g).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === want)
    }
  }

  test("frontier-batched BFS/SSSP match a driver-side reference on random graphs") {
    import org.apache.spark.sql.functions._
    import graft.algos.GraphAlgorithms
    import graft.core.KGraph
    import spark.implicits._
    val rnd = new scala.util.Random(20260813L)
    for (_ <- 1 to 4) {
      val n = 10 + rnd.nextInt(15)
      val edges = (1 to 40).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong,
          (1 + rnd.nextInt(9)).toDouble))
        .filter { case (a, b, _) => a != b }
        .groupBy(e => (e._1, e._2)).map(_._2.head).toSeq // dedupe (src,dst)
      val src = edges.head._1
      // driver-side reference: Bellman-Ford over the directed edge list
      val ids = (edges.map(_._1) ++ edges.map(_._2)).distinct
      var dist = Map(src -> 0.0)
      var changed = true
      while (changed) {
        changed = false
        for ((a, b, w) <- edges; da <- dist.get(a)) {
          if (dist.get(b).forall(_ > da + w)) { dist += b -> (da + w); changed = true }
        }
      }
      var hops = Map(src -> 0L)
      var frontier = Set(src)
      var level = 0L
      while (frontier.nonEmpty) {
        level += 1
        val next = edges.filter(e => frontier(e._1)).map(_._2).toSet -- hops.keySet
        next.foreach(b => hops += b -> level)
        frontier = next
      }
      val g = KGraph.fromEdges(edges.toDF("src", "dst", "value"), id => id)
      val gotSssp = GraphAlgorithms.sssp(g, src).collect()
        .flatMap(r => if (r.isNullAt(1)) None else Some(r.getLong(0) -> r.getDouble(1))).toMap
      assert(gotSssp === dist, s"sssp mismatch from $src on $edges")
      val gotBfs = GraphAlgorithms.bfs(g, src).collect()
        .flatMap(r => if (r.isNullAt(1)) None else Some(r.getLong(0) -> r.getLong(1))).toMap
      assert(gotBfs === hops, s"bfs mismatch from $src on $edges")
      assert(ids.nonEmpty)
    }
  }

  val wordPool = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta")
  val docGen: Gen[List[String]] =
    Gen.listOfN(12, Gen.choose(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(wordPool)).map(_.mkString(" "))))

  test("tfIdfTop matches a driver-side TF-IDF reference on random corpora") {
    import spark.implicits._
    forAll(docGen) { texts =>
      whenever(texts.nonEmpty) {
        val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        // reference: same tokenization, same rounded-score ranking
        val tf = docs.flatMap { case (id, t) =>
          t.split("\\s+").map(w => (id, w)) }.groupBy(identity)
          .map { case ((id, w), xs) => (id, w, xs.size.toLong) }
        val dfreq = tf.groupBy(_._2).map { case (w, xs) => w -> xs.size.toLong }
        val n = docs.size.toDouble
        val expected = tf.groupBy(_._1).map { case (id, terms) =>
          val scored = terms.map { case (_, w, c) =>
            val s = math.rint(c * math.log(n / dfreq(w)) * 1e6) / 1e6
            (w, c, dfreq(w), s)
          }
          id -> scored.toSeq.sortBy { case (w, _, _, s) => (-s, w) }.head
        }
        val got = graft.pipeline.TextAnalysis.tfIdfTop(docs.toDF("doc_id", "text"))
          .collect().map(r => r.getLong(0) ->
            ((r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
        assert(got === expected, s"tfidf mismatch on $texts")
      }
    }
  }

  val eventsGen: Gen[List[(Long, String, Int)]] =
    Gen.listOfN(30, for {
      u <- Gen.choose(0L, 5L)
      ty <- Gen.oneOf("view", "click", "purchase", "error")
      t <- Gen.choose(0, 1000)
    } yield (u, ty, t))

  test("funnel matches a driver-side reference on random event logs") {
    import spark.implicits._
    val stages = Seq("view", "click", "purchase")
    forAll(eventsGen) { evs =>
      // distinct timestamps per user so strict-ordering semantics are unambiguous
      val dedup = evs.zipWithIndex
        .map { case ((u, ty, t), i) => (u, ty, t * 100 + i) }
      def reach(user: Long): Int = {
        val mine = dedup.filter(_._1 == user)
        var t = mine.filter(_._2 == stages.head).map(_._3).minOption
        var depth = if (t.isDefined) 1 else 0
        for (s <- stages.tail if t.isDefined) {
          t = mine.filter(e => e._2 == s && e._3 > t.get).map(_._3).minOption
          if (t.isDefined) depth += 1
        }
        depth
      }
      val users = dedup.map(_._1).distinct
      val expected = stages.zipWithIndex.map { case (s, i) =>
        s -> users.count(u => reach(u) > i).toLong }.toMap
      val df = dedup.map { case (u, ty, t) =>
        (u, ty, new java.sql.Timestamp(t.toLong * 1000)) }
        .toDF("user_id", "event_type", "ts")
      val got = graft.pipeline.Events.funnel(df, stages).collect()
        .map(r => r.getString(0) -> r.getLong(2)).toMap
      assert(got === expected, s"funnel mismatch on $dedup")
    }
  }

  test("sessionize matches a driver-side reference on random event logs") {
    import spark.implicits._
    val gapSec = 600L // 10-minute session gap
    val logGen = Gen.listOfN(40, for {
      u <- Gen.choose(0L, 4L)
      t <- Gen.choose(0L, 30000L) // up to ~8h of activity
    } yield (u, t))
    forAll(logGen) { evs0 =>
      // unique (user, ts) so the reference's ordering is unambiguous
      val evs = evs0.zipWithIndex.map { case ((u, t), i) => (u, t, i.toLong) }
        .groupBy(e => (e._1, e._2)).map(_._2.head).toSeq
      // reference: per user, sort by ts; break when gap > gapSec
      val expected = evs.groupBy(_._1).flatMap { case (u, rows) =>
        val sorted = rows.sortBy(e => (e._2, e._3))
        var seq = 0L; var prev = Option.empty[Long]
        sorted.map { case (_, t, id) =>
          if (prev.forall(p => t - p > gapSec)) seq += 1
          prev = Some(t)
          id -> seq
        }
      }
      val df = evs.map { case (u, t, id) =>
        (u, new java.sql.Timestamp(t * 1000), id) }
        .toDF("user_id", "ts", "event_id")
      import org.apache.spark.sql.functions.{floor, unix_timestamp}
      for (chunk <- Seq(None,
          Some((ts: org.apache.spark.sql.Column) =>
            floor(unix_timestamp(ts) / 3600L)))) {
        val got = graft.pipeline.Events
          .sessionize(df, gapMicros = gapSec * 1000000L, chunk = chunk)
          .collect().map(r => r.getLong(2) -> r.getLong(3)).toMap
        assert(got === expected, s"sessionize(chunk=${chunk.isDefined}) mismatch on $evs")
      }
    }
  }
}

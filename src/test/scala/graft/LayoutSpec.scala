package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{Curation, Dedup, Events, Layout, TextAnalysis}

import scala.util.Random

/** Z-order layout, edit-distance join, decayed values, entropy, rollup
  * profile (round-6 additions). */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  // ---- Morton / Z-order ---------------------------------------------------

  test("mortonCode matches a bit-interleave reference on random buckets") {
    val rnd = new Random(7)
    val pts = Seq.fill(200)((rnd.nextInt(256).toLong, rnd.nextInt(256).toLong))
    def ref(x: Long, y: Long): Long =
      (0 until 8).foldLeft(0L) { (a, i) =>
        a | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), Layout.mortonCode(col("x"), col("y"), 8).as("m"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pts.foreach { case (x, y) => assert(got((x, y)) === ref(x, y)) }
  }

  test("bucketize clamps out-of-range values to edge buckets") {
    val got = Seq(-5.0, 0.0, 99.9, 100.0, 250.0).toDF("v")
      .select(Layout.bucketize(col("v"), 0.0, 100.0, 4).as("b"))
      .collect().map(_.getLong(0)).toSeq
    assert(got === Seq(0L, 0L, 15L, 15L, 15L))
  }

  test("zorderAssign file_id is the morton prefix; z-clustered layout has " +
    "tighter per-partition bounding boxes than insertion order") {
    val rnd = new Random(11)
    val rows = Seq.tabulate(4096)(i =>
      (i.toLong, rnd.nextDouble() * 1000.0, rnd.nextDouble() * 1000.0))
    val df = rows.toDF("id", "x", "y")
    val z = Layout.zorderAssign(df, "x", 0.0, 1000.0, "y", 0.0, 1000.0,
      bits = 8, fileBits = 4)
    val bad = z.filter(col("file_id") =!= shiftright(col("morton"), 12)).count()
    assert(bad === 0L)
    assert(z.agg(countDistinct(col("file_id"))).first().getLong(0) === 16L)

    def avgBoxArea(parts: org.apache.spark.sql.DataFrame): Double = {
      val boxes = parts
        .groupBy(spark_partition_id().as("p"))
        .agg((max(col("x")) - min(col("x"))).as("dx"),
          (max(col("y")) - min(col("y"))).as("dy"))
        .select(avg(col("dx") * col("dy"))).first().getDouble(0)
      boxes
    }
    val zClustered = avgBoxArea(Layout.clusterWrite(z, "morton", 16))
    val naive = avgBoxArea(df.repartitionByRange(16, col("id")))
    // 16 z-tiles of a uniform square have ~1/16 the area each; insertion
    // order is uncorrelated with (x, y) so its boxes span the whole square.
    assert(zClustered < naive / 4.0,
      s"z-order boxes not tighter: $zClustered vs $naive")
  }

  // ---- edit-distance similarity join --------------------------------------

  private def mutate(s: String, edits: Int, rnd: Random): String = {
    var cur = s
    (0 until edits).foreach { _ =>
      val i = rnd.nextInt(math.max(cur.length, 1))
      rnd.nextInt(3) match {
        case 0 if cur.nonEmpty => cur = cur.take(i) + cur.drop(i + 1) // del
        case 1 => cur = cur.take(i) + ('a' + rnd.nextInt(26)).toChar + cur.drop(i) // ins
        case _ if cur.nonEmpty =>
          cur = cur.take(i) + ('a' + rnd.nextInt(26)).toChar + cur.drop(i + 1) // sub
        case _ => cur = cur + "x"
      }
    }
    cur
  }

  test("editDistancePairs equals brute force on planted mutations") {
    val rnd = new Random(42)
    val alphabet = "abcdefg"
    val bases = Seq.tabulate(40)(_ =>
      Seq.fill(60 + rnd.nextInt(60))(alphabet(rnd.nextInt(alphabet.length))).mkString)
    // plant near-dups at 1..6 edits, plus unrelated strings
    val docs = bases.zipWithIndex.flatMap { case (b, i) =>
      val near = if (i % 3 == 0) Seq(mutate(b, 1 + rnd.nextInt(6), rnd)) else Nil
      b +: near
    }.zipWithIndex.map { case (s, i) => (i.toLong, s) }
    val df = docs.toDF("doc_id", "text")
    val k = 6
    val got = Dedup.editDistancePairs(df, maxDist = k, q = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = df.toDF("a", "ta")
      .crossJoin(df.toDF("b", "tb")).filter(col("a") < col("b"))
      .select(col("a"), col("b"), levenshtein(col("ta"), col("tb")).cast("long").as("lev"))
      .filter(col("lev") <= k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(brute.nonEmpty, "fixture must plant qualifying pairs")
    assert(got === brute)
  }

  test("editDistancePairs handles repeated-gram multisets and sub-q strings") {
    // aaaa… strings exercise occurrence numbering; 2-char strings bypass the
    // gram filter entirely (len < q) through the broadcast short-path
    val docs = Seq(
      (0L, "aaaaaaaaaaaa"), (1L, "aaaaaaaaaaa"), // lev 1, heavy gram repeats
      (2L, "ab"), (3L, "ac"), (4L, "abcd"),      // shorts: lev(2,3)=1, lev(2,4)=2
      (5L, "zzzzzzzzzzzzzzzzzzzz")
    ).toDF("doc_id", "text")
    val got = Dedup.editDistancePairs(docs, maxDist = 2, q = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = docs.toDF("a", "ta")
      .crossJoin(docs.toDF("b", "tb")).filter(col("a") < col("b"))
      .select(col("a"), col("b"), levenshtein(col("ta"), col("tb")).cast("long").as("lev"))
      .filter(col("lev") <= 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === brute)
    assert(got.contains((0L, 1L, 1L)) && got.contains((2L, 3L, 1L)))
  }

  // ---- decayed value ------------------------------------------------------

  test("decayedValue matches a sequential reference; partial windows exact") {
    val rnd = new Random(3)
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val events = (0 until 300).map { i =>
      (i.toLong, new java.sql.Timestamp(ts0.getTime + rnd.nextInt(100000) * 1000L),
        (i % 7).toLong, rnd.nextDouble() * 400.0)
    }
    val df = events.toDF("event_id", "ts", "user_id", "value")
    val w = 16
    val got = Events.decayedValue(df, window = w)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    events.groupBy(_._3).foreach { case (user, evs) =>
      val recent = evs.sortBy(e => (-e._2.getTime, -e._1)).take(w)
      val m = recent.length
      val num = recent.zipWithIndex.map { case (e, j) =>
        math.floor(e._4 * 1e6).toLong * (1L << (w - 1 - j))
      }.sum
      val den = (1L << w) - (1L << (w - m))
      assert(got(user) === ((m.toLong, num, den)), s"user $user")
    }
  }

  // ---- integer-exact outliers ---------------------------------------------

  test("outliers matches a BigInt reference; single-event keys flag nothing") {
    val rnd = new Random(5)
    val events = (0 until 400).map { i =>
      val user = (i % 9).toLong
      // mostly tight values with occasional large spikes
      val v = if (rnd.nextInt(20) == 0) 3000.0 + rnd.nextDouble() * 2000.0
              else 100.0 + rnd.nextDouble() * 10.0
      (i.toLong, user, v)
    } :+ ((400L, 99L, 42.0)) // singleton key
    val df = events.toDF("event_id", "user_id", "value")
    val got = graft.pipeline.Events.outliers(df, sigmas = 2)
      .collect().map(_.getLong(0)).toSet
    val ref = events.groupBy(_._2).flatMap { case (_, evs) =>
      if (evs.length < 2) Nil
      else {
        val vmu = evs.map(e => (e._1, BigInt(math.floor(e._3 * 1e6).toLong)))
        val n = BigInt(evs.length)
        val s = vmu.map(_._2).sum
        val ss = vmu.map(v => v._2 * v._2).sum
        vmu.filter { case (_, x) =>
          val dev = n * x - s
          dev * dev > 4 * (n * ss - s * s)
        }.map(_._1)
      }
    }.toSet
    assert(ref.nonEmpty, "fixture must plant outliers")
    assert(got === ref)
    assert(!got.contains(400L))
  }

  // ---- per-group dimension profile ----------------------------------------

  test("groupDimProfile sums floor-quantized components exactly per (group, dim)") {
    val vecs = Seq(
      (0, Array(0.5f, -1.25f, 2.0f)),
      (0, Array(1.5f, 0.75f, -0.5f)),
      (1, Array(-0.1f, 0.0f, 3.25f))
    ).toDF("label", "embedding")
    val got = graft.pipeline.LinAlg.groupDimProfile(vecs, "label", "embedding")
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    def mu(f: Float): Long = math.floor(f.toDouble * 1e6).toLong
    assert(got((0, 0L)) === ((2L, mu(0.5f) + mu(1.5f))))
    assert(got((0, 1L)) === ((2L, mu(-1.25f) + mu(0.75f))))
    assert(got((0, 2L)) === ((2L, mu(2.0f) + mu(-0.5f))))
    assert(got((1, 2L)) === ((1L, mu(3.25f))))
    assert(got.size === 6)
  }

  // ---- robust outliers ----------------------------------------------------

  test("robustOutliers matches a rank-median reference; spike cannot mask itself") {
    val rnd = new Random(23)
    val events = (0 until 300).map { i =>
      val user = (i % 5).toLong
      val v = if (i % 37 == 0) 5000.0 + rnd.nextDouble() * 100 else 50.0 + rnd.nextDouble() * 5
      (i.toLong, user, v)
    }
    val df = events.toDF("event_id", "user_id", "value")
    val got = graft.pipeline.Events.robustOutliers(df, k = 3)
      .collect().map(_.getLong(0)).toSet
    val ref = events.groupBy(_._2).flatMap { case (_, evs) =>
      def medianOf(xs: Seq[Long]): Long = {
        val s = xs.sorted
        s(math.max(1, math.ceil(0.5 * s.length).toInt) - 1)
      }
      val vmu = evs.map(e => (e._1, math.floor(e._3 * 1e6).toLong))
      val med = medianOf(vmu.map(_._2))
      val mad = medianOf(vmu.map(v => math.abs(v._2 - med)))
      vmu.filter(v => math.abs(v._2 - med) > 3L * mad).map(_._1)
    }.toSet
    assert(ref.nonEmpty, "fixture must plant spikes")
    assert(got === ref)
  }

  // ---- snapshot diff ------------------------------------------------------

  test("snapshotDiff classifies added/removed/changed/unchanged") {
    val v1 = Seq((0L, 10L), (1L, 11L), (2L, 12L)).toDF("doc_id", "fp")
    val v2 = Seq((1L, 11L), (2L, 99L), (3L, 13L)).toDF("doc_id", "fp")
    val got = Curation.snapshotDiff(v1, v2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(0L -> "removed", 1L -> "unchanged",
      2L -> "changed", 3L -> "added"))
  }

  // ---- entropy ------------------------------------------------------------

  test("unigramEntropy matches an exact micro-nat reference") {
    val docs = Seq(
      (0L, "a a a a"),                    // zero entropy
      (1L, "a b c d"),                    // max entropy: n·ln(n)
      (2L, "x x y z z z")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.unigramEntropy(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    def ref(toks: Seq[String]): (Long, Long) = {
      val n = toks.length
      val total = toks.groupBy(identity).values.map { g =>
        math.round(g.length * math.log(n.toDouble / g.length) * 1e6)
      }.sum
      (n.toLong, total)
    }
    assert(got(0L) === ref(Seq("a", "a", "a", "a")))
    assert(got(0L)._2 === 0L)
    assert(got(1L) === ref(Seq("a", "b", "c", "d")))
    assert(got(2L) === ref(Seq("x", "x", "y", "z", "z", "z")))
  }

  // ---- recall report ------------------------------------------------------

  test("recallAtK counts exact-result hits per query, including zero-hit queries") {
    val exact = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 20L), (2L, 21L), (2L, 22L))
      .toDF("query_id", "nbr_id")
    val approx = Seq((1L, 10L), (1L, 12L), (1L, 99L), (2L, 30L), (2L, 31L), (2L, 32L))
      .toDF("query_id", "nbr_id")
    val got = graft.pipeline.Ann.recallAtK(exact, approx)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L) === ((2L, 3L)))
    assert(got(2L) === ((0L, 3L)))
  }

  test("ivfKnn probing all cells equals itself restricted: recall 1.0") {
    val rnd = new Random(17)
    val emb = Seq.tabulate(60)(i =>
      (i.toLong, Array.fill(8)(rnd.nextDouble() * 2 - 1))).toDF("vec_id", "embedding")
    val full = graft.pipeline.Ann.ivfKnn(emb, emb, 2, nlist = 4, nprobe = 4,
      iters = 2, hashInit = false).select(col("query_id"), col("nbr_id"))
    val rec = graft.pipeline.Ann.recallAtK(full, full)
    assert(rec.filter(col("hits") =!= col("k")).count() === 0L)
    assert(rec.count() === 60L)
  }

  test("rrfFuse: integer reciprocal-rank fusion, absent ranks contribute 0") {
    val lex = Seq((10L, 1L), (11L, 2L), (12L, 3L)).toDF("id", "rank")
    val dense = Seq((11L, 1L), (13L, 2L)).toDF("id", "rank")
    val got = graft.pipeline.Ann.rrfFuse(lex, dense)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(10L) === ((1L, 0L, 1000000L / 61)))
    assert(got(11L) === ((2L, 1L, 1000000L / 62 + 1000000L / 61)))
    assert(got(12L) === ((3L, 0L, 1000000L / 63)))
    assert(got(13L) === ((0L, 2L, 1000000L / 62)))
    // doc in both lists outranks single-list docs at comparable positions
    assert(got(11L)._3 > got(10L)._3)
  }

  // ---- co-occurrence / PMI ------------------------------------------------

  test("cooccurrence matches an exact reference incl. PMI micro-nats") {
    val docs = Seq(
      (0L, "spark scala data"), (1L, "spark data"), (2L, "spark scala"),
      (3L, "rust tokio"), (4L, "spark data lake")
    ).toDF("doc_id", "text")
    val got = graft.pipeline.TextAnalysis.cooccurrence(docs, minSupport = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val n = 5.0
    def pmi(np: Long, d1: Long, d2: Long): Long =
      math.round(math.log(np * n / (d1.toDouble * d2)) * 1e6)
    // df: spark=4, data=3, scala=2, lake=1, rust=1, tokio=1
    assert(got(("data", "spark")) === ((3L, pmi(3, 3, 4))))
    assert(got(("scala", "spark")) === ((2L, pmi(2, 2, 4))))
    assert(!got.contains(("data", "scala"))) // support 1 < minSupport
    assert(got.size === 2)
  }

  test("cooccurrence caps per-doc vocabulary deterministically") {
    val wide = (0 until 50).map(i => s"tok$i").mkString(" ")
    val docs = Seq((0L, wide), (1L, wide)).toDF("doc_id", "text")
    // cap at 10 distinct tokens → C(10,2)=45 pairs, all support 2
    val got = graft.pipeline.TextAnalysis.cooccurrence(docs, minSupport = 2,
      maxVocabPerDoc = 10)
    assert(got.count() === 45L)
  }

  // ---- k-core -------------------------------------------------------------

  test("kCore peels cascades to the exact core; degrees reported in-core") {
    // 4-clique {1,2,3,4} + pendant path 4-5-6 + triangle {7,8,9} bridged 1-7
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L), // clique
      (4L, 5L), (5L, 6L),                                         // path
      (7L, 8L), (7L, 9L), (8L, 9L),                               // triangle
      (1L, 7L)                                                    // bridge
    ).toDF("src", "dst")
    // k=3: 8,9 peel (deg 2) → 7 drops to 1 → peels → bridge gone; the
    // clique alone survives. Multi-round cascade by construction.
    val c3 = graft.algos.GraphAlgorithms.kCore(edges, k = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(c3 === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // k=2: only the pendant path peels; bridge edge stays in-core
    val c2 = graft.algos.GraphAlgorithms.kCore(edges, k = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(c2 === Map(1L -> 4L, 2L -> 3L, 3L -> 3L, 4L -> 3L,
      7L -> 3L, 8L -> 2L, 9L -> 2L))
    // k above max degree: empty core
    assert(graft.algos.GraphAlgorithms.kCore(edges, k = 10).count() === 0L)
  }

  test("kCore decremental peel ≡ sequential reference on random graphs") {
    for (seed <- Seq(5, 42); k <- Seq(2, 3, 4)) {
      val rnd = new scala.util.Random(seed)
      val nv = 60
      val es = (for {
        u <- 1 to nv; v <- u + 1 to nv
        if rnd.nextDouble() < 0.08
      } yield (u.toLong, v.toLong))
      val got = graft.algos.GraphAlgorithms.kCore(es.toDF("src", "dst"), k)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // sequential peel reference over Scala collections
      var adj = es.flatMap { case (u, v) => Seq(u -> v, v -> u) }
        .groupBy(_._1).view.mapValues(_.map(_._2).toBuffer).toMap
      var changed = true
      while (changed) {
        val dead = adj.collect { case (v, ns) if ns.size < k => v }.toSet
        changed = dead.nonEmpty
        adj = adj.collect { case (v, ns) if !dead(v) =>
          v -> ns.filterNot(dead)
        }.toMap
      }
      val expect = adj.map { case (v, ns) => v -> ns.size.toLong }
      assert(got === expect, s"seed=$seed k=$k")
    }
  }

  test("twoHopNeighborCounts: exactly-distance-2 sets on a known graph") {
    // path 1-2-3-4-5 plus triangle 3-6, 4-6
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (3L, 6L), (4L, 6L))
      .toDF("src", "dst").withColumn("value", lit(1.0))
    val g = graft.core.KGraph(
      Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L), (5L, 5L), (6L, 6L)).toDF("id", "value"),
      edges)
    val got = graft.algos.GraphAlgorithms.twoHopNeighborCounts(g)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // by hand: N2(1)={3}, N2(2)={4,6}, N2(3)={1,5}, N2(4)={2}, N2(5)={3,6},
    // N2(6)={2,5}  (6 is adjacent to both 3 and 4, so neither counts)
    assert(got === Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L, 5L -> 2L, 6L -> 2L))
  }

  test("kTruss keeps exactly the edges with enough triangle support") {
    // 4-clique {1,2,3,4} (every edge support 2) + triangle {4,5,6} (support
    // 1 each) + pendant 6-7 (support 0)
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (4L, 6L), (5L, 6L),
      (6L, 7L)
    ).toDF("src", "dst")
    // k=4 (support >= 2): the clique alone survives; the triangle's edges
    // have support 1 and cascade out, the pendant immediately
    val t4 = graft.algos.GraphAlgorithms.kTruss(edges, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(t4.keySet === Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)))
    assert(t4.values.forall(_ === 2L))
    // k=3 (support >= 1): clique + triangle survive, pendant peels
    val t3 = graft.algos.GraphAlgorithms.kTruss(edges, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(t3 === Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (4L, 6L), (5L, 6L)))
    // k high: everything peels
    assert(graft.algos.GraphAlgorithms.kTruss(edges, k = 5).count() === 0L)
  }

  // ---- split leakage ------------------------------------------------------

  test("splitLeakage counts straddling pairs per split pair") {
    val assignments = Seq(
      (0L, "train"), (1L, "test"), (2L, "train"), (3L, "valid"),
      (4L, "train"), (5L, "train"), (6L, "test")
    ).toDF("doc_id", "split")
    // cluster A = {0,1,2} (train,test,train), B = {3,4} (valid,train),
    // C = {5} singleton, D = {6} singleton
    val clusters = Seq(
      (0L, 0L), (1L, 0L), (2L, 0L), (3L, 3L), (4L, 3L), (5L, 5L), (6L, 6L)
    ).toDF("doc_id", "rep")
    val got = Curation.splitLeakage(assignments, clusters)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    // A: 2 train × 1 test = 2 pairs; B: 1 train × 1 valid = 1 pair
    assert(got(("test", "train")) === ((2L, 1L)))
    assert(got(("train", "valid")) === ((1L, 1L)))
    assert(got.size === 2)
  }

  test("splitLeakage is empty when no cluster straddles splits") {
    val assignments = Seq((0L, "train"), (1L, "train"), (2L, "test"))
      .toDF("doc_id", "split")
    val clusters = Seq((0L, 0L), (1L, 0L), (2L, 2L)).toDF("doc_id", "rep")
    assert(Curation.splitLeakage(assignments, clusters).count() === 0L)
  }

  // ---- zone maps ----------------------------------------------------------

  test("zoneMaps boxes respect the Z-tile bound: each file spans at most " +
    "2^(bits-f) buckets per dimension") {
    val rnd = new Random(13)
    val df = Seq.tabulate(2000)(i =>
      (i.toLong, rnd.nextDouble() * 1000.0, rnd.nextDouble() * 1000.0))
      .toDF("id", "x", "y")
    val z = Layout.zorderAssign(df, "x", 0.0, 1000.0, "y", 0.0, 1000.0,
      bits = 8, fileBits = 4)
    val zm = Layout.zoneMaps(z, "file_id", Seq("xb", "yb"))
    val bad = zm.filter(
      col("xb_max") - col("xb_min") >= 64 || col("yb_max") - col("yb_min") >= 64)
      .count()
    assert(bad === 0L)
    assert(zm.agg(sum(col("n"))).first().getLong(0) === 2000L)
  }

  // ---- streaming zone-map maintenance ------------------------------------

  test("streaming ingest: per-batch zone maps merge into a live skipping index") {
    // foreachBatch maintenance loop for the Z-order layout: each micro-batch
    // assigns morton/file ids (a pure function — appends land in the same
    // file partitions), emits its per-file zone map, and the accumulated
    // state keeps min-of-mins / max-of-maxes / summed counts. After any
    // number of batches the live index equals the zone maps of the union —
    // so the skipping metadata never needs a rescan under ingest.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rnd = new Random(41)
    val rows = Seq.tabulate(3000)(i =>
      (i.toLong, rnd.nextDouble() * 1000.0, rnd.nextDouble() * 1000.0))
    var state = Map.empty[Long, (Long, Long, Long, Long, Long)] // n, xmin, xmax, ymin, ymax
    val input = MemoryStream[(Long, Double, Double)]
    val q = input.toDF().toDF("id", "x", "y").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val z = Layout.zorderAssign(batch, "x", 0.0, 1000.0, "y", 0.0, 1000.0,
          bits = 8, fileBits = 4)
        Layout.zoneMaps(z, "file_id", Seq("xb", "yb")).collect().foreach { r =>
          val f = r.getLong(0)
          val add = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
          state = state.updated(f, state.get(f) match {
            case None => add
            case Some((n, a, b, c, d)) =>
              (n + add._1, math.min(a, add._2), math.max(b, add._3),
                math.min(c, add._4), math.max(d, add._5))
          })
        }
        ()
      }.start()
    rows.grouped(1000).foreach { g => input.addData(g: _*); q.processAllAvailable() }
    q.stop()
    val expect = Layout.zoneMaps(
        Layout.zorderAssign(rows.toDF("id", "x", "y"), "x", 0.0, 1000.0,
          "y", 0.0, 1000.0, bits = 8, fileBits = 4),
        "file_id", Seq("xb", "yb"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(expect.size === 16)
    assert(state === expect)
  }

  // ---- partitioned layout -------------------------------------------------

  test("partitioned write prunes non-matching partitions at the scan") {
    val docs = Seq(
      (0L, "alpha", "en"), (1L, "beta", "fr"), (2L, "gamma", "en"),
      (3L, "delta", "de"), (4L, "epsilon", "fr")
    ).toDF("doc_id", "text", "lang")
    val path = "/tmp/graft_io/spec_bylang"
    graft.core.GraphIO.writePartitioned(docs, path, "lang")
    val filtered = graft.core.GraphIO.readPartitioned(spark, path)
      .filter(col("lang") === "en")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("lang"),
      s"expected partition pruning in plan:\n$plan")
    assert(filtered.count() === 2L)
    // the partition cycle loses nothing
    assert(graft.core.GraphIO.readPartitioned(spark, path).count() === 5L)
  }

  // ---- rollup profile -----------------------------------------------------

  test("corpusProfile rollup equals the three separate aggregates") {
    val docs = Seq(
      (0L, "web", "en", 100L), (1L, "web", "fr", 50L), (2L, "web", "en", 70L),
      (3L, "book", "en", 200L), (4L, "book", "de", 90L)
    ).toDF("doc_id", "source", "lang", "n_chars")
    val got = Curation.corpusProfile(docs, "source", "lang")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)) ->
        (r.getLong(3), r.getLong(4))).toMap
    assert(got(("web", "en", 0L)) === ((2L, 170L)))
    assert(got(("web", "ALL", 1L)) === ((3L, 220L)))
    assert(got(("book", "ALL", 1L)) === ((2L, 290L)))
    assert(got(("ALL", "ALL", 3L)) === ((5L, 510L)))
    assert(got.size === 4 + 2 + 1) // cells + per-source + grand total
  }
}

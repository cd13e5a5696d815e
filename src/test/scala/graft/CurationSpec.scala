package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Curation

class CurationSpec extends SparkSpec {
  import spark.implicits._

  // ---- PII redaction ------------------------------------------------------

  private def redact(s: String): String =
    Seq(s).toDF("t").select(Curation.redactPii(col("t"))).as[String].head()

  test("redactPii: emails, IPs, phone runs") {
    assert(redact("contact alice.b+spam@sub.example.co.uk now") ===
      "contact <EMAIL> now")
    assert(redact("host 192.168.0.1 and 10.0.255.17 up") ===
      "host <IP> and <IP> up")
    assert(redact("call +1 (415) 555-0199 today") === "call <PHONE> today")
    assert(redact("call 555 867 5309 today") === "call <PHONE> today")
  }

  test("redactPii: mixed spans, order email > ip > phone") {
    assert(redact("a@b.org from 10.1.2.3 tel +44 20 7946 0958.") ===
      "<EMAIL> from <IP> tel <PHONE>.")
  }

  test("redactPii: clean text is unchanged") {
    val s = "no personal data here, just words and punctuation!"
    assert(redact(s) === s)
  }

  test("redactPii: short digit runs are not phones") {
    assert(redact("room 4021 floor 12") === "room 4021 floor 12")
  }

  // ---- deterministic sampling --------------------------------------------

  private def keysDF = (0L until 2000L).toDF("k")

  test("sampleGate is deterministic and repartition-stable") {
    val a = keysDF.filter(Curation.sampleGate(col("k"), 0.5, "s1:"))
      .as[Long].collect().sorted
    val b = keysDF.repartition(13).filter(Curation.sampleGate(col("k"), 0.5, "s1:"))
      .as[Long].collect().sorted
    assert(a.sameElements(b))
    assert(math.abs(a.length / 2000.0 - 0.5) < 0.05)
  }

  test("sampleGate: lower rate selects a subset of higher rate (same salt)") {
    val lo = keysDF.filter(Curation.sampleGate(col("k"), 0.125, "s1:"))
      .as[Long].collect().toSet
    val hi = keysDF.filter(Curation.sampleGate(col("k"), 0.5, "s1:"))
      .as[Long].collect().toSet
    assert(lo.subsetOf(hi))
    assert(math.abs(lo.size / 2000.0 - 0.125) < 0.05)
  }

  test("sampleGate: different salts give independent-looking gates") {
    val a = keysDF.filter(Curation.sampleGate(col("k"), 0.5, "s1:"))
      .as[Long].collect().toSet
    val b = keysDF.filter(Curation.sampleGate(col("k"), 0.5, "s2:"))
      .as[Long].collect().toSet
    val overlap = (a & b).size.toDouble / 2000.0
    assert(overlap > 0.15 && overlap < 0.35) // ≈ 0.25 if independent
  }

  test("stratifiedSample applies per-stratum rates with defaultRate fallback") {
    val rows = (0L until 3000L).map(i =>
      (i, if (i % 3 == 0) "en" else if (i % 3 == 1) "de" else "xx"))
    val df = rows.toDF("id", "lang")
    val kept = Curation.stratifiedSample(df, "lang",
        Map("en" -> 1.0, "de" -> 0.25), keyCol = "id", defaultRate = 0.0)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(kept("en") === 1000L)                       // rate 1.0 keeps all
    assert(!kept.contains("xx"))                       // defaultRate 0 drops all
    assert(math.abs(kept("de") / 1000.0 - 0.25) < 0.06)
  }

  // ---- contamination ------------------------------------------------------

  test("contamination counts shared shingles against the probe set") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon"), // shingles: ab g, b g d, g d e
      (2L, "zeta eta theta iota"),
      (3L, "one two")                         // < 3 tokens → no shingles
    ).toDF("doc_id", "text")
    val probes = Seq(
      (100L, "alpha beta gamma delta"),       // shares "alpha beta gamma", "beta gamma delta"
      (101L, "totally unrelated probe text")
    ).toDF("doc_id", "text")
    val out = Curation.contamination(corpus, probes)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) === ((2L, 3L, 0.666667)))
    assert(out(2L) === ((0L, 2L, 0.0)))
    assert(out(3L) === ((0L, 0L, 0.0)))
  }

  test("decontaminateSpans: probe-overlapping positions masked, survivors " +
       "rebuilt; probe-only and corpus-internal-repeat grams never mask") {
    val E = (0 until 8).map(i => s"e$i").mkString(" ")   // the eval phrase
    val corpus = Seq(
      (1L, s"$E a0 a1"),                 // E at 0..7 → keeps "a0 a1"
      (2L, s"b0 $E"),                    // E at 1..8 → keeps "b0"
      (3L, "c0 c1 c2 c3 c4 c5 c6 c7 c8") // no probe gram → untouched
    ).toDF("doc_id", "text")
    val probes = Seq(
      Tuple1(s"lead $E trail"),                       // carries E
      Tuple1("p0 p1 p2 p3 p4 p5 p6 p7 p8 p9")         // probe-only grams
    ).toDF("text")
    val out = Curation.decontaminateSpans(corpus, probes, n = 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    def fp(s: String): Long =
      Seq(Tuple1(s)).toDF("t").select(graft.functions.Poly64.mix64(
        graft.functions.Poly64.poly64(col("t")))).head().getLong(0)
    assert(out(1L) === ((2L, fp("a0 a1"))))
    assert(out(2L) === ((1L, fp("b0"))))
    assert(out(3L) === ((9L, fp("c0 c1 c2 c3 c4 c5 c6 c7 c8"))))
    assert(out.size === 3)
    // broadcast default and shuffle fallback agree
    val a = Curation.decontaminateSpans(corpus, probes, n = 8,
      broadcastProbes = false).orderBy("doc_id").collect().toSeq
    val b = Curation.decontaminateSpans(corpus, probes, n = 8)
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
    // a corpus-internal repeated gram (no probe occurrence) must NOT mask:
    // decontamination is against the eval set, not self-dedup
    val selfRep = Seq((7L, "r0 r1 r2 r3 r4 r5 r6 r7 x r0 r1 r2 r3 r4 r5 r6 r7"))
      .toDF("doc_id", "text")
    val out2 = Curation.decontaminateSpans(selfRep, probes, n = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out2(7L) === 17L)
  }

  test("decontaminateSpans: empty probe set masks nothing (every corpus " +
       "doc intact, the contaminationBloom empty-probe convention)") {
    val corpus = Seq((1L, "a0 a1 a2 a3 a4"), (2L, "b0 b1")).toDF("doc_id", "text")
    val out = Curation.decontaminateSpans(corpus,
        Seq.empty[Tuple1[String]].toDF("text"), n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 5L, 2L -> 2L))
  }

  test("decontaminateSpans: randomized brute-force equivalence (small vocab " +
       "forces probe/corpus gram collisions)") {
    val n = 3
    def brute(corpus: Seq[(Long, String)], probes: Seq[String]): Map[Long, (Long, String)] = {
      def toks(t: String): Seq[String] = t.trim.toLowerCase.split("\\s+").toSeq
      val hot = probes.map(toks).filter(_.size >= n)
        .flatMap(tk => (0 to tk.size - n).map(p => tk.slice(p, p + n).mkString(" ")))
        .toSet
      corpus.map { case (id, t) =>
        val tk = toks(t)
        val covered =
          if (tk.size < n) Set.empty[Int]
          else (0 to tk.size - n).filter(p => hot(tk.slice(p, p + n).mkString(" ")))
            .flatMap(p => p until p + n).toSet
        val kept = tk.zipWithIndex.collect { case (w, p) if !covered(p) => w }
        id -> ((kept.size.toLong, kept.mkString(" ")))
      }.toMap
    }
    def fp(s: String): Long =
      Seq(Tuple1(s)).toDF("t").select(graft.functions.Poly64.mix64(
        graft.functions.Poly64.poly64(col("t")))).head().getLong(0)
    val rng = new scala.util.Random(29)
    val vocab = (0 until 8).map(i => s"w$i")
    (0 until 15).foreach { trial =>
      val corpus = (0 until 6).map { id =>
        val len = 1 + rng.nextInt(18)
        (id.toLong, (0 until len).map(_ => vocab(rng.nextInt(vocab.size))).mkString(" "))
      }
      val probes = (0 until 2).map { _ =>
        val len = 1 + rng.nextInt(10)
        (0 until len).map(_ => vocab(rng.nextInt(vocab.size))).mkString(" ")
      }
      val got = Curation.decontaminateSpans(
          corpus.toDF("doc_id", "text"), probes.map(Tuple1(_)).toDF("text"), n = n)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      val want = brute(corpus, probes)
      corpus.foreach { case (id, _) =>
        val (wantN, wantTxt) = want(id)
        assert(got(id) === ((wantN, fp(wantTxt))),
          s"trial $trial doc $id corpus=$corpus probes=$probes")
      }
    }
  }

  test("contamination: shuffle-join fallback matches broadcast plan") {
    val corpus = (0L until 50L)
      .map(i => (i, s"w$i x${i % 7} y${i % 5} z${i % 3} common tail here"))
      .toDF("doc_id", "text")
    val probes = Seq((999L, "z1 common tail here and more")).toDF("doc_id", "text")
    val a = Curation.contamination(corpus, probes, broadcastProbes = true)
      .orderBy("doc_id").collect().toSeq
    val b = Curation.contamination(corpus, probes, broadcastProbes = false)
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
  }

  test("contaminationBloom is row-identical to contamination (exact recheck)") {
    val corpus = (0L until 60L)
      .map(i => (i, s"w$i x${i % 7} y${i % 5} z${i % 3} common tail here"))
      .toDF("doc_id", "text")
    val probes = Seq(
      (999L, "z1 common tail here and more"),
      (998L, "x3 y2 z0 common tail phrase")).toDF("doc_id", "text")
    val exact = Curation.contamination(corpus, probes, broadcastProbes = false)
      .orderBy("doc_id").collect().toSeq
    val bloom = Curation.contaminationBloom(corpus, probes)
      .orderBy("doc_id").collect().toSeq
    assert(bloom === exact)
    // fpp → 0.9 forces a dense false-positive regime through the prefilter;
    // the exact recheck must still strip every one of them
    val sieve = Curation.contaminationBloom(corpus, probes, fpp = 0.9)
      .orderBy("doc_id").collect().toSeq
    assert(sieve === exact)
  }

  test("contaminationBloom handles an empty probe set (no shared shingles)") {
    val corpus = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val probes = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val out = Curation.contaminationBloom(corpus, probes)
      .as[(Long, Long, Long, Double)].collect()
    assert(out.toSeq === Seq((1L, 0L, 2L, 0.0)))
  }

  // ---- bounded top-k ------------------------------------------------------

  test("topKPerGroup matches the sort-based reference (ties broken by id)") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 500).map { i =>
      (s"g${i % 7}", rnd.nextInt(20) / 10.0, i.toLong) // few distinct scores → ties
    }
    val df = rows.toDF("grp", "score", "id").repartition(16)
    val got = Curation.topKPerGroup(df, "grp", "score", "id", k = 5)
      .as[(String, Long, Double)].collect()
      .map(r => (r._1, r._2)).toSet
    val want = rows.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
      rs.sortBy(r => (-r._2, r._3)).take(5).map(r => (g, r._3))
    }.toSet
    assert(got === want)
  }

  test("topKPerGroup: groups smaller than k return all rows") {
    val df = Seq(("a", 1.0, 1L), ("a", 2.0, 2L), ("b", 3.0, 3L))
      .toDF("grp", "score", "id")
    val out = Curation.topKPerGroup(df, "grp", "score", "id", k = 10)
      .as[(String, Long, Double)].collect().toSet
    assert(out === Set(("a", 2L, 2.0), ("a", 1L, 1.0), ("b", 3L, 3.0)))
  }

  test("tokenBudgetMix: greedy hash-order prefix, shard counts all equivalent") {
    val rnd = new scala.util.Random(13)
    // random token counts via literal whitespace tokens
    val rows = (0L until 240L).map { i =>
      (i, s"s${i % 4}", Seq.fill(1 + rnd.nextInt(30))("w").mkString(" "))
    }
    val docs = rows.toDF("doc_id", "source", "text").repartition(16)
    def keep(shards: Int, budget: Long): Set[Long] =
      Curation.tokenBudgetMix(docs, lit(budget), shards = shards)
        .collect().map(_.getLong(0)).toSet
    val plain = keep(1, 300L)
    // driver-side greedy reference over the same permutation
    val expected = rows.groupBy(_._2).values.flatMap { rs =>
      val ordered = rs.sortBy(r => ((r._1 * 2654435761L) % 4294967296L, r._1))
      var run = 0L
      ordered.takeWhile { r =>
        val ok = run < 300L; run += r._3.split("\\s+").length; ok
      }.map(_._1)
    }.toSet
    assert(plain === expected)
    assert(plain.nonEmpty && plain.size < 240, "budget did not bite")
    for (s <- Seq(2, 8, 32, 100))
      assert(keep(s, 300L) === plain, s"shards=$s diverged")
    // degenerate budgets
    assert(keep(8, 0L).isEmpty)
    assert(keep(8, 1000000L).size === 240)
    // prefix property: raising the budget only ever ADDS documents
    assert(plain.subsetOf(keep(1, 600L)))
  }

  test("topQuantilePerGroup: bucketed two-pass rank ≡ single window, ceil semantics") {
    val rnd = new scala.util.Random(17)
    // coarse score grid → cross-group ties and many same-bucket ties
    val rows = (0L until 300L).map { i =>
      (s"g${i % 5}", math.round(rnd.nextDouble() * 20) / 20.0, i)
    }
    val df = rows.toDF("grp", "score", "id").repartition(16)
    def run(frac: Double, bucketed: Boolean): Set[(String, Long)] =
      Curation.topQuantilePerGroup(df, "grp", "score", "id", frac,
        bucketOf = if (bucketed) Some(q => floor(q * 8)) else None)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    for (frac <- Seq(0.1, 0.25, 0.5, 0.9)) {
      val plain = run(frac, bucketed = false)
      // driver-side reference: ceil(frac · n) best rows, ties to lower id
      val expected = rows.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
        rs.sortBy(r => (-r._2, r._3))
          .take(math.ceil(frac * rs.size).toInt).map(r => (g, r._3))
      }.toSet
      assert(plain === expected, s"frac=$frac vs reference")
      assert(run(frac, bucketed = true) === plain, s"frac=$frac bucketed diverged")
    }
    assert(run(1.0, bucketed = true).size === 300)
    // ceil: even a tiny fraction keeps one row per nonempty group
    assert(run(0.001, bucketed = true).size === 5)
  }

  // ---- temperature mixing -------------------------------------------------

  test("temperatureMix: exact isqrt weights, quotas sum to the budget, " +
       "largest-remainder matches a BigInt reference") {
    // sizes straddle perfect-square boundaries (the FP-sqrt danger zone)
    val sizes = Map("a" -> 36L, "b" -> 35L, "c" -> 1L, "d" -> 48L, "e" -> 1000L)
    val df = sizes.toSeq.flatMap { case (g, n) => Seq.fill(n.toInt)(g) }
      .toDF("source")
    val budget = 999983L // prime: floor quotas never sum exactly
    val got = Curation.temperatureMix(df, "source", budget).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

    // driver-side BigInt reference of the same rule
    val w = sizes.map { case (g, n) => g -> math.sqrt(n.toDouble).toLong }
      .map { case (g, k) => // exact isqrt correction
        val kk = if ((k + 1) * (k + 1) <= sizes(g)) k + 1
        else if (k * k > sizes(g)) k - 1 else k
        g -> kk
      }
    assert(w === Map("a" -> 6L, "b" -> 5L, "c" -> 1L, "d" -> 6L, "e" -> 31L))
    val ws = w.values.sum
    val a0 = w.map { case (g, k) => g -> budget * k / ws }
    val deficit = budget - a0.values.sum
    val topped = w.keys.toSeq
      .sortBy(g => (-(budget * w(g) % ws), g)).take(deficit.toInt).toSet
    val ref = sizes.keys.map(g =>
      g -> ((sizes(g), w(g), a0(g) + (if (topped(g)) 1L else 0L)))).toMap
    assert(got === ref)
    assert(got.values.map(_._3).sum === budget)
  }

  test("temperatureMix: budget below group count still sums exactly") {
    val df = Seq("a", "a", "b", "c", "d", "e").toDF("source")
    val got = Curation.temperatureMix(df, "source", budget = 2L).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(got.values.sum === 2L)
    assert(got.values.forall(a => a == 0L || a == 1L))
  }

  // ---- hash split ---------------------------------------------------------

  test("hashSplit: pure function of id — stable under reruns, partitioning, " +
       "and corpus growth; shares near the requested thousandths") {
    val ids = spark.range(10000).select(col("id").as("doc_id"))
    val full = Curation.hashSplit(ids).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

    // driver reference of the bucket rule
    ids.collect().map(_.getLong(0)).take(100).foreach { id =>
      val h = graft.functions.Poly64.mix(graft.functions.Poly64.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString(id.toString),
        graft.functions.Poly64.Seed1, graft.functions.Poly64.Mult1))
      val b = (h >>> 1) % 1000
      val exp = if (b < 900) "train" else if (b < 950) "valid" else "test"
      assert(full(id) === exp, s"id $id bucket $b")
    }

    // growth stability: assignment on a subset equals the full corpus's
    val sub = Curation.hashSplit(ids.filter(col("doc_id") < 1000)).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    sub.foreach { case (id, s) => assert(s === full(id)) }

    // repartitioning changes nothing
    val reparted = Curation.hashSplit(ids.repartition(17)).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(reparted === full)

    val shares = full.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(shares.values.sum === 10000)
    assert(math.abs(shares("train") - 9000) < 150, s"train ${shares("train")}")
    assert(math.abs(shares("valid") - 500) < 80, s"valid ${shares("valid")}")
    assert(math.abs(shares("test") - 500) < 80, s"test ${shares("test")}")
  }

  test("hashSplit: custom shares honored; invalid shares rejected") {
    val ids = spark.range(2000).select(col("id").as("doc_id"))
    val got = Curation.hashSplit(ids, splits = Seq(("x", 1000))).collect()
    assert(got.forall(_.getString(1) == "x"))
    intercept[IllegalArgumentException] {
      Curation.hashSplit(ids, splits = Seq(("a", 500), ("b", 400)))
    }
    intercept[IllegalArgumentException] {
      Curation.hashSplit(ids, splits = Seq.empty)
    }
  }

  // ---- C4 heuristic cleaning (Raffel et al. JMLR'20 §2.2) -----------------

  test("c4LineFilter: terminal punctuation, minWords, and banned-word " +
       "rules each drop exactly their lines; survivors rebuild in order") {
    val d = Seq(
      (1L, "this is a good long sentence.\nno terminal punctuation here" +
        "\nthe second good sentence stays too!\nshort line.\n" +
        "please enable javascript to view this page.\n" +
        "another keeper sentence is right here?"),
      (2L, "all of this one survives fine.\nand so does this final line."),
      (3L, ""),                               // one empty line → dropped
      (4L, null.asInstanceOf[String])         // NULL text → zero lines kept
    ).toDF("doc_id", "text")
    val out = Curation.c4LineFilter(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    def fp(s: String): Long =
      Seq(Tuple1(s)).toDF("t").select(graft.functions.Poly64.poly64(col("t")))
        .head().getLong(0)
    assert(out(1L) === ((3L, 3L, fp("this is a good long sentence.\n" +
      "the second good sentence stays too!\n" +
      "another keeper sentence is right here?"))))
    assert(out(2L) === ((2L, 0L,
      fp("all of this one survives fine.\nand so does this final line."))))
    assert(out(3L) === ((0L, 1L, fp(""))))
    assert(out(4L) === ((0L, 1L, fp(""))))
  }

  test("c4LineFilter: banned-word match is word-boundary after " +
       "punctuation stripping — '(javascript)' hits, 'ecmascript' does not") {
    val d = Seq(
      (1L, "we serve pages with (javascript) everywhere online."),
      (2L, "we serve pages with ecmascript everywhere online."),
      (3L, "turn on JavaScript to continue browsing this site.")  // case-folded
    ).toDF("doc_id", "text")
    val kept = Curation.c4LineFilter(d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(kept(1L) === 0L && kept(2L) === 1L && kept(3L) === 0L)
  }

  test("c4DocFilter: each page rule flags independently; keep is their " +
       "conjunction with the sentence floor") {
    val good = "one full sentence here. two full sentences now. and a third!"
    val d = Seq(
      (1L, good),
      (2L, s"$good with a badger word"),
      (3L, s"$good plus Lorem Ipsum filler"),   // case-insensitive
      (4L, s"$good function() { return 1; }"),
      (5L, "too few sentences."),
      (6L, "no sentences at all")
    ).toDF("doc_id", "text")
    val out = Curation.c4DocFilter(d, blocklist = Seq("badger", "mushroom"))
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1), r.getBoolean(2), r.getBoolean(3), r.getLong(4),
          r.getBoolean(5)))).toMap
    assert(out(1L) === ((false, false, false, 3L, true)))
    assert(out(2L) === ((true, false, false, 3L, false)))
    assert(out(3L) === ((false, true, false, 3L, false)))
    assert(out(4L) === ((false, false, true, 3L, false)))
    assert(out(5L) === ((false, false, false, 1L, false)))
    assert(out(6L) === ((false, false, false, 0L, false)))
  }
}

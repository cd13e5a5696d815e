package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{Ann, Curation, Dedup, Events, Multimodal, TextAnalysis}

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  /** Micro-nat quantization for driver references: Spark's round() is
    * BigDecimal HALF_UP (half away from zero), NOT math.round (half toward
    * +∞) — the two differ on negative exact-.5 values, which log scores
    * can land on. Every reference that quantizes a log must use this. */
  def microNat(x: Double): Long =
    BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank yesterday"), // near-dup of 1
    (3L, "completely different content about database engines and query planning"),
    (4L, "the quick brown fox jumps over the lazy dog near the river bank today"),      // exact dup of 1
    (5L, "der schnelle braune fuchs springt mit der über den faulen hund und")
  ).toDF("doc_id", "text")

  test("exact dedup collapses identical normalized text") {
    val out = Dedup.exact(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) === 2L)            // docs 1 and 4 collapse, min id kept
    assert(out.values.sum === 5L)
    assert(out.size === 4)
  }

  test("repeatedSpans: cross-doc n-gram spans with merged islands; " +
       "doc-internal-only repeats never marked") {
    // shared 10-token phrase P = p0..p9; docA holds it at 0, docB at 5;
    // docC repeats its own private 4-gram twice (internal only — df=1);
    // a second shared 4-gram S sits isolated in docA (at 15) and docC
    val P = (0 until 10).map(i => s"p$i").mkString(" ")
    val S = "s0 s1 s2 s3"
    val fillA = (0 until 5).map(i => s"a$i").mkString(" ")
    val fillB = (0 until 5).map(i => s"b$i").mkString(" ")
    val priv = "c0 c1 c2 c3"
    val d = Seq(
      (1L, s"$P $fillA $S"),                     // P at 0..9, S at 15..18
      (2L, s"$fillB $P extra tail words here"),  // P at 5..14
      (3L, s"$priv mid1 mid2 mid3 mid4 $priv $S") // priv ×2 internal, S at 12..15
    ).toDF("doc_id", "text")
    val out = Dedup.repeatedSpans(d, n = 4, minDocs = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // P (10 tokens, n=4) → 7 gram starts merging to one span of width 10;
    // S (4 tokens) → 1 gram. P and S in docA are separated by 5 filler
    // tokens (gap > n) → two spans. docC's private 4-gram is internal-only
    // → unmarked; its S copy IS marked.
    assert(out === Set(
      (1L, 0L, 9L, 7L), (1L, 15L, 18L, 1L),
      (2L, 5L, 14L, 7L),
      (3L, 12L, 15L, 1L)))
    // plan: the islands window is partitioned by doc id — never global
    val phys = Dedup.repeatedSpans(d, n = 4, minDocs = 2)
      .queryExecution.executedPlan.toString
    assert(!phys.contains("Window [") ||
      !phys.matches("(?s).*Window \\[[^\\]]*\\]\\s*,\\s*\\[\\]\\s*,.*"),
      "unpartitioned window in repeatedSpans plan")
  }

  test("removeRepeatedSpans: covered tokens drop everywhere, survivors " +
       "rebuild in position order, full-coverage docs fingerprint empty") {
    val P = (0 until 10).map(i => s"p$i").mkString(" ")
    val d = Seq(
      (1L, s"$P tail1 tail2"),  // P at 0..9 → keeps "tail1 tail2"
      (2L, s"lead1 $P"),        // P at 1..10 → keeps "lead1"
      (3L, P),                  // fully covered → empty
      (4L, "only two")          // < n tokens, untouched
    ).toDF("doc_id", "text")
    val out = Dedup.removeRepeatedSpans(d, n = 4, minDocs = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    def fp(s: String): Long =
      Seq(Tuple1(s)).toDF("t").select(graft.functions.Poly64.mix64(
        graft.functions.Poly64.poly64(col("t")))).head().getLong(0)
    assert(out(1L) === ((2L, fp("tail1 tail2"))))
    assert(out(2L) === ((1L, fp("lead1"))))
    assert(out(3L) === ((0L, fp(""))))
    assert(out(4L) === ((2L, fp("only two"))))
  }

  test("span-coverage audit vs a driver-side maximal-repeated-substring " +
       "reference (the Lee et al. suffix-array semantics): EXACT coverage " +
       "equality under the cross-document criterion; the within-document-" +
       "repeat gap is the measured, documented policy difference") {
    // Claim under test (the reason no left/right island extension is
    // needed): a token is inside SOME length->=n substring repeated in
    // >= minDocs docs  ⟺  it is inside an n-token WINDOW with df >=
    // minDocs (every n-window of a repeated substring is itself repeated;
    // every hot window is itself a repeated substring). Fixed-n windows +
    // island merge therefore give exactly the maximal-substring token
    // coverage — the drill verifies the equality on randomized corpora
    // and quantifies the one real semantic gap: substrings repeated only
    // WITHIN one document (counted by Lee et al.'s >=2-occurrences
    // suffix-array criterion, deliberately not by our cross-doc df).
    val n = 3; val minDocs = 2
    val rng = new scala.util.Random(47)
    var refAnyTotal = 0L; var hitAny = 0L; var crossTotal = 0L
    (0 until 10).foreach { trial =>
      val nd = 3 + rng.nextInt(3)
      val base = (0 until nd).map { d =>
        val len = 8 + rng.nextInt(16)
        (d.toLong, (0 until len).map(_ => "t" + rng.nextInt(6)).mkString(" "))
      }
      // injected within-doc-ONLY repeat (z-vocab unique to this doc) makes
      // the any-repeat gap non-vacuous every trial — the d_dup_matrix
      // injection discipline
      val docs = base :+ (90L, "z1 z2 z3 x0 z1 z2 z3")
      val toks = docs.map { case (id, t) => id -> t.split(" ").toVector }.toMap
      def cover(pred: Vector[String] => Boolean): Map[Long, Set[Int]] = {
        val subs = toks.values.flatMap { ts =>
          (n to ts.length).flatMap(l => ts.sliding(l).map(_.toVector))
        }.toSet.filter(pred)
        toks.map { case (id, ts) =>
          id -> subs.flatMap { sub =>
            ts.indices.filter(i => i + sub.length <= ts.length &&
                ts.slice(i, i + sub.length) == sub)
              .flatMap(i => i until i + sub.length)
          }.toSet
        }
      }
      def occ(sub: Vector[String]): Seq[(Long, Int)] =
        toks.toSeq.flatMap { case (id, ts) =>
          ts.indices.filter(i => i + sub.length <= ts.length &&
            ts.slice(i, i + sub.length) == sub).map(id -> _)
        }
      val refCross = cover(s => occ(s).map(_._1).distinct.size >= minDocs)
      val refAny = cover(s => occ(s).size >= 2)
      val got = Dedup.repeatedSpans(docs.toDF("doc_id", "text"), n = n,
          minDocs = minDocs).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .groupBy(_._1).map { case (id, ss) =>
          id -> ss.flatMap(s => s._2.toInt to s._3.toInt).toSet
        }
      toks.keys.foreach { id =>
        assert(got.getOrElse(id, Set.empty) === refCross(id),
          s"trial $trial doc $id: island coverage != maximal-substring coverage")
      }
      // the injected within-doc repeat: caught by any-repeat, not by us
      assert(refAny(90L).nonEmpty && got.getOrElse(90L, Set.empty).isEmpty)
      refAnyTotal += refAny.values.map(_.size).sum
      hitAny += refAny.map { case (id, s) =>
        (s intersect got.getOrElse(id, Set.empty)).size }.sum
      crossTotal += refCross.values.map(_.size).sum
    }
    assert(refAnyTotal > crossTotal, "gap must be non-vacuous across trials")
    val recall = hitAny.toDouble / refAnyTotal
    // measured over seed-47 trials: recall 0.642 (215/335) vs the
    // any-repeat criterion — alphabet-6 fixtures are deliberately dense in
    // within-doc repeats; the cross-doc slice (all 215 positions) is
    // covered exactly (precision 1.0 by the equality above). Documented in
    // the repeatedSpans scaladoc.
    info(f"coverage recall vs any-repeat criterion: $recall%.3f " +
      f"($hitAny/$refAnyTotal; cross-doc slice $crossTotal exact)")
    assert(recall < 1.0 && recall > 0.5)
  }

  test("repeatedSpansAnyRepeat closes the criterion gap: token coverage " +
       "EXACTLY equals the any-repeat maximal-substring reference (recall " +
       "AND precision 1.0) on the same randomized corpora, within-doc " +
       "repeats included") {
    // Same containment argument as the cross-doc drill, under the
    // >=2-occurrences-anywhere criterion: two occurrences of a substring
    // (even overlapping, even within one doc) place each inner n-window at
    // two DISTINCT (doc, pos) positions, so every window of a repeated
    // substring is count-hot; every count-hot window is itself a repeated
    // length-n substring.
    val n = 3
    val rng = new scala.util.Random(47)
    (0 until 10).foreach { trial =>
      val nd = 3 + rng.nextInt(3)
      val base = (0 until nd).map { d =>
        val len = 8 + rng.nextInt(16)
        (d.toLong, (0 until len).map(_ => "t" + rng.nextInt(6)).mkString(" "))
      }
      val docs = base :+ (90L, "z1 z2 z3 x0 z1 z2 z3")
      val toks = docs.map { case (id, t) => id -> t.split(" ").toVector }.toMap
      def occ(sub: Vector[String]): Seq[(Long, Int)] =
        toks.toSeq.flatMap { case (id, ts) =>
          ts.indices.filter(i => i + sub.length <= ts.length &&
            ts.slice(i, i + sub.length) == sub).map(id -> _)
        }
      val refAny: Map[Long, Set[Int]] = {
        val subs = toks.values.flatMap { ts =>
          (n to ts.length).flatMap(l => ts.sliding(l).map(_.toVector))
        }.toSet.filter(s => occ(s).size >= 2)
        toks.map { case (id, ts) =>
          id -> subs.flatMap { sub =>
            ts.indices.filter(i => i + sub.length <= ts.length &&
                ts.slice(i, i + sub.length) == sub)
              .flatMap(i => i until i + sub.length)
          }.toSet
        }
      }
      val got = Dedup.repeatedSpansAnyRepeat(docs.toDF("doc_id", "text"),
          n = n, minCount = 2).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .groupBy(_._1).map { case (id, ss) =>
          id -> ss.flatMap(s => s._2.toInt to s._3.toInt).toSet
        }
      toks.keys.foreach { id =>
        assert(got.getOrElse(id, Set.empty) === refAny(id),
          s"trial $trial doc $id: any-repeat island coverage != " +
            "any-repeat maximal-substring coverage")
      }
      // the within-doc-ONLY injection the cross-doc drill proves invisible
      // to repeatedSpans is covered here
      assert(got.getOrElse(90L, Set.empty) === Set(0, 1, 2, 4, 5, 6))
    }
  }

  test("sentenceSpanDedup (C4's 3-sentence-span unit): first corpus " +
       "occurrence keeps the block, later docs and within-doc copies " +
       "lose exactly the covered sentence windows") {
    val B = "s1.\ns2.\ns3."                    // the repeated 3-sentence span
    val d = Seq(
      (1L, s"$B\nown1."),        // keeper: retains all 4 sentences
      (2L, s"pre1.\n$B\npost1."),// non-keeper: loses s1..s3, keeps pre/post
      (3L, s"a1.\nb1.\n$B"),     // non-keeper at tail
      (4L, "x1.\ny1."),          // < 3 sentences, untouched
      (5L, s"c1.\nd1.\ne1.\nc1.\nd1.\ne1.")  // within-doc repeat: tail copy drops
    ).toDF("doc_id", "text")
    val out = Dedup.sentenceSpanDedup(d, n = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    def fp(s: String): Long =
      Seq(Tuple1(s)).toDF("t").select(graft.functions.Poly64.mix64(
        graft.functions.Poly64.poly64(col("t")))).head().getLong(0)
    assert(out(1L) === ((4L, fp(s"$B\nown1."))))
    assert(out(2L) === ((2L, fp("pre1.\npost1."))))
    assert(out(3L) === ((2L, fp("a1.\nb1."))))
    assert(out(4L) === ((2L, fp("x1.\ny1."))))
    assert(out(5L) === ((3L, fp("c1.\nd1.\ne1."))))
  }

  test("segmentSentences: golden hand-segmented fixtures — terminal punct " +
       "splits; abbreviations, single-letter initials and bare numbers do " +
       "not; trailing closers strip; remainder is its own sentence") {
    val cases = Seq(
      "the cat sat. the dog ran!" ->
        Seq("the cat sat.", "the dog ran!"),
      // abbreviation guards (dr./mr./p.m.), mid-token dot never splits
      "dr. smith met mr. jones at 3.5 p.m. sharp! next one." ->
        Seq("dr. smith met mr. jones at 3.5 p.m. sharp!", "next one."),
      // bare-number enumeration: "2." is not a terminal
      "was it worth 2. maybe not?" ->
        Seq("was it worth 2. maybe not?"),
      // closing-quote strip: the '!' hides behind '"'
      "she said \"stop!\" then left." ->
        Seq("she said \"stop!\"", "then left."),
      // single-letter initials
      "j. k. rowling wrote it. done." ->
        Seq("j. k. rowling wrote it.", "done."),
      "pi is 3.14 exactly. yes?" ->
        Seq("pi is 3.14 exactly.", "yes?"),
      // no terminal at all: the whole text is one trailing sentence
      "no trailing terminal here" -> Seq("no trailing terminal here"),
      // question/exclamation with closers, parenthesis variant
      "really (and truly)? sure." -> Seq("really (and truly)?", "sure."),
      "etc. and so on. fine." -> Seq("etc. and so on.", "fine."),
      "" -> Seq(""))
    val got = cases.map(_._1).toDF("text")
      .select(TextAnalysis.segmentSentences(col("text")).as("s"))
      .collect().map(_.getSeq[String](0).toList)
    cases.zip(got).foreach { case ((in, want), s) =>
      assert(s === want.toList, s"input: '$in'")
    }
  }

  test("segmentSentences ∘ sentenceSpanDedup ≡ sentenceSpanDedup over " +
       "pre-newline-wrapped text when the segmenter and the wrapping agree") {
    // space-joined docs whose sentences the segmenter must re-discover;
    // doc 2 repeats doc 1's 3-sentence block (cross-doc keep-one)
    val s1 = "k0 k1 k2."; val s2 = "k3 k4 k5!"; val s3 = "k6 k7 k8?"
    val flat = Seq(
      (1L, s"$s1 $s2 $s3 t0 t1."),
      (2L, s"pre p0. $s1 $s2 $s3 post q0."),
      (3L, "x0 x1. y0 y1."))
    val wrapped = flat.map { case (id, t) =>
      // the hand-wrapped equivalent: same sentences, newline-joined
      (id, t.replaceAll("(?<=[.!?]) ", "\n"))
    }
    val a = Dedup.sentenceSpanDedup(
        flat.toDF("doc_id", "text").withColumn("text",
          array_join(TextAnalysis.segmentSentences(col("text")), "\n")),
        n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val b = Dedup.sentenceSpanDedup(wrapped.toDF("doc_id", "text"), n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(a.toSeq === b.toSeq)
    // and the dedup actually fired: doc 2 lost the 3-sentence block
    val byId = a.map(t => t._1 -> t._2).toMap
    assert(byId(1L) === 4L && byId(2L) === 2L && byId(3L) === 2L)
  }

  test("removeRepeatedSpansAny masks within-document repeats that " +
       "removeRepeatedSpans (cross-doc criterion) leaves intact") {
    val Q = "q0 q1 q2 q3"
    val d = Seq(
      (1L, s"$Q x0 $Q"),        // within-doc repeat: both copies masked
      (2L, "a b c d e f"),      // no repeats anywhere → untouched
      (3L, "only two")          // < n tokens → untouched
    ).toDF("doc_id", "text")
    def fp(s: String): Long =
      Seq(Tuple1(s)).toDF("t").select(graft.functions.Poly64.mix64(
        graft.functions.Poly64.poly64(col("t")))).head().getLong(0)
    val any = Dedup.removeRepeatedSpansAny(d, n = 4, minCount = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(any(1L) === ((1L, fp("x0"))))
    assert(any(2L) === ((6L, fp("a b c d e f"))))
    assert(any(3L) === ((2L, fp("only two"))))
    // contrast pin: the cross-doc mask sees ONE document → no hot grams
    val cross = Dedup.removeRepeatedSpans(d, n = 4, minDocs = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cross(1L) === 9L && any(1L)._1 === 1L)
  }

  test("removeRepeatedSpansKeepOne: each hot gram's first corpus occurrence " +
       "retains text every other occurrence loses; later-doc keepers work") {
    val P = (0 until 10).map(i => s"p$i").mkString(" ")  // keeper in doc 1
    val Q = "q0 q1 q2 q3"                                // keeper in doc 2
    val d = Seq(
      (1L, s"$P tail1 tail2"),  // P keeper → keeps ALL 12 tokens
      (2L, s"lead1 $P $Q"),     // P masked (non-keeper), Q keeper → keeps lead1+Q
      (3L, s"$Q $P"),           // both non-keeper → fully masked
      (4L, "only two")          // < n tokens, untouched
    ).toDF("doc_id", "text")
    val out = Dedup.removeRepeatedSpansKeepOne(d, n = 4, minDocs = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    def fp(s: String): Long =
      Seq(Tuple1(s)).toDF("t").select(graft.functions.Poly64.mix64(
        graft.functions.Poly64.poly64(col("t")))).head().getLong(0)
    assert(out(1L) === ((12L, fp(s"$P tail1 tail2"))))
    assert(out(2L) === ((5L, fp(s"lead1 $Q"))))
    assert(out(3L) === ((0L, fp(""))))
    assert(out(4L) === ((2L, fp("only two"))))
    // contrast pin: remove-everywhere loses P in doc 1 too — the keeper
    // genuinely retains text a non-keeper loses
    val everywhere = Dedup.removeRepeatedSpans(d, n = 4, minDocs = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(everywhere(1L) === 2L && out(1L)._1 === 12L)
  }

  test("span mask aggregate on an EMPTY corpus keeps its single row " +
       "(n_docs=0, NULL sums) — the d_repeated_spans_mask guard's " +
       "empty-input carve-out, matching the SQL-aggregate convention") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val out = Dedup.removeRepeatedSpans(empty, n = 4, minDocs = 2)
      .agg(count(lit(1)).as("n_docs"), sum(col("n_kept")).as("tot_kept"),
        expr("bit_xor(text_fp)").as("mask_fp"))
      .filter(col("n_docs") === 0 || col("mask_fp").isNotNull)
      .collect()
    assert(out.length === 1)
    assert(out(0).getLong(0) === 0L)
    assert(out(0).isNullAt(1) && out(0).isNullAt(2))
  }

  test("packOrd fails LOUDLY on position overflow instead of silently " +
       "electing a wrong keeper; packs exactly below the limit") {
    // posBits=4 keeps the drill cheap: limit is pos 16, not a 1M-token doc
    val ok = Seq((3L, 15L), (3, 0L), (1L << 40, 15L))
      .map { case (i, p) => (i.toString, p) }.toDF("sid", "pos")
      .select(col("sid").cast("long").as("id"), col("pos"))
    val packed = ok.select(Dedup.packOrd(col("id"), col("pos"), 4).as("o"))
      .collect().map(_.getLong(0)).sorted
    assert(packed === Array(3L * 16, 3L * 16 + 15, (1L << 44) + 15))
    // Int-width ids must pack at LONG width (the cast-before-shift guard):
    // an Int id 2^28 shifted by 4 overflows Int, is fine in Long
    val intIds = Seq(Tuple2(1 << 28, 1L)).toDF("id", "pos")
    assert(intIds.select(Dedup.packOrd(col("id"), col("pos"), 4))
      .head().getLong(0) === (1L << 32) + 1L)
    val bad = Seq((1L, 16L)).toDF("id", "pos")
    val e = intercept[Exception] {
      bad.select(Dedup.packOrd(col("id"), col("pos"), 4)).collect()
    }
    assert(e.getMessage.contains("ordinal pack overflow"))
    // the deployed 20-bit sites ride the same helper: a >= 2^20 position
    // raises end-to-end through removeRepeatedSpansKeepOne's plan only for
    // genuinely overlong docs — normal docs are untouched (pin via reuse
    // of the keep-one fixture already gated above)
  }

  test("removeRepeatedSpansKeepOne: randomized brute-force equivalence " +
       "(keeper = min packed (doc, pos) per hot gram)") {
    val n = 3; val minDocs = 2
    def brute(ds: Seq[(Long, String)]): Map[Long, (Long, String)] = {
      val toks = ds.map { case (id, t) =>
        id -> t.trim.toLowerCase.split("\\s+").toSeq
      }
      val grams = toks.filter(_._2.size >= n).flatMap { case (id, tk) =>
        (0 to tk.size - n).map(p => (id, p.toLong, tk.slice(p, p + n).mkString(" ")))
      }
      val keeper = grams.groupBy(_._3)
        .filter(_._2.map(_._1).distinct.size >= minDocs)
        .map { case (g, os) => g -> os.map(o => (o._1 << 20) + o._2).min }
      val covered = grams
        .filter(o => keeper.get(o._3).exists(_ != (o._1 << 20) + o._2))
        .flatMap(o => (o._2 until o._2 + n).map(p => (o._1, p))).toSet
      toks.map { case (id, tk) =>
        val kept = tk.zipWithIndex.collect {
          case (t, p) if !covered((id, p.toLong)) => t
        }
        id -> ((kept.size.toLong, kept.mkString(" ")))
      }.toMap
    }
    val rng = new scala.util.Random(13)
    val vocab = (0 until 9).map(i => s"w$i")
    (0 until 20).foreach { trial =>
      val ds = (0 until 6).map { id =>
        val len = 1 + rng.nextInt(20)
        (id.toLong, (0 until len).map(_ => vocab(rng.nextInt(vocab.size))).mkString(" "))
      }
      val got = Dedup.removeRepeatedSpansKeepOne(
          ds.toDF("doc_id", "text"), n = n, minDocs = minDocs)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      val want = brute(ds)
      def fp(s: String): Long =
        Seq(Tuple1(s)).toDF("t").select(graft.functions.Poly64.mix64(
          graft.functions.Poly64.poly64(col("t")))).head().getLong(0)
      ds.foreach { case (id, _) =>
        val (wantN, wantTxt) = want(id)
        assert(got(id) === ((wantN, fp(wantTxt))), s"trial $trial doc $id corpus=$ds")
      }
    }
  }

  test("gramDfIndex stamps gram length; repeatedSpansIncremental rejects a " +
       "mismatched-n base index loudly (also across a parquet roundtrip)") {
    val docs = Seq((1L, "a b c d e"), (2L, "a b c d f")).toDF("doc_id", "text")
    val idx3 = Dedup.gramDfIndex(docs, n = 3)
    val delta = Seq((3L, "a b c d g")).toDF("doc_id", "text")
    val ex = intercept[IllegalArgumentException] {
      Dedup.repeatedSpansIncremental(idx3, delta, n = 4, minDocs = 2)
    }
    assert(ex.getMessage.contains("gram-length mismatch"))
    // matching n passes, and the MERGED index keeps the stamp (chained
    // incrementals stay guarded)
    val (merged, _) = Dedup.repeatedSpansIncremental(idx3, delta, n = 3, minDocs = 2)
    val ex2 = intercept[IllegalArgumentException] {
      Dedup.repeatedSpansIncremental(merged, delta, n = 5, minDocs = 2)
    }
    assert(ex2.getMessage.contains("gram-length mismatch"))
    // the stamp survives a parquet roundtrip (the maintained-index shape)
    val dir = java.nio.file.Files.createTempDirectory("gramidx").toString
    idx3.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    val ex3 = intercept[IllegalArgumentException] {
      Dedup.repeatedSpansIncremental(back, delta, n = 4, minDocs = 2)
    }
    assert(ex3.getMessage.contains("gram-length mismatch"))
    // an unstamped hand-built index falls back to the documented contract
    // (no exception — the caller owns n-consistency)
    val hand = idx3.select(col("gh").cast("long").as("gh"), col("df"))
    Dedup.repeatedSpansIncremental(hand, delta, n = 4, minDocs = 2)
  }

  test("streaming ingest: per-batch span-index maintenance — the merged " +
       "gramDfIndex tracks the full corpus; each batch's spans are judged " +
       "against docs-so-far (base-side re-mask caveat visible)") {
    // the CMS foreachBatch maintenance pattern applied to the span family:
    // document-atomic micro-batches, driver keeps the (gh, df) profile
    // (bounded by distinct grams), each batch's spans come from ONE
    // delta-only incremental call against the accumulated index
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val P = (0 until 6).map(i => s"p$i").mkString(" ")
    val batches = Seq(
      Seq((1L, s"$P a0 a1 a2")),                      // P df=1 — nothing hot yet
      Seq((2L, s"b0 $P b1"), (3L, "c0 c1 c2 c3 c4")), // P df=2 → doc 2 marked
      Seq((4L, s"d0 d1 $P")))                         // P df=3 → doc 4 marked
    val idxSchema = StructType(Seq(
      StructField("gh", LongType), StructField("df", LongType)))
    var acc = Seq.empty[org.apache.spark.sql.Row]
    val spansSeen = scala.collection.mutable.ListBuffer.empty[(Long, Long, Long, Long)]
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val base = spark.createDataFrame(
          spark.sparkContext.parallelize(acc, 2), idxSchema)
        val (merged, spans) =
          Dedup.repeatedSpansIncremental(base, batch, n = 3, minDocs = 2)
        // materialize both before the micro-batch frame goes stale
        spansSeen ++= spans.collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        acc = merged.collect().toSeq
        ()
      }
      .start()
    batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    q.stop()
    // final profile == one-shot full-corpus index
    val all = batches.flatten.toDF("doc_id", "text")
    val full = Dedup.gramDfIndex(all, n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(acc.map(r => r.getLong(0) -> r.getLong(1)).toMap === full)
    // spans: docs 2 and 4 marked when their batch arrived; doc 1 (the
    // first P carrier) is NEVER re-emitted — the documented base-side
    // re-mask contract
    assert(spansSeen.toSet === Set((2L, 1L, 6L, 4L), (4L, 2L, 7L, 4L)))
  }

  test("repeatedSpansIncremental: merged index == full-corpus index; " +
       "delta spans == batch spans restricted to the delta docs") {
    val rng = new scala.util.Random(11)
    val vocab = (0 until 8).map(i => s"w$i")
    (0 until 10).foreach { trial =>
      val ds = (0 until 8).map { id =>
        val len = 4 + rng.nextInt(20)
        (id.toLong, (0 until len).map(_ => vocab(rng.nextInt(vocab.size))).mkString(" "))
      }
      val all = ds.toDF("doc_id", "text")
      val base = ds.filter(_._1 % 2 == 0).toDF("doc_id", "text")
      val delta = ds.filter(_._1 % 2 == 1).toDF("doc_id", "text")
      val (merged, spans) = Dedup.repeatedSpansIncremental(
        Dedup.gramDfIndex(base, n = 3), delta, n = 3, minDocs = 2)
      val mergedMap = merged.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val fullMap = Dedup.gramDfIndex(all, n = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(mergedMap === fullMap, s"trial $trial index mismatch")
      val got = spans.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val expect = Dedup.repeatedSpans(all, n = 3, minDocs = 2)
        .filter(col("doc_id") % 2 === 1).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(got === expect, s"trial $trial spans mismatch")
    }
  }

  test("repeatedSpans: randomized brute-force equivalence (small vocab " +
       "forces cross-doc collisions; df/merge semantics pinned)") {
    val n = 3; val minDocs = 2
    def brute(ds: Seq[(Long, String)]): Set[(Long, Long, Long, Long)] = {
      val toks = ds.map { case (id, t) =>
        id -> t.trim.toLowerCase.split("\\s+").toSeq
      }.filter(_._2.size >= n)
      val grams = toks.flatMap { case (id, tk) =>
        (0 to tk.size - n).map(p => (id, p.toLong, tk.slice(p, p + n).mkString(" ")))
      }
      val hot = grams.groupBy(_._3)
        .filter(_._2.map(_._1).distinct.size >= minDocs).keySet
      grams.filter(g => hot(g._3)).groupBy(_._1).toSeq.flatMap { case (id, ps) =>
        val sorted = ps.map(_._2).sorted
        val spans = sorted.foldLeft(List.empty[(Long, Long, Long)]) {
          case ((s, e, c) :: rest, p) if p - e <= n => (s, p, c + 1) :: rest
          case (acc, p) => (p, p, 1L) :: acc
        }
        spans.map { case (s, e, c) => (id, s, e + n - 1, c) }
      }.toSet
    }
    val rng = new scala.util.Random(7)
    val vocab = (0 until 10).map(i => s"w$i")
    (0 until 25).foreach { trial =>
      val ds = (0 until 6).map { id =>
        val len = rng.nextInt(22)
        (id.toLong, (0 until len).map(_ => vocab(rng.nextInt(vocab.size))).mkString(" "))
      }.filter(_._2.nonEmpty)
      if (ds.nonEmpty) {
        val got = Dedup.repeatedSpans(ds.toDF("doc_id", "text"), n = n, minDocs = minDocs)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
          .toSet
        assert(got === brute(ds), s"trial $trial corpus=$ds")
      }
    }
  }

  test("lineDedup: first corpus occurrence survives, later copies drop, " +
       "counts and rebuilt-text fingerprints match a driver reference") {
    val multi = Seq(
      (10L, "cookie banner\nunique alpha\nlicense header"),
      (11L, "cookie banner\nunique beta\nlicense header\ncookie banner"),
      (12L, "unique gamma\ncookie banner"),
      (13L, "license header"), // every line already seen → empty doc
      (14L, "")                // single empty line: first "" occurrence, kept
    ).toDF("doc_id", "text")

    // driver-side reference of the same rule
    val seen = scala.collection.mutable.Set.empty[String]
    val ref = Seq(10L -> "cookie banner\nunique alpha\nlicense header",
      11L -> "cookie banner\nunique beta\nlicense header\ncookie banner",
      12L -> "unique gamma\ncookie banner", 13L -> "license header", 14L -> "")
      .map { case (id, t) =>
        val lines = t.split("\n", -1)
        val kept = lines.filter(l => seen.add(l))
        id -> ((kept.length.toLong, (lines.length - kept.length).toLong,
          kept.mkString("\n")))
      }.toMap

    val got = Dedup.lineDedup(multi).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet === ref.keySet)
    ref.foreach { case (id, (nk, nd, txt)) =>
      val (gnk, gnd, gfp) = got(id)
      assert(gnk === nk, s"doc $id n_kept")
      assert(gnd === nd, s"doc $id n_dropped")
      val expFp = graft.functions.Poly64.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString(txt),
        graft.functions.Poly64.Seed1, graft.functions.Poly64.Mult1)
      assert(gfp === expFp, s"doc $id rebuilt-text fingerprint")
    }

    // kept-lines view agrees with the fingerprints
    val keptLines = Dedup.lineDedupKept(multi).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(keptLines.groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)
      .mkString("\n")).toMap ===
      ref.collect { case (id, (nk, _, txt)) if nk > 0 => id -> txt })
  }

  test("streaming ingest loop: foreachBatch line deltas ≡ batch lineDedup " +
       "over the concatenated corpus") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val allDocs = Seq(
      (1L, "cookie banner\nalpha one\nlicense header"),
      (2L, "beta two\ncookie banner"),
      (3L, "license header\ngamma three\ncookie banner"),   // batch 2
      (4L, "gamma three\ndelta four"),
      (5L, "delta four\nepsilon five\nlicense header")      // batch 3
    )
    val batches = Seq(allDocs.take(2), allDocs.slice(2, 4), allDocs.drop(4))

    Dedup.saveLineIndex(spark, "ilines",
      spark.createDataset(Seq.empty[(Long, String)]).toDF("doc_id", "text")
        .filter(lit(false)))
    val results = scala.collection.mutable.Map.empty[Long, (Long, Long, Long)]
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        Dedup.appendToLineIndex(spark, "ilines", batch).collect().foreach { r =>
          results(r.getLong(0)) = (r.getLong(1), r.getLong(2), r.getLong(3))
        }
        ()
      }
      .start()
    batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    q.stop()

    val expected = Dedup.lineDedup(allDocs.toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(results.toMap === expected)
    // and the loop genuinely dropped cross-batch repeats
    assert(results(3L)._2 === 2L) // license header + cookie banner both seen
    assert(results(5L)._1 === 1L) // only "epsilon five" is new
  }

  test("scrubPii: ordered redaction, no double counting, clean text untouched") {
    val rows = Seq(
      (1L, "mail bob.smith+spam@sub.example.co.uk now"),          // 1 email
      (2L, "server at 192.168.0.1 and 10.0.0.255 up"),            // 2 ips
      (3L, "call +1-555-0123 or +44 20 7946 0958 today"),         // 2 phones
      (4L, "admin@10.0.0.1.example.com hides an ip-like host"),   // email only
      (5L, "version 1.2.3 of lib, build 10.20.30.40.50 skipped"), // 1 ip (40.50? no: \b10.20.30.40\b then .50 — boundary)
      (6L, "nothing sensitive here at all")
    ).toDF("doc_id", "text")
    val out = Curation.scrubPii(rows).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_email"), r.getAs[Long]("n_ip"),
          r.getAs[Long]("n_phone"), r.getAs[String]("text_scrubbed")))).toMap

    // driver-side reference applying the same ordered Java regex passes
    val ref = Seq(1L, 2L, 3L, 4L, 5L, 6L).map { id =>
      val t0 = rows.collect().find(_.getLong(0) == id).get.getString(1)
      val (t3, cnts) = Curation.PiiPatterns
        .foldLeft((t0, List.empty[Long])) { case ((t, acc), (_, re, tok)) =>
          (t.replaceAll(re, tok), re.r.findAllIn(t).size.toLong :: acc)
        }
      val List(nPhone, nIp, nEmail) = cnts
      id -> ((nEmail, nIp, nPhone, t3))
    }.toMap
    assert(out === ref)

    // spot semantics: email rule wins over the ip-like host inside it
    assert(out(4L)._1 === 1L && out(4L)._2 === 0L)
    assert(out(4L)._4.contains("<EMAIL>"))
    assert(out(6L) === ((0L, 0L, 0L, "nothing sensitive here at all")))
    assert(out(3L)._3 === 2L)
  }

  test("sharedShingleCoverage matches a driver reference; short docs 0/0/0") {
    val corpus = Seq(
      (1L, "the cat sat on the mat quietly"),
      (2L, "a dog ran while the cat sat on a rug"),   // shares "the cat sat", "cat sat on"
      (3L, "entirely novel content with zero overlap here"),
      (4L, "too short"),                               // < 3 tokens → 0/0/0
      (5L, "the cat sat")                              // exactly one shingle, shared
    ).toDF("doc_id", "text")

    // driver reference on distinct shingles
    val docs = corpus.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def shingles(t: String) = t.toLowerCase.trim.split("\\s+").toSeq
      .sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet
    val all = docs.map { case (id, t) => id -> shingles(t) }
    val freq = all.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val ref = all.map { case (id, ss) =>
      val shared = ss.count(freq(_) > 1).toLong
      id -> ((ss.size.toLong, shared,
        if (ss.nonEmpty) shared * 1000000L / ss.size else 0L))
    }

    val got = TextAnalysis.sharedShingleCoverage(corpus).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === ref)
    assert(got(4L) === ((0L, 0L, 0L)))
    assert(got(5L) === ((1L, 1L, 1000000L)))
    assert(got(3L)._2 === 0L)
  }

  test("minhash LSH clusters near-dups together") {
    val out = Dedup.minHashLSH(docs, threshold = 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) === 1L); assert(out(2L) === 1L); assert(out(4L) === 1L)
    assert(out(3L) === 3L); assert(out(5L) === 5L)
  }

  test("simhash dedup: hamming(identical)=0, near-dups within 3 bits") {
    val out = Dedup.simHashDedup(docs, maxHamming = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) === 1L && out(4L) === 1L)  // identical text, hamming 0
    assert(out(3L) === 3L)
  }

  test("ngram jaccard dedup exact") {
    val out = Dedup.ngramJaccard(docs, threshold = 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) === 1L && out(2L) === 1L && out(4L) === 1L)
    assert(out(3L) === 3L && out(5L) === 5L)
  }

  test("embedding dedup via cosine") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.999f, 0.01f, 0.0f)),  // ~same direction as 1
      (3L, Array(0.0f, 1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = Dedup.embeddingDedup(vecs, threshold = 0.99)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) === 1L && out(2L) === 1L && out(3L) === 3L)
  }

  test("semDedup: within-cell greedy lowest-id pruning, brute-force verified") {
    val rnd = new scala.util.Random(7)
    val raw = (0L until 80L).map(i => (i, Array.fill(8)(rnd.nextGaussian())))
    val vecs = raw.toDF("vec_id", "embedding")
    val tau = 0.5
    val out = Dedup.semDedup(vecs, nlist = 5, threshold = tau, iters = 2,
      hashInit = false).collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // reference: same trainer/assignment via Ann, exact pair recheck driver-side
    val cents = Ann.trainCentroids(vecs, 5, 2, hashInit = false)
    val cells = Ann.assignCells(
      vecs.select($"vec_id".as("id"), $"embedding".cast("array<double>").as("v")),
      cents, "v").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val unit = raw.map { case (i, v) =>
      val n = math.sqrt(v.map(x => x * x).sum)
      i -> v.map(_ / n)
    }.toMap
    def cos(a: Long, b: Long): Double =
      unit(a).zip(unit(b)).map { case (x, y) => x * y }.sum
    val ids = raw.map(_._1)
    val expected = ids.filter(a =>
      !ids.exists(b => b < a && cells(b) == cells(a) && cos(a, b) >= tau)).toSet
    assert(expected.size < ids.size, "test vectors produced no prunable pair")
    assert(out.keySet === expected)
    out.foreach { case (id, cell) => assert(cell === cells(id)) }
    // degenerate thresholds: > 1 keeps everything; ≤ -1 keeps min id per cell
    assert(Dedup.semDedup(vecs, nlist = 5, threshold = 1.5, iters = 2,
      hashInit = false).count() === 80L)
    val mins = Dedup.semDedup(vecs, nlist = 5, threshold = -1.0, iters = 2,
      hashInit = false).collect().map(_.getLong(0)).toSet
    assert(mins === cells.groupBy(_._2).values.map(_.keys.min).toSet)
  }

  test("brute-force knn finds nearest by cosine") {
    val vecs = Seq(
      (1L, Array(1.0, 0.0)), (2L, Array(0.9, 0.1)),
      (3L, Array(0.0, 1.0)), (4L, Array(0.1, 0.9))
    ).toDF("vec_id", "embedding")
    val out = Ann.bruteForceKnn(vecs, vecs, 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) === 2L); assert(out(2L) === 1L)
    assert(out(3L) === 4L); assert(out(4L) === 3L)
  }

  test("ivf knn recalls the true neighbor on separated clusters") {
    val vecs = (0 until 40).map { i =>
      val base = if (i < 20) Array(10.0, 0.0) else Array(0.0, 10.0)
      (i.toLong, Array(base(0) + (i % 5) * 0.01, base(1) + (i % 7) * 0.01))
    }.toDF("vec_id", "embedding")
    val bf = Ann.bruteForceKnn(vecs, vecs, 1).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ivf = Ann.ivfKnn(vecs, vecs, 1, nlist = 4, nprobe = 2, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // same-cluster neighbors for every query
    ivf.foreach { case (q, n) => assert((q < 20) === (n < 20), s"query $q got $n") }
    assert(ivf.keySet === bf.keySet)
  }

  test("incremental IVF: persisted index + delta ≡ one-pass frozen-centroid index") {
    val vecs = (0 until 60).map { i =>
      val base = if (i % 2 == 0) Array(10.0, 0.0) else Array(0.0, 10.0)
      (i.toLong, Array(base(0) + (i % 5) * 0.01, base(1) + (i % 7) * 0.01))
    }.toDF("vec_id", "embedding")
    val baseSlice = vecs.filter($"vec_id" % 3 =!= 0)
    val delta = vecs.filter($"vec_id" % 3 === 0)
    // build TWICE: saveIvfIndex must be idempotent (crash-retry ingest loop)
    Ann.saveIvfIndex(baseSlice, "iivf", nlist = 4, iters = 2, hashInit = false,
      buckets = 4)
    Ann.saveIvfIndex(baseSlice, "iivf", nlist = 4, iters = 2, hashInit = false,
      buckets = 4)
    Ann.appendToIvfIndex(spark, "iivf", delta)
    // the appended index content must equal assigning base ∪ delta against
    // the SAME frozen centroids in one pass (search equivalence follows:
    // ivfKnnIndexed is a deterministic function of the cells table)
    val centroids = spark.table("iivf_centroids")
    val all = vecs.select($"vec_id".as("id"),
      $"embedding".cast("array<double>").as("cv"))
    val oneShot = Ann.assignCells(all.select($"id", $"cv".as("v")), centroids, "v")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val persisted = spark.table("iivf_cells")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(persisted === oneShot)
    // and the search path over the maintained index answers every query
    // with same-cluster neighbors (even ids cluster apart from odd ids)
    val knn = Ann.ivfKnnIndexed(spark, "iivf", vecs, 1, nprobe = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(knn.keySet === (0L until 60L).toSet)
    knn.foreach { case (q, n) =>
      assert(q % 2 === n % 2, s"query $q crossed clusters to $n") }
  }

  test("appendToIvfIndex fails fast when the index does not exist") {
    val delta = Seq((1L, Array(1.0, 0.0))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Ann.appendToIvfIndex(spark, "no_such_ivf", delta)
    }
    assert(e.getMessage.contains("no such index"))
  }

  test("incremental IVF-PQ: appended index ≡ one-pass frozen assign+encode") {
    val rnd = new scala.util.Random(13)
    val base8 = Seq(Array.fill(8)(0.0), Array.fill(8)(10.0))
    val vecs = (0 until 60).map { i =>
      (i.toLong, base8(i % 2).map(_ + rnd.nextGaussian() * 0.3).toSeq)
    }.toDF("vec_id", "embedding")
    val baseSlice = vecs.filter($"vec_id" % 3 =!= 0)
    val delta = vecs.filter($"vec_id" % 3 === 0)
    Ann.saveIvfPqIndex(baseSlice, "iivfpq", nlist = 4, m = 2, ncodes = 4,
      iters = 2, hashInit = false, buckets = 4)
    Ann.saveIvfPqIndex(baseSlice, "iivfpq", nlist = 4, m = 2, ncodes = 4,
      iters = 2, hashInit = false, buckets = 4) // idempotent rebuild
    Ann.appendToIvfPqIndex(spark, "iivfpq", delta)
    // persisted rows ≡ assigning + encoding EVERYTHING against the frozen
    // quantizer/codebook in one pass
    def rowKey(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))
    val persisted = spark.table("iivfpq_cells")
      .select($"nbr_id", $"cell", $"_c0", $"_c1")
      .collect().map(rowKey).toSet
    val centroids = spark.table("iivfpq_centroids")
    val codebook = spark.table("iivfpq_codebook")
    val cells = Ann.assignCells(
      vecs.select($"vec_id".as("id"), $"embedding".cast("array<double>").as("v")),
      centroids, "v").toDF("nbr_id", "cell")
    val codes = Ann.pqEncode(vecs, codebook, m = 2)
      .groupBy($"id".as("nbr_id"))
      .agg(max(when($"subspace" === 0, $"code")).as("_c0"),
        max(when($"subspace" === 1, $"code")).as("_c1"))
    val oneShot = cells.join(codes, Seq("nbr_id"))
      .select($"nbr_id", $"cell", $"_c0", $"_c1")
      .collect().map(rowKey).toSet
    assert(persisted === oneShot)
    // the maintained-index search stays within clusters (even vs odd ids)
    val knn = Ann.ivfPqKnnIndexed(spark, "iivfpq", vecs, 1, nprobe = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(knn.keySet === (0L until 60L).toSet)
    knn.foreach { case (q, n) =>
      assert(q % 2 === n % 2, s"query $q crossed clusters to $n") }
  }

  test("incremental semDedup: index + delta survivors ≡ frozen-centroid one-pass") {
    val vecs = (0 until 60).map { i =>
      val base = if (i % 2 == 0) Array(10.0, 0.0) else Array(0.0, 10.0)
      (i.toLong, Array(base(0) + (i % 5) * 0.01, base(1) + (i % 7) * 0.01))
    }.toDF("vec_id", "embedding")
    val baseSlice = vecs.filter($"vec_id" % 3 =!= 0)
    val delta = vecs.filter($"vec_id" % 3 === 0)
    val tau = 0.999
    // build TWICE: crash-retry idempotence, like the LSH/IVF indexes
    Dedup.saveSemDedupIndex(baseSlice, "isemspec", nlist = 4, threshold = tau,
      iters = 2, hashInit = false, buckets = 4)
    Dedup.saveSemDedupIndex(baseSlice, "isemspec", nlist = 4, threshold = tau,
      iters = 2, hashInit = false, buckets = 4)
    Dedup.appendToSemDedupIndex(spark, "isemspec", delta)
    val got = Dedup.semDedupSurvivors(spark, "isemspec")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // reference: greedy rule over ALL vectors assigned against the SAME
    // frozen (base-trained) centroids, rechecked driver-side
    val centroids = spark.table("isemspec_centroids")
    val cells = Ann.assignCells(
      vecs.select($"vec_id".as("id"), $"embedding".cast("array<double>").as("v")),
      centroids, "v").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val raw = vecs.select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val unit = raw.map { case (i, v) =>
      val n = math.sqrt(v.map(x => x * x).sum); i -> v.map(_ / n)
    }
    def cos(a: Long, b: Long): Double =
      unit(a).zip(unit(b)).map { case (x, y) => x * y }.sum
    val ids = raw.keys.toSeq.sorted
    val expected = ids.filter(a =>
      !ids.exists(b => b < a && cells(b) == cells(a) && cos(a, b) >= tau)).toSet
    assert(expected.size < ids.size, "fixture produced no prunable pair")
    assert(got.keySet === expected)
    got.foreach { case (id, cell) => assert(cell === cells(id)) }
    // fail fast when the index does not exist
    intercept[IllegalArgumentException] {
      Dedup.appendToSemDedupIndex(spark, "no_such_sem_index", delta)
    }
  }

  test("semDedup survivors: cells self-join runs without any exchange") {
    // both sides of the within-cell pair join ARE the cells table, bucketed
    // by cell — the 100 TB corpus joins against itself with no reshuffle
    if (!spark.catalog.tableExists("isemspec_cells")) {
      // self-sufficiency for isolated (-z) runs: rebuild the incremental
      // test's fixture index; a full-suite run reuses the existing one
      val vecs = (0 until 60).map { i =>
        val base = if (i % 2 == 0) Array(10.0, 0.0) else Array(0.0, 10.0)
        (i.toLong, Array(base(0) + (i % 5) * 0.01, base(1) + (i % 7) * 0.01))
      }.toDF("vec_id", "embedding")
      Dedup.saveSemDedupIndex(vecs.filter($"vec_id" % 3 =!= 0), "isemspec",
        nlist = 4, threshold = 0.999, iters = 2, hashInit = false, buckets = 4)
    }
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val cells = spark.table("isemspec_cells")
      val j = cells.toDF("a", "cell", "uA")
        .join(cells.toDF("b", "cell", "uB"), Seq("cell"))
        .filter(col("b") < col("a"))
      val plan = j.queryExecution.executedPlan.toString
      val exchanges = "Exchange".r.findAllIn(plan).length
      assert(exchanges === 0, s"expected no exchange, got:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("IVF index search: base side pre-partitioned, no exchange") {
    // probe join on `cell`: the persisted side is bucketed by cell, so with
    // broadcast off the ONLY exchange is the (small) routed-query side —
    // the 100 TB cells table never reshuffles at search time
    val probes = Seq((900L, 0, Array(10.0, 0.0)), (901L, 1, Array(0.0, 10.0)))
      .toDF("query_id", "cell", "qv")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = probes.join(spark.table("iivf_cells"), Seq("cell"))
      val plan = j.queryExecution.executedPlan.toString
      val exchanges = "Exchange".r.findAllIn(plan).length
      assert(exchanges === 1, s"expected probe-side-only exchange, got:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("streaming ingest loop: foreachBatch vector deltas fold into the IVF index") {
    // embeddings analog of the LSH foreachBatch composition: micro-batch
    // deltas append to the persisted index; the maintained cells table
    // stays ≡ one-pass frozen-centroid assignment over everything seen
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mk = (i: Int) => {
      val base = if (i % 2 == 0) Array(10.0, 0.0) else Array(0.0, 10.0)
      (i.toLong, Array(base(0) + (i % 5) * 0.01, base(1) + (i % 7) * 0.01))
    }
    val baseSlice = (0 until 30).map(mk).toDF("vec_id", "embedding")
    Ann.saveIvfIndex(baseSlice, "sivf", nlist = 4, iters = 2,
      hashInit = false, buckets = 4)
    val input = MemoryStream[(Long, Array[Double])]
    val q = input.toDF().toDF("vec_id", "embedding").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        Ann.appendToIvfIndex(spark, "sivf", batch)
        ()
      }
      .start()
    input.addData((30 until 45).map(mk): _*)
    q.processAllAvailable()
    input.addData((45 until 60).map(mk): _*)
    q.processAllAvailable()
    q.stop()
    val centroids = spark.table("sivf_centroids")
    val all = (0 until 60).map(mk).toDF("vec_id", "embedding")
      .select($"vec_id".as("id"), $"embedding".cast("array<double>").as("v"))
    val oneShot = Ann.assignCells(all, centroids, "v")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val persisted = spark.table("sivf_cells")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(persisted === oneShot)
  }

  test("streaming ingest loop: foreachBatch deltas fold into the semDedup index") {
    // fourth stream-driven maintenance loop (LSH / IVF / IVF-PQ / semDedup):
    // survivors over the maintained cells table stay ≡ one-pass semDedup
    // with the frozen base-trained centroids after every micro-batch
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mk = (i: Int) => {
      val base = if (i % 2 == 0) Array(10.0, 0.0) else Array(0.0, 10.0)
      (i.toLong, Array(base(0) + (i % 5) * 0.01, base(1) + (i % 7) * 0.01))
    }
    val tau = 0.999
    Dedup.saveSemDedupIndex((0 until 30).map(mk).toDF("vec_id", "embedding"),
      "ssem", nlist = 4, threshold = tau, iters = 2, hashInit = false, buckets = 4)
    val input = MemoryStream[(Long, Array[Double])]
    val q = input.toDF().toDF("vec_id", "embedding").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        Dedup.appendToSemDedupIndex(spark, "ssem", batch)
        ()
      }
      .start()
    input.addData((30 until 45).map(mk): _*)
    q.processAllAvailable()
    input.addData((45 until 60).map(mk): _*)
    q.processAllAvailable()
    q.stop()
    val got = Dedup.semDedupSurvivors(spark, "ssem")
      .collect().map(_.getLong(0)).toSet
    // reference: batch semDedup semantics with the SAME frozen centroids
    val centroids = spark.table("ssem_centroids")
    val cells = Ann.assignCells(
      (0 until 60).map(mk).toDF("vec_id", "embedding")
        .select($"vec_id".as("id"), $"embedding".cast("array<double>").as("v")),
      centroids, "v").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val unit = (0 until 60).map(mk).map { case (i, v) =>
      val n = math.sqrt(v.map(x => x * x).sum); i -> v.map(_ / n)
    }.toMap
    def cos(a: Long, b: Long): Double =
      unit(a).zip(unit(b)).map { case (x, y) => x * y }.sum
    val ids = (0L until 60L).toSeq
    val expected = ids.filter(a =>
      !ids.exists(b => b < a && cells(b) == cells(a) && cos(a, b) >= tau)).toSet
    assert(expected.size < 60, "fixture produced no prunable pair")
    assert(got === expected)
  }

  test("streaming ingest loop: foreachBatch vector deltas fold into the IVF-PQ index") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rnd = new scala.util.Random(17)
    val base8 = Seq(Array.fill(8)(0.0), Array.fill(8)(10.0))
    val mk = (i: Int) =>
      (i.toLong, base8(i % 2).map(_ + rnd.nextGaussian() * 0.3).toSeq)
    val all = (0 until 60).map(mk)
    Ann.saveIvfPqIndex(all.take(30).toDF("vec_id", "embedding"), "sivfpq",
      nlist = 4, m = 2, ncodes = 4, iters = 2, hashInit = false, buckets = 4)
    val input = MemoryStream[(Long, Seq[Double])]
    val q = input.toDF().toDF("vec_id", "embedding").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        Ann.appendToIvfPqIndex(spark, "sivfpq", batch)
        ()
      }
      .start()
    input.addData(all.slice(30, 45): _*)
    q.processAllAvailable()
    input.addData(all.slice(45, 60): _*)
    q.processAllAvailable()
    q.stop()
    // maintained cells table ≡ one-pass frozen assign+encode over all seen
    val centroids = spark.table("sivfpq_centroids")
    val codebook = spark.table("sivfpq_codebook")
    val vecs = all.toDF("vec_id", "embedding")
    val cells = Ann.assignCells(
      vecs.select($"vec_id".as("id"), $"embedding".cast("array<double>").as("v")),
      centroids, "v").toDF("nbr_id", "cell")
    val codes = Ann.pqEncode(vecs, codebook, m = 2)
      .groupBy($"id".as("nbr_id"))
      .agg(max(when($"subspace" === 0, $"code")).as("_c0"),
        max(when($"subspace" === 1, $"code")).as("_c1"))
    def rowKey(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))
    val oneShot = cells.join(codes, Seq("nbr_id"))
      .select($"nbr_id", $"cell", $"_c0", $"_c1").collect().map(rowKey).toSet
    val persisted = spark.table("sivfpq_cells")
      .select($"nbr_id", $"cell", $"_c0", $"_c1").collect().map(rowKey).toSet
    assert(persisted === oneShot)
  }

  test("pq knn: ADC finds same-cluster neighbors on separated clusters") {
    val rnd = new scala.util.Random(3)
    val base = Seq(
      Array.fill(8)(0.0), Array.fill(8)(10.0),
      Array.tabulate(8)(i => if (i % 2 == 0) 10.0 else -10.0))
    val vecs = (0 until 60).map { i =>
      (i.toLong, base(i % 3).map(_ + rnd.nextGaussian() * 0.3).toSeq)
    }.toDF("vec_id", "embedding")
    val pq = Ann.pqKnn(vecs, vecs, 1, m = 2, ncodes = 4, iters = 3).collect()
    assert(pq.length === 60)
    pq.foreach { r =>
      assert(r.getLong(0) % 3 === r.getLong(1) % 3,
        s"query ${r.getLong(0)} got cross-cluster ${r.getLong(1)}")
    }
  }

  test("pqEncode: m codes per vector, codes within range, deterministic") {
    val vecs = (0 until 30).map(i => (i.toLong, Seq.tabulate(8)(d => (i % 5) + d * 0.1)))
      .toDF("vec_id", "embedding")
    val cb = Ann.pqTrainCodebook(vecs, m = 4, ncodes = 3, iters = 2)
    val codes = Ann.pqEncode(vecs, cb, m = 4).collect()
    assert(codes.length === 30 * 4)
    assert(codes.forall(r => r.getInt(2) >= 0 && r.getInt(2) < 3))
    val again = Ann.pqEncode(vecs, cb, m = 4).collect()
    assert(codes.map(_.toSeq).toSet === again.map(_.toSeq).toSet)
  }

  test("ivfPq with nprobe = nlist reproduces pure PQ ranks") {
    val vecs = (0 until 40).map { i =>
      val b = if (i < 20) 0.0 else 10.0
      (i.toLong, Seq.tabulate(8)(d => b + (i % 7) * 0.05 + d * 0.01))
    }.toDF("vec_id", "embedding")
    val pq = Ann.pqKnn(vecs, vecs, 2, m = 2, ncodes = 4, iters = 2, hashInit = false)
      .collect().map(r => (r.getLong(0), r.getInt(2)) -> r.getLong(1)).toMap
    val ivfpq = Ann.ivfPqKnn(vecs, vecs, 2, nlist = 4, nprobe = 4,
        m = 2, ncodes = 4, iters = 2, hashInit = false)
      .collect().map(r => (r.getLong(0), r.getInt(2)) -> r.getLong(1)).toMap
    assert(ivfpq === pq)
  }

  test("token counts and quality features") {
    val out = TextAnalysis.qualityScore(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("n_tokens")).toMap
    assert(out(1L) === 14)
    val q = TextAnalysis.qualityScore(docs).filter(col("doc_id") === 1).select("quality").head().getDouble(0)
    assert(q > 0.5 && q <= 1.0)
    val sw = docs.select(TextAnalysis.subwordCount(col("text"))).head().getInt(0)
    assert(sw === 14) // no punctuation/digits → same as whitespace tokens
  }

  test("langId votes by stopword profile") {
    val out = TextAnalysis.langId(docs).select(col("doc_id"), col("lang_pred")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "en")
    assert(out(5L) === "de")
  }

  test("fingerprints: exact stable, robust survives small edits") {
    val fp = docs.select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) === fp(4L))
    assert(fp(1L) !== fp(3L))
    val rfp = docs.select(col("doc_id"), TextAnalysis.robustFingerprints(col("text")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val overlap = rfp(1L).toSet.intersect(rfp(2L).toSet).size
    assert(overlap >= 8, s"robust fingerprints should mostly survive a one-word edit, got $overlap")
  }

  test("multimodal: REAL JDK decode — PNG image features + WAV frame RMS") {
    val media = Multimodal.synthesize(spark, 30)
    // image: ImageIO decode of real PNGs — dims must match the encoded ones
    val img = Multimodal.imageFeatures(media).collect()
    assert(img.length === 10)
    assert(img.forall { f =>
      f.width === 64 + (f.id % 64).toInt && f.height === 48 + (f.id % 16).toInt })
    assert(img.forall(f => f.meanLuma > 0.0 && f.meanLuma < 1.0))
    // the test pattern varies per id → per-image average hashes differ
    assert(img.map(_.phash).distinct.length > 1)
    // decode is deterministic: same bytes → same features
    val img2 = Multimodal.imageFeatures(media).collect()
    assert(img.sortBy(_.id).toSeq === img2.sortBy(_.id).toSeq)
    // audio: real WAV decode — frame count = ceil(duration / hop), RMS of a
    // full-scale/2 sine ≈ 1/(2√2) ≈ 0.354
    val frames = Multimodal.audioFrames(media, hopMs = 500L).collect()
    assert(frames.nonEmpty)
    val byId = frames.groupBy(_.id)
    assert(byId.forall { case (id, fs) =>
      val dur = 300L + (id % 5) * 200L
      fs.length === math.ceil(dur / 500.0).toInt })
    assert(frames.forall(f => math.abs(f.rms - 0.3535) < 0.05))
    // corrupt payloads are dropped, not failed
    import spark.implicits._
    val junk = Seq(Multimodal.MediaRecord(99L, Array[Byte](1, 2, 3),
      Multimodal.MediaMeta("image", "png", 8, 8, 0, 0L))).toDS()
    assert(Multimodal.imageFeatures(junk).collect().isEmpty)
    // resize plan (pure Catalyst) and video frame-sample plan (metadata only)
    val plan = Multimodal.resizePlan(media.toDF(), maxSide = 512)
    val r = plan.filter(col("meta.mediaType") === "image").select("target_width", "target_height").collect()
    assert(r.forall(row => row.getInt(0) <= 512 && row.getInt(1) <= 512))
    val fsp = Multimodal.frameSamplePlan(media.toDF(), hopMs = 1000L).collect()
    assert(fsp.nonEmpty)
    assert(fsp.forall(row => row.getLong(2) % 1000L === 0L))
  }

  test("multimodal: DCT pHash survives perturbation; nearDupImages clusters variants") {
    import spark.implicits._
    import java.io.ByteArrayOutputStream
    // perturbations of a real PNG: single-pixel change and brightness scale
    def perturb(payload: Array[Byte], dim: Double, poke: Boolean): Array[Byte] = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      val out = new java.awt.image.BufferedImage(
        img.getWidth, img.getHeight, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
        val rgb = img.getRGB(x, y)
        def s(c: Int) = math.min(255, (c * dim).toInt)
        out.setRGB(x, y, (s((rgb >> 16) & 0xFF) << 16) |
          (s((rgb >> 8) & 0xFF) << 8) | s(rgb & 0xFF))
      }
      if (poke) out.setRGB(3, 3, 0xFFFFFF)
      val bos = new ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      bos.toByteArray
    }
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val origs = (0 until 4).map { i =>
      (i * 10L, Multimodal.Codecs.encodePng(i * 997L + 3, 64, 48))
    }
    val variants = origs.flatMap { case (id, p) =>
      Seq((id, p),
        (id + 1, perturb(p, 1.0, poke = true)),   // one-pixel poke
        (id + 2, perturb(p, 0.8, poke = false)))  // brightness scale
    }
    val hashes = variants.map { case (id, p) =>
      id -> Multimodal.Codecs.dctPHash(p).get
    }.toMap
    origs.foreach { case (id, _) =>
      assert(hamming(hashes(id), hashes(id + 1)) <= 6, s"poke drifted too far for $id")
      assert(hamming(hashes(id), hashes(id + 2)) <= 6, s"brightness drifted too far for $id")
    }
    // distinct patterns are far apart
    for (a <- origs; b <- origs if a._1 < b._1)
      assert(hamming(hashes(a._1), hashes(b._1)) > 6,
        s"patterns ${a._1}/${b._1} collide")
    val media = variants.map { case (id, p) =>
      Multimodal.MediaRecord(id, p, Multimodal.MediaMeta("image", "png", 64, 48, 0, 0L))
    }.toDS()
    val clusters = Multimodal.nearDupImages(media, maxHamming = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    origs.foreach { case (id, _) =>
      assert(clusters(id + 1) === clusters(id) && clusters(id + 2) === clusters(id),
        s"variants of $id not clustered")
    }
    assert(clusters.values.toSet.size === 4)
  }

  test("multimodal: pHash survives JPEG re-encode + bilinear resample; " +
       "nearDupImages clusters re-encoded variants end-to-end") {
    import spark.implicits._
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    // the robustness property pHash exists for: the BYTES change completely
    // (different codec, different dimensions), the perceptual hash must not
    def decode(p: Array[Byte]): BufferedImage =
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p))
    def resample(img: BufferedImage, w: Int, h: Int): Array[Byte] = {
      val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, w, h, null)
      g.dispose()
      val bos = new ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      bos.toByteArray
    }
    def jpeg(img: BufferedImage, quality: Float): Array[Byte] = {
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
      val p = writer.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(quality)
      val bos = new ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
      ios.close(); writer.dispose()
      bos.toByteArray
    }
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    // natural-image-like fixtures: random COARSE grids bilinearly upsampled
    // (broad low-frequency spectrum — every DCT coefficient pHash reads
    // carries O(1) independent energy, so threshold bits are decisive, the
    // way they are on photographs). encodePng's wraparound sawtooth ramps
    // alias pathologically under an exact 0.5× resample, and pure
    // sinusoids leave all but two coefficients AT the threshold (measured:
    // 18- and 22-bit drifts respectively) — both artifacts of adversarial
    // spectra, not of the transform family pHash is built for.
    def blobPng(seed: Long, w: Int, h: Int): Array[Byte] = {
      val rnd = new scala.util.Random(seed)
      val coarse = new BufferedImage(8, 6, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 6; x <- 0 until 8) {
        val l = rnd.nextInt(256)
        coarse.setRGB(x, y, (l << 16) | (l << 8) | l)
      }
      resample(coarse, w, h)
    }
    val origs = (0 until 4).map(i => (i * 10L, blobPng(i * 7919L + 11, 64, 48)))
    val variants = origs.flatMap { case (id, p) =>
      val img = decode(p)
      Seq((id, p, "png"),
        (id + 1, jpeg(img, 0.7f), "jpeg"),          // lossy re-encode
        (id + 2, resample(img, 32, 24), "png"),      // downsample 0.5×
        (id + 3, resample(img, 96, 72), "png"))      // upsample 1.5×
    }
    val hashes = variants.map { case (id, p, _) =>
      id -> Multimodal.Codecs.dctPHash(p).get
    }.toMap
    // measured Hamming distributions (recorded in NOTES): variants must sit
    // within the default budget, distinct patterns well outside it
    val kinds = Seq("jpeg", "down", "up")
    val within = origs.flatMap { case (id, _) =>
      (1 to 3).map(d => hamming(hashes(id), hashes(id + d)))
    }
    val across = for (a <- origs; b <- origs if a._1 < b._1)
      yield hamming(hashes(a._1), hashes(b._1))
    kinds.zipWithIndex.foreach { case (kind, i) =>
      val ds = origs.map { case (id, _) => hamming(hashes(id), hashes(id + i + 1)) }
      info(s"$kind Hamming per base: ${ds.mkString(",")}")
    }
    info(s"variant Hamming: min=${within.min} max=${within.max} " +
      s"dist=${within.sorted.mkString(",")}")
    info(s"cross-pattern Hamming: min=${across.min} max=${across.max}")
    assert(within.max <= 6, s"re-encode drifted past budget: $within")
    assert(across.min > 6, s"distinct patterns collide: $across")
    val media = variants.map { case (id, p, fmt) =>
      val img = decode(p)
      Multimodal.MediaRecord(id, p,
        Multimodal.MediaMeta("image", fmt, img.getWidth, img.getHeight, 0, 0L))
    }.toDS()
    val clusters = Multimodal.nearDupImages(media, maxHamming = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    origs.foreach { case (id, _) =>
      (1 to 3).foreach(d => assert(clusters(id + d) === clusters(id),
        s"variant ${id + d} split from $id"))
    }
    assert(clusters.values.toSet.size === 4)
  }

  test("phashClusters on synthetic hashes: Hamming-3/5 variants cluster " +
       "with their base (5↔3 only TRANSITIVELY, at Hamming 8), the 16-bit " +
       "variant stays a singleton — the mm_phash_dups gate's geometry") {
    import spark.implicits._
    val m1 = 66561L          // bits {0,10,16} — Hamming 3 from base
    val m2 = 2201172838402L  // bits {1,11,21,31,41} — Hamming 5
    val m3 = 1431655765L     // 16 alternating bits — beyond the budget
    assert(java.lang.Long.bitCount(m1) === 3 && java.lang.Long.bitCount(m2) === 5
      && java.lang.Long.bitCount(m3) === 16)
    assert(java.lang.Long.bitCount(m1 ^ m2) === 8) // the transitive-only pair
    val hashes = (0L until 40L).map { id =>
      val base = graft.functions.Poly64.mix(id / 4)
      val mask = (id % 4) match {
        case 1 => m1; case 2 => m2; case 3 => m3; case _ => 0L
      }
      (id, base ^ mask)
    }.toDF("id", "phash64")
    val rep = Multimodal.phashClusters(hashes, maxHamming = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 40L by 4).foreach { g =>
      assert(rep(g) === g && rep(g + 1) === g && rep(g + 2) === g,
        s"group $g: base/+3/+5 must share the base rep")
      assert(rep(g + 3) === g + 3, s"group $g: the 16-bit variant clustered")
    }
  }

  test("multimodal: Goertzel fingerprints are amplitude- and noise-invariant") {
    import spark.implicits._
    // same tone at different amplitudes + additive noise → same fingerprint;
    // different tones → different fingerprints
    def tone(freq: Double, durMs: Long, amp: Double, noiseSeed: Int): Array[Byte] = {
      val sr = 8000
      val n = (sr * durMs / 1000L).toInt
      val rnd = new scala.util.Random(noiseSeed)
      val pcm = new Array[Byte](n * 2)
      for (i <- 0 until n) {
        val noise = if (noiseSeed == 0) 0.0 else (rnd.nextDouble() - 0.5) * 0.1
        val v = ((math.sin(2 * math.Pi * freq * i / sr) * amp + noise) * 16384)
          .max(-32768).min(32767).toShort
        pcm(2 * i) = (v & 0xFF).toByte
        pcm(2 * i + 1) = ((v >> 8) & 0xFF).toByte
      }
      val fmt = new javax.sound.sampled.AudioFormat(sr.toFloat, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val bands = (0 until 10).map(i => 220.0 + i * 110.0)
    val clean = Multimodal.Codecs.audioFingerprint(tone(440.0, 600, 0.9, 0), 250, bands)
    val quiet = Multimodal.Codecs.audioFingerprint(tone(440.0, 600, 0.2, 0), 250, bands)
    val noisy = Multimodal.Codecs.audioFingerprint(tone(440.0, 600, 0.9, 7), 250, bands)
    val other = Multimodal.Codecs.audioFingerprint(tone(880.0, 600, 0.9, 0), 250, bands)
    assert(clean.nonEmpty && clean.forall(_ === 2)) // 440 Hz = band index 2
    assert(quiet === clean && noisy === clean)
    assert(other != clean)
    assert(other.forall(_ === 6)) // 880 Hz = band index 6
    // operator end-to-end: variants group together, distinct tones apart
    val media = Seq(
      Multimodal.MediaRecord(0L, tone(440.0, 600, 0.9, 0), Multimodal.MediaMeta("audio", "wav", 0, 0, 8000, 600L)),
      Multimodal.MediaRecord(1L, tone(440.0, 600, 0.3, 3), Multimodal.MediaMeta("audio", "wav", 0, 0, 8000, 600L)),
      Multimodal.MediaRecord(2L, tone(660.0, 600, 0.9, 0), Multimodal.MediaMeta("audio", "wav", 0, 0, 8000, 600L))
    ).toDS()
    val groups = Multimodal.nearDupAudio(media, hopMs = 250L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(groups(0L) === 0L && groups(1L) === 0L && groups(2L) === 2L)
  }

  test("ShingleExpression matches the declarative HOF formulation") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a b", "a", "", "   ", "x x x x x", "one two three",
      "repeat repeat repeat repeat", "tab\tsep  double  space",
      "ä ö ü ß unicode tokens here")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      .select(col("id"), Dedup.normTokens(col("text")).as("toks"))
    for (n <- Seq(1, 2, 3, 5)) {
      val fast = df.select(col("id"), Dedup.shinglesFromTokens(col("toks"), n).as("sh"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      val ref = df.select(col("id"), Dedup.shinglesFromTokensHof(col("toks"), n).as("sh"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      assert(fast === ref, s"n=$n")
    }
  }

  test("subwordCount matches a reference tokenizer on edge cases") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // brute-force reference: split before ws runs, before every punct char,
    // and at letter<->digit transitions; count non-empty segments
    def ref(t: String): Int = {
      if (t == null) return 0
      val starts = t.zipWithIndex.count { case (c, i) =>
        if (c.isWhitespace) false
        else {
          val isAln = c.isLetter && c <= 'z' && (c.isUpper || c.isLower) && c < 128 || c.isDigit
          val alpha = (ch: Char) => ch < 128 && ((ch >= 'a' && ch <= 'z') || (ch >= 'A' && ch <= 'Z'))
          val digit = (ch: Char) => ch >= '0' && ch <= '9'
          val punct = (ch: Char) => !alpha(ch) && !digit(ch) && !ch.isWhitespace
          if (i == 0) true
          else {
            val p = t(i - 1)
            p.isWhitespace || punct(c) ||
              (alpha(p) && digit(c)) || (digit(p) && alpha(c))
          }
        }
      }
      starts
    }
    val cases = Seq("a!!b", "!a", "a 1b2", "ab12cd", "1a2b", "  x  ", "",
      "a.b,c", "x!@#y", "tab\tmix3d 4u", "è strano, no?", "a1a1a", "...")
    val df = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val got = df.select(col("id"), TextAnalysis.subwordCount(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    cases.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) === ref(t), s"case '$t'")
    }
  }

  test("tfIdfTop picks the most distinctive term per doc") {
    // 3 docs; "apple" only in doc 1, "the" in all → "apple" must win doc 1
    val d = Seq(
      (1L, "the apple the the"),
      (2L, "the pear banana"),
      (3L, "the pear pear")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.tfIdfTop(d).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) === (("apple", 1L, 1L)))
    assert(out(2L) === (("banana", 1L, 1L)))       // banana df=1 beats pear df=2
    assert(out(3L) === (("pear", 2L, 2L)))         // tf=2 · ln(3/2) > 1 · ln(3/2)
    // rounded-score tie broken by term asc: doc 2 "banana" < any same-score term
    val scores = TextAnalysis.tfIdfTop(d).collect().map(_.getDouble(4))
    assert(scores.forall(s => s > 0.0 && s == math.rint(s * 1e6) / 1e6))
  }

  test("repetition ratios: distinct text scores 0, repeated text scores high") {
    val d = Seq(
      (1L, "a b c d e f"),                    // all distinct
      (2L, "x y x y x y x y"),                // heavy 1/2-gram repetition
      (3L, "w")                               // too short for any n-gram
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetition(d)
      .select("doc_id", "dup_token_ratio", "dup_2gram_ratio", "dup_3gram_ratio")
      .collect()
      .map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(out(1L) === ((0.0, 0.0, 0.0)))
    // doc 2: 8 tokens 2 distinct → 0.75; 7 bigrams 2 distinct → 5/7; 6 trigrams 2 distinct → 4/6
    assert(out(2L)._1 === 0.75)
    assert(math.abs(out(2L)._2 - 5.0 / 7.0) < 1e-6)
    assert(math.abs(out(2L)._3 - 4.0 / 6.0) < 1e-6)
    assert(out(3L) === ((0.0, 0.0, 0.0)))
  }

  test("streaming dedup drops cross-batch duplicates, first seen wins") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("doc_id", "text")
    val q = Dedup.streamingExact(stream).writeStream
      .outputMode("append").format("memory").queryName("sdedup").start()
    input.addData((1L, "alpha beta gamma"), (2L, "delta epsilon"))
    q.processAllAvailable()
    // batch 2: doc 3 duplicates doc 1 modulo whitespace/case; doc 4 is new
    input.addData((3L, "  Alpha   BETA gamma "), (4L, "zeta eta"))
    q.processAllAvailable()
    val got = spark.table("sdedup").collect().map(_.getLong(0)).toSet
    q.stop()
    assert(got === Set(1L, 2L, 4L))
  }

  test("streamingExact ≡ firstSeen batch analog under id arrival order") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (1L, "alpha beta gamma", "s0"), (2L, "delta epsilon", "s1"),
      (3L, "  Alpha   BETA gamma ", "s0"), (4L, "zeta eta", "s2"),
      (5L, "delta epsilon", "s1"), (6L, "theta iota kappa", "s0"),
      (7L, "ZETA   eta", "s2"))
    val input = MemoryStream[(Long, String, String)]
    val stream = input.toDF().toDF("doc_id", "text", "source")
    val q = Dedup.streamingExact(stream).writeStream
      .outputMode("append").format("memory").queryName("sfseen").start()
    // one micro-batch per doc: arrival order IS id order, so the streaming
    // survivor per fingerprint is exactly the min-id row
    docs.foreach { d => input.addData(d); q.processAllAvailable() }
    val got = spark.table("sfseen").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    q.stop()
    val batch = Dedup.firstSeen(docs.toDF("doc_id", "text", "source"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got === batch)
    assert(got.map(_._1) === Set(1L, 2L, 4L, 6L))
  }

  test("streaming simhash dedup drops near-identical rewrites") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("doc_id", "text")
    val q = Dedup.streamingSimHash(stream).writeStream
      .outputMode("append").format("memory").queryName("shdedup").start()
    input.addData((1L, "the quick brown fox jumps"))
    q.processAllAvailable()
    // same token multiset → identical SimHash → dropped; distinct doc kept
    input.addData((2L, "THE  QUICK brown fox JUMPS"),
      (3L, "completely different content here"))
    q.processAllAvailable()
    val got = spark.table("shdedup").collect().map(_.getLong(0)).toSet
    q.stop()
    assert(got === Set(1L, 3L))
  }

  test("incremental LSH: persisted index + delta ≡ full recompute") {
    // near-dup pairs CROSSING the base/delta split, inside base, inside
    // delta, plus singletons on both sides — every merge case at once
    val base = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank yesterday"),
      (3L, "completely different content about database engines and query planning"),
      (4L, "short doc"),
      (5L, "another unique text on spark catalyst optimizer internals and codegen")
    ).toDF("doc_id", "text")
    val delta = Seq(
      (11L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (12L, "completely different content about database engines and query optimization"),
      (13L, "delta only near dup one of a matching pair inside the delta batch"),
      (14L, "delta only near dup one of a matching pair inside the delta batch too"),
      (15L, "fully singleton delta document with nothing in common")
    ).toDF("doc_id", "text")
    // build TWICE: saveLshIndex must be idempotent — a rerun (crash-retry
    // ingest loop, or a fresh in-memory catalog meeting an orphaned
    // spark-warehouse dir from a previous JVM) replaces the index in place
    Dedup.saveLshIndex(base, "ilsh", threshold = 0.4, buckets = 4)
    Dedup.saveLshIndex(base, "ilsh", threshold = 0.4, buckets = 4)
    val inc = Dedup.incrementalMinHashLSH(spark, "ilsh", delta, threshold = 0.4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    val full = Dedup.minHashLSH(base.unionByName(delta), threshold = 0.4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(inc === full)
    // the cross-split near-dup actually merged (11 joined base cluster {1,2})
    assert(inc.contains(11L -> 1L))
  }

  test("streaming ingest loop: foreachBatch deltas fold into the persisted index") {
    // the end-to-end maintenance story: a STREAM of document deltas commits
    // into the persisted LSH index micro-batch by micro-batch
    // (appendToLshIndex = incremental merge + bucketed append), and the
    // on-disk clusters stay ≡ a full recompute over everything seen
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "completely different content about database engines and query planning")
    ).toDF("doc_id", "text")
    val d1 = Seq(
      (11L, "the quick brown fox jumps over the lazy dog near the river bank yesterday"),
      (12L, "unrelated text about breeze linear algebra solvers"))
    val d2 = Seq(
      (21L, "the quick brown fox jumps over the lazy dog near the river bank tomorrow"))
    Dedup.saveLshIndex(base, "silsh", threshold = 0.4, buckets = 4)
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        Dedup.appendToLshIndex(spark, "silsh", batch, threshold = 0.4)
        ()
      }
      .start()
    input.addData(d1: _*) // near-dup of base doc 1 + a singleton
    q.processAllAvailable()
    input.addData(d2: _*) // near-dup of the BATCH-1 universe (cross-delta)
    q.processAllAvailable()
    q.stop()
    val inc = spark.table("silsh_clusters")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    val full = Dedup.minHashLSH(
        base.unionByName((d1 ++ d2).toDF("doc_id", "text")), threshold = 0.4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(inc === full)
    assert(inc.contains(21L -> 1L)) // batch-2 doc joined the base cluster
  }

  test("snapshotDiff delta → appendToLshIndex ≡ full recompute over the union") {
    // the CDC-style maintenance composition: fingerprint two corpus
    // snapshots, let snapshotDiff pick out what actually needs indexing
    // (added + changed — unchanged docs cost nothing), commit that delta
    // into the persisted LSH index, and the on-disk clusters must equal a
    // full recompute. Changed docs enter as new VERSIONS (version-qualified
    // id): the index is append-only, so the ingest contract for a changed
    // doc is "index the new version under a fresh id", exactly how an
    // immutable content store hands versions downstream.
    val v1 = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "original second document about breeze linear algebra internals"),
      (3L, "completely different content about database engines and query planning"),
      (4L, "entirely standalone text that matches nothing else in the corpus")
    ).toDF("doc_id", "text")
    val v2 = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      // changed: now a near-dup of doc 3's family
      (2L, "completely different content about database engines and query optimization"),
      (3L, "completely different content about database engines and query planning"),
      (4L, "entirely standalone text that matches nothing else in the corpus"),
      // added: near-dup of doc 1
      (6L, "the quick brown fox jumps over the lazy dog near the river bank yesterday")
    ).toDF("doc_id", "text")
    Dedup.saveLshIndex(v1, "dlsh", threshold = 0.4, buckets = 4)
    val fp1 = v1.select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
    val fp2 = v2.select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
    val dirty = Curation.snapshotDiff(fp1, fp2)
      .filter(col("status").isin("added", "changed"))
    // delta = v2's text for every dirty id, version-qualified for changed
    val delta = v2.join(dirty, Seq("doc_id"), "left_semi")
      .join(fp1.select(col("doc_id")), Seq("doc_id"), "left_semi") // changed
      .select((col("doc_id") + 1000L).as("doc_id"), col("text"))
      .unionByName(
        v2.join(dirty, Seq("doc_id"), "left_semi")
          .join(fp1.select(col("doc_id")), Seq("doc_id"), "left_anti") // added
          .select(col("doc_id"), col("text")))
    assert(delta.select("doc_id").collect().map(_.getLong(0)).toSet
      === Set(1002L, 6L)) // exactly the changed + added docs, nothing else
    Dedup.appendToLshIndex(spark, "dlsh", delta, threshold = 0.4)
    val inc = spark.table("dlsh_clusters")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    val full = Dedup.minHashLSH(v1.unionByName(delta), threshold = 0.4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(inc === full)
    // the changed doc's new version clustered with doc 3's family, and the
    // added doc joined doc 1's cluster — the cross-snapshot merges happened
    assert(inc.contains(1002L -> 3L))
    assert(inc.contains(6L -> 1L))
  }

  test("incremental LSH fails fast on build-parameter mismatch") {
    // index built by the previous test with (3, 64, 16, 0.4, false): any
    // divergent parameter would silently join garbage — must throw instead
    val delta = Seq((99L, "whatever text")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Dedup.incrementalMinHashLSH(spark, "ilsh", delta, threshold = 0.7)
    }
    assert(e.getMessage.contains("parameters differ"))
  }

  test("incremental LSH index join: base side pre-partitioned, no exchange") {
    // delta bands ⋈ <name>_bands on the bucket key: the persisted side is
    // bucketed+sorted by (band, bucket), so the ONLY exchange in the join
    // is the delta side — the 100 TB index never reshuffles
    val deltaBands = Seq((100L, 0, 42L), (101L, 1, 7L))
      .toDF("a", "band", "bucket")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = deltaBands.join(
        spark.table("ilsh_bands").toDF("b", "band", "bucket"),
        Seq("band", "bucket"))
      val plan = j.queryExecution.executedPlan.toString
      val exchanges = "Exchange".r.findAllIn(plan).length
      assert(exchanges === 1, s"expected delta-side-only exchange, got:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("minHashKeepBest keeps the largest member per near-dup cluster") {
    val d = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today", 70),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank yesterday", 74),
      (3L, "completely different content about database engines and query planning", 71),
      (4L, "the quick brown fox jumps over the lazy dog near the river bank today", 70)
    ).toDF("doc_id", "text", "n_chars")
    // cluster {1,2,4}: doc 2 is largest (74 chars) → kept, 3 members
    val out = Dedup.minHashKeepBest(d, threshold = 0.5).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out === Map(2L -> ((74L, 3L)), 3L -> ((71L, 1L))))
  }

  test("approx_count_distinct tracks exact vocabulary within published error") {
    // the documented 100 TB path for d_vocab-style stats: HLL++ sketch vs
    // the exact distinct the oracle checks
    val words = (0 until 4000).map(i => (i.toLong % 7, s"w${i % 523}"))
      .toDF("lang", "tok")
    val exact = words.groupBy("lang").agg(countDistinct(col("tok")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val approx = words.groupBy("lang")
      .agg(approx_count_distinct(col("tok"), rsd = 0.02).as("v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    exact.foreach { case (lang, v) =>
      assert(math.abs(approx(lang) - v).toDouble / v <= 0.06,
        s"lang $lang: approx ${approx(lang)} vs exact $v")
    }
  }

  test("chunk splits into overlapping token windows, short docs yield one chunk") {
    val d = Seq(
      (1L, (1 to 20).map(i => s"t$i").mkString(" ")),  // 20 tokens
      (2L, "one two")                                  // shorter than a chunk
    ).toDF("doc_id", "text")
    val out = TextAnalysis.chunk(d, chunkTokens = 8, overlap = 2)
      .select("doc_id", "chunk_idx", "chunk_tokens", "chunk_text").collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getInt(2), r.getString(3))).toMap
    // doc 1: stride 6 → chunks at 0,6,12,18 → 1 + ceil(12/6) = 3? 20-8=12 → 3 extra → 4? ceil(12/6)=2 → 3 chunks
    val doc1 = out.keys.filter(_._1 == 1L).map(_._2).toSeq.sorted
    assert(doc1 === Seq(0, 1, 2))
    assert(out((1L, 0))._2.startsWith("t1 t2"))
    // overlap: chunk 1 starts at token 7 (stride 6) → begins with t7, and
    // chunk 0 ends with t8 — tokens t7,t8 appear in both
    assert(out((1L, 0))._2.endsWith("t7 t8"))
    assert(out((1L, 1))._2.startsWith("t7 t8"))
    // last chunk is the tail (tokens 13..20), 8 tokens
    assert(out((1L, 2))._2 === (13 to 20).map(i => s"t$i").mkString(" "))
    assert(out((2L, 0)) === ((2, "one two")))
    assert(out.keys.count(_._1 == 2L) === 1)
  }

  test("lmScore ranks corpus-typical docs above atypical ones") {
    val d = Seq(
      (1L, "the the the cat cat"),    // all high-frequency tokens
      (2L, "the cat zyx qwv"),        // half rare singletons
      (3L, "the the cat the cat")     // same multiset shape as doc 1
    ).toDF("doc_id", "text")
    val out = TextAnalysis.lmScore(d)
      .select("doc_id", "n_tokens", "lm_score").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(1L)._1 === 5L && out(2L)._1 === 4L)
    // common-token docs beat the rare-token doc
    assert(out(1L)._2 > out(2L)._2)
    assert(out(3L)._2 > out(2L)._2)
    // identical token multisets score identically
    assert(out(1L)._2 === out(3L)._2)
    // mean log prob is negative (probabilities < 1)
    assert(out.values.forall(_._2 < 0.0))
  }

  test("lmScoreAgainst: self-model ≡ lmScore; OOV terms take the smoothing " +
       "floor with exact n_oov; lmModel shards merge pointwise") {
    val ref = Seq(
      (1L, "the the the cat cat"),
      (2L, "the cat sat")
    ).toDF("doc_id", "text")
    val model = TextAnalysis.lmModel(ref)
    // model: the=4, cat=3, sat=1 → N=8, V=3
    assert(model.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ===
      Map("the" -> 4L, "cat" -> 3L, "sat" -> 1L))
    // self-scoring parity: same integer totals as lmScore, n_oov = 0
    val self = TextAnalysis.lmScoreAgainst(model, ref).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val lm = TextAnalysis.lmScore(ref).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    Seq(1L, 2L).foreach { id =>
      assert(self(id) === ((lm(id)._1, 0L, lm(id)._2)), s"doc $id")
    }
    // OOV probe: unseen terms floor at 1/(N+V) = 1/11; driver reference
    // replays the per-term micro-nat quantization exactly
    val probe = Seq((9L, "the unseen1 unseen2"), (10L, "the cat sat")).toDF("doc_id", "text")
    val got = TextAnalysis.lmScoreAgainst(model, probe).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toList.sortBy(_._1)
    def lpm(cnt: Long): Long = microNat(math.log((cnt + 1).toDouble / 11) * 1e6)
    val wantScore = BigDecimal((lpm(4) + 2 * lpm(0)) / 1e6 / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(0) === ((9L, 3L, 2L, lpm(4) + 2 * lpm(0), wantScore)))
    assert(got(1)._3 === 0L)
    assert(got(1)._4 === lpm(4) + lpm(3) + lpm(1))
    // the OOV-laden doc scores strictly below the in-vocab doc
    assert(got(0)._5 < got(1)._5)
    // shard merge ≡ whole-corpus model (maintained-profile contract)
    val merged = TextAnalysis.mergeLmModels(Seq(
        TextAnalysis.lmModel(ref.filter(col("doc_id") === 1L)),
        TextAnalysis.lmModel(ref.filter(col("doc_id") === 2L))))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged === Map("the" -> 4L, "cat" -> 3L, "sat" -> 1L))
  }

  test("streaming ingest: per-batch LM-model maintenance — the merged " +
       "(term, cnt) model tracks the full reference corpus; scores against " +
       "the maintained model ≡ scores against the one-shot model") {
    // the CMS/HLL/span-index foreachBatch maintenance pattern applied to
    // lmModel: document-atomic micro-batches, driver keeps the (term, cnt)
    // profile (bounded by reference vocabulary), each batch folds in via
    // mergeLmModels' pointwise SUM
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val batches = Seq(
      Seq((1L, "the cat sat on the mat")),
      Seq((2L, "the dog sat"), (3L, "a cat and a dog")),
      Seq((4L, "mat cat mat")))
    val mSchema = StructType(Seq(
      StructField("term", StringType), StructField("cnt", LongType)))
    var acc = Seq.empty[org.apache.spark.sql.Row]
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val base = spark.createDataFrame(
          spark.sparkContext.parallelize(acc, 2), mSchema)
        acc = TextAnalysis.mergeLmModels(
          Seq(base, TextAnalysis.lmModel(batch))).collect().toSeq
        ()
      }
      .start()
    batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    q.stop()
    val maintained = spark.createDataFrame(
      spark.sparkContext.parallelize(acc, 2), mSchema)
    // final maintained model == one-shot full-corpus model
    val all = batches.flatten.toDF("doc_id", "text")
    val oneShot = TextAnalysis.lmModel(all)
    assert(acc.map(r => r.getString(0) -> r.getLong(1)).toMap ===
      oneShot.collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
    // and scoring is model-value-equal: EXACT integer micro-nat totals
    // (OOV terms present in the probe exercise the smoothing floor)
    val probe = Seq((9L, "the cat flew"), (10L, "unseen words only")).toDF("doc_id", "text")
    val a = TextAnalysis.lmScoreAgainst(maintained, probe).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val b = TextAnalysis.lmScoreAgainst(oneShot, probe).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(a === b)
  }

  test("streaming ingest: per-batch order-n LM maintenance — merged " +
       "(n, gram, cnt) shards track the full corpus; Stupid Backoff " +
       "scores against the maintained model ≡ one-shot (integer-exact)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val batches = Seq(
      Seq((1L, "the cat sat on the mat")),
      Seq((2L, "the dog sat on a log"), (3L, "a cat and a dog met")),
      Seq((4L, "the cat sat on the log")))
    val mSchema = StructType(Seq(StructField("n", IntegerType),
      StructField("gram", StringType), StructField("cnt", LongType)))
    var acc = Seq.empty[org.apache.spark.sql.Row]
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val base = spark.createDataFrame(
          spark.sparkContext.parallelize(acc, 2), mSchema)
        acc = TextAnalysis.mergeLmNgramModels(
          Seq(base, TextAnalysis.lmNgramModel(batch, order = 3))).collect().toSeq
        ()
      }
      .start()
    batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    q.stop()
    val maintained = spark.createDataFrame(
      spark.sparkContext.parallelize(acc, 2), mSchema)
    val oneShot = TextAnalysis.lmNgramModel(
      batches.flatten.toDF("doc_id", "text"), order = 3)
    assert(acc.map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap ===
      oneShot.collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap)
    // scoring parity, all levels + OOV exercised by the probe
    val probe = Seq((9L, "the cat sat on a mat"), (10L, "dog unseen the cat sat")).toDF("doc_id", "text")
    def run(m: org.apache.spark.sql.DataFrame) =
      TextAnalysis.lmNgramScoreAgainst(m, probe, order = 3).collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(run(maintained) === run(oneShot))
  }

  test("streaming ingest: per-batch NB model+prior maintenance — " +
       "mergeNbModels/mergeNbPriors fold labeled micro-batches; the " +
       "maintained pair classifies identically to the one-shot pair") {
    // the LM maintenance drill's contract applied to the supervised
    // classifier: document-atomic labeled batches, pointwise-SUM folds,
    // final (model, priors) == one-shot, nbClassify integer-identical
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val batches = Seq(
      Seq(("a", "table scan merge"), ("b", "cat dog cat")),
      Seq(("a", "scan scan filter"), ("b", "dog mat")),
      Seq(("b", "cat mat mat"), ("a", "merge table")))
    val mSchema = StructType(Seq(StructField("label", StringType),
      StructField("term", StringType), StructField("cnt", LongType)))
    val pSchema = StructType(Seq(StructField("label", StringType),
      StructField("n_docs", LongType)))
    var mAcc = Seq.empty[org.apache.spark.sql.Row]
    var pAcc = Seq.empty[org.apache.spark.sql.Row]
    val input = MemoryStream[(String, String)]
    val q = input.toDF().toDF("label", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val mBase = spark.createDataFrame(
          spark.sparkContext.parallelize(mAcc, 2), mSchema)
        val pBase = spark.createDataFrame(
          spark.sparkContext.parallelize(pAcc, 2), pSchema)
        mAcc = TextAnalysis.mergeNbModels(
          Seq(mBase, TextAnalysis.nbModel(batch))).collect().toSeq
        pAcc = TextAnalysis.mergeNbPriors(
          Seq(pBase, TextAnalysis.nbPriors(batch))).collect().toSeq
        ()
      }
      .start()
    batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    q.stop()
    val all = batches.flatten.toDF("label", "text")
    val oneM = TextAnalysis.nbModel(all)
    val oneP = TextAnalysis.nbPriors(all)
    assert(mAcc.map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap ===
      oneM.collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap)
    assert(pAcc.map(r => r.getString(0) -> r.getLong(1)).toMap ===
      oneP.collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
    // classification against the maintained pair is integer-identical
    // (OOV term included)
    val maintainedM = spark.createDataFrame(
      spark.sparkContext.parallelize(mAcc, 2), mSchema)
    val maintainedP = spark.createDataFrame(
      spark.sparkContext.parallelize(pAcc, 2), pSchema)
    val probe = Seq((1L, "scan merge"), (2L, "cat mat"), (3L, "zz unseen"))
      .toDF("doc_id", "text")
    val a = TextAnalysis.nbClassify(maintainedM, maintainedP, probe).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    val b = TextAnalysis.nbClassify(oneM, oneP, probe).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(a === b)
    assert(a(1L)._1 === "a" && a(2L)._1 === "b") // separable probes classify
  }

  test("lmScoreAgainst: randomized driver-reference equivalence on the " +
       "exact micro-nat totals (split model/score corpora, OOV present)") {
    val rng = new scala.util.Random(31)
    val vocab = (0 until 10).map(i => s"w$i")
    (0 until 10).foreach { trial =>
      // model corpus from w0..w6 only; scored corpus from the FULL vocab,
      // so w7..w9 occurrences are genuine OOV hits
      val modelDocs = (0 until 4).map { _ =>
        val len = 3 + rng.nextInt(12)
        (0 until len).map(_ => vocab(rng.nextInt(7))).mkString(" ")
      }
      val scoreDocs = (0 until 5).map { id =>
        val len = 1 + rng.nextInt(10)
        (id.toLong, (0 until len).map(_ => vocab(rng.nextInt(vocab.size))).mkString(" "))
      }
      val counts = modelDocs.flatMap(_.split(" ")).groupBy(identity)
        .view.mapValues(_.size.toLong).toMap
      val nTotal = counts.values.sum
      val nVocab = counts.size.toLong
      def lpm(tf: Long, cnt: Long): Long =
        microNat(tf * math.log((cnt + 1).toDouble / (nTotal + nVocab)) * 1e6)
      val want = scoreDocs.map { case (id, t) =>
        val tf = t.split(" ").groupBy(identity).view.mapValues(_.size.toLong)
        val total = tf.map { case (w, f) => lpm(f, counts.getOrElse(w, 0L)) }.sum
        val oov = tf.collect { case (w, f) if !counts.contains(w) => f }.sum
        id -> ((tf.values.sum, oov, total))
      }.toMap
      val got = TextAnalysis.lmScoreAgainst(
          TextAnalysis.lmModel(modelDocs.map(Tuple1(_)).toDF("text")),
          scoreDocs.toDF("doc_id", "text"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      scoreDocs.foreach { case (id, _) =>
        assert(got(id) === want(id), s"trial $trial doc $id")
      }
    }
  }

  test("lmBuckets: CCNet tercile split — buckets are monotone in nll_micro, " +
       "all three classes populated on a tiered fixture, head = most " +
       "reference-like tier") {
    // reference model: common words; three doc tiers by construction —
    // pure-common (lowest NLL), mixed, pure-OOV (highest NLL)
    val ref = Seq.tabulate(8)(i => (100L + i, "the cat sat the cat mat dog ran"))
      .toDF("doc_id", "text")
    val model = TextAnalysis.lmModel(ref)
    val docs = (
      (0 until 6).map(i => (i.toLong, "the cat sat mat")) ++
      (0 until 6).map(i => (10L + i, "the cat qq zz")) ++
      (0 until 6).map(i => (20L + i, "qq zz ww vv"))
    ).toDF("doc_id", "text")
    val out = TextAnalysis.lmBuckets(model, docs).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getString(4)))
    val byBucket = out.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
    assert(byBucket.keySet === Set("head", "middle", "tail"),
      s"all three classes must be populated, got ${byBucket.keySet}")
    // monotone: every head NLL <= every middle NLL <= every tail NLL
    assert(byBucket("head").max <= byBucket("middle").min)
    assert(byBucket("middle").max <= byBucket("tail").min)
    // tier identity: the pure-common docs are the head, pure-OOV the tail
    val byDoc = out.map(t => t._1 -> t._3).toMap
    (0 until 6).foreach(i => assert(byDoc(i.toLong) === "head", s"doc $i"))
    (0 until 6).foreach(i => assert(byDoc(20L + i) === "tail", s"doc ${20 + i}"))
    (0 until 6).foreach(i => assert(byDoc(10L + i) === "middle", s"doc ${10 + i}"))
  }

  test("lmBuckets on an EMPTY corpus returns an empty frame with the " +
       "bucket column (no threshold-decode crash)") {
    val model = TextAnalysis.lmModel(Seq((1L, "the cat")).toDF("doc_id", "text"))
    val out = TextAnalysis.lmBuckets(model,
      Seq.empty[(Long, String)].toDF("doc_id", "text"))
    assert(out.columns.toSeq ===
      Seq("doc_id", "n_tokens", "n_oov", "nll_micro", "bucket"))
    assert(out.count() === 0L)
  }

  test("lmNgramModel: hand-computed gram counts at every order, prefix-" +
       "closed; shard merge ≡ one-shot model") {
    val ref = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val m = TextAnalysis.lmNgramModel(ref, order = 3).collect()
      .map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(m === Map(
      (1, "a") -> 3L, (1, "b") -> 3L, (1, "c") -> 1L,
      (2, "a b") -> 3L, (2, "b a") -> 1L, (2, "b c") -> 1L,
      (3, "a b a") -> 1L, (3, "b a b") -> 1L, (3, "a b c") -> 1L))
    // prefix closure: every (k, ctx·w) has its (k−1, ctx) row
    m.keys.filter(_._1 > 1).foreach { case (k, gram) =>
      val ctx = gram.split(" ").dropRight(1).mkString(" ")
      assert(m.contains((k - 1, ctx)), s"missing prefix ($k, $gram)")
    }
    val merged = TextAnalysis.mergeLmNgramModels(Seq(
        TextAnalysis.lmNgramModel(ref.filter(col("doc_id") === 1L), order = 3),
        TextAnalysis.lmNgramModel(ref.filter(col("doc_id") === 2L), order = 3)))
      .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(merged === m)
  }

  test("lmNgramScoreAgainst: randomized driver-reference equivalence on the " +
       "exact micro-nat totals and the backoff profile (split model/score " +
       "corpora, OOV present, every backoff depth exercised)") {
    val rng = new scala.util.Random(47)
    val vocab = (0 until 8).map(i => s"w$i")
    var sawFull = 0L; var sawSteps = 0L; var sawOov = 0L
    (0 until 10).foreach { trial =>
      val modelDocs = (0 until 4).map { _ =>
        val len = 4 + rng.nextInt(12)
        (0 until len).map(_ => vocab(rng.nextInt(5))).mkString(" ")
      }
      val scoreDocs = (0 until 5).map { id =>
        val len = 1 + rng.nextInt(10)
        (id.toLong, (0 until len).map(_ => vocab(rng.nextInt(vocab.size))).mkString(" "))
      }
      // driver Stupid Backoff, replicating the engine's IEEE shapes exactly:
      // alpha powers by literal double multiplication, micro quantization
      // per position before the long sum
      val grams = (1 to 3).map { k =>
        k -> modelDocs.flatMap(_.split(" ").toSeq.sliding(k).filter(_.size == k)
          .map(_.mkString(" "))).groupBy(identity).view.mapValues(_.size.toLong).toMap
      }.toMap
      val nTotal = grams(1).values.sum
      val nVocab = grams(1).size.toLong
      def alphaPow(b: Int): Double = (1 to b).foldLeft(1.0)((c, _) => c * 0.4)
      val want = scoreDocs.map { case (id, t) =>
        val toks = t.split(" ").toSeq
        var (nFull, nSteps, nOov, total) = (0L, 0L, 0L, 0L)
        toks.indices.foreach { i =>
          val k0 = math.min(i + 1, 3)
          val hitK = (k0 to 2 by -1).find { k =>
            grams(k).contains(toks.slice(i - k + 1, i + 1).mkString(" "))
          }.getOrElse(1)
          val ratio = if (hitK >= 2) {
            val num = grams(hitK)(toks.slice(i - hitK + 1, i + 1).mkString(" "))
            val den = grams(hitK - 1)(toks.slice(i - hitK + 1, i).mkString(" "))
            num.toDouble / den
          } else {
            val c1 = grams(1).getOrElse(toks(i), 0L)
            if (c1 == 0L) nOov += 1
            (c1 + 1).toDouble / (nTotal + nVocab)
          }
          val b = k0 - hitK
          if (b == 0) nFull += 1
          nSteps += b
          total += microNat(math.log(alphaPow(b) * ratio) * 1e6)
        }
        id -> ((toks.size.toLong, nOov, nFull, nSteps, total))
      }.toMap
      val got = TextAnalysis.lmNgramScoreAgainst(
          TextAnalysis.lmNgramModel(modelDocs.map(Tuple1(_)).toDF("text"), order = 3),
          scoreDocs.toDF("doc_id", "text"), order = 3)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
      scoreDocs.foreach { case (id, _) =>
        assert(got(id) === want(id), s"trial $trial doc $id")
        sawFull += want(id)._3; sawSteps += want(id)._4; sawOov += want(id)._2
      }
    }
    // the trials must exercise full hits, backoff steps AND the OOV floor —
    // an accidentally-degenerate fixture would prove nothing
    assert(sawFull > 0 && sawSteps > 0 && sawOov > 0,
      s"degenerate fixture: full=$sawFull steps=$sawSteps oov=$sawOov")
  }

  test("lmNgramScoreAgainst: shard-merged model scores integer-identically " +
       "to the one-shot model (maintained-profile contract)") {
    val ref = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat on a log"),
      (3L, "a cat and a dog met")).toDF("doc_id", "text")
    val oneShot = TextAnalysis.lmNgramModel(ref, order = 3)
    val merged = TextAnalysis.mergeLmNgramModels(
      Seq(1L, 2L, 3L).map(id =>
        TextAnalysis.lmNgramModel(ref.filter(col("doc_id") === id), order = 3)))
    val probe = Seq((9L, "the cat sat on a log"), (10L, "dog unseen the")).toDF("doc_id", "text")
    def run(m: org.apache.spark.sql.DataFrame) =
      TextAnalysis.lmNgramScoreAgainst(m, probe, order = 3).collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(run(merged) === run(oneShot))
  }

  test("lmNgramBuckets: order-n terciles DIVERGE from the unigram terciles " +
       "on repeat-heavy fixtures — word salad with the fluent docs' exact " +
       "token multiset leaves 'head' only under the order-n scorer") {
    val fluent = "the quick brown fox jumps over the lazy dog"
    val salad = "dog the over quick lazy brown jumps fox the"
    // same multiset by construction — the unigram model cannot tell them apart
    assert(fluent.split(" ").sorted.toSeq === salad.split(" ").sorted.toSeq)
    val ref = Seq.tabulate(8)(i => (100L + i, fluent)).toDF("doc_id", "text")
    val docs = (
      (0 until 6).map(i => (i.toLong, fluent)) ++
      (0 until 6).map(i => (10L + i, salad)) ++
      (0 until 6).map(i => (20L + i, "qq zz ww vv"))
    ).toDF("doc_id", "text")
    val uni = TextAnalysis.lmBuckets(TextAnalysis.lmModel(ref), docs)
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getString(4)))).toMap
    val ng = TextAnalysis.lmNgramBuckets(
        TextAnalysis.lmNgramModel(ref, order = 3), docs, order = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getString(4)))).toMap
    (0 until 6).foreach { i =>
      // unigram: integer-identical NLL and bucket for the twin pair
      assert(uni(i.toLong)._1 === uni(10L + i)._1)
      assert(uni(i.toLong)._2 === uni(10L + i)._2)
      // order-n: the salad twin scores strictly worse and CHANGES bucket
      assert(ng(10L + i)._1 > ng(i.toLong)._1)
      assert(ng(i.toLong)._2 === "head", s"fluent doc $i")
      assert(ng(10L + i)._2 !== "head", s"salad doc ${10 + i}")
    }
    // material divergence: at least a third of the corpus moves bucket
    val moved = (0 until 18).count { j =>
      val id = Seq(j, 10 + j - 6, 20 + j - 12)(j / 6).toLong
      uni(id)._2 !== ng(id)._2
    }
    assert(moved >= 6, s"only $moved/18 docs changed bucket")
  }

  test("nbClassify: exact micro-nat argmax vs driver reference; OOV floor " +
       "shared across classes; empty-token doc falls back to prior argmax; " +
       "integer ties break to the max label") {
    val train = Seq(
      ("a", "sun sun moon data"),
      ("a", "sun data table"),
      ("b", "rock rock data"),
      ("b", "rock moon scan scan")
    ).toDF("label", "text")
    val model = TextAnalysis.nbModel(train)
    val priors = TextAnalysis.nbPriors(train)
    // driver reference replaying the exact quantization
    val cnts = train.collect().map(r => (r.getString(0), r.getString(1)))
      .flatMap { case (l, t) => t.split(" ").map(l -> _) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nClass = cnts.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val vocab = cnts.keySet.map(_._2)
    val v = vocab.size.toLong
    def ref(text: String): (String, Long) = {
      val tf = text.split("\\s+").filter(_.nonEmpty)
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      Seq("a", "b").map { l =>
        val prior = microNat(math.log(2.0 / 4.0) * 1e6)
        val like = tf.map { case (w, f) =>
          microNat(f * math.log(
            (cnts.getOrElse((l, w), 0L) + 1).toDouble / (nClass(l) + v)) * 1e6)
        }.sum
        (prior + like, l)
      }.max match { case (s, l) => (l, s) }
    }
    val probe = Seq(
      (1L, "sun sun table"),     // a-vocab heavy
      (2L, "rock scan"),         // b-vocab heavy
      (3L, "data moon"),         // shared terms only — decided by counts
      (4L, "zzunseen qqnovel"),  // all-OOV: floors differ only via N_c
      (5L, "")                   // zero tokens: prior-only
    ).toDF("doc_id", "text")
    val got = TextAnalysis.nbClassify(model, priors, probe).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got.size === 5)
    Seq(1L -> "sun sun table", 2L -> "rock scan", 3L -> "data moon",
        4L -> "zzunseen qqnovel").foreach { case (id, t) =>
      assert(got(id) === ref(t), s"doc $id")
    }
    assert(got(1L)._1 === "a" && got(2L)._1 === "b")
    // empty doc: likelihood 0, equal priors (2 docs each) → integer tie →
    // max label wins deterministically
    assert(got(5L) === (("b", microNat(math.log(0.5) * 1e6))))
  }

  test("nbClassify: held-out accuracy is perfect on separable synthetic " +
       "domains; shard-merged model ≡ one-shot model (maintained-classifier " +
       "contract)") {
    val rng = new scala.util.Random(17)
    val aVocab = Vector("aleph", "quartz", "zephyr", "data", "table")
    val bVocab = Vector("borax", "lattice", "osmium", "scan", "merge")
    def gen(vb: Vector[String], l: String, n: Int, off: Long) =
      (0 until n).map { i =>
        val len = 4 + rng.nextInt(8)
        (off + i, l, (0 until len).map(_ => vb(rng.nextInt(vb.size))).mkString(" "))
      }
    val train = (gen(aVocab, "dom_a", 30, 0L) ++ gen(bVocab, "dom_b", 30, 100L))
      .toDF("doc_id", "label", "text")
    val test = (gen(aVocab, "dom_a", 10, 200L) ++ gen(bVocab, "dom_b", 10, 300L))
      .toDF("doc_id", "want", "text")
    val model = TextAnalysis.nbModel(train)
    val priors = TextAnalysis.nbPriors(train)
    val pred = TextAnalysis.nbClassify(model, priors, test)
    val acc = pred.join(test, Seq("doc_id"))
      .filter(col("label") === col("want")).count()
    assert(acc === 20L, "held-out accuracy must be 20/20 on separable domains")
    // shard-merge ≡ one-shot: train in three uneven shards
    val shards = Seq(col("doc_id") % 3 === 0, col("doc_id") % 3 === 1,
      col("doc_id") % 3 === 2).map(p => train.filter(p))
    val mergedModel = TextAnalysis.mergeNbModels(shards.map(TextAnalysis.nbModel(_)))
    val mergedPriors = TextAnalysis.mergeNbPriors(shards.map(TextAnalysis.nbPriors(_)))
    assert(mergedModel.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sorted.toSeq ===
      model.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).sorted.toSeq)
    assert(mergedPriors.collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq ===
      priors.collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq)
    val predMerged = TextAnalysis.nbClassify(mergedModel, mergedPriors, test)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted.toSeq
    assert(predMerged ===
      pred.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted.toSeq)
  }

  test("packBins: dense bins, deterministic, overflow bounded by one doc") {
    val d = (1L to 30L).map(i => (i, ("w " * (i % 7 + 1).toInt).trim)).toDF("doc_id", "text")
    val out = TextAnalysis.packBins(d, budget = 10)
      .select("doc_id", "n_tokens", "pack_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // deterministic: re-run identical
    val again = TextAnalysis.packBins(d, budget = 10)
      .select("doc_id", "n_tokens", "pack_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(out.toSeq.sorted === again.toSeq.sorted)
    val byBin = out.groupBy(_._3).view.mapValues(_.map(_._2).sum).toMap
    // bins are dense 0..max
    assert(byBin.keySet === (0L to byBin.keys.max).toSet)
    // every bin except possibly the last holds ≥ budget − (maxdoc−1) and
    // overflows by < one max doc (7 tokens)
    val maxDoc = 7
    byBin.view.filterKeys(_ < byBin.keys.max).foreach { case (b, tot) =>
      assert(tot < 10 + maxDoc, s"bin $b overflowed: $tot")
      assert(tot >= 10 - (maxDoc - 1), s"bin $b underfilled: $tot")
    }
  }

  test("packBins unsharded: distributed prefix sum ≡ sequential reference; " +
       "no corpus-sized global window") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val d = (1L to 257L).map(i => (i, ("w " * (i % 11 + 1).toInt).trim))
      .toDF("doc_id", "text").repartition(7) // scrambled input partitioning
    val packed = TextAnalysis.packBins(d, budget = 23)
    val got = packed.select("doc_id", "pack_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // sequential reference: running token sum in doc_id order
    var run = 0L
    val expect = (1L to 257L).map { i =>
      val toks = (i % 11 + 1)
      val bin = run / 23
      run += toks
      i -> bin
    }.toMap
    assert(got === expect)
    // plan: the corpus-side running sum is partitioned (by _pid); the only
    // UNPARTITIONED window runs over the per-partition totals AGGREGATE
    // (partition-count rows), never the corpus
    val wins = packed.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(wins.size === 2, s"expected 2 windows, got ${wins.size}")
    val (global, local) = wins.partition(_.partitionSpec.isEmpty)
    assert(global.size === 1 && local.size === 1)
    assert(global.head.collectFirst { case a: Aggregate => a }.nonEmpty,
      "global window must consume the per-partition totals aggregate")
    // the bucket id must be a pure expression over driver-literal
    // boundaries — NEVER spark_partition_id after a sampled range
    // exchange, whose value would depend on ReuseExchange firing (two
    // independently-sampled exchanges assign different pids and the pack
    // ids silently diverge)
    val phys = packed.queryExecution.executedPlan.toString
    assert(!phys.contains("SPARK_PARTITION_ID"),
      "pack bucketing must not depend on physical partition ids")
  }

  test("SearchBucket: binary-search bucket id == comparison-ladder id " +
       "everywhere, boundary values land LEFT under both") {
    val bounds = Array(10L, 20L, 300L, 4000L)
    val vals = Seq(Long.MinValue, -5L, 0L, 9L, 10L, 11L, 19L, 20L, 21L,
      299L, 300L, 301L, 3999L, 4000L, 4001L, Long.MaxValue) ++
      (0 until 500).map(i => (i * 37L) % 5000L)
    val df = vals.toDF("v")
    val ladder = bounds.foldLeft(lit(0)) { (acc, b) =>
      acc + when(col("v") > lit(b), 1).otherwise(0)
    }
    val out = df.select(col("v"),
        graft.functions.SearchBucket.searchBucket(col("v"), bounds).as("bs"),
        ladder.as("ld")).collect()
    out.foreach(r => assert(r.getInt(1) === r.getInt(2), s"v=${r.getLong(0)}"))
  }

  test("packBins keeps NULL-order-key rows on BOTH bucket-id paths " +
       "(binary search coalesces to the ladder's bucket 0 — no silent " +
       "row loss through the offsets equi-join)") {
    // integral path (codegen'd binary search)
    val withNull = ((1L to 300L).map(i => (Option(i), "w w")) :+
      ((None: Option[Long]), "w")).toDF("doc_id", "text")
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "8") // force multi-bucket
      val packed = TextAnalysis.packBins(withNull, budget = 50)
        .select("doc_id", "pack_id").collect()
      assert(packed.length === 301, "null-key row must survive packing")
      val nullRow = packed.filter(_.isNullAt(0))
      assert(nullRow.length === 1 && nullRow.head.getLong(1) === 0L)
      // non-integral path (comparison ladder) agrees
      val strKeys = ((1 to 300).map(i => (Option(f"k$i%04d"), "w w")) :+
        ((None: Option[String]), "w")).toDF("doc_id", "text")
      val packedStr = TextAnalysis.packBins(strKeys, budget = 50)
        .select("doc_id", "pack_id").collect()
      assert(packedStr.length === 301)
      assert(packedStr.filter(_.isNullAt(0)).head.getLong(1) === 0L)
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  test("packBins rangeBounds: strictly increasing literal boundaries, " +
       "independent of input partitioning") {
    val d = (1L to 500L).map(i => (i, "w")).toDF("doc_id", "text")
    val b1 = TextAnalysis.rangeBounds(d.repartition(3), "doc_id", 8)
      .map(_.asInstanceOf[Long])
    val b2 = TextAnalysis.rangeBounds(d.repartition(17), "doc_id", 8)
      .map(_.asInstanceOf[Long])
    // deterministic across physical layouts HERE because the sample
    // fraction saturates to 1.0 at 500 rows (every row sampled). With
    // fraction < 1 Spark's Bernoulli sampler seeds per partition, so
    // bounds legitimately vary with partitioning — packBins' OUTPUT
    // stays correct regardless (the boundary-invariance test below is
    // the property that actually carries the operator).
    assert(b1 === b2)
    assert(b1.size > 1 && b1.size <= 7)
    assert(b1 === b1.sorted && b1.distinct === b1)
    // degenerate inputs collapse to one bucket, not an error
    assert(TextAnalysis.rangeBounds(d.limit(1), "doc_id", 8).isEmpty)
    assert(TextAnalysis.rangeBounds(d, "doc_id", 1).isEmpty)
  }

  test("packBins unsharded: pack ids are boundary-invariant (bucket count " +
       "only shapes the prefix-sum phases, never the output)") {
    // SCALE.md's claim for the r10 literal-bounds rewrite: WHICH range
    // boundaries the driver sample picks affects only bucket shapes — the
    // two-phase prefix sum reassembles the same global running sum for any
    // bucketing. Vary the bucket count (rangeBounds reads
    // numShufflePartitions) and pin identical assignments.
    val d = (1L to 257L).map(i => (i, ("w " * (i % 11 + 1).toInt).trim))
      .toDF("doc_id", "text").repartition(5)
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    def packed(): Map[Long, Long] =
      TextAnalysis.packBins(d, budget = 23).select("doc_id", "pack_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "2")
      val two = packed()
      spark.conf.set("spark.sql.shuffle.partitions", "13")
      val thirteen = packed()
      assert(two === thirteen)
      var run = 0L
      val expect = (1L to 257L).map { i =>
        val bin = run / 23; run += (i % 11 + 1); i -> bin
      }.toMap
      assert(two === expect)
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  test("packBins sharded: packs each shard independently, no global window") {
    val d = (1L to 30L).map(i =>
      (i, s"s${i % 3}", ("w " * (i % 7 + 1).toInt).trim))
      .toDF("doc_id", "shard", "text")
    val sharded = TextAnalysis.packBins(d, budget = 10, shardCol = Some("shard"))
    val out = sharded.select("shard", "doc_id", "n_tokens", "pack_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    // per shard: identical to packing that shard alone with the global path
    out.groupBy(_._1).foreach { case (s, rows) =>
      val alone = TextAnalysis.packBins(d.filter(col("shard") === s), budget = 10)
        .select("doc_id", "pack_id").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      rows.foreach { case (_, id, _, bin) => assert(alone(id) === bin) }
    }
    // plan: the window exchange hash-partitions by the shard key — no
    // global range sort (the single-reducer scale trap this param removes)
    val plan = sharded.queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(shard"), plan)
    assert(!plan.toLowerCase.contains("rangepartitioning"), plan)
  }

  test("topKRanked: NaN scores rank last and never corrupt the buffer") {
    // NaN inserted FIRST per group — under the old primitive-comparison
    // better() this landed at the buffer head and broke later insertions
    val d = Seq(
      ("g", Double.NaN, 9L), ("g", 1.0, 1L), ("g", 3.0, 3L), ("g", 2.0, 2L),
      ("h", Double.NaN, 8L), ("h", Double.NaN, 7L), ("h", 5.0, 5L)
    ).toDF("grp", "score", "id").repartition(1) // deterministic insert order
    val out = graft.pipeline.Curation.topKRanked(d, "grp", "score", "id", k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(3)))
    val g = out.filter(_._1 == "g").sortBy(_._3).map(_._2)
    assert(g.toSeq === Seq(3L, 2L, 1L))   // real scores outrank NaN
    val h = out.filter(_._1 == "h").sortBy(_._3).map(_._2)
    assert(h.head === 5L)                 // real score first
    assert(h.toSeq === Seq(5L, 7L, 8L))   // NaNs tie-break by id asc
    // a genuine -Infinity outranks a NaN even when the NaN has a smaller id
    val i = Seq(("i", Double.NaN, 1L), ("i", Double.NegativeInfinity, 6L),
        ("i", 0.0, 4L)).toDF("grp", "score", "id").repartition(1)
    val ri = graft.pipeline.Curation.topKRanked(i, "grp", "score", "id", k = 3)
      .collect().map(r => r.getInt(3) -> r.getLong(1)).toMap
    assert(ri === Map(1 -> 4L, 2 -> 6L, 3 -> 1L))
  }

  test("asofJoin preserves a genuine NULL in the matched right value") {
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b")).toDF("k", "ts", "tag")
    val right = Seq((1L, 5L, Some(100L)), (1L, 15L, None))
      .toDF("k", "ts", "v")
    val out = graft.pipeline.Events.asofJoin(left, right, "k", "ts", "v")
      .select("ts", "asof_value").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(out(10L) === Some(100L))
    // matched row (ts=15) carries NULL — must attach NULL, not fall back to 100
    assert(out(20L) === None)
  }

  test("funnel counts only in-order stage progressions") {
    import java.sql.Timestamp
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val ev = Seq(
      // user 1: full ordered funnel
      (1L, "view", ts(1)), (1L, "click", ts(2)), (1L, "purchase", ts(3)),
      // user 2: purchase BEFORE click → converts only to click
      (2L, "view", ts(1)), (2L, "purchase", ts(2)), (2L, "click", ts(5)),
      // user 3: click only, never viewed → not in funnel at all
      (3L, "click", ts(1)),
      // user 4: view only
      (4L, "view", ts(9))
    ).toDF("user_id", "event_type", "ts")
    val out = graft.pipeline.Events.funnel(ev, Seq("view", "click", "purchase"))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out === Map("view" -> 3L, "click" -> 2L, "purchase" -> 1L))
  }

  test("asofJoin attaches the latest at-or-before value per key") {
    val left = Seq((1L, 10L, 5), (1L, 4L, 5), (2L, 7L, 5), (3L, 1L, 5))
      .toDF("key", "t", "payload")
    val right = Seq((1L, 4L, 40L), (1L, 9L, 90L), (2L, 8L, 80L))
      .toDF("key", "t", "v")
    val out = graft.pipeline.Events.asofJoin(left, right, "key", "t", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(out((1L, 10L)) === Some(90L))  // latest before 10
    assert(out((1L, 4L)) === Some(40L))   // same-instant right row visible
    assert(out((2L, 7L)) === None)        // right row is later → no match
    assert(out((3L, 1L)) === None)        // key has no right rows
    // left payload columns survive
    val cols = graft.pipeline.Events.asofJoin(left, right, "key", "t", "v").columns
    assert(cols.toSeq === Seq("key", "t", "payload", "asof_value"))
  }

  test("chunked asofJoin ≡ unchunked on a hot key, with bounded sort groups") {
    // one hot key (0) carrying 2000 rows across the timeline + normal keys;
    // right values include NULLs, same-instant ties, chunks with no right
    // rows, and left rows before any right row — every carry-over case
    val rnd = new scala.util.Random(7)
    val left = (0 until 2400).map { i =>
      val k = if (i < 2000) 0L else (i % 5 + 1).toLong
      (k, rnd.nextInt(10000).toLong, i.toLong)
    }.toDF("k", "ts", "row_id")
    val right = (0 until 600).map { i =>
      val k = if (i < 400) 0L else (i % 5 + 1).toLong
      (k, rnd.nextInt(10000).toLong * 7 % 10000,
        if (i % 11 == 0) None else Some(i.toLong))
    }.distinct.toDF("k", "ts", "v")
      .groupBy("k", "ts").agg(max(col("v")).as("v")) // unique (k, ts)
    val chunkOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      ts => floor(ts / 500L)
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1), r.getLong(2)) ->
      (if (r.isNullAt(3)) None else Some(r.getLong(3)))
    val plain = graft.pipeline.Events.asofJoin(left, right, "k", "ts", "v")
      .collect().map(key).toSeq.sortBy(_._1)
    val chunked = graft.pipeline.Events.asofJoin(left, right, "k", "ts", "v",
        chunk = Some(chunkOf))
      .collect().map(key).toSeq.sortBy(_._1)
    assert(chunked === plain)
    assert(plain.length === 2400)
    // the straggler bound: pass-1 sort groups are (key, chunk) — the hot
    // key's 2400 union rows spread over its ~20 chunks instead of one group
    val groups = left.select(col("k"), col("ts"))
      .unionByName(right.select(col("k"), col("ts")))
      .groupBy(col("k"), chunkOf(col("ts")).as("c")).count()
      .filter(col("k") === 0L).collect().map(_.getLong(2))
    assert(groups.length >= 15)
    assert(groups.max <= 400, s"largest (key, chunk) sort group = ${groups.max}")
  }

  test("sessionize numbers gap-separated sessions; chunking preserves them exactly") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    // user 1: a session CONTINUING across midnight (gap 10 min over the day
    // chunk boundary), then a break; user 2: break exactly AT the boundary
    val df = Seq(
      (1L, ts("2024-01-01 23:40:00"), 1L),
      (1L, ts("2024-01-01 23:55:00"), 2L),
      (1L, ts("2024-01-02 00:05:00"), 3L), // 10 min gap: SAME session
      (1L, ts("2024-01-02 09:00:00"), 4L), // new session
      (2L, ts("2024-01-01 12:00:00"), 5L),
      (2L, ts("2024-01-02 12:00:00"), 6L)  // new session (24h gap)
    ).toDF("user_id", "ts", "event_id")
    val chunkOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      t => floor(unix_timestamp(t) / 86400L)
    def seqs(out: org.apache.spark.sql.DataFrame) = out
      .collect().map(r => r.getLong(2) -> r.getLong(3)).toMap
    val plain = seqs(Events.sessionize(df))
    assert(plain === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L,
      5L -> 1L, 6L -> 2L))
    assert(seqs(Events.sessionize(df, chunk = Some(chunkOf))) === plain)
  }

  test("chunked sessionize ≡ unchunked on a hot key, with bounded sort groups") {
    import java.sql.Timestamp
    // hot user 0 with 2000 events over ~14 days (avg gap ~10 min → a mix of
    // continuations and breaks, many crossing day-chunk boundaries) plus
    // normal users; equality must hold event by event
    val rnd = new scala.util.Random(11)
    val rows = (0 until 2400).map { i =>
      val u = if (i < 2000) 0L else (i % 5 + 1).toLong
      (u, new Timestamp(1700000000000L + rnd.nextInt(14 * 86400).toLong * 1000),
        i.toLong)
    }
    val df = rows.toDF("user_id", "ts", "event_id")
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(2)) -> r.getLong(3)
    val plain = Events.sessionize(df).collect().map(key).toMap
    assert(plain.size === 2400)
    // equivalence must hold at ANY chunk width — boundary density varies
    // from ~14 boundaries (1 day) to hundreds (1 hour)
    for (width <- Seq(3600L, 21600L, 86400L, 3 * 86400L)) {
      val chunkOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        t => floor(unix_timestamp(t) / width)
      val chunked = Events.sessionize(df, chunk = Some(chunkOf))
        .collect().map(key).toMap
      assert(chunked === plain, s"chunk width $width diverged")
    }
    // straggler bound: pass-1 sort groups are (user, day) — the hot user's
    // 2000 events spread over ~14 chunks instead of one sort partition
    val groups = df.groupBy(col("user_id"),
        floor(unix_timestamp(col("ts")) / 86400L).as("c"))
      .count().filter(col("user_id") === 0L).collect().map(_.getLong(2))
    assert(groups.length >= 12)
    assert(groups.max <= 300, s"largest (user, day) sort group = ${groups.max}")
  }

  test("sessionizeStream: closed sessions ≡ batch summaries, out-of-order bridge merge") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = Timestamp.valueOf(s)
    val input = MemoryStream[(Long, Timestamp)]
    val events = input.toDF().toDF("user_id", "ts").withWatermark("ts", "10 minutes")
    val out = Events.sessionizeStream(events, gapMicros = 60L * 1000000L)
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("sess_stream_out").start()
    // user 1: two events 100 s apart (> gap) → two provisional open sessions
    input.addData((1L, ts("2024-01-01 00:00:00")), (1L, ts("2024-01-01 00:01:40")))
    q.processAllAvailable()
    // a LATER out-of-order arrival lands between them and bridges both into
    // ONE session; user 2 opens a singleton session
    input.addData((1L, ts("2024-01-01 00:00:50")), (2L, ts("2024-01-01 00:00:10")))
    q.processAllAvailable()
    // sentinel advances the watermark far past everything…
    input.addData((99L, ts("2024-01-01 10:00:00")))
    q.processAllAvailable()
    // …and the next batch lets the event-time timeouts fire under it
    input.addData((99L, ts("2024-01-01 10:00:01")))
    q.processAllAvailable()
    val got = spark.table("sess_stream_out").filter($"user_id" =!= 99L).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
      .toSet
    q.stop()
    val batchRows = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L), (1L, ts("2024-01-01 00:01:40"), 2L),
      (1L, ts("2024-01-01 00:00:50"), 3L), (2L, ts("2024-01-01 00:00:10"), 4L)
    ).toDF("user_id", "ts", "event_id")
    val expect = Events.sessionize(batchRows, gapMicros = 60L * 1000000L)
      .groupBy($"user_id", $"session_seq")
      .agg(min($"ts").as("a"), max($"ts").as("b"), count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(2), r.getTimestamp(3), r.getLong(4)))
      .toSet
    assert(got === expect)
    assert(got.exists { case (u, _, _, n) => u == 1L && n == 3L },
      "bridge merge did not produce the single 3-event session")
  }

  test("sessionizeStream ≡ batch sessionize on random shuffled logs") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(23)
    val base = 1700000000000L
    // 300 events, 3 users, 12 h span, 5 min gap (avg inter-event gap ~7 min
    // per user) → a rich mix of breaks and continuations; fed fully shuffled
    // in ONE batch (watermark is still 0 there, so arbitrary disorder is
    // legal) and closed by sentinels
    val rows = (0 until 300).map { i =>
      ((i % 3).toLong, new Timestamp(base + rnd.nextInt(43200).toLong * 1000), i.toLong)
    }
    val input = MemoryStream[(Long, Timestamp)]
    val events = input.toDF().toDF("user_id", "ts").withWatermark("ts", "1 hour")
    val gap = 300L * 1000000L
    val q = Events.sessionizeStream(events, gapMicros = gap).writeStream
      .outputMode("append").format("memory").queryName("sess_rand_out").start()
    input.addData(rnd.shuffle(rows).map(r => (r._1, r._2)): _*)
    q.processAllAvailable()
    input.addData((99L, new Timestamp(base + 86400000L)))
    q.processAllAvailable()
    input.addData((99L, new Timestamp(base + 86401000L)))
    q.processAllAvailable()
    val got = spark.table("sess_rand_out").filter($"user_id" =!= 99L).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
      .toSet
    q.stop()
    val expect = Events.sessionize(rows.toDF("user_id", "ts", "event_id"),
        gapMicros = gap)
      .groupBy($"user_id", $"session_seq")
      .agg(min($"ts").as("a"), max($"ts").as("b"), count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(2), r.getTimestamp(3), r.getLong(4)))
      .toSet
    assert(expect.size > 10, "fixture degenerated to too few sessions")
    assert(got === expect)
  }

  test("decayedValueStream ≡ batch decayedValue after shuffled micro-batches") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(31)
    val base = 1700000000000L
    val rows = (0 until 240).map { i =>
      ((i % 4).toLong, new Timestamp(base + rnd.nextInt(86400).toLong * 1000),
        i.toLong, rnd.nextDouble() * 300.0)
    }
    val input = MemoryStream[(Long, Timestamp, Long, Double)]
    val events = input.toDF().toDF("user_id", "ts", "event_id", "value")
    val q = Events.decayedValueStream(events, window = 16).writeStream
      .outputMode("update").format("memory").queryName("decay_out").start()
    // three shuffled micro-batches: the final emission per key must equal
    // the batch aggregate over EVERYTHING, whatever the arrival order
    val shuffled = rnd.shuffle(rows)
    shuffled.grouped(80).foreach { g => input.addData(g: _*); q.processAllAvailable() }
    val table = spark.table("decay_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    q.stop()
    // memory sink appends each update; keep the LAST row per key
    val got = table.zipWithIndex.groupBy(_._1._1).map { case (u, rs) =>
      u -> rs.maxBy(_._2)._1
    }.map { case (u, r) => u -> (r._2, r._3, r._4) }
    val expect = Events.decayedValue(
        rows.toDF("user_id", "ts", "event_id", "value"), window = 16)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(expect.size === 4)
    assert(got === expect)
  }

  test("rangeJoin matches points to containing intervals across bin boundaries") {
    val pts = Seq((1L, 5L), (2L, 10L), (3L, 99L), (4L, 250L))
      .toDF("pid", "p")
    val ivs = Seq((10L, 3L, 11L), (20L, 95L, 260L), (30L, 300L, 200L))
      .toDF("iid", "s", "e")   // iid 30 is invalid (end < start) → dropped
    val out = graft.pipeline.Events.rangeJoin(pts, ivs, "p", "s", "e",
      binWidth = 10).collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    // interval 20 spans many bins (95..260); points 99 and 250 both match
    assert(out === Set((1L, 10L), (2L, 10L), (3L, 20L), (4L, 20L)))
    // with a key column, only same-key pairs match
    val kp = Seq((1L, "a", 5L), (2L, "b", 5L)).toDF("pid", "k", "p")
    val ki = Seq((10L, "a", 0L, 9L)).toDF("iid", "k", "s", "e")
    val kout = graft.pipeline.Events.rangeJoin(kp, ki, "p", "s", "e",
      binWidth = 10, keyCols = Seq("k")).collect().map(_.getLong(1)).toSet
    assert(kout === Set(1L))
  }

  test("cohortRetention cohorts by first-event day") {
    import java.sql.Timestamp
    def ts(d: Int, h: Int) = Timestamp.valueOf(f"2024-01-$d%02d $h%02d:00:00")
    val ev = Seq(
      (1L, ts(1, 8)), (1L, ts(1, 20)), (1L, ts(3, 9)),   // cohort d1, offsets 0,0,2
      (2L, ts(2, 8)), (2L, ts(3, 8))                     // cohort d2, offsets 0,1
    ).toDF("user_id", "ts")
    val out = graft.pipeline.Events.cohortRetention(ev).collect()
      .map(r => (r.getDate(0).toString, r.getInt(1)) -> r.getLong(2)).toMap
    assert(out === Map(
      ("2024-01-01", 0) -> 1L, ("2024-01-01", 2) -> 1L,
      ("2024-01-02", 0) -> 1L, ("2024-01-02", 1) -> 1L))
  }

  test("exactKeepBest keeps the largest doc per content group, ties → min id") {
    val d = Seq(
      (1L, "same text", 9),
      (4L, "same  TEXT ", 11),   // same normalized group, more chars → kept
      (7L, "same text", 11),     // ties doc 4 on chars → min id 4 kept
      (3L, "other", 5)
    ).toDF("doc_id", "text", "n_chars")
    val out = Dedup.exactKeepBest(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out === Map(4L -> ((11L, 3L)), 3L -> ((5L, 1L))))
  }

  // ---- BPE vocabulary induction -------------------------------------------

  private def refGreedyMerge(tk: Vector[String], l: String, r: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < tk.length) {
      if (i + 1 < tk.length && tk(i) == l && tk(i + 1) == r) { out += (l + r); i += 2 }
      else { out += tk(i); i += 1 }
    }
    out.result()
  }

  /** Driver-side reference BPE trainer (chars → ¶-marked symbols, pair
    * argmax by (cnt DESC, l, r), greedy left-to-right merges). */
  private def refBpe(texts: Seq[String], iters: Int): Seq[(Int, String, String, String, Long)] = {
    var states = texts.map(t =>
      t.trim.toLowerCase.replaceAll("\\s+", " ")
        .map(c => if (c == ' ') "¶" else c.toString).toVector)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    for (it <- 1 to iters) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      states.foreach(_.sliding(2).foreach {
        case Seq(a, b) if !a.contains("¶") && !b.contains("¶") =>
          counts((a, b)) += 1
        case _ =>
      })
      if (counts.nonEmpty) {
        val ((l, r), c) = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
        out += ((it, l, r, l + r, c))
        states = states.map(refGreedyMerge(_, l, r))
      }
    }
    out.toSeq
  }

  test("BPE mergePair: greedy left-to-right, overlap and run semantics") {
    import graft.functions.BpeExpression
    val cases = Seq(
      (Seq("x", "x", "x"), "x", "x", Seq("xx", "x")),
      (Seq("x", "x", "x", "x"), "x", "x", Seq("xx", "xx")),
      (Seq("l", "r", "l", "r"), "l", "r", Seq("lr", "lr")),
      (Seq("a", "l", "r", "b"), "l", "r", Seq("a", "lr", "b")),
      (Seq.empty[String], "l", "r", Seq.empty[String]),
      (Seq("l"), "l", "r", Seq("l")))
    cases.zipWithIndex.foreach { case ((in, l, r, want), i) =>
      val got = Seq(Tuple1(in)).toDF("tk")
        .select(BpeExpression.mergePair(col("tk"), l, r).as("m"))
        .head().getSeq[String](0)
      assert(got === want, s"case $i: merge($in, $l, $r)")
    }
    val chars = Seq(Tuple1("ab cd")).toDF("s")
      .select(BpeExpression.charSymbols(col("s")).as("c")).head().getSeq[String](0)
    assert(chars === Seq("a", "b", "¶", "c", "d"))
  }

  test("bpeLearn ≡ driver-side reference on a random small-alphabet corpus") {
    val rnd = new scala.util.Random(99L)
    val words = Vector("aba", "bab", "abc", "cab", "bc", "aabb", "ccc")
    val texts = (0 until 40).map(_ =>
      Seq.fill(3 + rnd.nextInt(8))(words(rnd.nextInt(words.size))).mkString(" "))
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text").repartition(5)
    val got = TextAnalysis.bpeLearn(df, iters = 6).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .sortBy(_._1).toSeq
    assert(got === refBpe(texts, 6))
  }

  test("bpeLearn: recount and incremental regimes are bit-identical " +
       "(recountFraction is performance-only)") {
    val rnd = new scala.util.Random(41L)
    val words = Vector("aba", "bab", "abc", "cab", "bc", "aabb", "ccc", "cba")
    val texts = (0 until 50).map(_ =>
      Seq.fill(3 + rnd.nextInt(8))(words(rnd.nextInt(words.size))).mkString(" "))
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text").repartition(3)
    def learn(frac: Double) =
      TextAnalysis.bpeLearn(df, iters = 10, recountFraction = frac).collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
        .sortBy(_._1).toSeq
    val ref = refBpe(texts, 10)
    assert(learn(0.0) === ref)    // pure recount (the pre-r10 loop)
    assert(learn(1e9) === ref)    // incremental from merge 1
    assert(learn(0.25) === ref)   // the default hybrid switch
  }

  test("bpeEncode reproduces the reference final state, shuffle-free") {
    val rnd = new scala.util.Random(7L)
    val words = Vector("aba", "bab", "abc", "cab")
    val texts = (0 until 20).map(_ =>
      Seq.fill(2 + rnd.nextInt(6))(words(rnd.nextInt(words.size))).mkString(" "))
    val merges = refBpe(texts, 4).map(m => (m._2, m._3))
    // reference final states
    var states = texts.map(t =>
      t.map(c => if (c == ' ') "¶" else c.toString).toVector)
    merges.foreach { case (l, r) => states = states.map(refGreedyMerge(_, l, r)) }
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val out = TextAnalysis.bpeEncode(df, merges)
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"),
      "encode introduced a shuffle")
    val got = out.select(col("doc_id"), col("symbols")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    texts.indices.foreach(i => assert(got(i.toLong) === states(i), s"doc $i"))
  }

  // ---- URL canonicalization -----------------------------------------------

  test("mojibakeSignals counts double-encode artifacts; clean text scores 0") {
    val rows = Seq(
      (1L, "plain ascii text"),
      (2L, "proper unicode café straße été"),
      (3L, "broken Ã©tÃ©"),                    // Ã©tÃ©: 2
      (4L, "â€œquotedâ€ and Â nbsp"), // â€œ..â€ + Â: 3
      (5L, "ï¿½ replacement ï¿½")    // ï¿½ ×2
    ).toDF("id", "t")
    val got = rows.select(col("id"), TextAnalysis.mojibakeSignals(col("t")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 0L, 2L -> 0L, 3L -> 2L, 4L -> 3L, 5L -> 2L))
    // null propagates, not zero
    val n = Seq((6L, null: String)).toDF("id", "t")
      .select(TextAnalysis.mojibakeSignals(col("t"))).head()
    assert(n.isNullAt(0))
  }

  test("canonicalizeUrl: golden cases for every normalization rule") {
    val cases = Seq(
      // case fold + www + default port + tracking strip + param sort + fragment
      ("HTTPS://WWW.Example.COM:443/Path/A?utm_source=x&b=2&a=1#f",
        "https://example.com/Path/A?a=1&b=2"),
      ("http://example.com:80", "http://example.com/"),          // empty path → /
      ("http://example.com:8080/x", "http://example.com:8080/x"), // non-default port kept
      ("https://sub.shop.co.uk/p?gclid=1&ref=2&q=3", "https://sub.shop.co.uk/p?q=3"),
      ("ftp://Files.example.com:443/a", "ftp://files.example.com:443/a"), // non-http scheme: port kept
      ("https://example.com/P?utm_a=1&utm_b=2", "https://example.com/P"), // all params tracked → no ?
      ("no-scheme.com/path", null),                               // schemeless → NULL
      (null, null)
    )
    val out = cases.zipWithIndex.map { case ((in, _), i) => (i.toLong, in) }
      .toDF("id", "url")
      .select(col("id"), TextAnalysis.canonicalizeUrl(col("url")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    cases.zipWithIndex.foreach { case ((in, want), i) =>
      assert(out(i.toLong) === want, s"url '$in'")
    }
  }

  test("registeredDomain: naive last-two-label approximation") {
    val out = Seq((1L, "sub.a.example.com"), (2L, "example.com"),
      (3L, "localhost"), (4L, null.asInstanceOf[String]))
      .toDF("id", "h")
      .select(col("id"), TextAnalysis.registeredDomain(col("h")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "example.com", 2L -> "example.com",
      3L -> "localhost", 4L -> null))
  }

  // ---- Gopher repetition signals ------------------------------------------

  /** Driver-side reference: token n-grams with duplicates, top-2-gram share
    * and duplicate-3-gram occurrence fraction, integer ppm. */
  private def refRepetition(text: String): (Option[(String, Long)], Option[Long]) = {
    val toks = text.trim.toLowerCase.split("\\s+").toSeq
    def grams(n: Int) =
      if (toks.length < n) Seq.empty
      else toks.sliding(n).map(_.mkString(" ")).toSeq
    val g2 = grams(2)
    val top2 = if (g2.isEmpty) None else {
      val counts = g2.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val (g, c) = counts.toSeq.minBy { case (g, c) => (-c, g) }
      Some((g, c * 1000000L / g2.size))
    }
    val g3 = grams(3)
    val dup3 = if (g3.isEmpty) None else {
      val counts = g3.groupBy(identity).view.mapValues(_.size.toLong).toMap
      Some(counts.values.filter(_ >= 2).sum * 1000000L / g3.size)
    }
    (top2, dup3)
  }

  test("topGramSignals: spam scores high, varied text low, short docs NULL") {
    val d = Seq(
      (1L, "buy now buy now buy now buy now buy now"),
      (2L, "one two three four five six seven eight nine ten"),
      (3L, "alpha"),              // no 2-grams, no 3-grams
      (4L, "alpha beta"),         // one 2-gram, no 3-grams
      (5L, "a b a b a b a b")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.topGramSignals(d).collect()
      .map(r => r.getLong(0) ->
        ((Option(r.get(1)).map(_.toString), Option(r.get(2)).map(_.toString.toLong)),
         Option(r.get(3)).map(_.toString.toLong))).toMap
    assert(out.size === 5)
    // "buy now" appears 5 of 9 2-grams = 555555 ppm; every 3-gram duplicated
    assert(out(1L) === (((Some("buy now"), Some(555555L)), Some(1000000L))))
    // all distinct: count-1 tie → lexicographic min gram; share 1/9 ppm
    assert(out(2L) === (((Some("eight nine"), Some(111111L)), Some(0L))))
    assert(out(3L) === (((None, None), None)))
    assert(out(4L) === (((Some("alpha beta"), Some(1000000L)), None)))
    // tie on counts: "a b" (4) beats "b a" (3); all 3-grams duplicated
    assert(out(5L)._1._1 === Some("a b"))
    assert(out(5L)._2 === Some(1000000L))
  }

  test("asofJoinForward: earliest at-or-after value, NULL when none follows") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    val left = Seq((1L, 7L, ts(100)), (2L, 7L, ts(250)), (3L, 7L, ts(900)),
      (4L, 8L, ts(100))).toDF("id", "k", "ts")
    val right = Seq((7L, ts(250), 25L), (7L, ts(400), 40L), (7L, ts(50), 5L))
      .toDF("k", "ts", "v")
    val got = Events.asofJoinForward(left, right, "k", "ts", "v").collect()
      .map(r => r.getLong(0) -> Option(r.get(3)).map(_.toString.toLong)).toMap
    assert(got(1L) === Some(25L))  // next at 250
    assert(got(2L) === Some(25L))  // at-or-EQUAL ties match
    assert(got(3L) === None)       // nothing follows 900
    assert(got(4L) === None)       // other key never leaks
  }

  test("intervalOverlapJoin ≡ naive overlap predicate, one row per pair") {
    val rnd = new scala.util.Random(20260814L)
    val left = (0L until 60L).map { i =>
      val s = rnd.nextInt(1000).toLong; (i, i % 3, s, s + rnd.nextInt(200).toLong)
    }
    val right = (100L until 160L).map { i =>
      val s = rnd.nextInt(1000).toLong; (i, i % 3, s, s + rnd.nextInt(50).toLong)
    }
    val l = left.toDF("lid", "k", "ls", "le")
    val r = right.toDF("rid", "k", "rs", "re")
    val naive = (for {
      (li, lk, ls, le) <- left; (ri, rk, rs, re) <- right
      if lk == rk && ls <= re && rs <= le
    } yield (li, ri)).sorted
    // bin width much smaller than spans → heavy multi-bin replication;
    // the canonical-bin guard must still emit each pair exactly once
    for (bw <- Seq(7L, 64L, 1000L)) {
      val got = Events.intervalOverlapJoin(l, r, "ls", "le", "rs", "re",
          binWidth = bw, keyCols = Seq("k"))
        .select(col("lid"), col("rid")).collect()
        .map(x => (x.getLong(0), x.getLong(1))).sorted
      assert(got === naive, s"binWidth=$bw")
    }
  }

  test("crossSourceDupMatrix: closed-form pair counts, no singleton rows") {
    val docs = Seq(
      (0L, "dup one", "sA"), (1L, "dup one", "sA"), (2L, "dup one", "sB"),
      (3L, "dup two", "sB"), (4L, "dup two", "sC"),
      (5L, "unique", "sA")
    ).toDF("doc_id", "text", "source")
    val got = Dedup.crossSourceDupMatrix(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === Map(
      ("sA", "sA") -> 1L,   // C(2,2) within sA for "dup one"
      ("sA", "sB") -> 2L,   // 2×1 across for "dup one"
      ("sB", "sC") -> 1L))  // 1×1 across for "dup two"
  }

  test("JSONL and CSV roundtrips are lossless for hostile text") {
    import graft.core.GraphIO
    val docs = Seq(
      (0L, "plain words here", "en", "s0", 16L),
      (1L, "comma, \"quoted\" and 'single'", "en", "s0", 28L),
      (2L, "unicode …—naïve 東京 emoji é", "und", "s1", 25L),
      (3L, "trailing spaces   ", "en", "s1", 18L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "text", "lang", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .sortBy(_._1)
    val expect = rows(docs)
    GraphIO.writeJsonl(docs, "/tmp/graft_io_spec/jsonl")
    assert(rows(GraphIO.readJsonl(spark, "/tmp/graft_io_spec/jsonl", docs.schema)) === expect)
    GraphIO.writeCsv(docs, "/tmp/graft_io_spec/csv")
    assert(rows(GraphIO.readCsv(spark, "/tmp/graft_io_spec/csv", docs.schema)) === expect)
  }

  test("globalTopGrams: occurrence-weighted counts, (cnt desc, gram asc) cutoff") {
    val docs = Seq(
      (0L, "x y z x y z x y z"),  // 'x y z' ×3 (overlapping occurrences)
      (1L, "a b c a b c"),        // 'a b c' ×2
      (2L, "m n o")               // several singles
    ).toDF("doc_id", "text")
    val got = TextAnalysis.globalTopGrams(docs, n = 3, k = 3).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(got.head === ("x y z" -> 3L))
    assert(got(1) === ("a b c" -> 2L))
    // count-2 tie broken lexicographically: 'a b c' < 'y z x' < 'z x y'
    assert(got(2) === ("y z x" -> 2L))
  }

  test("sq8: dequantization error ≤ step/2 per dim; top-1 matches exact search") {
    val rnd = new scala.util.Random(20260814L)
    val vecs = (0L until 30L).map(i => (i, Array.fill(8)(rnd.nextGaussian())))
    val df = vecs.toDF("vec_id", "embedding").repartition(4)
    val (los, steps) = Ann.sq8Train(df)
    val codes = Ann.sq8Encode(df, los, steps).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    vecs.foreach { case (id, x) =>
      val c = codes(id)
      assert(c.forall(v => v >= 0 && v <= 255))
      x.indices.foreach { i =>
        val recon = los(i) + c(i) * steps(i)
        assert(math.abs(recon - x(i)) <= steps(i) / 2 + 1e-12,
          s"vec $id dim $i: recon=$recon x=${x(i)} step=${steps(i)}")
      }
    }
    // well-separated gaussians: 8-bit quantization must not flip top-1
    val exact = Ann.bruteForceKnn(df, df, 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sq8 = Ann.sq8Knn(df, df, 1).collect()
      .filter(_.getInt(3) == 1).map(r => r.getLong(0) -> r.getLong(1)).toMap
    val agree = exact.keys.count(q => sq8(q) == exact(q))
    assert(agree >= 28, s"top-1 agreement $agree/30")
  }

  test("knnGraphBlocked ≡ bruteForceKnn for any block count; mutual-CC clusters") {
    val rnd = new scala.util.Random(20260814L)
    // two tight clusters around orthogonal-ish centers + one outlier
    def jitter(c: Array[Double]) = c.map(_ + rnd.nextGaussian() * 0.01)
    val c1 = Array(1.0, 0.0, 0.0, 0.2); val c2 = Array(0.0, 1.0, 0.2, 0.0)
    val vecs = (0L until 8L).map(i => (i, jitter(c1))) ++
      (8L until 16L).map(i => (i, jitter(c2))) ++ Seq((16L, Array(0.0, 0.0, -1.0, 0.0)))
    val df = vecs.toDF("vec_id", "embedding").repartition(5)
    def canon(d: org.apache.spark.sql.DataFrame) = d
      .select("query_id", "nbr_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted
    val brute = canon(Ann.bruteForceKnn(df, df, 3))
    for (blocks <- Seq(1, 3, 8))
      assert(canon(Ann.knnGraphBlocked(df, 3, blocks = blocks)) === brute,
        s"blocks=$blocks")
    val comps = Ann.mutualKnnComponents(df, 3, blocks = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // components never bridge the two clusters or reach the outlier
    assert((0L until 8L).map(comps).forall(_ < 8L))
    assert((8L until 16L).map(comps).forall(l => l >= 8L && l < 16L))
    assert(comps(16L) === 16L)                          // outlier: singleton
  }

  test("spanCoverage: interval union over overlapping + self-repeated spans") {
    val docs = Seq(
      (0L, "a b c d e f"),             // window 'a b c d' shared with doc 1
      (1L, "a b c d x y"),
      (2L, "p q r s t p q r s t"),     // self-repetition covers everything
      (3L, "u v w")                    // too short for any window
    ).toDF("doc_id", "text")
    val got = Dedup.spanCoverage(docs, spanTokens = 4).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(0L) === ((6L, 4L, 666666L)))   // [1..4] of 6 tokens
    assert(got(1L) === ((6L, 4L, 666666L)))
    assert(got(2L) === ((10L, 10L, 1000000L))) // [1..5]∪[6..10] merges to all
    assert(got(3L) === ((3L, 0L, 0L)))
  }

  test("ngramJaccardPairsPrefix ≡ full inverted-index join on boilerplate-heavy docs") {
    val rnd = new scala.util.Random(20260814L)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val boiler = "subscribe to our newsletter for updates today"
    val docs = (0L until 40L).map { i =>
      val body = Seq.fill(4 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size)))
      val text = if (i % 3 == 0) boiler + " " + body.mkString(" ")
                 else body.mkString(" ")
      (i, text)
    }.toDF("doc_id", "text")
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select(col("a"), col("b"), round(col("jaccard"), 6).as("j"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
    val full = canon(Dedup.ngramJaccardPairs(docs, threshold = 0.3))
    val pref = canon(Dedup.ngramJaccardPairsPrefix(docs, threshold = 0.3))
    assert(pref === full)
    assert(full.nonEmpty) // the boilerplate docs must actually pair up
  }

  test("containmentPairs: subset doc scores 1.0 toward its superset, asymmetric back") {
    // doc 1's 3-gram shingles are a strict subset of doc 0's; doc 2 disjoint
    val docs = Seq(
      (0L, "a b c d e f g h"), // shingles: abc bcd cde def efg fgh (6)
      (1L, "a b c d e"),       // shingles: abc bcd cde (3) — all in doc 0
      (2L, "x y z w v")
    ).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, threshold = 0.1).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got((1L, 0L)) === 1.0)           // subset fully contained
    assert(got((0L, 1L)) === 0.5)           // 3/6 the other way
    assert(!got.contains((2L, 0L)) && !got.contains((0L, 2L))) // no shared shingle
  }

  test("containmentPairs: hot-shingle df-cap bounds candidates but keeps values exact") {
    // "a b c" (shingle abc) is in ALL four docs → df=4. With maxDocFreq=2
    // it generates no candidates; docs 0/1 still pair via their rare "d"/"e"
    // shingles and their containment is EXACT over the full sets (the hot
    // shingle still counts in the intersection), while docs 2/3 — whose
    // entire intersection is the hot shingle — are cut.
    val docs = Seq(
      (0L, "a b c d e f"),  // abc bcd cde def
      (1L, "a b c d e"),    // abc bcd cde — subset of doc 0
      (2L, "a b c x y"),    // abc bcx cxy
      (3L, "a b c p q")     // abc bcp cpq
    ).toDF("doc_id", "text")
    val capped = Dedup.containmentPairs(docs, threshold = 0.1, maxDocFreq = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(capped((1L, 0L)) === 1.0)   // 3/3, exact: hot shingle counted
    assert(capped((0L, 1L)) === 0.75)  // 3/4
    assert(!capped.contains((2L, 3L)) && !capped.contains((3L, 2L))) // all-hot cut
    // doc 2 vs 0/1 shares ONLY abc (hot) → also cut
    assert(!capped.keys.exists { case (s, d) => s == 2L || d == 2L })
    // cap disabled → the all-hot pairs come back, values unchanged elsewhere
    val full = Dedup.containmentPairs(docs, threshold = 0.1, maxDocFreq = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(full((1L, 0L)) === 1.0 && full((0L, 1L)) === 0.75)
    assert(full((2L, 3L)) === (1.0 / 3) && full((3L, 2L)) === (1.0 / 3))
    capped.foreach { case (k, v) => assert(full(k) === v) } // cap never changes a value
  }

  test("bm25TopDocs: tf raises score within a doc-length class; probe filter only") {
    val docs = Seq(
      (0L, "q q q a b c"),  // tf(q)=3
      (1L, "q a b c d e"),  // tf(q)=1, same length
      (2L, "a b c d e f")   // no probe term — must not appear
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.bm25TopDocs(docs, Seq("q"), k = 5).collect()
    assert(rows.forall(_.getString(0) == "q"))
    val byDoc = rows.map(r => r.getLong(1) -> (r.getDouble(2), r.getInt(3))).toMap
    assert(!byDoc.contains(2L))
    assert(byDoc(0L)._1 > byDoc(1L)._1)     // higher tf, equal dl → higher score
    assert(byDoc(0L)._2 == 1 && byDoc(1L)._2 == 2)
  }

  test("gopherRules: each rule flips on its own metric; keep is the conjunction") {
    val good = ("word " * 30 + "the of and that " + "alpha beta gamma delta " * 4).trim
    val docs = Seq(
      (0L, good),                            // passes everything
      (1L, "short doc the of"),              // fails word count
      (2L, good + " " + "##### ##### ##### ##### ##### ##### #####")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.gopherRules(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(0L).getAs[Int]("keep") == 1)
    assert(got(1L).getAs[Int]("ok_words") == 0 && got(1L).getAs[Int]("keep") == 0)
    assert(got(2L).getAs[Int]("ok_symbol") == 0 && got(2L).getAs[Int]("keep") == 0)
    assert(got(0L).getAs[Long]("stop_hits") >= 2)
  }

  test("topGramSignals ≡ driver-side reference on random small-vocab docs") {
    val rnd = new scala.util.Random(20260813L)
    val vocab = Vector("aa", "bb", "cc", "dd")
    val docs = (0L until 60L).map { i =>
      val n = rnd.nextInt(12) // includes degenerate 0/1/2-token docs
      (i, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val df = docs.toDF("doc_id", "text").repartition(7)
    val got = TextAnalysis.topGramSignals(df).collect()
      .map(r => r.getLong(0) ->
        ((Option(r.get(1)).map(_.toString), Option(r.get(2)).map(_.toString.toLong)),
         Option(r.get(3)).map(_.toString.toLong))).toMap
    docs.foreach { case (id, text) =>
      val (top2, dup3) = refRepetition(text)
      assert(got(id)._1._1 === top2.map(_._1), s"doc $id top2 gram, text='$text'")
      assert(got(id)._1._2 === top2.map(_._2), s"doc $id top2 ppm, text='$text'")
      assert(got(id)._2 === dup3, s"doc $id dup3 ppm, text='$text'")
    }
  }

  test("cdcChunkPairs df-cap drops a planted boilerplate chunk's pair blowup") {
    // 100 docs that are pure copies of one boilerplate text B (every chunk
    // fingerprint df = 100) + one genuine near-dup pair sharing text C.
    val boiler = "STANDARD LICENSE HEADER do not remove 0123456789 abcdefghij"
    val near = "the quick brown fox jumps over the lazy dog twice 9876543210"
    val docs = ((1L to 100L).map(i => (i, boiler)) ++
      Seq((2001L, near), (2002L, near))).toDF("doc_id", "text")
    // sanity: both fixtures yield ≥1 chunk long enough to index
    val fps = docs.select(col("doc_id"),
        explode(graft.functions.Poly64.cdcChunkInfoCol(col("text"))).as("c"))
      .filter(col("c.chunk_len") >= 16).groupBy(col("doc_id")).count()
    assert(fps.filter(col("doc_id") === 1L).head().getLong(1) >= 1)
    assert(fps.filter(col("doc_id") === 2001L).head().getLong(1) >= 1)

    // capped at 10: the df-100 boilerplate fingerprints leave the index —
    // none of the 100·99/2 boilerplate pairs materialize; the df-2 pair does
    val capped = Dedup.cdcChunkPairs(docs, minChunkLen = 16, maxDf = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(capped.keySet === Set((2001L, 2002L)))
    assert(capped((2001L, 2002L)) >= 1L)

    // cap above the planted df: the blowup is real (the hazard the cap
    // exists for) — all 4950 boilerplate pairs plus the genuine pair
    val uncapped = Dedup.cdcChunkPairs(docs, minChunkLen = 16, maxDf = 1000)
      .count()
    assert(uncapped === 100L * 99 / 2 + 1)
  }
}

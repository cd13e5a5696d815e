package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{MinHashExpression, Poly64}
import graft.pipeline.Dedup

/** Pins the Poly64 Rabin family (the SQL-oracle-reproducible hash path):
  * expression vs pure-Scala reference fold, codegen vs interpreted, band
  * buckets vs slice-fold, and that the poly MinHash/SimHash pipelines
  * cluster like the xxhash64 ones on the shared fixture. */
class Poly64Spec extends SparkSpec {
  import spark.implicits._

  private def refHash(s: String, seed: Long, mult: Long): Long = {
    var h = seed; var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i); h = h * mult + cp; i += Character.charCount(cp)
    }
    h
  }

  test("Poly64.hash matches the reference fold, incl. non-ASCII and empty") {
    for (s <- Seq("", "a", "abc", "the quick brown", "für müller", "emoji 😀 tail")) {
      assert(Poly64.hash(UTF8String.fromString(s), Poly64.Seed1, Poly64.Mult1)
        === refHash(s, Poly64.Seed1, Poly64.Mult1), s"mismatch for '$s'")
    }
    // known value cross-checked against the DuckDB HUGEINT fold
    assert(refHash("abc", Poly64.Seed1, Poly64.Mult1) === 1303245632640703849L)
  }

  test("poly64 column expression equals driver-side hash (codegen path)") {
    val rows = Seq("alpha", "beta gamma", "", "für", "x").toDF("s")
      .withColumn("h", Poly64.poly64(col("s")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { case (s, h) =>
      assert(h === refHash(s, Poly64.Seed1, Poly64.Mult1), s"'$s'")
    }
  }

  test("poly MinHash signature slots derive from the two Poly64 hashes") {
    val df = Seq(Tuple1(Seq("aa", "bb", "cc"))).toDF("sh")
      .withColumn("sig", MinHashExpression.minHashSignature(col("sh"), 8, poly = true))
    val sig = df.select("sig").head().getSeq[Long](0)
    val hs = Seq("aa", "bb", "cc").map { s =>
      (refHash(s, Poly64.Seed1, Poly64.Mult1),
        refHash(s, Poly64.Seed2, Poly64.Mult2) | 1L)
    }
    val expect = (0 until 8).map(i => hs.map { case (h1, h2) => h1 + i * h2 }.min)
    assert(sig === expect)
  }

  test("band buckets equal the seeded base-31 fold of each band's slots") {
    val sig = (1L to 64L).map(i => i * 0x9E3779B97F4A7C15L) // arbitrary slots
    val out = Seq(Tuple1(sig)).toDF("sig")
      .withColumn("bk", MinHashExpression.bandBuckets(col("sig"), 16, 4))
      .select("bk").head().getSeq[Long](0)
    val expect = (0 until 16).map { b =>
      sig.slice(b * 4, b * 4 + 4).foldLeft((b + 1).toLong)((acc, x) => acc * 31L + x)
    }
    assert(out === expect)
  }

  def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank yesterday"),
    (3L, "completely different content about database engines and query planning"),
    (4L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (5L, "der schnelle braune fuchs springt mit der über den faulen hund und")
  ).toDF("doc_id", "text")

  test("poly MinHash LSH clusters near-dups like the xx family") {
    val out = Dedup.minHashLSH(docs, threshold = 0.5, poly = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) === 1L); assert(out(2L) === 1L); assert(out(4L) === 1L)
    assert(out(3L) === 3L); assert(out(5L) === 5L)
  }

  test("poly SimHash dedup clusters like the xx family") {
    val out = Dedup.simHashDedup(docs, maxHamming = 3, poly = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) === 1L && out(4L) === 1L)
    assert(out(3L) === 3L)
  }

  test("Rademacher hyperplane bucket: deterministic, near vectors co-bucket") {
    val vecs = Seq(
      (1L, Array(1.0, 0.0, 0.0, 0.0)),
      (2L, Array(0.999, 0.001, 0.0, 0.0)), // ~same direction as 1
      (3L, Array(-1.0, 0.0, 0.0, 0.0))     // antipodal
    ).toDF("vec_id", "embedding")
    val b = vecs.select(col("vec_id"),
      graft.pipeline.Ann.hyperplaneBucket(col("embedding"), 8).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b(1L) === b(2L))
    assert(b(1L) !== b(3L)) // all 8 sign bits flip for the antipode
    // re-evaluation is bit-identical (no RNG state)
    val b2 = vecs.select(col("vec_id"),
      graft.pipeline.Ann.hyperplaneBucket(col("embedding"), 8).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b === b2)
  }

  /** Driver-side reference: per-window Poly64 fold (no rolling update),
    * distinct, signed sort, first `maxOut`. */
  private def refFingerprints(s: String, k: Int, maxOut: Int): Seq[Long] = {
    val cps = s.codePoints().toArray
    val windows =
      if (cps.length <= k) Seq(cps.toSeq)
      else (0 to cps.length - k).map(i => cps.slice(i, i + k).toSeq)
    windows.map(_.foldLeft(Poly64.Seed1)((h, cp) => h * Poly64.Mult1 + cp))
      .distinct.sorted.take(maxOut)
  }

  test("rolling fingerprints match the per-window fold reference") {
    val rnd = new scala.util.Random(7)
    val samples = Seq("", "a", "short", "exactly8", "just over eight",
      "für müller und die straße", "emoji 😀 in the 𝄞 middle") ++
      (1 to 40).map(_ => rnd.alphanumeric.take(rnd.nextInt(60)).mkString(" ").trim)
    for (s <- samples; k <- Seq(3, 8); n <- Seq(4, 16)) {
      val got = Poly64.rollingFingerprints(UTF8String.fromString(s), k, n,
        Poly64.Seed1, Poly64.Mult1).toLongArray().toSeq
      assert(got === refFingerprints(s, k, n), s"'$s' k=$k n=$n")
    }
  }

  test("rolling fingerprints column path: stable under local edits, explode-gated shape") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"), // local edit
      (3L, "completely unrelated content here"),
      (4L, ""), (5L, "hi")
    ).toDF("doc_id", "text")
    val fps = df.select(col("doc_id"),
      graft.pipeline.TextAnalysis.robustFingerprintsPoly(col("text"), 8, 16).as("fps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // winnowing robustness: one-word edit keeps most minima in common
    val common = fps(1L).toSet.intersect(fps(2L).toSet).size
    assert(common >= 8, s"expected >=8 shared fingerprints, got $common")
    assert(fps(1L).toSet.intersect(fps(3L).toSet).size <= 2)
    // empty doc → [seed]; short doc → single whole-string fold
    assert(fps(4L) === Seq(Poly64.Seed1))
    assert(fps(5L).length === 1)
    // ascending signed order
    fps.values.foreach(v => assert(v === v.sorted))
  }

  // ---- content-defined chunking -------------------------------------------

  /** Independent slow reference: full Poly64 fold per window (no rolling),
    * then the cut scan with min/max guards. */
  private def refCdc(s: String, k: Int, maskBits: Int,
                     minLen: Int, maxLen: Int): Seq[Long] = {
    val cps = s.codePoints().toArray
    val mask = (1L << maskBits) - 1
    val lens = scala.collection.mutable.ArrayBuffer.empty[Long]
    var lastCut = -1
    for (end <- cps.indices) {
      val curLen = end - lastCut
      val windowHash = if (end >= k - 1) {
        var h = Poly64.Seed1
        ((end - k + 1) to end).foreach(j => h = h * Poly64.Mult1 + cps(j))
        Some(h)
      } else None
      if (curLen >= maxLen ||
          windowHash.exists(h => (h & mask) == 0 && curLen >= minLen)) {
        lens += curLen.toLong; lastCut = end
      }
    }
    if (cps.length - 1 > lastCut) lens += (cps.length - 1 - lastCut).toLong
    lens.toSeq
  }

  test("cdcChunkLengths matches the non-rolling reference, guards included") {
    val rnd = new scala.util.Random(3)
    val alphabet = "abcdef \n"
    val strs = Seq("", "a", "short", "x" * 7, "y" * 8) ++
      (0 until 40).map(_ => (0 until (50 + rnd.nextInt(400)))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    for (s <- strs; (mb, mn, mx) <- Seq((4, 1, Int.MaxValue), (3, 4, 16), (5, 2, 40))) {
      val got = Poly64.cdcChunkLengths(
        org.apache.spark.unsafe.types.UTF8String.fromString(s), 8, mb, mn, mx)
        .toLongArray.toSeq
      assert(got === refCdc(s, 8, mb, mn, mx), s"mb=$mb mn=$mn mx=$mx s=${s.take(30)}")
      assert(got.sum === s.codePointCount(0, s.length))
      if (s.nonEmpty) assert(got.forall(l => l >= 1 && l <= mx))
    }
  }

  test("cdcChunkInfo: lengths match cdcChunkLengths, fps are the chunk substring folds") {
    val rnd = new scala.util.Random(17)
    val strs = Seq("", "tiny", "x" * 100) ++ (0 until 20).map(_ =>
      (0 until (30 + rnd.nextInt(300)))
        .map(_ => ('a' + rnd.nextInt(8)).toChar).mkString)
    for (s <- strs) {
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(s)
      val lens = Poly64.cdcChunkLengths(u, 8, 5, 1, Int.MaxValue).toLongArray.toSeq
      val info = Poly64.cdcChunkInfo(u, 8, 5, 1, Int.MaxValue)
      val rows = (0 until info.numElements).map(i => info.getStruct(i, 2))
      assert(rows.map(_.getLong(0)) === lens)
      // each fp is the plain Poly64 fold of that chunk's substring
      var off = 0
      rows.foreach { r =>
        val chunk = s.substring(off, off + r.getLong(0).toInt)
        assert(r.getLong(1) === refHash(chunk, Poly64.Seed1, Poly64.Mult1),
          s"fp mismatch for chunk '$chunk'")
        off += r.getLong(0).toInt
      }
      assert(off === s.length)
    }
  }

  test("shared-chunk dedup finds a planted common paragraph, column path") {
    val para = "the shared paragraph that both documents quote verbatim " * 3
    val docs = Seq(
      (1L, "unique preamble one " + para + " unique tail one"),
      (2L, "a different beginning " + para + " and a different end"),
      (3L, "completely unrelated content with nothing in common at all"))
      .toDF("doc_id", "text")
    val ch = docs.select(col("doc_id"),
        explode(graft.functions.Poly64.cdcChunkInfoCol(col("text"))).as("c"))
      .filter(col("c.chunk_len") >= 16)
      .select(col("doc_id"), col("c.chunk_fp").as("fp")).distinct()
    val pairs = ch.as("x").join(ch.as("y"),
        col("x.fp") === col("y.fp") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id"), col("y.doc_id"))
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), s"planted shared paragraph not found: $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("CDC chunk stream resynchronizes after an insertion (the point of CDC)") {
    val rnd = new scala.util.Random(9)
    val s = (0 until 2000).map(_ => ('a' + rnd.nextInt(6)).toChar).mkString
    val mutated = s.substring(0, 700) + "ZQX" + s.substring(700)
    def chunks(x: String) = Poly64.cdcChunkLengths(
      org.apache.spark.unsafe.types.UTF8String.fromString(x), 8, 5, 1,
      Int.MaxValue).toLongArray.toSeq
    val (c1, c2) = (chunks(s), chunks(mutated))
    // all boundaries at least one window past the edit are preserved: the
    // suffix chunk streams coincide, only the edited chunk (and maybe its
    // immediate neighbor) differ — fixed-size chunking would shift EVERY
    // downstream chunk
    val prefix = c1.zip(c2).takeWhile { case (a, b) => a == b }.length
    val suffix = c1.reverse.zip(c2.reverse).takeWhile { case (a, b) => a == b }.length
    // everything aligns except the edited chunk (and at most one neighbor
    // while the window re-fills): prefix + suffix cover all but ≤ 2 chunks
    assert(prefix + suffix >= c1.length - 2,
      s"chunk streams failed to resync: ${c1.length} chunks, " +
        s"prefix=$prefix suffix=$suffix")
    assert(c2.sum === c1.sum + 3)
  }

  test("mix64 column path equals Poly64.mix; bijective on a sample") {
    import spark.implicits._
    import graft.functions.Poly64
    val vals = Seq(0L, 1L, -1L, Long.MinValue, Long.MaxValue, 42L,
      1234567890123L, -987654321L)
    val got = vals.toDF("h").repartition(3)
      .select(col("h"), Poly64.mix64(col("h")).as("m")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    vals.foreach(v => assert(got(v) === Poly64.mix(v), s"mix64($v)"))
    // xorshift and odd-multiply rounds are each invertible mod 2^64
    assert(got.values.toSet.size === vals.size)
  }

  test("unicode normalization: composition, idempotence, fast-path identity") {
    import spark.implicits._
    import graft.functions.NormalizeExpression._
    val decomposed = "cafe\u0301 A\u030A"
    val composed = "caf\u00E9 \u00C5"
    val rows = Seq((1L, decomposed), (2L, composed), (3L, "plain ascii"),
      (4L, null.asInstanceOf[String]), (5L, "😀 emoji"))
    val out = rows.toDF("id", "s").repartition(2)
      .select(col("id"), nfc(col("s")).as("c"), nfd(col("s")).as("d"),
        nfkc(col("s")).as("kc")).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2), r.getString(3)))
      .toMap
    assert(out(1L)._1 === composed)                      // NFC composes
    assert(out(2L)._1 === composed)                      // already-NFC unchanged
    assert(out(1L)._2 === out(2L)._2)                    // NFD agrees both ways
    assert(out(3L) === (("plain ascii", "plain ascii", "plain ascii")))
    assert(out(4L) === ((null, null, null)))
    assert(out(5L)._1 === "😀 emoji")          // non-BMP passthrough
    // idempotence via the Java reference
    assert(java.text.Normalizer.normalize(out(1L)._1,
      java.text.Normalizer.Form.NFC) === out(1L)._1)
  }

  test("GramHashes: window hashes equal the per-token reference fold; " +
       "short docs empty; equal windows collide exactly") {
    import graft.functions.GramHash
    val toks = Seq("the", "quick", "brown", "fox", "the", "quick", "brown", "fox")
    val got = Seq(Tuple1(toks)).toDF("t")
      .select(GramHash.gramHashes(col("t"), 3).as("g"))
      .head().getSeq[Long](0)
    assert(got.size === 6) // 8 - 3 + 1
    // reference: per-token mix64(poly64), then the shared window fold
    val th = toks.map(s =>
      Poly64.mix(refHash(s, Poly64.Seed1, Poly64.Mult1))).toArray
    val expect = (0 until 6).map { p =>
      var h = Poly64.Seed2
      (0 until 3).foreach(j => h = h * Poly64.Mult2 + th(p + j))
      h
    }
    assert(got === expect)
    // positional semantics: windows 0 and 4 are the same token sequence
    assert(got(0) === got(4))
    assert(got(0) !== got(1))
    // short-doc and null-token conventions
    val edge = Seq(Tuple1(Seq("a", "b")), Tuple1(Seq[String]("a", null, "c")))
      .toDF("t").select(GramHash.gramHashes(col("t"), 3).as("g"))
      .collect().map(_.getSeq[Long](0))
    assert(edge(0).isEmpty) // 2 tokens < n=3
    val nullAsEmpty = {
      val h = Seq("a", "", "c").map(s =>
        Poly64.mix(refHash(s, Poly64.Seed1, Poly64.Mult1)))
      var g = Poly64.Seed2; h.foreach(x => g = g * Poly64.Mult2 + x); g
    }
    assert(edge(1) === Seq(nullAsEmpty))
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Dedup

/**
 * Quantified recall/precision of the banded MinHash-LSH candidate stage
 * against EXACT shingle-Jaccard ground truth on a corpus with planted
 * near-duplicates of controlled overlap.
 *
 * With the production defaults (64 hashes, 16 bands × 4 rows) the s-curve
 * P[candidate | J=s] = 1 − (1 − s⁴)¹⁶ gives ≥ 0.988 at s = 0.7 and
 * ≥ 0.9998 at s = 0.8 — the assertions below leave slack for MinHash
 * estimation variance but would catch any banding/joining regression that
 * actually loses candidates (e.g. a wrong band slice or bucket hash).
 */
class LshRecallSpec extends SparkSpec {
  import spark.implicits._

  private val NumHashes = 64
  private val Bands = 16
  private val RowsPerBand = NumHashes / Bands

  /** 150 base docs of 60 tokens + one mutated near-dup each (0–14 token
    * substitutions → exact Jaccard spread over ~[0.55, 1.0]). */
  private lazy val corpus: Seq[(Long, String)] = {
    val rnd = new scala.util.Random(20260813L)
    val vocab = (0 until 400).map(i => s"t$i")
    (0 until 150).flatMap { i =>
      val base = Array.fill(60)(vocab(rnd.nextInt(vocab.size)))
      val mutated = base.clone()
      val subs = i % 15
      (0 until subs).foreach { _ =>
        mutated(rnd.nextInt(mutated.length)) = vocab(rnd.nextInt(vocab.size))
      }
      Seq((i.toLong, base.mkString(" ")),
          (1000L + i, mutated.mkString(" ")))
    }
  }

  private def shingleSet(text: String): Set[String] =
    text.split(" ").sliding(3).map(_.mkString(" ")).toSet

  private def exactJaccard(a: String, b: String): Double = {
    val (sa, sb) = (shingleSet(a), shingleSet(b))
    if (sa.isEmpty && sb.isEmpty) 1.0
    else (sa & sb).size.toDouble / (sa | sb).size
  }

  test("banded LSH candidate recall ≥ 0.95 at exact Jaccard ≥ 0.7") {
    val byId = corpus.toMap
    // ground truth: all pairs with exact J ≥ 0.7. Only planted (i, 1000+i)
    // pairs can qualify (random 60-token docs over 400 tokens don't collide),
    // but compute honestly over planted pairs to get the per-pair J.
    val truth = corpus.collect { case (id, text) if id < 1000 =>
      val j = exactJaccard(text, byId(id + 1000))
      (id, id + 1000L, j)
    }
    val truthHi = truth.filter(_._3 >= 0.7).map(t => (t._1, t._2)).toSet
    assert(truthHi.size >= 40, s"fixture degenerate: ${truthHi.size} true pairs")

    val sigs = corpus.toDF("id", "text")
      .select(col("id"), Dedup.wordShingles(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("id"), Dedup.minHashSignature(col("sh"), NumHashes).as("sig"))
    val cands = Dedup.lshCandidates(sigs, "id", "sig", Bands, RowsPerBand)
      .as[(Long, Long)].collect().toSet

    val recalled = truthHi.count(cands.contains)
    val recall = recalled.toDouble / truthHi.size
    assert(recall >= 0.95, s"candidate recall $recall ($recalled/${truthHi.size})")
  }

  test("verified pairs at threshold 0.7 have exact Jaccard near or above it") {
    val sigs = corpus.toDF("id", "text")
      .select(col("id"), Dedup.wordShingles(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("id"), Dedup.minHashSignature(col("sh"), NumHashes).as("sig"))
    val cands = Dedup.lshCandidates(sigs, "id", "sig", Bands, RowsPerBand)
    val verified = cands
      .join(sigs.toDF("a", "sigA"), Seq("a"))
      .join(sigs.toDF("b", "sigB"), Seq("b"))
      .filter(Dedup.estimatedJaccard(col("sigA"), col("sigB")) >= 0.7)
      .select(col("a"), col("b")).as[(Long, Long)].collect()

    assert(verified.length >= 40, s"only ${verified.length} verified pairs")
    val byId = corpus.toMap
    // 64-hash estimator σ ≈ √(s(1−s)/64) ≈ 0.06 at s = 0.7: an estimated
    // 0.7 with exact J below 0.45 would be a > 4σ miss — estimator broken
    verified.foreach { case (a, b) =>
      val j = exactJaccard(byId(a), byId(b))
      assert(j >= 0.45, s"pair ($a,$b) verified at est ≥ 0.7 but exact J = $j")
    }
  }
}

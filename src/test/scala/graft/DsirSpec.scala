package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.Poly64
import graft.pipeline.Curation

/** DSIR importance resampling: weights match an independent driver-side
  * reference (same hashing/smoothing/quantization math, scala collections
  * instead of DataFrames), selection is the exact (weight DESC, id ASC)
  * top-k, and the semantics point the right way — target-like documents
  * outweigh raw-typical ones. */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  // three "english" docs over one vocabulary, two "german" target docs
  // over a partially overlapping one
  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog", "en"),
    (1L, "the fast red fox runs past the calm dog", "en"),
    (2L, "a quiet brown bird sits near the old tree", "en"),
    (3L, "der schnelle braune fuchs springt hoch", "de"),
    (4L, "der alte hund schläft unter dem baum", "de"))

  private def refWeights(bn: Int = 64): Map[Long, Long] = {
    val toks = docs.flatMap { case (id, text, lang) =>
      text.trim.toLowerCase.split("\\s+").map(t => (id, lang != "en",
        java.lang.Math.floorMod(
          Poly64.hash(UTF8String.fromString(t), Poly64.Seed1, Poly64.Mult1), bn.toLong)))
    }
    val raw = toks.groupBy(_._3).map { case (b, xs) => b -> xs.size.toLong }
    val tgt = toks.filter(_._2).groupBy(_._3).map { case (b, xs) => b -> xs.size.toLong }
    val rawN = toks.size.toLong
    val tgtN = toks.count(_._2).toLong
    val delta = raw.map { case (b, rc) =>
      val x = (math.log((tgt.getOrElse(b, 0L) + 1).toDouble / (tgtN + bn))
        - math.log((rc + 1).toDouble / (rawN + bn))) * 1e6
      // Spark round() is BigDecimal HALF_UP (away from zero) — not Math.round
      b -> BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    toks.groupBy(_._1).map { case (id, xs) => id -> xs.map(x => delta(x._3)).sum }
  }

  test("dsirWeights matches the driver-side reference exactly") {
    val got = Curation.dsirWeights(docs.toDF("doc_id", "text", "lang"),
        col("lang") =!= "en")
      .as[(Long, Long)].collect().toMap
    assert(got === refWeights())
  }

  test("target-slice documents outweigh raw-typical ones") {
    val w = refWeights()
    val deMin = Seq(3L, 4L).map(w).min
    val enMax = Seq(0L, 1L, 2L).map(w).max
    assert(deMin > enMax,
      s"german docs should score above english ones: $w")
  }

  test("dsirSample is the exact (weight DESC, id ASC) top-k prefix") {
    val df = docs.toDF("doc_id", "text", "lang")
    val w = refWeights()
    val order = w.toSeq.sortBy { case (id, wt) => (-wt, id) }.map(_._1)
    for (k <- 1 to 5) {
      val got = Curation.dsirSample(df, col("lang") =!= "en", k)
        .as[(Long, Long)].collect()
      assert(got.map(_._1).toSet === order.take(k).toSet, s"k=$k")
      assert(got.toMap.forall { case (id, wt) => w(id) == wt }, s"k=$k weights")
    }
  }

  test("exactQuantiles = sorted-rank reference on random doubles (incl. ties)") {
    val rnd = new scala.util.Random(7)
    // heavy ties (quantized values) + a few outliers to stretch the range
    val xs = Seq.fill(5000)(math.floor(rnd.nextGaussian() * 50) / 10.0) ++
      Seq(1e6, -1e6)
    val probs = Seq(0.01, 0.1, 0.5, 0.9, 0.999, 1.0)
    val got = Curation.exactQuantiles(xs.toDF("x"), "x", probs, numBuckets = 64)
      .as[(Double, Double)].collect().toMap
    val sorted = xs.sorted
    val want = probs.map(p =>
      p -> sorted(math.max(1, math.ceil(p * xs.size).toLong).toInt - 1)).toMap
    assert(got === want)
  }

  test("exactQuantiles: nulls excluded, NaN rejected, empty input empty output") {
    val withNull = Seq(Some(3.0), None, Some(1.0), Some(2.0)).toDF("x")
    val q = Curation.exactQuantiles(withNull, "x", Seq(0.5, 1.0))
      .as[(Double, Double)].collect().toMap
    assert(q === Map(0.5 -> 2.0, 1.0 -> 3.0))
    intercept[IllegalArgumentException] {
      Curation.exactQuantiles(Seq(1.0, Double.NaN).toDF("x"), "x", Seq(0.5))
    }
    assert(Curation.exactQuantiles(Seq.empty[Double].toDF("x"), "x", Seq(0.5))
      .collect().isEmpty)
  }

  test("exactQuantilesPerGroup = per-group sorted-rank reference") {
    val rnd = new scala.util.Random(11)
    val rows = for (i <- 0 until 3000) yield
      (s"g${i % 3}", math.floor(rnd.nextGaussian() * 40) / 8.0)
    val probs = Seq(0.1, 0.5, 0.95, 1.0)
    val got = Curation.exactQuantilesPerGroup(rows.toDF("g", "x"), "g", "x",
        probs, numBuckets = 32)
      .as[(String, Double, Double)].collect()
      .map { case (g, p, v) => (g, p) -> v }.toMap
    val want = rows.groupBy(_._1).flatMap { case (g, xs) =>
      val sorted = xs.map(_._2).sorted
      probs.map(p => (g, p) ->
        sorted(math.max(1, math.ceil(p * xs.size).toLong).toInt - 1))
    }
    assert(got === want)
  }

  test("exactQuantiles: constant column collapses every p to the constant") {
    val got = Curation.exactQuantiles(Seq.fill(100)(42.0).toDF("x"), "x",
      Seq(0.1, 0.5, 1.0), numBuckets = 16).as[(Double, Double)].collect().toMap
    assert(got === Map(0.1 -> 42.0, 0.5 -> 42.0, 1.0 -> 42.0))
  }

  test("weightedSample matches the A-ES reference and favors heavy weights") {
    val rows = (0L until 400L).map(i => (i, if (i < 40) 50.0 else 1.0))
    val df = rows.toDF("doc_id", "w")
    def refKey(id: Long, w: Double, salt: String): Long = {
      val h = java.lang.Math.floorMod(
        Poly64.hash(UTF8String.fromString(s"$id$salt"), Poly64.Seed1,
          Curation.saltMult(salt)), 1L << 52)
      val u = (h + 1).toDouble / (1L << 52).toDouble
      BigDecimal(math.log(u) / w * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    val k = 50
    val got = Curation.weightedSample(df, "w", k).as[(Long, Long)].collect()
    val want = rows.map { case (id, w) => (id, refKey(id, w, "ws:")) }
      .sortBy { case (id, key) => (-key, id) }.take(k)
    assert(got.sortBy(x => (-x._2, x._1)).toSeq === want)
    // heavy rows are 10% of the population but weight-50× — across several
    // salts they should dominate the sample
    val heavyFracs = Seq("a:", "b:", "c:").map { s =>
      val picked = Curation.weightedSample(df, "w", k, salt = s)
        .as[(Long, Long)].collect().map(_._1)
      picked.count(_ < 40).toDouble / k
    }
    assert(heavyFracs.forall(_ > 0.4),
      s"50x-weighted 10% slice under-sampled: $heavyFracs")
    // zero/negative/null weights never sampled
    val withBad = rows.toDF("doc_id", "w")
      .union(Seq((999L, 0.0), (998L, -3.0)).toDF("doc_id", "w"))
    val ids = Curation.weightedSample(withBad, "w", 500).as[(Long, Long)]
      .collect().map(_._1).toSet
    assert(!ids.contains(999L) && !ids.contains(998L) && ids.size == 400)
  }

  test("winsorize composition: exactQuantiles thresholds clip exactly") {
    val xs = (1 to 200).map(_.toDouble)
    val df = xs.toDF("x")
    val thr = Curation.exactQuantiles(df, "x", Seq(0.05, 0.95))
      .as[(Double, Double)].collect().toMap
    assert(thr === Map(0.05 -> 10.0, 0.95 -> 190.0)) // ceil(p*200)-th value
    val clipped = df.select(
        least(greatest(col("x"), lit(thr(0.05))), lit(thr(0.95))).as("c"))
      .as[Double].collect().sorted
    assert(clipped.head === 10.0 && clipped.last === 190.0)
    assert(clipped.count(_ == 10.0) === 10 && clipped.count(_ == 190.0) === 11)
    // interior untouched
    assert(clipped.filter(c => c > 10 && c < 190).toSeq === (11 to 189).map(_.toDouble))
  }

  test("plan: quantile ranking window is fed by the candidate-bucket filter") {
    // the rank window's shuffle must sit ABOVE the bucket prefilter so only
    // candidate-bucket rows (~n/numBuckets each) ever reach the sort — an
    // unfiltered exchange would be the global-sort plan this op exists to
    // avoid
    // spark.range source: a local-collection input constant-folds the
    // filter into the LocalTableScan and hides the shape under test
    val df = spark.range(1, 10001).select(col("id").cast("double").as("x"))
    val q = Curation.exactQuantiles(df, "x", Seq(0.25, 0.75), numBuckets = 128)
    val plan = q.queryExecution.executedPlan.toString
    val ex = plan.indexOf("Exchange hashpartitioning(_b")
    assert(ex >= 0, s"expected the window's bucket exchange:\n$plan")
    // treeString prints parent before child: the bucket IN-prefilter must
    // sit BELOW the window exchange (only candidate buckets are shuffled)
    val filt = plan.indexOf("Filter", ex)
    assert(filt > ex && plan.indexOf(" IN (", ex) > ex,
      s"window exchange not fed by the bucket prefilter:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1, plan)
  }

  test("dsirWeightsBigrams matches a driver reference and is word-order-" +
       "sensitive where the unigram weights provably tie") {
    // target domain is PHRASE-structured: "new york" as a unit; the decoy
    // doc carries the identical token multiset in scrambled order
    val phrased = Seq(
      (0L, "new york is big and new york is old", "tg"),
      (1L, "new york has new parks", "tg"),
      (2L, "york new is big and york new is old", "raw"),  // scrambled twin of 0
      (3L, "quiet brown bird near tree", "raw"),
      (4L, "new york wins again", "raw"))
    val df = phrased.toDF("doc_id", "text", "lang")
    val uni = Curation.dsirWeights(df, col("lang") === "tg")
      .as[(Long, Long)].collect().toMap
    val bi = Curation.dsirWeightsBigrams(df, col("lang") === "tg")
      .as[(Long, Long)].collect().toMap
    // unigram: doc 2 is indistinguishable from doc 0 (same multiset)
    assert(uni(0L) === uni(2L))
    // bigram: the phrase order separates them — doc 0 (target phrasing)
    // outweighs its scrambled twin
    assert(bi(0L) > bi(2L), s"bigram weights must split the twins: $bi")
    // and the doc that uses the target phrase outranks the unrelated one
    assert(bi(4L) > bi(3L))
    // driver reference over the union feature stream (unigrams + adjacent
    // bigrams), same hash/smoothing/quantization math
    val bn = 64
    val feats = phrased.flatMap { case (id, text, lang) =>
      val ts = text.trim.toLowerCase.split("\\s+").toSeq
      (ts ++ ts.sliding(2).filter(_.size == 2).map(_.mkString(" ")))
        .map(t => (id, lang == "tg",
          java.lang.Math.floorMod(
            Poly64.hash(UTF8String.fromString(t), Poly64.Seed1, Poly64.Mult1),
            bn.toLong)))
    }
    val raw = feats.groupBy(_._3).map { case (b, xs) => b -> xs.size.toLong }
    val tgt = feats.filter(_._2).groupBy(_._3).map { case (b, xs) => b -> xs.size.toLong }
    val rawN = feats.size.toLong; val tgtN = feats.count(_._2).toLong
    val delta = raw.map { case (b, rc) =>
      val x = (math.log((tgt.getOrElse(b, 0L) + 1).toDouble / (tgtN + bn))
        - math.log((rc + 1).toDouble / (rawN + bn))) * 1e6
      b -> BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    val want = feats.groupBy(_._1).map { case (id, xs) => id -> xs.map(x => delta(x._3)).sum }
    assert(bi === want)
  }

  test("empty target slice degrades gracefully (uniform target prior)") {
    val df = docs.toDF("doc_id", "text", "lang")
    val got = Curation.dsirWeights(df, col("lang") === "xx")
      .as[(Long, Long)].collect().toMap
    // tgt counts all zero → delta depends only on raw distribution; every
    // doc still gets a finite weight
    assert(got.keySet === Set(0L, 1L, 2L, 3L, 4L))
  }
}

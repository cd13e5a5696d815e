package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Sketches

/** Misra–Gries heavy hitters: the no-false-negative guarantee, genuine
  * candidate pruning on a long-tail stream (the case the driver's uniform
  * synthetic corpus cannot exercise), merge associativity, and the exact
  * two-pass result vs a brute-force groupBy. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  /** 5 hot keys (2_000 rows each) + 20_000 singleton tail keys, shuffled
    * deterministically across partitions: n = 30_000. */
  private def longTail = {
    val hot = (0 until 5).flatMap(h => Seq.fill(2000)(s"hot$h"))
    val tail = (0 until 20000).map(i => s"tail$i")
    // interleave by a fixed permutation so hot keys hit every partition
    val rows = (hot ++ tail).zipWithIndex
      .sortBy { case (_, i) => (i * 2654435761L) % 4294967296L }
      .map(_._1)
    spark.createDataset(rows).repartition(8).toDF("k")
  }

  test("long-tail stream: candidates bounded by capacity, hot keys never evicted") {
    val st = Sketches.misraGriesSummary(longTail, "k", capacity = 32)
    assert(st.n === 30000L)
    assert(st.counts.size <= 32, s"summary exceeded capacity: ${st.counts.size}")
    // every key with freq > n/(cap+1) = 909 must survive — all 5 hot keys
    (0 until 5).foreach(h => assert(st.counts.contains(s"hot$h"),
      s"hot$h (freq 2000 > n/33) was evicted"))
    // estimates never overshoot and undershoot by at most n/(cap+1)
    st.counts.foreach { case (k, c) =>
      val truth = if (k.startsWith("hot")) 2000L else 1L
      assert(c <= truth, s"$k overestimated: $c > $truth")
      assert(truth - c <= 30000L / 33, s"$k deficit ${truth - c} > n/(m+1)")
    }
  }

  test("heavyHitters = brute-force φ-frequent set on the long-tail stream") {
    val df = longTail
    // φ = 1/20: threshold 1500 — exactly the 5 hot keys
    val got = Sketches.heavyHitters(df, "k", phiDenom = 20)
      .as[(String, Long)].collect().toMap
    val brute = df.groupBy("k").count().as[(String, Long)].collect()
      .filter(_._2 * 20 > 30000).toMap
    assert(got === brute)
    assert(got === (0 until 5).map(h => s"hot$h" -> 2000L).toMap)
  }

  test("heavyHittersByGroup = per-group brute force on skewed, unequal groups") {
    // three groups of very different sizes and different hot keys: a key
    // that is heavy in its small group must surface even though it is
    // globally rare, and a globally-common key must NOT surface in a
    // group where it is below threshold
    val rows =
      Seq.fill(400)(("big", "the")) ++ Seq.fill(120)(("big", "cat")) ++
        (0 until 3000).map(i => ("big", s"t$i")) ++
        Seq.fill(30)(("small", "niche")) ++ (0 until 70).map(i => ("small", s"s$i")) ++
        Seq.fill(3)(("small", "the")) ++ // "the" is NOT heavy in `small` (φ=1/10 → >10.3)
        Seq.fill(9)(("mid", "mm")) ++ (0 until 80).map(i => ("mid", s"m$i"))
    val df = spark.createDataset(new scala.util.Random(7).shuffle(rows))
      .repartition(8).toDF("g", "k")
    val got = Sketches.heavyHittersByGroup(df, "g", "k", phiDenom = 10)
      .as[(String, String, Long)].collect().toSet
    val brute = df.groupBy("g", "k").count()
      .join(df.groupBy("g").agg(count(lit(1)).as("n")), "g")
      .filter(col("count") * 10 > col("n"))
      .select(col("g"), col("k"), col("count"))
      .as[(String, String, Long)].collect().toSet
    assert(got === brute)
    assert(got.map { case (g, k, _) => (g, k) } ===
      Set(("big", "the"), ("small", "niche"), ("mid", "mm")))
  }

  test("heavyHittersByGroup: NULL group/key rows skipped, schema named, " +
       "empty input empty") {
    val df = Seq(
      (Some("g1"), Some("a")), (Some("g1"), Some("a")), (Some("g1"), Some("b")),
      (None: Option[String], Some("a")), (Some("g1"), None: Option[String]))
      .toDF("src", "tok")
    val out = Sketches.heavyHittersByGroup(df, "src", "tok", phiDenom = 2)
    assert(out.columns.toSeq === Seq("src", "tok", "cnt"))
    // g1 has 3 non-null rows: a(2)*2 > 3 heavy, b(1)*2 < 3 not; null rows
    // form no group
    assert(out.as[(String, String, Long)].collect().toSet ===
      Set(("g1", "a", 2L)))
    val empty = Seq.empty[(String, String)].toDF("src", "tok")
    assert(Sketches.heavyHittersByGroup(empty, "src", "tok", phiDenom = 2)
      .collect().isEmpty)
  }

  test("merge is associative-safe: split-fold equals whole-fold guarantee") {
    val agg = new Sketches.MisraGries(8)
    val xs = (0 until 600).map(i => s"a${i % 3}") ++ // 3 hot keys, 200 each
      (0 until 500).map(i => s"t$i")
    val whole = xs.foldLeft(agg.zero)(agg.reduce)
    val (l, r) = xs.splitAt(257)
    val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce),
      r.foldLeft(agg.zero)(agg.reduce))
    for (st <- Seq(whole, merged)) {
      assert(st.n === 1100L)
      assert(st.counts.size <= 8)
      // freq 200 > n/(m+1) = 122 → all three hot keys present either way
      (0 until 3).foreach(h => assert(st.counts.contains(s"a$h")))
    }
  }

  test("empty and sub-threshold inputs yield empty results with the right schema") {
    val empty = Seq.empty[String].toDF("k")
    assert(Sketches.heavyHitters(empty, "k", phiDenom = 10).collect().isEmpty)
    // 5 distinct keys × 1 row: nothing exceeds n/2
    val tiny = Seq("a", "b", "c", "d", "e").toDF("k")
    val out = Sketches.heavyHitters(tiny, "k", phiDenom = 2)
    assert(out.columns.toSeq === Seq("k", "cnt"))
    assert(out.collect().isEmpty)
  }

  test("streaming ingest: per-batch summaries merge into a live heavy-hitter state") {
    // the same foreachBatch maintenance-loop shape as the LSH/IVF/semDedup
    // index loops: each micro-batch folds its own bounded summary, the
    // driver merges it into the running state (associative, O(capacity)),
    // and the φ-frequent guarantee holds over everything seen so far
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val agg = new Sketches.MisraGries(32)
    var state = agg.zero
    val input = MemoryStream[String]
    val q = input.toDF().toDF("k").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        state = agg.merge(state, Sketches.misraGriesSummary(batch, "k", 32))
        ()
      }
      .start()
    val batches = (0 until 3).map { b =>
      (0 until 5).flatMap(h => Seq.fill(500)(s"hot$h")) ++
        (0 until 3000).map(i => s"tail${b}_$i")
    }
    batches.foreach { rows => input.addData(rows: _*); q.processAllAvailable() }
    q.stop()
    assert(state.n === batches.map(_.size).sum)
    assert(state.counts.size <= 32)
    // hot freq 1500 > n/(m+1) = 16500/33 = 500 → guaranteed present
    (0 until 5).foreach(h => assert(state.counts.contains(s"hot$h")))
  }

  test("streaming ingest: per-batch GROUPED summaries merge into live " +
       "per-group heavy-hitter states") {
    // grouped twin of the global foreachBatch loop: each micro-batch folds
    // one summary per group it contains; the live state merges per group
    // (MgState merge is associative within a group), and the groupwise
    // φ-superset guarantee holds over everything that group has seen
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val agg = new Sketches.MisraGries(16)
    var state = Map.empty[String, Sketches.MgState]
    val input = MemoryStream[(String, String)]
    val q = input.toDF().toDF("g", "k").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        Sketches.misraGriesSummariesByGroup(batch, "g", "k", 16)
          .collect().foreach { case (g, st) =>
            state = state.updated(g, agg.merge(state.getOrElse(g, agg.zero), st))
          }
        ()
      }
      .start()
    // group "a" is hot on keyA (200/batch of 700); "b" hot on keyB; group
    // "c" appears only in the last batch
    val batches = (0 until 3).map { b =>
      Seq.fill(200)(("a", "keyA")) ++ (0 until 500).map(i => ("a", s"ta${b}_$i")) ++
        Seq.fill(150)(("b", "keyB")) ++ (0 until 300).map(i => ("b", s"tb${b}_$i")) ++
        (if (b == 2) Seq.fill(5)(("c", "keyC")) else Seq.empty)
    }
    batches.foreach { rows => input.addData(rows: _*); q.processAllAvailable() }
    q.stop()
    assert(state("a").n === 2100L && state("b").n === 1350L && state("c").n === 5L)
    state.values.foreach(st => assert(st.counts.size <= 16))
    // per-group guarantee: keyA freq 600 > n_a/17 = 123; keyB 450 > 79
    assert(state("a").counts.contains("keyA"))
    assert(state("b").counts.contains("keyB"))
    assert(state("c").counts === Map("keyC" -> 5L))
    // and a key hot in one group never leaks into another's summary
    assert(!state("a").counts.contains("keyB"))
    assert(!state("b").counts.contains("keyA"))
  }

  test("plan: recount pass filters to candidates BEFORE the aggregate exchange") {
    // the second pass must ship only candidate rows into the shuffle — the
    // whole point of the sketch; an exchange below the filter would re-ship
    // every distinct key and reduce the operator to groupBy(key).count
    // spark.range source: a local-collection input constant-folds the
    // filter into the LocalTableScan and hides the shape under test
    val ranged = spark.range(30000)
      .select(concat(lit("hot"), (col("id") % 5)).as("k"))
    val hh = Sketches.heavyHitters(ranged, "k", phiDenom = 20)
    val plan = hh.queryExecution.executedPlan.toString
    val ex = plan.indexOf("Exchange hashpartitioning(k")
    assert(ex >= 0, s"expected a hash exchange on the key:\n$plan")
    // treeString prints parent before child: the candidate IN-filter must
    // appear BELOW (after) the aggregate's exchange, i.e. inside its input
    val filt = plan.indexOf(" IN (", ex)
    assert(filt > ex, s"no candidate isin filter under the exchange:\n$plan")
    // and nothing above the exchange re-reads the raw keys: exactly one
    // shuffle in the whole recount pass
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1, plan)
  }

  test("capacity below 1/phi is rejected") {
    intercept[IllegalArgumentException] {
      Sketches.heavyHitters(Seq("a").toDF("k"), "k", phiDenom = 30, capacity = 10)
    }
  }

  // ---- Log-bucket quantile histogram --------------------------------------

  /** Driver-side bucket reference: exact region v < 2^(s+1), else
    * (L−s−1)·2^s + (v >> (L−s−1)) with L = 64 − nlz(v). */
  private def refBucket(v: Long, s: Int): Long =
    if (v < 0) -1L
    else if (v < (1L << (s + 1))) v
    else {
      val len = 64 - java.lang.Long.numberOfLeadingZeros(v)
      val shift = len - (s + 1)
      shift.toLong * (1L << s) + (v >> shift)
    }

  test("logHistogram matches a driver-side bit-twiddling reference, " +
       "buckets monotone in v") {
    val boundary = Seq(0L, 1L, 2L, 127L, 128L, 255L, 256L, 257L, 511L, 512L,
      1023L, 1024L, 65535L, 65536L, (1L << 40) - 1, 1L << 40, Long.MaxValue)
    val rng = new scala.util.Random(11)
    val vals = boundary ++ (0 until 4000).map(_ => rng.nextLong(1L << 48))
    val got = Sketches.logHistogram(
        spark.createDataset(vals).toDF("v").repartition(7), "v")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = vals.groupBy(refBucket(_, 7)).view.mapValues(_.size.toLong).toMap
    assert(got === expect)
    // monotone: sorted values produce non-decreasing buckets
    val sorted = vals.sorted
    sorted.zip(sorted.tail).foreach { case (a, b) =>
      assert(refBucket(a, 7) <= refBucket(b, 7), s"bucket order broke at $a -> $b")
    }
  }

  test("shard log-histograms merge by pointwise sum to the union's table") {
    val rng = new scala.util.Random(13)
    val all = (0 until 6000).map(_ => math.abs(rng.nextGaussian() * 5000).toLong)
    val shards = all.grouped(2000).toSeq.map(g =>
      Sketches.logHistogram(spark.createDataset(g).toDF("v"), "v"))
    val merged = Sketches.mergeLogHistograms(shards)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val whole = Sketches.logHistogram(spark.createDataset(all).toDF("v"), "v")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged === whole)
  }

  test("logHistogramQuantiles: relative error <= 2^-(s+1), exact region exact") {
    val rng = new scala.util.Random(17)
    // heavy-tailed: exp-distributed magnitudes spanning exact + log regions
    val vals = (0 until 20000).map(_ => math.exp(rng.nextDouble() * 12).toLong)
    val hist = Sketches.logHistogram(spark.createDataset(vals).toDF("v"), "v")
    val ps = Seq(0.01, 0.25, 0.5, 0.75, 0.9, 0.99)
    val got = Sketches.logHistogramQuantiles(hist, ps)
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    val sorted = vals.sorted
    ps.foreach { p =>
      val truth = sorted(math.max(1, math.ceil(p * vals.size).toInt) - 1)
      val est = got(p)
      assert(math.abs(est - truth) <= truth / 256 + 1,
        s"p=$p est=$est truth=$truth exceeds 2^-8 relative bound")
    }
    // all-exact-region input: estimates are exact ranks
    val small = (1L to 200L) ++ (1L to 200L)
    val hSmall = Sketches.logHistogram(spark.createDataset(small).toDF("v"), "v")
    val gSmall = Sketches.logHistogramQuantiles(hSmall, Seq(0.5, 0.9))
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(gSmall(0.5) === 100L && gSmall(0.9) === 180L)
  }

  test("logHistogramQuantilesBy: per-group decode equals each slice's own " +
       "ungrouped decode; bucket -1 rejected loudly") {
    import spark.implicits._
    val rng = new scala.util.Random(41)
    val rows = (0 until 9000).map { i =>
      val g = s"g${i % 3}"
      // group-dependent scale so the three decodes genuinely differ
      (g, math.exp(rng.nextDouble() * (6 + 3 * (i % 3))).toLong)
    }
    val df = rows.toDF("g", "v")
    val ps = Seq(0.25, 0.5, 0.9)
    val hist = Sketches.logHistogramBy(df, "g", "v")
    val got = Sketches.logHistogramQuantilesBy(hist, "g", ps)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getLong(2)).toMap
    assert(got.size === 9)
    Seq("g0", "g1", "g2").foreach { g =>
      val alone = Sketches.logHistogramQuantiles(
          Sketches.logHistogram(rows.filter(_._1 == g).map(_._2).toDF("v"), "v"), ps)
        .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
      ps.foreach(p => assert(got((g, p)) === alone(p), s"group $g p=$p"))
    }
    // a single negative value in ONE group poisons the whole decode — the
    // grouped estimate must refuse, same contract as the ungrouped one
    // (the decode is a distributed mapGroups now, so the rejection
    // surfaces at action time, wrapped in Spark's task-failure chain)
    val withNeg = (rows :+ ("g1", -3L)).toDF("g", "v")
    val ex = intercept[Exception] {
      Sketches.logHistogramQuantilesBy(
        Sketches.logHistogramBy(withNeg, "g", "v"), "g", ps).collect()
    }
    val msgs = Iterator.iterate[Throwable](ex)(_.getCause)
      .takeWhile(_ != null).map(m => Option(m.getMessage).getOrElse(""))
      .mkString("; ")
    assert(msgs.contains("bucket -1"))
  }

  test("logHistogramQuantilesBy: distributed decode carries no " +
       "bounded-group-dimension contract (many groups ≡ per-slice driver " +
       "decode); null-group rows in hand-built tables are skipped, not NPE") {
    import spark.implicits._
    val ps = Seq(0.25, 0.5, 0.9)
    // 400 groups — far past anything the r11 driver-collect contract
    // blessed; every group must decode exactly like its own driver-side
    // ungrouped decode
    val manyRows = (0 until 20000).map(i => (s"m${i % 400}", (i % 997 + 1).toLong))
    val got = Sketches.logHistogramQuantilesBy(
        Sketches.logHistogramBy(manyRows.toDF("g", "v"), "g", "v"), "g", ps)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getLong(2)).toMap
    assert(got.size === 400 * ps.size)
    Seq("m0", "m123", "m399").foreach { g =>
      val alone = Sketches.logHistogramQuantiles(
          Sketches.logHistogram(
            manyRows.filter(_._1 == g).map(_._2).toDF("v"), "v"), ps)
        .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
      ps.foreach(p => assert(got((g, p)) === alone(p), s"group $g p=$p"))
    }
    // hand-built bucket table with a NULL group key: the r11 driver decode
    // NPE'd here; now the row is skipped (logHistogramBy never emits one)
    val hand = Seq((null.asInstanceOf[String], 3L, 5L), ("a", 3L, 5L))
      .toDF("g", "bucket", "cnt")
    val out = Sketches.logHistogramQuantilesBy(hand, "g", Seq(0.5)).collect()
    assert(out.map(_.getString(0)).toSet === Set("a"))
    assert(out.length === 1)
  }

  test("logHistogramBy: each group slice equals its own ungrouped table; " +
       "null groups/values skipped") {
    val rng = new scala.util.Random(23)
    val rows = (0 until 3000).map(i =>
      (s"g${i % 3}", math.abs(rng.nextGaussian() * 2000).toLong)) ++
      Seq((null.asInstanceOf[String], 5L), ("g0", -1L))
    // note: the -1L value lands in bucket -1 of g0 — grouped tables CARRY
    // it (the estimate-time rejection is per consumer), so drop it from
    // the slice comparison input instead of special-casing
    val clean = rows.filter { case (g, v) => g != null && v >= 0 }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => org.apache.spark.sql.Row(r._1, r._2)), 5),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("g", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.LongType))))
    val grouped = Sketches.logHistogramBy(df, "g", "v")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    // null-group row contributes nowhere
    assert(grouped.keys.forall(_._1 != null))
    Seq("g0", "g1", "g2").foreach { g =>
      val alone = Sketches.logHistogram(
          spark.createDataset(clean.filter(_._1 == g).map(_._2)).toDF("v"), "v")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val slice = grouped.collect {
        case ((`g`, b), c) if b >= 0 => b -> c
      }.toMap
      assert(slice === alone, s"group $g slice diverged")
    }
    // the negative row IS visible as (g0, -1) — loud, not silently dropped
    assert(grouped(("g0", -1L)) === 1L)
  }

  test("logHistogramQuantiles rejects a histogram containing negatives; " +
       "empty input yields empty estimates") {
    val h = Sketches.logHistogram(spark.createDataset(Seq(-3L, 5L)).toDF("v"), "v")
    intercept[IllegalArgumentException] {
      Sketches.logHistogramQuantiles(h, Seq(0.5))
    }
    val empty = Sketches.logHistogram(
      spark.createDataset(Seq.empty[Long]).toDF("v"), "v")
    assert(Sketches.logHistogramQuantiles(empty, Seq(0.5)).collect().isEmpty)
  }

  test("streaming ingest: per-batch log-histograms sum into a live quantile sketch") {
    // same foreachBatch maintenance shape as the HLL/CMS/MG loops: each
    // batch folds its own bounded bucket table; the live state is a map
    // merged by pointwise sum, and estimates come from the merged table
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    var state = Map.empty[Long, Long]
    val input = MemoryStream[Long]
    val q = input.toDF().toDF("v").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        Sketches.logHistogram(batch, "v").collect().foreach { r =>
          val (b, c) = (r.getLong(0), r.getLong(1))
          state = state.updated(b, state.getOrElse(b, 0L) + c)
        }
        ()
      }
      .start()
    val rng = new scala.util.Random(19)
    val batches = (0 until 3).map(_ => (0 until 3000).map(_ => rng.nextLong(1L << 20)))
    batches.foreach { rows => input.addData(rows: _*); q.processAllAvailable() }
    q.stop()
    val whole = Sketches.logHistogram(
        spark.createDataset(batches.flatten).toDF("v"), "v")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(state === whole)
  }

  // ---- HyperLogLog registers ----------------------------------------------

  /** Driver-side register reference: same Poly64 hash via the expression's
    * own eval, bucket = low p bits, rank = Long.numberOfLeadingZeros on the
    * high window. */
  private def refRegisters(keys: Seq[String], p: Int): Map[Long, Int] = {
    keys.map { k =>
      val h = graft.functions.Poly64.mix(graft.functions.Poly64.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString(k),
        graft.functions.Poly64.Seed1, graft.functions.Poly64.Mult1))
      val bucket = h & ((1L << p) - 1)
      val v = h >>> p
      val rank = if (v == 0L) 64 - p + 1
                 else java.lang.Long.numberOfLeadingZeros(v) - p + 1
      bucket -> rank
    }.groupBy(_._1).map { case (b, rs) => b -> rs.map(_._2).max }
  }

  test("hllRegisters matches a driver-side bit-twiddling reference") {
    val keys = (0 until 5000).map(i => s"key-$i")
    val df = spark.createDataset(keys).repartition(8).toDF("k")
    val got = Sketches.hllRegisters(df, "k", p = 10).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === refRegisters(keys, 10))
  }

  test("registers are a function of the key SET: duplicates and nulls ignored") {
    val keys = (0 until 2000).map(i => s"key-${i % 500}")
    val withNulls = spark.createDataset(keys.map(Option(_)) ++ Seq(None, None))
      .toDF("k")
    val distinctOnly = spark.createDataset(keys.distinct).toDF("k")
    val a = Sketches.hllRegisters(withNulls, "k", p = 8).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    val b = Sketches.hllRegisters(distinctOnly, "k", p = 8).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(a === b)
  }

  test("shard registers merge by pointwise max to the union's registers") {
    val all = (0 until 8000).map(i => s"doc-$i")
    val shards = all.grouped(3000).map(ks =>
      Sketches.hllRegisters(spark.createDataset(ks).toDF("k"), "k", p = 9)).toSeq
    val merged = Sketches.mergeHllRegisters(shards).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    val whole = Sketches.hllRegisters(spark.createDataset(all).toDF("k"), "k", p = 9)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(merged === whole)
  }

  test("streaming ingest: per-batch HLL registers merge into a live distinct count") {
    // same foreachBatch maintenance shape as the Misra–Gries loop: each
    // micro-batch contributes its register table, the driver keeps the
    // pointwise max (tiny: ≤ 2^p entries), and the estimate tracks the
    // distinct count of everything seen so far — overlap double-counts
    // nothing, because max is idempotent
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val p = 11
    var state = Map.empty[Long, Int]
    val input = MemoryStream[String]
    val q = input.toDF().toDF("k").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        Sketches.hllRegisters(batch, "k", p).collect().foreach { r =>
          val (b, rk) = (r.getLong(0), r.getInt(1))
          state = state.updated(b, math.max(state.getOrElse(b, 0), rk))
        }
        ()
      }
      .start()
    // 3 batches of 4000 keys, each overlapping the previous by 1000
    (0 until 3).foreach { b =>
      input.addData((b * 3000 until b * 3000 + 4000).map(i => s"u$i"): _*)
      q.processAllAvailable()
    }
    q.stop()
    val stateDf = spark.createDataFrame(
      state.toSeq.map { case (b, r) => (b, r) }).toDF("bucket", "r")
    val est = Sketches.hllEstimate(stateDf, p)
    val truth = 10000.0 // 0..9999 distinct across overlapping batches
    assert(math.abs(est - truth) / truth < 0.05,
      s"streamed estimate $est vs $truth")
  }

  test("estimate within 5% at 50k distinct (p=12, deterministic hash)") {
    val n = 50000
    val df = spark.range(n).select(concat(lit("u"), col("id")).as("k"))
    val est = Sketches.hllEstimate(Sketches.hllRegisters(df, "k", p = 12), p = 12)
    val err = math.abs(est - n) / n
    assert(err < 0.05, s"estimate $est vs $n: relative error $err")
  }

  test("small range falls back to linear counting and stays within 2%") {
    val n = 150
    val df = spark.range(n).select(concat(lit("s"), col("id")).as("k"))
    val est = Sketches.hllEstimate(Sketches.hllRegisters(df, "k", p = 12), p = 12)
    val err = math.abs(est - n) / n
    assert(err < 0.02, s"estimate $est vs $n: relative error $err")
  }

  test("packed registers: singletons + hllRegMax merge ≡ the row-table " +
       "hllRegistersBy; unpack is value-identical; packed estimate ≡ row " +
       "estimate (the HyperBall in-core layout is a pure re-encoding)") {
    import spark.implicits._
    val p = 6
    val rng = new scala.util.Random(23)
    // multi-key groups: merge packed singletons per group with the UDAF
    val rows = (0 until 400).map { _ =>
      (s"g${rng.nextInt(5)}", s"k${rng.nextInt(120)}")
    }.toDF("g", "k")
    val packed = Sketches.hllPackedSingletons(
        rows.select(concat(col("g"), lit(" "), col("k")).as("gk"), col("k")),
        "gk", "k", p)
      .select(substring_index(col("gk"), " ", 1).as("g"), col("regs"))
      .groupBy(col("g")).agg(Sketches.hllRegMax(p)(col("regs")).as("regs"))
    val viaPacked = Sketches.hllUnpack(packed, "g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    val viaRows = Sketches.hllRegistersBy(rows, "g", "k", p).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(viaPacked === viaRows)
    // estimates agree to FP association noise
    val estPacked = packed.select(col("g"),
        Sketches.hllEstimatePacked(col("regs"), p).as("est"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val estRows = Sketches.hllEstimateBy(
        Sketches.hllRegistersBy(rows, "g", "k", p), "g", p)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    estRows.foreach { case (g, e) =>
      assert(math.abs(estPacked(g) - e) < 1e-9 * math.max(1.0, e), s"group $g")
    }
  }

  test("byte-packed registers (BINARY wire layout): singletons + " +
       "hllRegMaxBytes ≡ the int layout and the row table; byte stats " +
       "and estimate are value-identical (a pure re-encoding again)") {
    import spark.implicits._
    val p = 6
    val rng = new scala.util.Random(23)
    val rows = (0 until 400).map { _ =>
      (s"g${rng.nextInt(5)}", s"k${rng.nextInt(120)}")
    }.toDF("g", "k")
    def mergedBytes = Sketches.hllPackedSingletonsBytes(
        rows.select(concat(col("g"), lit(" "), col("k")).as("gk"), col("k")),
        "gk", "k", p)
      .select(substring_index(col("gk"), " ", 1).as("g"), col("regs"))
      .groupBy(col("g")).agg(Sketches.hllRegMaxBytes(p)(col("regs")).as("regs"))
    val viaBytes = Sketches.hllUnpackBytes(mergedBytes, "g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    val viaRows = Sketches.hllRegistersBy(rows, "g", "k", p).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(viaBytes === viaRows)
    // estimate: EXACT double equality vs the int-layout HOF (identical
    // fold order and branch)
    val intPacked = Sketches.hllPackedSingletons(
        rows.select(concat(col("g"), lit(" "), col("k")).as("gk"), col("k")),
        "gk", "k", p)
      .select(substring_index(col("gk"), " ", 1).as("g"), col("regs"))
      .groupBy(col("g")).agg(Sketches.hllRegMax(p)(col("regs")).as("regs"))
    val estInt = intPacked.select(col("g"),
        Sketches.hllEstimatePacked(col("regs"), p).as("est"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val estBytes = mergedBytes.select(col("g"),
        Sketches.hllEstimateBytes(p)(col("regs")).as("est"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    estInt.foreach { case (g, e) => assert(estBytes(g) === e, s"group $g") }
    // byte stats = (non-zero count, rank sum) straight off the rows
    val stB = mergedBytes.select(col("g"),
        Sketches.hllByteStats(col("regs")).as("st"))
      .collect().map(r => r.getString(0) ->
        ((r.getStruct(1).getInt(0), r.getStruct(1).getLong(1)))).toMap
    viaRows.groupBy(_._1).foreach { case (g, rs) =>
      assert(stB(g) === ((rs.size, rs.toSeq.map(_._3.toLong).sum)), s"group $g")
    }
  }

  test("hllEstimateBy ≡ driver hllEstimate per group (distributed decode " +
       "of the same formula, incl. the linear-counting branch)") {
    val p = 8
    import spark.implicits._
    // group sizes straddling the linear-counting threshold at p=8 (m=256)
    val rows = Seq(("small", 30), ("mid", 700), ("big", 9000)).flatMap {
      case (g, n) => (0 until n).map(i => (g, s"$g-k$i"))
    }.toDF("g", "k")
    val regs = Sketches.hllRegistersBy(rows, "g", "k", p)
    val got = Sketches.hllEstimateBy(regs, "g", p).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    Seq("small", "mid", "big").foreach { g =>
      val want = Sketches.hllEstimate(
        regs.filter(col("g") === g).select(col("bucket"), col("r")), p)
      assert(math.abs(got(g) - want) < 1e-9 * math.max(1.0, want), s"group $g")
    }
  }

  test("per-group registers: each group slice equals its own ungrouped table; " +
       "grouped shard merge = grouped union") {
    val rows = (0 until 5000).map(i => (s"g${i % 3}", s"k${i % (700 + 100 * (i % 3))}"))
    val df = spark.createDataset(rows).toDF("src", "k")
    val grouped = Sketches.hllRegistersBy(df, "src", "k", p = 9).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    (0 until 3).foreach { g =>
      val slice = Sketches.hllRegisters(df.filter(col("src") === s"g$g"), "k", p = 9)
        .collect().map(r => (s"g$g", r.getLong(0), r.getInt(1))).toSet
      assert(grouped.filter(_._1 == s"g$g") === slice, s"group g$g slice")
    }
    val shards = rows.grouped(1700).map(rs =>
      Sketches.hllRegistersBy(spark.createDataset(rs).toDF("src", "k"), "src", "k", 9)).toSeq
    val merged = Sketches.mergeHllRegistersBy("src", shards).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(merged === grouped)
  }

  // ---- Count-Min sketch ----------------------------------------------------

  /** Zipf-ish stream: key z0 5000×, z1 2500×, z2 1250×, …, plus a 3000-key
    * singleton tail; n = 12_750. */
  private def cmsStream = {
    val hot = (0 until 8).flatMap(h => Seq.fill(5000 >> h)(s"z$h"))
    val tail = (0 until 3000).map(i => s"ct$i")
    spark.createDataset(hot ++ tail).repartition(8).toDF("k")
  }

  test("CMS lookup: one-sided (est >= true), hot keys near-exact, row sums = n") {
    val df = cmsStream
    val truth = df.groupBy("k").count().as[(String, Long)].collect().toMap
    val n = truth.values.sum
    val cms = Sketches.cmsTable(df, "k", depth = 4, widthLog2 = 11)
    // every row of the table counts the whole stream once
    val rowSums = cms.groupBy("row").agg(sum("cnt").as("s"))
      .as[(Int, Long)].collect().toMap
    assert(rowSums === (0 until 4).map(_ -> n).toMap)
    val probes = spark.createDataset(truth.keys.toSeq).toDF("k")
    val est = Sketches.cmsLookup(cms, probes, "k", depth = 4, widthLog2 = 11)
      .as[(String, Long)].collect().toMap
    est.foreach { case (k, e) =>
      assert(e >= truth(k), s"$k underestimated: $e < ${truth(k)}")
      // ε = e/width ≈ 0.00133 ⇒ slack ≈ 17 at n=12750; generous 10× margin
      assert(e - truth(k) <= 10 * math.E / 2048 * n,
        s"$k overshot by ${e - truth(k)}")
    }
    // the heavy keys dominate their counters: near-exact (min over 4 rows
    // can still carry a few colliding tail singletons)
    (0 until 4).foreach { h =>
      assert(est(s"z$h") - truth(s"z$h") <= 5,
        s"hot z$h estimate ${est(s"z$h")} vs ${truth(s"z$h")}")
    }
  }

  test("CMS lookup of a never-seen key is 0 (absent counters count as empty)") {
    val cms = Sketches.cmsTable(
      spark.createDataset(Seq("a", "b", "a")).toDF("k"), "k", 4, 11)
    val est = Sketches.cmsLookup(cms,
      spark.createDataset(Seq("zzz-unseen")).toDF("k"), "k", 4, 11)
      .as[(String, Long)].collect().toMap
    // width 2048 with 2 distinct keys: collision on all 4 rows is ~(2/2048)^4
    assert(est("zzz-unseen") === 0L)
  }

  test("shard CMS tables merge by pointwise sum to the union's table") {
    val all = (0 until 9000).map(i => s"m${i % 1100}")
    val shards = all.grouped(2500).map(ks =>
      Sketches.cmsTable(spark.createDataset(ks).toDF("k"), "k", 4, 10)).toSeq
    val merged = Sketches.mergeCmsTables(shards).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val whole = Sketches.cmsTable(spark.createDataset(all).toDF("k"), "k", 4, 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(merged === whole)
  }

  test("streaming ingest: per-batch CMS tables sum into a live frequency sketch") {
    // foreachBatch maintenance loop: each micro-batch contributes its counter
    // table, the driver keeps the pointwise sum (≤ depth·width entries), and
    // point lookups over the accumulated state track exact counts of the
    // stream so far — sum (unlike HLL's max) double-counts nothing because
    // batches are disjoint slices of the stream
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    var state = Map.empty[(Int, Long), Long]
    val input = MemoryStream[String]
    val q = input.toDF().toDF("k").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        Sketches.cmsTable(batch, "k", 4, 11).collect().foreach { r =>
          val key = (r.getInt(0), r.getLong(1))
          state = state.updated(key, state.getOrElse(key, 0L) + r.getLong(2))
        }
        ()
      }
      .start()
    (0 until 3).foreach { b =>
      input.addData((0 until 2000).map(i => s"k${(b * 2000 + i) % 3000}"): _*)
      q.processAllAvailable()
    }
    q.stop()
    val stateDf = spark.createDataFrame(
      state.toSeq.map { case ((row, b), c) => (row, b, c) })
      .toDF("row", "bucket", "cnt")
    // keys 0..999 appeared twice (batches wrap at 3000), 1000..2999 once;
    // estimates are one-sided with a few colliding-singleton extras
    val probes = spark.createDataset(Seq("k0", "k500", "k1500", "k2999")).toDF("k")
    val est = Sketches.cmsLookup(stateDf, probes, "k", 4, 11)
      .as[(String, Long)].collect().toMap
    for ((k, truth) <- Seq("k0" -> 2L, "k500" -> 2L, "k1500" -> 1L, "k2999" -> 1L)) {
      assert(est(k) >= truth && est(k) - truth <= 10,
        s"$k estimate ${est(k)} vs true $truth")
    }
  }
}

package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Event-stream analytics for product/behavioral event tables
 * (event_id, ts, user_id, event_type, ...): ordered conversion funnels and
 * cohort retention — the aggregate workloads an events pipeline runs next to
 * sessionization (SparkEntry's ev_sessions).
 *
 * Scale shape: everything reduces per USER first (high-cardinality hash
 * groupBy with map-side combine), and the per-stage joins are equi-joins on
 * the same user key — after the first shuffle, subsequent stages co-locate.
 * No windows over the raw event stream, no driver-side state.
 */
object Events {

  /** Ordered conversion funnel: stage i counts users whose FIRST qualifying
    * stage-i event is strictly later than their first-reach time of stage
    * i−1. Returns one row per stage: (stage, stage_idx, n_users).
    *
    * Each stage is a filtered per-user min-timestamp aggregate joined to the
    * previous stage's reach times — the event table is scanned once per
    * stage with the stage predicate pushed down to the scan. */
  def funnel(events: DataFrame, stages: Seq[String],
             userCol: String = "user_id", typeCol: String = "event_type",
             tsCol: String = "ts"): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val first = events.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("_t"))
    val reaches = stages.tail.scanLeft(first) { (prev, stage) =>
      events.filter(col(typeCol) === stage)
        .select(col(userCol), col(tsCol).as("_ts"))
        .join(prev.select(col(userCol), col("_t").as("_prev")), Seq(userCol))
        .filter(col("_ts") > col("_prev"))
        .groupBy(col(userCol)).agg(min(col("_ts")).as("_t"))
    }
    reaches.zip(stages).zipWithIndex.map { case ((df, stage), i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(stage).as("stage"), lit(i + 1).as("stage_idx"),
          col("n_users"))
    }.reduce(_ unionAll _)
  }

  /** As-of join: attach to each left row the `valueCol` of the most recent
    * right row (per `keyCol`) whose `tsCol` is AT OR BEFORE the left row's —
    * the temporal join training-data assembly needs (label ↔ latest feature
    * snapshot) that plain equi-joins can't express.
    *
    * Formulated as a composition of existing operators (the brief's preferred
    * order): union-tag both sides, wrap the right value in a single-field
    * struct (so a genuine NULL in `valueCol` is still a non-null match marker
    * — the matched row's NULL is attached, not skipped, exactly SQL ASOF JOIN
    * semantics), then `last(marker, ignoreNulls)` over a (key, ts)-ordered
    * running window — one shuffle on the key, one partition-local sort, no
    * range-explode. Right rows sort BEFORE left rows at equal timestamps, so
    * a same-instant right row is visible (inclusive semantics, matching SQL
    * ASOF JOIN `l.ts >= r.ts`).
    *
    * Rows with equal (key, ts) on the RIGHT side make the match
    * nondeterministic — pre-reduce the right side to unique (key, ts) first.
    *
    * HOT-KEY hardening: the default plan sorts each key's whole timeline in
    * ONE window partition — at 100 TB a single bot user with 10⁹ events is a
    * straggler task (or an OOM). Pass `chunk` (a pure, MONOTONIC
    * non-decreasing ts → chunk-id mapping,
    * e.g. `ts => floor(unix_timestamp(ts) / 86400)`) to split every key's
    * timeline into time chunks: pass 1 runs the running-last window inside
    * each (key, chunk) — bounded partitions regardless of key heat; pass 2
    * carries the boundary value across chunks through a window over the
    * per-(key, chunk) BOUNDARY relation (one row per chunk — thousands of
    * rows per key where pass 1 had billions), then a coalesce picks the
    * chunk-local match when one exists. Same-instant rows land in the same
    * chunk, so the inclusive right-before-left tie order is preserved and
    * the result is EXACTLY the unchunked plan's. */
  def asofJoin(left: DataFrame, right: DataFrame,
               keyCol: String, tsCol: String, valueCol: String,
               asofCol: String = "asof_value",
               chunk: Option[Column => Column] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.{StructField, StructType}
    val lCols = left.columns.toSeq
    require(!lCols.contains("_rv") && !lCols.contains("_side"),
      "asofJoin reserves columns _rv and _side")
    require(!lCols.contains(asofCol), s"left already has a '$asofCol' column")
    val vType = right.schema(valueCol).dataType
    val mType = StructType(Seq(StructField("v", vType)))
    val l = left
      .withColumn("_rv", lit(null).cast(mType))
      .withColumn("_side", lit(1))
    val r = lCols.foldLeft(
        right.select(col(keyCol), col(tsCol),
          struct(col(valueCol).as("v")).as("_rv"))) {
      (df, c) =>
        if (c == keyCol || c == tsCol) df
        else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.withColumn("_side", lit(0))
    val u = l.select((lCols :+ "_rv" :+ "_side").map(col): _*)
      .unionByName(r.select((lCols :+ "_rv" :+ "_side").map(col): _*))
    chunk match {
      case None =>
        val w = Window.partitionBy(col(keyCol))
          .orderBy(col(tsCol).asc, col("_side").asc)
          .rowsBetween(Window.unboundedPreceding, 0)
        u.withColumn(asofCol,
            last(col("_rv"), ignoreNulls = true).over(w).getField("v"))
          .filter(col("_side") === 1)
          .drop("_rv", "_side")
      case Some(chunkOf) =>
        require(!lCols.contains("_chunk") && !lCols.contains("_prev"),
          "chunked asofJoin reserves columns _chunk and _prev")
        val uc = u.withColumn("_chunk", chunkOf(col(tsCol)))
        // pass 1: running last INSIDE each (key, chunk) — the hot key's
        // timeline spreads over its chunks instead of one sort partition
        val wc = Window.partitionBy(col(keyCol), col("_chunk"))
          .orderBy(col(tsCol).asc, col("_side").asc)
          .rowsBetween(Window.unboundedPreceding, 0)
        val local = uc.withColumn("_loc",
          last(col("_rv"), ignoreNulls = true).over(wc))
        // pass 2: per-(key, chunk) boundary = the chunk's LAST right value
        // (right side is unique per (key, ts), so the struct max is the
        // latest-ts row); window over one-row-per-chunk is bounded by the
        // time range, not the key's row count
        val bounds = uc.filter(col("_side") === 0)
          .groupBy(col(keyCol), col("_chunk"))
          .agg(max(struct(col(tsCol).as("t"), col("_rv").as("rv"))).as("_b"))
        val wb = Window.partitionBy(col(keyCol)).orderBy(col("_chunk").asc)
          .rowsBetween(Window.unboundedPreceding, -1)
        val prev = uc.select(col(keyCol), col("_chunk")).distinct()
          .join(bounds, Seq(keyCol, "_chunk"), "left_outer")
          .withColumn("_prev", last(col("_b.rv"), ignoreNulls = true).over(wb))
          .select(col(keyCol), col("_chunk"), col("_prev"))
        local.join(prev, Seq(keyCol, "_chunk"), "left_outer")
          .withColumn(asofCol,
            coalesce(col("_loc"), col("_prev")).getField("v"))
          .filter(col("_side") === 1)
          .drop("_rv", "_side", "_chunk", "_loc", "_prev")
    }
  }

  /** FORWARD as-of join: each left row gets the right side's EARLIEST value
    * at-or-after its timestamp (the "next event" direction — time-to-next-
    * action features, forward label attachment). Implemented by time
    * reversal: backward-asof over negated epoch micros is exactly
    * forward-asof over ts (`last −ts' ≤ −ts` ⇔ `first ts' ≥ ts`), and the
    * right-before-left tie order keeps the at-or-EQUAL match — so the whole
    * [[asofJoin]] machinery (single interleaved union + one window pass,
    * NULL-value preservation, optional hot-key chunking) is reused, not
    * duplicated. `chunk` receives the NEGATED micros; pass a monotonic
    * function of that (e.g. floor division) for the same bounded-sort
    * guarantees. */
  def asofJoinForward(left: DataFrame, right: DataFrame,
                      keyCol: String, tsCol: String, valueCol: String,
                      asofCol: String = "asof_value",
                      chunk: Option[Column => Column] = None): DataFrame = {
    require(!left.columns.contains("_negts") && !right.columns.contains("_negts"),
      "asofJoinForward reserves column _negts")
    val l = left.withColumn("_negts", -unix_micros(col(tsCol)))
    val r = right.select(col(keyCol), (-unix_micros(col(tsCol))).as("_negts"),
      col(valueCol))
    asofJoin(l, r, keyCol, "_negts", valueCol, asofCol, chunk)
      .drop("_negts")
  }

  /** Gap-based sessionization: appends `session_seq` — the running count of
    * session BREAKS (first event of the key, or a gap > `gapMicros` since
    * the previous event) per key in (ts, tie) order. Grouping by
    * (key, session_seq) afterwards yields the session roll-up.
    *
    * HOT-KEY hardening, same pattern as [[asofJoin]]: the default plan
    * sorts each key's entire timeline in one window partition — a bot user
    * with 10⁹ events is a straggler task. Pass `chunk` (pure, MONOTONIC
    * non-decreasing ts → chunk id) to bound every sort partition by the
    * chunk width instead: pass 1 computes breaks and a running local count
    * INSIDE each (key, chunk) — the first event of a chunk provisionally
    * counts as a break; pass 2 fixes that one bit per chunk from the
    * per-(key, chunk) BOUNDARY relation (previous chunk's last ts, one row
    * per chunk) and prefix-sums the corrected per-chunk break counts into
    * offsets. session_seq = local count + boundary correction + offset —
    * EXACTLY the unchunked numbering, because a session break is a pure
    * function of the gap to the previous event, wherever the chunk
    * boundary falls. */
  def sessionize(events: DataFrame, keyCol: String = "user_id",
                 tsCol: String = "ts", tieCol: String = "event_id",
                 gapMicros: Long = 30L * 60 * 1000000L,
                 chunk: Option[Column => Column] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val reserved = Seq("_prev", "_brk", "_lseq", "_chunk", "_corr", "_off")
    require(!events.columns.exists(reserved.contains),
      s"sessionize reserves columns ${reserved.mkString(", ")}")
    def isBreak(prev: Column): Column =
      when(prev.isNull ||
        unix_micros(col(tsCol)) - unix_micros(prev) > gapMicros, 1L)
        .otherwise(0L)
    chunk match {
      case None =>
        val w = Window.partitionBy(col(keyCol))
          .orderBy(col(tsCol).asc, col(tieCol).asc)
        events
          .withColumn("_prev", lag(col(tsCol), 1).over(w))
          .withColumn("_brk", isBreak(col("_prev")))
          .withColumn("session_seq", sum(col("_brk")).over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
          .drop("_prev", "_brk")
      case Some(chunkOf) =>
        val uc = events.withColumn("_chunk", chunkOf(col(tsCol)))
        // pass 1: breaks + running count inside (key, chunk); the chunk's
        // first event provisionally counts 1 (corrected in pass 2)
        val wc = Window.partitionBy(col(keyCol), col("_chunk"))
          .orderBy(col(tsCol).asc, col(tieCol).asc)
        val local = uc
          .withColumn("_prev", lag(col(tsCol), 1).over(wc))
          .withColumn("_brk", isBreak(col("_prev")))
          .withColumn("_lseq", sum(col("_brk")).over(
            wc.rowsBetween(Window.unboundedPreceding, 0)))
        // pass 2: one row per (key, chunk) — bounded by the time range,
        // not the key's row count
        val wb = Window.partitionBy(col(keyCol)).orderBy(col("_chunk").asc)
        val adj = local.groupBy(col(keyCol), col("_chunk"))
          .agg(min(col(tsCol)).as("_first"), max(col(tsCol)).as("_last"),
            sum(col("_brk")).as("_nbrk"))
          .withColumn("_bbrk",
            when(lag(col("_last"), 1).over(wb).isNull ||
              unix_micros(col("_first")) -
                unix_micros(lag(col("_last"), 1).over(wb)) > gapMicros, 1L)
              .otherwise(0L))
          .withColumn("_corr", col("_bbrk") - 1L)
          .withColumn("_off", coalesce(sum(col("_nbrk") + col("_corr")).over(
            wb.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select(col(keyCol), col("_chunk"), col("_corr"), col("_off"))
        local.join(adj, Seq(keyCol, "_chunk"))
          .withColumn("session_seq", col("_lseq") + col("_corr") + col("_off"))
          .drop("_prev", "_brk", "_lseq", "_chunk", "_corr", "_off")
    }
  }

  /** Exponentially-decayed per-key value (α = 1/2), the recency-weighted
    * feature aggregate: over each key's most recent `window` events
    * (timestamp desc, `idCol` desc tiebreak), the newest event carries
    * weight 2^(window−1), the next 2^(window−2), … — i.e. EWMA with a
    * binary decay factor, truncated to a fixed horizon. Binary weights make
    * the whole computation INTEGER-exact: values quantize to micro-units
    * via floor (floor, not cast — double→int casts round in some engines
    * and truncate in others), the weighted sum is a BIGINT fold
    * (order-independent, hash-stable across engines and shuffles), and the
    * normalizing denominator Σ 2^(window−j) = 2^window − 2^(window−m) rides
    * along unreduced so no cross-engine division-semantics hazard exists.
    * Returns (keyCol, n_window, decay_num, decay_den); the decayed average
    * is decay_num / decay_den / 1e6 — a presentation step, by design not
    * computed here.
    *
    * Scale: one row_number window per key (hot-key note: the rank prunes to
    * `window` rows per key immediately, so the downstream aggregate is
    * bounded; the window sort itself is the same per-key sort every
    * sessionization pays — chunk via [[sessionize]]'s machinery if a key is
    * genuinely pathological) then a combinable groupBy.
    *
    * BEHAVIOR CHANGE (round 7): the `window` upper bound tightened from 40
    * to 32 — a Long-overflow fix: vmu · 2^(window−1) leaves BIGINT range at
    * window = 40 for |value| ≈ 16 and wraps silently under non-ANSI
    * arithmetic. Callers that passed 33..40 (and were silently at risk)
    * now get an IllegalArgumentException; split the horizon or rescale
    * values instead. Same change applies to [[decayedValueStream]]. */
  def decayedValue(events: DataFrame, keyCol: String = "user_id",
                   tsCol: String = "ts", valueCol: String = "value",
                   idCol: String = "event_id", window: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // window ≤ 32 keeps vmu · 2^(window−1) inside BIGINT for any |value| up
    // to ~4.2·10³ (micro-quantized: 2^63 / 1e6 / 2^31); window = 40 would
    // silently wrap under non-ANSI arithmetic at |value| ≈ 16.
    require(window >= 1 && window <= 32, "window must be in [1, 32]")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).desc, col(idCol).desc)
    events
      .withColumn("_rnk", row_number().over(w))
      .filter(col("_rnk") <= window)
      .withColumn("_vmu", floor(col(valueCol) * lit(1e6)).cast("long"))
      .withColumn("_wt", expr(s"shiftleft(CAST(1 AS BIGINT), $window - _rnk)"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_window"),
        sum(col("_vmu") * col("_wt")).as("decay_num"))
      .withColumn("decay_den", expr(
        s"shiftleft(CAST(1 AS BIGINT), $window) - " +
          s"shiftleft(CAST(1 AS BIGINT), $window - CAST(n_window AS INT))"))
  }

  /** Per-key σ-outlier detection with ZERO floating point: flags events
    * whose value deviates from their key's mean by more than `sigmas`
    * standard deviations, decided entirely in exact integer algebra so the
    * flag set is bit-identical across engines, shuffle orders, and reruns
    * (the property a reproducible data-quality gate needs — a double
    * variance accumulation is none of those). The test
    * `|x − μ| > c·σ`, with μ = S/n and population σ² = (n·SS − S²)/n²,
    * cross-multiplies by n² into `(n·x − S)² > c²·(n·SS − S²)`: every
    * factor an integer once values quantize to micro-units. Products reach
    * ~10²⁵ for million-row keys, so the squares are computed in
    * decimal(38,0) (Spark) / HUGEINT (the SQL oracle side) — still exact.
    *
    * Returns the flagged events only: (idCol, keyCol, vmu). Keys with a
    * single event have σ undefined and flag nothing. Scale: one combinable
    * groupBy for (n, S, SS) + a hash join back — no windows, no sort. */
  def outliers(events: DataFrame, keyCol: String = "user_id",
               valueCol: String = "value", idCol: String = "event_id",
               sigmas: Int = 2): DataFrame = {
    require(sigmas >= 1, "sigmas must be positive")
    val c2 = sigmas.toLong * sigmas
    val withV = events.withColumn("vmu",
      floor(col(valueCol) * lit(1e6)).cast("long"))
    val stats = withV.groupBy(col(keyCol)).agg(
      count(lit(1)).as("n"),
      sum(col("vmu").cast("decimal(38,0)")).as("s"),
      sum((col("vmu").cast("decimal(38,0)") *
        col("vmu").cast("decimal(38,0)"))).as("ss"))
    withV.join(stats, keyCol)
      .filter(col("n") >= 2)
      .withColumn("_dev", col("n").cast("decimal(38,0)") * col("vmu").cast("decimal(38,0)") - col("s"))
      .withColumn("_var_n2", col("n").cast("decimal(38,0)") * col("ss") - col("s") * col("s"))
      .filter(col("_dev") * col("_dev") > lit(c2) * col("_var_n2"))
      .select(col(idCol), col(keyCol), col("vmu"))
  }

  /** Per-group equi-width value histogram: (groupCol, bucket, n) with
    * fixed declared bounds via [[Layout.bucketize]] (clamped edge buckets,
    * IEEE-identical arithmetic across engines). One combinable aggregate —
    * the distribution profile that feeds drift dashboards and the
    * bucket-histogram quantile machinery alike. */
  def histogram(events: DataFrame, valueCol: String = "value",
                groupCol: String = "event_type",
                lo: Double = 0.0, hi: Double = 500.0,
                bits: Int = 5): DataFrame =
    events.groupBy(col(groupCol),
        Layout.bucketize(col(valueCol), lo, hi, bits).as("bucket"))
      .agg(count(lit(1)).as("n"))

  /** Robust per-key outliers (median/MAD): flags events with
    * `|x − med| > k·MAD`, the heavy-tail-safe alternative to [[outliers]] —
    * a single extreme spike inflates mean AND σ (masking itself), but moves
    * the median and the median absolute deviation not at all. Everything
    * runs in micro-unit integer space with EXACT medians (value at rank
    * `max(1, ⌈n/2⌉)` — interpolation-free, so the flag set is engine- and
    * shuffle-order-exact like [[outliers]]'s). MAD = 0 (at least half the
    * key's values identical) degenerates to flagging ANY deviation from
    * the median — the textbook behavior, deterministic.
    *
    * Scale: both medians go through
    * [[Curation.exactQuantilesPerGroup]]'s bucket-histogram rank selection
    * — only candidate-bucket rows are ever window-sorted, so a hot key
    * costs a bounded sort group, not an n·log n partition sort. Returns
    * flagged events only: (idCol, keyCol, vmu, med_mu, mad_mu). */
  def robustOutliers(events: DataFrame, keyCol: String = "user_id",
                     valueCol: String = "value", idCol: String = "event_id",
                     k: Int = 3): DataFrame = {
    require(k >= 1, "k must be positive")
    val withV = events.withColumn("vmu",
      floor(col(valueCol) * lit(1e6)).cast("long"))
    val med = Curation.exactQuantilesPerGroup(withV, keyCol, "vmu", Seq(0.5))
      .select(col(keyCol).as("_gk"), col("value").cast("long").as("med_mu"))
    val withDev = withV.withColumn("_gk", col(keyCol).cast("string"))
      .join(med, "_gk")
      .withColumn("dev", abs(col("vmu") - col("med_mu")))
    val mad = Curation.exactQuantilesPerGroup(withDev, "_gk", "dev", Seq(0.5))
      .select(col("_gk"), col("value").cast("long").as("mad_mu"))
    withDev.join(mad, "_gk")
      .filter(col("dev") > lit(k.toLong) * col("mad_mu"))
      .select(col(idCol), col(keyCol), col("vmu"), col("med_mu"), col("mad_mu"))
  }

  /** Range join: points ⋈ intervals where `startCol ≤ ptCol ≤ endCol`
    * (optionally also equi-joined on `keyCols`). Spark plans a raw
    * inequality join as a nested-loop product; this formulation BUCKETIZES —
    * intervals explode to the fixed-width bins they span, points map to one
    * bin, and the join is an equi-join on (keys, bin) followed by the exact
    * range filter. Each (point, interval) match arises in exactly the
    * point's bin, so no dedup pass is needed.
    *
    * `binWidth` trades explode factor for join selectivity: pick it near
    * the typical interval length (an interval spans ~len/binWidth bins).
    * Intervals with `end < start` are dropped. Column names of the two
    * inputs must be disjoint apart from `keyCols`. */
  def rangeJoin(points: DataFrame, intervals: DataFrame,
                ptCol: String, startCol: String, endCol: String,
                binWidth: Long, keyCols: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val pts = points.withColumn("_bin",
      floor(col(ptCol) / binWidth).cast("long"))
    val ivs = intervals
      .filter(col(endCol) >= col(startCol))
      .withColumn("_bin", explode(sequence(
        floor(col(startCol) / binWidth).cast("long"),
        floor(col(endCol) / binWidth).cast("long"))))
    pts.join(ivs, (keyCols :+ "_bin").toSeq)
      .filter(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop("_bin")
  }

  /** Interval-OVERLAP join: pairs whose inclusive ranges [lStart, lEnd] and
    * [rStart, rEnd] intersect — the interval×interval generalization of
    * [[rangeJoin]] (concurrent-session detection, window co-occurrence).
    * Both sides replicate into the fixed-width bins they touch and meet in
    * an equi-join on (keys, bin) — never an inequality-only join, which
    * Spark would plan as a nested loop. A multi-bin pair would match once
    * per shared bin; the canonical-bin guard `bin == max(lBin₀, rBin₀)`
    * (the first bin BOTH touch — floor is monotone, so it's the bin of
    * `max(lStart, rStart)`, inside both ranges whenever they overlap)
    * keeps exactly one copy without a distinct. Replication factor =
    * interval span / binWidth — size binWidth to the typical span. */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame,
                          lStart: String, lEnd: String,
                          rStart: String, rEnd: String,
                          binWidth: Long, keyCols: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val l = left.filter(col(lEnd) >= col(lStart))
      .withColumn("_lb0", floor(col(lStart) / binWidth).cast("long"))
      .withColumn("_bin", explode(sequence(col("_lb0"),
        floor(col(lEnd) / binWidth).cast("long"))))
    val r = right.filter(col(rEnd) >= col(rStart))
      .withColumn("_rb0", floor(col(rStart) / binWidth).cast("long"))
      .withColumn("_bin", explode(sequence(col("_rb0"),
        floor(col(rEnd) / binWidth).cast("long"))))
    l.join(r, (keyCols :+ "_bin").toSeq)
      .filter(col("_bin") === greatest(col("_lb0"), col("_rb0")))
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .drop("_bin", "_lb0", "_rb0")
  }

  /** Cohort retention: users are cohorted by the DAY of their first event;
    * a (cohort_day, day_offset) cell counts the cohort's users active
    * day_offset days later (distinct users, offset ≥ 0). Returns
    * (cohort_day, day_offset, n_users). */
  def cohortRetention(events: DataFrame,
                      userCol: String = "user_id", tsCol: String = "ts"): DataFrame = {
    val day = to_date(col(tsCol))
    val cohorts = events.groupBy(col(userCol)).agg(min(day).as("cohort_day"))
    events.select(col(userCol), day.as("_day"))
      .join(cohorts, Seq(userCol))
      .select(col(userCol), col("cohort_day"),
        datediff(col("_day"), col("cohort_day")).as("day_offset"))
      .distinct()
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Per-key buffer for [[decayedValueStream]]: the `window` most recent
    * (tsMicros, eventId, vmu) triples, newest first. */
  case class DecayBuffer(buf: Seq[(Long, Long, Long)])

  /** One refreshed decayed aggregate emitted by [[decayedValueStream]]. */
  case class DecayRow(user_id: Long, n_window: Long,
                      decay_num: Long, decay_den: Long)

  /** Online maintenance of [[decayedValue]]: per key, keep the `window`
    * most recent events in state (merge each micro-batch, truncate — the
    * top-`window` of everything seen is preserved by merge-then-truncate
    * because the kept set only ever grows newer) and emit the refreshed
    * integer-exact aggregate per updated key per batch. Arrival order is
    * irrelevant: after any batch, the emitted row equals the BATCH
    * [[decayedValue]] over all events delivered so far — the property the
    * spec pins against shuffled logs. State is O(window) per key, no
    * timeout needed. Run with OutputMode.Update. */
  def decayedValueStream(events: DataFrame, keyCol: String = "user_id",
                         tsCol: String = "ts", valueCol: String = "value",
                         idCol: String = "event_id",
                         window: Int = 16): org.apache.spark.sql.Dataset[DecayRow] = {
    import org.apache.spark.sql.streaming.GroupStateTimeout
    // same Long-overflow bound as the batch decayedValue
    require(window >= 1 && window <= 32, "window must be in [1, 32]")
    val spark = events.sparkSession
    import spark.implicits._
    def micros(t: java.sql.Timestamp): Long =
      math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    val typed = events
      .select(col(keyCol).cast("long"), col(tsCol),
        col(idCol).cast("long"), col(valueCol).cast("double"))
      .as[(Long, java.sql.Timestamp, Long, Double)]
    typed.groupByKey(_._1)
      .mapGroupsWithState[DecayBuffer, DecayRow](GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp, Long, Double)],
         state: org.apache.spark.sql.streaming.GroupState[DecayBuffer]) =>
          var buf = state.getOption.map(_.buf.toVector).getOrElse(Vector.empty)
          rows.foreach { case (_, t, id, v) =>
            buf = buf :+ ((micros(t), id, math.floor(v * 1e6).toLong))
          }
          buf = buf.sortBy(e => (-e._1, -e._2)).take(window)
          state.update(DecayBuffer(buf))
          val m = buf.length
          val num = buf.zipWithIndex.map { case (e, j) =>
            e._3 * (1L << (window - 1 - j))
          }.sum
          DecayRow(user, m, num, (1L << window) - (1L << (window - m)))
      }
  }

  /** Open-session state for [[sessionizeStream]]: disjoint (startMicros,
    * lastMicros, nEvents) intervals sorted by start, pairwise separated by
    * more than the gap. */
  case class OpenSessions(sessions: Seq[(Long, Long, Long)])

  /** One closed session emitted by [[sessionizeStream]]. */
  case class ClosedSession(user_id: Long, session_start: java.sql.Timestamp,
                           session_end: java.sql.Timestamp, n_events: Long)

  /** Completed-session summaries over a STREAM of events — the online analog
    * of [[sessionize]]'s gap rule, via `flatMapGroupsWithState` with an
    * event-time timeout. The input must already carry
    * `withWatermark(tsCol, …)`. Emits one row per CLOSED session
    * (user_id, session_start, session_end, n_events): a session closes only
    * once the watermark passes its last event + gap, at which point no
    * in-watermark event can extend it or merge into it (an extender needs
    * ts ≤ last+gap ≤ watermark and a backward merger needs ts < start ≤
    * last — both below the watermark).
    *
    * Out-of-order arrivals WITHIN the watermark delay are handled exactly:
    * each event folds into the interval list immediately (extend left/right,
    * start a new interval, or MERGE two intervals it bridges) — so per-key
    * state is O(open intervals inside the watermark horizon), never a
    * buffer of raw events. Events older than the current watermark are
    * dropped (same contract as every Spark stateful operator); stream ≡
    * batch [[sessionize]] summaries whenever no event is later than the
    * watermark delay. */
  def sessionizeStream(events: DataFrame,
                       gapMicros: Long = 30L * 60 * 1000000L,
                       keyCol: String = "user_id",
                       tsCol: String = "ts"): org.apache.spark.sql.Dataset[ClosedSession] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    def micros(t: java.sql.Timestamp): Long =
      math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    def toTs(m: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(math.floorDiv(m, 1000000L) * 1000L)
      t.setNanos((math.floorMod(m, 1000000L) * 1000L).toInt)
      t
    }
    // tsCol must stay the SAME attribute the watermark was declared on — a
    // cast would mint a new one and silently drop the watermark tag
    val typed = events
      .select(col(keyCol).cast("long"), col(tsCol))
      .as[(Long, java.sql.Timestamp)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[OpenSessions, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp)],
         state: GroupState[OpenSessions]) =>
          val wm = state.getCurrentWatermarkMs * 1000L
          var open = state.getOption.map(_.sessions.toVector).getOrElse(Vector.empty)
          rows.foreach { case (_, t) =>
            val x = micros(t)
            if (x >= wm) {
              val (lo, rest) = open.span(s => s._2 + gapMicros < x)
              val (mid, hi) = rest.span(s => s._1 - gapMicros <= x)
              val merged =
                if (mid.isEmpty) (x, x, 1L)
                else (math.min(mid.head._1, x), math.max(mid.last._2, x),
                      mid.map(_._3).sum + 1L)
              open = (lo :+ merged) ++ hi
            }
          }
          val (closed, stillOpen) = open.partition(s => s._2 + gapMicros <= wm)
          if (stillOpen.isEmpty) state.remove()
          else {
            state.update(OpenSessions(stillOpen))
            // fire once the earliest open session becomes closeable; the
            // timeout must sit strictly above the current watermark
            val earliestClose = stillOpen.map(_._2 + gapMicros).min
            state.setTimeoutTimestamp(
              math.max(earliestClose / 1000L + 1, state.getCurrentWatermarkMs + 1))
          }
          closed.iterator.map { case (a, b, n) =>
            ClosedSession(user, toTs(a), toTs(b), n)
          }
      }
  }
}

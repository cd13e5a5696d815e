package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.Poly64

/**
 * Corpus-curation operators for large-scale training-data pipelines:
 * benchmark-contamination checking, deterministic stratified sampling /
 * data mixing, PII redaction, and bounded per-group top-k selection.
 *
 * Everything is codegen-friendly (`org.apache.spark.sql.functions` +
 * graft's native expressions — no Scala UDFs in any per-row path) and
 * designed for the 100 TB shape: the corpus side is touched in ONE scan,
 * joins against reference sets broadcast when provably small, and the only
 * aggregations are map-side-combinable (bounded top-k state, counts).
 */
object Curation {

  // ---- benchmark contamination --------------------------------------------

  /**
   * Benchmark-contamination check: for each corpus document, how many of its
   * distinct word `shingleLen`-gram shingles also occur anywhere in `probes`
   * (the benchmark / eval corpus), plus the contaminated fraction.
   *
   * Plan shape: the probe set collapses to DISTINCT shingles (tiny — eval
   * suites are MBs, not TBs) and joins the corpus's exploded shingle index.
   * With `broadcastProbes` (default) that join is a broadcast semi-join, so
   * the 100 TB corpus is scanned exactly once with no shuffle; set it false
   * only when the probe corpus itself is cluster-scale, which falls back to
   * a shuffle equi-join on the shingle — the same inverted-index plan as
   * [[Dedup.ngramJaccardPairs]].
   *
   * Output: (idCol, n_shared, n_shingles, contamination ∈ [0,1] rounded 6).
   * Documents with no shingle overlap appear with n_shared = 0.
   */
  def contamination(corpus: DataFrame, probes: DataFrame,
                    idCol: String = "doc_id", textCol: String = "text",
                    shingleLen: Int = 3,
                    broadcastProbes: Boolean = true): DataFrame = {
    val corpusSh = corpus
      .select(col(idCol).as("id"), Dedup.wordShingles(col(textCol), shingleLen).as("sh"))
    val probeSh0 = probes
      .select(explode(Dedup.wordShingles(col(textCol), shingleLen)).as("g"))
      .distinct()
    val probeSh = if (broadcastProbes) broadcast(probeSh0) else probeSh0
    // shingles are distinct per document, so count(*) after the semi-shaped
    // inner join IS the distinct shared-shingle count
    val shared = corpusSh.select(col("id"), explode(col("sh")).as("g"))
      .join(probeSh, Seq("g"))
      .groupBy(col("id")).agg(count(lit(1)).as("n_shared"))
    contaminationOutput(corpusSh, shared, idCol)
  }

  /** Shared output tail: attach n_shared to every corpus doc (0 when no
    * overlap) and derive the contaminated fraction. */
  private def contaminationOutput(corpusSh: DataFrame, shared: DataFrame,
                                  idCol: String): DataFrame =
    corpusSh.select(col("id"), size(col("sh")).as("n_shingles"))
      .join(shared, Seq("id"), "left_outer")
      .select(
        col("id").as(idCol),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        col("n_shingles").cast("long").as("n_shingles"),
        round(when(col("n_shingles") > 0,
          coalesce(col("n_shared"), lit(0L)).cast("double") / col("n_shingles"))
          .otherwise(lit(0.0)), 6).as("contamination"))

  /**
   * [[contamination]] with a Bloom-filter pre-filter on the corpus side —
   * the shape for a CLUSTER-SCALE probe set, where neither side broadcasts
   * and the shingle equi-join must shuffle the full exploded corpus
   * (`broadcastProbes = false`). A Bloom filter over the probe shingles
   * (built with Spark's native `BloomFilterAggregate`, the same sketch the
   * optimizer injects for runtime row-group filtering) is collected once
   * (`numBits/8` bytes) and applied as a codegen'd `BloomFilterMightContain`
   * predicate BEFORE the join, so only might-match shingles — in the
   * decontamination regime a tiny fraction of the corpus — reach the
   * shuffle. The exact join on the survivors then removes Bloom false
   * positives: output is row-identical to [[contamination]] at any `fpp`.
   *
   * Membership is tested on `xxhash64(shingle)` — 64-bit hash collisions,
   * not Bloom behavior, are the only approximation in the PRE-filter, and
   * the exact recheck absorbs those too.
   */
  def contaminationBloom(corpus: DataFrame, probes: DataFrame,
                         idCol: String = "doc_id", textCol: String = "text",
                         shingleLen: Int = 3, fpp: Double = 0.01): DataFrame = {
    val corpusSh = corpus
      .select(col(idCol).as("id"), Dedup.wordShingles(col(textCol), shingleLen).as("sh"))
    // reused three times (count, bloom build, exact recheck): cut the lineage
    val probeSh = probes
      .select(explode(Dedup.wordShingles(col(textCol), shingleLen)).as("g"))
      .distinct().localCheckpoint(true)
    val nProbe = math.max(probeSh.count(), 1L)
    // optimal bits for n items at target fpp: ceil(-n ln p / (ln 2)^2)
    val numBits = math.max(64L,
      math.ceil(-nProbe * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
    val bfAgg = Bridge.column(new BloomFilterAggregate(
      Bridge.expression(xxhash64(col("g"))),
      Literal(nProbe), Literal(numBits)).toAggregateExpression())
    val bfBytes = probeSh.agg(bfAgg.as("bf")).head().getAs[Array[Byte]](0)
    val mightContain = Bridge.column(new BloomFilterMightContain(
      Literal(bfBytes, BinaryType),
      Bridge.expression(xxhash64(col("g")))))
    val shared = corpusSh.select(col("id"), explode(col("sh")).as("g"))
      .filter(mightContain)
      .join(probeSh, Seq("g")) // exact recheck: Bloom/xxhash64 FPs drop here
      .groupBy(col("id")).agg(count(lit(1)).as("n_shared"))
    contaminationOutput(corpusSh, shared, idCol)
  }

  /**
   * Span-level decontamination — the deployed eval-leakage REMOVAL step
   * (GPT-3 App. C / Llama-style 13-gram collision masking): every corpus
   * token position covered by an n-gram that ALSO occurs in `probes` (the
   * benchmark / eval corpus) is dropped, and the survivors are rebuilt —
   * the token-granularity complement of [[contamination]]'s doc-level
   * signal (which measures; this removes, without discarding the whole
   * document). Returns the span-mask family's gated shape:
   * (idCol, n_kept, text_fp) over every CORPUS document.
   *
   * Mechanically this is [[Dedup.repeatedSpans]]' machinery with the
   * hot-gram set swapped: instead of "grams in ≥ minDocs corpus docs",
   * hot = the DISTINCT probe gram hashes. Same scale shape — the probe
   * index is bounded by the eval suite's distinct grams (MBs, broadcast
   * by default: the corpus-side gram stream is scanned once with no
   * shuffle before the mask join); marking is a semi-join; islands merge
   * per document; the mask is a position-level left_anti.
   *
   * Broadcast bound — the default hint is a hard promise, not a hint AQE
   * can walk back: the distinct probe-gram set is one 8-byte hash per
   * gram, so ~10M distinct probe grams ≈ 80 MB of payload (plus hash-set
   * overhead ≈ 3–4×) is the practical ceiling for default executor/driver
   * memory; a full eval SUITE (GPT-3 App. C masks against benchmarks of
   * ~10^5–10^6 grams) sits far below it. Scoring against a large reference
   * CORPUS rather than an eval suite, set `broadcastProbes = false` — the
   * mark becomes a shuffle equi-join on the gram hash (the contamination()
   * convention) instead of an executor OOM.
   */
  def decontaminateSpans(corpus: DataFrame, probes: DataFrame,
                         idCol: String = "doc_id", textCol: String = "text",
                         probeTextCol: String = "text", n: Int = 8,
                         broadcastProbes: Boolean = true): DataFrame = {
    require(n >= 2, s"n must be >= 2, got $n")
    val hot0 = Dedup.positionalGrams(
        probes.select(lit(0L).as("_pid"), col(probeTextCol)),
        "_pid", probeTextCol, n)
      .select(col("_gh")).distinct()
    val hot = if (broadcastProbes) broadcast(hot0) else hot0
    val marked = Dedup.positionalGrams(corpus, idCol, textCol, n)
      .join(hot, Seq("_gh"), "left_semi")
      .select(col("_id"), col("_pos"))
    Dedup.applySpanMask(corpus, Dedup.mergeIslands(marked, n, idCol),
      idCol, textCol)
  }

  // ---- deterministic sampling / data mixing -------------------------------

  /** Sampling gate granularity: 2^20. A power of two so the gate value is a
    * BIT SLICE of the hash — `pmod(h, 2^20)` on the signed Long equals the
    * low 20 bits of the unsigned value, which keeps the gate reproducible in
    * engines that model the hash as unsigned (the DuckDB oracle's HUGEINT
    * fold): for non-power-of-two moduli the signed/unsigned residues differ. */
  val SampleGranularity: Long = 1L << 20

  /** The salt parameterizes the gate hash's fold MULTIPLIER (odd-forced
    * second-family Poly64 of the salt itself, computed once driver-side).
    * A polynomial fold is linear in its inputs, so salting by prefix/suffix
    * concatenation alone only shifts every key's hash by the same constant —
    * two "independent" salts would keep almost the same sample. Changing the
    * multiplier changes the hash family, which is the nonlinearity needed
    * for genuinely independent gates — and it stays a plain Long constant,
    * so external SQL oracles rebuild the gate exactly. Masked to 62 bits
    * (positive, odd) so a 128-bit-integer oracle can fold `acc·mult` without
    * overflowing (2^64·2^62 < 2^127). */
  def saltMult(salt: String): Long =
    (Poly64.hash(UTF8String.fromString(salt), Poly64.Seed2, Poly64.Mult2) | 1L) &
      0x3FFFFFFFFFFFFFFFL

  /** Deterministic keep/drop gate: true iff the low 20 bits of
    * Poly64(key ++ salt; mult = saltMult(salt)) fall below rate·2^20.
    * Row-stable (keyed on content, not partition/seed state), so samples are
    * reproducible across runs, engines, and repartitionings — unlike
    * `df.sample`, whose output depends on partition layout. Different
    * `salt`s give independent gates (see [[saltMult]]).
    *
    * The salt is also folded in as a SUFFIX: the trailing salt chars
    * multiply inter-key hash deltas by mult^len(salt), so consecutive keys
    * ("…41" vs "…42", which differ by 1 in the final code point) land
    * 2^20-equidistributed like a multiplicative hash instead of adjacent in
    * the low bits. */
  def sampleGate(key: Column, rate: Double, salt: String): Column = {
    val threshold = math.round(rate * SampleGranularity)
    pmod(
      Poly64.poly64(concat(key.cast("string"), lit(salt)), Poly64.Seed1, saltMult(salt)),
      lit(SampleGranularity)) < lit(threshold)
  }

  /**
   * Stratified deterministic sample — the data-mixing primitive: each
   * stratum (language, source domain, quality bucket, …) keeps its own
   * fraction of rows, gated by the content hash of `keyCol`. One scan, no
   * shuffle, no state; the mix is exactly reproducible given (rates, salt).
   * Strata absent from `rates` keep `defaultRate`.
   */
  def stratifiedSample(df: DataFrame, stratumCol: String, rates: Map[String, Double],
                       keyCol: String, salt: String = "mix:",
                       defaultRate: Double = 0.0): DataFrame = {
    val thresholdCol = rates.foldLeft(lit(math.round(defaultRate * SampleGranularity))) {
      case (acc, (stratum, rate)) =>
        when(col(stratumCol) === stratum, lit(math.round(rate * SampleGranularity)))
          .otherwise(acc)
    }
    df.filter(
      pmod(
        Poly64.poly64(concat(col(keyCol).cast("string"), lit(salt)),
          Poly64.Seed1, saltMult(salt)),
        lit(SampleGranularity)) < thresholdCol)
  }

  // ---- PII redaction ------------------------------------------------------

  /** Conservative ASCII patterns chosen to behave identically under Java's
    * regex engine and RE2-family engines (no backreferences, no lookaround):
    * order matters — emails first (they contain dots/digits), then IPv4
    * (dotted digits), then free-form phone runs (what's left). */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhonePattern = "\\+?\\d[\\d .()-]{6,}\\d"

  /** Redact PII-looking spans: emails → `<EMAIL>`, IPv4 addresses → `<IP>`,
    * phone-number-like digit runs → `<PHONE>`. Pure codegen'd
    * `regexp_replace` chain — one pass per pattern, no UDF, safe to run over
    * a 100 TB corpus inside the same projection as the rest of the
    * text-analysis pipeline. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "<EMAIL>"),
        Ipv4Pattern, "<IP>"),
      PhonePattern, "<PHONE>")

  /** The [[redactPii]] rules as (name, pattern, placeholder) in application
    * order — the single source of truth for both redaction entry points. */
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", EmailPattern, "<EMAIL>"),
    ("ip", Ipv4Pattern, "<IP>"),
    ("phone", PhonePattern, "<PHONE>"))

  /**
   * [[redactPii]] plus per-type redaction COUNTS — the "how much PII does
   * this document leak" density signal curation filters sort on, not just
   * the scrubbed text. Returns df + (textCol_scrubbed, n_email, n_ip,
   * n_phone). Counts are computed against the SAME intermediate each
   * replacement pass saw, so overlapping categories never double-count (an
   * email's dotted-digit host can't also count as an IP once the email is
   * already a placeholder). Purely rowwise regexp_replace/regexp_count —
   * no UDF, no shuffle: a map-only pass that fuses into whatever scan
   * feeds it at any corpus size.
   */
  def scrubPii(df: DataFrame, textCol: String = "text"): DataFrame = {
    val (scrubbed, counts) =
      PiiPatterns.foldLeft((col(textCol), List.empty[(String, Column)])) {
        case ((txt, acc), (name, re, token)) =>
          (regexp_replace(txt, re, token),
            (s"n_$name" -> regexp_count(txt, lit(re)).cast("long")) :: acc)
      }
    counts.reverse.foldLeft(df.withColumn(s"${textCol}_scrubbed", scrubbed)) {
      case (d, (name, c)) => d.withColumn(name, c)
    }
  }

  // ---- mixture + split assignment -----------------------------------------

  /** Snapshot diff by content fingerprint: classifies every id across two
    * corpus snapshots as added / removed / changed / unchanged — the
    * incremental-ingest primitive (what must a downstream index or dedup
    * structure reprocess?) and the audit primitive (what did this refresh
    * actually touch?). Inputs are (idCol, fpCol) projections; pass a
    * deterministic content hash (e.g. Poly64 over normalized text) so
    * "changed" means the CONTENT moved, not that a row was rewritten
    * byte-identically. One full-outer hash join on id — shuffle on the id
    * key at any scale, no windows. */
  def snapshotDiff(v1: DataFrame, v2: DataFrame, idCol: String = "doc_id",
                   fpCol: String = "fp"): DataFrame =
    v1.select(col(idCol).as("_id"), col(fpCol).as("_fp1"))
      .join(v2.select(col(idCol).as("_id"), col(fpCol).as("_fp2")),
        Seq("_id"), "full_outer")
      .select(col("_id").as(idCol),
        when(col("_fp1").isNull, "added")
          .when(col("_fp2").isNull, "removed")
          .when(col("_fp1") =!= col("_fp2"), "changed")
          .otherwise("unchanged").as("status"))

  /** Cross-split near-duplicate leakage report — the check every
    * train/valid/test pipeline owes its evaluation: a near-dup pair with one
    * member in train and one in test silently inflates benchmark scores, and
    * hash-based splitting does nothing to prevent it (membership is per-doc,
    * duplicates are per-CONTENT). Joins a split assignment (idCol, split)
    * with a dedup clustering (idCol, rep) and counts, per unordered split
    * pair, the leaking pairs Σ_cluster n_a·n_b and the clusters that leak.
    * Empty output = clean splits.
    *
    * Scale: per-(cluster, split) counts are one combinable aggregate; the
    * pair expansion self-joins THOSE counts (≤ |splits| rows per cluster),
    * never the documents. Returns (split_a, split_b, n_pairs, n_clusters). */
  def splitLeakage(assignments: DataFrame, clusters: DataFrame): DataFrame = {
    val j = clusters.toDF("id", "rep")
      .join(assignments.toDF("id", "split"), "id")
    val pc = j.groupBy(col("rep"), col("split")).agg(count(lit(1)).as("n"))
    pc.select(col("rep"), col("split").as("split_a"), col("n").as("na"))
      .join(pc.select(col("rep"), col("split").as("split_b"), col("n").as("nb")), "rep")
      .filter(col("split_a") < col("split_b"))
      .groupBy(col("split_a"), col("split_b"))
      .agg(sum(col("na") * col("nb")).cast("long").as("n_pairs"),
        count(lit(1)).as("n_clusters"))
  }

  /** Multi-level corpus profile in one scan: ROLLUP over (dim1, dim2) —
    * per-(dim1, dim2) cell, per-dim1 subtotal, grand total — the standard
    * corpus-composition report (docs + chars by source and language, with
    * every marginal) that otherwise costs three separate aggregations.
    * Catalyst expands the rollup into a single partial→final aggregate over
    * the grouping-set-expanded stream, so the input is read ONCE at any
    * scale. NULL grouping placeholders are coalesced to 'ALL' and the
    * grouping_id bit vector (dim1 = high bit) rides along so consumers can
    * distinguish a real NULL-valued group from a subtotal row. */
  def corpusProfile(df: DataFrame, dim1: String, dim2: String,
                    charCol: String = "n_chars"): DataFrame =
    df.rollup(col(dim1), col(dim2))
      .agg(grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n_docs"),
        sum(col(charCol)).cast("long").as("sum_chars"))
      .select(coalesce(col(dim1), lit("ALL")).as(dim1),
        coalesce(col(dim2), lit("ALL")).as(dim2),
        col("gid"), col("n_docs"), col("sum_chars"))

  /**
   * Temperature-based domain mixing (α = 1/2): per-group sampling quotas
   * proportional to √n_d — the standard "flatten the domain distribution"
   * rule multilingual/multi-source training mixes use (raw proportional
   * sampling drowns small domains; uniform ignores size entirely; √n is
   * the classic compromise, e.g. multilingual BERT's exponent-smoothed
   * sampling). All integer-exact, so the allocation is reproducible
   * bit-for-bit on any engine:
   *
   *   - w_d = isqrt(n_d): floor(√·) in doubles then a ±1 integer
   *     correction, so the result is the true integer sqrt regardless of
   *     FP rounding;
   *   - a_d = ⌊B·w_d / Σw⌋ plus largest-remainder top-up (remainder DESC,
   *     group ASC), so Σa_d = B exactly — quota sums never drift off the
   *     token budget.
   *
   * The group column is a bounded profiling dimension (domains, languages,
   * sources): everything after the one corpus-scan count aggregate runs on
   * a #groups-row relation, where single-partition windows are free.
   * Returns (groupCol, n_docs, w, alloc).
   */
  def temperatureMix(df: DataFrame, groupCol: String, budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("n_docs"))
    val k0 = floor(sqrt(col("n_docs").cast("double"))).cast("long")
    val w = when((k0 + 1) * (k0 + 1) <= col("n_docs"), k0 + 1)
      .when(k0 * k0 > col("n_docs"), k0 - 1)
      .otherwise(k0)
    val all = org.apache.spark.sql.expressions.Window.partitionBy()
    val byRem = org.apache.spark.sql.expressions.Window.partitionBy()
      .orderBy(col("rem").desc, col(groupCol).asc)
    counts.withColumn("w", w)
      .withColumn("ws", sum(col("w")).over(all))
      .withColumn("a0", expr(s"($budget * w) div ws"))
      .withColumn("rem", expr(s"($budget * w) % ws"))
      .withColumn("deficit", lit(budget) - sum(col("a0")).over(all))
      .withColumn("rk", row_number().over(byRem))
      .select(col(groupCol), col("n_docs"), col("w"),
        (col("a0") + when(col("rk") <= col("deficit"), 1L).otherwise(0L))
          .as("alloc"))
  }

  /**
   * Deterministic train/valid/test assignment: each row's split is a pure
   * function of its id — stable under reruns, re-partitioning, corpus
   * growth (old rows never migrate), and reproducible from the id alone
   * anywhere. Buckets in thousandths: mix64(poly64(id)) → an unsigned
   * 63-bit value (top bit shifted out so signed/unsigned mod agree across
   * engines) → mod 1000 → first split whose cumulative share exceeds the
   * bucket. Purely rowwise, map-only at any scale.
   */
  def hashSplit(df: DataFrame, idCol: String = "doc_id",
                splits: Seq[(String, Int)] =
                  Seq(("train", 900), ("valid", 50), ("test", 50))): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 >= 0) &&
      splits.map(_._2).sum == 1000,
      s"split shares must be non-negative thousandths summing to 1000: $splits")
    val bucket = pmod(shiftrightunsigned(
      graft.functions.Poly64.mix64(
        graft.functions.Poly64.poly64(col(idCol).cast("string"))), 1),
      lit(1000L))
    val cum = splits.scanLeft(0)(_ + _._2).tail
    val assign = splits.zip(cum).init.foldRight(lit(splits.last._1): Column) {
      case (((name, _), hi), els) => when(bucket < hi, name).otherwise(els)
    }
    df.withColumn("split", assign)
  }

  // ---- bounded per-group top-k --------------------------------------------

  /** One (score, id) candidate. */
  case class Scored(score: Double, id: Long)

  /** Aggregation state: the current k best, sorted best-first. */
  case class TopKState(top: Seq[Scored])

  /** Bounded top-k accumulator: keeps the k best (score DESC, id ASC) pairs
    * in a small sorted list. State is O(k) per group and merge is O(k), so
    * the aggregation is map-side combinable — at 100 TB each executor ships
    * k rows per group instead of its whole partition, and no per-group sort
    * of the full data ever happens (the scale trap of the window-function
    * row_number() formulation). */
  private final class TopK(k: Int)
      extends Aggregator[(Double, Long), TopKState, TopKState] {
    // Total order on the score: primitive >/== are both false for NaN, which
    // would corrupt the sorted-buffer invariant in an insertion-order-
    // dependent (shuffle-nondeterministic) way. NaN sorts STRICTLY below
    // everything — including a genuine -Infinity (collapsing the two would
    // let a NaN outrank a real -Inf score on the id tiebreak) — and -0.0
    // canonicalizes to 0.0 so the order matches SQL comparison.
    private def better(a: Scored, b: Scored): Boolean = {
      val an = java.lang.Double.isNaN(a.score)
      val bn = java.lang.Double.isNaN(b.score)
      if (an != bn) bn // the non-NaN side wins
      else {
        val c =
          if (an) 0 // both NaN: tie, fall to the id tiebreak
          else java.lang.Double.compare(a.score + 0.0, b.score + 0.0)
        c > 0 || (c == 0 && a.id < b.id)
      }
    }
    private def insert(buf: Seq[Scored], x: Scored): Seq[Scored] = {
      val (before, after) = buf.span(better(_, x))
      (before ++ (x +: after)).take(k)
    }
    def zero: TopKState = TopKState(Nil)
    def reduce(buf: TopKState, x: (Double, Long)): TopKState = {
      val cand = Scored(x._1, x._2)
      if (buf.top.sizeIs >= k && better(buf.top.last, cand)) buf
      else TopKState(insert(buf.top, cand))
    }
    def merge(a: TopKState, b: TopKState): TopKState =
      TopKState(b.top.foldLeft(a.top)(insert))
    def finish(buf: TopKState): TopKState = buf
    def bufferEncoder = org.apache.spark.sql.Encoders.product[TopKState]
    def outputEncoder = org.apache.spark.sql.Encoders.product[TopKState]
  }

  /**
   * Per-group top-k selection (score DESC, id ASC tiebreak) — corpus
   * curation's "keep the k best documents per domain". Returns one row per
   * kept document: (groupCol, idCol, scoreCol).
   *
   * Implemented as a typed bounded-heap [[Aggregator]] (partial aggregation,
   * O(k) state) rather than a `row_number()` window, which would shuffle AND
   * sort every row of the largest group into one task.
   */
  def topKPerGroup(df: DataFrame, groupCol: String, scoreCol: String,
                   idCol: String, k: Int): DataFrame = {
    val topk = udaf(new TopK(k))
    df.groupBy(col(groupCol))
      .agg(topk(col(scoreCol).cast("double"), col(idCol).cast("long")).as("t"))
      .select(col(groupCol), explode(col("t.top")).as("p"))
      .select(col(groupCol), col("p.id").as(idCol), col("p.score").as(scoreCol))
  }

  /** [[topKPerGroup]] plus the 1-based rank of each kept row (position in the
    * bounded buffer: score DESC, id ASC) — the drop-in replacement for a
    * `row_number() ≤ k` window without the full per-group sort. */
  def topKRanked(df: DataFrame, groupCol: String, scoreCol: String,
                 idCol: String, k: Int): DataFrame = {
    val topk = udaf(new TopK(k))
    df.groupBy(col(groupCol))
      .agg(topk(col(scoreCol).cast("double"), col(idCol).cast("long")).as("t"))
      .select(col(groupCol), posexplode(col("t.top")).as(Seq("_i", "_p")))
      .select(col(groupCol), col("_p.id").as(idCol), col("_p.score").as(scoreCol),
        (col("_i") + 1).cast("int").as("rank"))
  }

  // ---- Token-budget mixture selection -------------------------------------

  /** Token-budget mixture selection — the domain-weights → token-budgets
    * step of training-mix assembly ([[stratifiedSample]] mixes by ROW rate;
    * this fills each group to a TOKEN quota). Docs are ordered inside each
    * group by a fixed multiplicative hash of id (a deterministic
    * pseudo-random permutation, reproducible in plain integer SQL), and a
    * doc is kept iff the group's running token total BEFORE it is still
    * under `budget` — so the kept set is a stable PREFIX of the permutation
    * (re-runs and budget increases only append) and each group lands within
    * one document of its quota. Returns (idCol, groupCol, n_tokens).
    *
    * `shards` > 1 is the 100 TB path: the hash space is cut into `shards`
    * contiguous ranges, pass 1 runs the prefix sum inside (group, shard) —
    * sort groups of |group|/shards instead of a whole domain in one task —
    * and pass 2 adds per-shard boundary offsets from a |groups|·`shards`-row
    * broadcast relation. The global running sum is identical by
    * construction (the same chunk-then-carry shape as Events.sessionize's
    * hot-key variant). */
  def tokenBudgetMix(docs: DataFrame, budget: Column,
                     groupCol: String = "source", idCol: String = "doc_id",
                     textCol: String = "text", shards: Int = 1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val HashMod = 4294967296L
    val base = docs.select(col(idCol).as("id"), col(groupCol).as("grp"),
      budget.cast("long").as("_budget"),
      TextAnalysis.tokenCount(col(textCol)).as("n_tokens"),
      pmod(col(idCol) * lit(2654435761L), lit(HashMod)).as("_h"))
    val withBefore =
      if (shards <= 1) {
        val w = Window.partitionBy(col("grp")).orderBy(col("_h"), col("id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        base.withColumn("_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      } else {
        // floor(h / width) is monotone in h, so shard ids are contiguous
        // hash ranges and ascending shard order IS ascending hash order
        val width = math.max(HashMod / shards, 1L)
        val sharded = base.withColumn("_shard", (col("_h") / lit(width)).cast("long"))
        val wS = Window.partitionBy(col("grp"), col("_shard"))
          .orderBy(col("_h"), col("id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val wOff = Window.partitionBy(col("grp")).orderBy(col("_shard"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val offsets = sharded.groupBy(col("grp"), col("_shard"))
          .agg(sum(col("n_tokens")).as("_tot"))
          .withColumn("_off", coalesce(sum(col("_tot")).over(wOff), lit(0L)))
          .select(col("grp"), col("_shard"), col("_off"))
        sharded
          .withColumn("_local", coalesce(sum(col("n_tokens")).over(wS), lit(0L)))
          .join(broadcast(offsets), Seq("grp", "_shard"))
          .withColumn("_before", col("_off") + col("_local"))
      }
    withBefore.filter(col("_before") < col("_budget"))
      .select(col("id").as(idCol), col("grp").as(groupCol), col("n_tokens"))
  }

  // ---- Per-group quality quantile filter ----------------------------------

  /** Keep the top `fraction` of each group by score — "top 20 % quality per
    * domain" curation. k(group) = ceil(fraction · |group|); ties break to
    * the lower id. Returns the kept (groupCol, idCol, scoreCol) rows.
    *
    * `bucketOf` is the 100 TB path for a score with KNOWN range (quality ∈
    * [0, 1]): map each score to a coarse bucket (e.g. `floor(score · 32)`),
    * rank inside (group, bucket) — bounded sort groups — and recover the
    * exact global rank by adding the counts of all higher buckets from a
    * |groups|·|buckets|-row broadcast relation. Equal scores always share a
    * bucket, so the bucketed rank is identical to the single-window rank by
    * construction. With `None`, one window per group (fine until a single
    * domain outgrows a task's sort budget). */
  def topQuantilePerGroup(df: DataFrame, groupCol: String, scoreCol: String,
                          idCol: String, fraction: Double,
                          bucketOf: Option[Column => Column] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(fraction >= 0.0 && fraction <= 1.0, "fraction must be in [0, 1]")
    val out = df.select(col(groupCol), col(idCol), col(scoreCol))
    val sizes = Window.partitionBy(col(groupCol))
    val ranked = bucketOf match {
      case None =>
        val w = Window.partitionBy(col(groupCol))
          .orderBy(col(scoreCol).desc, col(idCol))
        out.withColumn("_rn", row_number().over(w))
          .withColumn("_n", count(lit(1)).over(sizes))
      case Some(b) =>
        val bucketed = out.withColumn("_bkt", b(col(scoreCol)).cast("long"))
        val wB = Window.partitionBy(col(groupCol), col("_bkt"))
          .orderBy(col(scoreCol).desc, col(idCol))
        // offset of a bucket = rows in strictly HIGHER buckets of the group
        val wOff = Window.partitionBy(col(groupCol)).orderBy(col("_bkt").desc)
          .rowsBetween(Window.unboundedPreceding, -1)
        val offsets = bucketed.groupBy(col(groupCol), col("_bkt"))
          .agg(count(lit(1)).as("_cnt"))
          .withColumn("_off", coalesce(sum(col("_cnt")).over(wOff), lit(0L)))
          .withColumn("_n", sum(col("_cnt")).over(sizes))
          .select(col(groupCol), col("_bkt"), col("_off"), col("_n"))
        bucketed
          .withColumn("_lrn", row_number().over(wB))
          .join(broadcast(offsets), Seq(groupCol, "_bkt"))
          .withColumn("_rn", col("_off") + col("_lrn"))
    }
    ranked.filter(col("_rn") <= ceil(lit(fraction) * col("_n")))
      .select(col(groupCol), col(idCol), col(scoreCol))
  }

  // ---- DSIR-style importance resampling -----------------------------------

  /**
   * DSIR-style importance weights (Xie et al. 2023, "Data Selection for
   * Language Models via Importance Resampling"): score every corpus
   * document by how much more likely its hashed-unigram bag is under the
   * TARGET distribution (documents matching `targetPred`, e.g. a trusted
   * domain) than under the RAW corpus distribution.
   *
   * Features are word unigrams hashed into `numBuckets` buckets
   * (Poly64 mod B — integer-reproducible in plain SQL, unlike a library
   * murmur). Both bucket distributions come out of ONE aggregation over
   * the tokenized corpus (count + conditional count), are add-one
   * smoothed, and collapse to a B-row broadcast model; scoring is a
   * second corpus scan joined against that broadcast — the classic
   * train-then-score two-scan shape, no shuffle wider than B rows.
   *
   * Per-bucket log-ratios quantize to integer micro-nats BEFORE the
   * per-document sum (the [[TextAnalysis.lmScore]] discipline): long
   * addition is order-independent, so `weight_micro` is hash-stable
   * across engines and shuffle orders. Returns (idCol, weight_micro).
   */
  def dsirWeights(corpus: DataFrame, targetPred: Column,
                  idCol: String = "doc_id", textCol: String = "text",
                  numBuckets: Int = 64): DataFrame =
    dsirWeightsFrom(
      Dedup.spread(corpus).select(col(idCol).as("id"),
          targetPred.as("is_tgt"),
          explode(TextAnalysis.wsTokens(lower(trim(col(textCol))))).as("tok")),
      idCol, numBuckets)

  /**
   * [[dsirWeights]] over the paper's ACTUAL feature space — hashed
   * unigrams AND bigrams (Xie et al. 2023 §3.1 use both; unigrams alone
   * cannot distinguish "new york" from "york new", so phrase-structured
   * target domains lose their signal). The bigram stream is one more
   * rowwise HOF (zip_with against the shifted token array) exploding into
   * the SAME bucket aggregation — still two corpus scans, still a B-row
   * broadcast model.
   */
  def dsirWeightsBigrams(corpus: DataFrame, targetPred: Column,
                         idCol: String = "doc_id", textCol: String = "text",
                         numBuckets: Int = 64): DataFrame =
    dsirWeightsFrom(
      Dedup.spread(corpus).select(col(idCol).as("id"),
          targetPred.as("is_tgt"),
          TextAnalysis.wsTokens(lower(trim(col(textCol)))).as("_toks"))
        .select(col("id"), col("is_tgt"), explode(expr(
          // unigrams ++ bigrams: zip each token with its right neighbor
          // (the shifted slice); the last zip pairs with NULL and filters
          """concat(_toks,
            |  filter(zip_with(_toks, slice(_toks, 2, size(_toks)),
            |           (a, b) -> concat(a, ' ', b)),
            |         g -> g IS NOT NULL))""".stripMargin)).as("tok")),
      idCol, numBuckets)

  /** Shared train-then-score core of the DSIR family: `features` is the
    * exploded (id, is_tgt, tok) stream; everything downstream (bucket
    * hash, one-aggregation two-distribution model, micro-nat log-ratio
    * scoring) is feature-space-agnostic. */
  private def dsirWeightsFrom(features: DataFrame, idCol: String,
                              numBuckets: Int): DataFrame = {
    val bk = features.select(col("id"), col("is_tgt"),
      pmod(Poly64.poly64(col("tok")), lit(numBuckets.toLong)).as("bucket"))
    val model = bk.groupBy(col("bucket")).agg(
      count(lit(1)).as("raw_cnt"),
      sum(when(col("is_tgt"), 1L).otherwise(0L)).as("tgt_cnt"))
    val totals = model.agg(sum(col("raw_cnt")).as("raw_n"),
      sum(col("tgt_cnt")).as("tgt_n"))
    val delta = model.crossJoin(broadcast(totals))
      .withColumn("delta_micro", round((
        log((col("tgt_cnt") + 1).cast("double") / (col("tgt_n") + numBuckets)) -
        log((col("raw_cnt") + 1).cast("double") / (col("raw_n") + numBuckets)))
        * 1e6).cast("long"))
      .select(col("bucket"), col("delta_micro"))
    bk.join(broadcast(delta), Seq("bucket"))
      .groupBy(col("id"))
      .agg(sum(col("delta_micro")).as("weight_micro"))
      .select(col("id").as(idCol), col("weight_micro"))
  }

  /**
   * Deterministic weighted sampling WITHOUT replacement (Efraimidis–
   * Spirakis A-ES, one-pass form): row i gets rank key ln(u_i)/w_i with
   * u_i a Poly64-hash-derived uniform in (0,1], and the k LARGEST keys
   * are the sample — inclusion probability follows the weights, but the
   * draw is a pure function of (id, salt, weight, k): re-runs, retries,
   * speculative tasks, and engine ports agree row-for-row (`df.sample`
   * survives none of those). Selection rides the O(k)-state bounded
   * heap — one scan, no global sort, no RNG state.
   *
   * Keys quantize to integer micro units before ranking (the lmScore ln
   * discipline), id-asc tiebreak. Rows with NULL or non-positive weight
   * are excluded (their inclusion probability is zero). Returns
   * (idCol, sample_key).
   */
  def weightedSample(df: DataFrame, weightCol: String, k: Int,
                     idCol: String = "doc_id",
                     salt: String = "ws:"): DataFrame = {
    val denom = 1L << 52
    val u = (pmod(Poly64.poly64(concat(col(idCol).cast("string"), lit(salt)),
      Poly64.Seed1, saltMult(salt)), lit(denom)) + 1).cast("double") / denom.toDouble
    val scored = df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("_wskey",
        round(log(u) / col(weightCol).cast("double") * 1e6).cast("long"))
      .withColumn("_g", lit(1))
    topKPerGroup(scored, "_g", "_wskey", idCol, k)
      .select(col(idCol), col("_wskey").cast("long").as("sample_key"))
  }

  // ---- exact distributed quantiles ----------------------------------------

  /**
   * EXACT quantiles of a numeric column without a global sort — the data
   * profiling primitive (`approxQuantile` trades accuracy for one pass;
   * this trades one extra cheap pass for exactness, which matters when the
   * quantile becomes a filter threshold that must reproduce bit-identically
   * across engines and reruns).
   *
   * For each probability p the result is the value at ascending rank
   * `max(1, ceil(p·n))` — "smallest v with at least ⌈p·n⌉ values ≤ v".
   *
   * Plan: (1) one scan for min/max/count; (2) one scan folds the
   * equi-width bucket histogram (`numBuckets` rows — a driver-bounded
   * control channel, like the Pregel aggregator lane); the cumulative
   * histogram locates each target rank's bucket and local offset;
   * (3) ONLY the ≤ |probs| candidate buckets' rows re-read + rank with a
   * window partitioned per bucket. No stage ever sorts more than one
   * bucket (~n/numBuckets rows for non-degenerate distributions — a
   * point-mass bucket degrades to that key's count, the same caveat as
   * every value-bucketed ranking here). NULLs are excluded; NaN is
   * rejected up front (it has no place in a value order).
   *
   * Returns (p, value) — `value` is always one of the column's own values.
   */
  def exactQuantiles(df: DataFrame, valueCol: String, probs: Seq[Double],
                     numBuckets: Int = 1024): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p > 0 && p <= 1),
      s"probs must be in (0, 1], got $probs")
    val v = col(valueCol).cast("double")
    val vals = df.filter(v.isNotNull).select(v.as("_v"))
    val Array(stats) = vals.agg(min(col("_v")), max(col("_v")), count(lit(1)),
      sum(when(isnan(col("_v")), 1).otherwise(0))).collect()
    val n = stats.getLong(2)
    val sp = df.sparkSession
    import sp.implicits._
    if (n == 0) return sp.emptyDataFrame
      .select(lit(0.0).as("p"), lit(0.0).as("value")).limit(0)
    require(stats.getLong(3) == 0, s"$valueCol contains NaN")
    val (lo, hi) = (stats.getDouble(0), stats.getDouble(1))
    val width = math.max((hi - lo) / numBuckets, java.lang.Double.MIN_NORMAL)
    val bucketOf = least(floor((col("_v") - lo) / width), lit(numBuckets - 1))
      .cast("int")
    val hist = vals.groupBy(bucketOf.as("_b")).agg(count(lit(1)).as("_c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val cumBefore = hist.scanLeft(0L)(_ + _._2)
    // target rank -> (bucket, rank within bucket)
    val targets = probs.map { p =>
      val rank = math.max(1L, math.ceil(p * n).toLong)
      val i = hist.indices.find(i => cumBefore(i + 1) >= rank).get
      (p, hist(i)._1, rank - cumBefore(i))
    }
    val wanted = targets.map(_._2).distinct
    val local = targets.toDF("p", "_b", "_lr")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("_b")).orderBy(col("_v"))
    vals.withColumn("_b", bucketOf).filter(col("_b").isInCollection(wanted))
      .withColumn("_lr", row_number().over(w).cast("long"))
      .join(broadcast(local), Seq("_b", "_lr"))
      .select(col("p"), col("_v").as("value"))
  }

  /**
   * Per-group [[exactQuantiles]] — "p50/p90 of `valueCol` for every
   * `groupCol`" in the same three bounded passes: one global min/max scan,
   * one (group, bucket) histogram (the driver control channel is
   * |groups|·numBuckets entries — meant for PROFILING dimensions of
   * bounded cardinality: event types, languages, sources; not user-id-like
   * keys), then a ranking window over only the candidate (group, bucket)
   * slices. Groups are compared as strings (the output `groupCol` is the
   * string form). Returns (groupCol, p, value).
   */
  def exactQuantilesPerGroup(df: DataFrame, groupCol: String, valueCol: String,
                             probs: Seq[Double],
                             numBuckets: Int = 1024): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p > 0 && p <= 1),
      s"probs must be in (0, 1], got $probs")
    val v = col(valueCol).cast("double")
    val vals = df.filter(v.isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).cast("string").as("_g"), v.as("_v"))
    val Array(stats) = vals.agg(min(col("_v")), max(col("_v")), count(lit(1)),
      sum(when(isnan(col("_v")), 1).otherwise(0))).collect()
    val sp = df.sparkSession
    import sp.implicits._
    if (stats.getLong(2) == 0) return sp.emptyDataFrame
      .select(lit("").as(groupCol), lit(0.0).as("p"), lit(0.0).as("value")).limit(0)
    require(stats.getLong(3) == 0, s"$valueCol contains NaN")
    val (lo, hi) = (stats.getDouble(0), stats.getDouble(1))
    val width = math.max((hi - lo) / numBuckets, java.lang.Double.MIN_NORMAL)
    val bucketOf = least(floor((col("_v") - lo) / width), lit(numBuckets - 1))
      .cast("int")
    val hist = vals.groupBy(col("_g"), bucketOf.as("_b"))
      .agg(count(lit(1)).as("_c"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    val targets = hist.toSeq.flatMap { case (g, buckets) =>
      val cumBefore = buckets.scanLeft(0L)(_ + _._3)
      val gn = cumBefore.last
      probs.map { p =>
        val rank = math.max(1L, math.ceil(p * gn).toLong)
        val i = buckets.indices.find(i => cumBefore(i + 1) >= rank).get
        (g, p, buckets(i)._2, rank - cumBefore(i))
      }
    }
    val wantedKeys = targets.map(t => (t._1, t._3)).distinct.toSet
    val local = targets.toDF("_g", "p", "_b", "_lr")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("_g"), col("_b")).orderBy(col("_v"))
    val wantedB = wantedKeys.map(_._2).toSeq
    vals.withColumn("_b", bucketOf).filter(col("_b").isInCollection(wantedB))
      .withColumn("_lr", row_number().over(w).cast("long"))
      .join(broadcast(local), Seq("_g", "_b", "_lr"))
      .select(col("_g").as(groupCol), col("p"), col("_v").as("value"))
  }

  /** [[dsirWeights]] + deterministic selection: keep the `k` documents
    * with the highest importance weight (weight DESC, id ASC tiebreak),
    * via the bounded-heap [[topKPerGroup]] — no global sort. Integer
    * weights make the cut exactly reproducible (a double-weight rank
    * would be engine-dependent at ties). `bigrams = true` swaps the weight
    * source to [[dsirWeightsBigrams]] (the paper's unigram+bigram feature
    * space) — the selection tail is identical. Returns
    * (idCol, weight_micro). */
  def dsirSample(corpus: DataFrame, targetPred: Column, k: Int,
                 idCol: String = "doc_id", textCol: String = "text",
                 numBuckets: Int = 64, bigrams: Boolean = false): DataFrame = {
    val w = (if (bigrams)
        dsirWeightsBigrams(corpus, targetPred, idCol, textCol, numBuckets)
      else dsirWeights(corpus, targetPred, idCol, textCol, numBuckets))
      .withColumn("_g", lit(1))
    topKPerGroup(w, "_g", "weight_micro", idCol, k)
      .select(col(idCol), col("weight_micro").cast("long").as("weight_micro"))
  }

  // ---- C4-style heuristic cleaning (Raffel et al., JMLR'20 §2.2) ----------

  /** Lowercased, punctuation-stripped word array — the match unit for the
    * C4 blocklist rules ("contains the WORD w", so `javascript.` and
    * `(javascript)` both count, but `ecmascript` does not). Split on runs
    * of anything outside [a-z0-9']; empties from leading/trailing
    * punctuation are harmless to an overlap test. */
  private def c4Words(text: Column): Column =
    split(regexp_replace(lower(text), "[^a-z0-9']+", " "), " ")

  /** C4's line-level cleaning (Raffel et al. JMLR'20 §2.2, the three line
    * rules): split on newlines and KEEP only lines that (a) end in a
    * terminal punctuation mark (. ! ? or closing quote), (b) have at least
    * `minWords` whitespace words, and (c) contain none of `bannedWords`
    * as a word (the paper drops lines with "javascript" — the cookie/JS
    * boilerplate signature). Survivors are rejoined with newlines.
    *
    * Output: one row per input document, (idCol, n_kept, n_dropped,
    * text_fp) — the [[Dedup.lineDedup]] narrow gated shape (text_fp =
    * Poly64 of the rebuilt text; a doc with no surviving lines
    * fingerprints the empty string).
    *
    * Scale shape: ENTIRELY rowwise — a higher-order `filter` over the
    * split line array inside one projection, no explode, no shuffle, no
    * aggregation. At 100 TB this is a single codegen'd scan; the filter
    * composes with any downstream dedup at zero extra passes. */
  def c4LineFilter(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text", minWords: Int = 5,
                   bannedWords: Seq[String] = Seq("javascript")): DataFrame = {
    require(minWords >= 1, s"minWords must be >= 1, got $minWords")
    val lines = split(coalesce(col(textCol), lit("")), "\n", -1)
    val keepLine = (l: Column) => {
      val t = trim(l)
      t.rlike("[.!?\"]$") &&
        (size(split(t, "\\s+")) >= minWords) &&
        !arrays_overlap(c4Words(t), typedLit(bannedWords))
    }
    val kept = filter(lines, keepLine)
    docs.select(col(idCol),
      size(kept).cast("long").as("n_kept"),
      (size(lines) - size(kept)).cast("long").as("n_dropped"),
      Poly64.poly64(array_join(kept, "\n")).as("text_fp"))
  }

  /** C4's page-level cleaning flags (Raffel et al. JMLR'20 §2.2): a page
    * is dropped when it contains any `blocklist` word (the paper uses the
    * public "bad words" list — caller-supplied here), the phrase
    * "lorem ipsum", a curly brace (code), or fewer than `minSentences`
    * sentences (terminal-punctuation marks). Emits the individual flags
    * plus the verdict so a pipeline can report WHY documents were dropped
    * — (idCol, has_bad_word, has_lorem, has_brace, n_sentences, keep).
    *
    * Scale shape: rowwise flags in one codegen'd projection — word-set
    * overlap against a literal array, two substring tests, one
    * regexp_replace length count; no shuffle anywhere. */
  def c4DocFilter(docs: DataFrame, blocklist: Seq[String],
                  idCol: String = "doc_id", textCol: String = "text",
                  minSentences: Int = 3): DataFrame = {
    require(blocklist.nonEmpty, "blocklist must be non-empty")
    val text = coalesce(col(textCol), lit(""))
    val low = lower(text)
    val nSent = (length(text) -
      length(regexp_replace(text, "[.!?]", ""))).cast("long")
    docs.select(col(idCol),
        arrays_overlap(c4Words(text), typedLit(blocklist)).as("has_bad_word"),
        low.contains("lorem ipsum").as("has_lorem"),
        low.contains("{").as("has_brace"),
        nSent.as("n_sentences"))
      .withColumn("keep",
        !col("has_bad_word") && !col("has_lorem") && !col("has_brace") &&
          col("n_sentences") >= minSentences)
  }
}

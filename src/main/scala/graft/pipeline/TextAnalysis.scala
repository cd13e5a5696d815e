package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for large-scale training-data pipelines: token
 * counting, quality scoring, language ID, document fingerprinting.
 *
 * Everything is built from `org.apache.spark.sql.functions` (wholestage
 * codegen, pushdown-friendly) — no Scala UDFs in the hot path, so a 100 TB
 * scan stays in Tungsten. Each operator appends columns to the input frame so
 * pipelines compose as one Catalyst plan (one pass over the corpus).
 */
object TextAnalysis {

  /** Whitespace tokens. */
  def wsTokens(text: Column): Column = split(trim(text), "\\s+")

  /** Attach a ONE-ROW aggregate frame's columns to every row of `df` as
    * broadcast scalars — the corpus-constants pattern (n_docs, avgdl,
    * vocabulary totals) behind the TF-IDF / BM25 / LM / PMI scorers: a
    * broadcast cross join of a single row is a shuffle-free column attach,
    * never a cartesian blow-up. */
  private def withScalars(df: DataFrame, scalars: DataFrame): DataFrame =
    df.crossJoin(broadcast(scalars))

  /** Whitespace token count; empty/null-safe. */
  def tokenCount(text: Column): Column =
    when(text.isNull || length(trim(text)) === 0, lit(0))
      .otherwise(size(wsTokens(text)))

  /** BPE-ish subword count: splits on word boundaries AND digit/letter
    * transitions, counting punctuation runs separately — a cheap deterministic
    * stand-in for a real tokenizer's token count (≈ GPT-style regex). */
  def subwordCount(text: Column): Column =
    when(text.isNull, lit(0)).otherwise(
      size(filter(
        split(text, "(?<=[a-zA-Z])(?=[0-9])|(?<=[0-9])(?=[a-zA-Z])|\\s+|(?=[^a-zA-Z0-9\\s])"),
        t => length(t) > 0)))

  /** Per-document quality features + composite score in [0,1]:
    * word count, mean word length, stopword ratio, punctuation ratio,
    * digit ratio, uppercase ratio. Weights are fixed and documented so the
    * score is reproducible across engines. */
  def qualityScore(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val toks = wsTokens(t)
    val n = size(toks).cast("double")
    val chars = length(t).cast("double")
    val stop = typedLit(Stopwords.en)
    val out = df
      .withColumn("n_tokens", size(toks))
      .withColumn("mean_token_len",
        when(n > 0, (chars - (n - 1)) / n).otherwise(lit(0.0)))
      .withColumn("stopword_ratio",
        when(n > 0, size(filter(toks, w => array_contains(stop, lower(w)))) / n)
          .otherwise(lit(0.0)))
      .withColumn("punct_ratio",
        when(chars > 0, (chars - length(regexp_replace(t, "[\\p{Punct}]", ""))) / chars)
          .otherwise(lit(0.0)))
      .withColumn("digit_ratio",
        when(chars > 0, (chars - length(regexp_replace(t, "[0-9]", ""))) / chars)
          .otherwise(lit(0.0)))
    // composite: long enough, words not too long/short, some stopwords,
    // little punctuation/digit noise
    out.withColumn("quality",
      round(
        greatest(lit(0.0), least(lit(1.0),
          lit(0.25) * least(col("n_tokens") / 64.0, lit(1.0)) +
          lit(0.25) * when(col("mean_token_len").between(3.0, 10.0), 1.0).otherwise(0.0) +
          lit(0.25) * least(col("stopword_ratio") * 4.0, lit(1.0)) +
          lit(0.25) * (lit(1.0) - least(col("punct_ratio") + col("digit_ratio"), lit(1.0)))
        )), 6))
  }

  /** Language ID via stopword-profile voting: score each language by the
    * fraction of tokens found in its profile; argmax wins, 'und' when no
    * profile scores > 0. An n-gram heuristic classifier — not a model. */
  def langId(df: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = wsTokens(lower(col(textCol)))
    val scored = Stopwords.profiles.foldLeft(df) { case (d, (lang, words)) =>
      d.withColumn(s"_s_$lang",
        size(filter(toks, w => array_contains(typedLit(words), w))))
    }
    val langs = Stopwords.profiles.keys.toSeq
    val best = langs.map(l => struct(col(s"_s_$l").as("score"), lit(l).as("lang")))
    scored
      .withColumn("_best", greatest(best: _*))
      .withColumn("lang_pred",
        when(col("_best.score") > 0, col("_best.lang")).otherwise(lit("und")))
      .withColumn("lang_score", col("_best.score"))
      .drop(langs.map(l => s"_s_$l") :+ "_best": _*)
  }

  /** Per-document TF-IDF keyword extraction: the top term per document ranked
    * by `round(tf · ln(N/df), 6)` (ties broken by term, ascending). The score
    * is rounded BEFORE ranking so the ordering is reproducible across engines.
    *
    * Scale shape: tf is a (doc, term) hash-groupBy with map-side combine; df
    * is a term groupBy over the (already reduced) tf frame, so stopword-skewed
    * terms are absorbed by partial aggregation before the shuffle; the corpus
    * size joins in as a broadcast scalar; top-1 per doc is an argmin
    * aggregate — `min(struct(-tfidf, term, ...))` ≡ (tfidf DESC, term ASC) —
    * with map-side combine, never a partition-local sort. No driver-side
    * actions — one Catalyst plan end to end. */
  def tfIdfTop(df: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val terms = Dedup.spread(df).select(col(idCol).as("doc_id"),
      explode(wsTokens(lower(trim(col(textCol))))).as("term"))
    val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val total = df.agg(count(lit(1)).as("n_docs"))
    val scored = withScalars(tf.join(dfreq, "term"), total)
      .withColumn("tfidf",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6))
    scored.groupBy(col("doc_id"))
      .agg(min(struct((-col("tfidf")).as("_nt"), col("term").as("term"),
        col("tf").as("tf"), col("df").as("df"), col("tfidf").as("tfidf"))).as("_b"))
      .select(col("doc_id"), col("_b.term"), col("_b.tf"), col("_b.df"),
        col("_b.tfidf"))
  }

  /** Gopher-style repetition features: the fraction of token / 2-gram /
    * 3-gram occurrences that are repeats of an earlier occurrence in the same
    * document (`1 − distinct/total`, 0 for docs too short to have any).
    * Entirely rowwise over the token array (codegen'd shingle expression) —
    * a 100 TB corpus scan with NO shuffle. */
  def repetition(df: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = wsTokens(lower(trim(col(textCol))))
    val m = size(toks)
    def dupRatio(n: Int): Column = {
      val total = (m - (n - 1)).cast("double")
      val distinctN =
        if (n == 1) size(array_distinct(toks))
        else size(Dedup.shinglesFromTokens(toks, n))
      when(total > 0, round(lit(1.0) - distinctN.cast("double") / total, 6))
        .otherwise(lit(0.0))
    }
    df.withColumn("n_tokens", m)
      .withColumn("dup_token_ratio", dupRatio(1))
      .withColumn("dup_2gram_ratio", dupRatio(2))
      .withColumn("dup_3gram_ratio", dupRatio(3))
  }

  /** Cross-document repetition coverage — the corpus-level complement of
    * [[repetition]]'s intra-document ratios: for each document, how much of
    * it is boilerplate the rest of the corpus also contains? A document's
    * DISTINCT word n-gram shingles are counted against the number of
    * documents sharing each shingle; `shared_ppm` = the integer-ppm
    * fraction of its shingles that occur in ≥ 2 documents (the
    * deduplicate-training-data diagnostic: high shared coverage ⇒ template
    * or mirror content even when no single document is a near-dup).
    *
    * Scale shape: shingles explode once (distinct within doc — rowwise),
    * the doc-frequency aggregate is a combinable count keyed by shingle,
    * and the join back is the same inverted-index equi-join every dedup
    * pipeline here uses; hot boilerplate shingles are heavy only on the
    * probe side (AQE skew-split territory), never in a sort group.
    * Returns (idCol, n_shingles, n_shared, shared_ppm), one row per input
    * document (short docs: 0/0/0). */
  def sharedShingleCoverage(docs: DataFrame, idCol: String = "doc_id",
                            textCol: String = "text", n: Int = 3): DataFrame = {
    val sh = docs.select(col(idCol).as("_id"),
      explode(Dedup.wordShingles(col(textCol), n)).as("_g"))
    val docFreq = sh.groupBy(col("_g")).agg(count(lit(1)).as("_nd"))
    val per = sh.join(docFreq, Seq("_g"))
      .groupBy(col("_id"))
      .agg(count(lit(1)).as("_n_shingles"),
        sum(when(col("_nd") > 1, 1L).otherwise(0L)).as("_n_shared"))
    docs.select(col(idCol).as("_id")).join(per, Seq("_id"), "left_outer")
      .select(col("_id").as(idCol),
        coalesce(col("_n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("_n_shared"), lit(0L)).as("n_shared"),
        when(coalesce(col("_n_shingles"), lit(0L)) > 0,
          expr("_n_shared * 1000000 div _n_shingles"))
          .otherwise(lit(0L)).as("shared_ppm"))
  }

  /** Split documents into fixed-size token chunks with overlap — the
    * training/RAG preparation step. Chunk i covers tokens
    * [i·stride, i·stride + chunkTokens) over the whitespace tokens of the
    * lowercased text (stride = chunkTokens − overlap); the last chunk may be
    * shorter, and every document yields at least one chunk. Returns one row
    * per chunk: (all input columns, chunk_idx, chunk_tokens, chunk_text).
    * Entirely rowwise (sequence + transform + slice HOFs) — a corpus scan
    * with NO shuffle, so it composes into the same single pass as the rest
    * of TextAnalysis. */
  def chunk(df: DataFrame, textCol: String = "text",
            chunkTokens: Int = 64, overlap: Int = 8): DataFrame = {
    require(chunkTokens > overlap && overlap >= 0,
      "need chunkTokens > overlap >= 0")
    val stride = chunkTokens - overlap
    val toks = wsTokens(lower(trim(col(textCol))))
    val m = size(toks)
    // number of chunks: 1 + ceil(max(m - chunkTokens, 0) / stride)
    val extra = greatest(m - chunkTokens, lit(0))
    val nChunks = lit(1) + ceil(extra.cast("double") / stride).cast("int")
    df.withColumn("_toks", toks)
      .withColumn("chunk_idx", explode(sequence(lit(0), nChunks - 1)))
      .withColumn("_chunk",
        slice(col("_toks"), col("chunk_idx") * stride + 1, lit(chunkTokens)))
      .withColumn("chunk_tokens", size(col("_chunk")))
      .withColumn("chunk_text", concat_ws(" ", col("_chunk")))
      .drop("_toks", "_chunk")
  }

  // ---------------------------------------------------------------------
  // Deterministic rule-based sentence segmentation — C4's cleaning and
  // span-dedup unit is the SENTENCE (Raffel et al. JMLR'20 §2.2), not the
  // newline: terminal punctuation + closing-quote strip + abbreviation
  // guard + no-split-after-bare-numbers, all expressed as rowwise Column
  // logic so BOTH engines replay it token-for-token (the cross-engine
  // gate discipline — no model, no lookahead, no state beyond the fold).
  // ---------------------------------------------------------------------

  /** Abbreviation guard list for [[sentenceBoundary]] (lowercased, with
    * trailing period): tokens that end with '.' but do not end a
    * sentence. Fixed and documented — determinism over coverage. */
  val SentenceAbbrevs: Seq[String] = Seq(
    "mr.", "mrs.", "ms.", "dr.", "prof.", "st.", "jr.", "sr.", "vs.",
    "etc.", "e.g.", "i.e.", "fig.", "no.", "inc.", "ltd.", "co.", "al.",
    "approx.", "dept.", "est.", "a.m.", "p.m.", "u.s.")

  /** True iff a sentence ends AT this whitespace token: after stripping
    * trailing closing quotes/brackets, the token ends with `.`/`!`/`?`
    * and is neither a guarded abbreviation, a single-letter initial
    * ("j."), nor a bare number ("3." — the no-split-inside-numbers rule;
    * "3.14" never triggers because its dot is mid-token). */
  def sentenceBoundary(tok: Column): Column = {
    val core = regexp_replace(tok, "[\"')\\]»”’]+$", "")
    val lc = lower(core)
    core.rlike("[.!?]$") &&
      !array_contains(typedLit(SentenceAbbrevs), lc) &&
      !lc.rlike("^[a-z]\\.$") &&
      !core.rlike("^[0-9]+\\.$")
  }

  /** Split `text` into sentences (array of space-rejoined token runs, one
    * per [[sentenceBoundary]] group; a trailing run with no terminal is
    * its own sentence; empty text yields a single empty sentence — the
    * whitespace-token convention).
    *
    * Scale shape: ONE rowwise `aggregate` fold over the token array —
    * zero shuffle, composes into the same corpus scan as the rest of
    * TextAnalysis; feeds [[graft.pipeline.Dedup.sentenceSpanDedup]] so
    * C4's three-sentence unit is a real sentence, not a pre-wrapped
    * newline. */
  def segmentSentences(text: Column): Column = {
    val emptyArr = array().cast("array<string>")
    aggregate(
      wsTokens(text),
      struct(emptyArr.as("done"), emptyArr.as("cur")),
      (acc, x) => {
        val cur2 = array_append(acc.getField("cur"), x)
        when(sentenceBoundary(x),
          struct(array_append(acc.getField("done"),
            array_join(cur2, " ")).as("done"), emptyArr.as("cur")))
          .otherwise(struct(acc.getField("done").as("done"), cur2.as("cur")))
      },
      acc => when(size(acc.getField("cur")) === 0, acc.getField("done"))
        .otherwise(array_append(acc.getField("done"),
          array_join(acc.getField("cur"), " "))))
  }

  /** Unigram-LM quality score (the CCNet/RedPajama perplexity-proxy
    * filter): each document's mean token log-probability under the corpus's
    * own add-one-smoothed unigram distribution — low scores flag documents
    * whose vocabulary is atypical for the corpus (boilerplate, noise,
    * wrong-language). Returns (idCol, n_tokens, lm_score) with the score
    * rounded to 6 dp (ln parity discipline: rounding BEFORE any downstream
    * ranking keeps cross-engine argmaxes stable).
    *
    * Scale shape: the model "training" is the (term → count) aggregate with
    * map-side combine; scoring joins each doc's tf frame against it (the
    * model is corpus-vocabulary-sized — shuffle join; AQE broadcasts it
    * when small) and averages weighted log-probs per doc. Two scans, three
    * shuffles, no driver-side state. */
  def lmScore(df: DataFrame, idCol: String = "doc_id",
              textCol: String = "text"): DataFrame =
    // self-scoring IS reference scoring with the model trained on the
    // corpus itself (every term in-vocabulary, so the OOV column is
    // constant 0 and dropped) — one implementation of the
    // cross-engine-critical quantization, spec-pinned equivalent
    lmScoreAgainst(lmModel(df, textCol), df, idCol, textCol)
      .drop("n_oov")

  /** The mergeable unigram model behind [[lmScoreAgainst]]: (term, cnt)
    * token counts of a REFERENCE corpus. Models over disjoint shards merge
    * by pointwise SUM ([[mergeLmModels]]) — the gramDfIndex / HLL-register
    * maintained-profile contract, so the reference model is maintained
    * across ingestion batches, never retrained. One combinable aggregate
    * scan. */
  def lmModel(df: DataFrame, textCol: String = "text"): DataFrame =
    Dedup.spread(df)
      .select(explode(wsTokens(lower(trim(col(textCol))))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))

  /** Pointwise-sum merge of [[lmModel]] shards (union of shard models ≡
    * model of the union, same contract as [[Sketches.mergeLogHistograms]]). */
  def mergeLmModels(ms: Seq[DataFrame]): DataFrame = {
    require(ms.nonEmpty, "nothing to merge")
    ms.map(_.select(col("term"), col("cnt").cast("long")))
      .reduce(_ unionByName _)
      .groupBy(col("term")).agg(sum(col("cnt")).as("cnt"))
  }

  /** The deployed CCNet shape of [[lmScore]] (Wenzek et al., LREC 2020:
    * Common Crawl is scored against a LM trained on a curated reference
    * domain — there Wikipedia — not against itself): score `docs` under
    * the add-one-smoothed unigram distribution of a SEPARATE [[lmModel]].
    * Out-of-vocabulary terms take the smoothing floor 1/(N+V) — exactly
    * the cnt=0 case of the (cnt+1)/(N+V) rule, so the scorer needs no
    * special OOV branch, and `n_oov` (OOV token occurrences) rides along
    * as its own filter signal. Returns
    * (idCol, n_tokens, n_oov, lm_micro_total, lm_score).
    *
    * Cross-engine discipline (this is the ONE implementation — [[lmScore]]
    * delegates here): per-term contributions quantize to integer
    * micro-nats BEFORE the sum; long addition is order-independent, so
    * the aggregate is hash-stable across engines and shuffle orders (a
    * raw double sum is not). Hash-gate on the exact integer
    * `lm_micro_total` — round(double, 6) of the quotient can land on
    * opposite sides of a half boundary between engines.
    *
    * Scale shape: scoring joins the per-doc tf frame LEFT against the
    * model (model is reference-corpus-vocabulary-sized — shuffle join,
    * AQE broadcasts it when small); totals are a one-row broadcast
    * attach; per-doc reduction is a combinable aggregate. The model is
    * scored-corpus-independent, so a maintained model amortizes across
    * every crawl scored against it. */
  def lmScoreAgainst(model: DataFrame, docs: DataFrame,
                     idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    val tf = Dedup.spread(docs).select(col(idCol).as("doc_id"),
        explode(wsTokens(lower(trim(col(textCol))))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val m = model.select(col("term"), col("cnt").cast("long").as("cnt"))
    val totals = m.agg(sum(col("cnt")).as("n_total"),
      count(lit(1)).as("n_vocab"))
    withScalars(tf.join(m, Seq("term"), "left_outer"), totals)
      .withColumn("_cnt", coalesce(col("cnt"), lit(0L)))
      .withColumn("_lpm", round(col("tf") * log(
        (col("_cnt") + 1).cast("double") / (col("n_total") + col("n_vocab")))
        * 1e6).cast("long"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_tokens"),
        sum(when(col("_cnt") === 0, col("tf")).otherwise(lit(0L))).as("n_oov"),
        sum(col("_lpm")).as("lm_micro_total"),
        round((sum(col("_lpm")) / 1e6) / sum(col("tf")), 6).as("lm_score"))
  }

  /** CCNet's head/middle/tail perplexity split (Wenzek et al., LREC 2020
    * §4.3 — the third member of the CCNet triptych beside [[lmScoreAgainst]]
    * and the NB domain classifier): each document's reference-LM NLL
    * (mean negative log-probability in integer micro-nats —
    * `(−lm_micro_total) div n_tokens`, floor division of non-negatives,
    * so engines agree bit-for-bit) is compared against the corpus
    * terciles; 'head' = most reference-like, the slice CCNet keeps.
    *
    * Thresholds come from the MERGEABLE [[Sketches.logHistogram]] sketch
    * (exact below 2^(s+1), ≤ 0.4 % relative above at the default s = 7) —
    * the deployed shape: a 100 TB corpus keeps per-shard histograms,
    * merges them by pointwise sum, decodes two thresholds on the driver
    * (a control read over ≤ ~7.4k bucket rows — never the data), and the
    * assignment pass is a rowwise comparison against two literals. The
    * scored frame is localCheckpointed so the corpus is scored ONCE, not
    * once per pass. Returns (idCol, n_tokens, n_oov, nll_micro, bucket). */
  def lmBuckets(model: DataFrame, docs: DataFrame, idCol: String = "doc_id",
                textCol: String = "text", subBucketBits: Int = 7): DataFrame =
    bucketizeNll(
      lmScoreAgainst(model, docs, idCol, textCol)
        .withColumn("nll_micro", expr(s"(-lm_micro_total) div n_tokens"))
        .select(col(idCol), col("n_tokens"), col("n_oov"), col("nll_micro")),
      subBucketBits)

  /** The tercile half of [[lmBuckets]], factored out so ANY per-document
    * NLL scorer plugs in (the order-n Stupid Backoff model via
    * [[lmNgramBuckets]], the unigram model via [[lmBuckets]]): head/middle/
    * tail assignment over a scored frame carrying an integer `nll_micro`
    * column. Thresholds come from the MERGEABLE [[Sketches.logHistogram]]
    * (exact below 2^(s+1), ≤ 0.4 % relative above) decoded on the driver —
    * a control read over bucket rows, never the data — and the assignment
    * pass is a rowwise comparison against two literals (never a corpus
    * sort). The scored frame is localCheckpointed so the corpus is scored
    * ONCE, not once per pass. */
  def bucketizeNll(scoredIn: DataFrame, subBucketBits: Int = 7): DataFrame = {
    val scored = scoredIn.localCheckpoint(true)
    val hist = Sketches.logHistogram(scored, "nll_micro", subBucketBits)
    // thresholds are the tercile buckets' inclusive UPPER bounds (not the
    // midpoint representatives — a midpoint can undercut every value in
    // its own bucket and silently empty 'head')
    val ts = Sketches.logHistogramQuantileEnds(
        hist, Seq(1.0 / 3, 2.0 / 3), subBucketBits)
      .collect().map(_.getLong(1))
    if (ts.isEmpty) // empty corpus: keep the schema, emit no rows
      scored.withColumn("bucket", lit(null).cast("string"))
    else scored.withColumn("bucket",
      when(col("nll_micro") <= ts(0), lit("head"))
        .when(col("nll_micro") <= ts(1), lit("middle"))
        .otherwise(lit("tail")))
  }

  // ---------------------------------------------------------------------
  // Order-n LM with Stupid Backoff — the deployed CCNet filter's actual
  // shape (Wenzek et al., LREC 2020 §4.3 score with an order-5 KenLM; a
  // unigram model ranks documents substantially by OOV mass, not fluency).
  // Stupid Backoff (Brants et al., EMNLP 2007 §4: S(w|ctx) = f(ctx·w)/f(ctx)
  // when the full n-gram was seen, else α·S(w|shorter ctx), fixed α = 0.4)
  // is the web-scale member of the n-gram family: NO discounting, NO
  // normalization pass — scores are ratios of raw counts, so training stays
  // a pure pointwise-SUM-mergeable aggregate (the lmModel/nbModel contract)
  // and the integer micro-nat quantization discipline survives intact.
  // ---------------------------------------------------------------------

  /** Mergeable order-n gram model: (n, gram, cnt) raw counts of every
    * k-gram, k = 1..order, over the reference corpus (gram = space-joined
    * lowercased whitespace tokens). Raw counts at EVERY order make the
    * model prefix-closed — cnt(n, ctx·w) > 0 implies cnt(n−1, ctx) > 0 —
    * so Stupid Backoff's denominators always exist when a numerator hits.
    * Merge shards with [[mergeLmNgramModels]] (pointwise sum — union of
    * shard models ≡ model of the union).
    *
    * Scale shape: one rowwise nested-HOF gram expansion (≤ order structs
    * per token, no self-joins) into one combinable count aggregate — the
    * lmModel plan, `order`× wider. */
  def lmNgramModel(df: DataFrame, textCol: String = "text",
                   order: Int = 3): DataFrame = {
    require(order >= 2 && order <= 8, s"order must be in [2, 8], got $order")
    Dedup.spread(df)
      .select(wsTokens(lower(trim(col(textCol)))).as("_toks"))
      .select(explode(expr(
        s"""flatten(transform(_toks, (x, i) ->
           |  transform(filter(sequence(1, $order), k -> k <= i + 1), k ->
           |    named_struct('n', k,
           |      'gram', array_join(slice(_toks, i - k + 2, k), ' ')))))"""
          .stripMargin)).as("g"))
      .groupBy(col("g.n").as("n"), col("g.gram").as("gram"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Pointwise-sum merge of [[lmNgramModel]] shards. */
  def mergeLmNgramModels(ms: Seq[DataFrame]): DataFrame = {
    require(ms.nonEmpty, "nothing to merge")
    ms.map(_.select(col("n"), col("gram"), col("cnt").cast("long")))
      .reduce(_ unionByName _)
      .groupBy(col("n"), col("gram")).agg(sum(col("cnt")).as("cnt"))
  }

  /** Score `docs` under an order-n [[lmNgramModel]] with Stupid Backoff:
    * each position i starts at the LONGEST level its left context allows
    * (k₀ = min(i+1, order) — no penalty for a document's first tokens) and
    * backs off k₀ → k₀−1 → … → 1, multiplying α = 0.4 per step, until a
    * level whose full k-gram the model has seen; the level-k score is the
    * raw-count ratio cnt(k-gram)/cnt((k−1)-gram-context). The unigram
    * floor is add-one-smoothed, (cnt+1)/(N+V) — the [[lmScoreAgainst]]
    * cnt=0 discipline (Brants' unsmoothed f(w)/N is zero on OOV, which no
    * log score survives), so `n_oov` rides along unchanged.
    *
    * Cross-engine discipline (gate-pinned): per-position contributions
    * quantize to integer micro-nats BEFORE the per-document sum; the α
    * power is built by literal double MULTIPLICATION (0.4·(0.4·…)), never
    * pow(), so both engines fold the identical IEEE product. Returns
    * (idCol, n_tokens, n_oov, n_full, n_backoff_steps, lm_micro_total):
    * n_full = positions scored at their full available level,
    * n_backoff_steps = total α-steps taken — the backoff profile that
    * makes a degenerate gate visible (all-unigram ⟹ the order-n machinery
    * proved nothing).
    *
    * Scale shape: the probe stream (≤ order rows per token) joins the
    * model ONCE on (n, gram) — one equi-join regardless of order, AQE
    * broadcasts a small model; numerator counts pivot back per position in
    * one combinable aggregate; each level's DENOMINATOR cnt((k−1)-prefix)
    * is the numerator of level k−1 at position i−1, recovered by a lag
    * window PARTITIONED BY document (bounded by one doc's tokens) instead
    * of a second round of model joins; the per-doc reduction reuses that
    * partitioning. No driver-side state, no unpartitioned window. */
  def lmNgramScoreAgainst(model: DataFrame, docs: DataFrame,
                          idCol: String = "doc_id", textCol: String = "text",
                          order: Int = 3): DataFrame = {
    require(order >= 2 && order <= 8, s"order must be in [2, 8], got $order")
    val m = model.select(col("n").cast("int").as("n"), col("gram"),
      col("cnt").cast("long").as("cnt"))
    val totals = m.filter(col("n") === 1)
      .agg(sum(col("cnt")).as("n_total"), count(lit(1)).as("n_vocab"))
    val probes = Dedup.spread(docs)
      .select(col(idCol).as("doc_id"),
        wsTokens(lower(trim(col(textCol)))).as("_toks"))
      .select(col("doc_id"), explode(expr(
        s"""flatten(transform(_toks, (x, i) ->
           |  transform(filter(sequence(1, $order), k -> k <= i + 1), k ->
           |    named_struct('pos', i, 'n', k,
           |      'gram', array_join(slice(_toks, i - k + 2, k), ' ')))))"""
          .stripMargin)).as("g"))
      .select(col("doc_id"), col("g.pos").as("pos"), col("g.n").as("n"),
        col("g.gram").as("gram"))
    val pivoted = probes.join(m, Seq("n", "gram"), "left_outer")
      .groupBy(col("doc_id"), col("pos"))
      .agg(max(when(col("n") === 1, col("cnt"))).as("c1"),
        (2 to order).map(k =>
          max(when(col("n") === k, col("cnt"))).as(s"c$k")): _*)
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val withDenoms = (2 to order).foldLeft(pivoted) { (df, k) =>
      // cnt of the level-k context (k−1)-gram = level-(k−1) numerator one
      // position left; prefix closure guarantees it whenever c_k is hit
      df.withColumn(s"d$k", lag(col(s"c${k - 1}"), 1).over(byDoc))
    }
    // alpha^b by literal multiplication — identical IEEE folding on both
    // engines (pow() is not ULP-pinned across engines; products of the
    // literal 0.4 are)
    def alphaPow(b: Int): Column =
      (1 to b).foldLeft(lit(1.0)) { (c, _) => c * lit(0.4) }
    val uni = (coalesce(col("c1"), lit(0L)) + 1).cast("double") /
      (col("n_total") + col("n_vocab"))
    // start level k0 = min(pos+1, order); CASE descends to the first hit
    val k0 = least(col("pos") + 1, lit(order))
    val lvl = (order to 2 by -1).foldRight(lit(1): Column) { (k, els) =>
      when(k0 >= k && col(s"c$k").isNotNull, lit(k)).otherwise(els)
    }
    val ratio = (order to 2 by -1).foldRight(uni) { (k, els) =>
      when(k0 >= k && col(s"c$k").isNotNull,
        col(s"c$k").cast("double") / col(s"d$k")).otherwise(els)
    }
    val backoff = (0 to order).foldRight(lit(0): Column) { (b, els) =>
      // b backoff steps taken iff lvl == k0 - b; enumerated so the alpha
      // product is a literal chain per branch
      when(k0 - lvl === b, lit(b)).otherwise(els)
    }
    val micro = (0 until order).foldRight(lit(0L): Column) { (b, els) =>
      when(k0 - lvl === b,
        round(log(alphaPow(b) * ratio) * 1e6).cast("long")).otherwise(els)
    }
    withScalars(withDenoms, totals)
      .withColumn("_lvl", lvl).withColumn("_b", backoff)
      .withColumn("_lpm", micro)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("c1").isNull, 1L).otherwise(0L)).as("n_oov"),
        sum(when(col("_b") === 0, 1L).otherwise(0L)).as("n_full"),
        sum(col("_b").cast("long")).as("n_backoff_steps"),
        sum(col("_lpm")).as("lm_micro_total"))
      .withColumnRenamed("doc_id", idCol)
  }

  /** [[lmBuckets]] with the order-n Stupid Backoff scorer — CCNet's
    * head/middle/tail split over the score that actually measures fluency
    * (repeat-heavy word salad scores well under a unigram model; an
    * order-n model buckets it by its n-gram novelty). */
  def lmNgramBuckets(model: DataFrame, docs: DataFrame,
                     idCol: String = "doc_id", textCol: String = "text",
                     order: Int = 3, subBucketBits: Int = 7): DataFrame =
    bucketizeNll(
      lmNgramScoreAgainst(model, docs, idCol, textCol, order)
        .withColumn("nll_micro", expr(s"(-lm_micro_total) div n_tokens"))
        .select(col(idCol), col("n_tokens"), col("n_oov"), col("nll_micro")),
      subBucketBits)

  // ---------------------------------------------------------------------
  // Supervised reference-domain classification — mergeable multinomial
  // Naive Bayes (the fastText-classifier slot of the CCNet pipeline,
  // Wenzek et al., LREC 2020 §4.4: perplexity filtering is PAIRED with a
  // supervised domain/quality classifier; NB over tokens is the linear
  // bag-of-words member of that family that trains as a pure aggregate).
  // Training is per-class (term, cnt) counts — pointwise-SUM mergeable
  // across ingestion shards exactly like [[lmModel]], so the classifier is
  // maintained batch-by-batch, never retrained. Scoring reuses the
  // [[lmScoreAgainst]] join shape and its integer micro-nat quantization.
  // ---------------------------------------------------------------------

  /** Multinomial NB token-count model: (label, term, cnt) over the labeled
    * training docs. Merge shards with [[mergeNbModels]] (pointwise sum —
    * union of shard models ≡ model of the union). One combinable aggregate
    * scan; NULL labels are skipped (unlabeled rows train nothing). */
  def nbModel(docs: DataFrame, labelCol: String = "label",
              textCol: String = "text"): DataFrame =
    Dedup.spread(docs).filter(col(labelCol).isNotNull)
      .select(col(labelCol).as("label"),
        explode(wsTokens(lower(trim(col(textCol))))).as("term"))
      .filter(col("term") =!= "") // split("") yields [""] — not a token
      .groupBy(col("label"), col("term")).agg(count(lit(1)).as("cnt"))

  /** Class priors: (label, n_docs) doc counts — the other half of the NB
    * state, same pointwise-SUM merge contract ([[mergeNbPriors]]). */
  def nbPriors(docs: DataFrame, labelCol: String = "label"): DataFrame =
    docs.filter(col(labelCol).isNotNull)
      .groupBy(col(labelCol).as("label")).agg(count(lit(1)).as("n_docs"))

  /** Pointwise-sum merge of [[nbModel]] shards. */
  def mergeNbModels(ms: Seq[DataFrame]): DataFrame = {
    require(ms.nonEmpty, "nothing to merge")
    ms.map(_.select(col("label"), col("term"), col("cnt").cast("long")))
      .reduce(_ unionByName _)
      .groupBy(col("label"), col("term")).agg(sum(col("cnt")).as("cnt"))
  }

  /** Pointwise-sum merge of [[nbPriors]] shards. */
  def mergeNbPriors(ps: Seq[DataFrame]): DataFrame = {
    require(ps.nonEmpty, "nothing to merge")
    ps.map(_.select(col("label"), col("n_docs").cast("long")))
      .reduce(_ unionByName _)
      .groupBy(col("label")).agg(sum(col("n_docs")).as("n_docs"))
  }

  /** Classify `docs` under a trained ([[nbModel]], [[nbPriors]]) pair:
    * argmax over classes of
    * `ln P(c) + Σ_t tf_t · ln((cnt_{c,t} + 1) / (N_c + V))` — add-one
    * smoothing with the GLOBAL model vocabulary V, so an out-of-vocabulary
    * term takes the same floor in every class (the [[lmScoreAgainst]]
    * cnt=0 rule; OOV-only docs fall back to the prior argmax). Returns
    * (idCol, label, nb_micro) — the winning class and its exact integer
    * micro-nat total; docs with no tokens keep a row (prior-only score).
    *
    * Cross-engine discipline (why this hash-gates): per-(doc, term, class)
    * contributions quantize to integer micro-nats BEFORE the sum, priors
    * quantize the same way, and the argmax compares exact integers with a
    * label-order tiebreak (max (nb_micro, label) struct ≡ SQL
    * `ORDER BY nb_micro DESC, label DESC LIMIT 1` per doc) — no double
    * accumulates anywhere, so shuffle order and engine can't flip a
    * prediction.
    *
    * Scale shape: the per-doc tf frame is crossed with the CLASS table
    * (bounded dimension — #classes rows, broadcast) and left-joined
    * against the model on (label, term) — model is
    * reference-vocabulary × classes-sized (shuffle join; AQE broadcasts it
    * when small); the per-(doc, class) reduction and the per-doc argmax
    * are combinable aggregates. Cost is #doc-terms × #classes rows in
    * flight — the deployed CCNet shape scores a handful of classes, so the
    * multiplier is single-digit. */
  def nbClassify(model: DataFrame, priors: DataFrame, docs: DataFrame,
                 idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val m = model.select(col("label"), col("term"), col("cnt").cast("long").as("cnt"))
    val pri = priors.select(col("label"), col("n_docs").cast("long").as("n_docs"))
    // class table: prior micro-nats + per-class token totals (tiny: one
    // row per class) and the two corpus scalars (total docs, global vocab)
    val classTotals = m.groupBy(col("label")).agg(sum(col("cnt")).as("n_class"))
    val cls = withScalars(
        pri.join(classTotals, Seq("label"), "left_outer")
          .withColumn("n_class", coalesce(col("n_class"), lit(0L))),
        pri.agg(sum(col("n_docs")).as("_n_docs_total"))
          .crossJoin(m.agg(countDistinct(col("term")).as("n_vocab"))))
      .withColumn("prior_micro",
        round(log(col("n_docs").cast("double") / col("_n_docs_total")) * 1e6)
          .cast("long"))
      .select(col("label"), col("n_class"), col("n_vocab"), col("prior_micro"))
    val tf = Dedup.spread(docs).select(col(idCol).as("doc_id"),
        explode(wsTokens(lower(trim(col(textCol))))).as("term"))
      .filter(col("term") =!= "") // split("") yields [""] — not a token
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val like = tf.crossJoin(broadcast(cls))
      .join(m, Seq("label", "term"), "left_outer")
      .withColumn("_cnt", coalesce(col("cnt"), lit(0L)))
      .withColumn("_lpm", round(col("tf") * log(
        (col("_cnt") + 1).cast("double") / (col("n_class") + col("n_vocab")))
        * 1e6).cast("long"))
      .groupBy(col("doc_id"), col("label"))
      .agg(sum(col("_lpm")).as("_like"))
    docs.select(col(idCol).as("doc_id")).distinct()
      .crossJoin(broadcast(cls.select(col("label"), col("prior_micro"))))
      .join(like, Seq("doc_id", "label"), "left_outer")
      .withColumn("_total", col("prior_micro") + coalesce(col("_like"), lit(0L)))
      .groupBy(col("doc_id"))
      .agg(max(struct(col("_total"), col("label"))).as("_m"))
      .select(col("doc_id").as(idCol), col("_m.label").as("label"),
        col("_m._total").as("nb_micro"))
  }

  /** Token co-occurrence pairs with pointwise mutual information — the
    * corpus-association statistic behind collocation mining, topic seeds,
    * and word-vector objectives: for token pair (t1, t2),
    * `pmi = ln(n_pair·N / (df1·df2))` over DOCUMENT-level co-occurrence
    * (each doc contributes its distinct-token set once). Returns
    * (t1, t2, n_pair, pmi_micro) for pairs in ≥ `minSupport` docs, t1 < t2,
    * pmi quantized to integer micro-nats (the [[lmScore]] cross-engine
    * discipline; the exact integer counts ride along).
    *
    * Scale: the pair expansion is per-doc quadratic in DISTINCT tokens, so
    * `maxVocabPerDoc` hard-caps it (sorted-prefix truncation — a
    * deterministic pure function of the doc, so reruns and engines agree);
    * beyond the cap a document's tail vocabulary is rare by Zipf and
    * contributes little mass to any frequent pair. Counts and document
    * frequencies are combinable aggregates; the df join keys on single
    * tokens (probe-side skew only — hot tokens are exactly the ones AQE
    * handles). */
  def cooccurrence(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text", minSupport: Int = 2,
                   maxVocabPerDoc: Int = 1000): DataFrame = {
    require(minSupport >= 1 && maxVocabPerDoc >= 2, "bad parameters")
    val toks = Dedup.spread(docs)
      .select(col(idCol).as("id"),
        explode(expr(
          s"slice(array_sort(array_distinct(split(lower(trim($textCol)), '\\\\s+'))), 1, $maxVocabPerDoc)"))
          .as("t"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totals = docs.agg(count(lit(1)).as("n_docs"))
    val dfreq = toks.groupBy(col("t")).agg(count(lit(1)).as("df"))
    val pairs = toks.toDF("id", "t1").join(toks.toDF("id", "t2"), "id")
      .filter(col("t1") < col("t2"))
      .groupBy(col("t1"), col("t2")).agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minSupport)
    withScalars(pairs
      .join(dfreq.toDF("t1", "df1"), "t1")
      .join(dfreq.toDF("t2", "df2"), "t2"), totals)
      .select(col("t1"), col("t2"), col("n_pair").cast("long").as("n_pair"),
        round(log((col("n_pair") * col("n_docs")).cast("double") /
          (col("df1") * col("df2")).cast("double")) * 1e6).cast("long")
          .as("pmi_micro"))
  }

  /** Per-document unigram (token) entropy — the "information density"
    * quality signal: H = Σ_t (tf/n)·ln(n/tf) over the document's own token
    * distribution. Near-zero entropy flags degenerate repetition (a page of
    * one token); the corpus-typical band separates prose from keyword-stuffed
    * or machine-generated noise. Complements [[lmScore]] (which scores
    * against the CORPUS distribution) with a purely document-local signal.
    *
    * Cross-engine discipline as in [[lmScore]]: per-term contributions
    * quantize to integer micro-nats BEFORE the sum (`round(tf·ln(n/tf)·1e6)`
    * as BIGINT — note the quantized quantity is n·H's term, so the total is
    * exact under long addition and hash-stable across engines/shuffle
    * orders). Returns (idCol, n_tokens, ent_micro_total); H itself is
    * ent_micro_total / 1e6 / n_tokens — presentation, not computed here.
    *
    * Scale: tokenize → (doc, term) count → per-doc total (combinable) →
    * hash-join back — two shuffles on doc_id/term keys, no windows. */
  def unigramEntropy(df: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    val tf = Dedup.spread(df).select(col(idCol).as("doc_id"),
        explode(wsTokens(lower(trim(col(textCol))))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val totals = tf.groupBy("doc_id").agg(sum(col("tf")).as("n"))
    tf.join(totals, "doc_id")
      .withColumn("_em", round(col("tf") * log(
        col("n").cast("double") / col("tf")) * 1e6).cast("long"))
      .groupBy(col("doc_id"))
      .agg(max(col("n")).cast("long").as("n_tokens"),
        sum(col("_em")).as("ent_micro_total"))
  }

  /** Sequence packing: assign documents to fixed-token-budget bins by
    * contiguous fill over a deterministic order (orderCol asc) — doc d goes
    * to bin `floor(tokens_before_d / budget)`, so bins are dense, the
    * assignment is a pure function of the corpus (reproducible across
    * engines and retries), and a bin overflows its budget by less than one
    * document (the standard best-effort packing trade-off; exact first-fit
    * is inherently sequential). Returns the input plus (n_tokens, pack_id).
    *
    * Scale: with `shardCol`, the running-sum window partitions by the
    * shard key — a hash shuffle plus partition-local sorts, each shard
    * packed independently and in parallel; pack identity is the composite
    * (shard, pack_id), with `pack_id` dense within its shard. WITHOUT it,
    * the same global assignment is computed as a distributed two-phase
    * prefix sum (never a global single-reducer window): bucket rows into
    * contiguous `orderCol` ranges, per-range running sums in parallel,
    * then one window over the RANGE-COUNT-sized per-range totals (tens to
    * thousands of rows, independent of corpus size) yields the offsets
    * that are broadcast back. The range boundaries are sampled ONCE on the
    * driver and embedded as literals, so the offsets branch and the
    * local-prefix branch agree on bucket assignment by construction —
    * never by relying on the optimizer deduplicating a sampled range
    * exchange (spark_partition_id after repartitionByRange would be
    * re-sampled per consumer if ReuseExchange ever failed to fire, and the
    * pack ids would silently diverge). Identical output to a global
    * running-sum window whenever `orderCol` is unique (ties may land
    * either way under both formulations — keep the order key unique, as
    * any reproducible packing requires). */
  def packBins(df: DataFrame, budget: Int, textCol: String = "text",
               orderCol: String = "doc_id",
               shardCol: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budget > 0, "budget must be positive")
    shardCol match {
      case Some(s) =>
        val w = Window.partitionBy(col(s)).orderBy(col(orderCol))
          .rowsBetween(Window.unboundedPreceding, -1)
        df.withColumn("n_tokens", tokenCount(col(textCol)))
          .withColumn("pack_id",
            floor(coalesce(sum(col("n_tokens")).over(w), lit(0L)) / budget)
              .cast("long"))
      case None =>
        // _pid is a pure function of (orderCol, driver-literal boundaries):
        // both consumers below compute it from the SAME literal expression,
        // so bucket assignment can never diverge between them — no
        // reliance on ReuseExchange deduplicating a sampled exchange.
        // Integral order keys take the codegen'd binary search (O(log
        // parts) per row over one shared constant array — flat planning
        // cost at cluster-typical 2000+ partitions); other orderable types
        // fall back to the equivalent comparison ladder.
        val bounds = rangeBounds(df, orderCol,
          df.sparkSession.sessionState.conf.numShufflePartitions)
        val integral = df.schema(orderCol).dataType match {
          case org.apache.spark.sql.types.LongType |
               org.apache.spark.sql.types.IntegerType |
               org.apache.spark.sql.types.ShortType |
               org.apache.spark.sql.types.ByteType => true
          case _ => false
        }
        val pid =
          if (bounds.isEmpty) lit(0)
          else if (integral)
            // coalesce, not nullSafe pass-through: a NULL order key must
            // land in bucket 0 (the comparison ladder's behavior — every
            // when(NULL > b) falls to otherwise(0)), NOT become a NULL pid
            // that the offsets equi-join would silently drop
            coalesce(
              graft.functions.SearchBucket.searchBucket(col(orderCol).cast("long"),
                bounds.map(_.asInstanceOf[Number].longValue)),
              lit(0))
          else bounds.foldLeft(lit(0)) { (acc, b) =>
            acc + when(col(orderCol) > lit(b), 1).otherwise(0)
          }
        val keyed = df.withColumn("n_tokens", tokenCount(col(textCol)))
          .withColumn("_pid", pid)
        val wLocal = Window.partitionBy(col("_pid")).orderBy(col(orderCol))
          .rowsBetween(Window.unboundedPreceding, -1)
        val wOffsets = Window.orderBy(col("_pid"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val offsets = keyed.groupBy(col("_pid"))
          .agg(sum(col("n_tokens")).as("_ptotal"))
          .withColumn("_offset",
            coalesce(sum(col("_ptotal")).over(wOffsets), lit(0L)))
          .select(col("_pid"), col("_offset"))
        keyed
          .withColumn("_local",
            coalesce(sum(col("n_tokens")).over(wLocal), lit(0L)))
          .join(broadcast(offsets), Seq("_pid"))
          .withColumn("pack_id",
            floor((col("_offset") + col("_local")) / budget).cast("long"))
          .drop("_pid", "_local", "_offset")
    }
  }

  /** Sampled range boundaries for `orderCol`, computed once on the driver
    * (one count + one ~parts×128-row sorted sample, both bounded): at most
    * `parts - 1` strictly-increasing values splitting the column into
    * contiguous buckets. The caller embeds these as literals, making bucket
    * assignment a deterministic row-wise expression — the distributed
    * prefix sum in [[packBins]] needs both its branches to agree on the
    * bucketing, and literals agree by construction. Empty when the input is
    * small enough for one bucket. */
  private[graft] def rangeBounds(df: DataFrame, orderCol: String,
                                    parts: Int): Seq[Any] = {
    if (parts <= 1) return Nil
    // both driver jobs (count + sample) run over the single-column
    // projection, so Catalyst prunes the scan to orderCol — the upstream
    // pipeline's other columns are never re-computed for the bound sample
    val keyOnly = df.select(col(orderCol)).na.drop()
    val n = keyOnly.count()
    if (n <= 1) return Nil
    val sampleSize = math.min(parts.toLong * 128L, 1L << 20)
    val fraction = math.min(1.0, sampleSize.toDouble * 1.2 / n)
    val sorted = keyOnly
      .sample(withReplacement = false, fraction, seed = 0x9e3779b9L)
      .orderBy(col(orderCol))
      .collect().map(_.get(0))
    if (sorted.length <= 1) return Nil
    val step = sorted.length.toDouble / parts
    (1 until parts)
      .map(i => sorted(math.min(sorted.length - 1, (i * step).toInt)))
      .distinct
  }

  /** 64-bit content fingerprint of normalized text (case-folded, whitespace
    * collapsed) — exact-dup detection key. */
  def fingerprint(text: Column): Column =
    xxhash64(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Winnowing-style robust fingerprints: the distinct minima of xxhash64 over
    * sliding k-gram windows — a small set per document, stable under local
    * edits. Returns array<bigint> of at most `numFingerprints`. */
  def robustFingerprints(text: Column, k: Int = 8, numFingerprints: Int = 16): Column = {
    val norm = regexp_replace(lower(trim(text)), "\\s+", " ")
    val n = length(norm)
    val grams = transform(sequence(lit(1), greatest(n - (k - 1), lit(1))),
      i => xxhash64(norm.substr(i, lit(k))))
    slice(array_sort(array_distinct(grams)), 1, numFingerprints)
  }

  /** Same minima-of-k-gram-hashes construction with the cross-engine Poly64
    * family and a true Rabin rolling update in one codegen'd pass (O(len)
    * instead of a per-window rehash) — the oracle-gated variant. */
  def robustFingerprintsPoly(text: Column, k: Int = 8, numFingerprints: Int = 16): Column =
    graft.functions.Poly64.rollingFps(
      regexp_replace(lower(trim(text)), "\\s+", " "), k, numFingerprints)

  /**
   * Canonical URL form for web-corpus dedup (the CommonCrawl-pipeline
   * normalization): lowercase scheme and host, strip a default port
   * (:80/http, :443/https) and a leading `www.`, drop the fragment, drop
   * tracking parameters (`utm_*`, `gclid`, `fbclid`, `msclkid`, `ref`),
   * sort the surviving query parameters (binary order), and normalize an
   * empty path to `/`. Path case is PRESERVED (paths are case-sensitive).
   * Inputs without a `scheme://` prefix yield NULL — a canonical key must
   * never half-normalize. Entirely rowwise (regexp + array HOFs, codegen'd):
   * composes into the corpus scan with no shuffle; the canonical string is
   * then an exact-dedup / groupBy key.
   */
  /** Mojibake heuristic: count of the classic UTF-8-decoded-as-Latin-1
    * artifacts ('Ã'/'Â' lead bytes, 'â€' punctuation wrecks, the literal
    * replacement-char sequence) — a corpus-quality signal that catches
    * double-encoding damage normalization cannot repair. Alternatives
    * start with distinct characters, so the count is regex-engine-
    * portable (no ambiguous alternation). Rowwise, codegen'd. */
  def mojibakeSignals(text: Column): Column =
    regexp_count(text, lit("Ã|Â|â€|ï¿½")).cast("long")

  def canonicalizeUrl(url: Column, stripWww: Boolean = true): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostport = lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val noPort = when(scheme === "http", regexp_replace(hostport, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostport, ":443$", ""))
      .otherwise(hostport)
    val host = if (stripWww) regexp_replace(noPort, "^www\\.", "") else noPort
    val rawPath = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val path = when(rawPath === "", lit("/")).otherwise(rawPath)
    val params = filter(split(regexp_extract(url, "\\?([^#]*)", 1), "&"),
      p => length(p) > 0 && !p.rlike("^(utm_[^=]*|gclid|fbclid|msclkid|ref)(=|$)"))
    val q = array_join(array_sort(params), "&")
    when(scheme === "" || host === "", lit(null).cast("string"))
      .otherwise(concat(scheme, lit("://"), host, path,
        when(length(q) > 0, concat(lit("?"), q)).otherwise(lit(""))))
  }

  /**
   * BPE vocabulary induction (Sennrich et al. 2016): learn `iters` merge
   * rules over the corpus. Two regimes, one exact greedy semantics
   * (argmax by count DESC then lexicographic on lhs, rhs):
   *
   *   - HOT phase (top pair occurs in ≥ `recountFraction` of documents —
   *     the first handful of merges, where a delta would touch most rows
   *     anyway): one distributed pair-count per merge (partial-aggregated
   *     groupBy, word-boundary pairs excluded) + the rowwise codegen'd
   *     merge pass. Cheapest possible when the merge rewrites the corpus
   *     wholesale.
   *   - INCREMENTAL phase (everything after — permanent, because BPE's
   *     max pair count is NON-INCREASING: a pair born from merging (l,r)
   *     occurs at most count(l,r) times): the pair table is materialized
   *     ONCE at the regime switch and then maintained by deltas. The rows
   *     a merge actually changes (rowwise filter over the cached state)
   *     emit their old adjacent pairs at weight −1 and their merged
   *     sequence's pairs at +1 in a single exploded pass; the persisted
   *     pair table absorbs the aggregate via a full-outer join
   *     (vocabulary²-bounded, zero-count rows dropped). Per-merge shuffle
   *     is proportional to the merged pair's OCCURRENCES, not the corpus —
   *     the regime the 32k tail merges of a production vocabulary live
   *     in, where recount-per-merge would pay a full corpus-pair shuffle
   *     32k times.
   *
   * The row-level diff makes the maintained counts EXACTLY the recounted
   * counts (overlapping occurrences, greedy left-to-right merge order and
   * the word-boundary exclusion all included by construction), so the
   * learned table is bit-identical regardless of where the switch lands —
   * `recountFraction` is a pure performance knob (0 ⇒ always recount,
   * ≥ 1 ⇒ incremental from merge 1). Returns the merge table
   * (it, lhs, rhs, merged, cnt) — the artifact a tokenizer consumes.
   *
   * Scale shape: loop-carried state and pair table are persisted and
   * re-wrapped as stats-free leaves per round (StatsBarrier — flat
   * planning cost to 32k merges); nothing corpus-sized ever reaches the
   * driver. (At 100 TB one ALSO learns the vocabulary on a bounded sample
   * and reserves the full corpus for the single [[bpeEncode]] pass — this
   * loop keeps that choice a sampling decision, not a correctness one.)
   */
  def bpeLearn(docs: DataFrame, iters: Int, textCol: String = "text",
               recountFraction: Double = 0.25): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val spark = docs.sparkSession
    val norm = regexp_replace(lower(trim(col(textCol))), "\\s+", " ")
    def pairsOf(tk: Column): Column =
      when(size(tk) >= 2, transform(sequence(lit(0), size(tk) - 2),
        i => struct(element_at(tk, i + 1).as("l"), element_at(tk, i + 2).as("r"))))
    def pairCounts(st: DataFrame, tkCol: String, w: Long): DataFrame = st
      .select(explode(pairsOf(col(tkCol))).as("p"))
      .select(col("p.l").as("l"), col("p.r").as("r"))
      .filter(!col("l").contains("¶") && !col("r").contains("¶"))
      .groupBy(col("l"), col("r")).agg((count(lit(1)) * w).as("cnt"))
    // Weighted adjacent pairs of one symbol column — the single-pass delta
    // building block (old sequence at −1, merged at +1, one explode).
    def wpairs(tk: Column, w: Long): Column =
      when(size(tk) >= 2, transform(sequence(lit(0), size(tk) - 2),
        i => struct(element_at(tk, i + 1).as("l"),
          element_at(tk, i + 2).as("r"), lit(w).as("w"))))
        .otherwise(array().cast("array<struct<l:string,r:string,w:bigint>>"))
    // Loop-carried frames are persisted+materialized each round, then
    // re-wrapped as stats-free leaves (StatsBarrier.freshLeaf): without
    // the leaf re-wrap the full_outer-join chain compounds the analyzed
    // plan (and its size estimate) per merge — at merge ~30 the planner
    // dies generating a multi-GB plan string. With it, per-merge planning
    // cost is flat to 32k merges. unpersist() frees the PREVIOUS round's
    // cache once the next is materialized (the leaf wraps the cached
    // scan, so the handle and the leaf share storage).
    import org.apache.spark.sql.graft.StatsBarrier
    var stateHandle = docs.filter(col(textCol).isNotNull)
      .select(graft.functions.BpeExpression.charSymbols(norm).as("tk"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nDocs = stateHandle.count()
    var state = StatsBarrier.freshLeaf(stateHandle)
    val hotCut = recountFraction * nDocs
    var countsHandle: DataFrame = null // null ⇔ still in the HOT phase
    var counts: DataFrame = null
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var it = 1
    var done = false
    while (it <= iters && !done) {
      val top = (if (counts != null) counts else pairCounts(state, "tk", 1L))
        .orderBy(desc("cnt"), asc("l"), asc("r")).limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (l, r, cnt) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((it, l, r, l + r, cnt))
        if (counts == null && cnt < hotCut) {
          // regime switch: materialize the pair table once (the ONE
          // corpus-wide pair shuffle of the incremental phase); this
          // merge and all later ones update it by delta. Permanent: the
          // max pair count never rises again.
          countsHandle = pairCounts(state, "tk", 1L)
            .persist(StorageLevel.MEMORY_AND_DISK)
          countsHandle.count()
          counts = StatsBarrier.freshLeaf(countsHandle)
        }
        if (counts != null) {
          // single-pass delta over only the rows the merge changes
          val delta = state
            .withColumn("mg",
              graft.functions.BpeExpression.mergePair(col("tk"), l, r))
            .filter(size(col("mg")) < size(col("tk")))
            .select(explode(concat(wpairs(col("tk"), -1L),
              wpairs(col("mg"), 1L))).as("e"))
            .select(col("e.l").as("l"), col("e.r").as("r"), col("e.w").as("w"))
            .filter(!col("l").contains("¶") && !col("r").contains("¶"))
            .groupBy(col("l"), col("r")).agg(sum(col("w")).as("dw"))
          val nextCounts = counts.join(delta, Seq("l", "r"), "full_outer")
            .select(col("l"), col("r"),
              (coalesce(col("cnt"), lit(0L)) + coalesce(col("dw"), lit(0L))).as("cnt"))
            .filter(col("cnt") > 0)
            .persist(StorageLevel.MEMORY_AND_DISK)
          nextCounts.count() // materialize before releasing the parent
          countsHandle.unpersist()
          countsHandle = nextCounts
          counts = StatsBarrier.freshLeaf(nextCounts)
        }
        val next = state
          .select(graft.functions.BpeExpression.mergePair(col("tk"), l, r).as("tk"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        next.count() // materialize before releasing the parent
        stateHandle.unpersist()
        stateHandle = next
        state = StatsBarrier.freshLeaf(next)
        it += 1
      }
    }
    stateHandle.unpersist()
    if (countsHandle != null) countsHandle.unpersist()
    import spark.implicits._
    merges.toSeq.toDF("it", "lhs", "rhs", "merged", "cnt")
  }

  /** Apply a learned BPE merge table (in order) to the corpus: the encode
    * side of `bpeLearn`. Entirely rowwise — `iters` chained codegen'd merge
    * passes compose into the single corpus scan; at 100 TB this is the
    * tokenizer pass of the pipeline, shuffle-free. Appends `symbols`
    * (array<string>). */
  def bpeEncode(docs: DataFrame, merges: Seq[(String, String)],
                textCol: String = "text"): DataFrame = {
    val norm = regexp_replace(lower(trim(col(textCol))), "\\s+", " ")
    val init = graft.functions.BpeExpression.charSymbols(norm)
    val encoded = merges.foldLeft(init) { case (st, (l, r)) =>
      graft.functions.BpeExpression.mergePair(st, l, r)
    }
    docs.filter(col(textCol).isNotNull).withColumn("symbols", encoded)
  }

  /** Naive registered domain: the last two host labels (`a.b.c.com` →
    * `c.com`). An approximation — a real pipeline substitutes the public
    * suffix list here; the shape (rowwise split + slice) is identical. */
  def registeredDomain(host: Column): Column = {
    val parts = split(host, "\\.")
    when(host.isNull, lit(null).cast("string"))
      .when(size(parts) >= 2,
        concat_ws(".", element_at(parts, -2), element_at(parts, -1)))
      .otherwise(host)
  }

  /**
   * Gopher-style repetition quality signals (Rae et al. 2021, §A1.1: the
   * "repetition" filters of the MassiveText pipeline): per document,
   *
   *   - `top2` / `top2_ppm`: the most frequent word 2-gram (ties broken by
   *     lexicographic order — deterministic) and its share of all 2-gram
   *     occurrences, in integer parts-per-million;
   *   - `dup3_ppm`: the fraction of 3-gram OCCURRENCES belonging to 3-grams
   *     that occur more than once, in ppm.
   *
   * Boilerplate/template spam scores high on both; natural text stays low.
   * All ratios are integer `x * 1_000_000 DIV total` — exact and engine-
   * portable (never a float division). Docs with fewer than n tokens carry
   * NULL for that signal (every input doc keeps its row).
   *
   * Scale shape: gram expansion is declarative (`transform` over a bounded
   * per-row sequence — no shuffle), counts partial-aggregate on
   * (doc_id, gram), and the per-doc argmax/sums window on doc_id — sort
   * groups bounded by a single document's distinct grams. The `size >= n`
   * guard is load-bearing: `sequence(0, size-n)` with size < n would emit a
   * DESCENDING range, not an empty one.
   */
  def topGramSignals(docs: DataFrame, textCol: String = "text",
                        idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = docs.select(col(idCol), wsTokens(lower(trim(col(textCol)))).as("toks"))

    def gramCounts(n: Int) = base
      .select(col(idCol), explode(when(size(col("toks")) >= n,
        transform(sequence(lit(0), size(col("toks")) - n),
          i => concat_ws(" ", slice(col("toks"), i + 1, lit(n)))))).as("g"))
      .groupBy(col(idCol), col("g")).agg(count(lit(1)).as("c"))

    val byDoc = Window.partitionBy(idCol)
    val top2 = gramCounts(2)
      .withColumn("tot", sum(col("c")).over(byDoc))
      .withColumn("rn", row_number().over(byDoc.orderBy(desc("c"), asc("g"))))
      .filter(col("rn") === 1)
      .select(col(idCol), col("g").as("top2"),
        expr("CAST(c * 1000000 DIV tot AS BIGINT)").as("top2_ppm"))

    val dup3 = gramCounts(3)
      .groupBy(col(idCol)).agg(
        sum(when(col("c") >= 2, col("c")).otherwise(0L)).as("dup"),
        sum(col("c")).as("tot"))
      .select(col(idCol),
        expr("CAST(dup * 1000000 DIV tot AS BIGINT)").as("dup3_ppm"))

    docs.select(col(idCol))
      .join(top2, Seq(idCol), "left")
      .join(dup3, Seq(idCol), "left")
  }

  /** Corpus-level top-`k` word n-grams by total occurrences (ties → gram
    * ascending) — the boilerplate/meme leaderboard over the whole corpus.
    * Occurrence counts are a combinable hash-groupBy (map-side partials
    * absorb each document's repeats before the shuffle); the final top-k is
    * `orderBy.limit(k)`, which Spark plans as TakeOrderedAndProject —
    * per-partition bounded heaps merged on the driver, NEVER a global sort
    * of the vocabulary. */
  def globalTopGrams(docs: DataFrame, n: Int = 3, k: Int = 20,
                     textCol: String = "text"): DataFrame = {
    val toks = wsTokens(lower(trim(col(textCol))))
    Dedup.spread(docs)
      .select(explode(when(size(toks) >= n,
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n))))).otherwise(
        array().cast("array<string>"))).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("gram").asc)
      .limit(k)
  }

  /** Gopher-style document-quality rule filters (Rae et al. 2021, §A1.1):
    * per-doc rule metrics and 0/1 flags — word-count bounds, mean-word-length
    * bounds, symbol-to-word ratio (# and ellipses), alphabetic-word fraction,
    * required-stopword hits — plus the conjunctive `keep`. Entirely rowwise
    * (codegen'd string/array expressions) — a 100 TB corpus scan with NO
    * shuffle; flags are ints and ratios are rounded to 6 dp so the frame is
    * reproducible across engines. */
  def gopherRules(df: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    val t = trim(col(textCol))
    val toks = wsTokens(lower(t))
    val n = tokenCount(col(textCol)).cast("double")
    val chars = length(t).cast("double")
    val required = typedLit(Seq("the", "be", "to", "of", "and",
      "that", "have", "with"))
    val hashCount = chars - length(regexp_replace(t, "#", ""))
    val dotEll = (chars - length(regexp_replace(t, "\\.\\.\\.", ""))) / 3
    val uniEll = chars - length(regexp_replace(t, "…", ""))
    val flag = (c: Column) => when(c, lit(1)).otherwise(lit(0)).cast("int")
    df.select(
      col(idCol),
      n.cast("long").as("n_words"),
      round(when(n > 0, (chars - (n - 1)) / n).otherwise(lit(0.0)), 6)
        .as("mean_word_len"),
      round(when(n > 0, size(filter(toks, w => w.rlike("[a-z]"))) / n)
        .otherwise(lit(0.0)), 6).as("frac_alpha"),
      round(when(n > 0, (hashCount + dotEll + uniEll) / n)
        .otherwise(lit(0.0)), 6).as("symbol_ratio"),
      when(n > 0, size(array_intersect(array_distinct(toks), required)))
        .otherwise(lit(0)).cast("long").as("stop_hits"))
      .withColumn("ok_words", flag(col("n_words").between(50, 100000)))
      .withColumn("ok_mwl", flag(col("mean_word_len").between(3.0, 10.0)))
      .withColumn("ok_symbol", flag(col("symbol_ratio") < 0.1))
      .withColumn("ok_alpha", flag(col("frac_alpha") > 0.8))
      .withColumn("ok_stop", flag(col("stop_hits") >= 2))
      .withColumn("keep", flag(
        col("ok_words") + col("ok_mwl") + col("ok_symbol") +
          col("ok_alpha") + col("ok_stop") === 5))
  }

  /** BM25 retrieval ranking: the top-`k` documents per probe term, scored
    * with Robertson/Spärck-Jones BM25 (`idf · tf·(k1+1) / (tf + k1·(1−b +
    * b·dl/avgdl))`, `idf = ln(1 + (N−df+0.5)/(df+0.5))`). Scores are rounded
    * to 6 dp BEFORE ranking (ties → doc_id ascending) so the ordering is
    * reproducible across engines. Returns (term, doc_id, bm25, rank).
    *
    * Scale shape: the probe-term filter runs BEFORE the tf aggregation —
    * only matching (doc, term) tokens ever shuffle, so corpus volume is a
    * scan, not a shuffle; per-doc length rides through the tf groupBy as a
    * `max` (constant per doc — no join back to the corpus); df and the
    * (N, avgdl) scalars are broadcast; top-k per term is the bounded-heap
    * aggregate (O(k) state, map-side combinable), never a global sort. */
  def bm25TopDocs(df: DataFrame, terms: Seq[String], k: Int = 5,
                  k1: Double = 1.2, b: Double = 0.75,
                  idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // probe filter INSIDE the token array (codegen'd HOF), so the explode
    // only ever materializes matching tokens — a Filter above a Generate
    // doesn't push through it, and the unfiltered explode is corpus-token-
    // sized while the filtered one is |matches|-sized
    val toks = Dedup.spread(df).select(
      col(idCol).as("doc_id"),
      tokenCount(col(textCol)).cast("double").as("dl"),
      explode(filter(wsTokens(lower(trim(col(textCol)))),
        t => t.isInCollection(terms))).as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = df.agg(count(lit(1)).as("n"),
      avg(tokenCount(col(textCol))).as("avgdl"))
    val scored = withScalars(tf.join(broadcast(dfreq), "term"), stats)
      .withColumn("bm25", round(
        log(lit(1.0) +
          (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
        (col("tf") * lit(k1 + 1.0)) /
        (col("tf") + lit(k1) *
          (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))), 6))
    Curation.topKRanked(scored.select(col("term"), col("doc_id"),
        col("bm25")), "term", "bm25", "doc_id", k)
      .select(col("term"), col("doc_id"), col("bm25"), col("rank"))
  }
}

/** Minimal per-language stopword profiles (public common-word lists). */
object Stopwords {
  val en: Seq[String] = Seq("the", "a", "an", "of", "to", "in", "and", "is",
    "it", "that", "for", "on", "was", "with", "as", "at", "by", "this")
  val de: Seq[String] = Seq("der", "die", "das", "und", "ist", "ich", "nicht",
    "ein", "eine", "mit", "auf", "für", "von", "zu", "den", "im")
  val fr: Seq[String] = Seq("le", "la", "les", "de", "des", "et", "est", "un",
    "une", "dans", "que", "pour", "pas", "sur", "avec", "au")
  val es: Seq[String] = Seq("el", "la", "los", "las", "de", "y", "es", "un",
    "una", "en", "que", "por", "con", "para", "no", "se")
  val it: Seq[String] = Seq("il", "lo", "la", "gli", "di", "e", "è", "un",
    "una", "in", "che", "per", "non", "con", "su", "del")
  val profiles: Map[String, Seq[String]] =
    Map("en" -> en, "de" -> de, "fr" -> fr, "es" -> es, "it" -> it)
}

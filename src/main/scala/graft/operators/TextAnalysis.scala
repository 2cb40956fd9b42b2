package graft.operators

import graft.Tables
import graft.functions.{text => T}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** C-block text analysis: language ID (C8), quality scoring (C9), token
  * counting (C10), fingerprinting (C11). All pure column expressions —
  * map-only narrow plans, fully codegen'd, zero shuffles (the ORDER BY in
  * the query entries exists only for deterministic oracle comparison).
  */
object TextAnalysis {

  /** C8 `q27_langid` — stopword-overlap language ID: per-language hit
    * counts + argmax with fixed preference order (deterministic ties).
    * The five scores unpack from ONE packed single-pass fold
    * ([[T.langScoresPackedToks]]) materialized as an attribute, so the
    * token array is built and traversed once per row — not once per
    * language; documents long enough to overflow a 12-bit packed field
    * (≥4096 tokens) take the exact five-pass fallback instead
    * ([[T.langScoresGated]]). */
  def langId(spark: SparkSession, dir: String): DataFrame =
    langIdDocs(Tables(spark, dir).documents)

  /** DataFrame-level language ID over any (doc_id, text) frame. */
  def langIdDocs(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), T.tokens(col("text")).as("_toks"))
      .withColumn("_packed", T.langScoresPackedToks(col("_toks")))
      .select(col("doc_id") +: T.langScoresGated(col("_toks"), col("_packed")).map {
        case (l, score) => score.as(s"s_$l")
      }: _*)
      .withColumn("pred_lang", langPredExpr)
      .orderBy(col("doc_id"))

  /** The q27 argmax-with-fixed-preference fold over materialized
    * `s_<lang>` score columns — ONE definition for [[langIdDocs]] and
    * the q122 battery so the tie-break order can never drift. */
  private def langPredExpr: Column = {
    val langs = T.stopwords.map(_._1)
    val best = greatest(langs.map(l => col(s"s_$l")): _*)
    langs.foldRight(lit("unknown"): Column) { (l, acc) =>
      when(col(s"s_$l") === best, lit(l)).otherwise(acc)
    }
  }

  /** C9 `q28_quality_score` — length/punct/stopword-ratio quality score
    * (the standard pretraining-corpus quality heuristics). */
  def qualityScore(spark: SparkSession, dir: String): DataFrame =
    Perf.sortedOnce(qualityScoreDocs(Tables(spark, dir).documents), col("doc_id"))

  /** DataFrame-level quality scoring over any (doc_id, text) frame;
    * unsorted so composing operators (q53's percentile filter) don't
    * inherit a wasted sort. */
  def qualityScoreDocs(documents: DataFrame): DataFrame =
    documents.select(col("doc_id") +:
      qualityExprs(T.tokens(col("text"))).map { case (n, c) => c.as(n) }: _*)

  /** The q28 quality formulas as named columns over a token-array
    * expression — ONE definition, consumed by [[qualityScoreDocs]] and
    * the q122 battery so the two can never drift. The composite is
    * computed from UNROUNDED ratios; +1e-9 nudges grid-aligned values
    * (small rationals can land exactly on the .00005 boundary) off
    * the rounding tie. */
  private def qualityExprs(toks: Column): Seq[(String, Column)] = {
    val nChars = length(col("text")).cast("long")
    val nToks = size(toks).cast("long")
    val punct = regexp_count(col("text"), lit("[^A-Za-z0-9\\s]")).cast("long")
    val stops = T.stopwordHits(toks, T.stopwords.head._2) // en list
    val punctRatio = punct.cast("double") / greatest(nChars, lit(1L))
    val stopRatio = stops.cast("double") / greatest(nToks, lit(1L))
    Seq(
      "n_chars" -> nChars,
      "n_tokens" -> nToks,
      "punct_ratio" -> round(punctRatio, 4),
      "stop_ratio" -> round(stopRatio, 4),
      "quality_score" -> round(least(lit(1.0),
        lit(0.5) * stopRatio
          + lit(0.3) * least(lit(1.0), nToks.cast("double") / 20.0)
          + lit(0.2) * (lit(1.0) - punctRatio)) + lit(1e-9), 4))
  }

  /** `q53_quality_filter` — the FILTERING step the quality score exists
    * for: keep each language's top `keep` quantile by quality (the
    * percentile-threshold gate of a pretraining cleanup pass, applied
    * per slice so one verbose language can't crowd out another).
    * `percent_rank` is exact integer math ((rank−1)/(n−1), identical in
    * both engines) over a unique ordering (rounded score desc, doc_id),
    * so the kept set is deterministic and engine-independent.
    *
    * Scale shape: the score pass is map-only; the rank is one shuffle
    * on `lang`. For strata too large for a single partition's window,
    * swap in an approx-quantile threshold (computed once, broadcast) —
    * the contract stays the same. */
  def qualityFilter(spark: SparkSession, dir: String, keep: Double = 0.5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables(spark, dir).documents
    val scored = qualityScoreDocs(docs).select(col("doc_id"), col("quality_score"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("quality_score").desc, col("doc_id"))
    scored.join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .withColumn("pr", percent_rank().over(w))
      .filter(col("pr") <= keep)
      .select(col("doc_id"), col("lang"), col("quality_score"),
        round(col("pr"), 4).as("q_rank"))
      .transform(d => Perf.sortedOnce(d, col("doc_id")))
  }

  /** BPE-ish token regex: letter runs, digit runs, single punctuation —
    * the classic pre-tokenizer split (public GPT-2-style pattern, ASCII
    * subset so Java and RE2 regex agree). */
  val bpeTokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  /** C10 `q29_token_counts` — whitespace + BPE-ish token counts and
    * chars-per-token (the length stats every corpus pipeline tracks). */
  def tokenCounts(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val ws = size(split(trim(col("text")), "\\s+")).cast("long")
    t.documents
      .select(col("doc_id") +: (("ws_tokens", ws) +: tokenCountExprs).map {
        case (n, c) => c.as(n)
      }: _*)
      .transform(d => Perf.sortedOnce(d, col("doc_id")))
  }

  /** The q29 BPE-ish formulas — ONE definition for [[tokenCounts]] and
    * the q122 battery (the [[qualityExprs]] convention). */
  private def tokenCountExprs: Seq[(String, Column)] = {
    val bpe = regexp_count(col("text"), lit(bpeTokenPattern)).cast("long")
    Seq(
      "bpe_tokens" -> bpe,
      "chars_per_token" ->
        round(length(col("text")).cast("double") / greatest(bpe, lit(1L)), 4))
  }

  /** Extension `q40_word_stats` — word-level repetition quality signals,
    * the Gopher/C4-style filters a pretraining cleanup pass gates on
    * (published rules: mean word length bounds, duplicate word/n-gram
    * fractions): per doc, mean token length, duplicate-word ratio
    * (1 − distinct/total), and duplicate 2-/3-gram ratios. All pure
    * column expressions over ONE materialized token array (the q27
    * lesson: attribute first, derive after — no re-splitting per
    * metric); map-only, zero shuffles. */
  def wordStats(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    // gram windows hash to int64 (xxhash64 over the window's tokens)
    // instead of concatenating strings: the distinct pass then dedups
    // 8-byte longs, and no gram text is ever materialized — same
    // counts as the oracle's string grams (collision odds ~1e-19/pair)
    def grams(toks: Column, n: Int): Column =
      when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - (n - 1)), i =>
          xxhash64((0 until n).map(j => element_at(toks, i + j)): _*)))
        .otherwise(array().cast("array<bigint>"))
    def dupRatio(arr: Column): Column =
      when(size(arr) === 0, lit(0.0)).otherwise(
        lit(1.0) - size(array_distinct(arr)).cast("double") / size(arr))
    // gram arrays materialize as attributes BEFORE the ratio math —
    // dupRatio references each array twice (size + distinct), and an
    // inlined constructor would be evaluated per reference
    t.documents
      .select(col("doc_id"), T.tokens(col("text")).as("_t"))
      .select(col("doc_id"), col("_t"),
        grams(col("_t"), 2).as("_g2"), grams(col("_t"), 3).as("_g3"))
      .select(
        col("doc_id"),
        size(col("_t")).cast("long").as("n_tokens"),
        round(aggregate(transform(col("_t"), x => length(x).cast("long")),
            lit(0L), (acc, v) => acc + v).cast("double") /
          greatest(size(col("_t")), lit(1)) + lit(1e-9), 4).as("mean_word_len"),
        round(dupRatio(col("_t")) + lit(1e-9), 4).as("dup_word_ratio"),
        round(dupRatio(col("_g2")) + lit(1e-9), 4).as("dup_2gram_ratio"),
        round(dupRatio(col("_g3")) + lit(1e-9), 4).as("dup_3gram_ratio"))
      .transform(d => Perf.sortedOnce(d, col("doc_id")))
  }

  /** Extension `q32_doc_stats` — per-language corpus length statistics:
    * doc counts, distinct sources, mean/median/p90 length.
    *
    * `exact = true` (the oracle-checked default) uses `percentile`,
    * which collects each group's values into one aggregation buffer —
    * fine at per-group granularity here, hostile at 100 TB where one
    * language can hold billions of rows. `exact = false` swaps in
    * `percentile_approx` (bounded GK-sketch memory per group, fully
    * partial-aggregatable, `accuracy` trades memory for error) so the
    * 100 TB call site is a flag, not a code edit — spec-tested against
    * exact within tolerance in TextAnalysisSpec. */
  def docStats(spark: SparkSession, dir: String,
               exact: Boolean = true, accuracy: Int = 10000): DataFrame = {
    val t = Tables(spark, dir)
    def pct(q: Double): Column =
      if (exact) percentile(col("n_chars"), lit(q))
      else percentile_approx(col("n_chars"), lit(q), lit(accuracy)).cast("double")
    t.documents
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"),
        round(avg(col("n_chars")) + lit(1e-9), 4).as("avg_chars"),
        round(pct(0.5) + lit(1e-9), 4).as("median_chars"),
        round(pct(0.9) + lit(1e-9), 4).as("p90_chars"))
      .transform(d => Perf.sortedOnce(d, col("lang")))
  }

  /** `q46_unigram_logprob` — unigram language-model quality scoring:
    * per-document mean log-probability under the CORPUS'S OWN unigram
    * distribution (the closed-form core of CCNet/Gopher-style
    * perplexity filtering — a document of common words scores high,
    * boilerplate of rare junk tokens scores low; rank or threshold on
    * `avg_logprob` / `ppl`).
    *
    * Distributed shape: explode tokens → one groupBy(token) count
    * (the "LM training" pass — partial-aggregated, one shuffle) → join
    * the token stream back on token (one shuffle of the token stream)
    * → per-doc aggregate. The explode is DERIVED TWICE rather than
    * checkpointed: it is map-only off the scan, and re-running a
    * projection is far cheaper at 100 TB than materializing the
    * token-stream blowup. The corpus total rides a broadcast one-row
    * frame (counts are exact integers < 2⁵³, so the double sum is
    * order-independent and both engines agree exactly).
    *
    * At 100 TB the vocabulary count table is the thing to manage: fold
    * the tail into an OOV bucket (count floor) or top-K the vocab —
    * both are one extra filter/agg on `vocab` here; the exact form is
    * what the oracle checks. */
  def unigramLogProb(spark: SparkSession, dir: String): DataFrame =
    unigramScores(Tables(spark, dir).documents)
      .withColumn("ppl", round(exp(-col("avg_logprob")), 4))
      .orderBy(col("doc_id"))

  /** The q46 scoring core — (doc_id, n_tokens, avg_logprob) under the
    * corpus's own unigram distribution. ONE definition, consumed by
    * both [[unigramLogProb]] and [[perplexityBuckets]], so the score
    * q99 buckets can never drift from the score q46 hash-checks. */
  private def unigramScores(docs: DataFrame): DataFrame = {
    def exploded = docs
      .select(col("doc_id"), explode(T.tokens(col("text"))).as("tok"))
    val vocab = exploded.groupBy(col("tok")).agg(count(lit(1)).cast("double").as("c"))
    val total = broadcast(vocab.agg(sum(col("c")).as("t")))
    exploded
      .join(vocab, Seq("tok"))
      .crossJoin(total)
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        round(avg(log(col("c") / col("t"))), 4).as("avg_logprob"))
  }

  /** `q99_perplexity_buckets` — CCNet-style per-language perplexity
    * TERCILES (Wenzek et al. 2019, "CCNet: Extracting high quality
    * monolingual datasets from web crawl data", arXiv:1911.00359 —
    * public): each document lands in head/middle/tail of its
    * language's quality distribution under the corpus's own unigram LM
    * ([[unigramLogProb]]'s score), the split downstream mixing
    * policies key on (train mostly-head, audit the tail).
    *
    * Scale shape — NO corpus-sized window: a naive per-language
    * ntile(3) serializes each language's whole corpus through one
    * task, which is the 100 TB failure mode. Scores are already 4-dp
    * ROUNDED (the q46 grid), so they are their own histogram bins:
    * bucket boundaries compute on the tiny (lang, score) bin table
    * (≤ |langs|·|grid| rows — the only window in the plan), and docs
    * take their bin's bucket via a broadcast equi-join. Tie semantics,
    * stated honestly: a score bin never splits across buckets (the
    * first-doc rule, `1 + floor(3·cum_before/n)`), which is exactly
    * what a quantized-score pipeline gives you and is engine-exact —
    * integer counts both sides, and the only division's boundary
    * cases are exact integer quotients (< 2⁵³, representable). */
  def perplexityBuckets(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    val scored = unigramScores(docs)
      .select(col("doc_id"), col("avg_logprob"))
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
    val bins = scored.groupBy(col("lang"), col("avg_logprob"))
      .agg(count(lit(1)).as("_bn"))
    val wl = Window.partitionBy(col("lang")).orderBy(col("avg_logprob").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val labeled = bins
      .withColumn("_cb", coalesce(sum(col("_bn")).over(wl), lit(0L)))
      .withColumn("_nl", sum(col("_bn")).over(Window.partitionBy(col("lang"))))
      .withColumn("bucket", element_at(
        array(lit("head"), lit("middle"), lit("tail")),
        (floor(col("_cb") * 3 / col("_nl")) + 1).cast("int")))
      .select(col("lang"), col("avg_logprob"), col("bucket"))
    scored.join(broadcast(labeled), Seq("lang", "avg_logprob"))
      .select(col("doc_id"), col("lang"), col("avg_logprob"), col("bucket"))
      .transform(d => Perf.sortedOnce(d, col("doc_id")))
  }

  /** `q93_bigram_nll` — bigram language-model quality scoring: each
    * document's average negative log-likelihood under the corpus's own
    * Laplace-smoothed bigram model, P(b|a) = (c(a,b)+1)/(c(a·)+V) —
    * the sequence-aware upgrade of [[unigramLogProb]] (word salad with
    * a plausible unigram mix now scores badly; this is the
    * perplexity-filter core of the CCNet-family pipelines, with the
    * closed-form smoother instead of a shipped KenLM binary). Rank or
    * threshold on `nll`; perplexity = exp(nll) is the caller's
    * monotonic transform (left un-applied so the oracle surface stays
    * inside the proven ln-parity convention).
    *
    * Distributed shape mirrors q46: the bigram stream derives from one
    * lead() window per doc (map-side after the per-doc sort), counts
    * are TWO grouped aggregations (bigram, then context — the second
    * aggregates the already-small count table, not the corpus), and
    * the vocabulary size rides a broadcast one-row frame. Per-bigram
    * log-probs quantize to the 1e-8 grid and SUM AS EXACT LONGS (the
    * q33/q63 convention — a double sum is merge-order-dependent).
    * Documents with fewer than two tokens have no bigrams and are
    * absent by construction. */
  def bigramNll(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables(spark, dir).documents
    def tok = docs.select(col("doc_id"),
      posexplode(T.tokens(col("text"))).as(Seq("pos", "tok")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    def bigrams = tok
      .withColumn("nxt", lead(col("tok"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .select(col("doc_id"), col("tok"), col("nxt"))
    val bc = bigrams.groupBy(col("tok"), col("nxt")).agg(count(lit(1)).as("cab"))
    val ctx = bc.groupBy(col("tok")).agg(sum(col("cab")).as("ca"))
    val v = broadcast(tok.agg(countDistinct(col("tok")).as("v")))
    bigrams
      .join(bc, Seq("tok", "nxt"))
      .join(ctx, Seq("tok"))
      .crossJoin(v)
      .withColumn("_lps", round(log(
        (col("cab") + 1).cast("double") / (col("ca") + col("v")).cast("double"))
        * 100000000.0).cast("long"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("_lps")).as("_s"))
      .withColumn("nll", round(
        -(col("_s").cast("double") / 100000000.0) / col("n_bigrams") + lit(1e-9), 4))
      .select(col("doc_id"), col("n_bigrams"), col("nll"))
      .transform(d => Perf.sortedOnce(d, col("doc_id")))
  }

  /** C17d `q171_kneser_ney` — interpolated KNESER–NEY bigram scoring
    * (Kneser & Ney 1995; the interpolated form of Chen & Goodman 1999
    * with a fixed absolute discount): the smoothing behind the KenLM
    * models the CCNet-family filters actually ship, where C17b's
    * Laplace flattens burstiness. The continuation distribution scores
    * how many CONTEXTS a word completes, not how often it occurs —
    * "francisco" is frequent but follows only "san", so KN correctly
    * scores it poor glue:
    *
    *   P(b|a)   = (max(c(a,b) − d, 0) + d · N1+(a·) · Pcont(b)) / c(a·)
    *   Pcont(b) = N1+(·b) / N1+(··)
    *
    * Every model quantity is an exact integer count off the ONE bigram
    * count table (N1+(a·)/N1+(·b) are its group sizes, N1+(··) its row
    * count); scoring the corpus under its own model keeps c(a·) > 0
    * attested for every scored bigram. The per-bigram ln rides the
    * proven q93 ln-parity convention and per-doc sums the 1e-8
    * scaled-long grid; `d` is interpolated into the oracle from this
    * signature's constant (the q104 shared-constant convention). Scale
    * shape: the q93 plan exactly — one lead() window per doc, grouped
    * counts, broadcast scalar — plus one more small join (the
    * continuation counts, vocabulary-sized). */
  /** The registered KN discount — shared with q171's oracle CASE (the
    * q104 shared-constant convention). 0.75 is the usual fixed
    * absolute discount when count-of-count estimation is skipped. */
  val KnDiscount: Double = 0.75

  def knBigramNll(spark: SparkSession, dir: String,
                  discount: Double = KnDiscount): DataFrame =
    knBigramNllDocs(Tables(spark, dir).documents, discount)

  /** [[knBigramNll]] over an arbitrary (doc_id, text) frame. */
  def knBigramNllDocs(docs: DataFrame,
                      discount: Double = KnDiscount): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(discount > 0.0 && discount < 1.0,
      s"absolute discount must lie in (0, 1), got $discount")
    def tok = docs.select(col("doc_id"),
      posexplode(T.tokens(col("text"))).as(Seq("pos", "tok")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    def bigrams = tok
      .withColumn("nxt", lead(col("tok"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .select(col("doc_id"), col("tok"), col("nxt"))
    // the one count table: everything else is its marginals
    val bc = bigrams.groupBy(col("tok"), col("nxt"))
      .agg(count(lit(1)).as("cab")).localCheckpoint()
    val ctx = bc.groupBy(col("tok"))
      .agg(sum(col("cab")).as("ca"), count(lit(1)).as("n1a"))
    val cont = bc.groupBy(col("nxt")).agg(count(lit(1)).as("n1b"))
    val tot = broadcast(bc.agg(count(lit(1)).as("n1tot")))
    bigrams
      .join(bc, Seq("tok", "nxt"))
      .join(ctx, Seq("tok"))
      .join(cont, Seq("nxt"))
      .crossJoin(tot)
      .withColumn("_p",
        (greatest(col("cab") - lit(discount), lit(0.0)) +
          lit(discount) * col("n1a") *
            (col("n1b").cast("double") / col("n1tot"))) / col("ca"))
      .withColumn("_lps", round(log(col("_p")) * 100000000.0).cast("long"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("_lps")).as("_s"))
      .withColumn("kn_nll", round(
        -(col("_s").cast("double") / 100000000.0) / col("n_bigrams") + lit(1e-9), 4))
      .select(col("doc_id"), col("n_bigrams"), col("kn_nll"))
      .transform(d => Perf.sortedOnce(d, col("doc_id")))
  }

  /** C8b: char-trigram stream of normalized text — the shared
    * derivation of the Cavnar–Trenkle family (profiles and probes must
    * window identically, forever — the winnow/decontam rule). */
  private def charTrigrams(df: DataFrame, idCol: String,
                           textCol: String): DataFrame = {
    val t = regexp_replace(lower(trim(col(textCol))), "\\s+", " ")
    df.select(col(idCol).as("_id"), t.as("_t"))
      .filter(length(col("_t")) >= 3)
      .select(col("_id"), explode(transform(
        sequence(lit(1), length(col("_t")) - 2),
        i => col("_t").substr(i, lit(3)))).as("g"))
  }

  /** C8b: Cavnar–Trenkle N-GRAM PROFILES (Cavnar & Trenkle 1994,
    * "N-Gram-Based Text Categorization" — the rank-profile method
    * behind classic langid, and the shape char-ngram production
    * identifiers still use): per language, the top-`n` char trigrams
    * by count, RANKED — a tiny persistable artifact (|langs| · n
    * rows) trained distributed from labeled text in two grouped
    * aggregations. Ties rank deterministically (count DESC, gram ASC)
    * so the artifact is engine-reproducible. */
  def langProfiles(docs: DataFrame, langCol: String = "lang",
                   textCol: String = "text", n: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(n >= 1, s"profile size must be positive, got $n")
    val w = Window.partitionBy(col("_id")).orderBy(col("cnt").desc, col("g").asc)
    charTrigrams(docs, langCol, textCol)
      .groupBy(col("_id"), col("g")).agg(count(lit(1)).as("cnt"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= n)
      .select(col("_id").as("lang"), col("g"), col("rank"))
  }

  /** C8b day-2: identify NEW documents against FROZEN [[langProfiles]]
    * — the out-of-place measure: the doc's own top-`m` trigram ranks
    * compare against each language's profile ranks, a profile miss
    * paying the maximum displacement `n`; the language with the
    * smallest total displacement wins (ties to the lexicographically
    * smallest language — deterministic verdicts). The profile table
    * broadcasts (|langs| · n rows); per doc the work is its own m-row
    * profile × |langs| — the corpus never shuffles on gram keys. */
  def langIdAgainstProfiles(newDocs: DataFrame, profiles: DataFrame,
                            idCol: String = "doc_id",
                            textCol: String = "text",
                            m: Int = 20, n: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(m >= 1 && n >= m,
      s"need 1 <= m <= n (doc profile can't outrank the model's), got m=$m n=$n")
    val w = Window.partitionBy(col("_id")).orderBy(col("cnt").desc, col("g").asc)
    val docRanks = charTrigrams(newDocs, idCol, textCol)
      .groupBy(col("_id"), col("g")).agg(count(lit(1)).as("cnt"))
      .withColumn("r_doc", row_number().over(w).cast("long"))
      .filter(col("r_doc") <= m)
    val langs = profiles.select(col("lang")).distinct()
    docRanks
      .crossJoin(broadcast(langs))
      .join(broadcast(profiles), Seq("lang", "g"), "left")
      .withColumn("_d", coalesce(abs(col("r_doc") - col("rank")), lit(n.toLong)))
      .groupBy(col("_id"), col("lang")).agg(sum(col("_d")).as("_dist"))
      .groupBy(col("_id").as(idCol))
      .agg(min(struct(col("_dist"), col("lang"))).as("_b"))
      .select(col(idCol), col("_b.lang").as("pred_lang"),
        col("_b._dist").as("dist"))
  }

  /** The q173 DISCRIMINATION plant (round 16 — the r15 verdict's item
    * 7): the synthetic corpus's lang labels are uncorrelated with its
    * text (every lang draws one vocabulary), so an undressed q173
    * could only certify mechanics. Each language now dresses its text
    * with its own CAESAR ROTATION of the alphabet — distinct rotations
    * give (near-)disjoint trigram inventories, so the profiles carry
    * REAL per-language signal and the oracle certifies that they
    * DISCRIMINATE (planted docs classify to their plant), not just
    * that the arithmetic agrees. Shared constants: the oracle's CASE
    * chain interpolates the SAME rotations (the q104 convention). */
  val langPlantFrom: String = "abcdefghijklmnopqrstuvwxyz"
  val langPlantRot: Map[String, Int] =
    Map("en" -> 0, "de" -> 5, "es" -> 11, "fr" -> 17, "zh" -> 23)
  def langPlantTo(rot: Int): String =
    langPlantFrom.drop(rot) + langPlantFrom.take(rot)

  /** [[langPlantRot]] applied to a (lang, text) frame — lowercased
    * first so the rotation sees the alphabet it permutes; unknown
    * langs pass through. */
  private def langPlantDressed(docs: DataFrame): DataFrame =
    docs.withColumn("text",
      langPlantRot.toSeq.sortBy(_._1).foldLeft(lower(col("text"))) {
        case (acc, (l, r)) => when(col("lang") === l,
          translate(lower(col("text")), langPlantFrom, langPlantTo(r)))
          .otherwise(acc)
      })

  /** C8b `q173_langid_profiles` — profiles trained on the corpus slice
    * (doc_id % 5 ≠ 4) of the PLANT-DRESSED corpus ([[langPlantRot]]),
    * the batch identified against them, the true label carried. The
    * oracle replays the dressing, the counts, the rank ties, the
    * out-of-place sums and the argmin — and because the plant makes
    * the labels text-correlated, a profile that failed to discriminate
    * would flip pred_lang rows and fail the hash: accuracy itself is
    * inside the certified surface now (the spec additionally pins
    * zero cross-language confusion). */
  def langIdProfileDocs(spark: SparkSession, dir: String): DataFrame = {
    val docs = langPlantDressed(Tables(spark, dir).documents)
      .localCheckpoint() // forked: profiles + batch + label join
    val corpus = docs.filter(col("doc_id") % 5 =!= 4)
    val batch = docs.filter(col("doc_id") % 5 === 4)
    langIdAgainstProfiles(batch, langProfiles(corpus))
      .join(batch.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .select(col("doc_id"), col("lang"), col("pred_lang"), col("dist"))
      .transform(d => Perf.sortedOnce(d, col("doc_id")))
  }

  /** The persistable KN MODEL artifact: the one bigram count table —
    * every marginal the scorer needs (context totals, continuation
    * fan-ins, the row count, the vocabulary) derives from it, so
    * "fit once, score forever" ships a single tiny parquet table (the
    * dsirFit convention at the LM tier). */
  def knFit(docs: DataFrame, idCol: String = "doc_id",
            textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def tok = docs.select(col(idCol).as("doc_id"),
      posexplode(T.tokens(col(textCol))).as(Seq("pos", "tok")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    tok.withColumn("nxt", lead(col("tok"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .groupBy(col("tok").as("a"), col("nxt").as("b"))
      .agg(count(lit(1)).as("cab"))
  }

  /** C17d day-2: score NEW documents against a FROZEN [[knFit]] model —
    * the flow the CCNet-family filters actually run (the model trains
    * on a reference corpus once; incoming data scores against it), so
    * unlike the self-scored [[knBigramNll]] this must price UNSEEN
    * events: the continuation distribution is Laplace-smoothed over
    * the open vocabulary (Pcont(b) = (N1+(·b)+1)/(N1+(··)+V+1) — an
    * unseen continuation gets the +1 floor instead of ln 0), an unseen
    * bigram under a seen context takes only the backoff mass
    * (d·N1+(a·)·Pcont(b)/c(a·)), and an unseen CONTEXT backs off to
    * Pcont(b) entirely. All model quantities stay exact integer counts
    * off the one table; ln parity and grid sums as in q93/q171. The
    * model broadcasts (distinct-bigram-sized) and the corpus never
    * shuffles on model keys — the q137 map-side shape. */
  def knScoreAgainstModel(newDocs: DataFrame, model: DataFrame,
                          idCol: String = "doc_id",
                          textCol: String = "text",
                          discount: Double = KnDiscount): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(discount > 0.0 && discount < 1.0,
      s"absolute discount must lie in (0, 1), got $discount")
    val bc = model.select(col("a"), col("b"), col("cab")).localCheckpoint()
    val ctx = bc.groupBy(col("a"))
      .agg(sum(col("cab")).as("ca"), count(lit(1)).as("n1a"))
    val cont = bc.groupBy(col("b")).agg(count(lit(1)).as("n1b"))
    val scalars = broadcast(bc.agg(count(lit(1)).as("n1tot"))
      .crossJoin(bc.select(explode(array(col("a"), col("b"))).as("t"))
        .agg(countDistinct(col("t")).as("v"))))
    def tok = newDocs.select(col(idCol).as("doc_id"),
      posexplode(T.tokens(col(textCol))).as(Seq("pos", "tok")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val bigrams = tok.withColumn("nxt", lead(col("tok"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .select(col("doc_id"), col("tok").as("a"), col("nxt").as("b"))
    bigrams
      .join(broadcast(bc), Seq("a", "b"), "left")
      .join(broadcast(ctx), Seq("a"), "left")
      .join(broadcast(cont), Seq("b"), "left")
      .crossJoin(scalars)
      .withColumn("_pc",
        (coalesce(col("n1b"), lit(0L)) + lit(1L)).cast("double") /
          (col("n1tot") + col("v") + lit(1L)))
      .withColumn("_p", when(col("ca").isNotNull,
        (greatest(coalesce(col("cab"), lit(0L)) - lit(discount), lit(0.0)) +
          lit(discount) * col("n1a") * col("_pc")) / col("ca"))
        .otherwise(col("_pc")))
      .withColumn("_lps", round(log(col("_p")) * 100000000.0).cast("long"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("_lps")).as("_s"))
      .withColumn("kn_nll", round(
        -(col("_s").cast("double") / 100000000.0) / col("n_bigrams") + lit(1e-9), 4))
      .select(col("doc_id"), col("n_bigrams"), col("kn_nll"))
      .transform(d => Perf.sortedOnce(d, col("doc_id")))
  }

  /** C17d `q172_kn_score` — the day-2 KN flow over the 80/20 split:
    * [[knFit]] on the corpus slice (doc_id % 5 ≠ 4), the batch scored
    * against the frozen model. Batch docs routinely carry bigrams,
    * continuations and contexts the model never saw, so all three
    * scoring branches exercise on real data (the spec plants each
    * deterministically). */
  def knScoreDocs(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    knScoreAgainstModel(docs.filter(col("doc_id") % 5 === 4),
      knFit(docs.filter(col("doc_id") % 5 =!= 4)))
  }

  /** C17e `q176_kn_trigram` — interpolated Kneser–Ney at ORDER 3
    * (Chen & Goodman 1999's recursive form, one more continuation
    * level than q171): production KenLM-family filters ship order
    * 3–5, and the recursion is mechanical — the middle level replaces
    * raw counts with CONTINUATION counts off the SAME trigram table:
    *
    *   P(c|a,b) = (max(c(abc) − d, 0) + d · N1+(ab·) · P(c|b)) / c(ab·)
    *   P(c|b)   = (max(N1+(·bc) − d, 0) + d · N1+(b·) · Pcont(c)) / N1+(·b·)
    *   Pcont(c) = N1+(·c) / N1+(··)
    *
    * where every N1+ is a group size of the ONE trigram count table
    * (rows are distinct (a,b,c), so per-(b,c) row counts ARE the
    * distinct-predecessor counts) — the q171 exact-integer-model
    * property preserved at order 3. Self-scored, so every denominator
    * is attested. Grid sums and ln parity per the q93/q171 convention.
    *
    * Scale shape: TWO lead() columns over the one per-doc window, one
    * grouped count to the trigram table, and every marginal aggregates
    * that already-small table; the scoring joins broadcast at model
    * size, the corpus never shuffles on model keys. */
  def knTrigramNll(spark: SparkSession, dir: String,
                   discount: Double = KnDiscount): DataFrame =
    knTrigramNllDocs(Tables(spark, dir).documents, discount)

  /** [[knTrigramNll]] over an arbitrary (doc_id, text) frame. */
  def knTrigramNllDocs(docs: DataFrame,
                       discount: Double = KnDiscount): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(discount > 0.0 && discount < 1.0,
      s"absolute discount must lie in (0, 1), got $discount")
    def tok = docs.select(col("doc_id"),
      posexplode(T.tokens(col("text"))).as(Seq("pos", "tok")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    def tris = tok
      .withColumn("b", lead(col("tok"), 1).over(w))
      .withColumn("c", lead(col("tok"), 2).over(w))
      .filter(col("c").isNotNull)
      .select(col("doc_id"), col("tok").as("a"), col("b"), col("c"))
    // the one count table: every level's marginals derive from it
    val tc = tris.groupBy(col("a"), col("b"), col("c"))
      .agg(count(lit(1)).as("cabc")).localCheckpoint()
    val ctx2 = tc.groupBy(col("a"), col("b"))
      .agg(sum(col("cabc")).as("cab"), count(lit(1)).as("n1ab"))
    val mid = tc.groupBy(col("b"), col("c")).agg(count(lit(1)).as("mbc"))
    val ctx1 = mid.groupBy(col("b"))
      .agg(sum(col("mbc")).as("totb"), count(lit(1)).as("n1b"))
    val uni = mid.groupBy(col("c")).agg(count(lit(1)).as("n1pc"))
    val tot = broadcast(mid.agg(count(lit(1)).as("n1tot")))
    tris
      .join(tc, Seq("a", "b", "c"))
      .join(ctx2, Seq("a", "b"))
      .join(mid, Seq("b", "c"))
      .join(ctx1, Seq("b"))
      .join(uni, Seq("c"))
      .crossJoin(tot)
      .withColumn("_pmid",
        (greatest(col("mbc") - lit(discount), lit(0.0)) +
          lit(discount) * col("n1b") *
            (col("n1pc").cast("double") / col("n1tot"))) / col("totb"))
      .withColumn("_p",
        (greatest(col("cabc") - lit(discount), lit(0.0)) +
          lit(discount) * col("n1ab") * col("_pmid")) / col("cab"))
      .withColumn("_lps", round(log(col("_p")) * 100000000.0).cast("long"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_trigrams"), sum(col("_lps")).as("_s"))
      .withColumn("kn3_nll", round(
        -(col("_s").cast("double") / 100000000.0) / col("n_trigrams") + lit(1e-9), 4))
      .select(col("doc_id"), col("n_trigrams"), col("kn3_nll"))
      .transform(d => Perf.sortedOnce(d, col("doc_id")))
  }

  /** The persistable order-3 KN MODEL artifact — the one trigram count
    * table, [[knFit]]'s convention one order up: every level's
    * marginals (context totals, continuation type counts at both
    * levels, the vocabulary) derive from it. */
  def kn3Fit(docs: DataFrame, idCol: String = "doc_id",
             textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def tok = docs.select(col(idCol).as("doc_id"),
      posexplode(T.tokens(col(textCol))).as(Seq("pos", "tok")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    tok.withColumn("b", lead(col("tok"), 1).over(w))
      .withColumn("c", lead(col("tok"), 2).over(w))
      .filter(col("c").isNotNull)
      .groupBy(col("tok").as("a"), col("b"), col("c"))
      .agg(count(lit(1)).as("cabc"))
  }

  /** C17e day-2: score NEW documents against a FROZEN [[kn3Fit]] model
    * — the q172 flow at order 3, pricing unseen events on every rung
    * of the backoff ladder: an unseen trigram under a seen (a,b)
    * context takes only the trigram backoff mass; an unseen (a,b)
    * context falls to the continuation-bigram level, where an unseen
    * (b,c) likewise takes only ITS backoff mass; an unseen middle
    * token b falls all the way to the Laplace-floored continuation
    * unigram ((N1+(·c)+1)/(N1+(··)+V+1) — the q172 +1 floor, so no
    * scored trigram is ever ln 0). All model quantities stay exact
    * integer counts off the one table; ln parity and grid sums as in
    * q172. Model marginals broadcast; the batch never shuffles on
    * model keys. */
  def kn3ScoreAgainstModel(newDocs: DataFrame, model: DataFrame,
                           idCol: String = "doc_id",
                           textCol: String = "text",
                           discount: Double = KnDiscount): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(discount > 0.0 && discount < 1.0,
      s"absolute discount must lie in (0, 1), got $discount")
    val tc = model.select(col("a"), col("b"), col("c"), col("cabc"))
      .localCheckpoint()
    val ctx2 = tc.groupBy(col("a"), col("b"))
      .agg(sum(col("cabc")).as("cab"), count(lit(1)).as("n1ab"))
    val mid = tc.groupBy(col("b"), col("c")).agg(count(lit(1)).as("mbc"))
    val ctx1 = mid.groupBy(col("b"))
      .agg(sum(col("mbc")).as("totb"), count(lit(1)).as("n1b"))
    val uni = mid.groupBy(col("c")).agg(count(lit(1)).as("n1pc"))
    val scalars = broadcast(mid.agg(count(lit(1)).as("n1tot"))
      .crossJoin(tc.select(explode(array(col("a"), col("b"), col("c"))).as("t"))
        .agg(countDistinct(col("t")).as("v"))))
    def tok = newDocs.select(col(idCol).as("doc_id"),
      posexplode(T.tokens(col(textCol))).as(Seq("pos", "tok")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val tris = tok
      .withColumn("b", lead(col("tok"), 1).over(w))
      .withColumn("c", lead(col("tok"), 2).over(w))
      .filter(col("c").isNotNull)
      .select(col("doc_id"), col("tok").as("a"), col("b"), col("c"))
    tris
      .join(broadcast(tc), Seq("a", "b", "c"), "left")
      .join(broadcast(ctx2), Seq("a", "b"), "left")
      .join(broadcast(mid), Seq("b", "c"), "left")
      .join(broadcast(ctx1), Seq("b"), "left")
      .join(broadcast(uni), Seq("c"), "left")
      .crossJoin(scalars)
      .withColumn("_pc",
        (coalesce(col("n1pc"), lit(0L)) + lit(1L)).cast("double") /
          (col("n1tot") + col("v") + lit(1L)))
      .withColumn("_pmid", when(col("totb").isNotNull,
        (greatest(coalesce(col("mbc"), lit(0L)) - lit(discount), lit(0.0)) +
          lit(discount) * col("n1b") * col("_pc")) / col("totb"))
        .otherwise(col("_pc")))
      .withColumn("_p", when(col("cab").isNotNull,
        (greatest(coalesce(col("cabc"), lit(0L)) - lit(discount), lit(0.0)) +
          lit(discount) * col("n1ab") * col("_pmid")) / col("cab"))
        .otherwise(col("_pmid")))
      .withColumn("_lps", round(log(col("_p")) * 100000000.0).cast("long"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_trigrams"), sum(col("_lps")).as("_s"))
      .withColumn("kn3_nll", round(
        -(col("_s").cast("double") / 100000000.0) / col("n_trigrams") + lit(1e-9), 4))
      .select(col("doc_id"), col("n_trigrams"), col("kn3_nll"))
      .transform(d => Perf.sortedOnce(d, col("doc_id")))
  }

  /** C17e `q177_kn3_score` — the day-2 order-3 flow over the 80/20
    * split: [[kn3Fit]] on the corpus slice, the batch scored against
    * the frozen model. Word-salad batch docs routinely carry unseen
    * trigrams, contexts, continuation bigrams and unseen middles, so
    * every rung of the backoff ladder fires on real data (the spec
    * plants each deterministically). */
  def kn3ScoreDocs(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    kn3ScoreAgainstModel(docs.filter(col("doc_id") % 5 === 4),
      kn3Fit(docs.filter(col("doc_id") % 5 =!= 4)))
  }

  /** `q100_repetition_signals` — Gopher-family within-document
    * REPETITION filters (Rae et al. 2021, "Scaling Language Models:
    * Methods, Analysis & Insights from Training Gopher",
    * arXiv:2112.11446, Appendix A1.1 — public): the quality-filter
    * class that catches looping/templated text which per-token LM
    * scores miss (a doc repeating one plausible phrase scores fine
    * under C17 but is training poison). Three signals per document,
    * all integer-ratio arithmetic:
    *
    *  - `dup_token_frac` — fraction of tokens that repeat an earlier
    *    token, (n − distinct)/n;
    *  - `top2_char_frac` — characters covered by the single most
    *    frequent bigram (count·len / doc chars), Gopher's
    *    top-n-gram-char-fraction at n=2; ties break to the
    *    lexicographically smallest gram;
    *  - `dup2_mass_frac` — the duplicated-n-gram fraction in the
    *    frequency-mass formulation: Σ c·len over bigrams with c ≥ 2,
    *    over Σ c·len for all bigrams (the overlap-free restatement the
    *    public reimplementations use).
    *
    * `flagged` ORs the three thresholds over the ROUNDED values, so
    * the verdict is engine-reproducible. Scale shape: one
    * posexplode + lead per doc (the q93 bigram stream), counts keyed
    * by (doc, gram) — every window and aggregate partitions by
    * doc_id, nothing corpus-wide. */
  def repetitionSignals(spark: SparkSession, dir: String,
                        tokenRepMax: Double = 0.80,
                        topFracMax: Double = 0.20,
                        dupMassMax: Double = 0.60): DataFrame =
    repetitionSignalsDocs(Tables(spark, dir).documents,
      tokenRepMax, topFracMax, dupMassMax)

  /** [[repetitionSignals]] over an arbitrary (doc_id, text) frame. */
  def repetitionSignalsDocs(docs: DataFrame,
                            tokenRepMax: Double = 0.80,
                            topFracMax: Double = 0.20,
                            dupMassMax: Double = 0.60): DataFrame = {
    def tok = docs.select(col("doc_id"),
      length(trim(col("text"))).as("n_chars"),
      posexplode(T.tokens(col("text"))).as(Seq("pos", "tok")))
    val ts = tok.groupBy(col("doc_id"))
      .agg(max(col("n_chars")).as("n_chars"), count(lit(1)).as("n_tokens"),
        countDistinct(col("tok")).as("_nd"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    def bigrams = tok
      .withColumn("nxt", lead(col("tok"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .select(col("doc_id"), concat_ws(" ", col("tok"), col("nxt")).as("g"))
    val bc = bigrams.groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
    val wTop = Window.partitionBy(col("doc_id"))
      .orderBy(col("c").desc, col("g").asc)
    val top = bc.withColumn("_rn", row_number().over(wTop))
      .filter(col("_rn") === 1)
      .select(col("doc_id"), col("c").as("_topc"), col("g").as("top_bigram"))
    val mass = bc.groupBy(col("doc_id")).agg(
      sum(col("c") * length(col("g"))).as("_tot"),
      sum(when(col("c") >= 2, col("c") * length(col("g"))).otherwise(0L)).as("_dup"))
    ts.join(top, Seq("doc_id"), "left").join(mass, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        round((col("n_tokens") - col("_nd")).cast("double") / col("n_tokens"), 4)
          .as("dup_token_frac"),
        coalesce(col("top_bigram"), lit("")).as("top_bigram"),
        round(coalesce(col("_topc") * length(col("top_bigram")), lit(0L)).cast("double")
          / greatest(col("n_chars"), lit(1L)), 4).as("top2_char_frac"),
        round(coalesce(col("_dup"), lit(0L)).cast("double")
          / greatest(coalesce(col("_tot"), lit(0L)), lit(1L)), 4).as("dup2_mass_frac"))
      .withColumn("flagged",
        col("dup_token_frac") > tokenRepMax ||
        col("top2_char_frac") > topFracMax ||
        col("dup2_mass_frac") > dupMassMax)
      .transform(d => Perf.sortedOnce(d, col("doc_id")))
  }

  /** `q94_collocations` — PMI collocation extraction (Church & Hanks
    * 1990, "Word association norms, mutual information, and
    * lexicography" — public literature): the corpus's most-associated
    * adjacent term pairs, PMI = ln(c(a,b)·N / (c(a·)·c(·b))) over the
    * bigram event space (N = total bigrams, margins from the SAME
    * count table). The collocation audit is how a corpus review finds
    * boilerplate phrases, template artifacts and tokenizer-merge
    * candidates; the `minCount` floor is the standard guard against
    * PMI's low-frequency bias (a hapax pair maxes the score).
    *
    * Scale shape: everything after the one bigram-count aggregation
    * runs on the COUNT table (margins are two grouped sums of it, N
    * is a broadcast one-row frame), and the ranking is a distributed
    * TakeOrdered over the floored pairs. PMI's ln argument is a ratio
    * of exact integers — identical on any engine — so the rounded
    * score rides the proven ln-parity convention. */
  def collocations(spark: SparkSession, dir: String,
                   minCount: Long = 5L, k: Int = 50): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables(spark, dir).documents
    def tok = docs.select(col("doc_id"),
      posexplode(T.tokens(col("text"))).as(Seq("pos", "tok")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val bc = tok
      .withColumn("nxt", lead(col("tok"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .groupBy(col("tok").as("a"), col("nxt").as("b"))
      .agg(count(lit(1)).as("cab"))
    val left = bc.groupBy(col("a")).agg(sum(col("cab")).as("ca"))
    val right = bc.groupBy(col("b")).agg(sum(col("cab")).as("cb"))
    val n = broadcast(bc.agg(sum(col("cab")).as("n")))
    val scored = bc.filter(col("cab") >= minCount)
      .join(left, Seq("a")).join(right, Seq("b"))
      .crossJoin(n)
      .withColumn("pmi", round(log(
        col("cab").cast("double") * col("n").cast("double")
          / (col("ca").cast("double") * col("cb").cast("double"))) + lit(1e-9), 4))
    val wr = Window.orderBy(col("pmi").desc, col("a").asc, col("b").asc)
    scored.orderBy(col("pmi").desc, col("a").asc, col("b").asc).limit(k)
      .withColumn("rank", row_number().over(wr).cast("long"))
      .select(col("rank"), col("a"), col("b"), col("cab"), col("pmi"))
      .transform(d => Perf.sortedOnce(d, col("rank")))
  }

  /** `q52_tfidf_terms` — TF-IDF top terms per language: the
    * vocabulary-characterization pass a corpus audit runs per slice
    * (which terms distinguish each language/source bucket). tf counts
    * term occurrences within the slice; df counts documents containing
    * the term CORPUS-WIDE (a document has exactly one lang, so corpus
    * df = Σ over langs of per-(lang, term) distinct-doc counts — which
    * lets ONE grouped aggregation feed both numbers, with df recovered
    * by a whole-partition window over the already-tiny (lang, term)
    * frame instead of a second pass over the exploded corpus).
    *
    * Scale shape: one explode + one shuffle on (lang, term); the window
    * and ranking run on the aggregated vocabulary (|V|·|langs| rows),
    * never the corpus. Ranking is on the ROUNDED score (both engines
    * round the same doubles — the q46 ln-parity convention) with a term
    * tiebreak, so ordering is engine-independent. */
  def tfidfTopTerms(spark: SparkSession, dir: String, k: Int = 5): DataFrame =
    tfidfTopTermsDocs(Tables(spark, dir).documents, k)

  /** DataFrame-level TF-IDF top terms over any (doc_id, lang, text)
    * frame — `lang` is the slice key (any categorical column renamed to
    * `lang` works). */
  def tfidfTopTermsDocs(documents: DataFrame, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val exploded = documents
      .select(col("doc_id"), col("lang"), explode(T.tokens(col("text"))).as("term"))
    val nDocs = broadcast(documents.agg(count(lit(1)).as("n_docs")))
    val perLang = exploded.groupBy(col("lang"), col("term"))
      .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("dfl"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("score").desc, col("term").asc)
    perLang
      .withColumn("df", sum(col("dfl")).over(Window.partitionBy(col("term"))))
      .crossJoin(nDocs)
      // +1e-9 nudges grid-aligned values off the .00005 rounding tie
      // (the q28 epsilon convention); df == n_docs gives exactly 0
      .withColumn("score",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")) + lit(1e-9), 4))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("lang"), col("rank"), col("term"), col("tf"), col("df"), col("score"))
      .transform(d => Perf.sortedOnce(d, col("lang"), col("rank")))
  }

  /** C11 `q30_fingerprint` — normalized content fingerprint (md5 of the
    * whitespace-collapsed lowercase normal form). */
  def fingerprintDocs(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.documents
      .select(col("doc_id"), T.fingerprint(col("text")).as("fingerprint"),
        T.normalizeText(col("text")).substr(lit(1), lit(32)).as("norm_prefix"))
      .transform(d => Perf.sortedOnce(d, col("doc_id")))
  }

  // ---- Gopher document-level rule filters ----------------------------

  /** Gopher's stop-word presence list (Rae et al. 2021, arXiv:2112.11446
    * Appendix A1.1 — public): a page must contain at least `minStopHits`
    * DISTINCT members to pass. Shared constant — the oracle SQL
    * interpolates the SAME strings. */
  val gopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher-family DOCUMENT-level rule filters (Rae et al. 2021,
    * arXiv:2112.11446 Appendix A1.1 — public) — the page-structure
    * quality class that completes the trio: [[qualityScoreDocs]] scores
    * composition, [[repetitionSignalsDocs]] catches looping text, and
    * these catch pages that are structurally not prose (symbol spam,
    * bullet-list dumps, word fragments, no function words). Signals,
    * all exact-integer or exact-ratio arithmetic:
    *
    *  - `n_tokens` within [minTokens, maxTokens] (Gopher's word-count
    *    window);
    *  - `mean_word_len` within [minMeanLen, maxMeanLen] chars;
    *  - `symbol_ratio` — `#` and ellipsis occurrences per word,
    *    ≤ maxSymbolRatio;
    *  - `bullet_frac` / `ellipsis_frac` — fraction of non-blank lines
    *    starting with a bullet (`-` `*` `•`) / ending in an ellipsis,
    *    ≤ their maxima;
    *  - `alpha_frac` — fraction of words containing ≥1 alphabetic
    *    char, ≥ minAlphaFrac;
    *  - `stop_hits` — DISTINCT [[gopherStopwords]] present,
    *    ≥ minStopHits.
    *
    * `pass` ANDs the rules over the ROUNDED values (the q100
    * convention — the verdict is engine-reproducible). Scale shape:
    * like [[graft.operators.TextClean.lineFilter]] there is NO explode
    * — tokens and lines live inside higher-order `filter`/`aggregate`
    * chains, so the whole operator is one codegen'd map-only
    * projection (stateless, streams at scan speed). */
  def gopherFilters(docs: DataFrame,
                    minTokens: Long = 20, maxTokens: Long = 100000,
                    minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
                    maxSymbolRatio: Double = 0.10,
                    maxBulletFrac: Double = 0.50,
                    maxEllipsisFrac: Double = 0.30,
                    minAlphaFrac: Double = 0.80,
                    minStopHits: Long = 2): DataFrame = {
    require(minTokens >= 1 && maxTokens >= minTokens,
      s"need 1 <= minTokens <= maxTokens, got [$minTokens, $maxTokens]")
    require(minMeanLen > 0 && maxMeanLen >= minMeanLen,
      s"need 0 < minMeanLen <= maxMeanLen, got [$minMeanLen, $maxMeanLen]")
    val t = trim(col("text"))
    val toks = split(t, "\\s+")
    val n = size(toks).cast("long")
    val sumLen = aggregate(toks, lit(0L), (acc, x) => acc + length(x))
    val alphaWords = size(filter(toks, x => x.rlike("[A-Za-z]"))).cast("long")
    val symbols = (regexp_count(t, lit("#")) + regexp_count(t, lit("\\.\\.\\."))
      + regexp_count(t, lit("…"))).cast("long")
    val lines = filter(split(col("text"), "\n"), l => trim(l) =!= "")
    val nLines = greatest(size(lines).cast("long"), lit(1L))
    val bulletLines = size(filter(lines, l => trim(l).rlike("^[-*•]"))).cast("long")
    val ellipsisLines = size(filter(lines, l => trim(l).rlike("(\\.\\.\\.|…)$"))).cast("long")
    val stopHits = size(array_intersect(
      split(lower(t), "\\s+"),
      array(gopherStopwords.map(lit): _*))).cast("long")
    docs
      .withColumn("n_tokens", n)
      .withColumn("mean_word_len",
        round(sumLen.cast("double") / col("n_tokens"), 4))
      .withColumn("symbol_ratio", round(symbols.cast("double") / col("n_tokens"), 4))
      .withColumn("bullet_frac", round(bulletLines.cast("double") / nLines, 4))
      .withColumn("ellipsis_frac", round(ellipsisLines.cast("double") / nLines, 4))
      .withColumn("alpha_frac", round(alphaWords.cast("double") / col("n_tokens"), 4))
      .withColumn("stop_hits", stopHits)
      .withColumn("pass",
        col("n_tokens").between(minTokens, maxTokens) &&
        col("mean_word_len").between(minMeanLen, maxMeanLen) &&
        col("symbol_ratio") <= maxSymbolRatio &&
        col("bullet_frac") <= maxBulletFrac &&
        col("ellipsis_frac") <= maxEllipsisFrac &&
        col("alpha_frac") >= minAlphaFrac &&
        col("stop_hits") >= minStopHits)
  }

  /** `q103_gopher_filters` — [[gopherFilters]] over a planted page per
    * document: the doc's own text plus a bullet block whose size
    * depends on doc_id (even ids get three bullet lines — bullet_frac
    * 0.75 fails the 0.5 gate; odd ids get one — 0.5 passes at ≤) and,
    * for ids ≡ 0 mod 3, one ellipsis-terminated line — so every rule
    * fires on some real slice of the corpus and the oracle re-derives
    * verdicts that actually vary. */
  def gopherFiltersDocs(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    val planted = docs.select(
      col("doc_id"),
      concat_ws("\n",
        col("text"),
        lit("- first bullet item"),
        when(col("doc_id") % 2 === 0, lit("- second bullet item\n- third bullet item")),
        when(col("doc_id") % 3 === 0, lit("the story continues next week...")),
        // the corpus vocabulary carries at most ONE distinct stopword
        // ("the"), so without planting the stop rule fails EVERY doc
        // and `pass` is a latent all-false (caught by the round-13
        // registry-wide coverage sweep): plant seven stopwords for the
        // doc_id % 5 != 1 slice so the stop rule fires both ways and
        // clean latin docs genuinely pass
        when(col("doc_id") % 5 =!= 1,
          lit("to be continued with that and more of the usual"))
      ).as("text"))
    gopherFilters(planted)
      .select(col("doc_id"), col("n_tokens"), col("mean_word_len"),
        col("symbol_ratio"), col("bullet_frac"), col("ellipsis_frac"),
        col("alpha_frac"), col("stop_hits"), col("pass"))
      .transform(d => Perf.sortedOnce(d, col("doc_id")))
  }

  /** C46: the one-pass QUALITY-SIGNAL BATTERY — language ID (C8),
    * composition quality (C9), token counts (C10), and the Gopher
    * page-structure rules (C33) emitted together from ONE map-only
    * projection, the Dolma/RedPajama-V2 "quality signals" artifact
    * shape (every released-corpus pipeline ships exactly this wide
    * per-document frame, computed in one scan so the corpus is read
    * once, not once per signal).
    *
    * Composition is withColumn-chaining over shared ATTRIBUTES (the
    * token array and the packed language fold materialize once and
    * every signal derives from them — the q27 lesson); Catalyst
    * collapses the chain to a single projection, so the plan carries
    * ZERO exchanges (spec-asserted). Each signal family keeps its own
    * certified definition: the battery calls the same shared
    * functions/formulas the individual q27/q28/q29/q103 entries
    * hash-check. */
  def signalBattery(docs: DataFrame, minStopHits: Long = 2): DataFrame = {
    val withAttrs = docs
      .withColumn("_toks", T.tokens(col("text")))
      .withColumn("_packed", T.langScoresPackedToks(col("_toks")))
    val withScores = T.langScoresGated(col("_toks"), col("_packed"))
      .foldLeft(withAttrs) { case (df, (l, s)) => df.withColumn(s"s_$l", s) }
    // gopherFilters overwrites `n_tokens` with its own whitespace count
    // — value-equal to qualityExprs' (lower() does not change the token
    // count), and the battery spec asserts the equality so a tokenizer
    // change in either family trips the build, not the oracle
    val staged = (qualityExprs(col("_toks")) ++ tokenCountExprs)
      .foldLeft(withScores.withColumn("pred_lang", langPredExpr)) {
        case (df, (n, c)) => df.withColumn(n, c)
      }
    gopherFilters(staged, minStopHits = minStopHits)
      .select(col("doc_id"), col("pred_lang"),
        col("n_chars"), col("n_tokens"), col("bpe_tokens"), col("chars_per_token"),
        col("punct_ratio"), col("stop_ratio"), col("quality_score"),
        col("mean_word_len"), col("symbol_ratio"), col("bullet_frac"),
        col("ellipsis_frac"), col("alpha_frac"), col("stop_hits"),
        col("pass").as("gopher_pass"))
  }

  /** C46 `q122_signal_battery` — the battery over the documents corpus;
    * the oracle re-derives every signal family from raw rows in one
    * combined SQL (the same modular pieces the individual oracles
    * use), joined per document. */
  def signalBatteryDocs(spark: SparkSession, dir: String): DataFrame =
    // minStopHits = 1 (round 13): the raw corpus vocabulary carries at
    // most one distinct stopword per doc, so the production default of
    // 2 made gopher_pass a structurally-unsatisfiable all-false here
    // (the registry-wide coverage sweep's finding); at 1 the stop rule
    // splits the corpus (~3/4 carry "the") and the verdict fires both
    // ways — q103 exercises the default threshold under its planting
    signalBattery(Tables(spark, dir).documents, minStopHits = 1)
      .orderBy(col("doc_id"))

  /** C43: token-entropy diversity signal — Shannon entropy of the
    * within-document token distribution, H = ln(n) − (Σ c·ln c)/n.
    * The information-theoretic cousin of C9b's repetition ratios
    * (entropy-based junk detection is standard corpus-quality
    * practice: low H ⇒ looping/templated text, H near ln(n) ⇒ every
    * token distinct): `diversity` = H / ln(n) lands in [0, 1] and is
    * length-comparable, the thresholdable form.
    *
    * Exactness: Σ c·ln(c) accumulates 1e-8-quantized logs of exact
    * integer counts as LONGS (the q93 convention — the per-doc sum is
    * order-free), and the closing arithmetic is a fixed-order chain
    * of single IEEE ops on exact inputs, so both engines agree digit
    * for digit. Single-token documents define H = 0 and diversity = 1
    * (the ln(1) = 0 division guard, stated rather than NaN'd).
    *
    * Scale shape: one explode → (doc, tok) count → per-doc aggregate;
    * everything partitions by doc_id, nothing corpus-wide. */
  def tokenEntropy(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    def ln8(c: Column) = round(log(c) * 100000000.0).cast("long")
    docs.select(col(idCol), explode(T.tokens(col(textCol))).as("tok"))
      .groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        sum(col("c") * ln8(col("c").cast("double"))).as("_s"))
      .withColumn("entropy", round(
        log(col("n_tokens").cast("double"))
          - col("_s").cast("double") / 100000000.0 / col("n_tokens").cast("double"),
        4))
      .withColumn("diversity",
        when(col("n_tokens") === 1, lit(1.0)).otherwise(round(
          (log(col("n_tokens").cast("double"))
            - col("_s").cast("double") / 100000000.0 / col("n_tokens").cast("double"))
            / log(col("n_tokens").cast("double")), 4)))
      .select(col(idCol), col("n_tokens"), col("n_distinct"),
        col("entropy"), col("diversity"))
  }

  /** C43 `q119_token_entropy` — the signal over the documents corpus,
    * re-derived from raw rows in the oracle (counts, scaled-long log
    * sum, the closing chain, and the single-token guard). */
  def tokenEntropyDocs(spark: SparkSession, dir: String): DataFrame =
    tokenEntropy(Tables(spark, dir).documents).orderBy(col("doc_id"))

  /** C39: per-source corpus DATASHEET — the composition/provenance
    * report card every released corpus ships (Gebru et al. 2018,
    * "Datasheets for Datasets", arXiv:1803.09010; the Pile/Dolma
    * per-source composition tables): one row per source with size,
    * length profile, exact-duplication rate, and language spread —
    * the numbers a curator reads before touching mixing weights.
    *
    * Scale shape: one map-only projection (words + text fingerprint),
    * ONE window exchange on the fingerprint for the global dup
    * verdict (the q105 single-exchange election, here at the text
    * tier), then one partial-aggregating groupBy to |sources| rows.
    * Nothing corpus-wide beyond those two exchanges; the output is
    * dashboard-sized.
    *
    * `mean_words` is the only float (4-dp rounded IEEE division of
    * exact longs — the q46 convention); every other column is an
    * exact integer. */
  def corpusDatasheet(docs: DataFrame): DataFrame = {
    // empty pages weigh zero words (the q106 guard — split of "" is
    // [""], size 1, and the three word-count operators must agree)
    val words = when(trim(col("text")) === "", lit(0L))
      .otherwise(size(split(trim(col("text")), "\\s+")).cast("long"))
    val perDoc = docs.select(col("doc_id"), col("source"), col("lang"),
      words.as("n_words"), md5(col("text")).as("_fp"))
    val keep = min(col("doc_id")).over(Window.partitionBy(col("_fp")))
    perDoc.withColumn("_dup", col("doc_id") =!= keep)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("total_words"),
        sum(when(col("n_words") < 40, 1L).otherwise(0L)).as("n_short"),
        sum(when(col("_dup"), 1L).otherwise(0L)).as("n_exact_dups"),
        countDistinct(col("lang")).as("n_langs"))
      .withColumn("mean_words",
        round(col("total_words").cast("double") / col("n_docs"), 4))
      .select(col("source"), col("n_docs"), col("total_words"),
        col("mean_words"), col("n_short"), col("n_exact_dups"), col("n_langs"))
  }

  /** C39 `q114_corpus_datasheet` — the datasheet over the documents
    * corpus with the q107 donor planting folded in (odd held-out ids
    * take a corpus donor's text), so the exact-duplication column
    * counts REAL planted dups instead of reading all-zero on the
    * word-salad corpus. The oracle re-derives the planting, the
    * text-keyed dup election, and every aggregate. */
  def corpusDatasheetDocs(spark: SparkSession, dir: String): DataFrame =
    corpusDatasheet(Dedup.donorPlantedText(Tables(spark, dir).documents)
      .select(col("doc_id"), col("source"), col("lang"), col("text")))
      .orderBy(col("source"))

  /** C39b: VOCABULARY-GROWTH curve (Heaps' law samples) — the corpus
    * diagnostic next to the datasheet: distinct types, running tokens,
    * hapax count and type/token ratio at fixed document-prefix
    * milestones. A healthy natural corpus grows types ~ tokens^β
    * (β ≈ 0.5–0.7) with a hapax share near half the vocabulary;
    * template/synthetic/boilerplate-heavy corpora saturate early
    * (types flat while tokens grow) and the curve is how a data
    * engineer sees that BEFORE training on it. No curve FIT is
    * emitted by design: slope fitting sums logs whose float totals are
    * summation-order-dependent across engines — the milestone counts
    * are exact integers (plus one 4-dp ratio of two longs), so the
    * whole output hash-checks.
    *
    * Scale shape: one token explode, a broadcast theta-join against
    * the tiny milestone list (each token row lands in the ≤
    * |milestones| prefixes containing it — a fixed ≤8× map-side
    * expansion, NOT a window), then one (milestone, token) → milestone
    * aggregation chain; aggregation state is bounded by types ×
    * milestones, sublinear in corpus bytes by exactly the Heaps
    * exponent being measured. Milestones beyond the corpus drop (both
    * engines filter against the doc count, so rows never depend on
    * out-of-range duplicates). */
  def vocabularyGrowth(docs: DataFrame, idCol: String = "doc_id",
                       textCol: String = "text",
                       milestones: Seq[Long] =
                         Seq(50L, 100L, 200L, 500L, 1000L, 2000L, 5000L)): DataFrame = {
    require(milestones.nonEmpty && milestones.forall(_ > 0),
      s"milestones must be positive, got $milestones")
    val spark = docs.sparkSession
    import spark.implicits._
    // "first N documents" needs a rank in idCol order. Dense 0-based
    // ids (the corpus-build convention here) ARE that rank, checked
    // with one tiny aggregation; any other id space falls back to an
    // explicit row_number — a single-partition sort, so at real scale
    // pre-rank upstream (or keep ids dense) rather than relying on it.
    // min=0 ∧ max=n−1 alone would accept a duplicate-plus-gap corpus
    // (ids 0,2,2,3) and silently corrupt prefix membership — the
    // distinct count closes that hole for one more cheap aggregate
    val idStats = docs.agg(min(col(idCol).cast("long")).as("mn"),
      max(col(idCol).cast("long")).as("mx"), count(lit(1)).as("n"),
      countDistinct(col(idCol)).as("nd")).first()
    val dense = !idStats.isNullAt(0) && !idStats.isNullAt(1) &&
      idStats.getLong(0) == 0L && idStats.getLong(1) == idStats.getLong(2) - 1L &&
      idStats.getLong(3) == idStats.getLong(2)
    val ranked =
      if (dense) docs.select(col(idCol).cast("long").as("_rk"), col(textCol))
      else docs.select((row_number().over(
          Window.orderBy(col(idCol))) - 1).cast("long").as("_rk"), col(textCol))
    val nDocs = docs.select(count(lit(1)).as("_n"))
    val ms = milestones.distinct.sorted.toDF("prefix_docs")
      .crossJoin(nDocs).filter(col("prefix_docs") <= col("_n"))
      .select(col("prefix_docs"))
    val toks = ranked.select(col("_rk"),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
    toks.join(broadcast(ms), col("_rk") < col("prefix_docs"))
      .groupBy(col("prefix_docs"), col("tok"))
      .agg(count(lit(1)).as("_c"))
      .groupBy(col("prefix_docs"))
      .agg(count(lit(1)).as("types"),
        sum(col("_c")).as("tokens"),
        sum(when(col("_c") === 1, 1L).otherwise(0L)).as("hapax"))
      .withColumn("ttr",
        round(col("types").cast("double") / col("tokens"), 4))
      .transform(d => Perf.sortedOnce(d, col("prefix_docs")))
  }

  /** C39b `q148_vocab_growth` — [[vocabularyGrowth]] over the documents
    * corpus: the oracle re-derives tokenization, the prefix theta-join
    * and both aggregation tiers; every column is an exact integer but
    * the one 4-dp ratio of two longs. */
  def vocabGrowthDocs(spark: SparkSession, dir: String): DataFrame =
    vocabularyGrowth(Tables(spark, dir).documents)
}

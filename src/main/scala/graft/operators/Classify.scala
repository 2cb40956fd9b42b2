package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{text => T}

/** C37: multinomial Naive Bayes text classification — the closed-form
  * member of the quality/language classifier family every published
  * corpus pipeline ships (C4's langdetect gate, Raffel et al. 2020,
  * arXiv:1910.10683; GPT-3's quality classifier, Brown et al. 2020,
  * arXiv:2005.14165 App. A; fastText's linear baseline, Joulin et
  * al. 2016, arXiv:1607.01759). Trained classifiers need fitted
  * weights; multinomial NB with Laplace smoothing is the classic
  * count-based one whose training IS an aggregation — so both halves
  * run as Spark plans and both halves oracle-check exactly.
  *
  * Split [[nbFit]] / [[nbScore]] (the DSIR convention): fit once on a
  * labeled seed, persist the two count frames, score every ingest
  * batch against them without touching the seed again.
  *
  * Exact-arithmetic contract: all log terms quantize to the 1e-8 grid
  * and accumulate as longs (the q93 scaled-ln convention), so scores
  * are exact integers, the argmax is engine-reproducible, and ties
  * break to the lexicographically smallest label.
  */
object Classify {

  /** Fit the NB model on a labeled seed corpus: token counts per
    * (label, token) plus per-label document/token totals — raw COUNTS,
    * not derived log-weights, so persisted models merge associatively
    * under day-2 appends (sum the counts, like the sketch tables) and
    * smoothing stays a scoring-time choice.
    *
    * @return (tokenCounts: (tok, label, c), classStats: (label,
    *         n_docs, n_tokens)) — |vocab|·|labels| and |labels| rows */
  def nbFit(seed: DataFrame, labelCol: String, textCol: String,
            idCol: String = "doc_id"): (DataFrame, DataFrame) = {
    val toks = seed.select(col(idCol), col(labelCol).as("label"),
      explode(T.tokens(col(textCol))).as("tok"))
    val tokenCounts = toks.groupBy(col("tok"), col("label"))
      .agg(count(lit(1)).as("c"))
    val classStats = seed.select(col(labelCol).as("label"),
        size(T.tokens(col(textCol))).cast("long").as("_n"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_docs"), sum(col("_n")).as("n_tokens"))
    (tokenCounts, classStats)
  }

  /** Score a batch against a fitted model. Per (doc, label):
    *
    *   score = Σ_t n_t·ln(c(l,t)+1) − N_doc·ln(n_tokens_l + V)
    *           + ln(n_docs_l / total_docs)
    *
    * — the Laplace-smoothed multinomial log-posterior with the
    * Σ n_t·ln(1) = 0 terms dropped: only tokens the label has SEEN
    * contribute to the first sum, so the batch token stream joins the
    * model inner on `tok` (seed-OOV tokens fall out — their smoothed
    * mass is exactly the −N_doc·ln(denom) term already counted) and
    * the (doc × label) grid completes via a broadcast of the
    * |labels|-row constants frame. Every ln quantizes to the 1e-8
    * grid and the sums are exact longs.
    *
    * Scale shape: one explode + (doc,tok) partial count, ONE shuffle
    * join against the |vocab|·|labels| model on tok, one (doc,label)
    * aggregate, and a per-doc window argmax — nothing corpus-wide.
    *
    * @return one row per batch doc: (id, pred_label, score — the
    *         winner's scaled-long posterior) */
  def nbScore(batch: DataFrame, tokenCounts: DataFrame, classStats: DataFrame,
              idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(tokenCounts.columns.sameElements(Array("tok", "label", "c")),
      "tokenCounts must carry (tok, label, c) — build it with nbFit")
    require(classStats.columns.sameElements(Array("label", "n_docs", "n_tokens")),
      "classStats must carry (label, n_docs, n_tokens) — build it with nbFit")
    def ln8(c: org.apache.spark.sql.Column) = round(log(c) * 100000000.0).cast("long")
    val vocab = tokenCounts.agg(countDistinct(col("tok")).as("_v"))
    val tot   = classStats.agg(sum(col("n_docs")).cast("double").as("_td"))
    val consts = broadcast(classStats
      .crossJoin(broadcast(tot)).crossJoin(broadcast(vocab))
      .select(
        col("label"),
        ln8((col("n_tokens") + col("_v")).cast("double")).as("_lden"),
        ln8(col("n_docs").cast("double") / col("_td")).as("_lprior")))

    val docToks = batch.select(col(idCol), explode(T.tokens(col(textCol))).as("tok"))
      .groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("_n"))
    val part = docToks
      .join(tokenCounts, Seq("tok"))
      .groupBy(col(idCol), col("label"))
      .agg(sum(col("_n") * ln8((col("c") + 1).cast("double"))).as("_part"))

    val docs = batch.select(col(idCol),
      size(T.tokens(col(textCol))).cast("long").as("_nd"))
    val scored = docs.crossJoin(consts)
      .join(part, Seq(idCol, "label"), "left")
      .select(col(idCol), col("label"),
        (coalesce(col("_part"), lit(0L)) - col("_nd") * col("_lden") + col("_lprior"))
          .as("score"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("label").asc)
    scored.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") === 1)
      .select(col(idCol), col("label").as("pred_label"), col("score"))
  }

  /** Day-2 model growth: merge two fitted NB models by summing their
    * count frames — EXACT (integer sums are associative and
    * commutative), so merge-then-score equals refit-then-score bit for
    * bit; that is the q112 oracle contract (the
    * [[Search.appendToPostings]] append-equals-rebuild convention).
    * Labels present in only one half pass through untouched. */
  def mergeNbModels(tc1: DataFrame, cs1: DataFrame,
                    tc2: DataFrame, cs2: DataFrame): (DataFrame, DataFrame) = {
    val tc = tc1.unionByName(tc2).groupBy(col("tok"), col("label"))
      .agg(sum(col("c")).as("c"))
    val cs = cs1.unionByName(cs2).groupBy(col("label"))
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
    (tc, cs)
  }

  /** `q112_nb_incremental` — the day-2 path: the q108 seed arrives as
    * TWO ingest batches (odd/even doc_id halves), each fitted
    * separately, merged with [[mergeNbModels]], and the held-out batch
    * scores against the merged model. The oracle is q108's full-seed
    * reformulation verbatim — merge-equals-refit is the contract,
    * bit-exact because counts sum as longs before any log is taken. */
  def nbIncrementalDocs(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables(spark, dir).documents
      .select(col("doc_id"), col("lang"),
        concat(col("text"), lit(" marker_"), col("lang")).as("text"))
    val seed  = docs.filter(col("doc_id") % 5 =!= 4)
    val batch = docs.filter(col("doc_id") % 5 === 4)
    val (tc1, cs1) = nbFit(seed.filter(col("doc_id") % 2 === 0), "lang", "text")
    val (tc2, cs2) = nbFit(seed.filter(col("doc_id") % 2 === 1), "lang", "text")
    val (tc, cs) = mergeNbModels(tc1, cs1, tc2, cs2)
    nbScore(batch, tc, cs)
      .join(batch.select(col("doc_id"), col("lang").as("true_lang")), Seq("doc_id"))
      .select(col("doc_id"), col("true_lang"), col("pred_label"),
        (col("pred_label") === col("true_lang")).as("correct"), col("score"))
      .transform(d => Perf.sortedOnce(d, col("doc_id")))
  }

  /** `q108_nb_classifier` — classification end to end on the standard
    * 80/20 split. The synthetic corpus's text is the SAME shared word
    * salad for every `lang` value (token distributions carry no class
    * signal — a token classifier on the raw table can only learn the
    * priors), so the entry PLANTS a weak topic signal the q49 way:
    * each document gains ONE `marker_<lang>` token amid its ~50 noise
    * tokens, identically on both engines. The classifier must dig that
    * single token out of the shared-vocabulary noise on the seed and
    * recover the class on the held-out batch — real learning, and the
    * accuracy surface (`correct`) a corpus curator actually
    * thresholds. Both halves — the count fit AND the argmax scoring —
    * hash-check against the oracle's re-derivation. */
  def nbLangDocs(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables(spark, dir).documents
      .select(col("doc_id"), col("lang"),
        concat(col("text"), lit(" marker_"), col("lang")).as("text"))
    val seed  = docs.filter(col("doc_id") % 5 =!= 4)
    val batch = docs.filter(col("doc_id") % 5 === 4)
    val (tokenCounts, classStats) = nbFit(seed, "lang", "text")
    nbScore(batch, tokenCounts, classStats)
      .join(batch.select(col("doc_id"), col("lang").as("true_lang")), Seq("doc_id"))
      .select(col("doc_id"), col("true_lang"), col("pred_label"),
        (col("pred_label") === col("true_lang")).as("correct"), col("score"))
      .transform(d => Perf.sortedOnce(d, col("doc_id")))
  }
}

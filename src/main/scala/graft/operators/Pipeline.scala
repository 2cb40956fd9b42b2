package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** C41: the composed curation pipeline — boilerplate strip → exact
  * dedup election → length gate → per-domain report, chained as ONE
  * declarative plan. Every stage is an operator this library already
  * certifies alone (C40, C1, C9-family, C39); this entry certifies
  * the COMPOSITION: Catalyst fuses the stages without materialization
  * barriers, the dup election runs on the CLEANED text (the published
  * pipeline order — Penedo et al. 2023 §3: dedup after line
  * corrections, or site templates mask true duplicates), and the
  * whole chain still hash-checks against a from-scratch oracle.
  *
  * Scale shape: the page stream shuffles exactly three times — the
  * line census (tiny), the clean-text dup election (one window
  * exchange, the q105 election shape), and the final |domains|-row
  * rollup. No stage collects, no stage re-scans.
  */
object Pipeline {

  /** Per-domain curation report over raw crawled pages:
    *
    *  1. [[TextClean.boilerplateStrip]] removes site-template lines;
    *  2. exact-dup election on the CLEAN text (min-id keeper — the
    *     [[Dedup.dedupExact]] rule at pipeline position);
    *  3. a token-length gate `[minWords, maxWords]` on survivors (the
    *     Gopher word-count window, C33's first rule);
    *  4. rollup to one row per domain.
    *
    * Counting is disjoint and ordered (a page is a dup FIRST, a gate
    * failure only if not a dup, kept otherwise), so the columns sum to
    * `n_pages` — the report is an audit, not three overlapping rates.
    *
    * @return (domain, n_pages, n_dups, n_gate_failed, n_kept,
    *         kept_words) — all exact integers */
  def curationReport(pages: DataFrame, idCol: String, domainCol: String,
                     textCol: String, minWords: Int = 40, maxWords: Int = 200,
                     minBoilerDocs: Int = 3): DataFrame = {
    require(minWords >= 1 && maxWords >= minWords,
      s"need 1 <= minWords <= maxWords, got [$minWords, $maxWords]")
    val stripped = TextClean.boilerplateStrip(
      pages, idCol, domainCol, textCol, minDocs = minBoilerDocs)
    val words = when(trim(col("clean_text")) === "", lit(0L))
      .otherwise(size(split(trim(col("clean_text")), "\\s+")).cast("long"))
    val keep = min(col(idCol)).over(Window.partitionBy(col("clean_text")))
    stripped
      .withColumn("_w", words)
      .withColumn("_dup", col(idCol) =!= keep)
      .withColumn("_pass", col("_w") >= minWords && col("_w") <= maxWords)
      .groupBy(col(domainCol).as("domain"))
      .agg(
        count(lit(1)).as("n_pages"),
        sum(when(col("_dup"), 1L).otherwise(0L)).as("n_dups"),
        sum(when(!col("_dup") && !col("_pass"), 1L).otherwise(0L)).as("n_gate_failed"),
        sum(when(!col("_dup") && col("_pass"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(!col("_dup") && col("_pass"), col("_w")).otherwise(0L)).as("kept_words"))
  }

  /** C41 `q116_curation_pipeline` — the documents corpus dressed as a
    * crawled site (header/nav/footer per source, body = the q107
    * donor planting so cross-source exact dups exist UNDER the
    * differing site templates): the strip must uncover the dups the
    * raw text hides, the election must remove them, and the length
    * gate splits the survivors (the corpus's 40-word short tail fails
    * it). The oracle replays all four stages from raw rows. */
  def curationPipelineDocs(spark: SparkSession, dir: String): DataFrame = {
    val pages = Dedup.donorPlantedText(graft.Tables(spark, dir).documents)
      .select(col("doc_id"), col("source"),
        concat_ws("\n",
          concat(lit("SITE HEADER "), col("source")),
          lit("home | about | contact"),
          col("text"),
          concat(lit("(c) 2024 "), col("source"))
        ).as("text"))
    curationReport(pages, "doc_id", "source", "text").orderBy(col("domain"))
  }
}

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

  /** C45: the crawl→corpus INGEST pipeline — WET record extraction
    * (C44) → envelope quarantine → domain-suffix blocklist gate
    * (C36b) → canonical-URL dedup election (C35) → per-domain audit.
    * This is the published front half of every web pipeline
    * (RefinedWeb §3.1 "reading the data → URL filtering →
    * deduplication"), composed from operators this library certifies
    * individually.
    *
    * Counting is disjoint and ORDERED (a record quarantines for a bad
    * envelope FIRST — a lying/missing declared length or a missing
    * target URI, without which neither gate nor dedup can judge it —
    * is gate-blocked only if intact, a URL dup only if it also
    * cleared the gate; the dup election runs among exactly the clean
    * unblocked survivors, so a blocked keeper never shields its
    * recrawls), so the columns sum to `n_records`.
    *
    * Scale: the chunk parse runs ONCE — records materialize
    * (localCheckpoint standing in for the persisted records table a
    * production ingest writes first) before the gate's two scans and
    * the join-back would otherwise re-execute the regex-heavy parse
    * subtree three times; the record stream then shuffles only for
    * the suffix-join, the election window, and the |domains| rollup. */
  def crawlIngestReport(chunks: DataFrame, idCol: String, contentCol: String,
                        blocklist: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    require(Seq(ByteType, ShortType, IntegerType, LongType)
      .contains(chunks.schema(idCol).dataType),
      s"chunk id column '$idCol' must be integral (a string id would cast to " +
        "null rec_ids and silently join nothing) — hash string chunk names first")
    // rec_id = (chunk_id << 32) | rec_idx — rec_idx is an int from
    // posexplode (< 2^31 by construction), so indices can never alias
    // across chunks; chunk ids at or past 2^31 would overflow the
    // shift and fail loudly in-plan instead of colliding silently
    val recs = graft.sources.Warc.wetRecords(chunks, idCol, contentCol)
      .withColumn("rec_id",
        when(col(idCol).cast("long") >= (1L << 31) || col(idCol) < 0,
          raise_error(concat(lit("crawlIngestReport: chunk id out of [0, 2^31) — "),
            col(idCol).cast("string"), lit(" would overflow the rec_id encoding"))))
          .otherwise(shiftleft(col(idCol).cast("long"), 32) + col("rec_idx")))
      .localCheckpoint()
    val gated = Urls.blocklistGate(
      recs.select(col("rec_id"), col("uri")), "rec_id", "uri", blocklist)
    val base = recs.join(gated, Seq("rec_id"))
      .withColumn("canon_url", Urls.canonicalizeUrl(col("uri")))
    // a record with no target URI has nothing to gate or dedup on —
    // it quarantines with the bad envelopes instead of colliding in
    // the constant empty-URI canonical group
    val sound = col("length_ok") && col("uri") =!= ""
    val eligible = sound && !col("blocked")
    val keep = min(when(eligible, col("rec_id")))
      .over(Window.partitionBy(col("canon_url")))
    val words = when(trim(col("payload")) === "", lit(0L))
      .otherwise(size(split(trim(col("payload")), "\\s+")).cast("long"))
    base
      .withColumn("_dup", eligible && col("rec_id") =!= keep)
      .withColumn("_cat",
        when(!sound, "bad_envelope")
          .when(col("blocked"), "blocked")
          .when(col("_dup"), "url_dup")
          .otherwise("kept"))
      .withColumn("_w", words)
      .groupBy(col("host").as("domain"))
      .agg(
        count(lit(1)).as("n_records"),
        sum(when(col("_cat") === "bad_envelope", 1L).otherwise(0L)).as("n_bad_envelope"),
        sum(when(col("_cat") === "blocked", 1L).otherwise(0L)).as("n_blocked"),
        sum(when(col("_cat") === "url_dup", 1L).otherwise(0L)).as("n_url_dups"),
        sum(when(col("_cat") === "kept", 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("_cat") === "kept", col("_w")).otherwise(0L)).as("kept_words"))
  }

  /** C45 `q121_crawl_ingest` — the whole front half on the q120 chunk
    * files: lying-length records (doc_id ≡ 0 mod 7) quarantine, three
    * blocklisted sites' records gate out whole, five-way recrawl URL
    * groups (article ≡ source mod 20) collapse to their elected
    * keeper, and the survivors report per domain. The oracle
    * re-serializes the chunks AND replays all four stages from raw
    * rows. */
  def crawlIngestDocs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    crawlIngestReport(
      graft.sources.Warc.plantedWetChunks(graft.Tables(spark, dir).documents),
      "chunk_id", "content", Urls.docBlocklist.toDF("pattern"))
      .orderBy(col("domain"))
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

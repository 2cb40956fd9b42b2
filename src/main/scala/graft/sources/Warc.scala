package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** C44: WET/WARC record extraction — the step BEFORE everything else
  * in a web-corpus pipeline: Common Crawl ships its text as WET files
  * (ISO 28500 WARC envelopes around extracted text), and the very
  * first distributed job turns crawl chunks into one row per record
  * with its envelope metadata (target URI, date, declared length).
  * Everything downstream — URL gating (C35/C36b), boilerplate (C40),
  * dedup, quality — consumes these rows.
  *
  * Parser contract (stated honestly): newline-framed records after CR
  * normalization — each record is `WARC/1.0\n<headers>\n\n<payload>`,
  * records back-to-back within a chunk, payloads free of blank lines
  * (true of WET text extracts, whose paragraphs the conversion step
  * separates with single newlines; a Content-Length–framed binary
  * WARC parser is a byte-level reader, not a string pipeline, and
  * belongs next to [[graft.operators.Multimodal]]'s container
  * parsers). The declared `Content-Length` is CHECKED against the
  * extracted payload, not trusted: `length_ok = false` rows are the
  * truncation/corruption surface a crawl-ingest job must quarantine,
  * not silently keep.
  *
  * Scale shape: one map-only split + posexplode per chunk (records
  * explode ~1000× per chunk file, the format's design grain), all
  * header extraction inside codegen'd regex/substr expressions; no
  * shuffle at all — the natural partition is the chunk file, exactly
  * how Common Crawl shards.
  */
object Warc {

  /** One row per WARC record in `contentCol`:
    * (idCol, rec_idx, uri, warc_date, content_length, payload_len,
    * length_ok, payload). `rec_idx` is the record's 1-based position
    * in its chunk; fragments before the first `WARC/1.0` marker
    * (e.g. a warcinfo preamble) and header-only fragments with no
    * blank-line boundary are dropped.
    *
    * `payload_len` counts OCTETS (Content-Length is octets per
    * ISO 28500 §5.3, not characters — a char count falsely quarantines
    * every intact non-ASCII record); only the exact two-newline record
    * separator is stripped, so a payload that legitimately ends with
    * its own newline keeps it. A missing or malformed Content-Length
    * header makes `length_ok` FALSE, never null — an unverifiable
    * record is exactly what the quarantine exists for, and a null
    * would slip through every downstream `when` chain as "kept". */
  def wetRecords(chunks: DataFrame, idCol: String,
                 contentCol: String): DataFrame = {
    val norm = regexp_replace(col(contentCol), "\r", "")
    val frags = split(norm, "WARC/1\\.0\\n")
    val pos = instr(col("frag"), "\n\n")
    val declared = regexp_extract(col("_hdr"), "(?m)^Content-Length: ([0-9]+)$", 1)
      .cast("long")
    chunks
      .select(col(idCol), posexplode(frags).as(Seq("rec_idx", "frag")))
      .filter(col("rec_idx") >= 1 && instr(col("frag"), "\n\n") > 0)
      .withColumn("_hdr", col("frag").substr(lit(1), pos - 1))
      .withColumn("_payload", regexp_replace(
        col("frag").substr(pos + 2, length(col("frag"))), "\n\n$", ""))
      .select(
        col(idCol),
        col("rec_idx").cast("long").as("rec_idx"),
        regexp_extract(col("_hdr"), "(?m)^WARC-Target-URI: (.*)$", 1).as("uri"),
        regexp_extract(col("_hdr"), "(?m)^WARC-Date: (.*)$", 1).as("warc_date"),
        declared.as("content_length"),
        octet_length(col("_payload")).cast("long").as("payload_len"),
        coalesce(octet_length(col("_payload")).cast("long") === declared,
          lit(false)).as("length_ok"),
        col("_payload").as("payload"))
  }

  /** C44 `q120_wet_records` — the documents corpus serialized into WET
    * chunk files (25 chunks of 20 records each, records concatenated
    * in doc order behind a warcinfo preamble) and parsed back: URI and
    * date from the envelope, payload byte-for-byte, and the declared
    * Content-Length CHECK — docs with doc_id ≡ 0 (mod 7) declare five
    * bytes too many (a planted truncation), so both verdict legs are
    * real. The oracle serializes AND parses from raw rows. */
  def wetRecordsDocs(spark: SparkSession, dir: String): DataFrame =
    wetRecords(plantedWetChunks(graft.Tables(spark, dir).documents),
      "chunk_id", "content")
      .orderBy(col("chunk_id"), col("rec_idx"))

  /** The q120 serialization — the documents corpus as 25 WET chunk
    * files (records in doc order behind a warcinfo preamble; docs with
    * doc_id ≡ 0 mod 7 declare five bytes too many). Shared with q121,
    * whose oracle re-serializes identically. */
  private[graft] def plantedWetChunks(docs: DataFrame): DataFrame =
    chunksAroundPayload(docs, col("text"))

  /** The shared q120/q127 envelope builder: WET chunk files around a
    * caller-chosen per-doc `payload` column (records in doc order
    * behind a warcinfo preamble; docs with doc_id ≡ 0 mod 7 declare
    * five bytes too many — the declared length always refers to the
    * ACTUAL payload, so the lie is the only envelope defect). */
  private def chunksAroundPayload(docs: DataFrame, payload: Column,
                                  chunkId: Column = col("doc_id") % 25,
                                  path: Column =
                                    (col("doc_id") % 100).cast("string")): DataFrame = {
    val declared = when(col("doc_id") % 7 === 0, octet_length(payload) + 5)
      .otherwise(octet_length(payload))
    val rec = concat(
      lit("WARC/1.0\n"),
      lit("WARC-Type: conversion\n"),
      concat(lit("WARC-Target-URI: https://"), col("source"),
        lit(".example.com/articles/"), path, lit("\n")),
      lit("WARC-Date: 2024-01-01T00:00:00Z\n"),
      concat(lit("Content-Length: "), declared.cast("string"), lit("\n")),
      lit("\n"), payload, lit("\n\n"))
    docs
      .select(chunkId.as("chunk_id"), col("doc_id"), rec.as("_rec"))
      .groupBy(col("chunk_id"))
      .agg(concat(lit("warcinfo preamble\n"),
        array_join(transform(
          array_sort(collect_list(struct(col("doc_id"), col("_rec")))),
          s => s.getField("_rec")), "")).as("content"))
  }

  /** The q174 MASTER-pipeline serialization — WET envelopes around
    * line-dressed pages with one plant family per downstream stage, so
    * every stage of the full curation→training-export chain does REAL,
    * deterministic work at every SF:
    *
    *  - doc_id ≡ 9 (mod 10): WHOLE-copy body (text of doc−4, class 5)
    *    — post-clean exact dups for the election (q107's rule);
    *  - doc_id ≡ 3 (mod 10): LONG-SPAN copier — the doc−2 donor's full
    *    text as a first body line, own text second: Jaccard ≈
    *    |donor|/(|donor|+|own|), so SHORT own texts push pairs past
    *    the exact-Jaccard near-dup threshold while the rest survive to
    *    the winnow tier, which excises the donor span;
    *  - doc_id ≡ 7 / ≡ 4 (mod 10): CONTAMINATION copiers — the FIRST
    *    14 WORDS of doc−6 / doc−2 prepended as their own line (14, so
    *    the appended period rides the 14th token and words 1–13 stay
    *    an intact shared 13-gram); spans this short sit below the
    *    master chain's winnow `minPrints`, so they reach the firewall,
    *    where the seed-40 source split puts (src11→src17) across
    *    train→val and (src2→src4) across test→train — BOTH leak
    *    directions fire;
    *  - doc_id ≡ 8 (mod 10): URL RECRAWL — publishes doc−2's article
    *    path, so the canonical-URL election drops it at ingest;
    *  - doc_id ≡ 0 (mod 7): lying Content-Length (the q120 envelope
    *    quarantine); src3/src7/src12 hosts are blocklist-gated.
    *
    * URI paths carry the FULL doc_id (no q127 %100 collapse: the
    * surviving corpus must scale with SF) and chunk_id = doc_id DIV 40,
    * which makes rec_id = (chunk << 32) | idx MONOTONE in doc_id — so
    * every min-id election and excise-the-higher-id rule downstream
    * behaves exactly as the doc_id arithmetic reads. */
  private[graft] def plantedMasterChunks(docs: DataFrame): DataFrame = {
    def donor(off: Int) = docs.select((col("doc_id") + off).as("doc_id"),
      col("text").as(s"_d$off"))
    def first14(c: Column): Column =
      concat(array_join(slice(split(trim(c), "\\s+"), 1, 14), " "), lit("."))
    val planted = docs
      .join(donor(4), Seq("doc_id"), "left")
      .join(donor(2), Seq("doc_id"), "left")
      .join(donor(6), Seq("doc_id"), "left")
      .withColumn("body",
        when(col("doc_id") % 10 === 9 && col("_d4").isNotNull,
          concat(col("_d4"), lit(".")))
        .when(col("doc_id") % 10 === 3 && col("_d2").isNotNull,
          concat(col("_d2"), lit(".\n"), col("text"), lit(".")))
        .when(col("doc_id") % 10 === 7 && col("_d6").isNotNull,
          concat(first14(col("_d6")), lit("\n"), col("text"), lit(".")))
        .when(col("doc_id") % 10 === 4 && col("_d2").isNotNull,
          concat(first14(col("_d2")), lit("\n"), col("text"), lit(".")))
        .otherwise(concat(col("text"), lit("."))))
      .drop("_d4", "_d2", "_d6")
    val page = concat_ws("\n",
      col("body"),
      lit("Please enable JavaScript and cookies to continue viewing."),
      lit("continue reading more about"),
      concat(lit("Copyright 2024 Example Corp id "), col("doc_id").cast("string"), lit(".")),
      lit("BREAKING NEWS ALERT READ THIS NOW!"),
      lit("Click here."))
    val pathId = when(col("doc_id") % 10 === 8, col("doc_id") - 2)
      .otherwise(col("doc_id"))
    chunksAroundPayload(planted, page,
      chunkId = (col("doc_id") / 40).cast("long"),
      path = pathId.cast("string"))
  }

  /** The q178 DAY-2 batch serialization — WET envelopes around the
    * BLOCK-4 documents (chunk_id = doc_id div 40 ≡ 4 mod 5, exactly
    * the chunks the q178 day-1 corpus filter holds out of
    * [[plantedMasterChunks]]), with one plant family per day-2 fate.
    * Day-1 donors sit in chunk c−1 (block 3 — always corpus-side);
    * same-batch donors sit in the doc's own chunk. Residues mod 10:
    *
    *  - 0: plain body, path plants split by b mod 20 — b ≡ 0 publishes
    *    doc (b−40)'s article path, a RECRAWL of a day-1 resource
    *    (url_dup_corpus via the frozen canonical index); b ≡ 10
    *    (mod 40) publishes the path of b+20 — its SAME-HOST sibling in
    *    the same chunk (hosts repeat every 20 ids), so a fresh
    *    resource is crawled twice this batch and the batch's own
    *    election fires (the sibling, higher rec_id, lands
    *    url_dup_batch);
    *  - 1: whole-copy of day-1 plain doc (b−40)'s body — the batch
    *    clean text lands EXACTLY on a frozen fingerprint
    *    (exact_dup_corpus);
    *  - 2: day-1 doc (b−40)'s text plus a three-word tail — off the
    *    exact fingerprint but past the Jaccard threshold against the
    *    frozen prefix index (near_dup_corpus);
    *  - 3: day-1 plain doc (b−38)'s full text as a first line, own
    *    text second — the copied LONG span excises against the frozen
    *    winnow index (short own texts tip the pair past the Jaccard
    *    threshold instead, the q174 ≡3 duality);
    *  - 4: the FIRST 14 WORDS of the day-1 host-5 doc in chunk c−1
    *    (id b − b%20 − 35) prepended — host 5 is HELD OUT under the
    *    q178 split seed, so train-host copiers hit the FROZEN
    *    eval-gram index (contaminated, the day-1→day-2 leak leg);
    *  - 5: plain (the same-batch donor pool);
    *  - 6: the first 14 words of the SAME-BATCH host-5 doc
    *    (id b − b%20 + 5) prepended — that donor lands eval_heldout
    *    in THIS batch and extends the index before the train side
    *    probes it, so train-host copiers flag (the within-day-2 leak
    *    leg);
    *  - 7: batch doc (b−2)'s text plus a three-word tail
    *    (near_dup_batch);
    *  - 8: batch doc (b−3)'s full text as a first line, own second
    *    (within-batch winnow excision, same ≡3 duality);
    *  - 9: whole-copy of batch doc (b−4)'s body (exact_dup_batch);
    *
    * plus the standing envelope plants: doc_id ≡ 0 (mod 7) lies about
    * Content-Length (bad_envelope), blocklisted hosts gate out whole.
    * Every family is CONDITIONAL on its donor surviving its own day-1
    * or batch fates — the oracle replays those conditions exactly; the
    * spec asserts each fate fires at sf0.001. */
  private[graft] def plantedMasterBatchChunks(docs: DataFrame): DataFrame = {
    def withDonor(base: DataFrame, idExpr: Column, outCol: String): DataFrame =
      base.join(
        docs.select(col("doc_id").as(s"_${outCol}_id"), col("text").as(outCol)),
        idExpr === col(s"_${outCol}_id"), "left").drop(s"_${outCol}_id")
    def first14(c: Column): Column =
      concat(array_join(slice(split(trim(c), "\\s+"), 1, 14), " "), lit("."))
    val batch = docs.filter((col("doc_id") / 40).cast("long") % 5 === 4)
    val b = col("doc_id")
    val withDonors = Seq[(Column, String)](
      (b - 40, "_m40"),
      (b - 38, "_m38"),
      (b - (b % 20) - 35, "_dh"), // day-1 host-5 doc, chunk c−1
      (b - (b % 20) + 5, "_bh"),  // same-batch host-5 doc
      (b - 2, "_m2"), (b - 3, "_m3"), (b - 4, "_m4"))
      .foldLeft(batch) { case (df, (e, n)) => withDonor(df, e, n) }
    val planted = withDonors
      .withColumn("body",
        when(b % 10 === 1 && col("_m40").isNotNull,
          concat(col("_m40"), lit(".")))
        .when(b % 10 === 2 && col("_m40").isNotNull,
          concat(col("_m40"), lit(". Indeed truly remarkable.")))
        .when(b % 10 === 3 && col("_m38").isNotNull,
          concat(col("_m38"), lit(".\n"), col("text"), lit(".")))
        .when(b % 10 === 4 && col("_dh").isNotNull,
          concat(first14(col("_dh")), lit("\n"), col("text"), lit(".")))
        .when(b % 10 === 6 && col("_bh").isNotNull,
          concat(first14(col("_bh")), lit("\n"), col("text"), lit(".")))
        .when(b % 10 === 7 && col("_m2").isNotNull,
          concat(col("_m2"), lit(". Extra closing remark.")))
        .when(b % 10 === 8 && col("_m3").isNotNull,
          concat(col("_m3"), lit(".\n"), col("text"), lit(".")))
        .when(b % 10 === 9 && col("_m4").isNotNull,
          concat(col("_m4"), lit(".")))
        .otherwise(concat(col("text"), lit("."))))
      .drop("_m40", "_m38", "_dh", "_bh", "_m2", "_m3", "_m4")
    val page = concat_ws("\n",
      col("body"),
      lit("Please enable JavaScript and cookies to continue viewing."),
      lit("continue reading more about"),
      concat(lit("Copyright 2024 Example Corp id "), col("doc_id").cast("string"), lit(".")),
      lit("BREAKING NEWS ALERT READ THIS NOW!"),
      lit("Click here."))
    val pathId = when(b % 20 === 0, b - 40)
      .when(b % 40 === 10, b + 20)
      .otherwise(b)
    chunksAroundPayload(planted, page,
      chunkId = (col("doc_id") / 40).cast("long"),
      path = pathId.cast("string"))
  }

  /** The q127 serialization — the q120 envelopes around LINE-DRESSED
    * pages: the body line (terminal-punctuated) is the q107 donor
    * planting (doc_id ≡ 9 mod 10 carries the doc_id−4 donor's text, so
    * post-clean exact dups exist that the URL election cannot see),
    * followed by the q102 boilerplate lines every line rule drops. The
    * oracle re-serializes identically from raw rows. */
  private[graft] def plantedCorpusChunks(docs: DataFrame): DataFrame = {
    val page = concat_ws("\n",
      concat(col("text"), lit(".")),
      lit("Please enable JavaScript and cookies to continue viewing."),
      lit("continue reading more about"),
      concat(lit("Copyright 2024 Example Corp id "), col("doc_id").cast("string"), lit(".")),
      lit("BREAKING NEWS ALERT READ THIS NOW!"),
      lit("Click here."))
    chunksAroundPayload(
      graft.operators.Dedup.donorPlantedText(docs), page)
  }
}

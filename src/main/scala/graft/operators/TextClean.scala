package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-cleaning operators a pretraining pipeline runs before anything
  * else touches the text: PII detection/redaction and HTML/boilerplate
  * stripping (the C4/CCNet-style cleanup stages; see the reference's
  * string-cleaning pass, `d2b_data/utils.py` clean-string helpers, for
  * the same shape at report scale).
  *
  * Everything is a pure column expression — map-only narrow plans, fully
  * codegen'd, zero shuffles — so both operators stream through a 100 TB
  * corpus scan at parquet-read speed. Patterns are ASCII-only and avoid
  * backreferences/lookaround so Java regex (Spark) and RE2 (DuckDB, the
  * oracle) agree byte-for-byte.
  */
object TextClean {

  /** Shared detection patterns (public, textbook shapes). Kept as
    * constants so the oracle SQL interpolates the SAME strings — one
    * source of truth for both engines. */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Pattern  = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val phonePattern = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  val ssnPattern   = "\\b\\d{3}-\\d{2}-\\d{4}\\b"

  /** PII detection + redaction over any (id, text) frame. Counts are
    * per-pattern matches against the ORIGINAL text (independent — a
    * later pattern never sees an earlier pattern's placeholder);
    * redaction applies the patterns in a fixed order (email → IPv4 →
    * phone → SSN) whose placeholders contain no digits, so no pass can
    * create a match for a later one. Phone (3-3-4) and SSN (3-2-4)
    * groupings are disjoint by construction. */
  def piiRedact(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val redacted =
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(t, emailPattern, "[EMAIL]"),
            ipv4Pattern, "[IP]"),
          phonePattern, "[PHONE]"),
        ssnPattern, "[ID]")
    df.withColumn("n_emails", regexp_count(t, lit(emailPattern)).cast("long"))
      .withColumn("n_ips", regexp_count(t, lit(ipv4Pattern)).cast("long"))
      .withColumn("n_phones", regexp_count(t, lit(phonePattern)).cast("long"))
      .withColumn("n_ids", regexp_count(t, lit(ssnPattern)).cast("long"))
      .withColumn("redacted", redacted)
  }

  /** HTML entity table, applied tag-strip-first then entities in this
    * fixed order with `&amp;` LAST — unescaping the ampersand first
    * would fabricate new entities out of literal text like `&amp;lt;`.
    * Entity-encoded angle brackets (`&lt;tag&gt;`) are CONTENT, not
    * markup: they unescape AFTER the tag strip and survive, by design. */
  val htmlEntities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  /** Tag pattern: anything between angle brackets, non-greedy by
    * construction (`[^>]*` cannot cross a closing bracket). */
  val tagPattern = "<[^>]*>"

  /** HTML/boilerplate strip over any (id, text) frame: drop tags,
    * unescape the common entities, collapse runs of whitespace. Emits
    * the tag count (a boilerplate-density quality signal) alongside the
    * cleaned text. */
  def htmlStrip(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val unescaped = htmlEntities.foldLeft(
      regexp_replace(t, tagPattern, " ")) { case (acc, (ent, ch)) =>
      replace(acc, lit(ent), lit(ch))
    }
    df.withColumn("n_tags", regexp_count(t, lit(tagPattern)).cast("long"))
      .withColumn("clean_text", trim(regexp_replace(unescaped, "\\s+", " ")))
      // reference the ATTRIBUTE, not the tree: Spark does not CSE
      // repeated expressions across projection columns, so repeating
      // the trim/replace chain here ran the whole strip+unescape
      // pipeline twice per row (the q40 hashed-gram lesson)
      .withColumn("clean_chars", length(col("clean_text")).cast("long"))
  }

  /** `q49_pii_redact` — the documents table carries no PII (synthetic
    * word-salad), so the query entry PLANTS one deterministic instance
    * of each pattern per row from `doc_id` — the oracle builds the same
    * augmented text, so the DuckDB hash check exercises the actual
    * detection and redaction logic, not just zero counts. */
  def piiRedactDocs(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables(spark, dir).documents
    val planted = docs.select(
      col("doc_id"),
      concat(
        col("text"),
        lit(" email user"), col("doc_id").cast("string"), lit("@example.com"),
        lit(" ip 10."), (col("doc_id") % 256).cast("string"), lit(".0.1"),
        lit(" phone 555-"), lpad((col("doc_id") % 1000).cast("string"), 3, "0"), lit("-1234"),
        lit(" ssn "), lpad((col("doc_id") % 1000).cast("string"), 3, "0"), lit("-45-6789")
      ).as("text"))
    piiRedact(planted, "text")
      .select(col("doc_id"), col("n_emails"), col("n_ips"), col("n_phones"),
        col("n_ids"), col("redacted"))
      .transform(d => Perf.sortedOnce(d, col("doc_id")))
  }

  /** `q50_html_strip` — same planting idea: wrap each document in
    * deterministic markup (tags, an attribute URL with an encoded
    * ampersand, entity-bracketed content) so the oracle checks the
    * strip+unescape+collapse pipeline end to end. */
  def htmlStripDocs(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables(spark, dir).documents
    val planted = docs.select(
      col("doc_id"),
      concat(
        lit("<div class=\"doc\"><p id='d'>"), col("text"),
        lit("</p> <a href=\"http://ex.com/?a=1&amp;b=2\">link</a>&nbsp;&lt;end&gt;</div>")
      ).as("text"))
    htmlStrip(planted, "text")
      .select(col("doc_id"), col("n_tags"), col("clean_text"), col("clean_chars"))
      .transform(d => Perf.sortedOnce(d, col("doc_id")))
  }

  // ---- line-level rule filtering (C4/RefinedWeb) ---------------------

  /** Boilerplate phrases whose presence (case-insensitive) drops a
    * line — the C4 policy list (Raffel et al. 2020, "Exploring the
    * Limits of Transfer Learning with a Unified Text-to-Text
    * Transformer", arXiv:1910.10683 §2.2 — public; "javascript" /
    * cookie-notice / rights-reserved lines are the published
    * examples). Shared constant: the oracle SQL interpolates the SAME
    * strings. */
  val lineBadPhrases: Seq[String] =
    Seq("javascript", "cookie", "all rights reserved", "copyright", "©")

  /** WITHIN-document line filtering — the C4 page-cleaning stage, the
    * rule-based sibling of [[graft.operators.Dedup.dropRepeatedParagraphs]]
    * (that rule needs a corpus census; these need only the line itself,
    * so they run first and for free). A line survives iff ALL of:
    *
    *  - ends in terminal punctuation (`.` `!` `?` `"`) — C4's
    *    retained-lines rule;
    *  - has at least `minWords` whitespace words — C4's short-line
    *    rule;
    *  - contains no [[lineBadPhrases]] member (case-insensitive);
    *  - uppercase chars ≤ `maxUpperPct`% of line chars — the
    *    RefinedWeb-family shouting/navigation heuristic (Penedo et
    *    al. 2023, arXiv:2306.01116 — public), compared as EXACT
    *    integers (`100·upper ≤ pct·chars`), so the verdict has no
    *    float boundary.
    *
    * Scale shape: there is NO explode — lines live inside a
    * `split`/`filter`/`array_join` higher-order chain, so the whole
    * operator is one codegen'd projection per row (map-only, zero
    * shuffles, streams at scan speed, trivially valid under
    * Structured Streaming because it is stateless). Documents whose
    * every line drops survive with empty text (the caller's mixing
    * policy decides; same contract as paragraph dedup).
    *
    * Returns (…, n_lines, n_kept, clean_text): counts of non-blank
    * lines before/after, and the surviving lines rejoined in original
    * order. */
  def lineFilter(df: DataFrame, textCol: String,
                 minWords: Int = 3, maxUpperPct: Int = 40): DataFrame = {
    require(minWords >= 1, s"minWords must be >= 1, got $minWords")
    require(maxUpperPct >= 0 && maxUpperPct <= 100,
      s"maxUpperPct must lie in [0,100], got $maxUpperPct")
    def keeps(l: Column): Column = {
      val t = trim(l)
      val lower_t = lower(t)
      val badHit = lineBadPhrases
        .map(p => lower_t.contains(lit(p)))
        .reduce(_ || _)
      val nUpper = length(regexp_replace(t, "[^A-Z]", ""))
      t.rlike("[.!?\"]$") &&
        (size(split(t, "\\s+")) >= minWords) &&
        !badHit &&
        (nUpper * 100 <= length(t) * maxUpperPct)
    }
    val lines = filter(split(col(textCol), "\n"), l => trim(l) =!= "")
    val kept = filter(lines, keeps(_))
    df.withColumn("_lines", lines)
      .withColumn("_kept", kept)
      .withColumn("n_lines", size(col("_lines")).cast("long"))
      .withColumn("n_kept", size(col("_kept")).cast("long"))
      .withColumn("clean_text", array_join(transform(col("_kept"), trim(_)), "\n"))
      .drop("_lines", "_kept")
  }

  /** C32b: WITHIN-document repeated-line removal — keep the FIRST
    * occurrence of every exact line, preserve document order. The
    * intra-page counterpart of the cross-corpus boilerplate census
    * (C40): nav menus, cookie banners and footer blocks repeat INSIDE
    * a page too, and Gopher's repetition signals (q100) only DETECT
    * them — this is the removal pass.
    *
    * Scale shape: same as [[lineFilter]] — no explode, no shuffle;
    * the keep rule is `array_position(lines, x) = i + 1`
    * (array_position is each value's FIRST 1-based index, so a line
    * survives exactly when it IS the first occurrence), one codegen'd
    * projection per row, stateless and so trivially streaming-valid.
    * Matching is on the TRIMMED line (leading/trailing space is
    * presentation, not content); blank lines drop (the [[lineFilter]]
    * contract). Per-doc cost is O(lines²) in the worst case — lines
    * per page are dozens, not thousands, and the scan never leaves
    * the row.
    *
    * Returns (…, n_lines, n_kept, clean_text). */
  def dedupLinesWithin(df: DataFrame, textCol: String): DataFrame = {
    val lines = filter(
      transform(split(col(textCol), "\n"), l => trim(l)), l => l =!= "")
    df.withColumn("_lines", lines)
      .withColumn("_kept", filter(col("_lines"),
        (l, i) => array_position(col("_lines"), l) === (i + lit(1)).cast("long")))
      .withColumn("n_lines", size(col("_lines")).cast("long"))
      .withColumn("n_kept", size(col("_kept")).cast("long"))
      .withColumn("clean_text", array_join(col("_kept"), "\n"))
      .drop("_lines", "_kept")
  }

  /** C32b `q157_line_dedup` — [[dedupLinesWithin]] over a planted
    * five-line page per doc: an always-repeated boilerplate line (the
    * banner), a doc-varying line, and a CONDITIONAL repeat of the
    * content line (doc_id % 3 == 0), so both the drop and keep paths
    * fire on every doc and the conditional path splits the corpus.
    * The oracle replants and replays the first-index rule with
    * `list_position`. */
  def lineDedupDocs(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables(spark, dir).documents
    val planted = docs.select(
      col("doc_id"),
      concat_ws("\n",
        col("text"),
        lit("Subscribe to our newsletter today"),
        concat(lit("section "), (col("doc_id") % 7).cast("string")),
        lit("Subscribe to our newsletter today"),
        when(col("doc_id") % 3 === 0, col("text"))
          .otherwise(concat(lit("unique tail "), col("doc_id").cast("string")))
      ).as("text"))
    dedupLinesWithin(planted, "text")
      .select(col("doc_id"), col("n_lines"), col("n_kept"), col("clean_text"))
      .transform(d => Perf.sortedOnce(d, col("doc_id")))
  }

  // ---- mojibake / encoding repair ------------------------------------

  /** UTF-8-read-as-Latin-1 double-encoding artifacts and their
    * repairs — the classic mojibake table (the public ftfy fix;
    * Speer 2019, "ftfy: fixes text for you" — the sequences are pure
    * encoding arithmetic: é = U+00E9 = bytes C3 A9 = "Ã©" when those
    * bytes re-decode as cp1252). Applied IN THIS ORDER — written
    * defensively so no pattern prefixes a later one: every "â€¦"-family
    * artifact is three chars with a distinct tail, and the mangled ”
    * tail is the INVISIBLE control U+009D, kept as an explicit escape
    * so nobody deletes it as trailing junk; "Â«"/"Â»" list before the
    * bare "Â " space artifact. Shared constant: the oracle SQL is
    * GENERATED from the same pairs, so both engines apply the same
    * fold. */
  val mojibakeFixes: Seq[(String, String)] = Seq(
    "â€™" -> "'", "â€œ" -> "“", "â€\u009d" -> "”",
    "â€“" -> "–", "â€”" -> "—", "â€¦" -> "…",
    "Ã©" -> "é", "Ã¨" -> "è", "Ã¤" -> "ä", "Ã¶" -> "ö", "Ã¼" -> "ü",
    "Ã±" -> "ñ", "Ã§" -> "ç", "Ã " -> "à", "Ã®" -> "î", "Ã´" -> "ô",
    "Â«" -> "«", "Â»" -> "»", "Â " -> " ")

  /** Mojibake repair over any (id, text) frame — the encoding-fix
    * stage a web-crawl pipeline runs before tokenization (CCNet runs
    * exactly this class of normalization first; double-encoded pages
    * otherwise shred into garbage shingles that defeat dedup and
    * language-ID both). Emits `n_fixes` — artifact occurrences
    * counted SEQUENTIALLY, each pattern against the text as already
    * repaired by its predecessors, exactly mirroring the applied fold
    * (an earlier repair can in principle fabricate a later pattern;
    * the count and the text can never disagree about what happened) —
    * and `fixed_text`. The count is the fix-density quality signal:
    * pages where it is high relative to length were likely mangled
    * more than once and deserve quarantine.
    *
    * Pure column expressions: one `replace` fold carrying the running
    * count, map-only, zero shuffles, codegen'd — streams at scan
    * speed like the rest of this file. The table is the COMMON cp1252
    * core, not all of ftfy; extending it is adding a pair to
    * [[mojibakeFixes]]. */
  def fixMojibake(df: DataFrame, textCol: String): DataFrame = {
    val (fixed, nFixes) = mojibakeFixes.foldLeft((col(textCol), lit(0L))) {
      case ((acc, n), (bad, good)) =>
        val hits = ((length(acc) - length(replace(acc, lit(bad), lit(""))))
          / bad.length).cast("long")
        (replace(acc, lit(bad), lit(good)), n + hits)
    }
    df.withColumn("n_fixes", nFixes)
      .withColumn("fixed_text", fixed)
  }

  /** `q104_fix_mojibake` — the documents table is clean ASCII, so the
    * entry PLANTS a mangled suffix on even doc_ids (accents, curly
    * quote, dash, guillemets — eight artifacts) and a clean suffix on
    * odd ones, so counts vary across the corpus and the zero-fix path
    * is exercised too. The oracle rebuilds the same suffixes and
    * re-derives counts + repaired text, hash-checking the whole
    * table-driven fold. */
  /** The q104 planted suffixes, shared with the generated oracle:
    * eight artifacts on even ids (é ×2, à-with-space, curly
    * apostrophe, em-dash, ellipsis, both guillemets), clean ASCII on
    * odd ids so the zero-fix path is exercised. */
  val mojibakePlant: String = " visit the cafÃ© â€” itâ€™s dÃ©jÃ  vu Â«againÂ» soonâ€¦"
  val mojibakeCleanTail: String = " plain ascii tail"

  def fixMojibakeDocs(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables(spark, dir).documents
    val planted = docs.select(
      col("doc_id"),
      concat(col("text"),
        when(col("doc_id") % 2 === 0, lit(mojibakePlant))
          .otherwise(lit(mojibakeCleanTail))).as("text"))
    fixMojibake(planted, "text")
      .select(col("doc_id"), col("n_fixes"), col("fixed_text"))
      .transform(d => Perf.sortedOnce(d, col("doc_id")))
  }

  /** `q102_line_filter` — the documents table is single-line word
    * salad, so the entry PLANTS a six-line page per row exercising
    * every rule: a kept content line (the doc's own text, terminated),
    * a javascript/cookie notice, a dangling un-terminated fragment, a
    * copyright footer, an all-caps shout, and a too-short line. The
    * oracle rebuilds the same page and re-derives the verdicts, so
    * every rule is hash-checked, not just exercised. */
  /** C40: per-domain boilerplate LINE removal — the inter-document
    * half of line cleaning (C32's rules judge a line by its own shape;
    * this judges it by REPETITION ACROSS A SITE): navigation menus,
    * headers, cookie banners, and copyright footers repeat on every
    * page of a domain, and CCNet/RefinedWeb-class pipelines strip
    * exactly these before dedup and LM scoring (Penedo et al. 2023
    * §3.3 line-wise corrections; Wenzek et al. 2019 §4.1 per-shard
    * duplicated-paragraph removal).
    *
    * A line is boilerplate iff it appears in ≥ `minDocs` DISTINCT
    * documents of the same domain. Scale shape: one line explode →
    * (domain, line) census (two map-side-partial aggregates) → the
    * per-domain boilerplate SETS — a tiny frame (sites repeat dozens
    * of lines, not millions) — collect per domain as an array and
    * broadcast-join back onto the corpus, where the strip itself is a
    * higher-order `filter` (map-only, order-preserving, no second
    * explode and no per-line shuffle). The corpus shuffles ZERO times;
    * only the line census exchanges.
    *
    * @return input plus (n_lines, n_removed, clean_text) — empty-line
    *         runs are preserved as-is unless themselves boilerplate
    *         (blank lines repeat everywhere, so pass `dropBlank` to
    *         exempt them from the census instead of letting the
    *         threshold strip all paragraph breaks) */
  def boilerplateStrip(df: DataFrame, idCol: String, domainCol: String,
                       textCol: String, minDocs: Int = 3, sep: String = "\n",
                       dropBlank: Boolean = true): DataFrame =
    stripAgainstCensus(df,
      buildLineCensus(df, idCol, domainCol, textCol, sep, dropBlank),
      domainCol, textCol, minDocs, sep)

  /** The (domain, line, n_docs) LINE CENSUS — [[boilerplateStrip]]'s
    * aggregate as a persistable day-2 artifact (the
    * [[graft.operators.Dedup]] census convention at the line tier).
    * Build it once over the crawled corpus, persist it, and strip
    * every later batch with [[stripAgainstCensus]] — zero corpus
    * re-explode. Censuses over DISJOINT document sets merge with
    * [[mergeLineCensus]]. */
  def buildLineCensus(df: DataFrame, idCol: String, domainCol: String,
                      textCol: String, sep: String = "\n",
                      dropBlank: Boolean = true): DataFrame = {
    val lines = split(col(textCol), java.util.regex.Pattern.quote(sep))
    df.select(col(domainCol).as("domain"), col(idCol).as("_rid"),
        explode(lines).as("line"))
      .filter(if (dropBlank) trim(col("line")) =!= "" else lit(true))
      .groupBy(col("domain"), col("line"))
      .agg(countDistinct(col("_rid")).as("n_docs"))
  }

  /** Merge two line censuses over DISJOINT document sets: counts add
    * as exact longs, so merge-equals-rebuild holds bit-for-bit
    * (spec-asserted). Caller contract (the
    * [[graft.operators.Search.appendToPostings]] convention): a
    * document's lines are censused whole in exactly one input — a doc
    * split across both would double-count itself. */
  def mergeLineCensus(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("domain"), col("line"))
      .agg(sum(col("n_docs")).as("n_docs"))

  /** Roll a day-partitioned streamed line census
    * ([[graft.streaming.EventsStream.lineCensusIngestStream]]'s sink)
    * up to the (domain, line, n_docs) probe shape — day deltas cover
    * disjoint documents, so the sum IS [[mergeLineCensus]]. The sep
    * metadata stamped by the stream survives on the `line` column so a
    * mismatched probe can be detected by the caller. */
  def loadLineCensus(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame = {
    val raw = spark.read.parquet(path)
    val meta = raw.schema("line").metadata
    raw.groupBy(col("domain"), col("line"))
      .agg(sum(col("n_docs")).as("n_docs"))
      .select(col("domain"), col("line").as("line", meta), col("n_docs"))
  }

  /** Day-2 boilerplate strip: clean a batch against the PERSISTED
    * census — the per-domain boilerplate sets derive from the census
    * alone (tiny), broadcast onto the batch, and the strip is the same
    * order-preserving higher-order `filter`; the censused corpus is
    * never touched. A batch-only line (absent from the census) is by
    * definition below any threshold and survives. */
  def stripAgainstCensus(batch: DataFrame, census: DataFrame,
                         domainCol: String, textCol: String,
                         minDocs: Int = 3, sep: String = "\n"): DataFrame = {
    require(minDocs >= 2,
      s"minDocs must be >= 2 (1 would strip every line), got $minDocs")
    require(Seq("domain", "line", "n_docs").forall(census.columns.contains),
      "census must carry (domain, line, n_docs) — build it with buildLineCensus")
    val lines = split(col(textCol), java.util.regex.Pattern.quote(sep))
    val bp = census.filter(col("n_docs") >= minDocs)
      .groupBy(col("domain").as("_dom"))
      .agg(sort_array(collect_set(col("line"))).as("_bls"))
    batch.join(broadcast(bp), col(domainCol) === col("_dom"), "left")
      .withColumn("_ls", lines)
      .withColumn("_kept", filter(col("_ls"),
        l => !coalesce(array_contains(col("_bls"), l), lit(false))))
      .withColumn("n_lines", size(col("_ls")).cast("long"))
      .withColumn("n_removed", (size(col("_ls")) - size(col("_kept"))).cast("long"))
      .withColumn("clean_text", array_join(col("_kept"), sep))
      .drop("_dom", "_bls", "_ls", "_kept")
  }

  /** C40 `q115_boilerplate_strip` — the documents corpus dressed as a
    * crawled site: every page of a source gains that site's header,
    * nav, and footer lines (25 pages/source ≫ minDocs → stripped), a
    * 5-pages-per-source promo line (≥ minDocs → stripped), and a
    * sub-threshold "rare notice" line (≤ 1 page per source at sf0.01 —
    * BELOW minDocs → kept, proving the threshold bites both ways); the
    * original word-salad body is unique per page and always survives.
    * The oracle re-plants, re-censuses, and re-strips from raw rows. */
  def boilerplateStripDocs(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    boilerplateStrip(plantedSitePages(graft.Tables(spark, dir).documents),
      "doc_id", "source", "text")
      .select(col("doc_id"), col("source"), col("n_lines"), col("n_removed"),
        col("clean_text"))
      .orderBy(col("doc_id"))

  /** The q115 site dressing — shared with q117 (which censuses the
    * 80% corpus side and probes the 20% batch). */
  private[graft] def plantedSitePages(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"),
      concat_ws("\n",
        concat(lit("SITE HEADER "), col("source")),
        lit("home | about | contact"),
        when(col("doc_id") % 5 === 0,
          concat(lit("subscribe to "), col("source"), lit(" today")))
          .otherwise(col("text")),
        when(col("doc_id") % 5 === 0, col("text")).otherwise(lit("")),
        when(col("doc_id") % 125 === 4,
          concat(lit("rare notice "), col("source"))).otherwise(lit("")),
        concat(lit("(c) 2024 "), col("source"), lit(" all rights reserved"))
      ).as("text"))

  /** C40b `q117_boilerplate_probe` — the day-2 line tier over an 80/20
    * split of the planted site pages. The split keys on the PAGE BLOCK
    * — `(doc_id div 20) % 5 = 1` — NOT on `doc_id % 5`: the synthetic
    * corpus assigns `source = src(doc_id % 20)`, which fixes
    * `doc_id % 5` per source, so a `doc_id % 5` split would put every
    * batch page in a source with ZERO corpus pages and the strip would
    * silently never fire (caught in round 12 — the oracle replayed the
    * same no-op, so only a did-anything-strip inspection exposed it).
    * Under the block split every source keeps 20 corpus pages, so
    * header/nav/footer (and the promo line, for the `doc_id % 5 ≡ 0`
    * sources that carry it) are censused ≥ threshold and genuinely
    * strip from batch pages; the rare-notice line stays sub-threshold
    * (≤ 1 page per source at sf0.01) and survives — the threshold
    * bites both ways. */
  def boilerplateProbeDocs(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val pages = plantedSitePages(graft.Tables(spark, dir).documents)
    val block = floor(col("doc_id") / 20).cast("long") % 5
    val census = buildLineCensus(pages.filter(block =!= 1),
      "doc_id", "source", "text")
    stripAgainstCensus(pages.filter(block === 1), census, "source", "text")
      .select(col("doc_id"), col("source"), col("n_lines"), col("n_removed"),
        col("clean_text"))
      .transform(d => Perf.sortedOnce(d, col("doc_id")))
  }

  def lineFilterDocs(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables(spark, dir).documents
    val planted = docs.select(
      col("doc_id"),
      concat_ws("\n",
        concat(col("text"), lit(".")),
        lit("Please enable JavaScript and cookies to continue viewing."),
        lit("continue reading more about"),
        concat(lit("Copyright 2024 Example Corp id "), col("doc_id").cast("string"), lit(".")),
        lit("BREAKING NEWS ALERT READ THIS NOW!"),
        lit("Click here.")
      ).as("text"))
    lineFilter(planted, "text")
      .select(col("doc_id"), col("n_lines"), col("n_kept"), col("clean_text"))
      .transform(d => Perf.sortedOnce(d, col("doc_id")))
  }
}

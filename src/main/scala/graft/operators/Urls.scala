package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Web-provenance curation: URL canonicalization + canonical-URL dedup
  * and domain-reputation gating — the FIRST stages of every published
  * web-corpus pipeline (C4's URL policies, Raffel et al. 2020,
  * arXiv:1910.10683; RefinedWeb's "URL filtering" stage, Penedo et
  * al. 2023, arXiv:2306.01116 §3.1: curation decisions made from the
  * URL and the site BEFORE any text is read). The reference's closest
  * analog is its per-client report provenance (source columns stamped
  * by every extractor, e.g. `youtube_public.py:123`); at corpus scale
  * provenance becomes the cheapest dedup key and quality prior there
  * is: canonical-URL dedup removes the recrawl copies MinHash would
  * pay shingle costs to find, and a domain verdict prunes whole sites
  * with one tiny join.
  *
  * Scale shapes:
  *  - canonicalization is a pure column expression chain (map-only,
  *    codegen'd, zero shuffles — streams at scan speed);
  *  - URL dedup is ONE hash exchange on the canonical string (a window
  *    min — no second join exchange);
  *  - the domain gate aggregates to a |domains|-sized verdict frame
  *    (map-side partial agg) and joins back broadcast; at 100 TB the
  *    verdict frame is ~|hosts| rows (millions), still broadcastable
  *    at tens of MB, with a shuffle-join fallback flag for when it
  *    is not.
  */
object Urls {

  /** Query-parameter names dropped by canonicalization (click-tracking
    * identifiers that vary per click, never per resource — the public
    * lists shipped by every link-sanitizer). `utm_*` is matched by
    * prefix. Shared constants: the oracle SQL interpolates the SAME
    * names, one source of truth for both engines. */
  val trackingParams: Seq[String] = Seq("fbclid", "gclid", "msclkid", "yclid", "mc_eid")

  /** Canonicalize one URL column. Rules (all scheme-preserving — an
    * http and an https fetch of the same path are different resources
    * until a crawler proves otherwise):
    *
    *  1. drop the fragment (`#...` — client-side only, never sent);
    *  2. drop any userinfo (`user:pass@` — never part of the resource
    *     identity, and a classic gate-evasion dressing), then
    *     lowercase the scheme and the authority (RFC 3986 §6.2.2.1 —
    *     host is case-insensitive; the PATH keeps its case, which is
    *     significant on most origins);
    *  3. strip the scheme's default port (`:80` http, `:443` https);
    *  4. strip ALL leading `www.` labels (one strip is not
    *     idempotent on `www.www.host` — property-tested);
    *  5. strip trailing `/` runs from the path (so `/a/` = `/a` and a
    *     bare-host `/` = empty path);
    *  6. drop tracking query params ([[trackingParams]] + the `utm_`
    *     prefix family) and empty params, KEEPING the survivors in
    *     their original order (reordering would conflate genuinely
    *     different server-side semantics on some origins);
    *  7. drop the `?` entirely when no param survives.
    *
    * Pure column expressions end to end — no UDF, no parse_url
    * (DuckDB, the oracle engine, has none; the shared regex pieces
    * keep both engines byte-identical). */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val base   = regexp_replace(noFrag, "\\?.*$", "")
    val query  = regexp_extract(noFrag, "\\?(.*)$", 1)
    val scheme = lower(regexp_extract(base, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rest0  = regexp_replace(base, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val rest   = regexp_replace(rest0, "^[^/]*@", "")
    val auth   = lower(regexp_extract(rest, "^([^/]*)", 1))
    val path   = regexp_replace(rest, "^[^/]*", "")
    val noPort = when(scheme === "https", regexp_replace(auth, ":443$", ""))
      .when(scheme === "http", regexp_replace(auth, ":80$", ""))
      .otherwise(auth)
    val host      = regexp_replace(noPort, "^(www\\.)+", "")
    val cleanPath = regexp_replace(path, "/+$", "")
    val kept = filter(split(query, "&"), p => {
      val name = lower(regexp_extract(p, "^([^=]*)", 1))
      p =!= "" && substring(name, 1, 4) =!= "utm_" && !name.isin(trackingParams: _*)
    })
    val keptQuery = array_join(kept, "&")
    concat(scheme, lit("://"), host, cleanPath,
      when(keptQuery === "", lit("")).otherwise(concat(lit("?"), keptQuery)))
  }

  /** Canonical-URL dedup over any (id, url) frame: rows whose URLs
    * canonicalize identically are one resource; the smallest id is
    * elected keeper (the q20 exact-dedup election rule). ONE exchange
    * total — the keeper comes from a window min over the canonical
    * string, not a groupBy + join (which would shuffle twice).
    *
    * @return one verdict row per input row: (id, canon_url, is_dup,
    *         dup_of = keeper id, -1 sentinel on keepers — the q98
    *         sentinel convention) */
  def urlDedup(df: DataFrame, idCol: String, urlCol: String): DataFrame = {
    val canon = df.withColumn("canon_url", canonicalizeUrl(col(urlCol)))
    val keep  = min(col(idCol)).over(Window.partitionBy(col("canon_url")))
    canon.withColumn("_keep", keep)
      .select(col(idCol), col("canon_url"),
        (col(idCol) =!= col("_keep")).as("is_dup"),
        when(col(idCol) =!= col("_keep"), col("_keep")).otherwise(lit(-1L)).as("dup_of"))
  }

  /** `q105_url_dedup` — the documents table carries no URL, so the
    * entry PLANTS one per row from (source, doc_id): article number
    * doc_id % 100 on host `{source}.example.com`, dressed in one of
    * six deterministic messy variants by doc_id % 6 (upper-cased
    * scheme/host + www, clean, `www.` + `:443` + trailing slash,
    * fragment, a kept `page=2` param behind fbclid/utm noise, and a
    * dropped-query trailing-slash form). Because source = doc_id % 20
    * and 100 ≡ 0 (mod 20), the five docs sharing an article number
    * share a host — and their variants canonicalize together EXCEPT
    * the `page=2` form, which (correctly) remains its own resource;
    * group sizes 5 vs 3+2 depending on variant phase, so the oracle
    * hash-checks both the collapsing and the non-collapsing paths.
    * The http `:80` rule (unreachable here — mixing schemes would
    * split every group) is spec-covered in UrlsSpec instead. */
  def urlDedupDocs(spark: SparkSession, dir: String): DataFrame =
    urlDedup(plantedUrls(graft.Tables(spark, dir).documents), "doc_id", "url")
      .orderBy(col("doc_id"))

  /** The q105 planted messy-URL frame — (doc_id, url), six
    * deterministic variants keyed off doc_id (shared with q110, which
    * splits on the canonical groups these collapse to; the oracle
    * SQL replants the identical variants). */
  private[operators] def plantedUrls(docs: DataFrame): DataFrame = {
    val art = (col("doc_id") % 100).cast("string")
    docs.select(
      col("doc_id"),
      when(col("doc_id") % 6 === 0,
        concat(lit("HTTPS://WWW."), col("source"), lit(".Example.COM/articles/"), art))
      .when(col("doc_id") % 6 === 1,
        concat(lit("https://"), col("source"), lit(".example.com/articles/"), art))
      .when(col("doc_id") % 6 === 2,
        concat(lit("https://www."), col("source"), lit(".example.com:443/articles/"), art, lit("/")))
      .when(col("doc_id") % 6 === 3,
        concat(lit("https://"), col("source"), lit(".example.com/articles/"), art, lit("#sec-2")))
      .when(col("doc_id") % 6 === 4,
        concat(lit("https://"), col("source"), lit(".example.com/articles/"), art,
          lit("?page=2&fbclid=IwAB12&utm_source=t.co")))
      .otherwise(
        concat(lit("HTTPS://"), col("source"), lit(".EXAMPLE.com/articles/"), art,
          lit("/?utm_medium=social")))
        .as("url"))
  }

  /** Canonical HOST of a URL column: authority lowercased, ANY port
    * stripped (blocklists judge hosts, not ports — unlike
    * [[canonicalizeUrl]], which keeps non-default ports because they
    * address distinct resources), one leading `www.` label stripped.
    * Pure column expressions. */
  def hostOf(url: Column): Column = {
    val rest0 = regexp_replace(regexp_replace(url, "#.*$", ""),
      "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    // userinfo never identifies the host — and 'user@bad.com' dressing
    // must not slip a blocked site past the gate
    val rest = regexp_replace(rest0, "^[^/?]*@", "")
    val auth = lower(regexp_extract(rest, "^([^/?]*)", 1))
    regexp_replace(regexp_replace(auth, ":[0-9]+$", ""), "^(www\\.)+", "")
  }

  /** The q113 entry's blocklist — shared constants: the oracle SQL
    * interpolates the SAME suffixes, one source of truth. */
  val docBlocklist: Seq[String] =
    Seq("src3.example.com", "src7.example.com", "src12.example.com", "spam.example.org")

  /** C36b: domain-suffix blocklist gate — the URL-filtering stage every
    * published web pipeline runs FIRST (C4's blocklist, RefinedWeb
    * §3.1: a curated list of adult/malware/spam domains prunes pages
    * before any byte of text is fetched or scored). Suffix semantics:
    * an entry blocks the host itself AND every subdomain
    * (`example.com` blocks `a.b.example.com`), the convention the
    * public lists assume.
    *
    * Scale shape — real blocklists run to millions of entries, so the
    * list is a TABLE, not a plan literal: each host expands to its
    * ≤ |labels| boundary suffixes (a bounded map-only transform, no
    * corpus blowup), suffixes join the list (broadcast by default;
    * `broadcastList = false` falls back to a shuffle join for lists
    * past broadcast reach), and the distinct blocked ids — a frame no
    * larger than the corpus and typically far smaller — join back on
    * the id. The corpus is scanned once.
    *
    * @param blocklist one `pattern` column of lowercase domain suffixes
    * @return (id, host, blocked) — one verdict row per input row */
  def blocklistGate(df: DataFrame, idCol: String, urlCol: String,
                    blocklist: DataFrame, broadcastList: Boolean = true): DataFrame = {
    require(blocklist.columns.contains("pattern"),
      "blocklist must carry a 'pattern' column of domain suffixes")
    val withHost = df
      .withColumn("host", hostOf(col(urlCol)))
      .withColumn("_labels", split(col("host"), "\\."))
      .withColumn("_sufs", transform(
        sequence(lit(0), size(col("_labels")) - 1),
        i => array_join(slice(col("_labels"), i + 1, size(col("_labels")) - i), ".")))
    val list = blocklist.select(col("pattern").as("_suf"))
    val right = if (broadcastList) broadcast(list) else list
    val blocked = withHost
      .select(col(idCol), explode(col("_sufs")).as("_suf"))
      .join(right, Seq("_suf"))
      .select(col(idCol)).distinct()
      .withColumn("_hit", lit(true))
    withHost.join(blocked, Seq(idCol), "left")
      .select(col(idCol), col("host"),
        coalesce(col("_hit"), lit(false)).as("blocked"))
  }

  /** `q113_blocklist_gate` — the planted recrawl URLs (hosts
    * `src{N}.example.com` in six messy dressings) gated by
    * [[docBlocklist]]: three exact-host entries plus one suffix that
    * matches nothing (the clean path is real, not vacuous). The
    * oracle re-derives host extraction, the boundary-suffix
    * expansion, and the list join from the same shared constants.
    * Subdomain-suffix blocking (deeper hosts) is spec-covered in
    * UrlsSpec, where hosts with 4+ labels exist. */
  def blocklistGateDocs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val urls = plantedUrls(graft.Tables(spark, dir).documents)
    blocklistGate(urls, "doc_id", "url", docBlocklist.toDF("pattern"))
      .transform(d => Perf.sortedOnce(d, col("doc_id")))
  }

  /** Persistable canonical-URL index — (canon_url, keep_id, n_copies),
    * the [[urlDedup]] election as a day-2 artifact (the
    * [[Dedup.buildExactIndex]] convention at the URL tier). Write once,
    * probe every crawl batch with [[urlDedupAgainstIndex]]; appends
    * over disjoint crawls merge associatively per column — `keep_id`
    * by min, `n_copies` by SUM (a min over the copies column would
    * silently corrupt the counts). */
  def buildUrlIndex(df: DataFrame, idCol: String, urlCol: String): DataFrame =
    df.select(col(idCol).as("keep_id"), canonicalizeUrl(col(urlCol)).as("canon_url"))
      .groupBy(col("canon_url"))
      .agg(min(col("keep_id")).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Day-2 canonical-URL dedup: verdict a crawl batch against the
    * PERSISTED index with zero corpus work — canonicalize the batch
    * (map-only), one join against the one-row-per-resource index. A
    * batch row whose canonical URL maps to ITS OWN id is the same page
    * re-sent (a replayed fetch), not a duplicate — excluding
    * self-matches keeps replays idempotent (the
    * [[Dedup.dedupExactAgainstIndex]] rule).
    *
    * @return (id, canon_url, is_dup, dup_of — the index's keeper, -1
    *         sentinel when the resource is new) */
  def urlDedupAgainstIndex(batch: DataFrame, index: DataFrame,
                           idCol: String, urlCol: String): DataFrame = {
    require(index.columns.contains("canon_url") && index.columns.contains("keep_id"),
      "index must carry (canon_url, keep_id) — build it with buildUrlIndex")
    val hit = col("keep_id").isNotNull && col("keep_id") =!= col(idCol)
    // materialized once: the canonical projection feeds BOTH the
    // batch-key prune (r18 verdict item 1 — index rows whose canon_url
    // no batch row carries can never match the left join) and the join
    val canon = batch.select(col(idCol), canonicalizeUrl(col(urlCol)).as("canon_url"))
      .localCheckpoint()
    val idx = Perf.prunedByKeys(
      index.select(col("canon_url"), col("keep_id")), "canon_url", canon)
    canon.join(idx, Seq("canon_url"), "left")
      .select(col(idCol), col("canon_url"), hit.as("is_dup"),
        when(hit, col("keep_id")).otherwise(lit(-1L)).as("dup_of"))
  }

  /** `q111_url_probe` — the day-2 URL tier over the standard 80/20
    * split of the q105 planted recrawl URLs: the corpus's canonical
    * index is the persisted artifact, the held-out batch probes it,
    * and because article groups span the split, batch pages genuinely
    * hit corpus keepers while fresh resources exercise the -1 path.
    * The oracle re-derives canonicalization, the index election, and
    * the probe verdicts from raw rows. */
  /** C35b `q111_url_probe` — the day-2 URL tier. The split keys on the
    * RECRAWL COPY — `(doc_id div 100) % 5` — NOT on `doc_id % 5`: a
    * canonical group's members share `doc_id % 100` (and the synthetic
    * source is `doc_id % 20`), so any `doc_id mod k | 100`-derived
    * split keeps whole groups on one side and the probe would silently
    * never hit a corpus keeper (caught in round 12). Under the copy
    * split each group sends exactly one member per five to the batch,
    * so batch recrawls genuinely hit corpus keepers; batch docs with
    * `doc_id ≡ 0 mod 3` swap in a NEVER-SEEN resource URL instead
    * (already-canonical by construction, the oracle overrides the same
    * canon), exercising the fresh path alongside. */
  def urlProbeDocs(spark: SparkSession, dir: String): DataFrame = {
    val urls = plantedUrls(graft.Tables(spark, dir).documents)
    val copy = floor(col("doc_id") / 100).cast("long") % 5
    val batch = urls.filter(copy === 4)
      .withColumn("url",
        when(col("doc_id") % 3 === 0,
          concat(lit("https://fresh.example.com/items/"), col("doc_id").cast("string")))
          .otherwise(col("url")))
    val index = buildUrlIndex(urls.filter(copy =!= 4), "doc_id", "url")
    urlDedupAgainstIndex(batch, index, "doc_id", "url")
      .transform(d => Perf.sortedOnce(d, col("doc_id")))
  }

  /** Domain-reputation gate: aggregate per-document signals to a
    * per-domain verdict, then gate every document by its domain's
    * verdict — RefinedWeb's site-level curation move (a domain whose
    * pages are mostly junk is junk; one tiny join prunes all of it,
    * no per-page scoring needed). All three rules compare EXACT
    * integers (sums and counts scaled by the thresholds), so no
    * verdict sits on a float boundary:
    *
    *  - `domain_docs >= minDocs` — too few pages to judge ⇒ fail
    *    closed (curation, not safety: unknown sites wait);
    *  - `domain_words >= minMeanWords · domain_docs` — mean page
    *    length floor, the Gopher/C4 short-page rule lifted to sites;
    *  - `100 · domain_short <= maxShortPct · domain_docs` — a site
    *    can't be mostly stubs even if its mean clears the floor.
    *
    * Scale shape: one map-side-partial aggregate to |domains| rows,
    * verdicts join back broadcast (`broadcastVerdict = false` falls
    * back to a shuffle join for host cardinalities past broadcast
    * reach). The corpus is scanned once and never re-shuffled. */
  def domainReputation(docs: DataFrame, idCol: String, domainCol: String,
                       textCol: String, minDocs: Int = 5, minMeanWords: Int = 54,
                       maxShortPct: Int = 40, shortWords: Int = 40,
                       broadcastVerdict: Boolean = true): DataFrame = {
    require(minDocs >= 1, s"minDocs must be >= 1, got $minDocs")
    require(maxShortPct >= 0 && maxShortPct <= 100,
      s"maxShortPct must lie in [0,100], got $maxShortPct")
    // empty/whitespace-only pages weigh ZERO words (split of "" yields
    // [""], size 1 — the guard keeps the three word-count operators
    // q106/q114/q116 in agreement)
    val words = when(trim(col(textCol)) === "", lit(0L))
      .otherwise(size(split(trim(col(textCol)), "\\s+")).cast("long"))
    val perDoc = docs.select(col(idCol), col(domainCol).as("domain"), words.as("n_words"))
    val stats = perDoc.groupBy(col("domain")).agg(
      count(lit(1)).as("domain_docs"),
      sum(col("n_words")).as("domain_words"),
      sum(when(col("n_words") < shortWords, 1L).otherwise(0L)).as("domain_short"))
    val verdict = stats.withColumn("domain_ok",
      col("domain_docs") >= minDocs &&
        col("domain_words") >= lit(minMeanWords.toLong) * col("domain_docs") &&
        col("domain_short") * 100 <= lit(maxShortPct.toLong) * col("domain_docs"))
    val right = if (broadcastVerdict) broadcast(verdict) else verdict
    perDoc.join(right, Seq("domain"))
      .select(col(idCol), col("domain"), col("n_words"), col("domain_docs"),
        col("domain_words"), col("domain_short"), col("domain_ok"))
  }

  /** `q106_domain_gate` — `source` is the documents table's domain
    * analog (20 sites, 25 pages each). The default thresholds land
    * INSIDE the corpus's per-source spread (mean words 45–62, short
    * fraction 12–52%), so both verdicts occur and the boundary cases
    * (a site at exactly the short-percent cap, a site one word over
    * the mean floor) are decided by exact integer comparisons the
    * oracle reproduces digit for digit. */
  def domainGateDocs(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables(spark, dir).documents
    domainReputation(docs, "doc_id", "source", "text").orderBy(col("doc_id"))
  }
}

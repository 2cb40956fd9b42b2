package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BM25 keyword retrieval over a persistable postings index — the
  * corpus-exploration primitive (audit queries, eval-set sourcing,
  * targeted quality review) that C21's TF-IDF term profiles don't
  * give: TF-IDF summarizes a document, BM25 RANKS documents for a
  * query. Okapi BM25 with the Lucene-style non-negative IDF
  * (Robertson & Zaragoza 2009, "The Probabilistic Relevance
  * Framework" — public literature).
  *
  * The index is two plain tables, built in ONE corpus pass:
  * postings (term, doc_id, tf, dl) and stats (N, avgdl — one row).
  * df(t) needs no third table: postings hold one row per (term, doc),
  * so document frequency is a count over the query's own probe slice.
  * At 100 TB the postings table is the persisted artifact (partition
  * by term hash range); a query broadcasts its handful of terms,
  * semi-joins the postings — touching only those terms' rows, never
  * the corpus — and aggregates ≤ |matching docs| rows. Query cost
  * scales with posting-list length, not corpus size.
  *
  * Scoring is engine-portable by the q33/q63 scaled-long convention:
  * each per-term contribution is plain IEEE arithmetic on identical
  * inputs (bit-identical across engines), quantizes to a 1e-8 grid,
  * and SUMS AS EXACT LONGS — a double sum is merge-order-dependent
  * and Spark's vs DuckDB's orders can round a grid-tie apart. The
  * trailing 1e-9 nudge keeps grid-exact totals off the half-up
  * boundary before the 4-dp round.
  */
object Search {

  /** Tokens of `textCol` under the corpus convention (lower, trim,
    * whitespace split) — the [[Dedup.wordShingles]] base projection. */
  private def toks(textCol: Column): Column = split(lower(trim(textCol)), "\\s+")

  /** One-pass index build. Returns (postings, stats):
    * postings = (term, doc_id, tf, dl) — one row per distinct term per
    * doc; stats = (n_docs, dl_sum) — one row. Stats carry the dl SUM,
    * not the average: longs merge EXACTLY under [[appendToPostings]]
    * (avgdl reconstructed from a merged average would differ from the
    * from-scratch value in the last ulp — (sum/n)·n ≠ sum in IEEE —
    * and the append-equals-rebuild contract is bit-exact). Persist
    * both (postings partitioned/bucketed by term at scale); every
    * later query is a probe. */
  def buildPostings(docs: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text"): (DataFrame, DataFrame) = {
    val tokened = docs
      .select(col(idCol).cast("long").as("doc_id"), toks(col(textCol)).as("_toks"))
      .select(col("doc_id"), size(col("_toks")).as("dl"), explode(col("_toks")).as("term"))
    val postings = tokened
      .groupBy(col("term"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("tf"))
      .select(col("term"), col("doc_id"), col("tf"), col("dl"))
    val stats = tokened.select(col("doc_id"), col("dl")).distinct()
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("dl_sum"))
    (postings, stats)
  }

  /** Day-2 index growth: index ONLY the new documents and extend the
    * persisted artifacts — postings append by pure union (a posting
    * row belongs to one doc, so no merge), stats add as exact longs.
    * The result is IDENTICAL to rebuilding from the full corpus
    * (spec-asserted and the q91 oracle contract), at the cost of one
    * pass over the new docs — never the indexed corpus.
    *
    * Caller contract (the [[Similarity.appendToIvfIndex]] convention):
    * new doc ids are disjoint from the indexed ones — id ownership
    * belongs to the table owner, and a re-sent doc would double its
    * postings the same way it would double any append-only table. */
  def appendToPostings(newDocs: DataFrame, postings: DataFrame, stats: DataFrame,
                       idCol: String = "doc_id", textCol: String = "text")
      : (DataFrame, DataFrame) = {
    val (np, ns) = buildPostings(newDocs, idCol, textCol)
    val mergedStats = stats
      .crossJoin(broadcast(ns.select(col("n_docs").as("_n2"), col("dl_sum").as("_s2"))))
      .select((col("n_docs") + col("_n2")).as("n_docs"),
        (col("dl_sum") + col("_s2")).as("dl_sum"))
    (postings.unionByName(np), mergedStats)
  }

  /** Top-k documents for `query` terms from the persisted index.
    * Terms are matched under the index's own tokenization (lowercased
    * exact terms); duplicate query terms count once (bag-of-terms
    * query with set semantics — the standard BM25 query shape).
    * Output: (rank, doc_id, score) — score 4-dp rounded, ties broken
    * by doc_id. */
  def bm25Search(postings: DataFrame, stats: DataFrame, query: Seq[String],
                 k: Int = 20, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val terms = query.map(_.trim.toLowerCase).filter(_.nonEmpty).distinct
    // validate AFTER normalization (the phraseSearch convention): a
    // whitespace-only query would otherwise pass the guard and return
    // a silently empty result via a zero-argument isin
    require(terms.nonEmpty,
      "bm25Search needs at least one non-blank query term")
    // probe slice: ONLY the query terms' posting rows participate —
    // the isin literal pushes into the scan, so a term-partitioned
    // index reads just those partitions
    val probe = postings.filter(col("term").isin(terms.map(t => t: Any): _*))
    val df = probe.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val contrib = probe
      .join(broadcast(df), Seq("term"))
      .crossJoin(broadcast(stats
        .withColumn("avgdl", col("dl_sum").cast("double") / col("n_docs"))))
      // Lucene-style IDF: ln(1 + (N - df + 0.5)/(df + 0.5)) — always
      // positive, so a term in most docs dilutes instead of flipping
      // the ranking sign
      .withColumn("_idf", log(lit(1.0) +
        (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("_c", col("_idf") * (col("tf") * (lit(k1) + 1.0)) /
        (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))))
      // quantize-then-long-sum (the q33/q63 convention): per-term
      // contributions are bit-identical IEEE on both engines; the sum
      // must be order-free
      .withColumn("_cs", round(col("_c") * 100000000.0).cast("long"))
    val scored = contrib.groupBy(col("doc_id"))
      .agg(sum(col("_cs")).as("_ss"))
      .withColumn("score",
        round(col("_ss").cast("double") / 100000000.0 + lit(1e-9), 4))
    // top-k via sort+limit (TakeOrdered — a distributed per-partition
    // top-k then a k-row merge), NOT a global rank window: a common
    // term matches a corpus-sized doc set, and an unpartitioned window
    // would serialize all of it onto one task. Ranks attach after the
    // limit, over exactly k rows.
    val w = Window.orderBy(col("score").desc, col("doc_id").asc)
    scored.orderBy(col("score").desc, col("doc_id").asc).limit(k)
      .withColumn("rank", row_number().over(w).cast("long"))
      .select(col("rank"), col("doc_id"), col("score"))
      .transform(d => Perf.sortedOnce(d, col("rank")))
  }

  /** C30 `q90_bm25_search` — top-20 documents for a three-term query
    * over the documents corpus, answered from the one-pass postings
    * index. Oracle: DuckDB rebuilds postings, stats, IDF and the
    * scaled-long score from raw rows — the whole retrieval pipeline
    * hash-checked. */
  def bm25SearchDocs(spark: SparkSession, dir: String): DataFrame = {
    val (postings, stats) = buildPostings(Tables(spark, dir).documents)
    bm25Search(postings, stats, Seq("spark", "window", "batch"), k = 20)
  }

  /** Positional postings: (term, doc_id, positions) with positions the
    * sorted 1-based token offsets of `term` in the doc — the phrase-
    * query artifact. One corpus pass, same tokenization as
    * [[buildPostings]]; ~|postings| rows with an int array instead of
    * a tf, so the layout advice is identical (partition/bucket by
    * term). */
  def buildPositionalPostings(docs: DataFrame, idCol: String = "doc_id",
                              textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol).cast("long").as("doc_id"), toks(col(textCol)).as("_toks"))
      .select(col("doc_id"), posexplode(col("_toks")).as(Seq("_p0", "term")))
      .groupBy(col("term"), col("doc_id"))
      .agg(sort_array(collect_list(col("_p0") + 1)).as("positions"))

  /** Day-2 growth for the phrase-search artifact — the
    * [[appendToPostings]] convention on the positional table: index
    * ONLY the new documents and extend by pure union. A positional row
    * belongs to one (term, doc) and its positions array is a function
    * of that doc alone, so there is nothing to merge and NO stats row
    * to heal — append-equals-rebuild is bit-exact by construction
    * (spec-asserted, and q135's oracle hash-checks the searched
    * result). Same caller contract: new doc ids are disjoint from the
    * indexed ones. */
  def appendToPositionalPostings(newDocs: DataFrame, positional: DataFrame,
                                 idCol: String = "doc_id",
                                 textCol: String = "text"): DataFrame =
    positional.unionByName(buildPositionalPostings(newDocs, idCol, textCol))

  /** Exact phrase search: documents containing `phrase`'s terms at
    * CONSECUTIVE positions, ranked by occurrence count. An anchor
    * position p matches iff term i of the phrase sits at p+i for every
    * i — the anchor term's positions explode to candidate anchors and
    * each later term verifies by `array_contains` on its own posting
    * row, so the whole query touches only the phrase terms' postings
    * and joins them per doc (equi on doc_id, posting-list-sized
    * sides). Counts are integers end to end — no float portability
    * machinery needed. Output: (rank, doc_id, n_occ), top-k via
    * distributed TakeOrdered, ties → doc_id. */
  def phraseSearch(positional: DataFrame, phrase: Seq[String],
                   k: Int = 20): DataFrame = {
    val terms = phrase.map(_.trim.toLowerCase).filter(_.nonEmpty)
    require(terms.nonEmpty, "phraseSearch needs at least one term")
    require(k > 0, s"k must be positive, got $k")
    def of(t: String) = positional.filter(col("term") === t)
    val anchors = of(terms.head)
      .select(col("doc_id"), explode(col("positions")).as("p"))
    val matched = terms.tail.zipWithIndex.foldLeft(anchors) {
      case (acc, (t, i)) =>
        acc.join(of(t).select(col("doc_id"), col("positions").as(s"_ps$i")), Seq("doc_id"))
          .filter(array_contains(col(s"_ps$i"), col("p") + (i + 1)))
          .drop(s"_ps$i")
    }
    val scored = matched.groupBy(col("doc_id")).agg(count(lit(1)).as("n_occ"))
    val w = Window.orderBy(col("n_occ").desc, col("doc_id").asc)
    scored.orderBy(col("n_occ").desc, col("doc_id").asc).limit(k)
      .withColumn("rank", row_number().over(w).cast("long"))
      .select(col("rank"), col("doc_id"), col("n_occ"))
      .transform(d => Perf.sortedOnce(d, col("rank")))
  }

  /** C30c `q92_phrase_search` — docs containing the exact phrase
    * "table hash", ranked by occurrence count from the positional
    * postings artifact. Integer-exact, oracle-backed end to end. */
  def phraseSearchDocs(spark: SparkSession, dir: String): DataFrame =
    phraseSearch(buildPositionalPostings(Tables(spark, dir).documents),
      Seq("table", "hash"), k = 20)

  /** C30c `q135_phrase_incremental` — the day-2 path for the phrase
    * index (the q91 convention, positional tier): 80% of the corpus is
    * the indexed artifact, the remaining 20% arrives through
    * [[appendToPositionalPostings]], and the search answers from the
    * extended index. The oracle is q92's FULL-corpus reformulation
    * verbatim — append-equals-rebuild is the contract, bit-exact
    * because a positional row is a pure function of its own doc. */
  def phraseIncrementalDocs(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    val indexed = buildPositionalPostings(docs.filter(col("doc_id") % 5 =!= 0))
    val extended = appendToPositionalPostings(
      docs.filter(col("doc_id") % 5 === 0), indexed)
    phraseSearch(extended, Seq("table", "hash"), k = 20)
  }

  /** C30b `q91_bm25_incremental` — the day-2 path: 80% of the corpus
    * is the indexed artifact, the remaining 20% arrives as new docs
    * through [[appendToPostings]], and the search answers from the
    * extended index. The oracle is the FULL-corpus reformulation —
    * append-equals-rebuild is the contract, bit-exact because stats
    * merge as longs. */
  def bm25IncrementalDocs(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    val (p1, s1) = buildPostings(docs.filter(col("doc_id") % 5 =!= 0))
    val (pm, sm) = appendToPostings(
      docs.filter(col("doc_id") % 5 === 0), p1, s1)
    bm25Search(pm, sm, Seq("query", "filter", "join"), k = 20)
  }

  /** C30d: hybrid retrieval — BM25 keyword ranking fused with dense
    * embedding ranking by reciprocal-rank fusion (Cormack, Clarke &
    * Büttcher 2009, "Reciprocal rank fusion outperforms Condorcet and
    * individual rank learning methods" — the standard hybrid-search
    * combiner; every production RAG/eval-sourcing stack runs exactly
    * this shape). Each leg retrieves its own top-`legK`; a candidate's
    * fused score is Σ_legs 1/(rrfK + rank), missing legs contributing
    * zero.
    *
    * Portability: RRF scores are computed as `floor(1e12/(rrfK+rank))`
    * longs — ONE correctly-rounded IEEE division per leg on exact
    * integer inputs, bit-identical across engines, then exact long
    * addition — so the fused ordering needs no float-comparison
    * machinery at all. Ranks inside each leg are already
    * engine-reproducible (4-dp-rounded scores, doc_id tiebreak).
    *
    * Scale shape: both legs are index probes (postings slice for
    * BM25; one broadcast query vector over the embedding scan for the
    * dense leg) ending in distributed TakeOrdered top-`legK`; the
    * fusion join touches ≤ 2·legK rows — driver-free and
    * corpus-size-independent. At 100 TB both indexes are the persisted
    * artifacts ([[buildPostings]] / [[TextEmbed.embedDocuments]] into
    * a bucketed IVF); this entry builds them inline because the oracle
    * re-derives from raw rows.
    *
    * @return top-`k` fused: (rank, doc_id, rrf_score, bm25_rank,
    *         dense_rank) — leg ranks carry the -1 sentinel (the q98
    *         convention) when the doc missed that leg's top-`legK` */
  def hybridRrfSearch(docs: DataFrame, query: Seq[String], k: Int = 20,
                      legK: Int = 30, rrfK: Int = 60,
                      dims: Int = TextEmbed.DefaultDims): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(legK >= k, s"legK ($legK) must be >= k ($k) — fused top-k draws from the leg pools")
    require(rrfK > 0, s"rrfK must be positive, got $rrfK")
    val spark = docs.sparkSession
    import graft.functions.vectors

    val sparse = {
      val (p, s) = buildPostings(docs)
      bm25Search(p, s, query, legK)
    }.select(col("doc_id"), col("rank").as("bm25_rank"))

    import spark.implicits._
    val qdf = Seq((0L, query.mkString(" "))).toDF("doc_id", "text")
    val qv = broadcast(TextEmbed.embedDocuments(qdf, dims)
      .select(col("embedding").as("qv"))
      .withColumn("qn", vectors.norm(col("qv"))))
    val wd = Window.orderBy(col("cos").desc, col("doc_id").asc)
    val dense = TextEmbed.embedDocuments(docs, dims)
      .select(col("vec_id").as("doc_id"), col("embedding").as("v"))
      .withColumn("nrm", vectors.norm(col("v")))
      .crossJoin(qv)
      .withColumn("cos", round(
        vectors.dot(col("v"), col("qv")) / (col("nrm") * col("qn")), 4))
      .orderBy(col("cos").desc, col("doc_id").asc).limit(legK)
      .withColumn("dense_rank", row_number().over(wd).cast("long"))
      .select(col("doc_id"), col("dense_rank"))

    def leg(rank: org.apache.spark.sql.Column) =
      coalesce(floor(lit(1.0e12) / (lit(rrfK) + rank)).cast("long"), lit(0L))
    val fused = sparse.join(dense, Seq("doc_id"), "full_outer")
      .withColumn("rrf_score", leg(col("bm25_rank")) + leg(col("dense_rank")))
      .withColumn("bm25_rank", coalesce(col("bm25_rank"), lit(-1L)))
      .withColumn("dense_rank", coalesce(col("dense_rank"), lit(-1L)))
    val w = Window.orderBy(col("rrf_score").desc, col("doc_id").asc)
    fused.orderBy(col("rrf_score").desc, col("doc_id").asc).limit(k)
      .withColumn("rank", row_number().over(w).cast("long"))
      .select(col("rank"), col("doc_id"), col("rrf_score"),
        col("bm25_rank"), col("dense_rank"))
      .transform(d => Perf.sortedOnce(d, col("rank")))
  }

  /** C30d `q109_hybrid_rrf` — fused top-20 for the q90 query over the
    * documents corpus: the BM25 leg is exactly q90's ranking (top-30
    * pool), the dense leg ranks by cosine against the
    * [[TextEmbed.embedDocuments]] projection of the SAME query string,
    * and both legs plus the fusion re-derive from raw rows in the
    * oracle — the whole hybrid pipeline hash-checked. */
  def hybridSearchDocs(spark: SparkSession, dir: String): DataFrame =
    hybridRrfSearch(Tables(spark, dir).documents,
      Seq("spark", "window", "batch"), k = 20, legK = 30)
}

package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication family: keep-latest (A8), exact (C1), MinHash+LSH (C2),
  * SimHash (C3), n-gram Jaccard (C4).
  *
  * Scale invariants (SURVEY §5): candidate generation is ALWAYS bucketed
  * (band-hash / bit-band / shared-rare-gram equi-joins) — never an
  * all-pairs cross join; giant buckets are capped (skew guard); the
  * near-dup queries emit one row per document (doc_id, rep_id, is_dup) so
  * the output is a dedup verdict, not an unbounded pair list.
  */
object Dedup {

  /** Free a superseded checkpoint's blocks (the LogicalRDD leaf holds
    * the materialized RDD; once every consumer reads a NEWER
    * materialization, dropping the old blocks is safe). Shared by the
    * iterative cluster loops here and the ANN index builders. */
  private[graft] def freeBlocks(df: DataFrame): Unit =
    df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
    }

  /** A8 `q08_dedup_latest` — keep the latest record per key
    * (Alodesk_API.py:30 `dedup_leads`: sort by ts, keep last). One window
    * exchange on the key; deterministic tiebreak on event_id (pandas
    * keep="last" is order-dependent; we make it explicit). */
  def dedupLatest(spark: SparkSession, dir: String): DataFrame =
    dedupLatestBy(Tables(spark, dir).events,
      keys = Seq("user_id", "event_type"), tsCol = "ts", tieBreak = Seq("event_id"))
      .select(col("user_id"), col("event_type"), col("event_id"), col("ts"),
        round(col("value"), 4).as("value"))
      .orderBy(col("user_id"), col("event_type"))

  /** Generic keep-latest-per-key over any frame (the library API a
    * `dedup_leads` caller would use): one window exchange on `keys`,
    * latest `tsCol` wins, `tieBreak` columns (descending) make the
    * choice deterministic where pandas keep="last" is order-dependent. */
  def dedupLatestBy(df: DataFrame, keys: Seq[String], tsCol: String,
                    tieBreak: Seq[String] = Nil): DataFrame = {
    val order = col(tsCol).desc +: tieBreak.map(col(_).desc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  /** C1 `q20_dedup_exact` — exact dedup by content hash: one hash-groupBy
    * shuffle, keep min doc_id per fingerprint. At 100 TB this is the
    * canonical first dedup pass: the shuffle key is the 128-bit hash, so
    * data distributes uniformly regardless of content skew. */
  def dedupExact(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.documents
      .select(col("doc_id"), md5(col("text")).as("fingerprint"))
      .groupBy(col("fingerprint"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .transform(d => Perf.sortedOnce(d, col("keep_id")))
  }

  /** C1b: persistable exact-dedup index — (fingerprint, keep_id,
    * n_copies), the q20 aggregate as a day-2 artifact. Write it once,
    * probe every ingest batch with [[dedupExactAgainstIndex]]; the
    * incremental tier the MinHash (C2b), paragraph (C2d), span (C2e)
    * and semantic (C26b) families already have, completed at the
    * exact tier. Accepting a batch appends its kept rows' fingerprints
    * (a groupBy-merge of old + new, associative like the sketch
    * tables). */
  def buildExactIndex(docs: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("keep_id"), md5(col(textCol)).as("fingerprint"))
      .groupBy(col("fingerprint"))
      .agg(min(col("keep_id")).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Day-2 exact dedup: verdict an ingest batch against the PERSISTED
    * fingerprint index with zero corpus work — one md5 per batch row,
    * one join against the (already small: one row per distinct text)
    * index. A batch row whose fingerprint maps to ITS OWN id is the
    * same document seen again (a replayed micro-batch) — not a
    * duplicate of something else; excluding self-matches makes
    * replays idempotent, the [[dedupAgainstIndex]] rule.
    *
    * @return one verdict row per batch document: (id, is_dup,
    *         dup_of = the index's elected keeper, -1 sentinel when
    *         clean — the q98 sentinel convention) */
  def dedupExactAgainstIndex(batch: DataFrame, index: DataFrame,
                             idCol: String = "doc_id",
                             textCol: String = "text"): DataFrame = {
    require(index.columns.contains("fingerprint") && index.columns.contains("keep_id"),
      "index must carry (fingerprint, keep_id) — build it with buildExactIndex")
    val hit = col("keep_id").isNotNull && col("keep_id") =!= col(idCol)
    // materialized once: the fingerprint projection feeds BOTH the
    // batch-key prune (a collect of the batch's distinct fingerprints
    // — batch-bounded) and the verdict join
    val fp = batch.select(col(idCol), md5(col(textCol)).as("fingerprint"))
      .localCheckpoint()
    // index-scan pruning (r18 verdict item 1): a left join keeps every
    // batch row; index rows with no batch fingerprint can never match
    val idx = Perf.prunedByKeys(
      index.select(col("fingerprint"), col("keep_id")), "fingerprint", fp)
    fp.join(idx, Seq("fingerprint"), "left")
      .select(col(idCol), hit.as("is_dup"),
        when(hit, col("keep_id")).otherwise(lit(-1L)).as("dup_of"))
  }

  /** `q107_exact_probe` — the day-2 exact tier over the standard 80/20
    * corpus/batch split (the q71/q98 convention). The corpus has no
    * natural exact dups (synthetic word salad), so odd batch ids take
    * the TEXT of corpus doc (id − 4) — id ≡ 4 (mod 5) ⇒ the donor is
    * ≡ 0 (mod 5), always corpus-side — planting a genuine exact match
    * for half the batch while the other half exercises the clean path.
    * The oracle keys its index on the TEXT itself (not md5): hotness
    * needs only within-engine equality, so the hash-match certifies
    * the dedup SEMANTICS, not the hash function — the C2e oracle
    * convention. */
  def exactProbeDocs(spark: SparkSession, dir: String): DataFrame = {
    val planted = donorPlantedText(Tables(spark, dir).documents)
    dedupExactAgainstIndex(
      planted.filter(col("doc_id") % 5 === 4).select(col("doc_id"), col("text")),
      buildExactIndex(planted.filter(col("doc_id") % 5 =!= 4)))
      .transform(d => Perf.sortedOnce(d, col("doc_id")))
  }

  /** The standard donor planting, ONE definition for q107/q114/q116
    * (each oracle mirrors it): docs with doc_id ≡ 9 (mod 10) take the
    * TEXT of doc (id − 4) — the donor is ≡ 5 (mod 10), so under the
    * 80/20 split the recipient is always batch-side and the donor
    * always corpus-side — planting genuine cross-document exact dups
    * into the otherwise dup-free word-salad corpus. All other columns
    * pass through untouched. */
  private[graft] def donorPlantedText(docs: DataFrame): DataFrame =
    docs
      .join(docs.select((col("doc_id") + 4).as("doc_id"), col("text").as("_donor")),
        Seq("doc_id"), "left")
      .withColumn("text",
        when(col("doc_id") % 10 === 9, col("_donor")).otherwise(col("text")))
      .drop("_donor")

  // ---- shared shingling ------------------------------------------------

  /** Distinct 3-word shingles of lowercased text (padded: texts shorter
    * than 3 tokens yield one shingle of what's there). */
  def wordShingles(c: Column, k: Int = 3): Column = {
    val toks = split(lower(trim(c)), "\\s+")
    array_distinct(transform(
      sequence(lit(0), greatest(size(toks) - k, lit(0))),
      i => concat_ws(" ", slice(toks, i + 1, lit(k)))))
  }

  /** Estimated Jaccard similarity of two minhash signatures: the
    * fraction of agreeing slots (shared by the one-shot LSH pass and
    * the incremental index probe — one definition, one place). */
  private def sigAgreement(a: Column, b: Column, numHashes: Int): Column =
    (aggregate(zip_with(a, b, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v).cast("double") / numHashes)

  /** MinHash signature via the native kernel expression
    * [[graft.expressions.MinHashSignature]]: one pass over the shingle
    * array inside whole-stage codegen (the per-hash `aggregate` fold
    * formulation traverses the array numHashes times with per-element
    * string concat + hash — ~10x more work). */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    call_function("graft_minhash", shingles, lit(numHashes))

  /** Per-doc one-hop dedup verdict from a candidate-pair DF
    * (cols id_a < id_b): representative = min(self, min matched partner).
    * Single groupBy shuffle on doc_id. All other columns of `docs` pass
    * through, so callers don't re-join (and re-compute) their upstream
    * pipeline for metadata. */
  private def perDocVerdict(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val neighbors = pairs.select(col("id_a").as("doc_id"), col("id_b").as("nb"))
      .unionAll(pairs.select(col("id_b").as("doc_id"), col("id_a").as("nb")))
      .groupBy(col("doc_id")).agg(min(col("nb")).as("min_nb"))
    docs
      .join(neighbors, Seq("doc_id"), "left")
      .withColumn("rep_id", least(col("doc_id"), coalesce(col("min_nb"), col("doc_id"))))
      .withColumn("is_dup", col("rep_id") < col("doc_id"))
      .drop("min_nb")
  }

  /** Within-bucket pair expansion: group candidates by bucket key,
    * collect members, emit all i<j combinations. ONE shuffle, ONE
    * evaluation of the (expensive) upstream signature computation — a
    * bucket self-join would re-evaluate the whole upstream plan per join
    * side. The size filter doubles as the skew guard: buckets above
    * `cap` are degenerate clusters (boilerplate) that a 100 TB pipeline
    * routes to a dedicated salted pass instead of pair-exploding. */
  private def bucketPairs(banded: DataFrame, keys: Seq[String], member: Column, cap: Int): DataFrame =
    banded
      .groupBy(keys.map(col): _*)
      .agg(collect_list(member).as("m"))
      .filter(size(col("m")).between(2, cap))
      .select(explode(flatten(transform(col("m"), (x, i) =>
        transform(slice(col("m"), i + 2, size(col("m"))), y =>
          struct(x.as("a"), y.as("b")))))).as("p"))

  /** C2 `q21_minhash_lsh` — MinHash+LSH near-dup dedup. 16 hashes, 4 bands
    * of 4 rows: docs agreeing on all 4 minhashes of any band become
    * candidates (band equi-join — shuffle on band hash, never cross).
    * Candidates verified by signature agreement ≥ `simThreshold`.
    * Output: one row per doc (doc_id, rep_id, is_dup, n_shingles). */
  def minhashLsh(spark: SparkSession, dir: String): DataFrame =
    minhashLshDocs(Tables(spark, dir).documents)

  /** Banded MinHash signature frame (doc_id, sig, band, bh) — the
    * candidate-generation shape shared by the one-shot LSH pass and the
    * PERSISTED INDEX of incremental dedup. The fused
    * `graft_minhash_shingled` kernel folds tokens → 3-token-shingle
    * minhash signature in one primitive pass (no shingle strings
    * materialized). Persist with `Bucketing.writeBucketed(...,
    * keys = Seq("band", "bh"))` so day-2 batches probe it with ZERO
    * corpus-side exchanges. */
  def minhashIndexDocs(documents: DataFrame,
                       numHashes: Int = 16, bands: Int = 4): DataFrame = {
    // exact divisibility is the LSH banding contract: a remainder would
    // silently leave the trailing signature slots out of every band
    // (weaker candidate generation) while est_sim still used them — and
    // the wrong parameters would persist into the index metadata as if
    // valid
    require(numHashes % bands == 0,
      s"numHashes=$numHashes must be divisible by bands=$bands")
    val rows = numHashes / bands
    // the build parameters ride the sig column's schema METADATA
    // (surviving parquet/table round-trips) so a later probe with
    // mismatched parameters fails loudly instead of silently matching
    // nothing — (band, bh) values from different (numHashes, bands)
    // never align
    val sigMeta = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("graft.minhash.numHashes", numHashes.toLong)
      .putLong("graft.minhash.bands", bands.toLong)
      .build()
    Perf.kernelSpread(documents.select(col("doc_id"), col("text")))
      .select(col("doc_id"),
        call_function("graft_minhash_shingled",
          split(lower(trim(col("text"))), "\\s+"), lit(3), lit(numHashes)).as("sig"))
      .select(
        col("doc_id"), col("sig"),
        explode(array((0 until bands).map { b =>
          struct(lit(b).as("band"), xxhash64(slice(col("sig"), b * rows + 1, rows)).as("bh"))
        }: _*)).as("bk"))
      .select(col("doc_id"), col("sig").as("sig", sigMeta), col("bk.band"), col("bk.bh"))
  }

  /** DataFrame-level MinHash+LSH over any (doc_id, text) frame. */
  def minhashLshDocs(documents: DataFrame,
                     numHashes: Int = 16, bands: Int = 4,
                     simThreshold: Double = 0.5, bucketCap: Int = 200): DataFrame = {
    // verdict side only needs the doc list — keep it a bare scan so the
    // DAG fork doesn't re-run the signature pipeline
    val docsMeta = documents.select(col("doc_id"))
    // materialized: bucketPairs forks this frame for BOTH pair sides,
    // which lazily re-ran the fused minhash kernel over every document
    // twice
    val banded = minhashIndexDocs(documents, numHashes, bands).localCheckpoint()

    val pairs = bucketPairs(banded, Seq("band", "bh"),
        struct(col("doc_id"), col("sig")), bucketCap)
      .select(
        least(col("p.a.doc_id"), col("p.b.doc_id")).as("id_a"),
        greatest(col("p.a.doc_id"), col("p.b.doc_id")).as("id_b"),
        sigAgreement(col("p.a.sig"), col("p.b.sig"), numHashes).as("est_sim"))
      .filter(col("est_sim") >= simThreshold)
      .select(col("id_a"), col("id_b")).distinct()

    perDocVerdict(docsMeta, pairs)
      .select(col("doc_id"), col("rep_id"), col("is_dup"))
      .transform(d => Perf.sortedOnce(d, col("doc_id")))
  }

  /** C2b `q71_neardup_verdicts` — the INCREMENTAL pipeline's per-doc
    * verdict over a deterministic 80/20 corpus/batch split of the
    * documents table (corpus = doc_id % 5 != 4, batch = the rest):
    * build the MinHash index from the corpus, probe the batch with
    * [[dedupAgainstIndex]], emit (doc_id, is_dup, dup_of) per batch doc.
    *
    * This is the family's oracle hook: candidate generation (bands,
    * signatures) is approximate and not ANSI-expressible, but the FINAL
    * verdict is — at sf0.01 DuckDB brute-forces exact all-pairs shingle
    * Jaccard and the corpus's similarity mass is far from the 0.5
    * threshold on both sides, so the approximate and exact verdicts
    * coincide. `best_sim` is dropped here (a minhash-estimate detail no
    * exact oracle can reproduce); `dup_of` is -1 when clean so neither
    * engine's null ordering can leak into the hash. */
  def neardupVerdicts(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    val corpus = docs.filter(col("doc_id") % 5 =!= 4)
    val batch = docs.filter(col("doc_id") % 5 === 4)
    dedupAgainstIndex(batch, minhashIndexDocs(corpus))
      .select(col("doc_id"), col("is_dup"),
        coalesce(col("dup_of"), lit(-1L)).as("dup_of"))
      .transform(d => Perf.sortedOnce(d, col("doc_id")))
  }

  /** Incremental (batch-vs-corpus) near-dup dedup — how a 100 TB
    * pipeline actually runs on day 2: instead of re-scanning the full
    * corpus per ingest, each incoming batch probes a PERSISTED MinHash
    * signature index ([[minhashIndexDocs]], written once, appended as
    * batches are accepted).
    *
    * Scale shape: the corpus side is read pre-bucketed — persist the
    * index with `Bucketing.writeBucketed(..., keys = Seq("band",
    * "bh"))` and both the stop-bucket census and the candidate probe
    * run WITHOUT a corpus-side exchange (spec-asserted); only the
    * (small) batch shuffles, by (band, bh). The stop-bucket guard is
    * computed on the index AT QUERY TIME because an appended index's
    * bucket sizes aren't knowable at build time: buckets above
    * `bucketCap` are boilerplate clusters the one-shot pass also skips.
    *
    * @return one verdict row per batch document: (doc_id, is_dup,
    *         dup_of = smallest matching corpus id, best_sim = highest
    *         verified signature agreement; null/false when no corpus
    *         document matches)
    */
  def dedupAgainstIndex(newDocs: DataFrame, index: DataFrame,
                        numHashes: Int = 16, bands: Int = 4,
                        simThreshold: Double = 0.5, bucketCap: Int = 200): DataFrame = {
    // parameter-mismatch guard: a probe with different (numHashes,
    // bands) than the index was built with computes incompatible
    // (band, bh) buckets — every dup would silently verdict clean.
    // The build parameters travel in the sig column's metadata; a
    // hand-built index without it still hits the per-row signature-
    // length check below.
    val sigField = index.schema.fields.find(_.name == "sig").getOrElse(
      throw new IllegalArgumentException(
        "index must carry a 'sig' column — build it with minhashIndexDocs"))
    if (sigField.metadata.contains("graft.minhash.numHashes")) {
      val iN = sigField.metadata.getLong("graft.minhash.numHashes")
      val iB = sigField.metadata.getLong("graft.minhash.bands")
      require(iN == numHashes && iB == bands,
        s"index was built with numHashes=$iN bands=$iB but the probe asked for " +
          s"numHashes=$numHashes bands=$bands — buckets would not align and every " +
          "duplicate would silently pass")
    }
    val batch = minhashIndexDocs(newDocs, numHashes, bands)
      .select(col("band"), col("bh"), col("doc_id").as("new_id"), col("sig").as("new_sig"))
    // bucketCap = Int.MaxValue means genuinely unbounded: skip the
    // census aggregate + join entirely (decontamination's default —
    // a filter that can never bind would be pure wasted work, and a
    // >2³¹-row bucket must NOT silently drop)
    val pruned =
      if (bucketCap == Int.MaxValue) index
      else {
        val sizes = index.groupBy(col("band"), col("bh")).agg(count(lit(1)).as("_bn"))
        index.join(sizes.filter(col("_bn") <= bucketCap), Seq("band", "bh"))
      }
    val corpus = pruned
      .select(col("band"), col("bh"), col("doc_id").as("corpus_id"),
        when(size(col("sig")) =!= numHashes,
          raise_error(concat(lit("dedupAgainstIndex: index signature length "),
            size(col("sig")).cast("string"),
            lit(s" != numHashes=$numHashes — rebuild the index or fix the probe parameters"))))
          .otherwise(col("sig")).as("corpus_sig"))
    // a batch doc matching ITS OWN id in the index is the same document
    // seen again (a replayed micro-batch, a re-run) — not a duplicate
    // OF something else; excluding self-pairs makes replays idempotent
    val verified = batch.join(corpus, Seq("band", "bh"))
      .filter(col("new_id") =!= col("corpus_id"))
      .dropDuplicates("new_id", "corpus_id")
      .withColumn("est_sim", sigAgreement(col("new_sig"), col("corpus_sig"), numHashes))
      .filter(col("est_sim") >= simThreshold)
    newDocs.select(col("doc_id"))
      .join(verified.groupBy(col("new_id").as("doc_id"))
        .agg(min(col("corpus_id")).as("dup_of"), max(col("est_sim")).as("best_sim")),
        Seq("doc_id"), "left")
      .select(col("doc_id"), col("dup_of").isNotNull.as("is_dup"), col("dup_of"),
        round(col("best_sim"), 4).as("best_sim"))
      .transform(d => Perf.sortedOnce(d, col("doc_id")))
  }

  /** Benchmark DECONTAMINATION — the near-dup machinery pointed at
    * train/eval overlap: a training corpus must not contain documents
    * that near-match evaluation benchmarks, or downstream eval metrics
    * are contaminated. Build the eval-suite index ONCE with
    * [[minhashIndexDocs]] (eval suites are tiny next to the corpus),
    * then one probe pass drops every training row whose text
    * near-matches any eval document.
    *
    * Defaults differ from ingest dedup on purpose: `bucketCap` is
    * unbounded because SKIPPING a hot bucket here would leak
    * contamination (safety beats the skew guard at eval-suite scale),
    * and callers wanting the audit trail run [[dedupAgainstIndex]]
    * directly — its verdict frame (dup_of, best_sim) names the matching
    * eval doc per contaminated row. Identical probe semantics, one
    * operator family, two pipeline roles. */
  def decontaminate(train: DataFrame, evalIndex: DataFrame,
                    numHashes: Int = 16, bands: Int = 4,
                    simThreshold: Double = 0.5,
                    bucketCap: Int = Int.MaxValue): DataFrame = {
    val verdicts = dedupAgainstIndex(train, evalIndex, numHashes, bands,
      simThreshold, bucketCap)
    train.join(verdicts.filter(!col("is_dup")).select("doc_id"), Seq("doc_id"))
  }

  /** Exact n-gram contamination flagging — the OTHER classic
    * decontamination rule (verbatim-overlap, the GPT-3 convention):
    * flag every training document sharing ANY word n-gram (default 13)
    * with any eval document. [[decontaminate]] catches near-duplicates
    * of whole documents; this catches a benchmark QUESTION quoted
    * inside an otherwise-unrelated page, which minhash similarity
    * misses by design.
    *
    * Scale shape: eval suites are tiny next to the corpus, so their
    * distinct gram set BROADCASTS and the train-side gram stream joins
    * map-side — the corpus is never shuffled. Gram windows hash to
    * 64-bit longs (the q40 convention): 8-byte comparisons, no gram
    * strings materialized.
    *
    * @return (doc_id, contaminated) for every training document
    */
  def flagNgramContamination(train: DataFrame, evalDocs: DataFrame,
                             n: Int = 13): DataFrame =
    flagAgainstEvalGrams(train, buildEvalGramIndex(evalDocs, n), n)

  /** The corpus-word n-gram hash stream — ONE derivation shared by the
    * eval-index build and the train-side probe (round 14 refactor for
    * the streaming twin): verdict correctness requires both sides to
    * tokenize/window/hash identically, forever. */
  private def wordGrams(df: DataFrame, n: Int): DataFrame =
    Perf.kernelSpread(df.select(col("doc_id"), col("text")))
      .select(col("doc_id"), split(lower(trim(col("text"))), "\\s+").as("_t"))
    .select(col("doc_id"), explode(
      when(size(col("_t")) >= n,
        transform(sequence(lit(1), size(col("_t")) - (n - 1)),
          i => xxhash64((0 until n).map(j => element_at(col("_t"), i + j)): _*)))
        .otherwise(array().cast("array<bigint>"))).as("g"))

  /** The persistable DECONTAMINATION ARTIFACT: the eval suite's
    * distinct 64-bit gram keys, one tiny `(g)` table. Build it once per
    * eval-suite release, persist it, and every later probe — batch
    * ([[flagAgainstEvalGrams]]) or streaming
    * ([[graft.streaming.EventsStream.decontamIngestStream]]) — verdicts
    * map-side against it with zero corpus shuffles. Eval-suite updates
    * APPEND new gram rows (the probe reads distinct keys, so overlap
    * between releases is harmless). */
  def buildEvalGramIndex(evalDocs: DataFrame, n: Int = 13): DataFrame = {
    require(n >= 2, s"n must be >= 2, got $n")
    // n travels in the g column's metadata (the q71/winnow convention —
    // parquet round-trips it): probing an n=13 index with n=7 windows
    // would hash disjoint gram streams and verdict everything clean
    val meta = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("graft.decontam.n", n.toLong).build()
    wordGrams(evalDocs, n).select(col("g").as("g", meta)).distinct()
  }

  /** The largest eval-gram set [[flagAgainstEvalGrams]] will broadcast
    * before falling back to a shuffled hash join: 32M distinct 64-bit
    * keys ≈ 256 MB of payload — comfortably inside an executor's
    * broadcast budget, far past any benchmark-suite gram count, and
    * small enough that the fallback trips long before the driver
    * would OOM assembling the broadcast. */
  val DefaultEvalGramBroadcastLimit: Long = 32L * 1000 * 1000

  // ---- the persisted eval-gram CENSUS (round 18, verdict item 2):
  // flagAgainstEvalGrams's census gate re-counted the gram index on
  // EVERY call — an index-sized aggregation per probe, paid per
  // MICRO-BATCH by the streaming ingests over a growing index (the
  // same linear-per-probe shape winnowDfHistogram retired at the
  // winnow tier). The census now persists beside the index as a tiny
  // side file, updated on append, and the gate reads it in O(1).
  //
  // Contract: the stored value is an UPPER BOUND on the true distinct
  // count — exact when written from a full count, and maintained as
  // `stored + |appended batch's new grams|` under growth (append
  // overlap can only make the bound looser, never tighter). A too-
  // LARGE census errs toward the shuffled join — the safe direction:
  // verdicts are strategy-independent (DedupSpec pins bit-identity),
  // so staleness costs a broadcast opportunity, never a wrong verdict
  // or an OOM. A too-small census is impossible under this protocol.

  /** Side-file path convention: `<indexPath>__census`. */
  def evalGramCensusPath(indexPath: String): String = s"${indexPath}__census"

  private def censusFs(spark: SparkSession, indexPath: String) =
    new org.apache.hadoop.fs.Path(indexPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The persisted census, if one exists beside the index. */
  def readEvalGramCensus(spark: SparkSession, indexPath: String): Option[Long] = {
    val p = new org.apache.hadoop.fs.Path(evalGramCensusPath(indexPath))
    val fs = censusFs(spark, indexPath)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val s =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      "\"census\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(s).map(_.group(1).toLong)
    }
  }

  /** Persist the census beside the index (exact at write time). */
  def writeEvalGramCensus(spark: SparkSession, indexPath: String,
                          census: Long): Unit = {
    require(census >= 0, s"census must be >= 0, got $census")
    val out = censusFs(spark, indexPath).create(
      new org.apache.hadoop.fs.Path(evalGramCensusPath(indexPath)), true)
    try out.write(s"""{"census":$census}""".getBytes("UTF-8"))
    finally out.close()
  }

  /** Merge an append into the persisted census: stored + added (the
    * upper-bound maintenance rule). A bundle with NO census yet (a
    * legacy pre-census index) seeds from a full distinct count of the
    * LIVE index first (r18 advice, high): seeding at 0 + added would
    * record just the batch's grams as the whole census, and every
    * later probe would read that under-count and broadcast a gram set
    * that may be far past the limit — the exact OOM the gate exists to
    * prevent. The one-time seed scan runs only on the first bump of a
    * legacy index; every later bump is O(1) again. Returns the new
    * stored value. */
  def bumpEvalGramCensus(spark: SparkSession, indexPath: String,
                         added: Long): Long = {
    require(added >= 0, s"added must be >= 0, got $added")
    val base = readEvalGramCensus(spark, indexPath).getOrElse {
      val p = new org.apache.hadoop.fs.Path(indexPath)
      if (censusFs(spark, indexPath).exists(p))
        spark.read.parquet(indexPath).select(col("g")).distinct().count()
      else 0L
    }
    val next = base + added
    writeEvalGramCensus(spark, indexPath, next)
    next
  }

  /** Grow a persisted plain-parquet eval-gram index (the D2p/C2c suite
    * -release path): append only the NEW distinct grams of `evalDocs`
    * (anti-joined against the live index) and bump the census by
    * exactly that count — the bound stays exact under this appender.
    * Returns the number of grams appended. */
  def appendEvalGrams(spark: SparkSession, evalDocs: DataFrame,
                      indexPath: String, n: Int = 13): Long = {
    val fresh = buildEvalGramIndex(evalDocs, n)
      .join(spark.read.parquet(indexPath).select(col("g")), Seq("g"), "left_anti")
      .localCheckpoint() // the append targets the path the anti-join reads
    val added = fresh.count()
    if (added > 0) {
      fresh.write.mode(org.apache.spark.sql.SaveMode.Append).parquet(indexPath)
      bumpEvalGramCensus(spark, indexPath, added)
    }
    added
  }

  /** [[flagNgramContamination]] against a PRE-BUILT (or reloaded) eval
    * gram index — the day-2/streaming entry point.
    *
    * Join strategy is CENSUS-GATED (round 17 — the r16 `weak`): for
    * the operator's original decontamination role the eval side is a
    * benchmark suite's gram set — tiny by design — and broadcasting it
    * keeps the corpus exchange-free (the 100 TB shape q137 certifies).
    * But the master chain (C51/C51b/D2y) reuses this probe as the
    * LEAKAGE firewall, where the "eval" side is the leading-gram set
    * of the ENTIRE heldout split — O(corpus), and CUMULATIVE under
    * streaming ingest. An unconditional broadcast there grows with the
    * corpus until the driver/executors OOM. So the probe counts the
    * distinct gram keys first (one aggregation over the gram index —
    * the count never lands on the driver as rows) and broadcasts only
    * under `broadcastGramLimit`; past it, both sides shuffle on `g`
    * into a hash join whose per-partition state is |grams|/shuffle
    * partitions — linear, spill-safe, and skew-free (the keys are
    * xxhash64 outputs). Verdicts are strategy-independent, so the two
    * regimes are bit-identical (DedupSpec pins both directions).
    *
    * `knownCensus` (round 18): a caller that KNOWS the gram count — the
    * persisted census beside a bundle's index ([[readEvalGramCensus]]),
    * or bundle-census + batch-extension arithmetic — passes it and the
    * per-call count is skipped entirely, making the gate O(1) per
    * probe. The value must be an UPPER bound on the true distinct
    * count (the census maintenance rule): over-reporting errs toward
    * the shuffled join, which is bit-identical and spill-safe; an
    * under-reported census is the caller's contract violation. */
  def flagAgainstEvalGrams(train: DataFrame, evalGrams: DataFrame,
                           n: Int = 13,
                           broadcastGramLimit: Long = DefaultEvalGramBroadcastLimit,
                           knownCensus: Option[Long] = None): DataFrame = {
    require(n >= 2, s"n must be >= 2, got $n")
    require(broadcastGramLimit >= 0,
      s"broadcastGramLimit must be >= 0, got $broadcastGramLimit")
    require(knownCensus.forall(_ >= 0),
      s"knownCensus must be >= 0, got $knownCensus")
    evalGrams.schema.fields.find(_.name == "g").foreach { gField =>
      if (gField.metadata.contains("graft.decontam.n")) {
        val in = gField.metadata.getLong("graft.decontam.n")
        require(in == n,
          s"eval gram index was built with n=$in but the probe asked for " +
            s"n=$n — gram streams would be disjoint and every doc would " +
            "silently verdict clean")
      }
    }
    val grams = evalGrams.select(col("g")).distinct()
    val census = knownCensus.getOrElse(grams.count())
    val probe =
      if (census <= broadcastGramLimit) broadcast(grams)
      // build the hash table from the gram side (it is still the
      // smaller relation — the train gram stream is O(corpus tokens));
      // the hint also stops AQE from re-promoting a just-over-limit
      // gram set back into a broadcast
      else grams.hint("shuffle_hash")
    val hits = wordGrams(train, n)
      .join(probe, Seq("g"))
      .select(col("doc_id")).distinct()
      .withColumn("contaminated", lit(true))
    train.select(col("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("contaminated"), lit(false)).as("contaminated"))
      .transform(d => Perf.sortedOnce(d, col("doc_id")))
  }

  /** C2c `q137_ngram_decontamination` — [[flagNgramContamination]]
    * registered and oracle-backed (round 13; previously spec-only):
    * the eval suite derives in-query as the FIRST 20 WORDS of every
    * doc_id ≡ 7 (mod 10) document — a planted "benchmark question"
    * slice, so contamination provably fires on the source docs AND on
    * their q107 donor copies while the rest of the corpus stays clean
    * (both verdict paths, the registry coverage gate's requirement).
    * The oracle compares gram STRINGS where the operator joins on
    * xxhash64 gram keys — the verdicts are identical unless xxhash64
    * collides on this corpus, and a collision would flip a verdict and
    * fail the hash check loudly (the q40 hashed-window convention). */
  def ngramDecontaminationDocs(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    val evalDocs = docs.filter(col("doc_id") % 10 === 7)
      .select(col("doc_id"),
        array_join(slice(split(lower(trim(col("text"))), "\\s+"), 1, 20), " ")
          .as("text"))
    flagNgramContamination(docs, evalDocs)
  }

  /** C2c∘C38 `q170_split_decontam` — the eval-leakage FIREWALL
    * composed: leakage-safe grouped split (C38 — whole sources held
    * out) → the held-out docs' leading 20 words become the q137
    * decontamination artifact ([[buildEvalGramIndex]]) → the TRAIN
    * side flags against it map-side ([[flagAgainstEvalGrams]]). This
    * is the chain a training run actually executes between splitting
    * and shipping: the eval suite is whatever the split held out, so
    * the firewall and the split can never drift apart. The q153 donor
    * plant + split seed 9 make both verdict paths fire DETERMINISTICALLY
    * at every SF: source = doc_id mod 20 and the seed-9 source buckets
    * put src19 (all of whose docs are planted copies of src15 = train
    * originals) in VAL and src5 (whose copies live in src9 = train) in
    * TEST — so train originals AND train copies both flag, while
    * unrelated train sources stay clean. */
  def splitDecontamDocs(spark: SparkSession, dir: String): DataFrame = {
    val docs = donorPlantedText(Tables(spark, dir).documents)
    // forked: the eval derivation and both train-side reads
    val parts = Sharding.leakageSafeSplit(docs, "source", seed = 9L)
      .localCheckpoint()
    val evalDocs = parts.filter(col("split") =!= "train")
      .select(col("doc_id"),
        array_join(slice(split(lower(trim(col("text"))), "\\s+"), 1, 20), " ")
          .as("text"))
    val train = parts.filter(col("split") === "train")
    flagAgainstEvalGrams(train.select(col("doc_id"), col("text")),
        buildEvalGramIndex(evalDocs))
      .join(train.select(col("doc_id"), col("source"), col("split")), Seq("doc_id"))
      .select(col("doc_id"), col("source"), col("split"), col("contaminated"))
      .transform(d => Perf.sortedOnce(d, col("doc_id")))
  }

  /** 64-bit SimHash of the word multiset via the native kernel expression
    * [[graft.expressions.SimHash64]] (a HOF formulation would evaluate a
    * 64-wide lambda accumulator per token — orders of magnitude more
    * expression-tree work than the primitive loop). */
  def simhash64(c: Column): Column =
    call_function("graft_simhash64", split(lower(trim(c)), "\\s+"))

  /** C3 `q22_simhash` — SimHash near-dup: 4 bands of 16 bits guarantee any
    * pair within hamming distance 3 shares at least one intact band
    * (pigeonhole), so the candidate join is a band equi-join. Verified by
    * `bit_count(xor) <= maxHamming`. Output: per-doc verdict + simhash. */
  def simhashDedup(spark: SparkSession, dir: String): DataFrame =
    simhashDedupDocs(Tables(spark, dir).documents)

  /** `q74_simhash_verdicts` — the portable-hash SimHash verdict (see
    * [[simhashDedupPortableDocs]]) over the documents table. */
  def simhashDedupPortable(spark: SparkSession, dir: String): DataFrame =
    simhashDedupPortableDocs(Tables(spark, dir).documents)

  /** DataFrame-level SimHash dedup over any (doc_id, text) frame. */
  def simhashDedupDocs(documents: DataFrame,
                       maxHamming: Int = 3, bucketCap: Int = 200): DataFrame =
    simhashDedupCore(documents, simhash64(col("text")), bandBits = 16,
      maxHamming = maxHamming, bucketCap = bucketCap)

  /** The ENGINE-PORTABLE twin of [[simhashDedupDocs]]: same banding,
    * verification, and verdict, but signatures come from the 60-bit
    * md5-token-hash kernel (`graft_simhash60_md5`) that external engines
    * reproduce exactly — which is what lets `q74_simhash_verdicts`
    * hash-check the FINAL verdict (and the signatures themselves)
    * against an exact all-pairs oracle. Banding shifts to 4 bands of 15
    * bits; pigeonhole exactness at hamming ≤ 3 is unchanged. Production
    * callers should prefer the native-FNV [[simhashDedupDocs]].
    */
  def simhashDedupPortableDocs(documents: DataFrame,
                               maxHamming: Int = 3, bucketCap: Int = 200): DataFrame =
    simhashDedupCore(documents,
      call_function("graft_simhash60_md5", split(lower(trim(col("text"))), "\\s+")),
      bandBits = 15, maxHamming = maxHamming, bucketCap = bucketCap)

  private def simhashDedupCore(documents: DataFrame, sigExpr: Column,
                               bandBits: Int, maxHamming: Int,
                               bucketCap: Int): DataFrame = {
    // materialized for the same reason as the minhash path: the pair
    // expansion forks this frame, re-hashing every document per side
    val sigs = Perf.kernelSpread(documents.select(col("doc_id"), col("text")))
      .select(col("doc_id"), sigExpr.as("simhash"))
      .localCheckpoint()
    val mask = (1L << bandBits) - 1L
    val banded = sigs.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("simhash"), b * bandBits).bitwiseAND(lit(mask)).as("bh"))
      }: _*)).as("bk"))
      .select(col("doc_id"), col("simhash"), col("bk.band"), col("bk.bh"))
    val pairs = bucketPairs(banded, Seq("band", "bh"),
        struct(col("doc_id"), col("simhash")), bucketCap)
      .filter(bit_count(col("p.a.simhash").bitwiseXOR(col("p.b.simhash"))) <= maxHamming)
      .select(
        least(col("p.a.doc_id"), col("p.b.doc_id")).as("id_a"),
        greatest(col("p.a.doc_id"), col("p.b.doc_id")).as("id_b"))
      .distinct()
    perDocVerdict(sigs, pairs)
      .select(col("doc_id"), col("simhash"), col("rep_id"), col("is_dup"))
      .transform(d => Perf.sortedOnce(d, col("doc_id")))
  }

  /** C4 `q23_ngram_jaccard` — character-3-gram Jaccard near-dup via an
    * inverted index: explode grams → drop stop-grams (df > dfCap — the
    * posting-list bound that keeps candidate pairs linear-ish at scale) →
    * pairs sharing a rare gram → exact Jaccard on full distinct-gram sets.
    */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame =
    ngramJaccardDocs(Tables(spark, dir).documents)

  /** DataFrame-level n-gram Jaccard dedup over any (doc_id, text) frame. */
  def ngramJaccardDocs(documents: DataFrame,
                       n: Int = 3, jaccardThreshold: Double = 0.5,
                       dfCap: Int = 50): DataFrame = {
    // grams are hashed to int64 in one native pass (graft_ngrams kernel):
    // the inverted index and the verification arrays shuffle 8-byte longs
    // instead of gram strings, and intersect/union hash primitives
    // (collision probability ~1e-19 per gram pair — irrelevant at a 0.5
    // Jaccard threshold).
    // materialized: the posting explode and BOTH verification sides
    // fork this frame — lazily the gram kernel ran three times per doc
    val docs = Perf.kernelSpread(documents.select(col("doc_id"), col("text")))
      .select(col("doc_id"),
        call_function("graft_ngrams", lower(trim(col("text"))), lit(n)).as("grams"))
      .localCheckpoint()

    val posting = docs.select(col("doc_id"), explode(col("grams")).as("g"))
    // grams are distinct per doc, so bucket size == document frequency:
    // the bucket-size filter IS the stop-gram removal (df <= dfCap), and
    // pair expansion happens in the same single shuffle.
    val cand = bucketPairs(posting, Seq("g"), col("doc_id"), dfCap)
      .select(least(col("p.a"), col("p.b")).as("id_a"),
        greatest(col("p.a"), col("p.b")).as("id_b"))
      .distinct()

    val ga = docs.select(col("doc_id").as("id_a"), col("grams").as("grams_a"))
    val gb = docs.select(col("doc_id").as("id_b"), col("grams").as("grams_b"))
    val pairs = cand.join(ga, Seq("id_a")).join(gb, Seq("id_b"))
      .withColumn("jaccard",
        size(array_intersect(col("grams_a"), col("grams_b"))).cast("double") /
          size(array_union(col("grams_a"), col("grams_b"))))
      .filter(col("jaccard") >= jaccardThreshold)
      .select(col("id_a"), col("id_b"))

    perDocVerdict(documents.select(col("doc_id")), pairs)
      .select(col("doc_id"), col("rep_id"), col("is_dup"))
      .transform(d => Perf.sortedOnce(d, col("doc_id")))
  }

  /** C4b `q145_jaccard_prefix` — EXACT set-similarity self-join via
    * prefix filtering (AllPairs, Bayardo et al. WWW'07; positional
    * filter from PPJoin, Xiao et al. WWW'08) over the 3-word shingle
    * sets q21's MinHash ESTIMATES: this is the exact verifier of the
    * same similarity, with no estimator variance and no df-cap
    * approximation (q23's inverted index drops any pair whose shared
    * grams are all frequent). Prefix filtering is lossless — tokens are
    * globally ordered rarest-first and only the first
    * |x| − ⌈t·|x|⌉ + 1 of each document's ordered set are indexed,
    * which provably cannot miss a pair at Jaccard ≥ t. Exactness is
    * what lets the oracle be the PURE all-pairs shingle Jaccard with no
    * candidate-scheme mirroring (q21's oracle needs the corpus's
    * bimodality argument; this one needs nothing).
    *
    * Scale shape: the index is the PREFIX posting list — per-doc
    * (1−t)·|x|+1 rarest shingles instead of all |x| — and word-shingle
    * vocabularies are Zipf-sparse (measured here: max prefix bucket 10
    * at 10×, median 1), so bucket sizes concentrate near 1. Candidates
    * are pruned before verification by the length filter (min ≥ t·max)
    * and the per-collision positional filter (1 + min remaining ≥
    * required overlap t/(1+t)·(|x|+|y|)) — both provably non-dropping
    * (the minimal shared token's collision always survives), with a
    * 1e-9 slack so float noise in t·|x| can only widen, never narrow,
    * prefix or bound. Shingles travel as xxhash64 longs (the q23
    * convention — the oracle certifies verdict semantics, not the
    * hash). */
  def shingleJaccardPrefix(spark: SparkSession, dir: String): DataFrame =
    shingleJaccardPrefixDocs(Tables(spark, dir).documents)

  /** Prefix-filtered exact Jaccard dedup over any (doc_id, text) frame. */
  def shingleJaccardPrefixDocs(documents: DataFrame,
                               k: Int = 3, jaccardThreshold: Double = 0.5,
                               pairBudget: Long = DefaultPairBudget): DataFrame = {
    val docs = Perf.kernelSpread(documents.select(col("doc_id"), col("text")))
      .select(col("doc_id"),
        array_distinct(transform(wordShingles(col("text"), k), x => xxhash64(x)))
          .as("grams"))
      .localCheckpoint()
    val cand = prefixCandidatePairs(docs, jaccardThreshold, pairBudget)
    val ga = docs.select(col("doc_id").as("id_a"), col("grams").as("grams_a"))
    val gb = docs.select(col("doc_id").as("id_b"), col("grams").as("grams_b"))
    val pairs = cand.join(ga, Seq("id_a")).join(gb, Seq("id_b"))
      .withColumn("jaccard",
        size(array_intersect(col("grams_a"), col("grams_b"))).cast("double") /
          size(array_union(col("grams_a"), col("grams_b"))))
      .filter(col("jaccard") >= jaccardThreshold)
      .select(col("id_a"), col("id_b"))
    Perf.sortedOnce(
      perDocVerdict(documents.select(col("doc_id")), pairs)
        .select(col("doc_id"), col("rep_id"), col("is_dup")),
      col("doc_id"))
  }

  /** Candidate pairs from the prefix index: every pair at Jaccard ≥ t is
    * guaranteed present (lossless); pairs that cannot reach t are pruned
    * by the length and positional filters before verification. Exposed
    * package-private so the spec can count candidates against the full
    * inverted index. Input: (doc_id, grams) with grams distinct per doc. */
  /** Canonical-order shingle arrays: each doc's distinct gram hashes
    * sorted by (vocab df asc, gram asc) — rarest first. Grams absent
    * from `vocab` order as df 0 (rarest of all): harmless for
    * exactness — the lemma needs a CONSISTENT total order, not a fresh
    * one — which is what lets a frozen build-time vocabulary serve
    * every later batch. Re-aggregating (one shuffle on doc_id) beats a
    * window sort: the order materializes once into the array. */
  private[graft] def orderedGrams(docs: DataFrame, vocab: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(col("grams")).as("g"))
      .join(vocab, Seq("g"), "left")
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(
        struct(coalesce(col("df"), lit(0L)).as("df"), col("g")))).as("toks"))
      .select(col("doc_id"),
        transform(col("toks"), x => x.getField("g")).as("toks"))
      .withColumn("len", size(col("toks")))

  /** The PREFIX posting list of ordered docs: (g, doc_id, len, pos) for
    * the first |x| − ⌈t·|x|⌉ + 1 tokens. The −1e-9 slack means float
    * error can only shrink the ceil → LONGER prefix → still lossless. */
  private[graft] def prefixPostings(ordered: DataFrame, t: Double): DataFrame = {
    val prefLen = (col("len") -
      ceil(col("len") * t - lit(1e-9)).cast("int") + lit(1))
    ordered
      .select(col("doc_id"), col("len"),
        posexplode(slice(col("toks"), lit(1), prefLen)))
      .toDF("doc_id", "len", "pos", "g")
  }

  /** Length filter: J ≥ t forces min(|x|,|y|) ≥ t·max(|x|,|y|). */
  private def lengthFilter(la: Column, lb: Column, t: Double): Column =
    least(la, lb).cast("double") >= lit(t) * greatest(la, lb) - lit(1e-9)

  /** PPJoin positional filter for a prefix collision at (posA, posB):
    * the best still-possible overlap 1 + min(remaining) must reach the
    * required overlap t/(1+t)·(|x|+|y|). Provably non-dropping: the
    * collision on the pair's MINIMAL shared token always survives. */
  private def positionalFilter(la: Column, pa: Column, lb: Column, pb: Column,
                               t: Double): Column =
    (lit(1) + least(la - pa - lit(1), lb - pb - lit(1))).cast("double") >=
      lit(t / (1.0 + t)) * (la + lb) - lit(1e-9)

  private[graft] def prefixCandidatePairs(docs: DataFrame, t: Double,
                                          pairBudget: Long = DefaultPairBudget): DataFrame = {
    val posting = docs.select(col("doc_id"), explode(col("grams")).as("g"))
    val vocab = posting.groupBy(col("g")).agg(count(lit(1)).as("df"))
    // the one-shot self-join derives its prefix via a WINDOW over the
    // df-annotated posting stream (row_number under the same (df, g)
    // order the index build materializes as arrays): same selection,
    // same shuffle count, but no per-doc array build + posexplode —
    // measured ~1.5 s cheaper at 10×. The index build keeps the array
    // form because the ordered arrays ARE its grams artifact.
    val wDoc = Window.partitionBy(col("doc_id"))
    val wOrd = wDoc.orderBy(col("df").asc, col("g").asc)
    // materialized: the self-join forks this frame (house rule) — and a
    // plain equi-join on g beats the grouped collect_list pair
    // expansion here, because rarest-first ordering makes prefix
    // buckets near-singletons (measured median 1 at 10×): the grouped
    // form pays nested array-transform codegen per mostly-empty bucket
    // (measured 4× slower). Uncapped by design: exactness forbids
    // dropping buckets; the filters below prune before verification.
    val prefix = posting.join(vocab, Seq("g"), "left")
      .withColumn("df", coalesce(col("df"), lit(0L)))
      .withColumn("len", count(lit(1)).over(wDoc))
      .withColumn("pos", row_number().over(wOrd) - lit(1))
      .filter(col("pos") <
        col("len") - ceil(col("len") * t - lit(1e-9)).cast("int") + lit(1))
      .select(col("doc_id"), col("len"), col("pos"), col("g"))
      .localCheckpoint()
    // pre-flight: the g-collision volume IS the join's output row count
    // before the length/positional prunes — the memory driver on a
    // pair-explosive corpus (near-threshold pairs provably escape the
    // prunes, so the budget must gate the raw collisions)
    requirePairBudget(candidatePairVolume(prefix, "g", "doc_id"), pairBudget,
      "shingleJaccardPrefix",
      "probe a persisted prefix index day-2 batch-by-batch " +
        "(buildPrefixIndex + dedupAgainstPrefixIndex — cost follows the " +
        "batch, not the corpus), use MinHash (minhashLshDocs) for " +
        "discovery grade, or dedup first (dedupExact) so only one copy " +
        "per duplicate cluster enters the exact tier.")
    val a = prefix.select(col("g"), col("doc_id").as("id_a"),
      col("len").as("la"), col("pos").as("pa"))
    val b = prefix.select(col("g"), col("doc_id").as("id_b"),
      col("len").as("lb"), col("pos").as("pb"))
    a.join(b, Seq("g"))
      .filter(col("id_a") < col("id_b"))
      .filter(lengthFilter(col("la"), col("lb"), t))
      .filter(positionalFilter(col("la"), col("pa"), col("lb"), col("pb"), t))
      .select(col("id_a"), col("id_b")).distinct()
  }

  // ---- C4c: incremental prefix-Jaccard (day-2 exact dedup) -----------

  /** Hashed distinct shingle sets of a (doc_id, text) frame — the input
    * shape of the prefix family. */
  private def shingleSets(documents: DataFrame, k: Int): DataFrame =
    Perf.kernelSpread(documents.select(col("doc_id"), col("text")))
      .select(col("doc_id"),
        array_distinct(transform(wordShingles(col("text"), k), x => xxhash64(x)))
          .as("grams"))

  /** Build the persistable three-part prefix index over (doc_id, text) —
    * the day-2 artifact of [[shingleJaccardPrefixDocs]]'s EXACT
    * set-similarity tier (the C2b convention lifted from estimate to
    * exact):
    *  - `postings` (g, doc_id, len, pos): the prefix posting list —
    *    persist bucketed on g so batch probes scan it with zero
    *    corpus-side exchanges
    *  - `grams` (doc_id, grams, len): full shingle-hash arrays for
    *    exact verification — persist bucketed on doc_id
    *  - `vocab` (g, df): corpus document frequencies, FROZEN at build
    *    time, defining the global token order every later prefix
    *    (corpus and batch alike) is computed under. Exactness needs a
    *    CONSISTENT order, not a fresh one, so growth never invalidates
    *    the index; rebuild when drift makes prefixes wastefully long.
    * Build params (k, t) travel in the postings g column's metadata —
    * a probe with different parameters computes misaligned prefixes
    * and MUST fail loudly (q71 convention). */
  def buildPrefixIndex(documents: DataFrame, k: Int = 3, t: Double = 0.5)
      : (DataFrame, DataFrame, DataFrame) = {
    require(t > 0.0 && t <= 1.0, s"threshold must be in (0,1], got $t")
    // MATERIALIZED at every fork: postings, grams and vocab all hang
    // off the ordered frame, and a query-time (unpersisted) build would
    // otherwise re-shingle the corpus once per consumer — in production
    // these three are written once and the point is moot
    val docs = shingleSets(documents, k).localCheckpoint()
    val vocab = docs.select(explode(col("grams")).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("df"))
      .localCheckpoint()
    val ordered = orderedGrams(docs, vocab).localCheckpoint()
    freeBlocks(docs)
    val meta = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("graft.prefix.k", k.toLong)
      .putDouble("graft.prefix.t", t).build()
    val postings = prefixPostings(ordered, t)
      .select(col("g").as("g", meta), col("doc_id"), col("len"), col("pos"))
    (postings, ordered.select(col("doc_id"), col("toks").as("grams"), col("len")),
      vocab)
  }

  /** Rebuild the prefix triple from a PERSISTED grams table under a
    * FRESH vocabulary — the maintenance heal for vocab drift
    * ([[Maintain.maintainMasterBundle]]): the stored gram arrays are
    * the full shingle-hash SETS (their order is vocab-derived and
    * discarded by re-ordering), so this equals [[buildPrefixIndex]] on
    * the original texts exactly — same verdicts, shorter prefixes —
    * without re-reading or re-shingling a byte of text. `gMeta` is the
    * live postings' g metadata (k, t travel with the index so the
    * probes' loud param guards survive the heal). */
  def rebuildPrefixIndex(gramsTable: DataFrame,
                         gMeta: org.apache.spark.sql.types.Metadata,
                         t: Double): (DataFrame, DataFrame, DataFrame) = {
    require(t > 0.0 && t <= 1.0, s"threshold must be in (0,1], got $t")
    val docs = gramsTable
      .select(col("doc_id"), array_distinct(col("grams")).as("grams"))
      .localCheckpoint() // forked: vocab + ordering
    val vocab = docs.select(explode(col("grams")).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("df"))
      .localCheckpoint()
    val ordered = orderedGrams(docs, vocab).localCheckpoint()
    freeBlocks(docs)
    val postings = prefixPostings(ordered, t)
      .select(col("g").as("g", gMeta), col("doc_id"), col("len"), col("pos"))
    (postings,
      ordered.select(col("doc_id"), col("toks").as("grams"), col("len")),
      vocab)
  }

  /** Postings + grams rows for an ACCEPTED batch, under the index's
    * frozen vocabulary — append these to the persisted artifacts and
    * the next batch's probe sees today's accepts (the C2b/C30e growth
    * convention). Pure derivation: append-then-probe equals
    * rebuild-then-probe only on the prefix SELECTION the frozen order
    * pins, which is exactly why the vocab freezes. */
  def appendToPrefixIndex(accepted: DataFrame, vocab: DataFrame,
                          k: Int = 3, t: Double = 0.5)
      : (DataFrame, DataFrame) = {
    val ordered = orderedGrams(shingleSets(accepted, k), vocab)
    // the appended rows carry the SAME g metadata the build stamps
    // (round 18): an appended parquet file without it makes the dir's
    // inferred schema file-order-dependent — probes and the
    // maintenance rebuild would see the k/t params only when the
    // "right" footer wins the schema race
    val meta = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("graft.prefix.k", k.toLong)
      .putDouble("graft.prefix.t", t).build()
    (prefixPostings(ordered, t)
      .select(col("g").as("g", meta), col("doc_id"), col("len"), col("pos")),
      ordered.select(col("doc_id"), col("toks").as("grams"), col("len")))
  }

  /** Day-2 EXACT Jaccard dedup: verdict an incoming batch against the
    * persisted prefix index without re-pairing (or even re-reading the
    * text of) the corpus. Batch docs shingle, order under the index's
    * frozen vocabulary, prefix-index themselves, and join the corpus
    * postings on the shared prefix token — read cell-bucketed, the
    * corpus side never exchanges; only the small batch shuffles.
    * Candidates prune by the length and positional filters (provably
    * non-dropping, as in [[prefixCandidatePairs]]), then verify EXACTLY
    * against the corpus grams table. Unlike the q71 MinHash tier the
    * verdict carries no estimator variance: is_dup is true iff a
    * corpus doc with true Jaccard ≥ t exists.
    *
    * A batch doc matching its own id in the index is a replayed
    * delivery, not a duplicate — excluded, so replays are idempotent
    * (the q71 rule).
    *
    * @return one row per batch doc: (doc_id, is_dup, dup_of = smallest
    *         matching corpus id or -1, best_sim = highest matching
    *         4-dp Jaccard or -1) */
  def dedupAgainstPrefixIndex(newDocs: DataFrame, postings: DataFrame,
                              corpusGrams: DataFrame, vocab: DataFrame,
                              k: Int = 3, t: Double = 0.5): DataFrame = {
    val gField = postings.schema.fields.find(_.name == "g").getOrElse(
      throw new IllegalArgumentException(
        "postings must carry a 'g' column — build them with buildPrefixIndex"))
    if (gField.metadata.contains("graft.prefix.k")) {
      val ik = gField.metadata.getLong("graft.prefix.k")
      val it = gField.metadata.getDouble("graft.prefix.t")
      require(ik == k && it == t,
        s"index was built with k=$ik t=$it but the probe asked for k=$k t=$t — " +
          "prefixes would misalign and duplicates would silently pass")
    }
    val batchDocs = shingleSets(newDocs, k)
    val batchOrdered = orderedGrams(batchDocs, vocab).localCheckpoint()
    val batchPrefix = prefixPostings(batchOrdered, t)
      .select(col("g"), col("doc_id").as("new_id"),
        col("len").as("new_len"), col("pos").as("new_pos"))
    // index-scan pruning (r18 verdict item 1): corpus postings whose g
    // no batch prefix carries can never collide — push the batch's
    // prefix-token set at the bucketed scan so index bytes-read tracks
    // the batch (the prefix posting join is inner on g)
    val corpusPostings = Perf.prunedByKeys(
      postings.select(col("g"), col("doc_id").as("corpus_id"),
        col("len").as("c_len"), col("pos").as("c_pos")),
      "g", batchPrefix)
    val cand = batchPrefix
      .join(corpusPostings, Seq("g"))
      .filter(col("new_id") =!= col("corpus_id"))
      .filter(lengthFilter(col("new_len"), col("c_len"), t))
      .filter(positionalFilter(col("new_len"), col("new_pos"),
        col("c_len"), col("c_pos"), t))
      .select(col("new_id"), col("corpus_id")).distinct()
    val verified = cand
      .join(batchOrdered.select(col("doc_id").as("new_id"), col("toks").as("ga")),
        Seq("new_id"))
      .join(corpusGrams.select(col("doc_id").as("corpus_id"), col("grams").as("gb")),
        Seq("corpus_id"))
      .withColumn("j",
        size(array_intersect(col("ga"), col("gb"))).cast("double") /
          size(array_union(col("ga"), col("gb"))))
      .filter(col("j") >= t)
    Perf.sortedOnce(
      newDocs.select(col("doc_id"))
        .join(verified.groupBy(col("new_id").as("doc_id"))
          .agg(min(col("corpus_id")).as("dup_of"), max(col("j")).as("best_sim")),
          Seq("doc_id"), "left")
        .select(col("doc_id"), col("dup_of").isNotNull.as("is_dup"),
          coalesce(col("dup_of"), lit(-1L)).as("dup_of"),
          coalesce(round(col("best_sim"), 4), lit(-1.0)).as("best_sim")),
      col("doc_id"))
  }

  /** C4c `q147_prefix_verdicts` — [[dedupAgainstPrefixIndex]] over the
    * q71 deterministic 80/20 corpus/batch split. The oracle is the
    * exact batch-vs-corpus shingle Jaccard INCLUDING best_sim — the
    * estimator-free strengthening of q71's verdict (q71 must drop
    * est_sim; the exact tier hash-checks it). */
  def prefixVerdicts(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    val corpus = docs.filter(col("doc_id") % 5 =!= 4)
    val batch = docs.filter(col("doc_id") % 5 === 4)
    val (postings, grams, vocab) = buildPrefixIndex(corpus)
    dedupAgainstPrefixIndex(batch, postings, grams, vocab)
  }

  /** Duplicate-CLUSTER resolution: transitive closure over candidate
    * pairs. Near-dup pair generation finds edges; an LLM-corpus dedup
    * must then collapse each connected component to one canonical
    * document — `perDocVerdict`'s one-hop min-neighbor is not
    * transitive (a–b, b–c leaves c pointing at b, not a).
    *
    * Spark realization: min-label propagation — each iteration is ONE
    * equi-join + ONE aggregation (labels pull the minimum over their
    * neighborhood), with `localCheckpoint` per round so lineage stays
    * flat. Converges in O(component diameter) rounds; near-dup graphs
    * are dense clumps with tiny diameters, so 3–5 rounds is typical.
    * (For adversarially long chains the alternating large-star /
    * small-star variant gives O(log n) rounds — same per-round plan
    * shape.) The per-round convergence probe is a `limit(1).count()` —
    * the driver reads ONE row per round, never the labels.
    *
    * Storage hygiene: each round's labels frame is a fresh
    * `localCheckpoint`; the SUPERSEDED round's blocks are explicitly
    * unpersisted right after the probe (never read again) instead of
    * waiting on GC/ContextCleaner — on a 10⁹-edge graph, N rounds of
    * orphaned label blocks would otherwise pressure executor storage.
    *
    * Non-convergence is an ERROR, not a silent wrong answer: a
    * component whose diameter exceeds `maxIter` would return partial
    * labels that SPLIT clusters (diverging from the transitive-closure
    * contract), so the loop throws if the final probe still saw
    * changes.
    *
    * @param pairs edges as (id_a, id_b)
    * @return (id, rep_id) for every id appearing in `pairs`, rep_id =
    *         the component minimum
    */
  def dupClusters(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val (labels, done) = propagateLabels(symmetricEdges(pairs), maxIter)
    if (!done)
      throw new IllegalStateException(
        s"dupClusters did not converge in $maxIter rounds — a component's diameter exceeds " +
          s"maxIter and the partial labels would split clusters. Raise maxIter (rounds needed " +
          s"= component diameter) or pre-chunk adversarially long chains.")
    labels.select(col("id"), col("rep").as("rep_id"))
  }

  /** Symmetric directed edge list (src, dst) from canonical pairs,
    * materialized once — every propagation round joins against it. */
  private def symmetricEdges(pairs: DataFrame): DataFrame = pairs
    .select(col("id_a").as("src"), col("id_b").as("dst"))
    .unionAll(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
    .distinct()
    .localCheckpoint()

  /** Min-label propagation core: up to `rounds` iterations, returning the
    * final labels and whether a round observed no change (= converged).
    * Each round is one join + one aggregation; the change flag rides the
    * same join so the per-round driver read is a limit(1) probe. */
  private[graft] def propagateLabels(edges: DataFrame, rounds: Int): (DataFrame, Boolean) = {
    var checkpointed = edges.select(col("src").as("id")).distinct()
      .withColumn("rep", col("id"))
      .localCheckpoint()
    var labels = checkpointed
    var iter = 0
    var done = false
    while (!done && iter < rounds) {
      val nbrMin = edges
        .join(labels.select(col("id").as("dst"), col("rep").as("nrep")), "dst")
        .groupBy(col("src")).agg(min(col("nrep")).as("min_nrep"))
      // the change flag rides the same join — no second labels join to
      // detect convergence, and the limit(1) probe reads at most one row
      val next = labels
        .join(nbrMin.select(col("src").as("id"), col("min_nrep")), Seq("id"), "left")
        .select(col("id"),
          least(col("rep"), coalesce(col("min_nrep"), col("rep"))).as("rep"),
          (col("min_nrep") < col("rep")).as("chg"))
        .localCheckpoint()
      val changed = next.filter(col("chg")).limit(1).count()
      freeBlocks(checkpointed)
      checkpointed = next
      labels = next.select(col("id"), col("rep"))
      done = changed == 0
      iter += 1
    }
    (labels, done)
  }

  /** O(log n)-round connected components — the alternating large-star /
    * small-star algorithm (Kiveris et al., "Connected Components in
    * MapReduce and Beyond", public algorithm) for ADVERSARIAL graphs
    * whose diameter defeats [[dupClusters]]'s O(diameter) label
    * propagation (e.g. a 200-node near-dup chain: 199 propagation
    * rounds vs ~8 star alternations).
    *
    *  - large-star: every node points its LARGER neighbors at its
    *    neighborhood minimum (halves tree height);
    *  - small-star: every node points its smaller-or-equal neighbors
    *    (and itself) at their minimum (flattens toward the root).
    *
    * Each half-round is one groupBy + one join on the edge list —
    * the same per-round plan shape as [[dupClusters]] — checkpointed
    * with the same storage hygiene. Fixpoint = the canonical edge set
    * stops changing (exact anti-join probe, limit(1)); at fixpoint the
    * edges form stars rooted at each component's minimum id.
    *
    * Same contract as [[dupClusters]]: (id, rep_id) per id appearing in
    * `pairs`, rep_id = component minimum; throws on non-convergence.
    * Default choice guidance: near-dup graphs are clumps — label
    * propagation converges in 3-5 cheap rounds and wins; switch to this
    * variant when components can be long chains. */
  def dupClustersLogN(pairs: DataFrame, maxIter: Int = 30): DataFrame = {
    def canon(df: DataFrame): DataFrame = df
      .select(least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    def bothDirs(e: DataFrame): DataFrame =
      e.select(col("a").as("u"), col("b").as("v"))
        .unionAll(e.select(col("b").as("u"), col("a").as("v")))
    // materialize the INPUT pairs once: the node census and the first
    // canonical edge set both derive from these blocks — without this,
    // the (expensive) upstream pair-generation pipeline would run twice
    val raw = pairs.select(col("id_a").as("a"), col("id_b").as("b")).localCheckpoint()
    // nodes survive as self-star roots even after their star collapses
    val nodes = bothDirs(raw)
      .select(col("u").as("id")).distinct().localCheckpoint()

    var checkpointed = canon(raw).localCheckpoint()
    freeBlocks(raw)
    var edges = checkpointed
    // fixpoint probe cost model: canonical sets are distinct, so
    // next == edges ⟺ |next| == |edges| AND next ⊆ edges. Both facts
    // are derived from blocks the round materializes ANYWAY: the
    // membership tag (was this edge already present?) rides the
    // checkpoint join, and count + tag-scan collapse into ONE tiny
    // aggregate over the in-memory blocks — 2 Spark jobs per round
    // (materialize + probe) instead of the 3 (materialize, count,
    // anti-join) that made q39 the suite's outlier. prevCount starts
    // unknown (-1): round 1 always runs, so nothing is lost.
    var prevCount = -1L
    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      val nbrs = bothDirs(edges)
      // large-star: (v, m(u)) for v > u, m = min(neighborhood ∪ self)
      val mins = nbrs.groupBy(col("u")).agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("mv"), col("u")).as("m"))
      val large = canon(nbrs.filter(col("v") > col("u"))
        .join(mins, "u").select(col("v").as("a"), col("m").as("b")))
      // small-star over the large-star result: smaller neighbors (and
      // self) point at the minimum of that small neighborhood — emitted
      // per edge (join against the per-node min), never collected into
      // arrays, so a collapsing giant star cannot skew a task
      val smallNbrs = bothDirs(large).filter(col("v") < col("u"))
      val mins2 = smallNbrs.groupBy(col("u")).agg(min(col("v")).as("m"))
      val small = smallNbrs.join(mins2, "u")
        .select(col("v").as("a"), col("m").as("b"))
        .unionAll(mins2.select(col("u").as("a"), col("m").as("b")))
      // membership tag fused into the materialization: both sides are
      // hash-partitioned on (a, b) (canon's distinct / the previous
      // checkpoint), so the tag join adds no extra exchange
      val next = canon(small)
        .join(edges.select(col("a"), col("b")).withColumn("seen", lit(1)),
          Seq("a", "b"), "left")
        .localCheckpoint()
      val probe = next.agg(
        count(lit(1)),
        sum(when(col("seen").isNull, 1L).otherwise(0L))).head()
      val nextCount = probe.getLong(0)
      val fresh = if (probe.isNullAt(1)) 0L else probe.getLong(1)
      freeBlocks(checkpointed)
      checkpointed = next
      edges = next.select(col("a"), col("b"))
      done = nextCount == prevCount && fresh == 0L
      prevCount = nextCount
      iter += 1
    }
    if (!done)
      throw new IllegalStateException(
        s"dupClustersLogN did not converge in $maxIter rounds — raise maxIter " +
          s"(rounds needed ~ log2 of the largest component).")
    // at fixpoint every edge is (member, root): rep = min over incident
    // edges, self for isolated roots
    nodes
      .join(bothDirs(edges).groupBy(col("u").as("id")).agg(min(col("v")).as("mn")),
        Seq("id"), "left")
      .select(col("id"), least(col("id"), coalesce(col("mn"), col("id"))).as("rep_id"))
  }

  /** Self-tuning cluster resolution — label propagation's cost profile
    * (one cheap join+agg per round, converges in 3-5 rounds on the dense
    * clumps near-dup graphs actually produce) with [[dupClustersLogN]]'s
    * worst-case guarantee: run propagation for `propagationRounds`; if
    * some component's diameter defeats it, CONTRACT the graph through
    * the partial labels (every edge endpoint → its current label — a
    * valid quotient: the component minimum always labels itself, so it
    * survives contraction as a node) and finish on the much smaller
    * residual graph with star contraction. One operator, best cost
    * profile on both graph shapes, same (id, rep_id) contract.
    *
    * `propagationRounds` must EXCEED the typical clump diameter or the
    * auto path pays the star fixpoint's fixed job cost in exactly the
    * common case it exists to avoid: clump diameter grows (slowly) with
    * corpus size — the sf0.1 near-dup graph already needs 8 rounds
    * where sf0.01 needed 4 — so the budget is 10, converging early on
    * small graphs (propagation exits on the first no-change round) and
    * bounding the waste on a true chain to ten cheap join+agg rounds
    * before the switch. */
  def dupClustersAuto(pairs: DataFrame, propagationRounds: Int = 10,
                      maxIter: Int = 30): DataFrame = {
    val edges = symmetricEdges(pairs)
    val (labels, done) = propagateLabels(edges, propagationRounds)
    if (done) labels.select(col("id"), col("rep").as("rep_id"))
    else {
      val contracted = edges
        .join(labels.select(col("id").as("src"), col("rep").as("ra")), "src")
        .join(labels.select(col("id").as("dst"), col("rep").as("rb")), "dst")
        .select(col("ra").as("id_a"), col("rb").as("id_b"))
        .filter(col("id_a") =!= col("id_b"))
      val roots = dupClustersLogN(contracted, maxIter)
        .select(col("id").as("rep"), col("rep_id").as("root"))
      // compose id → rep → root; labels whose rep collapsed out of the
      // residual graph (its whole cluster already contracted) keep rep
      labels.join(roots, Seq("rep"), "left")
        .select(col("id"), coalesce(col("root"), col("rep")).as("rep_id"))
    }
  }

  /** `q37_dup_clusters` — connected components over the embedding
    * near-dup pairs (q24's edges): every vector in a duplicate cluster
    * maps to the cluster's minimum vec_id. Oracle: DuckDB recursive CTE
    * reachability over the same pair predicate. */
  def dupClustersEmbeddings(spark: SparkSession, dir: String): DataFrame =
    Perf.sortedOnce(
      dupClusters(Similarity.embeddingNearDup(spark, dir).select(col("id_a"), col("id_b"))),
      col("id"))

  /** `q39_dup_clusters_logn` — the same connected-components contract
    * computed by the large-star/small-star variant; shares q37's
    * recursive-CTE oracle, so BOTH algorithms are value-checked against
    * the same ground truth. */
  def dupClustersEmbeddingsLogN(spark: SparkSession, dir: String): DataFrame =
    Perf.sortedOnce(
      dupClustersLogN(Similarity.embeddingNearDup(spark, dir).select(col("id_a"), col("id_b"))),
      col("id"))

  /** `q42_dup_clusters_auto` — the self-tuning variant on the same
    * edges, again sharing q37's recursive-CTE oracle: all THREE cluster
    * algorithms are value-checked against one ground truth. */
  def dupClustersEmbeddingsAuto(spark: SparkSession, dir: String): DataFrame =
    Perf.sortedOnce(
      dupClustersAuto(Similarity.embeddingNearDup(spark, dir).select(col("id_a"), col("id_b"))),
      col("id"))

  /** Exact repeated-SUBSTRING removal — the ExactSubstr rule (Lee et
    * al., "Deduplicating Training Data Makes Language Models Better"):
    * any verbatim token run of length ≥ `k` appearing in more than
    * `maxDocs` distinct documents is removed from EVERY document (all
    * copies go — the paper's choice; pair with [[pickRepresentatives]]
    * when one canonical copy should survive at the document grain).
    * Whole-document near-dup misses a boilerplate paragraph QUOTED
    * inside an otherwise-unique page; this catches the span itself.
    *
    * Mechanics: every k-token window hashes to 64 bits (the C2c
    * hashed-window precedent — census keys are 8-byte hashes, never
    * text). The kernel length-prefixes each token, so two windows
    * collide only by 64-bit hash accident, ~(windows²)/2⁶⁴ — at that
    * rate a collision marks an innocent window hot and cuts it from
    * its documents. `verified = true` closes even that gap: hashes
    * that census hot are RE-CHECKED BY TOKEN CONTENT before any cut —
    * only (hash, exact-text) occurrences repeated across > maxDocs
    * docs are removed, so an innocent window sharing a hash with a
    * genuinely-hot one survives. The re-check touches ONLY hot-hash
    * windows (a vanishing fraction of the corpus), so the verified
    * mode costs one extra join over a tiny frame. The registered q70
    * query is oracle-checked end-to-end against a string-keyed census;
    * unverified direct calls carry the probabilistic bound.
    * ONE window-hash census finds the hot windows, and
    * a token is removed iff some hot window covers it — a per-doc
    * trailing ROWS max over the dense token positions, one exchange.
    * Tokens reassemble in order; empty split tokens are kept so
    * positions stay dense and both engines see identical spans.
    *
    * Scale shape: the token-array frame materializes once (token rows
    * AND window rows fork from it), the census and hot-start joins key
    * on the hash, the coverage join keys on (id, pos), and the
    * reassembly groupBy is bounded per doc — no corpus-sized state
    * anywhere.
    */
  def dropRepeatedSpans(docs: DataFrame, idCol: String, textCol: String,
                        k: Int = 6, maxDocs: Int = 1,
                        sep: String = " ", verified: Boolean = false): DataFrame = {
    require(k >= 2, s"k must be >= 2 (a 1-token span is a stopword filter), got $k")
    require(maxDocs >= 1, s"maxDocs must be >= 1, got $maxDocs")
    val arr = tokenArrays(docs, idCol, textCol, sep).localCheckpoint()
    val wins = spanWindows(arr, idCol, k)
    val hot = wins
      .groupBy(col("whash"))
      .agg(countDistinct(col(idCol)).as("_nd"))
      .filter(col("_nd") > maxDocs)
      .select(col("whash"), lit(true).as("_hot"))
    if (!verified)
      removeCoveredSpans(arr, wins, hot, idCol, textCol, k, sep)
    else {
      // refetch the ACTUAL tokens of hot-hash windows only and
      // re-census at (hash, exact text) grain: a 64-bit collision puts
      // two different texts under one hash, and only the text repeated
      // across > maxDocs docs gets its occurrences cut
      val withText = wins.join(hot, Seq("whash"))
        .join(arr, Seq(idCol))
        .select(col(idCol), col("wstart"), col("whash"),
          array_join(slice(col("_toks"), col("wstart") + 1, lit(k)), sep).as("_wtext"))
      val verifiedKeys = withText
        .groupBy(col("whash"), col("_wtext"))
        .agg(countDistinct(col(idCol)).as("_nd"))
        .filter(col("_nd") > maxDocs)
        .select(col("whash"), col("_wtext"))
      val hotStarts = withText.join(verifiedKeys, Seq("whash", "_wtext"))
        .select(col(idCol), col("wstart"), lit(true).as("_hs"))
      removeCoveredSpansFromStarts(arr, hotStarts, idCol, textCol, k, sep)
    }
  }

  /** Token-array frame shared by the one-shot span rule and every span
    * census producer — probe correctness depends on all of them
    * splitting identically. */
  private def tokenArrays(docs: DataFrame, idCol: String, textCol: String,
                          sep: String, extraCols: Seq[String] = Nil): DataFrame =
    // kernelSpread (r19): the span-window kernel downstream hashes
    // every k-token window — spread the doc stream off the
    // single-row-group scan first (guide §2.5)
    Perf.kernelSpread(docs.select(col(idCol) +: extraCols.map(col) :+
        col(textCol): _*))
      .select(col(idCol) +: extraCols.map(col) :+
        split(col(textCol), java.util.regex.Pattern.quote(sep)).as("_toks"): _*)

  /** (id, wstart, whash) per k-token window. The native kernel emits
    * one 64-bit hash per window start (array index = start; empty below
    * k tokens) with zero window-string allocation — the O(n·k)
    * concat_ws/slice/xxhash64 formulation this replaces materialized
    * every window as a string first. posexplode of the result IS the
    * (wstart, whash) frame. */
  private def spanWindows(arr: DataFrame, idCol: String, k: Int,
                          extraCols: Seq[String] = Nil): DataFrame =
    arr
      .select(col(idCol) +: extraCols.map(col) :+
        posexplode(call_function("graft_span_windows", col("_toks"), lit(k))): _*)
      .withColumnRenamed("pos", "wstart")
      .withColumnRenamed("col", "whash")

  /** (id, extras..., wstart, whash) from raw docs — the streaming census
    * twin's projection. DELIBERATELY composed from [[tokenArrays]] +
    * [[spanWindows]]: the maintained census is probe-correct only if
    * the stream and the batch paths split and hash identically,
    * forever. */
  private[graft] def explodeSpanWindows(docs: DataFrame, idCol: String, textCol: String,
                                        k: Int, sep: String,
                                        extraCols: Seq[String] = Nil): DataFrame =
    spanWindows(tokenArrays(docs, idCol, textCol, sep, extraCols), idCol, k, extraCols)

  /** Cut every token covered by a hot window and reassemble: a per-doc
    * trailing ROWS max over the dense token positions marks coverage
    * (one exchange), tokens rejoin in order, and the trailing id-only
    * join resurrects docs that collapsed to empty. Shared by the
    * one-shot rule and the census probe — the verdict semantics live
    * here, the two callers differ only in how windows become hot. */
  private def removeCoveredSpans(arr: DataFrame, wins: DataFrame, hot: DataFrame,
                                 idCol: String, textCol: String,
                                 k: Int, sep: String): DataFrame =
    removeCoveredSpansFromStarts(arr,
      wins.join(hot, Seq("whash"), "left")
        .select(col(idCol), col("wstart"), coalesce(col("_hot"), lit(false)).as("_hs")),
      idCol, textCol, k, sep)

  /** [[removeCoveredSpans]] from an already-resolved hot-start frame
    * (id, wstart, _hs) — the verified mode resolves hotness at
    * (hash, exact-text) occurrence grain instead of hash grain. */
  private def removeCoveredSpansFromStarts(arr: DataFrame, hotStarts: DataFrame,
                                           idCol: String, textCol: String,
                                           k: Int, sep: String): DataFrame = {
    val tokRows = arr.select(col(idCol), posexplode(col("_toks"))).toDF(idCol, "pos", "tok")
    val covW = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(-(k - 1), 0)
    val covered = tokRows
      .join(hotStarts, tokRows(idCol) === hotStarts(idCol) &&
        col("pos") === col("wstart"), "left")
      .select(tokRows(idCol).as(idCol), col("pos"), col("tok"),
        coalesce(col("_hs"), lit(false)).as("_hs"))
      .withColumn("_cov", max(when(col("_hs"), 1).otherwise(0)).over(covW) > 0)
    val rebuilt = covered
      .filter(!col("_cov"))
      .groupBy(col(idCol))
      .agg(
        array_join(transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
          x => x.getField("tok")), sep).as("_clean"),
        count(lit(1)).as("_n_kept"))
    arr
      .select(col(idCol), size(col("_toks")).cast("long").as("n_tokens"))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("_clean"), lit("")).as(textCol),
        col("n_tokens"),
        (col("n_tokens") - coalesce(col("_n_kept"), lit(0L))).cast("long").as("n_removed"))
  }

  /** `q70_span_dedup` — ExactSubstr over the documents table: 6-token
    * verbatim runs shared by ≥ 2 documents are cut from all of them
    * (the corpus's planted near-duplicates share long runs, so the rule
    * has real work: ~1k hot windows across ~50 docs at sf0.01). */
  def spanDedupDocs(spark: SparkSession, dir: String): DataFrame =
    Perf.sortedOnce(
      dropRepeatedSpans(Tables(spark, dir).documents.select(col("doc_id"), col("text")),
        "doc_id", "text", k = 6, maxDocs = 1),
      col("doc_id"))

  /** Persistable SPAN census — ExactSubstr's day-2 shape, the window-
    * grain sibling of [[buildParagraphCensus]]: (whash, n_docs)
    * distinct-document counts per k-token window hash, |distinct
    * windows| rows of two longs, never the text. Write it once
    * (bucketed by whash to keep probe-side exchanges off the census),
    * then each new batch probes WITHOUT rescanning the corpus — the
    * one-shot [[dropRepeatedSpans]] re-hashes the whole corpus per run,
    * which at 100 TB is a day-1 tool only. Both k and sep ride the
    * whash column's schema metadata so a probe tokenizing differently
    * (or hashing different-width windows) fails loudly instead of
    * silently matching nothing. */
  def buildSpanCensus(docs: DataFrame, idCol: String, textCol: String,
                      k: Int = 6, sep: String = " "): DataFrame = {
    require(k >= 2, s"k must be >= 2 (a 1-token span is a stopword filter), got $k")
    val meta = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("graft.spancensus.k", k.toLong)
      .putString("graft.spancensus.sep", sep).build()
    spanWindows(tokenArrays(docs, idCol, textCol, sep), idCol, k)
      .groupBy(col("whash"))
      .agg(countDistinct(col(idCol)).as("n_docs"))
      .select(col("whash").as("whash", meta), col("n_docs"))
  }

  /** Merge a day's span-census delta into the corpus census. CONTRACT
    * (same as [[mergeParagraphCensus]]): the two censuses cover
    * DISJOINT document sets, so distinct counts add exactly; the merge
    * is associative and any day ordering lands the same table. Guards
    * that both sides were built with the same (k, sep). */
  def mergeSpanCensus(census: DataFrame, delta: DataFrame): DataFrame = {
    val params = Seq(census, delta).map(spanCensusParams)
    (params(0), params(1)) match {
      case (Some((k1, s1)), Some((k2, s2))) =>
        require(k1 == k2 && s1 == s2,
          s"span censuses differ: k=$k1 sep=${escapeSep(s1)} vs k=$k2 sep=${escapeSep(s2)}")
      case _ => ()
    }
    val metas = Seq(census, delta).map(_.schema("whash").metadata)
    val meta = metas.find(_.contains("graft.spancensus.k")).getOrElse(metas.head)
    census.select(col("whash"), col("n_docs"))
      .unionByName(delta.select(col("whash"), col("n_docs")))
      .groupBy(col("whash"))
      .agg(sum(col("n_docs")).as("n_docs"))
      .select(col("whash").as("whash", meta), col("n_docs"))
  }

  /** Probe an incoming batch against the persisted span census: a
    * window is hot when its corpus count PLUS its batch distinct-doc
    * count crosses `maxDocs`, so cross-boundary repeats (once in the
    * corpus, once in the batch) are cut exactly as a full re-census
    * would cut them — probe-vs-full parity is spec-asserted. Only the
    * batch tokenizes and shuffles; the census joins on the 8-byte
    * hash. Returns the [[dropRepeatedSpans]] contract (id, text,
    * n_tokens, n_removed) for the BATCH docs only — corpus copies of a
    * newly-hot span are cleaned when their partition is next rewritten,
    * the same day-2 convention as the paragraph rule.
    *
    * CONTRACT (same as [[dropRepeatedParagraphsAgainstCensus]]): the
    * batch's documents are NOT already counted in the census — probe a
    * batch BEFORE folding its census delta in. */
  def dropRepeatedSpansAgainstCensus(batch: DataFrame, census: DataFrame,
                                     idCol: String, textCol: String,
                                     k: Int = 6, maxDocs: Int = 1,
                                     sep: String = " "): DataFrame = {
    require(k >= 2, s"k must be >= 2 (a 1-token span is a stopword filter), got $k")
    require(maxDocs >= 1, s"maxDocs must be >= 1, got $maxDocs")
    spanCensusParams(census).foreach { case (ck, cs) =>
      require(ck == k && cs == sep,
        s"census was built with k=$ck sep=${escapeSep(cs)} but the probe asked for " +
          s"k=$k sep=${escapeSep(sep)} — window hashes would not align and every " +
          "repeated span would silently pass")
    }
    val arr = tokenArrays(batch, idCol, textCol, sep).localCheckpoint()
    val wins = spanWindows(arr, idCol, k)
    val hot = wins
      .groupBy(col("whash"))
      .agg(countDistinct(col(idCol)).as("_bn"))
      .join(census.select(col("whash"), col("n_docs")), Seq("whash"), "left")
      .filter(col("_bn") + coalesce(col("n_docs"), lit(0L)) > maxDocs)
      .select(col("whash"), lit(true).as("_hot"))
    removeCoveredSpans(arr, wins, hot, idCol, textCol, k, sep)
  }

  /** `q75_span_census_probe` — the ExactSubstr DAY-2 path end-to-end
    * over a deterministic 80/20 corpus/batch split of the documents
    * table (doc_id mod 5): build the span census on the corpus side,
    * probe the batch against it. The q71 pattern at span grain — the
    * cross-boundary rule (corpus count + batch count crosses maxDocs)
    * is exactly what the one-shot q70 cannot exercise. */
  def spanCensusProbeDocs(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents.select(col("doc_id"), col("text"))
    val census = buildSpanCensus(docs.filter(col("doc_id") % 5 =!= 0), "doc_id", "text", k = 6)
    Perf.sortedOnce(
      dropRepeatedSpansAgainstCensus(docs.filter(col("doc_id") % 5 === 0), census,
        "doc_id", "text", k = 6, maxDocs = 1),
      col("doc_id"))
  }

  private def spanCensusParams(census: DataFrame): Option[(Int, String)] = {
    val m = census.schema("whash").metadata
    if (m.contains("graft.spancensus.k") && m.contains("graft.spancensus.sep"))
      Some((m.getLong("graft.spancensus.k").toInt, m.getString("graft.spancensus.sep")))
    else None
  }

  /** Quality-aware canonical selection — the curation rule dedup
    * exists to serve: inside each duplicate cluster keep the
    * HIGHEST-QUALITY copy, not the lowest-numbered one (min-id
    * representatives are a graph-algorithm artifact, not an editorial
    * choice). Ties break on the id, so the election is total and
    * engine-independent when the score is pre-rounded.
    *
    * `clusters` = (idCol, clusterCol) assignments (any of the three
    * dupClusters variants); `scores` = (idCol, scoreCol). One id-keyed
    * join + one window over the cluster partitioning — the frames are
    * |clustered docs|-sized, not corpus-sized.
    *
    * Scores join LEFT: a cluster member with no score row stays in the
    * output (null score) and ranks BEHIND every scored sibling — an
    * inner join would silently erase it, letting a missing metric
    * delete a document from the election entirely. An all-unscored
    * cluster still elects its min id, so the election stays total. */
  def pickRepresentatives(clusters: DataFrame, scores: DataFrame,
                          idCol: String = "id", clusterCol: String = "rep_id",
                          scoreCol: String = "score"): DataFrame = {
    val w = Window.partitionBy(col(clusterCol))
      .orderBy(col(scoreCol).desc_nulls_last, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    clusters
      .join(scores.select(col(idCol), col(scoreCol)), Seq(idCol), "left")
      .withColumn("canonical_id", first(col(idCol)).over(w))
      .withColumn("is_canonical", col(idCol) === col("canonical_id"))
  }

  /** `q69_canonical_docs` — the dedup-curation pipeline end-to-end:
    * embedding near-dup clusters (q37's machinery) re-elect their
    * representatives by the q28 quality score (vec_id indexes the
    * parallel documents row). The whole composite is oracle-checked:
    * recursive-CTE reachability + the shared quality CTEs + a window
    * argmax compose the same answer in DuckDB. */
  def canonicalDocsEmbeddings(spark: SparkSession, dir: String): DataFrame = {
    val clusters =
      dupClusters(Similarity.embeddingNearDup(spark, dir).select(col("id_a"), col("id_b")))
        .withColumnRenamed("rep_id", "cluster_id")
    val scores = TextAnalysis.qualityScoreDocs(Tables(spark, dir).documents)
      .select(col("doc_id").as("id"), col("quality_score"))
    Perf.sortedOnce(
      pickRepresentatives(clusters, scores,
        idCol = "id", clusterCol = "cluster_id", scoreCol = "quality_score")
        .select(col("id"), col("cluster_id"), col("quality_score"),
          col("canonical_id"), col("is_canonical")),
      col("id"))
  }

  /** Corpus-level repeated-paragraph removal — the RefinedWeb/CCNet
    * boilerplate rule, the line-grain sibling of document-level dedup: a
    * paragraph appearing in MORE than `maxDocs` distinct documents is
    * boilerplate (nav bars, cookie banners, legal footers) and is
    * dropped from EVERY document; each document reassembles from its
    * surviving paragraphs in original order. Blank paragraphs (empty
    * splits) are whitespace, not content — they drop in normalization
    * and never vote in the census.
    *
    * Returns (idCol, textCol cleaned, n_kept, n_dropped) — every input
    * document survives, possibly with empty text (all-boilerplate pages
    * are a real outcome the caller may want to filter on).
    *
    * Scale shape: the exploded paragraph frame MATERIALIZES once
    * (localCheckpoint — the census groupBy, the hot join, and the
    * per-doc counts all fork from it, and lazily each fork would
    * re-derive the caller's input; for q68 that input is itself a
    * 3-way self-join), then ONE paragraph-keyed census groupBy, one
    * left join of the tiny hot set back on the same key (AQE
    * broadcasts it — boilerplate sets are small by definition), and
    * one doc-keyed reassembly groupBy computing counts AND ordered
    * text in the same aggregate; collect_list is bounded by the
    * document's own paragraph count — the same per-row bound the input
    * already had. The trailing id-only join resurrects documents with
    * zero non-blank paragraphs and is column-pruned to the id.
    */
  def dropRepeatedParagraphs(docs: DataFrame, idCol: String, textCol: String,
                             maxDocs: Int = 2, sep: String = "\n"): DataFrame = {
    require(maxDocs >= 1, s"maxDocs must be >= 1, got $maxDocs")
    val parts = explodeParagraphs(docs, idCol, textCol, sep).localCheckpoint()
    val hot = parts
      .groupBy(col("para_hash"))
      .agg(countDistinct(col(idCol)).as("_nd"))
      .filter(col("_nd") > maxDocs)
      .select(col("para_hash"), lit(true).as("_hot"))
    reassembleKept(docs, parts, hot, idCol, textCol, sep)
  }

  /** Paragraph fan-out shared by the batch rule, the census paths, AND
    * the streaming census twin (private[graft] so EventsStream reuses
    * THIS normalization — probe correctness depends on every census
    * producer splitting, blank-filtering, and hashing identically):
    * non-blank paragraphs with position and a 64-bit identity hash
    * (xxhash64 — the C2c hashed-window precedent). All census shuffles
    * and joins key on the 8-byte hash, never the paragraph text.
    * `extraCols` carry through untouched (the streaming twin keeps its
    * event-time column for the watermark). */
  private[graft] def explodeParagraphs(docs: DataFrame, idCol: String, textCol: String,
                                       sep: String,
                                       extraCols: Seq[String] = Nil): DataFrame =
    docs
      .select(col(idCol) +: extraCols.map(col) :+
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep))): _*)
      .withColumnRenamed("col", "para")
      .filter(length(col("para")) > 0)
      .withColumn("para_hash", xxhash64(col("para")))

  /** Rebuild documents from a (checkpointed) paragraph frame minus the
    * hot set: one doc-keyed groupBy computing ordered text and counts
    * in the same aggregate, then the pruned id-only join resurrects
    * documents with zero surviving (or zero non-blank) paragraphs. */
  private def reassembleKept(docs: DataFrame, parts: DataFrame, hot: DataFrame,
                             idCol: String, textCol: String, sep: String): DataFrame = {
    val rebuilt = parts
      .join(hot, Seq("para_hash"), "left")
      .withColumn("_keep", col("_hot").isNull)
      .groupBy(col(idCol))
      .agg(
        array_join(
          transform(
            filter(array_sort(collect_list(struct(col("pos"), col("para"), col("_keep")))),
              x => x.getField("_keep")),
            x => x.getField("para")), sep).as("_clean"),
        sum(when(col("_keep"), 1L).otherwise(0L)).as("n_kept"),
        count(lit(1)).as("_n_paras"))
    docs
      .select(col(idCol))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("_clean"), lit("")).as(textCol),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (coalesce(col("_n_paras"), lit(0L)) - coalesce(col("n_kept"), lit(0L)))
          .cast("long").as("n_dropped"))
  }

  /** Persistable paragraph census — the day-2 shape for the boilerplate
    * rule at 100 TB (the C2b incremental-index pattern): (para_hash,
    * n_docs) distinct-document counts, |distinct paragraphs| rows of
    * two longs, never the text. Write it once (bucketed by para_hash if
    * probes should keep the census side exchange-free, like the minhash
    * index), then each new batch probes WITHOUT rescanning the corpus.
    * The separator rides the para_hash column's schema metadata so a
    * probe splitting differently fails loudly instead of silently
    * matching nothing. */
  def buildParagraphCensus(docs: DataFrame, idCol: String, textCol: String,
                           sep: String = "\n"): DataFrame = {
    val meta = new org.apache.spark.sql.types.MetadataBuilder()
      .putString("graft.paracensus.sep", sep).build()
    explodeParagraphs(docs, idCol, textCol, sep)
      .groupBy(col("para_hash"))
      .agg(countDistinct(col(idCol)).as("n_docs"))
      .select(col("para_hash").as("para_hash", meta), col("n_docs"))
  }

  /** Merge a day's census delta into the corpus census. CONTRACT: the
    * two censuses cover DISJOINT document sets (day batches) — distinct
    * counts then add exactly; overlapping doc sets would double-count.
    * Counts are plain sums, so the merge is associative and any day
    * ordering lands the same table. */
  def mergeParagraphCensus(census: DataFrame, delta: DataFrame): DataFrame = {
    requireSameCensusSep(census, delta)
    // keep whichever side still carries the separator guard: a census
    // rewritten by a non-Spark tool may have lost its schema metadata,
    // and taking only the census side's would strip the guard from
    // every later merge output
    val metas = Seq(census, delta).map(_.schema("para_hash").metadata)
    val meta = metas.find(_.contains("graft.paracensus.sep")).getOrElse(metas.head)
    census.select(col("para_hash"), col("n_docs"))
      .unionByName(delta.select(col("para_hash"), col("n_docs")))
      .groupBy(col("para_hash"))
      .agg(sum(col("n_docs")).as("n_docs"))
      .select(col("para_hash").as("para_hash", meta), col("n_docs"))
  }

  /** Probe an incoming batch against the persisted census: a paragraph
    * is boilerplate when its corpus count PLUS its batch count crosses
    * `maxDocs` — so cross-boundary repeats (twice in the corpus, once
    * in the batch) are caught exactly as a full re-census would. Only
    * the batch explodes and shuffles; the census joins on the 8-byte
    * hash (bucketed storage keeps even that exchange off the census
    * side). Returns the same (id, text, n_kept, n_dropped) contract as
    * [[dropRepeatedParagraphs]], for the BATCH docs only.
    *
    * CONTRACT (same as [[mergeParagraphCensus]]): the batch's documents
    * are NOT already counted in the census — a re-delivered document
    * would vote twice and could push a threshold-boundary paragraph
    * over the line. Exactly-once delivery belongs to the ingest layer:
    * the streaming twin's day-complete partition overwrites give it,
    * and batch pipelines should probe a batch BEFORE folding its
    * census delta in. */
  def dropRepeatedParagraphsAgainstCensus(batch: DataFrame, census: DataFrame,
                                          idCol: String, textCol: String,
                                          maxDocs: Int = 2,
                                          sep: String = "\n"): DataFrame = {
    require(maxDocs >= 1, s"maxDocs must be >= 1, got $maxDocs")
    val f = census.schema("para_hash")
    if (f.metadata.contains("graft.paracensus.sep")) {
      val indexSep = f.metadata.getString("graft.paracensus.sep")
      require(indexSep == sep,
        s"census was built with sep=${escapeSep(indexSep)}, probe uses sep=${escapeSep(sep)}")
    }
    val parts = explodeParagraphs(batch, idCol, textCol, sep).localCheckpoint()
    val hot = parts
      .groupBy(col("para_hash"))
      .agg(countDistinct(col(idCol)).as("_bn"))
      .join(census.select(col("para_hash"), col("n_docs")), Seq("para_hash"), "left")
      .filter(col("_bn") + coalesce(col("n_docs"), lit(0L)) > maxDocs)
      .select(col("para_hash"), lit(true).as("_hot"))
    reassembleKept(batch, parts, hot, idCol, textCol, sep)
  }

  /** Roll a DAY-PARTITIONED census table (the streaming twin's layout,
    * one (para_hash, n_docs) delta per ingest day) up to the probe's
    * corpus-total shape. Day deltas cover disjoint doc sets by
    * construction, so the sum is the exact distinct count; the
    * separator metadata from the stored schema rides through. */
  def loadParagraphCensus(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.parquet(path)
    val meta = raw.schema("para_hash").metadata
    raw.groupBy(col("para_hash"))
      .agg(sum(col("n_docs")).as("n_docs"))
      .select(col("para_hash").as("para_hash", meta), col("n_docs"))
  }

  /** Roll a DAY-PARTITIONED span census (the streaming twin's layout,
    * one (whash, n_docs) delta per ingest day) up to the probe's
    * corpus-total shape — [[loadParagraphCensus]] at window grain. Day
    * deltas cover disjoint doc sets by construction, so the sum is the
    * exact distinct count; (k, sep) metadata rides through from the
    * stored schema, keeping the probe's loud-mismatch guard armed. */
  def loadSpanCensus(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.parquet(path)
    val meta = raw.schema("whash").metadata
    raw.groupBy(col("whash"))
      .agg(sum(col("n_docs")).as("n_docs"))
      .select(col("whash").as("whash", meta), col("n_docs"))
  }

  private def requireSameCensusSep(a: DataFrame, b: DataFrame): Unit = {
    def sepOf(df: DataFrame): Option[String] = {
      val m = df.schema("para_hash").metadata
      if (m.contains("graft.paracensus.sep")) Some(m.getString("graft.paracensus.sep")) else None
    }
    (sepOf(a), sepOf(b)) match {
      case (Some(x), Some(y)) =>
        require(x == y, s"census separators differ: ${escapeSep(x)} vs ${escapeSep(y)}")
      case _ => ()
    }
  }

  private def escapeSep(s: String): String =
    "\"" + s.flatMap {
      case '\n' => "\\n"
      case '\t' => "\\t"
      case '\r' => "\\r"
      case c => c.toString
    } + "\""

  /** `q68_paragraph_dedup` — the boilerplate rule exercised on derived
    * multi-paragraph "pages": page p = documents p, p+1, p+2 joined by
    * newline (the q61/q62 pattern of deriving structured inputs from a
    * base table — every document text is a paragraph of up to three
    * consecutive pages, so inner paragraphs repeat across 3 pages and
    * cross the maxDocs=2 threshold while boundary paragraphs survive).
    * The page build is two id-shifted equi self-joins, no window. */
  def paragraphDedupPages(spark: SparkSession, dir: String): DataFrame =
    dropRepeatedParagraphs(derivedPages(spark, dir), "page_id", "text",
      maxDocs = 2, sep = "\n")
      .orderBy(col("page_id"))

  /** The q68 derived-page frame (3 consecutive docs per page, so inner
    * docs' paragraphs genuinely repeat across up to 3 pages) — shared
    * by the one-shot rule and the census probe so both exercise the
    * same planted repetition structure. */
  private def derivedPages(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents.select(col("doc_id"), col("text"))
    val p0 = d.select(col("doc_id").as("page_id"), col("text").as("t0"))
    val p1 = d.select((col("doc_id") - 1).as("page_id"), col("text").as("t1"))
    val p2 = d.select((col("doc_id") - 2).as("page_id"), col("text").as("t2"))
    p0.join(p1, Seq("page_id")).join(p2, Seq("page_id"))
      .select(col("page_id"), concat_ws("\n", col("t0"), col("t1"), col("t2")).as("text"))
  }

  /** `q76_paragraph_census_probe` — the C2d DAY-2 path end-to-end over
    * the derived pages, completing the probe family (q71 minhash, q75
    * span, q76 paragraph): census on the 80% corpus pages, 20% batch
    * pages probed, cross-boundary hotness = corpus + batch distinct
    * counts crossing maxDocs. A page's inner paragraphs sit in up to 3
    * pages, so a batch page's paragraph with 2 corpus appearances goes
    * hot only through the SUM — the boundary rule carries the signal. */
  def paragraphCensusProbePages(spark: SparkSession, dir: String): DataFrame = {
    val pages = derivedPages(spark, dir)
    val census = buildParagraphCensus(pages.filter(col("page_id") % 5 =!= 0), "page_id", "text")
    dropRepeatedParagraphsAgainstCensus(pages.filter(col("page_id") % 5 === 0), census,
      "page_id", "text", maxDocs = 2)
      .transform(d => Perf.sortedOnce(d, col("page_id")))
  }

  // ---- C11b: winnowing local fingerprints ------------------------------

  /** C11b: WINNOWING local fingerprints (Schleimer, Wilkerson & Aiken,
    * SIGMOD 2003 — the MOSS algorithm): character k-gram hashes, one
    * selected per window of w consecutive grams (the minimum; ties
    * break to the RIGHTMOST occurrence — the paper's robust-winnowing
    * rule, which makes the selection a pure function of the local
    * hash landscape). The selected set is POSITION-AWARE partial-
    * overlap evidence the document-level families can't give: C11
    * fingerprints whole documents, minhash estimates whole-set
    * Jaccard, the 13-gram decontamination rule targets a fixed eval
    * suite — winnowing finds a shared SPAN between any two corpus
    * documents while retaining only ~2/(w+1) of the grams (the
    * paper's density bound; the q145 exact tier keeps every gram).
    * Guarantees: any shared substring of length ≥ k + w − 1 yields at
    * least one common fingerprint, and no shared fingerprint arises
    * without a shared k-gram (hash collisions aside — hashes ride the
    * portable 60-bit md5 convention, so the oracle selects the SAME
    * minima and a collision would fail the hash compare loudly).
    *
    * Scale shape: selection NEVER LEAVES THE ROW. The native kernel
    * expression ([[graft.expressions.Kernels.winnowSelect]], inside
    * whole-stage codegen) hashes each doc's grams and picks every
    * window minimum in one JVM pass, and only the ~2/(w+1)-dense
    * SELECTED set explodes to rows — zero shuffles until a consumer
    * joins postings. (The first cut exploded every gram through a ×w
    * window-membership fan-out and a (doc, window) exchange — at 10×
    * that exchange dominated, and selection being doc-local means it
    * never needed to exist. The declarative rewrite — per-window
    * `aggregate` folds over an array slice — still paid ~10 s at 10×
    * in interpreted higher-order lambdas and `conv`'s per-gram hex
    * parse; the kernel is bit-identical and sub-second, and the
    * equivalence is spec-pinned against the declarative formulation.)
    * Docs shorter than k + w − 1 normalized chars carry no window and
    * drop (stated, not padded).
    *
    * @return (doc_id, pos, h): 1-based gram position and selected hash */
  def winnowFingerprints(docs: DataFrame, idCol: String = "doc_id",
                         textCol: String = "text",
                         k: Int = 12, w: Int = 4): DataFrame = {
    require(k >= 2 && k <= 64, s"gram size k must be in 2..64, got $k")
    require(w >= 2 && w <= 64, s"window w must be in 2..64, got $w")
    val norm = regexp_replace(lower(trim(col("_raw"))), "\\s+", " ")
    // kernelSpread (r19): the selection kernel md5-hashes EVERY gram
    // position of every doc — the most CPU per input byte of any text
    // kernel here — and a single-row-group scan would run it on one
    // core (guide §2.5; measured 1-task 2.5 s at sf0.1 on 32 cores)
    Perf.kernelSpread(docs.select(col(idCol).as("doc_id"),
        col(textCol).as("_raw")))
      .select(col("doc_id"), norm.as("_t"))
      .filter(length(col("_t")) >= k + w - 1)
      .select(col("doc_id"),
        explode(call_function("graft_winnow_select",
          col("_t"), lit(k), lit(w))).as("_m"))
      .select(col("doc_id"), col("_m.pos").as("pos"), col("_m.h").as("h"))
  }

  /** The declarative winnow selection — the SPEC REFERENCE the native
    * kernel is pinned against (never the production path: interpreted
    * higher-order lambdas + `conv`'s hex parse cost ~10 s at 10×).
    * Same md5-60 domain, same min-with-rightmost-tie rule: the
    * ascending fold takes x on h <= acc.h — strictly smaller h
    * replaces, equal h at a LATER position replaces. */
  private[graft] def winnowFingerprintsDeclarative(
      docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      k: Int = 12, w: Int = 4): DataFrame = {
    val norm = regexp_replace(lower(trim(col(textCol))), "\\s+", " ")
    val selection = letBind(col("_t")) { t =>
      letBind(transform(sequence(lit(1), length(t) - (k - 1)),
        p => struct(
          conv(substring(md5(t.substr(p, lit(k))), 1, 15), 16, 10)
            .cast("long").as("h"),
          p.as("pos")))) { hs =>
        array_distinct(transform(
          sequence(lit(1), size(hs) - (w - 1)),
          s => aggregate(slice(hs, s, lit(w)),
            struct(lit(Long.MaxValue).as("h"), lit(0).as("pos")),
            (acc, x) =>
              when(x.getField("h") <= acc.getField("h"), x).otherwise(acc))))
      }
    }
    docs
      .select(col(idCol).as("doc_id"), norm.as("_t"))
      .filter(length(col("_t")) >= k + w - 1) // stays below the selection
      .select(col("doc_id"), explode(selection).as("_m"))
      .select(col("doc_id"), col("_m.pos").as("pos"), col("_m.h").as("h"))
  }

  /** Bind `e` once per row as a lambda variable — higher-order-function
    * lambdas are interpreted (no codegen, no common-subexpression
    * elimination), and CollapseProject can inline projected aliases
    * into every reference, so WITHOUT this a per-window fold may
    * re-evaluate its whole upstream expression per window. `transform`
    * evaluates its input array ONCE, then the lambda per element —
    * wrapping `e` in a one-element array makes the lambda variable a
    * true let binding. */
  private def letBind(e: Column)(f: Column => Column): Column =
    element_at(transform(array(e), f), 1)

  /** Default candidate-pair budget for the one-shot exact tiers.
    * Sized from WinnowBench's measured legs (BENCH_r14_winnow_scaling):
    * the 10× copy corpus materialized 4.5M pairs in ~506 s comfortably
    * within heap, while the 30× corpus (≈40M pairs) exhausted it
    * mid-aggregation. 20M sits ~4× above every measured-working point
    * and ~2× below the measured failure regime on the local[32]
    * reference host; a real cluster raises it explicitly per job. */
  val DefaultPairBudget: Long = 20_000_000L

  /** EXACT candidate volume of an equi-join on `keyCol` with the
    * `idA < idB` cross-id predicate: Σ_key (S² − Σ_id c²) / 2, where S
    * is the key's row count and c each id's rows under it — counts
    * position multiplicity (the span tier repeats a hash within a doc)
    * and excludes same-id products, so it is the row count the pair
    * join will actually emit BEFORE any downstream gate. Two light
    * aggregations over the (already materialized) posting frame — at
    * 100 TB this is the histogram pass, never the join. */
  private[graft] def candidatePairVolume(fp: DataFrame, keyCol: String,
                                         idCol: String): Long = {
    val perId = fp.groupBy(col(keyCol), col(idCol)).agg(count(lit(1)).as("c"))
    // exact long arithmetic (the mixture-plan convention): s²−Σc² is
    // even by construction, so the halving at the end loses nothing
    val row = perId.groupBy(col(keyCol))
      .agg(sum(col("c")).as("s"), sum(col("c") * col("c")).as("ss"))
      .agg(coalesce(sum(col("s") * col("s") - col("ss")), lit(0L)).as("v"))
      .first()
    row.getLong(0) / 2
  }

  /** The q95-census-guard precedent at the pair tier: quadratic paths
    * refuse LOUDLY before launching, they don't die mid-stage. The
    * one-shot exact tiers' pair volume is TRUE OUTPUT on a duplicated
    * corpus (C copies of everything ⇒ O(C²) genuine pairs — no plan
    * change shrinks it), so past the budget the only honest moves are
    * the ones the message names: suppress ubiquitous keys (`maxDf`),
    * probe a persisted index day-2 batch-by-batch, or dedup first. */
  private def requirePairBudget(volume: Long, budget: Long,
                                what: String, remedies: String): Unit = {
    require(budget > 0, s"pairBudget must be positive, got $budget")
    if (volume > budget) throw new IllegalStateException(
      s"$what: the exact pair join would materialize $volume candidate pairs, " +
        s"over the pairBudget of $budget. This is genuine quadratic output " +
        s"(duplicated corpora have quadratically many TRUE pairs) and the job " +
        s"would exhaust executor memory mid-stage rather than fail here. " +
        s"Either raise pairBudget explicitly for a cluster sized for it, or " +
        s"change the question: $remedies")
  }

  /** C11b: pairwise partial-overlap report over the winnowed sets —
    * fingerprints group by hash (the posting), co-occurring docs pair
    * within a posting, pairs aggregate to a distinct-shared count and
    * gate on `minShared`. Posting sizes are the usual hot-key caveat
    * (a boilerplate phrase selected everywhere pairs quadratically —
    * the C2c rule: capping would silently LEAK overlap, so by DEFAULT
    * this doesn't).
    *
    * `maxDf` is the paper's own answer to ubiquitous matches (MOSS's
    * "ignore matches appearing in more than N files"): a fingerprint
    * present in more than maxDf documents is template/boilerplate
    * evidence, and reporting it as span overlap is noise. Setting it
    * CHANGES THE CONTRACT — from "all shared spans" to "all shared
    * spans except those carried only by > maxDf-ubiquitous grams" —
    * which is why it defaults to None (exact) and why the registered
    * queries never set it. It is the scale path for corpora whose
    * duplication structure makes exact pairing quadratically large
    * (a corpus with C copies of everything has O(C²) TRUE pairs —
    * no algorithm shrinks true output; suppression changes the
    * question to one with a small answer). */
  def winnowOverlap(docs: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text", k: Int = 12, w: Int = 4,
                    minShared: Long = 8L,
                    maxDf: Option[Long] = None,
                    pairBudget: Long = DefaultPairBudget): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    require(maxDf.forall(_ >= 2), s"maxDf must be >= 2, got $maxDf")
    // materialized: forked by the df pass, the pre-flight guard and the
    // self-join (house rule)
    val fpAll = winnowFingerprints(docs, idCol, textCol, k, w)
      .select(col("doc_id"), col("h")).distinct().localCheckpoint()
    val fpF = dfFiltered(fpAll, maxDf)
    val fp = if (maxDf.isDefined) fpF.localCheckpoint() else fpF
    requirePairBudget(candidatePairVolume(fp, "h", "doc_id"), pairBudget,
      "winnowOverlap", winnowRemedies)
    fp.as("a").join(fp.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** The remedies every winnow-tier budget refusal names — each one a
    * registered, green alternative, not a suggestion. */
  private val winnowRemedies: String =
    "set maxDf to suppress ubiquitous fingerprints (MOSS's own knob — " +
      "changes the contract to spans carried by <= maxDf-frequent grams), " +
      "probe a persisted index day-2 batch-by-batch (buildWinnowIndex + " +
      "winnowOverlapAgainstIndex / winnowSpansAgainstIndex — cost follows " +
      "the batch, not the corpus), or dedup first (dedupExact / " +
      "minhashLshDocs) so only one copy per duplicate cluster enters " +
      "the pair tier."

  /** The q71 loud-mismatch guard at the winnow tier: a probe under
    * different (k, w) hashes different grams / selects different
    * minima, and either silently hides real overlap. */
  private def requireWinnowParams(index: DataFrame, k: Int, w: Int): Unit = {
    val hField = index.schema.fields.find(_.name == "h").getOrElse(
      throw new IllegalArgumentException(
        "index must carry an 'h' column — build it with buildWinnowIndex"))
    if (hField.metadata.contains("graft.winnow.k")) {
      val ik = hField.metadata.getLong("graft.winnow.k")
      val iw = hField.metadata.getLong("graft.winnow.w")
      require(ik == k && iw == w,
        s"index was built with k=$ik w=$iw but the probe asked for k=$k w=$w — " +
          "selections would misalign and shared spans would silently vanish")
    }
  }

  /** Drop fingerprints whose DOCUMENT frequency exceeds maxDf — the
    * MOSS ubiquity suppression. One h-keyed aggregation + semi join,
    * co-partitioned with the posting join that always follows.
    * Distinct doc count, not row count: the position-carrying frames
    * repeat an h within a doc. */
  private def dfFiltered(fp: DataFrame, maxDf: Option[Long],
                         dfHist: Option[DataFrame] = None): DataFrame =
    maxDf.fold(fp) { m =>
      // the suppression histogram: recomputed from the frame by
      // default; a PERSISTED [[winnowDfHistogram]] skips the full
      // re-aggregation a day-2 probe would otherwise pay per trigger
      // (measured at 100×: the histogram exchange, not the probe join,
      // dominated the suppressed probe's wall)
      dfHist.foreach { hist =>
        // loud provenance guard (the requireWinnowParams convention):
        // a histogram built over a different index's (k, w) counts
        // different grams and mis-suppresses silently without this
        val fpMeta = fp.schema.fields.find(_.name == "h").map(_.metadata)
        val hMeta = hist.schema.fields.find(_.name == "h").map(_.metadata)
        for {
          fm <- fpMeta if fm.contains("graft.winnow.k")
          hm <- hMeta if hm.contains("graft.winnow.k")
        } require(fm.getLong("graft.winnow.k") == hm.getLong("graft.winnow.k") &&
            fm.getLong("graft.winnow.w") == hm.getLong("graft.winnow.w"),
          s"df histogram was built over an index with k=${hm.getLong("graft.winnow.k")} " +
            s"w=${hm.getLong("graft.winnow.w")} but the probed index carries " +
            s"k=${fm.getLong("graft.winnow.k")} w=${fm.getLong("graft.winnow.w")} — " +
            "suppression would consult the wrong gram population")
      }
      val hist = dfHist.getOrElse(
        fp.groupBy(col("h")).agg(countDistinct(col("doc_id")).as("df")))
      // anti-join the OVER-threshold prints (round-17 advice): a
      // fingerprint the histogram has never seen (appended after the
      // histogram build) passes through — bit-identical to the semi
      // form when the histogram is fresh (every probe h then has a df
      // row), and errs OPEN when stale, which is the documented
      // staleness direction (a stale histogram may suppress less,
      // never hide a duplicate)
      fp.join(hist.filter(col("df") > m).select(col("h")),
        Seq("h"), "left_anti")
    }

  /** The winnow index's df histogram — one row per distinct
    * fingerprint with its distinct-document count, the build-time
    * artifact that makes day-2 `maxDf` suppression batch-bounded:
    * persist it next to the index (bucketed on h like the index) and
    * pass it to the probes, and the suppression becomes a co-located
    * semi-join instead of a full index re-aggregation per trigger.
    * Goes stale only UPWARD under appends (true df can only grow) AND
    * open under them (a print the histogram never saw passes the
    * probe's anti-join unsuppressed), so a stale histogram suppresses
    * LESS than a fresh one — rebuild it with the index at the
    * maintenance cadence ([[Maintain.maintainCorpus]]'s bundle pass).
    * The index's (k, w) ride the h column's metadata into the
    * histogram, so a probe against a histogram from a DIFFERENT
    * index's params fails loudly (the requireWinnowParams
    * convention). */
  def winnowDfHistogram(index: DataFrame): DataFrame = {
    val hField = index.schema.fields.find(_.name == "h").getOrElse(
      throw new IllegalArgumentException(
        "index must carry an 'h' column — build it with buildWinnowIndex"))
    index.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .select(col("h").as("h", hField.metadata), col("df"))
  }

  /** C11b `q151_winnow_overlap` — [[winnowOverlap]] on the q107
    * donor-planted corpus (so full-copy pairs provably clear the
    * gate) plus whatever template overlap the corpus naturally
    * carries; the oracle re-derives planting, normalization, gram
    * hashes, window argmin (min-then-rightmost via its own two-step),
    * distinct sets, pairing and the gate from raw rows. */
  def winnowOverlapDocs(spark: SparkSession, dir: String): DataFrame =
    Perf.sortedOnce(winnowOverlap(donorPlantedText(Tables(spark, dir).documents)),
      col("doc_a"), col("doc_b"))

  // ---- C11d: shared-span localization ----------------------------------

  /** C11d: shared-span LOCALIZATION — lift winnowing evidence from
    * counts ([[winnowOverlap]]) to contiguous character INTERVALS,
    * the coordinates an exact-substring removal pass (Lee et al.
    * 2022, arXiv:2107.06499 §4 "ExactSubstr") actually needs: you
    * cannot excise "37 shared fingerprints", you excise [start, end).
    *
    * Geometry: matched fingerprints of a doc pair are points
    * (pos_a, pos_b); a genuinely shared span puts all its points on
    * ONE DIAGONAL (pos_b − pos_a constant — both docs select the
    * same interior grams at a fixed offset, because robust-winnowing
    * selection is content-determined). So: join selected prints on h,
    * group by (doc_a, doc_b, diagonal), and split each diagonal into
    * islands wherever consecutive selected positions gap by more
    * than w — inside a truly shared span the winnowing guarantee
    * bounds selection gaps by w, so a larger gap means the span
    * ended. Each island reports [a_start, a_end] (1-based char
    * interval over the NORMALIZED text — the same coordinates the
    * gram positions live in), the b-side interval at the diagonal
    * offset, and its print count, gated on `minPrints`.
    *
    * Boundary honesty: the first/last w windows of a shared span can
    * select grams influenced by surrounding (unshared) text, so
    * reported intervals cover the span's INTERIOR and may undercover
    * the true shared extent by up to ~(k + w) chars per edge — every
    * reported position IS a real shared k-gram (collisions aside),
    * never the reverse. Shuffle shape: the h posting join (the C11b
    * caveat on hot prints applies), then windows partitioned by
    * (doc_a, doc_b, diag) — pair-local keys, no corpus-wide state.
    *
    * @return (doc_a, doc_b, a_start, a_end, b_start, b_end, n_prints) */
  def winnowSharedSpans(docs: DataFrame, idCol: String = "doc_id",
                        textCol: String = "text", k: Int = 12, w: Int = 4,
                        minPrints: Long = 3L,
                        maxDf: Option[Long] = None,
                        pairBudget: Long = DefaultPairBudget): DataFrame = {
    require(minPrints >= 1, s"minPrints must be >= 1, got $minPrints")
    require(maxDf.forall(_ >= 2), s"maxDf must be >= 2, got $maxDf")
    val fpF = dfFiltered(
      winnowFingerprints(docs, idCol, textCol, k, w)
        .localCheckpoint(), // forked by the self-join below (house rule)
      maxDf)
    val fp = if (maxDf.isDefined) fpF.localCheckpoint() else fpF
    // position-carrying frame: the volume counts multiplicity, i.e. the
    // exact matched-point count the diagonal join will emit
    requirePairBudget(candidatePairVolume(fp, "h", "doc_id"), pairBudget,
      "winnowSharedSpans", winnowRemedies)
    // no distinct: fingerprint rows are unique by (doc, pos), so join
    // products are unique by (doc_a, doc_b, pa, pb) and (pa, pb) ↔
    // (pa, diag) is a bijection — a distinct here would be a full
    // exchange of the largest frame in the operator for nothing
    val pts = fp.as("a").join(fp.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.pos").as("pa"), (col("b.pos") - col("a.pos")).as("diag"))
    diagonalIslands(pts, k, w, minPrints)
  }

  /** The islands core shared by the one-shot ([[winnowSharedSpans]])
    * and day-2 ([[winnowSpansAgainstIndex]]) span tiers: split each
    * (doc_a, doc_b, diagonal) run of matched print positions wherever
    * consecutive positions gap by more than w, then aggregate islands
    * to intervals. Windows partition by pair-local keys only. */
  private def diagonalIslands(pts: DataFrame, k: Int, w: Int,
                              minPrints: Long): DataFrame = {
    val wDiag = Window.partitionBy(col("doc_a"), col("doc_b"), col("diag"))
      .orderBy(col("pa"))
    val wRun = wDiag.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pts
      .withColumn("brk",
        when(col("pa") - lag(col("pa"), 1).over(wDiag) > w, 1).otherwise(0))
      .withColumn("isl", sum(col("brk")).over(wRun))
      .groupBy(col("doc_a"), col("doc_b"), col("diag"), col("isl"))
      .agg(min(col("pa")).as("a_start"),
        (max(col("pa")) + (k - 1)).as("a_end"),
        count(lit(1)).as("n_prints"))
      .filter(col("n_prints") >= minPrints)
      .select(col("doc_a"), col("doc_b"), col("a_start"), col("a_end"),
        (col("a_start") + col("diag")).as("b_start"),
        (col("a_end") + col("diag")).as("b_end"), col("n_prints"))
  }

  /** C11d `q153_winnow_spans` — [[winnowSharedSpans]] on the donor-
    * planted corpus: each planted full copy must localize as one long
    * island on its pair's single diagonal, plus whatever template
    * spans the corpus naturally carries. The oracle replays the q151
    * selection chain WITH positions, the diagonal pairing, the
    * lag/sum islands split (tolerance w) and the interval arithmetic
    * from raw rows. */
  def winnowSpansDocs(spark: SparkSession, dir: String): DataFrame =
    Perf.sortedOnce(winnowSharedSpans(donorPlantedText(Tables(spark, dir).documents)),
      col("doc_a"), col("doc_b"), col("a_start"), col("b_start"))

  // ---- C11e: shared-span excision ---------------------------------------

  /** C11e: shared-span EXCISION — the removal pass [[winnowSharedSpans]]
    * localizes for (Lee et al. 2022's ExactSubstr policy: of each
    * duplicated span, ONE copy survives). Policy here: the LOWER doc
    * id of a pair keeps its text untouched; the higher id excises its
    * b-side intervals — deterministic, and consistent with every
    * first-writer-wins rule in this repo. A doc that is doc_b in many
    * pairs excises the UNION of its intervals: overlapping/adjacent
    * intervals merge first (one doc-keyed window + aggregation — the
    * same gaps-and-islands shape as the localization), then the kept
    * segments rebuild in ONE map-side higher-order `aggregate` fold
    * over the doc's sorted interval array — no per-segment explode,
    * no re-shuffle after the merge.
    *
    * Coordinates: intervals live in NORMALIZED text (where the span
    * positions are defined), so the clean text is normalized too —
    * stated, not hidden; the normalization is the corpus-standard
    * lower/trim/whitespace-collapse every text operator here applies
    * first anyway.
    *
    * @param spans the [[winnowSharedSpans]] frame (or any
    *              (doc_b, b_start, b_end) interval evidence)
    * @return docs that lost at least one span: (doc_id, clean_text,
    *         removed_chars, n_spans) — n_spans counts MERGED intervals */
  def exciseSharedSpans(docs: DataFrame, spans: DataFrame,
                        idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    // distinct: many pairs can report the SAME b-side interval (one
    // per doc_a) — duplicates add nothing to the union, and removing
    // them leaves (s, e) a total order per doc, so the pmax/gid window
    // chain below never depends on tie order (the r15 oracle lesson:
    // DuckDB's two-sort form of this chain split groups on ties)
    val iv = spans.select(col("doc_b").as("doc_id"),
      col("b_start").as("s"), col("b_end").as("e")).distinct()
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("s"), col("e"))
    val wPrev = wDoc.rowsBetween(Window.unboundedPreceding, -1)
    val wRun = wDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val merged = iv
      .withColumn("pmax", max(col("e")).over(wPrev))
      .withColumn("brk",
        when(col("pmax").isNull || col("s") > col("pmax") + 1, 1).otherwise(0))
      .withColumn("gid", sum(col("brk")).over(wRun))
      .groupBy(col("doc_id"), col("gid"))
      .agg(min(col("s")).as("s"), max(col("e")).as("e"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("s"), col("e")))).as("ivs"),
        sum(col("e") - col("s") + 1).as("removed_chars"),
        count(lit(1)).as("n_spans"))
    val t = regexp_replace(lower(trim(col(textCol))), "\\s+", " ")
    docs.select(col(idCol).as("doc_id"), t.as("_t"))
      .join(merged, Seq("doc_id"))
      .withColumn("_f", aggregate(col("ivs"),
        struct(lit(0L).as("last"), lit("").as("out")),
        (acc, i) => struct(
          greatest(acc.getField("last"), i.getField("e")).as("last"),
          concat(acc.getField("out"),
            col("_t").substr((acc.getField("last") + 1).cast("int"),
              (i.getField("s") - acc.getField("last") - 1).cast("int")))
            .as("out"))))
      .select(col("doc_id"),
        concat(col("_f.out"),
          col("_t").substr((col("_f.last") + 1).cast("int"),
            (length(col("_t"))).cast("int"))).as("clean_text"),
        col("removed_chars"), col("n_spans"))
  }

  /** C11e `q154_winnow_excise` — localize ([[winnowSharedSpans]]) then
    * excise ([[exciseSharedSpans]]) over the donor-planted corpus: each
    * planted copier (the higher id of its pair) loses the copied span;
    * the oracle replays localization, the b-side interval union (its
    * own window merge), and the segment-stitch reconstruction. */
  def winnowExciseDocs(spark: SparkSession, dir: String): DataFrame = {
    val docs = donorPlantedText(Tables(spark, dir).documents)
      .localCheckpoint() // forked: span evidence + excision input
    Perf.sortedOnce(exciseSharedSpans(docs, winnowSharedSpans(docs)),
      col("doc_id"))
  }

  // ---- C11c: incremental winnowing (day-2 span overlap) ----------------

  /** Build the persistable winnow fingerprint index over (doc_id,
    * text): the distinct selected (h, doc_id) postings of
    * [[winnowFingerprints]], with the build parameters riding the h
    * column's metadata (the q71 loud-mismatch convention). Persist
    * bucketed on h so batch probes join corpus-side exchange-free.
    *
    * The winnowing index is the ONE dedup artifact in this repo with
    * NO frozen global state: prefix-Jaccard freezes a vocabulary
    * (token order), IVF/IMI freeze centroids, MinHash freezes seeds —
    * but robust-winnowing selection is a pure function of a document's
    * OWN local hash landscape (SIGMOD 2003 §4: window minima with
    * rightmost ties), so corpus growth can never change what a later
    * document selects. Append therefore IS build-on-the-increment
    * ([[appendToWinnowIndex]]), and day-2 probe-then-append equals a
    * full rebuild exactly, with no drift clause to manage. */
  def buildWinnowIndex(documents: DataFrame, idCol: String = "doc_id",
                       textCol: String = "text",
                       k: Int = 12, w: Int = 4): DataFrame = {
    val meta = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("graft.winnow.k", k.toLong)
      .putLong("graft.winnow.w", w.toLong).build()
    // positions ride along (round 14, second pass): the overlap probe
    // dedups them away, but the day-2 SPAN probe needs the corpus-side
    // diagonal coordinates — one int per row the index was already
    // storing per selected print
    winnowFingerprints(documents, idCol, textCol, k, w)
      .select(col("h").as("h", meta), col("doc_id"), col("pos"))
  }

  /** Index rows for an accepted batch — literally the build on the
    * increment (see [[buildWinnowIndex]]: selection is doc-local, so
    * there is no frozen state to thread through). Kept as a named
    * alias so ingest call-sites read as the same append/probe protocol
    * every other day-2 family uses. */
  def appendToWinnowIndex(accepted: DataFrame, idCol: String = "doc_id",
                          textCol: String = "text",
                          k: Int = 12, w: Int = 4): DataFrame =
    buildWinnowIndex(accepted, idCol, textCol, k, w)

  /** Day-2 SPAN-OVERLAP probe: verdict an incoming batch against the
    * persisted winnow index without re-fingerprinting (or re-reading)
    * the corpus. Batch docs winnow under the index's (k, w) — enforced
    * loudly from the h column metadata, since a mismatched k hashes
    * different grams and a mismatched w selects different minima, and
    * either silently hides real overlap — then join the corpus
    * postings on h (read bucketed: only the small batch exchanges),
    * aggregate distinct-shared counts per (batch, corpus) pair and
    * gate on `minShared`. A batch doc matching its own id is a
    * replayed delivery, not overlap — excluded (the q71 rule).
    *
    * This is the REPORT-shaped verdict (who do I overlap, how much),
    * not a Jaccard: winnowing evidence is positional span sharing, so
    * the right day-2 answer names the strongest witness. Ties on
    * n_shared break to the smallest corpus id (deterministic).
    *
    * @return one row per batch doc: (doc_id, has_overlap, best_match =
    *         witness corpus id or -1, max_shared = its distinct shared
    *         fingerprint count or 0) */
  def winnowOverlapAgainstIndex(newDocs: DataFrame, index: DataFrame,
                                idCol: String = "doc_id",
                                textCol: String = "text",
                                k: Int = 12, w: Int = 4,
                                minShared: Long = 8L,
                                maxDf: Option[Long] = None,
                                dfHist: Option[DataFrame] = None): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    require(maxDf.forall(_ >= 2), s"maxDf must be >= 2, got $maxDf")
    requireWinnowParams(index, k, w)
    // checkpointed ONLY when the index is file-backed (the prune then
    // collects the batch's h set — a second consumer); otherwise the
    // join is the sole consumer and the checkpoint is pure overhead
    val pruneable = Perf.willPrune(index)
    val batchFp0 = winnowFingerprints(newDocs, idCol, textCol, k, w)
      .select(col("doc_id").as("new_id"), col("h")).distinct()
    val batchFp = if (pruneable) batchFp0.localCheckpoint() else batchFp0
    // maxDf (the [[winnowOverlap]] ubiquity-suppression contract, df
    // measured on the CORPUS index): suppressed postings pair with
    // nothing, so filtering the index side alone suffices. The index
    // carries positions (for the span probe): a doc selecting the
    // same h at several positions repeats (h, doc_id) — dedup on the
    // JOIN OUTPUT (batch-sized) via countDistinct, never by
    // distinct-ing the corpus index (a full corpus exchange the
    // bucketed-on-h layout exists to avoid)
    // index-scan pruning BEFORE suppression (r18 verdict item 1): the
    // probe's posting join is inner on h, so corpus prints whose h the
    // batch never selected cannot pair — push the batch's h set at the
    // bucketed scan so index bytes-read tracks the batch
    val posting = dfFiltered(
      Perf.prunedByKeys(index.select(col("h"), col("doc_id")), "h", batchFp),
      maxDf, dfHist)
    val gated = batchFp
      .join(posting.select(col("h"), col("doc_id").as("corpus_id")), Seq("h"))
      .filter(col("new_id") =!= col("corpus_id"))
      .groupBy(col("new_id"), col("corpus_id"))
      .agg(countDistinct(col("h")).as("ns"))
      .filter(col("ns") >= minShared)
      // strongest witness: max shared count, ties to the SMALLEST id —
      // one struct-min, no second aggregation pass
      .groupBy(col("new_id").as("doc_id"))
      .agg(min(struct((-col("ns")).as("_nn"), col("corpus_id"))).as("_b"))
    Perf.sortedOnce(
      newDocs.select(col(idCol).as("doc_id"))
        .join(gated, Seq("doc_id"), "left")
        .select(col("doc_id"), col("_b").isNotNull.as("has_overlap"),
          coalesce(col("_b.corpus_id"), lit(-1L)).as("best_match"),
          coalesce(-col("_b._nn"), lit(0L)).as("max_shared")),
      col("doc_id"))
  }

  /** C11f: day-2 span LOCALIZATION — [[winnowSharedSpans]]'s diagonal
    * islands between an incoming batch and the persisted fingerprint
    * index (which carries per-print positions precisely for this).
    * This is the production shape of exact-substring dedup at ingest
    * (Lee et al. 2022's flow run incrementally): new data localizes
    * its shared spans against the EXISTING training corpus without
    * re-pairing or re-reading it — only the batch winnows and
    * exchanges — and the output rows feed [[exciseSharedSpans]]
    * directly (`doc_id/start/end` are the batch-side intervals:
    * select them as `doc_b/b_start/b_end` and the batch sheds exactly
    * the corpus-duplicated spans, keeping its novel text). Same param
    * guard, replay self-exclusion and `maxDf` contract as the count
    * probe ([[winnowOverlapAgainstIndex]]).
    *
    * @return (doc_id, corpus_id, start, end, c_start, c_end,
    *         n_prints): batch-side and corpus-side 1-based char
    *         intervals over normalized text, per island */
  def winnowSpansAgainstIndex(newDocs: DataFrame, index: DataFrame,
                              idCol: String = "doc_id",
                              textCol: String = "text",
                              k: Int = 12, w: Int = 4,
                              minPrints: Long = 3L,
                              maxDf: Option[Long] = None,
                              dfHist: Option[DataFrame] = None): DataFrame = {
    require(minPrints >= 1, s"minPrints must be >= 1, got $minPrints")
    require(maxDf.forall(_ >= 2), s"maxDf must be >= 2, got $maxDf")
    requireWinnowParams(index, k, w)
    require(index.columns.contains("pos"),
      "index carries no positions — rebuild it with this round's buildWinnowIndex")
    // checkpointed ONLY when the index is file-backed (see the overlap
    // probe): the prune's collect is the second consumer
    val pruneable = Perf.willPrune(index)
    val batchFp0 = winnowFingerprints(newDocs, idCol, textCol, k, w)
    val batchFp = if (pruneable) batchFp0.localCheckpoint() else batchFp0
    // index-scan pruning BEFORE suppression (r18 verdict item 1): the
    // diagonal join is inner on h — corpus prints at h values the
    // batch never selected cannot pair, so the batch's h set pushes at
    // the bucketed scan and index bytes-read tracks the batch
    val posting = dfFiltered(
      Perf.prunedByKeys(
        index.select(col("h"), col("doc_id"), col("pos")), "h", batchFp),
      maxDf, dfHist)
    val pts = batchFp.as("a").join(posting.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") =!= col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.pos").as("pa"), (col("b.pos") - col("a.pos")).as("diag"))
    diagonalIslands(pts, k, w, minPrints)
      .select(col("doc_a").as("doc_id"), col("doc_b").as("corpus_id"),
        col("a_start").as("start"), col("a_end").as("end"),
        col("b_start").as("c_start"), col("b_end").as("c_end"),
        col("n_prints"))
  }

  /** C11f `q155_winnow_span_probe` — [[winnowSpansAgainstIndex]] over
    * the q152 80/20 split: each planted batch copier localizes its
    * copied span against its corpus donor through the index alone.
    * The oracle replays selection WITH positions, the role-split
    * pairing, islands and interval arithmetic. */
  def winnowSpanProbe(spark: SparkSession, dir: String): DataFrame = {
    val docs = donorPlantedText(Tables(spark, dir).documents)
    val index = buildWinnowIndex(docs.filter(col("doc_id") % 5 =!= 4))
    Perf.sortedOnce(
      winnowSpansAgainstIndex(docs.filter(col("doc_id") % 5 === 4), index),
      col("doc_id"), col("corpus_id"), col("start"), col("c_start"))
  }

  /** [[exciseSharedSpans]] lifted to ingest shape — EVERY input doc
    * comes back: docs with no interval evidence pass through with
    * their normalized text unchanged (removed_chars = 0, n_spans = 0).
    * The clean-ingest paths need the whole batch, not only the docs
    * that lost spans. */
  def exciseKeepAll(docs: DataFrame, spans: DataFrame,
                    idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    val t = regexp_replace(lower(trim(col(textCol))), "\\s+", " ")
    docs.select(col(idCol).as("doc_id"), t.as("_t"))
      .join(exciseSharedSpans(docs, spans, idCol, textCol), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("clean_text"), col("_t")).as("clean_text"),
        coalesce(col("removed_chars"), lit(0L)).as("removed_chars"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"))
  }

  /** C11g: day-2 CLEAN ingest, batch form — the composed removal pass
    * incremental ExactSubstr (Lee et al. 2022, arXiv:2107.06499)
    * actually runs per ingest unit: localize the batch's shared spans
    * against the persisted index ([[winnowSpansAgainstIndex]] — only
    * the batch winnows and exchanges) and excise exactly those spans
    * from the batch ([[exciseSharedSpans]] on the batch-side
    * intervals), keeping every doc's novel text. Documents are never
    * rejected — SPANS are: the corpus keeps ONE copy of every
    * duplicated span (the indexed one), which is the paper's stated
    * removal policy, and the batch contributes only text the corpus
    * has not seen. Same param guard, replay self-exclusion and
    * `maxDf` contract as the span probe.
    *
    * @return every batch doc: (doc_id, clean_text, removed_chars,
    *         n_spans) in normalized coordinates */
  def winnowCleanAgainstIndex(newDocs: DataFrame, index: DataFrame,
                              idCol: String = "doc_id",
                              textCol: String = "text",
                              k: Int = 12, w: Int = 4,
                              minPrints: Long = 3L,
                              maxDf: Option[Long] = None,
                              dfHist: Option[DataFrame] = None): DataFrame = {
    val spans = winnowSpansAgainstIndex(newDocs, index, idCol, textCol,
        k, w, minPrints, maxDf, dfHist)
      .select(col("doc_id").as("doc_b"), col("start").as("b_start"),
        col("end").as("b_end"))
    exciseKeepAll(newDocs, spans, idCol, textCol)
  }

  /** C11g `q156_winnow_clean` — [[winnowCleanAgainstIndex]] over the
    * q152 80/20 split: the WHOLE batch comes back clean — planted
    * copiers shed their donor spans (down to the edge residue the
    * interior-coverage bound leaves), novel docs pass through
    * normalized-identical with zero counters. The oracle replays
    * probe + interval union + segment stitch and left-joins the
    * untouched remainder. */
  def winnowCleanDocs(spark: SparkSession, dir: String): DataFrame = {
    val docs = donorPlantedText(Tables(spark, dir).documents)
      .localCheckpoint() // forked: index build + probe + excision base
    val index = buildWinnowIndex(docs.filter(col("doc_id") % 5 =!= 4))
    Perf.sortedOnce(
      winnowCleanAgainstIndex(docs.filter(col("doc_id") % 5 === 4), index),
      col("doc_id"))
  }

  /** C11c `q152_winnow_probe` — [[winnowOverlapAgainstIndex]] over the
    * q71 deterministic 80/20 corpus/batch split of the donor-planted
    * corpus. The planting lands every copier (doc_id % 10 == 9, hence
    * % 5 == 4) in the BATCH and every donor (doc_id − 4 ≡ 0 mod 5) in
    * the CORPUS, so each planted copy must surface as a batch-side
    * overlap with its corpus donor as witness. The oracle replays the
    * whole chain from raw rows, split included. */
  def winnowProbeVerdicts(spark: SparkSession, dir: String): DataFrame = {
    val docs = donorPlantedText(Tables(spark, dir).documents)
    val index = buildWinnowIndex(docs.filter(col("doc_id") % 5 =!= 4))
    winnowOverlapAgainstIndex(docs.filter(col("doc_id") % 5 === 4), index)
  }
}

package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Edit-distance (fuzzy) string joins that never go all-pairs.
  *
  * `a JOIN b ON levenshtein(a.s, b.s) <= d` has no equi component, so
  * Catalyst plans a nested loop — |a|·|b| Levenshtein evaluations. The
  * scalable shape for small `d` is the DELETION NEIGHBORHOOD (FastSS,
  * Bocek et al. 2007, and the public-domain SymSpell — both public
  * literature): an optimal alignment between two strings within edit
  * distance `d` matches all but ≤ d characters per side, so deleting
  * the unmatched characters from each side yields the SAME string —
  * every true pair shares a key in the set of ≤ d-deletion
  * subsequences. Keys become an EQUI join; only key-collision pairs
  * pay the (threshold-bounded) Levenshtein verify, so blocking is
  * lossless and the verify predicate is the final word.
  *
  * Why not q-gram prefix filtering (Ed-Join)? Measured on this repo's
  * identifier-like vocabulary (`Customer#000001234`, sf0.1): the
  * rarest-first gram prefixes of low-id names run out of rare grams
  * and pad with ubiquitous ones (`#000` buckets 10k strings), giving
  * ~10M candidates for 262k true pairs; deletion keys are near-full
  * strings — maximal entropy — giving 956k candidates (3.6×  the true
  * pairs, max bucket 38). Gram methods win only when `d` is large
  * enough that C(len, d) deletion keys explode; at the d ≤ 2 that
  * fuzzy identifier/title matching needs, deletions dominate.
  *
  * Cost model: len+1 keys per string at d=1, +C(len,2) at d=2 — keys
  * are hashed to 8 bytes before the shuffle, so the join moves
  * O(vocab·len) longs, not strings. Bucket sizes track the true match
  * degree (a bucket is "strings sharing a near-full subsequence"), so
  * candidate count is output-proportional, not corpus-quadratic —
  * hash collisions can only add candidates the verify removes.
  *
  * This is the entity-resolution primitive (variant names, typo'd
  * identifiers, near-identical titles) the way [[IntervalJoin]] is the
  * containment primitive: both rebuild an equi key for a predicate
  * Catalyst can only nested-loop.
  */
object FuzzyJoin {

  /** All deletion keys of `s` up to `maxDist` deletions, hashed.
    * Delete-at-j-then-at-i (i < j) keeps positions stable. */
  private def delKeys(s: Column, maxDist: Int): Column = {
    val len = length(s)
    def del1(x: Column, i: Column): Column =
      concat(x.substr(lit(1), i - 1), x.substr(i + 1, length(x)))
    val d0 = array(s)
    val d1 = transform(sequence(lit(1), len), i => del1(s, i))
    val d2 =
      if (maxDist < 2) typedLit(Seq.empty[String])
      else when(len >= lit(2), flatten(transform(
        sequence(lit(1), len - 1),
        i => transform(sequence(i + 1, len), j => del1(del1(s, j), i)))))
        .otherwise(typedLit(Seq.empty[String]))
    transform(array_distinct(concat(d0, d1, d2)), k => xxhash64(k))
  }

  /** All unordered pairs of DISTINCT values of `strCol` within
    * Levenshtein distance [1, maxDist]. Output: (name_a, name_b, dist)
    * with name_a < name_b — the variant-pair table of the column's
    * vocabulary; map it back onto rows by joining either side.
    *
    * Dedup-to-vocabulary first is the 100 TB shape: at corpus scale
    * the value column repeats heavily, and joining variants on the
    * vocabulary (then propagating) does the expensive work once per
    * distinct string instead of once per row pair.
    *
    * `maxDist` ∈ {1, 2}: the deletion-key fan-out is O(len) / O(len²)
    * per string. Larger radii belong to the gram/signature family
    * (and at document granularity to [[Dedup]]'s MinHash pipeline) —
    * refused loudly rather than quietly going quadratic. */
  def editDistanceJoin(df: DataFrame, strCol: String,
                       maxDist: Int = 1): DataFrame = {
    require(maxDist == 1 || maxDist == 2,
      s"maxDist must be 1 or 2 (deletion-key fan-out is C(len, d)); got $maxDist")
    val strs = df.select(col(strCol).cast("string").as("s"))
      .filter(col("s").isNotNull).distinct()
    val entries = strs
      .select(col("s"), explode(delKeys(col("s"), maxDist)).as("k"))
    // verify BEFORE dedup: the threshold Levenshtein (banded DP,
    // O(d·len) and early-exit, -1 past the bound) cuts candidates to
    // true pairs while they are still spread across key buckets — the
    // distinct then shuffles only result-sized data. A pair is
    // verified once per shared key (≥ 1, small), which is cheaper
    // than a corpus-wide candidate dedup shuffle.
    // shuffle-hash, explicitly: the key table is O(vocab·len) — it
    // GROWS with the corpus, so Catalyst's broadcast pick (measured
    // 7.0 s at sf0.1: a 15 MB string-bearing driver collect) is wrong
    // at every scale; co-partitioning both sides by the 8-byte key
    // costs one tiny exchange each (measured 1.5 s) and stays the
    // right plan when the vocabulary is a billion strings
    entries.as("a").hint("shuffle_hash").join(entries.as("b"), Seq("k"))
      .filter(col("a.s") < col("b.s"))
      .select(col("a.s").as("name_a"), col("b.s").as("name_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b"), maxDist))
      .filter(col("dist") >= 1)
      .distinct()
      .select(col("name_a"), col("name_b"), col("dist").cast("long"))
      .transform(d => Perf.sortedOnce(d, col("name_a"), col("name_b")))
  }

  /** C27 `q86_edit_join` — variant pairs of the customer-name
    * vocabulary within one edit (typo'd identifiers: each name's
    * deletion keys are near-full strings, so buckets hold only its
    * true variants). Oracle: exact all-pairs Levenshtein in DuckDB —
    * blocking losslessness IS the contract, the q59 convention. */
  def editJoinCustomers(spark: SparkSession, dir: String): DataFrame =
    editDistanceJoin(Tables(spark, dir).customer, "c_name", maxDist = 1)

  /** Canonical-form mapping for a string column's vocabulary — the
    * end-to-end entity-resolution deliverable: variant pairs from
    * [[editDistanceJoin]] become edges, connected components resolve
    * through the CERTIFIED cluster machinery
    * ([[Dedup.dupClusters]] — min-label propagation, q37's contract;
    * label min is lexicographic here, deterministic on any engine),
    * and every vocabulary entry maps to its component minimum
    * (singletons to themselves). Joining `canonical` back onto the
    * corpus normalizes the column in one equi join.
    *
    * Transitive closure is the documented semantics, stated honestly:
    * chains merge ("cold X" ~ "old X" ~ ... pulls whole families into
    * one canonical), which is what makes the result a PARTITION of the
    * vocabulary rather than a pair list — choose `maxDist` for the
    * variation you mean to collapse.
    *
    * Output: (name, canonical, is_variant), one row per distinct
    * non-null value. */
  def canonicalVocabulary(df: DataFrame, strCol: String,
                          maxDist: Int = 1): DataFrame = {
    val strs = df.select(col(strCol).cast("string").as("name"))
      .filter(col("name").isNotNull).distinct()
    val pairs = editDistanceJoin(df, strCol, maxDist)
      .select(col("name_a").as("id_a"), col("name_b").as("id_b"))
    val clusters = Dedup.dupClusters(pairs)
      .select(col("id").as("name"), col("rep_id"))
    strs.join(clusters, Seq("name"), "left")
      .select(col("name"),
        coalesce(col("rep_id"), col("name")).as("canonical"),
        coalesce(col("rep_id"), col("name")).=!=(col("name")).as("is_variant"))
      .transform(d => Perf.sortedOnce(d, col("name")))
  }

  /** C27b `q89_fuzzy_canonical` — the part-name vocabulary resolved at
    * maxDist 2 ("cold anvil" / "old anvil" / "red anvil" / "new anvil"
    * families collapse per noun). Oracle: brute-force pairs + the
    * q37 recursive-CTE closure in DuckDB — both halves of the
    * composition re-derived from scratch. */
  def fuzzyCanonicalParts(spark: SparkSession, dir: String): DataFrame =
    canonicalVocabulary(Tables(spark, dir).part, "p_name", maxDist = 2)

  /** Day-2 vocabulary maintenance — the fuzzy-family analog of
    * [[Dedup.dedupAgainstIndex]] / [[Similarity.appendToIvfIndex]]:
    * resolve ONLY the genuinely-new strings against the persisted
    * vocabulary and return rows to APPEND; existing rows are never
    * rewritten.
    *
    * Mechanics: new strings (distinct, anti-joined by name — replay
    * re-delivery is a no-op) probe the vocabulary's deletion-key
    * buckets exactly like [[editDistanceJoin]]'s self-join (shuffle-
    * hash on 8-byte keys; persist the key table bucketed by `k` to
    * skip even the vocab-side key pass at scale), verify by bounded
    * Levenshtein, and then resolve through the CERTIFIED closure over
    * new-new edges PLUS new→existing-canonical edges, so chains of new
    * strings reaching the old vocabulary through one another land on
    * the same canonical.
    *
    * Canonical rule, stated honestly (the incremental-index drift
    * contract): a cluster touching ≥1 EXISTING canonical adopts the
    * MIN existing canonical — existing entries keep their mapping even
    * when a new string lexicographically undercuts it, and a new
    * string BRIDGING two existing clusters does NOT merge them (it
    * maps to the min; the other cluster is untouched). Re-run
    * [[canonicalVocabulary]] when accumulated drift matters — the
    * refit cadence is an operational knob, exactly the IVF convention.
    * Clusters of only-new strings take their min label (the q89
    * batch rule, so append == rebuild when nothing touches the old
    * vocabulary — spec-asserted). */
  def appendToVocabulary(newDf: DataFrame, strCol: String, vocab: DataFrame,
                         maxDist: Int = 1): DataFrame = {
    require(maxDist == 1 || maxDist == 2,
      s"maxDist must be 1 or 2 (deletion-key fan-out is C(len, d)); got $maxDist")
    val fresh = newDf.select(col(strCol).cast("string").as("name"))
      .filter(col("name").isNotNull).distinct()
      .join(vocab.select(col("name")), Seq("name"), "left_anti")
      .localCheckpoint() // keys, pairs, closure and the final map all fork it
    val newKeys = fresh.select(col("name"),
      explode(delKeys(col("name"), maxDist)).as("k"))
    val vocabKeys = vocab.select(col("name").as("v_name"), col("canonical"))
      .withColumn("k", explode(delKeys(col("v_name"), maxDist)))
    // new→existing matches carry the EXISTING canonical as the edge target
    val matches = newKeys.hint("shuffle_hash").join(vocabKeys, Seq("k"))
      .withColumn("dist", levenshtein(col("name"), col("v_name"), maxDist))
      .filter(col("dist") >= 1)
      .select(col("name").as("id_a"), col("canonical").as("id_b"))
      .distinct()
    val newPairs = editDistanceJoin(fresh, "name", maxDist)
      .select(col("name_a").as("id_a"), col("name_b").as("id_b"))
    val clusters = Dedup.dupClusters(newPairs.unionByName(matches))
    // per cluster: min EXISTING canonical wins if the cluster touches
    // the old vocabulary; otherwise the closure's min label stands
    val existingMin = clusters
      .join(vocab.select(col("canonical").as("id")).distinct(), Seq("id"))
      .groupBy(col("rep_id")).agg(min(col("id")).as("_exist_min"))
    fresh
      .join(clusters.select(col("id").as("name"), col("rep_id")), Seq("name"), "left")
      .join(existingMin, Seq("rep_id"), "left")
      .select(col("name"),
        coalesce(col("_exist_min"), col("rep_id"), col("name")).as("canonical"))
      .withColumn("is_variant", col("canonical") =!= col("name"))
      .transform(d => Perf.sortedOnce(d, col("name")))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** C49: byte-pair-encoding tokenizer — train merges from the corpus and
  * encode with them (Sennrich, Haddow & Birch 2016, "Neural Machine
  * Translation of Rare Words with Subword Units", arXiv:1508.07909 —
  * the published algorithm, including its merge-application
  * convention: merges apply IN RANK ORDER, each exhaustively
  * left-to-right). This closes the tokenizer gap between C10's
  * counting heuristics (whitespace + a BPE-ish regex) and what a
  * training pipeline actually runs: token budgets, packing, and
  * length stats measured in REAL learned subword units.
  *
  * Distributed shape, stated honestly:
  *  - TRAINING runs on the word-FREQUENCY table, not the corpus: one
  *    distributed aggregation collapses 100 TB of text to |vocab|
  *    rows (bounded: top `maxVocabWords` by count), and the greedy
  *    merge loop then runs driver-side on that bounded table — the
  *    same shape every published BPE trainer uses (pair statistics
  *    over word counts), and the one deliberate driver-side loop in
  *    this library's C-block (like the holiday calendars: the input
  *    is small BY CONTRACT, and the `require` makes the contract
  *    loud);
  *  - ENCODING is pure column expressions: the char split and one
  *    left-to-right `replace` fold per merge (exactly the rank-order
  *    exhaustive convention — `replace` resumes scanning after each
  *    substitution, which IS BPE's left-greedy pass). Merge tables
  *    are bounded (`maxEncodeMerges`) because each merge is one
  *    expression node; a 30k-merge production vocabulary wants a
  *    native kernel (the [[graft.expressions]] pattern) — the
  *    documented growth path, not a silent cliff.
  */
object Bpe {

  /** The end-of-word marker (Sennrich's `</w>`): distinguishes "est"
    * inside a word from "est" ending one. */
  val EndOfWord = "</w>"

  /** Largest merge table [[encode]] accepts — one expression node per
    * merge; past this, register a native kernel instead. */
  val maxEncodeMerges = 256

  /** Train `numMerges` BPE merges from a corpus. One distributed
    * aggregation builds the (word, count) table under the corpus
    * tokenization (lower/trim/whitespace); the top `maxVocabWords`
    * words by (count desc, word) — deterministic — collect to the
    * driver and the greedy loop runs there. Ties between pairs break
    * to the lexicographically smallest (left, right), so retrains are
    * bit-stable.
    *
    * @return merges in rank order; fewer than `numMerges` if the
    *         vocabulary runs out of pairs */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
            maxVocabWords: Int = 100000): Seq[(String, String)] = {
    require(numMerges >= 1 && numMerges <= maxEncodeMerges,
      s"numMerges must lie in [1, $maxEncodeMerges], got $numMerges")
    require(maxVocabWords >= 1 && maxVocabWords <= 1000000,
      s"maxVocabWords must lie in [1, 1e6] (the table is collected), got $maxVocabWords")
    val words = docs
      .select(explode(split(lower(trim(col(textCol))), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w")).limit(maxVocabWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    var reps: Array[(Array[String], Long)] =
      words.map { case (w, n) => (w.map(_.toString).toArray :+ EndOfWord, n) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    while (round < numMerges) {
      val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
      reps.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts(p) = pairCounts.getOrElse(p, 0L) + n
          i += 1
        }
      }
      if (pairCounts.isEmpty) round = numMerges
      else {
        val (best, _) = pairCounts.toSeq
          .minBy { case ((a, b), n) => (-n, a, b) }
        merges += best
        val merged = best._1 + best._2
        reps = reps.map { case (syms, n) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == best._1 && syms(i + 1) == best._2) {
              out += merged; i += 2
            } else { out += syms(i); i += 1 }
          }
          (out.toArray, n)
        }
        round += 1
      }
    }
    merges.toSeq
  }

  /** The merge table as a persistable artifact: (rank, left, right). */
  def mergesTable(spark: SparkSession, merges: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    merges.zipWithIndex.map { case ((a, b), r) => (r.toLong, a, b) }
      .toDF("rank", "left", "right")
  }

  /** Encode one TOKEN column to its BPE piece array: char split + the
    * end-of-word marker, then ONE `replace` per merge in rank order —
    * EXHAUSTIVE left-to-right application (the subword-nmt
    * convention), exactly.
    *
    * The representation makes a single scan exhaustive: symbols are
    * separated by DOUBLE spaces and the pattern ` a  b ` consumes one
    * space from each boundary while the replacement ` ab ` re-emits
    * them — every boundary is double again after a substitution, so
    * back-to-back chains keep matching as the scan proceeds
    * (`a a a a a a` → `aa aa aa`, spec-asserted on runs). A single
    * left-to-right scan equals exhaustive application because a
    * substitution can never create a NEW occurrence of its own pair:
    * the merged symbol `ab` is strictly longer than `a` and `b`, so
    * any new adjacency involves `ab`, a different pair. Pure column
    * expressions, map-only, codegen'd. */
  def encode(tok: Column, merges: Seq[(String, String)]): Column = {
    require(merges.nonEmpty && merges.size <= maxEncodeMerges,
      s"encode takes 1..$maxEncodeMerges merges (one expression node each; " +
        s"larger tables want a native kernel), got ${merges.size}")
    val chars = concat(lit("  "),
      regexp_replace(tok, "(.)", "$1  "), lit(EndOfWord + "  "))
    val folded = merges.foldLeft(chars) { case (acc, (a, b)) =>
      call_function("replace", acc, lit(s" $a  $b "), lit(s" $a$b "))
    }
    split(trim(folded), "\\s+")
  }

  /** Per-document BPE length stats under a merge table: the real
    * subword counts token budgets and packing should use.
    * (doc_id, n_words, n_pieces, chars_per_piece 4-dp). */
  def encodeStats(docs: DataFrame, merges: Seq[(String, String)],
                  idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("_w"))
      .filter(col("_w") =!= "")
      .withColumn("_p", size(encode(col("_w"), merges)).cast("long"))
      .withColumn("_c", length(col("_w")).cast("long"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(col("_p")).as("n_pieces"),
        round(sum(col("_c")).cast("double") / sum(col("_p")), 4).as("chars_per_piece"))

  /** The q125 planted merge table — SHARED constants (the oracle
    * interpolates the same pairs): frequent word-salad letter pairs
    * plus one end-of-word merge and one three-deep chain, so rank
    * order, marker handling, and merge chaining all exercise. */
  val docMerges: Seq[(String, String)] = Seq(
    ("e", "r"), ("a", "t"), ("i", "n"), ("o", "w"),
    ("er", EndOfWord), ("at", "a"))

  /** C49 `q125_bpe_encode` — [[encodeStats]] over the documents corpus
    * with the planted [[docMerges]] table: the oracle replays the char
    * split, the marker, and the six replace folds in rank order, so
    * the encode SEMANTICS hash-check end to end. TRAINING is certified
    * by the planted-truth spec (the Sennrich low/lower/newest/widest
    * vocabulary with hand-derived merges), the KMeans convention:
    * learned artifacts get planted specs, their APPLICATION gets
    * oracles. */
  def bpeEncodeDocs(spark: SparkSession, dir: String): DataFrame =
    encodeStats(graft.Tables(spark, dir).documents, docMerges)
      .orderBy(col("doc_id"))
}

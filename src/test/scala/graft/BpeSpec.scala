package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

class BpeSpec extends SparkSpecBase {
  import spark.implicits._

  /** The Sennrich vocabulary (low/lower/newest/widest): first pair
    * counts are hand-derivable — (e,s) 9, (s,t) 9, (t,</w>) 9 tie
    * with (e,s) lexicographically smallest; then (es,t) 9 beats
    * (t,</w>); then (est,</w>) 9 — merges 1..3 are forced. */
  private def corpus = Seq(
    (1L, Seq.fill(5)("low").mkString(" ")),
    (2L, Seq.fill(2)("lower").mkString(" ")),
    (3L, Seq.fill(6)("newest").mkString(" ")),
    (4L, Seq.fill(3)("widest").mkString(" "))
  ).toDF("doc_id", "text")

  test("training recovers the hand-derived merges with deterministic tie-breaks") {
    val m = Bpe.train(corpus, "text", numMerges = 3)
    assert(m === Seq(("e", "s"), ("es", "t"), ("est", Bpe.EndOfWord)))
    // training past pair exhaustion stops early instead of looping
    val tiny = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val all = Bpe.train(tiny, "text", numMerges = 10)
    // "a b </w>" -> ab -> ab</w>: two merges exhaust the vocabulary
    assert(all === Seq(("a", "b"), ("ab", Bpe.EndOfWord)))
    intercept[IllegalArgumentException] { Bpe.train(corpus, "text", 0) }
    intercept[IllegalArgumentException] { Bpe.train(corpus, "text", 3, maxVocabWords = 0) }
  }

  test("encode applies merges in rank order, exhaustively left-to-right") {
    val m = Seq(("e", "s"), ("es", "t"), ("est", Bpe.EndOfWord))
    def enc(w: String) = Seq(w).toDF("w")
      .select(Bpe.encode(col("w"), m).as("p")).as[Seq[String]].head()
    assert(enc("lowest") === Seq("l", "o", "w", "est</w>"))
    assert(enc("estes") === Seq("est", "es", Bpe.EndOfWord),
      "rank order: (e,s)'s pass merges BOTH pairs, then (es,t) chains at the front")
    assert(enc("x") === Seq("x", Bpe.EndOfWord))
    // same-pair RUNS are the exhaustiveness stress case (a shared-
    // delimiter replace skips alternate members): every run length
    // must segment exactly as the canonical left-to-right loop does
    val mm = Seq(("a", "a"))
    def encRun(w: String) = Seq(w).toDF("w")
      .select(Bpe.encode(col("w"), mm).as("p")).as[Seq[String]].head()
    assert(encRun("aaaa") === Seq("aa", "aa", Bpe.EndOfWord))
    assert(encRun("aaaaa") === Seq("aa", "aa", "a", Bpe.EndOfWord))
    assert(encRun("aaaaaa") === Seq("aa", "aa", "aa", Bpe.EndOfWord))
    assert(encRun("aaaaaaa") === Seq("aa", "aa", "aa", "a", Bpe.EndOfWord))
    intercept[IllegalArgumentException] { Bpe.encode(col("w"), Seq.empty) }
  }

  test("mergesTable persists the ranks; encodeStats sums pieces per doc, map-only after the explode") {
    val m = Bpe.train(corpus, "text", 3)
    val tbl = Bpe.mergesTable(spark, m).as[(Long, String, String)].collect().toList
    assert(tbl === List((0L, "e", "s"), (1L, "es", "t"), (2L, "est", Bpe.EndOfWord)))
    val stats = Bpe.encodeStats(corpus, m)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toList
    // newest = n e w est</w> → 4 pieces × 6 words; chars 6 per word
    assert(stats.find(_._1 == 3L).get === ((3L, 6L, 24L, 1.5)))
    // low = l o w </w> → 4 pieces (no merge applies) × 5 words
    assert(stats.find(_._1 == 1L).get === ((1L, 5L, 20L, 0.75)))
  }
}

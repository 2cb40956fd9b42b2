package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.Classify

class ClassifySpec extends SparkSpecBase {
  import spark.implicits._

  private def ln8(x: Double): Long = math.round(math.log(x) * 1e8)

  /** Two classes with disjoint vocab: fit counts and class stats are
    * hand-checkable, and scoring a doc made of one class's tokens must
    * elect that class. */
  private def seed = Seq(
    (1L, "A", "aa bb aa"),
    (2L, "A", "aa cc"),
    (3L, "B", "dd ee"),
    (4L, "B", "dd dd ff gg")
  ).toDF("doc_id", "label", "text")

  test("nbFit counts tokens per (label, token) and per-class totals") {
    val (tc, cs) = Classify.nbFit(seed, "label", "text")
    val counts = tc.as[(String, String, Long)].collect().toSet
    assert(counts === Set(
      ("aa", "A", 3L), ("bb", "A", 1L), ("cc", "A", 1L),
      ("dd", "B", 3L), ("ee", "B", 1L), ("ff", "B", 1L), ("gg", "B", 1L)))
    val stats = cs.as[(String, Long, Long)].collect().toSet
    assert(stats === Set(("A", 2L, 5L), ("B", 2L, 6L)))
  }

  test("nbScore computes the exact scaled-long posterior and elects the argmax") {
    val (tc, cs) = Classify.nbFit(seed, "label", "text")
    val batch = Seq((10L, "aa aa bb")).toDF("doc_id", "text")
    val out = Classify.nbScore(batch, tc, cs).as[(Long, String, Long)].collect()
    // V = 7 distinct seed tokens; priors ln(2/4) each side.
    // A: 2·ln(3+1) + 1·ln(1+1) − 3·ln(5+7) + ln(0.5)  (all on the 1e-8 grid)
    val expA = 2L * ln8(4.0) + ln8(2.0) - 3L * ln8(12.0) + ln8(0.5)
    assert(out === Array((10L, "A", expA)))
  }

  test("a seed-OOV document decides on prior and denominator alone, ties to the smaller label") {
    val (tc, cs) = Classify.nbFit(seed, "label", "text")
    val batch = Seq((11L, "zz zz")).toDF("doc_id", "text")
    val Array((_, pred, score)) = Classify.nbScore(batch, tc, cs)
      .as[(Long, String, Long)].collect()
    // part = 0 both sides; A's denominator ln(5+7) < B's ln(6+7) wins.
    assert(pred === "A")
    assert(score === -2L * ln8(12.0) + ln8(0.5))
  }

  test("loud refusal on malformed model frames") {
    val (tc, cs) = Classify.nbFit(seed, "label", "text")
    val batch = Seq((12L, "aa")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Classify.nbScore(batch, tc.withColumnRenamed("c", "count"), cs)
    }
    intercept[IllegalArgumentException] {
      Classify.nbScore(batch, tc, cs.select(col("label"), col("n_docs")))
    }
  }

  test("merged two-half fit equals the full fit exactly (merge-equals-refit)") {
    val full = seed
    val (tcA, csA) = Classify.nbFit(full.filter(col("doc_id") % 2 === 0), "label", "text")
    val (tcB, csB) = Classify.nbFit(full.filter(col("doc_id") % 2 === 1), "label", "text")
    val (tcM, csM) = Classify.mergeNbModels(tcA, csA, tcB, csB)
    val (tcF, csF) = Classify.nbFit(full, "label", "text")
    assert(tcM.as[(String, String, Long)].collect().toSet ===
      tcF.as[(String, String, Long)].collect().toSet)
    assert(csM.as[(String, Long, Long)].collect().toSet ===
      csF.as[(String, Long, Long)].collect().toSet)
    // scoring through the merged model is byte-identical to the refit
    val batch = Seq((20L, "aa dd dd"), (21L, "zz")).toDF("doc_id", "text")
    assert(Classify.nbScore(batch, tcM, csM).collect().toSet ===
      Classify.nbScore(batch, tcF, csF).collect().toSet)
  }

  test("q108 entry: one verdict per held-out doc, correct flag consistent, classes learned") {
    val out = Classify.nbLangDocs(spark, sfDir)
    val rows = out.collect()
    val docs = Tables(spark, sfDir).documents
    val nBatch = docs.filter(col("doc_id") % 5 === 4).count()
    assert(rows.length === nBatch)
    rows.foreach { case Row(_, t: String, p: String, c: Boolean, _) =>
      assert(c === (t == p))
    }
    // the planted one-token-in-fifty marker must be learned through the
    // shared-vocabulary noise — near-perfect recovery, not chance
    val acc = rows.count(_.getBoolean(3)).toDouble / rows.length
    assert(acc > 0.9, s"NB marker recovery accuracy $acc — signal not learned")
  }

  test("correct=false fires on a mislabeled holdout — the verdict is computed, not copied") {
    // The registered q108/q112 show correct all-TRUE because the
    // synthetic corpus is separable by construction (allowlisted in
    // the coverage sweep); this planted case certifies the FALSE path:
    // a holdout labeled B whose text carries A's markers must predict
    // A and verdict correct = false
    val train = Seq(
      ("A", "alpha alpha alpha common"), ("A", "alpha common alpha"),
      ("B", "beta beta beta common"), ("B", "beta common beta")
    ).toDF("label", "text").withColumn("doc_id", monotonically_increasing_id())
    val (tc, cs) = Classify.nbFit(train, "label", "text")
    val holdout = Seq((100L, "B", "alpha alpha common alpha"),
      (101L, "B", "beta beta common")).toDF("doc_id", "actual", "text")
    val scored = Classify.nbScore(holdout, tc, cs)
      .join(holdout.select(col("doc_id"), col("actual")), Seq("doc_id"))
      .withColumn("correct", col("actual") === col("pred_label"))
      .select(col("doc_id"), col("correct")).as[(Long, Boolean)].collect().toMap
    assert(!scored(100L), "the mislabeled doc must verdict correct=false")
    assert(scored(101L), "the true-labeled doc must verdict correct=true")
  }
}

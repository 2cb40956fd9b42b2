package graft

import graft.operators.Validation
import org.apache.spark.sql.functions._

class ValidationSpec extends SparkSpecBase {
  import spark.implicits._

  private val frame = Seq(
    (1L, Some(10.0), Some("A")),
    (2L, Some(-5.0), Some("A")),   // negative
    (3L, Some(20.0), None),        // null label
    (4L, None, Some("B")),         // null value → violates the value rule
    (5L, Some(30.0), Some("Z"))    // bad label
  ).toDF("id", "v", "label")

  private val rules = Seq(
    "negative_value" -> (col("v") < 0),
    "bad_label" -> !col("label").isin("A", "B"))

  test("checkRules counts violations per rule in one pass, nulls count as violations") {
    val out = Validation.checkRules(frame, rules, maxViolationPct = 30.0)
      .select("rule", "n_violations", "n_rows", "violation_pct", "passed")
      .as[(String, Long, Long, Double, Boolean)].collect().toSeq
    assert(out == Seq(
      // bad_label: id 3 (null label) + id 5 → 2/5 = 40% > 30% → fail
      ("bad_label", 2L, 5L, 40.0, false),
      // negative_value: id 2 + id 4 (null v → unknown → violation) = 40%
      ("negative_value", 2L, 5L, 40.0, false)))
  }

  test("checkRules passes rules under the tolerance") {
    val out = Validation.checkRules(frame, Seq("huge" -> (col("v") > 1e9)),
      maxViolationPct = 25.0)
      .select("n_violations", "passed").as[(Long, Boolean)].collect().toSeq
    // only id 4's null v counts (unknown = violation): 20% <= 25%
    assert(out == Seq((1L, true)))
  }

  test("checkRules runs the whole rule set in a single scan") {
    val plan = Validation.ordersQuality(spark, sfDir).queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(plan).length == 1,
      "rule count must not add passes over the data")
  }

  test("q97 composed ingest gate stays single-scan and coercion nulls hit the right rules") {
    val out = Validation.ingestGateOrders(spark, sfDir)
    val plan = out.queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(plan).length == 1,
      "schema apply is a projection — composing it with the rules must not add a pass")
    val rows = out.as[(String, Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._5))).toMap
    val n = rows("missing_channel")._2
    assert(rows("missing_channel")._1 == n && !rows("missing_channel")._3,
      "the declared-but-absent column is all-NULL and fails the gate")
    // keys ≡ 0 (mod 7) were mangled: try_cast made exactly those null
    // (orderkeys are TPC-H-sparse, so ~1/7 of rows, not exactly n/7)
    val badPrice = rows("unparseable_price")._1
    assert(badPrice > 0 && badPrice < n / 4, s"planted corruption must surface: $badPrice of $n")
    assert(rows("unparseable_price")._3, "~14% corruption passes the 20% tolerance")
    assert(rows("unparseable_date")._3, "~9% corruption passes the 20% tolerance")
  }

  test("flagViolations routes rows with their failed rule names, in rule order") {
    val out = Validation.flagViolations(frame, rules)
      .select(col("id"), col("violations"))
      .as[(Long, Seq[String])].collect().toMap
    assert(out(1L) == Seq.empty)
    assert(out(2L) == Seq("negative_value"))
    assert(out(3L) == Seq("bad_label"))
    assert(out(4L) == Seq("negative_value"))
    assert(out(5L) == Seq("bad_label"))
  }

  test("checkRules rejects malformed or duplicate rule names") {
    intercept[IllegalArgumentException] {
      Validation.checkRules(frame, Seq("bad name" -> lit(true)))
    }
    intercept[IllegalArgumentException] {
      Validation.checkRules(frame, Seq("a" -> lit(true), "a" -> lit(false)))
    }
  }
}

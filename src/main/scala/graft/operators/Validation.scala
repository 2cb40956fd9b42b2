package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declarative data-quality validation: N rules over a frame, ONE scan.
  *
  * The reference applies schemas (`load_schema_from_csv`) but checks
  * nothing about the VALUES it loads; a pipeline that writes day tables
  * needs the complementary gate — "how many rows violate each
  * contract, and is that within tolerance?" — before a bad extract
  * replaces a good partition.
  *
  * Scale shape: every rule compiles to a `sum(when(pred, 1))`
  * conditional aggregate, so the whole rule set is one map-side-partial
  * aggregation over one scan — rule count does not add passes (the
  * oracle SQL for q65 spells the same sums). Row-level routing
  * ([[flagViolations]]) is a pure projection: zero shuffles.
  */
object Validation {

  /** Validate `rules` (name → violation predicate: TRUE means the row
    * VIOLATES the rule) in one scan. Returns one row per rule:
    * (rule, n_violations, n_rows, violation_pct, passed) where passed
    * compares the ROUNDED percentage against `maxViolationPct` —
    * rounded so the verdict is reproducible across engines.
    *
    * Null predicate results count as violations: a rule that cannot
    * evaluate (null status, null price) is a data problem, not a pass
    * — the reason ANSI's null-is-unknown default is wrong here.
    */
  def checkRules(df: DataFrame, rules: Seq[(String, Column)],
                 maxViolationPct: Double = 0.0): DataFrame = {
    require(rules.nonEmpty, "checkRules needs at least one rule")
    val ident = "^[A-Za-z][A-Za-z0-9_]*$".r
    rules.foreach { case (n, _) =>
      require(ident.matches(n), s"rule name '$n' must be identifier-shaped")
    }
    require(rules.map(_._1).distinct.size == rules.size, "rule names must be unique")
    val aggs = rules.map { case (n, pred) =>
      sum(when(coalesce(pred, lit(true)), 1L).otherwise(0L)).as(s"_v_$n")
    } :+ count(lit(1)).as("_n")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = s"stack(${rules.size}, " +
      rules.map { case (n, _) => s"'$n', _v_$n" }.mkString(", ") +
      ") as (rule, n_violations)"
    one.select(expr(stacked), col("_n").as("n_rows"))
      .withColumn("violation_pct",
        round(col("n_violations") * 100.0 / col("n_rows"), 4))
      .withColumn("passed", col("violation_pct") <= maxViolationPct)
      .transform(d => Perf.sortedOnce(d, col("rule")))
  }

  /** Row-level routing: append `violations` (the names of the rules
    * each row fails, in rule order) — filter `size(violations) > 0`
    * for the quarantine side, `= 0` for the clean side. Map-only. */
  def flagViolations(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "flagViolations needs at least one rule")
    val flags = rules.map { case (n, pred) =>
      when(coalesce(pred, lit(true)), lit(n))
    }
    df.withColumn("violations",
      filter(array(flags: _*), x => x.isNotNull))
  }

  /** `q97_ingest_gate` — A16+A24 COMPOSED in the reference's real
    * ingest order (`utils.load_schema_from_csv` coerce-apply, then
    * validate before the partition upload): an all-strings staging
    * frame (the shape a CSV extract lands as, with deterministic
    * corruption planted by key) goes through
    * [[graft.sources.Schemas.applySchema]] (try_cast coercion, a
    * declared-but-absent column added as NULL) and straight into
    * [[checkRules]]. The point the spec pins: composing the two adds
    * NO pass — schema apply is a projection, so the whole gate is
    * still one scan + one conditional aggregate.
    *
    * Rules mix coercion checks (nulls MADE by try_cast), a value
    * check over coerced numbers, and the missing-column tripwire;
    * tolerance 20% lets some rules pass and some fail. */
  def ingestGateOrders(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir).orders
    val staging = o.select(
      col("o_orderkey").cast("string").as("o_orderkey"),
      when(col("o_orderkey") % 7 === 0, lit("N/A"))
        .otherwise(col("o_totalprice").cast("string")).as("o_totalprice"),
      when(col("o_orderkey") % 11 === 0, lit("not-a-date"))
        .otherwise(col("o_orderdate").cast("string")).as("o_orderdate"),
      col("o_orderstatus"))
    val typed = graft.sources.Schemas.applySchema(staging, Seq(
      "o_orderkey" -> "long",
      "o_totalprice" -> "double",
      "o_orderdate" -> "date",
      "channel" -> "string"))
    checkRules(typed, Seq(
      "unparseable_price" -> col("o_totalprice").isNull,
      "unparseable_date" -> col("o_orderdate").isNull,
      "nonpositive_price" -> (col("o_totalprice") <= 0),
      "unknown_status" -> !col("o_orderstatus").isin("O", "F", "P"),
      "missing_channel" -> col("channel").isNull
    ), maxViolationPct = 20.0)
  }

  /** `q65_data_quality`: contract checks over the orders table at 1%
    * tolerance — a mix of firing rules (price cap) and clean ones. */
  def ordersQuality(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir).orders
    checkRules(o, Seq(
      "nonpositive_price" -> (col("o_totalprice") <= 0),
      "price_above_cap" -> (col("o_totalprice") > 400000),
      "unknown_status" -> !col("o_orderstatus").isin("O", "F", "P"),
      "null_priority" -> col("o_orderpriority").isNull,
      "null_date" -> col("o_orderdate").isNull
    ), maxViolationPct = 1.0)
  }
}

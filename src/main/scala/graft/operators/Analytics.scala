package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Engagement analytics over the events stream: cohort retention,
  * ordered funnel conversion, rolling-window metrics, and
  * trailing-baseline anomaly flags.
  *
  * The reference's clients all terminate in per-day marketing report
  * tables (GA4 `_get_paginated_report`, Facebook `date_range` unions,
  * youtube/linkedin day frames); these four operators are the standard
  * second-order reports analysts derive FROM those tables. Each is
  * ANSI-expressible, so the driver hash-checks all of them against
  * DuckDB.
  *
  * Scale shapes (all verified against `.explain`):
  *  - retention: events collapse to (user, week) FIRST (partial agg
  *    map-side), so the per-user window runs on |users × weeks| rows,
  *    not raw events; cohort sizes come from a window over the final
  *    aggregate, never a second pass over the input.
  *  - funnel: each step filters by event_type AT THE SCAN (pushdown),
  *    then aggregates per user; step joins are user_id-keyed and AQE
  *    co-partitions them with the per-step groupBys.
  *  - rolling/anomaly: ONE groupBy to daily grain, then windows
  *    partitioned by the series key — a single exchange that Spark
  *    reuses for every windowed column.
  */
object Analytics {

  /** Weekly cohort retention: users bucketed by the Monday of their
    * first-ever event; for each (cohort, week-offset) the count of
    * cohort members active that week and the retention ratio.
    *
    * Composable primitive: any (key, ts) frame works. Week grain keeps
    * parity with DuckDB's Monday-start `date_trunc('week', ...)`.
    */
  def cohortRetention(df: DataFrame, userCol: String, tsCol: String): DataFrame = {
    // collapse to user-week grain first: the heavy input (raw events)
    // reduces map-side before anything user-partitioned runs
    val weekly = df
      .select(col(userCol), date_trunc("week", col(tsCol)).cast("date").as("week_start"))
      .distinct()
    val byUser = Window.partitionBy(col(userCol))
    val offsets = weekly
      .withColumn("cohort_week", min(col("week_start")).over(byUser))
      .withColumn("week_offset",
        (datediff(col("week_start"), col("cohort_week")) / 7).cast("int"))
    val counts = offsets
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("active_users"))
    // cohort_size = the offset-0 count (every member is active in their
    // first week by construction). A window over the already-aggregated
    // counts frame (|cohorts × offsets| rows) gets it WITHOUT re-running
    // the events pipeline — a self-join here doubled the scan count
    counts
      .withColumn("cohort_size",
        max(when(col("week_offset") === 0, col("active_users")))
          .over(Window.partitionBy(col("cohort_week"))))
      .withColumn("retention_pct",
        round(col("active_users").cast("double") / col("cohort_size"), 4))
      .transform(d => Perf.sortedOnce(d, col("cohort_week"), col("week_offset")))
  }

  /** `q55_cohort_retention` on the events table. */
  def cohortRetentionEvents(spark: SparkSession, dir: String): DataFrame =
    cohortRetention(Tables(spark, dir).events, "user_id", "ts")

  /** STRICT-ORDER funnel: a user reaches step k only via an event of
    * step k's type strictly AFTER the timestamp that qualified them for
    * step k−1 (first-touch per step). Returns one row per step with
    * reach counts and conversion ratios.
    *
    * Each step is (filter by type at the scan) → per-user min-ts, joined
    * to the survivors of the previous step. The per-step frames shrink
    * monotonically, and every join + groupBy keys on the user column, so
    * AQE plans them as co-partitioned (or broadcast once the survivor
    * set is small — the common case from step 2 on).
    */
  def funnel(df: DataFrame, userCol: String, tsCol: String, typeCol: String,
             steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val spark = df.sparkSession
    val e = df.select(col(userCol), col(tsCol), col(typeCol))
    // stepFrames(k): (user, t) = first qualifying timestamp at step k.
    // Each step MATERIALIZES (localCheckpoint of a tiny per-user frame):
    // lazily, step k's plan embeds steps 1..k-1 wholesale, so a k-step
    // funnel re-scanned the input O(k²) times — with the checkpoint
    // each event type is scanned exactly once and later steps join
    // against in-memory survivor frames
    val stepFrames = steps.tail.scanLeft(
      e.filter(col(typeCol) === steps.head)
        .groupBy(col(userCol)).agg(min(col(tsCol)).as("t"))
        .localCheckpoint()
    ) { (prev, stepType) =>
      e.filter(col(typeCol) === stepType).as("e")
        .join(prev.as("p"), col(s"e.$userCol") === col(s"p.$userCol") &&
          col(s"e.$tsCol") > col("p.t"))
        .groupBy(col(s"e.$userCol").as(userCol))
        .agg(min(col(s"e.$tsCol")).as("t"))
        .localCheckpoint()
    }
    val counts = stepFrames.zip(steps).zipWithIndex.map { case ((f, name), i) =>
      f.agg(count(lit(1)).as("users"))
        .select(lit(i + 1).as("step"), lit(name).as("step_name"), col("users"))
    }.reduce(_ unionByName _)
    // 1 row per step: the unpartitioned window is a deliberate
    // single-partition op on a |steps|-row frame
    val w = Window.orderBy(col("step"))
    counts
      .withColumn("pct_of_first",
        round(col("users").cast("double") / first(col("users")).over(w), 4))
      .withColumn("pct_of_prev",
        round(col("users").cast("double") / lag(col("users"), 1).over(w), 4))
      .transform(d => Perf.sortedOnce(d, col("step")))
  }

  /** `q56_funnel_conversion`: view → click → purchase over events. */
  def funnelEvents(spark: SparkSession, dir: String): DataFrame =
    funnel(Tables(spark, dir).events, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"))

  /** Daily series per key with TIME-ANCHORED rolling aggregates: the
    * trailing `days`-day window is a RANGE frame over the day number,
    * so calendar gaps SHRINK the window (a ROWS frame would silently
    * reach back past the gap — wrong for sparse series).
    */
  def rollingDaily(df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
                   days: Int = 7): DataFrame = {
    require(days > 0, s"days must be positive, got $days")
    val daily = df
      .groupBy(col(keyCol), col(tsCol).cast("date").as("day"))
      .agg(sum(col(valueCol)).as("_daily"), count(lit(1)).as("n_events"))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("_day_num")).rangeBetween(-(days - 1), 0)
    daily
      .withColumn("_day_num", datediff(col("day"), lit("1970-01-01").cast("date")))
      .withColumn(s"rolling_${days}d_value", round(sum(col("_daily")).over(w), 4))
      .withColumn(s"rolling_${days}d_avg", round(avg(col("_daily")).over(w), 4))
      .withColumn(s"rolling_${days}d_events", sum(col("n_events")).over(w))
      .withColumn("daily_value", round(col("_daily"), 4))
      .drop("_daily", "_day_num")
      .transform(d => Perf.sortedOnce(d, col(keyCol), col("day")))
  }

  /** `q57_rolling_metrics`: 7-day rolling value/events per event_type. */
  def rollingMetricsEvents(spark: SparkSession, dir: String): DataFrame =
    rollingDaily(Tables(spark, dir).events, "event_type", "ts", "value")

  /** Daily-count anomaly flags: each day's event count scored against
    * the TRAILING `baselineDays`-day baseline (current day excluded, so
    * a spike can't suppress its own z-score). z is null until the
    * baseline has ≥2 days or when the baseline is flat (σ=0) — a 0/0
    * would otherwise produce engine-dependent NaN/Inf.
    */
  def anomalyFlags(df: DataFrame, keyCol: String, tsCol: String,
                   baselineDays: Int = 7, zThreshold: Double = 2.0): DataFrame = {
    require(baselineDays >= 2, s"baselineDays must be >= 2, got $baselineDays")
    val daily = df
      .groupBy(col(keyCol), col(tsCol).cast("date").as("day"))
      .agg(count(lit(1)).as("n_events"))
    // CALENDAR-anchored baseline: a RANGE frame over the day number, so
    // a reporting gap SHRINKS the trailing window (possibly to empty →
    // null z) instead of letting stale pre-gap days vote — the same
    // rationale rollingDaily states, and the contract the streaming twin
    // advertises. A ROWS frame here would silently bridge a 30-day
    // outage and score the first post-gap day against month-old counts.
    val w = Window.partitionBy(col(keyCol)).orderBy(col("_day_num"))
      .rangeBetween(-baselineDays, -1)
    val z: Column = (col("n_events") - col("_mean")) / col("_std")
    daily
      .withColumn("_day_num", datediff(col("day"), lit("1970-01-01").cast("date")))
      .withColumn("_mean", avg(col("n_events")).over(w))
      .withColumn("_std", stddev_samp(col("n_events")).over(w))
      .withColumn("z_score",
        when(col("_std").isNull || col("_std") === 0.0, lit(null)).otherwise(round(z, 4)))
      .withColumn("is_anomaly", coalesce(abs(col("z_score")) > zThreshold, lit(false)))
      .withColumn("baseline_mean", round(col("_mean"), 4))
      .withColumn("baseline_std", round(col("_std"), 4))
      .drop("_mean", "_std", "_day_num")
      .transform(d => Perf.sortedOnce(d, col(keyCol), col("day")))
  }

  /** `q58_anomaly_flags`: daily per-type counts vs 7-day baseline. */
  def anomalyFlagsEvents(spark: SparkSession, dir: String): DataFrame =
    anomalyFlags(Tables(spark, dir).events, "event_type", "ts")

  /** Multi-touch attribution: each conversion's value splits across
    * that user's touch events inside the lookback window strictly
    * BEFORE the conversion (q41's as-of join is the last-touch model).
    * Returns daily credited revenue per touch day.
    *
    * `model` picks the split:
    *  - `linear`: equal credit, value/n;
    *  - `u_shaped`: 40% first touch, 40% last, middles share 20%
    *    (position-based; 1 touch → 100%, 2 touches → 50/50);
    *  - `time_decay`: weight 0.5^(age_days/halfLifeDays), normalized
    *    per conversion — recent touches dominate.
    *
    * Shape: touches and conversions are type-filtered AT THE SCAN,
    * then joined per user with the window predicate riding the equi
    * join — same monotone-shrinking pattern as [[funnel]]. All three
    * models compute their weights from window functions over the
    * joined frame keyed by the conversion id, so they share ONE
    * partitioning; position ties break on the touch timestamp then
    * `touchIdCol` (pass it when touch timestamps can collide —
    * u_shaped's first/last are otherwise tie-ambiguous).
    */
  def attribution(df: DataFrame, userCol: String, tsCol: String,
                  typeCol: String, valueCol: String,
                  touchType: String, convType: String,
                  lookbackDays: Int = 7,
                  convIdCol: Option[String] = None,
                  model: String = "linear",
                  halfLifeDays: Double = 2.0,
                  touchIdCol: Option[String] = None): DataFrame = {
    require(lookbackDays > 0, s"lookbackDays must be positive, got $lookbackDays")
    require(Set("linear", "u_shaped", "time_decay").contains(model),
      s"model must be linear|u_shaped|time_decay, got $model")
    require(halfLifeDays > 0, s"halfLifeDays must be positive, got $halfLifeDays")
    val touches = df.filter(col(typeCol) === touchType)
      .select(col(userCol) +: col(tsCol).as("_touch_ts") +:
        touchIdCol.map(c => col(c).as("_touch_id")).toSeq: _*)
    // conversions need a stable identity for the per-conversion split:
    // (user, ts) can collide on simultaneous conversions, which would
    // silently merge their touch sets. Callers with a real event id
    // pass it (it also makes the operator oracle-shareable); otherwise
    // the id DERIVES from the data: a per-user sequence number over the
    // (ts, value) order. Unlike monotonically_increasing_id (which
    // renumbers when a task retries or the partition layout changes),
    // the sequence is a pure function of the rows — the order is total
    // except for fully-identical conversion rows, and those are
    // interchangeable in every downstream aggregate, so recomputation
    // always lands the same credits (spec-asserted). Costs one window
    // over the CONVERSIONS frame only (sparse next to touches).
    val convs = {
      val base = df.filter(col(typeCol) === convType)
      convIdCol match {
        case Some(c) =>
          base.select(col(userCol), col(tsCol).as("_conv_ts"),
            col(valueCol).as("_value"), col(c).as("_conv_id"))
        case None =>
          val seqW = Window.partitionBy(col(userCol))
            .orderBy(col(tsCol).asc, col(valueCol).asc)
          base.select(col(userCol), col(tsCol).as("_conv_ts"),
            col(valueCol).as("_value"),
            struct(col(userCol), row_number().over(seqW)).as("_conv_id"))
      }
    }
    val window = expr(s"INTERVAL $lookbackDays DAYS")
    val joined = convs.join(touches, Seq(userCol))
      .filter(col("_touch_ts") < col("_conv_ts") &&
        col("_touch_ts") >= col("_conv_ts") - window)
    val perConv = Window.partitionBy(col("_conv_id"))
    val posOrder = col("_touch_ts").asc +: touchIdCol.map(_ => col("_touch_id").asc).toSeq
    // Per-touch credits quantize to a fixed 1e-8 grid and accumulate as
    // exact longs (the q33 scaled-long money convention). A double sum
    // is merge-order-DEPENDENT: at sf0.01 touch-day 2024-01-05's true
    // credited sum is exactly 3491.31575 — a dead-center 4dp grid tie —
    // so Spark's and DuckDB's different summation orders rounded it to
    // opposite sides. Everything BEFORE the quantization is plain IEEE
    // arithmetic on identical inputs (bit-identical across engines), the
    // long sum is order-free, and the trailing 1e-9 nudge keeps
    // grid-exact totals off the half-up boundary.
    def scaledCredit(c: Column): Column = round(c * 100000000.0).cast("long")
    val weighted = model match {
      case "linear" =>
        joined
          .withColumn("_n", count(lit(1)).over(perConv))
          .withColumn("_credit_s", scaledCredit(col("_value") / col("_n")))
      case "u_shaped" =>
        joined
          .withColumn("_n", count(lit(1)).over(perConv))
          .withColumn("_pos", row_number().over(perConv.orderBy(posOrder: _*)))
          .withColumn("_w",
            when(col("_n") === 1, 1.0)
              .when(col("_n") === 2, 0.5)
              .when(col("_pos") === 1 || col("_pos") === col("_n"), 0.4)
              .otherwise(lit(0.2) / (col("_n") - 2)))
          .withColumn("_credit_s", scaledCredit(col("_value") * col("_w")))
      case "time_decay" =>
        // NTZ-safe epoch seconds: NTZ→TIMESTAMP is a valid cast (UTC
        // session), TIMESTAMP→DOUBLE is epoch seconds; both operands
        // take the same path so the difference is exact
        def secs(c: Column) = c.cast("timestamp").cast("double")
        val ageDays = (secs(col("_conv_ts")) - secs(col("_touch_ts"))) / 86400.0
        joined
          // decay ages are RELATIVE to the conversion's newest touch:
          // the normalization divides the common factor out, so _w is
          // unchanged, but the newest touch's raw weight is always
          // exactly 1 — an absolute-age formulation underflowed the
          // quantization grid for small half-lives (every _raw_s = 0 →
          // 0/0 weights silently zeroed the conversion's whole credit)
          .withColumn("_min_age", min(ageDays).over(perConv))
          // raw decay weights quantize BEFORE normalization so the
          // per-conversion weight denominator is an exact long sum (the
          // double sum over the window is order-dependent too)
          .withColumn("_raw_s",
            round(pow(lit(0.5), (ageDays - col("_min_age")) / halfLifeDays) * 1.0e9)
              .cast("long"))
          .withColumn("_w",
            col("_raw_s").cast("double") / sum(col("_raw_s")).over(perConv).cast("double"))
          .withColumn("_credit_s", scaledCredit(col("_value") * col("_w")))
    }
    weighted
      .groupBy(col("_touch_ts").cast("date").as("touch_day"))
      .agg(
        // the scaled credits sum in DECIMAL, not LONG: Spark's long sum
        // wraps silently past 2^63 (a ~9e10 credited day at the 1e-8
        // grid) while DuckDB promotes BIGINT sums to HUGEINT — decimal
        // keeps the sum exact on both engines at any scale
        round(sum(col("_credit_s").cast("decimal(38,0)")).cast("double")
          / 100000000.0 + lit(1e-9), 4).as("credited_value"),
        count(lit(1)).as("n_credited_touches"),
        countDistinct(col("_conv_id")).as("n_conversions"))
      .transform(d => Perf.sortedOnce(d, col("touch_day")))
  }

  /** [[attribution]] with the equal-credit model (kept as the named
    * entry point the q63 oracle shares). */
  def linearAttribution(df: DataFrame, userCol: String, tsCol: String,
                        typeCol: String, valueCol: String,
                        touchType: String, convType: String,
                        lookbackDays: Int = 7,
                        convIdCol: Option[String] = None): DataFrame =
    attribution(df, userCol, tsCol, typeCol, valueCol, touchType, convType,
      lookbackDays, convIdCol, model = "linear")

  /** `q63_linear_attribution`: purchase value split across the user's
    * clicks in the prior 7 days. */
  def linearAttributionEvents(spark: SparkSession, dir: String): DataFrame =
    linearAttribution(Tables(spark, dir).events, "user_id", "ts", "event_type",
      "value", touchType = "click", convType = "purchase",
      convIdCol = Some("event_id"))

  /** `q67_ushaped_attribution`: the position-based 40/20/40 model on the
    * same touch/conversion frame — its weights (1, 0.5, 0.4, 0.2/(n−2))
    * are plain IEEE expressions both engines evaluate bit-identically,
    * so unlike time_decay it is fully ANSI-expressible and DuckDB
    * hash-checks it (position ties break on the event id). */
  def ushapedAttributionEvents(spark: SparkSession, dir: String): DataFrame =
    attribution(Tables(spark, dir).events, "user_id", "ts", "event_type",
      "value", touchType = "click", convType = "purchase",
      convIdCol = Some("event_id"), model = "u_shaped",
      touchIdCol = Some("event_id"))

  /** `q96_timedecay_attribution`: the half-life model on the same
    * touch/conversion frame. Despite the transcendental weight, every
    * stage is engine-portable: ages are exact µs-epoch differences,
    * the 0.5^x weights quantize to a 1e9 grid BEFORE the
    * per-conversion normalization (so the weight denominator is an
    * exact long sum), and credits ride the shared q63 scaled-long
    * path — the one model that was spec-only until round 11. */
  def timeDecayAttributionEvents(spark: SparkSession, dir: String): DataFrame =
    attribution(Tables(spark, dir).events, "user_id", "ts", "event_type",
      "value", touchType = "click", convType = "purchase",
      convIdCol = Some("event_id"), model = "time_decay",
      halfLifeDays = 2.0)
}

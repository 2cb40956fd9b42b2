package graft

import graft.operators.Analytics
import org.apache.spark.sql.functions._
import java.sql.{Date, Timestamp}

class AnalyticsSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // ---- cohort retention ------------------------------------------------

  test("cohortRetention buckets users by first-event Monday and counts weekly activity") {
    // 2024-01-01 is a Monday. u1,u2 cohort week1; u3 cohort week2.
    val events = Seq(
      (1L, ts("2024-01-02 10:00:00")), // u1 w1
      (1L, ts("2024-01-09 10:00:00")), // u1 w2 (offset 1)
      (1L, ts("2024-01-10 10:00:00")), // u1 w2 again — still one active row
      (2L, ts("2024-01-03 10:00:00")), // u2 w1 only
      (3L, ts("2024-01-08 10:00:00")), // u3 cohort w2
      (3L, ts("2024-01-22 10:00:00"))  // u3 offset 2 (skips w3: no offset-1 row)
    ).toDF("user_id", "ts")

    val out = Analytics.cohortRetention(events, "user_id", "ts")
      .select("cohort_week", "week_offset", "active_users", "cohort_size", "retention_pct")
      .as[(Date, Int, Long, Long, Double)].collect().toSeq

    assert(out == Seq(
      (Date.valueOf("2024-01-01"), 0, 2L, 2L, 1.0),
      (Date.valueOf("2024-01-01"), 1, 1L, 2L, 0.5),
      (Date.valueOf("2024-01-08"), 0, 1L, 1L, 1.0),
      (Date.valueOf("2024-01-08"), 2, 1L, 1L, 1.0)))
  }

  // ---- funnel ----------------------------------------------------------

  test("funnel enforces strict step ordering per user") {
    val events = Seq(
      // u1 completes the funnel in order
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:05:00"), "click"),
      (1L, ts("2024-01-01 10:10:00"), "purchase"),
      // u2 clicks BEFORE its first view → never reaches step 2
      (2L, ts("2024-01-01 09:00:00"), "click"),
      (2L, ts("2024-01-01 11:00:00"), "view"),
      // u3 views then clicks, no purchase
      (3L, ts("2024-01-01 10:00:00"), "view"),
      (3L, ts("2024-01-01 10:30:00"), "click"),
      // u4 purchase before click: reaches step 2 only
      (4L, ts("2024-01-01 08:00:00"), "purchase"),
      (4L, ts("2024-01-01 09:00:00"), "view"),
      (4L, ts("2024-01-01 09:30:00"), "click")
    ).toDF("user_id", "ts", "event_type")

    val out = Analytics.funnel(events, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"))
      .select("step", "step_name", "users", "pct_of_first", "pct_of_prev")
      .as[(Int, String, Long, Double, Option[Double])].collect().toSeq

    assert(out == Seq(
      (1, "view", 4L, 1.0, None),            // u1..u4 all view
      (2, "click", 3L, 0.75, Some(0.75)),    // u2's early click doesn't count
      (3, "purchase", 1L, 0.25, Some(0.3333)))) // only u1; u4's purchase preceded the click
  }

  test("funnel equal-timestamp events do not satisfy the STRICT ordering") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:00:00"), "click") // simultaneous → not after
    ).toDF("user_id", "ts", "event_type")
    val users = Analytics.funnel(events, "user_id", "ts", "event_type", Seq("view", "click"))
      .select("users").as[Long].collect().toSeq
    assert(users == Seq(1L, 0L))
  }

  // ---- rolling metrics -------------------------------------------------

  test("rollingDaily RANGE frame shrinks across calendar gaps") {
    // key a: days 1,2,10 — day 10's trailing-7d window must NOT see
    // days 1-2 (a ROWS frame would)
    val events = Seq(
      ("a", ts("2024-01-01 00:00:00"), 10.0),
      ("a", ts("2024-01-02 00:00:00"), 20.0),
      ("a", ts("2024-01-02 12:00:00"), 5.0),
      ("a", ts("2024-01-10 00:00:00"), 40.0)
    ).toDF("k", "ts", "v")

    val out = Analytics.rollingDaily(events, "k", "ts", "v")
      .select("day", "daily_value", "n_events",
        "rolling_7d_value", "rolling_7d_avg", "rolling_7d_events")
      .as[(Date, Double, Long, Double, Double, Long)].collect().toSeq

    assert(out == Seq(
      (Date.valueOf("2024-01-01"), 10.0, 1L, 10.0, 10.0, 1L),
      (Date.valueOf("2024-01-02"), 25.0, 2L, 35.0, 17.5, 3L),
      (Date.valueOf("2024-01-10"), 40.0, 1L, 40.0, 40.0, 1L))) // gap excluded
  }

  // ---- anomaly flags ---------------------------------------------------

  test("anomalyFlags scores against the trailing baseline, excluding the current day") {
    // 7 flat days of 2 events, then a 12-event spike
    val base = (1 to 7).flatMap { d =>
      Seq.fill(2)(("a", ts(f"2024-01-$d%02d 10:00:00")))
    }
    val spike = Seq.fill(12)(("a", ts("2024-01-08 10:00:00")))
    val events = (base ++ spike).toDF("k", "ts")

    val out = Analytics.anomalyFlags(events, "k", "ts")
      .select("day", "n_events", "z_score", "is_anomaly")
      .as[(Date, Long, Option[Double], Boolean)].collect().toSeq

    // day 1: no baseline → null z, not anomalous
    assert(out.head == (Date.valueOf("2024-01-01"), 2L, None, false))
    // days 2-7: flat baseline (σ=0) → null z, not anomalous
    out.slice(1, 7).foreach { r => assert(r._3.isEmpty && !r._4, r) }
    // day 8: σ is still 0 across the flat week → null z even for the
    // spike (no division blow-up); flag stays false by the σ=0 contract
    assert(out(7) == (Date.valueOf("2024-01-08"), 12L, None, false))
  }

  test("anomalyFlags flags a spike against a noisy baseline") {
    // alternating 1/3 events (mean 2, σ≈1.07), then a 10-event day
    val counts = Seq(1, 3, 1, 3, 1, 3, 1, 10)
    val events = counts.zipWithIndex.flatMap { case (n, i) =>
      Seq.fill(n)(("a", ts(f"2024-01-${i + 1}%02d 10:00:00")))
    }.toDF("k", "ts")

    val out = Analytics.anomalyFlags(events, "k", "ts")
      .select("day", "z_score", "is_anomaly")
      .as[(Date, Option[Double], Boolean)].collect().toSeq

    val spikeDay = out.last
    assert(spikeDay._1 == Date.valueOf("2024-01-08"))
    assert(spikeDay._2.exists(_ > 2.0), spikeDay)
    assert(spikeDay._3)
    // the noisy-but-normal days are not flagged
    out.init.foreach { r => assert(!r._3, r) }
  }

  test("anomalyFlags baseline shrinks across a calendar gap instead of going stale") {
    // noisy week, a 30-day pipeline outage, then activity resumes: the
    // first post-gap day has NO trailing-7-calendar-day baseline, so z
    // must be null — a ROWS frame would score it against month-old
    // counts and (here) flag a perfectly normal day
    val preGap = Seq(1, 3, 1, 3, 1, 3, 1).zipWithIndex.flatMap { case (n, i) =>
      Seq.fill(n)(("a", ts(f"2024-01-${i + 1}%02d 10:00:00")))
    }
    val postGap = Seq.fill(10)(("a", ts("2024-02-07 10:00:00"))) ++
      Seq.fill(2)(("a", ts("2024-02-08 10:00:00")))
    val events = (preGap ++ postGap).toDF("k", "ts")

    val out = Analytics.anomalyFlags(events, "k", "ts")
      .select("day", "z_score", "is_anomaly", "baseline_mean")
      .as[(Date, Option[Double], Boolean, Option[Double])].collect().toSeq

    val firstAfterGap = out.find(_._1 == Date.valueOf("2024-02-07")).get
    assert(firstAfterGap._2.isEmpty && !firstAfterGap._3, firstAfterGap)
    assert(firstAfterGap._4.isEmpty, s"empty baseline must have null mean: $firstAfterGap")
    // the second post-gap day sees ONLY the one in-range day (baseline
    // size 1 → stddev null → null z), never the pre-gap week
    val secondAfterGap = out.find(_._1 == Date.valueOf("2024-02-08")).get
    assert(secondAfterGap._2.isEmpty && !secondAfterGap._3, secondAfterGap)
    assert(secondAfterGap._4.contains(10.0), secondAfterGap)
  }

  test("anomalyFlags rejects a degenerate baseline window") {
    val e = Seq(("a", ts("2024-01-01 00:00:00"))).toDF("k", "ts")
    intercept[IllegalArgumentException] {
      Analytics.anomalyFlags(e, "k", "ts", baselineDays = 1)
    }
  }

  // ---- linear attribution ----------------------------------------------

  test("linearAttribution splits conversion value equally across in-window touches") {
    val events = Seq(
      // u1: two clicks then a 10.0 purchase → 5.0 credit to each day
      (1L, 1L, ts("2024-01-01 10:00:00"), "click", 0.0),
      (2L, 1L, ts("2024-01-02 10:00:00"), "click", 0.0),
      (3L, 1L, ts("2024-01-03 10:00:00"), "purchase", 10.0),
      // u2: click AFTER the purchase → no credit, purchase unattributed
      (4L, 2L, ts("2024-01-03 12:00:00"), "purchase", 99.0),
      (5L, 2L, ts("2024-01-04 10:00:00"), "click", 0.0),
      // u3: click outside the 7-day lookback → excluded
      (6L, 3L, ts("2024-01-01 10:00:00"), "click", 0.0),
      (7L, 3L, ts("2024-01-09 11:00:00"), "purchase", 7.0)
    ).toDF("event_id", "user_id", "ts", "event_type", "value")

    val out = Analytics.linearAttribution(events, "user_id", "ts", "event_type",
      "value", "click", "purchase", convIdCol = Some("event_id"))
      .select("touch_day", "credited_value", "n_credited_touches", "n_conversions")
      .as[(Date, Double, Long, Long)].collect().toSeq

    assert(out == Seq(
      (Date.valueOf("2024-01-01"), 5.0, 1L, 1L),
      (Date.valueOf("2024-01-02"), 5.0, 1L, 1L)))
  }

  test("attribution without convIdCol: derived ids split simultaneous conversions, stay recompute-stable") {
    // u1 converts TWICE at the same instant with different values — a
    // (user, ts) identity would merge their touch sets; the derived
    // per-user sequence id must keep them distinct conversions
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), "click", 0.0),
      (1L, ts("2024-01-02 10:00:00"), "click", 0.0),
      (1L, ts("2024-01-03 10:00:00"), "purchase", 10.0),
      (1L, ts("2024-01-03 10:00:00"), "purchase", 4.0),
      (2L, ts("2024-01-02 12:00:00"), "click", 0.0),
      (2L, ts("2024-01-04 10:00:00"), "purchase", 6.0)
    ).toDF("user_id", "ts", "event_type", "value")

    def run(parts: Int): Seq[(Date, Double, Long, Long)] =
      Analytics.attribution(events.repartition(parts), "user_id", "ts", "event_type",
        "value", "click", "purchase")
        .select("touch_day", "credited_value", "n_credited_touches", "n_conversions")
        .as[(Date, Double, Long, Long)].collect().toSeq

    val out = run(5)
    // u1: both purchases split (10+4)/2 = 7.0 per touch day, each day
    // credited by BOTH conversions; u2's 6.0 lands whole on 01-02
    assert(out == Seq(
      (Date.valueOf("2024-01-01"), 7.0, 2L, 2L),
      (Date.valueOf("2024-01-02"), 13.0, 3L, 3L)), out.toString)
    // the derived identity is a pure function of the rows — a different
    // physical layout must land identical credits
    assert(run(2) == out, "credits must not depend on partitioning")
  }

  test("u_shaped attribution gives 40/20/40 with first/last resolved by position") {
    // 4 touches before one 10.0 purchase: 4.0 / 1.0 / 1.0 / 4.0
    val events = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "click", 0.0),
      (2L, 1L, ts("2024-01-02 10:00:00"), "click", 0.0),
      (3L, 1L, ts("2024-01-03 10:00:00"), "click", 0.0),
      (4L, 1L, ts("2024-01-04 10:00:00"), "click", 0.0),
      (5L, 1L, ts("2024-01-05 10:00:00"), "purchase", 10.0)
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val out = Analytics.attribution(events, "user_id", "ts", "event_type",
      "value", "click", "purchase", convIdCol = Some("event_id"),
      model = "u_shaped", touchIdCol = Some("event_id"))
      .select("touch_day", "credited_value").as[(Date, Double)].collect().toSeq
    assert(out == Seq(
      (Date.valueOf("2024-01-01"), 4.0),
      (Date.valueOf("2024-01-02"), 1.0),
      (Date.valueOf("2024-01-03"), 1.0),
      (Date.valueOf("2024-01-04"), 4.0)))
  }

  test("u_shaped attribution degenerate sizes: 1 touch takes all, 2 split evenly") {
    val events = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "click", 0.0),
      (2L, 1L, ts("2024-01-02 10:00:00"), "purchase", 8.0),
      (3L, 2L, ts("2024-01-01 10:00:00"), "click", 0.0),
      (4L, 2L, ts("2024-01-02 10:00:00"), "click", 0.0),
      (5L, 2L, ts("2024-01-03 10:00:00"), "purchase", 6.0)
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val out = Analytics.attribution(events, "user_id", "ts", "event_type",
      "value", "click", "purchase", convIdCol = Some("event_id"),
      model = "u_shaped", touchIdCol = Some("event_id"))
      .select("touch_day", "credited_value").as[(Date, Double)].collect().toSeq
    // day1: u1's only touch 8.0 + u2's first-of-two 3.0; day2: u2's 3.0
    assert(out == Seq(
      (Date.valueOf("2024-01-01"), 11.0),
      (Date.valueOf("2024-01-02"), 3.0)))
  }

  test("time_decay attribution favors recent touches and credits sum to the value") {
    // touches 2 days and 0.5 days before conversion, half-life 1 day:
    // raw weights 0.25 vs ~0.7071 → newer touch gets ~73.9%
    val events = Seq(
      (1L, 1L, ts("2024-01-01 00:00:00"), "click", 0.0),
      (2L, 1L, ts("2024-01-02 12:00:00"), "click", 0.0),
      (3L, 1L, ts("2024-01-03 00:00:00"), "purchase", 100.0)
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val out = Analytics.attribution(events, "user_id", "ts", "event_type",
      "value", "click", "purchase", convIdCol = Some("event_id"),
      model = "time_decay", halfLifeDays = 1.0)
      .select("touch_day", "credited_value").as[(Date, Double)].collect().toSeq
    val total = out.map(_._2).sum
    assert(math.abs(total - 100.0) < 1e-6, s"credits must sum to the value: $out")
    val newer = out.find(_._1 == Date.valueOf("2024-01-02")).get._2
    val older = out.find(_._1 == Date.valueOf("2024-01-01")).get._2
    assert(newer > older, out)
    assert(math.abs(newer - 100.0 * (math.pow(0.5, 0.5) / (math.pow(0.5, 0.5) + 0.25))) < 0.01)
  }

  test("time_decay attribution survives tiny half-lives (relative-age quantization)") {
    // with ABSOLUTE ages, halfLifeDays=0.05 puts every touch past ~30
    // half-lives → every quantized raw weight 0 → 0/0 weights silently
    // zeroed the conversion's whole credit. Relative-to-newest ages pin
    // the newest touch's raw weight at exactly 1, so credit always
    // lands somewhere and recency still dominates.
    val events = Seq(
      (1L, 1L, ts("2024-01-01 00:00:00"), "click", 0.0),
      (2L, 1L, ts("2024-01-02 12:00:00"), "click", 0.0),
      (3L, 1L, ts("2024-01-03 00:00:00"), "purchase", 100.0)
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val out = Analytics.attribution(events, "user_id", "ts", "event_type",
      "value", "click", "purchase", convIdCol = Some("event_id"),
      model = "time_decay", halfLifeDays = 0.05)
      .select("touch_day", "credited_value").as[(Date, Double)].collect().toSeq
    val total = out.map(_._2).sum
    assert(math.abs(total - 100.0) < 1e-4, s"credit must not vanish: $out")
    assert(out.find(_._1 == Date.valueOf("2024-01-02")).get._2 > 99.9,
      s"newest touch must take essentially all credit: $out")
  }

  test("linearAttribution simultaneous conversions keep separate touch splits") {
    // two purchases at the SAME (user, ts) with one prior click: the
    // click earns credit from EACH conversion (ids keep them distinct)
    val events = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "click", 0.0),
      (2L, 1L, ts("2024-01-02 10:00:00"), "purchase", 4.0),
      (3L, 1L, ts("2024-01-02 10:00:00"), "purchase", 6.0)
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val out = Analytics.linearAttribution(events, "user_id", "ts", "event_type",
      "value", "click", "purchase", convIdCol = Some("event_id"))
      .select("credited_value", "n_credited_touches", "n_conversions")
      .as[(Double, Long, Long)].collect().toSeq
    assert(out == Seq((10.0, 2L, 2L)))
  }
}

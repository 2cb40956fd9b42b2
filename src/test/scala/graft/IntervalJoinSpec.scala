package graft

import graft.operators.IntervalJoin
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class IntervalJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val intervals = Seq(
    ("flightA", ts("2024-01-01 00:00:00"), ts("2024-01-03 23:59:59")),
    ("flightB", ts("2024-01-03 00:00:00"), ts("2024-01-05 23:59:59")), // overlaps A on day 3
    ("broken", ts("2024-01-09 00:00:00"), ts("2024-01-08 00:00:00"))   // end < start
  ).toDF("flight", "start_ts", "end_ts")

  private val points = Seq(
    (1L, ts("2024-01-02 12:00:00")), // A only
    (2L, ts("2024-01-03 12:00:00")), // A and B (overlap day)
    (3L, ts("2024-01-05 23:59:59")), // B inclusive end
    (4L, ts("2024-01-07 00:00:00")), // nothing
    (5L, ts("2024-01-08 12:00:00"))  // inside the BROKEN interval's hull → must NOT match
  ).toDF("event_id", "ts")

  test("pointInInterval matches exactly the containing windows, inclusive bounds") {
    val out = IntervalJoin.pointInInterval(points, "ts", intervals, "start_ts", "end_ts")
      .select("event_id", "flight").as[(Long, String)].collect().toSet
    assert(out == Set(
      (1L, "flightA"),
      (2L, "flightA"), (2L, "flightB"),
      (3L, "flightB")))
  }

  test("pointInInterval result is bin-width invariant (pairs appear exactly once)") {
    val wide = IntervalJoin.pointInInterval(points, "ts", intervals,
      "start_ts", "end_ts", binWidthSeconds = 7L * 86400).collect().length
    val narrow = IntervalJoin.pointInInterval(points, "ts", intervals,
      "start_ts", "end_ts", binWidthSeconds = 3600L).collect().length
    assert(wide == 4 && narrow == 4,
      "a (point, interval) pair meets in the point's single bin only — no dup pass needed")
  }

  test("pointInInterval plans an equi-join on the bin key, never a nested loop") {
    val plan = IntervalJoin.pointInInterval(points, "ts", intervals,
      "start_ts", "end_ts").queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range predicate must ride the bin equi-join:\n${plan.take(1200)}")
  }

  test("pointInInterval keyCols scope containment to matching keys") {
    val keyedIntervals = Seq(
      ("u1", "w1", ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00")),
      ("u2", "w2", ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00")) // same span, other key
    ).toDF("user", "win", "start_ts", "end_ts")
    val keyedPoints = Seq(
      ("u1", 1L, ts("2024-01-01 12:00:00")),
      ("u2", 2L, ts("2024-01-01 12:00:00"))
    ).toDF("user", "event_id", "ts")
    val out = IntervalJoin.pointInInterval(keyedPoints, "ts", keyedIntervals,
      "start_ts", "end_ts", keyCols = Seq("user"))
      .select("event_id", "win").as[(Long, String)].collect().toSet
    // without the key scope both events would match both windows
    assert(out == Set((1L, "w1"), (2L, "w2")))
  }

  test("session attribution reconciles the interval join with the sessionizer") {
    val viaJoin = IntervalJoin.sessionAttribution(spark, sfDir)
      .select("user_id", "session_id", "n_events", "session_value")
    val viaSessionizer = graft.operators.Sessionize.sessionize(spark, sfDir)
      .select("user_id", "session_id", "n_events", "session_value")
    assert(viaJoin.except(viaSessionizer).count() == 0)
    assert(viaSessionizer.except(viaJoin).count() == 0)
  }

  test("pointInInterval rejects colliding column names") {
    intercept[IllegalArgumentException] {
      IntervalJoin.pointInInterval(
        points.withColumnRenamed("event_id", "flight"), "ts",
        intervals, "start_ts", "end_ts")
    }
  }
}

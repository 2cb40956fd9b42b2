package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class SketchesSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // ---- bloom semi join -------------------------------------------------

  test("bloomSemiJoin equals the exact semi join (false positives removed)") {
    val fact = (1L to 2000L).map(i => (i, i % 7)).toDF("fk", "payload")
    val dim = (1L to 2000L).filter(_ % 13 == 0).map(Tuple1(_)).toDF("dk")

    val got = Sketches.bloomSemiJoin(fact, "fk", dim, "dk",
      expectedItems = 200L, fpp = 0.2) // high fpp: force false positives through the filter
      .select("fk").as[Long].collect().toSet
    val want = fact.join(dim, col("fk") === col("dk"), "left_semi")
      .select("fk").as[Long].collect().toSet

    assert(got == want)
    assert(want.nonEmpty && want.forall(_ % 13 == 0))
  }

  test("bloomSemiJoin never drops a true match (no false negatives)") {
    val fact = (1L to 5000L).map(Tuple1(_)).toDF("fk")
    val dim = (1L to 5000L by 11).map(Tuple1(_)).toDF("dk")
    // tiny expectedItems → saturated filter: still zero false negatives
    val got = Sketches.bloomSemiJoin(fact, "fk", dim, "dk",
      expectedItems = 10L, fpp = 0.01)
      .select("fk").as[Long].collect().toSet
    assert(got == (1L to 5000L by 11).toSet)
  }

  test("bloomSemiJoin null fact keys are dropped, not matched") {
    val fact = Seq(Some(1L), Some(2L), None).toDF("fk")
    val dim = Seq(1L).toDF("dk")
    val got = Sketches.bloomSemiJoin(fact, "fk", dim, "dk", expectedItems = 10L)
      .select("fk").as[Long].collect().toSeq
    assert(got == Seq(1L))
  }

  test("bloomSemiJoin rejects non-integral key columns") {
    val fact = Seq("a").toDF("fk")
    val dim = Seq(1L).toDF("dk")
    intercept[IllegalArgumentException] {
      Sketches.bloomSemiJoin(fact, "fk", dim, "dk", expectedItems = 10L)
    }
  }

  // ---- HLL sketches ----------------------------------------------------

  private def plantedEvents = {
    // 3 types × 20 days; type t has 50*(t+1) distinct users cycling daily
    (0 until 3).flatMap { t =>
      (1 to 20).flatMap { d =>
        (0 until 120).map { i =>
          (s"type$t", ts(f"2024-01-$d%02d 10:00:00"), (t * 10000 + i % (50 * (t + 1))).toLong)
        }
      }
    }.toDF("event_type", "ts", "user_id")
  }

  test("HLL estimate tracks the exact distinct count within 5%") {
    val daily = Sketches.dailySketches(plantedEvents, "event_type", "ts", "user_id")
    val est = Sketches.distinctOverRange(daily, "event_type")
      .select("event_type", "distinct_est").as[(String, Long)].collect().toMap
    val exact = plantedEvents.groupBy("event_type")
      .agg(countDistinct("user_id").as("n"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (k, n) =>
      val e = est(k)
      assert(math.abs(e - n).toDouble / n < 0.05, s"$k: est=$e exact=$n")
    }
  }

  test("merging daily sketches is lossless vs sketching the range directly") {
    val e = plantedEvents
    val daily = Sketches.dailySketches(e, "event_type", "ts", "user_id")
    val merged = Sketches.distinctOverRange(daily, "event_type",
      fromDay = Some("2024-01-05"), toDay = Some("2024-01-15"))
      .select("event_type", "distinct_est").as[(String, Long)].collect().toMap
    val direct = e.filter(col("ts").cast("date").between("2024-01-05", "2024-01-15"))
      .groupBy("event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("n"))
      .select("event_type", "n").as[(String, Long)].collect().toMap
    assert(merged == direct)
  }

  test("distinctOverRange counts only the requested days") {
    val daily = Sketches.dailySketches(plantedEvents, "event_type", "ts", "user_id")
    val out = Sketches.distinctOverRange(daily, "event_type",
      fromDay = Some("2024-01-16"))
      .select("event_type", "n_days", "n_events")
      .as[(String, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(out.map(_._2).forall(_ == 5))          // days 16..20
    assert(out.map(_._3).forall(_ == 5L * 120L))  // 120 events/day
  }
}

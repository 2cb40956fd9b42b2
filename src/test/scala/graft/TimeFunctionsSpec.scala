package graft

import graft.functions.{time => TM}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class TimeFunctionsSpec extends SparkSpecBase {
  import spark.implicits._

  test("toLocal converts UTC to Santiago wall clock (DST, UTC-3)") {
    // Jan 2024: Chile is on DST (UTC-3). utc_converter.py:34 semantics.
    val out = Seq(Timestamp.valueOf("2024-01-15 12:00:00")).toDF("ts")
      .select(TM.toLocal(col("ts"), "chile").cast("string")).as[String].head()
    assert(out == "2024-01-15 09:00:00")
  }

  test("dayStartUtc / dayEndUtc give local-midnight bounds in UTC") {
    val df = Seq(Timestamp.valueOf("2024-01-15 12:00:00")).toDF("ts")
      .select(
        TM.dayStartUtc(col("ts"), "chile").cast("string").as("s"),
        TM.dayEndUtc(col("ts"), "chile").cast("string").as("e"))
    val r = df.as[(String, String)].head()
    // local midnight 2024-01-15 00:00 -03 = 03:00 UTC; 23:59:59 -03 = next-day 02:59:59 UTC
    assert(r._1 == "2024-01-15 03:00:00")
    assert(r._2 == "2024-01-16 02:59:59")
  }

  test("unknown region falls back to Santiago") {
    assert(TM.zoneOf("nowhere") == "America/Santiago")
    assert(TM.zoneOf("MEXICO") == "America/Mexico_City")
  }

  test("dateWindows chunks a range into N-day windows, last one truncated") {
    import spark.implicits._
    val out = Seq((java.sql.Date.valueOf("2024-01-01"), java.sql.Date.valueOf("2024-03-15")))
      .toDF("lo", "hi")
      .select(explode(TM.dateWindows(col("lo"), col("hi"), 30)).as("w"))
      .select(col("w.win_start"), col("w.win_end"))
      .as[(java.sql.Date, java.sql.Date)].collect().toSeq
    assert(out == Seq(
      (java.sql.Date.valueOf("2024-01-01"), java.sql.Date.valueOf("2024-01-30")),
      (java.sql.Date.valueOf("2024-01-31"), java.sql.Date.valueOf("2024-02-29")),
      (java.sql.Date.valueOf("2024-03-01"), java.sql.Date.valueOf("2024-03-15"))))
  }

  test("dateSpine is inclusive and daily") {
    val n = Seq((java.sql.Date.valueOf("2024-01-01"), java.sql.Date.valueOf("2024-01-10")))
      .toDF("lo", "hi")
      .select(explode(TM.dateSpine(col("lo"), col("hi")))).count()
    assert(n == 10)
  }
}

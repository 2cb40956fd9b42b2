package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class AsOfJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOf picks the latest right row at or before each left timestamp") {
    val trades = Seq(
      ("AAPL", ts("2024-01-01 10:00:30"), 100),
      ("AAPL", ts("2024-01-01 10:02:00"), 200),
      ("MSFT", ts("2024-01-01 10:00:10"), 50),
      ("MSFT", ts("2024-01-01 09:59:00"), 10) // before any quote → null
    ).toDF("sym", "trade_ts", "qty")
    val quotes = Seq(
      ("AAPL", ts("2024-01-01 10:00:00"), 185.0),
      ("AAPL", ts("2024-01-01 10:01:00"), 186.5),
      ("MSFT", ts("2024-01-01 10:00:10"), 410.0) // equal ts counts (as-of <=)
    ).toDF("sym", "quote_ts", "price")

    val out = AsOfJoin.asOf(trades, quotes, Seq("sym"), "trade_ts", "quote_ts", Seq("price"))
      .select("sym", "qty", "price").as[(String, Int, Option[Double])]
      .collect().sortBy(r => (r._1, r._2))

    assert(out.toSeq == Seq(
      ("AAPL", 100, Some(185.0)),   // 10:00:30 → 10:00 quote
      ("AAPL", 200, Some(186.5)),   // 10:02   → 10:01 quote
      ("MSFT", 10, None),           // no quote yet
      ("MSFT", 50, Some(410.0))))   // equal timestamp matches
  }

  test("asOf tiebreak picks the highest tiebreak value among equal timestamps") {
    val l = Seq(("k1", ts("2024-01-01 12:00:00"), 1)).toDF("k", "lt", "lv")
    val r = Seq(
      ("k1", ts("2024-01-01 10:00:00"), 7L, 1.0),
      ("k1", ts("2024-01-01 10:00:00"), 9L, 2.0), // highest seq wins
      ("k1", ts("2024-01-01 10:00:00"), 8L, 3.0)
    ).toDF("k", "rt", "seq", "rv")
    val out = AsOfJoin.asOf(l, r, Seq("k"), "lt", "rt", Seq("rv"), tieBreak = Seq("seq"))
      .select("rv").as[Double].collect()
    assert(out.toSeq == Seq(2.0))
  }

  test("asOf rejects left columns colliding with temps or right payload") {
    val l = Seq(("k1", ts("2024-01-01 12:00:00"), 0.0)).toDF("k", "lt", "rv")
    val r = Seq(("k1", ts("2024-01-01 10:00:00"), 1.0)).toDF("k", "rt", "rv")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asOf(l, r, Seq("k"), "lt", "rt", Seq("rv"))
    }
    assert(e.getMessage.contains("collide"))
  }

  test("asOf plan is a single-shuffle window, not a range join") {
    val l = Seq((1L, ts("2024-01-01 10:00:00"), "x")).toDF("k", "lt", "lv")
    val r = Seq((1L, ts("2024-01-01 09:00:00"), 1.0)).toDF("k", "rt", "rv")
    val plan = AsOfJoin.asOf(l, r, Seq("k"), "lt", "rt", Seq("rv"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("Join"),
      s"as-of must compose via union+window:\n${plan.take(1200)}")
  }
}

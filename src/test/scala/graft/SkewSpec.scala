package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpecBase {
  import spark.implicits._

  test("saltedJoin equals a plain join, with the hot key spread") {
    // key 1 is hot (90% of rows)
    val left = ((1 to 900).map(i => (1L, s"row$i")) ++ (1 to 100).map(i => (2L, s"r$i")))
      .toDF("k", "payload")
    val right = Seq((1L, "dim1"), (2L, "dim2")).toDF("k", "dim")
    val plain = left.join(right, Seq("k")).orderBy("payload")
    val salted = Skew.saltedJoin(left, right, Seq("k"), saltFactor = 4).orderBy("payload")
    assert(salted.count() == plain.count())
    assert(salted.select("k", "payload", "dim").except(plain.select("k", "payload", "dim")).count() == 0)
  }

  test("saltedAgg matches the direct aggregation") {
    val df = ((1 to 1000).map(i => (1L, i.toDouble)) ++ (1 to 50).map(i => (2L, i.toDouble)))
      .toDF("k", "v")
    val direct = df.groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("s"), max("v").as("mx"))
    val salted = Skew.saltedAgg(df, Seq("k"), saltFactor = 4,
      partials = Seq("n" -> count(lit(1)), "s" -> sum(col("v")), "mx" -> max(col("v"))),
      merges = Seq("n" -> sum(col("n")), "s" -> sum(col("s")), "mx" -> max(col("mx"))))
    assert(salted.except(direct).count() == 0 && direct.except(salted).count() == 0)
  }

  test("generic dedupLatestBy and annotateSessions work on arbitrary frames") {
    import java.sql.Timestamp
    val df = Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:00:00"), "a"),
      (1L, Timestamp.valueOf("2024-01-01 11:00:00"), "b"),
      (2L, Timestamp.valueOf("2024-01-01 09:00:00"), "c")
    ).toDF("id", "updated_at", "v")
    val deduped = graft.operators.Dedup.dedupLatestBy(df, Seq("id"), "updated_at")
    assert(deduped.count() == 2)
    assert(deduped.filter(col("id") === 1).select("v").as[String].head() == "b")

    val sess = graft.operators.Sessionize.annotateSessions(df, "id", "updated_at", gapMinutes = 30)
    // 1h gap between the two id=1 events → two sessions
    assert(sess.filter(col("id") === 1).select("session_id").as[Long].collect().toSet == Set(1L, 2L))
  }
}

package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A9 sessionization: gap > threshold starts a new session.
  *
  * Classic lag + cumulative-sum over a per-user window. Both window
  * functions and the final per-session aggregation hash-partition on
  * user_id, so the whole operator is ONE exchange — Spark reuses the
  * partitioning across the lag, the running sum, and the groupBy.
  */
object Sessionize {

  /** Annotate each row with a per-key `session_id` (1-based, increasing
    * with time): the composable primitive — callers aggregate however
    * they like. `tieBreak` disambiguates equal timestamps. */
  def annotateSessions(df: DataFrame, keyCol: String, tsCol: String,
                       gapMinutes: Int = 30, tieBreak: Seq[String] = Nil): DataFrame = {
    val order = col(tsCol).asc +: tieBreak.map(col(_).asc)
    val byKey = Window.partitionBy(col(keyCol)).orderBy(order: _*)
    val gap = expr(s"INTERVAL $gapMinutes MINUTES")
    df.withColumn("_prev_ts", lag(col(tsCol), 1).over(byKey))
      .withColumn("_is_new",
        when(col("_prev_ts").isNull || col(tsCol) > col("_prev_ts") + gap, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("_is_new")).over(byKey))
      .drop("_prev_ts", "_is_new")
  }

  /** `q09_sessionize` — events → per-session rollup (user_id, session_id,
    * n_events, session_start, session_end, session_value). Session break
    * when the gap since the previous event exceeds `gapMinutes`. */
  def sessionize(spark: SparkSession, dir: String, gapMinutes: Int = 30): DataFrame = {
    val t = Tables(spark, dir)
    annotateSessions(t.events, "user_id", "ts", gapMinutes, tieBreak = Seq("event_id"))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        round(sum(col("value")), 4).as("session_value"))
      .transform(d => Perf.sortedOnce(d, col("user_id"), col("session_id")))
  }
}

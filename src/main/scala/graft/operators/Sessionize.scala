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

  /** `q09_sessionize` — events → per-session rollup (user_id, session_id,
    * n_events, session_start, session_end, session_value). Session break
    * when the gap since the previous event exceeds `gapMinutes`. */
  def sessionize(spark: SparkSession, dir: String, gapMinutes: Int = 30): DataFrame = {
    val t = Tables(spark, dir)
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    val gap = expr(s"INTERVAL $gapMinutes MINUTES")
    t.events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_ts").isNull || col("ts") > col("prev_ts") + gap, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("is_new")).over(byUser))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        round(sum(col("value")), 4).as("session_value"))
      .orderBy(col("user_id"), col("session_id"))
  }
}

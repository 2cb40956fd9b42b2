package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval joins that stay EQUI-joins.
  *
  * `points JOIN intervals ON ts BETWEEN start AND end` has no equi
  * component, so Catalyst plans a broadcast-nested-loop (or worse) —
  * every point tests every interval. Binning restores a shuffle key:
  * each interval explodes onto the fixed-width bins it covers, each
  * point maps to exactly ONE bin, and the join runs on the bin key
  * with the exact containment predicate riding along. A (point,
  * interval) pair can only meet in the point's single bin, so no
  * dedup pass is needed.
  *
  * Cost model: intervals fan out by ceil(length / binWidth) + 1 rows —
  * pick `binWidth` near the TYPICAL interval length so the fan-out is
  * a small constant while bins stay selective. Degenerate widths are
  * the caller's risk: too narrow explodes the interval side, too wide
  * turns each bin into a mini cross join (both still correct).
  *
  * The as-of join ([[AsOfJoin]]) answers "latest row at or before";
  * this answers "which window(s) contain the row" — campaign flights,
  * maintenance windows, session spans, validity ranges.
  */
object IntervalJoin {

  /** Join `points` to every interval containing them (inner). Both
    * timestamp columns may be TIMESTAMP or TIMESTAMP_NTZ; containment
    * is `start <= ts AND ts <= end` (inclusive both ends).
    *
    * `keyCols` (present on BOTH sides) scope containment to matching
    * keys — a user's events against that user's sessions, a channel's
    * spend against that channel's flights. The join key becomes
    * (keys..., bin), so keyed workloads shuffle by their natural key
    * and bins only subdivide within it.
    *
    * Output: all point columns + the interval's non-key columns (other
    * names must not collide — checked). `binWidth` is in seconds.
    */
  def pointInInterval(points: DataFrame, tsCol: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      binWidthSeconds: Long = 86400L,
                      keyCols: Seq[String] = Nil): DataFrame = {
    require(binWidthSeconds > 0, s"binWidthSeconds must be positive, got $binWidthSeconds")
    val collisions = points.columns.toSet.intersect(intervals.columns.toSet) -- keyCols
    require(collisions.isEmpty,
      s"point/interval column names collide: ${collisions.mkString(", ")} — rename first")
    keyCols.foreach { k =>
      require(points.columns.contains(k) && intervals.columns.contains(k),
        s"key column $k must exist on both sides")
    }
    def binOf(c: Column) = floor(unix_timestamp(c.cast("timestamp")) / binWidthSeconds)
    // intervals cover [binOf(start), binOf(end)] — sequence is tiny for
    // sane widths. Malformed intervals (end < start) must be guarded
    // EXPLICITLY: sequence(a, b) with b < a produces a DESCENDING
    // sequence, not an empty one — the guard maps them to an empty
    // array so explode drops them (they can contain nothing)
    val binned = intervals
      .withColumn("_bin", explode(
        when(col(endCol) >= col(startCol),
          sequence(binOf(col(startCol)), binOf(col(endCol))))
          .otherwise(array().cast("array<bigint>"))))
    points.withColumn("_bin", binOf(col(tsCol)))
      .join(binned, keyCols :+ "_bin")
      .filter(col(startCol) <= col(tsCol) && col(tsCol) <= col(endCol))
      .drop("_bin")
  }

  /** `q66_session_attribution`: events joined BACK to their user's
    * session windows via the keyed interval join, rolled up per
    * session. Two INDEPENDENT computations of the same truth — the
    * lag+cumsum sessionizer builds the windows, the binned interval
    * join re-derives each session's membership by time containment —
    * and the driver hash-checks the reconciliation against DuckDB's
    * own session SQL. Every event lands in exactly one of its user's
    * sessions (sessions partition the user's timeline; bin-width
    * invariance is spec-pinned), so the rollup must equal q09. */
  def sessionAttribution(spark: org.apache.spark.sql.SparkSession,
                         dir: String): DataFrame = {
    val events = graft.Tables(spark, dir).events
      .select(col("user_id"), col("ts"), col("value"))
    val sessions = Sessionize.sessionize(spark, dir)
      .select(col("user_id"), col("session_id"),
        col("session_start"), col("session_end"))
    pointInInterval(events, "ts", sessions, "session_start", "session_end",
      binWidthSeconds = 3600L, keyCols = Seq("user_id"))
      .groupBy(col("user_id"), col("session_id"),
        col("session_start"), col("session_end"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("session_value"))
      .transform(d => Perf.sortedOnce(d, col("user_id"), col("session_id")))
  }
}

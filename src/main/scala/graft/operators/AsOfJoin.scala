package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF join: enrich each left row with the latest right row whose
  * timestamp is at or before the left row's timestamp, per key — the
  * point-in-time lookup (price as of trade time, profile as of event
  * time) that Spark has no built-in operator for.
  *
  * Spark-first realization — preference order (a) from the build rules:
  * COMPOSE existing operators instead of a custom physical plan. Both
  * sides are tagged and unioned, then a single per-key window carries the
  * last right-side payload forward onto each left row. ONE shuffle on the
  * key (the union riding one exchange), no range join, no per-key
  * collect — the pattern scales linearly and AQE handles skewed keys.
  * A broadcast-range custom SparkPlan only becomes worthwhile when the
  * right side is tiny and the left enormous; at that point the same API
  * can swap implementations.
  */
object AsOfJoin {

  /** @param left      probe side (keeps all rows and columns)
    * @param right     reference side, looked up as-of left's timestamp
    * @param keys      equi-join key columns (present on both sides)
    * @param leftTs    timestamp column on `left`
    * @param rightTs   timestamp column on `right`
    * @param rightCols right payload columns to carry (must not clash
    *                  with left column names)
    * @param tieBreak  right-side columns ordering ties among right rows
    *                  sharing (key, rightTs) — the HIGHEST tieBreak value
    *                  wins (keep-latest convention). Empty = ties resolve
    *                  arbitrarily (nondeterministic across runs).
    * @return left rows + rightCols (null when no right row is at or
    *         before the left timestamp)
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String, rightCols: Seq[String],
           tieBreak: Seq[String] = Nil): DataFrame = {
    val ts = "_asof_ts"
    val tbNames = tieBreak.indices.map(i => s"_tb$i")
    val temps = Set(ts, "_side", "_payload", "_match") ++ tbNames
    val clash = left.columns.toSet.intersect(temps ++ rightCols)
    require(clash.isEmpty,
      s"asOf: left columns collide with temp/right columns: ${clash.mkString(", ")}")
    val l = left
      .withColumn(ts, col(leftTs))
      .withColumn("_side", lit(1))
      .withColumn("_payload", lit(null).cast(payloadType(right, rightCols)))
    val r = right
      .select((keys.map(col) :+ col(rightTs).as(ts)) ++
        tieBreak.zip(tbNames).map { case (c, n) => col(c).as(n) } :+
        struct(rightCols.map(col): _*).as("_payload"): _*)
      .withColumn("_side", lit(0))

    // right rows sort BEFORE left rows at equal timestamps (as-of is <=);
    // among right rows tied on (key, ts), the highest tieBreak sorts last
    // and wins the `last(_payload)` carry below. Left rows carry null
    // tieBreaks, which sort first and never reorder across right rows.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(ts).asc +: col("_side").asc +: tbNames.map(col(_).asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val joined = l.unionByName(r, allowMissingColumns = true)
      .withColumn("_match", last(col("_payload"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)

    val carried = rightCols.map(c => col("_match").getField(c).as(c))
    joined.select(left.columns.map(col).toSeq ++ carried: _*)
  }

  private def payloadType(right: DataFrame, rightCols: Seq[String]) =
    org.apache.spark.sql.types.StructType(
      rightCols.map(c => right.schema(c)))

  /** `q41_asof_attribution` — the classic attribution as-of join: each
    * purchase event picks up the latest click of the same user at or
    * before the purchase time. Clicks are first collapsed to one per
    * (user, timestamp) — keep max click_id — so the as-of pick is
    * unique on both engines (DuckDB's native ASOF JOIN, the oracle,
    * leaves equal-timestamp ties unspecified). */
  def clickAttribution(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val e = graft.Tables(spark, dir).events
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), round(col("value"), 4).as("value"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"), col("event_id"))
      .groupBy("user_id", "click_ts")
      .agg(max(col("event_id")).as("click_id"))
    asOf(purchases, clicks, keys = Seq("user_id"),
      leftTs = "ts", rightTs = "click_ts", rightCols = Seq("click_id", "click_ts"))
      .transform(d => Perf.sortedOnce(d, col("event_id")))
  }
}

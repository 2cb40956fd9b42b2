package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** B-block forecasting — the distributed analog of ProphetForecaster
  * (ProphetForecaster.py:267 `forecast`, :221 `_format_forecast`, :211
  * `_apply_growth_bounds`).
  *
  * Prophet's iterative MAP fit cannot run per-key inside a 1000-executor
  * job without driver round-trips, so the Spark-first re-expression is a
  * CLOSED-FORM per-key model: OLS linear trend (`regr_slope` /
  * `regr_intercept` — single-pass, partial-aggregatable) + additive
  * day-of-week seasonality (mean residual per weekday), then a generated
  * future spine, non-negative clamp and rounding exactly as
  * `_format_forecast`/`round_decimals` do. Everything is groupBy/window
  * aggregation — one shuffle per stage, no collect, no iteration.
  */
object Forecast {

  /** Generic per-key daily forecaster.
    *
    * Scale note: the pipeline forks the daily working set into fit /
    * seasonality / spine branches, and Spark re-evaluates shared lineage
    * per branch — so the (keys x days)-sized working set is materialized
    * ONCE via `localCheckpoint` before the fan-out. Without it, the raw
    * fact-table scan behind `daily` runs once per branch (~3 full scans;
    * at 100 TB that is the difference between one pass and three). The
    * checkpoint blocks live in executor storage and are GC-released with
    * the plan, so there is no persist/unpersist lifecycle to thread
    * through callers.
    *
    * @param daily   DataFrame with `keyCols`, a date col `ds`, metric `y`
    * @param horizon number of future days to emit
    * @return keyCols + ds + yhat (4-dp rounded, clamped at 0)
    */
  def forecastDaily(daily: DataFrame, keyCols: Seq[String], horizon: Int): DataFrame = {
    val keys = keyCols.map(col)
    val wk = Window.partitionBy(keys: _*)

    // x = days since the key's first observation (window rides one exchange);
    // eagerly materialized — every downstream branch reads these blocks
    // instead of re-running the upstream scan+aggregate.
    val wx = daily
      .withColumn("x", datediff(col("ds"), min(col("ds")).over(wk)).cast("double"))
      .localCheckpoint()

    // per-key OLS fit — single-pass distributed aggregation
    val fit = wx.groupBy(keys: _*).agg(
      regr_slope(col("y"), col("x")).as("slope"),
      regr_intercept(col("y"), col("x")).as("icept"),
      max(col("x")).as("xmax"),
      max(col("ds")).as("maxds"))

    // additive weekly seasonality: mean residual per (key, dow).
    // dow normalized to Sunday=0 (Spark dayofweek is Sunday=1).
    val dowMeans = wx.join(fit, keyCols)
      .withColumn("dow", (dayofweek(col("ds")) - 1).cast("long"))
      .groupBy(keys :+ col("dow"): _*)
      .agg(avg(col("y") - (col("icept") + col("slope") * col("x"))).as("dow_mean"))

    // future spine: per-key `horizon` days past the last observation
    val future = fit
      .select(keys ++ Seq(col("slope"), col("icept"), col("xmax"), col("maxds"),
        explode(sequence(lit(1), lit(horizon))).as("h")): _*)
      .withColumn("ds", date_add(col("maxds"), col("h")))
      .withColumn("x", col("xmax") + col("h"))
      .withColumn("dow", (dayofweek(col("ds")) - 1).cast("long"))

    future.join(dowMeans, keyCols :+ "dow", "left")
      .select(keys ++ Seq(
        col("ds"),
        round(greatest(lit(0.0),
          col("icept") + col("slope") * col("x") + coalesce(col("dow_mean"), lit(0.0))), 4).as("yhat")): _*)
      .orderBy(keys :+ col("ds"): _*)
  }

  /** B1+B2 `q15_forecast_daily` — 7-day forecast of daily event value per
    * event_type: linear trend + weekly seasonality, clamped non-negative,
    * rounded (ProphetForecaster `non_negative=True`, `round_decimals`). */
  def forecastDailyValue(spark: SparkSession, dir: String, horizon: Int = 7): DataFrame = {
    val t = Tables(spark, dir)
    val daily = t.events
      .groupBy(col("event_type"), to_date(col("ts")).as("ds"))
      .agg(sum(col("value")).as("y"))
    forecastDaily(daily, Seq("event_type"), horizon)
  }

  /** B3 `q16_forecast_multi` — multi-metric fan-out (`forecast(metrics=
    * None)` → every numeric column): melt metrics long via `stack`, then
    * one composite-key forecast over (event_type, metric). */
  def forecastMulti(spark: SparkSession, dir: String, horizon: Int = 7): DataFrame = {
    val t = Tables(spark, dir)
    val daily = t.events
      .groupBy(col("event_type"), to_date(col("ts")).as("ds"))
      .agg(sum(col("value")).as("value_sum"), count(lit(1)).cast("double").as("n_events"))
    val melted = daily.select(
      col("event_type"), col("ds"),
      expr("stack(2, 'value_sum', value_sum, 'n_events', n_events) AS (metric, y)"))
    forecastDaily(melted, Seq("event_type", "metric"), horizon)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Class-shaped facade mirroring the reference forecaster's API
  * (`ProphetForecaster.__init__(df, date_column, metrics)` +
  * `forecast(days, ...)` kwargs, ProphetForecaster.py:267-330) so a
  * reference user can switch with the same call shape: construct over a
  * WIDE frame (date column + one column per metric, optionally key
  * columns), then `forecast(days = 30, ...)` with the familiar options.
  *
  * Internally the wide frame melts to (keys, metric, ds, y) — the
  * reference's per-metric Python loop becomes one composite-key
  * distributed fit (every metric fits in the same pass, SURVEY B3) —
  * and the options dispatch to the closed-form paths:
  *
  *  - `regressors` → [[Forecast.forecastWithRegressor]] (Cramer 3×3);
  *  - `holidays` / `countryHolidays` →
  *    [[Forecast.forecastWithHolidays]] / country calendars;
  *  - yearly/custom seasonality, multiplicative mode, or changepoints →
  *    [[Forecast.forecastFourier]] (Gram-basis OLS);
  *  - otherwise → [[Forecast.forecastDaily]] (trend + weekly/hourly
  *    seasonality, freq D/W/MS/H, growth linear/flat).
  *
  * Prophet fits one joint model over every option at once; the
  * closed-form analogs are separate solvers, so option combinations
  * that would need a joint fit (e.g. regressors + yearly seasonality)
  * raise IllegalArgumentException up front instead of silently
  * ignoring an option — a switching user finds out immediately.
  *
  * Output is LONG (keys, metric, ds, yhat [, bounds]) — the scalable
  * shape; [[forecastWide]] pivots back to the reference's
  * one-column-per-metric frame when the metric count is bounded.
  */
class Forecaster(data: DataFrame, dateCol: String = "ds",
                 keyCols: Seq[String] = Nil) {

  /** Numeric non-key columns — the reference's `metrics=None` → "all
    * numeric columns" rule (`_data_validation`). */
  def numericMetrics: Seq[String] = data.schema.fields.collect {
    case f if f.dataType.isInstanceOf[NumericType] &&
      !keyCols.contains(f.name) && f.name != dateCol => f.name
  }.toSeq

  private def melt(metrics: Seq[String], extra: Seq[String] = Nil): DataFrame = {
    require(metrics.nonEmpty, "no metrics to forecast (none declared, none numeric)")
    val stackExpr = s"stack(${metrics.length}, " +
      metrics.map(m => s"'$m', `$m`").mkString(", ") + ") AS (metric, y)"
    data.select((keyCols ++ extra).map(col) ++
      Seq(col(dateCol).as("ds"), expr(stackExpr)): _*)
  }

  /** The reference `forecast()` kwargs, same names modulo casing.
    * `roundDecimals`: None keeps the library's 4-dp contract; Some(d)
    * re-rounds yhat (and bounds) like `round_decimals`. */
  def forecast(days: Int,
               metrics: Option[Seq[String]] = None,
               freq: String = "D",
               includeHistory: Boolean = false,
               includeIntervals: Boolean = false,
               intervalWidth: Double = 0.80,
               growth: String = "linear",
               cap: Option[Double] = None,
               floor: Option[Double] = None,
               seasonalityMode: String = "additive",
               yearlySeasonality: Int = 0,
               weeklySeasonality: Int = 0,
               changepoints: Int = 0,
               changepointRange: Double = 0.8,
               changepointRidge: Double = 0.0,
               customSeasonalities: Seq[(Double, Int)] = Nil,
               holidays: Option[DataFrame] = None,
               countryHolidays: Option[String] = None,
               regressor: Option[String] = None,
               futureRegressor: Option[DataFrame] = None,
               nonNegative: Boolean = true,
               roundDecimals: Option[Int] = None): DataFrame = {
    // regressors are inputs, not targets — excluded from the metric
    // auto-discovery exactly like the reference's _data_validation
    val ms = metrics.getOrElse(numericMetrics.filterNot(regressor.contains))
    val keys = keyCols :+ "metric"
    val multiplicative = seasonalityMode match {
      case "additive" => false
      case "multiplicative" => true
      case other => throw new IllegalArgumentException(
        s"seasonality_mode must be additive or multiplicative, got $other")
    }
    val wantsFourier = yearlySeasonality > 0 || weeklySeasonality > 0 ||
      customSeasonalities.nonEmpty || changepoints > 0 || multiplicative
    val wantsHolidays = holidays.isDefined || countryHolidays.isDefined

    def unsupported(what: String) = throw new IllegalArgumentException(
      s"unsupported option combination: $what (the closed-form paths fit " +
        "separately; see Forecaster scaladoc for the supported sets)")
    if (changepointRidge > 0.0 && changepoints == 0)
      unsupported("changepointRidge without changepoints")

    val out =
      if (regressor.isDefined) {
        if (wantsFourier || wantsHolidays) unsupported("regressors with seasonality/holiday options")
        if (freq != "D") unsupported("regressors with freq != D")
        if (growth != "linear") unsupported(s"regressors with growth='$growth'")
        if (!nonNegative) unsupported("regressors with nonNegative=false (that path clamps at 0)")
        if (cap.isDefined || floor.isDefined || includeIntervals || includeHistory)
          unsupported("regressors with bounds/intervals/history")
        // the metric melt is this facade's internal: the caller supplies
        // future regressor values per (keyCols, ds), and every melted
        // metric shares them — expand across the metric list here
        val fr = futureRegressor.map(
          _.withColumn("metric", explode(array(ms.map(lit): _*))))
        Forecast.forecastWithRegressor(
          melt(ms, extra = Seq(regressor.get)).withColumnRenamed(regressor.get, "r"),
          keys, days, fr)
      } else if (wantsHolidays) {
        if (wantsFourier) unsupported("holidays with Fourier/changepoint options")
        if (cap.isDefined || floor.isDefined || includeIntervals || includeHistory)
          unsupported("holidays with bounds/intervals/history")
        if (freq != "D") unsupported("holidays with freq != D")
        if (growth != "linear") unsupported(s"holidays with growth='$growth'")
        if (!nonNegative) unsupported("holidays with nonNegative=false (that path clamps at 0)")
        (holidays, countryHolidays) match {
          case (Some(h), None) => Forecast.forecastWithHolidays(melt(ms), keys, days, h)
          case (None, Some(c)) => Forecast.forecastWithCountryHolidays(melt(ms), keys, days, c)
          case _ => unsupported("both holidays and country_holidays")
        }
      } else if (wantsFourier) {
        if (freq != "D") unsupported("Fourier/changepoint options with freq != D")
        if (growth == "flat") unsupported("growth='flat' with Fourier/changepoint options")
        Forecast.forecastFourier(melt(ms), keys, days,
          weeklyOrder = if (weeklySeasonality > 0) weeklySeasonality else 2,
          yearlyOrder = yearlySeasonality,
          multiplicative = multiplicative,
          changepoints = changepoints, changepointRange = changepointRange,
          changepointRidge = changepointRidge,
          extraSeasonalities = customSeasonalities,
          cap = cap, floor = floor,
          includeIntervals = includeIntervals, intervalWidth = intervalWidth,
          includeHistory = includeHistory, nonNegative = nonNegative)
      } else {
        Forecast.forecastDaily(melt(ms), keys, days,
          cap = cap, floor = floor,
          includeIntervals = includeIntervals, intervalWidth = intervalWidth,
          includeHistory = includeHistory, nonNegative = nonNegative,
          freq = freq, growth = growth)
      }

    roundDecimals.fold(out) { d =>
      val yhatCols = Seq("yhat", "yhat_lower", "yhat_upper").filter(out.columns.contains)
      yhatCols.foldLeft(out)((acc, c) => acc.withColumn(c, round(col(c), d)))
    }
  }

  /** Reference-shaped WIDE result: one row per (keys, ds), one column
    * per metric (`predictions by date, one column per metric`). Only
    * sensible for bounded metric counts and without intervals. */
  def forecastWide(days: Int, metrics: Option[Seq[String]] = None,
                   freq: String = "D", growth: String = "linear"): DataFrame = {
    val ms = metrics.getOrElse(numericMetrics)
    forecast(days, Some(ms), freq = freq, growth = growth)
      .groupBy((keyCols :+ "ds").map(col): _*)
      .pivot("metric", ms)
      .agg(first(col("yhat")))
      .orderBy((keyCols :+ "ds").map(col): _*)
  }
}

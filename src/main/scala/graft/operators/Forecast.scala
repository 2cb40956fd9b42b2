package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** B-block forecasting — the distributed analog of ProphetForecaster
  * (ProphetForecaster.py:267 `forecast`, :221 `_format_forecast`, :211
  * `_apply_growth_bounds`, :166 `add_regressor`, :152 custom
  * seasonalities).
  *
  * Prophet's iterative MAP fit cannot run per-key inside a 1000-executor
  * job without driver round-trips, so the Spark-first re-expression is a
  * CLOSED-FORM per-key model: OLS linear trend (`regr_slope` /
  * `regr_intercept` — single-pass, partial-aggregatable) + additive
  * day-of-week seasonality (mean residual per weekday), then a generated
  * future spine, bounds clamp, non-negative clamp and rounding exactly as
  * `_format_forecast`/`round_decimals` do. Everything is groupBy/window
  * aggregation — one shuffle per stage, no collect, no iteration.
  *
  * Reference options modeled here:
  *  - `growth='logistic'` cap/floor (`_apply_growth_bounds`,
  *    ProphetForecaster.py:211): Prophet feeds cap/floor into an
  *    iterative logistic-trend fit; the closed-form analog fits the
  *    log-odds transform z = ln((y−floor)/(cap−y)) linearly and maps
  *    predictions back through the sigmoid — a genuine saturating
  *    trend (plus the same clamp contract: forecasts never leave
  *    [floor, cap]).
  *  - `include_intervals` / `interval_width`
  *    (ProphetForecaster.py:221-236, default 0.80 at :273): Prophet
  *    simulates trend uncertainty; the closed-form analog emits
  *    `yhat ± z·σ` where σ is the per-key stddev of model residuals and
  *    z the two-sided normal quantile for the width — one extra
  *    distributed aggregate, no simulation.
  *  - `include_history` (ProphetForecaster.py:271,300): when set, fitted
  *    values over the observed dates are emitted alongside the future
  *    rows, exactly like Prophet's `make_future_dataframe(include_history
  *    =True)` → `predict` over history+future.
  *  - `add_regressor` + future-regressor validation
  *    (ProphetForecaster.py:166,190-205): [[forecastWithRegressor]] fits
  *    y = b0 + b1·x + b2·r per key via closed-form normal equations
  *    (Cramer's rule over distributed sums) and fails loudly when the
  *    caller-supplied future frame is missing regressor values, matching
  *    `_attach_regressors`' ValueError.
  *  - yearly/custom seasonality + `seasonality_mode='multiplicative'`
  *    (ProphetForecaster.py:152-163,277): [[forecastFourier]] fits a
  *    per-key OLS over trend + weekly/yearly Fourier features (Prophet's
  *    own seasonality basis) via distributed Gram sums + a tiny per-key
  *    solve; multiplicative mode fits in log space and exponentiates —
  *    the closed-form equivalent of seasonality scaling with the trend.
  */
object Forecast {

  /** Two-sided normal quantile z for a central interval of `width`
    * (z = Φ⁻¹((1+width)/2)) — Acklam's rational approximation of the
    * inverse normal CDF (public-domain constants, |rel err| < 1.15e-9).
    * Evaluated driver-side once; the SAME literal feeds the Spark plan
    * and the DuckDB oracle so the two engines cannot disagree. */
  def intervalZ(width: Double): Double = {
    require(width > 0 && width < 1, s"interval width must be in (0,1), got $width")
    val p = (1.0 + width) / 2.0
    val a = Array(-3.969683028665376e+01, 2.209460984245205e+02, -2.759285104469687e+02,
      1.383577518672690e+02, -3.066479806614716e+01, 2.506628277459239e+00)
    val b = Array(-5.447609879822406e+01, 1.615858368580409e+02, -1.556989798598866e+02,
      6.680131188771972e+01, -1.328068155288572e+01)
    val c = Array(-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e+00,
      -2.549732539343734e+00, 4.374664141464968e+00, 2.938163982698783e+00)
    val d = Array(7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e+00,
      3.754408661907416e+00)
    val plow = 0.02425
    if (p < plow) {
      val q = math.sqrt(-2 * math.log(p))
      (((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q + c(5)) /
        ((((d(0) * q + d(1)) * q + d(2)) * q + d(3)) * q + 1)
    } else if (p <= 1 - plow) {
      val q = p - 0.5; val r = q * q
      (((((a(0) * r + a(1)) * r + a(2)) * r + a(3)) * r + a(4)) * r + a(5)) * q /
        (((((b(0) * r + b(1)) * r + b(2)) * r + b(3)) * r + b(4)) * r + 1)
    } else {
      val q = math.sqrt(-2 * math.log(1 - p))
      -(((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q + c(5)) /
        ((((d(0) * q + d(1)) * q + d(2)) * q + d(3)) * q + 1)
    }
  }

  /** cap/floor saturation clamp then non-negative clip — the closed-form
    * `_apply_growth_bounds` + `_format_forecast(non_negative)` contract,
    * applied to every predicted value column (yhat and interval bounds). */
  private def bounded(v: Column, cap: Option[Double], floor: Option[Double],
                      nonNegative: Boolean): Column = {
    val capped = cap.fold(v)(c => least(lit(c), v))
    val floored = floor.fold(capped)(f => greatest(lit(f), capped))
    if (nonNegative) greatest(lit(0.0), floored) else floored
  }

  /** Backtick-escape a caller-supplied column name for `col()`
    * resolution — regressor names come from the caller's schema and may
    * contain dots or backticks, which bare `col()` would parse as field
    * access / delimiters. */
  private def qcol(name: String): Column = col("`" + name.replace("`", "``") + "`")

  // ---- freq machinery (shared by every forecaster path) ----------------
  // x counts PERIODS since a key's first observation; the future spine
  // steps by one period; t is (possibly fractional) DAYS since epoch so
  // seasonality phase stays calendar-anchored at any freq.

  private def periodsSinceF(freq: String)(ds: Column, origin: Column): Column = freq match {
    case "D"  => datediff(ds, origin).cast("double")
    case "W"  => (datediff(ds, origin) / 7.0)
    case "MS" => months_between(ds, origin)
    case "H"  => (unix_timestamp(ds) - unix_timestamp(origin)) / 3600.0
  }

  private def stepForwardF(freq: String)(origin: Column, h: Column): Column = freq match {
    case "D"  => date_add(origin, h)
    case "W"  => date_add(origin, h * 7)
    case "MS" => add_months(origin, h)
    case "H"  => origin.cast("timestamp") + make_dt_interval(lit(0), h, lit(0), lit(0))
  }

  private def daysSinceEpochF(freq: String)(ds: Column): Column =
    if (freq == "H") unix_timestamp(ds).cast("double") / 86400.0
    else datediff(ds, lit("1970-01-01").cast("date")).cast("double")

  // ---- growth transforms -----------------------------------------------
  // growth='logistic' is a TRUE saturating fit, not a clamp: the series
  // maps through the log-odds transform z = ln((y−floor)/(cap−y)) — the
  // inverse of the logistic curve y = floor + (cap−floor)·σ(z) — the
  // model fits LINEARLY in z-space, and predictions map back through the
  // sigmoid, so the forecast bends toward the cap as the series
  // approaches saturation where a clamped linear trend would overshoot
  // then flat-line. Observations at/outside the bounds clamp to
  // [ε, 1−ε] odds before the log (the closed-form stand-in for
  // Prophet's requirement that y lie strictly inside (floor, cap)).

  private val logisticEps = 1e-6

  /** Transform an observation into fit space for `growth`. */
  private def toFitSpace(y: Column, growth: String, multiplicative: Boolean,
                         cap: Option[Double], floor: Option[Double]): Column =
    if (growth == "logistic") {
      val lo = floor.getOrElse(0.0)
      val hi = cap.getOrElse(Double.NaN)
      val q = least(greatest((y - lit(lo)) / lit(hi - lo), lit(logisticEps)),
        lit(1.0 - logisticEps))
      log(q / (lit(1.0) - q))
    } else if (multiplicative) log(greatest(y, lit(logisticEps)))
    else y

  /** Map a fit-space prediction back to the observation scale. */
  private def fromFitSpace(d: Column, growth: String, multiplicative: Boolean,
                           cap: Option[Double], floor: Option[Double]): Column =
    if (growth == "logistic") {
      val lo = floor.getOrElse(0.0)
      val hi = cap.getOrElse(Double.NaN)
      lit(lo) + lit(hi - lo) / (lit(1.0) + exp(-d))
    } else if (multiplicative) exp(d)
    else d

  /** Generic per-key daily forecaster: OLS trend + additive day-of-week
    * seasonality.
    *
    * Scale note: the pipeline forks the daily working set into fit /
    * seasonality / interval / spine branches, and Spark re-evaluates
    * shared lineage per branch — so the (keys x days)-sized working set
    * is materialized ONCE via `localCheckpoint` before the fan-out.
    * Without it, the raw fact-table scan behind `daily` runs once per
    * branch (~3-4 full scans; at 100 TB that is the difference between
    * one pass and several). Trade-offs of localCheckpoint, deliberately
    * accepted here: (1) it is EAGER — a Spark job runs at plan-build
    * time even if the result is never consumed; (2) blocks are
    * non-replicated executor-local storage with truncated lineage, so
    * losing an executor mid-job (spot nodes, dynamic allocation) fails
    * the job and the retry recomputes from source. For long-lived
    * multi-tenant deployments where partial recovery matters more than
    * latency, swap in `persist(MEMORY_AND_DISK)` (keeps lineage, needs
    * an unpersist lifecycle) or a reliable `checkpoint()` to HDFS/object
    * storage; for the single-job batch shape this library targets, the
    * job-level retry is the recovery path and localCheckpoint is the
    * cheapest correct materialization.
    *
    * @param daily          DataFrame with `keyCols`, date col `ds`, metric `y`
    * @param horizon        number of future periods to emit
    * @param cap            optional ceiling (growth='logistic' cap analog)
    * @param floor          optional floor (logistic floor analog)
    * @param includeIntervals emit `yhat_lower`/`yhat_upper` (±z·σ bands)
    * @param intervalWidth  central interval mass (reference default 0.80)
    * @param includeHistory also emit fitted values over observed dates
    * @param nonNegative    clip predictions (and bands) at 0
    * @param freq           period of the series and future spine — "D"
    *                       daily, "W" weekly, "MS" month-start, "H"
    *                       hourly (the reference `forecast(freq=...)`
    *                       options; ProphetForecaster.py:299). x counts
    *                       PERIODS since the key's first observation and
    *                       the future spine steps by one period; the
    *                       seasonal term is day-of-week at freq="D" and
    *                       hour-of-day at freq="H" (Prophet's
    *                       `daily_seasonality` for sub-daily series) —
    *                       for W/MS the per-key OLS residual mean is
    *                       exactly 0, so the term vanishes by
    *                       construction. At freq="H" `ds` is a
    *                       timestamp, not a date.
    * @param growth         "linear" (default), "flat" — Prophet's
    *                       growth='flat' (ProphetForecaster.py:303):
    *                       intercept-only trend at the key's mean, so
    *                       the forecast never extrapolates a slope;
    *                       seasonal terms still apply — or "logistic":
    *                       a TRUE saturating fit via the log-odds
    *                       transform (requires `cap`; optional `floor`),
    *                       bending toward the cap where a clamped
    *                       linear trend would overshoot then flat-line.
    * @return keyCols + ds + yhat [+ yhat_lower + yhat_upper] (4-dp)
    */
  def forecastDaily(daily: DataFrame, keyCols: Seq[String], horizon: Int,
                    cap: Option[Double] = None, floor: Option[Double] = None,
                    includeIntervals: Boolean = false, intervalWidth: Double = 0.80,
                    includeHistory: Boolean = false,
                    nonNegative: Boolean = true,
                    freq: String = "D",
                    growth: String = "linear"): DataFrame = {
    require(Set("D", "W", "MS", "H").contains(freq), s"freq must be D, W, MS or H, got $freq")
    require(Set("linear", "flat", "logistic").contains(growth),
      s"growth must be linear, flat or logistic, got $growth")
    require(growth != "logistic" || cap.isDefined,
      "growth='logistic' needs a cap (the saturation level the log-odds transform fits toward)")
    require(growth != "logistic" || floor.getOrElse(0.0) < cap.get,
      s"growth='logistic' needs floor < cap, got floor=$floor cap=$cap")
    val keys = keyCols.map(col)
    val wk = Window.partitionBy(keys: _*)

    // seasonal slot: day-of-week at D, hour-of-day at H; the lit(0) slot
    // at W/MS collapses the seasonal aggregate to the per-key OLS
    // residual mean, which is 0.
    def dowOf(ds: Column): Column = freq match {
      case "D" => (dayofweek(ds) - 1).cast("long")
      case "H" => hour(ds).cast("long")
      case _   => lit(0L)
    }

    // x = periods since the key's first observation (window rides one
    // exchange); eagerly materialized — every downstream branch reads
    // these blocks instead of re-running the upstream scan+aggregate.
    // yy = the observation in FIT SPACE (identity for linear/flat;
    // log-odds toward the cap for logistic — see [[toFitSpace]]); the
    // whole model (trend, seasonal residual means, σ) fits in that
    // space and predictions map back through [[fromFitSpace]].
    val wx = daily
      .withColumn("x", periodsSinceF(freq)(col("ds"), min(col("ds")).over(wk)))
      .withColumn("yy", toFitSpace(col("y"), growth, multiplicative = false, cap, floor))
      .localCheckpoint()

    // per-key fit — single-pass distributed aggregation; flat growth is
    // the intercept-only model (mean level, zero slope)
    val fit =
      if (growth == "flat")
        wx.groupBy(keys: _*).agg(
          avg(col("yy")).as("icept"),
          max(col("x")).as("xmax"),
          max(col("ds")).as("maxds"))
          .withColumn("slope", lit(0.0))
      else
        wx.groupBy(keys: _*).agg(
          regr_slope(col("yy"), col("x")).as("slope"),
          regr_intercept(col("yy"), col("x")).as("icept"),
          max(col("x")).as("xmax"),
          max(col("ds")).as("maxds"))

    // additive weekly seasonality: mean residual per (key, dow).
    // dow normalized to Sunday=0 (Spark dayofweek is Sunday=1).
    val dowMeans = wx.join(fit, keyCols)
      .withColumn("dow", dowOf(col("ds")))
      .groupBy(keys :+ col("dow"): _*)
      .agg(avg(col("yy") - (col("icept") + col("slope") * col("x"))).as("dow_mean"))

    // future spine: per-key `horizon` periods past the last observation
    val future = fit
      .select(keys ++ Seq(col("xmax"), col("maxds"),
        explode(sequence(lit(1), lit(horizon))).as("h")): _*)
      .withColumn("ds", stepForwardF(freq)(col("maxds"), col("h")))
      .withColumn("x", col("xmax") + col("h"))
      .select(keys ++ Seq(col("ds"), col("x")): _*)

    // history spine (include_history=True: fitted values over observed ds)
    val spine =
      if (includeHistory) wx.select(keys ++ Seq(col("ds"), col("x")): _*).unionByName(future)
      else future

    val pred = spine
      .join(fit.select(keys ++ Seq(col("slope"), col("icept")): _*), keyCols)
      .withColumn("dow", dowOf(col("ds")))
      .join(dowMeans, keyCols :+ "dow", "left")
      .withColumn("raw",
        col("icept") + col("slope") * col("x") + coalesce(col("dow_mean"), lit(0.0)))

    def toY(d: Column): Column = fromFitSpace(d, growth, multiplicative = false, cap, floor)
    val out =
      if (!includeIntervals) {
        pred.select(keys ++ Seq(col("ds"),
          round(bounded(toY(col("raw")), cap, floor, nonNegative), 4).as("yhat")): _*)
      } else {
        // σ = per-key stddev of residuals AFTER trend + dow seasonality —
        // one more aggregate over the checkpointed working set, no extra
        // source scan. z is the driver-side normal quantile for the
        // width. Under logistic growth σ lives in z-space and the bands
        // transform through the (monotone) sigmoid — asymmetric near the
        // bounds and always inside [floor, cap], like a logit-normal
        // interval.
        val z = intervalZ(intervalWidth)
        val sigma = wx.join(fit, keyCols)
          .withColumn("dow", dowOf(col("ds")))
          .join(dowMeans, keyCols :+ "dow", "left")
          .groupBy(keys: _*)
          .agg(coalesce(
            stddev_samp(col("yy") - (col("icept") + col("slope") * col("x") +
              coalesce(col("dow_mean"), lit(0.0)))),
            lit(0.0)).as("sigma"))
        pred.join(sigma, keyCols)
          .select(keys ++ Seq(col("ds"),
            round(bounded(toY(col("raw")), cap, floor, nonNegative), 4).as("yhat"),
            round(bounded(toY(col("raw") - lit(z) * col("sigma")), cap, floor, nonNegative), 4).as("yhat_lower"),
            round(bounded(toY(col("raw") + lit(z) * col("sigma")), cap, floor, nonNegative), 4).as("yhat_upper")): _*)
      }
    Perf.sortedOnce(out, keys :+ col("ds"): _*)
  }

  /** B1+B2 `q15_forecast_daily` — 7-day forecast of daily event value per
    * event_type: linear trend + weekly seasonality, clamped non-negative,
    * rounded (ProphetForecaster `non_negative=True`, `round_decimals`). */
  def forecastDailyValue(spark: SparkSession, dir: String, horizon: Int = 7): DataFrame =
    forecastDaily(eventsDaily(spark, dir), Seq("event_type"), horizon)

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

  /** `q17_forecast_bounded` — the reference forecaster's bounded +
    * intervals shape: growth cap/floor clamp (`_apply_growth_bounds`)
    * and 80% prediction bands (`include_intervals=True`,
    * `interval_width=0.80` — the reference defaults). */
  def forecastBounded(spark: SparkSession, dir: String, horizon: Int = 7,
                      cap: Double = 500.0, floor: Double = 10.0): DataFrame =
    forecastDaily(eventsDaily(spark, dir), Seq("event_type"), horizon,
      cap = Some(cap), floor = Some(floor), includeIntervals = true)

  private def eventsDaily(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events
      .groupBy(col("event_type"), to_date(col("ts")).as("ds"))
      .agg(sum(col("value")).as("y"))

  /** External-regressor forecaster (`add_regressor`,
    * ProphetForecaster.py:166): per-key closed-form OLS of
    * y = b0 + b1·x + b2·r via the 3×3 normal equations solved with
    * Cramer's rule — the sums are one distributed partial aggregation,
    * the determinant arithmetic is scalar column math, so the whole fit
    * stays a single shuffle. Additive day-of-week seasonality rides on
    * residuals exactly as [[forecastDaily]].
    *
    * Future regressor validation (`_attach_regressors`,
    * ProphetForecaster.py:190-205): a caller-supplied `futureReg` must
    * cover every (key, future ds); a missing value raises at execution —
    * the distributed analog of the reference's ValueError — rather than
    * silently forecasting with nulls. When `futureReg` is None the
    * per-key HISTORICAL MEAN of `r` stands in, computed from the
    * already-checkpointed working set so no extra source scan runs.
    *
    * @param daily     keyCols + `ds` + `y` + regressor column `r`
    * @param futureReg keyCols + `ds` + `r` for the horizon dates; None →
    *                  per-key historical mean
    */
  def forecastWithRegressor(daily: DataFrame, keyCols: Seq[String], horizon: Int,
                            futureReg: Option[DataFrame] = None): DataFrame = {
    val keys = keyCols.map(col)
    val wk = Window.partitionBy(keys: _*)
    val wx = daily
      .withColumn("x", datediff(col("ds"), min(col("ds")).over(wk)).cast("double"))
      .localCheckpoint()

    // Normal-equation sums — one partial-aggregated shuffle.
    val fit = wx.groupBy(keys: _*).agg(
      count(lit(1)).cast("double").as("n"),
      sum(col("x")).as("sx"), sum(col("r")).as("sr"),
      sum(col("x") * col("x")).as("sxx"), sum(col("x") * col("r")).as("sxr"),
      sum(col("r") * col("r")).as("srr"),
      sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
      sum(col("r") * col("y")).as("sry"),
      max(col("x")).as("xmax"), max(col("ds")).as("maxds"))

    // Cramer's rule on [[n,sx,sr],[sx,sxx,sxr],[sr,sxr,srr]]·b = [sy,sxy,sry].
    // Singular-system guard (degenerate keys: <3 observations, constant
    // regressor, or r collinear with x): det ≈ 0 would turn the divisions
    // into null/±Inf betas and the final greatest(0, null) into a silent
    // 0.0 "forecast" — instead such keys FALL BACK to the 2-parameter
    // trend-only fit (b2 = 0), the same model forecastDaily fits. The
    // threshold is RELATIVE (|det| vs the diagonal product n·sxx·srr,
    // the determinant's leading term) because the sums' magnitude is
    // data-dependent; 1e-9 is far above float cancellation noise and far
    // below any genuinely solvable system's ratio.
    def det3(a: Column, b: Column, c: Column, d: Column, e: Column, f: Column,
             g: Column, h: Column, i: Column): Column =
      a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)
    val betas = fit
      .withColumn("det", det3(col("n"), col("sx"), col("sr"),
        col("sx"), col("sxx"), col("sxr"), col("sr"), col("sxr"), col("srr")))
      .withColumn("degen",
        abs(col("det")) <= lit(1e-9) * abs(col("n") * col("sxx") * col("srr")))
      // trend-only fallback: simple OLS slope/intercept from the same sums
      .withColumn("den2", col("n") * col("sxx") - col("sx") * col("sx"))
      .withColumn("b1f", when(abs(col("den2")) > lit(0.0),
        (col("n") * col("sxy") - col("sx") * col("sy")) / col("den2")).otherwise(lit(0.0)))
      .withColumn("b0f", (col("sy") - col("b1f") * col("sx")) / col("n"))
      .withColumn("b0", when(col("degen"), col("b0f"))
        .otherwise(det3(col("sy"), col("sx"), col("sr"),
          col("sxy"), col("sxx"), col("sxr"), col("sry"), col("sxr"), col("srr")) / col("det")))
      .withColumn("b1", when(col("degen"), col("b1f"))
        .otherwise(det3(col("n"), col("sy"), col("sr"),
          col("sx"), col("sxy"), col("sxr"), col("sr"), col("sry"), col("srr")) / col("det")))
      .withColumn("b2", when(col("degen"), lit(0.0))
        .otherwise(det3(col("n"), col("sx"), col("sy"),
          col("sx"), col("sxx"), col("sxy"), col("sr"), col("sxr"), col("sry")) / col("det")))
      .select(keys ++ Seq(col("b0"), col("b1"), col("b2"), col("xmax"), col("maxds")): _*)

    val dowMeans = wx.join(betas, keyCols)
      .withColumn("dow", (dayofweek(col("ds")) - 1).cast("long"))
      .groupBy(keys :+ col("dow"): _*)
      .agg(avg(col("y") - (col("b0") + col("b1") * col("x") + col("b2") * col("r"))).as("dow_mean"))

    val frDf = futureReg.getOrElse {
      wx.groupBy(keys: _*).agg(avg(col("r")).as("r"), max(col("ds")).as("maxds"))
        .select(keys ++ Seq(col("r"), col("maxds"),
          explode(sequence(lit(1), lit(horizon))).as("h")): _*)
        .withColumn("ds", date_add(col("maxds"), col("h")))
        .select(keys ++ Seq(col("ds"), col("r")): _*)
    }
    val future = betas
      .select(keys ++ Seq(col("b0"), col("b1"), col("b2"), col("xmax"), col("maxds"),
        explode(sequence(lit(1), lit(horizon))).as("h")): _*)
      .withColumn("ds", date_add(col("maxds"), col("h")))
      .withColumn("x", col("xmax") + col("h"))
      .join(frDf.select(keys ++ Seq(col("ds"), col("r")): _*), keyCols :+ "ds", "left")
      // missing future regressor values fail loudly, as the reference does
      .withColumn("r", when(col("r").isNull,
        raise_error(concat(lit("forecastWithRegressor: missing future regressor value for ds="),
          col("ds").cast("string")))).otherwise(col("r")))
      .withColumn("dow", (dayofweek(col("ds")) - 1).cast("long"))

    future.join(dowMeans, keyCols :+ "dow", "left")
      .select(keys ++ Seq(
        col("ds"),
        round(greatest(lit(0.0),
          col("b0") + col("b1") * col("x") + col("b2") * col("r") +
            coalesce(col("dow_mean"), lit(0.0))), 4).as("yhat")): _*)
      .transform(d => Perf.sortedOnce(d, keys :+ col("ds"): _*))
  }

  /** `q18_forecast_regressor` — daily event value per type with the
    * daily event COUNT as an external regressor. Uses the default
    * future-regressor policy (per-key historical mean, derived from the
    * checkpointed working set — one source scan total); any
    * keyCols+ds+r frame plugs in instead via `futureReg`. */
  def forecastRegressor(spark: SparkSession, dir: String, horizon: Int = 7): DataFrame = {
    val t = Tables(spark, dir)
    val daily = t.events
      .groupBy(col("event_type"), to_date(col("ts")).as("ds"))
      .agg(sum(col("value")).as("y"), count(lit(1)).cast("double").as("r"))
    forecastWithRegressor(daily, Seq("event_type"), horizon)
  }

  /** Fit stage as a PERSISTABLE MODEL FRAME — the closed-form analog of
    * `save_models`/`load_models` (ProphetForecaster.py:405,436): one row
    * per key holding the trend coefficients, spine anchors, and the
    * 7-slot day-of-week effect vector. Write it as parquet, read it back
    * any time, and [[predictFromModel]] re-forecasts WITHOUT touching
    * the training corpus — the `predict_from_loaded_models` path
    * (ProphetForecaster.py:475), except the "pickle" is a queryable
    * table. */
  def fitDailyModel(daily: DataFrame, keyCols: Seq[String]): DataFrame = {
    val keys = keyCols.map(col)
    val wk = Window.partitionBy(keys: _*)
    val wx = daily
      .withColumn("x", datediff(col("ds"), min(col("ds")).over(wk)).cast("double"))
      .localCheckpoint()
    val fit = wx.groupBy(keys: _*).agg(
      regr_slope(col("y"), col("x")).as("slope"),
      regr_intercept(col("y"), col("x")).as("icept"),
      max(col("x")).as("xmax"),
      max(col("ds")).as("maxds"))
    val dowMap = wx.join(fit, keyCols)
      .withColumn("dow", (dayofweek(col("ds")) - 1).cast("long"))
      .groupBy(keys :+ col("dow"): _*)
      .agg(avg(col("y") - (col("icept") + col("slope") * col("x"))).as("dow_mean"))
      .groupBy(keys: _*)
      .agg(map_from_entries(collect_list(struct(col("dow"), col("dow_mean")))).as("dow_map"))
    fit.join(dowMap, keyCols)
      .withColumn("dows", transform(sequence(lit(0), lit(6)),
        d => coalesce(element_at(col("dow_map"), d.cast("long")), lit(0.0))))
      .select(keys ++ Seq(col("slope"), col("icept"), col("xmax"), col("maxds"), col("dows")): _*)
  }

  /** Forecast `horizon` days from a fitted model frame (from
    * [[fitDailyModel]], possibly parquet-round-tripped) — pure column
    * arithmetic over the tiny model table, zero passes over the
    * training corpus. Matches [[forecastDaily]]'s output exactly on the
    * same data (spec-asserted). */
  def predictFromModel(model: DataFrame, keyCols: Seq[String], horizon: Int): DataFrame = {
    val keys = keyCols.map(col)
    model
      .select(keys ++ Seq(col("slope"), col("icept"), col("xmax"), col("maxds"), col("dows"),
        explode(sequence(lit(1), lit(horizon))).as("h")): _*)
      .withColumn("ds", date_add(col("maxds"), col("h")))
      .withColumn("x", col("xmax") + col("h"))
      .withColumn("dow", (dayofweek(col("ds")) - 1).cast("int"))
      .select(keys ++ Seq(
        col("ds"),
        round(greatest(lit(0.0),
          col("icept") + col("slope") * col("x") +
            element_at(col("dows"), col("dow") + 1)), 4).as("yhat")): _*)
      .transform(d => Perf.sortedOnce(d, keys :+ col("ds"): _*))
  }

  /** Holiday-effects forecaster (`add_country_holidays` /
    * `holidays=DataFrame`, ProphetForecaster.py:161,316-319): additive
    * per-(key, holiday) effects on top of trend + weekly seasonality.
    *
    * Prophet fits one coefficient per holiday jointly; the closed-form
    * analog estimates effects sequentially — holiday effect = mean
    * trend-residual over that holiday's occurrences, then day-of-week
    * means over the holiday-adjusted residuals — which coincides with
    * the joint fit whenever holidays are sparse (the practical case).
    * Like Prophet's holidays frame, `holidays` must list FUTURE holiday
    * dates too (one holiday name per date); future dates absent from
    * the frame simply get no holiday effect.
    *
    * All stages are groupBy/broadcast joins riding the checkpointed
    * working set — holidays are a tiny dimension against the corpus.
    *
    * @param daily    keyCols + `ds` + `y`
    * @param holidays (ds DATE, holiday STRING) covering history + horizon
    */
  def forecastWithHolidays(daily: DataFrame, keyCols: Seq[String], horizon: Int,
                           holidays: DataFrame): DataFrame = {
    val keys = keyCols.map(col)
    val wk = Window.partitionBy(keys: _*)
    val hol = broadcast(holidays.select(col("ds"), col("holiday")))
    val wx = daily
      .withColumn("x", datediff(col("ds"), min(col("ds")).over(wk)).cast("double"))
      .localCheckpoint()

    val fit = wx.groupBy(keys: _*).agg(
      regr_slope(col("y"), col("x")).as("slope"),
      regr_intercept(col("y"), col("x")).as("icept"),
      max(col("x")).as("xmax"),
      max(col("ds")).as("maxds"))

    // trend residuals, tagged with the day's holiday (if any)
    val resid = wx.join(fit, keyCols)
      .withColumn("r1", col("y") - (col("icept") + col("slope") * col("x")))
      .join(hol, Seq("ds"), "left")

    val holMeans = resid.filter(col("holiday").isNotNull)
      .groupBy(keys :+ col("holiday"): _*)
      .agg(avg(col("r1")).as("h_mean"))

    // weekly seasonality over holiday-adjusted residuals
    val dowMeans = resid
      .join(holMeans, keyCols :+ "holiday", "left")
      .withColumn("dow", (dayofweek(col("ds")) - 1).cast("long"))
      .groupBy(keys :+ col("dow"): _*)
      .agg(avg(col("r1") - coalesce(col("h_mean"), lit(0.0))).as("dow_mean"))

    val future = fit
      .select(keys ++ Seq(col("slope"), col("icept"), col("xmax"), col("maxds"),
        explode(sequence(lit(1), lit(horizon))).as("h")): _*)
      .withColumn("ds", date_add(col("maxds"), col("h")))
      .withColumn("x", col("xmax") + col("h"))
      .withColumn("dow", (dayofweek(col("ds")) - 1).cast("long"))
      .join(hol, Seq("ds"), "left")
      .join(holMeans, keyCols :+ "holiday", "left")
      .join(dowMeans, keyCols :+ "dow", "left")

    future.select(keys ++ Seq(
        col("ds"),
        round(greatest(lit(0.0),
          col("icept") + col("slope") * col("x") +
            coalesce(col("h_mean"), lit(0.0)) +
            coalesce(col("dow_mean"), lit(0.0))), 4).as("yhat")): _*)
      .transform(d => Perf.sortedOnce(d, keys :+ col("ds"): _*))
  }

  /** `add_country_holidays` convenience (ProphetForecaster.py:161,
    * `country_holidays='CL'|'US'|'MX'`): derives the calendar span from
    * the data (one tiny aggregate over the checkpointed working set),
    * generates the country's deterministic calendar
    * ([[graft.functions.holidays]]), and runs the holiday-effects
    * forecast. */
  def forecastWithCountryHolidays(daily: DataFrame, keyCols: Seq[String], horizon: Int,
                                  country: String): DataFrame = {
    val d = daily.localCheckpoint()
    val bounds = d.agg(min(col("ds")).as("lo"), max(col("ds")).as("hi")).head()
    // empty input → min/max are null; an empty calendar keeps the whole
    // pipeline an empty frame (like the other forecast paths) instead
    // of NPE-ing on the null bounds
    val (loYear, hiYear) =
      if (bounds.isNullAt(0)) (1970, 1969)
      else (bounds.getDate(0).toLocalDate.getYear,
        bounds.getDate(1).toLocalDate.plusDays(horizon.toLong).getYear)
    val cal = graft.functions.holidays.calendar(d.sparkSession, country, loYear, hiYear)
    forecastWithHolidays(d, keyCols, horizon, cal)
  }

  /** `q35_forecast_holidays` — holiday-effects forecast of daily event
    * value per type, with day-of-month {1, 15} "payday" pseudo-holidays
    * (a deterministic rule both engines can derive — the harness's
    * stand-in for a country-holidays calendar; any (ds, holiday) frame
    * plugs in). */
  def forecastHolidays(spark: SparkSession, dir: String, horizon: Int = 7): DataFrame = {
    // checkpoint the daily aggregate FIRST: both the holiday-calendar
    // bounds and the forecast pipeline read it, and without this the
    // raw events scan would run once per consumer
    val daily = eventsDaily(spark, dir).localCheckpoint()
    // holiday calendar spanning history + horizon, from the daily bounds
    val holidays = daily
      .agg(min(col("ds")).as("lo"), max(col("ds")).as("hi"))
      .select(explode(sequence(col("lo"), date_add(col("hi"), horizon),
        expr("INTERVAL 1 DAY"))).as("ds"))
      .filter(dayofmonth(col("ds")).isin(1, 15))
      .withColumn("holiday", concat(lit("payday_"), dayofmonth(col("ds")).cast("string")))
    forecastWithHolidays(daily, Seq("event_type"), horizon, holidays)
  }

  // ---- general OLS path: Fourier seasonality + multiplicative mode ----

  /** Solve A·beta = rhs (A symmetric p×p as row-major array) by Gaussian
    * elimination with partial pivoting + a tiny ridge (1e-9 on the
    * diagonal) so near-singular designs stay deterministic. Runs per key
    * on ALREADY-AGGREGATED rows (one row per key) — the distributed work
    * is the Gram-sum aggregation; this scalar solve is O(p³) on p≤16. */
  private[operators] def solveDense(p: Int, gram: Seq[Double], rhs: Seq[Double]): Array[Double] = {
    val a = Array.ofDim[Double](p, p + 1)
    var i = 0
    while (i < p) {
      var j = 0
      while (j < p) { a(i)(j) = gram(i * p + j) + (if (i == j) 1e-9 else 0.0); j += 1 }
      a(i)(p) = rhs(i); i += 1
    }
    var c = 0
    while (c < p) {
      var piv = c; var r = c + 1
      while (r < p) { if (math.abs(a(r)(c)) > math.abs(a(piv)(c))) piv = r; r += 1 }
      val tmp = a(c); a(c) = a(piv); a(piv) = tmp
      r = c + 1
      while (r < p) {
        val f = if (a(c)(c) == 0.0) 0.0 else a(r)(c) / a(c)(c)
        var j = c
        while (j <= p) { a(r)(j) -= f * a(c)(j); j += 1 }
        r += 1
      }
      c += 1
    }
    val beta = new Array[Double](p)
    var r2 = p - 1
    while (r2 >= 0) {
      var s = a(r2)(p)
      var j = r2 + 1
      while (j < p) { s -= a(r2)(j) * beta(j); j += 1 }
      beta(r2) = if (a(r2)(r2) == 0.0) 0.0 else s / a(r2)(r2)
      r2 -= 1
    }
    beta
  }

  /** Fourier feature columns for period `period` and order `k` over a
    * continuous day index `t` — Prophet's seasonality basis
    * (sin/cos(2π·n·t/period), n=1..k). */
  private def fourier(t: Column, period: Double, k: Int): Seq[Column] =
    (1 to k).flatMap { n =>
      val w = 2.0 * math.Pi * n / period
      Seq(sin(t * lit(w)), cos(t * lit(w)))
    }

  /** Per-key OLS forecaster over trend + changepoints + weekly/yearly
    * Fourier seasonality (ProphetForecaster.py:152-163 custom/yearly
    * seasonality; `seasonality_mode` at :277; `n_changepoints` /
    * `changepoint_range` / `changepoint_prior_scale` at :281-285).
    *
    * Model: y ~ [1, x, (x−kᵢ)₊ᵢ≤cp, sin/cos(2πn·t/7)ₙ≤wk,
    * sin/cos(2πn·t/365.25)ₙ≤yr] where x = days since the key's first
    * observation (trend, well-conditioned) and t = days since epoch
    * (seasonality phase is calendar-anchored, consistent across keys).
    * The Gram matrix and moment vector are ONE distributed partial
    * aggregation (p(p+1)/2+p sums); the p×p solve runs per key on the
    * aggregated row via [[solveDense]] — no iteration, no collect, no
    * per-row UDF in the scan path.
    *
    * Changepoints (Prophet's piecewise-linear trend — the core trend
    * model every reference `forecast()` call gets implicitly): `cp`
    * hinge features (x − kᵢ)₊ at knots kᵢ evenly spaced over the first
    * `changepointRange` of EACH key's history — kᵢ = range·span·i/cp,
    * the closed-form twin of Prophet's `np.linspace` changepoint grid
    * over the first `changepoint_range` of the index. A series with a
    * trend break then extrapolates its FINAL slope (b_x + Σ hinge
    * coefficients), not the global average slope. `changepointRidge`
    * adds an L2 penalty on the hinge coefficients only (larger ridge →
    * stiffer trend), the ridge-regression analog of a SMALLER
    * `changepoint_prior_scale`; 0 = unpenalized exact OLS.
    *
    * `multiplicative=true` fits in log space (ln y = trend + seasonality
    * → y = e^trend · e^seasonality) — the closed-form equivalent of
    * Prophet's seasonality-scales-with-trend mode; requires y > 0 and
    * clamps at `logEps` below.
    *
    * Yearly 'auto' gate (Prophet's `yearly_seasonality='auto'`: yearly
    * terms are fit only when the history spans ≥ 2 years): keys with a
    * shorter span get their yearly features zeroed — an under-determined
    * yearly basis on a sub-year series otherwise extrapolates wildly.
    * The gate is per key and fully declarative (a `when` on the key's
    * observed span in DAYS), so mixed-span corpora fit in the same
    * single pass.
    *
    * JOINT fit surface (Prophet fits ONE model over every option at
    * once — `Prophet(**params)` at ProphetForecaster.py:267-356 — and
    * so does this basis):
    *  - `regressorCols` (`add_regressor`): the named input columns join
    *    the basis as-is — one coefficient each, fit jointly with trend
    *    and seasonality. Future values come from `futureReg`
    *    (keyCols + ds + regressor columns; missing values raise, the
    *    `_attach_regressors` ValueError analog) or default to the
    *    per-key historical mean.
    *  - `holidays` (ds DATE, holiday STRING — covering history AND
    *    horizon): each holiday NAME becomes a 0/1 indicator basis
    *    column, so holiday effects are fit jointly too. The name list
    *    is read driver-side (tiny bounded metadata, like the schema-CSV
    *    read); per-date membership stays a broadcast dimension join.
    *  - `freq`: D / W / MS / H — x counts periods, t stays in
    *    (fractional) days so Fourier periods keep their day units at
    *    any freq (at freq='H' add an extra (1.0, k) seasonality for
    *    hour-of-day cycles; the facade does this automatically).
    *  - `growth`: linear (default), flat (intercept-only basis, no
    *    changepoints), logistic (log-odds fit-space transform toward
    *    `cap` — see [[toFitSpace]]; exclusive with multiplicative).
    */
  def forecastFourier(daily: DataFrame, keyCols: Seq[String], horizon: Int,
                      weeklyOrder: Int = 2, yearlyOrder: Int = 3,
                      multiplicative: Boolean = false,
                      changepoints: Int = 0, changepointRange: Double = 0.8,
                      changepointRidge: Double = 0.0,
                      seasonalityRidge: Double = 0.0,
                      holidaysRidge: Double = 0.0,
                      extraSeasonalities: Seq[(Double, Int)] = Nil,
                      cap: Option[Double] = None, floor: Option[Double] = None,
                      includeIntervals: Boolean = false, intervalWidth: Double = 0.80,
                      includeHistory: Boolean = false,
                      nonNegative: Boolean = true,
                      freq: String = "D",
                      growth: String = "linear",
                      regressorCols: Seq[String] = Nil,
                      regressorRidge: Map[String, Double] = Map.empty,
                      futureReg: Option[DataFrame] = None,
                      holidays: Option[DataFrame] = None): DataFrame = {
    require(Set("D", "W", "MS", "H").contains(freq), s"freq must be D, W, MS or H, got $freq")
    require(Set("linear", "flat", "logistic").contains(growth),
      s"growth must be linear, flat or logistic, got $growth")
    require(changepoints >= 0, s"changepoints must be >= 0, got $changepoints")
    require(growth != "flat" || changepoints == 0,
      "growth='flat' has no trend slope for changepoints to bend")
    require(growth != "logistic" || cap.isDefined,
      "growth='logistic' needs a cap (the saturation level the log-odds transform fits toward)")
    require(growth != "logistic" || floor.getOrElse(0.0) < cap.get,
      s"growth='logistic' needs floor < cap, got floor=$floor cap=$cap")
    require(!(growth == "logistic" && multiplicative),
      "logistic growth and multiplicative seasonality are both fit-space transforms — pick one")
    require(extraSeasonalities.forall { case (per, k) => per > 0 && k > 0 },
      s"extra seasonalities need period > 0 and order > 0, got $extraSeasonalities")
    require(changepointRange > 0 && changepointRange <= 1,
      s"changepointRange must be in (0,1], got $changepointRange")
    require(futureReg.isEmpty || regressorCols.nonEmpty,
      "futureReg given but no regressorCols declared")
    require(seasonalityRidge >= 0 && holidaysRidge >= 0,
      s"ridge penalties must be >= 0, got $seasonalityRidge/$holidaysRidge")
    require(regressorRidge.keySet.subsetOf(regressorCols.toSet),
      s"regressorRidge names ${regressorRidge.keySet} must be declared regressors $regressorCols")
    require(regressorRidge.values.forall(_ >= 0),
      s"regressorRidge penalties must be >= 0, got $regressorRidge")
    val keys = keyCols.map(col)
    val wk = Window.partitionBy(keys: _*)
    val minYearlySpanDays = 730.0

    // holiday indicator dimension: names driver-side (bounded metadata),
    // per-date membership a broadcast (ds → name-set) join on BOTH the
    // history and the future spine
    val holNames: Seq[String] = holidays.fold(Seq.empty[String])(h =>
      h.select(col("holiday")).distinct().collect().map(_.getString(0)).toSeq.sorted)
    val holDim = holidays.map(h =>
      broadcast(h.groupBy(col("ds").as("_hds")).agg(collect_set(col("holiday")).as("_hset"))))
    def withHol(df: DataFrame): DataFrame = holDim.fold(df) { dim =>
      val key = if (freq == "H") to_date(col("ds")) else col("ds")
      df.join(dim, key === col("_hds"), "left").drop("_hds")
    }
    val holCols = if (holidays.isDefined) Seq(col("_hset")) else Nil

    val base = withHol(daily
      .withColumn("x", periodsSinceF(freq)(col("ds"), min(col("ds")).over(wk)))
      .withColumn("t", daysSinceEpochF(freq)(col("ds")))
      .withColumn("span", max(col("x")).over(wk))
      .withColumn("span_days", max(col("t")).over(wk) - min(col("t")).over(wk))
      .withColumn("yy", toFitSpace(col("y"), growth, multiplicative, cap, floor)))
      .localCheckpoint()

    // hinge knots are PER KEY (fractions of that key's span, in x/period
    // units), so mixed-history corpora fit in the same single pass
    def hinges(x: Column, span: Column): Seq[Column] =
      (1 to changepoints).map { i =>
        greatest(lit(0.0), x - lit(changepointRange * i / changepoints) * span)
      }
    // custom seasonalities (ProphetForecaster.py:321 `custom_
    // seasonalities` → add_seasonality(name, period, fourier_order)):
    // extra (period-days, order) Fourier blocks appended to the basis —
    // e.g. (30.5, 5) is Prophet's canonical monthly example.
    // Regressor and holiday-indicator features are frame-attribute
    // references, valid on any frame carrying those columns (base and
    // both spines do).
    def features(x: Column, t: Column, span: Column, yearlyGate: Column): Seq[Column] = {
      val trend = if (growth == "flat") Seq(lit(1.0)) else Seq(lit(1.0), x)
      trend ++ hinges(x, span) ++ fourier(t, 7.0, weeklyOrder) ++
        fourier(t, 365.25, yearlyOrder).map(_ * yearlyGate) ++
        extraSeasonalities.flatMap { case (per, k) => fourier(t, per, k) } ++
        regressorCols.map(qcol) ++
        holNames.map(n => when(col("_hset").isNotNull &&
          array_contains(col("_hset"), lit(n)), lit(1.0)).otherwise(lit(0.0)))
    }
    val trendLen = if (growth == "flat") 1 else 2
    val p = trendLen + changepoints + 2 * weeklyOrder + 2 * yearlyOrder +
      2 * extraSeasonalities.map(_._2).sum + regressorCols.size + holNames.size
    val gate = when(col("span_days") >= minYearlySpanDays, lit(1.0)).otherwise(lit(0.0))
    val f = features(col("x"), col("t"), col("span"), gate)

    // Gram sums: upper triangle mirrored row-major + moment vector —
    // all plain `sum()` aggregates, partial map-side, one shuffle.
    // Per-key regressor means ride the same aggregate (the default
    // future-regressor policy, zero extra passes).
    val gramCols = for (i <- 0 until p; j <- 0 until p) yield
      sum(f(math.min(i, j)) * f(math.max(i, j))).as(s"g_${i}_$j")
    val rhsCols = (0 until p).map(i => sum(f(i) * col("yy")).as(s"m_$i"))
    val regMeanCols = regressorCols.map(rc => avg(qcol(rc)).as(s"_rm_$rc"))
    val fit = base.groupBy(keys: _*)
      .agg(gramCols.head, (gramCols.tail ++ rhsCols ++
        Seq(max(col("x")).as("xmax"), max(col("ds")).as("maxds"),
          max(col("span_days")).as("span_days")) ++ regMeanCols): _*)

    // block-structured ridge on the diagonal, mirroring Prophet's prior
    // structure: flat prior on trend (k/m — never penalized), Laplace
    // prior on the changepoint deltas (`changepointRidge`), and normal
    // priors on the seasonality and holiday blocks
    // (`seasonalityRidge`/`holidaysRidge` — the
    // seasonality_prior_scale / holidays_prior_scale analogs at
    // ProphetForecaster.py:282-283; a LARGER ridge is a SMALLER prior
    // scale, shrinking that block's effects toward zero). Regressor
    // coefficients take a PER-NAME ridge (`regressorRidge` — the
    // per-regressor add_regressor(prior_scale=...) analog); unlisted
    // regressors stay unpenalized like the trend.
    val hingeIdx = (trendLen until trendLen + changepoints).toSet
    val seasLen = 2 * weeklyOrder + 2 * yearlyOrder +
      2 * extraSeasonalities.map(_._2).sum
    val seasIdx = (trendLen + changepoints until trendLen + changepoints + seasLen).toSet
    val regStart = p - holNames.size - regressorCols.size
    val holIdx = (p - holNames.size until p).toSet
    def diagRidge(i: Int): Double =
      (if (hingeIdx(i)) changepointRidge else 0.0) +
        (if (seasIdx(i)) seasonalityRidge else 0.0) +
        (if (i >= regStart && i < p - holNames.size)
          regressorRidge.getOrElse(regressorCols(i - regStart), 0.0) else 0.0) +
        (if (holIdx(i)) holidaysRidge else 0.0)
    val solve = udf((gram: Seq[Double], rhs: Seq[Double]) => solveDense(p, gram, rhs))
    val betas = fit.withColumn("beta", solve(
        array((for (i <- 0 until p; j <- 0 until p) yield {
          val g = col(s"g_${i}_$j")
          if (i == j && diagRidge(i) > 0.0) g + lit(diagRidge(i)) else g
        }): _*),
        array((0 until p).map(i => col(s"m_$i")): _*)))
      .select(keys ++ Seq(col("beta"), col("xmax"), col("maxds"), col("span_days")) ++
        regressorCols.map(rc => qcol(s"_rm_$rc")): _*)

    // span == max(x) per key == xmax on the future spine, so the same
    // yearly gate and hinge knots apply there; beyond the last knot
    // every hinge is active, so the extrapolated slope is the FINAL
    // regime's slope
    val futCore = betas
      .select(keys ++ Seq(col("xmax"), col("maxds"), col("span_days")) ++
        regressorCols.map(rc => qcol(s"_rm_$rc")) ++
        Seq(explode(sequence(lit(1), lit(horizon))).as("h")): _*)
      .withColumn("ds", stepForwardF(freq)(col("maxds"), col("h")))
      .withColumn("x", col("xmax") + col("h"))
      .withColumn("t", daysSinceEpochF(freq)(col("ds")))
      .withColumn("span", col("xmax"))
    // future regressor values: caller-supplied frame (missing values
    // fail loudly, as the reference does) or the per-key historical mean
    val futWithReg =
      if (regressorCols.isEmpty) futCore
      else futureReg match {
        case Some(fr) =>
          val joined = futCore.join(
            fr.select((keyCols :+ "ds").map(col) ++ regressorCols.map(qcol): _*),
            keyCols :+ "ds", "left")
          regressorCols.foldLeft(joined)((acc, rc) =>
            acc.withColumn(rc, when(qcol(rc).isNull,
              raise_error(concat(
                lit(s"forecastFourier: missing future value for regressor '$rc' at ds="),
                col("ds").cast("string")))).otherwise(qcol(rc))))
        case None =>
          regressorCols.foldLeft(futCore)((acc, rc) => acc.withColumn(rc, qcol(s"_rm_$rc")))
      }
    val spineCols = Seq(col("ds"), col("x"), col("t"), col("span"), col("span_days")) ++
      regressorCols.map(qcol) ++ holCols
    val futSpine = withHol(futWithReg).select(keys ++ spineCols: _*)
    // include_history: fitted values over the observed spine, same basis
    val spine =
      if (includeHistory) base.select(keys ++ spineCols: _*).unionByName(futSpine)
      else futSpine

    def dotOver: Column = {
      val g = when(col("span_days") >= minYearlySpanDays, lit(1.0)).otherwise(lit(0.0))
      features(col("x"), col("t"), col("span"), g).zipWithIndex
        .map { case (c, i) => element_at(col("beta"), i + 1) * c }
        .reduce(_ + _)
    }
    val pred = spine
      .join(betas.select(keys :+ col("beta"): _*), keyCols)
      .withColumn("fitdot", dotOver)
    def toY(d: Column): Column = fromFitSpace(d, growth, multiplicative, cap, floor)

    val out =
      if (!includeIntervals) {
        pred.select(keys ++ Seq(col("ds"),
          round(bounded(toY(col("fitdot")), cap, floor, nonNegative), 4).as("yhat")): _*)
      } else {
        // σ = per-key stddev of residuals in FIT space (log space under
        // multiplicative, log-odds under logistic — bands transform
        // through the monotone inverse, staying positive / inside the
        // bounds and asymmetric exactly like a log-normal / logit-normal
        // interval); one extra aggregate over the checkpointed set.
        val z = intervalZ(intervalWidth)
        val sigma = base
          .join(betas.select(keys :+ col("beta"): _*), keyCols)
          .withColumn("fitdot", dotOver)
          .groupBy(keys: _*)
          .agg(coalesce(stddev_samp(col("yy") - col("fitdot")), lit(0.0)).as("sigma"))
        pred.join(sigma, keyCols)
          .select(keys ++ Seq(col("ds"),
            round(bounded(toY(col("fitdot")), cap, floor, nonNegative), 4).as("yhat"),
            round(bounded(toY(col("fitdot") - lit(z) * col("sigma")), cap, floor, nonNegative), 4).as("yhat_lower"),
            round(bounded(toY(col("fitdot") + lit(z) * col("sigma")), cap, floor, nonNegative), 4).as("yhat_upper")): _*)
      }
    Perf.sortedOnce(out, keys :+ col("ds"): _*)
  }

  /** `q19_forecast_yearly` — Fourier-seasonality forecast of daily event
    * value per event_type (weekly order 2 + yearly order 3, additive).
    * Rows-only at the driver (the per-key dense solve is not
    * ANSI-SQL-expressible); ForecastSpec verifies recovery of planted
    * trend+sinusoid series in both additive and multiplicative modes. */
  def forecastYearly(spark: SparkSession, dir: String, horizon: Int = 14): DataFrame =
    forecastFourier(eventsDaily(spark, dir), Seq("event_type"), horizon)

  /** `q82_forecast_planted` — the PLANTED-COEFFICIENT certification of
    * the general dense-solve path ([[forecastFourier]] +
    * [[solveDense]]) that q19 and q43 run on real data: three series
    * are generated NOISELESSLY from explicit (intercept, slope,
    * changepoint-delta, weekly-Fourier, regressor) coefficients, the
    * production pipeline fits them (trend + 1 hinge + weekly order-2 +
    * gated yearly + external regressor — the full joint basis, p=14),
    * and because the truth lies exactly in the basis span, OLS must
    * reproduce it. The per-key Gaussian-elimination solve itself is
    * not ANSI-SQL-expressible, but the CONTRACT is: the oracle
    * regenerates `y_true` from the same closed-form formula (identical
    * float expression trees) and pins `recovered_ok` TRUE — a
    * hash-mismatch fires if the solver's output drifts more than 1e-3
    * from the planted truth at ANY of the 402 fitted/forecast points.
    * (Direct 4-dp hashing of yhat would be flaky: the solve carries
    * ~1e-9 ridge + elimination error, enough to straddle a rounding
    * boundary occasionally; the tolerance-boolean keeps the check
    * discrete and robust while still oracle-backing the solve.) */
  def forecastPlanted(spark: SparkSession, dir: String, horizon: Int = 14): DataFrame = {
    import spark.implicits._
    val n = 120
    val coefs = Seq(
      ("a", 120.0, 0.8, -1.5, 10.0, 6.0, -4.0, 2.5, 5.0),
      ("b", 80.0, -0.4, 1.2, -7.0, 3.5, 2.0, -5.5, -3.0),
      ("c", 200.0, 1.6, -2.4, 4.0, -9.0, 6.5, 1.0, 8.0)
    ).toDF("grp", "c0", "c1", "c2", "a1", "b1", "a2", "b2", "rc")
    // full spine: history x ∈ [0, n) plus horizon x ∈ [n, n+horizon)
    val spine = coefs
      .select(col("grp"), col("c0"), col("c1"), col("c2"), col("a1"), col("b1"),
        col("a2"), col("b2"), col("rc"),
        explode(sequence(lit(0), lit(n - 1 + horizon))).as("xi"))
      .withColumn("ds", date_add(lit(java.sql.Date.valueOf("2025-01-01")), col("xi")))
      .withColumn("x", col("xi").cast("double"))
      .withColumn("t", datediff(col("ds"), lit(java.sql.Date.valueOf("1970-01-01"))).cast("double"))
    // the planted formula — every constant mirrors the operator's own
    // float arithmetic (knot = fl(0.8)·fl(119), ω = fl(2π/period)) so
    // the DuckDB twin can reproduce bit-compatible doubles
    val w1 = 2.0 * math.Pi / 7.0
    val w2 = 2.0 * math.Pi * 2.0 / 7.0
    val wr = 2.0 * math.Pi / 30.5
    val truthed = spine
      .withColumn("reg", sin(col("t") * lit(wr)))
      .withColumn("y_true",
        col("c0") + col("c1") * col("x") +
          col("c2") * greatest(lit(0.0), col("x") - lit(0.8) * lit((n - 1).toDouble)) +
          col("a1") * sin(col("t") * lit(w1)) + col("b1") * cos(col("t") * lit(w1)) +
          col("a2") * sin(col("t") * lit(w2)) + col("b2") * cos(col("t") * lit(w2)) +
          col("rc") * col("reg"))
      .localCheckpoint()
    val hist = truthed.filter(col("xi") < n)
      .select(col("grp"), col("ds"), col("y_true").as("y"), col("reg"))
    val futR = truthed.filter(col("xi") >= n).select(col("grp"), col("ds"), col("reg"))
    val out = forecastFourier(hist, Seq("grp"), horizon,
      weeklyOrder = 2, yearlyOrder = 3, changepoints = 1,
      regressorCols = Seq("reg"), futureReg = Some(futR), includeHistory = true)
    out.join(truthed.select(col("grp"), col("ds"), col("y_true")), Seq("grp", "ds"))
      .select(col("grp"), col("ds"), round(col("y_true"), 4).as("y_true"),
        (abs(col("yhat") - col("y_true")) < 0.001).as("recovered_ok"))
      .transform(d => Perf.sortedOnce(d, col("grp"), col("ds")))
  }

  /** `q83_forecast_planted_mult` — [[forecastPlanted]]'s twin for the
    * MULTIPLICATIVE (log-fit-space) mode, the one dense-solve path q82
    * leaves uncertified: the planted truth is y = exp(trend + hinge +
    * weekly Fourier + regressor) with log-scale coefficients, the
    * production pipeline fits ln y and transforms back through
    * [[fromFitSpace]], and exact log-space recovery means yhat must
    * match the planted truth to RELATIVE 1e-4 at every point (the
    * fit-space transform turns additive solve error into relative
    * output error, so the tolerance is relative where q82's is
    * absolute). Oracle: same closed-form regeneration + pinned flag. */
  def forecastPlantedMult(spark: SparkSession, dir: String, horizon: Int = 14): DataFrame = {
    import spark.implicits._
    val n = 120
    val coefs = Seq(
      ("a", 4.2, 0.010, -0.004, 0.12, 0.07, -0.05, 0.03, 0.08),
      ("b", 3.8, -0.006, 0.009, -0.09, 0.04, 0.02, -0.06, -0.05),
      ("c", 4.6, 0.016, -0.008, 0.05, -0.11, 0.07, 0.01, 0.10)
    ).toDF("grp", "c0", "c1", "c2", "a1", "b1", "a2", "b2", "rc")
    val spine = coefs
      .select(col("grp"), col("c0"), col("c1"), col("c2"), col("a1"), col("b1"),
        col("a2"), col("b2"), col("rc"),
        explode(sequence(lit(0), lit(n - 1 + horizon))).as("xi"))
      .withColumn("ds", date_add(lit(java.sql.Date.valueOf("2025-01-01")), col("xi")))
      .withColumn("x", col("xi").cast("double"))
      .withColumn("t", datediff(col("ds"), lit(java.sql.Date.valueOf("1970-01-01"))).cast("double"))
    val w1 = 2.0 * math.Pi / 7.0
    val w2 = 2.0 * math.Pi * 2.0 / 7.0
    val wr = 2.0 * math.Pi / 30.5
    val truthed = spine
      .withColumn("reg", sin(col("t") * lit(wr)))
      .withColumn("y_true", exp(
        col("c0") + col("c1") * col("x") +
          col("c2") * greatest(lit(0.0), col("x") - lit(0.8) * lit((n - 1).toDouble)) +
          col("a1") * sin(col("t") * lit(w1)) + col("b1") * cos(col("t") * lit(w1)) +
          col("a2") * sin(col("t") * lit(w2)) + col("b2") * cos(col("t") * lit(w2)) +
          col("rc") * col("reg")))
      .localCheckpoint()
    val hist = truthed.filter(col("xi") < n)
      .select(col("grp"), col("ds"), col("y_true").as("y"), col("reg"))
    val futR = truthed.filter(col("xi") >= n).select(col("grp"), col("ds"), col("reg"))
    val out = forecastFourier(hist, Seq("grp"), horizon,
      weeklyOrder = 2, yearlyOrder = 3, changepoints = 1, multiplicative = true,
      regressorCols = Seq("reg"), futureReg = Some(futR), includeHistory = true)
    out.join(truthed.select(col("grp"), col("ds"), col("y_true")), Seq("grp", "ds"))
      .select(col("grp"), col("ds"), round(col("y_true"), 4).as("y_true"),
        (abs(col("yhat") / col("y_true") - 1.0) < 1e-4).as("recovered_ok"))
      .transform(d => Perf.sortedOnce(d, col("grp"), col("ds")))
  }

  /** Shared 4×4 Cramer formula trees for the ORACLE-EXPRESSIBLE joint
    * slice: one structural definition rendered to Spark `Column`s and
    * to DuckDB SQL (fully parenthesized), so both engines execute
    * bit-identical float expression trees — the q18/q38 3×3 convention
    * one dimension up. A Gaussian-elimination solve could never
    * hash-match an oracle; an explicitly shared Cramer tree can.
    *
    * Basis [1, x, r, h] over the Gram-sum names
    * n/sx/sr/sh/sxx/sxr/sxh/srr/srh/shh and moments sy/sxy/sry/shy —
    * the caller aggregates those columns; [[det]] and [[num]] are the
    * Cramer denominator and per-coefficient numerators over them. */
  private[graft] object Cramer4 {
    trait Alg[T] {
      def v(name: String): T
      def mul(a: T, b: T): T
      def sub(a: T, b: T): T
      def add(a: T, b: T): T
    }
    object ColAlg extends Alg[Column] {
      def v(name: String): Column = col(name)
      def mul(a: Column, b: Column): Column = a * b
      def sub(a: Column, b: Column): Column = a - b
      def add(a: Column, b: Column): Column = a + b
    }
    object SqlAlg extends Alg[String] {
      def v(name: String): String = name
      def mul(a: String, b: String): String = s"($a * $b)"
      def sub(a: String, b: String): String = s"($a - $b)"
      def add(a: String, b: String): String = s"($a + $b)"
    }
    private val g = Vector(
      Vector("n",  "sx",  "sr",  "sh"),
      Vector("sx", "sxx", "sxr", "sxh"),
      Vector("sr", "sxr", "srr", "srh"),
      Vector("sh", "sxh", "srh", "shh"))
    private val rhs = Vector("sy", "sxy", "sry", "shy")

    // a(ei − fh) − b(di − fg) + c(dh − eg) — exactly the q18 det3 tree
    private def det3[T](alg: Alg[T])(m: Vector[Vector[T]]): T = {
      import alg._
      add(
        sub(
          mul(m(0)(0), sub(mul(m(1)(1), m(2)(2)), mul(m(1)(2), m(2)(1)))),
          mul(m(0)(1), sub(mul(m(1)(0), m(2)(2)), mul(m(1)(2), m(2)(0))))),
        mul(m(0)(2), sub(mul(m(1)(0), m(2)(1)), mul(m(1)(1), m(2)(0)))))
    }
    private def minor[T](m: Vector[Vector[T]], colIdx: Int): Vector[Vector[T]] =
      m.tail.map(r => r.zipWithIndex.collect { case (x, j) if j != colIdx => x })
    // first-row cofactor expansion: t0 − t1 + t2 − t3, left-associated
    private def det4[T](alg: Alg[T])(m: Vector[Vector[T]]): T = {
      import alg._
      val t = (0 until 4).map(j => mul(m(0)(j), det3(alg)(minor(m, j))))
      sub(add(sub(t(0), t(1)), t(2)), t(3))
    }
    private def mat[T](alg: Alg[T])(names: Vector[Vector[String]]): Vector[Vector[T]] =
      names.map(_.map(alg.v))

    /** Cramer denominator det(G). */
    def det[T](alg: Alg[T]): T = det4(alg)(mat(alg)(g))
    /** Cramer numerator for coefficient `i` (column i ← moment vector). */
    def num[T](alg: Alg[T], i: Int): T =
      det4(alg)(mat(alg)(g.indices.map { r =>
        g(r).indices.map(c => if (c == i) rhs(r) else g(r)(c)).toVector
      }.toVector))
  }

  /** The q43-SHAPED 5×5 Cramer system (round 12): basis
    * [1, x, s, c, r] — trend, the weekly Fourier PAIR, and an external
    * regressor fit JOINTLY, Prophet's
    * `forecast(regressor=..., weekly_seasonality=...)` combination as
    * one normal-equation solve. Same structural-definition trick as
    * [[Cramer4]]: ONE recursion renders the determinant and the five
    * numerators into Column trees and into fully-parenthesized SQL, so
    * the two engines run the IDENTICAL float expression tree. The
    * recursion reproduces Cramer4's association exactly (cofactor
    * terms fold left as ((t0−t1)+t2)−t3…), so sizes 3 and 4 are the
    * proven q18/q44 trees and size 5 is their natural extension. */
  /** Generic Cramer-tree builder over a NAMED symmetric Gram matrix and
    * moment vector (round 12): one cofactor-expansion recursion renders
    * the determinant and per-coefficient numerators into whatever the
    * algebra targets (Column trees or parenthesized SQL), with the
    * proven Cramer4 associations (terms fold left as
    * ((t0−t1)+t2)−t3…). [[Cramer5]] and [[Cramer6]] are instances. */
  private[graft] class CramerTrees(g: Vector[Vector[String]],
                                   rhs: Vector[String]) {
    import Cramer4.Alg

    /** The Gram-matrix / moment-vector NAME grids, row-major — the
      * exact child order [[graft.expressions.CramerSolve]] consumes
      * (r20: q133 evaluates these trees in the compiled kernel instead
      * of a 3.3 MB codegen projection; the SQL renderings below stay
      * the oracle's side of the contract). */
    def gramNames: Vector[Vector[String]] = g
    def rhsNames: Vector[String] = rhs

    private def detRec[T](alg: Alg[T])(m: Vector[Vector[T]]): T = {
      import alg._
      if (m.size == 2) sub(mul(m(0)(0), m(1)(1)), mul(m(0)(1), m(1)(0)))
      else {
        val terms = m(0).indices.map { j =>
          mul(m(0)(j), detRec(alg)(
            m.tail.map(r => r.zipWithIndex.collect { case (x, jj) if jj != j => x })))
        }
        terms.zipWithIndex.tail.foldLeft(terms.head) { case (acc, (t, i)) =>
          if (i % 2 == 1) alg.sub(acc, t) else alg.add(acc, t)
        }
      }
    }
    private def mat[T](alg: Alg[T])(names: Vector[Vector[String]]): Vector[Vector[T]] =
      names.map(_.map(alg.v))

    /** Cramer denominator det(G) over the Gram-sum names. */
    def det[T](alg: Alg[T]): T = detRec(alg)(mat(alg)(g))
    /** Cramer numerator for coefficient `i` (column i ← moment vector). */
    def num[T](alg: Alg[T], i: Int): T =
      detRec(alg)(mat(alg)(g.indices.map { r =>
        g(r).indices.map(c => if (c == i) rhs(r) else g(r)(c)).toVector
      }.toVector))
  }

  private[graft] object Cramer5 extends CramerTrees(
    Vector(
      Vector("n",  "sx",  "ss",  "sc",  "sr"),
      Vector("sx", "sxx", "sxs", "sxc", "sxr"),
      Vector("ss", "sxs", "sss", "ssc", "ssr"),
      Vector("sc", "sxc", "ssc", "scc", "scr"),
      Vector("sr", "sxr", "ssr", "scr", "srr")),
    Vector("sy", "sxy", "ssy", "scy", "sry"))

  /** The q19 SHAPE's 6×6 system: basis [1, x, s, c, u, v] — trend plus
    * the weekly (s, c) AND yearly (u, v) Fourier pairs fit JOINTLY,
    * Prophet's `weekly_seasonality + yearly_seasonality` combination as
    * one normal-equation solve. */
  private[graft] object Cramer6 extends CramerTrees(
    Vector(
      Vector("n",  "sx",  "ss",  "sc",  "su",  "sv"),
      Vector("sx", "sxx", "sxs", "sxc", "sxu", "sxv"),
      Vector("ss", "sxs", "sss", "ssc", "ssu", "ssv"),
      Vector("sc", "sxc", "ssc", "scc", "scu", "scv"),
      Vector("su", "sxu", "ssu", "scu", "suu", "suv"),
      Vector("sv", "sxv", "ssv", "scv", "suv", "svv")),
    Vector("sy", "sxy", "ssy", "scy", "suy", "svy"))

  /** `q129_forecast_joint_cramer5` — the q43 SHAPE made oracle-backed:
    * y ~ b0 + b1·x + b2·sin(2πx/7) + b3·cos(2πx/7) + b4·r per key —
    * trend, weekly Fourier seasonality, and an external regressor in
    * ONE joint 5×5 solve ([[Cramer5]] renders identical formula trees
    * into this plan and into the DuckDB oracle, so the driver
    * hash-checks a genuinely joint Fourier+regressor fit — the
    * combination q43 runs through the general dense-solve path, which
    * stays rows-only because an LU solve is not ANSI-expressible).
    * No day-of-week residual means here: the Fourier pair IS the
    * weekly seasonality (adding dow means would double-count it).
    * Degenerate systems fall back to the trend-only 2-parameter fit
    * behind the q44 relative-determinant guard, mirrored in the SQL. */
  def forecastJointCramer5(spark: SparkSession, dir: String, horizon: Int = 7): DataFrame = {
    val t = Tables(spark, dir)
    val daily = t.events
      .groupBy(col("event_type"), to_date(col("ts")).as("ds"))
      .agg(sum(col("value")).as("y"), count(lit(1)).cast("double").as("r"))
    forecastJointCramer5Frame(daily, Seq("event_type"), horizon)
  }

  /** Frame-level 5×5 joint fit over any (keyCols, ds, y, r) daily
    * frame — the Fourier columns derive from x inside, so the future
    * spine re-derives them the same way (the oracle-shared rule). */
  def forecastJointCramer5Frame(daily: DataFrame, keyCols: Seq[String],
                                horizon: Int): DataFrame = {
    import Cramer4.ColAlg
    val keys = keyCols.map(col)
    val wk = Window.partitionBy(keys: _*)
    val omega = 2.0 * math.Pi / 7.0
    val wx = daily
      .withColumn("x", datediff(col("ds"), min(col("ds")).over(wk)).cast("double"))
      .withColumn("s", sin(col("x") * lit(omega)))
      .withColumn("c", cos(col("x") * lit(omega)))
      .localCheckpoint()
    val sums = wx.groupBy(keys: _*).agg(
      count(lit(1)).cast("double").as("n"),
      sum(col("x")).as("sx"), sum(col("s")).as("ss"),
      sum(col("c")).as("sc"), sum(col("r")).as("sr"),
      sum(col("x") * col("x")).as("sxx"), sum(col("x") * col("s")).as("sxs"),
      sum(col("x") * col("c")).as("sxc"), sum(col("x") * col("r")).as("sxr"),
      sum(col("s") * col("s")).as("sss"), sum(col("s") * col("c")).as("ssc"),
      sum(col("s") * col("r")).as("ssr"),
      sum(col("c") * col("c")).as("scc"), sum(col("c") * col("r")).as("scr"),
      sum(col("r") * col("r")).as("srr"),
      sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
      sum(col("s") * col("y")).as("ssy"), sum(col("c") * col("y")).as("scy"),
      sum(col("r") * col("y")).as("sry"),
      max(col("x")).as("xmax"), max(col("ds")).as("maxds"),
      avg(col("r")).as("rmean"))
    val betas = sums
      .withColumn("det", Cramer5.det(ColAlg))
      .withColumn("degen",
        abs(col("det")) <= lit(1e-9) *
          abs(col("n") * col("sxx") * col("sss") * col("scc") * col("srr")))
      .withColumn("den2", col("n") * col("sxx") - col("sx") * col("sx"))
      .withColumn("b1f", when(abs(col("den2")) > lit(0.0),
        (col("n") * col("sxy") - col("sx") * col("sy")) / col("den2")).otherwise(lit(0.0)))
      .withColumn("b0f", (col("sy") - col("b1f") * col("sx")) / col("n"))
      .withColumn("b0", when(col("degen"), col("b0f"))
        .otherwise(Cramer5.num(ColAlg, 0) / col("det")))
      .withColumn("b1", when(col("degen"), col("b1f"))
        .otherwise(Cramer5.num(ColAlg, 1) / col("det")))
      .withColumn("b2", when(col("degen"), lit(0.0))
        .otherwise(Cramer5.num(ColAlg, 2) / col("det")))
      .withColumn("b3", when(col("degen"), lit(0.0))
        .otherwise(Cramer5.num(ColAlg, 3) / col("det")))
      .withColumn("b4", when(col("degen"), lit(0.0))
        .otherwise(Cramer5.num(ColAlg, 4) / col("det")))
      .select(keys ++ Seq(col("b0"), col("b1"), col("b2"), col("b3"), col("b4"),
        col("xmax"), col("maxds"), col("rmean")): _*)
    betas
      .select(keys ++ Seq(col("b0"), col("b1"), col("b2"), col("b3"), col("b4"),
        col("xmax"), col("maxds"), col("rmean"),
        explode(sequence(lit(1), lit(horizon))).as("hz")): _*)
      .withColumn("ds", date_add(col("maxds"), col("hz")))
      .withColumn("x", col("xmax") + col("hz"))
      .withColumn("s", sin(col("x") * lit(omega)))
      .withColumn("c", cos(col("x") * lit(omega)))
      .select(keys ++ Seq(
        col("ds"),
        round(greatest(lit(0.0),
          col("b0") + col("b1") * col("x") + col("b2") * col("s") +
            col("b3") * col("c") + col("b4") * col("rmean")), 4).as("yhat")): _*)
      .transform(d => Perf.sortedOnce(d, keys :+ col("ds"): _*))
  }

  /** `q133_forecast_joint_cramer6` — the q19 SHAPE made oracle-backed
    * (round 12, one size past q129): y ~ b0 + b1·x + b2·sin(2πx/7) +
    * b3·cos(2πx/7) + b4·sin(2πx/365.25) + b5·cos(2πx/365.25) per key —
    * trend, weekly AND yearly Fourier seasonality fit JOINTLY in one
    * 6×6 solve. [[Cramer6]] renders identical formula trees into this
    * plan and into the DuckDB oracle, so the driver hash-checks a
    * genuinely joint two-period Fourier fit — the combination q19 runs
    * through the general dense-solve path (which stays rows-only: an
    * LU solve is not ANSI-expressible). The events span (~16 months)
    * covers more than one yearly period, so the yearly pair is
    * identified. Degenerate systems fall back to the trend-only fit
    * behind the q44/q129 relative-determinant guard, mirrored in the
    * SQL. */
  def forecastJointCramer6(spark: SparkSession, dir: String, horizon: Int = 7): DataFrame = {
    val t = Tables(spark, dir)
    val daily = t.events
      .groupBy(col("event_type"), to_date(col("ts")).as("ds"))
      .agg(sum(col("value")).as("y"))
    forecastJointCramer6Frame(daily, Seq("event_type"), horizon)
  }

  /** Frame-level 6×6 joint fit over any (keyCols, ds, y) daily frame —
    * both Fourier pairs derive from x inside, so the future spine
    * re-derives them the same way (the oracle-shared rule). */
  def forecastJointCramer6Frame(daily: DataFrame, keyCols: Seq[String],
                                horizon: Int): DataFrame = {
    val keys = keyCols.map(col)
    val wk = Window.partitionBy(keys: _*)
    val omegaW = 2.0 * math.Pi / 7.0
    val omegaY = 2.0 * math.Pi / 365.25
    val wx = daily
      .withColumn("x", datediff(col("ds"), min(col("ds")).over(wk)).cast("double"))
      .withColumn("s", sin(col("x") * lit(omegaW)))
      .withColumn("c", cos(col("x") * lit(omegaW)))
      .withColumn("u", sin(col("x") * lit(omegaY)))
      .withColumn("v", cos(col("x") * lit(omegaY)))
      .localCheckpoint()
    val prods = Seq(
      "sx" -> ("x", None), "ss" -> ("s", None), "sc" -> ("c", None),
      "su" -> ("u", None), "sv" -> ("v", None),
      "sxx" -> ("x", Some("x")), "sxs" -> ("x", Some("s")), "sxc" -> ("x", Some("c")),
      "sxu" -> ("x", Some("u")), "sxv" -> ("x", Some("v")),
      "sss" -> ("s", Some("s")), "ssc" -> ("s", Some("c")),
      "ssu" -> ("s", Some("u")), "ssv" -> ("s", Some("v")),
      "scc" -> ("c", Some("c")), "scu" -> ("c", Some("u")), "scv" -> ("c", Some("v")),
      "suu" -> ("u", Some("u")), "suv" -> ("u", Some("v")),
      "svv" -> ("v", Some("v")),
      "sy" -> ("y", None), "sxy" -> ("x", Some("y")), "ssy" -> ("s", Some("y")),
      "scy" -> ("c", Some("y")), "suy" -> ("u", Some("y")), "svy" -> ("v", Some("y")))
    val aggs =
      count(lit(1)).cast("double").as("n") +:
        prods.map { case (name, (a, b)) =>
          sum(b.fold(col(a))(bb => col(a) * col(bb))).as(name)
        } :+ max(col("x")).as("xmax") :+ max(col("ds")).as("maxds")
    val sums = wx.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
    // r20 (q133): det + six numerators through the compiled
    // [[graft.expressions.CramerSolve]] kernel — the SAME cofactor
    // trees ([[Cramer6]]) evaluated in Scala, bit-identical
    // (CramerSpec pins it against the Column rendering), instead of a
    // 3.3 MB whole-stage-codegen projection that paid seconds of
    // Janino compilation per run for ~35 rows. The SQL rendering of
    // the same trees stays the oracle's side of the contract.
    val solved = call_function("graft_cramer_solve",
      (Cramer6.gramNames.flatten ++ Cramer6.rhsNames).map(col): _*)
    val betas = sums
      .withColumn("_cs", solved)
      .withColumn("det", col("_cs").getItem(0))
      .withColumn("degen",
        abs(col("det")) <= lit(1e-9) *
          abs(col("n") * col("sxx") * col("sss") * col("scc") * col("suu") * col("svv")))
      .withColumn("den2", col("n") * col("sxx") - col("sx") * col("sx"))
      .withColumn("b1f", when(abs(col("den2")) > lit(0.0),
        (col("n") * col("sxy") - col("sx") * col("sy")) / col("den2")).otherwise(lit(0.0)))
      .withColumn("b0f", (col("sy") - col("b1f") * col("sx")) / col("n"))
      .withColumn("b0", when(col("degen"), col("b0f"))
        .otherwise(col("_cs").getItem(1) / col("det")))
      .withColumn("b1", when(col("degen"), col("b1f"))
        .otherwise(col("_cs").getItem(2) / col("det")))
      .withColumn("b2", when(col("degen"), lit(0.0))
        .otherwise(col("_cs").getItem(3) / col("det")))
      .withColumn("b3", when(col("degen"), lit(0.0))
        .otherwise(col("_cs").getItem(4) / col("det")))
      .withColumn("b4", when(col("degen"), lit(0.0))
        .otherwise(col("_cs").getItem(5) / col("det")))
      .withColumn("b5", when(col("degen"), lit(0.0))
        .otherwise(col("_cs").getItem(6) / col("det")))
      .select(keys ++ Seq(col("b0"), col("b1"), col("b2"), col("b3"), col("b4"),
        col("b5"), col("xmax"), col("maxds")): _*)
    betas
      .select(keys ++ Seq(col("b0"), col("b1"), col("b2"), col("b3"), col("b4"),
        col("b5"), col("xmax"), col("maxds"),
        explode(sequence(lit(1), lit(horizon))).as("hz")): _*)
      .withColumn("ds", date_add(col("maxds"), col("hz")))
      .withColumn("x", col("xmax") + col("hz"))
      .withColumn("s", sin(col("x") * lit(omegaW)))
      .withColumn("c", cos(col("x") * lit(omegaW)))
      .withColumn("u", sin(col("x") * lit(omegaY)))
      .withColumn("v", cos(col("x") * lit(omegaY)))
      .select(keys ++ Seq(
        col("ds"),
        round(greatest(lit(0.0),
          col("b0") + col("b1") * col("x") + col("b2") * col("s") +
            col("b3") * col("c") + col("b4") * col("u") + col("b5") * col("v")),
          4).as("yhat")): _*)
      .transform(d => Perf.sortedOnce(d, keys :+ col("ds"): _*))
  }

  /** `q44_forecast_joint_cramer` — the ORACLE-EXPRESSIBLE slice of the
    * joint surface (B11): y ~ b0 + b1·x + b2·r + b3·I(payday) per key —
    * an external regressor AND a holiday indicator fit JOINTLY in one
    * 4×4 normal-equation solve ([[Cramer4]] renders the identical
    * formula trees into this plan and into the DuckDB oracle, so the
    * driver hash-checks the joint fit, not just row counts). Degenerate
    * systems (constant indicator, collinear regressor) fall back to the
    * trend-only 2-parameter fit behind the same relative-determinant
    * guard as q18, mirrored in the SQL. Day-of-week seasonality rides
    * residual means; future r = per-key historical mean, future payday
    * indicator derives from dayofmonth — both engines re-derive it. */
  def forecastJointCramer(spark: SparkSession, dir: String, horizon: Int = 7): DataFrame = {
    val t = Tables(spark, dir)
    val daily = t.events
      .groupBy(col("event_type"), to_date(col("ts")).as("ds"))
      .agg(sum(col("value")).as("y"), count(lit(1)).cast("double").as("r"))
      .withColumn("h", when(dayofmonth(col("ds")).isin(1, 15), lit(1.0)).otherwise(lit(0.0)))
    forecastJointCramerFrame(daily, Seq("event_type"), horizon)
  }

  /** Frame-level joint Cramer fit over any (keyCols, ds, y, r, h) daily
    * frame — h is a 0/1 indicator column re-derivable from ds on the
    * future spine via the payday rule (dayofmonth ∈ {1, 15}), which is
    * the oracle-shared convention. */
  def forecastJointCramerFrame(daily: DataFrame, keyCols: Seq[String],
                               horizon: Int): DataFrame = {
    import Cramer4.ColAlg
    val keys = keyCols.map(col)
    val wk = Window.partitionBy(keys: _*)
    val wx = daily
      .withColumn("x", datediff(col("ds"), min(col("ds")).over(wk)).cast("double"))
      .localCheckpoint()
    val sums = wx.groupBy(keys: _*).agg(
      count(lit(1)).cast("double").as("n"),
      sum(col("x")).as("sx"), sum(col("r")).as("sr"), sum(col("h")).as("sh"),
      sum(col("x") * col("x")).as("sxx"), sum(col("x") * col("r")).as("sxr"),
      sum(col("x") * col("h")).as("sxh"),
      sum(col("r") * col("r")).as("srr"), sum(col("r") * col("h")).as("srh"),
      sum(col("h") * col("h")).as("shh"),
      sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
      sum(col("r") * col("y")).as("sry"), sum(col("h") * col("y")).as("shy"),
      max(col("x")).as("xmax"), max(col("ds")).as("maxds"),
      avg(col("r")).as("rmean"))
    val betas = sums
      .withColumn("det", Cramer4.det(ColAlg))
      .withColumn("degen",
        abs(col("det")) <= lit(1e-9) * abs(col("n") * col("sxx") * col("srr") * col("shh")))
      .withColumn("den2", col("n") * col("sxx") - col("sx") * col("sx"))
      .withColumn("b1f", when(abs(col("den2")) > lit(0.0),
        (col("n") * col("sxy") - col("sx") * col("sy")) / col("den2")).otherwise(lit(0.0)))
      .withColumn("b0f", (col("sy") - col("b1f") * col("sx")) / col("n"))
      .withColumn("b0", when(col("degen"), col("b0f"))
        .otherwise(Cramer4.num(ColAlg, 0) / col("det")))
      .withColumn("b1", when(col("degen"), col("b1f"))
        .otherwise(Cramer4.num(ColAlg, 1) / col("det")))
      .withColumn("b2", when(col("degen"), lit(0.0))
        .otherwise(Cramer4.num(ColAlg, 2) / col("det")))
      .withColumn("b3", when(col("degen"), lit(0.0))
        .otherwise(Cramer4.num(ColAlg, 3) / col("det")))
      .select(keys ++ Seq(col("b0"), col("b1"), col("b2"), col("b3"),
        col("xmax"), col("maxds"), col("rmean")): _*)

    val dowMeans = wx.join(betas, keyCols)
      .withColumn("dow", (dayofweek(col("ds")) - 1).cast("long"))
      .groupBy(keys :+ col("dow"): _*)
      .agg(avg(col("y") - (col("b0") + col("b1") * col("x") + col("b2") * col("r") +
        col("b3") * col("h"))).as("dow_mean"))

    val future = betas
      .select(keys ++ Seq(col("b0"), col("b1"), col("b2"), col("b3"),
        col("xmax"), col("maxds"), col("rmean"),
        explode(sequence(lit(1), lit(horizon))).as("hz")): _*)
      .withColumn("ds", date_add(col("maxds"), col("hz")))
      .withColumn("x", col("xmax") + col("hz"))
      .withColumn("h", when(dayofmonth(col("ds")).isin(1, 15), lit(1.0)).otherwise(lit(0.0)))
      .withColumn("dow", (dayofweek(col("ds")) - 1).cast("long"))

    future.join(dowMeans, keyCols :+ "dow", "left")
      .select(keys ++ Seq(
        col("ds"),
        round(greatest(lit(0.0),
          col("b0") + col("b1") * col("x") + col("b2") * col("rmean") + col("b3") * col("h") +
            coalesce(col("dow_mean"), lit(0.0))), 4).as("yhat")): _*)
      .transform(d => Perf.sortedOnce(d, keys :+ col("ds"): _*))
  }

  /** `q43_forecast_joint` — the JOINT Gram-basis fit on real data:
    * daily event value per type with the daily event COUNT as an
    * external regressor AND weekly Fourier seasonality in ONE model —
    * Prophet's `forecast(regressor=..., weekly_seasonality=...)`
    * combination (ProphetForecaster.py:267-356 feeds every kwarg into
    * the same fit), which previously raised `unsupported`. Rows-only at
    * the driver (the per-key dense solve is not ANSI-SQL-expressible);
    * ForecastSpec verifies planted trend+sinusoid+regressor recovery. */
  def forecastJoint(spark: SparkSession, dir: String, horizon: Int = 7): DataFrame = {
    val t = Tables(spark, dir)
    val daily = t.events
      .groupBy(col("event_type"), to_date(col("ts")).as("ds"))
      .agg(sum(col("value")).as("y"), count(lit(1)).cast("double").as("r"))
    forecastFourier(daily, Seq("event_type"), horizon,
      weeklyOrder = 1, yearlyOrder = 0, regressorCols = Seq("r"))
  }

  /** Single-changepoint piecewise-linear trend forecast — the
    * ORACLE-EXPRESSIBLE slice of Prophet's changepoint model
    * (ProphetForecaster.py:281-285): one knot at `changepointRange` of
    * each key's span, y ~ b0 + b1·x + b2·(x − k)₊, solved by the exact
    * 3×3 Cramer normal equations [[forecastWithRegressor]] already
    * implements (a changepoint IS an auto-generated regressor). DuckDB
    * can mirror every formula, so the driver hash-checks this path;
    * the general n-knot / ridge path is [[forecastFourier]]'s
    * `changepoints` parameter (spec-verified).
    *
    * The hinge is active on every future step (future x > span ≥ knot),
    * so the forecast extrapolates b1 + b2 — the final-regime slope —
    * which is the entire point of changepoints: a series whose trend
    * broke extrapolates its CURRENT slope, not the global average.
    */
  def forecastPiecewise(daily: DataFrame, keyCols: Seq[String], horizon: Int,
                        changepointRange: Double = 0.8): DataFrame = {
    val keys = keyCols.map(col)
    val wk = Window.partitionBy(keys: _*)
    // one materialization: the hinge augmentation and the future-hinge
    // frame both read it, and forecastWithRegressor checkpoints its own
    // working set downstream — the source aggregate still runs once
    val aug = daily
      .withColumn("x0", datediff(col("ds"), min(col("ds")).over(wk)).cast("double"))
      .withColumn("span", max(col("x0")).over(wk))
      .withColumn("r", greatest(lit(0.0), col("x0") - lit(changepointRange) * col("span")))
      .localCheckpoint()
    // future hinge values: x = span + h, all past the knot
    val futureReg = aug.groupBy(keys: _*)
      .agg(max(col("span")).as("span"), max(col("ds")).as("maxds"))
      .select(keys ++ Seq(col("span"), col("maxds"),
        explode(sequence(lit(1), lit(horizon))).as("h")): _*)
      .withColumn("ds", date_add(col("maxds"), col("h")))
      .withColumn("r", col("span") + col("h") - lit(changepointRange) * col("span"))
      .select(keys ++ Seq(col("ds"), col("r")): _*)
    forecastWithRegressor(aug.select(keys ++ Seq(col("ds"), col("y"), col("r")): _*),
      keyCols, horizon, Some(futureReg))
  }

  /** `q38_forecast_changepoints` — piecewise-linear-trend forecast of
    * daily event value per event_type, knot at 80% of the history
    * (Prophet's `changepoint_range=0.8` default). */
  def forecastChangepoints(spark: SparkSession, dir: String, horizon: Int = 7): DataFrame =
    forecastPiecewise(eventsDaily(spark, dir), Seq("event_type"), horizon)
}

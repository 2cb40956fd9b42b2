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
  * and the options dispatch:
  *
  *  - single-option calls keep their specialized (oracle-verified)
  *    closed-form paths: a lone `regressor` →
  *    [[Forecast.forecastWithRegressor]] (Cramer 3×3, q18's path);
  *    lone `holidays` / `countryHolidays` →
  *    [[Forecast.forecastWithHolidays]] (q35's path); seasonality /
  *    changepoint options → [[Forecast.forecastFourier]]; plain calls →
  *    [[Forecast.forecastDaily]] (freq D/W/MS/H, growth
  *    linear/flat/logistic).
  *  - option COMBINATIONS that need one model over everything —
  *    Prophet fits ONE joint model over every kwarg
  *    (`Prophet(**params)`, ProphetForecaster.py:267-356) — run the
  *    JOINT Gram-basis fit: [[Forecast.forecastFourier]] with
  *    regressor columns and holiday indicator columns appended to the
  *    basis, at any freq, under any growth. `forecast(regressor=...,
  *    yearlySeasonality=...)` is one fit here exactly as it is there,
  *    and MULTIPLE regressors (`regressors = Seq(...)`, Prophet's
  *    repeated `add_regressor`) always take the joint path — the
  *    Cramer 3×3 fits exactly one.
  *
  * `weeklySeasonality` is an Option so "unset" and "explicitly off"
  * stay distinct (Prophet's `weekly_seasonality=False`): None = auto
  * (day-of-week means in the simple path; Fourier order 2 in the
  * Fourier/joint paths), Some(0) = off (dispatches to the Fourier path
  * with an empty weekly block), Some(k) = order k.
  *
  * `holidays` and `countryHolidays` together merge into ONE calendar
  * before the per-name effect/indicator build, exactly as Prophet feeds
  * a custom holidays frame and add_country_holidays into the same model
  * (ProphetForecaster.py:316-319 + :161). `seasonalityRidge` /
  * `holidaysRidge` are the seasonality_prior_scale /
  * holidays_prior_scale analogs (:282-283): block-diagonal ridge terms
  * on the Gram solve — a larger ridge is a smaller prior scale.
  *
  * Still refused loudly (IllegalArgumentException): `changepointRidge`
  * without changepoints, `holidaysRidge` without holidays,
  * multiplicative seasonality with logistic growth (two fit-space
  * transforms), changepoints with flat growth, per-regressor
  * `regressorMode` multiplicative (different fit space), and every
  * `prophetKwargs` entry (Stan-era options are rejected with the
  * closed-form analog named — e.g. `mcmc_samples` → the residual-σ
  * interval, `changepoint_prior_scale` → `changepointRidge`).
  * Prophet's `add_regressor(standardize=)` IS supported:
  * `regressorStandardize(name -> true)` z-scores by per-key history
  * mean/σ, history and future alike, so per-name ridge priors act on
  * the standardized scale.
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

  /** Backtick-escape a column name for safe `col()` resolution —
    * metric names come from the caller's schema and may contain dots,
    * quotes, or backticks. */
  private def qcol(name: String): Column = col("`" + name.replace("`", "``") + "`")

  /** Resolve (custom holidays, country code) into ONE concrete
    * (ds, holiday) calendar spanning the data plus the horizon (the
    * bounds read is one tiny driver-side aggregate, as in
    * forecastWithCountryHolidays). Prophet feeds a custom `holidays`
    * frame AND a country calendar into ONE model
    * (ProphetForecaster.py:316-319 with add_country_holidays at :161):
    * both-present unions the calendars BEFORE the per-name
    * effect/indicator build, distinct() so a custom row duplicating a
    * country entry can't double-join calendar days. */
  private def resolveHolidayFrame(holidays: Option[DataFrame],
                                  countryHolidays: Option[String],
                                  freq: String, days: Int): Option[DataFrame] = {
    def countryCal(c: String): DataFrame = {
      def yearOf(v: Any): Int = v match {
        case d: java.sql.Date => d.toLocalDate.getYear
        case t: java.sql.Timestamp => t.toLocalDateTime.getYear
        case other => throw new IllegalArgumentException(
          s"date column must be DATE or TIMESTAMP, got $other")
      }
      val b = data.agg(min(col(dateCol)), max(col(dateCol))).head()
      // cover the WHOLE horizon at every freq (days counts periods:
      // months at MS, weeks at W, hours at H, days at D)
      val extraYears = freq match {
        case "MS" => days / 12 + 1
        case "W"  => days / 52 + 1
        case "H"  => days / (24 * 365) + 1
        case _    => days / 365 + 1
      }
      val (lo, hi) =
        if (b.isNullAt(0)) (1970, 1969)
        else (yearOf(b.get(0)), yearOf(b.get(1)) + extraYears)
      graft.functions.holidays.calendar(data.sparkSession, c, lo, hi)
    }
    (holidays, countryHolidays) match {
      case (Some(h), None) => Some(h)
      case (None, Some(c)) => Some(countryCal(c))
      case (Some(h), Some(c)) =>
        Some(h.select(col("ds").cast("date").as("ds"), col("holiday"))
          .unionByName(countryCal(c)).distinct())
      case _ => None
    }
  }

  private def melt(metrics: Seq[String], extra: Seq[String] = Nil): DataFrame = {
    require(metrics.nonEmpty, "no metrics to forecast (none declared, none numeric)")
    // explode over array-of-structs instead of a stack() SQL string so a
    // metric name with a quote or backtick can't break (or mislabel) the
    // melt — names never pass through a SQL parser here
    data.select((keyCols ++ extra).map(qcol) ++ Seq(col(dateCol).as("ds"),
      explode(array(metrics.map(m =>
        struct(lit(m).as("metric"), qcol(m).cast("double").as("y"))): _*)).as("_mv")): _*)
      .select((keyCols ++ extra).map(qcol) ++
        Seq(col("ds"), col("_mv.metric").as("metric"), col("_mv.y").as("y")): _*)
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
               capByMetric: Map[String, Double] = Map.empty,
               floorByMetric: Map[String, Double] = Map.empty,
               seasonalityMode: String = "additive",
               yearlySeasonality: Int = 0,
               weeklySeasonality: Option[Int] = None,
               dailySeasonality: Option[Int] = None,
               changepoints: Int = 0,
               changepointRange: Double = 0.8,
               changepointRidge: Double = 0.0,
               seasonalityRidge: Double = 0.0,
               holidaysRidge: Double = 0.0,
               regressorRidge: Map[String, Double] = Map.empty,
               customSeasonalities: Seq[(Double, Int)] = Nil,
               holidays: Option[DataFrame] = None,
               countryHolidays: Option[String] = None,
               regressor: Option[String] = None,
               regressors: Seq[String] = Nil,
               regressorStandardize: Map[String, Boolean] = Map.empty,
               regressorMode: Map[String, String] = Map.empty,
               futureRegressor: Option[DataFrame] = None,
               nonNegative: Boolean = true,
               roundDecimals: Option[Int] = None,
               prophetKwargs: Map[String, String] = Map.empty): DataFrame = {
    // Prophet's add_regressor can be called repeatedly — `regressors`
    // is the multi-column form; `regressor` stays as the single-column
    // convenience. All named columns are inputs, not targets — excluded
    // from the metric auto-discovery like the reference's
    // _data_validation
    val regs = (regressor.toSeq ++ regressors).distinct
    rejectProphetKwargs(prophetKwargs)
    validateRegressorDicts(regs, regressorStandardize, regressorMode)
    // add_regressor(standardize=True): z-score the regressor by its
    // HISTORY mean/σ per key group before the fit (so per-name ridge
    // priors penalize on the standardized scale, as Prophet's
    // prior_scale does), and run the same transform over the caller's
    // future frame with the SAME history stats. With no ridge the
    // prediction is affine-invariant, so standardization only matters
    // (and is only worth a pass) when a prior is in play — both facts
    // spec-asserted. A constant regressor (σ = 0) centers only rather
    // than divide by zero.
    val stdNames = regressorStandardize.filter(_._2).keys.toSeq.sorted
    if (stdNames.nonEmpty)
      return new Forecaster(standardizeCols(data, stdNames), dateCol, keyCols)
        .forecast(days, metrics = metrics, freq = freq,
          includeHistory = includeHistory, includeIntervals = includeIntervals,
          intervalWidth = intervalWidth, growth = growth, cap = cap, floor = floor,
          capByMetric = capByMetric, floorByMetric = floorByMetric,
          seasonalityMode = seasonalityMode, yearlySeasonality = yearlySeasonality,
          weeklySeasonality = weeklySeasonality, dailySeasonality = dailySeasonality,
          changepoints = changepoints, changepointRange = changepointRange,
          changepointRidge = changepointRidge, seasonalityRidge = seasonalityRidge,
          holidaysRidge = holidaysRidge, regressorRidge = regressorRidge,
          customSeasonalities = customSeasonalities, holidays = holidays,
          countryHolidays = countryHolidays, regressor = regressor,
          regressors = regressors,
          futureRegressor = futureRegressor.map(standardizeFuture(_, stdNames, regs)),
          nonNegative = nonNegative, roundDecimals = roundDecimals)
    val ms = metrics.getOrElse(numericMetrics.filterNot(regs.contains))
    // per-metric cap/floor — the reference accepts a number OR a
    // {metric: value} dict for both. The fit paths take scalar bounds,
    // so metrics group by their EFFECTIVE (cap, floor) pair (the map
    // value, else the scalar default) and each group runs one batched
    // fit — bounded metric counts keep this a handful of passes, each
    // still fitting all its metrics in one distributed aggregate.
    if (capByMetric.nonEmpty || floorByMetric.nonEmpty) {
      val unknown = (capByMetric.keySet ++ floorByMetric.keySet) -- ms.toSet
      require(unknown.isEmpty, s"capByMetric/floorByMetric name unknown metrics: $unknown")
      // resolve any country calendar ONCE before the fan-out — each
      // recursive call would otherwise re-run the driver-side min/max
      // scan and rebuild an identical calendar per bounds group
      val resolvedHol = resolveHolidayFrame(holidays, countryHolidays, freq, days)
      return ms.groupBy(m => (capByMetric.get(m).orElse(cap), floorByMetric.get(m).orElse(floor)))
        .toSeq.sortBy(_._2.head)
        .map { case ((c, f), group) =>
          forecast(days, metrics = Some(group), freq = freq,
            includeHistory = includeHistory, includeIntervals = includeIntervals,
            intervalWidth = intervalWidth, growth = growth, cap = c, floor = f,
            seasonalityMode = seasonalityMode, yearlySeasonality = yearlySeasonality,
            weeklySeasonality = weeklySeasonality, dailySeasonality = dailySeasonality,
            changepoints = changepoints, changepointRange = changepointRange,
            changepointRidge = changepointRidge, seasonalityRidge = seasonalityRidge,
            holidaysRidge = holidaysRidge, regressorRidge = regressorRidge,
            customSeasonalities = customSeasonalities, holidays = resolvedHol,
            countryHolidays = None, regressor = regressor,
            regressors = regressors, futureRegressor = futureRegressor,
            nonNegative = nonNegative, roundDecimals = roundDecimals)
        }.reduce(_ unionByName _)
    }
    val keys = keyCols :+ "metric"
    val multiplicative = seasonalityMode match {
      case "additive" => false
      case "multiplicative" => true
      case other => throw new IllegalArgumentException(
        s"seasonality_mode must be additive or multiplicative, got $other")
    }
    def unsupported(what: String) = throw new IllegalArgumentException(
      s"unsupported option combination: $what")
    if (changepointRidge > 0.0 && changepoints == 0)
      unsupported("changepointRidge without changepoints")
    if (holidaysRidge > 0.0 && holidays.isEmpty && countryHolidays.isEmpty)
      unsupported("holidaysRidge without holidays")
    if (regressorRidge.nonEmpty && regs.isEmpty)
      unsupported("regressorRidge without regressors")
    if (futureRegressor.isDefined && regs.isEmpty)
      unsupported("futureRegressor without a regressor")

    // any DEFINED weeklySeasonality routes through the Fourier basis so
    // Some(0) genuinely disables the weekly term (the simple path's
    // day-of-week means have no off switch)
    // a prior-scale ridge needs the Gram-basis fit (the simple paths'
    // residual means have no coefficients to penalize)
    val wantsFourier = yearlySeasonality > 0 || weeklySeasonality.isDefined ||
      customSeasonalities.nonEmpty || changepoints > 0 || multiplicative ||
      seasonalityRidge > 0.0 || holidaysRidge > 0.0 ||
      // any DEFINED dailySeasonality routes through the Fourier basis
      // too: the simple path's hour-of-day residual means (freq='H')
      // have no off switch, so Some(0) must land where the daily block
      // genuinely disappears
      dailySeasonality.isDefined
    val wantsHolidays = holidays.isDefined || countryHolidays.isDefined
    val wantsBounds = cap.isDefined || floor.isDefined || includeIntervals ||
      includeHistory || !nonNegative
    val weeklyOrder = weeklySeasonality.getOrElse(2)

    lazy val holFrame: Option[DataFrame] =
      resolveHolidayFrame(holidays, countryHolidays, freq, days)
    // daily seasonality = a period-1-day Fourier block. None = auto
    // (Prophet's rule: enable only for sub-daily data, i.e. freq='H'),
    // Some(0) = explicitly off even at freq='H', Some(k) = order k at
    // any freq. A caller-supplied period-1 custom seasonality wins.
    def seasonWithDaily: Seq[(Double, Int)] = {
      val hasDaily = customSeasonalities.exists(_._1 == 1.0)
      dailySeasonality match {
        case Some(0)            => customSeasonalities
        case Some(k) if !hasDaily => customSeasonalities :+ ((1.0, k))
        case None if freq == "H" && !hasDaily => customSeasonalities :+ ((1.0, 4))
        case _                  => customSeasonalities
      }
    }

    // a regressor or holidays COMBINED with anything their specialized
    // paths can't express — or MORE than one regressor (the Cramer 3×3
    // fits exactly one) — runs the joint Gram-basis fit
    val needJoint =
      regs.size > 1 ||
      (regs.nonEmpty && (wantsFourier || wantsHolidays || freq != "D" ||
        growth != "linear" || wantsBounds || regressorRidge.nonEmpty)) ||
      (wantsHolidays && (wantsFourier || freq != "D" || growth != "linear" ||
        wantsBounds))

    val out =
      if (needJoint) {
        // the caller's future-regressor frame is per (keyCols, ds);
        // single-regressor calls may use the documented value column
        // `r` (renamed to the regressor's name), multi-regressor frames
        // carry one column per declared name. Every melted metric
        // shares the frame — expand across the metric list
        val fr = futureRegressor.map { f =>
          val named =
            if (regs.size == 1 && f.columns.contains("r") && !f.columns.contains(regs.head))
              f.withColumnRenamed("r", regs.head)
            else f
          named.withColumn("metric", explode(array(ms.map(lit): _*)))
        }
        Forecast.forecastFourier(melt(ms, extra = regs), keys, days,
          weeklyOrder = weeklyOrder, yearlyOrder = yearlySeasonality,
          multiplicative = multiplicative,
          changepoints = changepoints, changepointRange = changepointRange,
          changepointRidge = changepointRidge,
          seasonalityRidge = seasonalityRidge,
          holidaysRidge = holidaysRidge,
          extraSeasonalities = seasonWithDaily,
          cap = cap, floor = floor,
          includeIntervals = includeIntervals, intervalWidth = intervalWidth,
          includeHistory = includeHistory, nonNegative = nonNegative,
          freq = freq, growth = growth,
          regressorCols = regs,
          regressorRidge = regressorRidge,
          futureReg = fr,
          holidays = holFrame)
      } else if (regs.nonEmpty) {
        // lone regressor at freq=D: the oracle-backed Cramer 3×3 path
        // (day-of-week seasonality as residual means, q18 semantics).
        // The future frame may use either documented convention — the
        // generic value column `r` or a column named after the
        // regressor — so both dispatch targets accept the same frames
        val fr = futureRegressor.map { f =>
          val named = if (f.columns.contains("r")) f else f.withColumnRenamed(regs.head, "r")
          named.withColumn("metric", explode(array(ms.map(lit): _*)))
        }
        Forecast.forecastWithRegressor(
          melt(ms, extra = regs)
            .withColumnRenamed(regs.head, "r"),
          keys, days, fr)
      } else if (wantsHolidays) {
        // lone holidays at freq=D: sequential residual-effects path
        // (q35 semantics, coincides with the joint fit when holidays
        // are sparse)
        (holidays, countryHolidays) match {
          case (None, Some(c)) =>
            Forecast.forecastWithCountryHolidays(melt(ms), keys, days, c)
          // custom-only passes the caller frame through; custom+country
          // passes the merged calendar — same per-name effects path
          case _ => Forecast.forecastWithHolidays(melt(ms), keys, days, holFrame.get)
        }
      } else if (wantsFourier) {
        Forecast.forecastFourier(melt(ms), keys, days,
          weeklyOrder = weeklyOrder, yearlyOrder = yearlySeasonality,
          multiplicative = multiplicative,
          changepoints = changepoints, changepointRange = changepointRange,
          changepointRidge = changepointRidge,
          seasonalityRidge = seasonalityRidge,
          holidaysRidge = holidaysRidge,
          extraSeasonalities = seasonWithDaily,
          cap = cap, floor = floor,
          includeIntervals = includeIntervals, intervalWidth = intervalWidth,
          includeHistory = includeHistory, nonNegative = nonNegative,
          freq = freq, growth = growth)
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

  /** Prophet `add_regressor` dict options: `standardize` is
    * implemented ([[standardizeCols]]); `mode` accepts only Prophet's
    * default "additive" — a per-regressor multiplicative term is a
    * different fit space than the global multiplicative transform and
    * is refused LOUDLY (the reference user gets an error naming the
    * option, never a silently-additive fit). */
  private def validateRegressorDicts(regs: Seq[String],
                                     standardize: Map[String, Boolean],
                                     mode: Map[String, String]): Unit = {
    val unknown = (standardize.keySet ++ mode.keySet) -- regs.toSet
    require(unknown.isEmpty,
      s"regressorStandardize/regressorMode name undeclared regressors: ${unknown.toSeq.sorted.mkString(", ")}")
    mode.foreach {
      case (_, "additive") => ()
      case (n, "multiplicative") => throw new IllegalArgumentException(
        s"regressorMode($n -> multiplicative) is not supported: a per-regressor " +
          "multiplicative term is a different fit space than this engine's global " +
          "transform. Use seasonalityMode = \"multiplicative\" for a global " +
          "multiplicative fit, or pre-multiply the regressor into the metric.")
      case (n, other) => throw new IllegalArgumentException(
        s"regressorMode($n -> $other): mode must be additive or multiplicative")
    }
  }

  /** `prophet_kwargs` pass-through, refused LOUDLY with the closed-form
    * analog named per option — a Stan-era kwarg must produce an error
    * that says what this engine does instead, not a silently different
    * model (VERDICT r8 #2 of "What's missing"). */
  private def rejectProphetKwargs(kwargs: Map[String, String]): Unit = {
    if (kwargs.isEmpty) return
    val analog = Map(
      "mcmc_samples" -> "MCMC posteriors are Stan-specific; intervals here are closed-form residual-sigma bands (includeIntervals = true, intervalWidth)",
      "uncertainty_samples" -> "sampled uncertainty is Stan-specific; intervals here are closed-form residual-sigma bands (includeIntervals = true, intervalWidth)",
      "stan_backend" -> "no Stan backend exists in this engine; fits are closed-form Gram solves",
      "n_changepoints" -> "use changepoints = <n>",
      "changepoint_range" -> "use changepointRange = <frac>",
      "changepoint_prior_scale" -> "use changepointRidge = <lambda> (a larger ridge is a smaller prior scale)",
      "seasonality_prior_scale" -> "use seasonalityRidge = <lambda>",
      "holidays_prior_scale" -> "use holidaysRidge = <lambda>",
      "seasonality_mode" -> "use seasonalityMode = \"additive\"|\"multiplicative\"",
      "interval_width" -> "use intervalWidth = <frac>",
      "growth" -> "use growth = \"linear\"|\"flat\"|\"logistic\"")
    val lines = kwargs.keys.toSeq.sorted.map { k =>
      s"  $k: ${analog.getOrElse(k, "unknown Prophet kwarg — no analog in this engine")}"
    }
    throw new IllegalArgumentException(
      "prophetKwargs are not passed through (closed-form engine, no Stan):\n" +
        lines.mkString("\n"))
  }

  /** Per-key history mean/σ of the named regressor columns — the stats
    * both [[standardizeCols]] (history) and [[standardizeFuture]]
    * (horizon, SAME stats) z-score with. */
  private def historyStats(names: Seq[String]): DataFrame = {
    val aggs = names.zipWithIndex.flatMap { case (n, i) =>
      Seq(avg(qcol(n)).as(s"_mu_$i"), stddev_samp(qcol(n)).as(s"_sd_$i"))
    }
    if (keyCols.isEmpty) data.agg(aggs.head, aggs.tail: _*)
    else data.groupBy(keyCols.map(qcol): _*).agg(aggs.head, aggs.tail: _*)
  }

  private def applyZ(df: DataFrame, names: Seq[String],
                     colFor: String => String): DataFrame = {
    val stats = broadcast(historyStats(names))
    val joined = if (keyCols.isEmpty) df.crossJoin(stats) else df.join(stats, keyCols)
    names.zipWithIndex.foldLeft(joined) { case (acc, (n, i)) =>
      val target = colFor(n)
      val sd = coalesce(col(s"_sd_$i"), lit(0.0))
      acc.withColumn(target,
        when(sd === 0.0, qcol(target) - col(s"_mu_$i"))
          .otherwise((qcol(target) - col(s"_mu_$i")) / sd))
    }.drop(names.indices.flatMap(i => Seq(s"_mu_$i", s"_sd_$i")): _*)
  }

  private def standardizeCols(df: DataFrame, names: Seq[String]): DataFrame =
    applyZ(df, names, identity)

  private def standardizeFuture(f: DataFrame, names: Seq[String],
                                regs: Seq[String]): DataFrame =
    applyZ(f, names, n =>
      if (f.columns.contains(n)) n
      else if (regs.size == 1 && f.columns.contains("r")) "r"
      else throw new IllegalArgumentException(
        s"futureRegressor frame lacks standardized regressor column '$n'"))

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
      .transform(d => Perf.sortedOnce(d, (keyCols :+ "ds").map(col): _*))
  }
}

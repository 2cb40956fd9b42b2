package graft

import graft.operators.Forecast
import org.apache.spark.sql.functions._
import java.sql.Date

class ForecastSpec extends SparkSpecBase {
  import spark.implicits._

  test("perfect linear series forecasts exactly (trend only)") {
    // y = 10 + 2x for 21 days → slope 2, intercept 10, all dow residuals 0.
    val daily = (0 until 21).map { x =>
      ("k1", Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(x)), 10.0 + 2.0 * x)
    }.toDF("key", "ds", "y")
    val out = Forecast.forecastDaily(daily, Seq("key"), horizon = 7)
      .select("ds", "yhat").as[(Date, Double)].collect().sortBy(_._1.toString)
    assert(out.length == 7)
    out.zipWithIndex.foreach { case ((ds, yhat), i) =>
      val expected = 10.0 + 2.0 * (21 + i)
      assert(math.abs(yhat - expected) < 1e-6, s"$ds: $yhat vs $expected")
    }
  }

  test("non-negative clamp applies (ProphetForecaster non_negative)") {
    // steeply declining series → raw forecast negative → clamped to 0
    val daily = (0 until 14).map { x =>
      ("k1", Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(x)), 100.0 - 20.0 * x)
    }.toDF("key", "ds", "y")
    val out = Forecast.forecastDaily(daily, Seq("key"), horizon = 5)
      .select("yhat").as[Double].collect()
    assert(out.forall(_ >= 0.0))
    assert(out.exists(_ == 0.0), "declining series must hit the clamp")
  }

  test("weekly seasonality shifts the right weekdays") {
    // flat series with +70 every Sunday → dow mean ≈ +60 on Sundays
    // (OLS absorbs the weekly bump into a small trend; residual catches the rest)
    val daily = (0 until 28).map { x =>
      val d = java.time.LocalDate.of(2024, 1, 1).plusDays(x)
      val bump = if (d.getDayOfWeek == java.time.DayOfWeek.SUNDAY) 70.0 else 0.0
      ("k1", Date.valueOf(d), 100.0 + bump)
    }.toDF("key", "ds", "y")
    val out = Forecast.forecastDaily(daily, Seq("key"), horizon = 7)
      .select("ds", "yhat").as[(Date, Double)].collect()
    val (sun, rest) = out.partition(r => r._1.toLocalDate.getDayOfWeek == java.time.DayOfWeek.SUNDAY)
    assert(sun.nonEmpty && rest.nonEmpty)
    val sunAvg = sun.map(_._2).sum / sun.length
    val restAvg = rest.map(_._2).sum / rest.length
    assert(sunAvg - restAvg > 40.0, s"sunday $sunAvg vs rest $restAvg")
  }

  test("cap/floor growth bounds clamp predictions (_apply_growth_bounds)") {
    // steeply rising series → raw forecast exceeds cap → clamped; floor
    // binds a declining series before the non-negative clamp does.
    val rising = (0 until 14).map { x =>
      ("k1", Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(x)), 10.0 + 20.0 * x)
    }.toDF("key", "ds", "y")
    val capped = Forecast.forecastDaily(rising, Seq("key"), horizon = 5,
      cap = Some(200.0), floor = Some(0.0))
      .select("yhat").as[Double].collect()
    assert(capped.forall(_ <= 200.0))
    assert(capped.exists(_ == 200.0), "rising series must hit the cap")

    val falling = (0 until 14).map { x =>
      ("k1", Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(x)), 300.0 - 15.0 * x)
    }.toDF("key", "ds", "y")
    val floored = Forecast.forecastDaily(falling, Seq("key"), horizon = 6,
      floor = Some(50.0))
      .select("yhat").as[Double].collect()
    assert(floored.forall(_ >= 50.0))
    assert(floored.exists(_ == 50.0), "falling series must hit the floor")
  }

  test("prediction intervals are ±z·σ of model residuals (include_intervals)") {
    // flat series with alternating ±10 noise: trend ≈ 0, every dow mean 0
    // (each weekday sees +,-,+,- over 28 days), so σ = stddev(±10 × 28).
    val daily = (0 until 28).map { x =>
      val noise = if (x % 2 == 0) 10.0 else -10.0
      ("k1", Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(x)), 100.0 + noise)
    }.toDF("key", "ds", "y")
    val out = Forecast.forecastDaily(daily, Seq("key"), horizon = 7,
      includeIntervals = true, intervalWidth = 0.80)
      .select("yhat", "yhat_lower", "yhat_upper").as[(Double, Double, Double)].collect()
    assert(out.length == 7)
    out.foreach { case (y, lo, hi) =>
      assert(lo <= y && y <= hi, s"band must bracket yhat: $lo $y $hi")
    }
    val sigma = math.sqrt(28.0 * 100.0 / 27.0)   // stddev_samp of ±10
    val expectedWidth = 2.0 * Forecast.intervalZ(0.80) * sigma
    // the fitted slope on alternating noise is tiny but nonzero, so σ
    // deviates from the hand value by ~0.2% — bound the width loosely
    out.foreach { case (_, lo, hi) =>
      assert(math.abs((hi - lo) - expectedWidth) < 0.2, s"width ${hi - lo} vs $expectedWidth")
    }
  }

  test("perfect fit yields degenerate intervals and include_history emits fitted history") {
    val daily = (0 until 21).map { x =>
      ("k1", Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(x)), 10.0 + 2.0 * x)
    }.toDF("key", "ds", "y")
    val out = Forecast.forecastDaily(daily, Seq("key"), horizon = 7,
      includeIntervals = true, includeHistory = true)
      .select("ds", "yhat", "yhat_lower", "yhat_upper")
      .as[(Date, Double, Double, Double)].collect()
    assert(out.length == 28, "21 fitted history days + 7 future days")
    out.foreach { case (ds, y, lo, hi) =>
      assert(lo == y && hi == y, s"σ=0 on a perfect fit → bands collapse at $ds")
    }
    // fitted history values reproduce the series exactly
    val hist = out.filter(_._1.toLocalDate.isBefore(java.time.LocalDate.of(2024, 1, 22)))
    hist.foreach { case (ds, y, _, _) =>
      val x = java.time.temporal.ChronoUnit.DAYS.between(java.time.LocalDate.of(2024, 1, 1), ds.toLocalDate)
      assert(math.abs(y - (10.0 + 2.0 * x)) < 1e-6)
    }
  }

  test("external regressor is recovered exactly (add_regressor analog)") {
    // y = 2 + 0.5x + 3r with r varying independently of x → the 3×3
    // normal equations recover (b0,b1,b2) exactly; all dow residuals 0.
    val rs = Seq(5.0, 9.0, 3.0, 7.0, 1.0, 8.0, 4.0, 6.0, 2.0, 9.5, 3.5, 7.5, 1.5, 8.5,
      4.5, 6.5, 2.5, 9.25, 0.5, 5.5, 10.0)
    val daily = rs.zipWithIndex.map { case (r, x) =>
      ("k1", Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(x)), 2.0 + 0.5 * x + 3.0 * r, r)
    }.toDF("key", "ds", "y", "r")
    val futureR = (21 until 28).map { x =>
      ("k1", Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(x)), 4.0 + (x % 3))
    }.toDF("key", "ds", "r")
    val out = Forecast.forecastWithRegressor(daily, Seq("key"), horizon = 7, Some(futureR))
      .select("ds", "yhat").as[(Date, Double)].collect().sortBy(_._1.toString)
    out.foreach { case (ds, yhat) =>
      val x = java.time.temporal.ChronoUnit.DAYS.between(java.time.LocalDate.of(2024, 1, 1), ds.toLocalDate)
      val expected = 2.0 + 0.5 * x + 3.0 * (4.0 + (x % 3))
      assert(math.abs(yhat - expected) < 1e-4, s"$ds: $yhat vs $expected")
    }
  }

  test("missing future regressor values fail loudly (_attach_regressors ValueError)") {
    val daily = (0 until 14).map { x =>
      ("k1", Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(x)), 10.0 + x, 1.0 + x % 4)
    }.toDF("key", "ds", "y", "r")
    // future frame covers only 3 of the 7 horizon days
    val partial = (14 until 17).map { x =>
      ("k1", Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(x)), 2.0)
    }.toDF("key", "ds", "r")
    val ex = intercept[Exception] {
      Forecast.forecastWithRegressor(daily, Seq("key"), horizon = 7, Some(partial)).collect()
    }
    assert(ex.getMessage.contains("missing future regressor"))
  }

  test("Fourier forecaster recovers planted yearly+weekly seasonality (additive)") {
    // 3 years of noiseless trend + yearly + weekly sinusoid: the per-key
    // OLS over the Fourier basis must extrapolate the exact function.
    val start = java.time.LocalDate.of(2021, 1, 1)
    val epoch = java.time.LocalDate.of(1970, 1, 1)
    def truth(x: Long, t: Long): Double =
      50.0 + 0.1 * x + 20.0 * math.sin(2 * math.Pi * t / 365.25) +
        5.0 * math.sin(2 * math.Pi * t / 7.0)
    val daily = (0 until 1096).map { x =>
      val d = start.plusDays(x)
      val t = java.time.temporal.ChronoUnit.DAYS.between(epoch, d)
      ("k1", Date.valueOf(d), truth(x, t))
    }.toDF("key", "ds", "y")
    val out = Forecast.forecastFourier(daily, Seq("key"), horizon = 30)
      .select("ds", "yhat").as[(Date, Double)].collect()
    assert(out.length == 30)
    out.foreach { case (ds, yhat) =>
      val x = java.time.temporal.ChronoUnit.DAYS.between(start, ds.toLocalDate)
      val t = java.time.temporal.ChronoUnit.DAYS.between(epoch, ds.toLocalDate)
      assert(math.abs(yhat - truth(x, t)) < 0.5, s"$ds: $yhat vs ${truth(x, t)}")
    }
  }

  test("Fourier multiplicative mode fits in log space (seasonality_mode)") {
    // y = exp(3 + 0.001x + 0.5·sin(2πt/365.25)) — exactly log-linear, so
    // the multiplicative (log-space) fit extrapolates it exactly.
    val start = java.time.LocalDate.of(2021, 1, 1)
    val epoch = java.time.LocalDate.of(1970, 1, 1)
    def truth(x: Long, t: Long): Double =
      math.exp(3.0 + 0.001 * x + 0.5 * math.sin(2 * math.Pi * t / 365.25))
    val daily = (0 until 1096).map { x =>
      val d = start.plusDays(x)
      val t = java.time.temporal.ChronoUnit.DAYS.between(epoch, d)
      ("k1", Date.valueOf(d), truth(x, t))
    }.toDF("key", "ds", "y")
    val out = Forecast.forecastFourier(daily, Seq("key"), horizon = 30, multiplicative = true)
      .select("ds", "yhat").as[(Date, Double)].collect()
    out.foreach { case (ds, yhat) =>
      val x = java.time.temporal.ChronoUnit.DAYS.between(start, ds.toLocalDate)
      val t = java.time.temporal.ChronoUnit.DAYS.between(epoch, ds.toLocalDate)
      val tv = truth(x, t)
      assert(math.abs(yhat - tv) / tv < 0.01, s"$ds: $yhat vs $tv")
    }
  }

  test("yearly terms auto-disable below 2 years of history (yearly_seasonality auto)") {
    // 100-day series: yearly basis is under-determined → gate zeroes it,
    // so the fit equals the weekly-only model.
    val daily = (0 until 100).map { x =>
      val d = java.time.LocalDate.of(2024, 1, 1).plusDays(x)
      ("k1", Date.valueOf(d), 100.0 + 0.5 * x + (if (x % 7 == 0) 10.0 else 0.0))
    }.toDF("key", "ds", "y")
    val withYearly = Forecast.forecastFourier(daily, Seq("key"), horizon = 14, yearlyOrder = 3)
      .select("ds", "yhat").as[(Date, Double)].collect().toMap
    val weeklyOnly = Forecast.forecastFourier(daily, Seq("key"), horizon = 14, yearlyOrder = 0)
      .select("ds", "yhat").as[(Date, Double)].collect().toMap
    withYearly.foreach { case (ds, y) =>
      assert(math.abs(y - weeklyOnly(ds)) < 1e-6, s"$ds: gated yearly must equal weekly-only")
    }
  }

  test("freq='W' and freq='MS' step the future spine by period (forecast freq param)") {
    // weekly series y = 100 + 3*week → slope 3 per week, spine steps 7 days
    val weekly = (0 until 12).map { w =>
      ("k1", Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusWeeks(w)), 100.0 + 3.0 * w)
    }.toDF("key", "ds", "y")
    val wOut = Forecast.forecastDaily(weekly, Seq("key"), horizon = 4, freq = "W")
      .select("ds", "yhat").as[(Date, Double)].collect().sortBy(_._1.toString)
    assert(wOut.map(_._1.toLocalDate).toSeq ==
      (12 until 16).map(w => java.time.LocalDate.of(2024, 1, 1).plusWeeks(w)))
    wOut.zipWithIndex.foreach { case ((_, y), i) =>
      assert(math.abs(y - (100.0 + 3.0 * (12 + i))) < 1e-6)
    }
    // month-start series y = 50 + 10*month → spine steps month starts
    val monthly = (0 until 12).map { m =>
      ("k1", Date.valueOf(java.time.LocalDate.of(2023, 1, 1).plusMonths(m)), 50.0 + 10.0 * m)
    }.toDF("key", "ds", "y")
    val mOut = Forecast.forecastDaily(monthly, Seq("key"), horizon = 3, freq = "MS")
      .select("ds", "yhat").as[(Date, Double)].collect().sortBy(_._1.toString)
    assert(mOut.map(_._1.toLocalDate).toSeq ==
      (12 until 15).map(m => java.time.LocalDate.of(2023, 1, 1).plusMonths(m)))
    mOut.zipWithIndex.foreach { case ((_, y), i) =>
      assert(math.abs(y - (50.0 + 10.0 * (12 + i))) < 1e-6)
    }
  }

  test("holiday effects lift exactly the future holiday dates (add_country_holidays)") {
    import org.apache.spark.sql.functions.{col, lit}
    // flat series with +50 on the 1st and 15th; holidays frame covers
    // history AND the horizon, like Prophet's holidays DataFrame
    val start = java.time.LocalDate.of(2024, 1, 1)
    val daily = (0 until 60).map { x =>
      val d = start.plusDays(x)
      val bump = if (d.getDayOfMonth == 1 || d.getDayOfMonth == 15) 50.0 else 0.0
      ("k1", Date.valueOf(d), 100.0 + bump)
    }.toDF("key", "ds", "y")
    val holidays = (0 until 75).map(x => start.plusDays(x))
      .filter(d => d.getDayOfMonth == 1 || d.getDayOfMonth == 15)
      .map(d => (Date.valueOf(d), s"payday_${d.getDayOfMonth}"))
      .toDF("ds", "holiday")
    val out = Forecast.forecastWithHolidays(daily, Seq("key"), horizon = 14, holidays)
      .select("ds", "yhat").as[(Date, Double)].collect()
    assert(out.length == 14)
    val (hol, plain) = out.partition { case (ds, _) =>
      ds.toLocalDate.getDayOfMonth == 1 || ds.toLocalDate.getDayOfMonth == 15 }
    assert(hol.nonEmpty, "horizon must contain a holiday date")
    val holAvg = hol.map(_._2).sum / hol.length
    val plainAvg = plain.map(_._2).sum / plain.length
    assert(holAvg - plainAvg > 35.0, s"holiday lift: $holAvg vs $plainAvg")
    assert(plain.forall { case (_, y) => math.abs(y - 100.0) < 8.0 },
      "non-holiday forecasts stay near the base level")
  }

  test("country calendars: computus, nth-weekday rules, and the forecast lift (add_country_holidays)") {
    import graft.functions.holidays
    import java.time.LocalDate
    // Easter computus against known dates
    assert(holidays.easter(2024) == LocalDate.of(2024, 3, 31))
    assert(holidays.easter(2025) == LocalDate.of(2025, 4, 20))
    assert(holidays.easter(2026) == LocalDate.of(2026, 4, 5))
    // nth-weekday rules against known US holidays
    val byName = holidays.forYear("US", 2024).map { case (d, n) => n -> d }.toMap
    assert(byName("thanksgiving") == LocalDate.of(2024, 11, 28))
    assert(byName("memorial_day") == LocalDate.of(2024, 5, 27))
    assert(byName("mlk_day") == LocalDate.of(2024, 1, 15))
    assert(holidays.forYear("CL", 2024).toMap.get(LocalDate.of(2024, 3, 29))
      .contains("viernes_santo"), "Good Friday 2024 = Mar 29")
    intercept[IllegalArgumentException](holidays.forYear("XX", 2024))
    // observed-day rule (the `holidays` package behavior): a fixed-date
    // holiday on a weekend adds a shifted _observed entry, keeping the
    // actual date too; a weekday year adds none
    val us2026 = holidays.forYear("US", 2026).map { case (d, n) => n -> d }.toMap
    assert(us2026("independence_day") == LocalDate.of(2026, 7, 4), "Jul 4 2026 = Saturday")
    assert(us2026("independence_day_observed") == LocalDate.of(2026, 7, 3),
      "Saturday holiday observed the preceding Friday")
    val us2027 = holidays.forYear("US", 2027).map { case (d, n) => n -> d }.toMap
    assert(us2027("independence_day_observed") == LocalDate.of(2027, 7, 5),
      "Sunday holiday observed the following Monday")
    assert(!byName.keys.exists(_.endsWith("_observed")),
      "2024's fixed-date US holidays all fall on weekdays")
    // hi-end coverage: Jan 1 2028 is a Saturday, so its observed day is
    // 2027-12-31 — a calendar ENDING in 2027 must still include it
    val cal27 = holidays.calendar(spark, "US", 2022, 2027)
      .as[(Date, String)].collect()
    assert(cal27.contains((Date.valueOf("2027-12-31"), "new_years_day_observed")),
      "calendar must cover an observed day spilling back from the year after its span")
    assert(!cal27.exists(_._1.toLocalDate.getYear > 2027),
      "no rows beyond the requested span")
    // low-end symmetry: Jan 1 2022 was a Saturday, so its observed day
    // is 2021-12-31 — OUTSIDE the requested span and must be dropped,
    // mirroring the top-end filter
    assert(!cal27.exists(_._1.toLocalDate.getYear < 2022),
      "no rows before the requested span")
    // end-to-end: a July-4th bump learned from history lifts the
    // July-4th forecast when the horizon crosses it
    val start = LocalDate.of(2023, 6, 1)
    val daily = (0 until 397).map { x =>   // 2023-06-01 .. 2024-07-01
      val d = start.plusDays(x)
      val bump = if (d.getMonthValue == 7 && d.getDayOfMonth == 4) 50.0 else 0.0
      ("k1", Date.valueOf(d), 100.0 + bump)
    }.toDF("key", "ds", "y")
    val out = Forecast.forecastWithCountryHolidays(daily, Seq("key"), horizon = 7, "US")
      .select("ds", "yhat").as[(Date, Double)].collect()
    assert(out.length == 7)
    val jul4 = out.find(_._1.toLocalDate == LocalDate.of(2024, 7, 4)).get._2
    val rest = out.filter(_._1.toLocalDate != LocalDate.of(2024, 7, 4)).map(_._2)
    assert(jul4 - rest.max > 30.0, s"july 4th ($jul4) must lift above the rest (max ${rest.max})")
  }

  test("model frame round-trips through parquet and predicts identically (save/load_models)") {
    val daily = (0 until 28).map { x =>
      val d = java.time.LocalDate.of(2024, 1, 1).plusDays(x)
      val bump = if (d.getDayOfWeek == java.time.DayOfWeek.SUNDAY) 40.0 else 0.0
      ("k1", Date.valueOf(d), 100.0 + 1.5 * x + bump)
    }.toDF("key", "ds", "y")
    val direct = Forecast.forecastDaily(daily, Seq("key"), horizon = 7)
      .select("ds", "yhat").as[(Date, Double)].collect().toMap
    val dir = java.nio.file.Files.createTempDirectory("graft_model").toString
    Forecast.fitDailyModel(daily, Seq("key")).write.mode("overwrite").parquet(dir)
    val loaded = spark.read.parquet(dir)
    val fromModel = Forecast.predictFromModel(loaded, Seq("key"), horizon = 7)
      .select("ds", "yhat").as[(Date, Double)].collect().toMap
    assert(fromModel == direct, "persisted model must reproduce the direct forecast exactly")
  }

  test("changepoint hinges recover a planted two-slope trend (n_changepoints analog)") {
    // slope 1 until x=48, slope 4 after; knots at 16i (i=1..5, range 0.8,
    // span 100) so the break sits exactly ON a knot and the hinge basis
    // represents the truth exactly — OLS must recover it and the
    // forecast must extrapolate the FINAL slope, not the average.
    val break_ = 48
    def truth(x: Int): Double =
      if (x <= break_) 100.0 + 1.0 * x else 100.0 + break_ + 4.0 * (x - break_)
    val daily = (0 to 100).map { x =>
      ("k1", Date.valueOf(java.time.LocalDate.of(2023, 1, 1).plusDays(x)), truth(x))
    }.toDF("key", "ds", "y")
    val out = Forecast.forecastFourier(daily, Seq("key"), horizon = 10,
      weeklyOrder = 0, yearlyOrder = 0, changepoints = 5)
      .select("ds", "yhat").as[(Date, Double)].collect().sortBy(_._1.toString)
    assert(out.length == 10)
    out.foreach { case (ds, yhat) =>
      val x = java.time.temporal.ChronoUnit.DAYS.between(
        java.time.LocalDate.of(2023, 1, 1), ds.toLocalDate).toInt
      assert(math.abs(yhat - truth(x)) < 0.5, s"$ds: $yhat vs ${truth(x)}")
    }
    // a no-changepoint fit on the same series extrapolates the AVERAGE
    // slope and lands far below the final regime — the gap is the point
    val global = Forecast.forecastFourier(daily, Seq("key"), horizon = 10,
      weeklyOrder = 0, yearlyOrder = 0, changepoints = 0)
      .select("yhat").as[Double].collect()
    assert(global.max < out.map(_._2).min - 10.0,
      "global-slope fit must underestimate a late trend break")
  }

  test("changepointRidge shrinks hinges toward the global-slope fit (changepoint_prior_scale)") {
    val daily = (0 to 100).map { x =>
      val y = if (x <= 48) 100.0 + x else 148.0 + 4.0 * (x - 48)
      ("k1", Date.valueOf(java.time.LocalDate.of(2023, 1, 1).plusDays(x)), y)
    }.toDF("key", "ds", "y")
    val stiff = Forecast.forecastFourier(daily, Seq("key"), horizon = 7,
      weeklyOrder = 0, yearlyOrder = 0, changepoints = 5, changepointRidge = 1e12)
      .select("ds", "yhat").as[(Date, Double)].collect().toMap
    val global = Forecast.forecastFourier(daily, Seq("key"), horizon = 7,
      weeklyOrder = 0, yearlyOrder = 0, changepoints = 0)
      .select("ds", "yhat").as[(Date, Double)].collect().toMap
    stiff.foreach { case (ds, y) =>
      assert(math.abs(y - global(ds)) < 0.1,
        s"$ds: infinite ridge must reduce to the no-changepoint fit")
    }
  }

  test("single-knot piecewise forecast extrapolates the final slope (q38 path)") {
    // break exactly at 0.8·span (the knot): slope 2 before, 6 after —
    // the Cramer 3×3 with the hinge regressor fits it exactly.
    def truth(x: Int): Double =
      if (x <= 80) 100.0 + 2.0 * x else 100.0 + 160.0 + 6.0 * (x - 80)
    val daily = (0 to 100).map { x =>
      ("k1", Date.valueOf(java.time.LocalDate.of(2023, 1, 1).plusDays(x)), truth(x))
    }.toDF("key", "ds", "y")
    val out = Forecast.forecastPiecewise(daily, Seq("key"), horizon = 7)
      .select("ds", "yhat").as[(Date, Double)].collect().sortBy(_._1.toString)
    assert(out.length == 7)
    out.foreach { case (ds, yhat) =>
      val x = java.time.temporal.ChronoUnit.DAYS.between(
        java.time.LocalDate.of(2023, 1, 1), ds.toLocalDate).toInt
      assert(math.abs(yhat - truth(x)) < 1e-3, s"$ds: $yhat vs ${truth(x)}")
    }
  }

  test("growth='flat' holds the level instead of extrapolating the slope") {
    val rising = (0 until 28).map { x =>
      ("k1", Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(x)), 10.0 + 2.0 * x)
    }.toDF("key", "ds", "y")
    val flat = Forecast.forecastDaily(rising, Seq("key"), horizon = 7, growth = "flat")
      .select("yhat").as[Double].collect()
    val linear = Forecast.forecastDaily(rising, Seq("key"), horizon = 7)
      .select("yhat").as[Double].collect()
    assert(flat.max < linear.min,
      s"flat (max ${flat.max}) must stay below the linear extrapolation (min ${linear.min})")
    // constant series → flat forecast is exactly the level
    val const = (0 until 28).map { x =>
      ("k1", Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(x)), 100.0)
    }.toDF("key", "ds", "y")
    val out = Forecast.forecastDaily(const, Seq("key"), horizon = 7, growth = "flat")
      .select("yhat").as[Double].collect()
    out.foreach(y => assert(math.abs(y - 100.0) < 1e-6))
  }

  test("freq='H' steps hourly and fits hour-of-day seasonality (daily_seasonality)") {
    import java.sql.Timestamp
    val start = java.time.LocalDateTime.of(2024, 1, 1, 0, 0)
    // pure linear in hours → exact extrapolation on the hourly spine
    val linear = (0 until 168).map { i =>
      ("k1", Timestamp.valueOf(start.plusHours(i)), 50.0 + 0.5 * i)
    }.toDF("key", "ds", "y")
    val lOut = Forecast.forecastDaily(linear, Seq("key"), horizon = 24, freq = "H")
      .select("ds", "yhat").as[(Timestamp, Double)].collect().sortBy(_._1.getTime)
    assert(lOut.length == 24)
    lOut.zipWithIndex.foreach { case ((ts, yhat), j) =>
      assert(ts.toLocalDateTime == start.plusHours(168 + j), s"spine must step hours: $ts")
      assert(math.abs(yhat - (50.0 + 0.5 * (168 + j))) < 1e-6, s"$ts: $yhat")
    }
    // constant level + bump at noon → hour-of-day term catches the bump
    val bumped = (0 until 168).map { i =>
      val t = start.plusHours(i)
      ("k1", Timestamp.valueOf(t), 100.0 + (if (t.getHour == 12) 20.0 else 0.0))
    }.toDF("key", "ds", "y")
    val bOut = Forecast.forecastDaily(bumped, Seq("key"), horizon = 24, freq = "H")
      .select("ds", "yhat").as[(Timestamp, Double)].collect()
    val (noon, rest) = bOut.partition(_._1.toLocalDateTime.getHour == 12)
    assert(noon.length == 1 && rest.length == 23)
    assert(math.abs(noon.head._2 - 120.0) < 1.0, s"noon: ${noon.head._2}")
    rest.foreach { case (ts, y) => assert(math.abs(y - 100.0) < 1.0, s"$ts: $y") }
  }

  test("Fourier path composes bounds, intervals, and history like the simple path") {
    // noiseless trend+weekly sinusoid: perfect fit → σ=0 bands collapse;
    // include_history emits fitted values over the observed dates; cap
    // clamps the extrapolation.
    val start = java.time.LocalDate.of(2023, 1, 1)
    val epoch = java.time.LocalDate.of(1970, 1, 1)
    def truth(x: Long, t: Long): Double =
      100.0 + 0.5 * x + 5.0 * math.sin(2 * math.Pi * t / 7.0)
    val daily = (0 until 140).map { x =>
      val d = start.plusDays(x)
      val t = java.time.temporal.ChronoUnit.DAYS.between(epoch, d)
      ("k1", Date.valueOf(d), truth(x, t))
    }.toDF("key", "ds", "y")
    val out = Forecast.forecastFourier(daily, Seq("key"), horizon = 7,
      yearlyOrder = 0, includeIntervals = true, includeHistory = true)
      .select("ds", "yhat", "yhat_lower", "yhat_upper")
      .as[(Date, Double, Double, Double)].collect()
    assert(out.length == 147, "140 fitted history days + 7 future")
    out.foreach { case (ds, y, lo, hi) =>
      assert(math.abs(lo - y) < 1e-3 && math.abs(hi - y) < 1e-3,
        s"σ≈0 on a perfect fit → bands collapse at $ds")
      val x = java.time.temporal.ChronoUnit.DAYS.between(start, ds.toLocalDate)
      val t = java.time.temporal.ChronoUnit.DAYS.between(epoch, ds.toLocalDate)
      assert(math.abs(y - truth(x, t)) < 0.1, s"$ds: $y vs ${truth(x, t)}")
    }
    val capped = Forecast.forecastFourier(daily, Seq("key"), horizon = 7,
      yearlyOrder = 0, cap = Some(150.0))
      .select("yhat").as[Double].collect()
    assert(capped.forall(_ <= 150.0) && capped.exists(_ == 150.0),
      "rising series must hit the cap on the Fourier path too")
  }

  test("custom seasonality recovers a planted monthly cycle (add_seasonality analog)") {
    // y = 100 + 0.2x + 15·sin(2πt/30.5): neither weekly nor yearly terms
    // can express a 30.5-day period; the custom block must capture it.
    val start = java.time.LocalDate.of(2023, 1, 1)
    val epoch = java.time.LocalDate.of(1970, 1, 1)
    def truth(x: Long, t: Long): Double =
      100.0 + 0.2 * x + 15.0 * math.sin(2 * math.Pi * t / 30.5)
    val daily = (0 until 366).map { x =>
      val d = start.plusDays(x)
      val t = java.time.temporal.ChronoUnit.DAYS.between(epoch, d)
      ("k1", Date.valueOf(d), truth(x, t))
    }.toDF("key", "ds", "y")
    val out = Forecast.forecastFourier(daily, Seq("key"), horizon = 30,
      weeklyOrder = 0, yearlyOrder = 0, extraSeasonalities = Seq((30.5, 2)))
      .select("ds", "yhat").as[(Date, Double)].collect()
    out.foreach { case (ds, yhat) =>
      val x = java.time.temporal.ChronoUnit.DAYS.between(start, ds.toLocalDate)
      val t = java.time.temporal.ChronoUnit.DAYS.between(epoch, ds.toLocalDate)
      assert(math.abs(yhat - truth(x, t)) < 0.5, s"$ds: $yhat vs ${truth(x, t)}")
    }
    // without the custom block the monthly swing is invisible to the basis
    val plain = Forecast.forecastFourier(daily, Seq("key"), horizon = 30,
      weeklyOrder = 0, yearlyOrder = 0)
      .select("ds", "yhat").as[(Date, Double)].collect()
    val maxErr = plain.map { case (ds, yhat) =>
      val x = java.time.temporal.ChronoUnit.DAYS.between(start, ds.toLocalDate)
      val t = java.time.temporal.ChronoUnit.DAYS.between(epoch, ds.toLocalDate)
      math.abs(yhat - truth(x, t))
    }.max
    assert(maxErr > 5.0, "trend-only fit must miss the monthly cycle")
  }

  test("constant regressor falls back to the trend-only fit instead of emitting 0.0 (det guard)") {
    // r constant → 3×3 system singular; the guard must fall back to the
    // 2-parameter fit, reproducing the trend exactly — not yhat = 0.0.
    val daily = (0 until 21).map { x =>
      ("k1", Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(x)), 10.0 + 2.0 * x, 5.0)
    }.toDF("key", "ds", "y", "r")
    val out = Forecast.forecastWithRegressor(daily, Seq("key"), horizon = 7)
      .select("ds", "yhat").as[(Date, Double)].collect().sortBy(_._1.toString)
    assert(out.length == 7)
    out.zipWithIndex.foreach { case ((ds, yhat), i) =>
      val expected = 10.0 + 2.0 * (21 + i)
      assert(math.abs(yhat - expected) < 1e-6, s"$ds: $yhat vs $expected")
    }
  }

  test("Forecaster facade mirrors the reference call shape over a wide frame") {
    import graft.operators.Forecaster
    // wide frame: ds + two metric columns, one key column — the
    // reference's __init__(df, date_column) + forecast(days) shape
    val wide = (0 until 28).map { x =>
      ("c1", Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(x)),
        10.0 + 2.0 * x, 100.0)
    }.toDF("campaign", "ds", "revenue", "visits")
    val fc = new Forecaster(wide, dateCol = "ds", keyCols = Seq("campaign"))
    assert(fc.numericMetrics == Seq("revenue", "visits"))
    // metrics=None → every numeric column forecasts in one pass
    val out = fc.forecast(days = 7)
      .select("campaign", "metric", "ds", "yhat")
      .as[(String, String, Date, Double)].collect()
    assert(out.length == 14, "2 metrics x 7 days")
    out.filter(_._2 == "revenue").foreach { case (_, _, ds, y) =>
      val x = java.time.temporal.ChronoUnit.DAYS.between(
        java.time.LocalDate.of(2024, 1, 1), ds.toLocalDate)
      assert(math.abs(y - (10.0 + 2.0 * x)) < 1e-6)
    }
    out.filter(_._2 == "visits").foreach { case (_, _, _, y) =>
      assert(math.abs(y - 100.0) < 1e-6)
    }
    // round_decimals analog re-rounds the output
    val r0 = fc.forecast(days = 3, metrics = Some(Seq("revenue")), roundDecimals = Some(0))
      .select("yhat").as[Double].collect()
    assert(r0.forall(y => y == math.rint(y)), "round_decimals=0 must yield integers")
    // wide result pivots back to one column per metric
    val w = fc.forecastWide(days = 3)
    assert(w.columns.toSeq == Seq("campaign", "ds", "revenue", "visits") && w.count() == 3)
    // joint option combinations FIT (Prophet's one-model-over-all-
    // kwargs shape) instead of raising: regressor + yearly seasonality
    // runs the Gram-basis joint path and still returns a full horizon
    val joint = fc.forecast(days = 3, regressor = Some("visits"),
      metrics = Some(Seq("revenue")), yearlySeasonality = 3)
    assert(joint.count() == 3)
    // dispatch: flat growth holds the level through the facade too
    val flat = fc.forecast(days = 7, metrics = Some(Seq("revenue")), growth = "flat")
      .select("yhat").as[Double].collect()
    val linear = fc.forecast(days = 7, metrics = Some(Seq("revenue")))
      .select("yhat").as[Double].collect()
    assert(flat.max < linear.min)
    // weekly-only seasonality must dispatch to the Fourier path, not
    // silently drop the requested order
    val weeklyOnly = fc.forecast(days = 7, metrics = Some(Seq("revenue")),
      weeklySeasonality = Some(2))
    assert(weeklyOnly.count() == 7)
    // regressor + flat growth is a joint fit too: basis [1, r] — the
    // regressor still explains variance the flat level cannot
    val flatReg = fc.forecast(days = 3, regressor = Some("visits"),
      metrics = Some(Seq("revenue")), growth = "flat")
    assert(flatReg.count() == 3)
    // weekly_seasonality=Some(0) genuinely disables the weekly term:
    // on a pure linear series trend-only and default agree, and the
    // call must not throw (the old Int=0 conflated unset with off)
    val weeklyOff = fc.forecast(days = 3, metrics = Some(Seq("revenue")),
      weeklySeasonality = Some(0))
      .select("yhat").as[Double].collect()
    assert(weeklyOff.length == 3)
    weeklyOff.zipWithIndex.foreach { case (y, i) =>
      assert(math.abs(y - (10.0 + 2.0 * (28 + i))) < 1e-4, s"h=${i + 1}: $y")
    }
    // still refused loudly: contradictory option pairs
    intercept[IllegalArgumentException] {
      fc.forecast(days = 3, metrics = Some(Seq("revenue")), changepointRidge = 1.0)
    }
  }

  test("facade per-metric bounds, daily-seasonality control, regressor prior ridge") {
    import graft.operators.Forecaster
    // cap/floor as {metric: value} dicts (the reference accepts a
    // number OR a dict): two rising metrics, only `a` capped — metrics
    // group by effective bounds and fit in batched passes
    val wide = (0 until 28).map { x =>
      ("c1", Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(x)),
        10.0 + 2.0 * x, 10.0 + 2.0 * x)
    }.toDF("campaign", "ds", "a", "b")
    val fc = new Forecaster(wide, dateCol = "ds", keyCols = Seq("campaign"))
    val out = fc.forecast(days = 7, capByMetric = Map("a" -> 60.0))
      .select("metric", "ds", "yhat").as[(String, Date, Double)].collect()
    assert(out.length == 14)
    val aVals = out.filter(_._1 == "a").map(_._3)
    val bVals = out.filter(_._1 == "b").map(_._3)
    assert(aVals.max <= 60.0 + 1e-9 && aVals.contains(60.0), s"a must clamp at 60: ${aVals.toSeq}")
    assert(bVals.max > 70.0, s"b must keep rising uncapped: ${bVals.toSeq}")
    require(out.map(r => (r._1, r._2)).distinct.length == 14, "no dup (metric, ds) rows")
    // unknown metric names in the dict are refused
    intercept[IllegalArgumentException] {
      fc.forecast(days = 3, capByMetric = Map("nope" -> 1.0))
    }

    // daily_seasonality: Some(0) disables the hour-of-day block even at
    // freq='H'; auto (None) fits it — planted 24h cycle
    val hourly = (0 until 24 * 14).map { h =>
      val ts0 = java.time.LocalDateTime.of(2024, 1, 1, 0, 0).plusHours(h)
      ("k", java.sql.Timestamp.valueOf(ts0),
        100.0 + 20.0 * math.sin(2.0 * math.Pi * ts0.getHour / 24.0))
    }.toDF("key", "ds", "load")
    val fch = new Forecaster(hourly, dateCol = "ds", keyCols = Seq("key"))
    def swing(daily: Option[Int]): Double = {
      val ys = fch.forecast(days = 24, freq = "H", dailySeasonality = daily)
        .select("yhat").as[Double].collect()
      ys.max - ys.min
    }
    assert(swing(None) > 25.0, "auto must fit the 24h cycle at freq='H'")
    assert(swing(Some(0)) < 5.0, "Some(0) must disable the daily block")

    // per-regressor prior ridge (add_regressor prior_scale analog):
    // y = 5 + 3r; a tight ridge shrinks the coefficient so the forecast
    // stops tracking the future regressor spike
    val rs = Seq(2.0, 7.0, 4.0, 9.0, 1.0, 6.0, 3.0, 8.0, 5.0, 2.5, 7.5, 4.5, 9.5, 1.5)
    val reg = rs.zipWithIndex.map { case (r, x) =>
      ("c1", Date.valueOf(java.time.LocalDate.of(2024, 2, 1).plusDays(x)), 5.0 + 3.0 * r, r)
    }.toDF("campaign", "ds", "sales", "spend")
    val futureR = (14 until 17).map { x =>
      ("c1", Date.valueOf(java.time.LocalDate.of(2024, 2, 1).plusDays(x)), 20.0)
    }.toDF("campaign", "ds", "r")
    val fcr = new Forecaster(reg, dateCol = "ds", keyCols = Seq("campaign"))
    def spikeYhat(ridge: Map[String, Double]): Double =
      fcr.forecast(days = 3, regressor = Some("spend"),
        futureRegressor = Some(futureR), regressorRidge = ridge)
        .select("yhat").as[Double].collect().head
    val loose = spikeYhat(Map.empty)
    val tight = spikeYhat(Map("spend" -> 1e9))
    assert(math.abs(loose - 65.0) < 1.0, s"unpenalized fit must track r=20: $loose")
    assert(tight < 40.0, s"tight regressor prior must stop tracking the spike: $tight")
    intercept[IllegalArgumentException] {
      fcr.forecast(days = 3, regressorRidge = Map("spend" -> 1.0))
    }
  }

  test("seasonality/holiday prior-scale ridges shrink their blocks toward zero") {
    import graft.operators.{Forecast, Forecaster}
    // flat 100 + 40 on promo days (4 in history, one in the horizon):
    // holidaysRidge is the holidays_prior_scale analog — tightening the
    // prior (larger ridge) shrinks the fitted promo effect monotonically
    val start = java.time.LocalDate.of(2024, 6, 2)
    val promos = Set(java.time.LocalDate.of(2024, 6, 5),
      java.time.LocalDate.of(2024, 6, 19), java.time.LocalDate.of(2024, 7, 3),
      java.time.LocalDate.of(2024, 7, 17), java.time.LocalDate.of(2024, 8, 1))
    val hist = (0 until 56).map { i =>
      val d = start.plusDays(i)
      ("k", Date.valueOf(d), if (promos(d)) 140.0 else 100.0)
    }.toDF("key", "ds", "y")
    val cal = promos.toSeq.sorted.map(d => (Date.valueOf(d), "promo")).toDF("ds", "holiday")
    // horizon Jul 28 – Aug 10: Aug 1 is the promo day, Aug 8 the
    // same-dow holiday-free control (flat trend → difference = effect)
    def promoEffect(ridge: Double): Double = {
      val m = Forecast.forecastFourier(hist, Seq("key"), horizon = 14,
        weeklyOrder = 1, yearlyOrder = 0, holidays = Some(cal),
        holidaysRidge = ridge)
        .select("ds", "yhat").as[(Date, Double)].collect().toMap
      m(Date.valueOf("2024-08-01")) - m(Date.valueOf("2024-08-08"))
    }
    val loose = promoEffect(0.0)
    val mid = promoEffect(10.0)
    val tight = promoEffect(1e6)
    assert(loose > 30.0, s"unpenalized promo effect: $loose")
    assert(mid > 2.0 && mid < loose - 5.0, s"mid ridge must shrink partially: $mid")
    assert(math.abs(tight) < 1.0, s"tight prior must crush the effect: $tight")

    // flat 100 + weekly sinusoid: seasonalityRidge flattens the
    // forecast's weekly swing the same way
    val seasonal = (0 until 56).map { i =>
      val d = start.plusDays(i)
      val phase = 2.0 * math.Pi * (d.toEpochDay % 7) / 7.0
      ("k", Date.valueOf(d), 100.0 + 10.0 * math.sin(phase))
    }.toDF("key", "ds", "y")
    def weeklySwing(ridge: Double): Double = {
      val ys = Forecast.forecastFourier(seasonal, Seq("key"), horizon = 7,
        weeklyOrder = 1, yearlyOrder = 0, seasonalityRidge = ridge)
        .select("yhat").as[Double].collect()
      ys.max - ys.min
    }
    assert(weeklySwing(0.0) > 15.0)
    assert(weeklySwing(1e6) < 1.0)

    // facade pass-through: the kwargs reach the joint fit, and
    // holidaysRidge without a calendar is refused
    val fc = new Forecaster(hist.withColumnRenamed("y", "sales"), keyCols = Seq("key"))
    val viaFacade = fc.forecast(days = 14, holidays = Some(cal), holidaysRidge = 1e6)
      .select("ds", "yhat").as[(Date, Double)].collect().toMap
    assert(math.abs(viaFacade(Date.valueOf("2024-08-01")) -
      viaFacade(Date.valueOf("2024-08-08"))) < 1.0)
    intercept[IllegalArgumentException] {
      fc.forecast(days = 3, holidaysRidge = 1.0)
    }
  }

  test("Forecaster facade fits custom holidays AND a country calendar in one model") {
    import graft.operators.Forecaster
    // Prophet merges the `holidays` frame WITH add_country_holidays
    // into one fit (ProphetForecaster.py:316-319 + :161) — the facade
    // must match a call where the caller pre-merged the calendars
    val start = java.time.LocalDate.of(2024, 6, 1)
    val wide = (0 until 56).map { x =>
      val d = start.plusDays(x)
      val promo = if (d.getDayOfMonth == 15) 30.0 else 0.0
      val july4 = if (d == java.time.LocalDate.of(2024, 7, 4)) 50.0 else 0.0
      ("c1", Date.valueOf(d), 100.0 + promo + july4)
    }.toDF("campaign", "ds", "sales")
    val fc = new Forecaster(wide, dateCol = "ds", keyCols = Seq("campaign"))
    // the custom calendar covers history AND the horizon, like
    // Prophet's holidays frame (history ends Jul 26; horizon runs
    // Jul 27 – Aug 16, so Aug 15 is the in-horizon promo day)
    val custom = (0 until 90).map(start.plusDays(_))
      .filter(_.getDayOfMonth == 15)
      .map(d => (Date.valueOf(d), "promo")).toDF("ds", "holiday")

    val both = fc.forecast(days = 21, holidays = Some(custom),
      countryHolidays = Some("US"))
      .select("ds", "yhat").as[(Date, Double)].collect().toMap
    // the facade derives the country span from the data + horizon:
    // freq=D, days=21 → one extra year past the max date
    val cal = graft.functions.holidays.calendar(spark, "US", 2024, 2025)
    val premerged = fc.forecast(days = 21,
      holidays = Some(custom.unionByName(cal)))
      .select("ds", "yhat").as[(Date, Double)].collect().toMap

    assert(both.keySet == premerged.keySet && both.size == 21)
    both.foreach { case (ds, y) =>
      assert(math.abs(y - premerged(ds)) < 1e-9, s"$ds: $y vs ${premerged(ds)}")
    }
    // the custom effect survives the merge: the in-horizon Aug 15
    // carries the promo lift over a plain baseline day
    val plain = both(Date.valueOf("2024-08-16"))
    assert(both(Date.valueOf("2024-08-15")) - plain > 20.0,
      s"promo lift missing: ${both(Date.valueOf("2024-08-15"))} vs $plain")
  }

  test("Forecaster facade expands a caller futureRegressor across melted metrics") {
    import graft.operators.Forecaster
    // y = 5 + 3r exactly; future r supplied per (key, ds) in the
    // documented shape — the facade must replicate it per metric
    val rs = Seq(2.0, 7.0, 4.0, 9.0, 1.0, 6.0, 3.0, 8.0, 5.0, 2.5, 7.5, 4.5, 9.5, 1.5)
    val wide = rs.zipWithIndex.map { case (r, x) =>
      ("c1", Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(x)), 5.0 + 3.0 * r, r)
    }.toDF("campaign", "ds", "sales", "spend")
    val futureR = (14 until 21).map { x =>
      ("c1", Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(x)), 4.0 + (x % 3))
    }.toDF("campaign", "ds", "r")
    val fc = new Forecaster(wide, dateCol = "ds", keyCols = Seq("campaign"))
    val out = fc.forecast(days = 7, regressor = Some("spend"),
      futureRegressor = Some(futureR))
      .select("ds", "yhat").as[(Date, Double)].collect().sortBy(_._1.toString)
    assert(out.length == 7)
    out.foreach { case (ds, yhat) =>
      val x = java.time.temporal.ChronoUnit.DAYS.between(
        java.time.LocalDate.of(2024, 1, 1), ds.toLocalDate)
      val expected = 5.0 + 3.0 * (4.0 + (x % 3))
      assert(math.abs(yhat - expected) < 1e-4, s"$ds: $yhat vs $expected")
    }
  }

  test("joint Gram fit recovers planted trend+sinusoid+regressor (one model, all options)") {
    // y = 2 + 0.5x + 3r + 10·sin(2πt/7) exactly — the joint basis
    // [1, x, sin, cos, r] spans it, so the per-key solve recovers every
    // coefficient and the future horizon reproduces the formula
    val rs = Seq(5.0, 9.0, 3.0, 7.0, 1.0, 8.0, 4.0, 6.0, 2.0, 9.5, 3.5, 7.5, 1.5, 8.5,
      4.5, 6.5, 2.5, 9.25, 0.5, 5.5, 10.0, 3.25, 6.75, 1.25, 8.25, 4.75, 7.25, 2.75)
    def sinAt(epochDay: Long): Double = math.sin(2.0 * math.Pi * epochDay / 7.0)
    val d0 = java.time.LocalDate.of(2024, 1, 1)
    val daily = rs.zipWithIndex.map { case (r, x) =>
      val d = d0.plusDays(x)
      ("k1", Date.valueOf(d), 2.0 + 0.5 * x + 3.0 * r + 10.0 * sinAt(d.toEpochDay), r)
    }.toDF("key", "ds", "y", "r")
    val futureR = (28 until 35).map { x =>
      ("k1", Date.valueOf(d0.plusDays(x)), 4.0 + (x % 3))
    }.toDF("key", "ds", "r")
    val out = Forecast.forecastFourier(daily, Seq("key"), horizon = 7,
      weeklyOrder = 1, yearlyOrder = 0,
      regressorCols = Seq("r"), futureReg = Some(futureR))
      .select("ds", "yhat").as[(Date, Double)].collect().sortBy(_._1.toString)
    assert(out.length == 7)
    out.foreach { case (ds, yhat) =>
      val x = java.time.temporal.ChronoUnit.DAYS.between(d0, ds.toLocalDate)
      val expected = 2.0 + 0.5 * x + 3.0 * (4.0 + (x % 3)) + 10.0 * sinAt(ds.toLocalDate.toEpochDay)
      assert(math.abs(yhat - expected) < 1e-3, s"$ds: $yhat vs $expected")
    }
    // missing future regressor values still fail loudly in the joint path
    val partial = (28 until 30).map { x =>
      ("k1", Date.valueOf(d0.plusDays(x)), 2.0)
    }.toDF("key", "ds", "r")
    val ex = intercept[Exception] {
      Forecast.forecastFourier(daily, Seq("key"), horizon = 7,
        weeklyOrder = 1, yearlyOrder = 0,
        regressorCols = Seq("r"), futureReg = Some(partial)).collect()
    }
    assert(ex.getMessage.contains("missing future value for regressor"))
  }

  test("joint fit adds holiday indicators to the basis (holidays + seasonality, one model)") {
    // y = 50 + x + 20·I(payday) + 8·sin(2πt/7): holiday effect and
    // weekly seasonality fit JOINTLY; future paydays lift by exactly 20
    val d0 = java.time.LocalDate.of(2024, 1, 1)
    def sinAt(epochDay: Long): Double = math.sin(2.0 * math.Pi * epochDay / 7.0)
    def isPay(d: java.time.LocalDate): Boolean = d.getDayOfMonth == 1 || d.getDayOfMonth == 15
    val daily = (0 until 56).map { x =>
      val d = d0.plusDays(x)
      val hol = if (isPay(d)) 20.0 else 0.0
      ("k1", Date.valueOf(d), 50.0 + x + hol + 8.0 * sinAt(d.toEpochDay))
    }.toDF("key", "ds", "y")
    // calendar covers history AND horizon, like Prophet's holidays frame
    val cal = (0 until 70).map(x => Date.valueOf(d0.plusDays(x)))
      .filter(d => isPay(d.toLocalDate)).map(d => (d, "payday")).toDF("ds", "holiday")
    val out = Forecast.forecastFourier(daily, Seq("key"), horizon = 14,
      weeklyOrder = 1, yearlyOrder = 0, holidays = Some(cal))
      .select("ds", "yhat").as[(Date, Double)].collect().sortBy(_._1.toString)
    assert(out.length == 14)
    out.foreach { case (ds, yhat) =>
      val x = java.time.temporal.ChronoUnit.DAYS.between(d0, ds.toLocalDate)
      val expected = 50.0 + x + (if (isPay(ds.toLocalDate)) 20.0 else 0.0) +
        8.0 * sinAt(ds.toLocalDate.toEpochDay)
      assert(math.abs(yhat - expected) < 1e-3, s"$ds: $yhat vs $expected")
    }
    assert(out.map(_._1.toLocalDate).count(isPay) >= 1, "horizon must include a payday")
    // the same combination through the facade (holidays + weekly
    // seasonality used to raise 'unsupported')
    import graft.operators.Forecaster
    val fc = new Forecaster(daily.withColumnRenamed("y", "sales"), keyCols = Seq("key"))
    val viaFacade = fc.forecast(days = 14, holidays = Some(cal),
      weeklySeasonality = Some(1))
      .select("ds", "yhat").as[(Date, Double)].collect().sortBy(_._1.toString)
    assert(viaFacade.length == 14)
    viaFacade.zip(out).foreach { case ((ds, a), (_, b)) =>
      assert(math.abs(a - b) < 1e-6, s"facade must run the same joint fit at $ds: $a vs $b")
    }
  }

  test("freq='W' fits yearly seasonality on a weekly series (freq unlock)") {
    // 156 weekly points over 3 years: span_days ≈ 1085 ≥ 730 opens the
    // yearly gate; y = 100 + 0.5x + 30·sin(2πt/365.25) recovers exactly
    val d0 = java.time.LocalDate.of(2021, 1, 4)
    def yearSin(epochDay: Long): Double = math.sin(2.0 * math.Pi * epochDay / 365.25)
    val weekly = (0 until 156).map { x =>
      val d = d0.plusWeeks(x)
      ("k1", Date.valueOf(d), 100.0 + 0.5 * x + 30.0 * yearSin(d.toEpochDay))
    }.toDF("key", "ds", "y")
    val out = Forecast.forecastFourier(weekly, Seq("key"), horizon = 8,
      weeklyOrder = 0, yearlyOrder = 1, freq = "W")
      .select("ds", "yhat").as[(Date, Double)].collect().sortBy(_._1.toString)
    assert(out.length == 8)
    out.zipWithIndex.foreach { case ((ds, yhat), i) =>
      assert(ds.toLocalDate == d0.plusWeeks(156 + i), s"spine must step 7 days: $ds")
      val expected = 100.0 + 0.5 * (156 + i) + 30.0 * yearSin(ds.toLocalDate.toEpochDay)
      assert(math.abs(yhat - expected) < 1e-2, s"$ds: $yhat vs $expected")
    }
  }

  test("freq='H' joint regressor fit steps hourly (freq unlock through the facade)") {
    // hourly wide frame, y = 10 + 0.5x + 2r; the facade's
    // regressor+freq combination runs the joint path, futureRegressor
    // joins on exact hour timestamps
    val t0 = java.time.LocalDateTime.of(2024, 3, 1, 0, 0)
    val rs = (0 until 96).map(x => 1.0 + (x * 7 % 11))
    val wide = rs.zipWithIndex.map { case (r, x) =>
      ("k1", java.sql.Timestamp.valueOf(t0.plusHours(x)), 10.0 + 0.5 * x + 2.0 * r, r)
    }.toDF("key", "ds", "sales", "spend")
    val futureR = (96 until 120).map { x =>
      ("k1", java.sql.Timestamp.valueOf(t0.plusHours(x)), 3.0 + (x % 5))
    }.toDF("key", "ds", "r")
    import graft.operators.Forecaster
    val fc = new Forecaster(wide, keyCols = Seq("key"))
    val out = fc.forecast(days = 24, freq = "H", regressor = Some("spend"),
      futureRegressor = Some(futureR), weeklySeasonality = Some(0))
      .select("ds", "yhat").as[(java.sql.Timestamp, Double)].collect()
      .sortBy(_._1.getTime)
    assert(out.length == 24)
    out.zipWithIndex.foreach { case ((ds, yhat), i) =>
      val x = 96 + i
      assert(ds.toLocalDateTime == t0.plusHours(x), s"spine must step 1 hour: $ds")
      val expected = 10.0 + 0.5 * x + 2.0 * (3.0 + (x % 5))
      assert(math.abs(yhat - expected) < 0.05, s"$ds: $yhat vs $expected")
    }
  }

  test("facade regressor dicts: standardize implemented, mode/prophet_kwargs refused loudly") {
    import graft.operators.Forecaster
    // y = 5 + 3r exactly; future spike r=20 — the per-regressor-dict
    // scenario (add_regressor(standardize=, mode=, prior_scale=))
    val rs = Seq(2.0, 7.0, 4.0, 9.0, 1.0, 6.0, 3.0, 8.0, 5.0, 2.5, 7.5, 4.5, 9.5, 1.5)
    val reg = rs.zipWithIndex.map { case (r, x) =>
      ("c1", Date.valueOf(java.time.LocalDate.of(2024, 2, 1).plusDays(x)), 5.0 + 3.0 * r, r)
    }.toDF("campaign", "ds", "sales", "spend")
    val futureR = (14 until 17).map { x =>
      ("c1", Date.valueOf(java.time.LocalDate.of(2024, 2, 1).plusDays(x)), 20.0)
    }.toDF("campaign", "ds", "r")
    val fc = new Forecaster(reg, dateCol = "ds", keyCols = Seq("campaign"))
    def run(std: Map[String, Boolean], ridge: Map[String, Double]): Double =
      fc.forecast(days = 3, regressor = Some("spend"), futureRegressor = Some(futureR),
        regressorStandardize = std, regressorRidge = ridge)
        .select("yhat").as[Double].collect().head
    // no prior: standardization is affine-invariant — same forecast
    assert(math.abs(run(Map("spend" -> true), Map.empty) - run(Map.empty, Map.empty)) < 1e-3)
    // same lambda, different scales: standardized spend (sigma ~2.8)
    // has x'x ~n while raw has ~n*sigma^2, so the standardized prior
    // shrinks the coefficient harder and tracks the r=20 spike less
    val stdM = run(Map("spend" -> true), Map("spend" -> 50.0))
    val rawM = run(Map.empty, Map("spend" -> 50.0))
    assert(stdM < rawM - 1.0, s"standardized prior must shrink harder: std=$stdM raw=$rawM")
    // per-regressor multiplicative mode: different fit space — loud
    val eMode = intercept[IllegalArgumentException] {
      fc.forecast(days = 3, regressor = Some("spend"), futureRegressor = Some(futureR),
        regressorMode = Map("spend" -> "multiplicative"))
    }
    assert(eMode.getMessage.contains("multiplicative"), eMode.getMessage)
    // prophet_kwargs never pass through; the error names each analog
    val eKw = intercept[IllegalArgumentException] {
      fc.forecast(days = 3,
        prophetKwargs = Map("mcmc_samples" -> "300", "changepoint_prior_scale" -> "0.1"))
    }
    assert(eKw.getMessage.contains("changepointRidge"), eKw.getMessage)
    assert(eKw.getMessage.contains("residual-sigma"), eKw.getMessage)
    // dict keys must name declared regressors
    intercept[IllegalArgumentException] {
      fc.forecast(days = 3, regressor = Some("spend"), futureRegressor = Some(futureR),
        regressorStandardize = Map("nope" -> true))
    }
  }

  test("facade fits MULTIPLE regressors jointly (repeated add_regressor)") {
    // y = 1 + 0.5x + 2·r1 + 3·r2 exactly; two regressors force the
    // joint Gram path (the Cramer 3×3 fits only one); the future frame
    // carries one column per regressor name
    val d0 = java.time.LocalDate.of(2024, 2, 1)
    val r1s = (0 until 30).map(x => 1.0 + (x * 3 % 7))
    val r2s = (0 until 30).map(x => 2.0 + (x * 5 % 11))
    val wide = (0 until 30).map { x =>
      ("k1", Date.valueOf(d0.plusDays(x)),
        1.0 + 0.5 * x + 2.0 * r1s(x) + 3.0 * r2s(x), r1s(x), r2s(x))
    }.toDF("key", "ds", "sales", "spend", "clicks")
    val futureR = (30 until 37).map { x =>
      ("k1", Date.valueOf(d0.plusDays(x)), 2.0 + (x % 4), 5.0 + (x % 3))
    }.toDF("key", "ds", "spend", "clicks")
    import graft.operators.Forecaster
    val fc = new Forecaster(wide, keyCols = Seq("key"))
    assert(fc.numericMetrics == Seq("sales", "spend", "clicks"))
    val out = fc.forecast(days = 7, regressors = Seq("spend", "clicks"),
      futureRegressor = Some(futureR), weeklySeasonality = Some(0))
      .select("metric", "ds", "yhat").as[(String, Date, Double)].collect()
    // regressors are excluded from metric auto-discovery
    assert(out.map(_._1).toSet == Set("sales"))
    out.sortBy(_._2.toString).zipWithIndex.foreach { case ((_, ds, yhat), i) =>
      val x = 30 + i
      val expected = 1.0 + 0.5 * x + 2.0 * (2.0 + (x % 4)) + 3.0 * (5.0 + (x % 3))
      assert(math.abs(yhat - expected) < 1e-3, s"$ds: $yhat vs $expected")
    }
  }

  test("4x4 Cramer joint fit recovers planted trend+regressor+holiday coefficients") {
    // y = 3 + 0.4x + 2r + 15·I(payday) exactly — the shared-formula
    // Cramer solve must recover all four coefficients; future paydays
    // (dayofmonth 1/15) lift by exactly 15
    val d0 = java.time.LocalDate.of(2024, 1, 3)
    def isPay(d: java.time.LocalDate): Boolean = d.getDayOfMonth == 1 || d.getDayOfMonth == 15
    val rs = (0 until 42).map(x => 1.0 + (x * 5 % 9))
    val daily = rs.zipWithIndex.map { case (r, x) =>
      val d = d0.plusDays(x)
      val h = if (isPay(d)) 1.0 else 0.0
      ("k1", Date.valueOf(d), 3.0 + 0.4 * x + 2.0 * r + 15.0 * h, r, h)
    }.toDF("key", "ds", "y", "r", "h")
    val rMean = rs.sum / rs.length
    val out = Forecast.forecastJointCramerFrame(daily, Seq("key"), horizon = 14)
      .select("ds", "yhat").as[(Date, Double)].collect().sortBy(_._1.toString)
    assert(out.length == 14)
    assert(out.map(_._1.toLocalDate).count(isPay) >= 1, "horizon must include a payday")
    out.foreach { case (ds, yhat) =>
      val x = java.time.temporal.ChronoUnit.DAYS.between(d0, ds.toLocalDate)
      val expected = 3.0 + 0.4 * x + 2.0 * rMean + (if (isPay(ds.toLocalDate)) 15.0 else 0.0)
      assert(math.abs(yhat - expected) < 1e-3, s"$ds: $yhat vs $expected")
    }
  }

  test("5x5 Cramer joint fit recovers planted trend+Fourier+regressor coefficients (the q43 shape)") {
    // y = 3 + 0.4x + 6 sin(2πx/7) + 4 cos(2πx/7) + 2r exactly — the
    // round-12 Cramer5 shared-formula solve must recover all FIVE
    // coefficients jointly; the future spine re-derives the Fourier
    // pair from x, so predictions replay the planted formula
    val d0 = java.time.LocalDate.of(2024, 1, 3)
    val omega = 2.0 * math.Pi / 7.0
    val rs = (0 until 42).map(x => 1.0 + (x * 5 % 9))
    val daily = rs.zipWithIndex.map { case (r, x) =>
      val y = 3.0 + 0.4 * x + 6.0 * math.sin(omega * x) + 4.0 * math.cos(omega * x) + 2.0 * r
      ("k1", Date.valueOf(d0.plusDays(x)), y, r)
    }.toDF("key", "ds", "y", "r")
    val rMean = rs.sum / rs.length
    val out = Forecast.forecastJointCramer5Frame(daily, Seq("key"), horizon = 14)
      .select("ds", "yhat").as[(Date, Double)].collect().sortBy(_._1.toString)
    assert(out.length == 14)
    out.foreach { case (ds, yhat) =>
      val x = java.time.temporal.ChronoUnit.DAYS.between(d0, ds.toLocalDate).toDouble
      val expected = 3.0 + 0.4 * x + 6.0 * math.sin(omega * x) + 4.0 * math.cos(omega * x) +
        2.0 * rMean
      assert(math.abs(yhat - expected) < 1e-3, s"$ds: $yhat vs $expected")
    }
    // degenerate guard: a constant regressor collapses the 5×5 — the
    // trend-only fallback engages instead of dividing by ~0
    val flat = (0 until 42).map { x =>
      ("k1", Date.valueOf(d0.plusDays(x)), 1.0 + 2.0 * x, 5.0)
    }.toDF("key", "ds", "y", "r")
    val fb = Forecast.forecastJointCramer5Frame(flat, Seq("key"), horizon = 3)
      .select("ds", "yhat").as[(Date, Double)].collect().sortBy(_._1.toString)
    fb.zipWithIndex.foreach { case ((ds, yhat), i) =>
      val expected = 1.0 + 2.0 * (42 + i)
      assert(math.abs(yhat - expected) < 1e-6, s"fallback $ds: $yhat vs $expected")
    }
  }

  test("6x6 Cramer joint fit recovers planted trend+weekly+yearly coefficients (the q19 shape)") {
    // y = 3 + 0.05x + 6 sin(wx) + 4 cos(wx) + 9 sin(yx) + 7 cos(yx)
    // exactly over 500 days (> one yearly period, so the yearly pair is
    // identified) — the round-12 Cramer6 shared-formula solve must
    // recover all SIX coefficients jointly
    val d0 = java.time.LocalDate.of(2023, 1, 2)
    val (ww, wy) = (2.0 * math.Pi / 7.0, 2.0 * math.Pi / 365.25)
    def truth(x: Double): Double =
      3.0 + 0.05 * x + 6.0 * math.sin(ww * x) + 4.0 * math.cos(ww * x) +
        9.0 * math.sin(wy * x) + 7.0 * math.cos(wy * x)
    val daily = (0 until 500).map { x =>
      ("k1", Date.valueOf(d0.plusDays(x)), truth(x))
    }.toDF("key", "ds", "y")
    val out = Forecast.forecastJointCramer6Frame(daily, Seq("key"), horizon = 14)
      .select("ds", "yhat").as[(Date, Double)].collect().sortBy(_._1.toString)
    assert(out.length == 14)
    out.foreach { case (ds, yhat) =>
      val x = java.time.temporal.ChronoUnit.DAYS.between(d0, ds.toLocalDate).toDouble
      assert(math.abs(yhat - truth(x)) < 1e-3, s"$ds: $yhat vs ${truth(x)}")
    }
    // degenerate guard: under 8 days of data the weekly pair is barely
    // sampled but the REAL degeneracy trigger is a short constant
    // series — span shorter than any yearly variation makes u ≈ 0 /
    // v ≈ 1 collinear with the intercept, so the trend-only fallback
    // engages instead of dividing by ~0
    val flat = (0 until 6).map { x =>
      ("k1", Date.valueOf(d0.plusDays(x)), 1.0 + 2.0 * x)
    }.toDF("key", "ds", "y")
    val fb = Forecast.forecastJointCramer6Frame(flat, Seq("key"), horizon = 3)
      .select("ds", "yhat").as[(Date, Double)].collect().sortBy(_._1.toString)
    fb.zipWithIndex.foreach { case ((ds, yhat), i) =>
      val expected = 1.0 + 2.0 * (6 + i)
      assert(math.abs(yhat - expected) < 1e-6, s"fallback $ds: $yhat vs $expected")
    }
  }

  test("growth='logistic' is a true saturating fit, not a clamp") {
    // planted logistic curve toward cap=100: z = logit(y/100) is exactly
    // linear in x, so the log-odds fit recovers the curve and the
    // forecast BENDS toward the cap — where a clamped linear trend
    // would overshoot the curve then flat-line at 100
    def curve(x: Int): Double = 100.0 / (1.0 + math.exp(-(x - 10) / 3.0))
    val daily = (0 until 20).map { x =>
      ("k1", Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(x)), curve(x))
    }.toDF("key", "ds", "y")
    val logistic = Forecast.forecastDaily(daily, Seq("key"), horizon = 7,
      cap = Some(100.0), growth = "logistic")
      .select("ds", "yhat").as[(Date, Double)].collect().sortBy(_._1.toString)
    assert(logistic.length == 7)
    logistic.zipWithIndex.foreach { case ((ds, yhat), i) =>
      val expected = curve(20 + i)
      assert(math.abs(yhat - expected) < 1e-3, s"$ds: $yhat vs $expected")
      assert(yhat < 100.0, "logistic fit stays strictly inside the cap")
    }
    // monotone approach to saturation
    assert(logistic.map(_._2).sliding(2).forall(p => p(0) < p(1)))
    // the clamp analog (linear + cap) overshoots the planted curve where
    // it is flattening: its late-horizon error must exceed the fit's
    val clamped = Forecast.forecastDaily(daily, Seq("key"), horizon = 7,
      cap = Some(100.0), growth = "linear")
      .select("ds", "yhat").as[(Date, Double)].collect().sortBy(_._1.toString)
    val errLogistic = math.abs(logistic.last._2 - curve(26))
    val errClamp = math.abs(clamped.last._2 - curve(26))
    assert(errLogistic < errClamp,
      s"saturating fit must beat the clamp near the cap: $errLogistic vs $errClamp")
    // the Fourier path shares the transform (same planted recovery)
    val viaFourier = Forecast.forecastFourier(daily, Seq("key"), horizon = 7,
      weeklyOrder = 0, yearlyOrder = 0, cap = Some(100.0), growth = "logistic")
      .select("ds", "yhat").as[(Date, Double)].collect().sortBy(_._1.toString)
    viaFourier.zipWithIndex.foreach { case ((ds, yhat), i) =>
      assert(math.abs(yhat - curve(20 + i)) < 1e-3, s"Fourier logistic $ds: $yhat")
    }
  }

  test("logistic intervals stay inside (floor, cap) and freq='MS' steps the Fourier spine") {
    // noisy logistic-ish series: bands transform through the sigmoid,
    // so they must bracket yhat AND stay strictly inside the bounds
    def curve(x: Int): Double = 100.0 / (1.0 + math.exp(-(x - 10) / 3.0))
    val noisy = (0 until 20).map { x =>
      val eps = if (x % 2 == 0) 1.5 else -1.5
      ("k1", Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(x)),
        math.min(99.0, math.max(1.0, curve(x) + eps)))
    }.toDF("key", "ds", "y")
    val out = Forecast.forecastDaily(noisy, Seq("key"), horizon = 7,
      cap = Some(100.0), growth = "logistic", includeIntervals = true)
      .select("yhat", "yhat_lower", "yhat_upper").as[(Double, Double, Double)].collect()
    assert(out.length == 7)
    out.foreach { case (y, lo, hi) =>
      assert(lo <= y && y <= hi, s"band must bracket yhat: $lo $y $hi")
      assert(lo > 0.0 && hi < 100.0,
        s"sigmoid-transformed bands stay strictly inside the bounds: $lo $hi")
    }
    // MS through the Fourier path: future spine steps by month
    val monthly = (0 until 24).map { x =>
      ("k1", Date.valueOf(java.time.LocalDate.of(2022, 1, 1).plusMonths(x)), 50.0 + 2.0 * x)
    }.toDF("key", "ds", "y")
    val ms = Forecast.forecastFourier(monthly, Seq("key"), horizon = 4,
      weeklyOrder = 0, yearlyOrder = 0, freq = "MS")
      .select("ds", "yhat").as[(Date, Double)].collect().sortBy(_._1.toString)
    ms.zipWithIndex.foreach { case ((ds, yhat), i) =>
      assert(ds.toLocalDate == java.time.LocalDate.of(2022, 1, 1).plusMonths(24 + i),
        s"spine must step one month: $ds")
      assert(math.abs(yhat - (50.0 + 2.0 * (24 + i))) < 1e-4, s"$ds: $yhat")
    }
  }

  test("multi-metric fan-out forecasts every metric per key") {
    val out = Forecast.forecastMulti(spark, sfDir)
    val keys = out.select("event_type", "metric").distinct().count()
    assert(keys == 10, "5 event types x 2 metrics") // click/error/purchase/signup/view
    assert(out.count() == 70)                        // x 7-day horizon
  }
}

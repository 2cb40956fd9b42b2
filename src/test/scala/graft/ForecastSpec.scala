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

  test("multi-metric fan-out forecasts every metric per key") {
    val out = Forecast.forecastMulti(spark, sfDir)
    val keys = out.select("event_type", "metric").distinct().count()
    assert(keys == 10, "5 event types x 2 metrics") // click/error/purchase/signup/view
    assert(out.count() == 70)                        // x 7-day horizon
  }
}

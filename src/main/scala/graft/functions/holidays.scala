package graft.functions

import java.time.{DayOfWeek, LocalDate}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Country holiday calendars — the `add_country_holidays` analog
  * (ProphetForecaster.py:161: `country_holidays='CL'|'US'|'MX'`, backed
  * by the public `holidays` package in the reference; its docstring
  * names exactly these three codes).
  *
  * Calendars are DETERMINISTIC closed-form rules, all public knowledge:
  * fixed dates, nth-weekday-of-month rules, and Easter-derived days via
  * the Anonymous Gregorian computus (public-domain algorithm). The
  * frame is generated driver-side — a few dozen rows per year, index
  * metadata like broadcast join keys — and feeds
  * [[graft.operators.Forecast.forecastWithHolidays]] as the broadcast
  * holiday dimension.
  */
object holidays {

  /** Gregorian Easter Sunday (Anonymous Gregorian computus). */
  def easter(year: Int): LocalDate = {
    val a = year % 19
    val b = year / 100
    val c = year % 100
    val d = b / 4
    val e = b % 4
    val f = (b + 8) / 25
    val g = (b - f + 1) / 3
    val h = (19 * a + b - d - g + 15) % 30
    val i = c / 4
    val k = c % 4
    val l = (32 + 2 * e + 2 * i - h - k) % 7
    val m = (a + 11 * h + 22 * l) / 451
    val month = (h + l - 7 * m + 114) / 31
    val day = ((h + l - 7 * m + 114) % 31) + 1
    LocalDate.of(year, month, day)
  }

  /** `n`-th `dow` of a month (n > 0: from the start; n < 0: from the
    * end — -1 = last). */
  def nthWeekday(year: Int, month: Int, dow: DayOfWeek, n: Int): LocalDate = {
    require(n != 0, "n must be nonzero")
    if (n > 0) {
      val first = LocalDate.of(year, month, 1)
      val offset = (dow.getValue - first.getDayOfWeek.getValue + 7) % 7
      first.plusDays(offset + 7L * (n - 1))
    } else {
      val last = LocalDate.of(year, month, 1).plusMonths(1).minusDays(1)
      val offset = (last.getDayOfWeek.getValue - dow.getValue + 7) % 7
      last.minusDays(offset + 7L * (-n - 1))
    }
  }

  /** Observed-day rule for FIXED-DATE holidays (the US federal rule,
    * which the reference's `holidays` package applies, and its MX
    * statutory analog): a holiday falling on Saturday is observed the
    * preceding Friday; on Sunday, the following Monday. Both rows are
    * emitted — the actual date keeps its name and the shifted day gets
    * `<name>_observed` — mirroring the package's "(observed)" entries,
    * so a forecast attributes effect to whichever day the data actually
    * moves on. nth-weekday holidays never land on weekends; CL has no
    * observed-day shifts (matching the package). A new-year observed
    * day can land in December of the PREVIOUS year — harmless extra
    * calendar row for the broadcast dimension. */
  private def withObserved(fixed: Seq[(LocalDate, String)]): Seq[(LocalDate, String)] =
    fixed.flatMap { case e @ (d, name) =>
      d.getDayOfWeek match {
        case DayOfWeek.SATURDAY => Seq(e, d.minusDays(1) -> s"${name}_observed")
        case DayOfWeek.SUNDAY   => Seq(e, d.plusDays(1) -> s"${name}_observed")
        case _                  => Seq(e)
      }
    }

  /** (date, holiday-name) pairs for one country and year. */
  def forYear(country: String, y: Int): Seq[(LocalDate, String)] = country.toUpperCase match {
    case "US" => withObserved(Seq(
      LocalDate.of(y, 1, 1) -> "new_years_day",
      LocalDate.of(y, 6, 19) -> "juneteenth",
      LocalDate.of(y, 7, 4) -> "independence_day",
      LocalDate.of(y, 11, 11) -> "veterans_day",
      LocalDate.of(y, 12, 25) -> "christmas_day")) ++ Seq(
      nthWeekday(y, 1, DayOfWeek.MONDAY, 3) -> "mlk_day",
      nthWeekday(y, 2, DayOfWeek.MONDAY, 3) -> "washingtons_birthday",
      nthWeekday(y, 5, DayOfWeek.MONDAY, -1) -> "memorial_day",
      nthWeekday(y, 9, DayOfWeek.MONDAY, 1) -> "labor_day",
      nthWeekday(y, 10, DayOfWeek.MONDAY, 2) -> "columbus_day",
      nthWeekday(y, 11, DayOfWeek.THURSDAY, 4) -> "thanksgiving")
    case "CL" => Seq(
      LocalDate.of(y, 1, 1) -> "ano_nuevo",
      easter(y).minusDays(2) -> "viernes_santo",
      easter(y).minusDays(1) -> "sabado_santo",
      LocalDate.of(y, 5, 1) -> "dia_del_trabajo",
      LocalDate.of(y, 5, 21) -> "glorias_navales",
      LocalDate.of(y, 7, 16) -> "virgen_del_carmen",
      LocalDate.of(y, 8, 15) -> "asuncion",
      LocalDate.of(y, 9, 18) -> "independencia",
      LocalDate.of(y, 9, 19) -> "glorias_del_ejercito",
      LocalDate.of(y, 10, 12) -> "encuentro_dos_mundos",
      LocalDate.of(y, 11, 1) -> "todos_los_santos",
      LocalDate.of(y, 12, 8) -> "inmaculada_concepcion",
      LocalDate.of(y, 12, 25) -> "navidad")
    case "MX" => withObserved(Seq(
      LocalDate.of(y, 1, 1) -> "ano_nuevo",
      LocalDate.of(y, 5, 1) -> "dia_del_trabajo",
      LocalDate.of(y, 9, 16) -> "dia_independencia",
      LocalDate.of(y, 12, 25) -> "navidad")) ++ Seq(
      nthWeekday(y, 2, DayOfWeek.MONDAY, 1) -> "dia_constitucion",
      nthWeekday(y, 3, DayOfWeek.MONDAY, 3) -> "natalicio_juarez",
      nthWeekday(y, 11, DayOfWeek.MONDAY, 3) -> "revolucion")
    case other => throw new IllegalArgumentException(
      s"unsupported country_holidays code '$other' (supported: US, CL, MX)")
  }

  /** Calendar frame (ds DATE, holiday STRING) spanning [fromYear,
    * toYear] — plug directly into `forecastWithHolidays`.
    *
    * Observed-day edge coverage is symmetric: year `toYear + 1` is also
    * generated so a Saturday new year observes on Dec 31 of `toYear`,
    * and every emitted row is then filtered to the requested
    * [fromYear, toYear] span — so a `fromYear` new year observing on
    * Dec 31 of `fromYear − 1` is dropped, exactly as the top end drops
    * `toYear + 1` dates. No row ever lies outside the span. */
  def calendar(spark: SparkSession, country: String,
               fromYear: Int, toYear: Int): DataFrame = {
    import spark.implicits._
    val rows =
      if (toYear < fromYear) Seq.empty[(java.sql.Date, String)]
      else (fromYear to toYear + 1)
        .flatMap(forYear(country, _))
        .filter { case (d, _) => d.getYear >= fromYear && d.getYear <= toYear }
        .map { case (d, n) => (java.sql.Date.valueOf(d), n) }
    rows.toDF("ds", "holiday")
  }
}

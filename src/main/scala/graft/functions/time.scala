package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Timezone / calendar helpers (reference: utc_converter.py:34 `convert`,
  * region map at utc_converter.py:8, day start/end modes).
  *
  * Timestamps flow through the engine as naive-UTC (TIMESTAMP_NTZ, session
  * tz UTC). Conversions use IANA zone ids via the built-in
  * `from_utc_timestamp`/`to_utc_timestamp` — codegen'd, no UDFs.
  */
object time {

  /** Region → IANA zone map (utc_converter.py:8 REGIONS). */
  val regions: Map[String, String] = Map(
    "chile"     -> "America/Santiago",
    "brasil"    -> "America/Sao_Paulo",
    "argentina" -> "America/Buenos_Aires",
    "peru"      -> "America/Lima",
    "colombia"  -> "America/Bogota",
    "uruguay"   -> "America/Montevideo",
    "mexico"    -> "America/Mexico_City"
  )

  def zoneOf(region: String): String =
    regions.getOrElse(region.toLowerCase, "America/Santiago")

  /** UTC instant → local wall-clock time in `region`. */
  def toLocal(utcTs: Column, region: String): Column =
    from_utc_timestamp(utcTs, zoneOf(region)).cast("timestamp_ntz")

  /** Local wall-clock in `region` → UTC instant. */
  def toUtc(localTs: Column, region: String): Column =
    to_utc_timestamp(localTs, zoneOf(region)).cast("timestamp_ntz")

  /** UTC instant of local midnight (mode="start", utc_converter.py:52). */
  def dayStartUtc(utcTs: Column, region: String): Column =
    toUtc(date_trunc("DAY", toLocal(utcTs, region)), region)

  /** UTC instant of local 23:59:59 (mode="end", utc_converter.py:54). */
  def dayEndUtc(utcTs: Column, region: String): Column =
    toUtc(date_trunc("DAY", toLocal(utcTs, region)) + expr("INTERVAL 23 HOURS 59 MINUTES 59 SECONDS"), region)

  /** Inclusive daily date spine between two date columns (the Spark-native
    * replacement for the reference's per-day extraction loops,
    * Google_GA4.py:230). Produces `array<date>` — explode to get rows. */
  def dateSpine(lo: Column, hi: Column): Column =
    sequence(lo, hi, expr("INTERVAL 1 DAY"))

  /** N-day chunk windows covering [lo, hi] inclusive — the declarative
    * analog of the reference's chunked-extraction loops
    * (tiktok_marketing.py:288 `current_end = min(current_start + 29
    * days, end_dt)` with a 30-day API limit). Produces
    * `array<struct<win_start, win_end>>`; explode to drive one
    * extraction partition per window. The last window truncates at
    * `hi`, exactly like the reference's `min(...)`. */
  def dateWindows(lo: Column, hi: Column, days: Int): Column = {
    require(days >= 1, s"window size must be >= 1 day, got $days")
    transform(sequence(lo, hi, expr(s"INTERVAL $days DAYS")),
      s => struct(s.as("win_start"), least(date_add(s, days - 1), hi).as("win_end")))
  }
}

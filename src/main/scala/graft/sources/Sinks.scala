package graft.sources

import graft.functions.text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** E-block sink write-disposition semantics — the Spark-native analog of
  * the reference's two sinks:
  *
  *  - BigQuery day-partitioned upload (Google_Bigquery.py:82 `upload`):
  *    a driver loop over unique dates writing one table per date with
  *    `if_exists="replace"|"append"`, optionally cleaning column names
  *    first (`dataframe_clean_cols`, :57).
  *  - Google Sheets range writes (Google_Spreadsheet.py:93
  *    `update_data` = overwrite the range in place, :104 `append_data`
  *    = append below it).
  *
  * Both collapse to ONE write disposition concept: replace-what-you-
  * carry vs append. The Spark realization of the per-date replace loop
  * is a single partitioned write under DYNAMIC partition overwrite —
  * only the partitions present in the incoming frame are replaced,
  * untouched dates keep their data, and the "loop" is distributed
  * instead of N driver-side uploads. At 100 TB that is the difference
  * between one shuffle-free columnar write and thousands of serial
  * table loads.
  */
object Sinks {

  /** Write `df` partitioned by `dateCol` with BigQuery-style
    * disposition:
    *
    *  - `ifExists="replace"`: dynamic partition overwrite — exactly the
    *    reference's date-by-date `to_gbq(if_exists="replace")`: dates
    *    present in `df` are replaced wholesale, absent dates are left
    *    alone (NOT truncated, unlike a static overwrite);
    *  - `ifExists="append"`: rows append into their date partitions.
    *
    * `clean=true` applies the reference's `dataframe_clean_cols`
    * column-name normalization before writing, like `upload(clean=
    * True)`. `maxRecordsPerFile` bounds output file size (SURVEY §5). */
  def writeDayPartitioned(df: DataFrame, path: String, dateCol: String,
                          ifExists: String = "replace", clean: Boolean = true,
                          maxRecordsPerFile: Long = 5000000L): Unit = {
    require(Set("replace", "append").contains(ifExists),
      s"ifExists must be replace or append, got $ifExists")
    val cleaned = if (clean) text.cleanColumnNames(df) else df
    val dc = if (clean) text.cleanNameStr(dateCol) else dateCol
    require(cleaned.columns.contains(dc), s"date column $dc not in ${cleaned.columns.mkString(",")}")
    val writer = cleaned.write
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(dc)
    (if (ifExists == "replace") writer.mode("overwrite") else writer.mode("append"))
      .parquet(path)
  }

  /** Sheets `update_data` analog: overwrite one "range" (= one keyed
    * slice of the sink, e.g. a report tab) in place. Realized as a
    * constant-key partition so updates and appends address the same
    * layout: overwriting range R replaces exactly R's partition. */
  def updateRange(df: DataFrame, path: String, range: String): Unit =
    df.withColumn("_range", lit(range))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("_range")
      .parquet(path)

  /** Sheets `append_data` analog: append rows below the range. */
  def appendRange(df: DataFrame, path: String, range: String): Unit =
    df.withColumn("_range", lit(range))
      .write.mode("append")
      .partitionBy("_range")
      .parquet(path)

  /** Read a "range" back (Google_Spreadsheet.py:33
    * `read_data_dataframe`). */
  def readRange(spark: org.apache.spark.sql.SparkSession, path: String,
                range: String): DataFrame =
    spark.read.parquet(path).filter(col("_range") === range).drop("_range")
}

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

  /** Small-files compaction for the day-partitioned lake: rewrite ONLY
    * the date partitions whose file count exceeds what their row count
    * justifies (> ceil(rows / targetRecordsPerFile) + slack), leaving
    * every healthy partition's files untouched — at 100 TB the lake is
    * mostly cold healthy dates, and a compactor that rewrites them all
    * is itself the incident.
    *
    * Fragmentation is the append dispositions' debt: every
    * `ifExists="append"` batch and every streaming micro-batch lands
    * at least one file per partition it touches. This pass restores
    * scan efficiency (file-open cost, splittable sizes) without
    * changing a single row — spec asserts bit-identical content and
    * untouched-partition file identity.
    *
    * Returns the rewritten partition values (empty = lake was already
    * compact). Run it on a maintenance cadence, not per batch. */
  def compactDayPartitions(spark: org.apache.spark.sql.SparkSession,
                           path: String, dateCol: String,
                           targetRecordsPerFile: Long = 5000000L,
                           slackFiles: Int = 0): Seq[String] = {
    require(targetRecordsPerFile > 0, "targetRecordsPerFile must be positive")
    val lake = spark.read.parquet(path)
    require(lake.columns.contains(dateCol), s"$dateCol not in ${lake.columns.mkString(",")}")
    // per-partition health census: one scan, file identity via the
    // scan-time input file name (projected to an attribute first —
    // nondeterministic expressions may not sit inside an aggregate)
    val census = lake
      .withColumn("_f", input_file_name())
      .groupBy(col(dateCol).cast("string").as("_d"))
      .agg(count(lit(1)).as("_rows"),
        countDistinct(col("_f")).as("_files"))
      .withColumn("_need", ceil(col("_rows").cast("double") / targetRecordsPerFile))
      .filter(col("_files") > col("_need") + slackFiles)
      .select(col("_d")).collect().map(_.getString(0)).toSeq
    if (census.nonEmpty) {
      // rewrite only the fragmented dates: dynamic partition overwrite
      // replaces exactly these, coalesced to the justified file count
      val frag = lake.filter(col(dateCol).cast("string").isin(census: _*))
        .repartition(col(dateCol)) // one task group per date, then maxRecordsPerFile splits
        .localCheckpoint()         // the write reads the files it replaces
      writeDayPartitioned(frag, path, dateCol, ifExists = "replace",
        clean = false, maxRecordsPerFile = targetRecordsPerFile)
    }
    census.sorted
  }

  /** Lake completeness census: which dates in [fromDate, toDate]
    * (inclusive) have NO partition in the lake — the freshness check a
    * per-day extraction pipeline runs before trusting a range query
    * (the A4 date spine pointed at the sink instead of the source).
    * Spine anti-join; the spine is `datediff` rows, the lake side
    * reduces to its distinct dates before joining. */
  def missingDates(spark: org.apache.spark.sql.SparkSession, path: String,
                   dateCol: String, fromDate: String, toDate: String): DataFrame = {
    val spine = spark.range(1).select(explode(sequence(
      lit(fromDate).cast("date"), lit(toDate).cast("date"))).as("expected_date"))
    val present = spark.read.parquet(path)
      .select(col(dateCol).cast("date").as("expected_date")).distinct()
    spine.join(present, Seq("expected_date"), "left_anti")
      .orderBy(col("expected_date"))
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

  /** E4: RANGE-SORTED write — the data-skipping layout for key-filtered
    * scans, the third layout lever next to day partitioning (prunes by
    * date) and bucketing (co-locates joins). `repartitionByRange` +
    * `sortWithinPartitions` clusters each key's rows into one narrow
    * key range per file, so parquet's per-row-group min/max stats let
    * a pushed `key = x` / `key BETWEEN a AND b` filter skip everything
    * else AT THE SCAN — on a 100 TB table the difference between "read
    * one row group" and "read the table and filter". An unsorted
    * layout defeats the same stats silently: every row group spans
    * nearly the full key range, so nothing prunes and the scan's row
    * count is the table's (spec-asserted both ways — the contract is
    * measured, not assumed).
    *
    * `numFiles` sizes the range partitions (range boundaries come from
    * a sample pass — that is `repartitionByRange`'s documented
    * behavior and exactly what a layout pass wants). Composes with
    * [[writeDayPartitioned]]: partition by day first, range-sort the
    * keys within each day's writer. */
  def writeRangeSorted(df: DataFrame, path: String, sortCols: Seq[String],
                       numFiles: Int = 8): Unit = {
    require(sortCols.nonEmpty, "writeRangeSorted needs at least one sort column")
    require(numFiles > 0, s"numFiles must be positive, got $numFiles")
    df.repartitionByRange(numFiles, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode("overwrite").parquet(path)
  }

  /** E5: JSONL shard export — the dataset-interchange format every
    * training stack ingests (Hugging Face datasets, webdataset-style
    * loaders, eval harnesses): newline-delimited JSON in bounded,
    * compressed shard files. `maxRecordsPerFile` bounds shard size
    * WITHOUT a repartition (Spark rolls files within each task), so
    * the export is shuffle-free and parallel; gzip is the interchange
    * default (splittability doesn't matter — the shard IS the split).
    * Read back with [[readJsonl]], passing the schema so ingestion
    * never pays the inference scan and types survive exactly. */
  def writeJsonlShards(df: DataFrame, path: String,
                       maxRecordsPerFile: Int = 100000,
                       compression: String = "gzip"): Unit = {
    require(maxRecordsPerFile > 0,
      s"maxRecordsPerFile must be positive, got $maxRecordsPerFile")
    df.write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile.toLong)
      .option("compression", compression)
      .json(path)
  }

  /** Schema-pinned JSONL read (the [[writeJsonlShards]] round trip):
    * inference on JSONL both costs a full extra pass and widens types
    * (ints to longs, dates to strings) — production ingestion pins the
    * schema. */
  def readJsonl(spark: org.apache.spark.sql.SparkSession, path: String,
                schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Sheets `delete_data` analog (Google_Spreadsheet.py:49): the
    * reference issues an `updateCells` request that CLEARS the
    * addressed cells' values in place — nothing shifts. Three modes,
    * same names and index conventions (0-based start inclusive, end
    * exclusive):
    *
    *  - `vector="ALL"`: clear the whole range — the partition's data
    *    is removed (a values-table has no empty-grid residue to keep);
    *  - `vector="ROWS"`: clear rows [startIndex, endIndex) BY ROW
    *    POSITION — a sheet has an intrinsic row order, a distributed
    *    table does not, so the caller names it via `orderBy` (refused
    *    loudly when missing); a full-row hash breaks residual ties so
    *    the deleted set is deterministic under recomputation;
    *  - `vector="COLUMNS"`: clear columns [startIndex, endIndex) by
    *    SCHEMA POSITION — values become NULL, rows and schema stay
    *    (exactly the `userEnteredValue`-fields clear).
    *
    * Other ranges in the sink are never touched: ALL drops one
    * partition directory, ROWS/COLUMNS rewrite one partition under
    * dynamic overwrite. Scale note: a "range" models a report tab
    * (sheet-sized by construction); the positional-row window is
    * per-range and fine at that size — bulk lake deletes belong to
    * predicate-based rewrites, not this operator. */
  def deleteRange(spark: org.apache.spark.sql.SparkSession, path: String,
                  range: String, vector: String = "ALL",
                  startIndex: Option[Int] = None, endIndex: Option[Int] = None,
                  orderBy: Seq[String] = Nil): Unit = {
    require(Set("ALL", "ROWS", "COLUMNS").contains(vector.toUpperCase),
      s"vector must be ALL|ROWS|COLUMNS, got $vector")
    vector.toUpperCase match {
      case "ALL" =>
        val dir = new org.apache.hadoop.fs.Path(path,
          "_range=" + org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
            .escapePathName(range))
        val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
        fs.delete(dir, true)
        ()
      case "ROWS" =>
        require(orderBy.nonEmpty,
          "deleteRange(vector=ROWS) needs orderBy: a distributed table has no " +
            "intrinsic row order — name the columns that define sheet order")
        val (lo, hi) = (startIndex.getOrElse(0), endIndex.getOrElse(Int.MaxValue))
        // same loud contract as COLUMNS: a negative start with the
        // default end would keep NOTHING and fall through to the
        // partition drop — a caller typo must not wipe a sheet
        require(lo >= 0 && lo < hi,
          s"row range [$lo, $hi) must satisfy 0 <= start < end")
        val cur = readRange(spark, path, range)
        val w = org.apache.spark.sql.expressions.Window.orderBy(
          orderBy.map(col(_).asc) :+ xxhash64(struct(cur.columns.map(col): _*)).asc: _*)
        val kept = cur
          .withColumn("_pos", row_number().over(w) - 1)
          .filter(col("_pos") < lo || col("_pos") >= hi)
          .drop("_pos")
          .localCheckpoint() // the rewrite replaces the files it reads
        // a zero-row dynamic overwrite replaces nothing — deleting
        // every row must fall through to the partition drop
        if (kept.isEmpty) deleteRange(spark, path, range, "ALL")
        else updateRange(kept, path, range)
      case "COLUMNS" =>
        val cur = readRange(spark, path, range)
        val (lo, hi) = (startIndex.getOrElse(0), endIndex.getOrElse(cur.columns.length))
        require(lo >= 0 && hi <= cur.columns.length && lo < hi,
          s"column range [$lo, $hi) out of bounds for ${cur.columns.length} columns")
        val cleared = cur.select(cur.columns.zipWithIndex.map { case (c, i) =>
          if (i >= lo && i < hi) lit(null).cast(cur.schema(i).dataType).as(c)
          else col(c)
        }: _*).localCheckpoint()
        updateRange(cleared, path, range)
    }
  }
}

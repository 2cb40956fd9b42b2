package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table co-location (SURVEY §5 "co-locate joins via bucketing").
  *
  * Writing both sides of a recurring join bucketed by the join key on the
  * same bucket count lets every subsequent join (and groupBy on that key)
  * run with ZERO exchanges — at 100 TB the one-time bucketed write
  * replaces a per-query shuffle of the fact table. The LSH-bucketed
  * corpus of the ANN path (Similarity.annLsh) is the same idea: bucket
  * once, reuse across query batches.
  */
object Bucketing {

  /** Persist `df` as a bucketed (and optionally sorted) managed table.
    * Idempotent: drops any existing table and clears a stale managed
    * location left by a previous JVM (the in-memory catalog forgets
    * tables on restart but their files remain in the warehouse dir). */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
                    numBuckets: Int, sortByKeys: Boolean = true): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(s"$warehouse/$table")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    val w = df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
    (if (sortByKeys) w.sortBy(keys.head, keys.tail: _*) else w)
      .format("parquet")
      .saveAsTable(table) // managed table under spark.sql.warehouse.dir
  }

  /** Join two tables bucketed on `keys` with the same bucket count: the
    * planner sees matching output partitionings and elides both
    * exchanges (verified in BucketingSpec). */
  def coLocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                    keys: Seq[String]): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), keys)

  /** E6: compact a bucketed table fragmented by streaming appends —
    * every `saveAsTable(Append)` trigger adds one file per bucket per
    * task, so a day of D2-stream ingest turns each bucket into hundreds
    * of small files while the index's zero-exchange probe property
    * still rides on the table staying BUCKETED. The day-partition
    * compactor (E3) can't help: a plain parquet rewrite loses the
    * bucket spec, and with it every downstream exchange elision.
    *
    * This one rewrites the table THROUGH its own catalog bucket spec
    * (same keys, same count, sorted when the spec says so), so the
    * compacted table is plan-indistinguishable from the original —
    * probes stay no-exchange (spec-asserted) and param metadata on
    * columns survives (it lives in the schema, which the rewrite
    * carries).
    *
    * Health census first: compaction only runs when the file count
    * exceeds numBuckets · targetFilesPerBucket + slack — an idempotent
    * no-op on a healthy table, so it can run on a schedule.
    *
    * Swap protocol (the same staged-then-rename trade as
    * `compactKllPartials`): write `table__compact`, then RENAME the
    * original away, RENAME the staging in, DROP the old. The two
    * renames are each metadata-only but not jointly atomic: a crash
    * between them leaves the data intact under `table__old` — recovery
    * is one RENAME, never a data loss. (A transactional table format
    * owns this window in production; this library is deliberately
    * dependency-free.)
    *
    * @return true when a rewrite happened, false for the healthy no-op */
  def compactBucketed(spark: SparkSession, table: String,
                      targetFilesPerBucket: Int = 1, slackFiles: Int = 0): Boolean = {
    import org.apache.spark.sql.functions.{col, countDistinct, input_file_name, lit}
    val ident = org.apache.spark.sql.catalyst.TableIdentifier(table)
    val meta = spark.sessionState.catalog.getTableMetadata(ident)
    val spec = meta.bucketSpec.getOrElse(throw new IllegalArgumentException(
      s"table '$table' carries no bucket spec — compactBucketed exists to PRESERVE " +
        "bucketing; use the day-partition compactor for plain tables"))
    val nFiles = spark.table(table).select(input_file_name().as("_f"))
      .agg(countDistinct(col("_f")).as("n")).head().getLong(0)
    val budget = spec.numBuckets.toLong * targetFilesPerBucket + slackFiles
    if (nFiles <= budget) return false
    // materialize BEFORE touching the catalog: the rewrite reads the
    // very files the swap retires
    val frozen = spark.table(table).localCheckpoint()
    val staging = s"${table}__compact"
    val old = s"${table}__old"
    spark.sql(s"DROP TABLE IF EXISTS `$staging`")
    spark.sql(s"DROP TABLE IF EXISTS `$old`")
    val w = frozen
      // one task per bucket key-group keeps output at ~targetFilesPerBucket
      .repartition(spec.numBuckets, spec.bucketColumnNames.map(col): _*)
      .write.mode(SaveMode.Overwrite)
      .bucketBy(spec.numBuckets,
        spec.bucketColumnNames.head, spec.bucketColumnNames.tail: _*)
    (if (spec.sortColumnNames.nonEmpty)
       w.sortBy(spec.sortColumnNames.head, spec.sortColumnNames.tail: _*)
     else w)
      .format("parquet").saveAsTable(staging)
    spark.sql(s"ALTER TABLE `$table` RENAME TO `$old`")
    spark.sql(s"ALTER TABLE `$staging` RENAME TO `$table`")
    spark.sql(s"DROP TABLE `$old`")
    spark.catalog.refreshTable(table)
    true
  }
}

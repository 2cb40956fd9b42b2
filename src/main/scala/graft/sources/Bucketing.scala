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
}

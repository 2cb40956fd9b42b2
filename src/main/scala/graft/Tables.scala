package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Typed accessors for the star-schema parquet directory (TESTDATA.md).
  *
  * All readers are plain `spark.read.parquet` so Catalyst keeps full
  * pushdown freedom: filters and column pruning in downstream operators
  * reach the scan (`PushedFilters`/`ReadSchema` — verified in PlanSpec).
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def read(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame   = read("region")
  def nation: DataFrame   = read("nation")
  def customer: DataFrame = read("customer")
  def supplier: DataFrame = read("supplier")
  def part: DataFrame     = read("part")
  def orders: DataFrame   = read("orders")
  def lineitem: DataFrame = read("lineitem")

  /** `events` carries parquet TIMESTAMP(NANOS); with
    * `spark.sql.legacy.parquet.nanosAsLong=true` it reads as int64 nanos.
    * Normalize to a microsecond TIMESTAMP_NTZ via floor division — the
    * same ns→us truncation DuckDB applies, so oracle comparisons line up.
    */
  def events: DataFrame = {
    val raw = read("events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)").cast("timestamp_ntz"))
      case _ =>
        raw.withColumn("ts", col("ts").cast("timestamp_ntz"))
    }
  }

  def documents: DataFrame  = read("documents")
  def embeddings: DataFrame = read("embeddings")
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A16 — schema-from-file apply + safe coercion (reference:
  * utils `load_schema_from_csv` + pandas `to_numeric(errors="coerce")` /
  * `to_datetime` coercions at ProphetForecaster.py:103-108).
  *
  * The schema file is a two-column CSV `column,type` with Spark DDL type
  * names. Coercion uses `try_cast` semantics: unparseable values become
  * NULL instead of failing the job — the distributed twin of
  * `errors="coerce"`.
  */
object Schemas {

  /** Load `name -> ddlType` pairs from a CSV schema file. */
  def loadSchemaCsv(spark: SparkSession, path: String): Seq[(String, String)] = {
    val df = spark.read.option("header", "true").csv(path)
    df.select(col("column"), col("type")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
  }

  /** Apply a declared schema to `df`: every listed column is try_cast to
    * its declared type (missing columns are added as NULL); unlisted
    * columns pass through unchanged. */
  def applySchema(df: DataFrame, schema: Seq[(String, String)]): DataFrame = {
    val declared = schema.toMap
    val existing = df.columns.toSet
    val casted = df.columns.toSeq.map { c =>
      declared.get(c) match {
        case Some(t) => try_cast(col(c), t).as(c)
        case None    => col(c)
      }
    }
    val missing = schema.collect {
      case (name, t) if !existing.contains(name) => lit(null).cast(t).as(name)
    }
    df.select(casted ++ missing: _*)
  }

  private def try_cast(c: org.apache.spark.sql.Column, t: String): org.apache.spark.sql.Column =
    c.try_cast(t)

  /** Convenience: load the CSV and apply it in one call. */
  def applySchemaFromCsv(spark: SparkSession, df: DataFrame, path: String): DataFrame =
    applySchema(df, loadSchemaCsv(spark, path))
}

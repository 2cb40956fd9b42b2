package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A16 — schema-from-file apply + safe coercion (reference:
  * utils.py:11 `load_schema_from_csv` + pandas `to_numeric(errors=
  * "coerce")` / `to_datetime` coercions at ProphetForecaster.py:103-108).
  *
  * Mirrors the reference's CSV contract: a `name` (or `nombre`) column
  * and a `type` (or `tipo`) column, types case-insensitive and allowed
  * to be BigQuery-style (STRING/INTEGER/FLOAT/TIMESTAMP…), which map to
  * Spark types. Coercion uses `try_cast` semantics: unparseable values
  * become NULL instead of failing the job — the distributed twin of
  * `errors="coerce"`.
  */
object Schemas {

  /** BigQuery-style → Spark DDL type mapping (utils.py:47 uppercases the
    * declared type; unknown names pass through lowercased as Spark DDL). */
  def toSparkType(t: String): String = t.trim.toUpperCase match {
    case "STRING" | "TEXT"                     => "string"
    case "INTEGER" | "INT64" | "INT"           => "long"
    case "FLOAT" | "FLOAT64" | "NUMERIC"       => "double"
    case "BOOLEAN" | "BOOL"                    => "boolean"
    case "TIMESTAMP" | "DATETIME"              => "timestamp"
    case "DATE"                                => "date"
    case "BYTES"                               => "binary"
    case other                                 => other.toLowerCase
  }

  /** Load `name -> sparkType` pairs from a CSV schema file, resolving the
    * reference's header aliases (name/nombre, type/tipo). */
  def loadSchemaCsv(spark: SparkSession, path: String): Seq[(String, String)] = {
    val df = spark.read.option("header", "true").csv(path)
    def find(aliases: String => Boolean): String =
      df.columns.find(c => aliases(c.toLowerCase))
        .getOrElse(throw new IllegalArgumentException(
          s"schema csv must have name/nombre and type/tipo columns; got ${df.columns.mkString(",")}"))
    val nameCol = find(c => c == "name" || c.contains("nombre") || c == "column")
    val typeCol = find(c => c == "type" || c.contains("tipo"))
    df.select(col(nameCol), col(typeCol)).collect()
      .map(r => (r.getString(0), toSparkType(r.getString(1)))).toSeq
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

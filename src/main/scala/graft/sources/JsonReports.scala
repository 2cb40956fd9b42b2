package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** Nested-JSON report flattening — the Spark-native `json_normalize`
  * (reference: Linkedin_Marketing.py:72 `json_normalize(sep="_")`,
  * Google_GA4.py:114 `_to_df`, tiktok_marketing.py:387).
  *
  * `from_json` with an explicit schema keeps the parse inside codegen and
  * lets Catalyst prune unreferenced fields; the recursive flattener
  * renames nested fields `parent_child` exactly like `sep="_"`.
  */
object JsonReports {

  /** Parse a JSON string column with `schema` and flatten all nested
    * structs into `sep`-joined top-level columns. */
  def flattenJson(df: DataFrame, jsonCol: String, schema: StructType, sep: String = "_"): DataFrame = {
    val parsed = df.withColumn("_parsed", from_json(col(jsonCol), schema))
    val flat = flattenStruct(col("_parsed"), schema, prefix = "", sep)
    parsed.select(df.columns.filterNot(_ == jsonCol).map(col).toSeq ++ flat: _*)
  }

  /** Recursively expand struct fields to `prefix_field` columns. */
  def flattenStruct(base: Column, schema: StructType, prefix: String, sep: String): Seq[Column] =
    schema.fields.toSeq.flatMap { f =>
      val name = if (prefix.isEmpty) f.name else s"$prefix$sep${f.name}"
      f.dataType match {
        case st: StructType => flattenStruct(base.getField(f.name), st, name, sep)
        case _              => Seq(base.getField(f.name).as(name))
      }
    }

  /** Parse a DDL type string ("k INT, meta STRUCT<a: STRING>") → schema. */
  def schemaOf(ddl: String): StructType = StructType.fromDDL(ddl)
}

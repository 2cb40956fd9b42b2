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

  private val ga4Schema = schemaOf(
    """reports ARRAY<STRUCT<
      |  dimensionHeaders: ARRAY<STRUCT<name: STRING>>,
      |  metricHeaders: ARRAY<STRUCT<name: STRING>>,
      |  rows: ARRAY<STRUCT<
      |    dimensionValues: ARRAY<STRUCT<value: STRING>>,
      |    metricValues: ARRAY<STRUCT<value: STRING>>>>>>""".stripMargin)

  /** GA4 batchRunReports response → flat DataFrame (Google_GA4.py:114
    * `_to_df`: header names from dimensionHeaders/metricHeaders, one row
    * per entry, dimension then metric values).
    *
    * Header names are data, not schema, so one driver-side peek at the
    * first payload establishes the output columns (the same role pandas'
    * first-row inference plays); the row explosion and value extraction
    * then run fully distributed.
    */
  def ga4Report(df: DataFrame, jsonCol: String): DataFrame = {
    val parsed = df.select(from_json(col(jsonCol), ga4Schema).getField("reports")
      .getItem(0).as("r"))
    // Empty input or unparseable/missing `reports` payload → empty frame,
    // matching Google_GA4.py:118 (`_to_df` returns an empty DataFrame
    // rather than raising).
    val headRow = parsed.select(
      col("r.dimensionHeaders.name").as("dims"),
      col("r.metricHeaders.name").as("mets")).take(1).headOption
    val (dims, mets) = headRow match {
      case Some(row) if !row.isNullAt(0) && !row.isNullAt(1) =>
        (row.getSeq[String](0), row.getSeq[String](1))
      case _ => return df.sparkSession.emptyDataFrame
    }
    val exploded = parsed.select(explode(col("r.rows")).as("row"))
    exploded.select(
      dims.zipWithIndex.map { case (n, i) =>
        col("row.dimensionValues").getItem(i).getField("value").as(n)
      } ++ mets.zipWithIndex.map { case (n, i) =>
        col("row.metricValues").getItem(i).getField("value").as(n)
      }: _*)
  }

  /** Facebook action-list fan-out (Facebook_Marketing.py:97-120 +
    * `_unique_actions`/`_split_text`): a column of
    * `array<struct<action_type, value>>` becomes one `_action_{type}`
    * column per action type, holding the first matching element's value
    * (0 when the list is null or the type is absent — `_split_text`
    * returns 0 in both cases).
    *
    * Pass `actionTypes` to pin the output columns (no discovery scan);
    * None discovers the distinct types with one aggregation first, the
    * Spark analog of the reference's `_unique_actions` pass.
    */
  def actionColumns(df: DataFrame, listCol: String,
                    actionTypes: Option[Seq[String]] = None): DataFrame = {
    val types: Seq[String] = actionTypes.getOrElse {
      df.select(explode(coalesce(col(listCol), array())).as("a"))
        .select(col("a.action_type")).distinct()
        .collect().map(_.getString(0)).filter(t => t != null && t.nonEmpty).toSeq.sorted
    }
    val withCols = types.foldLeft(df) { (acc, t) =>
      acc.withColumn(s"_action_$t",
        coalesce(
          filter(col(listCol), a => a.getField("action_type") === t)
            .getItem(0).getField("value"),
          lit(0.0)))
    }
    withCols.drop(listCol)
  }

  private val searchConsoleSchema = schemaOf(
    """rows ARRAY<STRUCT<
      |  keys: ARRAY<STRING>,
      |  clicks: DOUBLE, impressions: DOUBLE, ctr: DOUBLE, position: DOUBLE>>""".stripMargin)

  /** Search Console query response → report DataFrame
    * (search_console.py:394 `_to_df`: positional `keys` zipped with the
    * requested dimension names + clicks/impressions/ctr/position,
    * missing values defaulting to null/0). */
  def searchConsoleReport(df: DataFrame, jsonCol: String, dimensions: Seq[String]): DataFrame = {
    val exploded = df
      .select(explode(coalesce(
        from_json(col(jsonCol), searchConsoleSchema).getField("rows"),
        array())).as("row"))
    exploded.select(
      dimensions.zipWithIndex.map { case (d, i) =>
        col("row.keys").getItem(i).as(d)
      } ++ Seq(
        coalesce(col("row.clicks"), lit(0.0)).as("clicks"),
        coalesce(col("row.impressions"), lit(0.0)).as("impressions"),
        coalesce(col("row.ctr"), lit(0.0)).as("ctr"),
        coalesce(col("row.position"), lit(0.0)).as("position")): _*)
  }
}

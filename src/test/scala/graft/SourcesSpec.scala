package graft

import graft.sources.{JsonReports, Schemas}
import org.apache.spark.sql.functions._
import java.nio.file.Files

class SourcesSpec extends SparkSpecBase {
  import spark.implicits._

  test("flattenJson expands nested structs with sep (json_normalize twin)") {
    val df = Seq(
      (1L, """{"k": 5, "meta": {"source": "ga4", "geo": {"country": "cl"}}}"""),
      (2L, """{"k": 7, "meta": {"source": "fb", "geo": {"country": "mx"}}}""")
    ).toDF("id", "payload")
    val schema = JsonReports.schemaOf(
      "k INT, meta STRUCT<source: STRING, geo: STRUCT<country: STRING>>")
    val out = JsonReports.flattenJson(df, "payload", schema)
    assert(out.columns.toSeq == Seq("id", "k", "meta_source", "meta_geo_country"))
    val row = out.filter(col("id") === 1).as[(Long, Int, String, String)].head()
    assert(row == ((1L, 5, "ga4", "cl")))
  }

  test("applySchema from CSV coerces safely (to_numeric errors=coerce twin)") {
    // reference header aliases (nombre/tipo) + BigQuery-style types
    val tmp = Files.createTempFile("graft_schema", ".csv")
    Files.writeString(tmp, "nombre,tipo\namount,FLOAT\nwhen,DATE\nmissing_col,INTEGER\n")
    val df = Seq(("12.5", "2024-01-01"), ("oops", "not-a-date")).toDF("amount", "when")
    val out = Schemas.applySchemaFromCsv(spark, df, tmp.toString)
    assert(out.schema("amount").dataType.typeName == "double")
    assert(out.schema("when").dataType.typeName == "date")
    assert(out.schema("missing_col").dataType.typeName == "long")
    val rows = out.select("amount").as[Option[Double]].collect()
    assert(rows.contains(Some(12.5)) && rows.contains(None)) // "oops" → null, no error
  }

  test("ga4Report reproduces the header+row-zip report shape") {
    val payload =
      """{"reports": [{
        |  "dimensionHeaders": [{"name": "date"}, {"name": "country"}],
        |  "metricHeaders": [{"name": "sessions"}, {"name": "totalUsers"}],
        |  "rows": [
        |   {"dimensionValues": [{"value": "20240101"}, {"value": "CL"}],
        |    "metricValues": [{"value": "120"}, {"value": "80"}]},
        |   {"dimensionValues": [{"value": "20240102"}, {"value": "MX"}],
        |    "metricValues": [{"value": "95"}, {"value": "60"}]}
        |  ]}]}""".stripMargin
    val out = JsonReports.ga4Report(Seq(payload).toDF("body"), "body")
    assert(out.columns.toSeq == Seq("date", "country", "sessions", "totalUsers"))
    val rows = out.as[(String, String, String, String)].collect().sortBy(_._1)
    assert(rows.toSeq == Seq(("20240101", "CL", "120", "80"), ("20240102", "MX", "95", "60")))
  }

  test("ga4Report returns an empty frame on empty or unparseable payloads") {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL("body STRING"))
    assert(JsonReports.ga4Report(empty, "body").isEmpty)
    val garbage = Seq("""{"nope": 1}""", "not json at all").toDF("body")
    assert(JsonReports.ga4Report(garbage, "body").isEmpty)
  }

  test("searchConsoleReport zips keys with requested dimensions") {
    val payload =
      """{"rows": [
        | {"keys": ["2024-01-01", "cl"], "clicks": 10, "impressions": 200, "ctr": 0.05, "position": 3.2},
        | {"keys": ["2024-01-02"], "clicks": 4, "impressions": 50, "ctr": 0.08, "position": 1.1}
        |]}""".stripMargin
    val out = JsonReports.searchConsoleReport(
      Seq(payload).toDF("body"), "body", dimensions = Seq("date", "country"))
    assert(out.columns.toSeq == Seq("date", "country", "clicks", "impressions", "ctr", "position"))
    val rows = out.collect().sortBy(_.getString(0))
    assert(rows(0).getString(1) == "cl")
    assert(rows(1).getString(1) == null)  // short keys → null, like the reference
    assert(rows(1).getDouble(2) == 4.0)
  }

  test("actionColumns fans the action list out to _action_{type} columns") {
    val payloads = Seq(
      (1L, """[{"action_type": "like", "value": 5.0}, {"action_type": "comment", "value": 2.0}]"""),
      (2L, """[{"action_type": "like", "value": 1.0}]"""),
      (3L, null.asInstanceOf[String]))
      .toDF("ad_id", "actions_json")
    val parsed = payloads.withColumn("actions",
      from_json(col("actions_json"), org.apache.spark.sql.types.ArrayType(
        JsonReports.schemaOf("action_type STRING, value DOUBLE")))).drop("actions_json")
    val out = JsonReports.actionColumns(parsed, "actions")
    assert(out.columns.toSet == Set("ad_id", "_action_comment", "_action_like"))
    val rows = out.orderBy("ad_id")
      .select("_action_like", "_action_comment").as[(Double, Double)].collect()
    assert(rows.toSeq == Seq((5.0, 2.0), (1.0, 0.0), (0.0, 0.0)))  // missing → 0, like _split_text
  }

  test("partitioned sink round-trip preserves per-partition aggregates") {
    val rt = graft.operators.Reports.partitionedSink(spark, sfDir)
    val direct = Tables(spark, sfDir).orders
      .groupBy(year(col("o_orderdate")).as("order_year"))
      .agg(count(lit(1)).as("n"))
    val joined = rt.join(direct, Seq("order_year"))
      .filter(col("n_orders") =!= col("n")).count()
    assert(joined == 0)
  }
}

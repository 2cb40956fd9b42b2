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

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

  test("actionColumns discovery is bounded: over maxActionTypes fails loud, pinned types bypass") {
    val wide = (0 until 40).map { i =>
      (i.toLong, s"""[{"action_type": "t$i", "value": 1.0}]""")
    }.toDF("ad_id", "actions_json")
    val parsed = wide.withColumn("actions",
      from_json(col("actions_json"), org.apache.spark.sql.types.ArrayType(
        JsonReports.schemaOf("action_type STRING, value DOUBLE")))).drop("actions_json")
    val e = intercept[IllegalArgumentException] {
      JsonReports.actionColumns(parsed, "actions", maxActionTypes = 10)
    }
    assert(e.getMessage.contains("pass actionTypes"), e.getMessage)
    // pinned types never scan, so the bound does not apply
    val pinned = JsonReports.actionColumns(parsed, "actions",
      actionTypes = Some(Seq("t1", "t2")), maxActionTypes = 1)
    assert(pinned.columns.toSet == Set("ad_id", "_action_t1", "_action_t2"))
    // and the default bound admits normal vocabularies
    assert(JsonReports.actionColumns(parsed, "actions").columns.length == 41)
  }

  test("tiktokReport flattens data.list records to leaf-named columns") {
    // faithful page shape: data.list of {dimensions, metrics} records,
    // two pages arriving as two payload rows (the pagination union)
    val page1 =
      """{"code": 0, "data": {"page_info": {"total_page": 2}, "list": [
        | {"dimensions": {"stat_time_day": "2024-01-01", "campaign_id": "c1"},
        |  "metrics": {"spend": 12.5, "impressions": 1000}},
        | {"dimensions": {"stat_time_day": "2024-01-02", "campaign_id": "c1"},
        |  "metrics": {"spend": 8.0, "impressions": 600}}]}}""".stripMargin
    val page2 =
      """{"code": 0, "data": {"page_info": {"total_page": 2}, "list": [
        | {"dimensions": {"stat_time_day": "2024-01-01", "campaign_id": "c2"},
        |  "metrics": {"spend": 3.25, "impressions": 150}}]}}""".stripMargin
    val recordSchema = JsonReports.schemaOf(
      """dimensions STRUCT<stat_time_day: STRING, campaign_id: STRING>,
        |metrics STRUCT<spend: DOUBLE, impressions: DOUBLE>""".stripMargin)
    val out = JsonReports.tiktokReport(Seq(page1, page2).toDF("body"), "body", recordSchema)
    // leaf names only — the col.split(".")[-1] normalization
    assert(out.columns.toSeq == Seq("stat_time_day", "campaign_id", "spend", "impressions"))
    assert(out.count() == 3)
    val c2 = out.filter(col("campaign_id") === "c2")
      .select("spend").as[Double].head()
    assert(c2 == 3.25)
  }

  test("linkedinReport flattens elements with sep=_ and cleans column names") {
    val payload =
      """{"elements": [
        | {"pivotValues": ["urn:li:campaign:1"],
        |  "costInLocalCurrency": "12.3",
        |  "Date Range": {"start": {"Day-Of": 1}}},
        | {"pivotValues": ["urn:li:campaign:2"],
        |  "costInLocalCurrency": "4.5",
        |  "Date Range": {"start": {"Day-Of": 2}}}]}""".stripMargin
    val elementSchema = JsonReports.schemaOf(
      """pivotValues ARRAY<STRING>, costInLocalCurrency STRING,
        |`Date Range` STRUCT<start: STRUCT<`Day-Of`: INT>>""".stripMargin)
    val out = JsonReports.linkedinReport(
      Seq(payload).toDF("body"), "body", elementSchema, dateStr = Some("2024-01-01"))
    // json_normalize(sep="_") then lower/space→_/dash→_/strip-non-word
    assert(out.columns.toSeq ==
      Seq("pivotvalues", "costinlocalcurrency", "date_range_start_day_of", "date"))
    val rows = out.orderBy("date_range_start_day_of")
      .select("costinlocalcurrency", "date_range_start_day_of").as[(String, Int)].collect()
    assert(rows.toSeq == Seq(("12.3", 1), ("4.5", 2)))
    assert(out.select("date").distinct().as[java.sql.Date].head() ==
      java.sql.Date.valueOf("2024-01-01"))
  }

  test("xAdsReport explodes per-day metric arrays with entity metadata") {
    val payload =
      """{"request": {"params": {
        |   "start_time": "2024-01-01", "placement": "ALL_ON_TWITTER",
        |   "entity": "CAMPAIGN", "metric_groups": ["ENGAGEMENT"],
        |   "entity_ids": ["cmp1"]}},
        | "data": [
        |  {"id": "cmp1", "id_data": [{"metrics":
        |     {"impressions": [100, 200, 300], "engagements": [5, null, 9]}}]},
        |  {"id": "cmp2", "id_data": []}
        |]}""".stripMargin
    val out = JsonReports.xAdsReport(
      Seq(payload).toDF("body"), "body", metrics = Seq("impressions", "engagements"))
    // cmp2 has no id_data → vanishes, like the reference's empty iter_DF
    assert(out.select("entity_id").distinct().as[String].collect().toSeq == Seq("cmp1"))
    assert(out.count() == 3)
    val rows = out.orderBy("day_index")
      .select("day_index", "impressions", "engagements").as[(Int, Double, Double)].collect()
    assert(rows.toSeq == Seq((0, 100.0, 5.0), (1, 200.0, 0.0), (2, 300.0, 9.0))) // null → 0
    val meta = out.select("start_time", "entity", "metric_groups", "entity_ids").distinct()
      .as[(String, String, String, String)].head()
    assert(meta == (("2024-01-01", "CAMPAIGN", "ENGAGEMENT", "cmp1")))
  }

  test("hubspotRecords flattens properties and renames id to hs_object_id") {
    val payloads = Seq(
      """{"id": "101", "createdAt": "2024-01-01T10:00:00Z", "updatedAt": "2024-01-05T10:00:00Z",
        | "archived": false,
        | "properties": {"email": "a@x.cl", "lifecyclestage": "lead", "ignored": "z"}}""".stripMargin,
      """{"id": "102", "createdAt": "2024-01-02T10:00:00Z", "updatedAt": "2024-01-06T10:00:00Z",
        | "archived": true, "properties": {"email": "b@x.cl"}}""".stripMargin,
      "garbage")
    val out = JsonReports.hubspotRecords(payloads.toDF("body"), "body",
      propertyNames = Seq("email", "lifecyclestage"))
    assert(out.columns.toSeq ==
      Seq("hs_object_id", "createdAt", "updatedAt", "archived", "email", "lifecyclestage"))
    val rows = out.orderBy("hs_object_id")
      .select("hs_object_id", "email", "lifecyclestage").as[(String, String, Option[String])]
      .collect()
    assert(rows.toSeq == Seq(("101", "a@x.cl", Some("lead")), ("102", "b@x.cl", None)))
  }

  test("insightsWide pivots metrics and expands reaction types") {
    val insights =
      """{"data": [
        | {"name": "post_impressions", "period": "lifetime", "values": [{"value": 1200}]},
        | {"name": "post_clicks", "period": "lifetime", "values": [{"value": 45}]},
        | {"name": "post_reactions_by_type_total", "period": "lifetime",
        |  "values": [{"value": {"like": 30, "love": 5}}]}
        |]}""".stripMargin
    val insights2 =
      """{"data": [
        | {"name": "post_impressions", "period": "lifetime", "values": [{"value": 80}]}
        |]}""".stripMargin
    val df = Seq(("p1", insights), ("p2", insights2)).toDF("post_id", "body")
    val out = JsonReports.insightsWide(df, "post_id", "body",
      metricNames = Seq("post_impressions", "post_clicks"),
      reactionTypes = Seq("like", "love", "wow"))
    assert(out.columns.toSeq == Seq("post_id", "post_impressions", "post_clicks",
      "reactions_like", "reactions_love", "reactions_wow"))
    val rows = out.orderBy("post_id")
      .select("post_impressions", "post_clicks", "reactions_like", "reactions_love", "reactions_wow")
      .as[(Option[Double], Option[Double], Double, Double, Double)].collect()
    assert(rows(0) == ((Some(1200.0), Some(45.0), 30.0, 5.0, 0.0)))
    assert(rows(1) == ((Some(80.0), None, 0.0, 0.0, 0.0)), "absent metrics → null, absent reactions → 0")
  }

  test("insightsWide resolves duplicate metric entries to the LAST occurrence (dict overwrite)") {
    // the same metric reported for two periods: the reference's
    // flat[name] = value loop keeps the later entry; the pivot must
    // pick by array position, not unordered first()
    val insights =
      """{"data": [
        | {"name": "post_impressions", "period": "day", "values": [{"value": 100}]},
        | {"name": "post_impressions", "period": "lifetime", "values": [{"value": 5000}]}
        |]}""".stripMargin
    val df = Seq(("p1", insights)).toDF("post_id", "body")
    val out = JsonReports.insightsWide(df, "post_id", "body",
      metricNames = Seq("post_impressions"))
      .select("post_impressions").as[Double].collect()
    assert(out.toSeq == Seq(5000.0), "last data-array entry must win")
  }

  test("linkedinFollowerStats sums function counts into one totals row (pivot_table aggfunc=sum)") {
    val resp =
      """{"elements": [{
        |  "organizationalEntity": "urn:li:organization:12345",
        |  "followerCountsByFunction": [
        |    {"function": "urn:li:function:1",
        |     "followerCounts": {"organicFollowerCount": 100, "paidFollowerCount": 7}},
        |    {"function": "urn:li:function:2",
        |     "followerCounts": {"organicFollowerCount": 40}},
        |    {"function": "urn:li:function:3",
        |     "followerCounts": {"paidFollowerCount": 3}}
        |  ]}]}""".stripMargin
    val out = JsonReports.linkedinFollowerStats(
      Seq(resp).toDF("body"), "body", extractionDate = "2026-08-12")
    assert(out.columns.toSeq == Seq("extraction_date", "organizational_entity",
      "dimension", "organic_followers", "paid_followers"))
    val rows = out.as[(String, String, String, Long, Long)].collect()
    assert(rows.toSeq == Seq(("2026-08-12", "12345", "function", 140L, 10L)),
      "counts sum across functions; missing counts default 0; org id = URN tail")
    // no elements → empty frame, like the reference's early return
    assert(JsonReports.linkedinFollowerStats(
      Seq("""{"elements": []}""").toDF("body"), "body", "2026-08-12").count() == 0)
  }

  test("linkedinPosts resolves content_type by key presence and formats createdAt (get_posts)") {
    val resp =
      """{"elements": [
        | {"id": "urn:li:share:1", "createdAt": 1704067200000, "commentary": "hello",
        |  "content": {"article": {"source": "https://x"}}, "visibility": "PUBLIC",
        |  "lifecycleState": "PUBLISHED"},
        | {"id": "urn:li:share:2", "createdAt": 1704153600000,
        |  "content": {"media": {"id": "urn:li:image:9"}}, "visibility": "PUBLIC",
        |  "lifecycleState": "PUBLISHED"},
        | {"id": "urn:li:share:3", "visibility": "PUBLIC", "lifecycleState": "DRAFT"}
        |]}""".stripMargin
    val out = JsonReports.linkedinPosts(Seq(resp).toDF("body"), "body")
      .as[(String, Option[String], String, String, String, String)].collect().sortBy(_._1)
    assert(out.length == 3)
    assert(out(0) == (("urn:li:share:1", Some("2024-01-01 00:00:00"), "hello",
      "ARTICLE", "PUBLIC", "PUBLISHED")))
    assert(out(1)._4 == "MEDIA")
    assert(out(2) == (("urn:li:share:3", None, "", "NONE", "PUBLIC", "DRAFT")),
      "missing createdAt → null; missing commentary → ''; no content key → NONE")
  }

  test("linkedinPostsWithEngagement left-merges and int-fills engagement (fillna(0).astype(int))") {
    val posts = JsonReports.linkedinPosts(Seq(
      """{"elements": [
        | {"id": "p1", "createdAt": 1704067200000, "visibility": "PUBLIC", "lifecycleState": "PUBLISHED"},
        | {"id": "p2", "createdAt": 1704067200000, "visibility": "PUBLIC", "lifecycleState": "PUBLISHED"}
        |]}""".stripMargin).toDF("body"), "body")
    val eng = JsonReports.linkedinEngagement(Seq(
      ("p1",
        """{"likesSummary": {"totalLikes": 12},
          |"commentsSummary": {"totalFirstLevelComments": 3},
          |"sharesSummary": {"totalShares": 4}}""".stripMargin))
      .toDF("urn", "body"), "urn", "body")
    val out = JsonReports.linkedinPostsWithEngagement(posts, eng)
      .select("post_urn", "likes", "comments", "shares")
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(("p1", 12L, 3L, 4L), ("p2", 0L, 0L, 0L)),
      "unmatched posts get integer zeros, not nulls")
  }

  test("youtubeRecords coerces string statistics to nullable longs (to_numeric coerce + Int64)") {
    val page =
      """{"items": [
        | {"id": "v1",
        |  "snippet": {"publishedAt": "2024-03-01T10:00:00Z", "title": "a"},
        |  "statistics": {"viewCount": "1200", "likeCount": "55", "commentCount": "7",
        |                 "favoriteCount": "0"}},
        | {"id": "v2",
        |  "snippet": {"publishedAt": "not-a-date", "title": "b"},
        |  "statistics": {"viewCount": "garbage", "likeCount": "9"}}
        |]}""".stripMargin
    val itemSchema = JsonReports.schemaOf(
      """id STRING,
        |snippet STRUCT<publishedAt: STRING, title: STRING>,
        |statistics STRUCT<viewCount: STRING, likeCount: STRING,
        |  commentCount: STRING, favoriteCount: STRING>""".stripMargin)
    val out = JsonReports.youtubeRecords(Seq(page).toDF("body"), "body", itemSchema,
      extractedAt = Some("2026-08-12 00:00:00"))
    assert(out.columns.contains("statistics_viewCount"), "json_normalize sep='_' naming")
    val rows = out.orderBy("id")
      .select("id", "statistics_viewCount", "statistics_likeCount", "snippet_publishedAt")
      .as[(String, Option[Long], Option[Long], Option[java.sql.Timestamp])].collect()
    assert(rows(0)._2 == Some(1200L) && rows(0)._3 == Some(55L))
    assert(rows(0)._4.exists(_.toInstant.toString.startsWith("2024-03-01T10:00")))
    assert(rows(1)._2 == None, "unparseable counter → NULL (errors='coerce')")
    assert(rows(1)._3 == Some(9L))
    assert(rows(1)._4 == None, "unparseable date → NULL (to_datetime coerce)")
    assert(out.columns.contains("extracted_at"))
    // _filter_columns contract: absent request raises with the available list
    val ex = intercept[IllegalArgumentException] {
      JsonReports.youtubeRecords(Seq(page).toDF("body"), "body", itemSchema,
        columns = Some(Seq("id", "nope")))
    }
    assert(ex.getMessage.contains("nope") && ex.getMessage.contains("available"))
  }

  test("instagramMedia assembles metadata + insights records (_build_dataframe)") {
    val mediaPage =
      """{"data": [
        | {"id": "m1", "media_type": "IMAGE", "media_product_type": "FEED",
        |  "caption": "hi", "timestamp": "2024-05-01T12:00:00+0000",
        |  "permalink": "https://instagr.am/p/m1"},
        | {"id": "m2", "media_type": "VIDEO", "media_product_type": "REELS",
        |  "timestamp": "2024-05-02T08:30:00+0000"}
        |]}""".stripMargin
    val media = JsonReports.instagramMedia(Seq(mediaPage).toDF("body"), "body", "17841400000000000")
    val rows = media.orderBy("media_id").collect()
    assert(media.columns.toSeq == Seq("media_id", "ig_account_id", "media_type",
      "media_product_type", "caption", "timestamp", "permalink"))
    assert(rows(0).getString(0) == "m1" && rows(0).getString(2) == "IMAGE")
    assert(rows(1).getString(4) == "" && rows(1).getString(6) == "",
      "missing caption/permalink default to ''")
    assert(rows(0).getTimestamp(5).toInstant.toString.startsWith("2024-05-01T12:00"))
    // insights merge: m2 has no insights row → metadata survives, nulls fill
    val insights = JsonReports.insightsWide(
      Seq(("m1", """{"data": [{"name": "reach", "period": "lifetime", "values": [{"value": 321}]}]}"""))
        .toDF("media_id", "body"),
      "media_id", "body", metricNames = Seq("reach"))
    val merged = JsonReports.instagramMediaWithInsights(media, insights)
      .orderBy("media_id").select("media_id", "reach")
      .as[(String, Option[Double])].collect()
    assert(merged.toSeq == Seq(("m1", Some(321.0)), ("m2", None)))
  }

  test("ga4Report keeps the declared schema on empty days (expectedHeaders contract)") {
    val empty = JsonReports.ga4Report(Seq.empty[String].toDF("body"), "body",
      expectedHeaders = Some((Seq("date"), Seq("sessions"))))
    assert(empty.columns.toSeq == Seq("date", "sessions") && empty.count() == 0)
    // an empty-day union with a real day keeps the report schema
    val good =
      """{"reports": [{
        |  "dimensionHeaders": [{"name": "date"}],
        |  "metricHeaders": [{"name": "sessions"}],
        |  "rows": [{"dimensionValues": [{"value": "20240101"}],
        |            "metricValues": [{"value": "42"}]}]}]}""".stripMargin
    val day = JsonReports.ga4Report(Seq(good).toDF("body"), "body")
    val unioned = empty.unionByName(day, allowMissingColumns = true)
    assert(unioned.columns.toSeq == Seq("date", "sessions"))
    assert(unioned.as[(String, String)].collect().toSeq == Seq(("20240101", "42")))
  }

  test("ga4Report takes headers from the first PARSEABLE row, not row 1") {
    val good =
      """{"reports": [{
        |  "dimensionHeaders": [{"name": "date"}],
        |  "metricHeaders": [{"name": "sessions"}],
        |  "rows": [{"dimensionValues": [{"value": "20240101"}],
        |            "metricValues": [{"value": "42"}]}]}]}""".stripMargin
    val out = JsonReports.ga4Report(Seq("not json", good).toDF("body"), "body")
    assert(out.columns.toSeq == Seq("date", "sessions"))
    assert(out.as[(String, String)].collect().toSeq == Seq(("20240101", "42")))
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

  test("writeDayPartitioned replace touches ONLY the incoming dates (if_exists disposition)") {
    import graft.sources.Sinks
    val path = java.nio.file.Files.createTempDirectory("graft_sink").toString
    def mk(rows: (String, Long)*) = rows.toSeq.toDF("Ship Date", "qty")
    // initial load: three dates
    Sinks.writeDayPartitioned(
      mk(("2024-01-01", 1L), ("2024-01-02", 2L), ("2024-01-03", 3L)),
      path, "Ship Date")
    def readAll() = spark.read.parquet(path)
      .select(col("ship_date").cast("string"), col("qty"))
      .as[(String, Long)].collect().toSeq.sorted
    assert(readAll() == Seq(("2024-01-01", 1L), ("2024-01-02", 2L), ("2024-01-03", 3L)),
      "clean=true must normalize 'Ship Date' → ship_date")
    // replace: carries day 2 (new value) and day 4 — days 1 and 3 must survive
    Sinks.writeDayPartitioned(
      mk(("2024-01-02", 20L), ("2024-01-04", 4L)), path, "Ship Date")
    assert(readAll() == Seq(("2024-01-01", 1L), ("2024-01-02", 20L),
      ("2024-01-03", 3L), ("2024-01-04", 4L)),
      "dynamic overwrite replaces only the dates present in the frame")
    // append: day 2 rows accumulate instead of replacing
    Sinks.writeDayPartitioned(mk(("2024-01-02", 200L)), path, "Ship Date",
      ifExists = "append")
    assert(readAll().count(_._1 == "2024-01-02") == 2, "append must not replace")
  }

  test("compactDayPartitions rewrites only fragmented dates, preserving content and cold files") {
    import graft.sources.Sinks
    val path = java.nio.file.Files.createTempDirectory("graft_compact").toString
    def mk(d: String, from: Long, n: Long) =
      (from until from + n).map(i => (d, i)).toDF("date", "v")
    // date A: 5 append batches → >= 5 files; date B: one clean write
    Sinks.writeDayPartitioned(mk("2024-01-01", 0, 10), path, "date")
    (1 to 4).foreach { b =>
      Sinks.writeDayPartitioned(mk("2024-01-01", b * 10L, 10), path, "date",
        ifExists = "append")
    }
    // cold date: one task → one file, so it reads as healthy below
    Sinks.writeDayPartitioned(mk("2024-01-02", 100, 10).coalesce(1), path, "date",
      ifExists = "append")
    def files(d: String) = spark.read.parquet(path)
      .filter(col("date") === d)
      .select(input_file_name()).distinct().as[String].collect().toSet
    def content() = spark.read.parquet(path)
      .select(col("date").cast("string"), col("v"))
      .as[(String, Long)].collect().toSeq.sorted
    val coldBefore = files("2024-01-02")
    val before = content()
    assert(files("2024-01-01").size >= 5)

    val rewritten = Sinks.compactDayPartitions(spark, path, "date",
      targetRecordsPerFile = 1000)
    assert(rewritten == Seq("2024-01-01"), s"only the fragmented date: $rewritten")
    assert(content() == before, "compaction must not change a single row")
    assert(files("2024-01-01").size == 1, "50 rows fit one file at target 1000")
    assert(files("2024-01-02") == coldBefore,
      "healthy partitions must keep their exact files")
    // idempotent: a second pass finds nothing to do
    assert(Sinks.compactDayPartitions(spark, path, "date", 1000).isEmpty)
  }

  test("missingDates reports exactly the absent partitions in the requested span") {
    import graft.sources.Sinks
    val path = java.nio.file.Files.createTempDirectory("graft_missing").toString
    Sinks.writeDayPartitioned(
      Seq(("2024-01-01", 1L), ("2024-01-02", 2L), ("2024-01-05", 5L))
        .toDF("date", "v"), path, "date")
    val gaps = Sinks.missingDates(spark, path, "date", "2024-01-01", "2024-01-06")
      .select(col("expected_date").cast("string")).as[String].collect().toSeq
    assert(gaps == Seq("2024-01-03", "2024-01-04", "2024-01-06"))
    // complete span → empty
    assert(Sinks.missingDates(spark, path, "date", "2024-01-01", "2024-01-02")
      .count() == 0)
  }

  test("updateRange overwrites its range in place; appendRange accumulates (Sheets analog)") {
    import graft.sources.Sinks
    val path = java.nio.file.Files.createTempDirectory("graft_sheet").toString
    Sinks.updateRange(Seq(("a", 1L), ("b", 2L)).toDF("k", "v"), path, "Sheet1!A1")
    Sinks.updateRange(Seq(("x", 9L)).toDF("k", "v"), path, "Sheet2!A1")
    // updating Sheet1 replaces only Sheet1's contents
    Sinks.updateRange(Seq(("c", 3L)).toDF("k", "v"), path, "Sheet1!A1")
    assert(Sinks.readRange(spark, path, "Sheet1!A1").as[(String, Long)].collect().toSeq == Seq(("c", 3L)))
    assert(Sinks.readRange(spark, path, "Sheet2!A1").as[(String, Long)].collect().toSeq == Seq(("x", 9L)))
    // appending below Sheet1 keeps the existing rows
    Sinks.appendRange(Seq(("d", 4L)).toDF("k", "v"), path, "Sheet1!A1")
    assert(Sinks.readRange(spark, path, "Sheet1!A1")
      .as[(String, Long)].collect().toSeq.sorted == Seq(("c", 3L), ("d", 4L)))
  }

  test("deleteRange clears ALL / ROWS-by-position / COLUMNS-by-position; other ranges survive") {
    import graft.sources.Sinks
    val path = java.nio.file.Files.createTempDirectory("graft_sheet_del").toString
    def rows(r: String) = Sinks.readRange(spark, path, r)
      .as[(String, Long)].collect().toSeq.sorted
    val five = Seq(("a", 1L), ("b", 2L), ("c", 3L), ("d", 4L), ("e", 5L))
    Sinks.updateRange(five.toDF("k", "v"), path, "Sheet1!A1")
    Sinks.updateRange(Seq(("x", 9L)).toDF("k", "v"), path, "Sheet2!A1")

    // ROWS: delete positions [1, 3) in k-order → b, c go; a, d, e stay
    Sinks.deleteRange(spark, path, "Sheet1!A1", vector = "ROWS",
      startIndex = Some(1), endIndex = Some(3), orderBy = Seq("k"))
    assert(rows("Sheet1!A1") == Seq(("a", 1L), ("d", 4L), ("e", 5L)))
    assert(rows("Sheet2!A1") == Seq(("x", 9L)), "sibling range untouched")

    // COLUMNS: clear schema position [1, 2) → v nulled, rows + k kept
    Sinks.deleteRange(spark, path, "Sheet1!A1", vector = "COLUMNS",
      startIndex = Some(1), endIndex = Some(2))
    val cleared = Sinks.readRange(spark, path, "Sheet1!A1")
      .as[(String, Option[Long])].collect().toSeq.sorted
    assert(cleared == Seq(("a", None), ("d", None), ("e", None)),
      s"values cleared in place, schema intact: $cleared")

    // ALL: the whole range empties; the sibling still reads back
    Sinks.deleteRange(spark, path, "Sheet1!A1")
    assert(Sinks.readRange(spark, path, "Sheet1!A1").count() == 0)
    assert(rows("Sheet2!A1") == Seq(("x", 9L)))

    // loud contracts
    intercept[IllegalArgumentException] {
      Sinks.deleteRange(spark, path, "Sheet2!A1", vector = "DIAGONAL")
    }
    intercept[IllegalArgumentException] {
      Sinks.deleteRange(spark, path, "Sheet2!A1", vector = "ROWS",
        startIndex = Some(0), endIndex = Some(1))
    }
    intercept[IllegalArgumentException] {
      Sinks.deleteRange(spark, path, "Sheet2!A1", vector = "COLUMNS",
        startIndex = Some(5), endIndex = Some(9))
    }
    // a negative ROWS start with the default end would keep NOTHING
    // and fall through to the partition drop — must refuse, not wipe
    intercept[IllegalArgumentException] {
      Sinks.deleteRange(spark, path, "Sheet2!A1", vector = "ROWS",
        startIndex = Some(-5), orderBy = Seq("k"))
    }
    intercept[IllegalArgumentException] {
      Sinks.deleteRange(spark, path, "Sheet2!A1", vector = "ROWS",
        startIndex = Some(3), endIndex = Some(1), orderBy = Seq("k"))
    }
    assert(rows("Sheet2!A1") == Seq(("x", 9L)), "guards must not touch data")
  }

  test("E4: range-sorted layout prunes row groups at the scan; unsorted reads everything") {
    import graft.sources.Sinks
    import org.apache.spark.sql.functions.col
    val events = Tables(spark, "/root/testdata/sf0.001").events
      .select(col("event_id"), col("user_id"))
    val total = events.count()
    val probeId = events.agg(org.apache.spark.sql.functions.min(col("user_id")))
      .collect()(0).getLong(0)
    val sorted = java.nio.file.Files.createTempDirectory("graft_rs_sorted").toString
    val unsorted = java.nio.file.Files.createTempDirectory("graft_rs_unsorted").toString
    Sinks.writeRangeSorted(events, sorted, Seq("user_id"), numFiles = 8)
    events.repartition(8).write.mode("overwrite").parquet(unsorted)
    // rows EMITTED by the scan = rows in row groups the pushed filter
    // could not prove away via parquet min/max stats
    def scanRows(path: String): Long = {
      val q = spark.read.parquet(path).filter(col("user_id") === probeId)
      q.collect()
      val scans = q.queryExecution.executedPlan.collectLeaves()
      scans.map(_.metrics("numOutputRows").value).sum
    }
    val sortedRows = scanRows(sorted)
    val unsortedRows = scanRows(unsorted)
    assert(sortedRows <= total / 4,
      s"sorted layout must skip most row groups: scanned $sortedRows of $total")
    assert(unsortedRows >= (total * 0.9).toLong,
      s"unsorted layout should defeat min/max stats (scanned $unsortedRows of $total) — " +
        "if this starts pruning, the fixture stopped spanning the key range per file")
    // same answer either way — layout is a performance lever, not a semantic one
    assert(spark.read.parquet(sorted).filter(col("user_id") === probeId).count() ==
      spark.read.parquet(unsorted).filter(col("user_id") === probeId).count())
  }

  test("JSONL shard export: bounded gzip shards round-trip bit-exact under a pinned schema") {
    import graft.sources.Sinks
    val docs = Tables(spark, sfDir).documents
      .select("doc_id", "source", "lang", "text")
    val path = Files.createTempDirectory("graft_jsonl").toString + "/t"
    Sinks.writeJsonlShards(docs.repartition(2), path, maxRecordsPerFile = 30)
    // shards are rolled at the record bound and gzip-compressed
    val files = new java.io.File(path).listFiles.filter(_.getName.endsWith(".json.gz"))
    assert(files.nonEmpty, "expected gzip JSONL shards")
    val n = docs.count()
    assert(files.length >= (n / 30).toInt,
      s"file rolling should bound shards at 30 records (${files.length} files for $n rows)")
    // round trip: exact same rows, exact same types
    val back = Sinks.readJsonl(spark, path, docs.schema)
    assert(back.schema === docs.schema)
    assert(back.as[(Long, String, String, String)].collect().toSet ===
      docs.as[(Long, String, String, String)].collect().toSet)
    intercept[IllegalArgumentException] {
      Sinks.writeJsonlShards(docs, path, maxRecordsPerFile = 0)
    }
  }

  test("WET records: envelope parse, preamble drop, CRLF tolerance, length check, malformed drop") {
    import graft.sources.Warc
    def rec(uri: String, clen: Int, payload: String) =
      s"WARC/1.0\nWARC-Type: conversion\nWARC-Target-URI: $uri\n" +
        s"WARC-Date: 2024-02-02T00:00:00Z\nContent-Length: $clen\n\n$payload\n\n"
    val good = rec("https://a.com/1", 9, "body text")
    val bad = rec("https://a.com/2", 99, "short")          // declared length lies
    val chunk1 = "warcinfo: preamble to drop\n\n" + good + bad
    // CRLF framing normalizes; a header-only fragment (no blank line) drops
    val chunk2 = rec("https://b.com/1", 2, "xy").replace("\n", "\r\n") +
      "WARC/1.0\nWARC-Type: broken-no-boundary"
    val out = Warc.wetRecords(
      Seq((1L, chunk1), (2L, chunk2)).toDF("chunk_id", "content"),
      "chunk_id", "content")
      .select("chunk_id", "rec_idx", "uri", "content_length", "payload_len",
        "length_ok", "payload")
      .as[(Long, Long, String, Long, Long, Boolean, String)]
      .collect().sortBy(r => (r._1, r._2)).toList
    assert(out === List(
      (1L, 1L, "https://a.com/1", 9L, 9L, true, "body text"),
      (1L, 2L, "https://a.com/2", 99L, 5L, false, "short"),
      (2L, 1L, "https://b.com/1", 2L, 2L, true, "xy")))
    // a record with NO Content-Length header is unverifiable:
    // length_ok must be FALSE (never null — a null would slip through
    // downstream when-chains as "kept"); and a payload's own trailing
    // newline survives (only the record separator strips)
    val noLen = "WARC/1.0\nWARC-Target-URI: https://c.com/1\n\nline one\nline two\n\n\n"
    val r = Warc.wetRecords(Seq((3L, noLen)).toDF("chunk_id", "content"),
      "chunk_id", "content").collect().head
    assert(r.isNullAt(r.fieldIndex("content_length")))
    assert(r.getAs[Boolean]("length_ok") === false, "missing declared length must be false, not null")
    assert(r.getAs[String]("payload") === "line one\nline two\n")
    // map-only: the chunk stream never shuffles
    val plan = Warc.wetRecords(Seq((1L, chunk1)).toDF("chunk_id", "content"),
      "chunk_id", "content").queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"record extraction must not shuffle:\n${plan.take(500)}")
  }
}

package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, MapType, StringType, StructField, StructType}

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

  /** Recursively expand struct fields keeping only the LEAF name — the
    * TikTok normalization (`col.split(".")[-1]`, tiktok_marketing.py:388):
    * `{dimensions: {stat_time_day}, metrics: {spend}}` becomes columns
    * `stat_time_day`, `spend`. */
  def flattenLeaf(base: Column, schema: StructType): Seq[Column] =
    schema.fields.toSeq.flatMap { f =>
      f.dataType match {
        case st: StructType => flattenLeaf(base.getField(f.name), st)
        case _              => Seq(base.getField(f.name).as(f.name))
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
    *
    * @param expectedHeaders optional (dims, mets) declaring the report
    *        shape: when NO headers are recoverable from the payloads
    *        (empty day, unparseable page), the result is an EMPTY frame
    *        with exactly those string columns instead of a zero-column
    *        frame — so a caller unioning daily pages with
    *        `allowMissingColumns` keeps the report schema on empty
    *        days. Without it the zero-column contract stands (the
    *        reference's bare `pd.DataFrame()`, Google_GA4.py:118).
    */
  def ga4Report(df: DataFrame, jsonCol: String,
                expectedHeaders: Option[(Seq[String], Seq[String])] = None): DataFrame = {
    val parsed = df.select(from_json(col(jsonCol), ga4Schema).getField("reports")
      .getItem(0).as("r"))
    // Empty input or no parseable `reports` payload anywhere → empty
    // frame, matching Google_GA4.py:118 (`_to_df` returns an empty
    // DataFrame rather than raising). Headers come from the FIRST row
    // with non-null headers, not row 1 blindly — an unparseable leading
    // row must not silently drop the valid reports behind it.
    val headRow = parsed.select(
      col("r.dimensionHeaders.name").as("dims"),
      col("r.metricHeaders.name").as("mets"))
      .filter(col("dims").isNotNull && col("mets").isNotNull)
      .take(1).headOption
    val (dims, mets) = (headRow, expectedHeaders) match {
      case (Some(row), _) => (row.getSeq[String](0), row.getSeq[String](1))
      case (None, Some((d, m))) =>
        val spark = df.sparkSession
        return spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType((d ++ m).map(n => StructField(n, StringType))))
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
    *
    * `maxActionTypes` bounds the discovery collect: the action-type
    * vocabulary is small in practice (FB's is a few dozen), but the
    * discovered set sizes BOTH the driver collect and the output schema
    * — an adversarial or malformed upstream with high-cardinality
    * action_type values would otherwise blow the driver and produce a
    * thousand-column frame silently. Over the bound, fail loudly and
    * point at the pin-the-types escape hatch.
    */
  def actionColumns(df: DataFrame, listCol: String,
                    actionTypes: Option[Seq[String]] = None,
                    maxActionTypes: Int = 256): DataFrame = {
    val types: Seq[String] = actionTypes.getOrElse {
      val found = df.select(explode(coalesce(col(listCol), array())).as("a"))
        .select(col("a.action_type")).distinct()
        .limit(maxActionTypes + 1)
        .collect().map(_.getString(0)).filter(t => t != null && t.nonEmpty).toSeq.sorted
      require(found.size <= maxActionTypes,
        s"actionColumns discovered more than $maxActionTypes distinct action types in " +
          s"'$listCol' — the upstream is malformed or adversarial; pass actionTypes=Some(...) " +
          "to pin the expected vocabulary (or raise maxActionTypes deliberately)")
      found
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

  /** TikTok report response → flat DataFrame (tiktok_marketing.py:376-388:
    * records accumulate from `data.list` across pages, `json_normalize`
    * flattens the nested dimensions/metrics structs, and column names
    * keep only the LEAF segment — `col.split(".")[-1]`).
    *
    * `recordSchema` describes ONE `data.list` element (e.g.
    * `"dimensions STRUCT<stat_time_day: STRING, campaign_id: STRING>,
    *   metrics STRUCT<spend: DOUBLE, impressions: DOUBLE>"`).
    * Pagination is already unioned away: each input row is one page
    * payload, and the explode concatenates pages exactly like the
    * reference's `all_records.extend`. */
  def tiktokReport(df: DataFrame, jsonCol: String, recordSchema: StructType): DataFrame = {
    val schema = StructType(Seq(StructField("data", StructType(Seq(
      StructField("list", org.apache.spark.sql.types.ArrayType(recordSchema)))))))
    df.select(explode(coalesce(
        from_json(col(jsonCol), schema).getField("data").getField("list"),
        array())).as("rec"))
      .select(flattenLeaf(col("rec"), recordSchema): _*)
  }

  /** LinkedIn report response → flat DataFrame (Linkedin_Marketing.py:72
    * `_clean_and_transform_dataFrame`: `json_normalize(res["elements"],
    * sep="_")`, an optional extraction-date column for the unsampled
    * per-day path, and column names lowered / space→_ / -→_ / non-word
    * stripped).
    *
    * `elementSchema` describes ONE `elements` entry. */
  def linkedinReport(df: DataFrame, jsonCol: String, elementSchema: StructType,
                     dateStr: Option[String] = None): DataFrame = {
    val schema = StructType(Seq(StructField("elements",
      org.apache.spark.sql.types.ArrayType(elementSchema))))
    val flat = df.select(explode(coalesce(
        from_json(col(jsonCol), schema).getField("elements"),
        array())).as("e"))
      .select(flattenStruct(col("e"), elementSchema, prefix = "", sep = "_"): _*)
    val dated = dateStr.fold(flat)(d => flat.withColumn("date", lit(d).cast("date")))
    // reference column cleaning: strip/lower, space and dash → _, drop
    // the rest of the non-word chars (Linkedin_Marketing.py:80)
    dated.toDF(dated.columns.toSeq.map(
      _.trim.toLowerCase.replace(" ", "_").replace("-", "_").replaceAll("[^\\w]", "")): _*)
  }

  /** LinkedIn organic follower statistics → per-dimension totals
    * (linkedin_organic.py:404-457 `get_follower_stats`: takes
    * `elements[0]`, resolves the org id from the URN tail, one row per
    * `followerCountsByFunction` entry with 0-defaulted counts, then
    * `pivot_table(index=[extraction_date, organizational_entity,
    * dimension], values=[organic_followers, paid_followers],
    * aggfunc="sum")` — the pivot SUMS across functions, so the output
    * is one totals row per (date, org, dimension)).
    *
    * `extractionDate` is a parameter where the reference stamps
    * `datetime.now()` — determinism over wall-clock. */
  def linkedinFollowerStats(df: DataFrame, jsonCol: String,
                            extractionDate: String): DataFrame = {
    val schema = schemaOf(
      """elements ARRAY<STRUCT<
        |  organizationalEntity: STRING,
        |  followerCountsByFunction: ARRAY<STRUCT<
        |    function: STRING,
        |    followerCounts: STRUCT<organicFollowerCount: BIGINT, paidFollowerCount: BIGINT>>>>>""".stripMargin)
    df.select(from_json(col(jsonCol), schema).getField("elements").getItem(0).as("inner"))
      .filter(col("inner").isNotNull)
      .select(
        element_at(split(col("inner.organizationalEntity"), ":"), -1).as("organizational_entity"),
        explode(coalesce(col("inner.followerCountsByFunction"), array())).as("item"))
      .groupBy(
        lit(extractionDate).as("extraction_date"),
        col("organizational_entity"),
        lit("function").as("dimension"))
      .agg(
        sum(coalesce(col("item.followerCounts.organicFollowerCount"), lit(0L))).as("organic_followers"),
        sum(coalesce(col("item.followerCounts.paidFollowerCount"), lit(0L))).as("paid_followers"))
  }

  /** LinkedIn organic posts → post-metadata frame
    * (linkedin_organic.py:459-510 `get_posts`: one row per `elements`
    * entry with `createdAt` epoch-millis formatted as a UTC
    * "yyyy-MM-dd HH:mm:ss" string, content type resolved from
    * whichever content key is present, and ""-defaulted metadata).
    * `content` parses as MAP so presence of `article`/`media`/
    * `multiImage` keys is checked without pinning their shapes. */
  def linkedinPosts(df: DataFrame, jsonCol: String): DataFrame = {
    val schema = schemaOf(
      """elements ARRAY<STRUCT<
        |  id: STRING, createdAt: BIGINT, commentary: STRING,
        |  content: MAP<STRING, STRING>, visibility: STRING, lifecycleState: STRING>>""".stripMargin)
    df.select(explode(coalesce(
        from_json(col(jsonCol), schema).getField("elements"), array())).as("p"))
      .select(
        coalesce(col("p.id"), lit("")).as("post_urn"),
        when(col("p.createdAt").isNotNull,
          date_format(timestamp_millis(col("p.createdAt")), "yyyy-MM-dd HH:mm:ss"))
          .as("created_at"),
        coalesce(col("p.commentary"), lit("")).as("commentary"),
        when(map_contains_key(col("p.content"), "article"), "ARTICLE")
          .when(map_contains_key(col("p.content"), "media"), "MEDIA")
          .when(map_contains_key(col("p.content"), "multiImage"), "MULTI_IMAGE")
          .otherwise("NONE").as("content_type"),
        coalesce(col("p.visibility"), lit("")).as("visibility"),
        coalesce(col("p.lifecycleState"), lit("")).as("lifecycle_state"))
  }

  /** LinkedIn socialActions engagement → (post_urn, likes, comments,
    * shares) (linkedin_organic.py:512-546 `get_engagement`: one
    * response per URN, summary counts 0-defaulted). Input: one row per
    * post with `urnCol` + `jsonCol` holding that post's response. */
  def linkedinEngagement(df: DataFrame, urnCol: String, jsonCol: String): DataFrame = {
    val schema = schemaOf(
      """likesSummary STRUCT<totalLikes: BIGINT>,
        |commentsSummary STRUCT<totalFirstLevelComments: BIGINT>,
        |sharesSummary STRUCT<totalShares: BIGINT>""".stripMargin)
    df.select(col(urnCol).as("post_urn"), from_json(col(jsonCol), schema).as("a"))
      .select(
        col("post_urn"),
        coalesce(col("a.likesSummary.totalLikes"), lit(0L)).as("likes"),
        coalesce(col("a.commentsSummary.totalFirstLevelComments"), lit(0L)).as("comments"),
        coalesce(col("a.sharesSummary.totalShares"), lit(0L)).as("shares"))
  }

  /** Posts ⋈ engagement merge (linkedin_organic.py:589-595
    * `get_posts_with_engagement`: left merge on post_urn, then
    * `fillna(0).astype(int)` on the engagement counts — absent
    * engagement becomes integer 0, never null). */
  def linkedinPostsWithEngagement(posts: DataFrame, engagement: DataFrame): DataFrame = {
    val merged = posts.join(engagement, Seq("post_urn"), "left")
    Seq("likes", "comments", "shares").filter(merged.columns.contains).foldLeft(merged) {
      (acc, c) => acc.withColumn(c, coalesce(col(c), lit(0L)).cast("long"))
    }
  }

  /** YouTube public-API record frames (youtube_public.py:255,342,458:
    * `pd.json_normalize(items)` + `_normalize_df_columns` dots→_ +
    * `to_numeric(errors="coerce").astype("Int64")` on statistics
    * counters — the API returns them as strings — +
    * `to_datetime(utc=True, errors="coerce")` on published-at +
    * `_filter_columns` + `_add_extracted_at`).
    *
    * Spark realization: each input row is one page payload
    * (`{"items": [...]}` — pagination unions away exactly like the
    * reference's `all_items +=`), flattened with sep="_" and coerced
    * via [[Schemas.applySchema]] try_cast semantics: unparseable
    * counters become NULL, the Int64-with-NA twin. Coercion columns
    * apply only where present, like the reference's `if col in
    * df.columns` guard; `columns` raises on absent requests exactly
    * like `_filter_columns`.
    *
    * @param itemSchema  schema of ONE `items` entry
    * @param intCols     string-counter columns to coerce to long
    * @param tsCols      timestamp columns to coerce
    * @param columns     optional projection (absent names throw)
    * @param extractedAt optional lineage stamp (the reference uses
    *                    now(); a parameter keeps runs deterministic)
    */
  def youtubeRecords(df: DataFrame, jsonCol: String, itemSchema: StructType,
                     intCols: Seq[String] = Seq("statistics_viewCount",
                       "statistics_likeCount", "statistics_commentCount",
                       "statistics_favoriteCount"),
                     tsCols: Seq[String] = Seq("snippet_publishedAt"),
                     columns: Option[Seq[String]] = None,
                     extractedAt: Option[String] = None): DataFrame = {
    val schema = StructType(Seq(StructField("items", ArrayType(itemSchema))))
    val flat = df.select(explode(coalesce(
        from_json(col(jsonCol), schema).getField("items"), array())).as("it"))
      .select(flattenStruct(col("it"), itemSchema, prefix = "", sep = "_"): _*)
    val present = (intCols.map(_ -> "long") ++ tsCols.map(_ -> "timestamp"))
      .filter { case (n, _) => flat.columns.contains(n) }
    val coerced = Schemas.applySchema(flat, present)
    columns.foreach { cs =>
      val missing = cs.filterNot(coerced.columns.contains)
      require(missing.isEmpty,
        s"requested columns not in response: ${missing.mkString(", ")} " +
          s"(available: ${coerced.columns.mkString(", ")})")
    }
    val filtered = columns.fold(coerced)(cs => coerced.select(cs.map(col): _*))
    extractedAt.fold(filtered)(ts =>
      filtered.withColumn("extracted_at", lit(ts).cast("timestamp")))
  }

  /** HubSpot CRM records → flat DataFrame (HubSpot_Api.py:74
    * `to_dataframe`: top-level scalar fields pass through, the
    * `properties` dict flattens to one column per property, and `id`
    * renames to `hs_object_id`).
    *
    * `properties` parse as MAP<STRING,STRING> (HubSpot returns all
    * property values as strings) and `propertyNames` pins the promoted
    * columns — the same list the reference passes to the API. */
  def hubspotRecords(df: DataFrame, jsonCol: String, propertyNames: Seq[String]): DataFrame = {
    val schema = schemaOf(
      """id STRING, createdAt STRING, updatedAt STRING, archived BOOLEAN,
        |properties MAP<STRING, STRING>""".stripMargin)
    df.select(from_json(col(jsonCol), schema).as("r"))
      .filter(col("r").isNotNull && col("r.id").isNotNull)
      .select(Seq(
        col("r.id").as("hs_object_id"),
        col("r.createdAt").as("createdAt"),
        col("r.updatedAt").as("updatedAt"),
        col("r.archived").as("archived")) ++
        propertyNames.map(p => element_at(col("r.properties"), p).as(p)): _*)
  }

  /** Facebook/Instagram organic insights → one wide row per object
    * (facebook_organic.py:156 / instagram_organic.py:262
    * `_flatten_insights`: each metric's first value becomes a column;
    * `post_reactions_by_type_total` expands its nested reaction counts
    * to `reactions_{type}` columns).
    *
    * The metric field `value` is scalar for ordinary metrics and an
    * object for the reactions metric, so it parses as STRING (Spark
    * preserves non-string JSON as its raw text) and splits after the
    * pivot: scalars cast to double, the reactions object re-parses as a
    * map. `metricNames`/`reactionTypes` are pinned so the pivot needs no
    * discovery pass.
    *
    * @param df        one row per object: `idCol` + `jsonCol` holding the
    *                  insights response (`{"data": [...]}`)
    * @param metricNames scalar metric names to pivot into columns
    * @param reactionTypes reaction keys expanded from
    *                  post_reactions_by_type_total (absent → 0)
    */
  def insightsWide(df: DataFrame, idCol: String, jsonCol: String,
                   metricNames: Seq[String],
                   reactionTypes: Seq[String] = Nil): DataFrame = {
    val schema = schemaOf(
      """data ARRAY<STRUCT<name: STRING, period: STRING,
        |  values: ARRAY<STRUCT<value: STRING>>>>""".stripMargin)
    val reactionsMetric = "post_reactions_by_type_total"
    val allMetrics = metricNames ++ (if (reactionTypes.nonEmpty) Seq(reactionsMetric) else Nil)
    val exploded = df
      .select(col(idCol), posexplode(coalesce(
        from_json(col(jsonCol), schema).getField("data"), array())).as(Seq("pos", "m")))
      // lifetime-period entry preferred, first value as fallback — the
      // reference's next(...) selection (facebook_organic.py:176-180)
      .select(col(idCol), col("pos"), col("m.name").as("name"),
        col("m.values").getItem(0).getField("value").as("raw"))
    // duplicate metric entries (same metric reported twice, e.g. under
    // two periods) resolve to the LAST occurrence in the data array —
    // the reference's `flat[name] = value` dict overwrite
    // (facebook_organic.py:191); max_by on the array position makes the
    // pick deterministic where an unordered first() was not
    val wide = exploded.groupBy(col(idCol)).pivot("name", allMetrics)
      .agg(max_by(col("raw"), col("pos")))
    val withScalars = metricNames.foldLeft(wide) { (acc, mName) =>
      acc.withColumn(mName, col(mName).cast("double"))
    }
    if (reactionTypes.isEmpty) withScalars
    else {
      val rmap = from_json(col(reactionsMetric), MapType(StringType, DoubleType))
      reactionTypes.foldLeft(withScalars) { (acc, t) =>
        acc.withColumn(s"reactions_$t", coalesce(element_at(rmap, t), lit(0.0)))
      }.drop(reactionsMetric)
    }
  }

  /** Instagram organic media metadata → one row per media object
    * (instagram_organic.py:292-341 `_build_dataframe`: media fields
    * ""-defaulted, `timestamp` cast to UTC datetime, stamped with the
    * account id; the per-media insights columns merge on via
    * [[instagramMediaWithInsights]]). Input rows hold media-list page
    * payloads (`{"data": [...]}` — `_get_media`/`_paginate` pages
    * union away in the explode). */
  def instagramMedia(df: DataFrame, jsonCol: String, igAccountId: String): DataFrame = {
    val schema = schemaOf(
      """data ARRAY<STRUCT<
        |  id: STRING, media_type: STRING, media_product_type: STRING,
        |  caption: STRING, timestamp: STRING, permalink: STRING>>""".stripMargin)
    df.select(explode(coalesce(
        from_json(col(jsonCol), schema).getField("data"), array())).as("m"))
      .select(
        coalesce(col("m.id"), lit("")).as("media_id"),
        lit(igAccountId).as("ig_account_id"),
        coalesce(col("m.media_type"), lit("")).as("media_type"),
        coalesce(col("m.media_product_type"), lit("")).as("media_product_type"),
        coalesce(col("m.caption"), lit("")).as("caption"),
        col("m.timestamp").cast("timestamp").as("timestamp"),
        coalesce(col("m.permalink"), lit("")).as("permalink"))
  }

  /** Media metadata ⋈ per-media insights — the record assembly of
    * `_build_dataframe` (`{**metadata, **insights}` per media): left
    * join on media_id so media whose insights call failed keep their
    * metadata row, like the reference's partial-failure behavior. */
  def instagramMediaWithInsights(media: DataFrame, insights: DataFrame): DataFrame =
    media.join(insights, Seq("media_id"), "left")

  /** X (Twitter) Ads analytics response → per-day metric rows
    * (X_ads.py:264-299 `get_report_dataframe`: each response body holds
    * `data[0].id_data[0].metrics` as one array per metric — one element
    * per day at DAY granularity — which the reference explodes to rows,
    * fills 0, and stamps with the request's entity metadata as strings).
    *
    * The Spark analog zips the metric arrays positionally
    * (`arrays_zip` + `posexplode`), so one pass produces the same
    * (metadata × day-index × metrics) grid; entities whose `data` is
    * empty vanish, exactly like the reference's empty `iter_DF`. */
  def xAdsReport(df: DataFrame, jsonCol: String, metrics: Seq[String]): DataFrame = {
    val metricFields = metrics.map(m => s"$m: ARRAY<DOUBLE>").mkString(", ")
    val schema = schemaOf(
      s"""request STRUCT<params: STRUCT<
         |  start_time: STRING, placement: STRING, platform: STRING,
         |  entity: STRING, metric_groups: ARRAY<STRING>, entity_ids: ARRAY<STRING>>>,
         |data ARRAY<STRUCT<id: STRING, id_data: ARRAY<STRUCT<metrics: STRUCT<$metricFields>>>>>""".stripMargin)
    val perEntity = df
      .select(from_json(col(jsonCol), schema).as("p"))
      .select(
        col("p.request.params.start_time").cast("string").as("start_time"),
        col("p.request.params.placement").cast("string").as("placement"),
        col("p.request.params.platform").cast("string").as("platform"),
        col("p.request.params.entity").cast("string").as("entity"),
        col("p.request.params.metric_groups").getItem(0).cast("string").as("metric_groups"),
        col("p.request.params.entity_ids").getItem(0).cast("string").as("entity_ids"),
        explode(col("p.data")).as("d"))
    val m = col("d.id_data").getItem(0).getField("metrics")
    val zipped = arrays_zip(metrics.map(mm => m.getField(mm).as(mm)): _*)
    perEntity
      .select(col("start_time"), col("placement"), col("platform"), col("entity"),
        col("metric_groups"), col("entity_ids"), col("d.id").as("entity_id"),
        posexplode(zipped).as(Seq("day_index", "vals")))
      .select(Seq("start_time", "placement", "platform", "entity", "metric_groups",
        "entity_ids", "entity_id", "day_index").map(col) ++
        metrics.map(mm => coalesce(col("vals").getField(mm), lit(0.0)).as(mm)): _*)
  }
}

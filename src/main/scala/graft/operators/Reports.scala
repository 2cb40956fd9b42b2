package graft.operators

import graft.Tables
import graft.functions.{text => T, time => TM}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A-block relational / report-shaped operators (SURVEY.md §2 A1–A16).
  *
  * Every builder is a single declarative DataFrame pipeline: Catalyst gets
  * the whole plan, so filters/column pruning reach the parquet scans, dims
  * broadcast, and aggregations run partial-before-shuffle. Each query is
  * one logical shuffle unless noted.
  */
object Reports {

  /** A1 `q01_pricing_summary` — grouped metric aggregation report (the
    * GA4/SearchConsole report shape, Google_GA4.py:114 `_to_df`,
    * search_console.py:394). Single hash-agg shuffle with map-side
    * partial aggregation; the shipdate filter is pushed to the scan.
    */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem
      .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp_ntz"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 4).as("sum_qty"),
        round(sum(col("l_extendedprice")), 4).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4).as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .transform(d => Perf.sortedOnce(d, col("l_returnflag"), col("l_linestatus")))
  }

  /** A2 `q02_revenue_by_nation` — fact ⋈ dims report (the report-enrichment
    * join every client module performs before loading). nation/region are
    * explicitly broadcast (always tiny); the customer/orders joins shuffle
    * on their keys and AQE may still convert them at runtime. */
  def revenueByNation(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4).as("revenue"),
        count(lit(1)).as("n_lineitems"))
      .transform(d => Perf.sortedOnce(d, col("r_name"), col("n_name")))
  }

  /** A3 `q03_top_orders_per_segment` — top-N per group (serp_api.py:84
    * top-N domains shape, kept generic). One exchange on the partition
    * key; ties broken by orderkey for determinism. */
  def topOrdersPerSegment(spark: SparkSession, dir: String, n: Int = 5): DataFrame = {
    val t = Tables(spark, dir)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    t.orders
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= n)
      .select(col("c_mktsegment"), col("rn"), col("o_orderkey"), round(col("o_totalprice"), 4).as("o_totalprice"))
      .transform(d => Perf.sortedOnce(d, col("c_mktsegment"), col("rn")))
  }

  /** A4 `q04_daily_order_spine` — date-spine + zero-filled daily series
    * (the Spark-native replacement for the reference's per-day extraction
    * loops, Google_GA4.py:230 `_get_paginated_report`,
    * Facebook_Marketing.py:53). The spine is generated from min/max
    * bounds — tiny — and joined broadcast against the single-shuffle
    * daily aggregate. */
  def dailyOrderSpine(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val orders = t.orders
    val bounds = orders.agg(
      min(to_date(col("o_orderdate"))).as("lo"),
      max(to_date(col("o_orderdate"))).as("hi"))
    val spine = bounds.select(explode(TM.dateSpine(col("lo"), col("hi"))).as("day"))
    val daily = orders
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("n_orders"), sum(col("o_totalprice")).as("rev"))
    spine
      .join(broadcast(daily), Seq("day"), "left")
      .select(
        col("day"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        round(coalesce(col("rev"), lit(0.0)), 4).as("revenue"))
      .transform(d => Perf.sortedOnce(d, col("day")))
  }

  /** Pinned pivot value list for A5 — pinning avoids the extra distinct
    * scan `pivot(col)` would otherwise run (SURVEY §2 note). */
  val eventTypes: Seq[String] = Seq("click", "error", "purchase", "signup", "view")

  /** A5 `q05_event_type_pivot` — long→wide pivot on a type column
    * (Facebook_Marketing.py:97-120 `_action_{type}` column fan-out).
    * Single shuffle: pivot aggregation is partial map-side. */
  def eventTypePivot(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val wide = t.events
      .groupBy(col("user_id"))
      .pivot("event_type", eventTypes)
      .agg(round(sum(col("value")), 4))
      .na.fill(0.0, eventTypes)
    wide
      .select(col("user_id") +: eventTypes.map(tp => col(tp).as(s"${tp}_value")): _*)
      .transform(d => Perf.sortedOnce(d, col("user_id")))
  }

  /** A6 `q06_sales_report` — derived sales metrics + status mapping
    * (shopify_api.py:98 `orders_to_dataframe`: gross/discounts/net totals
    * and conditional status columns). One join shuffle on orderkey, one
    * aggregation riding the same key. */
  def salesReport(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    // Money sums accumulate EXACTLY, so 4-dp rounding is identical
    // regardless of partial-aggregation merge order (double sums would
    // flip the last rounded digit on boundary values run-to-run). The
    // addends carry at most 6 decimal digits (price 2dp x discount 2dp x
    // tax 2dp), so scaled-long accumulation (x1e6) is exact, far cheaper
    // than DECIMAL aggregation, and bounded well under 2^53 per order —
    // the sum converts back to double losslessly.
    def scaled(c: org.apache.spark.sql.Column) = round(c * 1000000.0).cast("long")
    val perOrder = t.lineitem
      .groupBy(col("l_orderkey"))
      .agg(
        sum(scaled(col("l_extendedprice"))).as("gross_s"),
        sum(scaled(col("l_extendedprice") * col("l_discount"))).as("disc_s"),
        sum(scaled(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * col("l_tax"))).as("tax_s"))
    // +1e-9 epsilon: sums are exact multiples of 1e-6, so values can land
    // exactly ON the .00005 rounding boundary where engine round
    // implementations disagree; the nudge (far above representation
    // error, far below the 1e-6 value grid) breaks the tie identically
    // everywhere without moving any non-tie value.
    def money(c: org.apache.spark.sql.Column) =
      round(coalesce(c, lit(0L)).cast("double") / 1000000.0 + lit(1e-9), 4)
    t.orders
      .join(perOrder, col("o_orderkey") === col("l_orderkey"), "left")
      .select(
        col("o_orderkey"),
        when(col("o_orderstatus") === "F", "fulfilled")
          .when(col("o_orderstatus") === "O", "open")
          .when(col("o_orderstatus") === "P", "partial")
          .otherwise("unknown").as("status_label"),
        col("o_orderpriority").isin("1-URGENT", "2-HIGH").as("is_priority"),
        money(col("gross_s")).as("gross"),
        money(col("disc_s")).as("discount_amt"),
        money(col("tax_s")).as("tax_amt"),
        money(col("gross_s") - col("disc_s") + col("tax_s")).as("net"))
      .transform(d => Perf.sortedOnce(d, col("o_orderkey")))
  }

  /** `q33_sales_returns` — the Shopify sales report WITH the
    * refunds/returns leg (shopify_api.py:98-155 `orders_to_dataframe`):
    * returns = Σ over refunded items of (subtotal − total_tax)
    * (shopify_api.py:113-117, where subtotal is the discounted line
    * price), `custom_total_sales = total_sales − returns` (:145), and a
    * financial-status label (paid / partially_refunded / refunded). On
    * the TPC-H star schema, lineitems with `l_returnflag = 'R'` play the
    * refund_line_items role; subtotal = extendedprice·(1−discount) and
    * tax = subtotal·l_tax, mirroring the reference's per-refund-line
    * arithmetic. Single groupBy on orderkey + one join riding the same
    * key — the q06 plan shape with two more conditional sums.
    */
  def salesReturns(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    // scaled-long exact money sums + boundary nudge — same rationale as
    // salesReport above.
    def scaled(c: org.apache.spark.sql.Column) = round(c * 1000000.0).cast("long")
    val subtotal = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    val returned = col("l_returnflag") === "R"
    val perOrder = t.lineitem
      .groupBy(col("l_orderkey"))
      .agg(
        sum(scaled(col("l_extendedprice"))).as("gross_s"),
        sum(scaled(col("l_extendedprice") * col("l_discount"))).as("disc_s"),
        sum(scaled(subtotal * col("l_tax"))).as("tax_s"),
        // returns = Σ (subtotal − tax_on_refund) over refunded lines
        sum(when(returned, scaled(subtotal) - scaled(subtotal * col("l_tax")))
          .otherwise(lit(0L))).as("ret_s"),
        count(lit(1)).as("n_lines"),
        sum(when(returned, 1L).otherwise(0L)).as("n_returned"))
    def money(c: org.apache.spark.sql.Column) =
      round(coalesce(c, lit(0L)).cast("double") / 1000000.0 + lit(1e-9), 4)
    t.orders
      .join(perOrder, col("o_orderkey") === col("l_orderkey"), "left")
      .select(
        col("o_orderkey"),
        // financial_status analog: no refunded lines → paid; all lines
        // refunded → refunded; otherwise partially_refunded.
        when(coalesce(col("n_returned"), lit(0L)) === 0L, "paid")
          .when(col("n_returned") === col("n_lines"), "refunded")
          .otherwise("partially_refunded").as("financial_status"),
        money(col("gross_s")).as("gross_sales"),
        money(col("disc_s")).as("discounts"),
        money(col("ret_s")).as("returns"),
        money(col("tax_s")).as("taxes"),
        round(col("o_totalprice") + lit(1e-9), 4).as("total_sales"),
        // custom_total_sales = total_sales − returns (shopify_api.py:145)
        round(col("o_totalprice") - coalesce(col("ret_s"), lit(0L)).cast("double") / 1000000.0
          + lit(1e-9), 4).as("custom_total_sales"))
      .transform(d => Perf.sortedOnce(d, col("o_orderkey")))
  }

  /** `q34_refunds_frame` — the `refunds_input=True` branch of
    * `orders_to_dataframe` (shopify_api.py:152-156): refund rows are
    * DATED BY THE UPDATE TIME, not the order time, and `total_sales` is
    * negated so the frame unions into a sales ledger as a correcting
    * entry. On TPC-H: only orders with refunded lines appear, dated by
    * the latest `l_shipdate` among their returned items (the
    * updated_at analog). Same single-shuffle aggregate-then-join shape.
    */
  def refundsFrame(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    def scaled(c: org.apache.spark.sql.Column) = round(c * 1000000.0).cast("long")
    val subtotal = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    val perOrder = t.lineitem
      .filter(col("l_returnflag") === "R")
      .groupBy(col("l_orderkey"))
      .agg(
        sum(scaled(subtotal) - scaled(subtotal * col("l_tax"))).as("ret_s"),
        max(to_date(col("l_shipdate"))).as("refund_date"))
    t.orders
      .join(perOrder, col("o_orderkey") === col("l_orderkey"))
      .select(
        col("o_orderkey"),
        col("refund_date"),
        round(col("ret_s").cast("double") / 1000000.0 + lit(1e-9), 4).as("returns"),
        round(-col("o_totalprice") + lit(1e-9), 4).as("total_sales"))
      .transform(d => Perf.sortedOnce(d, col("o_orderkey")))
  }

  /** A7 `q07_clean_strings` — value/schema-name cleaning
    * (Google_Bigquery.py:57 `dataframe_clean_cols` + unidecode accent
    * strip). Narrow map-only plan — zero shuffles. */
  def cleanStrings(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.part
      .select(
        col("p_partkey"),
        col("p_name"),
        T.cleanName(col("p_name")).as("clean_name"),
        T.cleanName(col("p_type")).as("clean_type"),
        T.cleanName(col("p_brand")).as("clean_brand"))
      .transform(d => Perf.sortedOnce(d, col("p_partkey")))
  }

  /** A10 `q10_hourly_rollup` — tumbling time-window aggregation (batch twin
    * of the D1 streaming rollup; GA4-realtime-style intraday report).
    * Uses the native `window()` tumbling bucketizer; single shuffle. */
  def hourlyRollup(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("total_value"))
      .select(
        col("w.start").cast("timestamp_ntz").as("hour_start"),
        col("event_type"), col("n_events"), col("total_value"))
      .transform(d => Perf.sortedOnce(d, col("hour_start"), col("event_type")))
  }

  /** A12+A15 `q12_union_coalesce` — union of heterogeneous daily frames +
    * fillna + metadata enrichment (`pd.concat` + `fillna(0)` at
    * X_ads.py:280-299; `extracted_at`-style lineage cols at
    * youtube_public.py:123). `unionByName(allowMissingColumns)` is the
    * Spark-native `concat`; fills are map-side, no shuffle beyond the
    * final ordering. */
  def unionCoalesce(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val open = t.orders.filter(col("o_orderstatus") === "O")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        lit("open_extract").as("src"))
    val closed = t.orders.filter(col("o_orderstatus") =!= "O")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"),
        lit("closed_extract").as("src"))
    open.unionByName(closed, allowMissingColumns = true)
      .select(
        col("o_orderkey"),
        col("o_custkey"),
        round(coalesce(col("o_totalprice"), lit(0.0)), 4).as("o_totalprice"),
        coalesce(col("o_orderpriority"), lit("NONE")).as("o_orderpriority"),
        col("src"),
        lit("batch_2026_01").as("batch_id"))
      .transform(d => Perf.sortedOnce(d, col("o_orderkey"), col("src")))
  }

  /** A13 `q13_utc_day_bounds` — UTC→region local time + day start/end
    * modes (utc_converter.py:34 `convert`, modes at :52-54). Map-only
    * expression plan, no shuffle. */
  def utcDayBounds(spark: SparkSession, dir: String, region: String = "chile"): DataFrame = {
    val t = Tables(spark, dir)
    t.events
      .select(
        col("event_id"),
        col("ts").as("utc_ts"),
        TM.toLocal(col("ts"), region).as("local_ts"),
        to_date(TM.toLocal(col("ts"), region)).as("local_date"),
        TM.dayStartUtc(col("ts"), region).as("day_start_utc"),
        TM.dayEndUtc(col("ts"), region).as("day_end_utc"))
      .transform(d => Perf.sortedOnce(d, col("event_id")))
  }

  /** A14 `q14_partitioned_sink` — partitioned-by-date sink round-trip
    * (Google_Bigquery.py:82 `upload`: one partition per date value).
    * Writes `partitionBy(order_year)` parquet with a `maxRecordsPerFile`
    * guard, reads it back, and aggregates per partition — the oracle
    * checks the round-trip against a direct aggregation. */
  def partitionedSink(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val out = s"${sys.props("java.io.tmpdir")}/graft_q14_${math.abs(dir.hashCode)}"
    t.orders
      .withColumn("order_year", year(col("o_orderdate")))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", 5000000)
      .partitionBy("order_year")
      .parquet(out)
    spark.read.parquet(out)
      .groupBy(col("order_year").cast("int").as("order_year"))
      .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 4).as("revenue"))
      .transform(d => Perf.sortedOnce(d, col("order_year")))
  }
}

package graft

import graft.operators.Reports
import org.apache.spark.sql.functions._

/** Shopify returns-leg semantics (shopify_api.py:98-155) on the TPC-H
  * star schema: q33 per-order returns + financial status, q34 negated
  * update-dated refunds frame. The DuckDB oracle checks values; these
  * specs pin the reference CONTRACT (who appears, signs, identities). */
class SalesSpec extends SparkSpecBase {
  import spark.implicits._

  test("orders without returned lines are 'paid' with zero returns") {
    val out = Reports.salesReturns(spark, sfDir)
    val paid = out.filter(col("financial_status") === "paid")
    assert(paid.count() > 0)
    assert(paid.filter(col("returns") =!= 0.0).count() == 0)
    // and every order with returns > 0 is partially_refunded or refunded
    assert(out.filter(col("returns") > 0 && col("financial_status") === "paid").count() == 0)
  }

  test("custom_total_sales = total_sales - returns (shopify_api.py:145)") {
    val out = Reports.salesReturns(spark, sfDir)
      .select(col("total_sales"), col("returns"), col("custom_total_sales"))
      .as[(Double, Double, Double)].collect()
    out.foreach { case (total, ret, custom) =>
      assert(math.abs(custom - (total - ret)) < 2e-4, s"$custom vs ${total - ret}")
    }
  }

  test("refunds frame: negated totals, dated by latest returned-line date") {
    val refunds = Reports.refundsFrame(spark, sfDir)
    assert(refunds.filter(col("total_sales") >= 0).count() == 0,
      "refunds_input=True negates total_sales")
    // exactly the orders that have at least one returned line appear
    val t = Tables(spark, sfDir)
    val expected = t.lineitem.filter(col("l_returnflag") === "R")
      .select(col("l_orderkey")).distinct().count()
    assert(refunds.count() == expected)
  }
}

package graft

import graft.sources.Bucketing
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpecBase {

  test("co-located join of two bucketed tables runs without exchanges") {
    val t = Tables(spark, sfDir)
    Bucketing.writeBucketed(
      t.orders.select("o_orderkey", "o_custkey", "o_totalprice"),
      "b_orders", Seq("o_orderkey"), numBuckets = 8)
    Bucketing.writeBucketed(
      t.lineitem.select(col("l_orderkey").as("o_orderkey"), col("l_quantity")),
      "b_lineitem", Seq("o_orderkey"), numBuckets = 8)

    // force sort-merge so the co-location (not a broadcast) is what's tested
    val joined = spark.table("b_orders").hint("merge")
      .join(spark.table("b_lineitem"), Seq("o_orderkey"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString

    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n${plan.take(800)}")
    assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n${plan.take(1500)}")
    // and it still computes the right thing
    val expected = t.orders.join(
      t.lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), Seq("o_orderkey")).count()
    assert(joined.count() == expected)
  }

  test("groupBy on the bucket key also avoids the shuffle") {
    val agg = spark.table("b_lineitem").groupBy("o_orderkey").agg(sum("l_quantity"))
    agg.collect()
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
      s"bucketed groupBy must not shuffle:\n${plan.take(1500)}")
  }
}

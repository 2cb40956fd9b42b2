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

  test("compactBucketed heals append fragmentation and preserves the bucket contract") {
    import spark.implicits._
    def seed(lo: Long, hi: Long) =
      (lo until hi).map(i => (i, s"v$i")).toDF("k", "v")
    Bucketing.writeBucketed(seed(0, 200), "b_compact", Seq("k"), numBuckets = 4)
    // three streaming-style appends: one file per bucket per trigger
    (1 to 3).foreach { b =>
      seed(200L * b, 200L * (b + 1))
        .write.mode(org.apache.spark.sql.SaveMode.Append)
        .format("parquet").bucketBy(4, "k").sortBy("k").saveAsTable("b_compact")
    }
    def files() = spark.table("b_compact").select(input_file_name().as("f"))
      .distinct().count()
    def rows() = spark.table("b_compact").as[(Long, String)].collect().toSet
    val before = rows()
    assert(before.size == 800)
    assert(files() > 4, s"appends should fragment past one file per bucket: ${files()}")
    assert(Bucketing.compactBucketed(spark, "b_compact"), "fragmented table must rewrite")
    assert(files() <= 4, s"compacted to at most one file per bucket: ${files()}")
    assert(rows() == before, "compaction must not change a single row")
    // the table is still genuinely bucketed: key groupBy plans no shuffle
    val agg = spark.table("b_compact").groupBy("k").count()
    agg.collect()
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketing must survive compaction:\n${plan.take(1200)}")
    // healthy table → idempotent no-op
    assert(!Bucketing.compactBucketed(spark, "b_compact"), "healthy table must no-op")
    assert(rows() == before)
    // a plain (unbucketed) table refuses: this compactor exists to
    // preserve bucketing, silently losing it would be the failure mode.
    // Clear any stale managed location first — a previous JVM's
    // warehouse files survive the in-memory catalog (the same hygiene
    // writeBucketed applies), and CTAS refuses an occupied location.
    spark.sql("DROP TABLE IF EXISTS `b_plain`")
    val plainLoc = new org.apache.hadoop.fs.Path(
      s"${spark.conf.get("spark.sql.warehouse.dir")}/b_plain")
    val plainFs = plainLoc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (plainFs.exists(plainLoc)) plainFs.delete(plainLoc, true)
    seed(0, 10).write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .saveAsTable("b_plain")
    val ex = intercept[IllegalArgumentException] {
      Bucketing.compactBucketed(spark, "b_plain")
    }
    assert(ex.getMessage.contains("no bucket spec"))
  }
}

package graft

import graft.operators.{Dedup, Perf, Pipeline}
import org.apache.spark.sql.functions._

/** r19 optimization-round helpers: the materialized final sort, the
  * batch-keyed index-scan prune, data-derived bundle buckets, and the
  * legacy census seed. */
class PerfSpec extends SparkSpecBase {
  import spark.implicits._

  test("sortedOnce: materialized and plain sorts return identical rows in order") {
    val df = spark.range(0, 1000).select(
      (col("id") % 7).as("k"), col("id").as("v"))
    val plain = df.orderBy(col("k"), col("v")).collect().toSeq
    // force the materializing branch regardless of the spec-base toggle
    val was = spark.conf.get("spark.graft.sortedOnce.materialize", "true")
    try {
      spark.conf.set("spark.graft.sortedOnce.materialize", "true")
      val mat = Perf.sortedOnce(df, col("k"), col("v")).collect().toSeq
      assert(mat == plain, "materialized sort drifted from plain orderBy")
    } finally spark.conf.set("spark.graft.sortedOnce.materialize", was)
  }

  test("prunedByKeys: equivalence under join, In pushed at the scan, cap skips") {
    val index = (0L until 500L).map(i => (i, s"row$i")).toDF("k", "payload")
    val dir = java.nio.file.Files.createTempDirectory("perf_prune").toString
    index.write.mode("overwrite").parquet(dir)
    val idx = spark.read.parquet(dir)
    val batch = Seq(3L, 7L, 7L, 499L, 1000L).toDF("k")
    val pruned = Perf.prunedByKeys(idx, "k", batch)
    // equivalence: inner join results identical with and without the prune
    val a = batch.join(idx, Seq("k")).orderBy(col("k"), col("payload")).collect().toSeq
    val b = batch.join(pruned, Seq("k")).orderBy(col("k"), col("payload")).collect().toSeq
    assert(a == b, "pruned join drifted")
    // the filter reaches the parquet scan as a pushed In predicate
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("In(k"),
      s"batch-key In not pushed at the scan:\n$plan")
    // past the cap the prune is skipped — the index reads whole
    val big = spark.range(0, 50).select(col("id").as("k"))
    val skipped = Perf.prunedByKeys(idx, "k", big, maxKeys = 10)
    assert(skipped.count() == 500L, "over-cap prune must be a no-op")
    // an empty batch prunes to nothing (what an inner join would keep)
    assert(Perf.prunedByKeys(idx, "k", batch.limit(0)).count() == 0L)
    // an in-memory index has no scan I/O to prune — the prune is a
    // no-op (no collect job, no literal list)
    val mem = index.localCheckpoint()
    assert(Perf.prunedByKeys(mem, "k", batch).count() == 500L,
      "in-memory index must skip the prune")
  }

  test("bucketsForBytes: buckets track the data, not the box") {
    // a test-scale member lands at the floor, not 32 near-empty files
    assert(Pipeline.bucketsForBytes(16L << 20) == 4)
    // a big member picks far more than the local default
    assert(Pipeline.bucketsForBytes(100L << 30) > 32,
      "a 100 GiB member must size past the local 32-bucket default")
    // exact target multiples round up
    assert(Pipeline.bucketsForBytes((128L << 20) * 10 + 1) == 11)
  }

  test("bumpEvalGramCensus: a legacy census-less index seeds from the live count") {
    val dir = java.nio.file.Files.createTempDirectory("perf_census").toString
    val idxPath = s"$dir/eval_grams"
    // a pre-census index with 7 distinct grams (legacy bundle shape)
    (1L to 7L).toDF("g").write.mode("overwrite").parquet(idxPath)
    assert(Dedup.readEvalGramCensus(spark, idxPath).isEmpty)
    // the first bump must seed from the LIVE index, never from 0:
    // stored = 7 (live distinct) + 3 (the append's new grams)
    val stored = Dedup.bumpEvalGramCensus(spark, idxPath, added = 3L)
    assert(stored == 10L,
      s"legacy seed must be live-count + added (7 + 3), got $stored")
    assert(Dedup.readEvalGramCensus(spark, idxPath).contains(10L))
    // later bumps stay O(1) on the stored value
    assert(Dedup.bumpEvalGramCensus(spark, idxPath, added = 2L) == 12L)
  }
}

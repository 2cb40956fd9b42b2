package graft

import graft.operators.{Dedup, Perf, Pipeline}
import org.apache.spark.sql.functions._

/** r19 optimization-round helpers: the materialized final sort, the
  * batch-keyed index-scan prune, data-derived bundle buckets, and the
  * legacy census seed. */
class PerfSpec extends SparkSpecBase {
  import spark.implicits._

  test("sortedOnce: every strategy returns identical rows in order") {
    val df = spark.range(0, 1000).select(
      (col("id") % 7).as("k"), col("id").as("v"))
    val plain = df.orderBy(col("k"), col("v")).collect().toSeq
    // force the materializing branch regardless of the spec-base toggle
    val was = spark.conf.get("spark.graft.sortedOnce.materialize", "true")
    try {
      spark.conf.set("spark.graft.sortedOnce.materialize", "true")
      for (s <- Seq("exchange", "checkpoint")) {
        spark.conf.set("spark.graft.sortedOnce.strategy", s)
        val mat = Perf.sortedOnce(df, col("k"), col("v")).collect().toSeq
        assert(mat == plain, s"$s sort drifted from plain orderBy")
      }
      // the default (exchange) barrier puts a round-robin exchange
      // under the sort — the range sampler then reads materialized
      // shuffle output instead of re-executing the lineage — and,
      // unlike the r19 checkpoint barrier, truncates no lineage
      spark.conf.set("spark.graft.sortedOnce.strategy", "exchange")
      val plan = Perf.sortedOnce(df, col("k"), col("v"))
        .queryExecution.executedPlan.toString
      assert(plan.contains("ROUND_ROBIN") || plan.contains("RoundRobin"),
        s"exchange barrier missing under the sort:\n$plan")
    } finally {
      spark.conf.set("spark.graft.sortedOnce.materialize", was)
      spark.conf.unset("spark.graft.sortedOnce.strategy")
    }
  }

  test("kernelSpread: gated on observed input parallelism") {
    val target = spark.sparkContext.defaultParallelism
    // a single-partition in-memory input spreads to full width
    val narrow = spark.range(0, 100).toDF("id").repartition(1).localCheckpoint()
    assert(Perf.kernelSpread(narrow).rdd.getNumPartitions == target,
      "single-slice input must spread")
    // an input already at >= half the session width passes through
    // UNEXCHANGED (verdict item 5: at 100 TB the scan arrives in
    // thousands of splits and a re-shuffle buys nothing)
    val wide = spark.range(0, 1000).toDF("id")
      .repartition(math.max(1, target / 2)).localCheckpoint()
    val spread = Perf.kernelSpread(wide)
    assert(spread.queryExecution.optimizedPlan.toString == wide.queryExecution.optimizedPlan.toString,
      "already-parallel input must pass through unexchanged")
  }

  test("prunedByKeys: equivalence under join, In pushed at the scan, cap skips") {
    val index = (0L until 500L).map(i => (i, s"row$i")).toDF("k", "payload")
    val dir = java.nio.file.Files.createTempDirectory("perf_prune").toString
    index.write.mode("overwrite").parquet(dir)
    val idx = spark.read.parquet(dir)
    val batch = Seq(3L, 7L, 7L, 499L, 1000L).toDF("k")
    // size gate (r20): by DEFAULT an index this small skips the prune
    // entirely — the collect job costs more than ~KB of scan it saves
    // (the r18-vs-r19 interleaved A/B on q178) — and the probes'
    // batch-side checkpoint gate agrees
    assert(Perf.prunedByKeys(idx, "k", batch).queryExecution.optimizedPlan.toString
      == idx.queryExecution.optimizedPlan.toString,
      "a small index must skip the prune by default")
    assert(!Perf.willPrune(idx), "willPrune must agree with the size gate")
    // force the prune on (threshold 0) to pin its semantics
    spark.conf.set("spark.graft.probePrune.minIndexBytes", "0")
    assert(Perf.willPrune(idx))
    val pruned = Perf.prunedByKeys(idx, "k", batch)
    // equivalence: inner join results identical with and without the prune
    val a = batch.join(idx, Seq("k")).orderBy(col("k"), col("payload")).collect().toSeq
    val b = batch.join(pruned, Seq("k")).orderBy(col("k"), col("payload")).collect().toSeq
    assert(a == b, "pruned join drifted")
    // the filter reaches the parquet scan as a pushed In predicate
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("In(k"),
      s"batch-key In not pushed at the scan:\n$plan")
    // past the cap the prune falls back to a runtime BLOOM filter
    // (r20, verdict item 4) — but ONLY against an index big enough for
    // the row-dropping to beat the bloom's own jobs (measured r20: an
    // unconditional bloom regressed q178 14.5 → 25 s at sf0.1). Against
    // this tiny index the default gate makes the over-cap prune a
    // no-op, exactly the r19 behavior:
    val big = spark.range(0, 50).select(col("id").as("k"))
    assert(Perf.prunedByKeys(idx, "k", big, maxKeys = 10).count() == 500L,
      "over-cap prune against a small index must be a no-op")
    // force the bloom (threshold 0) to pin its semantics: no false
    // negatives — every index row the batch can join survives, so join
    // results are identical — and most non-matching rows drop
    spark.conf.set("spark.graft.probePrune.bloomMinIndexBytes", "0")
    try {
      val bloomed = Perf.prunedByKeys(idx, "k", big, maxKeys = 10)
      val viaBloom = big.join(bloomed, Seq("k")).orderBy(col("k")).collect().toSeq
      val exact = big.join(idx, Seq("k")).orderBy(col("k")).collect().toSeq
      assert(viaBloom == exact, "bloom prune dropped a matching index row")
      val kept = bloomed.count()
      assert(kept >= 50L && kept < 500L,
        s"bloom prune should keep the ~50 matches and drop most of the rest, kept $kept")
      assert(!bloomed.queryExecution.executedPlan.toString.contains("In(k"),
        "over-cap prune must not push a literal In list")
    } finally spark.conf.unset("spark.graft.probePrune.bloomMinIndexBytes")
    // an empty batch prunes to nothing (what an inner join would keep)
    assert(Perf.prunedByKeys(idx, "k", batch.limit(0)).count() == 0L)
    // an in-memory index has no scan I/O to prune — the prune is a
    // no-op (no collect job, no literal list)
    val mem = index.localCheckpoint()
    assert(Perf.prunedByKeys(mem, "k", batch).count() == 500L,
      "in-memory index must skip the prune")
    spark.conf.unset("spark.graft.probePrune.minIndexBytes")
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

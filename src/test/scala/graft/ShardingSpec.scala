package graft

import graft.operators.Sharding
import org.apache.spark.sql.functions._

class ShardingSpec extends SparkSpecBase {
  import spark.implicits._

  test("writeShards is a deterministic partition: every row exactly once, same seed ⇒ same layout") {
    val docs = Tables(spark, sfDir).documents.select("doc_id", "text")
    val n = docs.count()
    val p1 = java.nio.file.Files.createTempDirectory("graft_shards1").toString
    val p2 = java.nio.file.Files.createTempDirectory("graft_shards2").toString
    Sharding.writeShards(docs, p1, "doc_id", numShards = 4, seed = 7L)
    Sharding.writeShards(docs, p2, "doc_id", numShards = 4, seed = 7L)
    val r1 = spark.read.parquet(p1).select(col("doc_id"), col("shard"))
      .as[(Long, Int)].collect().toMap
    val r2 = spark.read.parquet(p2).select(col("doc_id"), col("shard"))
      .as[(Long, Int)].collect().toMap
    assert(r1.size == n, "no row lost or duplicated")
    assert(r1 == r2, "same seed must reproduce the exact shard assignment")
    assert(r1.values.toSet.subsetOf((0 until 4).toSet))
    // shards are usefully balanced under the hash route
    val sizes = r1.values.groupBy(identity).view.mapValues(_.size)
    assert(sizes.values.min > n / 8, s"shard sizes too skewed: $sizes")
    // a different seed is a different permutation
    val p3 = java.nio.file.Files.createTempDirectory("graft_shards3").toString
    Sharding.writeShards(docs, p3, "doc_id", numShards = 4, seed = 8L)
    val r3 = spark.read.parquet(p3).select(col("doc_id"), col("shard"))
      .as[(Long, Int)].collect().toMap
    assert(r3 != r1, "new seed must reshuffle")
  }

  test("splitByHash partitions rows deterministically with ~weight proportions") {
    val docs = Tables(spark, sfDir).documents.select("doc_id")
    val n = docs.count().toDouble
    val splits = Sharding.splitByHash(docs, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), seed = 3L)
    val ids = splits.view.mapValues(_.as[Long].collect().toSet).toMap
    // exact partition: disjoint and complete
    assert(ids.values.map(_.size).sum == n.toLong)
    assert(ids("train").intersect(ids("val")).isEmpty)
    assert(ids("train").intersect(ids("test")).isEmpty)
    assert(ids("val").intersect(ids("test")).isEmpty)
    // proportions within sampling tolerance
    assert(math.abs(ids("train").size / n - 0.8) < 0.06, s"train ${ids("train").size / n}")
    assert(math.abs(ids("val").size / n - 0.1) < 0.05)
    // deterministic: the same seed reproduces membership exactly
    val again = Sharding.splitByHash(docs, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), seed = 3L)
    assert(again("val").as[Long].collect().toSet == ids("val"))
    // and no shuffle: the split is a pure filter over the scan
    val plan = splits("train").queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "splitByHash must not shuffle")
  }

  test("sampleByHash draws a deterministic retry-stable sample, no shuffle") {
    val docs = Tables(spark, sfDir).documents.select("doc_id")
    val n = docs.count().toDouble
    val s1 = Sharding.sampleByHash(docs, "doc_id", 0.3, seed = 11L)
    val ids1 = s1.as[Long].collect().toSet
    assert(math.abs(ids1.size / n - 0.3) < 0.06, s"got ${ids1.size / n}")
    // same seed = same membership; new seed = an independent draw
    val ids2 = Sharding.sampleByHash(docs, "doc_id", 0.3, seed = 11L).as[Long].collect().toSet
    assert(ids2 == ids1)
    val ids3 = Sharding.sampleByHash(docs, "doc_id", 0.3, seed = 12L).as[Long].collect().toSet
    assert(ids3 != ids1)
    // nested property: a smaller fraction at the same seed is a SUBSET
    // (u(id) doesn't change — only the cut moves)
    val small = Sharding.sampleByHash(docs, "doc_id", 0.1, seed = 11L).as[Long].collect().toSet
    assert(small.subsetOf(ids1))
    assert(!s1.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("sampleByWeight keeps rows proportionally to their weights, deterministic and nested") {
    import org.apache.spark.sql.functions._
    // two weight classes: 10k light (0.1) + 10k heavy (0.8)
    val docs = spark.range(20000)
      .select(col("id").as("doc_id"),
        when(col("id") % 2 === 0, 0.1).otherwise(0.8).as("w"))
    val kept = Sharding.sampleByWeight(docs, "doc_id", "w", seed = 7L)
    val byClass = kept.groupBy("w").count()
      .as[(Double, Long)].collect().toMap
    assert(math.abs(byClass(0.1) / 10000.0 - 0.1) < 0.02, byClass)
    assert(math.abs(byClass(0.8) / 10000.0 - 0.8) < 0.02, byClass)
    // deterministic across runs
    val ids1 = kept.select("doc_id").as[Long].collect().toSet
    val ids2 = Sharding.sampleByWeight(docs, "doc_id", "w", seed = 7L)
      .select("doc_id").as[Long].collect().toSet
    assert(ids1 == ids2)
    // nested in scale: halving scale shrinks membership to a subset
    val half = Sharding.sampleByWeight(docs, "doc_id", "w", scale = 0.5, seed = 7L)
      .select("doc_id").as[Long].collect().toSet
    assert(half.subsetOf(ids1))
    // saturation + rejection: weight >= 1/scale keeps always, < 0 never
    val edge = Seq((1L, 5.0), (2L, -1.0)).toDF("doc_id", "w")
    val e = Sharding.sampleByWeight(edge, "doc_id", "w", seed = 7L)
      .select("doc_id").as[Long].collect().toSet
    assert(e == Set(1L))
    // still a map-only filter
    assert(!kept.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("mixCorpora applies per-source rates in one map-only pass") {
    val docs = Tables(spark, sfDir).documents.select("doc_id", "source")
    val bySource = docs.groupBy("source").count().as[(String, Long)].collect().toMap
    val srcs = bySource.keys.toSeq.sorted
    assert(srcs.size >= 2, s"need multiple sources, got $srcs")
    val keepAll = srcs.head; val keepNone = srcs.last
    val rates = Map(keepAll -> 1.0, keepNone -> 0.0) ++
      srcs.drop(1).dropRight(1).map(_ -> 0.5)
    val mixed = Sharding.mixCorpora(docs, "doc_id", "source", rates, seed = 7L)
    val counts = mixed.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(counts(keepAll) == bySource(keepAll), "rate 1.0 keeps everything")
    assert(!counts.contains(keepNone), "rate 0.0 drops the source entirely")
    // per-source populations are small (25 docs at sf0.01), so assert
    // the 0.5-rate proportion over their UNION (n≈450 → tight), and
    // only sanity-bound each source individually
    val half = srcs.drop(1).dropRight(1)
    val keptHalf = half.map(s => counts.getOrElse(s, 0L)).sum.toDouble
    val totalHalf = half.map(bySource).sum.toDouble
    assert(math.abs(keptHalf / totalHalf - 0.5) < 0.08,
      s"aggregate 0.5-rate fraction ${keptHalf / totalHalf}")
    // unknown sources drop under the default rate
    val defaulted = Sharding.mixCorpora(docs, "doc_id", "source",
      Map(keepAll -> 1.0), seed = 7L)
    assert(defaulted.select("source").distinct().as[String].collect().toSeq == Seq(keepAll))
    assert(!mixed.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("md5Unit draw: uniform-ish, stable, and accepted by the sampling operators") {
    val docs = Tables(spark, sfDir).documents.select("doc_id", "source", "n_chars")
    // the portable draw is a real unit draw: [0,1), roughly uniform
    val us = docs.select(Sharding.md5Unit(col("doc_id"), 7L)).as[Double].collect()
    assert(us.forall(u => u >= 0.0 && u < 1.0))
    assert(math.abs(us.sum / us.length - 0.5) < 0.05, s"mean ${us.sum / us.length}")
    // same formula, same kept set — the draw override routes through
    // the same threshold logic as the built-in hashUnit
    val viaDraw = Sharding.mixCorpora(docs, "doc_id", "source",
      Map("src0" -> 1.0), defaultRate = 0.2, seed = 7L,
      draw = Some(Sharding.md5Unit(col("doc_id"), 7L)))
      .select("doc_id").as[Long].collect().toSet
    val manual = docs.filter(Sharding.md5Unit(col("doc_id"), 7L) <
        when(col("source") === "src0", 1.0).otherwise(0.2))
      .select("doc_id").as[Long].collect().toSet
    assert(viaDraw == manual)
    // still map-only with the portable draw
    val planned = Sharding.sampleByWeight(docs, "doc_id", "n_chars",
      scale = 1.0 / 400.0, draw = Some(Sharding.md5Unit(col("doc_id"), 11L)))
    assert(!planned.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("packByTokenBudget fills chunks to the budget and never globally sorts") {
    import spark.implicits._
    // planted: 10 docs of 600 tokens in one shard → cumBefore/2048
    // packs 600*4=2400>2048 — chunks of 4,4,2? cum before doc i = 600i;
    // chunk = floor(600i/2048): i=0..3→0, i=4..6→1(2400..3600), ...
    val docs = (0 until 10).map(i => (i * 8L, 600L)).toDF("doc_id", "n_tokens")
    val out = Sharding.packByTokenBudget(docs, "doc_id", "n_tokens", budget = 2048, shards = 8)
      .select("doc_id", "shard", "chunk").as[(Long, Int, Long)].collect().sortBy(_._1)
    assert(out.forall(_._2 == 0), "ids are multiples of 8 → one shard")
    out.zipWithIndex.foreach { case ((_, _, chunk), i) =>
      assert(chunk == (600L * i) / 2048, s"doc $i in chunk $chunk")
    }
    // every chunk's token total stays under budget + one document (the
    // greedy boundary property)
    val totals = out.groupBy(_._3).view.mapValues(_.length * 600L).toMap
    assert(totals.values.forall(_ <= 2048 + 600))
    // the real-table query runs per-shard windows: the only exchanges
    // are the shard hash-partition and the output sort — never a
    // single-partition global window
    val plan = Sharding.tokenPacking(spark, sfDir).queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"packing must not funnel through one partition:\n${plan.take(1200)}")
  }

  test("stratifiedSample draws exactly n per stratum, seed-keyed and stable") {
    import spark.implicits._
    val docs = Tables(spark, sfDir).documents.select(col("doc_id"), col("lang"))
    val a = Sharding.stratifiedSample(docs, "lang", "doc_id", n = 20, seed = 7L)
    val counts = a.groupBy("lang").count().as[(String, Long)].collect().toMap
    val strata = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    strata.foreach { case (lang, n) =>
      assert(counts(lang) == math.min(20L, n), s"$lang: ${counts(lang)}")
    }
    val draw = a.select("doc_id").as[Long].collect().toSet
    // same seed redraws the identical set (retry stability)
    val again = Sharding.stratifiedSample(docs, "lang", "doc_id", 20, 7L)
      .select("doc_id").as[Long].collect().toSet
    assert(again == draw)
    // a different seed draws an independent order (some overlap is fine,
    // identity is a broken seed)
    val other = Sharding.stratifiedSample(docs, "lang", "doc_id", 20, 8L)
      .select("doc_id").as[Long].collect().toSet
    assert(other != draw, "seed must key the draw order")
  }

  test("chunkByTokenWindow: overlapping spans, truncated tail, map-only plan") {
    import spark.implicits._
    // 28 tokens, window 16, stride 12 → starts 0/12/24, lens 16/16/4
    val words = (1 to 28).map(i => s"w$i")
    val docs = Seq((7L, words.mkString(" ")), (8L, "solo")).toDF("doc_id", "text")
    val out = Sharding.chunkByTokenWindow(docs, "doc_id", "text", window = 16, stride = 12)
      .as[(Long, Long, Long, Long, String)].collect().sortBy(r => (r._1, r._3))
    val d7 = out.filter(_._1 == 7L)
    assert(d7.map(r => (r._2, r._3, r._4)).toSeq ==
      Seq((0L, 0L, 16L), (1L, 12L, 16L), (2L, 24L, 4L)))
    assert(d7(0)._5 == words.take(16).mkString(" "))
    assert(d7(1)._5 == words.slice(12, 28).mkString(" "), "overlap keeps tokens 13..16 in both")
    assert(d7(2)._5 == words.drop(24).mkString(" "), "tail truncates, never pads")
    assert(out.filter(_._1 == 8L).toSeq == Seq((8L, 0L, 0L, 1L, "solo")),
      "a doc shorter than the window is one whole chunk")
    intercept[IllegalArgumentException] {
      Sharding.chunkByTokenWindow(docs, "doc_id", "text", window = 8, stride = 12)
    }
    // map-only: no exchange anywhere in the chunking itself
    val plan = Sharding.chunkByTokenWindow(docs, "doc_id", "text", 16, 12)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n${plan.take(800)}")
  }

  test("packByTokenBudget keeps the budget bound under duplicate ids (ROWS frame)") {
    import spark.implicits._
    // four docs sharing one id, 600 tokens each, budget 1000: the ROWS
    // running sum gives cumBefore 0/600/1200/1800 → chunks 0,0,1,1
    // (each chunk 1200 ≤ budget + one doc). The default RANGE frame
    // would give every peer cum=2400 → all land in chunk 1 with 2400
    // tokens, blowing the documented bound.
    val docs = Seq.fill(4)((8L, 600L)).toDF("doc_id", "n_tokens")
    val out = Sharding.packByTokenBudget(docs, "doc_id", "n_tokens", budget = 1000, shards = 8)
      .select("chunk").as[Long].collect().sorted
    assert(out.toSeq == Seq(0L, 0L, 1L, 1L),
      s"duplicate-id rows must pack row-by-row, got chunks ${out.toSeq}")
  }

  test("dsirSelect ranks target-like pool docs first (planted vocabularies)") {
    // Target corpus speaks vocabulary A; the pool has 30 docs in
    // vocabulary A (target-like) and 30 in vocabulary B (off-domain).
    // With 256 buckets and disjoint vocabularies, every A-token's
    // bucket has high target mass and every B-token's only raw mass,
    // so each A-doc's log-weight sits ~tokens·log-ratio above every
    // B-doc's — far beyond the O(1) Gumbel noise. DSIR must select
    // exactly the A-pool under k = 30.
    val vocabA = Seq("alpha", "bravo", "charlie", "delta", "echo")
    val vocabB = Seq("zulu", "yankee", "xray", "whiskey", "victor")
    def doc(id: Long, v: Seq[String], t: Boolean) =
      (id, Seq.tabulate(40)(i => v(i % v.size)).mkString(" "), t)
    val docs = (
      (1L to 10L).map(doc(_, vocabA, true)) ++        // target
      (101L to 130L).map(doc(_, vocabA, false)) ++    // target-like pool
      (201L to 230L).map(doc(_, vocabB, false))       // off-domain pool
    ).toDF("id", "text", "is_t")
    val sel = Sharding.dsirSelect(docs, "id", "text", col("is_t"), k = 30)
    val rows = sel.collect()
    assert(rows.length == 30)
    val ids = rows.map(_.getLong(0)).toSet
    assert(ids == (101L to 130L).toSet,
      s"selection must be exactly the target-like pool, got $ids")
    // ranks are a 1..k permutation ordered by the score key
    assert(rows.map(_.getAs[Long]("rank")).sorted.toSeq == (1L to 30L),
      "rank must be a dense 1..k")
    val scores = sel.orderBy(col("rank")).select(col("score")).as[Double].collect()
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      "scores must be non-increasing in rank")
    // target docs never appear in the selection even when k exceeds the pool
    val all = Sharding.dsirSelect(docs, "id", "text", col("is_t"), k = 1000)
    assert(all.count() == 60, "selection draws from the raw pool only")
    // retry-stability: the same inputs reproduce the identical ranking
    val again = Sharding.dsirSelect(docs, "id", "text", col("is_t"), k = 30)
      .orderBy(col("rank")).select(col("id")).as[Long].collect().toSeq
    assert(again == sel.orderBy(col("rank")).select(col("id")).as[Long].collect().toSeq)
    // guards
    intercept[IllegalArgumentException] {
      Sharding.dsirSelect(docs, "id", "text", col("is_t"), k = 0)
    }
    intercept[IllegalArgumentException] {
      Sharding.dsirSelect(docs, "id", "text", col("is_t"), k = 5, buckets = 1)
    }
  }

  test("dsirFit persists as a dense model and day-2 scoring matches fit-time weights") {
    import spark.implicits._
    val vocabA = Seq("alpha", "bravo", "charlie", "delta", "echo")
    val vocabB = Seq("zulu", "yankee", "xray", "whiskey", "victor")
    def doc(id: Long, v: Seq[String], t: Boolean) =
      (id, Seq.tabulate(40)(i => v(i % v.size)).mkString(" "), t)
    val docs = (
      (1L to 10L).map(doc(_, vocabA, true)) ++
      (101L to 110L).map(doc(_, vocabA, false)) ++
      (201L to 210L).map(doc(_, vocabB, false))
    ).toDF("id", "text", "is_t")

    // the model is DENSE: every bucket exists exactly once
    val model = Sharding.dsirFit(docs, "text", col("is_t"), buckets = 64)
    val bs = model.select("bucket").as[Long].collect().sorted
    assert(bs.toSeq == (0L until 64L), "fit must emit one row per bucket")

    // parquet round-trip: the persisted artifact scores identically
    val path = java.nio.file.Files.createTempDirectory("graft_dsir").toString
    model.write.mode("overwrite").parquet(path)
    val loaded = spark.read.parquet(path)
    val pool = docs.filter(!col("is_t")).select("id", "text")
    val w1 = Sharding.dsirScoreAgainstModel(pool, model, "id", "text")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    val w2 = Sharding.dsirScoreAgainstModel(pool, loaded, "id", "text")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(w1 == w2, "persisted model must reproduce fit-time weights exactly")
    // target-like pool docs outrank off-domain ones under the model too
    val wm = w1.toMap
    assert((101L to 110L).map(wm).min > (201L to 210L).map(wm).max,
      "A-pool weights must dominate B-pool weights")

    // DAY-2 docs with vocabulary the fit never saw: every token still
    // scores through the dense Laplace fallback — none silently drop
    val novel = Seq((301L, "quux corge grault garply waldo fred plugh")).toDF("id", "text")
    val nv = Sharding.dsirScoreAgainstModel(novel, model, "id", "text").head()
    assert(nv.getLong(1) == 7L, "all 7 unseen tokens must be counted, not dropped")

    // day-2 probe never touches the fit corpora: the plan reads only
    // the new batch (broadcast model), no fit-side scan or shuffle of it
    val plan = Sharding.dsirScoreAgainstModel(novel, loaded, "id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"model must ride a broadcast, not a shuffle join:\n${plan.take(800)}")

    intercept[IllegalArgumentException] {
      Sharding.dsirScoreAgainstModel(novel, model.limit(1), "id", "text")
    }
  }

  test("count-form DSIR model merges day-2: merge-equals-refit bit-exactly (round 12)") {
    import spark.implicits._
    val vocabA = Seq("alpha", "bravo", "charlie", "delta", "echo")
    val vocabB = Seq("zulu", "yankee", "xray", "whiskey", "victor")
    def doc(id: Long, v: Seq[String], t: Boolean) =
      (id, Seq.tabulate(40)(i => v(i % v.size)).mkString(" "), t)
    val docs = (
      (1L to 10L).map(doc(_, vocabA, true)) ++
      (101L to 110L).map(doc(_, vocabA, false)) ++
      (201L to 210L).map(doc(_, vocabB, false))
    ).toDF("id", "text", "is_t")

    // fit in halves (the two ingest days), merge, derive ratios —
    // must equal the one-shot full fit bit for bit (exact long adds
    // happen BEFORE any log)
    val full = Sharding.dsirFit(docs, "text", col("is_t"), buckets = 64)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    val h0 = Sharding.dsirFitCounts(docs.filter(col("id") % 2 === 0), "text", col("is_t"), 64)
    val h1 = Sharding.dsirFitCounts(docs.filter(col("id") % 2 === 1), "text", col("is_t"), 64)
    val merged = Sharding.mergeDsirModels(h0, h1)
    val viaMerge = Sharding.dsirRatios(merged, bucketsHint = Some(64))
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(viaMerge == full, "merged-counts ratios must equal the full refit exactly")

    // the COUNT form is the persisted artifact: parquet round-trip,
    // then merge + derive from the loaded tables alone
    val p0 = java.nio.file.Files.createTempDirectory("graft_dsir_c0").toString
    val p1 = java.nio.file.Files.createTempDirectory("graft_dsir_c1").toString
    h0.write.mode("overwrite").parquet(p0)
    h1.write.mode("overwrite").parquet(p1)
    val fromDisk = Sharding.dsirRatios(Sharding.mergeDsirModels(
      spark.read.parquet(p0).select("bucket", "ct", "cr"),
      spark.read.parquet(p1).select("bucket", "ct", "cr")))
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(fromDisk == full, "persisted count halves must merge to the refit model")

    // guards: bucket-count mismatch (different feature maps) fails
    // IN-PLAN at merge time (no driver-side counts — they would
    // re-execute unmaterialized fit subtrees); a ratio-form frame
    // refuses at the API surface
    val mm = intercept[Exception] {
      Sharding.mergeDsirModels(h0,
        Sharding.dsirFitCounts(docs, "text", col("is_t"), 32)).collect()
    }
    def msg(t: Throwable): String = Option(t.getMessage).getOrElse("") +
      Option(t.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg(mm).contains("present in only one model"),
      s"expected the feature-map mismatch refusal, got: ${msg(mm)}")
    intercept[IllegalArgumentException] {
      Sharding.mergeDsirModels(h0, Sharding.dsirFit(docs, "text", col("is_t"), 64))
    }
  }

  test("sequence assembly: in-order members, exclusive-prefix offsets, budget respected") {
    // one shard (ids ≡ 0 mod 32? use shards=1), budget 10:
    // docs 1(4) 2(5) pack into seq 0 (offsets 0,4); 3(6) starts seq 0?
    // cum: 4,9,15 → chunk = floor((cum-n)/10): 0,0,0 for doc3 (9/10=0)!
    // doc3 starts at 9 < 10 → same chunk (budget-plus-one-doc bound,
    // the q45 contract); doc4(8) cum 23 start 15 → chunk 1
    val rows = Seq((1L, 4L), (2L, 5L), (3L, 6L), (4L, 8L))
      .toDF("doc_id", "n_tokens")
    val out = Sharding.assembleSequences(rows, "doc_id", "n_tokens",
        budget = 10L, shards = 1)
      .orderBy(col("chunk"))
      .as[(Int, Long, Long, Long, String, String)].collect().toList
    assert(out === List(
      (0, 0L, 3L, 15L, "1,2,3", "0,4,9"),
      (0, 1L, 1L, 8L, "4", "0")))
    // round trip: every offset is the sum of prior members' tokens
    val toks = Map(1L -> 4L, 2L -> 5L, 3L -> 6L, 4L -> 8L)
    out.foreach { case (_, _, _, _, ids, offs) =>
      val is = ids.split(",").map(_.toLong)
      val os = offs.split(",").map(_.toLong)
      assert(os.head === 0L)
      is.zip(os).sliding(2).foreach {
        case Array((i, o), (_, o2)) => assert(o2 === o + toks(i))
        case _ => ()
      }
    }
  }

  test("epoch expansion: whole copies, fractional coin, drop leg, map-only") {
    val rows = Seq(
      (1L, "three", 0.10), (2L, "three", 0.90),  // e=3.0: always 3 copies, coin ignored
      (3L, "half", 0.49), (4L, "half", 0.51),    // e=0.5: u<.5 keeps one copy
      (5L, "mix", 0.49), (6L, "mix", 0.51)       // e=2.5: 3 vs 2 copies
    ).toDF("doc_id", "src", "u")
    val out = Sharding.expandEpochs(rows, "doc_id", "src",
        epochs = Map("three" -> 3.0, "half" -> 0.5, "mix" -> 2.5),
        draw = Some(col("u")))
      .select("doc_id", "epoch").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (id, es) => id -> es.map(_._2).sorted.toList }
    assert(out === Map(
      1L -> List(0L, 1L, 2L), 2L -> List(0L, 1L, 2L),
      3L -> List(0L),                              // doc 4 dropped entirely
      5L -> List(0L, 1L, 2L), 6L -> List(0L, 1L)))
    intercept[IllegalArgumentException] {
      Sharding.expandEpochs(rows, "doc_id", "src", epochs = Map("x" -> -1.0))
    }
    val plan = Sharding.expandEpochs(rows, "doc_id", "src", Map("three" -> 2.0))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expansion must be map-only:\n${plan.take(500)}")
  }

  test("temperature sampling: alpha upsamples small sources, clamp pins them to keep-all") {
    val rows = Seq(
      (1L, "small", 0.99), (2L, "small", 0.01),
      (3L, "big", 0.49), (4L, "big", 0.51), (5L, "big", 0.10), (6L, "big", 0.90),
      (7L, "big", 0.30), (8L, "big", 0.70), (9L, "big", 0.20), (10L, "big", 0.80)
    ).toDF("doc_id", "src", "u")
    // alpha=.5, target=6: t_small=round(sqrt(2)e6), t_big=round(sqrt(8)e6),
    // rate_small = 6·w/2 > 1 → clamps (keeps BOTH docs);
    // rate_big = 6·w/8 ≈ 0.5 → keeps exactly the u<rate docs
    val kept = Sharding.temperatureSample(rows, "doc_id", "src",
        alpha = 0.5, targetDocs = 6L, draw = Some(col("u")))
      .select("doc_id").as[Long].collect().sorted.toList
    assert(kept === List(1L, 2L, 3L, 5L, 7L, 9L))
    intercept[IllegalArgumentException] {
      Sharding.temperatureSample(rows, "doc_id", "src", alpha = 0.0, targetDocs = 6L)
    }
    intercept[IllegalArgumentException] {
      Sharding.temperatureSample(rows, "doc_id", "src", alpha = 0.5, targetDocs = 0L)
    }
    // rates ride a broadcast; the sample is a filter, not a shuffle of df
    val plan = Sharding.temperatureSample(rows, "doc_id", "src",
        alpha = 0.5, targetDocs = 6L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"rates must broadcast:\n${plan.take(500)}")
  }

  test("leakage-safe split keeps every group member in one split, map-only") {
    val rows = Seq(
      (1L, "g1"), (2L, "g1"), (3L, "g1"),
      (4L, "g2"), (5L, "g2"),
      (6L, "g3")
    ).toDF("doc_id", "grp")
    val out = Sharding.leakageSafeSplit(rows, "grp")
    val got = out.as[(Long, String, Long, String)].collect()
    assert(got.length === 6)
    // one (bucket, split) per group — members never straddle
    val byGroup = got.groupBy(_._2).map { case (g, rs) =>
      g -> rs.map(r => (r._3, r._4)).distinct }
    assert(byGroup.values.forall(_.size == 1), s"group straddled a split: $byGroup")
    // bucket is the md5 convention, split thresholds honored
    got.foreach { case (_, g, b, s) =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$g:split:7".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(13)
      assert(b === java.lang.Long.parseLong(h, 16) % 100L)
      assert(s === (if (b < 80) "train" else if (b < 90) "val" else "test"))
    }
    // map-only: no Exchange in the plan
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"split must not shuffle:\n${plan.take(600)}")
    intercept[IllegalArgumentException] {
      Sharding.leakageSafeSplit(rows, "grp", trainPct = 90, valPct = 10)
    }
    // a null group key fails LOUDLY in-plan — it would otherwise bucket
    // to null and silently land in 'test' (round-11 advice)
    val withNull = Seq((7L, null: String), (8L, "g1")).toDF("doc_id", "grp")
    val e = intercept[Exception] {
      Sharding.leakageSafeSplit(withNull, "grp").collect()
    }
    assert(e.getMessage.contains("null group key")
      || Option(e.getCause).exists(_.getMessage.contains("null group key")),
      s"expected the null-group refusal, got: ${e.getMessage}")
  }

  test("q110 entry: recrawl URL groups co-travel and all three splits occur") {
    val out = Sharding.leakageSplitDocs(spark, sfDir)
      .as[(Long, String, Long, String)].collect()
    val byCanon = out.groupBy(_._2)
    assert(byCanon.exists(_._2.length > 1), "planted groups must collapse")
    assert(byCanon.values.forall(_.map(_._4).distinct.length == 1),
      "a canonical group straddled splits")
    assert(out.map(_._4).distinct.sorted.toSeq === Seq("test", "train", "val"))
  }

  test("mixtureInterleave: every prefix holds mixture proportions within 1.5") {
    val docs = (0 until 120).map(i => (i.toLong, s"s${i % 3}"))
      .toDF("doc_id", "source")
    val strides = Map("s0" -> 1.0, "s1" -> 2.0, "s2" -> 4.0)
    val out = Sharding.mixtureInterleave(docs, "doc_id", "source", strides, seed = 3L)
      .select("global_pos", "doc_id", "source", "src_rank")
      .as[(Long, Long, String, Long)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == (0L until 120L), "global_pos must be a 0-based permutation")
    // per-source ranks are 1..n with no gaps
    out.groupBy(_._3).foreach { case (_, rows) =>
      assert(rows.map(_._4).sorted.toSeq == (1L to rows.length))
    }
    // stride weights: q ∝ 1/stride → (4/7, 2/7, 1/7). Until the first
    // source exhausts (s0 at P≈70), every prefix tracks P·q within 1.5
    val q = Map("s0" -> 4.0 / 7, "s1" -> 2.0 / 7, "s2" -> 1.0 / 7)
    val running = scala.collection.mutable.Map("s0" -> 0, "s1" -> 0, "s2" -> 0)
    out.take(65).zipWithIndex.foreach { case (row, idx) =>
      running(row._3) += 1
      val p = idx + 1
      q.foreach { case (s, w) =>
        assert(math.abs(running(s) - p * w) <= 1.5,
          s"prefix $p: source $s count ${running(s)} vs expected ${p * w}")
      }
    }
  }

  test("mixtureInterleave is deterministic and partitioning-independent") {
    val docs = (0 until 90).map(i => (i.toLong, s"s${i % 3}"))
      .toDF("doc_id", "source")
    val strides = Map("s0" -> 1.0, "s1" -> 1.5, "s2" -> 2.5)
    def run(df: org.apache.spark.sql.DataFrame) =
      Sharding.mixtureInterleave(df, "doc_id", "source", strides, seed = 5L)
        .as[(Long, Long, String, Long)].collect().sortBy(_._1).toSeq
    val a = run(docs)
    assert(a == run(docs), "same input must reproduce the same order")
    assert(a == run(docs.repartition(7)),
      "order must not depend on input partitioning")
  }

  test("planMixture water-fills: caps are exact, surplus redistributes, budget conserved") {
    val docs = Seq(
      ("A", 60L), ("A", 40L),      // 100 tokens, weight 6, capacity 200
      ("B", 1000L),                // 1000 tokens, weight 1, capacity 2000
      ("C", 250L), ("C", 250L),    // 500 tokens, weight 3, capacity 1000
      ("X", 99L)                   // unlisted: takes no budget, dropped
    ).toDF("source", "toks")
    val w = Map("A" -> 6L, "B" -> 1L, "C" -> 3L)
    val plan = Sharding.planMixture(docs, "source", "toks", w,
        budgetTokens = 1200L)
      .select("source", "n_tokens", "capacity", "alloc_tokens", "capped", "epochs_bp")
      .as[(String, Long, Long, Long, Boolean, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(!plan.contains("X"), "unlisted sources are dropped from the plan")
    // hand-checked: A's naive share 6·1200/10 = 720 > 200 caps it; the
    // freed budget re-levels to 1000 over weight 4 → C 750, B 250
    assert(plan("A") == ("A", 100L, 200L, 200L, true, 20000L), s"${plan("A")}")
    assert(plan("C") == ("C", 500L, 1000L, 750L, false, 15000L), s"${plan("C")}")
    assert(plan("B") == ("B", 1000L, 2000L, 250L, false, 2500L), s"${plan("B")}")
    assert(plan.values.map(_._4).sum == 1200L,
      "with an uncapped source left, every budget token is allocated")

    // budget past total capacity: everything caps, leftover is honest
    val all = Sharding.planMixture(docs, "source", "toks", w,
        budgetTokens = 100000L)
      .select("source", "alloc_tokens", "capped")
      .as[(String, Long, Boolean)].collect()
    assert(all.forall(_._3) && all.map(_._2).sum == 3200L,
      s"all sources cap at capacity, the rest of the budget is unspent: ${all.toSeq}")

    intercept[IllegalArgumentException] {
      Sharding.planMixture(docs, "source", "toks", w, budgetTokens = 0L)
    }
    intercept[IllegalArgumentException] {
      Sharding.planMixture(docs, "source", "toks", Map.empty, budgetTokens = 10L)
    }
  }

  test("executeMixturePlan: whole copies + basis-point coin, unplanned sources drop") {
    val docs = Seq((1L, "A"), (2L, "B"), (3L, "C"), (4L, "D"))
      .toDF("doc_id", "source")
    val plan = Seq(("A", 25000L), ("B", 10000L), ("C", 2500L))
      .toDF("source", "epochs_bp")
    def run(u: Double) = Sharding.executeMixturePlan(docs, plan,
        draw = Some(lit(u)))
      .select("doc_id", "epoch").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    // coin at 0.2: A's 0.5 frac fires (3 copies), C's 0.25 fires (1)
    val low = run(0.2)
    assert(low == Map(1L -> Seq(0L, 1L, 2L), 2L -> Seq(0L), 3L -> Seq(0L)),
      s"epoch tags are 0..n-1 and D is dropped: $low")
    // coin at 0.9: no fractional copy fires — C emits nothing at all
    val high = run(0.9)
    assert(high == Map(1L -> Seq(0L, 1L), 2L -> Seq(0L)),
      s"whole copies only, the 0-whole source vanishes: $high")
    intercept[IllegalArgumentException] {
      Sharding.executeMixturePlan(docs, plan.drop("epochs_bp"))
    }
  }

  test("mixtureInterleaveRealized: realized proportions hold in every prefix, copies spread") {
    // a multiset the execute step could have produced: source a 3
    // copies/doc, b 1, c 1 — realized counts 30/20/10 (q ∝ n_s/T)
    val multiset = (
      (0 until 10).flatMap(i => Seq(0L, 1L, 2L).map(e => (i.toLong, "a", e))) ++
      (10 until 30).map(i => (i.toLong, "b", 0L)) ++
      (30 until 40).map(i => (i.toLong, "c", 0L))
    ).toDF("doc_id", "source", "epoch")
    val out = Sharding.mixtureInterleaveRealized(
        multiset, "doc_id", "source", "epoch", seed = 7L)
      .as[(Long, Long, String, Long, Long)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == (0L until 60L),
      "global_pos must be a dense 0-based permutation of the multiset")
    out.groupBy(_._3).foreach { case (_, rows) =>
      assert(rows.map(_._5).sorted.toSeq == (1L to rows.length),
        "per-source ranks are 1..n_s with no gaps")
    }
    // every prefix tracks the REALIZED mix 30/20/10 within 2 rows —
    // no source exhausts early, so the whole order is checkable
    val q = Map("a" -> 30.0 / 60, "b" -> 20.0 / 60, "c" -> 10.0 / 60)
    val running = scala.collection.mutable.Map("a" -> 0, "b" -> 0, "c" -> 0)
    out.zipWithIndex.foreach { case (row, idx) =>
      running(row._3) += 1
      val p = idx + 1
      q.foreach { case (s, w) =>
        assert(math.abs(running(s) - p * w) <= 2.0,
          s"prefix $p: source $s count ${running(s)} vs expected ${p * w}")
      }
    }
    // copies of one doc must not sit adjacent: the draw keys on
    // (id, epoch), so the three copies of doc 0 land apart
    val doc0 = out.filter(r => r._2 == 0L && r._3 == "a").map(_._1).sorted
    assert(doc0.length == 3 && doc0.sliding(2).forall(w => w(1) - w(0) > 1),
      s"copies of a doc spread through the order: ${doc0.toSeq}")
    // determinism under repartitioning (the mixtureInterleave contract)
    val again = Sharding.mixtureInterleaveRealized(
        multiset.repartition(7), "doc_id", "source", "epoch", seed = 7L)
      .as[(Long, Long, String, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == again.toSeq, "order must not depend on partitioning")
  }

  test("mixtureTrainingOrderDocs: the consumed order reflects the budgeted mix") {
    val out = Sharding.mixtureTrainingOrderDocs(spark, sfDir)
      .as[(Long, Long, String, Long, Long)].collect().sortBy(_._1)
    val total = out.length
    assert(out.map(_._1).toSeq == (0L until total.toLong), "dense order")
    // the realized per-source counts ARE the plan's materialization
    // (q159's multiset) — check the interleave preserved them exactly
    val bySrc = out.groupBy(_._3).view.mapValues(_.length).toMap
    val multiset = {
      val d = Tables(spark, sfDir).documents
      val totalTokens = d.agg(org.apache.spark.sql.functions.sum(
        col("n_chars").cast("long"))).first().getLong(0)
      val plan = Sharding.planMixture(d, "source", "n_chars",
        Sharding.mixturePlanWeights, budgetTokens = totalTokens * 9L / 5L)
      Sharding.executeMixturePlan(d, plan, seed = 19L,
          draw = Some(Sharding.md5Unit(col("doc_id"), 19L)))
        .groupBy("source").count()
        .as[(String, Long)].collect().toMap
    }
    assert(bySrc.map { case (s, n) => s -> n.toLong } == multiset,
      s"interleave must be a permutation of the executed multiset")
    // prefix fidelity at the half-way point: each source's share of the
    // first half tracks its overall share within 2 rows
    val half = out.take(total / 2)
    bySrc.foreach { case (s, n) =>
      val expect = (total / 2).toDouble * n / total
      val got = half.count(_._3 == s)
      assert(math.abs(got - expect) <= 2.0, s"$s: $got vs $expect in the half prefix")
    }
  }

  test("mixtureInterleave fails loudly on a source with no stride") {
    val docs = Seq((0L, "known"), (1L, "mystery")).toDF("doc_id", "source")
    val ex = intercept[Exception] {
      Sharding.mixtureInterleave(docs, "doc_id", "source",
        Map("known" -> 1.0)).collect()
    }
    assert(ex.getMessage.contains("no stride") ||
      Option(ex.getCause).exists(_.getMessage.contains("no stride")))
  }
}

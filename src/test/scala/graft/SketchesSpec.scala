package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class SketchesSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // ---- bloom semi join -------------------------------------------------

  test("bloomSemiJoin equals the exact semi join (false positives removed)") {
    val fact = (1L to 2000L).map(i => (i, i % 7)).toDF("fk", "payload")
    val dim = (1L to 2000L).filter(_ % 13 == 0).map(Tuple1(_)).toDF("dk")

    val got = Sketches.bloomSemiJoin(fact, "fk", dim, "dk",
      expectedItems = 200L, fpp = 0.2) // high fpp: force false positives through the filter
      .select("fk").as[Long].collect().toSet
    val want = fact.join(dim, col("fk") === col("dk"), "left_semi")
      .select("fk").as[Long].collect().toSet

    assert(got == want)
    assert(want.nonEmpty && want.forall(_ % 13 == 0))
  }

  test("bloomSemiJoin never drops a true match (no false negatives)") {
    val fact = (1L to 5000L).map(Tuple1(_)).toDF("fk")
    val dim = (1L to 5000L by 11).map(Tuple1(_)).toDF("dk")
    // tiny expectedItems → saturated filter: still zero false negatives
    val got = Sketches.bloomSemiJoin(fact, "fk", dim, "dk",
      expectedItems = 10L, fpp = 0.01)
      .select("fk").as[Long].collect().toSet
    assert(got == (1L to 5000L by 11).toSet)
  }

  test("bloomSemiJoin null fact keys are dropped, not matched") {
    val fact = Seq(Some(1L), Some(2L), None).toDF("fk")
    val dim = Seq(1L).toDF("dk")
    val got = Sketches.bloomSemiJoin(fact, "fk", dim, "dk", expectedItems = 10L)
      .select("fk").as[Long].collect().toSeq
    assert(got == Seq(1L))
  }

  test("bloomSemiJoin rejects non-integral key columns") {
    val fact = Seq("a").toDF("fk")
    val dim = Seq(1L).toDF("dk")
    intercept[IllegalArgumentException] {
      Sketches.bloomSemiJoin(fact, "fk", dim, "dk", expectedItems = 10L)
    }
  }

  // ---- HLL sketches ----------------------------------------------------

  private def plantedEvents = {
    // 3 types × 20 days; type t has 50*(t+1) distinct users cycling daily
    (0 until 3).flatMap { t =>
      (1 to 20).flatMap { d =>
        (0 until 120).map { i =>
          (s"type$t", ts(f"2024-01-$d%02d 10:00:00"), (t * 10000 + i % (50 * (t + 1))).toLong)
        }
      }
    }.toDF("event_type", "ts", "user_id")
  }

  test("HLL estimate tracks the exact distinct count within 5%") {
    val daily = Sketches.dailySketches(plantedEvents, "event_type", "ts", "user_id")
    val est = Sketches.distinctOverRange(daily, "event_type")
      .select("event_type", "distinct_est").as[(String, Long)].collect().toMap
    val exact = plantedEvents.groupBy("event_type")
      .agg(countDistinct("user_id").as("n"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (k, n) =>
      val e = est(k)
      assert(math.abs(e - n).toDouble / n < 0.05, s"$k: est=$e exact=$n")
    }
  }

  test("merging daily sketches is lossless vs sketching the range directly") {
    val e = plantedEvents
    val daily = Sketches.dailySketches(e, "event_type", "ts", "user_id")
    val merged = Sketches.distinctOverRange(daily, "event_type",
      fromDay = Some("2024-01-05"), toDay = Some("2024-01-15"))
      .select("event_type", "distinct_est").as[(String, Long)].collect().toMap
    val direct = e.filter(col("ts").cast("date").between("2024-01-05", "2024-01-15"))
      .groupBy("event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("n"))
      .select("event_type", "n").as[(String, Long)].collect().toMap
    assert(merged == direct)
  }

  test("portable HLL twin tracks the exact distinct count within 5%") {
    val regs = Sketches.portableDailyRegisters(plantedEvents, "event_type", "ts", "user_id")
    val est = Sketches.portableDistinctOverRange(regs, "event_type")
      .select("event_type", "distinct_est").as[(String, Double)].collect().toMap
    val exact = plantedEvents.groupBy("event_type")
      .agg(countDistinct("user_id").as("n"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (k, n) =>
      val e = est(k)
      assert(math.abs(e - n) / n < 0.05, s"$k: est=$e exact=$n")
    }
  }

  test("portable HLL day-grain register merge equals hashing the range directly") {
    val e = plantedEvents
    val daily = Sketches.portableDailyRegisters(e, "event_type", "ts", "user_id")
    val merged = Sketches.portableDistinctOverRange(daily, "event_type",
      fromDay = Some("2024-01-05"), toDay = Some("2024-01-15"))
      .select("event_type", "n_regs", "distinct_est")
      .as[(String, Long, Double)].collect().toSet
    // direct: one register table over the filtered raw rows (single
    // synthetic day), no day-grain intermediate
    val direct = Sketches.portableDistinctOverRange(
      Sketches.portableDailyRegisters(
        e.filter(col("ts").cast("date").between("2024-01-05", "2024-01-15"))
          .withColumn("ts", lit("2024-01-01 00:00:00").cast("timestamp")),
        "event_type", "ts", "user_id"),
      "event_type")
      .select("event_type", "n_regs", "distinct_est")
      .as[(String, Long, Double)].collect().toSet
    assert(merged == direct)
  }

  test("portable HLL leaves linear counting for the harmonic estimator at scale") {
    // 40k distinct ids in one key: raw estimate > 2.5m = 10240, so the
    // CASE takes the harmonic-mean branch — the branch q77's sf0.01
    // data (~150 users) never exercises; planted truth covers it here
    val big = (0 until 40000).map(i => ("k", ts("2024-01-01 10:00:00"), i.toLong))
      .toDF("event_type", "ts", "user_id")
    val regs = Sketches.portableDailyRegisters(big, "event_type", "ts", "user_id")
    val est = Sketches.portableDistinctOverRange(regs, "event_type")
      .select("distinct_est").as[Double].head()
    assert(est > 10240.0, s"harmonic branch expected, est=$est")
    assert(math.abs(est - 40000.0) / 40000.0 < 0.05, s"est=$est exact=40000")
  }

  // ---- KLL quantile sketches -------------------------------------------

  test("KLL exact regime: sub-k sketches return true percentiles, merged == direct") {
    // 3 keys × 10 days × 40 values/day = 400 values per key, k=4096 →
    // no compaction anywhere: quantiles are EXACT order statistics
    val rows = (0 until 3).flatMap { t =>
      (1 to 10).flatMap { d =>
        (0 until 40).map { i =>
          (s"type$t", ts(f"2024-01-$d%02d 10:00:00"), ((d - 1) * 40 + i).toDouble)
        }
      }
    }.toDF("k", "ts", "v")
    val daily = Sketches.dailyQuantileSketches(rows, "k", "ts", "v", k = 4096)
    val out = Sketches.quantilesOverRange(daily, "k", ranks = Seq(0.5, 0.99))
      .select("k", "n_days", "p50", "p99").as[(String, Long, Double, Double)]
      .collect().toSeq.sortBy(_._1)
    // 400 values 0..399: inclusive-rank p50 = value at ceil(0.5*400)-1 = 199
    out.foreach { case (_, nDays, p50, p99) =>
      assert(nDays == 10)
      assert(p50 == 199.0, s"p50=$p50")
      assert(p99 == 395.0, s"p99=$p99")
    }
  }

  test("KLL compacted regime: estimates stay within the published rank-error bound") {
    // 20k uniform values through k=200 → heavy compaction; normalized
    // rank error at k=200 is ~1.65%, assert a loose 3% envelope
    val n = 20000
    val rows = (0 until n).map { i =>
      ("a", ts(f"2024-01-${i % 28 + 1}%02d 10:00:00"), i.toDouble)
    }.toDF("k", "ts", "v")
    val daily = Sketches.dailyQuantileSketches(rows, "k", "ts", "v", k = 200)
    val Seq((p50, p90)) = Sketches.quantilesOverRange(daily, "k", ranks = Seq(0.5, 0.9))
      .select("p50", "p90").as[(Double, Double)].collect().toSeq
    assert(math.abs(p50 - n * 0.5) / n < 0.03, s"p50=$p50")
    assert(math.abs(p90 - n * 0.9) / n < 0.03, s"p90=$p90")
  }

  test("KLL empty groups merge harmlessly and empty sketches decode to null") {
    val rows = Seq(("a", ts("2024-01-01 10:00:00"), Some(1.0)),
      ("a", ts("2024-01-01 11:00:00"), None: Option[Double])).toDF("k", "ts", "v")
    val daily = Sketches.dailyQuantileSketches(rows, "k", "ts", "v")
    val p = Sketches.quantilesOverRange(daily, "k", ranks = Seq(0.5))
      .select("p50").as[Double].collect().toSeq
    assert(p == Seq(1.0)) // null value skipped, single retained item
    // an all-null day produces an EMPTY sketch; its quantile is null
    val allNull = Seq(("b", ts("2024-01-02 10:00:00"), None: Option[Double]))
      .toDF("k", "ts", "v")
    val pn = Sketches.quantilesOverRange(
      Sketches.dailyQuantileSketches(allNull, "k", "ts", "v"), "k", ranks = Seq(0.5))
      .select("p50").as[Option[Double]].collect().toSeq
    assert(pn == Seq(None))
  }

  test("distinctOverRange counts only the requested days") {
    val daily = Sketches.dailySketches(plantedEvents, "event_type", "ts", "user_id")
    val out = Sketches.distinctOverRange(daily, "event_type",
      fromDay = Some("2024-01-16"))
      .select("event_type", "n_days", "n_events")
      .as[(String, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(out.map(_._2).forall(_ == 5))          // days 16..20
    assert(out.map(_._3).forall(_ == 5L * 120L))  // 120 events/day
  }

  // ---- Count-Min heavy hitters -----------------------------------------

  /** 5 days: one planted hitter (100/day), one mid item (10/day), and a
    * 40-item singleton tail rotating daily (each tail item once total). */
  private def plantedCmsEvents = {
    (1 to 5).flatMap { d =>
      val hh = (0 until 100).map(_ => ("hot", ts(f"2024-02-0$d 10:00:00")))
      val mid = (0 until 10).map(_ => ("mid", ts(f"2024-02-0$d 11:00:00")))
      val tail = (0 until 40).map(i => (f"tail_${d}%02d_$i%02d", ts(f"2024-02-0$d 12:00:00")))
      hh ++ mid ++ tail
    }.toDF("item_s", "ts")
  }

  test("CMS estimates never undercount (the one-sided error contract)") {
    val ev = plantedCmsEvents
    val cms = Sketches.dailyCmsSketches(ev, "ts", "item_s")
    val cands = Sketches.dailyTopCandidates(ev, "ts", "item_s", topN = 64)
    val est = Sketches.heavyHittersOverRange(cms, cands, k = 200)
      .select("item", "est_count").as[(String, Long)].collect().toMap
    val exact = ev.groupBy(col("item_s")).agg(count(lit(1)).as("c"))
      .as[(String, Long)].collect().toMap
    assert(est.nonEmpty)
    est.foreach { case (item, e) =>
      assert(e >= exact(item), s"$item estimated $e < exact ${exact(item)}")
    }
  }

  test("CMS planted heavy hitters rank first with exact-at-this-width counts") {
    val ev = plantedCmsEvents
    val top = Sketches.heavyHittersOverRange(
      Sketches.dailyCmsSketches(ev, "ts", "item_s"),
      Sketches.dailyTopCandidates(ev, "ts", "item_s", topN = 64), k = 2)
      .select("rank", "item", "est_count").as[(Long, String, Long)].collect().toSeq
    assert(top.map(t => (t._1, t._2)) == Seq((1L, "hot"), (2L, "mid")))
    // 250 items into 4×1024 counters: the planted hitters' buckets are
    // collision-free at this size, so min-over-rows recovers the EXACT
    // counts (fixed md5 buckets — deterministic, not a flake surface)
    assert(top.map(_._3) == Seq(500L, 50L))
  }

  test("CMS day-grain merge equals sketching the whole range directly") {
    val ev = plantedCmsEvents
    val daily = Sketches.dailyCmsSketches(ev, "ts", "item_s")
    val merged = daily.groupBy(col("row"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))
      .as[(Int, Long, Long)].collect().toSet
    val direct = Sketches.dailyCmsSketches(
      ev.withColumn("ts", lit(ts("2024-02-01 10:00:00"))), "ts", "item_s")
      .select(col("row"), col("bucket"), col("cnt"))
      .as[(Int, Long, Long)].collect().toSet
    assert(merged == direct)
  }

  test("CMS range filter keeps candidates and counters to the requested days") {
    val ev = plantedCmsEvents
    val cms = Sketches.dailyCmsSketches(ev, "ts", "item_s")
    val cands = Sketches.dailyTopCandidates(ev, "ts", "item_s", topN = 64)
    val top = Sketches.heavyHittersOverRange(cms, cands, k = 1,
      fromDay = Some("2024-02-04"))
      .select("item", "est_count").as[(String, Long)].collect().toSeq
    assert(top == Seq(("hot", 200L))) // days 4..5 only
    // a day-3 tail singleton is not a candidate in the 4..5 range
    val items = Sketches.heavyHittersOverRange(cms, cands, k = 500,
      fromDay = Some("2024-02-04"))
      .select("item").as[String].collect().toSet
    assert(!items.exists(_.startsWith("tail_03")))
  }

  test("CMS candidate contract: per-day top-N bounds what a range query can see") {
    // an item outside every day's top-N is invisible to the rollup —
    // the documented miss mode; N ≫ k makes it need adversarial
    // day-splitting. topN=1 forces it: only the hitter survives.
    val ev = plantedCmsEvents
    val top = Sketches.heavyHittersOverRange(
      Sketches.dailyCmsSketches(ev, "ts", "item_s"),
      Sketches.dailyTopCandidates(ev, "ts", "item_s", topN = 1), k = 10)
      .select("item").as[String].collect().toSeq
    assert(top == Seq("hot"))
  }

  // ---- C28: KMV set-overlap sketches -------------------------------

  test("KMV exact regime: sub-k sketches give exact counts, intersections and Jaccard") {
    // |A|=6, |B|=5, |A∩B|=3 — all below k, so θ=1 and every estimate
    // must be the true set arithmetic, not an approximation
    val rows = (Seq("a", "b", "c", "d", "e", "f").map(("A", _)) ++
      Seq("d", "e", "f", "x", "y").map(("B", _)) ++
      Seq("d", "e", "f", "x", "y").map(("B", _))) // duplicates: set semantics
      .toDF("src", "v")
    val sk = Sketches.kmvSketches(rows, Seq("src"), col("v"), k = 64)
    val out = Sketches.kmvOverlap(sk, "src", k = 64)
      .as[(String, String, Long, Long, Long, Double)].collect()
    assert(out.toSeq == Seq(("A", "B", 6L, 5L, 3L, 0.375)))
  }

  test("KMV rollup is lossless: fine sketches merged == sketching the coarse grain directly") {
    val rows = (1 to 3000).map(i => ("S", s"lang${i % 4}", s"val$i")) ++
      (1 to 500).map(i => ("T", "lang0", s"val$i"))
    val df = rows.toDF("src", "lang", "v")
    val fine = Sketches.kmvSketches(df, Seq("src", "lang"), col("v"), k = 128)
    val merged = Sketches.kmvMerge(fine, Seq("src"), k = 128)
      .as[(String, Long)].collect().toSet
    val direct = Sketches.kmvSketches(df, Seq("src"), col("v"), k = 128)
      .as[(String, Long)].collect().toSet
    assert(merged == direct,
      "k smallest of a union must equal k smallest of the parts' k-smallests")
  }

  test("KMV bounded-buffer aggregate equals the naive global order statistic") {
    val df = (1 to 10000).map(i => ("G", s"item$i")).toDF("src", "v")
    val sk = Sketches.kmvSketches(df, Seq("src"), col("v"), k = 256)
      .as[(String, Long)].collect().map(_._2).sorted.toSeq
    val naive = df.select(
        conv(substring(md5(col("v")), 1, 15), 16, 10).cast("long").as("h"))
      .distinct().as[Long].collect().sorted.take(256).toSeq
    assert(sk == naive)
  }

  test("KMV fused shingle kernel equals sketching exploded wordShingles") {
    val docs = Tables(spark, "/root/testdata/sf0.001").documents
    val fused = Sketches.kmvShingleSketches(docs, Seq("source"), col("text"), k = 128)
      .as[(String, Long)].collect().toSet
    val exploded = docs.select(col("source"),
        explode(graft.operators.Dedup.wordShingles(col("text"))).as("sh"))
    val viaColumns = Sketches.kmvSketches(exploded, Seq("source"), col("sh"), k = 128)
      .as[(String, Long)].collect().toSet
    assert(fused == viaColumns,
      "kernel-built shingle strings must hash identically to the Column formulation")
  }

  test("graft_kmv_shingled null tokens follow concat_ws: skipped WITH their separator") {
    // ['a', NULL, 'b', 'c'] size-2 windows under concat_ws(' ', ...):
    // ('a',NULL)→"a", (NULL,'b')→"b", ('b','c')→"b c" — no double or
    // trailing spaces. The public SQL function must agree with the
    // oracle convention even on arbitrary (nullable) token arrays.
    val got = spark.sql(
        "SELECT graft_kmv_shingled(array('a', NULL, 'b', 'c'), 2, 8) AS sk")
      .selectExpr("explode(sk) AS h").as[Long].collect().toSet
    val want = Seq("a", "b", "b c").toDF("s")
      .select(conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long").as("h"))
      .as[Long].collect().toSet
    assert(got == want, s"got $got want $want")
  }

  test("KMV estimate regime tracks true distinct counts and overlaps on real documents") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables(spark, dir).documents
    val shingled = docs.select(col("source"),
      explode(graft.operators.Dedup.wordShingles(col("text"))).as("sh"))
    val truth = shingled.select(col("source"), col("sh")).distinct()
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val sk = Sketches.kmvSketches(shingled, Seq("source"), col("sh"), k = 256)
    val out = Sketches.kmvOverlap(sk, "source", k = 256)
      .as[(String, String, Long, Long, Long, Double)].collect()
    assert(out.nonEmpty)
    out.foreach { case (a, b, estA, estB, estI, jac) =>
      // k=256 → σ ≈ 1/√(k−2) ≈ 6.3%; 4σ envelope (deterministic data,
      // this is a fixed arithmetic check, not a flaky statistical one)
      def close(est: Long, t: Long) = math.abs(est - t).toDouble / t < 0.25
      assert(close(estA, truth(a)), s"$a: est $estA vs true ${truth(a)}")
      assert(close(estB, truth(b)), s"$b: est $estB vs true ${truth(b)}")
      assert(estI >= 0 && jac >= 0.0 && jac <= 1.0)
    }
  }
}

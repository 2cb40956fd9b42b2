package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, ShortType, StringType}
import org.apache.spark.util.sketch.BloomFilter

/** Sketch-backed scale operators: explicit Bloom-filter semi-join
  * pruning and mergeable HLL distinct-count rollups.
  *
  * Both exist for the 100 TB shape of problems the exact operators
  * solve at test scale:
  *  - a semi join against a dim too big to broadcast as a hash relation
  *    still fits as a ~MB Bloom sketch, so the fact side can drop
  *    non-matching rows BEFORE its shuffle instead of after;
  *  - "distinct users over an arbitrary date range" over an append-only
  *    event log is a re-scan per question when computed exactly, but a
  *    once-per-day sketch table answers every range by REGISTER-WISE
  *    merge (HLL union is lossless at equal lgK), no raw-data re-read.
  */
object Sketches {

  /** Exact semi join with an explicit Bloom pre-filter on the fact side.
    *
    * The Bloom sketch of the dim keys is built distributed
    * (`stat.bloomFilter` runs a tree aggregate), shipped once per
    * executor as a broadcast, and applied BEFORE the fact side's
    * exchange — at `fpp` false-positive rate the shuffle carries
    * ~selectivity·|fact| rows instead of |fact|. The trailing equi semi
    * join removes the false positives, so the result is EXACTLY
    * `fact SEMI JOIN dim` (the driver hash-checks q59 against DuckDB's
    * `IN` subquery on that contract; a Bloom filter has no false
    * negatives, so no true match is ever lost).
    *
    * Spark's AQE injects this automatically in narrow cases
    * (runtime row-level filters); the explicit operator covers the
    * shapes the optimizer skips — pre-aggregated dims, reused filters,
    * thresholds tuned per pipeline.
    *
    * Key column must be integral (checked) — string keys hash through
    * UTF-8 bytes via [[BloomFilter.putString]]'s layout only when built
    * that way; keep one code path and cast at the call site instead.
    */
  def bloomSemiJoin(fact: DataFrame, factKeyCol: String,
                    dim: DataFrame, dimKeyCol: String,
                    expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    require(expectedItems > 0, s"expectedItems must be positive, got $expectedItems")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val integral = Set[org.apache.spark.sql.types.DataType](ShortType, IntegerType, LongType)
    require(integral.contains(fact.schema(factKeyCol).dataType) &&
      integral.contains(dim.schema(dimKeyCol).dataType),
      s"bloomSemiJoin needs integral key columns, got " +
        s"${fact.schema(factKeyCol).dataType}/${dim.schema(dimKeyCol).dataType}")
    val keys = dim.select(col(dimKeyCol).cast("long").as("k"))
    val bf: BloomFilter = keys.stat.bloomFilter("k", expectedItems, fpp)
    val bc = fact.sparkSession.sparkContext.broadcast(bf)
    val mightContain = udf { k: java.lang.Long =>
      k != null && bc.value.mightContainLong(k)
    }.withName("bloomMightContain") // named so plan audits can locate the prune
    // the dim key gets a reserved name for the trailing join: with the
    // natural `col(factKeyCol) === col(dimKeyCol)` a generic call where
    // both sides share a key name (both "part_key") is ambiguous and
    // fails analysis. Left-semi output carries only fact columns, so
    // the rename never leaks.
    val dimKeyTmp = "_graft_bloom_dim_key"
    require(!fact.columns.contains(dimKeyTmp),
      s"fact frame may not contain reserved column $dimKeyTmp")
    fact.filter(mightContain(col(factKeyCol).cast("long")))
      .join(dim.select(col(dimKeyCol).as(dimKeyTmp)),
        col(factKeyCol) === col(dimKeyTmp), "left_semi")
  }

  /** `q59_bloom_semijoin`: revenue by return flag over lineitems whose
    * part passes a dim-side predicate — the fact scan is Bloom-pruned
    * before any exchange, then exact-semi-joined. */
  def bloomPrunedRevenue(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val bigParts = t.part.filter(col("p_size") >= 40).select(col("p_partkey"))
    bloomSemiJoin(t.lineitem, "l_partkey", bigParts, "p_partkey",
      expectedItems = 20000L, fpp = 0.01)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_lines"),
        round(sum(col("l_extendedprice")), 4).as("revenue"))
      .transform(d => Perf.sortedOnce(d, col("l_returnflag")))
  }

  /** Once-per-day mergeable HLL sketch table: (key, day, user sketch,
    * exact row count). The persistable artifact — write it partitioned
    * by day and every later distinct-count question is a sketch merge.
    */
  def dailySketches(df: DataFrame, keyCol: String, tsCol: String,
                    idCol: String): DataFrame =
    df.groupBy(col(keyCol), col(tsCol).cast("date").as("day"))
      .agg(
        hll_sketch_agg(col(idCol)).as("user_sketch"),
        count(lit(1)).as("n_events"))

  /** Roll daily sketches up to one estimate per key over [fromDay,
    * toDay] (inclusive; null = unbounded). HLL union is register-wise
    * max — lossless at equal lgK — so merging day sketches gives the
    * SAME estimate as sketching the raw range directly (asserted in
    * SketchesSpec), at the cost of reading only |days| sketch rows. */
  def distinctOverRange(sketches: DataFrame, keyCol: String,
                        fromDay: Option[String] = None,
                        toDay: Option[String] = None): DataFrame = {
    val ranged = (fromDay.map(d => col("day") >= lit(d).cast("date")) ++
      toDay.map(d => col("day") <= lit(d).cast("date")))
      .reduceOption(_ && _).map(sketches.filter).getOrElse(sketches)
    // the streaming ingest table carries no n_events (an exact count is
    // not replay-idempotent the way the sketch is) — aggregate it only
    // when the batch-built table provides it
    val aggs =
      hll_sketch_estimate(hll_union_agg(col("user_sketch"))).as("distinct_est") +:
        (if (sketches.columns.contains("n_events"))
           Seq(sum(col("n_events")).as("n_events"))
         else Nil) :+
        count(lit(1)).as("n_days")
    ranged.groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** `q60_hll_users` (*rows-only*: a sketch estimate is not
    * ANSI-reproducible): per-event-type distinct users for the back
    * half of January, answered from the daily sketch table. */
  def hllUsersByType(spark: SparkSession, dir: String): DataFrame = {
    val daily = dailySketches(Tables(spark, dir).events, "event_type", "ts", "user_id")
    distinctOverRange(daily, "event_type", fromDay = Some("2024-01-16"))
      .transform(d => Perf.sortedOnce(d, col("event_type")))
  }

  // ---- portable-hash HLL twin (the q74 pattern for sketches) -------
  //
  // HLL is DETERMINISTIC given its hash function: a register is just
  // max(rho) over the bucket's hashed values and the estimate is pure
  // arithmetic over the registers. The production path (q60) rides
  // DataSketches' private hash, so its estimate is rows-only; this twin
  // swaps ONLY the hash family for the repo's portable 60-bit md5
  // convention (first 15 hex nibbles — the q74/md5Unit idiom) and keeps
  // the HLL semantics (p=12 → 4096 registers, 48-bit rho domain,
  // harmonic mean + linear-counting small-range correction), so DuckDB
  // reproduces the IDENTICAL estimate from the raw rows and the driver
  // hash-checks the whole register→merge→estimate pipeline.

  /** Number of index bits (p); m = 2^p = 4096 registers. */
  private val HllP = 12
  private val HllM = 1 << HllP                // 4096
  private val HllRemBits = 60 - HllP          // 48-bit rho domain
  private val HllRemMask = (1L << HllRemBits) - 1
  /** 2^(remBits+1) — the scaled-long unit: a register's 2^-rho term is
    * the INTEGER 2^(49-rho), so the harmonic-mean denominator sums as
    * exact longs (order-independent across engines), the q33/q63
    * scaled-long convention applied to HLL. */
  private val HllScale = 1L << (HllRemBits + 1)
  /** alpha_m * m^2 * 2^49 as one shortest-repr double literal, embedded
    * identically in the oracle SQL — both engines parse the same
    * IEEE-754 value, so the estimate arithmetic is bit-identical. */
  private val HllAlphaMMScaled = 6.810691763087074e21

  /** Once-per-day PORTABLE HLL register table: (key, day, idx, r) with
    * idx the top-12 hash bits and r = max(rho) over the bucket. The
    * same persistable day-partitioned artifact shape as
    * [[dailySketches]], with registers exploded into rows instead of a
    * binary blob — |days|·|keys|·≤4096 rows, still tiny next to the
    * raw log, and register-wise merge is a plain groupBy-max. */
  def portableDailyRegisters(df: DataFrame, keyCol: String, tsCol: String,
                             idCol: String): DataFrame =
    df.select(col(keyCol), col(tsCol).cast("date").as("day"),
        conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10)
          .cast("long").as("h"))
      .withColumn("idx", shiftright(col("h"), HllRemBits))
      .withColumn("rem", col("h").bitwiseAND(lit(HllRemMask)))
      // rho = leading zeros of the 48-bit remainder + 1; bin() prints
      // no leading zeros, so bitlen = length(bin(rem)) and
      // rho = 49 - bitlen (49 when the remainder is all zeros)
      .withColumn("rho", when(col("rem") === 0, lit(HllRemBits + 1))
        .otherwise(lit(HllRemBits + 1) - length(bin(col("rem")))))
      .groupBy(col(keyCol), col("day"), col("idx"))
      .agg(max(col("rho")).as("r"))

  /** Distinct estimate per key over [fromDay, toDay] from the portable
    * register table: one groupBy-max merge (associative, so day-grain
    * registers give the SAME registers as hashing the raw range), then
    * the standard HLL estimator with the 2^-rho sum carried as exact
    * scaled longs and the small-range linear-counting branch. */
  def portableDistinctOverRange(registers: DataFrame, keyCol: String,
                                fromDay: Option[String] = None,
                                toDay: Option[String] = None): DataFrame = {
    val ranged = (fromDay.map(d => col("day") >= lit(d).cast("date")) ++
      toDay.map(d => col("day") <= lit(d).cast("date")))
      .reduceOption(_ && _).map(registers.filter).getOrElse(registers)
    val merged = ranged.groupBy(col(keyCol), col("idx")).agg(max(col("r")).as("r"))
    val agg = merged.groupBy(col(keyCol)).agg(
      count(lit(1)).as("n_regs"),
      // 2^(49-r) is exact in a double for r ≥ 1 and casts to the exact long
      sum(pow(lit(2.0), lit(HllRemBits + 1) - col("r")).cast("long")).as("s"))
    val t = (col("s") + (lit(HllM.toLong) - col("n_regs")) * lit(HllScale)).cast("double")
    val zeros = lit(HllM.toLong) - col("n_regs")
    val raw = lit(HllAlphaMMScaled) / t
    val est = when(raw <= lit(2.5 * HllM) && zeros > 0,
      lit(HllM.toDouble) * log(lit(HllM.toDouble) / zeros.cast("double"))).otherwise(raw)
    agg.select(col(keyCol), col("n_regs"),
      round(est + lit(1e-9), 4).as("distinct_est"))
  }

  /** `q77_hll_portable`: q60's question (per-event-type distinct users,
    * back half of January) through the portable twin — oracle-backed,
    * certifying the register/merge/estimate semantics the DataSketches
    * path can't expose (the q22→q74 relationship, for sketches). */
  def hllUsersPortable(spark: SparkSession, dir: String): DataFrame = {
    val regs = portableDailyRegisters(Tables(spark, dir).events,
      "event_type", "ts", "user_id")
    portableDistinctOverRange(regs, "event_type", fromDay = Some("2024-01-16"))
      .transform(d => Perf.sortedOnce(d, col("event_type")))
  }

  /** Once-per-day mergeable KLL quantile sketch table — the percentile
    * analog of [[dailySketches]], via the graft_kll_* native
    * aggregates ([[graft.expressions.KllSketchAgg]]). Write it
    * partitioned by day; every later "p95 over range X" reads |days|
    * sketch rows instead of the raw log. */
  def dailyQuantileSketches(df: DataFrame, keyCol: String, tsCol: String,
                            valueCol: String, k: Int = 200): DataFrame =
    df.groupBy(col(keyCol), col(tsCol).cast("date").as("day"))
      .agg(call_function("graft_kll_agg",
        col(valueCol).cast("double"), lit(k)).as("value_sketch"))

  /** Shared kernel between the batch builder and the streaming twin
    * ([[graft.streaming.EventsStream.kllIngestStream]]): per-(key, day)
    * KLL sketches from FINALIZED per-value count rows
    * (keyCol, day, value, cnt). The day's exact multiset reconstructs
    * by sequence-explode, so stream and batch feed the identical
    * values through the identical `graft_kll_agg` — range-merge
    * correctness requires the two paths to sketch identically,
    * forever (the cmsCountersFromCounts contract, for quantiles).
    *
    * Carries `n_values` alongside the sketch: the DETERMINISTIC day
    * signature the streaming split-day guard compares — compacted
    * sketch BYTES are legitimately run-varying (KLL compaction makes
    * randomized keep/drop choices), so byte equality cannot
    * distinguish a benign replay from a half day, but a half day can
    * never replay the full day's per-key value count. */
  def quantileSketchesFromCounts(counts: DataFrame, keyCol: String,
                                 k: Int = 200): DataFrame =
    counts
      .select(col(keyCol), col("day"), col("value").cast("double").as("value"),
        col("cnt"))
      .withColumn("_i", explode(sequence(lit(1L), col("cnt"))))
      .groupBy(col(keyCol), col("day"))
      .agg(count(lit(1)).as("n_values"),
        call_function("graft_kll_agg", col("value"), lit(k)).as("value_sketch"))

  /** Rolls a PARTIAL-sketch table (one (day, key, n_values,
    * value_sketch) row per micro-batch that touched the (day, key) —
    * [[graft.streaming.EventsStream.kllPartialIngestStream]]'s
    * artifact) up to the daily shape [[quantilesOverRange]] consumes.
    * KLL merge is associative, so merging per-batch partials then
    * range-merging days is the same sketch (same rank guarantees) as
    * sketching each day's full multiset directly — the property that
    * makes the sketch-bounded streaming form sound. */
  def mergeKllPartials(partials: DataFrame, keyCol: String): DataFrame =
    partials.groupBy(col(keyCol), col("day"))
      .agg(sum(col("n_values")).as("n_values"),
        call_function("graft_kll_merge", col("value_sketch")).as("value_sketch"))

  /** Maintenance COMPACTION for the KLL partials table (the growth
    * debt [[graft.streaming.EventsStream.kllPartialIngestStream]]
    * documents: one artifact row per (batch, day, key)): merges every
    * batch partition EXCEPT THE HIGHEST into one reserved
    * `batch_id = -1` partition — KLL merge is associative, so readers
    * decode identically before and after, and re-compaction is
    * idempotent (the -1 partition just re-merges with itself).
    *
    * The highest batch partition is deliberately left alone: it is the
    * ONLY one a restarted stream can re-deliver (a crash between the
    * sink write and the checkpoint commit replays exactly the last
    * batch), and its replay must land as a partition OVERWRITE — if
    * its rows were already folded into -1, the replay would
    * double-count. Run on a maintenance cadence with the stream
    * stopped or between triggers (compaction and a concurrent batch
    * write race on the directory listing, like any file-table
    * compactor — the E3 contract).
    *
    * The swap is the rename-aside protocol [[graft.sources.Bucketing
    * .compactBucketed]] uses: write the compacted table to
    * `path.compact_tmp`, rename the live table aside to `path__old`,
    * rename the staged table in, then drop the aside copy. The two
    * renames are each metadata-only but not jointly atomic — a crash
    * between them leaves the data intact under `path__old` (recovery =
    * one rename), and a crash before the first rename leaves the live
    * table untouched; at no point is the canonical path empty with the
    * only copy in a tmp directory. A leftover `path__old` from a prior
    * crash is reclaimed on the next run. @return number of batch
    * partitions folded. */
  def compactKllPartials(spark: SparkSession, path: String,
                         keyCol: String): Long = {
    val parts = spark.read.parquet(path)
      .withColumn("batch_id", col("batch_id").cast("long"))
      .localCheckpoint()
    val batches = parts.select(col("batch_id")).distinct()
      .collect().map(_.getLong(0)).sorted
    val maxBatch = batches.last
    val fold = batches.filter(_ != maxBatch)
    if (fold.length <= 1) return 0L
    val merged = mergeKllPartials(parts.filter(col("batch_id") =!= maxBatch), keyCol)
      .select(col(keyCol), col("day"), col("n_values"), col("value_sketch"))
      .withColumn("batch_id", lit(-1L))
    val keep = parts.filter(col("batch_id") === maxBatch)
    val tmp = path + ".compact_tmp"
    merged.unionByName(keep.select(merged.columns.map(col): _*))
      .write.partitionBy("batch_id")
      .mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(tmp)
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val aside = new org.apache.hadoop.fs.Path(path + "__old")
    if (fs.exists(aside)) fs.delete(aside, true) // leftover from a prior crash
    require(fs.rename(p, aside),
      s"compactKllPartials: rename $path -> $aside failed; the live table " +
        "is untouched and the compacted copy sits at the tmp path")
    require(fs.rename(new org.apache.hadoop.fs.Path(tmp), p),
      s"compactKllPartials: rename $tmp -> $path failed; recover by " +
        s"renaming $aside back to $path — no data was deleted")
    fs.delete(aside, true)
    fold.length.toLong
  }

  /** Quantiles per key over [fromDay, toDay] from the daily sketch
    * table: ONE merge aggregate, then one scalar decode per requested
    * rank over the tiny per-key result. */
  def quantilesOverRange(sketches: DataFrame, keyCol: String,
                         ranks: Seq[Double] = Seq(0.5, 0.9, 0.99),
                         fromDay: Option[String] = None,
                         toDay: Option[String] = None): DataFrame = {
    require(ranks.nonEmpty && ranks.forall(r => r >= 0 && r <= 1),
      s"ranks must lie in [0,1], got $ranks")
    val ranged = (fromDay.map(d => col("day") >= lit(d).cast("date")) ++
      toDay.map(d => col("day") <= lit(d).cast("date")))
      .reduceOption(_ && _).map(sketches.filter).getOrElse(sketches)
    val merged = ranged.groupBy(col(keyCol))
      .agg(call_function("graft_kll_merge", col("value_sketch")).as("_m"),
        count(lit(1)).as("n_days"))
    ranks.foldLeft(merged) { (acc, r) =>
      acc.withColumn(s"p${(r * 100).round}",
        round(call_function("graft_kll_quantile", col("_m"), lit(r)), 4))
    }.drop("_m")
  }

  /** `q64_kll_quantiles`: per-event-type p50/p90/p99 of event value for
    * the back half of January, from the daily quantile-sketch table.
    * k=4096 keeps every verify-scale sketch in EXACT mode (sf0.01 has
    * ~1k values per type-range), so the answer IS the inclusive-rank
    * order statistic (value at sorted position ceil(rank·n)) — which
    * is ANSI-expressible, and the DuckDB oracle hash-checks the whole
    * insert→day-sketch→merge→decode pipeline on that rule. At
    * bench/production scale the sketch compacts and the answer is the
    * published ±1.65%-rank-error estimate — that trade IS the
    * operator's contract (SketchesSpec pins both regimes). */
  def kllQuantilesByType(spark: SparkSession, dir: String): DataFrame = {
    val daily = dailyQuantileSketches(Tables(spark, dir).events,
      "event_type", "ts", "value", k = 4096)
    quantilesOverRange(daily, "event_type", fromDay = Some("2024-01-16"))
      .transform(d => Perf.sortedOnce(d, col("event_type")))
  }

  // ---- C25: mergeable Count-Min heavy-hitter rollups ---------------
  //
  // "Top items over an arbitrary date range" is the frequency analog
  // of the HLL/KLL questions above: exact answers re-scan the raw log
  // per question, while a once-per-day Count-Min sketch table (Cormode
  // & Muthukrishnan 2005 — the CM sketch is a d×w counter grid; the
  // estimate min over d hashed counters never underestimates) answers
  // every range from depth·width counter rows per day, a size
  // INDEPENDENT of item cardinality. The sketch is represented as a
  // plain (day, row, bucket, cnt) TABLE — the repo's q77 exploded-
  // register idiom — so the range merge is one groupBy-sum, the
  // artifact is day-partitionable parquet, and the whole pipeline
  // stays in whole-stage codegen (no binary blobs, no UDAFs).
  //
  // CMS alone estimates ANY item but enumerates none, so the operator
  // pairs it with the standard candidate-list companion: a per-day
  // exact top-N table (N rows/day — also tiny). A range query merges
  // the counters, estimates each candidate seen in the range, and
  // keeps the top k. The candidate contract: an item can only be
  // missed if it is outside the top N on EVERY day of the range yet
  // top-k overall — at N ≫ k that needs adversarial day-splitting,
  // and the contract is spec-pinned on planted data.
  //
  // Hashing rides the repo's portable 60-bit md5 convention
  // (row j's bucket = md5("j:item") first 15 nibbles mod width), so —
  // unlike q60's DataSketches path — the ENTIRE pipeline is
  // ANSI-reproducible and q84 is directly oracle-backed: DuckDB
  // rebuilds the same counters from the raw rows and the driver
  // hash-checks counts, estimates, ranks and tie-breaks.

  private[graft] val CmsDepth = 4
  private[graft] val CmsWidth = 1024

  /** Row j's counter index for an item: portable md5 bucket, the q77
    * hash convention (h < 2^60, so `%` is already nonnegative). */
  private def cmsBucket(j: Int, item: Column, width: Int): Column =
    conv(substring(md5(concat(lit(j.toString), lit(":"), item)), 1, 15), 16, 10)
      .cast("long") % width

  /** Once-per-day CMS counter table: (day, row, bucket, cnt) with
    * ≤ depth·width rows per day regardless of item cardinality. Each
    * event lands in one bucket per hash row (posexplode of the d
    * bucket expressions — map-side, stays in codegen); the groupBy
    * partial-aggregates before the day shuffle. Write it partitioned
    * by day next to the HLL/KLL sketch tables. */
  def dailyCmsSketches(df: DataFrame, tsCol: String, itemCol: String,
                       depth: Int = CmsDepth, width: Int = CmsWidth): DataFrame = {
    require(depth > 0 && width > 0, s"depth/width must be positive, got $depth/$width")
    cmsCountersFromCounts(dayItemCounts(df, tsCol, itemCol), depth, width)
  }

  /** (day, item, cnt) day-grain counts — the shared projection both
    * CMS artifacts (and their streaming twin) hang off. Counting per
    * item BEFORE the ×depth bucket fan-out keeps the exploded frame at
    * |distinct items| rows, not |events| rows. */
  private[graft] def dayItemCounts(df: DataFrame, tsCol: String,
                                   itemCol: String): DataFrame =
    df.select(col(tsCol).cast("date").as("day"),
        col(itemCol).cast("string").as("item"))
      .groupBy(col("day"), col("item")).agg(count(lit(1)).as("cnt"))

  /** Counter grid from (day, item, cnt) rows — the kernel the batch
    * builder and [[graft.streaming.EventsStream.cmsIngestStream]]
    * SHARE: range-merge correctness requires both paths to bucket and
    * sum identically, forever. */
  private[graft] def cmsCountersFromCounts(counts: DataFrame, depth: Int,
                                           width: Int): DataFrame =
    counts
      .select(col("day"), col("cnt"), posexplode(array((0 until depth).map(j =>
        cmsBucket(j, col("item"), width)): _*)).as(Seq("row", "bucket")))
      .groupBy(col("day"), col("row"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Per-day exact top-N candidate table: (day, item, cnt). The
    * enumeration companion to [[dailyCmsSketches]] — N rows per day,
    * built by the same day-grain pass that builds the counters. */
  def dailyTopCandidates(df: DataFrame, tsCol: String, itemCol: String,
                         topN: Int = 64): DataFrame =
    topCandidatesFromCounts(dayItemCounts(df, tsCol, itemCol), topN)

  /** Top-N filter over (day, item, cnt) rows — shared with the
    * streaming twin for the same reason as [[cmsCountersFromCounts]]. */
  private[graft] def topCandidatesFromCounts(counts: DataFrame,
                                             topN: Int): DataFrame = {
    require(topN > 0, s"topN must be positive, got $topN")
    val w = Window.partitionBy(col("day"))
      .orderBy(col("cnt").desc, col("item").asc)
    counts
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= topN)
      .drop("_rn")
  }

  /** Top-k heavy hitters over [fromDay, toDay] from the two persisted
    * artifacts: counters merge with ONE groupBy-sum over |days|·d·w
    * rows, every candidate seen in the range is estimated by the CMS
    * rule (min over its d merged counters — recomputed from the item
    * string by the same bucket formula, so the candidate table carries
    * no hash state), and the top k by (estimate desc, item asc)
    * survive. `est_count` ≥ the item's true range count, always —
    * CMS errs only upward (spec-pinned). The global rank window runs
    * on ≤ |range days|·topN candidate rows — bounded by the artifact
    * contract, not by the data (the Analytics.scala:111 tiny-frame
    * precedent). */
  def heavyHittersOverRange(cms: DataFrame, candidates: DataFrame, k: Int = 20,
                            fromDay: Option[String] = None,
                            toDay: Option[String] = None,
                            depth: Int = CmsDepth,
                            width: Int = CmsWidth): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    def ranged(df: DataFrame) =
      (fromDay.map(d => col("day") >= lit(d).cast("date")) ++
        toDay.map(d => col("day") <= lit(d).cast("date")))
        .reduceOption(_ && _).map(df.filter).getOrElse(df)
    val merged = ranged(cms).groupBy(col("row"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))
    val probes = ranged(candidates).select(col("item")).distinct()
      .select(col("item"), posexplode(array((0 until depth).map(j =>
        cmsBucket(j, col("item"), width)): _*)).as(Seq("row", "bucket")))
    // merged is ≤ d·w rows by construction — broadcast it onto the
    // (also tiny) probe side; an in-range candidate's counters always
    // exist (its own occurrences are in them), so the inner join keeps
    // exactly d rows per item
    val est = probes.join(broadcast(merged), Seq("row", "bucket"))
      .groupBy(col("item")).agg(min(col("cnt")).as("est_count"))
    val w = Window.orderBy(col("est_count").desc, col("item").asc)
    est.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("rank"), col("item"), col("est_count"))
      .transform(d => Perf.sortedOnce(d, col("rank")))
  }

  /** `q84_cms_heavy_hitters`: top-20 users by event count for the back
    * half of January, answered from the day-grain CMS counter table +
    * per-day top-64 candidate lists — never from the raw log. Directly
    * oracle-backed (portable md5 buckets): DuckDB rebuilds identical
    * counters, estimates and ranks from the raw rows. */
  def cmsTopUsers(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
    val cms = dailyCmsSketches(ev, "ts", "user_id")
    val cands = dailyTopCandidates(ev, "ts", "user_id", topN = 64)
    heavyHittersOverRange(cms, cands, k = 20, fromDay = Some("2024-01-16"))
  }

  // ---- C28: mergeable KMV set-OVERLAP sketches ---------------------
  //
  // HLL (C23) answers "how many distinct" but cannot intersect; the
  // overlap questions a training-data pipeline actually asks — how
  // much does corpus A share with corpus B? is the eval set
  // contaminated? how much do two snapshots overlap? — need a sketch
  // whose INTERSECTION is estimable. That is the KMV / theta sketch
  // (Bar-Yossef et al. 2002; Beyer et al. SIGMOD 2007 — public
  // literature): keep the k smallest distinct hash values of a set;
  // the kth smallest, as a fraction θ of the hash space, estimates the
  // density, D̂ = (k−1)/θ, and two sketches intersect by counting
  // common hashes below min(θ_a, θ_b) — a deterministic function of
  // the hashes, so on the portable 60-bit md5 convention the WHOLE
  // pipeline (sketch → merge → estimate) is ANSI-reproducible and q87
  // is directly oracle-backed even in the estimate regime (unlike KLL,
  // whose compaction randomizes, or HLL, whose production hash is
  // private — this family needs no twin and no exact-regime dodge).
  //
  // The sketch is k plain (group, h) ROWS — the exploded-register
  // idiom: partition-friendly parquet, one groupBy to merge, whole
  // pipeline in codegen. Merging is LOSSLESS by construction: the k
  // smallest of a union are among the union of the parts' k smallest,
  // so fine-grained sketches (per source×lang, per day) roll up to
  // any coarser grain with set semantics preserved.

  private val KmvK = 256

  /** Unit-interval position of the hash; 2^60 as an exact double. */
  private val KmvSpace = 1152921504606846976.0d

  /** The persistable sketch table: (groupCols..., h) with ≤ k rows per
    * group — the k smallest distinct portable-md5 hashes of
    * `valueCol`'s values (an ARRAY column contributes its elements —
    * shingle sets ride without an explode; a scalar contributes
    * itself). Built by the `graft_kmv_agg` native aggregate
    * ([[graft.expressions.KmvSketchAgg]]): hashing and bounded min-k
    * selection fuse into the map side, so the exchange carries
    * |groups|·k longs — a distinct+window formulation (the first cut)
    * shuffled the corpus's whole distinct hash set first, which is the
    * plan that stops working at 100 TB. Build at the finest grain you
    * will ever query (source×lang, key×day); [[kmvMerge]] rolls up
    * losslessly. */
  def kmvSketches(df: DataFrame, groupCols: Seq[String], valueCol: Column,
                  k: Int = KmvK): DataFrame = {
    require(k > 1, s"k must be > 1, got $k")
    require(groupCols.nonEmpty, "kmvSketches needs at least one group column")
    val isArray = df.select(valueCol).schema.head.dataType
      .isInstanceOf[org.apache.spark.sql.types.ArrayType]
    val vals = if (isArray) valueCol.cast("array<string>")
               else array(valueCol.cast("string"))
    df.groupBy(groupCols.map(col): _*)
      .agg(call_function("graft_kmv_agg", vals, lit(k)).as("_hs"))
      .select(groupCols.map(col) :+ explode(col("_hs")).as("h"): _*)
  }

  /** [[kmvSketches]] fused with the shingling corpus pass: sketch the
    * k-token-shingle SET of each group's text directly from token
    * arrays (`graft_kmv_shingled` — shingle strings are built and
    * hashed inside the kernel, never as Column values; the expression
    * formulation paid 7.8 s at sf0.1 just materializing them). Same
    * shingle definition as [[Dedup.wordShingles]], same portable md5
    * domain, same oracle. */
  def kmvShingleSketches(df: DataFrame, groupCols: Seq[String], textCol: Column,
                         shingle: Int = 3, k: Int = KmvK): DataFrame = {
    require(k > 1, s"k must be > 1, got $k")
    require(shingle >= 1, s"shingle must be >= 1, got $shingle")
    require(groupCols.nonEmpty, "kmvShingleSketches needs at least one group column")
    val toks = split(lower(trim(textCol)), "\\s+")
    df.groupBy(groupCols.map(col): _*)
      .agg(call_function("graft_kmv_shingled", toks, lit(shingle), lit(k)).as("_hs"))
      .select(groupCols.map(col) :+ explode(col("_hs")).as("h"): _*)
  }

  /** Roll fine sketches up to `keepCols` grain: the k smallest of the
    * union (`graft_kmv_merge` — the same bounded buffer over
    * already-hashed rows). Lossless by construction: every global
    * top-k hash is its part's top-k, and the same value seen under two
    * fine groups is one set member (the buffer is a set). */
  def kmvMerge(sketches: DataFrame, keepCols: Seq[String],
               k: Int = KmvK): DataFrame = {
    require(k > 1, s"k must be > 1, got $k")
    require(keepCols.nonEmpty, "kmvMerge needs at least one keep column")
    sketches.groupBy(keepCols.map(col): _*)
      .agg(call_function("graft_kmv_merge", col("h"), lit(k)).as("_hs"))
      .select(keepCols.map(col) :+ explode(col("_hs")).as("h"): _*)
  }

  /** Pairwise overlap of every two keys' sets, from sketches alone:
    * (key_a, key_b, est_a, est_b, est_inter, jaccard_est) for
    * key_a < key_b. Distinct estimates are EXACT below k (θ = 1) and
    * (k−1)/θ above; the intersection counts common hashes below
    * min(θ) — thresholds compare as exact longs, only the final
    * estimates divide as doubles (floored, then Jaccard rounded to
    * 4 dp — the repo's float convention). |keys| is assumed small
    * (sources, corpora, snapshots): the stats frame broadcasts and the
    * common-hash join runs on the 8-byte h key. */
  def kmvOverlap(sketches: DataFrame, keyCol: String, k: Int = KmvK): DataFrame = {
    require(k > 1, s"k must be > 1, got $k")
    // stats and both sides of the common-hash join fork the sketch
    // frame; with the aggregate-built sketch the recomputed subtree is
    // one map-side pass over ≤ k·|keys| rows per fork (Spark's reused
    // exchange dedupes the shuffles within the query), so no
    // materialization barrier is warranted — measured indistinguishable
    // from a localCheckpoint at sf0.1, and a checkpoint would block
    // the sketch build's pipelining into the join
    val stats = sketches.groupBy(col(keyCol))
      .agg(count(lit(1)).as("cnt"), max(col("h")).as("hk"))
      // θ in the exact long domain: 2^60 when the sketch holds the
      // whole set (cnt < k), else the kth smallest hash
      .withColumn("h_theta",
        when(col("cnt") < k, lit(1152921504606846976L)).otherwise(col("hk")))
      .withColumn("est",
        when(col("cnt") < k, col("cnt").cast("double"))
          .otherwise(floor(lit((k - 1).toDouble) / (col("hk").cast("double") / KmvSpace))))
    def side(s: String) = stats.select(col(keyCol).as(s"key_$s"),
      col("h_theta").as(s"ht_$s"), col("est").as(s"est_$s"))
    val pairs = side("a").join(side("b"), col("key_a") < col("key_b"))
      .withColumn("ht_min", least(col("ht_a"), col("ht_b")))
    val common = sketches.select(col(keyCol).as("key_a"), col("h"))
      .join(sketches.select(col(keyCol).as("key_b"), col("h")), Seq("h"))
      .filter(col("key_a") < col("key_b"))
    val m = common.join(broadcast(pairs.select(col("key_a"), col("key_b"), col("ht_min"))),
        Seq("key_a", "key_b"))
      .filter(col("h") < col("ht_min"))
      .groupBy(col("key_a"), col("key_b")).agg(count(lit(1)).as("m"))
    pairs.join(m, Seq("key_a", "key_b"), "left")
      .withColumn("m", coalesce(col("m"), lit(0L)))
      .withColumn("est_inter",
        floor(col("m").cast("double") / (col("ht_min").cast("double") / KmvSpace)))
      .withColumn("est_union", col("est_a") + col("est_b") - col("est_inter"))
      .select(col("key_a"), col("key_b"),
        col("est_a").cast("long").as("est_a"),
        col("est_b").cast("long").as("est_b"),
        col("est_inter").cast("long").as("est_inter"),
        round(col("est_inter") / col("est_union"), 4).as("jaccard_est"))
      .transform(d => Perf.sortedOnce(d, col("key_a"), col("key_b")))
  }

  /** C28 `q87_kmv_overlap`: shingle-set overlap between every pair of
    * document sources — the decontamination/provenance question — from
    * per-(source, lang) sketches rolled up to source grain, never from
    * pairwise corpus scans. Directly oracle-backed: DuckDB rebuilds
    * the identical hashes, order statistics and estimates from raw
    * rows, estimate regime included. */
  def kmvSourceOverlap(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    val fine = kmvShingleSketches(docs, Seq("source", "lang"), col("text"))
    kmvOverlap(kmvMerge(fine, Seq("source")), "source")
      .withColumnRenamed("key_a", "source_a")
      .withColumnRenamed("key_b", "source_b")
  }
}

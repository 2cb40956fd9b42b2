package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-corpus layout operators: deterministic shuffling, sharding,
  * and splits. An LLM data build needs all three to be REPRODUCIBLE
  * (same inputs + seed ⇒ identical shard MEMBERSHIP and read order;
  * see the [[writeShards]] scaladoc for exactly what is and isn't
  * byte-stable) and driver-free — no `rand()` (re-evaluates per task
  * retry, breaking determinism under failure), no collect, no global
  * sort bottleneck beyond the one intended shuffle.
  *
  * The primitive is a seeded 64-bit hash of a stable id column
  * (`xxhash64(seed, id)`): uniformly distributed, stable across runs,
  * executors, and retries.
  */
object Sharding {

  /** Seeded stable hash of `id` — the ordering/bucketing primitive. */
  def seededHash(id: Column, seed: Long): Column =
    xxhash64(lit(seed), id)

  /** Deterministic global shuffle + fixed shard layout: rows hash-route
    * to `numShards` shards and sort by the same hash within each, so
    * the corpus READ ORDER (shard by shard, row by row) is a seeded
    * pseudo-random permutation — the training-order shuffle — stable
    * run to run. One shuffle; shard files are bounded by
    * `maxRecordsPerFile`.
    *
    * Determinism contract, precisely: shard MEMBERSHIP (which rows land
    * in which shard=N directory) and the row SEQUENCE a reader sees per
    * shard are functions of (inputs, seed) only — both hashes are
    * seeded and retry-stable. File BOUNDARIES inside a shard directory
    * are not: `repartitionByRange` samples its range bounds with an
    * internal seed derived from the runtime RDD id, so the same write
    * can split a shard's (identically ordered) rows into differently
    * cut files across runs. Consumers that read a shard directory in
    * filename-then-row order see the same row sequence either way;
    * consumers that diff file listings byte-for-byte should not rely
    * on byte-stable files. */
  def writeShards(df: DataFrame, path: String, idCol: String,
                  numShards: Int, seed: Long = 0L,
                  maxRecordsPerFile: Long = 5000000L): Unit = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    val h = seededHash(col(idCol), seed)
    // range-partition on (shard, order-hash), NOT hash-partition on the
    // shard id: repartition() re-murmurs the shard value, and hashing
    // numShards small ints into numShards buckets collides ~1/e of them
    // — empty tasks next to double-shard stragglers. Contiguous ranges
    // give ~equal ROW counts per task and keep each shard's rows in
    // consecutive tasks; shard CONTENT (what the spec pins) is set by
    // the hash columns either way.
    df.withColumn("shard", pmod(h, lit(numShards)).cast("int"))
      .withColumn("_ord", seededHash(col(idCol), seed + 1))
      .repartitionByRange(numShards, col("shard"), col("_ord"))
      .sortWithinPartitions(col("shard"), col("_ord"))
      .drop("_ord")
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("shard")
      .parquet(path)
  }

  /** Deterministic weighted split (train/val/test …): each row lands in
    * exactly one named bucket by hash range — reproducible across runs
    * and cluster sizes, unlike `randomSplit` (which is sample-based,
    * partition-order-sensitive, and can drop/duplicate rows across
    * retries). Weights normalize automatically.
    *
    * @return (name → DataFrame) with lazily-filtered views of `df` —
    *         one source scan per materialized split (filter pushdown
    *         applies), no shuffle at all
    */
  def splitByHash(df: DataFrame, idCol: String, weights: Seq[(String, Double)],
                  seed: Long = 0L): Map[String, DataFrame] = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      s"weights must be positive, got $weights")
    require(weights.map(_._1).distinct.size == weights.size,
      s"split names must be distinct (a Map result keyed by name), got ${weights.map(_._1)}")
    val total = weights.map(_._2).sum
    val u = hashUnit(col(idCol), seed)
    val cuts = weights.map(_._2 / total).scanLeft(0.0)(_ + _)
    weights.zipWithIndex.map { case ((name, _), i) =>
      val lo = cuts(i); val hi = cuts(i + 1)
      val pred =
        if (i == weights.length - 1) u >= lit(lo)   // last bucket absorbs fp edge
        else u >= lit(lo) && u < lit(hi)
      name -> df.filter(pred)
    }.toMap
  }

  /** C38: leakage-safe (group-aware) split — the contamination lesson
    * of Lee et al. 2021 ("Deduplicating Training Data Makes Language
    * Models Better", arXiv:2107.06499 — public): splitting ROWS leaks
    * near-identical copies across train/test; the split key must be
    * the DUPLICATE GROUP, so every member of a cluster (exact-dup
    * fingerprint, canonical URL, resolved near-dup cluster — any
    * group column) lands in the same named split by construction.
    *
    * Assignment is an md5 bucket of the GROUP key ([[md5Unit]]'s
    * portability convention, integer-percent form): bucket =
    * md5("group:split:seed")[first 13 nibbles] mod 100, train below
    * `trainPct`, val below `trainPct+valPct`, test above. Map-only —
    * a pure column expression over whatever frame already carries the
    * group column; no shuffle, no join, reproducible on any cluster
    * size and any engine with md5.
    *
    * Null group keys fail LOUDLY in-plan: md5(null) is null, so a null
    * group would otherwise bucket to null and fall through the
    * when-chain to 'test' — neither rejected nor co-assigned, the
    * silent failure mode a leakage-safety primitive cannot have.
    * Coalesce to a sentinel upstream if null really means "its own
    * group".
    *
    * @return `df` plus (bucket, split) columns */
  def leakageSafeSplit(df: DataFrame, groupCol: String, trainPct: Int = 80,
                       valPct: Int = 10, seed: Long = 7L): DataFrame = {
    require(trainPct > 0 && valPct > 0 && trainPct + valPct < 100,
      s"need positive train/val and a non-empty test remainder, got train=$trainPct val=$valPct")
    val key = when(col(groupCol).isNull, raise_error(lit(
      s"leakageSafeSplit: null group key in '$groupCol' — a null group cannot be " +
        "assigned safely (rows would silently land in 'test'); coalesce to a " +
        "sentinel upstream if null means its own group")))
      .otherwise(col(groupCol).cast("string"))
    val bucket = (conv(substring(md5(concat(key,
      lit(s":split:$seed"))), 1, 13), 16, 10).cast("long") % 100L).as("bucket")
    df.withColumn("bucket", bucket)
      .withColumn("split",
        when(col("bucket") < trainPct, lit("train"))
          .when(col("bucket") < trainPct + valPct, lit("val"))
          .otherwise(lit("test")))
  }

  /** C38 `q110_leakage_split` — the composed anti-leakage path: the
    * q105 planted recrawl URLs collapse to canonical groups (sizes up
    * to 5), and the split keys on the CANONICAL URL, so every recrawl
    * copy of a page travels to the same split — the oracle re-derives
    * canonicalization, bucket, and split label and hash-checks that
    * no group straddles. */
  def leakageSplitDocs(spark: SparkSession, dir: String): DataFrame = {
    val urls = Urls.plantedUrls(Tables(spark, dir).documents)
    val canon = urls.select(col("doc_id"),
      Urls.canonicalizeUrl(col("url")).as("canon_url"))
    Perf.sortedOnce(leakageSafeSplit(canon, "canon_url"), col("doc_id"))
  }

  /** C42: temperature (α) source resampling — the multilingual mixing
    * rule (Conneau & Lample 2019, arXiv:1901.07291 §3.1; the T5/XLM-R
    * sampling-temperature family): source s keeps documents at a rate
    * proportional to n_s^α / n_s, so α < 1 UPsamples small sources
    * relative to their share and α = 1 is proportional sampling.
    * Concretely: w_s = n_s^α / Σ_t n_t^α and keep-rate
    * p_s = min(1, targetDocs · w_s / n_s), drawn per document with the
    * retry-stable hash draw ([[sampleByHash]]'s contract).
    *
    * Portability: each n_s^α quantizes to a 1e-6 grid and Z sums those
    * as EXACT LONGS (a double Σ over sources is merge-order-dependent);
    * the remaining arithmetic is a fixed-order chain of single IEEE
    * ops on exact inputs, so the keep set replays engine-exactly.
    *
    * Scale shape: ONE |sources|-row count aggregate (map-side
    * partial), rates broadcast back, the sample itself a map-only
    * filter. */
  def temperatureSample(df: DataFrame, idCol: String, sourceCol: String,
                        alpha: Double, targetDocs: Long, seed: Long = 0L,
                        draw: Option[Column] = None): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must lie in (0,1], got $alpha")
    require(targetDocs > 0, s"targetDocs must be positive, got $targetDocs")
    val counts = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("_ns"))
      .withColumn("_ts",
        round(pow(col("_ns").cast("double"), lit(alpha)) * 1000000.0).cast("long"))
    val z = counts.agg(sum(col("_ts")).as("_z"))
    val rates = counts.crossJoin(broadcast(z))
      .withColumn("_rate", least(lit(1.0),
        lit(targetDocs.toDouble)
          * (col("_ts").cast("double") / col("_z").cast("double"))
          / col("_ns").cast("double")))
      .select(col(sourceCol), col("_rate"))
    df.join(broadcast(rates), Seq(sourceCol))
      .filter(draw.getOrElse(hashUnit(col(idCol), seed)) < col("_rate"))
      .drop("_rate")
  }

  /** C47: EPOCH EXPANSION — materialize a per-source mixture weight as
    * actual row repetition (the T5/LLaMA mixing table shape: "this
    * source is seen 2.5 epochs, that one 0.25"): each document emits
    * `floor(e)` copies plus one more with probability `frac(e)` under
    * the retry-stable hash draw, each copy tagged with its epoch
    * index — the frame a packing/shuffling stage consumes directly.
    * In expectation every source contributes exactly `e · n_s`
    * documents; e < 1 is deterministic downsampling, e = 0 drops the
    * source.
    *
    * Map-only: a `when`-chain rate, one `explode(sequence)` per row
    * (bounded by ⌈e⌉ — the format's design grain), zero shuffles. */
  def expandEpochs(df: DataFrame, idCol: String, sourceCol: String,
                   epochs: Map[String, Double], defaultEpochs: Double = 1.0,
                   seed: Long = 0L, draw: Option[Column] = None): DataFrame = {
    require((epochs.values ++ Seq(defaultEpochs)).forall(e => e >= 0.0 && e <= 100.0),
      s"epoch targets must lie in [0,100], got $epochs / default $defaultEpochs")
    val e = epochs.toSeq.sortBy(_._1).foldLeft(lit(defaultEpochs): Column) {
      case (acc, (s, v)) => when(col(sourceCol) === s, lit(v)).otherwise(acc)
    }
    val base = floor(e).cast("long")
    val extra = when(
      draw.getOrElse(hashUnit(col(idCol), seed)) < (e - base.cast("double")), 1L)
      .otherwise(0L)
    df.withColumn("_n", base + extra)
      .filter(col("_n") > 0)
      .withColumn("epoch", explode(sequence(lit(0L), col("_n") - 1)))
      .drop("_n")
  }

  /** C47 `q123_epoch_expansion` — mixed integer/fractional targets over
    * the documents table with the portable [[md5Unit]] draw: src0 sees
    * 2.5 epochs (2 or 3 copies per doc), src1 exactly 1, src2 is
    * downsampled to 0.25 (kept docs emit one copy), everything else
    * 1.0 — so whole-copy replication, the fractional coin, the
    * keep/drop leg, and the epoch tags all hash-check. */
  def epochExpansionDocs(spark: SparkSession, dir: String): DataFrame =
    expandEpochs(Tables(spark, dir).documents, "doc_id", "source",
      epochs = Map("src0" -> 2.5, "src1" -> 1.0, "src2" -> 0.25),
      defaultEpochs = 1.0, seed = 17L,
      draw = Some(md5Unit(col("doc_id"), 17L)))
      .select(col("doc_id"), col("source"), col("epoch"))
      .orderBy(col("doc_id"), col("epoch"))

  /** C42 `q118_temperature_sample` — α = 0.5 over a deterministically
    * SKEWED slice of the corpus (source sizes 3…25 via the
    * floor(id/20) mod rule — the uniform synthetic table carries no
    * skew of its own, and temperature sampling over equal sources
    * degenerates to one flat rate), with the portable [[md5Unit]]
    * draw. targetDocs = 200 lands the small sources ABOVE the clamp
    * (rate pins to 1.0 — they keep everything) while big sources
    * sample fractionally, so both legs of min(1, ·) are hash-checked
    * along with the exact kept set. */
  def temperatureSampleDocs(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
      .filter(floor(col("doc_id") / 20.0).cast("long") % 10 <
        (col("doc_id") % 20) % 10 + 1)
    temperatureSample(d, "doc_id", "source", alpha = 0.5, targetDocs = 200L,
      seed = 13L, draw = Some(md5Unit(col("doc_id"), 13L)))
      .select(col("doc_id"), col("source"))
      .transform(d => Perf.sortedOnce(d, col("doc_id")))
  }

  /** Seeded hash mapped to uniform [0, 1) — the shared primitive behind
    * [[splitByHash]], [[sampleByHash]], and [[mixCorpora]]: halve the
    * signed 64-bit hash, shift into [0, 2⁶³), divide by 2⁶³. */
  def hashUnit(id: Column, seed: Long): Column =
    (seededHash(id, seed) / lit(2.0) + lit(Long.MaxValue.toDouble / 2.0 + 1.0)) /
      lit(Long.MaxValue.toDouble + 1.0)

  /** ENGINE-PORTABLE seeded unit draw: the first 13 hex nibbles of
    * md5("id:seed") over 2⁵². Any engine with md5 reproduces the draw
    * bit-for-bit (52 bits fit a double exactly; /2⁵² is a power-of-two
    * division, exact) — this is how the q72/q73 oracles recompute the
    * EXACT kept sets in DuckDB. Prefer [[hashUnit]] in pure-Spark
    * pipelines: xxhash64 is codegen'd and byte-cheap, md5 hashes a
    * rendered string. Pass as the `draw` of [[sampleByWeight]] /
    * [[mixCorpora]] when the sample must replay outside Spark. */
  def md5Unit(id: Column, seed: Long): Column =
    conv(substring(md5(concat(id.cast("string"), lit(s":$seed"))), 1, 13), 16, 10)
      .cast("bigint").cast("double") / lit(4503599627370496.0)

  /** Deterministic Bernoulli sample: keep rows with u(id) < `fraction`.
    * Same (inputs, seed) ⇒ the same sample on any cluster size, any
    * retry — unlike `df.sample`, which draws per partition and changes
    * membership when partitioning or task replays change. Map-only (a
    * filter — composes with pushdown, no shuffle); re-seeding draws an
    * independent sample. */
  def sampleByHash(df: DataFrame, idCol: String, fraction: Double,
                   seed: Long = 0L): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction must be in [0,1], got $fraction")
    df.filter(hashUnit(col(idCol), seed) < lit(fraction))
  }

  /** Deterministic WEIGHTED Bernoulli sample: row kept with probability
    * `scale · weight(row)`, clamped to [0,1] — the quality-weighted
    * corpus-curation draw ("upsample good documents") with
    * [[sampleByHash]]'s retry-stability: same (inputs, seed) ⇒ same
    * sample on any cluster size, because the uniform draw is a hash of
    * the ID, not a per-partition RNG. Still a map-only filter.
    *
    * Expected kept fraction = scale · mean(weight) over rows whose
    * scaled weight stays below 1 (heavier rows saturate at certain
    * keep). Negative weights reject always (treated as 0). Nested
    * property: for the same seed a smaller scale's sample ⊆ a larger
    * scale's — weights only move each row's threshold, the draw itself
    * is fixed per id. */
  def sampleByWeight(df: DataFrame, idCol: String, weightCol: String,
                     scale: Double = 1.0, seed: Long = 0L,
                     draw: Option[Column] = None): DataFrame = {
    require(scale > 0.0, s"scale must be positive, got $scale")
    val p = least(greatest(col(weightCol).cast("double") * scale, lit(0.0)), lit(1.0))
    df.filter(draw.getOrElse(hashUnit(col(idCol), seed)) < p)
  }

  /** Deterministic corpus MIXING — the domain-weighting step of a
    * training-data build ("keep all of wiki, 30% of web crawl, 5% of
    * logs"): each row survives iff u(id) < rate(source). One map-only
    * pass over the union; per-source rates are a tiny when-chain, so no
    * joins, no shuffles, and the sample is retry-stable. Sources absent
    * from `rates` fall to `defaultRate` (0 = drop unknown domains — the
    * safe default for a curated mix). */
  def mixCorpora(df: DataFrame, idCol: String, sourceCol: String,
                 rates: Map[String, Double], defaultRate: Double = 0.0,
                 seed: Long = 0L, draw: Option[Column] = None): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0.0 && r <= 1.0),
      s"rates must be in [0,1], got $rates / default $defaultRate")
    val rate = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultRate)) {
      case (acc, (s, r)) => when(col(sourceCol) === s, lit(r)).otherwise(acc)
    }
    df.filter(draw.getOrElse(hashUnit(col(idCol), seed)) < rate)
  }

  /** C15 `q72_corpus_mix` — [[mixCorpora]] over the documents table
    * with the portable [[md5Unit]] draw, so the EXACT kept set is
    * oracle-checkable: named per-source rates plus the drop-by-default
    * rate for unlisted domains. */
  def corpusMixDocs(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    mixCorpora(d, "doc_id", "source",
      rates = Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.25),
      defaultRate = 0.1, seed = 7L,
      draw = Some(md5Unit(col("doc_id"), 7L)))
      .select(col("doc_id"), col("source"))
      .transform(d => Perf.sortedOnce(d, col("doc_id")))
  }

  /** Mixture-proportional deterministic training ORDER — the step after
    * the mixing/resampling family decides WHAT to train on: a loader
    * wants sources blended THROUGHOUT the epoch, not concatenated in
    * blocks (block order = distribution shift mid-epoch). This is the
    * deterministic stride interleave (the rational-Bresenham merge
    * behind multi-dataset blending in public training loaders, e.g.
    * Megatron-LM's BlendableDataset weighting): each source's k-th
    * document sits at key (k − ½)·stride(source), and the global order
    * is the merge of those arithmetic progressions — every prefix of
    * length P holds ≈ P/stride_s documents of source s (off by < 1.5
    * per source until the source exhausts), so mixture proportions hold
    * at every training step, not just in aggregate.
    *
    * Determinism: within-source order is a seeded-hash shuffle
    * ([[hashUnit]], or the portable [[md5Unit]] for oracle replay) —
    * retry- and cluster-size-stable like everything in this file. Keys
    * are EXACT doubles when strides are dyadic rationals (halves,
    * quarters): (k − ½)·(m/2) has no rounding, so the total order — and
    * hence every global position — is bit-identical across engines.
    *
    * Scale shape: one window per source (shuffle on source), then the
    * ONE intended range exchange (global sort on the key); the global
    * ordinal comes from `zipWithIndex` — a per-partition count pass +
    * offset map over the sorted partitions, NOT a single-partition
    * window and NOT a driver collect. Unknown sources fail loudly
    * in-plan (a join would silently drop them). */
  def mixtureInterleave(df: DataFrame, idCol: String, sourceCol: String,
                        strides: Map[String, Double], seed: Long = 0L,
                        draw: Option[Column] = None): DataFrame = {
    require(strides.nonEmpty && strides.values.forall(_ > 0.0),
      s"strides must be positive, got $strides")
    val strideCol = strides.toSeq.sortBy(_._1).foldLeft(
      raise_error(concat(lit("mixtureInterleave: source "), col(sourceCol),
        lit(" has no stride"))).cast("double")) {
      case (acc, (s, m)) => when(col(sourceCol) === s, lit(m)).otherwise(acc)
    }
    val u = draw.getOrElse(hashUnit(col(idCol), seed))
    val wSrc = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol)).orderBy(u.asc, col(idCol).asc)
    val sorted = df.select(col(idCol), col(sourceCol))
      .withColumn("src_rank", row_number().over(wSrc).cast("long"))
      .withColumn("pos_key",
        (col("src_rank").cast("double") - lit(0.5)) * strideCol)
      .orderBy(col("pos_key"), col(sourceCol), col(idCol))
    // the sort key is a total order (id breaks every tie), so the
    // ordinal is determined by the KEY alone — stable under any
    // partition-boundary placement the range exchange picks
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+ org.apache.spark.sql.types.StructField(
        "global_pos", org.apache.spark.sql.types.LongType, nullable = false))
    val rows = sorted.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
    }
    df.sparkSession.createDataFrame(rows, schema)
      .select(col("global_pos"), col(idCol), col(sourceCol), col("src_rank"))
  }

  /** The q146 stride table: 20 sources, dyadic strides 2.0 … 5.5 (so
    * mixture weights vary 2.75× and every pos_key is float-exact).
    * Shared with the oracle's interpolated CASE chain. */
  val mixtureStrides: Map[String, Double] =
    (0 until 20).map(k => s"src$k" -> (2.0 + (k % 8) * 0.5)).toMap

  /** C15b `q146_mixture_order` — [[mixtureInterleave]] over the
    * documents table with the portable [[md5Unit]] shuffle, so the
    * ENTIRE order — seeded within-source shuffle, stride keys, global
    * merge — replays in DuckDB position-for-position. */
  def mixtureOrderDocs(spark: SparkSession, dir: String): DataFrame =
    mixtureInterleave(Tables(spark, dir).documents, "doc_id", "source",
      mixtureStrides, seed = 11L, draw = Some(md5Unit(col("doc_id"), 11L)))
      .orderBy(col("global_pos"))

  /** C15c: token-budget mixture PLANNING under an epoch cap — the
    * allocation step BEFORE the mixing family decides per-row fates
    * ([[mixCorpora]] keeps rows at a rate, [[temperatureSample]]
    * flattens, [[mixtureInterleave]] orders; THIS computes how many
    * tokens each source may contribute in the first place). Given
    * per-source target weights, a total training-token budget, and a
    * repetition ceiling (`epochCapPct`% of a source's tokens — 200 =
    * "repeat nothing more than twice", the data-constrained-scaling
    * hygiene rule of Muennighoff et al. 2023, arXiv:2305.16264), the
    * naive `w·B/W` share overshoots small sources, and the standard
    * answer is WATER-FILLING: capped sources take their capacity, and
    * the surplus redistributes to the rest in weight proportion.
    *
    * Sorted by capacity/weight ascending, the capped set is a PREFIX
    * (a source caps only if the water level at its position exceeds
    * its capacity, and the level only rises as earlier caps free
    * budget) — so one window pass finds it: cumulative-prefix cap
    * test, running-AND to mask past the first failure. The cap test
    * cross-multiplies longs (exact — no float boundary; fits while
    * `max(weight) · budget` < 2^63, i.e. comfortably past 10^14
    * tokens at weight 10^4), allocations floor-divide, and the epochs
    * report is exact integer basis points. Scale shape: one
    * aggregation to a #sources-row frame, then single-partition
    * windows over THAT (sources are dozens, never rows) — the plan
    * never re-touches the corpus.
    *
    * Sources absent from `weights` take no budget and are dropped
    * from the plan (the [[mixCorpora]] drop-unknown default).
    *
    * @return one row per weighted source: (source, n_docs, n_tokens,
    *         weight, capacity, alloc_tokens, capped, epochs_bp —
    *         allocated epochs in basis points, 10000 = one epoch) */
  def planMixture(docs: DataFrame, sourceCol: String, tokensCol: String,
                  weights: Map[String, Long], budgetTokens: Long,
                  epochCapPct: Long = 200L): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive, got $budgetTokens")
    require(epochCapPct > 0, s"epochCapPct must be positive, got $epochCapPct")
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      s"weights must be a nonempty positive map, got $weights")
    val wExpr = weights.toSeq.sortBy(_._1).foldLeft(lit(0L)) {
      case (acc, (s, wgt)) => when(col("source") === s, lit(wgt)).otherwise(acc)
    }
    val W = org.apache.spark.sql.expressions.Window
    // constant partition key (round-17 nit): these windows run over
    // the #sources-row aggregate — never the corpus — and the
    // empty-spec form logs a WindowExec single-partition warning per
    // execution, hundreds per bench run, burying any REAL
    // single-partition regression; lit(0) is the same one-partition
    // plan with quiet logs
    val wOrd = W.partitionBy(lit(0)).orderBy(col("_ratio"), col("source"))
    val wPrev = wOrd.rowsBetween(W.unboundedPreceding, -1)
    val wRun = wOrd.rowsBetween(W.unboundedPreceding, W.currentRow)
    val wAll = W.partitionBy(lit(0))
      .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    docs
      .select(col(sourceCol).as("source"), col(tokensCol).cast("long").as("_tk"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("_tk")).as("n_tokens"))
      .withColumn("weight", wExpr)
      .filter(col("weight") > 0)
      .withColumn("capacity",
        expr(s"CAST((n_tokens * $epochCapPct) DIV 100 AS BIGINT)"))
      .withColumn("_ratio", col("capacity").cast("double") / col("weight"))
      .withColumn("_csum_prev", coalesce(sum(col("capacity")).over(wPrev), lit(0L)))
      .withColumn("_wsum_prev", coalesce(sum(col("weight")).over(wPrev), lit(0L)))
      .withColumn("_wtot", sum(col("weight")).over(wAll))
      .withColumn("_f",
        (col("capacity") * (col("_wtot") - col("_wsum_prev")) <=
          col("weight") * (lit(budgetTokens) - col("_csum_prev"))).cast("int"))
      .withColumn("capped", min(col("_f")).over(wRun) === 1)
      .withColumn("_b_rem", lit(budgetTokens) -
        coalesce(sum(when(col("capped"), col("capacity"))).over(wAll), lit(0L)))
      .withColumn("_w_rem",
        coalesce(sum(when(!col("capped"), col("weight"))).over(wAll), lit(0L)))
      .withColumn("alloc_tokens", when(col("capped"), col("capacity"))
        .otherwise(expr(
          "CAST((weight * _b_rem) DIV greatest(_w_rem, CAST(1 AS BIGINT)) AS BIGINT)")))
      .withColumn("epochs_bp",
        expr("CAST((alloc_tokens * 10000) DIV n_tokens AS BIGINT)"))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("weight"),
        col("capacity"), col("alloc_tokens"), col("capped"), col("epochs_bp"))
  }

  /** The q158 planted weight table — src0 is the deliberately
    * over-weighted "tiny high-quality source" (weight 50: wiki-like),
    * the rest cycle 1..7; the oracle's CASE chain is GENERATED from
    * this map (the q104 shared-constant convention). With the budget
    * pinned at 9/5 of the corpus (below the 2-epoch total capacity),
    * src0 always caps and at least one source never does — both
    * verdict paths fire at every SF. */
  val mixturePlanWeights: Map[String, Long] =
    (0 to 19).map(i => s"src$i" -> (if (i == 0) 50L else (i % 7) + 1L)).toMap

  /** C15c `q158_mixture_plan` — [[planMixture]] over the documents
    * table, n_chars as the token-cost column, budget = 90% of the
    * 2-epoch capacity (9/5 of corpus tokens, scale-free), weights
    * from [[mixturePlanWeights]]. The oracle replays grouping, the
    * ratio sort, the prefix cap test, the running AND and both
    * divisions — all integer-exact. */
  def mixturePlanDocs(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    val total = d.agg(sum(col("n_chars").cast("long"))).first().getLong(0)
    planMixture(d, "source", "n_chars", mixturePlanWeights,
      budgetTokens = total * 9L / 5L)
      .transform(d => Perf.sortedOnce(d, col("source")))
  }

  /** C15d: EXECUTE a mixture plan — materialize [[planMixture]]'s
    * per-source allocations as the deterministic training multiset
    * the loader reads: every doc of a planned source emits
    * `epochs_bp DIV 10000` whole copies plus one more iff its
    * portable coin lands under the fractional remainder
    * (`epochs_bp % 10000` basis points) — the [[expandEpochs]]
    * mechanics with the epoch target JOINED from the plan instead of
    * a constant map. The plan is a #sources-row frame, so the join
    * broadcasts and execution stays one map-side pass over the corpus
    * (filter + explode, no shuffle); per source the realized token
    * count matches the allocation in expectation at basis-point
    * resolution, row-deterministically (same inputs + seed ⇒ the same
    * multiset on any cluster). Sources absent from the plan drop —
    * the plan IS the mix ([[mixCorpora]]'s drop-unknown default). */
  def executeMixturePlan(docs: DataFrame, plan: DataFrame,
                         idCol: String = "doc_id",
                         sourceCol: String = "source",
                         seed: Long = 0L,
                         draw: Option[Column] = None): DataFrame = {
    require(plan.columns.contains("epochs_bp"),
      "plan must carry epochs_bp — build it with planMixture")
    val p = broadcast(plan.select(col("source").as("_plan_source"),
      col("epochs_bp")))
    val extra = when(
      draw.getOrElse(hashUnit(col(idCol), seed)) <
        (col("epochs_bp") % 10000L).cast("double") / lit(10000.0), 1L)
      .otherwise(0L)
    docs.join(p, col(sourceCol) === col("_plan_source"))
      .withColumn("_n", expr("CAST(epochs_bp DIV 10000 AS BIGINT)") + extra)
      .filter(col("_n") > 0)
      .withColumn("epoch", explode(sequence(lit(0L), col("_n") - 1)))
      .drop("_n", "_plan_source", "epochs_bp")
  }

  /** C15d `q159_mixture_execute` — [[planMixture]] ∘
    * [[executeMixturePlan]] over the q158 plant: the whole
    * plan-then-materialize chain, portable [[md5Unit]] coin, epoch
    * tags per copy. The oracle replays the q158 CTEs and the
    * expansion position-for-position. */
  def mixturePlanExecuteDocs(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    val total = d.agg(sum(col("n_chars").cast("long"))).first().getLong(0)
    val plan = planMixture(d, "source", "n_chars", mixturePlanWeights,
      budgetTokens = total * 9L / 5L)
    executeMixturePlan(d, plan, seed = 19L,
      draw = Some(md5Unit(col("doc_id"), 19L)))
      .select(col("doc_id"), col("source"), col("epoch"))
      .transform(d => Perf.sortedOnce(d, col("doc_id"), col("epoch")))
  }

  /** C15e: interleave a training MULTISET by its REALIZED per-source
    * counts — the link that closes the mixture loop plan → execute →
    * order: [[mixtureInterleave]] takes a STATIC stride map, but the
    * proportions a loader must see are the ones [[planMixture]]
    * actually allocated and [[executeMixturePlan]] actually
    * materialized (whole copies plus the fractional coin move realized
    * counts off any static table). Deriving the stride from the
    * multiset itself — stride_s = T / n_s — makes the consumed order
    * reflect the BUDGETED mix by construction.
    *
    * Exactness: instead of a float stride, copy k of source s sorts by
    * the integer key ((2k−1)·2³²) DIV (2·n_s) — the normalized
    * position (k−½)/n_s on a 2³² grid in exact long arithmetic (no
    * float boundary anywhere; n_s < 2²⁹ keeps the numerator under
    * 2⁶²), ties broken by (source, id, epoch) into a total order.
    * Every prefix of length P then holds ≈ P·n_s/T rows of source s —
    * proportions hold at every training step, not just in aggregate.
    *
    * Scale shape: the per-source count and rank share ONE window
    * partitioning (the source exchange), then the single intended
    * range exchange (global key sort) with `zipWithIndex` for the
    * ordinal — [[mixtureInterleave]]'s shape, nothing corpus-wide
    * beyond it. */
  def mixtureInterleaveRealized(multiset: DataFrame, idCol: String,
                                sourceCol: String, epochCol: String,
                                seed: Long = 0L,
                                draw: Option[Column] = None): DataFrame = {
    val u = draw.getOrElse(
      hashUnit(concat_ws("#", col(idCol), col(epochCol)), seed))
    val W = org.apache.spark.sql.expressions.Window
    val wSrc = W.partitionBy(col(sourceCol))
    val wRank = wSrc.orderBy(u.asc, col(idCol).asc, col(epochCol).asc)
    val sorted = multiset.select(col(idCol), col(sourceCol), col(epochCol))
      .withColumn("src_rank", row_number().over(wRank).cast("long"))
      .withColumn("_n_src", count(lit(1)).over(wSrc))
      // the 2^32-grid numerator (2·n_s−1)·2^32 stays under 2^62 only
      // while n_s < 2^29 — past that the long key would overflow and
      // silently corrupt the global order, so refuse loudly in-plan
      // (the pair-budget-guard convention)
      .withColumn("pos_key",
        when(col("_n_src") >= lit(1L << 29), raise_error(concat(
          lit("mixtureInterleaveRealized: source "), col(sourceCol),
          lit(" has "), col("_n_src").cast("string"),
          lit(" multiset rows >= 2^29 - the 2^32-grid integer key would " +
            "overflow; split the source or coarsen the grid")))
          .cast("long"))
        .otherwise(expr(
          "CAST(((2 * src_rank - 1) * 4294967296) DIV (2 * _n_src) AS BIGINT)")))
      .orderBy(col("pos_key"), col(sourceCol), col(idCol), col(epochCol))
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+ org.apache.spark.sql.types.StructField(
        "global_pos", org.apache.spark.sql.types.LongType, nullable = false))
    val rows = sorted.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
    }
    multiset.sparkSession.createDataFrame(rows, schema)
      .select(col("global_pos"), col(idCol), col(sourceCol), col(epochCol),
        col("src_rank"))
  }

  /** C15e `q165_mixture_interleaved` — the mixture loop COMPOSED end to
    * end: the q158 plan (water-filling under the epoch cap) → the q159
    * multiset (whole copies + basis-point coin) → the interleaved
    * training order a loader would actually consume, with strides
    * derived from the REALIZED counts. Portable md5 draws at both
    * random steps, so the entire chain — allocation, expansion,
    * within-source shuffle, integer stride keys, global merge —
    * replays in DuckDB position-for-position. */
  def mixtureTrainingOrderDocs(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    val total = d.agg(sum(col("n_chars").cast("long"))).first().getLong(0)
    val plan = planMixture(d, "source", "n_chars", mixturePlanWeights,
      budgetTokens = total * 9L / 5L)
    val multiset = executeMixturePlan(d, plan, seed = 19L,
      draw = Some(md5Unit(col("doc_id"), 19L)))
      .select(col("doc_id"), col("source"), col("epoch"))
    mixtureInterleaveRealized(multiset, "doc_id", "source", "epoch",
      draw = Some(md5Unit(concat_ws("#", col("doc_id"), col("epoch")), 23L)))
      .transform(d => Perf.sortedOnce(d, col("global_pos")))
  }

  /** C15 `q73_weighted_sample` — [[sampleByWeight]] with the portable
    * draw: longer documents are proportionally likelier to survive and
    * docs past 400 chars saturate at certain keep (the clamp leg). */
  def weightedSampleDocs(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    sampleByWeight(d, "doc_id", "n_chars", scale = 1.0 / 400.0, seed = 11L,
      draw = Some(md5Unit(col("doc_id"), 11L)))
      .select(col("doc_id"), col("source"), col("n_chars"))
      .transform(d => Perf.sortedOnce(d, col("doc_id")))
  }

  /** Sequence-PACKING layout (`q45_token_packing`): assign documents to
    * fixed-token-budget chunks — the step that turns a filtered corpus
    * into training-sequence bins. Documents route to `shards`
    * deterministic shards (`id mod shards` — uniform for synthetic ids;
    * route through [[seededHash]] upstream for clustered ids) and pack
    * greedily in id order within each shard: chunk = ⌊cumBefore /
    * budget⌋, where cumBefore is the running token total BEFORE the
    * document. Boundary semantics, precisely: a document whose
    * cumBefore is still inside the current chunk STAYS in it, so a
    * chunk can exceed the budget by up to one document (and a single
    * document longer than the budget owns however much it needs) —
    * the right contract when the tokenizer-side consumer truncates or
    * splits at sequence-assembly time. If the budget is a HARD cap,
    * filter `n_tokens > budget` docs first and treat the final doc of
    * each chunk as the split point.
    *
    * Scale shape: ONE window per shard (the partition-by bounds the
    * sort — no global ordering ever materializes); `shards` sets the
    * parallelism. Every function is ANSI-expressible, so the driver
    * hash-checks this operator against DuckDB.
    */
  def packByTokenBudget(df: DataFrame, idCol: String, tokensCol: String,
                        budget: Long, shards: Int = 32): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(shards > 0, s"shards must be positive, got $shards")
    // ROWS frame, not the default RANGE: with duplicate idCol values the
    // RANGE frame would include all peers' tokens in each peer's
    // cum_tokens, so the cumBefore subtraction below would misassign
    // chunks and overshoot the budget-plus-one-document bound. ROWS
    // keeps results identical for unique ids and per-row-consistent
    // (under some tie order) for duplicates.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    df.withColumn("shard", pmod(col(idCol), lit(shards)).cast("int"))
      .withColumn("cum_tokens", sum(col(tokensCol)).over(w))
      .withColumn("chunk",
        floor((col("cum_tokens") - col(tokensCol)).cast("double") / budget).cast("long"))
  }

  /** C48: SEQUENCE ASSEMBLY — turn the q45 packing into the artifact a
    * training loader actually mmaps: one row per packed sequence with
    * its member documents IN ORDER and their token OFFSETS (the
    * boundary metadata attention masking / document-causal masking
    * needs — a packed file without offsets cannot rebuild example
    * boundaries). `offsets(i)` is the exclusive prefix sum of member
    * token counts: where document i starts inside the sequence.
    *
    * Offsets derive from the packer's own cum_tokens via one window
    * min per (shard, chunk) — plain integer arithmetic both engines
    * reproduce — and the member lists aggregate in doc order.
    * Scale shape: the packing window (per-shard) plus one grouped
    * aggregation to |sequences| rows; nothing corpus-wide. */
  def assembleSequences(df: DataFrame, idCol: String, tokensCol: String,
                        budget: Long, shards: Int = 32): DataFrame = {
    val packed = packByTokenBudget(df, idCol, tokensCol, budget, shards)
    val start = col("cum_tokens") - col(tokensCol)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard"), col("chunk"))
    packed
      .withColumn("_off", start - min(start).over(w))
      .groupBy(col("shard"), col("chunk"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col(tokensCol)).as("total_tokens"),
        sort_array(collect_list(struct(col(idCol).as("i"), col("_off").as("o"))))
          .as("_d"))
      .withColumn("doc_ids",
        array_join(transform(col("_d"), s => s.getField("i")), ","))
      .withColumn("offsets",
        array_join(transform(col("_d"), s => s.getField("o")), ","))
      .drop("_d")
  }

  /** C48 `q124_packed_sequences` — the assembly over the q45 packing
    * (whitespace token counts, budget 2048, 8 shards): member lists,
    * exclusive-prefix offsets, and per-sequence totals all hash-check
    * (lists ride comma-joined strings so both engines compare the
    * exact element order). */
  def packedSequencesDocs(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
      .select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
    assembleSequences(docs, "doc_id", "n_tokens", budget = 2048L, shards = 8)
      .transform(d => Perf.sortedOnce(d, col("shard"), col("chunk")))
  }

  /** Deterministic STRATIFIED sampling (`q54_stratified_sample`): the
    * first `n` rows per stratum in seeded-md5 order — "n docs per
    * language/source" for eval-set construction and per-slice audits.
    * Complements [[sampleByHash]]: hash-Bernoulli keeps a binomial
    * COUNT per stratum; this keeps EXACTLY n, and the md5-of-id draw
    * order is retry-stable (re-running a failed stage redraws the same
    * sample, unlike `rand()`), engine-reproducible (md5 of the decimal
    * id string is ANSI-expressible — the oracle hash-checks the exact
    * kept set), and seed-keyed (a different seed draws an independent
    * order).
    *
    * Scale shape: one shuffle on the stratum key; the window never
    * ranks more than one stratum per partition. For strata so large a
    * partition can't hold them, pre-thin with `hashUnit < oversampled
    * rate` first and rank the survivors — same contract. */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
                       n: Int, seed: Long): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol)).orderBy(col("_h"), col(idCol))
    df.withColumn("_h", md5(concat(col(idCol).cast("string"), lit(":" + seed))))
      .withColumn("draw_rank", row_number().over(w).cast("long"))
      .filter(col("draw_rank") <= n)
      .drop("_h")
  }

  /** `q54_stratified_sample` — 20 documents per language, seed 7. */
  def stratifiedDocSample(spark: SparkSession, dir: String,
                          n: Int = 20, seed: Long = 7L): DataFrame =
    stratifiedSample(
      graft.Tables(spark, dir).documents.select(col("doc_id"), col("lang")),
      "lang", "doc_id", n, seed)
      .select(col("lang"), col("draw_rank"), col("doc_id"))
      .orderBy(col("lang"), col("draw_rank"))

  /** Sliding-window CHUNKING (`q51_doc_chunks`): split each document
    * into fixed-token windows with overlap — the sequence-assembly step
    * that turns long documents into training examples (window = max
    * sequence length, stride < window keeps cross-boundary context).
    * Chunk starts are `0, stride, 2·stride, …` while the start lies
    * inside the document; the last chunk is truncated to the document
    * end (never padded, never dropped — the consumer decides). Emits
    * the chunk text itself plus (chunk_idx, tok_start, tok_len) so a
    * downstream tokenizer can map spans back to source offsets.
    *
    * Scale shape: map-only — one `split`, one `sequence`+`explode`, no
    * shuffle (the ORDER BY in the query entry is oracle-determinism
    * only). Chunk fan-out is ~n_tokens/stride rows per doc, linear in
    * corpus size. Every function is ANSI-expressible (DuckDB
    * `generate_series` + list slicing), so the layout is hash-checked
    * end to end, chunk text included. */
  def chunkByTokenWindow(df: DataFrame, idCol: String, textCol: String,
                         window: Int, stride: Int): DataFrame = {
    require(window > 0, s"window must be positive, got $window")
    require(stride > 0 && stride <= window,
      s"stride must be in (0, window=$window], got $stride")
    df.withColumn("_tk", split(trim(col(textCol)), "\\s+"))
      .withColumn("_n", size(col("_tk")).cast("long"))
      .withColumn("s", explode(sequence(lit(0L), col("_n") - 1L, lit(stride.toLong))))
      .select(
        col(idCol),
        (col("s") / stride).cast("long").as("chunk_idx"),
        col("s").as("tok_start"),
        least(lit(window.toLong), col("_n") - col("s")).as("tok_len"),
        concat_ws(" ", slice(col("_tk"), (col("s") + 1L).cast("int"),
          least(lit(window.toLong), col("_n") - col("s")).cast("int"))).as("chunk_text"))
  }

  /** `q51_doc_chunks` — chunk the documents table into 16-token windows
    * with stride 12 (4-token overlap); tiny window so the ~30-token
    * synthetic docs actually produce multi-chunk fan-out. */
  def docChunks(spark: SparkSession, dir: String,
                window: Int = 16, stride: Int = 12): DataFrame =
    chunkByTokenWindow(
      graft.Tables(spark, dir).documents.select(col("doc_id"), col("text")),
      "doc_id", "text", window, stride)
      .orderBy(col("doc_id"), col("tok_start"))

  /** `q45_token_packing` — pack the documents table into 2048-token
    * chunks across 8 shards; token counts use q29's whitespace formula
    * (shared with the oracle), so the whole layout is hash-checked. */
  def tokenPacking(spark: SparkSession, dir: String,
                   budget: Long = 2048, shards: Int = 8): DataFrame = {
    val docs = graft.Tables(spark, dir).documents
      .select(col("doc_id"), size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
    packByTokenBudget(docs, "doc_id", "n_tokens", budget, shards)
      .select(col("doc_id"), col("shard"), col("chunk"), col("n_tokens"), col("cum_tokens"))
      .transform(d => Perf.sortedOnce(d, col("doc_id")))
  }

  // ---- DSIR data selection (importance resampling) -------------------

  /** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
    * "Data Selection for Language Models via Importance Resampling",
    * arXiv:2302.03169 — public): pick the `k` documents from a big RAW
    * pool whose hashed-n-gram profile best matches a small TARGET
    * corpus, the distribution-matching upgrade of threshold quality
    * filters (C17's LM scores rank by fluency; DSIR ranks by
    * target-domain likeness, which is what "give me more data like my
    * curated set" actually asks for).
    *
    * The estimator is the paper's: token features hash into `buckets`
    * bins (the hashing trick — md5-derived so any engine replays it);
    * target and raw bucket distributions are Laplace-smoothed counts;
    * a document's log importance weight is Σ over its tokens of
    * log p̂_target(b) − log p̂_raw(b); selection is Gumbel-top-k over
    * the log weights (Gumbel noise + top-k ≡ sampling WITHOUT
    * replacement proportional to the importance weights — the paper's
    * resampling step, made retry-stable here by drawing the Gumbel
    * from a seeded md5 of the id, not an RNG).
    *
    * Exactness convention (the q93 ln-parity idiom): per-bucket log
    * ratios quantize to the 1e-8 grid and carry as exact longs, the
    * per-doc sum is an integer sum (merge-order-independent), and the
    * Gumbel term is itself a quantized long off a 52-bit exact uniform
    * — so the selected SET and its ranking replay bit-for-bit in any
    * engine with md5/ln, and the driver hash-checks all of it.
    *
    * Scale shape: the token stream is a map-side explode off the scan,
    * re-derived per pass rather than materialized (the q46 call — a
    * projection re-run is cheaper than persisting the token blowup at
    * 100 TB); the bucket-distribution table is ≤ `buckets` rows and
    * broadcast-joined back onto the token stream; per-doc weights are
    * one doc-keyed aggregation; the final top-k is a TakeOrdered, not
    * a corpus-wide sort. Nothing shuffles more than once and nothing
    * corpus-sized ever sits in one task.
    *
    * Returns the selected rows: (idCol, n_tokens, logweight, score,
    * rank) — logweight is the importance estimate itself (useful
    * beyond selection, e.g. as a mixing weight), score = logweight +
    * gumbel is the resampling key, rank ∈ [1, k].
    */
  def dsirSelect(docs: DataFrame, idCol: String, textCol: String,
                 isTarget: Column, k: Int, buckets: Int = 256,
                 seed: Long = 13L): DataFrame = {
    val model = dsirFit(docs, textCol, isTarget, buckets)
    dsirSelectWithModel(docs.filter(!isTarget), model, idCol, textCol, k, seed,
      bucketsHint = Some(buckets))
  }

  /** [[dsirSelect]]'s resampling step against an ALREADY-FIT model
    * (the ratio table [[dsirFit]] / [[dsirRatios]] emit) — the entry
    * point a day-2 merged model ([[mergeDsirModels]]) feeds. Same
    * Gumbel-top-k on the scaled-long grid; `bucketsHint` skips the
    * model count when the caller already knows it. */
  def dsirSelectWithModel(pool: DataFrame, model: DataFrame, idCol: String,
                          textCol: String, k: Int, seed: Long = 13L,
                          bucketsHint: Option[Int] = None): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val buckets = bucketsHint.getOrElse(model.count().toInt)
    require(buckets >= 2 && buckets <= (1 << 20),
      s"model must be a dense bucket table with [2, 2^20] rows, got $buckets")
    val scored = dsirWeigh(pool, idCol, textCol, model, buckets)
    // 52-bit exact uniform, centered off zero so ln(ln) never sees 0/1.
    val u = (conv(substring(md5(concat(col(idCol).cast("string"), lit(s":$seed"))), 1, 13), 16, 10)
      .cast("bigint").cast("double") + lit(0.5)) / lit(4503599627370496.0)
    scored
      .withColumn("_g", round(-log(-log(u)) * DsirScale).cast("long"))
      .withColumn("_s", col("_w") + col("_g"))
      .orderBy(col("_s").desc, col(idCol))
      .limit(k)
      .select(
        col(idCol), col("n_tokens"),
        (col("_w").cast("double") / DsirScale).as("logweight"),
        (col("_s").cast("double") / DsirScale).as("score"),
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("_s").desc, col(idCol))).cast("long").as("rank"))
      .transform(d => Perf.sortedOnce(d, col("rank")))
  }

  /** The shared 1e-8 quantization grid (the q93 ln-parity convention). */
  private val DsirScale = 100000000.0

  /** Feature bucket of a token: md5("dsir:"+tok) mod `buckets` — the
    * hashing-trick feature map, md5-derived so any engine replays it. */
  private def dsirBucket(tok: Column, buckets: Int): Column =
    pmod(conv(substring(md5(concat(lit("dsir:"), tok)), 1, 15), 16, 10)
      .cast("long"), lit(buckets.toLong))

  /** The doc → (bucketed token stream) fan-out shared by fit and
    * scoring — one tokenization convention for both, or day-2 weights
    * silently drift from the fit. */
  private def dsirToks(docs: DataFrame, textCol: String, buckets: Int): DataFrame =
    docs.withColumn("tok", explode(graft.functions.text.tokens(col(textCol))))
      .withColumn("_b", dsirBucket(col("tok"), buckets))
      .drop("tok")

  /** FIT the DSIR importance model: the per-bucket quantized log ratio
    * log p̂_target(b) − log p̂_raw(b), Laplace-smoothed. This table IS
    * the model — `buckets` rows of (bucket, scaled-long ratio), a tiny
    * persistable artifact (parquet it next to the corpus the way the
    * IVF centroid and postings artifacts persist), fit ONCE from the
    * target/raw pools and then applied to any number of later shards
    * or ingest days without touching the fit corpora again.
    *
    * The model is DENSE: every bucket in [0, buckets) has a row, with
    * never-observed buckets carrying the pure-Laplace ratio
    * ln((tr+m)/(tt+m)) — so day-2 documents whose tokens hash to
    * buckets the fit corpora never produced still score (an inner join
    * against a sparse table would silently DROP those tokens, skewing
    * weights toward zero exactly on the most out-of-distribution
    * text — the documents selection most needs to rank).
    *
    * All divisions are exact-integer-over-exact-integer doubles, so
    * both engines feed ln the same bits; the 1e-8 rounding absorbs ln
    * ulps (the q93 convention). */
  def dsirFit(docs: DataFrame, textCol: String, isTarget: Column,
              buckets: Int = 256): DataFrame =
    dsirRatios(dsirFitCounts(docs, textCol, isTarget, buckets),
      bucketsHint = Some(buckets))

  /** FIT the model in its COUNT form — the persistable, MERGEABLE
    * artifact (round 12): a dense (bucket, ct, cr) table of raw
    * target/raw token counts per feature bucket. Unlike the ratio form
    * (logs of normalized distributions — they do not add), counts are
    * associative under [[mergeDsirModels]]' exact long sums, so the
    * importance model grows day-2 the way every other persisted
    * artifact here does (the NB count frames, the census tables, the
    * sketch tables): fit each ingest batch alone, merge, derive ratios
    * at score time — merge-equals-refit bit for bit. Persist THIS
    * table; [[dsirRatios]] is a cheap derivation, not an artifact. */
  def dsirFitCounts(docs: DataFrame, textCol: String, isTarget: Column,
                    buckets: Int = 256): DataFrame = {
    require(buckets >= 2 && buckets <= (1 << 20),
      s"buckets must lie in [2, 2^20], got $buckets")
    val spark = docs.sparkSession
    val dist = dsirToks(docs.withColumn("_t", isTarget), textCol, buckets)
      .groupBy(col("_b")).agg(
        sum(when(col("_t"), 1L).otherwise(0L)).as("ct"),
        sum(when(col("_t"), 0L).otherwise(1L)).as("cr"))
    spark.range(buckets).select(col("id").as("bucket"))
      .join(dist.withColumnRenamed("_b", "bucket"), Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("ct"), lit(0L)).as("ct"),
        coalesce(col("cr"), lit(0L)).as("cr"))
  }

  /** Merge two count-form models ([[dsirFitCounts]]) over DISJOINT
    * corpora: exact long adds per bucket (the
    * [[Classify.mergeNbModels]] convention), so deriving ratios from
    * the merged counts equals a from-scratch refit over the union —
    * bit-exact, the q128 oracle contract. Both models must share the
    * bucket count (they are dense by construction; a mismatch means
    * they were fit under different feature maps and cannot merge) —
    * checked IN-PLAN: dense spines over the same [0, buckets) range
    * put every bucket in BOTH models, so any bucket appearing once
    * fails loudly during the merge itself, with zero extra actions
    * (a driver-side count() guard would re-execute both fit subtrees
    * when the models aren't materialized yet). */
  def mergeDsirModels(a: DataFrame, b: DataFrame): DataFrame = {
    val expect = Seq("bucket", "ct", "cr")
    Seq(a, b).foreach { m =>
      require(m.columns.toSeq == expect,
        s"mergeDsirModels takes count-form models (bucket, ct, cr), got ${m.columns.toSeq}")
    }
    // BOTH count columns carry the guard: Catalyst prunes unread
    // columns, so a single guarded column would let a consumer that
    // reads only the other one (or only `bucket`) skip the check.
    // Every USE of a merged model reads ct or cr (ratio derivation
    // reads both), so the guard fires on first real consumption; a
    // pure row-count probe of a mismatched merge is the one surface
    // that can still pass, and it cannot leak corrupted counts.
    def guarded(c: Column): Column =
      when(col("_n") =!= 2, raise_error(concat(
        lit("mergeDsirModels: bucket "), col("bucket").cast("string"),
        lit(" present in only one model — the models were fit under different " +
          "feature maps (bucket counts differ) and cannot merge"))))
        .otherwise(c)
    a.unionByName(b).groupBy(col("bucket"))
      .agg(sum(col("ct")).as("ct"), sum(col("cr")).as("cr"),
        count(lit(1)).as("_n"))
      .select(col("bucket"), guarded(col("ct")).as("ct"), guarded(col("cr")).as("cr"))
  }

  /** Derive the scoring RATIO table from a count-form model: the
    * per-bucket quantized Laplace-smoothed log ratio
    * log p̂_target(b) − log p̂_raw(b). All divisions are
    * exact-integer-over-exact-integer doubles, so both engines feed ln
    * the same bits; the 1e-8 rounding absorbs ln ulps (the q93
    * convention). The model is DENSE, so day-2 documents whose tokens
    * hash to fit-unseen buckets still score through the pure-Laplace
    * fallback instead of silently dropping from the join. */
  def dsirRatios(counts: DataFrame, bucketsHint: Option[Int] = None): DataFrame = {
    val buckets = bucketsHint.getOrElse(counts.count().toInt)
    require(buckets >= 2 && buckets <= (1 << 20),
      s"count-form model must be a dense bucket table with [2, 2^20] rows, got $buckets")
    val tot = broadcast(counts.agg(sum(col("ct")).as("tt"), sum(col("cr")).as("tr")))
    counts.crossJoin(tot).select(
      col("bucket"),
      round((log((col("ct") + 1).cast("double") / (col("tt") + buckets).cast("double"))
           - log((col("cr") + 1).cast("double") / (col("tr") + buckets).cast("double")))
        * DsirScale).cast("long").as("log_ratio_e8"))
  }

  /** Internal scorer: (idCol, n_tokens, _w) with `_w` the scaled-long
    * log weight — kept on the integer grid so [[dsirSelect]] can add
    * the Gumbel term exactly. */
  private def dsirWeigh(docs: DataFrame, idCol: String, textCol: String,
                        model: DataFrame, buckets: Int): DataFrame =
    dsirToks(docs.select(col(idCol), col(textCol)), textCol, buckets)
      .join(broadcast(model.select(col("bucket").as("_b"), col("log_ratio_e8"))),
        Seq("_b"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("log_ratio_e8")).as("_w"))

  /** DAY-2 scoring — apply a persisted [[dsirFit]] model to NEW
    * documents (the next crawl shard, the next ingest day) with ZERO
    * fit-corpus work: the model broadcast-joins onto the new batch's
    * token stream, so the plan is one map-side explode + one doc-keyed
    * aggregation regardless of how big the original fit corpora were.
    * `buckets` is read off the model itself (it is dense by
    * construction), so a fit/score bucket-count mismatch cannot happen
    * silently.
    *
    * Returns (idCol, n_tokens, logweight) — rank, threshold, or
    * Gumbel-sample downstream; the weights land on the same 1e-8 grid
    * as the fit-time pipeline, so day-2 scores are exactly comparable
    * with day-1 scores (spec-pinned). */
  def dsirScoreAgainstModel(newDocs: DataFrame, model: DataFrame,
                            idCol: String, textCol: String): DataFrame = {
    val buckets = model.count().toInt
    require(buckets >= 2 && buckets <= (1 << 20),
      s"model must be a dense bucket table with [2, 2^20] rows, got $buckets")
    dsirWeigh(newDocs, idCol, textCol, model, buckets)
      .select(col(idCol), col("n_tokens"),
        (col("_w").cast("double") / DsirScale).as("logweight"))
  }

  /** `q101_dsir_selection` — [[dsirSelect]] over the documents table:
    * src0 plays the curated target corpus, the other 19 sources the
    * raw pool; pick the 100 pool documents whose hashed-unigram
    * profile is most src0-like (Gumbel-top-k, seed 13, 256 buckets).
    * The window in the final ranking is over k rows (post-limit), not
    * the corpus. */
  def dsirSelectDocs(spark: SparkSession, dir: String,
                     targetSource: String = "src0", k: Int = 100): DataFrame =
    dsirSelect(Tables(spark, dir).documents, "doc_id", "text",
      col("source") === targetSource, k)

  /** `q128_dsir_incremental` — the day-2 GROWTH path (the q112 NB
    * pattern at the DSIR tier): the corpus arrives as two ingest
    * batches (odd/even doc_id halves), each fitted ALONE in count form,
    * merged with [[mergeDsirModels]] (exact long adds), ratios derived
    * from the merged counts, and the q101 Gumbel-top-k selection run
    * against that merged model. The oracle is q101's full-corpus
    * reformulation VERBATIM — merge-equals-refit is the contract,
    * bit-exact because counts sum as longs before any log is taken. */
  def dsirIncrementalDocs(spark: SparkSession, dir: String,
                          targetSource: String = "src0", k: Int = 100): DataFrame = {
    val docs = Tables(spark, dir).documents
    val isTarget = col("source") === targetSource
    // localCheckpoint stands in for the persisted parquet artifact a
    // production ingest writes per batch (256 rows each): the merged
    // model is read twice downstream (ratio derivation totals + the
    // scoring broadcast), so the tiny materialized tables replace
    // re-running the corpus fit scans
    val half0 = dsirFitCounts(docs.filter(col("doc_id") % 2 === 0), "text", isTarget)
      .localCheckpoint()
    val half1 = dsirFitCounts(docs.filter(col("doc_id") % 2 === 1), "text", isTarget)
      .localCheckpoint()
    val model = dsirRatios(mergeDsirModels(half0, half1), bucketsHint = Some(256))
    dsirSelectWithModel(docs.filter(!isTarget), model, "doc_id", "text", k,
      bucketsHint = Some(256))
  }
}

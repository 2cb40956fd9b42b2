package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The SCHEDULABLE corpus-maintenance pass (round 16) — the index
  * maintenance trilogy composed as the ONE job a deployment actually
  * schedules. Three independent decay modes accumulate under streaming
  * ingest, each with its own certified meter-then-heal operator:
  *
  *  - bucket FRAGMENTATION (every streaming append adds a file per
  *    bucket per trigger) — E6 [[graft.sources.Bucketing.compactBucketed]];
  *  - grid DRIFT (appends clamp out-of-range rows into ever-fatter
  *    z-order edge buckets) — E8b [[graft.sources.Layout.maintainZOrdered]];
  *  - quantizer SKEW (appends never re-fit, so a shifting distribution
  *    piles vectors into fat IVF cells until the O(|cell|²) guards
  *    trip) — C7i [[Similarity.rebalanceIvfIndexDir]].
  *
  * Each member meters first and heals only past its budget, so the
  * composed pass inherits the no-op contract: on a healthy corpus it
  * reads three cheap censuses and writes NOTHING — schedule it hourly
  * and it costs what the meters cost. Heals are independent (an index
  * never feeds another member's meter), so one pass is exactly the
  * three passes in sequence; per-artifact failures are NOT caught —
  * a maintenance job that silently skips a sick index is how sick
  * indexes become outages.
  */
object Maintain {

  /** What one pass healed — empty everywhere = the no-op tick.
    * `refreshRecommended` is a RECOMMENDATION, not a heal (the heal is
    * [[Pipeline.masterRefresh]], scheduled by the operator), so it
    * does not count toward [[healedAnything]]. */
  final case class MaintainReport(compacted: Seq[String],
                                  regridded: Seq[String],
                                  rebalanced: Seq[String],
                                  bundleHeals: Seq[String] = Nil,
                                  refreshRecommended: Seq[String] = Nil) {
    def healedAnything: Boolean =
      compacted.nonEmpty || regridded.nonEmpty || rebalanced.nonEmpty ||
        bundleHeals.nonEmpty
  }

  /** One meter-then-heal pass over a corpus home.
    *
    * @param bucketedTables catalog names of h-bucketed index tables
    *                       (the D2 ingest streams' postings/fingerprint
    *                       tables) — compacted past
    *                       `targetFilesPerBucket` files per bucket
    * @param layoutDirs     z-ordered layout directories — re-gridded
    *                       past `driftBudgetBp` basis points of clamp
    * @param ivfDirs        IVF index homes (`assigned/` + `centroids/`)
    *                       — rebalanced when any cell exceeds
    *                       `maxCellSize`
    * @param refreshChecks  (poolDir, planDir) pairs — the encoded train
    *                       pool vs its persisted mixture plan; pools
    *                       grown past the growth budget (or carrying a
    *                       source the plan never saw) come back in
    *                       [[MaintainReport.refreshRecommended]]
    *                       (round 18 — report-only, see
    *                       [[refreshRecommended]])
    * @return which artifacts healed, by name */
  def maintainCorpus(spark: SparkSession,
                     bucketedTables: Seq[String] = Nil,
                     layoutDirs: Seq[String] = Nil,
                     ivfDirs: Seq[String] = Nil,
                     masterBundleDirs: Seq[String] = Nil,
                     refreshChecks: Seq[(String, String)] = Nil,
                     targetFilesPerBucket: Int = 1,
                     driftBudgetBp: Long = 100L,
                     maxCellSize: Long = 10000L,
                     targetCellSize: Int = 125,
                     refreshGrowthBudgetBp: Long = 500L): MaintainReport =
    MaintainReport(
      bucketedTables.filter(t =>
        graft.sources.Bucketing.compactBucketed(spark, t, targetFilesPerBucket)),
      layoutDirs.filter(d =>
        graft.sources.Layout.maintainZOrdered(spark, d, driftBudgetBp)),
      ivfDirs.filter(d =>
        Similarity.rebalanceIvfIndexDir(spark, d, maxCellSize, targetCellSize)),
      masterBundleDirs.flatMap(d =>
        maintainMasterBundle(spark, d,
          targetFilesPerBucket = targetFilesPerBucket).map(m => s"$d:$m")),
      refreshChecks.collect {
        case (poolDir, planDir) if refreshRecommended(spark,
          spark.read.parquet(poolDir), spark.read.parquet(planDir),
          growthBudgetBp = refreshGrowthBudgetBp) => poolDir
      })

  /** E9b (round 18, verdict item 7): the REFRESH-CADENCE meter.
    * [[Pipeline.masterRefresh]] is certified (C51c); WHEN to run it was
    * operational prose. This compares the training pool's CURRENT
    * per-source token mass against the totals the persisted mixture
    * plan recorded at plan time ([[Sharding.planMixture]]'s `n_tokens`
    * column) — ONE aggregation over the pool to a #sources-row frame,
    * one tiny plan read, never the corpus twice — and recommends a
    * refresh when the pool grew past `growthBudgetBp` basis points of
    * the planned mass, or when a source the plan never saw appears (a
    * stale plan allocates a new source nothing). Pass the same
    * weighted pool the plan was computed over: [[Sharding.planMixture]]
    * drops unweighted sources from the plan, so an unweighted source in
    * `pool` would read as "new" here.
    *
    * Report-only by design: the heal is a re-plan + re-pack
    * ([[Pipeline.masterRefresh]]), which rewrites the TRAINING ORDER a
    * downstream consumer may be mid-epoch on — that decision belongs
    * to the operator's schedule, not a maintenance tick. A fresh plan
    * no-ops (MaintainSpec pins both directions).
    *
    * @return true = the pool outgrew its plan, refresh recommended */
  def refreshRecommended(spark: SparkSession, pool: DataFrame,
                         plan: DataFrame,
                         sourceCol: String = "source",
                         tokensCol: String = "n_tokens",
                         growthBudgetBp: Long = 500L): Boolean = {
    require(growthBudgetBp >= 0,
      s"growthBudgetBp must be >= 0, got $growthBudgetBp")
    // one derivation: the boolean aggregates the REPORT, restricted to
    // pool-present rows (a plan-only source — one that vanished from
    // the pool — is a mixture-shape change the next refresh handles,
    // but it contributes nothing to the growth arithmetic)
    val row = refreshMeterReport(pool, plan, sourceCol, tokensCol)
      .agg(
        coalesce(sum(when(col("in_pool") && col("is_new"), 1L)
          .otherwise(0L)), lit(0L)).as("new_sources"),
        coalesce(sum(when(col("in_pool"), col("cur_tokens"))
          .otherwise(0L)), lit(0L)).as("cur"),
        coalesce(sum(when(col("in_pool"), col("plan_tokens"))
          .otherwise(0L)), lit(0L)).as("planned"))
      .first()
    val (newSources, cur, planned) =
      (row.getLong(0), row.getLong(1), row.getLong(2))
    if (newSources > 0) true
    else if (planned == 0) cur > 0
    else cur > planned && (cur - planned) * 10000L / planned > growthBudgetBp
  }

  /** E9b's REPORT form — the per-source meter [[refreshRecommended]]'s
    * boolean aggregates, registered as `q180_refresh_meter`: one row
    * per source present in the pool OR the plan, with the plan-time
    * and current token masses, the new-source / vanished-source flags
    * and the integer-exact growth in basis points (−1 where growth is
    * undefined: a source the plan never saw, or one the pool no longer
    * carries). This is what a production dashboard actually renders
    * next to the refresh recommendation.
    *
    * @return (source, is_new, in_pool, plan_tokens, cur_tokens,
    *         growth_bp), ordered by source */
  def refreshMeterReport(pool: DataFrame, plan: DataFrame,
                         sourceCol: String = "source",
                         tokensCol: String = "n_tokens"): DataFrame =
    pool
      .select(col(sourceCol).as("source"), col(tokensCol).cast("long").as("_tk"))
      .groupBy(col("source")).agg(sum(col("_tk")).as("_cur"))
      .join(plan.select(col("source"), col("n_tokens").as("_plan")),
        Seq("source"), "full_outer")
      .select(col("source"),
        col("_plan").isNull.as("is_new"),
        col("_cur").isNotNull.as("in_pool"),
        coalesce(col("_plan"), lit(0L)).as("plan_tokens"),
        coalesce(col("_cur"), lit(0L)).as("cur_tokens"))
      .withColumn("growth_bp",
        when(col("is_new") || !col("in_pool"), lit(-1L))
          .otherwise(expr("CAST(greatest(cur_tokens - plan_tokens, 0) * 10000 " +
            "DIV greatest(plan_tokens, 1) AS BIGINT)")))
      .orderBy(col("source"))

  /** E9b `q180_refresh_meter` — [[refreshMeterReport]] over a planted
    * two-day shape: the plan is the q158 water-fill over the DAY-1
    * pool (doc_id % 10 ≠ 7, n_chars as the token cost, the q158
    * weights and 9/5 budget); the CURRENT pool is the full corpus with
    * source src13 REMAPPED to src_day2 — so every original source grew
    * by its held-back slice (growth_bp > 0), src_day2 is plan-unseen
    * (is_new, the allocation a stale plan gives it is zero), and src13
    * vanished from the pool (in_pool = false) — every verdict path
    * fires at every SF. The DuckDB oracle replays the day-1 water-fill
    * (the q158 CTE chain over the subset) and the full-outer meter
    * arithmetic, integer-exact. */
  def refreshMeterDocs(spark: SparkSession, dir: String): DataFrame = {
    val d = graft.Tables(spark, dir).documents
    val day1 = d.filter(col("doc_id") % 10 =!= 7)
    val budget = day1.agg(sum(col("n_chars").cast("long"))).first().getLong(0) * 9L / 5L
    val plan = Sharding.planMixture(day1, "source", "n_chars",
      Sharding.mixturePlanWeights, budgetTokens = budget)
    val pool = d.withColumn("source",
      when(col("source") === "src13", lit("src_day2")).otherwise(col("source")))
    refreshMeterReport(pool, plan, tokensCol = "n_chars")
  }

  // ---- the MASTER artifact bundle (round 17, verdict item 4):
  // the five day-2 probe indexes Pipeline.persistMasterArtifacts
  // writes had rebuild cadences only in prose — these are their
  // meter-then-heal members, same contract as the trilogy above.

  /** One meter-then-heal pass over a persisted
    * [[Pipeline.persistMasterArtifacts]] bundle. Three decay modes the
    * streaming master ingest (D2y) accumulates by design:
    *
    *  - winnow DF-HISTOGRAM staleness: `appendToWinnowIndex` grows the
    *    index but the suppression histogram freezes at build — stale
    *    only upward/open (the probes err open, never hide dups), but a
    *    stale histogram suppresses less, so probes slowly pay more.
    *    Meter: Σ df over the histogram vs the index's distinct
    *    (h, doc_id) mass — one aggregation each, exact (df can only
    *    grow, so equality ⇔ fresh). Heal: rebuild + staged swap; an
    *    ABSENT histogram (pre-round-17 bundle) heals into existence.
    *  - eval-gram FRAGMENTATION: every D2y micro-batch appends a file
    *    of new heldout grams. Meter: data-file census vs
    *    `evalGramTargetFiles`. Heal: distinct-rewrite + staged swap —
    *    bit-identical probes (the firewall reads distinct keys).
    *  - prefix VOCAB DRIFT: day-2 appends index new docs under the
    *    FROZEN gram order; fit-unseen grams sort with df 0 — FIRST,
    *    i.e. straight into every prefix — so drift makes prefixes
    *    wastefully hot (exactness never breaks; cost does). Meter:
    *    novel fraction of the postings' distinct gram keys, basis
    *    points vs `vocabDriftBudgetBp`. Heal: rebuild vocab + ordering
    *    + postings from the persisted grams table (the gram SETS are
    *    order-free, so the rebuild equals a from-text rebuild exactly)
    *    behind a redo-marker: the three staged dirs write completely,
    *    `prefix__SWAP` commits, the three renames install, the marker
    *    drops — a crash anywhere re-enters through the marker and
    *    finishes the installs, so the triple can never stay mixed.
    *
    * Heals are probe-preserving: verdicts before == verdicts after on
    * the same batch (MaintainSpec pins all three). On a healthy bundle
    * the pass reads three cheap censuses and writes NOTHING.
    *
    *  - bucket FRAGMENTATION of the BUNDLE's own members (round 18 —
    *    the layout moved to bucketed tables, so the trilogy's E6 duty
    *    applies here too): every D2y trigger appends one file per
    *    bucket to eval_grams / exact_index / url_index, and the
    *    zero-exchange probe property rides on the members staying
    *    bucketed. Meter: data-file census vs numBuckets ·
    *    `targetFilesPerBucket`. Heal: identical-rows rewrite THROUGH
    *    the bundle's bucket spec (≤1 file/bucket by construction)
    *    behind the staged swap.
    *
    * @return healed member names (subset of "winnow_hist",
    *         "eval_grams", "prefix_index", plus "<member>_files" for
    *         fragmentation rewrites); empty = the no-op tick */
  def maintainMasterBundle(spark: SparkSession, dir: String,
                           evalGramTargetFiles: Int = 8,
                           vocabDriftBudgetBp: Long = 100L,
                           targetFilesPerBucket: Int = 1): Seq[String] = {
    require(evalGramTargetFiles >= 1,
      s"evalGramTargetFiles must be >= 1, got $evalGramTargetFiles")
    require(vocabDriftBudgetBp >= 0,
      s"vocabDriftBudgetBp must be >= 0, got $vocabDriftBudgetBp")
    require(targetFilesPerBucket >= 1,
      s"targetFilesPerBucket must be >= 1, got $targetFilesPerBucket")
    val healed = scala.collection.mutable.ArrayBuffer.empty[String]
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    reclaimSwaps(spark, fs, dir)
    val buckets = Pipeline.readBundleBuckets(spark, dir)
    def member(name: String) = Pipeline.bundleMember(spark, dir, name)
    def dataFiles(name: String): Int = {
      val p = new org.apache.hadoop.fs.Path(s"$dir/$name")
      if (!fs.exists(p)) 0
      else fs.listStatus(p)
        .count(s => s.isFile && !s.getPath.getName.startsWith("_"))
    }
    // 1. winnow df histogram. The freshness meter reads the PERSISTED
    // mass censuses (r20 — the r18 item-4 close-out): the index's
    // distinct (h, doc_id) mass is written at bundle build and bumped
    // on every append through the one append door
    // ([[Pipeline.appendBundleMember]]), and the histogram's own Σ df
    // is written whenever the histogram is (re)derived — so a healthy
    // tick compares two stored longs instead of re-aggregating the
    // full index per tick (O(index) at 100×, measured as the tick's
    // dominant term). A bundle missing either census (legacy) falls
    // back to the full aggregations ONCE and heals the censuses into
    // existence. The heal itself re-derives both values exactly.
    // census-backed meters apply ONLY to STAMPED (bucketed) bundles:
    // there the one append door ([[Pipeline.appendBundleMember]]) bumps
    // the censuses, so the stored values track every in-contract write.
    // A LEGACY plain bundle may be grown by raw parquet appends the
    // door never sees — its meters keep MEASURING (the pre-r20
    // behavior), never trusting a census a writer could have bypassed.
    val censusBacked = buckets.isDefined
    val idx = member("winnow_index")
    val trueMass = (if (censusBacked)
      Dedup.readEvalGramCensus(spark, s"$dir/winnow_index") else None)
      .getOrElse(idx.select(col("h"), col("doc_id")).distinct().count())
    val histExists = fs.exists(new org.apache.hadoop.fs.Path(s"$dir/winnow_hist"))
    val histMass =
      if (!histExists) -1L
      else (if (censusBacked)
        Dedup.readEvalGramCensus(spark, s"$dir/winnow_hist") else None)
        .getOrElse(member("winnow_hist")
          .agg(coalesce(sum(col("df")), lit(0L))).first().getLong(0))
    if (histMass != trueMass) {
      val fresh = Dedup.winnowDfHistogram(idx).localCheckpoint()
      swapMember(spark, fs, dir, "winnow_hist", fresh, buckets)
      if (censusBacked) {
        val exactMass = fresh.agg(coalesce(sum(col("df")), lit(0L)))
          .first().getLong(0)
        Dedup.writeEvalGramCensus(spark, s"$dir/winnow_index", exactMass)
        Dedup.writeEvalGramCensus(spark, s"$dir/winnow_hist", exactMass)
      }
      healed += "winnow_hist"
    }
    // 2. eval-gram compaction — distinct-rewrite (bit-identical probes:
    // the firewall reads distinct keys). On a bucketed bundle the file
    // budget is the bucket count × target (a fresh member already holds
    // one file per bucket), and the heal RESETS the persisted census to
    // the exact distinct count (the upper bound re-tightens here, the
    // one place the whole set is re-read anyway).
    val egBudget = buckets.fold(evalGramTargetFiles)(_ * targetFilesPerBucket)
    if (dataFiles("eval_grams") > egBudget) {
      val g = member("eval_grams").distinct().localCheckpoint()
      swapMember(spark, fs, dir, "eval_grams", g, buckets,
        plainWrite = df => p => df.coalesce(1).write.parquet(p))
      Dedup.writeEvalGramCensus(spark, s"$dir/eval_grams", g.count())
      healed += "eval_grams"
    }
    // 3. prefix vocab drift. The meter reads the PERSISTED census pair
    // (r20): total distinct postings-g at build (prefix_vocab census)
    // and the append-bumped novel-g bound (prefix_postings census) —
    // both maintained by the append door, both reset exactly by the
    // heal. The bound over-counts repeats across appends and the total
    // lags growth, so the estimated drift is an UPPER bound: the heal
    // can only fire early (and resets everything exactly), never miss
    // real drift. Legacy bundles without the pair measure once and
    // heal the censuses into existence.
    val postings = member("prefix_postings")
    val vocab = member("prefix_vocab")
    val storedTotal = if (censusBacked)
      Dedup.readEvalGramCensus(spark, s"$dir/prefix_vocab") else None
    val storedNovel = if (censusBacked)
      Dedup.readEvalGramCensus(spark, s"$dir/prefix_postings") else None
    val (totalG, novelG) = (storedTotal, storedNovel) match {
      case (Some(t), Some(nv)) => (t, nv)
      case _ =>
        val pg = postings.select(col("g")).distinct().localCheckpoint()
        (pg.count(),
          pg.join(vocab.select(col("g")), Seq("g"), "left_anti").count())
    }
    val driftBp = if (totalG == 0) 0L else novelG * 10000L / totalG
    if (driftBp > vocabDriftBudgetBp) {
      rebuildPrefixTriple(spark, fs, dir, postings, buckets)
      // the rebuild re-derives the vocab FROM the postings, so every
      // posting g is vocab-covered again: reset the pair exactly
      if (censusBacked) {
        Dedup.writeEvalGramCensus(spark, s"$dir/prefix_vocab",
          postings.select(col("g")).distinct().count())
        Dedup.writeEvalGramCensus(spark, s"$dir/prefix_postings", 0L)
      }
      healed += "prefix_index"
    }
    // 4. member fragmentation (bucketed bundles only): identical-rows
    // rewrite through the bucket spec for every member the passes above
    // did not already rewrite this tick
    buckets.foreach { n =>
      val already = Set(
        if (healed.contains("winnow_hist")) "winnow_hist" else "",
        if (healed.contains("eval_grams")) "eval_grams" else "") ++
        (if (healed.contains("prefix_index"))
          Set("prefix_postings", "prefix_grams", "prefix_vocab")
        else Set.empty[String])
      for (name <- Pipeline.BundleBucketKeys.keys.toSeq.sorted
           if !already.contains(name)
           if dataFiles(name) > n * targetFilesPerBucket) {
        val rows = spark.read.parquet(s"$dir/$name").localCheckpoint()
        swapMember(spark, fs, dir, name, rows, buckets)
        healed += s"${name}_files"
      }
    }
    healed.toSeq
  }

  /** Staged swap of one bundle member THROUGH its persisted layout:
    * bucketed bundles rewrite via the bucket spec (a stage table whose
    * files carry their bucket ids, so the file-level rename installs a
    * valid bucketed member), plain bundles via `plainWrite` (default: a
    * plain parquet write). Registered tables refresh after install so
    * live sessions see the new files. */
  private def swapMember(spark: SparkSession,
                         fs: org.apache.hadoop.fs.FileSystem,
                         dir: String, name: String, df: DataFrame,
                         buckets: Option[Int],
                         plainWrite: DataFrame => String => Unit =
                           df => p => df.write.parquet(p)): Unit = {
    val path = s"$dir/$name"
    buckets match {
      case Some(n) if Pipeline.BundleBucketKeys.contains(name) =>
        val stageTable = Pipeline.bundleTable(dir, name) + "__stage"
        swapIn(fs, path) { p =>
          Pipeline.writeBucketedAt(spark, df, p, stageTable,
            Pipeline.BundleBucketKeys(name), n)
          // external table: dropping the entry never touches the files
          // the rename is about to install
          spark.sql(s"DROP TABLE IF EXISTS `$stageTable`")
        }
      case _ => swapIn(fs, path)(plainWrite(df))
    }
    val live = Pipeline.bundleTable(dir, name)
    if (spark.catalog.tableExists(live)) spark.catalog.refreshTable(live)
  }

  /** Rebuild the prefix triple from the persisted grams table under a
    * fresh vocabulary, installed behind the `prefix__SWAP` redo
    * marker (see [[maintainMasterBundle]]'s crash contract). On a
    * bucketed bundle the postings/grams stages write THROUGH the
    * bucket spec, so the installed triple keeps its co-located probe
    * property. */
  private def rebuildPrefixTriple(spark: SparkSession,
                                  fs: org.apache.hadoop.fs.FileSystem,
                                  dir: String, postings: DataFrame,
                                  buckets: Option[Int]): Unit = {
    // the build params travel in the live postings' g metadata — the
    // rebuild must keep them or every probe's loud guard fires. An
    // ABSENT t is metadata LOSS, not a default to paper over (round-18
    // advice): rebuilding under a guessed threshold would silently
    // install an index with different prefix lengths than every
    // already-issued probe assumes — fail loudly instead, like the
    // probes themselves do on a param mismatch.
    val gField = postings.schema.fields.find(_.name == "g").getOrElse(
      throw new IllegalArgumentException(
        s"$dir/prefix_postings carries no g column — not a prefix index"))
    require(gField.metadata.contains("graft.prefix.t"),
      s"$dir/prefix_postings carries no graft.prefix.t metadata — the " +
        "build threshold was lost (a foreign rewrite dropped the column " +
        "metadata?); rebuild the index from text with buildPrefixIndex " +
        "rather than guessing a threshold here")
    val t = gField.metadata.getDouble("graft.prefix.t")
    val (p2, g2, v2) = Dedup.rebuildPrefixIndex(
      Pipeline.bundleMember(spark, dir, "prefix_grams"), gField.metadata, t)
    val members = Seq("prefix_postings" -> p2, "prefix_grams" -> g2,
      "prefix_vocab" -> v2)
    members.foreach { case (n, df) =>
      val stage = new org.apache.hadoop.fs.Path(s"$dir/${n}__stage")
      if (fs.exists(stage)) fs.delete(stage, true)
      buckets match {
        case Some(b) if Pipeline.BundleBucketKeys.contains(n) =>
          val stageTable = Pipeline.bundleTable(dir, n) + "__stage"
          Pipeline.writeBucketedAt(spark, df, stage.toString, stageTable,
            Pipeline.BundleBucketKeys(n), b)
          spark.sql(s"DROP TABLE IF EXISTS `$stageTable`")
        case _ => df.write.parquet(stage.toString)
      }
    }
    val marker = new org.apache.hadoop.fs.Path(s"$dir/prefix__SWAP")
    fs.create(marker, true).close()
    installPrefixStages(fs, dir)
    fs.delete(marker, false)
    members.foreach { case (n, _) =>
      val live = Pipeline.bundleTable(dir, n)
      if (spark.catalog.tableExists(live)) spark.catalog.refreshTable(live)
    }
  }

  /** Install any complete `prefix_*__stage` dirs (the redo step — safe
    * to repeat until the marker drops). */
  private def installPrefixStages(fs: org.apache.hadoop.fs.FileSystem,
                                  dir: String): Unit =
    Seq("prefix_postings", "prefix_grams", "prefix_vocab").foreach { n =>
      val stage = new org.apache.hadoop.fs.Path(s"$dir/${n}__stage")
      val live = new org.apache.hadoop.fs.Path(s"$dir/$n")
      val old = new org.apache.hadoop.fs.Path(s"$dir/${n}__old")
      if (fs.exists(stage)) {
        if (fs.exists(old)) fs.delete(old, true)
        if (fs.exists(live))
          require(fs.rename(live, old), s"bundle swap: could not retire $live")
        require(fs.rename(stage, live), s"bundle swap: could not install $live")
        fs.delete(old, true)
      }
    }

  /** Entry reclaim: finish a marker-committed prefix swap; restore any
    * single-dir member whose live vanished mid-swap (`__old` holds the
    * complete prior version); drop stale stages. */
  private def reclaimSwaps(spark: SparkSession,
                           fs: org.apache.hadoop.fs.FileSystem,
                           dir: String): Unit = {
    val marker = new org.apache.hadoop.fs.Path(s"$dir/prefix__SWAP")
    if (fs.exists(marker)) {
      installPrefixStages(fs, dir)
      fs.delete(marker, false)
    }
    // every member any heal can swap (round 18: the fragmentation pass
    // swaps the url/exact/winnow members too) — a crash window on any
    // of them must self-heal on the next entry
    (Pipeline.BundleBucketKeys.keys.toSeq :+ "prefix_vocab")
      .distinct.sorted.foreach { n =>
      val live = new org.apache.hadoop.fs.Path(s"$dir/$n")
      val old = new org.apache.hadoop.fs.Path(s"$dir/${n}__old")
      val stage = new org.apache.hadoop.fs.Path(s"$dir/${n}__stage")
      if (!fs.exists(live) && fs.exists(old))
        require(fs.rename(old, live), s"bundle reclaim: could not restore $live")
      if (fs.exists(old)) fs.delete(old, true)
      if (fs.exists(stage)) fs.delete(stage, true)
    }
  }

  /** Single-dir staged swap (the E3/E6 protocol): write `__stage`
    * completely, retire live to `__old`, install, drop old. */
  private def swapIn(fs: org.apache.hadoop.fs.FileSystem, path: String)
                    (write: String => Unit): Unit = {
    val live = new org.apache.hadoop.fs.Path(path)
    val stage = new org.apache.hadoop.fs.Path(path + "__stage")
    val old = new org.apache.hadoop.fs.Path(path + "__old")
    if (fs.exists(stage)) fs.delete(stage, true)
    if (fs.exists(old)) fs.delete(old, true)
    write(stage.toString)
    if (fs.exists(live))
      require(fs.rename(live, old), s"bundle swap: could not retire $live")
    require(fs.rename(stage, live), s"bundle swap: could not install $live")
    fs.delete(old, true)
  }
}

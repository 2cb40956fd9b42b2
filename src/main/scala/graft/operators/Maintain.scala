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

  /** What one pass healed — empty everywhere = the no-op tick. */
  final case class MaintainReport(compacted: Seq[String],
                                  regridded: Seq[String],
                                  rebalanced: Seq[String],
                                  bundleHeals: Seq[String] = Nil) {
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
    * @return which artifacts healed, by name */
  def maintainCorpus(spark: SparkSession,
                     bucketedTables: Seq[String] = Nil,
                     layoutDirs: Seq[String] = Nil,
                     ivfDirs: Seq[String] = Nil,
                     masterBundleDirs: Seq[String] = Nil,
                     targetFilesPerBucket: Int = 1,
                     driftBudgetBp: Long = 100L,
                     maxCellSize: Long = 10000L,
                     targetCellSize: Int = 125): MaintainReport =
    MaintainReport(
      bucketedTables.filter(t =>
        graft.sources.Bucketing.compactBucketed(spark, t, targetFilesPerBucket)),
      layoutDirs.filter(d =>
        graft.sources.Layout.maintainZOrdered(spark, d, driftBudgetBp)),
      ivfDirs.filter(d =>
        Similarity.rebalanceIvfIndexDir(spark, d, maxCellSize, targetCellSize)),
      masterBundleDirs.flatMap(d =>
        maintainMasterBundle(spark, d).map(m => s"$d:$m")))

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
    * @return healed member names (subset of "winnow_hist",
    *         "eval_grams", "prefix_index"); empty = the no-op tick */
  def maintainMasterBundle(spark: SparkSession, dir: String,
                           evalGramTargetFiles: Int = 8,
                           vocabDriftBudgetBp: Long = 100L): Seq[String] = {
    require(evalGramTargetFiles >= 1,
      s"evalGramTargetFiles must be >= 1, got $evalGramTargetFiles")
    require(vocabDriftBudgetBp >= 0,
      s"vocabDriftBudgetBp must be >= 0, got $vocabDriftBudgetBp")
    val healed = scala.collection.mutable.ArrayBuffer.empty[String]
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    reclaimSwaps(spark, fs, dir)
    // 1. winnow df histogram
    val histPath = s"$dir/winnow_hist"
    val idx = spark.read.parquet(s"$dir/winnow_index")
    val trueMass = idx.select(col("h"), col("doc_id")).distinct().count()
    val histMass =
      if (fs.exists(new org.apache.hadoop.fs.Path(histPath)))
        spark.read.parquet(histPath)
          .agg(coalesce(sum(col("df")), lit(0L))).first().getLong(0)
      else -1L
    if (histMass != trueMass) {
      val fresh = Dedup.winnowDfHistogram(idx).localCheckpoint()
      swapIn(fs, histPath)(p => fresh.write.parquet(p))
      healed += "winnow_hist"
    }
    // 2. eval-gram compaction
    val egPath = new org.apache.hadoop.fs.Path(s"$dir/eval_grams")
    val egFiles = fs.listStatus(egPath)
      .count(s => s.isFile && !s.getPath.getName.startsWith("_"))
    if (egFiles > evalGramTargetFiles) {
      val g = spark.read.parquet(egPath.toString).distinct().localCheckpoint()
      swapIn(fs, egPath.toString)(p => g.coalesce(1).write.parquet(p))
      healed += "eval_grams"
    }
    // 3. prefix vocab drift
    val postings = spark.read.parquet(s"$dir/prefix_postings")
    val vocab = spark.read.parquet(s"$dir/prefix_vocab")
    val pg = postings.select(col("g")).distinct().localCheckpoint()
    val totalG = pg.count()
    val novelG = pg.join(vocab.select(col("g")), Seq("g"), "left_anti").count()
    val driftBp = if (totalG == 0) 0L else novelG * 10000L / totalG
    if (driftBp > vocabDriftBudgetBp) {
      rebuildPrefixTriple(spark, fs, dir, postings)
      healed += "prefix_index"
    }
    healed.toSeq
  }

  /** Rebuild the prefix triple from the persisted grams table under a
    * fresh vocabulary, installed behind the `prefix__SWAP` redo
    * marker (see [[maintainMasterBundle]]'s crash contract). */
  private def rebuildPrefixTriple(spark: SparkSession,
                                  fs: org.apache.hadoop.fs.FileSystem,
                                  dir: String, postings: DataFrame): Unit = {
    // the build params travel in the live postings' g metadata — the
    // rebuild must keep them or every probe's loud guard fires
    val gField = postings.schema.fields.find(_.name == "g").getOrElse(
      throw new IllegalArgumentException(
        s"$dir/prefix_postings carries no g column — not a prefix index"))
    val t =
      if (gField.metadata.contains("graft.prefix.t"))
        gField.metadata.getDouble("graft.prefix.t")
      else 0.5
    val (p2, g2, v2) = Dedup.rebuildPrefixIndex(
      spark.read.parquet(s"$dir/prefix_grams"), gField.metadata, t)
    val members = Seq("prefix_postings" -> p2, "prefix_grams" -> g2,
      "prefix_vocab" -> v2)
    members.foreach { case (n, df) =>
      val stage = new org.apache.hadoop.fs.Path(s"$dir/${n}__stage")
      if (fs.exists(stage)) fs.delete(stage, true)
      df.write.parquet(stage.toString)
    }
    val marker = new org.apache.hadoop.fs.Path(s"$dir/prefix__SWAP")
    fs.create(marker, true).close()
    installPrefixStages(fs, dir)
    fs.delete(marker, false)
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
    Seq("winnow_hist", "eval_grams", "prefix_postings", "prefix_grams",
      "prefix_vocab").foreach { n =>
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

package graft

import graft.operators.{Maintain, Similarity}
import graft.sources.{Bucketing, Layout}
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

class MaintainSpec extends SparkSpecBase {
  import spark.implicits._

  test("maintainCorpus: fragmented+drifted+skewed corpus heals in ONE pass; probes survive; healthy tick no-ops") {
    // ---- 1. a FRAGMENTED bucketed index: one base write + 4 appends
    // (each append adds a file per touched bucket — the D2 decay mode)
    val table = "maint_postings"
    Bucketing.writeBucketed(
      (0L until 64L).map(i => (i % 8, i)).toDF("h", "doc_id"),
      table, Seq("h"), numBuckets = 4)
    (1 to 4).foreach { day =>
      (0L until 16L).map(i => (i % 8, 1000L * day + i)).toDF("h", "doc_id")
        .write.mode(SaveMode.Append).format("parquet")
        .bucketBy(4, "h").sortBy("h").saveAsTable(table)
    }
    def bucketProbe() = spark.table(table).filter(col("h") === 3L)
      .select(col("doc_id")).as[Long].collect().sorted.toSeq
    val probeBefore = bucketProbe()
    def nFiles() = spark.table(table).select(input_file_name().as("f"))
      .distinct().count()
    assert(nFiles() > 4L, "the appends must fragment the table")

    // ---- 2. a DRIFTED z-order layout: in-grid build + out-of-range
    // appends that clamp into the edge bucket
    val layoutDir =
      java.nio.file.Files.createTempDirectory("maint_layout").toString + "/layout"
    Layout.zorderWrite(
      (0 until 16).flatMap(x => (0 until 16).map(y => (x.toLong, y.toLong)))
        .toDF("x", "y"),
      Seq("x", "y"), layoutDir, fileBits = 4, bits = 4)
    Layout.appendZOrdered(spark, layoutDir,
      (0 until 32).map(i => (1000L + i, (i % 16).toLong)).toDF("x", "y"))
    def scanProbe() = Layout.prunedScan(spark, layoutDir, "x", 1000L, 2000L)
      .select(col("x").cast("long")).as[Long].collect().sorted.toSeq
    val scanBefore = scanProbe()

    // ---- 3. a SKEWED IVF index home: the C7i fat-cell plant (two
    // tight 10-vector blobs + one 60-vector cell with 4 sub-blobs)
    def blob(center: Seq[Double], n: Int, base: Long): Seq[(Long, Seq[Float])] =
      (0 until n).map { i =>
        (base + i, center.zipWithIndex.map { case (c, d) =>
          (c + 0.01 * ((i * 7 + d * 3) % 5)).toFloat })
      }
    val dim = 8
    def c(hot: Int*): Seq[Double] =
      (0 until dim).map(d => if (hot.contains(d)) 10.0 else 0.0)
    val vecs = blob(c(0), 10, 0L) ++ blob(c(1), 10, 100L) ++
      (0 until 4).flatMap(s => blob(c(2, 3 + s), 15, 200L + s * 15))
    val (assigned, cents) = Similarity.buildIvfIndex(
      vecs.toDF("vec_id", "embedding").withColumn("label", lit(0L)), nClusters = 3)
    val ivfDir = java.nio.file.Files.createTempDirectory("maint_ivf").toString + "/ivf"
    assigned.write.parquet(s"$ivfDir/assigned")
    cents.write.parquet(s"$ivfDir/centroids")
    // the skew is real: the oversized-cell guard trips before the heal
    intercept[Exception] {
      Similarity.semanticDedupAssigned(
        spark.read.parquet(s"$ivfDir/assigned"), maxCellSize = 20).collect()
    }

    // ---- ONE pass heals all three
    val report = Maintain.maintainCorpus(spark,
      bucketedTables = Seq(table), layoutDirs = Seq(layoutDir),
      ivfDirs = Seq(ivfDir), maxCellSize = 20L, targetCellSize = 15)
    assert(report == Maintain.MaintainReport(
      Seq(table), Seq(layoutDir), Seq(ivfDir)), s"got $report")

    // bucketed: compacted to <= 1 file/bucket, probe bit-identical
    assert(nFiles() <= 4L, "compaction must restore <= 1 file per bucket")
    assert(bucketProbe() == probeBefore, "the bucket probe must be bit-identical")
    // layout: drift cleared, pruned scan returns the same rows
    assert(Layout.zorderDrift(spark, layoutDir)
      .agg(max(col("clamp_bp"))).head().getLong(0) == 0L, "drift must clear")
    assert(scanProbe() == scanBefore, "the pruned scan must return the same rows")
    // ivf: every row preserved once, no fat cell, the guard runs clean
    val healed = spark.read.parquet(s"$ivfDir/assigned").localCheckpoint()
    assert(healed.count() == 80L &&
      healed.select("vec_id").distinct().count() == 80L)
    assert(healed.groupBy("cell").count().agg(max(col("count"))).head().getLong(0) <= 20L)
    assert(Similarity.semanticDedupAssigned(healed, maxCellSize = 20).count() == 80L,
      "the guard's named remedy runs clean after the heal")
    // centroid ids stay unique and the pair swapped together
    val cents2 = spark.read.parquet(s"$ivfDir/centroids")
    assert(cents2.select("cell").distinct().count() == cents2.count())
    assert(healed.select("cell").distinct().count() <=
      cents2.count(), "every assigned cell has a centroid")

    // ---- the schedule's next tick is a NO-OP everywhere
    val again = Maintain.maintainCorpus(spark,
      bucketedTables = Seq(table), layoutDirs = Seq(layoutDir),
      ivfDirs = Seq(ivfDir), maxCellSize = 20L, targetCellSize = 15)
    assert(!again.healedAnything, s"healthy corpus must no-op: $again")
  }

  test("maintainMasterBundle: stale histogram + fragmented eval grams + drifted vocab heal in one pass, probes identical, healthy tick no-ops") {
    import graft.operators.Dedup
    def words(seed: String, n: Int): String =
      (0 until n).map(i =>
        java.security.MessageDigest.getInstance("MD5")
          .digest(s"$seed:$i".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(10)).mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("maint_bundle").toString + "/bundle"
    val boiler = words("boiler", 12)
    val corpus = (1L to 12L).map(i =>
      (i, words(s"own$i", 10) + " " + boiler + " " + words(s"tail$i", 10)))
      .toDF("doc_id", "text").localCheckpoint()
    val (p0, g0, v0) = Dedup.buildPrefixIndex(corpus)
    p0.write.parquet(s"$dir/prefix_postings")
    g0.write.parquet(s"$dir/prefix_grams")
    v0.write.parquet(s"$dir/prefix_vocab")
    val idx0 = Dedup.buildWinnowIndex(corpus).localCheckpoint()
    idx0.write.parquet(s"$dir/winnow_index")
    Dedup.winnowDfHistogram(idx0).write.parquet(s"$dir/winnow_hist")
    val evalText = words("eval", 25)
    Dedup.buildEvalGramIndex(Seq((900L, evalText)).toDF("doc_id", "text"))
      .coalesce(1).write.parquet(s"$dir/eval_grams")

    // a FRESH bundle no-ops — the meters are censuses, not rebuilds
    val fresh = Maintain.maintainCorpus(spark, masterBundleDirs = Seq(dir))
    assert(!fresh.healedAnything, s"fresh bundle must no-op: $fresh")

    // ---- decay, exactly the D2y modes -------------------------------
    // 1. the winnow index grows (histogram goes stale)
    Dedup.appendToWinnowIndex(
        Seq((50L, words("novelw", 10) + " " + boiler)).toDF("doc_id", "text"))
      .write.mode(SaveMode.Append).parquet(s"$dir/winnow_index")
    // 2. ten micro-batch appends fragment the eval-gram artifact
    (1 to 10).foreach { i =>
      Dedup.buildEvalGramIndex(
          Seq((1000L + i, words(s"ev$i", 25))).toDF("doc_id", "text"))
        .coalesce(1).write.mode(SaveMode.Append).parquet(s"$dir/eval_grams")
    }
    // 3. novel-vocabulary accepts append under the FROZEN gram order
    val (ap, ag) = Dedup.appendToPrefixIndex(
      (60L to 69L).map(i => (i, words(s"nv$i", 40))).toDF("doc_id", "text"),
      spark.read.parquet(s"$dir/prefix_vocab"))
    ap.write.mode(SaveMode.Append).parquet(s"$dir/prefix_postings")
    ag.write.mode(SaveMode.Append).parquet(s"$dir/prefix_grams")

    // ---- probes BEFORE the heal -------------------------------------
    val batch = Seq(
      (200L, words("own3", 10) + " " + boiler + " " + words("tail3", 10)),
      (201L, words("freshb", 30))).toDF("doc_id", "text").localCheckpoint()
    def prefixProbe(): Seq[org.apache.spark.sql.Row] =
      Dedup.dedupAgainstPrefixIndex(batch,
        spark.read.parquet(s"$dir/prefix_postings"),
        spark.read.parquet(s"$dir/prefix_grams"),
        spark.read.parquet(s"$dir/prefix_vocab")).collect().toSeq
    val train = Seq(
      (300L, words("pre", 3) + " " + evalText + " " + words("post", 3)),
      (301L, words("cleantr", 30))).toDF("doc_id", "text").localCheckpoint()
    def firewallProbe(): Seq[org.apache.spark.sql.Row] =
      Dedup.flagAgainstEvalGrams(train,
        spark.read.parquet(s"$dir/eval_grams")).collect().toSeq
    val pb = prefixProbe()
    assert(pb.exists(r => r.getLong(0) == 200L && r.getBoolean(1) &&
      r.getLong(2) == 3L), s"the planted dup must verdict against doc 3: $pb")
    val fb = firewallProbe()
    assert(fb.map(r => (r.getLong(0), r.getBoolean(1))).toMap ==
      Map(300L -> true, 301L -> false), s"$fb")

    // ---- ONE pass heals all three -----------------------------------
    val report = Maintain.maintainCorpus(spark, masterBundleDirs = Seq(dir))
    assert(report.bundleHeals.toSet ==
      Set(s"$dir:winnow_hist", s"$dir:eval_grams", s"$dir:prefix_index"),
      s"got $report")

    // probes bit-identical across the heal
    assert(prefixProbe() == pb, "prefix verdicts must survive the vocab heal")
    assert(firewallProbe() == fb, "firewall verdicts must survive the compaction")
    // the histogram is FRESH again: hist-backed suppression equals the
    // recompute on the grown index, appended prints included
    val idx2 = spark.read.parquet(s"$dir/winnow_index")
    val hist2 = spark.read.parquet(s"$dir/winnow_hist")
    def spanRows(h: Option[org.apache.spark.sql.DataFrame]) =
      Dedup.winnowSpansAgainstIndex(batch, idx2, minPrints = 2L,
          maxDf = Some(4L), dfHist = h)
        .orderBy(col("doc_id"), col("corpus_id"), col("start"), col("c_start"))
        .collect().toSeq
    assert(spanRows(Some(hist2)) == spanRows(None),
      "the healed histogram must suppress exactly like a recompute")
    // fragmentation cleared
    val egFiles = new java.io.File(s"$dir/eval_grams").listFiles()
      .count(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
    assert(egFiles <= 8, s"eval grams still fragmented: $egFiles files")

    // ---- the next tick is a NO-OP ------------------------------------
    val again = Maintain.maintainCorpus(spark, masterBundleDirs = Seq(dir))
    assert(!again.healedAnything, s"healed bundle must no-op: $again")
  }

  test("BUCKETED bundle maintenance: D2y-shaped appends heal through the bucket spec, probes identical, census re-tightens, members back to ≤1 file/bucket") {
    import graft.operators.{Dedup, Pipeline, Urls}
    def words(seed: String, n: Int): String =
      (0 until n).map(i =>
        java.security.MessageDigest.getInstance("MD5")
          .digest(s"$seed:$i".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(10)).mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("maint_bb").toString + "/bundle"
    val boiler = words("boiler", 12)
    val corpus = (1L to 12L).map(i =>
      (i, words(s"own$i", 10) + " " + boiler + " " + words(s"tail$i", 10)))
      .toDF("doc_id", "text").localCheckpoint()
    val recs = (1L to 12L).map(i =>
      (i, s"https://src${i % 3}.example.com/a/$i")).toDF("rec_id", "uri")
    val (p0, g0, v0) = Dedup.buildPrefixIndex(corpus)
    val evalText = words("eval", 25)
    Pipeline.persistMasterArtifacts(Pipeline.MasterArtifacts(
      Urls.buildUrlIndex(recs, "rec_id", "uri"),
      Dedup.buildExactIndex(corpus, "doc_id", "text"),
      p0, g0, v0,
      Dedup.buildWinnowIndex(corpus),
      Dedup.buildEvalGramIndex(Seq((900L, evalText)).toDF("doc_id", "text"))),
      dir, numBuckets = 4)
    val fresh = Maintain.maintainCorpus(spark, masterBundleDirs = Seq(dir))
    assert(!fresh.healedAnything, s"fresh bucketed bundle must no-op: $fresh")
    // ---- decay through the D2y append path (all bucketed writers) ----
    (1 to 6).foreach { i =>
      Pipeline.appendBundleMember(spark, dir, "eval_grams",
        Dedup.buildEvalGramIndex(
          Seq((1000L + i, words(s"ev$i", 25))).toDF("doc_id", "text"))
          .localCheckpoint())
      Dedup.bumpEvalGramCensus(spark, s"$dir/eval_grams", 13L)
      Pipeline.appendBundleMember(spark, dir, "url_index",
        Seq((s"https://new$i.example.com/x", 2000L + i, 1L))
          .toDF("canon_url", "keep_id", "n_copies"))
    }
    Pipeline.appendBundleMember(spark, dir, "winnow_index",
      Dedup.appendToWinnowIndex(
        Seq((50L, words("novelw", 10) + " " + boiler)).toDF("doc_id", "text"))
        .localCheckpoint())
    val (ap, ag) = Dedup.appendToPrefixIndex(
      (60L to 69L).map(i => (i, words(s"nv$i", 40))).toDF("doc_id", "text"),
      Pipeline.bundleMember(spark, dir, "prefix_vocab").localCheckpoint())
    Pipeline.appendBundleMember(spark, dir, "prefix_postings", ap.localCheckpoint())
    Pipeline.appendBundleMember(spark, dir, "prefix_grams", ag.localCheckpoint())
    // ---- probes BEFORE the heal (through the LOADED bundle) ----------
    val batch = Seq(
      (200L, words("own3", 10) + " " + boiler + " " + words("tail3", 10)),
      (201L, words("freshb", 30))).toDF("doc_id", "text").localCheckpoint()
    val train = Seq(
      (300L, words("pre", 3) + " " + evalText + " " + words("post", 3)),
      (301L, words("cleantr", 30))).toDF("doc_id", "text").localCheckpoint()
    def probes(): (Seq[org.apache.spark.sql.Row], Seq[org.apache.spark.sql.Row], Seq[org.apache.spark.sql.Row]) = {
      val art = Pipeline.loadMasterArtifacts(spark, dir)
      (Dedup.dedupAgainstPrefixIndex(batch, art.prefixPostings,
        art.prefixGrams, art.prefixVocab).collect().toSeq,
        Dedup.flagAgainstEvalGrams(train, art.evalGrams,
          knownCensus = art.evalGramCensus).collect().toSeq,
        Urls.urlDedupAgainstIndex(
          Seq((500L, "https://src1.example.com/a/1"), (501L, "https://new3.example.com/x"))
            .toDF("rec_id", "uri"), art.urlIndex, "rec_id", "uri")
          .orderBy(col("rec_id")).collect().toSeq)
    }
    val before = probes()
    assert(before._2.map(r => (r.getLong(0), r.getBoolean(1))).toMap ==
      Map(300L -> true, 301L -> false), s"${before._2}")
    assert(before._3.map(_.getBoolean(2)) == Seq(true, true),
      s"both planted url dups must verdict: ${before._3}")
    // ---- ONE pass heals; every heal writes through the bucket spec ----
    val report = Maintain.maintainCorpus(spark, masterBundleDirs = Seq(dir))
    val heals = report.bundleHeals.map(_.stripPrefix(s"$dir:")).toSet
    assert(Set("winnow_hist", "eval_grams", "prefix_index").subsetOf(heals),
      s"got $report")
    assert(heals.contains("url_index_files"),
      s"the appended url index must compact: $report")
    assert(probes() == before,
      "verdicts must be bit-identical across the bucketed heal")
    // census re-tightened to exact (the bumps were upper bounds)
    val exactCensus = spark.read.parquet(s"$dir/eval_grams").distinct().count()
    assert(Dedup.readEvalGramCensus(spark, s"$dir/eval_grams").contains(exactCensus),
      "the compaction must reset the census to the exact count")
    // every healed member is back to ≤1 file/bucket and still BUCKETED
    // (reads come back co-located through the re-registered tables)
    for (m <- Seq("eval_grams", "url_index", "prefix_postings", "winnow_hist")) {
      val files = new java.io.File(s"$dir/$m").listFiles()
        .count(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
      assert(files <= 4, s"$m still fragmented after the heal: $files files")
    }
    val again = Maintain.maintainCorpus(spark, masterBundleDirs = Seq(dir))
    assert(!again.healedAnything, s"healed bucketed bundle must no-op: $again")
  }

  test("refresh meter (E9b): a grown pool or a new source flags, a fresh plan no-ops") {
    import graft.operators.Sharding
    val weights = Map("srcA" -> 5L, "srcB" -> 1L)
    val pool0 = ((1 to 40).map(i => (i.toLong, "srcA", 100L)) ++
      (41 to 60).map(i => (i.toLong, "srcB", 50L)))
      .toDF("doc_id", "source", "n_tokens").localCheckpoint()
    val plan = Sharding.planMixture(pool0, "source", "n_tokens", weights,
      budgetTokens = 6000L).localCheckpoint()
    // fresh plan over the same pool: no-op, and through maintainCorpus
    // the tick reports nothing
    assert(!Maintain.refreshRecommended(spark, pool0, plan))
    val home = java.nio.file.Files.createTempDirectory("maint_rf").toString
    pool0.write.parquet(s"$home/pool"); plan.write.parquet(s"$home/plan")
    val tick = Maintain.maintainCorpus(spark,
      refreshChecks = Seq((s"$home/pool", s"$home/plan")))
    assert(tick.refreshRecommended.isEmpty && !tick.healedAnything,
      s"fresh plan must no-op: $tick")
    // the pool grows 10% (> the 5% default budget): flags — but only
    // past the budget (4% stays quiet: the meter is a budget, not a
    // tripwire on every accepted batch)
    val grown4 = pool0.unionByName(
      Seq((100L, "srcA", 200L)).toDF("doc_id", "source", "n_tokens"))
    assert(!Maintain.refreshRecommended(spark, grown4, plan),
      "4% growth is inside the default 5% budget")
    val grown10 = pool0.unionByName(
      Seq((100L, "srcA", 500L)).toDF("doc_id", "source", "n_tokens"))
    assert(Maintain.refreshRecommended(spark, grown10, plan),
      "10% growth must recommend a refresh")
    grown10.write.parquet(s"$home/pool10")
    val tick10 = Maintain.maintainCorpus(spark,
      refreshChecks = Seq((s"$home/pool10", s"$home/plan")))
    assert(tick10.refreshRecommended == Seq(s"$home/pool10") &&
      !tick10.healedAnything, s"grown pool must flag, heal nothing: $tick10")
    // a NEW source flags at any size — a stale plan allocates it nothing
    val newSrc = pool0.unionByName(
      Seq((101L, "srcC", 1L)).toDF("doc_id", "source", "n_tokens"))
    assert(Maintain.refreshRecommended(spark, newSrc, plan),
      "a plan-unseen source must recommend a refresh")
  }

  test("rebalanceIvfIndexDir: the crash window (home absent, __old present) self-heals on entry") {
    def vec(i: Long, hot: Int): (Long, Seq[Float]) =
      (i, (0 until 8).map(d =>
        (if (d == hot) 10.0 + 0.01 * (i % 5) else 0.0).toFloat))
    // one fat cell of 30 split across two sub-blobs + one small cell
    val vecs = (0L until 15L).map(vec(_, 0)) ++ (100L until 115L).map(vec(_, 1)) ++
      (200L until 210L).map(vec(_, 2))
    val (assigned, cents) = Similarity.buildIvfIndex(
      vecs.toDF("vec_id", "embedding").withColumn("label", lit(0L)), nClusters = 2)
    val dir = java.nio.file.Files.createTempDirectory("maint_crash").toString + "/ivf"
    assigned.write.parquet(s"$dir/assigned")
    cents.write.parquet(s"$dir/centroids")
    // simulate the crash between rename(live→old) and rename(tmp→live)
    val live = new org.apache.hadoop.fs.Path(dir)
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(live, new org.apache.hadoop.fs.Path(dir + "__old")))
    // the next scheduled tick reclaims and proceeds (here: heals the skew)
    val did = Similarity.rebalanceIvfIndexDir(spark, dir,
      maxCellSize = 12L, targetCellSize = 10)
    assert(did, "the reclaimed index still carries the skew and must heal")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir + "__old")))
    assert(spark.read.parquet(s"$dir/assigned").count() == 40L)
  }
}

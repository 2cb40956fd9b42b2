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

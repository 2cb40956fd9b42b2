package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Composed master-chain scaling measurement (round 17, verdict item
  * 5): SCALING_r16 measured every probe FAMILY at 100× and argued the
  * master chain's cost "is the table's composition" — this main
  * measures the COMPOSITION itself, so composition-only effects
  * (checkpoint pressure between stages, the fate-assembly join
  * fan-in, the firewall leg after the census-gate fix) show up in a
  * wall clock instead of an argument. Per leg, four timed runs:
  *
  *  - `pipeline`: the FULL day-1 chain ([[graft.operators.Pipeline
  *    .masterPipeline]], q174's registered shape) over the scaled
  *    corpus — raw chunks to packed shards;
  *  - `artifacts`: day-1 front + the persisted probe bundle
  *    ([[graft.operators.Pipeline.persistMasterArtifacts]] — the real
  *    write, not a localCheckpoint stand-in);
  *  - `ingest`: [[graft.operators.Pipeline.masterIngest]] of the
  *    FIXED 1× batch (the first leg's block-4 chunks) against the
  *    scaled frozen bundle — the batch-bounded claim at the chain
  *    grain, firewall included;
  *  - `refresh`: [[graft.operators.Pipeline.masterRefresh]] over the
  *    grown day-1 pool ∪ the accepted batch — honestly corpus-sized
  *    (the interleave's global order IS the deliverable), expected
  *    ~linear.
  *
  * Usage: `runMain graft.MasterScaleBench COPIES:DIR [COPIES:DIR …]`;
  * the first leg must be the 1× corpus (it donates the fixed batch).
  * One JSON line per leg. */
object MasterScaleBench {
  def main(args: Array[String]): Unit = {
    GraftSession.warnHugeHeap("MasterScaleBench")
    require(args.nonEmpty, "usage: MasterScaleBench COPIES:DIR [COPIES:DIR ...]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.operators.{Pipeline, Urls}
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    def fmt(d: Double) = math.round(d * 1000) / 1000.0
    def noop(df: org.apache.spark.sql.DataFrame): Long = {
      df.write.format("noop").mode("overwrite").save(); -1L
    }
    val legs = args.toSeq.map { a =>
      val Array(c, d) = a.split(":", 2); (c.toInt, d)
    }
    require(legs.head._1 == 1,
      s"first leg must be the 1x corpus (it donates the fixed batch), got ${legs.head._1}x")
    val bl = Urls.docBlocklist.toDF("pattern")
    val seed = Pipeline.MasterIngestSeed
    // the FIXED batch: the 1× corpus's block-4 chunks, q178's shape
    val batch = graft.sources.Warc.plantedMasterBatchChunks(
        spark.read.parquet(legs.head._2 + "/documents.parquet"))
      .localCheckpoint()
    val nBatch = batch.count()
    for ((copies, dir) <- legs) {
      val legLoad0 = GraftSession.loadAvg1m()
      val docs = spark.read.parquet(dir + "/documents.parquet").localCheckpoint()
      val nDocs = docs.count()
      val day1 = graft.sources.Warc.plantedMasterChunks(docs)
        .filter(col("chunk_id") % 5 =!= 4)
        .localCheckpoint() // forked: the pipeline run + the front/artifacts run
      // 1. the full day-1 chain, raw chunks → packed shards
      // winnowMaxDf = 8: the copy corpora are template-heavy by
      // construction (C salted copies share every ≥12-char gram run
      // between salt points, df = C), so the exact winnow tier's
      // candidate volume grows with C² and the pair-budget guard
      // refuses — measured: 438,738,557 pairs at 10×. maxDf below the
      // smallest copy multiplicity (10) suppresses the cross-copy
      // prints while the plant-grade spans (df 2) survive — the
      // guard's own named remedy, applied at the chain grain.
      val maxDf = Some(8L)
      val (_, wPipe) = timed(noop(
        Pipeline.masterPipeline(day1, "chunk_id", "content", bl,
          Pipeline.masterWeights, splitSeed = seed, winnowMaxDf = maxDf)))
      // 2. day-1 front ONCE (the q179 shape) + the persisted bundle
      val bundleDir = s"/tmp/graft_scale_bundle_${copies}x"
      val (day1Enc, wArt) = timed {
        val fr = Pipeline.masterFront(day1, "chunk_id", "content", bl, seed,
          15, 120, 0.65, 0.8, 60L, _ => _.localCheckpoint(), maxDf)
        Pipeline.persistMasterArtifacts(
          Pipeline.masterArtifactsOf(fr, jaccardTau = 0.8), bundleDir)
        Pipeline.encodeBosEos(fr.cleanTrain).localCheckpoint()
      }
      val art = Pipeline.loadMasterArtifacts(spark, bundleDir)
      // the histogram reads through the bundle layout (bucketed on h,
      // round 18) so suppression's anti-join co-locates with the index
      val hist = Pipeline.bundleMember(spark, bundleDir, "winnow_hist")
      // 3. the fixed batch against the scaled frozen bundle; the
      // suppression consults the bundle's persisted df histogram (the
      // r16 fix — without it the probe re-aggregates the scaled index)
      val (r, wIng) = timed {
        val res = Pipeline.masterIngestFull(batch, "chunk_id", "content",
          bl, art, splitSeed = seed, winnowMaxDf = maxDf,
          winnowDfHist = Some(hist))
        noop(res.fates)
        res
      }
      val accepted = r.accepted.localCheckpoint()
      val nShipped = accepted.count()
      // 4. the day-2 re-plan over the grown pool
      val (_, wRef) = timed(noop(
        Pipeline.masterRefresh(day1Enc, accepted, Pipeline.masterWeights)))
      println(s"""{"leg":"master_${copies}x","copies":$copies,""" +
        s""""n_docs":$nDocs,"n_batch":$nBatch,"n_shipped":$nShipped,""" +
        s""""load":[${fmt(legLoad0)},${fmt(GraftSession.loadAvg1m())}],""" +
        s""""wall":{"pipeline":${fmt(wPipe)},"artifacts":${fmt(wArt)},""" +
        s""""ingest":${fmt(wIng)},"refresh":${fmt(wRef)}}}""")
      System.out.flush()
    }
    spark.stop()
  }
}

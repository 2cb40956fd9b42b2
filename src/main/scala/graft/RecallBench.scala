package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** ANN operating-point measurement (round 15) — the recall-vs-cost
  * numbers behind SCALING_r15's knob table: every tier the recall
  * meter family certifies (q161–q164, q167) measured at a real SF
  * with a wide query set, plus the TRAINED composed IMI+ADC system's
  * build / search / append walls (the 100 TB configuration, closing
  * the measurement the round-14 report left at 10×).
  *
  * Meter legs run the same formula-twin chains the oracle-backed
  * queries certify (recall numbers are therefore exactly the metric
  * the correctness gate checks, just at more query points); the
  * trained legs run the production KMeans artifacts end to end.
  * Prints one JSON line per leg.
  *
  * Usage: `SPARK_GRAFT_SF_DIR=… runMain graft.RecallBench
  * [numQueries] [targetCellSize]`. */
object RecallBench {
  def main(args: Array[String]): Unit = {
    GraftSession.warnHugeHeap("RecallBench")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val numQueries = args.headOption.map(_.toInt).getOrElse(50)
    val targetCellSize = args.lift(1).map(_.toInt).getOrElse(125)
    val legsEnv = sys.env.get("SPARK_GRAFT_RECALL_LEGS")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def wanted(l: String) = legsEnv.forall(_.contains(l))
    val k = 10
    val spark = GraftSession.configure(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Similarity
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    def fmt(d: Double) = math.round(d * 1000) / 1000.0
    // load stamp per line (r18 item 6, closed r20): the leg's window is
    // auditable like the main bench's — stamped at line time, 1-min avg
    def tag = s""""queries":$numQueries,"k":$k,""" +
      s""""load":${fmt(GraftSession.loadAvg1m())},""" +
      s""""sf_dir":"${sfDir.takeRight(24)}""""

    val (truth, wTruth) = timed(
      Similarity.annBruteForce(spark, sfDir, k, numQueries).localCheckpoint())
    println(s"""{"metric":"brute_truth","wall_sec":${fmt(wTruth)},$tag}""")

    // each meter leg: mean recall in basis points + the search wall
    // (the truth build is shared and excluded — it's the meter's cost,
    // not the tier's)
    def leg(tier: String)(approx: => org.apache.spark.sql.DataFrame): Unit =
      if (wanted(tier)) {
        val (bp, w) = timed {
          Similarity.annRecall(truth, approx, k)
            .agg(avg(col("recall_bp"))).first().getDouble(0)
        }
        println(s"""{"metric":"recall","tier":"$tier","mean_recall_bp":${fmt(bp)},""" +
          s""""wall_sec":${fmt(w)},$tag}""")
      }

    leg("ivf_np1")(Similarity.annIvfPortable(spark, sfDir, k, numQueries, nProbe = 1))
    leg("ivf_np4")(Similarity.annIvfPortable(spark, sfDir, k, numQueries, nProbe = 4))
    leg("imi_np1")(Similarity.annImiPortable(spark, sfDir, k, numQueries, nProbe = 1))
    leg("imi_np2")(Similarity.annImiPortable(spark, sfDir, k, numQueries, nProbe = 2))
    leg("pq_cb16_r10")(Similarity.annPqPortable(spark, sfDir, k, numQueries, rerank = 10))
    leg("pq_cb16_r50")(Similarity.annPqPortable(spark, sfDir, k, numQueries, rerank = 50))
    leg("pq_cb64_r50")(Similarity.annPqPortable(spark, sfDir, k, numQueries,
      rerank = 50, codebookSize = 64))
    leg("imipq_r10")(Similarity.annImiPqPortable(spark, sfDir, k, numQueries,
      nProbe = 2, rerank = 10))
    leg("imipq_r50")(Similarity.annImiPqPortable(spark, sfDir, k, numQueries,
      nProbe = 2, rerank = 50))
    leg("jl_r50")(Similarity.annJlSearch(spark, sfDir, k, numQueries, rerank = 50))

    // the TRAINED composed system: build + search + append walls (the
    // q140 production path, auto-sized halves), and its measured recall
    if (wanted("imipq_trained")) {
      val emb = Tables(spark, sfDir).embeddings
      val n = emb.count()
      val cells = math.max(4L, (n + targetCellSize - 1) / targetCellSize)
      val kh = math.max(2, math.ceil(math.sqrt(cells.toDouble)).toInt)
      val ((corpus, c1, c2, cb), wBuild) = timed {
        val (c0, a, b, t) = Similarity.buildImiPqIndex(emb, kh, kh)
        (c0.localCheckpoint(), a.localCheckpoint(), b.localCheckpoint(), t)
      }
      println(s"""{"metric":"imipq_trained","leg":"build","wall_sec":${fmt(wBuild)},""" +
        s""""n_corpus":$n,"k_half":$kh,$tag}""")
      val (rows, wSearch) = timed(Similarity.annImiPqSearch(
        corpus, c1, c2, kh, cb, k, numQueries, nProbe = 2).collect().length)
      println(s"""{"metric":"imipq_trained","leg":"search","wall_sec":${fmt(wSearch)},""" +
        s""""rows":$rows,$tag}""")
      val batch = emb.filter(col("vec_id") % 5 === 4)
      val (nApp, wAppend) = timed(Similarity.appendToImiPqIndex(
        batch, c1, c2, kh, cb).count())
      println(s"""{"metric":"imipq_trained","leg":"append","wall_sec":${fmt(wAppend)},""" +
        s""""rows":$nApp,$tag}""")
      leg("imipq_trained_r50")(Similarity.annImiPqSearch(
        corpus, c1, c2, kh, cb, k, numQueries, nProbe = 2))
    }
    spark.stop()
  }
}

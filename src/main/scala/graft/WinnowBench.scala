package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Winnow-overlap copy-scaling measurement (round 14) — the numbers
  * behind the SCALING report's reading of the C11 family's honest
  * worst case: a corpus carrying C near-copies of everything has
  * O(C²) TRUE overlapping pairs, so the pairwise report's OUTPUT
  * (not any algorithmic defect) grows quadratically in C, and at 30
  * copies the exact run exhausts the single-JVM heap. The measured
  * rescue is the paper's own `maxDf` ubiquity suppression
  * ([[graft.operators.Dedup.winnowOverlap]]): with fingerprints
  * present in more than maxDf documents suppressed as template
  * evidence, the same corpora pair tractably and the report answers
  * the question a 30×-duplicated corpus actually poses (what overlaps
  * BESIDES the ubiquitous copies).
  *
  * Legs: exact at 1×/3×/10× (the quadratic curve), suppressed
  * (maxDf = 16) at 10× and 30×. One JSON line per leg:
  * `{"leg":…,"copies":…,"maxDf":…,"pairs":…,"wall_sec":…}`.
  *
  * Usage: `runMain graft.WinnowBench DIR1X DIR3X DIR10X DIR30X
  * [DIR100X]` (document parquet dirs from dev/make_docs_scale.py;
  * the optional fifth dir adds the round-16 100× legs). */
object WinnowBench {
  def main(args: Array[String]): Unit = {
    GraftSession.warnHugeHeap("WinnowBench")
    require(args.length == 4 || args.length == 5,
      "usage: WinnowBench DIR1X DIR3X DIR10X DIR30X [DIR100X]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup
    def leg(name: String, dir: String, copies: Int, maxDf: Option[Long]): Unit = {
      val docs = spark.read.parquet(dir + "/documents.parquet")
        .select(col("doc_id"), col("text"))
      val t0 = System.nanoTime()
      val pairs = Dedup.winnowOverlap(docs, maxDf = maxDf).count()
      val w = math.round((System.nanoTime() - t0) / 1e6) / 1e3
      println(s"""{"leg":"$name","copies":$copies,"maxDf":${maxDf.getOrElse(-1L)},"pairs":$pairs,"wall_sec":$w}""")
      System.out.flush()
    }
    // day-2 legs: FIXED batch (the 1× corpus's 20% slice) against a
    // GROWING persisted index — the incremental-ingest claim is that
    // probe cost follows the batch and its true matches, never the
    // corpus (which the bucketed-on-h layout joins exchange-free).
    // Timed per leg: span probe (q155 shape) and the composed clean
    // ingest (q156 shape), search-only — the index build is outside.
    def probeLeg(name: String, corpusDir: String, copies: Int): Unit = {
      val corpus = spark.read.parquet(corpusDir + "/documents.parquet")
        .select(col("doc_id"), col("text")).filter(col("doc_id") % 5 =!= 4)
      val batch = spark.read.parquet(args(0) + "/documents.parquet")
        .select(col("doc_id"), col("text")).filter(col("doc_id") % 5 === 4)
        .localCheckpoint()
      val tbl = s"winnow_bench_idx_$name"
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      graft.sources.Bucketing.writeBucketed(
        Dedup.buildWinnowIndex(corpus), tbl, Seq("h"), 32)
      val idx = spark.table(tbl)
      val t0 = System.nanoTime()
      val spans = Dedup.winnowSpansAgainstIndex(batch, idx).count()
      val w1 = math.round((System.nanoTime() - t0) / 1e6) / 1e3
      val t1 = System.nanoTime()
      val cleaned = Dedup.winnowCleanAgainstIndex(batch, idx)
        .filter(col("n_spans") > 0).count()
      val w2 = math.round((System.nanoTime() - t1) / 1e6) / 1e3
      println(s"""{"leg":"probe_$name","copies":$copies,"spans":$spans,"span_wall_sec":$w1,"cleaned_docs":$cleaned,"clean_wall_sec":$w2}""")
      System.out.flush()
    }
    // guard leg (round 15): the exact one-shot run at 30× copies used
    // to exhaust the heap mid-aggregation; the pre-flight pair budget
    // must now refuse BEFORE the pair join launches — timed, with the
    // refusal's estimated candidate volume surfaced
    def guardLeg(name: String, dir: String, copies: Int): Unit = {
      val docs = spark.read.parquet(dir + "/documents.parquet")
        .select(col("doc_id"), col("text"))
      val t0 = System.nanoTime()
      val outcome =
        try {
          val p = Dedup.winnowOverlap(docs).count()
          s""""pairs":$p,"refused":false"""
        } catch { case e: IllegalStateException =>
          val vol = "materialize (\\d+)".r.findFirstMatchIn(e.getMessage)
            .map(_.group(1)).getOrElse("-1")
          s""""est_pairs":$vol,"refused":true"""
        }
      val w = math.round((System.nanoTime() - t0) / 1e6) / 1e3
      println(s"""{"leg":"$name","copies":$copies,$outcome,"wall_sec":$w}""")
      System.out.flush()
    }
    // SPARK_GRAFT_WINNOW_LEGS: comma list of leg names to run
    // (prefix match); unset = all legs
    val only = sys.env.get("SPARK_GRAFT_WINNOW_LEGS")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    def want(name: String): Boolean = only.forall(_.exists(name.startsWith))
    if (want("exact_1x")) leg("exact_1x", args(0), 1, None)
    if (want("exact_3x")) leg("exact_3x", args(1), 3, None)
    if (want("exact_10x")) leg("exact_10x", args(2), 10, None)
    if (want("maxdf_10x")) leg("maxdf_10x", args(2), 10, Some(16L))
    if (want("maxdf_30x")) leg("maxdf_30x", args(3), 30, Some(16L))
    if (want("probe_1x")) probeLeg("1x", args(0), 1)
    if (want("probe_10x")) probeLeg("10x", args(2), 10)
    if (want("guard_30x")) guardLeg("guard_30x", args(3), 30)
    // round 16: an optional fifth dir extends the curve to 100× — the
    // guard must still refuse pre-flight (naming the exact volume) and
    // the suppressed run must still pair tractably
    if (args.length > 4) {
      if (want("guard_100x")) guardLeg("guard_100x", args(4), 100)
      if (want("maxdf_100x")) leg("maxdf_100x", args(4), 100, Some(16L))
      if (want("probe_100x")) probeLeg("100x", args(4), 100)
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** IMI probe-side recall-knob measurement (round 14) — the wall-clock
  * and recall numbers behind the SCALING report's claim that nProbe=2
  * probing buys back the √cells assignment's boundary-pair recall at a
  * cost ≪ the flat path's O(n·cells) scoring.
  *
  * The q98 convention at the IMI tier: 80/20 split of the documents
  * corpus — the 80 % side embeds and builds the TRAINED two-level index
  * (q138's auto-sizing: cells = corpus / targetCellSize, k1 = k2 =
  * ⌈√cells⌉), the 20 % side embeds and probes it through
  * [[graft.operators.Similarity.semanticDedupAgainstImiIndex]] at
  * nProbe = 1 and nProbe = 2, plus the FLAT reference
  * ([[graft.operators.Similarity.semanticDedupAgainstIndexAssigned]] on
  * a flat index of the same cell count) as the recall ceiling at this
  * threshold. Prints one JSON line per leg: wall seconds + dup count —
  * recall shortfall is (flat dups − IMI dups).
  *
  * Usage: `SPARK_GRAFT_SF_DIR=… runMain graft.ProbeBench
  * [targetCellSize] [threshold]`. */
object ProbeBench {
  def main(args: Array[String]): Unit = {
    GraftSession.warnHugeHeap("ProbeBench")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val targetCellSize = args.headOption.map(_.toInt).getOrElse(125)
    val threshold = args.lift(1).map(_.toDouble).getOrElse(0.92)
    val spark = GraftSession.configure(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{Similarity, TextEmbed}
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    def fmt(d: Double) = math.round(d * 1000) / 1000.0

    val docs = Tables(spark, sfDir).documents
    val corpus = TextEmbed.embedDocuments(
      docs.filter(col("doc_id") % 5 =!= 4), dims = 60)
    val batch = TextEmbed.embedDocuments(
      docs.filter(col("doc_id") % 5 === 4), dims = 60)
    val e = Similarity.prepVectors(corpus).localCheckpoint()
    val n = e.count()
    val cells = math.max(4L, math.min(
      (n + targetCellSize - 1) / targetCellSize, 16384 / 2L))
    val k = math.max(2, math.ceil(math.sqrt(cells.toDouble)).toInt)

    // build once (untimed vs the probes — index builds are one-time)
    val (assigned0, c1, c2) = graft.operators.Similarity
      .buildTwoLevelFrom(e, n, k, k, 42L, 16384)
    val assigned = assigned0.localCheckpoint()
    val batchP = batch.localCheckpoint()

    def leg(name: String, dups: => Long): Unit = {
      val (d, w) = timed(dups)
      println(s"""{"metric":"$name","wall_sec":${fmt(w)},"dups":$d,""" +
        s""""cells":$cells,"k_half":$k,"n_corpus":$n,""" +
        s""""sf_dir":"${sfDir.takeRight(24)}"}""")
    }
    leg("imi_probe_np1", Similarity.semanticDedupAgainstImiIndex(
      batchP, assigned, c1, c2, k, threshold, nProbe = 1)
      .filter(col("is_dup")).count())
    leg("imi_probe_np2", Similarity.semanticDedupAgainstImiIndex(
      batchP, assigned, c1, c2, k, threshold, nProbe = 2)
      .filter(col("is_dup")).count())
    // flat reference: same corpus, same cell count, flat sampled build
    val (flatAssigned0, flatCents) =
      Similarity.buildIvfIndexSampled(corpus, cells.toInt)
    val flatAssigned = flatAssigned0.localCheckpoint()
    leg("flat_probe", Similarity.semanticDedupAgainstIndexAssigned(
      Similarity.appendToIvfIndex(batchP, flatCents), flatAssigned, threshold)
      .filter(col("is_dup")).count())
    spark.stop()
  }
}

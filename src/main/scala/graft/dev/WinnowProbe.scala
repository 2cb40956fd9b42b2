package graft.dev

import graft.GraftSession
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev tool (r19): compare island-pipeline formulations for the winnow
  * span tier — V0 (current: (a,b,diag) window + 14.7M-group hash agg)
  * vs V1 (one doc_a-grain window, islands emitted at run ends, no
  * giant hash agg) — and the orderBy range-sampling double-execution
  * fix. Asserts V0 == V1 row-for-row before timing. */
object WinnowProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[winnowprobe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val k = 12; val w = 4; val minPrints = 3L
    val docs = graft.operators.Dedup.donorPlantedText(
      graft.Tables(spark, sfDir).documents)
    val fp = timed("fingerprints+checkpoint") {
      graft.operators.Dedup.winnowFingerprints(docs).localCheckpoint()
    }
    val pts = timed("pts join+checkpoint") {
      fp.as("a").join(fp.as("b"),
          col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          col("a.pos").as("pa"), (col("b.pos") - col("a.pos")).as("diag"))
        .localCheckpoint()
    }

    // V0: the current shape
    def v0(p: DataFrame): DataFrame = {
      val wDiag = Window.partitionBy(col("doc_a"), col("doc_b"), col("diag"))
        .orderBy(col("pa"))
      val wRun = wDiag.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      p.withColumn("brk",
          when(col("pa") - lag(col("pa"), 1).over(wDiag) > w, 1).otherwise(0))
        .withColumn("isl", sum(col("brk")).over(wRun))
        .groupBy(col("doc_a"), col("doc_b"), col("diag"), col("isl"))
        .agg(min(col("pa")).as("a_start"), (max(col("pa")) + (k - 1)).as("a_end"),
          count(lit(1)).as("n_prints"))
        .filter(col("n_prints") >= minPrints)
        .select(col("doc_a"), col("doc_b"), col("diag"),
          col("a_start"), col("a_end"), col("n_prints"))
    }

    // V1: one doc_a-grain window; island rows emitted at run ends
    def v1(p: DataFrame): DataFrame = {
      val wA = Window.partitionBy(col("doc_a"))
        .orderBy(col("doc_b"), col("diag"), col("pa"))
      val wRun = wA.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val newRun =
        lag(col("doc_b"), 1).over(wA).isNull ||
        col("doc_b") =!= lag(col("doc_b"), 1).over(wA) ||
        col("diag") =!= lag(col("diag"), 1).over(wA) ||
        col("pa") - lag(col("pa"), 1).over(wA) > w
      p.withColumn("rn", row_number().over(wA))
        .withColumn("brk", when(newRun, 1L).otherwise(0L))
        .withColumn("isl", sum(col("brk")).over(wRun))
        .withColumn("st", max(when(col("brk") === 1,
          struct(col("isl"), col("pa"), col("rn")))).over(wRun))
        .withColumn("last", coalesce(lead(col("brk"), 1).over(wA), lit(1L)))
        .filter(col("last") === 1)
        .select(col("doc_a"), col("doc_b"), col("diag"),
          col("st.pa").as("a_start"), (col("pa") + (k - 1)).as("a_end"),
          (col("rn") - col("st.rn") + 1).cast("long").as("n_prints"))
        .filter(col("n_prints") >= minPrints)
    }

    sys.env.getOrElse("WINNOW_MODE", "check") match {
      case "check" =>
        timed("v0 == v1 check") {
          val d1 = v0(pts).exceptAll(v1(pts)).count()
          val d2 = v1(pts).exceptAll(v0(pts)).count()
          println(s"[winnowprobe] diff v0\\v1=$d1 v1\\v0=$d2")
          require(d1 == 0 && d2 == 0, "V1 formulation drifted from V0!")
        }
      case "v0cold" =>
        (1 to 2).foreach { i =>
          timed(s"V0+orderBy it$i") {
            v0(pts).orderBy(col("doc_a"), col("doc_b"), col("a_start"))
              .write.format("noop").mode("overwrite").save()
          }
        }
      case "v1cold" =>
        (1 to 2).foreach { i =>
          timed(s"V1+ckpt+orderBy it$i") {
            v1(pts).localCheckpoint()
              .orderBy(col("doc_a"), col("doc_b"), col("a_start"))
              .write.format("noop").mode("overwrite").save()
          }
        }
    }
    spark.stop()
  }
}

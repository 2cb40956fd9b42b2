package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** E7: multi-dimensional Z-ORDER layout clustering — the
  * `OPTIMIZE ZORDER BY` capability of the lakehouse table formats
  * (Delta Lake, Iceberg `sort_order` with a z-curve transform),
  * re-expressed as a plain-parquet layout pass.
  *
  * WHY at 100 TB: a linear sort gives file-level min/max pruning on
  * ONE column only — sort by crawl date and a "host = x" query still
  * scans every file. Interleaving the bits of d rank-normalized
  * columns (Morton 1966 — the z-curve) makes file ranges compact in
  * EVERY dimension at once: a z-prefix bucket of 2^k cells constrains
  * the top k/d bits of EACH column, so a single-column predicate
  * touches ~2^(-k/d) of the files instead of all of them. The curve is
  * pure integer arithmetic (scale to a 2^bits grid, interleave bits),
  * so the whole layout pass is one tiny min/max aggregate, a map-only
  * projection, and one shuffle on the bucket key — no sampling, no
  * driver-side sort, deterministic under retries (unlike
  * `repartitionByRange`, whose sampled boundaries vary run to run).
  *
  * The written layout is self-describing: `zbucket` is a DIRECTORY
  * partition column, so any reader's `zbucket IN (…)` filter is
  * directory-level pruning with zero custom machinery, and
  * [[zoneMap]] / [[prunedScan]] give the zone-map consult a reader
  * runs before touching data (the bounded ≤2^fileBits zone-map rows
  * collect to the driver — the same contract as every file index).
  */
object Layout {

  /** Interleave the low `bits` bits of each coordinate into one long
    * (Morton/z-curve): coordinate j's bit i lands at output position
    * `i·d + j`, so coords(0) holds the LEAST-significant lane and
    * coords(d−1) the most. Coordinates must already sit on the
    * [0, 2^bits) grid ([[zorderFrame]] puts them there); d·bits ≤ 62
    * keeps the value a positive long. Disjoint target bits make the
    * sum an OR — the whole expression is `d·bits` shift/and terms,
    * codegen'd map-only. */
  def zValue(coords: Seq[Column], bits: Int): Column = {
    require(coords.size >= 2, s"z-order needs >= 2 columns, got ${coords.size}")
    require(bits >= 1 && bits <= 30, s"bits must be in 1..30, got $bits")
    require(coords.size * bits <= 62,
      s"${coords.size} cols x $bits bits exceeds the 62-bit long budget")
    val d = coords.size
    coords.zipWithIndex.flatMap { case (c, j) =>
      (0 until bits).map { i =>
        shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * d + j)
      }
    }.reduce(_ + _)
  }

  /** Scale each layout column to the [0, 2^bits) integer grid by
    * min/max range position and attach the interleaved `zvalue`:
    * grid = ((v − min) · 2^bits) div (max − min + 1) — exact integer
    * arithmetic as long as (max − min + 1) ≤ 2^(53−bits), because the
    * product then stays below 2^53 where the double quotient is exact
    * and its floor equals integer division on both this engine and
    * the oracle's; a wider range raises LOUDLY instead of silently
    * rounding (per-row `raise_error` guard on the broadcast min/max
    * row). One tiny d-column aggregate broadcasts to a map-only
    * projection — the corpus is never shuffled. Constant columns
    * (max = min) land on grid cell 0. */
  def zorderFrame(df: DataFrame, cols: Seq[String], bits: Int = 16): DataFrame = {
    require(cols.nonEmpty && cols.size >= 2,
      s"z-order needs >= 2 columns, got $cols")
    require(bits >= 1 && bits <= 30, s"bits must be in 1..30, got $bits")
    require(cols.size * bits <= 62,
      s"${cols.size} cols x $bits bits exceeds the 62-bit long budget")
    val aggs = cols.flatMap(c => Seq(
      min(col(c).cast("long")).as(s"_min_$c"),
      max(col(c).cast("long")).as(s"_max_$c")))
    val mm = df.agg(aggs.head, aggs.tail: _*)
    val maxRange = 1L << (53 - bits)
    val scaled = cols.foldLeft(df.crossJoin(broadcast(mm))) { (d, c) =>
      val range = col(s"_max_$c") - col(s"_min_$c") + lit(1L)
      d.withColumn(s"${c}_grid",
        when(range > lit(maxRange), raise_error(concat(
          lit(s"zorderFrame: range of '$c' ("), range.cast("string"),
          lit(s") exceeds 2^${53 - bits} — lower bits or pre-bucket the column")))
          .cast("long"))
        .otherwise(((col(c).cast("long") - col(s"_min_$c")) * lit(1L << bits)
          / range).cast("long")))
    }
    scaled
      .withColumn("zvalue", zValue(cols.map(c => col(s"${c}_grid")), bits))
      .drop(cols.flatMap(c => Seq(s"_min_$c", s"_max_$c")): _*)
  }

  /** Write `df` z-ordered on `cols` into 2^fileBits z-PREFIX buckets:
    * `zbucket = zvalue >> (d·bits − fileBits)` is a deterministic
    * map-side route (no sampled boundaries), each bucket is a compact
    * z-region — with fileBits = d·k, an axis-aligned box of side
    * 2^(bits−k) per dimension — and `partitionBy("zbucket")` makes the
    * region a DIRECTORY, so bucket pruning is ordinary partition
    * pruning for any reader. Rows sort by zvalue within buckets so
    * row-group min/max stay tight below the directory level. The one
    * shuffle is on the bucket key; at a fixed 2^fileBits ≪ cores the
    * write is intentionally few large files — raise fileBits with
    * data volume (the knob IS the file count). */
  def zorderWrite(df: DataFrame, cols: Seq[String], outDir: String,
                  fileBits: Int, bits: Int = 16): Unit = {
    require(fileBits >= 1 && fileBits <= cols.size * bits,
      s"fileBits must be in 1..${cols.size * bits}, got $fileBits")
    zorderFrame(df, cols, bits)
      .withColumn("zbucket", shiftright(col("zvalue"), cols.size * bits - fileBits))
      .repartition(col("zbucket"))
      .sortWithinPartitions(col("zbucket"), col("zvalue"))
      .write.mode(SaveMode.Overwrite).partitionBy("zbucket").parquet(outDir)
  }

  /** The zone map of a z-ordered layout: per-bucket min/max of each
    * layout column — ≤ 2^fileBits rows, the skipping index a reader
    * consults before touching data. Derived by scanning the layout's
    * own columns (parquet footers carry the same ranges; reading them
    * through a column scan keeps this engine-portable). Partition
    * columns come back as INT on read — cast before arithmetic. */
  def zoneMap(spark: SparkSession, dir: String, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c => Seq(
      min(col(c).cast("long")).as(s"min_$c"),
      max(col(c).cast("long")).as(s"max_$c")))
    spark.read.parquet(dir)
      .groupBy(col("zbucket").cast("long").as("zbucket"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Zone-map-pruned scan: read only the buckets whose [min, max]
    * range of `predCol` intersects [lo, hi], then apply the row-level
    * predicate. The surviving bucket list (bounded by 2^fileBits)
    * collects to the driver and becomes a partition-column IN filter —
    * directory pruning, the non-selected regions are never listed or
    * opened. Equivalent rows to a full-scan filter by construction
    * (the zone map over-approximates); the spec asserts both the
    * equivalence and the bucket count actually consulted. */
  def prunedScan(spark: SparkSession, dir: String, predCol: String,
                 lo: Long, hi: Long, zm: Option[DataFrame] = None): DataFrame = {
    val zones = zm.getOrElse(zoneMap(spark, dir, Seq(predCol)))
    val buckets = zones
      .filter(!(col(s"max_$predCol") < lo || col(s"min_$predCol") > hi))
      .select(col("zbucket")).collect().map(_.getLong(0))
    spark.read.parquet(dir)
      .filter(col("zbucket").cast("long").isin(buckets: _*))
      .filter(col(predCol).cast("long").between(lo, hi))
  }

  /** E7 `q149_zorder_layout` — the z-curve computation itself, oracle-
    * backed end to end on the documents corpus: x = text length,
    * y = doc_id (the "size × recency" layout a curator actually
    * wants: both "long documents" and "recent ingest" predicates
    * prune), bits = 16, 64 prefix buckets. Every output column is
    * exact integer arithmetic — min/max scaling, bit interleave,
    * prefix shift all replay as pure SQL in DuckDB, so a drifted bit
    * anywhere flips the hash. */
  def zorderDocs(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables(spark, dir).documents
      .select(col("doc_id"),
        length(col("text")).cast("long").as("_x"),
        col("doc_id").cast("long").as("_y"))
    zorderFrame(docs, Seq("_x", "_y"), bits = 16)
      .withColumn("zbucket", shiftright(col("zvalue"), 32 - 6))
      .select(col("doc_id"), col("_x_grid").as("x_grid"),
        col("_y_grid").as("y_grid"), col("zvalue"), col("zbucket"))
      .orderBy(col("zvalue"), col("doc_id"))
  }
}

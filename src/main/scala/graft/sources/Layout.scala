package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Perf

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

  /** Grid `df`'s layout columns onto a FROZEN [0, 2^bits) grid given
    * per-column (min, max) bounds — the increment path of the layout
    * family's frozen-state rule (the C4c vocabulary / C7 centroid
    * convention brought to LAYOUT): the grid is defined ONCE at build
    * and appends map onto it, because re-deriving min/max from
    * corpus + increment would re-grid every historical row (silent
    * whole-table drift). Values outside the frozen range CLAMP to the
    * grid edge: clamping only costs CLUSTERING for those rows (they
    * pile into edge buckets) — never correctness, because the zone
    * map ([[zoneMap]]) aggregates ACTUAL column values, so a bucket
    * holding clamped extremes advertises their true range and
    * [[prunedScan]] still finds them. Same exact-arithmetic window as
    * [[zorderFrame]], guarded loudly. */
  def frozenGridFrame(df: DataFrame, cols: Seq[String], bits: Int,
                      bounds: Seq[(Long, Long)]): DataFrame = {
    require(cols.size >= 2, s"z-order needs >= 2 columns, got $cols")
    require(cols.size == bounds.size,
      s"${cols.size} cols but ${bounds.size} bounds")
    require(bits >= 1 && bits <= 30, s"bits must be in 1..30, got $bits")
    require(cols.size * bits <= 62,
      s"${cols.size} cols x $bits bits exceeds the 62-bit long budget")
    val maxRange = 1L << (53 - bits)
    bounds.zip(cols).foreach { case ((lo, hi), c) =>
      require(hi >= lo, s"bound of '$c' is empty: [$lo, $hi]")
      require(hi - lo + 1 <= maxRange,
        s"frozenGridFrame: range of '$c' (${hi - lo + 1}) exceeds " +
          s"2^${53 - bits} — lower bits or pre-bucket the column")
    }
    val gridded = cols.zip(bounds).foldLeft(df) { case (d, (c, (lo, hi))) =>
      d.withColumn(s"${c}_grid",
        ((least(greatest(col(c).cast("long"), lit(lo)), lit(hi)) - lit(lo))
          * lit(1L << bits) / lit(hi - lo + 1L)).cast("long"))
    }
    gridded.withColumn("zvalue", zValue(cols.map(c => col(s"${c}_grid")), bits))
  }

  /** The frozen-grid contract riding the written layout itself: cols,
    * bits, fileBits and per-column bounds in the zvalue column's
    * metadata (the q71/winnow h-column convention — parquet round-trips
    * Spark column metadata, so the layout is self-describing and
    * [[appendZOrdered]] needs no sidecar file). */
  private def zorderMeta(cols: Seq[String], bits: Int, fileBits: Int,
                         bounds: Seq[(Long, Long)])
      : org.apache.spark.sql.types.Metadata = {
    val b = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("graft.zorder.bits", bits.toLong)
      .putLong("graft.zorder.fileBits", fileBits.toLong)
      .putString("graft.zorder.cols", cols.mkString(","))
    cols.zip(bounds).foreach { case (c, (lo, hi)) =>
      b.putLong(s"graft.zorder.min_$c", lo)
      b.putLong(s"graft.zorder.max_$c", hi)
    }
    b.build()
  }

  private def writeZOrdered(df: DataFrame, cols: Seq[String], outDir: String,
                            fileBits: Int, bits: Int,
                            bounds: Seq[(Long, Long)], mode: SaveMode): Unit =
    frozenGridFrame(df, cols, bits, bounds)
      .withMetadata("zvalue", zorderMeta(cols, bits, fileBits, bounds))
      .withColumn("zbucket", shiftright(col("zvalue"), cols.size * bits - fileBits))
      .repartition(col("zbucket"))
      .sortWithinPartitions(col("zbucket"), col("zvalue"))
      .write.mode(mode).partitionBy("zbucket").parquet(outDir)

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
    * data volume (the knob IS the file count).
    *
    * The build FREEZES its grid (round 14): per-column min/max land in
    * the zvalue column's metadata, and [[appendZOrdered]] grows the
    * layout under exactly that grid. */
  def zorderWrite(df: DataFrame, cols: Seq[String], outDir: String,
                  fileBits: Int, bits: Int = 16): Unit = {
    require(fileBits >= 1 && fileBits <= cols.size * bits,
      s"fileBits must be in 1..${cols.size * bits}, got $fileBits")
    val aggs = cols.flatMap(c => Seq(
      min(col(c).cast("long")).as(s"_min_$c"),
      max(col(c).cast("long")).as(s"_max_$c")))
    val mm = df.agg(aggs.head, aggs.tail: _*).first()
    require(!mm.anyNull, "zorderWrite needs a nonempty frame to derive its grid")
    val bounds = cols.indices.map(i => (mm.getLong(2 * i), mm.getLong(2 * i + 1)))
    writeZOrdered(df, cols, outDir, fileBits, bits, bounds, SaveMode.Overwrite)
  }

  /** E8: grow a z-ordered layout INCREMENTALLY — the `OPTIMIZE ZORDER`
    * maintenance problem at ingest: day-2 data must land in the same
    * multi-dimensional clustering WITHOUT rewriting (or even reading)
    * the existing data. The layout's own metadata carries the frozen
    * grid ([[zorderWrite]] stored it), so the increment grids, routes
    * and sorts EXACTLY like the build did — one pass over the
    * increment only, appended as new files under the same zbucket
    * directories; readers, [[zoneMap]] and [[prunedScan]] are
    * unchanged because the layout stays self-describing. Out-of-range
    * values clamp to the frozen grid's edge ([[frozenGridFrame]]'s
    * documented trade: clustering, never correctness). Fails loudly on
    * a layout written without grid metadata or an increment missing a
    * layout column. */
  def appendZOrdered(spark: SparkSession, dir: String,
                     increment: DataFrame): Unit = {
    val (cols, bits, fileBits, bounds) = readZorderMeta(spark, dir)
    cols.foreach(c => require(increment.columns.contains(c),
      s"increment is missing layout column '$c'"))
    writeZOrdered(increment, cols, dir, fileBits, bits, bounds, SaveMode.Append)
  }

  /** Route an increment onto `dir`'s frozen grid WITHOUT writing —
    * the increment plus its `zvalue`/`zbucket` under exactly the grid
    * [[appendZOrdered]] would use. The D2v replay-pruning consult
    * rides this: a re-delivered row re-routes to the SAME bucket
    * deterministically, so an anti-join against only the touched
    * buckets' ids is exact while reading a batch-bounded slice of the
    * layout instead of the whole id column. */
  def routeZBuckets(spark: SparkSession, dir: String,
                    increment: DataFrame): DataFrame = {
    val (cols, bits, fileBits, bounds) = readZorderMeta(spark, dir)
    cols.foreach(c => require(increment.columns.contains(c),
      s"increment is missing layout column '$c'"))
    frozenGridFrame(increment, cols, bits, bounds)
      .withColumn("zbucket",
        shiftright(col("zvalue"), cols.size * bits - fileBits))
  }

  /** Read the frozen-grid contract back off a written layout —
    * (cols, bits, fileBits, per-column bounds) — failing loudly on a
    * directory that is not a self-describing z-ordered layout. */
  private def readZorderMeta(spark: SparkSession, dir: String)
      : (Seq[String], Int, Int, Seq[(Long, Long)]) = {
    val zf = spark.read.parquet(dir).schema.fields.find(_.name == "zvalue")
      .getOrElse(throw new IllegalArgumentException(
        s"$dir carries no zvalue column — not a z-ordered layout"))
    require(zf.metadata.contains("graft.zorder.bits"),
      s"$dir carries no frozen grid — rebuild it with this round's zorderWrite")
    val md = zf.metadata
    val bits = md.getLong("graft.zorder.bits").toInt
    val fileBits = md.getLong("graft.zorder.fileBits").toInt
    val cols = md.getString("graft.zorder.cols").split(",").toSeq
    val bounds = cols.map(c =>
      (md.getLong(s"graft.zorder.min_$c"), md.getLong(s"graft.zorder.max_$c")))
    (cols, bits, fileBits, bounds)
  }

  /** E8b: grid-DRIFT meter — per layout column, how much of the table
    * now lies OUTSIDE the frozen grid ([[appendZOrdered]] clamped those
    * rows to edge cells, piling them into ever-fatter edge buckets).
    * Clamping never costs correctness (zone maps aggregate actual
    * values), but accumulated clamp mass degrades CLUSTERING — the
    * pruned scan reads a widening edge bucket — with nothing to say so
    * until this meter: one aggregation over the layout (counts below /
    * above the frozen bound, actual min/max), one row per column,
    * clamp_bp in exact integer basis points. Read it on the
    * maintenance schedule; past a budget, run [[regridZOrdered]]. */
  def zorderDrift(spark: SparkSession, dir: String): DataFrame = {
    val (cols, _, _, bounds) = readZorderMeta(spark, dir)
    gridDrift(spark.read.parquet(dir), cols, bounds)
  }

  /** The drift computation itself, frame-side (shared by
    * [[zorderDrift]] and the q166 oracle row): clamp counts and actual
    * ranges of `cols` against frozen `bounds` — one aggregation to a
    * single row, exploded to one row per column. */
  def gridDrift(df: DataFrame, cols: Seq[String],
                bounds: Seq[(Long, Long)]): DataFrame = {
    require(cols.nonEmpty && cols.size == bounds.size,
      s"${cols.size} cols but ${bounds.size} bounds")
    val aggs = cols.zip(bounds).zipWithIndex.flatMap { case ((c, (lo, hi)), i) => Seq(
      sum(when(col(c).cast("long") < lit(lo), 1L).otherwise(0L)).as(s"_lo_$i"),
      sum(when(col(c).cast("long") > lit(hi), 1L).otherwise(0L)).as(s"_hi_$i"),
      min(col(c).cast("long")).as(s"_mn_$i"),
      max(col(c).cast("long")).as(s"_mx_$i"))
    } :+ count(lit(1)).as("_n")
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.zip(bounds).zipWithIndex.map { case ((c, (lo, hi)), i) =>
        struct(lit(c).as("col_name"), col("_n").as("n_rows"),
          col(s"_lo_$i").as("n_clamped_lo"), col(s"_hi_$i").as("n_clamped_hi"),
          expr(s"CAST(((_lo_$i + _hi_$i) * 10000) DIV _n AS BIGINT)").as("clamp_bp"),
          lit(lo).as("frozen_min"), lit(hi).as("frozen_max"),
          col(s"_mn_$i").as("data_min"), col(s"_mx_$i").as("data_max"))
      }: _*)).as("d"))
      .select(col("d.*"))
      .transform(d => Perf.sortedOnce(d, col("col_name")))
  }

  /** E8b: heal grid drift — re-derive fresh per-column bounds from the
    * data actually present (the build rule re-run over build + every
    * append) and REWRITE the layout under the new frozen grid, so
    * clamped edge mass spreads back over real cells and pruned-scan
    * selectivity is restored. The E3/E6 staged-then-rename protocol:
    * write `dir__regrid` completely, rename the live layout aside to
    * `dir__old`, rename the staging in, drop the old — a crash at any
    * point leaves either the old or the new COMPLETE layout reachable
    * (recovery is one rename, never a data loss). [[appendZOrdered]]
    * keeps working afterwards: the rewrite re-freezes its (new) grid in
    * the column metadata. */
  def regridZOrdered(spark: SparkSession, dir: String): Unit = {
    reclaimRegridCrash(spark, dir)
    val (cols, bits, fileBits, _) = readZorderMeta(spark, dir)
    val derived = cols.map(c => s"${c}_grid") ++ Seq("zvalue", "zbucket")
    // materialized before the swap: the rewrite reads the very files
    // the renames retire
    val data = spark.read.parquet(dir).drop(derived: _*).localCheckpoint()
    val aggs = cols.flatMap(c => Seq(
      min(col(c).cast("long")).as(s"_min_$c"),
      max(col(c).cast("long")).as(s"_max_$c")))
    val mm = data.agg(aggs.head, aggs.tail: _*).first()
    require(!mm.anyNull, "regridZOrdered needs a nonempty layout")
    val bounds = cols.indices.map(i => (mm.getLong(2 * i), mm.getLong(2 * i + 1)))
    val live = new org.apache.hadoop.fs.Path(dir)
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(dir + "__regrid")
    val old = new org.apache.hadoop.fs.Path(dir + "__old")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    if (fs.exists(old)) fs.delete(old, true)
    writeZOrdered(data, cols, tmp.toString, fileBits, bits, bounds,
      SaveMode.Overwrite)
    require(fs.rename(live, old), s"regrid: could not rename $dir aside")
    require(fs.rename(tmp, live), s"regrid: could not install the new layout")
    fs.delete(old, true)
  }

  /** Self-heal the one crash window [[regridZOrdered]] leaves open:
    * between rename(live→old) and rename(tmp→live) the canonical dir
    * is ABSENT while `dir__old` holds the complete pre-regrid layout.
    * Recovery is a single rename back (the staging dir, possibly
    * complete but unproven, is dropped and the regrid simply re-runs)
    * — the same reclaim spirit as the leftover-`__old` delete on
    * entry. Called on entry by [[regridZOrdered]] and
    * [[maintainZOrdered]], so the next scheduled pass heals instead of
    * failing at the meta read. */
  private def reclaimRegridCrash(spark: SparkSession, dir: String): Unit = {
    val live = new org.apache.hadoop.fs.Path(dir)
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = new org.apache.hadoop.fs.Path(dir + "__old")
    if (!fs.exists(live) && fs.exists(old))
      require(fs.rename(old, live),
        s"regrid reclaim: could not rename $old back to $dir")
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

  /** E8b: the SCHEDULABLE maintenance entry (the E6 `compactBucketed`
    * convention at the layout): meter first, heal only past the
    * budget — an idempotent no-op on a healthy layout, so it can run
    * on a schedule next to the compactor.
    * @return true when a re-grid rewrite happened */
  def maintainZOrdered(spark: SparkSession, dir: String,
                       driftBudgetBp: Long = 100L): Boolean = {
    require(driftBudgetBp >= 0, s"driftBudgetBp must be >= 0, got $driftBudgetBp")
    reclaimRegridCrash(spark, dir)
    val worst = zorderDrift(spark, dir)
      .agg(max(col("clamp_bp"))).first().getLong(0)
    if (worst <= driftBudgetBp) false
    else { regridZOrdered(spark, dir); true }
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
      .transform(d => Perf.sortedOnce(d, col("zvalue"), col("doc_id")))
  }

  /** E8 `q160_zorder_append` — the frozen-grid increment computation,
    * oracle-backed: the q152 80/20 split freezes the grid on the
    * corpus slice (doc_id % 5 ≠ 4) and grids the batch under those
    * bounds. The corpus max doc_id is ≡ 4 (mod 5) whenever it exists,
    * so the batch's top ids exceed the frozen y-range at every SF and
    * the CLAMP leg provably fires; the oracle replays bounds,
    * clamping, grid scaling, the bit interleave and the prefix shift
    * as pure SQL. */
  def zorderAppendDocs(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables(spark, dir).documents
      .select(col("doc_id"),
        length(col("text")).cast("long").as("_x"),
        col("doc_id").cast("long").as("_y"))
      .localCheckpoint() // forked: frozen bounds + the batch side
    val mm = docs.filter(col("doc_id") % 5 =!= 4)
      .agg(min(col("_x")), max(col("_x")), min(col("_y")), max(col("_y")))
      .first()
    val bounds = Seq((mm.getLong(0), mm.getLong(1)),
      (mm.getLong(2), mm.getLong(3)))
    frozenGridFrame(docs.filter(col("doc_id") % 5 === 4),
        Seq("_x", "_y"), bits = 16, bounds)
      .withColumn("zbucket", shiftright(col("zvalue"), 32 - 6))
      .select(col("doc_id"), col("_x_grid").as("x_grid"),
        col("_y_grid").as("y_grid"), col("zvalue"), col("zbucket"))
      .transform(d => Perf.sortedOnce(d, col("zvalue"), col("doc_id")))
  }

  /** E8b `q166_zorder_drift` — the drift METER on the q160 scenario,
    * oracle-backed: bounds freeze on the corpus slice (doc_id % 5 ≠ 4)
    * and the meter reads the WHOLE table (corpus + appended batch).
    * The y (doc_id) column provably drifts at every SF — the global
    * max doc_id is batch-side, so n_clamped_hi ≥ 1 — while x (text
    * length) usually reads zero clamp: both the firing and the quiet
    * leg of the meter hash-check against pure SQL. */
  def zorderDriftDocs(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables(spark, dir).documents
      .select(col("doc_id"),
        length(col("text")).cast("long").as("_x"),
        col("doc_id").cast("long").as("_y"))
      .localCheckpoint() // forked: frozen bounds + the metered union
    val mm = docs.filter(col("doc_id") % 5 =!= 4)
      .agg(min(col("_x")), max(col("_x")), min(col("_y")), max(col("_y")))
      .first()
    val bounds = Seq((mm.getLong(0), mm.getLong(1)),
      (mm.getLong(2), mm.getLong(3)))
    gridDrift(docs, Seq("_x", "_y"), bounds)
  }
}

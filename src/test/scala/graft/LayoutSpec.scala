package graft

import org.apache.spark.sql.functions._
import graft.sources.Layout

class LayoutSpec extends SparkSpecBase {
  import spark.implicits._

  test("zValue: hand-computed bit interleave, 2-dim and 3-dim") {
    // x = 101b, y = 011b, bits = 3: output bit i*2 takes x's bit i,
    // i*2+1 takes y's bit i -> x0=1(b0) y0=1(b1) x1=0(b2) y1=1(b3)
    // x2=1(b4) y2=0(b5) = 1+2+8+16 = 27
    val out = Seq((5L, 3L)).toDF("x", "y")
      .select(Layout.zValue(Seq(col("x"), col("y")), 3).as("z"))
      .as[Long].head()
    assert(out == 27L, s"interleave(101, 011) = $out, want 27")
    // 3-dim, bits=1: (1,1,1) -> bits 0,1,2 all set
    val out3 = Seq((1L, 1L, 1L)).toDF("x", "y", "z")
      .select(Layout.zValue(Seq(col("x"), col("y"), col("z")), 1).as("v"))
      .as[Long].head()
    assert(out3 == 7L)
    // lane order: coords(0) holds the LSB
    val lane = Seq((1L, 0L)).toDF("x", "y")
      .select(Layout.zValue(Seq(col("x"), col("y")), 1).as("z"))
      .as[Long].head()
    assert(lane == 1L, "coords(0) must land on bit 0")
  }

  test("zorderFrame: exact grid scaling, constant column lands on cell 0, loud guards") {
    // x spans exactly the 16-cell grid at bits=4: grid == value
    val df = Seq((0L, 7L), (15L, 7L), (8L, 7L)).toDF("x", "c")
    val out = Layout.zorderFrame(df, Seq("x", "c"), bits = 4)
      .select(col("x"), col("x_grid"), col("c_grid")).as[(Long, Long, Long)]
      .collect().toMap2
    assert(out == Map(0L -> (0L, 0L), 15L -> (15L, 0L), 8L -> (8L, 0L)),
      s"got $out") // constant column c -> cell 0 everywhere
    intercept[IllegalArgumentException] {
      Layout.zorderFrame(df, Seq("x"), bits = 4)
    }
    intercept[IllegalArgumentException] {
      Layout.zorderFrame(df, Seq("x", "c"), bits = 32)
    }
    // range wider than 2^(53-bits) raises loudly instead of rounding
    val wide = Seq(0L, 1L << 50).toDF("x").withColumn("y", lit(1L))
    val ex = intercept[Exception] {
      Layout.zorderFrame(wide, Seq("x", "y"), bits = 4).collect()
    }
    assert(ex.getMessage.contains("exceeds"), s"got: ${ex.getMessage}")
  }

  test("zorderWrite: z-prefix buckets are axis-aligned boxes; zone-map scan prunes to the predicate's stripe") {
    // a full 32x32 grid at bits=5, fileBits=4 -> 16 buckets, each an
    // 8x8 box (top 2 bits of each dim fixed per bucket)
    val grid = (0 until 32).flatMap(x => (0 until 32).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y")
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString + "/layout"
    Layout.zorderWrite(grid, Seq("x", "y"), dir, fileBits = 4, bits = 5)
    val back = spark.read.parquet(dir)
      .groupBy(col("zbucket").cast("long").as("zbucket"))
      .agg(min("x").as("x0"), max("x").as("x1"),
        min("y").as("y0"), max("y").as("y1"), count(lit(1)).as("n"))
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(back.length == 16, s"want 16 buckets, got ${back.length}")
    back.foreach { case (b, x0, x1, y0, y1, n) =>
      assert(n == 64, s"bucket $b holds $n rows, want 64")
      assert(x1 - x0 == 7 && y1 - y0 == 7,
        s"bucket $b spans [$x0,$x1]x[$y0,$y1] — not an 8x8 box")
    }
    // a linear sort on x leaves y unconstrained per file — the z
    // layout's per-bucket y-span (7) is 4x tighter than y's range (31)
    val zm = Layout.zoneMap(spark, dir, Seq("x", "y"))
    assert(zm.count() == 16)
    // y-only predicate: the zone map must select exactly the 4 buckets
    // whose y-box intersects [0, 7], and the pruned rows must equal a
    // brute-force filter
    val hit = zm.filter(!(col("max_y") < 0 || col("min_y") > 7)).count()
    assert(hit == 4, s"zone map consulted $hit buckets for the y-stripe, want 4")
    val pruned = Layout.prunedScan(spark, dir, "y", 0L, 7L)
      .select(col("x").cast("long"), col("y").cast("long"))
      .as[(Long, Long)].collect().toSet
    val brute = grid.filter(col("y").between(0, 7))
      .as[(Long, Long)].collect().toSet
    assert(pruned == brute, "pruned scan must return exactly the predicate rows")
    assert(pruned.size == 32 * 8)
  }

  test("zorderDocs: q149 shape — grid bounds, bucket = top 6 bits, z recomputes from the grids") {
    val out = Layout.zorderDocs(spark, sfDir)
    val rows = out.as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, xg, yg, z, b) =>
      assert(xg >= 0 && xg < 65536 && yg >= 0 && yg < 65536)
      assert(b == (z >> 26), s"doc $id bucket $b != zvalue prefix ${z >> 26}")
      // recompute the interleave on the driver
      val want = (0 until 16).map(i =>
        (((xg >> i) & 1L) << (2 * i)) + (((yg >> i) & 1L) << (2 * i + 1))).sum
      assert(z == want, s"doc $id zvalue $z != recomputed $want")
    }
    // the output is z-sorted (the layout order IS the deliverable)
    assert(rows.map(_._4).sliding(2).forall(p => p.head <= p.last))
  }

  test("appendZOrdered: increments grid under the frozen bounds; clamped extremes still found") {
    val day1 = (0 until 16).flatMap(x => (0 until 16).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y")
    val dir = java.nio.file.Files.createTempDirectory("zappend").toString + "/layout"
    Layout.zorderWrite(day1, Seq("x", "y"), dir, fileBits = 4, bits = 4)
    // day-2: in-range rows + an extreme far past the frozen x-range
    val day2 = Seq((3L, 12L), (1000L, 5L)).toDF("x", "y")
    Layout.appendZOrdered(spark, dir, day2)
    val back = spark.read.parquet(dir)
    assert(back.count() == 258L, "the append never rewrites day-1 rows")
    // the in-range increment row lands in the SAME bucket as its day-1
    // twin — the frozen grid is what build-day used
    val bucketOf = back.filter(col("x") === 3 && col("y") === 12)
      .select(col("zbucket").cast("long")).distinct().as[Long].collect()
    assert(bucketOf.length == 1, s"increment twin co-locates: ${bucketOf.toSeq}")
    // the clamped extreme sits in an edge bucket but its TRUE value is
    // in the zone map, so a pruned scan still finds it
    val found = Layout.prunedScan(spark, dir, "x", 500L, 2000L)
      .select(col("x").cast("long")).as[Long].collect()
    assert(found.toSeq == Seq(1000L),
      s"clamping costs clustering, never correctness: ${found.toSeq}")
    // equivalence over the union for an ordinary range too
    val pruned = Layout.prunedScan(spark, dir, "y", 10L, 15L)
      .select(col("x").cast("long"), col("y").cast("long"))
      .as[(Long, Long)].collect().toSet
    assert(pruned == (0 until 16).flatMap(x => (10 until 16).map(y =>
      (x.toLong, y.toLong))).toSet + ((3L, 12L)), "pruned == brute over the union")
    // loud guards: a layout without grid metadata, a missing column
    val plain = java.nio.file.Files.createTempDirectory("zplain").toString + "/t"
    day1.withColumn("zvalue", lit(0L)).write.parquet(plain)
    intercept[IllegalArgumentException] {
      Layout.appendZOrdered(spark, plain, day2)
    }
    intercept[IllegalArgumentException] {
      Layout.appendZOrdered(spark, dir, day2.drop("y"))
    }
  }

  test("zorderAppendDocs: q160 shape — batch grids under corpus bounds, clamp leg fires") {
    val out = Layout.zorderAppendDocs(spark, sfDir)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty && out.forall(_._1 % 5 == 4), "batch rows only")
    // the corpus y-max is below the batch's top id, so the top batch
    // id must clamp to the frozen grid's LAST occupied cell — the cell
    // the corpus maximum itself sits on
    val docs = Tables(spark, sfDir).documents
      .filter(col("doc_id") % 5 =!= 4)
      .agg(min(col("doc_id")), max(col("doc_id"))).as[(Long, Long)].head()
    val (ymin, ymax) = docs
    val lastCell = (ymax - ymin) * 65536L / (ymax - ymin + 1L)
    val topId = out.map(_._1).max
    assert(topId > ymax, "the plant: the global max doc_id is batch-side")
    assert(out.filter(_._1 == topId).forall(_._3 == lastCell),
      s"the out-of-range id clamps to the corpus max's cell ($lastCell)")
  }

  test("zorderDrift + regridZOrdered: drifted appends trip the meter, the re-grid heals and restores selectivity") {
    val day1 = (0 until 16).flatMap(x => (0 until 16).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y")
    val dir = java.nio.file.Files.createTempDirectory("zregrid").toString + "/layout"
    Layout.zorderWrite(day1, Seq("x", "y"), dir, fileBits = 4, bits = 4)
    // a healthy layout meters clean
    val clean = Layout.zorderDrift(spark, dir)
      .select("col_name", "clamp_bp").as[(String, Long)].collect().toMap
    assert(clean == Map("x" -> 0L, "y" -> 0L), s"fresh layout drifts: $clean")
    // day-2 rows far past the frozen x-range: the meter must fire
    val day2 = (0 until 32).map(i => (1000L + i, (i % 16).toLong)).toDF("x", "y")
    Layout.appendZOrdered(spark, dir, day2)
    val drift = Layout.zorderDrift(spark, dir)
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(drift("x")._4 == 32L && drift("x")._5 == 1111L,
      s"32 of 288 rows clamped high = 1111 bp exactly: ${drift("x")}")
    assert(drift("x")._9 == 1031L, "actual max rides the meter")
    assert(drift("y")._5 == 0L, "the undrifted column stays quiet")
    // clamped mass piles into ONE edge bucket: the pruned scan for the
    // drifted range reads day-1 edge rows it doesn't want
    def consultedRows(lo: Long, hi: Long): Long = {
      val zm = Layout.zoneMap(spark, dir, Seq("x"))
      val buckets = zm.filter(!(col("max_x") < lo || col("min_x") > hi))
        .select(col("zbucket")).as[Long].collect()
      spark.read.parquet(dir)
        .filter(col("zbucket").cast("long").isin(buckets: _*)).count()
    }
    val before = consultedRows(1000L, 2000L)
    assert(before > 32L,
      s"pre-regrid the edge bucket mixes day-1 and clamped rows: $before")
    Layout.regridZOrdered(spark, dir)
    // healed: the meter reads zero, nothing was lost, appends still work
    val healed = Layout.zorderDrift(spark, dir)
      .select("col_name", "clamp_bp").as[(String, Long)].collect().toMap
    assert(healed == Map("x" -> 0L, "y" -> 0L), s"regrid must clear drift: $healed")
    assert(spark.read.parquet(dir).count() == 288L, "regrid preserves every row")
    val after = consultedRows(1000L, 2000L)
    assert(after == 32L,
      s"post-regrid the drifted range's buckets hold exactly its rows: $after")
    // pruned-scan equivalence survives the rewrite
    val pruned = Layout.prunedScan(spark, dir, "x", 1000L, 2000L)
      .select(col("x").cast("long")).as[Long].collect().sorted.toSeq
    assert(pruned == (1000L until 1032L).toSeq)
    // the re-frozen grid accepts increments under the NEW bounds
    Layout.appendZOrdered(spark, dir, Seq((500L, 3L)).toDF("x", "y"))
    assert(Layout.prunedScan(spark, dir, "x", 499L, 501L).count() == 1L)
  }

  test("maintainZOrdered: healthy no-op, drifted heals, schedulable twice") {
    val day1 = (0 until 16).flatMap(x => (0 until 16).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y")
    val dir = java.nio.file.Files.createTempDirectory("zmaint").toString + "/layout"
    Layout.zorderWrite(day1, Seq("x", "y"), dir, fileBits = 4, bits = 4)
    assert(!Layout.maintainZOrdered(spark, dir), "healthy layout must no-op")
    // 32 of 288 rows clamp = 1111 bp, past the 100 bp default budget
    Layout.appendZOrdered(spark, dir,
      (0 until 32).map(i => (1000L + i, (i % 16).toLong)).toDF("x", "y"))
    assert(Layout.maintainZOrdered(spark, dir), "drifted layout must rewrite")
    assert(spark.read.parquet(dir).count() == 288L, "heal preserves every row")
    assert(!Layout.maintainZOrdered(spark, dir),
      "the schedule's next tick is a no-op again")
    intercept[IllegalArgumentException] {
      Layout.maintainZOrdered(spark, dir, driftBudgetBp = -1L)
    }
  }

  test("regrid crash window: dir absent + dir__old present self-heals on the next maintenance tick") {
    val day1 = (0 until 16).flatMap(x => (0 until 16).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y")
    val dir = java.nio.file.Files.createTempDirectory("zreclaim").toString + "/layout"
    Layout.zorderWrite(day1, Seq("x", "y"), dir, fileBits = 4, bits = 4)
    Layout.appendZOrdered(spark, dir,
      (0 until 32).map(i => (1000L + i, (i % 16).toLong)).toDF("x", "y"))
    // simulate the crash between rename(live→old) and rename(tmp→live):
    // the canonical dir is gone, the complete pre-regrid layout sits aside
    val live = new org.apache.hadoop.fs.Path(dir)
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(live, new org.apache.hadoop.fs.Path(dir + "__old")))
    // the next scheduled tick reclaims, meters the drift, and heals —
    // instead of failing at the meta read
    assert(Layout.maintainZOrdered(spark, dir),
      "reclaimed layout still carries the drift and must rewrite")
    assert(spark.read.parquet(dir).count() == 288L, "reclaim loses nothing")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir + "__old")))
    assert(!Layout.maintainZOrdered(spark, dir), "healed tick no-ops")
  }

  test("zorderDriftDocs: q166 shape — y drifts by the plant, clamp_bp is exact") {
    val out = Layout.zorderDriftDocs(spark, sfDir)
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out.keySet == Set("_x", "_y"))
    val y = out("_y")
    assert(y._4 >= 1L, "the global max doc_id is batch-side, so y clamps high")
    assert(y._5 == (y._3 + y._4) * 10000L / y._2, "clamp_bp is exact integer bp")
    assert(y._9 > y._7, "actual y max exceeds the frozen bound")
  }

  private implicit class ToMap2(rows: Array[(Long, Long, Long)]) {
    def toMap2: Map[Long, (Long, Long)] =
      rows.map { case (k, a, b) => k -> (a, b) }.toMap
  }
}

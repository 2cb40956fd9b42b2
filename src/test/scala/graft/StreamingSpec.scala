package graft

import graft.streaming.EventsStream
import graft.streaming.EventsStream.StreamEvent
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamingSpec extends SparkSpecBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("D1: windowed rollup with watermark aggregates per hour/type") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[StreamEvent]
    val q = EventsStream.hourlyRollup(mem.toDF(), watermark = "2 hours")
      .writeStream.format("memory").queryName("d1_out").outputMode("complete").start()
    try {
      mem.addData(
        StreamEvent(1, ts("2024-01-01 10:05:00"), 1, "click", 1.0),
        StreamEvent(2, ts("2024-01-01 10:45:00"), 2, "click", 2.0),
        StreamEvent(3, ts("2024-01-01 11:05:00"), 1, "view", 5.0))
      q.processAllAvailable()
      val rows = spark.table("d1_out")
        .select(col("hour_start").cast("string"), col("event_type"), col("n_events"), col("total_value"))
        .as[(String, String, Long, Double)].collect().toSet
      assert(rows == Set(
        ("2024-01-01 10:00:00", "click", 2L, 3.0),
        ("2024-01-01 11:00:00", "view", 1L, 5.0)))
    } finally q.stop()
  }

  test("D1 batch twin: streaming rollup logic matches q10 on the same data") {
    // the same hourlyRollup transformation applied to a bounded frame
    // must agree with the batch operator — one logic, two runtimes
    val ev = Tables(spark, sfDir).events
      .withColumn("ts", org.apache.spark.sql.functions.col("ts").cast("timestamp"))
    val streamingLogic = EventsStream.hourlyRollup(ev)
      .select(org.apache.spark.sql.functions.col("hour_start").cast("timestamp_ntz").as("hour_start"),
        org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.col("n_events"),
        org.apache.spark.sql.functions.round(org.apache.spark.sql.functions.col("total_value"), 4).as("total_value"))
    val batch = graft.operators.Reports.hourlyRollup(spark, sfDir)
    assert(streamingLogic.except(batch).count() == 0)
    assert(batch.except(streamingLogic).count() == 0)
  }

  test("D1 session variant: session_window closes sessions after the gap") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[StreamEvent]
    val q = EventsStream.sessionizeStream(mem.toDF(), gapMinutes = 30)
      .writeStream.format("memory").queryName("d1_sess").outputMode("complete").start()
    try {
      mem.addData(
        // user 1: two events 10 min apart (one session), then a 40-min
        // gap (second session); user 2: one lone event
        StreamEvent(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
        StreamEvent(2, ts("2024-01-01 10:10:00"), 1, "click", 2.0),
        StreamEvent(3, ts("2024-01-01 10:50:00"), 1, "view", 4.0),
        StreamEvent(4, ts("2024-01-01 09:00:00"), 2, "view", 8.0))
      q.processAllAvailable()
      val rows = spark.table("d1_sess")
        .select(col("user_id"), col("session_start").cast("string"),
          col("n_events"), col("session_value"))
        .as[(Long, String, Long, Double)].collect().toSet
      assert(rows == Set(
        (1L, "2024-01-01 10:00:00", 2L, 3.0),
        (1L, "2024-01-01 10:50:00", 1L, 4.0),
        (2L, "2024-01-01 09:00:00", 1L, 8.0)))
    } finally q.stop()
  }

  test("D1 session twin: streaming sessionizer agrees with the batch q09 grouping") {
    // same gap semantics, two runtimes: session event-counts per user
    // from session_window must match the batch lag+cumsum sessionizer
    val ev = Tables(spark, sfDir).events
      .withColumn("ts", col("ts").cast("timestamp"))
    val streaming = EventsStream.sessionizeStream(ev)
      .groupBy(col("user_id")).agg(
        count(lit(1)).as("n_sessions"),
        sum(col("n_events")).as("n_events"))
    val batch = graft.operators.Sessionize.sessionize(spark, sfDir)
      .groupBy(col("user_id")).agg(
        count(lit(1)).as("n_sessions"),
        sum(col("n_events")).as("n_events"))
    assert(streaming.except(batch).count() == 0)
    assert(batch.except(streaming).count() == 0)
  }

  test("D1 sliding variant: each event lands in windowLen/slide windows") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[StreamEvent]
    val q = EventsStream.slidingRollup(mem.toDF(), "1 hour", "15 minutes")
      .writeStream.format("memory").queryName("d1s_out").outputMode("complete").start()
    try {
      mem.addData(StreamEvent(1, ts("2024-01-01 10:31:00"), 1, "click", 1.0))
      q.processAllAvailable()
      val starts = spark.table("d1s_out")
        .select(col("window_start").cast("string")).as[String].collect().toSet
      // 10:31 falls in the 1h windows starting 09:45, 10:00, 10:15, 10:30
      assert(starts == Set("2024-01-01 09:45:00", "2024-01-01 10:00:00",
        "2024-01-01 10:15:00", "2024-01-01 10:30:00"))
    } finally q.stop()
  }

  test("D2: stateful dedup stream passes first occurrence per key only") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[StreamEvent]
    val q = EventsStream.dedupStream(mem.toDS())
      .writeStream.format("memory").queryName("d2_out").outputMode("append").start()
    try {
      mem.addData(
        StreamEvent(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
        StreamEvent(2, ts("2024-01-01 10:01:00"), 1, "click", 2.0), // dup key
        StreamEvent(3, ts("2024-01-01 10:02:00"), 2, "click", 3.0))
      q.processAllAvailable()
      // second batch: repeats of seen keys must be dropped across batches
      mem.addData(StreamEvent(4, ts("2024-01-01 10:03:00"), 1, "click", 4.0))
      q.processAllAvailable()
      val ids = spark.table("d2_out").select("event_id").as[Long].collect().toSet
      assert(ids == Set(1L, 3L))
    } finally q.stop()
  }

  test("D2 variant: streaming content dedup passes one doc per fingerprint across batches") {
    import graft.streaming.EventsStream.StreamDoc
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[StreamDoc]
    val q = EventsStream.dedupDocsStream(mem.toDS())
      .writeStream.format("memory").queryName("d2_docs").outputMode("append").start()
    try {
      mem.addData(
        StreamDoc(1, "the quick brown fox"),
        StreamDoc(2, "the quick brown fox"),   // exact dup in-batch
        StreamDoc(3, "something else entirely"))
      q.processAllAvailable()
      // cross-batch: the same content arriving later is still a dup
      mem.addData(StreamDoc(4, "the quick brown fox"), StreamDoc(5, "fresh content"))
      q.processAllAvailable()
      val ids = spark.table("d2_docs").select("doc_id").as[Long].collect().toSet
      assert(ids == Set(1L, 3L, 5L), s"got $ids")
    } finally q.stop()
  }

  test("D2→C2b: streaming ingest dedups against the persisted index, which grows per batch") {
    import graft.streaming.EventsStream.StreamDoc
    import graft.operators.Dedup
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog near the old river bank today " +
      "while morning light spreads across quiet fields and distant hills beyond the water line"
    val novel1 = "a totally distinct first passage about catalyst rules codegen stages and " +
      "adaptive query execution with partition pruning runtime filters and shuffle reuse everywhere"
    // seed the index with one corpus doc
    graft.sources.Bucketing.writeBucketed(
      Dedup.minhashIndexDocs(Seq((0L, base)).toDF("doc_id", "text"), 32, 8),
      "stream_idx", Seq("band", "bh"), numBuckets = 8)
    val acceptedIds = scala.collection.mutable.ArrayBuffer.empty[Long]
    val mem = MemoryStream[StreamDoc]
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ingest_ck").toString
    val q = EventsStream.dedupAgainstIndexStream(
      mem.toDF(), "stream_idx", ckpt,
      accept = df => acceptedIds.synchronized {
        acceptedIds ++= df.select("doc_id").as[Long](implicitly).collect()
      },
      numHashes = 32, bands = 8)
    try {
      // batch 1: near-dup of the corpus doc (rejected), novel doc
      // (accepted + indexed), intra-batch twin of the novel doc
      // (collapsed before the index probe)
      mem.addData(
        StreamDoc(100, base.replace("today", "tonight")),
        StreamDoc(101, novel1),
        StreamDoc(102, novel1.replace("everywhere", "everyplace")))
      q.processAllAvailable()
      // batch 2: near-dup of the doc ACCEPTED in batch 1 — only caught
      // if the index actually grew — plus another novel doc
      mem.addData(
        StreamDoc(200, novel1.replace("distinct", "separate")),
        StreamDoc(201, "completely fresh content about streaming state stores and watermark semantics"))
      q.processAllAvailable()
      assert(acceptedIds.sorted == Seq(101L, 201L), s"got ${acceptedIds.sorted}")
      // the index now carries corpus + both accepted docs
      val indexed = spark.table("stream_idx").select("doc_id").distinct()
        .as[Long].collect().toSet
      assert(indexed == Set(0L, 101L, 201L), s"got $indexed")
    } finally q.stop()
  }

  test("D2→C4c: streaming prefix-Jaccard ingest — self pass, exact verdicts, converging growth") {
    import graft.streaming.EventsStream.StreamDoc
    import graft.operators.Dedup
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog near the old river bank today " +
      "while morning light spreads across quiet fields and distant hills beyond the water line"
    val novel = "a totally distinct passage about catalyst rules codegen stages and " +
      "adaptive query execution with partition pruning runtime filters and shuffle reuse"
    val (p0, g0, v0) = Dedup.buildPrefixIndex(Seq((0L, base)).toDF("doc_id", "text"))
    graft.sources.Bucketing.writeBucketed(p0, "stream_pfx_post", Seq("g"), 8)
    graft.sources.Bucketing.writeBucketed(g0, "stream_pfx_grams", Seq("doc_id"), 8)
    val vocabDir = java.nio.file.Files.createTempDirectory("graft_pfx_vocab").toString
    v0.write.mode("overwrite").parquet(vocabDir)
    val acceptedIds = scala.collection.mutable.ArrayBuffer.empty[Long]
    val mem = MemoryStream[StreamDoc]
    val ckpt = java.nio.file.Files.createTempDirectory("graft_pfx_ck").toString
    val q = EventsStream.prefixDedupIngestStream(
      mem.toDF().toDF("doc_id", "text"), "stream_pfx_post", "stream_pfx_grams",
      vocabDir, ckpt,
      accept = df => acceptedIds.synchronized {
        acceptedIds ++= df.select("doc_id").as[Long](implicitly).collect()
      })
    def ids(table: String) = {
      spark.catalog.refreshTable(table)
      spark.table(table).select("doc_id").distinct().as[Long].collect().toSet
    }
    try {
      // batch 1: exact twin of the indexed corpus doc (rejected), a
      // NOVEL doc whose shingles are absent from the frozen vocabulary
      // (accepted — the df-0 ordering path), and its within-batch twin
      // (the self pass collapses it before the probe)
      mem.addData(StreamDoc(100, base), StreamDoc(101, novel), StreamDoc(102, novel))
      q.processAllAvailable()
      assert(acceptedIds.toSeq == Seq(101L), s"got $acceptedIds")
      assert(ids("stream_pfx_post") == Set(0L, 101L), "postings grow by the accept only")
      assert(ids("stream_pfx_grams") == Set(0L, 101L), "grams grow by the accept only")
      // batch 2: a twin of the JUST-accepted doc must reject against
      // the grown index — its candidates come entirely from df-0
      // (frozen-vocab-unseen) prefix tokens; replaying 101 appends
      // nothing and never re-accepts
      mem.addData(StreamDoc(200, novel), StreamDoc(101, novel))
      q.processAllAvailable()
      assert(acceptedIds.toSeq == Seq(101L),
        s"twin rejected, replay never re-accepts: $acceptedIds")
      assert(ids("stream_pfx_post") == Set(0L, 101L) &&
        ids("stream_pfx_grams") == Set(0L, 101L), "replays append nothing")
    } finally q.stop()
  }

  test("D2→C4c crash window: grams-first append order never leaks a duplicate into the index") {
    import graft.streaming.EventsStream.StreamDoc
    import graft.operators.Dedup
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog near the old river bank today " +
      "while morning light spreads across quiet fields and distant hills beyond the water line"
    val novel = "a totally distinct passage about catalyst rules codegen stages and " +
      "adaptive query execution with partition pruning runtime filters and shuffle reuse"
    spark.sql("DROP TABLE IF EXISTS stream_pfx2_post")
    spark.sql("DROP TABLE IF EXISTS stream_pfx2_grams")
    val (p0, g0, v0) = Dedup.buildPrefixIndex(Seq((0L, base)).toDF("doc_id", "text"))
    graft.sources.Bucketing.writeBucketed(p0, "stream_pfx2_post", Seq("g"), 8)
    graft.sources.Bucketing.writeBucketed(g0, "stream_pfx2_grams", Seq("doc_id"), 8)
    val vocabDir = java.nio.file.Files.createTempDirectory("graft_pfx2_vocab").toString
    v0.write.mode("overwrite").parquet(vocabDir)
    // simulate the crash: doc 50's GRAMS landed (the first append of
    // the r14-advice order) but the process died before its postings —
    // a half-indexed doc, invisible to candidate generation
    val (addP50, addG50) = Dedup.appendToPrefixIndex(
      Seq((50L, novel)).toDF("doc_id", "text"),
      spark.read.parquet(vocabDir))
    assert(addP50.count() > 0, "the crash simulation needs real postings to lose")
    addG50.write.mode(org.apache.spark.sql.SaveMode.Append)
      .format("parquet").bucketBy(8, "doc_id").sortBy("doc_id")
      .saveAsTable("stream_pfx2_grams")
    val acceptedIds = scala.collection.mutable.ArrayBuffer.empty[Long]
    val mem = MemoryStream[StreamDoc]
    val ckpt = java.nio.file.Files.createTempDirectory("graft_pfx2_ck").toString
    val q = EventsStream.prefixDedupIngestStream(
      mem.toDF().toDF("doc_id", "text"), "stream_pfx2_post", "stream_pfx2_grams",
      vocabDir, ckpt,
      accept = df => acceptedIds.synchronized {
        acceptedIds ++= df.select("doc_id").as[Long](implicitly).collect()
      })
    def ids(table: String) = {
      spark.catalog.refreshTable(table)
      spark.table(table).select("doc_id").distinct().as[Long].collect().toSet
    }
    try {
      // a true duplicate of the half-indexed doc arrives BEFORE the
      // replay: it cannot see doc 50 (no postings) and is accepted —
      // and because its OWN grams+postings land fully, the corpus now
      // carries a complete copy of the content
      mem.addData(StreamDoc(60, novel))
      q.processAllAvailable()
      assert(acceptedIds.toSeq == Seq(60L), s"got $acceptedIds")
      assert(ids("stream_pfx2_post") == Set(0L, 60L), s"${ids("stream_pfx2_post")}")
      // the crashed batch replays: doc 50 is absent from POSTINGS (the
      // replay-detection artifact) so it re-processes — and now
      // candidate-matches the fully-indexed 60, verdicts dup, REJECTS.
      // Exactly one copy of the content lives in the index; 50's
      // orphaned grams row is never consulted (verification only reads
      // grams for ids found in postings)
      mem.addData(StreamDoc(50, novel))
      q.processAllAvailable()
      assert(acceptedIds.toSeq == Seq(60L),
        s"the replayed original must reject against the newcomer: $acceptedIds")
      assert(ids("stream_pfx2_post") == Set(0L, 60L),
        "no second copy of the content may enter the postings")
      assert(ids("stream_pfx2_grams") == Set(0L, 50L, 60L),
        "the orphan grams row stays, harmlessly")
    } finally q.stop()
  }

  test("D2→C11c: streaming winnow ingest — self pass, span verdicts, doc-local growth") {
    import graft.streaming.EventsStream.StreamDoc
    import graft.operators.Dedup
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog near the old river bank today " +
      "while morning light spreads across quiet fields and distant hills beyond the water line"
    val novel = "a totally distinct passage about catalyst rules codegen stages and " +
      "adaptive query execution with partition pruning runtime filters and shuffle reuse"
    spark.sql("DROP TABLE IF EXISTS stream_winnow_idx")
    graft.sources.Bucketing.writeBucketed(
      Dedup.buildWinnowIndex(Seq((0L, base)).toDF("doc_id", "text")),
      "stream_winnow_idx", Seq("h"), 8)
    val acceptedIds = scala.collection.mutable.ArrayBuffer.empty[Long]
    val mem = MemoryStream[StreamDoc]
    val ckpt = java.nio.file.Files.createTempDirectory("graft_win_ck").toString
    val q = EventsStream.winnowIngestStream(
      mem.toDF().toDF("doc_id", "text"), "stream_winnow_idx", ckpt,
      accept = df => acceptedIds.synchronized {
        acceptedIds ++= df.select("doc_id").as[Long](implicitly).collect()
      })
    def ids() = {
      spark.catalog.refreshTable("stream_winnow_idx")
      spark.table("stream_winnow_idx").select("doc_id").distinct()
        .as[Long].collect().toSet
    }
    try {
      // batch 1: exact twin of the indexed doc (rejected — full span
      // overlap), a novel doc (accepted), its within-batch twin (the
      // self pass keeps the LOWER id)
      mem.addData(StreamDoc(100, base), StreamDoc(101, novel), StreamDoc(102, novel))
      q.processAllAvailable()
      assert(acceptedIds.toSeq == Seq(101L), s"got $acceptedIds")
      assert(ids() == Set(0L, 101L), "index grows by the accept only")
      // batch 2: a paste of the JUST-accepted doc — caught only if the
      // index grew — plus a replay of 101 (appends nothing, no re-accept)
      mem.addData(StreamDoc(200, novel + " with a few extra trailing words"),
        StreamDoc(101, novel))
      q.processAllAvailable()
      assert(acceptedIds.toSeq == Seq(101L),
        s"paste rejected, replay never re-accepts: $acceptedIds")
      assert(ids() == Set(0L, 101L), "replays append nothing")
    } finally q.stop()
  }

  test("D2v: streaming z-order ingest — frozen-grid routing, replay appends nothing, clamp found") {
    import graft.streaming.EventsStream.StreamPoint
    import graft.sources.Layout
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val day1 = (0 until 16).flatMap(x => (0 until 16).map(y =>
      (1000L + x * 16 + y, x.toLong, y.toLong))).toDF("doc_id", "x", "y")
    val dir = java.nio.file.Files.createTempDirectory("zstream").toString + "/layout"
    Layout.zorderWrite(day1, Seq("x", "y"), dir, fileBits = 4, bits = 4)
    val mem = MemoryStream[StreamPoint]
    val ckpt = java.nio.file.Files.createTempDirectory("graft_zing_ck").toString
    val q = EventsStream.zorderIngestStream(mem.toDF(), dir, ckpt)
    def layout = spark.read.parquet(dir)
    try {
      // trigger 1: an in-range point + an out-of-range extreme
      mem.addData(StreamPoint(1L, 3L, 12L), StreamPoint(2L, 2000L, 5L))
      q.processAllAvailable()
      assert(layout.count() == 258L, "both stream rows land")
      // frozen-grid routing: the streamed twin co-locates with its
      // day-1 twin's bucket
      val buckets = layout.filter(col("x") === 3 && col("y") === 12)
        .select(col("zbucket").cast("long")).distinct().as[Long].collect()
      assert(buckets.length == 1, s"streamed twin co-locates: ${buckets.toSeq}")
      // trigger 2: a REPLAY of id 1 plus one fresh point — replays
      // append nothing
      mem.addData(StreamPoint(1L, 3L, 12L), StreamPoint(3L, 7L, 7L))
      q.processAllAvailable()
      assert(layout.count() == 259L, "the replayed id appends nothing")
      assert(layout.filter(col("doc_id") === 1L).count() == 1L)
      // the clamped extreme is still FOUND (zone maps carry true values)
      val found = Layout.prunedScan(spark, dir, "x", 1500L, 3000L)
        .select(col("doc_id")).as[Long].collect()
      assert(found.toSeq == Seq(2L), s"clamp costs clustering, never correctness: $found")
    } finally q.stop()
  }

  test("E6 ∘ D2t: compaction heals the streamed winnow index; probes bit-identical, ≤1 file/bucket") {
    import graft.streaming.EventsStream.StreamDoc
    import graft.operators.Dedup
    import graft.sources.Bucketing
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def junk(seed: String, words: Int): String =
      (0 until words).map(i =>
        java.security.MessageDigest.getInstance("MD5")
          .digest(s"$seed:$i".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(10)).mkString(" ")
    spark.sql("DROP TABLE IF EXISTS stream_wincomp_idx")
    Bucketing.writeBucketed(
      Dedup.buildWinnowIndex(Seq((0L, junk("c0", 40))).toDF("doc_id", "text")),
      "stream_wincomp_idx", Seq("h"), 8)
    val mem = MemoryStream[StreamDoc]
    val ckpt = java.nio.file.Files.createTempDirectory("graft_wincomp_ck").toString
    val q = EventsStream.winnowIngestStream(
      mem.toDF().toDF("doc_id", "text"), "stream_wincomp_idx", ckpt,
      accept = _ => ())
    try {
      // five triggers of novel docs: each append adds one file per
      // touched bucket, so the day-2 index fragments — the exact E6
      // scenario the verdict named
      (1 to 5).foreach { i =>
        mem.addData(StreamDoc(100L + i, junk(s"n$i", 40)))
        q.processAllAvailable()
      }
    } finally q.stop()
    def files(): Long = {
      spark.catalog.refreshTable("stream_wincomp_idx")
      spark.table("stream_wincomp_idx")
        .select(org.apache.spark.sql.functions.input_file_name().as("f"))
        .distinct().count()
    }
    val fragmented = files()
    assert(fragmented > 8, s"five appends must fragment past 1 file/bucket: $fragmented")
    // probe harness: one doc pasting indexed content (accepted batch
    // 3's text), one novel — snapshot BOTH probe families pre-compact
    val probe = Seq(
      (900L, junk("n3", 40) + " " + junk("tail", 10)),
      (901L, junk("fresh", 40))).toDF("doc_id", "text")
    def overlaps() = Dedup.winnowOverlapAgainstIndex(
        probe, spark.table("stream_wincomp_idx"))
      .collect().map(_.toSeq).toSeq.sortBy(_.head.asInstanceOf[Long])
    def spans() = Dedup.winnowSpansAgainstIndex(
        probe, spark.table("stream_wincomp_idx"))
      .collect().map(_.toSeq).toSeq
      .sortBy(r => (r.head.asInstanceOf[Long], r(2).asInstanceOf[Long]))
    val (o1, s1) = (overlaps(), spans())
    assert(o1.exists(r => r(1) == true) && s1.nonEmpty,
      "the paste must register overlap + spans against the streamed index")
    assert(Bucketing.compactBucketed(spark, "stream_wincomp_idx"),
      "a fragmented day-2 index must rewrite")
    assert(files() <= 8, s"post-compact the index holds ≤1 file/bucket: ${files()}")
    assert(overlaps() == o1 && spans() == s1,
      "probe answers must be bit-identical across the compaction")
  }

  test("D2→C11g: streaming clean ingest — spans shed, docs kept, the index grows by clean text") {
    import graft.streaming.EventsStream.StreamDoc
    import graft.operators.Dedup
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def junk(seed: String, words: Int): String =
      (0 until words).map(i =>
        java.security.MessageDigest.getInstance("MD5")
          .digest(s"$seed:$i".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(10)).mkString(" ")
    val span = junk("shared", 12)
    val base = junk("b1", 15) + " " + span + " " + junk("b2", 15)
    spark.sql("DROP TABLE IF EXISTS stream_winclean_idx")
    graft.sources.Bucketing.writeBucketed(
      Dedup.buildWinnowIndex(Seq((0L, base)).toDF("doc_id", "text")),
      "stream_winclean_idx", Seq("h"), 8)
    val acceptedRows = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long)]
    def accepted = acceptedRows.map(r => r._1 -> ((r._2, r._3))).toMap
    val mem = MemoryStream[StreamDoc]
    val ckpt = java.nio.file.Files.createTempDirectory("graft_winclean_ck").toString
    val q = EventsStream.winnowCleanIngestStream(
      mem.toDF().toDF("doc_id", "text"), "stream_winclean_idx", ckpt,
      accept = df => acceptedRows.synchronized {
        acceptedRows ++= df.select("doc_id", "clean_text", "n_spans")
          .as[(Long, String, Long)].collect()
      })
    try {
      // batch 1: a doc pasting the corpus span (kept, span excised), a
      // novel doc (kept untouched), and a within-batch pair sharing
      // their own span (the higher id sheds it, the lower keeps it)
      val novel = junk("novel", 40)
      val batchSpan = junk("bs", 12)
      val lo = junk("lo", 20) + " " + batchSpan
      val hi = batchSpan + " " + junk("hi", 20)
      val paster = junk("pre", 20) + " " + span + " " + junk("post", 20)
      mem.addData(StreamDoc(100, paster), StreamDoc(101, novel),
        StreamDoc(102, lo), StreamDoc(103, hi))
      q.processAllAvailable()
      assert(acceptedRows.map(_._1).sorted == Seq(100L, 101L, 102L, 103L),
        s"nothing is rejected, each doc accepted once: $acceptedRows")
      assert(accepted(101L) == (novel, 0L), "novel doc untouched")
      assert(accepted(100L)._2 >= 1L &&
        !accepted(100L)._1.contains(span.substring(20, 110)),
        s"the corpus span is shed: ${accepted(100L)}")
      assert(accepted(102L)._1.contains(batchSpan) &&
        !accepted(103L)._1.contains(batchSpan.substring(20, 110)),
        "within the batch the lower id keeps the span, the higher sheds it")
      // batch 2: a paste of batch-1 CLEAN text is caught only because
      // the index grew by the accepted clean text; replaying 101
      // appends nothing and re-delivers nothing
      spark.catalog.refreshTable("stream_winclean_idx")
      val before = spark.table("stream_winclean_idx").count()
      mem.addData(StreamDoc(200, novel + " " + junk("tail", 10)),
        StreamDoc(101, novel))
      q.processAllAvailable()
      assert(!accepted(200L)._1.contains(novel.substring(20, 200)),
        s"day-2 paste sheds the just-ingested clean span: ${accepted(200L)}")
      assert(acceptedRows.count(_._1 == 101L) == 1,
        s"the replayed id is never re-accepted: $acceptedRows")
      spark.catalog.refreshTable("stream_winclean_idx")
      val idx = spark.table("stream_winclean_idx")
      val ids = idx.select("doc_id").distinct().as[Long].collect().toSet
      assert(ids == Set(0L, 100L, 101L, 102L, 103L, 200L),
        s"index grew by accepts only: $ids")
      assert(idx.count() > before && idx.count() == idx.distinct().count(),
        "the replay of 101 did not duplicate its postings")
    } finally q.stop()
  }

  test("D1→E: streaming into the day-partitioned lake replaces only updated dates") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[StreamEvent]
    // grouping FINER than the partition key (day, event_type): the
    // default complete-mode write must keep a date's unchanged sibling
    // rows when another row of the same date updates
    val daily = mem.toDF()
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
    val path = java.nio.file.Files.createTempDirectory("graft_stream_lake").toString
    val cp = java.nio.file.Files.createTempDirectory("graft_stream_cp").toString
    val q = EventsStream.writeDayPartitionedStream(daily, path, "day", cp)
    try {
      mem.addData(
        StreamEvent(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
        StreamEvent(2, ts("2024-01-02 10:00:00"), 1, "click", 2.0))
      q.processAllAvailable()
      def lake() = spark.read.parquet(path)
        .select(col("day").cast("string"), col("event_type"), col("n"), col("v"))
        .as[(String, String, Long, Double)].collect().toSet
      assert(lake() == Set(
        ("2024-01-01", "click", 1L, 1.0),
        ("2024-01-02", "click", 1L, 2.0)))
      // second micro-batch adds a view row on day 2 and a new day 3:
      // day 1 survives, day 2 keeps its UNCHANGED click row alongside
      // the new view row (no duplicates, no sibling loss), day 3 appears
      mem.addData(
        StreamEvent(3, ts("2024-01-02 11:00:00"), 2, "view", 5.0),
        StreamEvent(4, ts("2024-01-03 09:00:00"), 1, "view", 7.0))
      q.processAllAvailable()
      assert(lake() == Set(
        ("2024-01-01", "click", 1L, 1.0),
        ("2024-01-02", "click", 1L, 2.0),
        ("2024-01-02", "view", 1L, 5.0),
        ("2024-01-03", "view", 1L, 7.0)),
        "replays/updates rewrite partitions wholesale; sibling rows survive")
    } finally q.stop()
  }

  test("D1→C2d: streaming census ingest lands finalized days; replay rewrites them identically") {
    import graft.operators.Dedup
    import graft.streaming.EventsStream.StreamDocTs
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val banner = "accept our cookies"
    val bannerHash = spark.range(1).select(xxhash64(lit(banner))).as[Long].head()
    val path = java.nio.file.Files.createTempDirectory("graft_census_tbl").toString
    val cp = java.nio.file.Files.createTempDirectory("graft_census_cp").toString
    val mem = MemoryStream[StreamDocTs]
    val q = EventsStream.censusIngestStream(mem.toDF(), path, cp)
    try {
      // day 1: banner in two docs; a day-3 marker finalizes day 1
      mem.addData(
        StreamDocTs(1, ts("2024-01-01 10:00:00"), s"$banner\nbody one"),
        StreamDocTs(2, ts("2024-01-01 11:00:00"), s"$banner\nbody two"))
      mem.addData(StreamDocTs(99, ts("2024-01-03 01:00:00"), "marker"))
      q.processAllAvailable()
      val m1 = Dedup.loadParagraphCensus(spark, path).as[(Long, Long)].collect().toMap
      assert(m1(bannerHash) == 2L, m1.toString)
      assert(m1.size == 3, s"only day 1 is finalized (marker day pending): $m1")
      // day 3 brings the banner once more; a day-5 marker finalizes it
      mem.addData(StreamDocTs(3, ts("2024-01-03 02:00:00"), s"$banner\nbody three"))
      mem.addData(StreamDocTs(98, ts("2024-01-05 01:00:00"), "marker2"))
      q.processAllAvailable()
      val m2 = Dedup.loadParagraphCensus(spark, path).as[(Long, Long)].collect().toMap
      assert(m2(bannerHash) == 3L, m2.toString)
      // the maintained census feeds the batch probe: a fresh doc's
      // banner paragraph is boilerplate (3 > 2), its body survives
      val probe = Seq((10L, s"$banner\nnew body")).toDF("doc_id", "text")
      val out = Dedup.dropRepeatedParagraphsAgainstCensus(
        probe, Dedup.loadParagraphCensus(spark, path), "doc_id", "text")
        .as[(Long, String, Long, Long)].collect().head
      assert(out == ((10L, "new body", 1L, 1L)), out.toString)
      // replay from scratch (fresh checkpoint, same table): finalized
      // days are complete by construction, so the partition overwrite
      // rewrites identical content — counts never double
      val mem2 = MemoryStream[StreamDocTs]
      val cp2 = java.nio.file.Files.createTempDirectory("graft_census_cp2").toString
      val q2 = EventsStream.censusIngestStream(mem2.toDF(), path, cp2)
      try {
        mem2.addData(
          StreamDocTs(1, ts("2024-01-01 10:00:00"), s"$banner\nbody one"),
          StreamDocTs(2, ts("2024-01-01 11:00:00"), s"$banner\nbody two"),
          StreamDocTs(99, ts("2024-01-03 01:00:00"), "marker"),
          StreamDocTs(3, ts("2024-01-03 02:00:00"), s"$banner\nbody three"))
        mem2.addData(StreamDocTs(98, ts("2024-01-05 01:00:00"), "marker2"))
        q2.processAllAvailable()
        val m3 = Dedup.loadParagraphCensus(spark, path).as[(Long, Long)].collect().toMap
        assert(m3 == m2, s"replay must leave the census unchanged: $m3 vs $m2")
      } finally q2.stop()
    } finally q.stop()
  }

  test("D1→C40: streaming line census lands finalized days; the probe strips against it") {
    import graft.operators.TextClean
    import graft.streaming.EventsStream.StreamDocTs
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft_linecensus_tbl").toString
    val cp = java.nio.file.Files.createTempDirectory("graft_linecensus_cp").toString
    val mem = MemoryStream[StreamDocTs]
    // domains derive from the doc id so StreamDocTs carries them
    val pages = mem.toDF().withColumn("domain",
      when(col("doc_id") < 50, "x.com").otherwise("other"))
    val q = EventsStream.lineCensusIngestStream(pages, path, cp)
    try {
      // day 1: x.com header on three pages; a day-3 marker finalizes it
      mem.addData(
        StreamDocTs(1, ts("2024-01-01 10:00:00"), "HDR-X\nbody one"),
        StreamDocTs(2, ts("2024-01-01 11:00:00"), "HDR-X\nbody two"),
        StreamDocTs(3, ts("2024-01-01 12:00:00"), "HDR-X\nbody three"))
      mem.addData(StreamDocTs(99, ts("2024-01-03 01:00:00"), "marker"))
      q.processAllAvailable()
      val census = TextClean.loadLineCensus(spark, path)
      val m1 = census.as[(String, String, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      assert(m1(("x.com", "HDR-X")) === 3L, m1.toString)
      // the maintained census drives the production day-2 strip: the
      // header goes, the fresh body and a never-censused line stay
      val batch = Seq((10L, "x.com", "HDR-X\nfresh body\nNEW")).toDF("doc_id", "domain", "text")
      val out = TextClean.stripAgainstCensus(batch, census, "domain", "text")
        .select("clean_text").as[String].head()
      assert(out === "fresh body\nNEW")
      // replay from scratch: finalized days rewrite identically
      val mem2 = MemoryStream[StreamDocTs]
      val cp2 = java.nio.file.Files.createTempDirectory("graft_linecensus_cp2").toString
      val q2 = EventsStream.lineCensusIngestStream(
        mem2.toDF().withColumn("domain",
          when(col("doc_id") < 50, "x.com").otherwise("other")), path, cp2)
      try {
        mem2.addData(
          StreamDocTs(1, ts("2024-01-01 10:00:00"), "HDR-X\nbody one"),
          StreamDocTs(2, ts("2024-01-01 11:00:00"), "HDR-X\nbody two"),
          StreamDocTs(3, ts("2024-01-01 12:00:00"), "HDR-X\nbody three"),
          StreamDocTs(99, ts("2024-01-03 01:00:00"), "marker"))
        q2.processAllAvailable()
        val m2 = TextClean.loadLineCensus(spark, path)
          .as[(String, String, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
        assert(m2 === m1, s"replay must leave the census unchanged: $m2 vs $m1")
      } finally q2.stop()
    } finally q.stop()
  }

  test("D1→C2e: streaming span census ingest lands finalized days; probe and replay agree") {
    import graft.operators.Dedup
    import graft.streaming.EventsStream.StreamDocTs
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // the shared 3-token run; texts diverge right after it so it is the
    // ONLY window two documents have in common
    val run = "alpha beta gamma"
    val path = java.nio.file.Files.createTempDirectory("graft_spancensus_tbl").toString
    val cp = java.nio.file.Files.createTempDirectory("graft_spancensus_cp").toString
    val mem = MemoryStream[StreamDocTs]
    val q = EventsStream.spanCensusIngestStream(mem.toDF(), path, cp, k = 3)
    try {
      // day 1: the run in two docs; a day-3 marker finalizes day 1
      mem.addData(
        StreamDocTs(1, ts("2024-01-01 10:00:00"), s"$run one uno eins"),
        StreamDocTs(2, ts("2024-01-01 11:00:00"), s"$run two dos zwei"))
      mem.addData(StreamDocTs(99, ts("2024-01-03 01:00:00"), "marker beyond day one here"))
      q.processAllAvailable()
      val m1 = Dedup.loadSpanCensus(spark, path).as[(Long, Long)].collect().toMap
      // 4 windows per 6-token doc, exactly one shared between the two
      assert(m1.size == 7, s"only day 1 is finalized (marker day pending): $m1")
      assert(m1.values.count(_ == 2L) == 1, s"exactly the shared run's window: $m1")
      // day 3 brings the run once more; a day-5 marker finalizes it
      mem.addData(StreamDocTs(3, ts("2024-01-03 02:00:00"), s"$run three tres drei"))
      mem.addData(StreamDocTs(98, ts("2024-01-05 01:00:00"), "marker two beyond day three"))
      q.processAllAvailable()
      val m2 = Dedup.loadSpanCensus(spark, path).as[(Long, Long)].collect().toMap
      assert(m2.values.count(_ == 3L) == 1, s"cross-day repeats accumulate: $m2")
      // the maintained census feeds the batch probe: the run is cut
      // from a fresh doc, its unique tail survives
      val probe = Seq((10L, s"$run keep these tokens")).toDF("doc_id", "text")
      val out = Dedup.dropRepeatedSpansAgainstCensus(
        probe, Dedup.loadSpanCensus(spark, path), "doc_id", "text", k = 3)
        .as[(Long, String, Long, Long)].collect().head
      assert(out == ((10L, "keep these tokens", 6L, 3L)), out.toString)
      // (k, sep) metadata survives the parquet round-trip: a mismatched
      // probe fails loudly instead of silently matching nothing
      val e = intercept[IllegalArgumentException] {
        Dedup.dropRepeatedSpansAgainstCensus(
          probe, Dedup.loadSpanCensus(spark, path), "doc_id", "text", k = 4)
      }
      assert(e.getMessage.contains("k=3"), e.getMessage)
      // replay from scratch (fresh checkpoint, same table): finalized
      // days rewrite identical content — counts never double
      val mem2 = MemoryStream[StreamDocTs]
      val cp2 = java.nio.file.Files.createTempDirectory("graft_spancensus_cp2").toString
      val q2 = EventsStream.spanCensusIngestStream(mem2.toDF(), path, cp2, k = 3)
      try {
        mem2.addData(
          StreamDocTs(1, ts("2024-01-01 10:00:00"), s"$run one uno eins"),
          StreamDocTs(2, ts("2024-01-01 11:00:00"), s"$run two dos zwei"),
          StreamDocTs(99, ts("2024-01-03 01:00:00"), "marker beyond day one here"),
          StreamDocTs(3, ts("2024-01-03 02:00:00"), s"$run three tres drei"))
        mem2.addData(StreamDocTs(98, ts("2024-01-05 01:00:00"), "marker two beyond day three"))
        q2.processAllAvailable()
        val m3 = Dedup.loadSpanCensus(spark, path).as[(Long, Long)].collect().toMap
        assert(m3 == m2, s"replay must leave the census unchanged: $m3 vs $m2")
      } finally q2.stop()
    } finally q.stop()
  }

  test("D1→C2d guard: a day persisted with different content fails the census stream loudly") {
    import graft.streaming.EventsStream.StreamDocTs
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft_census_tbl2").toString
    val cp = java.nio.file.Files.createTempDirectory("graft_census_cp3").toString
    // pre-seed 2024-01-01 with census content the stream will NOT
    // reproduce — the half-a-split-day scenario the replace-mode
    // overwrite would otherwise silently clobber
    graft.sources.Sinks.writeDayPartitioned(
      Seq((java.sql.Date.valueOf("2024-01-01"), 12345L, 1L))
        .toDF("day", "para_hash", "n_docs"),
      path, "day", ifExists = "replace", clean = false)
    val mem = MemoryStream[StreamDocTs]
    val q = EventsStream.censusIngestStream(mem.toDF(), path, cp)
    try {
      mem.addData(StreamDocTs(1, ts("2024-01-01 10:00:00"), "body one"))
      mem.addData(StreamDocTs(99, ts("2024-01-03 01:00:00"), "marker"))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      def causes(t: Throwable): Seq[Throwable] =
        Option(t).toSeq.flatMap(x => x +: causes(x.getCause))
      assert(causes(e).exists(c => c.isInstanceOf[IllegalStateException] &&
        c.getMessage.contains("split day")), e.toString)
    } finally q.stop()
  }

  test("D1→C23: streaming sketch ingest merges batches; re-delivery leaves estimates unchanged") {
    import graft.operators.Sketches
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[StreamEvent]
    val path = java.nio.file.Files.createTempDirectory("graft_sketch_tbl").toString
    val cp = java.nio.file.Files.createTempDirectory("graft_sketch_cp").toString
    val q = EventsStream.sketchIngestStream(mem.toDF(), path, cp)
    def estimates() = Sketches.distinctOverRange(spark.read.parquet(path), "event_type")
      .select("event_type", "distinct_est", "n_days")
      .as[(String, Long, Long)].collect().toSet
    try {
      // batch 1: two days, users 1-2 clicking
      mem.addData(
        StreamEvent(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
        StreamEvent(2, ts("2024-01-01 11:00:00"), 2, "click", 1.0),
        StreamEvent(3, ts("2024-01-02 10:00:00"), 1, "click", 1.0))
      q.processAllAvailable()
      assert(estimates() == Set(("click", 2L, 2L)))
      // batch 2: same day-1 partition gains user 3, plus a new type —
      // the merge must extend existing day sketches, not replace them
      mem.addData(
        StreamEvent(4, ts("2024-01-01 12:00:00"), 3, "click", 1.0),
        StreamEvent(5, ts("2024-01-02 12:00:00"), 9, "view", 1.0))
      q.processAllAvailable()
      assert(estimates() == Set(("click", 3L, 2L), ("view", 1L, 1L)))
      // re-delivered data (the replay shape): HLL insertion is
      // idempotent per value, so estimates must not move
      mem.addData(
        StreamEvent(6, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
        StreamEvent(7, ts("2024-01-01 11:00:00"), 2, "click", 1.0))
      q.processAllAvailable()
      assert(estimates() == Set(("click", 3L, 2L), ("view", 1L, 1L)))
    } finally q.stop()
  }

  test("D1→C28: streaming KMV ingest merges batches; re-delivery leaves sketches unchanged") {
    import graft.operators.Sketches
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[StreamEvent]
    val path = java.nio.file.Files.createTempDirectory("graft_kmv_tbl").toString
    val cp = java.nio.file.Files.createTempDirectory("graft_kmv_cp").toString
    val q = EventsStream.kmvIngestStream(mem.toDF(), path, cp, k = 64)
    def table() = spark.read.parquet(path)
      .select(col("event_type"), col("day").cast("string"), col("h"))
      .as[(String, String, Long)].collect().toSet
    try {
      mem.addData(
        StreamEvent(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
        StreamEvent(2, ts("2024-01-01 11:00:00"), 2, "click", 1.0),
        StreamEvent(3, ts("2024-01-02 10:00:00"), 1, "click", 1.0))
      q.processAllAvailable()
      val t1 = table()
      // the maintained table equals the batch-built sketch of the same
      // static rows — the twin contract
      val static1 = Seq((1L, "2024-01-01", "click"), (2L, "2024-01-01", "click"),
        (1L, "2024-01-02", "click")).toDF("user_id", "day", "event_type")
      val batchBuilt = Sketches.kmvSketches(static1,
          Seq("event_type", "day"), col("user_id"), k = 64)
        .as[(String, String, Long)].collect().toSet
      assert(t1 == batchBuilt, s"streamed $t1 vs batch $batchBuilt")
      // batch 2 extends an existing day partition and a new day
      mem.addData(
        StreamEvent(4, ts("2024-01-01 12:00:00"), 3, "click", 1.0),
        StreamEvent(5, ts("2024-01-03 12:00:00"), 9, "view", 1.0))
      q.processAllAvailable()
      val t2 = table()
      assert(t2.count(r => r._1 == "click" && r._2 == "2024-01-01") == 3,
        "day-1 sketch must gain user 3's hash")
      // re-delivery: KMV insertion is idempotent per value
      mem.addData(
        StreamEvent(6, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
        StreamEvent(7, ts("2024-01-01 11:00:00"), 2, "click", 1.0))
      q.processAllAvailable()
      assert(table() == t2, "re-delivered values must not change the sketches")
    } finally q.stop()
  }

  test("D1→C25: streaming CMS ingest lands finalized days; range top-k and replay agree") {
    import graft.operators.Sketches
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[StreamEvent]
    val cms = java.nio.file.Files.createTempDirectory("graft_cms_tbl").toString
    val cand = java.nio.file.Files.createTempDirectory("graft_cms_cand").toString
    val cp = java.nio.file.Files.createTempDirectory("graft_cms_cp").toString
    val q = EventsStream.cmsIngestStream(mem.toDF(), cms, cand, cp, topN = 8)
    try {
      // day 1: user 7 is the hitter (3 events), users 1-2 one each;
      // a day-3 marker finalizes day 1 (watermark passes its end)
      mem.addData(
        StreamEvent(1, ts("2024-01-01 10:00:00"), 7, "click", 1.0),
        StreamEvent(2, ts("2024-01-01 10:05:00"), 7, "click", 1.0),
        StreamEvent(3, ts("2024-01-01 10:10:00"), 7, "view", 1.0),
        StreamEvent(4, ts("2024-01-01 11:00:00"), 1, "click", 1.0),
        StreamEvent(5, ts("2024-01-01 12:00:00"), 2, "click", 1.0))
      mem.addData(StreamEvent(99, ts("2024-01-03 01:00:00"), 99, "marker", 1.0))
      q.processAllAvailable()
      val top1 = Sketches.heavyHittersOverRange(
          spark.read.parquet(cms), spark.read.parquet(cand), k = 3,
          toDay = Some("2024-01-02"))
        .as[(Long, String, Long)].collect().toSeq
      assert(top1.head._2 == "7" && top1.head._3 == 3L,
        s"the planted hitter must rank first with its exact count: $top1")
      // day 3 adds two more events for user 7; a day-5 marker finalizes
      mem.addData(StreamEvent(6, ts("2024-01-03 02:00:00"), 7, "click", 1.0),
        StreamEvent(7, ts("2024-01-03 03:00:00"), 7, "click", 1.0))
      mem.addData(StreamEvent(98, ts("2024-01-05 01:00:00"), 98, "marker2", 1.0))
      q.processAllAvailable()
      val top2 = Sketches.heavyHittersOverRange(
          spark.read.parquet(cms), spark.read.parquet(cand), k = 3)
        .as[(Long, String, Long)].collect().toSeq
      assert(top2.head._2 == "7" && top2.head._3 == 5L,
        s"range merge must sum the hitter across finalized days: $top2")
      // replay from scratch (fresh checkpoint, same tables): finalized
      // days rewrite identically, the split-day guard stays silent
      val mem2 = MemoryStream[StreamEvent]
      val cp2 = java.nio.file.Files.createTempDirectory("graft_cms_cp2").toString
      val q2 = EventsStream.cmsIngestStream(mem2.toDF(), cms, cand, cp2, topN = 8)
      try {
        mem2.addData(
          StreamEvent(1, ts("2024-01-01 10:00:00"), 7, "click", 1.0),
          StreamEvent(2, ts("2024-01-01 10:05:00"), 7, "click", 1.0),
          StreamEvent(3, ts("2024-01-01 10:10:00"), 7, "view", 1.0),
          StreamEvent(4, ts("2024-01-01 11:00:00"), 1, "click", 1.0),
          StreamEvent(5, ts("2024-01-01 12:00:00"), 2, "click", 1.0),
          StreamEvent(99, ts("2024-01-03 01:00:00"), 99, "marker", 1.0))
        mem2.addData(StreamEvent(6, ts("2024-01-03 02:00:00"), 7, "click", 1.0),
          StreamEvent(7, ts("2024-01-03 03:00:00"), 7, "click", 1.0),
          StreamEvent(98, ts("2024-01-05 01:00:00"), 98, "marker2", 1.0))
        q2.processAllAvailable()
        val top3 = Sketches.heavyHittersOverRange(
            spark.read.parquet(cms), spark.read.parquet(cand), k = 3)
          .as[(Long, String, Long)].collect().toSeq
        assert(top3 == top2, s"replay must leave the artifacts unchanged: $top3 vs $top2")
      } finally q2.stop()
    } finally q.stop()
  }

  test("D1→C24: streaming KLL ingest lands finalized days; range quantiles match the batch kernel; replay is silent") {
    import graft.operators.Sketches
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[StreamEvent]
    val tbl = java.nio.file.Files.createTempDirectory("graft_kll_tbl").toString
    val cp = java.nio.file.Files.createTempDirectory("graft_kll_cp").toString
    val q = EventsStream.kllIngestStream(mem.toDF(), tbl, cp, k = 200)
    val day1 = Seq(
      StreamEvent(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
      StreamEvent(2, ts("2024-01-01 10:05:00"), 2, "click", 5.0),
      StreamEvent(3, ts("2024-01-01 10:10:00"), 3, "click", 5.0),
      StreamEvent(4, ts("2024-01-01 11:00:00"), 4, "click", 9.0),
      StreamEvent(5, ts("2024-01-01 12:00:00"), 5, "view", 2.0))
    val day3 = Seq(
      StreamEvent(6, ts("2024-01-03 02:00:00"), 6, "click", 100.0),
      StreamEvent(7, ts("2024-01-03 03:00:00"), 7, "view", 4.0))
    val marker1 = StreamEvent(99, ts("2024-01-03 01:00:00"), 99, "marker", 0.0)
    val marker2 = StreamEvent(98, ts("2024-01-05 01:00:00"), 98, "marker2", 0.0)
    def decode(df: org.apache.spark.sql.DataFrame) =
      Sketches.quantilesOverRange(df, "event_type", Seq(0.5, 0.9))
        .as[(String, Long, Double, Double)].collect().toSet
    try {
      // a day-3 marker finalizes day 1; its sketches land as a partition
      mem.addData(day1: _*); mem.addData(marker1)
      q.processAllAvailable()
      val afterDay1 = spark.read.parquet(tbl)
      assert(afterDay1.select(col("day").cast("string")).distinct()
        .as[String].collect().toSet == Set("2024-01-01"),
        "only the finalized day may land")
      // the streamed day-1 sketches decode exactly like the batch
      // kernel over the same raw rows (exact mode at this size)
      val batchBuilt = Sketches.dailyQuantileSketches(
        day1.toDF(), "event_type", "ts", "value", k = 200)
      assert(decode(afterDay1) == decode(batchBuilt),
        "streamed sketches must decode exactly like the batch-built table")
      // day 3 finalizes; cross-day range merge sees both days
      mem.addData(day3: _*); mem.addData(marker2)
      q.processAllAvailable()
      val ranged = decode(spark.read.parquet(tbl))
      // marker1 rides day 3, so it finalizes too; marker2's day never does
      val allBatch = decode(Sketches.dailyQuantileSketches(
        (day1 ++ day3 :+ marker1).toDF(), "event_type", "ts", "value", k = 200))
      assert(ranged == allBatch,
        s"cross-day merge must match the batch kernel: $ranged vs $allBatch")
      // replay from scratch (fresh checkpoint, same table): finalized
      // days rewrite with EQUIVALENT sketches (bytes may differ — the
      // documented KLL compaction caveat), the (key, n_values) guard
      // stays silent, and decoded quantiles are unchanged
      val mem2 = MemoryStream[StreamEvent]
      val cp2 = java.nio.file.Files.createTempDirectory("graft_kll_cp2").toString
      val q2 = EventsStream.kllIngestStream(mem2.toDF(), tbl, cp2, k = 200)
      try {
        mem2.addData(day1 :+ marker1: _*)
        mem2.addData(day3 :+ marker2: _*)
        q2.processAllAvailable()
        assert(decode(spark.read.parquet(tbl)) == ranged,
          "replay must leave decoded artifacts unchanged")
      } finally q2.stop()
      // a half day must refuse: plant a conflicting day-1 partition
      // with a different n_values and replay — the guard fires
      val memBad = MemoryStream[StreamEvent]
      val cpBad = java.nio.file.Files.createTempDirectory("graft_kll_cpb").toString
      val qBad = EventsStream.kllIngestStream(memBad.toDF(), tbl, cpBad, k = 200)
      try {
        memBad.addData(day1.take(2) :+ marker1: _*) // half of day 1
        val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
          qBad.processAllAvailable()
        }
        assert(e.getMessage.contains("kllIngestStream") ||
          Option(e.getCause).exists(_.getMessage.contains("kllIngestStream")),
          s"the split-day guard must name the operator: ${e.getMessage}")
      } finally qBad.stop()
    } finally q.stop()
  }

  test("D1h sketch-bounded: KLL partials match the batch kernel with ZERO streaming state; batch-id replay overwrites") {
    import graft.operators.Sketches
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[StreamEvent]
    val tbl = java.nio.file.Files.createTempDirectory("graft_kllp_tbl").toString
    val cp = java.nio.file.Files.createTempDirectory("graft_kllp_cp").toString
    val q = EventsStream.kllPartialIngestStream(mem.toDF(), tbl, cp, k = 200)
    val day1 = Seq(
      StreamEvent(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
      StreamEvent(2, ts("2024-01-01 10:05:00"), 2, "click", 5.0),
      StreamEvent(3, ts("2024-01-01 10:10:00"), 3, "click", 5.0),
      StreamEvent(4, ts("2024-01-01 11:00:00"), 4, "click", 9.0),
      StreamEvent(5, ts("2024-01-01 12:00:00"), 5, "view", 2.0))
    val day3 = Seq(
      StreamEvent(6, ts("2024-01-03 02:00:00"), 6, "click", 100.0),
      StreamEvent(7, ts("2024-01-03 03:00:00"), 7, "view", 4.0))
    def decode(df: org.apache.spark.sql.DataFrame) =
      Sketches.quantilesOverRange(df, "event_type", Seq(0.5, 0.9))
        .as[(String, Long, Double, Double)].collect().toSet
    def merged() =
      Sketches.mergeKllPartials(spark.read.parquet(tbl), "event_type")
    try {
      // two batches land — NO day-finalization markers, no watermark:
      // answers are current immediately, including the straddling batch
      mem.addData(day1: _*)
      q.processAllAvailable()
      mem.addData(day1.take(2).map(e => e.copy(event_id = e.event_id + 100)) ++ day3: _*)
      q.processAllAvailable()
      // the partials merge to EXACTLY the batch kernel's answer over
      // the same rows (exact mode at this size; in compacted mode the
      // equivalence is rank-guarantee-level, the associativity of merge)
      val allRows = (day1 ++ day1.take(2).map(e => e.copy(event_id = e.event_id + 100))
        ++ day3).toDF()
      val batchBuilt = Sketches.dailyQuantileSketches(
        allRows, "event_type", "ts", "value", k = 200)
      assert(decode(merged()) == decode(batchBuilt),
        "merged partials must decode exactly like the batch-built table")
      // THE BOUND: zero streaming state (no watermark aggregate — the
      // whole point vs kllIngestStream's per-distinct-value rows) …
      assert(q.lastProgress.stateOperators.isEmpty,
        s"sketch-bounded form must keep no streaming state: ${q.lastProgress}")
      // … and the artifact holds one sketch row per (batch, day, key)
      val parts = spark.read.parquet(tbl)
        .select(col("batch_id"), col("day"), col("event_type")).collect()
      assert(parts.length == parts.distinct.length && parts.length == 5,
        s"one partial row per (batch, day, key): ${parts.toSeq}")
      // WAL-replay simulation: re-running batch 1 with the same rows
      // (the crash-replay case — same checkpoint pins the boundaries)
      // rewrites its own partition: row count and answers unchanged
      val batch1Rows = (day1.take(2).map(e => e.copy(event_id = e.event_id + 100))
        ++ day3).toDF()
      EventsStream.writeKllPartialBatch(batch1Rows, 1L, tbl,
        "event_type", "ts", "value", k = 200)
      assert(spark.read.parquet(tbl).count() == 5,
        "a replayed batch id must overwrite its partition, not append")
      assert(decode(merged()) == decode(batchBuilt),
        "replay must leave decoded answers unchanged")
      // a third batch so compaction has something to fold (batches 0
      // and 1 fold into -1; batch 2 — the only replayable one — stays)
      mem.addData(day1.take(1).map(e => e.copy(event_id = e.event_id + 200)): _*)
      q.processAllAvailable()
      val pre = decode(merged())
      val folded = Sketches.compactKllPartials(spark, tbl, "event_type")
      assert(folded == 2, s"batches 0 and 1 must fold, got $folded")
      val batchIds = spark.read.parquet(tbl)
        .select(col("batch_id").cast("long"))
        .distinct().as[Long].collect().toSet
      assert(batchIds == Set(-1L, 2L),
        s"compaction keeps -1 plus the newest (replayable) batch: $batchIds")
      assert(decode(merged()) == pre, "compaction must not change any answer")
      // the kept newest batch can still replay as an overwrite
      EventsStream.writeKllPartialBatch(
        day1.take(1).map(e => e.copy(event_id = e.event_id + 200)).toDF(), 2L,
        tbl, "event_type", "ts", "value", k = 200)
      assert(decode(merged()) == pre,
        "a replay of the kept batch must still be an overwrite, not a double count")
      // re-compaction is a no-op at this state (only -1 and max remain)
      assert(Sketches.compactKllPartials(spark, tbl, "event_type") == 0L)
      assert(decode(merged()) == pre)
    } finally q.stop()
  }

  test("D2→C2c: streaming decontamination — batch parity, replay idempotent, suite update next trigger") {
    import graft.operators.Dedup
    import graft.streaming.EventsStream.StreamDoc
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // eval suite: one "benchmark question" of 13+ words
    val evalText = (1 to 15).map(i => s"eval_w$i").mkString(" ")
    val eval1 = Seq((1000L, evalText)).toDF("doc_id", "text")
    val gramDir = java.nio.file.Files.createTempDirectory("graft_dc_grams").toString
    Dedup.buildEvalGramIndex(eval1).write.mode("overwrite").parquet(gramDir)
    val verdictDir = java.nio.file.Files.createTempDirectory("graft_dc_v").toString + "/v"
    val cp = java.nio.file.Files.createTempDirectory("graft_dc_cp").toString
    val mem = MemoryStream[StreamDoc]
    val q = EventsStream.decontamIngestStream(mem.toDF(), gramDir, verdictDir, cp)
    // batch 1: a contaminated doc (quotes the eval question inside an
    // unrelated page) and a clean doc
    val dirty = s"some page intro $evalText and unrelated trailing words"
    val clean = (1 to 30).map(i => s"clean_w$i").mkString(" ")
    def verdicts() = spark.read.parquet(verdictDir)
      .as[(Long, Boolean)].collect().toMap
    try {
      mem.addData(StreamDoc(1L, dirty), StreamDoc(2L, clean))
      q.processAllAvailable()
      assert(verdicts() == Map(1L -> true, 2L -> false),
        s"streamed verdicts: ${verdicts()}")
      // the COLD-START trigger seeds the census side stat (round 18):
      // every later trigger reads it in O(1) instead of re-counting
      // the gram index per micro-batch
      val seeded = Dedup.readEvalGramCensus(spark, gramDir)
      assert(seeded.contains(spark.read.parquet(gramDir).distinct().count()),
        s"first trigger must seed an exact census, got $seeded")
      // parity: the batch kernel over the same docs agrees exactly
      val batch = Dedup.flagNgramContamination(
        Seq((1L, dirty), (2L, clean)).toDF("doc_id", "text"), eval1)
        .as[(Long, Boolean)].collect().toMap
      assert(verdicts() == batch, s"stream vs batch: ${verdicts()} vs $batch")
      // replay: the same docs re-delivered append nothing
      mem.addData(StreamDoc(1L, dirty), StreamDoc(2L, clean))
      q.processAllAvailable()
      assert(spark.read.parquet(verdictDir).count() == 2,
        "re-delivered docs must not duplicate verdict rows")
      // suite UPDATE: a second eval question appends its grams; a doc
      // quoting it — clean under suite v1 — flags from the next trigger
      val evalText2 = (1 to 15).map(i => s"extra_w$i").mkString(" ")
      Dedup.buildEvalGramIndex(Seq((2000L, evalText2)).toDF("doc_id", "text"))
        .write.mode("append").parquet(gramDir)
      mem.addData(StreamDoc(3L, s"prefix $evalText2 suffix"), StreamDoc(4L, clean + " tail"))
      q.processAllAvailable()
      assert(verdicts() == Map(1L -> true, 2L -> false, 3L -> true, 4L -> false),
        s"updated suite must flag from the next trigger: ${verdicts()}")
      // this raw append bypassed the census bump (appendEvalGrams is
      // the protocol appender) — the stored stat is now STALE-SMALL,
      // and the verdicts above prove the documented safety property:
      // the census picks only the JOIN STRATEGY, never who flags
      assert(Dedup.readEvalGramCensus(spark, gramDir).exists(
        _ < spark.read.parquet(gramDir).distinct().count()),
        "the raw append should have left the census stale-small for this assert")
    } finally q.stop()
    // the n-metadata guard (r14 advice fix): probing an n=13 index with
    // n=7 would hash disjoint gram streams and verdict everything clean
    // — parquet round-trips the stamp, so the reloaded index refuses
    val reloaded = spark.read.parquet(gramDir)
    val exN = intercept[IllegalArgumentException] {
      Dedup.flagAgainstEvalGrams(
        Seq((9L, dirty)).toDF("doc_id", "text"), reloaded, n = 7)
    }
    assert(exN.getMessage.contains("n=13") && exN.getMessage.contains("n=7"),
      exN.getMessage)
  }

  test("D2→C27b: streaming vocabulary ingest bootstraps, attaches, and replays idempotently") {
    import graft.streaming.EventsStream.StreamDoc
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[StreamDoc]
    val vocab = java.nio.file.Files.createTempDirectory("graft_vocab_tbl").toString
    val cp = java.nio.file.Files.createTempDirectory("graft_vocab_cp").toString
    // the stream carries strings in the text column
    val q = EventsStream.vocabIngestStream(
      mem.toDF().select(col("text").as("name")), vocab, cp)
    def read() = spark.read.parquet(vocab)
      .as[(String, String, Boolean)].collect().map(r => r._1 -> r._2).toMap
    try {
      // batch 1 bootstraps: cat/cbt cluster, dog singleton
      mem.addData(StreamDoc(1, "cat"), StreamDoc(2, "cbt"), StreamDoc(3, "dog"))
      q.processAllAvailable()
      val v1 = read()
      assert(v1 == Map("cat" -> "cat", "cbt" -> "cat", "dog" -> "dog"), s"$v1")
      // batch 2: re-delivers cat (no-op), attaches cct, fresh newt
      mem.addData(StreamDoc(4, "cat"), StreamDoc(5, "cct"), StreamDoc(6, "newt"))
      q.processAllAvailable()
      val v2 = read()
      assert(v2 == Map("cat" -> "cat", "cbt" -> "cat", "dog" -> "dog",
        "cct" -> "cat", "newt" -> "newt"), s"$v2")
      assert(spark.read.parquet(vocab).count() == 5,
        "re-delivered names must not duplicate rows")
    } finally q.stop()
  }

  test("D2→C35b: streaming URL-index ingest bootstraps, keeps keepers stable, replays idempotently") {
    import graft.operators.Urls
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    case class Page(doc_id: Long, url: String)
    val mem = MemoryStream[(Long, String)]
    val idx = java.nio.file.Files.createTempDirectory("graft_url_idx").toString
    val cp = java.nio.file.Files.createTempDirectory("graft_url_cp").toString
    val q = EventsStream.urlIndexIngestStream(
      mem.toDF().toDF("doc_id", "url"), idx, cp)
    def read() = spark.read.parquet(idx)
      .as[(String, Long)].collect().toMap
    try {
      // batch 1 bootstraps: two variants of one resource + one other
      mem.addData((2L, "HTTPS://WWW.A.com/x/"), (1L, "https://a.com/x"),
        (3L, "https://b.com/y"))
      q.processAllAvailable()
      assert(read() === Map("https://a.com/x" -> 1L, "https://b.com/y" -> 3L))
      // batch 2: recrawl of a known resource with a SMALLER id must NOT
      // steal the keepership (first-arrival is stable); new resource appends
      mem.addData((0L, "https://a.com/x#frag"), (9L, "https://c.com/z"))
      q.processAllAvailable()
      assert(read() === Map("https://a.com/x" -> 1L, "https://b.com/y" -> 3L,
        "https://c.com/z" -> 9L))
      assert(spark.read.parquet(idx).count() === 3, "replay/recrawl must not duplicate")
      // the maintained index drives the production day-2 probe
      val batch = Seq((20L, "https://b.com/y?utm_source=x"), (21L, "https://d.com/w"))
        .toDF("doc_id", "url")
      val verdicts = Urls.urlDedupAgainstIndex(batch, spark.read.parquet(idx),
        "doc_id", "url").select("doc_id", "is_dup", "dup_of")
        .as[(Long, Boolean, Long)].collect().sortBy(_._1).toList
      assert(verdicts === List((20L, true, 3L), (21L, false, -1L)))
    } finally q.stop()
  }

  test("D2→C1b: streaming exact-index ingest bootstraps, keeps keepers stable, replays idempotently") {
    import graft.operators.Dedup
    import graft.streaming.EventsStream.StreamDoc
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[StreamDoc]
    val idx = java.nio.file.Files.createTempDirectory("graft_ex_idx").toString
    val cp = java.nio.file.Files.createTempDirectory("graft_ex_cp").toString
    val q = EventsStream.exactIndexIngestStream(mem.toDF(), idx, cp)
    def keepers() = spark.read.parquet(idx)
      .as[(String, Long)].collect().map(_._2).toSet
    try {
      // batch 1 bootstraps: two copies of one text elect min-id within
      // the batch, plus a distinct text
      mem.addData(StreamDoc(5, "alpha beta"), StreamDoc(2, "alpha beta"),
        StreamDoc(7, "gamma"))
      q.processAllAvailable()
      assert(keepers() === Set(2L, 7L))
      // batch 2: a SMALLER-id copy of a known text must NOT steal the
      // keepership (first-arrival is stable); a new text appends
      mem.addData(StreamDoc(1, "alpha beta"), StreamDoc(9, "delta"))
      q.processAllAvailable()
      assert(keepers() === Set(2L, 7L, 9L))
      assert(spark.read.parquet(idx).count() === 3, "re-seen texts must not duplicate")
      // re-delivery of batch 2 appends nothing
      mem.addData(StreamDoc(1, "alpha beta"), StreamDoc(9, "delta"))
      q.processAllAvailable()
      assert(spark.read.parquet(idx).count() === 3)
      // the maintained index drives the production day-2 probe
      val verdicts = Dedup.dedupExactAgainstIndex(
        Seq((20L, "gamma"), (21L, "epsilon")).toDF("doc_id", "text"),
        spark.read.parquet(idx))
        .as[(Long, Boolean, Long)].collect().sortBy(_._1).toList
      assert(verdicts === List((20L, true, 7L), (21L, false, -1L)))
    } finally q.stop()
  }

  test("D2→C37: streaming NB scoring matches the batch kernel, replays idempotently, fit-first") {
    import graft.operators.Classify
    import graft.streaming.EventsStream.StreamDoc
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val seed = Seq((1L, "A", "aa bb aa"), (2L, "A", "aa cc"),
      (3L, "B", "dd ee"), (4L, "B", "dd dd ff")).toDF("doc_id", "label", "text")
    val (tc, cs) = Classify.nbFit(seed, "label", "text")
    val tcp = java.nio.file.Files.createTempDirectory("graft_nb_tc").toString
    val csp = java.nio.file.Files.createTempDirectory("graft_nb_cs").toString
    val scored = java.nio.file.Files.createTempDirectory("graft_nb_scored").toString + "/t"
    val cp = java.nio.file.Files.createTempDirectory("graft_nb_cp").toString
    tc.write.mode("overwrite").parquet(tcp); cs.write.mode("overwrite").parquet(csp)
    val mem = MemoryStream[StreamDoc]
    val q = EventsStream.nbScoreStream(mem.toDF(), tcp, csp, scored, cp)
    try {
      mem.addData(StreamDoc(10, "aa aa bb"), StreamDoc(11, "dd ff"))
      q.processAllAvailable()
      // batch 2 re-delivers doc 10 (must not re-score) plus a new doc
      mem.addData(StreamDoc(10, "aa aa bb"), StreamDoc(12, "zz"))
      q.processAllAvailable()
      val got = spark.read.parquet(scored)
        .as[(Long, String, Long)].collect().sortBy(_._1).toList
      val expect = Classify.nbScore(
        Seq((10L, "aa aa bb"), (11L, "dd ff"), (12L, "zz")).toDF("doc_id", "text"),
        tc, cs).as[(Long, String, Long)].collect().sortBy(_._1).toList
      assert(got === expect, "streamed verdicts must equal the batch kernel")
      assert(got.map(_._1) === List(10L, 11L, 12L), "re-delivery must not duplicate")
    } finally q.stop()
  }

  test("D2→C49: streaming BPE stats match the batch kernel, replay idempotently, train-first") {
    import graft.operators.Bpe
    import graft.streaming.EventsStream.StreamDoc
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // a real trained table persisted as the frozen artifact
    val merges = Bpe.train(
      Seq((1L, "low low low lower newest newest widest")).toDF("doc_id", "text"),
      "text", numMerges = 5)
    val mp = java.nio.file.Files.createTempDirectory("graft_bpe_m").toString
    Bpe.mergesTable(spark, merges).write.mode("overwrite").parquet(mp)
    val stats = java.nio.file.Files.createTempDirectory("graft_bpe_s").toString + "/t"
    val cp = java.nio.file.Files.createTempDirectory("graft_bpe_cp").toString
    val mem = MemoryStream[StreamDoc]
    val q = EventsStream.bpeStatsStream(mem.toDF(), mp, stats, cp)
    try {
      mem.addData(StreamDoc(10, "lowest newest"), StreamDoc(11, "widest low"))
      q.processAllAvailable()
      // batch 2 re-delivers doc 10 (must not re-encode) plus a new doc
      mem.addData(StreamDoc(10, "lowest newest"), StreamDoc(12, "west"))
      q.processAllAvailable()
      val got = spark.read.parquet(stats)
        .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toList
      val expect = Bpe.encodeStats(
        Seq((10L, "lowest newest"), (11L, "widest low"), (12L, "west"))
          .toDF("doc_id", "text"), merges, useKernel = true)
        .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toList
      assert(got === expect, "streamed stats must equal the batch kernel")
      assert(got.map(_._1) === List(10L, 11L, 12L), "re-delivery must not duplicate")
      // and the kernel path agrees with the certified fold on the same rows
      val fold = Bpe.encodeStats(
        Seq((10L, "lowest newest"), (11L, "widest low"), (12L, "west"))
          .toDF("doc_id", "text"), merges)
        .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toList
      assert(got === fold, "kernel stats must equal the fold stats")
    } finally q.stop()
    // train-first contract: an empty merges table refuses loudly
    val empty = java.nio.file.Files.createTempDirectory("graft_bpe_e").toString
    Bpe.mergesTable(spark, Seq(("a", "b"))).limit(0)
      .write.mode("overwrite").parquet(empty)
    val cp2 = java.nio.file.Files.createTempDirectory("graft_bpe_cp2").toString
    val mem2 = MemoryStream[StreamDoc]
    val q2 = EventsStream.bpeStatsStream(mem2.toDF(), empty,
      java.nio.file.Files.createTempDirectory("graft_bpe_s2").toString + "/t", cp2)
    try {
      mem2.addData(StreamDoc(1, "x"))
      val e = intercept[Exception] { q2.processAllAvailable() }
      assert(e.getMessage.contains("train first")
        || Option(e.getCause).exists(_.getMessage.contains("train first")),
        s"expected the train-first refusal, got: ${e.getMessage}")
    } finally q2.stop()
  }

  test("D2→C44: streaming WET ingest parses chunks once, replays idempotently, matches batch parse") {
    import graft.sources.Warc
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def rec(uri: String, payload: String) =
      s"WARC/1.0\nWARC-Target-URI: $uri\nContent-Length: ${payload.length}\n\n$payload\n\n"
    val c1 = rec("https://a.com/1", "alpha beta") + rec("https://a.com/2", "gamma")
    val c2 = rec("https://b.com/1", "delta")
    val mem = MemoryStream[(Long, String)]
    val records = java.nio.file.Files.createTempDirectory("graft_wet_tbl").toString + "/t"
    val cp = java.nio.file.Files.createTempDirectory("graft_wet_cp").toString
    val q = EventsStream.wetIngestStream(mem.toDF().toDF("chunk_id", "content"), records, cp)
    try {
      mem.addData((1L, c1))
      q.processAllAvailable()
      // batch 2 re-delivers chunk 1 (must anti-join away) plus chunk 2
      mem.addData((1L, c1), (2L, c2))
      q.processAllAvailable()
      val got = spark.read.parquet(records)
      assert(got.count() === 3L, "re-delivered chunk must not duplicate records")
      // streamed records equal the one-shot batch parse
      val batchParsed = Warc.wetRecords(
        Seq((1L, c1), (2L, c2)).toDF("chunk_id", "content"), "chunk_id", "content")
      assert(got.select("chunk_id", "rec_idx", "uri", "payload", "length_ok")
        .as[(Long, Long, String, String, Boolean)].collect().toSet ===
        batchParsed.select("chunk_id", "rec_idx", "uri", "payload", "length_ok")
          .as[(Long, Long, String, String, Boolean)].collect().toSet)
    } finally q.stop()
  }

  test("D2→C30: streaming postings ingest extends the index exactly once; search matches batch build") {
    import graft.operators.Search
    import graft.streaming.EventsStream.StreamDoc
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[StreamDoc]
    val postings = java.nio.file.Files.createTempDirectory("graft_post_tbl").toString
    val stats = java.nio.file.Files.createTempDirectory("graft_post_stats").toString
    val cp = java.nio.file.Files.createTempDirectory("graft_post_cp").toString
    val q = EventsStream.postingsIngestStream(mem.toDF(), postings, stats, cp)
    try {
      mem.addData(StreamDoc(1, "spark window functions"), StreamDoc(2, "spark batch"))
      q.processAllAvailable()
      // batch 2 re-delivers doc 1 (must anti-join away) plus a new doc
      mem.addData(StreamDoc(1, "spark window functions"), StreamDoc(3, "window joins"))
      q.processAllAvailable()
      // no doubling: doc 1 holds exactly its three distinct-term rows
      val p = spark.read.parquet(postings)
      assert(p.filter(col("doc_id") === 1L).count() == 3,
        "re-delivered doc must not duplicate its postings")
      // streamed artifacts answer EXACTLY like the one-shot batch build
      val all = Seq((1L, "spark window functions"), (2L, "spark batch"),
        (3L, "window joins")).toDF("doc_id", "text")
      val (bp, bs) = Search.buildPostings(all)
      val streamed = Search.bm25Search(p, spark.read.parquet(stats),
        Seq("spark", "window"), k = 10).as[(Long, Long, Double)].collect().toSeq
      val batchBuilt = Search.bm25Search(bp, bs,
        Seq("spark", "window"), k = 10).as[(Long, Long, Double)].collect().toSeq
      assert(streamed == batchBuilt, s"streamed $streamed vs batch $batchBuilt")
    } finally q.stop()
  }

  test("D2→C30c: streaming positional ingest extends the phrase index exactly once; search matches batch build") {
    import graft.operators.Search
    import graft.streaming.EventsStream.StreamDoc
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[StreamDoc]
    val pos = java.nio.file.Files.createTempDirectory("graft_pos_tbl").toString
    val cp = java.nio.file.Files.createTempDirectory("graft_pos_cp").toString
    val q = EventsStream.positionalIngestStream(mem.toDF(), pos, cp)
    try {
      mem.addData(StreamDoc(1, "hash table wins"), StreamDoc(2, "hash join"))
      q.processAllAvailable()
      // batch 2 re-delivers doc 1 (must anti-join away) plus a new doc
      mem.addData(StreamDoc(1, "hash table wins"), StreamDoc(3, "hash table hash table"))
      q.processAllAvailable()
      val p = spark.read.parquet(pos)
      assert(p.filter(col("doc_id") === 1L).count() == 3,
        "re-delivered doc must not duplicate its positional rows")
      // streamed artifact answers EXACTLY like the one-shot batch build
      val all = Seq((1L, "hash table wins"), (2L, "hash join"),
        (3L, "hash table hash table")).toDF("doc_id", "text")
      val streamed = Search.phraseSearch(p, Seq("hash", "table"), k = 10)
        .as[(Long, Long, Long)].collect().toSeq
      val batchBuilt = Search.phraseSearch(Search.buildPositionalPostings(all),
        Seq("hash", "table"), k = 10).as[(Long, Long, Long)].collect().toSeq
      assert(streamed == batchBuilt && streamed.head == ((1L, 3L, 2L)),
        s"streamed $streamed vs batch $batchBuilt")
    } finally q.stop()
  }

  test("D2e crash-safety: stats rebuild heals a postings-appended/stats-lost crash window") {
    import graft.operators.Search
    import graft.streaming.EventsStream.StreamDoc
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[StreamDoc]
    val postings = java.nio.file.Files.createTempDirectory("graft_postcr_tbl").toString
    val stats = java.nio.file.Files.createTempDirectory("graft_postcr_stats").toString
    val cp = java.nio.file.Files.createTempDirectory("graft_postcr_cp").toString
    val q = EventsStream.postingsIngestStream(mem.toDF(), postings, stats, cp)
    try {
      mem.addData(StreamDoc(1, "spark window functions"), StreamDoc(2, "spark batch"))
      q.processAllAvailable()
      // simulate the crash-between-writes: doc 3's postings land (the
      // append committed) but the job dies before the stats write —
      // exactly the hazard where incremental stats would skew forever,
      // because the replayed doc anti-joins away and never re-counts
      val (crashP, _) = Search.buildPostings(
        Seq((3L, "window joins")).toDF("doc_id", "text"))
      crashP.write.mode(org.apache.spark.sql.SaveMode.Append).parquet(postings)
      // replay the crashed batch ALONE: every doc anti-joins away
      // (nNew == 0) — the heal must still rebuild stats from the
      // artifact, not skip because nothing new appended
      mem.addData(StreamDoc(3, "window joins"))
      q.processAllAvailable()
      def statsRow() = spark.read.parquet(stats).as[(Long, Long)].collect().toSeq
      val threeDocs = Seq((1L, "spark window functions"), (2L, "spark batch"),
        (3L, "window joins"))
      assert(statsRow() == Search.buildPostings(threeDocs.toDF("doc_id", "text"))
        ._2.as[(Long, Long)].collect().toSeq,
        s"a pure replay of the crashed batch must heal stats: ${statsRow()}")
      // and a later batch with a genuinely new doc stays exact too
      mem.addData(StreamDoc(4, "batch joins fast"))
      q.processAllAvailable()
      val all = (threeDocs :+ (4L, "batch joins fast")).toDF("doc_id", "text")
      val (_, bs) = Search.buildPostings(all)
      val got = statsRow()
      val want = bs.as[(Long, Long)].collect().toSeq
      assert(got == want, s"stats must self-heal from the artifact: $got vs $want")
    } finally q.stop()
  }

  test("E→A24: gated lake sink quarantines failing batches, good partitions survive") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[StreamEvent]
    val lake = java.nio.file.Files.createTempDirectory("graft_gate_lake").toString
    val quar = java.nio.file.Files.createTempDirectory("graft_gate_quar").toString
    val cp = java.nio.file.Files.createTempDirectory("graft_gate_cp").toString
    val daily = mem.toDF()
      .groupBy(col("ts").cast("date").cast("string").as("date"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
    val q = EventsStream.gatedDayPartitionedStream(
      daily, lake, quar, "date", cp,
      rules = Seq("negative_total" -> (col("total") < 0)))
    def lakeRows() = spark.read.parquet(lake)
      .select("date", "n", "total").as[(String, Long, Double)].collect().toSet
    try {
      // good batch lands in the lake
      mem.addData(
        StreamEvent(1, ts("2024-01-01 10:00:00"), 1, "click", 5.0),
        StreamEvent(2, ts("2024-01-02 10:00:00"), 1, "click", 7.0))
      q.processAllAvailable()
      assert(lakeRows() == Set(("2024-01-01", 1L, 5.0), ("2024-01-02", 1L, 7.0)))
      // a poisoned refund flips day 2 negative: the WHOLE snapshot is
      // quarantined and the lake keeps its last good day-2 row
      mem.addData(StreamEvent(3, ts("2024-01-02 11:00:00"), 2, "refund", -50.0))
      q.processAllAvailable()
      assert(lakeRows() == Set(("2024-01-01", 1L, 5.0), ("2024-01-02", 1L, 7.0)),
        "a failing batch must not replace good partitions")
      // read through the schema-transition-safe reader: plant a
      // pre-round-12 "legacy" file (no violations column) alongside the
      // new rows — plain spark.read.parquet could pick the legacy
      // footer and silently drop the column; readQuarantine merges
      // schemas and backfills the legacy row with an empty array
      Seq(("2023-12-31", 9L, 1.0, 99L, Seq("negative_total")))
        .toDF("date", "n", "total", "_quarantine_batch", "_failed_rules")
        .write.mode("append").parquet(quar)
      val quarantined = EventsStream.readQuarantine(spark, quar)
      assert(quarantined.columns.contains("violations"),
        "readQuarantine must surface the violations column across mixed-era files")
      assert(quarantined.filter(col("date") === "2023-12-31")
        .select(col("violations")).as[Seq[String]].head().isEmpty,
        "legacy rows backfill to an empty violations array")
      val quarantinedNew = quarantined.filter(col("date") >= "2024-01-01")
      assert(quarantinedNew.count() == 2) // the full bad snapshot
      val flagged = quarantined.select(explode(col("_failed_rules")))
        .as[String].collect().toSet
      assert(flagged == Set("negative_total"))
      // per-row triage (round-11 advice): each quarantined row carries
      // the rules IT fails — the poisoned day-2 row names the rule, the
      // clean day-1 row swept up by the whole-batch policy carries an
      // empty array — so triage never re-runs the rules
      val perRow = quarantined
        .select(col("date"), col("violations"))
        .as[(String, Seq[String])].collect().toMap
      assert(perRow("2024-01-02") == Seq("negative_total"),
        s"the dirty row must name its failed rules, got $perRow")
      assert(perRow("2024-01-01").isEmpty,
        s"the clean row rides with an empty violations array, got $perRow")
    } finally q.stop()
  }

  test("D2→C7b: streaming IVF ingest extends cells exactly once, searches see new vectors") {
    import graft.operators.Similarity
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // seed: build the index on the real embeddings table's first 300 ids
    val all = Tables(spark, sfDir).embeddings
    val (assigned, centroids) = Similarity.buildIvfIndex(
      all.filter(col("vec_id") < 300))
    graft.sources.Bucketing.writeBucketed(assigned, "stream_ivf", Seq("cell"), 8)
    val centDir = java.nio.file.Files.createTempDirectory("graft_ivf_cent_s").toString
    centroids.write.mode("overwrite").parquet(centDir)
    val before = spark.table("stream_ivf").count()

    val mem = MemoryStream[(Long, Seq[Double])]
    val cp = java.nio.file.Files.createTempDirectory("graft_ivf_cp").toString
    val q = EventsStream.ivfIngestStream(
      mem.toDF().toDF("vec_id", "embedding"), "stream_ivf", centDir, cp)
    try {
      // stream TWINS of indexed vectors 5 and 7 under the fresh ids
      // 300/302 (ids the seed build never saw)
      val donors = all.filter(col("vec_id").isin(5L, 7L))
        .select(col("vec_id") + 295L, col("embedding").cast("array<double>"))
        .as[(Long, Seq[Double])].collect().toSeq
      mem.addData(donors: _*)
      q.processAllAvailable()
      // the writer appends behind this session's back - refresh the
      // cached file listing before reading (see ivfIngestStream doc)
      def indexCount() = {
        spark.catalog.refreshTable("stream_ivf")
        spark.table("stream_ivf").count()
      }
      assert(indexCount() == before + 2)
      // re-delivery: already-indexed ids append nothing
      mem.addData(donors: _*)
      q.processAllAvailable()
      assert(indexCount() == before + 2,
        "replayed ids must not duplicate index rows")
      // a streamed vector is reachable: the indexed donor must list its
      // streamed twin as an exact-match neighbor (identical vector →
      // cos 1.0, same cell by construction)
      val out = Similarity.annIvfSearch(spark.table("stream_ivf"), centroids,
        k = 3, numQueries = 10)
        .as[(Long, Long, Long, Double)].collect()
      assert(out.exists(r => r._1 == 5L && r._3 == 300L && r._4 == 1.0),
        s"donor 5 must see its streamed twin at cos 1.0: ${out.filter(_._1 == 5L).toSeq}")
      assert(out.exists(r => r._1 == 7L && r._3 == 302L && r._4 == 1.0),
        s"donor 7 must see its streamed twin at cos 1.0: ${out.filter(_._1 == 7L).toSeq}")
    } finally q.stop()
  }

  test("D2→C26d: streaming IMI ingest extends product cells exactly once, in the build's own cells") {
    import graft.operators.Similarity
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val all = Tables(spark, sfDir).embeddings
    val (assigned, c1, c2) = Similarity.buildIvfIndexTwoLevel(
      all.filter(col("vec_id") < 300), k1 = 4, k2 = 4)
    graft.sources.Bucketing.writeBucketed(assigned, "stream_imi", Seq("cell"), 8)
    val d1 = java.nio.file.Files.createTempDirectory("graft_imi_c1").toString
    val d2 = java.nio.file.Files.createTempDirectory("graft_imi_c2").toString
    c1.write.mode("overwrite").parquet(d1)
    c2.write.mode("overwrite").parquet(d2)
    val before = spark.table("stream_imi").count()
    val mem = MemoryStream[(Long, Seq[Double])]
    val cp = java.nio.file.Files.createTempDirectory("graft_imi_cp").toString
    val q = EventsStream.imiIngestStream(
      mem.toDF().toDF("vec_id", "embedding"), "stream_imi", d1, d2, k2 = 4, cp)
    def count() = {
      spark.catalog.refreshTable("stream_imi")
      spark.table("stream_imi").count()
    }
    try {
      // stream a twin of indexed vector 5 under a fresh id: it must
      // land in EXACTLY vector 5's product cell (shared argmin rule)
      val donor = all.filter(col("vec_id") === 5L)
        .select(col("embedding").cast("array<double>")).as[Seq[Double]].head()
      mem.addData((500L, donor))
      q.processAllAvailable()
      assert(count() == before + 1)
      val cells = spark.table("stream_imi")
        .filter(col("vec_id").isin(5L, 500L))
        .select(col("vec_id"), col("cell")).as[(Long, Int)].collect().toMap
      assert(cells(500L) == cells(5L),
        s"the streamed twin must land in its donor's product cell: $cells")
      // re-delivery appends nothing
      mem.addData((500L, donor))
      q.processAllAvailable()
      assert(count() == before + 1, "replayed ids must not duplicate index rows")
    } finally q.stop()
  }

  test("D2→C7e: streaming IMI+ADC ingest — product cell + codes match the build, exactly-once") {
    import graft.operators.Similarity
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val all = Tables(spark, sfDir).embeddings
    val (corpus, c1, c2, cb) = Similarity.buildImiPqIndex(
      all.filter(col("vec_id") < 300), k1 = 4, k2 = 4)
    graft.sources.Bucketing.writeBucketed(corpus, "stream_imipq", Seq("cell"), 8)
    val d1 = java.nio.file.Files.createTempDirectory("graft_imipq_c1").toString
    val d2 = java.nio.file.Files.createTempDirectory("graft_imipq_c2").toString
    val dcb = java.nio.file.Files.createTempDirectory("graft_imipq_cb").toString
    c1.write.mode("overwrite").parquet(d1)
    c2.write.mode("overwrite").parquet(d2)
    cb.write.mode("overwrite").parquet(dcb)
    val before = spark.table("stream_imipq").count()
    val mem = MemoryStream[(Long, Seq[Double])]
    val cp = java.nio.file.Files.createTempDirectory("graft_imipq_cp").toString
    val q = EventsStream.imiPqIngestStream(
      mem.toDF().toDF("vec_id", "embedding"), "stream_imipq", d1, d2, 4, dcb, cp)
    def count() = {
      spark.catalog.refreshTable("stream_imipq")
      spark.table("stream_imipq").count()
    }
    try {
      // a twin of indexed vector 5 under a fresh id: identical product
      // cell AND identical residual codes (shared argmin + frozen
      // codebook make the whole encode a pure function of the vector)
      val donor = all.filter(col("vec_id") === 5L)
        .select(col("embedding").cast("array<double>")).as[Seq[Double]].head()
      mem.addData((500L, donor))
      q.processAllAvailable()
      assert(count() == before + 1)
      val rows = spark.table("stream_imipq")
        .filter(col("vec_id").isin(5L, 500L))
        .select(col("vec_id"), col("cell"), col("codes"))
        .as[(Long, Int, Seq[Int])].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      assert(rows(500L) == rows(5L),
        s"the streamed twin must reproduce its donor's cell AND codes: $rows")
      // re-delivery appends nothing
      mem.addData((500L, donor))
      q.processAllAvailable()
      assert(count() == before + 1, "replayed ids must not duplicate index rows")
      // the composed search sees the streamed vector: the donor finds
      // its twin at exact cosine 1.0 after the rerank
      val found = Similarity.annImiPqSearch(
        spark.table("stream_imipq"), c1, c2, 4, cb, k = 3, numQueries = 10)
        .as[(Long, Long, Long, Double)].collect()
      assert(found.exists(r => r._1 == 5L && r._3 == 500L && r._4 == 1.0),
        s"vector 5 must see its streamed twin at cos 1.0: ${found.filter(_._1 == 5L).toSeq}")
    } finally q.stop()
  }

  test("D2→C26b: streaming semantic-dedup ingest — self pass, index verdicts, exactly-once growth") {
    import graft.operators.Similarity
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // seed: index the real embeddings table's first 300 ids
    val all = Tables(spark, sfDir).embeddings
    val (assigned, centroids) = Similarity.buildIvfIndex(
      all.filter(col("vec_id") < 300))
    graft.sources.Bucketing.writeBucketed(assigned, "stream_semdd", Seq("cell"), 8)
    val centDir = java.nio.file.Files.createTempDirectory("graft_semdd_cent").toString
    centroids.write.mode("overwrite").parquet(centDir)
    val before = spark.table("stream_semdd").count()

    val mem = MemoryStream[(Long, Seq[Double])]
    val cp = java.nio.file.Files.createTempDirectory("graft_semdd_cp").toString
    val acceptedIds = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = EventsStream.semanticDedupIngestStream(
      mem.toDF().toDF("vec_id", "embedding"), "stream_semdd", centDir, cp,
      accept = df => acceptedIds ++=
        df.select(col("vec_id")).as[Long](org.apache.spark.sql.Encoders.scalaLong)
          .collect(),
      threshold = 0.9999)
    def indexCount() = {
      spark.catalog.refreshTable("stream_semdd")
      spark.table("stream_semdd").count()
    }
    try {
      // batch 1: a twin of INDEXED vector 5 (id 500 — must be rejected
      // by the index probe), a fresh never-indexed vector 400's data
      // under id 501 (accepted), and a WITHIN-BATCH twin of that same
      // vector under id 502 (the self pass must collapse it)
      val donor5 = all.filter(col("vec_id") === 5L)
        .select(col("embedding").cast("array<double>")).as[Seq[Double]].head()
      val fresh = all.filter(col("vec_id") === 400L)
        .select(col("embedding").cast("array<double>")).as[Seq[Double]].head()
      mem.addData((500L, donor5), (501L, fresh), (502L, fresh))
      q.processAllAvailable()
      assert(acceptedIds.toSet == Set(501L),
        s"index twin rejected, within-batch twin collapsed, fresh accepted: $acceptedIds")
      assert(indexCount() == before + 1, "only the accepted vector appends")
      // batch 2: a twin of the JUST-ACCEPTED 501 must now reject
      // against the grown index; replaying 501 appends nothing
      mem.addData((503L, fresh), (501L, fresh))
      q.processAllAvailable()
      assert(!acceptedIds.contains(503L),
        s"a twin of a streamed-in vector must reject next trigger: $acceptedIds")
      assert(indexCount() == before + 1,
        "re-delivered and rejected ids must not grow the index")
      // append-before-accept (round-14 advice): a re-delivered
      // already-indexed id verdicts as a dup and never re-accepts
      assert(acceptedIds.count(_ == 501L) == 1,
        s"accept must fire at most once per row across re-deliveries: $acceptedIds")
    } finally q.stop()
  }

  test("D2→C26e: streaming IMI semantic-dedup ingest — self pass, knobbed probe, append-then-accept") {
    import graft.operators.Similarity
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val all = Tables(spark, sfDir).embeddings
    val (assigned, c1, c2) = Similarity.buildIvfIndexTwoLevel(
      all.filter(col("vec_id") < 300), k1 = 4, k2 = 4)
    graft.sources.Bucketing.writeBucketed(assigned, "stream_semdd_imi", Seq("cell"), 8)
    val d1 = java.nio.file.Files.createTempDirectory("graft_sdi_c1").toString
    val d2 = java.nio.file.Files.createTempDirectory("graft_sdi_c2").toString
    c1.write.mode("overwrite").parquet(d1)
    c2.write.mode("overwrite").parquet(d2)
    val before = spark.table("stream_semdd_imi").count()
    val mem = MemoryStream[(Long, Seq[Double])]
    val cp = java.nio.file.Files.createTempDirectory("graft_sdi_cp").toString
    val acceptedIds = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = EventsStream.semanticDedupImiIngestStream(
      mem.toDF().toDF("vec_id", "embedding"), "stream_semdd_imi", d1, d2, 4, cp,
      accept = df => acceptedIds ++=
        df.select(col("vec_id")).as[Long](org.apache.spark.sql.Encoders.scalaLong)
          .collect(),
      threshold = 0.9999)
    def indexCount() = {
      spark.catalog.refreshTable("stream_semdd_imi")
      spark.table("stream_semdd_imi").count()
    }
    try {
      val donor5 = all.filter(col("vec_id") === 5L)
        .select(col("embedding").cast("array<double>")).as[Seq[Double]].head()
      val fresh = all.filter(col("vec_id") === 400L)
        .select(col("embedding").cast("array<double>")).as[Seq[Double]].head()
      // index twin rejects (the shared argmin lands it in the donor's
      // product cell), within-batch twin collapses, fresh accepts
      mem.addData((500L, donor5), (501L, fresh), (502L, fresh))
      q.processAllAvailable()
      assert(acceptedIds.toSet == Set(501L),
        s"index twin rejected, self twin collapsed, fresh accepted: $acceptedIds")
      assert(indexCount() == before + 1, "only the accepted vector appends")
      // a twin of the streamed-in 501 rejects next trigger; replaying
      // 501 appends nothing and never re-accepts (append-then-accept)
      mem.addData((503L, fresh), (501L, fresh))
      q.processAllAvailable()
      assert(!acceptedIds.contains(503L),
        s"a twin of a streamed-in vector must reject next trigger: $acceptedIds")
      assert(indexCount() == before + 1,
        "re-delivered and rejected ids must not grow the index")
      assert(acceptedIds.count(_ == 501L) == 1,
        s"accept must fire at most once per row: $acceptedIds")
    } finally q.stop()
  }

  test("D2→C12b: streaming raw-text ingest embeds and indexes; a copied doc is found at cos 1.0") {
    import graft.operators.{Similarity, TextEmbed}
    import graft.streaming.EventsStream.StreamDoc
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // seed corpus: embed the real documents table, index the first 300
    val docs = Tables(spark, sfDir).documents
    val emb = TextEmbed.embedDocuments(docs).filter(col("vec_id") < 300)
    val (assigned, centroids) = Similarity.buildIvfIndex(emb)
    graft.sources.Bucketing.writeBucketed(assigned, "stream_text_ivf", Seq("cell"), 8)
    val centDir = java.nio.file.Files.createTempDirectory("graft_tivf_cent").toString
    centroids.write.mode("overwrite").parquet(centDir)
    val before = spark.table("stream_text_ivf").count()

    val mem = MemoryStream[StreamDoc]
    val cp = java.nio.file.Files.createTempDirectory("graft_tivf_cp").toString
    val q = EventsStream.textEmbedIngestStream(
      mem.toDF(), "stream_text_ivf", centDir, cp)
    try {
      // stream a verbatim COPY of doc 5's text under a fresh id — its
      // embedding is identical by determinism, so the donor must see
      // it at cos 1.0 in its own cell
      val donorText = docs.filter(col("doc_id") === 5L)
        .select(col("text")).as[String].head()
      mem.addData(StreamDoc(9005L, donorText), StreamDoc(9006L, "a fresh unrelated doc"))
      q.processAllAvailable()
      def indexCount() = {
        spark.catalog.refreshTable("stream_text_ivf")
        spark.table("stream_text_ivf").count()
      }
      assert(indexCount() == before + 2)
      // re-delivery appends nothing
      mem.addData(StreamDoc(9005L, donorText))
      q.processAllAvailable()
      assert(indexCount() == before + 2)
      val out = Similarity.annIvfSearch(spark.table("stream_text_ivf"), centroids,
        k = 3, numQueries = 10)
        .as[(Long, Long, Long, Double)].collect()
      assert(out.exists(r => r._1 == 5L && r._3 == 9005L && r._4 == 1.0),
        s"doc 5 must see its streamed text copy at cos 1.0: ${out.filter(_._1 == 5L).toSeq}")
    } finally q.stop()
  }

  test("D2→C7d: streaming IVFADC ingest extends the composed index exactly once") {
    import graft.operators.Similarity
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // seed: build the composed index on the first 300 ids, persist the
    // artifacts the stream is allowed to use (centroids + codebook
    // parquet — no model objects cross the batch/stream boundary)
    val all = Tables(spark, sfDir).embeddings
    val (corpus, centroids, codebook) = Similarity.buildIvfPqIndex(
      all.filter(col("vec_id") < 300))
    graft.sources.Bucketing.writeBucketed(corpus, "stream_ivfpq", Seq("cell"), 8)
    val artDir = java.nio.file.Files.createTempDirectory("graft_ivfpq_art_s").toString
    centroids.write.mode("overwrite").parquet(s"$artDir/centroids")
    codebook.write.mode("overwrite").parquet(s"$artDir/codebook")
    val before = spark.table("stream_ivfpq").count()

    val mem = MemoryStream[(Long, Seq[Double])]
    val cp = java.nio.file.Files.createTempDirectory("graft_ivfpq_cp").toString
    val q = EventsStream.ivfPqIngestStream(
      mem.toDF().toDF("vec_id", "embedding"), "stream_ivfpq",
      s"$artDir/centroids", s"$artDir/codebook", cp)
    try {
      // stream TWINS of indexed vectors 5 and 7 under fresh ids 300/302
      val donors = all.filter(col("vec_id").isin(5L, 7L))
        .select(col("vec_id") + 295L, col("embedding").cast("array<double>"))
        .as[(Long, Seq[Double])].collect().toSeq
      mem.addData(donors: _*)
      q.processAllAvailable()
      def indexCount() = {
        spark.catalog.refreshTable("stream_ivfpq")
        spark.table("stream_ivfpq").count()
      }
      assert(indexCount() == before + 2)
      // re-delivery: already-indexed ids append nothing
      mem.addData(donors: _*)
      q.processAllAvailable()
      assert(indexCount() == before + 2,
        "replayed ids must not duplicate index rows")
      // a streamed twin is reachable through the COMPOSED search — it
      // lands in the donor's cell with the donor's codes (identical
      // vector → identical residual → identical argmin), so ADC keeps
      // it and the exact rerank scores cos 1.0
      val out = Similarity.annIvfPqSearch(spark.table("stream_ivfpq"),
        centroids, codebook, k = 3, numQueries = 10)
        .as[(Long, Long, Long, Double)].collect()
      assert(out.exists(r => r._1 == 5L && r._3 == 300L && r._4 == 1.0),
        s"donor 5 must see its streamed twin at cos 1.0: ${out.filter(_._1 == 5L).toSeq}")
      assert(out.exists(r => r._1 == 7L && r._3 == 302L && r._4 == 1.0),
        s"donor 7 must see its streamed twin at cos 1.0: ${out.filter(_._1 == 7L).toSeq}")
    } finally q.stop()
  }

  test("D1→A20: streaming anomaly flags score finalized days against the durable baseline") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[StreamEvent]
    val path = java.nio.file.Files.createTempDirectory("graft_anom_tbl").toString
    val cp = java.nio.file.Files.createTempDirectory("graft_anom_cp").toString
    val alerts = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long, Double)]
    val q = EventsStream.anomalyIngestStream(
      mem.toDF(), path, cp,
      alert = df => alerts.synchronized {
        alerts ++= df
          .select(col("event_type"), col("day").cast("string"),
            col("n_events"), col("z_score"))
          .as[(String, String, Long, Double)].collect()
      })
    try {
      // noisy-but-normal week: alternating 1/3 clicks on days 1..7
      val base = Seq(1, 3, 1, 3, 1, 3, 1).zipWithIndex.flatMap { case (n, i) =>
        (0 until n).map { j =>
          StreamEvent(i * 10 + j, ts(f"2024-01-${i + 1}%02d 10:00:00"), j, "click", 1.0)
        }
      }
      mem.addData(base: _*)
      q.processAllAvailable()
      assert(alerts.isEmpty, s"normal week must not alert: $alerts")
      // spike on day 8, plus a day-10 marker that advances the
      // watermark (1-day lag) past day 8's window end to finalize it
      mem.addData((0 until 10).map { j =>
        StreamEvent(100 + j, ts("2024-01-08 10:00:00"), j, "click", 1.0)
      }: _*)
      mem.addData(StreamEvent(200, ts("2024-01-10 23:00:00"), 1, "click", 1.0))
      q.processAllAvailable()
      assert(alerts.map(a => (a._1, a._2, a._3)).toSeq == Seq(("click", "2024-01-08", 10L)),
        s"spike day must alert exactly once: $alerts")
      assert(alerts.head._4 > 2.0)
      // the durable counts table carries every finalized day
      val days = spark.read.parquet(path).select(col("day").cast("string"))
        .as[String].collect().toSet
      assert(days == (1 to 8).map(d => f"2024-01-$d%02d").toSet, days)

      // REPLAY idempotency: a recovery restart re-delivers day 8 while
      // countsPath already holds it. Without the (key, day) anti-join
      // the baseline for day 9 would contain day 8 TWICE (history ∪
      // batch), shrinking stddev_samp and shifting every downstream
      // z-score — replays would alert differently from first delivery.
      val firstDeliveryZ = alerts.head._4
      alerts.clear()
      val mem2 = MemoryStream[StreamEvent]
      val cp2 = java.nio.file.Files.createTempDirectory("graft_anom_cp2").toString
      val q2 = EventsStream.anomalyIngestStream(
        mem2.toDF(), path, cp2,
        alert = df => alerts.synchronized {
          alerts ++= df
            .select(col("event_type"), col("day").cast("string"),
              col("n_events"), col("z_score"))
            .as[(String, String, Long, Double)].collect()
        })
      try {
        // re-deliver the day-8 spike verbatim, plus a new day-9 spike
        // and a day-11 marker that finalizes both
        mem2.addData((0 until 10).map { j =>
          StreamEvent(100 + j, ts("2024-01-08 10:00:00"), j, "click", 1.0)
        }: _*)
        mem2.addData((0 until 12).map { j =>
          StreamEvent(300 + j, ts("2024-01-09 10:00:00"), j, "click", 1.0)
        }: _*)
        mem2.addData(StreamEvent(400, ts("2024-01-11 23:00:00"), 1, "click", 1.0))
        q2.processAllAvailable()
        val replayed = alerts.sortBy(_._2).toSeq
        // day 8 re-scores with EXACTLY its first-delivery z (baseline
        // days 1-7 from history, untouched by the replay)
        assert(replayed.map(a => (a._1, a._2, a._3)) ==
          Seq(("click", "2024-01-08", 10L), ("click", "2024-01-09", 12L)), replayed)
        assert(replayed.head._4 == firstDeliveryZ, s"replayed day-8 z must match: $replayed")
        // day 9's baseline is days 2-8 with the re-delivered day 8
        // counted ONCE (batch copy; the history copy anti-joins away)
        val b = Seq(3.0, 1.0, 3.0, 1.0, 3.0, 1.0, 10.0)
        val m = b.sum / b.size
        val sd = math.sqrt(b.map(v => (v - m) * (v - m)).sum / (b.size - 1))
        val expected = BigDecimal((12.0 - m) / sd)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(replayed(1)._4 == expected,
          s"day-9 z must use a deduped baseline: ${replayed(1)._4} vs $expected")
        // the landed table gains day 9 and keeps day 8 single-copy
        val days2 = spark.read.parquet(path)
          .groupBy(col("day").cast("string").as("d")).count()
          .as[(String, Long)].collect().toMap
        assert(days2.keySet == (1 to 9).map(d => f"2024-01-$d%02d").toSet, days2)
        assert(days2.values.forall(_ == 1L), s"one row per (key, day): $days2")
      } finally q2.stop()
    } finally q.stop()
  }

  test("D2→C17d: streaming KN scoring appends exactly once and matches the batch kernel") {
    import graft.operators.TextAnalysis
    import graft.streaming.EventsStream.StreamDoc
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val modelPath = java.nio.file.Files.createTempDirectory("graft_kn_model").toString
    TextAnalysis.knFit(Seq((1L, "a b a b"), (2L, "b c")).toDF("doc_id", "text"))
      .write.mode("overwrite").parquet(modelPath)
    val mem = MemoryStream[StreamDoc]
    val scored = java.nio.file.Files.createTempDirectory("graft_kn_scored").toString
    val cp = java.nio.file.Files.createTempDirectory("graft_kn_cp").toString
    val q = EventsStream.knScoreStream(mem.toDF(), modelPath, scored, cp)
    def read() = spark.read.parquet(scored)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    try {
      // batch 1: an in-domain doc and junk hitting every unseen branch
      mem.addData(StreamDoc(10, "a b a b"), StreamDoc(11, "z q w"))
      q.processAllAvailable()
      val s1 = read()
      assert(s1.map(_._1) == Seq(10L, 11L), s"both docs scored: $s1")
      val batchScores = TextAnalysis.knScoreAgainstModel(
        Seq((10L, "a b a b"), (11L, "z q w")).toDF("doc_id", "text"),
        spark.read.parquet(modelPath))
        .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
      assert(s1 == batchScores, s"stream $s1 vs batch $batchScores")
      assert(s1(0)._3 < s1(1)._3, s"in-domain doc must score lower NLL: $s1")
      // batch 2: replay of doc 10 (appends nothing) + one new doc
      mem.addData(StreamDoc(10, "a b a b"), StreamDoc(12, "a b c"))
      q.processAllAvailable()
      val s2 = read()
      assert(s2.map(_._1) == Seq(10L, 11L, 12L),
        s"re-delivered doc must not duplicate: $s2")
      assert(s2.take(2) == s1, "existing scores are never rewritten")
    } finally q.stop()
  }

  test("D2→C17e: streaming KN3 scoring appends exactly once and matches the batch kernel") {
    import graft.operators.TextAnalysis
    import graft.streaming.EventsStream.StreamDoc
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val modelPath = java.nio.file.Files.createTempDirectory("graft_kn3_model").toString
    TextAnalysis.kn3Fit(Seq((1L, "a b c a b c"), (2L, "a b d")).toDF("doc_id", "text"))
      .write.mode("overwrite").parquet(modelPath)
    val mem = MemoryStream[StreamDoc]
    val scored = java.nio.file.Files.createTempDirectory("graft_kn3_scored").toString
    val cp = java.nio.file.Files.createTempDirectory("graft_kn3_cp").toString
    val q = EventsStream.kn3ScoreStream(mem.toDF(), modelPath, scored, cp)
    def read() = spark.read.parquet(scored)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    try {
      // batch 1: an in-domain doc and junk walking the backoff ladder
      mem.addData(StreamDoc(10, "a b c a b c"), StreamDoc(11, "z q w r"))
      q.processAllAvailable()
      val s1 = read()
      assert(s1.map(_._1) == Seq(10L, 11L), s"both docs scored: $s1")
      val batchScores = TextAnalysis.kn3ScoreAgainstModel(
        Seq((10L, "a b c a b c"), (11L, "z q w r")).toDF("doc_id", "text"),
        spark.read.parquet(modelPath))
        .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
      assert(s1 == batchScores, s"stream $s1 vs batch $batchScores")
      assert(s1(0)._3 < s1(1)._3, s"in-domain doc must score lower NLL: $s1")
      // batch 2: replay of doc 10 (appends nothing) + one new doc
      mem.addData(StreamDoc(10, "a b c a b c"), StreamDoc(12, "a b z"))
      q.processAllAvailable()
      val s2 = read()
      assert(s2.map(_._1) == Seq(10L, 11L, 12L),
        s"re-delivered doc must not duplicate: $s2")
      assert(s2.take(2) == s1, "existing scores are never rewritten")
    } finally q.stop()
  }

  test("D2→C31: streaming DSIR scoring appends exactly once and matches batch day-2 scores") {
    import graft.operators.Sharding
    import graft.streaming.EventsStream.StreamDoc
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // fit the model from a tiny planted target/raw split and persist it
    val fitDocs = Seq(
      (1L, "alpha bravo alpha charlie", true),
      (2L, "zulu yankee zulu xray", false),
      (3L, "zulu alpha yankee bravo", false)
    ).toDF("doc_id", "text", "is_t")
    val modelPath = java.nio.file.Files.createTempDirectory("graft_dsir_model").toString
    Sharding.dsirFit(fitDocs, "text", col("is_t"), buckets = 64)
      .write.mode("overwrite").parquet(modelPath)

    val mem = MemoryStream[StreamDoc]
    val scored = java.nio.file.Files.createTempDirectory("graft_dsir_scored").toString
    val cp = java.nio.file.Files.createTempDirectory("graft_dsir_cp").toString
    val q = EventsStream.dsirScoreStream(mem.toDF(), modelPath, scored, cp)
    def read() = spark.read.parquet(scored)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    try {
      // batch 1: two new docs score and land
      mem.addData(StreamDoc(10, "alpha bravo charlie"), StreamDoc(11, "zulu xray"))
      q.processAllAvailable()
      val s1 = read()
      assert(s1.map(_._1) == Seq(10L, 11L), s"both docs scored: $s1")
      // streamed scores == the batch day-2 kernel on the same rows
      val batchScores = Sharding.dsirScoreAgainstModel(
        Seq((10L, "alpha bravo charlie"), (11L, "zulu xray")).toDF("doc_id", "text"),
        spark.read.parquet(modelPath), "doc_id", "text")
        .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
      assert(s1 == batchScores, s"stream $s1 vs batch $batchScores")
      // target-like doc 10 outranks off-domain doc 11
      assert(s1(0)._3 > s1(1)._3, s"alpha-doc must outscore zulu-doc: $s1")

      // batch 2: re-delivers doc 10 (no-op) + one new doc
      mem.addData(StreamDoc(10, "alpha bravo charlie"), StreamDoc(12, "alpha alpha"))
      q.processAllAvailable()
      val s2 = read()
      assert(s2.map(_._1) == Seq(10L, 11L, 12L),
        s"re-delivered doc must not duplicate: $s2")
      assert(s2.take(2) == s1, "existing scores are never rewritten")
    } finally q.stop()
  }

  test("D2y master ingest stream: fates append, the day-2 state grows across batches, replays add nothing") {
    import graft.streaming.EventsStream.StreamChunk
    import graft.operators.Pipeline
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val seed = Pipeline.MasterIngestSeed // 4: src5 heldout, src0/src1 train
    def salad(tag: String, n: Int): String =
      (1 to n).map(i => s"$tag$i").mkString(" ")
    def page(host: Int, path: Long, body: String): String = {
      val payload = body + "."
      s"WARC/1.0\nWARC-Type: conversion\n" +
        s"WARC-Target-URI: https://src$host.example.com/articles/$path\n" +
        "WARC-Date: 2024-01-01T00:00:00Z\n" +
        s"Content-Length: ${payload.getBytes("UTF-8").length}\n\n$payload\n\n"
    }
    def chunk(id: Long, recs: String*): StreamChunk =
      StreamChunk(id, "warcinfo preamble\n" + recs.mkString(""))
    // day-1 corpus: four plain docs, one on the heldout host
    val day1 = Seq(chunk(0L,
      page(0, 1, salad("cat", 30)), page(1, 2, salad("dog", 30)),
      page(5, 3, salad("owl", 30)), page(6, 4, salad("fox", 30))))
      .toDF("chunk_id", "content")
    val bl = Seq.empty[String].toDF("pattern")
    val artDir = java.nio.file.Files.createTempDirectory("graft_mia").toString
    Pipeline.persistMasterArtifacts(
      Pipeline.masterArtifacts(day1, "chunk_id", "content", bl,
        splitSeed = seed), artDir)
    spark.sql("DROP TABLE IF EXISTS stream_master_fates")
    // DROP leaves the location behind when the table vanished from the
    // catalog without its dir (a prior JVM's run) — clear it or CTAS
    // refuses with LOCATION_ALREADY_EXISTS
    val wh = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir") + "/stream_master_fates")
    wh.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(wh, true)
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(
          "rec_id BIGINT, host STRING, fate STRING, dup_of BIGINT, " +
            "n_spans BIGINT, removed_chars BIGINT, n_tokens BIGINT, ids STRING"))
      .write.format("parquet").saveAsTable("stream_master_fates")
    val mem = MemoryStream[StreamChunk]
    val ckpt = java.nio.file.Files.createTempDirectory("graft_mia_ck").toString
    val q = EventsStream.masterIngestStream(mem.toDF(), artDir,
      "stream_master_fates", ckpt, Nil, splitSeed = seed)
    def fates = {
      spark.catalog.refreshTable("stream_master_fates")
      spark.table("stream_master_fates")
    }
    try {
      val tA1 = salad("kit", 32)            // train host, fresh → ships
      val tA2 = salad("emu", 32)            // heldout host → eval + grams
      val batchA = chunk(100L,
        page(0, 100, tA1), page(5, 101, tA2))
      mem.addData(batchA)
      q.processAllAvailable()
      val a = fates.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
      val a1Rec = (100L << 32) + 1; val a2Rec = (100L << 32) + 2
      assert(a == Map(a1Rec -> "shipped", a2Rec -> "eval_heldout"), s"got $a")
      // batch B probes the state batch A just grew: an exact copy of
      // A's shipped text, a recrawl of A's URL, and a train doc
      // carrying A's EVAL doc's leading 13-gram (cumulative firewall)
      val leak = tA2.split(" ").take(14).mkString(" ") + ".\n" + salad("yak", 24)
      mem.addData(chunk(101L,
        page(1, 200, tA1),          // same clean text as a1
        page(0, 100, salad("ant", 32)), // same canonical resource as a1
        page(1, 201, leak),         // train host + A's eval gram
        page(6, 202, salad("gnu", 32)))) // fresh → ships
      q.processAllAvailable()
      val b = fates.collect().map(r => r.getLong(0) -> (r.getString(2), r.getLong(3))).toMap
      assert(b((101L << 32) + 1) == ("exact_dup_corpus", a1Rec),
        s"grown exact index must catch A's text: ${b((101L << 32) + 1)}")
      assert(b((101L << 32) + 2) == ("url_dup_corpus", a1Rec),
        s"grown url index must catch A's resource: ${b((101L << 32) + 2)}")
      assert(b((101L << 32) + 3)._1 == "contaminated",
        s"grown eval grams must firewall the leak: ${b((101L << 32) + 3)}")
      assert(b((101L << 32) + 4)._1 == "shipped")
      // replay: the whole of batch A again — nothing lands anywhere
      val nFates = fates.count()
      val nGrams = spark.read.parquet(s"$artDir/eval_grams").count()
      val nExact = spark.read.parquet(s"$artDir/exact_index").count()
      mem.addData(batchA)
      q.processAllAvailable()
      assert(fates.count() == nFates, "replayed chunk appended fates")
      assert(spark.read.parquet(s"$artDir/eval_grams").count() == nGrams,
        "replayed chunk grew the eval grams")
      assert(spark.read.parquet(s"$artDir/exact_index").count() == nExact,
        "replayed chunk grew the exact index")
    } finally q.stop()
  }
}

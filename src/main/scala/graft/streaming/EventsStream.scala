package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** D-block Structured Streaming: windowed aggregation with watermark (D1)
  * and stateful streaming dedup (D2).
  *
  * Both operators take unbounded DataFrames/Datasets (`readStream`
  * sources in production; MemoryStream in specs) and are the streaming
  * twins of the batch operators: D1 ≙ q10_hourly_rollup, D2 ≙
  * q08_dedup_latest/q20_dedup_exact. State is bounded: the watermark
  * expires window state, and the dedup state uses a processing-time
  * timeout so seen-key state ages out instead of growing forever — the
  * properties that keep a 1000-executor streaming job stable.
  */
object EventsStream {

  /** D1 — tumbling-window rollup with watermark: per (1-hour window,
    * event_type) counts and value sums. Late events beyond `watermark`
    * are dropped and their window state is reclaimed. */
  def hourlyRollup(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("w.start").as("hour_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** D1 variant — sliding-window rollup (overlapping windows: each event
    * contributes to windowLen/slide windows), the shape of a moving
    * "last hour every 15 min" realtime metric. Same watermark-bounded
    * state story as the tumbling version. */
  def slidingRollup(events: DataFrame, windowLen: String = "1 hour",
                    slide: String = "15 minutes",
                    watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("event_type"), col("n_events"), col("total_value"))

  /** D1 variant — streaming sessionization via the native
    * `session_window` bucketizer: per-user sessions close after
    * `gapMinutes` of inactivity, the streaming twin of the batch
    * lag+cumsum sessionizer (q09_sessionize / Sessionize.scala). Spark
    * merges overlapping session windows in state; the watermark bounds
    * how long an open session can wait for late events before the
    * window is finalized and its state reclaimed — the same
    * bounded-state story as the windowed rollups, with no custom
    * flatMapGroupsWithState needed. */
  def sessionizeStream(events: DataFrame, gapMinutes: Int = 30,
                       watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), s"$gapMinutes minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("session_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("session_value"))

  /** D1→E bridge — stream INTO the day-partitioned lake with the
    * E-block write disposition: each micro-batch lands via
    * [[graft.sources.Sinks.writeDayPartitioned]] under dynamic
    * partition overwrite, so replays of a micro-batch rewrite the same
    * partitions instead of duplicating rows (`foreachBatch` +
    * overwrite-by-partition — the idempotent recipe for file sinks
    * that need in-place updates).
    *
    * Output-mode correctness: partition overwrite replaces WHOLE date
    * partitions, so the batch handed to `foreachBatch` must contain
    * every row of every date it touches.
    *  - `complete` (default): the full aggregate snapshot each trigger
    *    — always correct, right shape for bounded-cardinality report
    *    tables (the reference's day-partitioned uploads);
    *  - `update`: only updated rows — incremental and cheap, but ONLY
    *    sound when the aggregation key is exactly the date column (one
    *    row per partition); with finer grouping an update batch would
    *    silently drop the date's unchanged sibling rows, so callers
    *    must opt in deliberately.
    *
    * Returns the started query; callers own its lifecycle. */
  def writeDayPartitionedStream(df: DataFrame, path: String, dateCol: String,
                                checkpointDir: String,
                                mode: String = "complete"):
      org.apache.spark.sql.streaming.StreamingQuery = {
    require(Set("complete", "update").contains(mode),
      s"mode must be complete or update, got $mode")
    df.writeStream
      .outputMode(if (mode == "complete") OutputMode.Complete() else OutputMode.Update())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.sources.Sinks.writeDayPartitioned(
          batch, path, dateCol, ifExists = "replace", clean = false)
      }
      .start()
  }

  /** Event record for the stateful dedup stream. */
  case class StreamEvent(event_id: Long, ts: Timestamp, user_id: Long,
                         event_type: String, value: Double)

  /** Document record for the streaming content dedup. */
  case class StreamDoc(doc_id: Long, text: String)

  /** Timestamped document record for the streaming census maintenance. */
  case class StreamDocTs(doc_id: Long, ts: Timestamp, text: String)

  /** 2-D point record for the streaming z-order layout ingest. */
  case class StreamPoint(doc_id: Long, x: Long, y: Long)

  case class StreamChunk(chunk_id: Long, content: String)

  /** Shared first-occurrence state machine for the dedup streams: the
    * first element per key passes, repeats drop. GroupState's timeout
    * contract CLEARS any pending timeout on every invocation of the
    * function, so the TTL must be re-armed on EVERY branch that keeps
    * the state — including the duplicate-drop branch (duplicates are
    * the common case for a dedup stream; skipping the re-arm there
    * would cancel the TTL of exactly the hot keys and grow state
    * unboundedly). */
  private def firstPerKey[T, K](ds: Dataset[T], key: T => K,
                                stateTtl: Option[String])(
      implicit kEnc: org.apache.spark.sql.Encoder[K],
      tEnc: org.apache.spark.sql.Encoder[T]): Dataset[T] = {
    implicit val boolEnc: org.apache.spark.sql.Encoder[Boolean] = Encoders.scalaBoolean
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    ds.groupByKey(key)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf) {
        (_: K, batch: Iterator[T], state: GroupState[Boolean]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else if (state.exists) {
            stateTtl.foreach(state.setTimeoutDuration)   // re-arm: see above
            Iterator.empty
          } else {
            state.update(true)
            stateTtl.foreach(state.setTimeoutDuration)
            batch.take(1)
          }
      }
  }

  /** D2 variant — streaming EXACT dedup by content fingerprint: the
    * ingest-time twin of batch C1 (`Dedup.dedupExact`). Documents hash
    * to md5(text) BEFORE the stateful stage, the stream repartitions on
    * the fingerprint (uniform under content skew — the same shuffle-key
    * argument as the batch pass), and only the first document per
    * fingerprint survives. `stateTtl` bounds the seen-fingerprint state
    * like [[dedupStream]]; a production corpus loader would seed the
    * state from the batch fingerprint table and let TTL age out cold
    * hashes. */
  def dedupDocsStream(docs: Dataset[StreamDoc],
                      stateTtl: Option[String] = None): Dataset[StreamDoc] = {
    import docs.sparkSession.implicits._
    firstPerKey[StreamDoc, String](docs, d => {
      val md = java.security.MessageDigest.getInstance("MD5")
      java.util.HexFormat.of().formatHex(md.digest(d.text.getBytes("UTF-8")))
    }, stateTtl)
  }

  /** D2→C2b bridge — streaming INGEST dedup against the persisted
    * MinHash signature index: how a 100 TB corpus actually admits new
    * documents. Each micro-batch is (1) deduped against ITSELF with the
    * one-shot LSH pass (one representative per intra-batch cluster),
    * (2) verdicted against the bucketed index table with
    * [[graft.operators.Dedup.dedupAgainstIndex]] (zero corpus-side
    * exchanges), then (3) accepted documents flow to `accept` AND their
    * signatures APPEND to the index — so later batches (and the batch
    * pipeline, which shares the table) dedup against them too.
    *
    * The index table is the stream's state, but durable and queryable:
    * unlike GroupState, a restart resumes from the table with nothing
    * to rebuild, and its size is the corpus — not a function of stream
    * uptime. The accepted frame is localCheckpoint'd so the verdict
    * pipeline runs ONCE and the index append cannot observe the table
    * it is writing.
    *
    * Replay semantics (foreachBatch can re-run a micro-batch after a
    * crash): the index stays EXACTLY-ONCE — self-id matches don't
    * count as duplicates (dedupAgainstIndex excludes new_id ==
    * corpus_id pairs) and already-indexed ids are anti-joined away
    * before the append, so a replayed batch re-verdicts identically
    * and appends nothing twice. `accept` is AT-LEAST-ONCE, like every
    * external foreachBatch sink — make it idempotent (write to a
    * keyed/partition-overwrite target, not a blind append).
    *
    * `numBuckets` must match the existing index table's bucket spec
    * (Spark validates and fails loudly on mismatch).
    *
    * Returns the started query; callers own its lifecycle. */
  def dedupAgainstIndexStream(docs: DataFrame, indexTable: String,
                              checkpointDir: String,
                              accept: DataFrame => Unit,
                              numHashes: Int = 16, bands: Int = 4,
                              simThreshold: Double = 0.5,
                              numBuckets: Int = 8):
      org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch0: DataFrame, _: Long) =>
        import graft.operators.Dedup
        // materialize the micro-batch once: the self-dedup pass, the
        // reps join, and the index probe all fork from it, and a
        // file/Kafka-backed batch would otherwise re-read the source
        // per branch. (The signature kernel still runs in both the
        // self pass and the index probe — reusing the banded frame
        // across the two operators would couple their internals for a
        // per-doc cost of one fused hash pass; micro-batches are small,
        // so the materialized-input trade wins.)
        val batch = batch0.localCheckpoint()
        val spark = batch.sparkSession
        val self = Dedup.minhashLshDocs(batch, numHashes, bands, simThreshold)
        val reps = batch.join(self.filter(!col("is_dup")).select("doc_id"), Seq("doc_id"))
        val verdicts = Dedup.dedupAgainstIndex(reps, spark.table(indexTable),
          numHashes, bands, simThreshold)
        val accepted = reps
          .join(verdicts.filter(!col("is_dup")).select("doc_id"), Seq("doc_id"))
          .localCheckpoint()
        accept(accepted)
        // replay-idempotent append: ids already in the index (this very
        // batch, replayed after a crash between append and checkpoint
        // commit) are excluded, so the index holds each doc exactly once
        Dedup.minhashIndexDocs(accepted, numHashes, bands)
          .join(spark.table(indexTable).select(col("doc_id")).distinct(),
            Seq("doc_id"), "left_anti")
          .write.mode(org.apache.spark.sql.SaveMode.Append)
          .format("parquet")
          .bucketBy(numBuckets, "band", "bh")
          .sortBy("band", "bh")
          .saveAsTable(indexTable)
      }
      .start()

  /** D1→C23 bridge — streaming maintenance of the mergeable HLL
    * sketch table: each micro-batch's per-(key, day) user sketches
    * MERGE into the persisted day-partitioned table, so
    * [[graft.operators.Sketches.distinctOverRange]] answers
    * "distinct users over any date range" from a table that is always
    * current — no raw-event re-scan, ever.
    *
    * Replay semantics: HLL insertion is IDEMPOTENT PER VALUE (a
    * register can only move up to the same level once), so re-merging
    * a replayed micro-batch's sketch is a no-op and the ESTIMATES are
    * exactly-once without any dedup state — which is why this table
    * carries only sketches, not exact event counts (a count column
    * would double on replay; the batch pipeline owns exact counts).
    *
    * Per micro-batch cost: one groupBy of the batch, a merge join
    * against ONLY the touched day partitions, and a dynamic partition
    * overwrite of those days. The merged frame materializes before the
    * write because it reads the same path it overwrites.
    *
    * Returns the started query; callers own its lifecycle. */
  def sketchIngestStream(events: DataFrame, sketchPath: String,
                         checkpointDir: String,
                         keyCol: String = "event_type", tsCol: String = "ts",
                         idCol: String = "user_id"):
      org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val daily = batch
          .groupBy(col(keyCol), col(tsCol).cast("date").as("day"))
          .agg(hll_sketch_agg(col(idCol)).as("user_sketch"))
        // first-run-only benign catch (the advice-r9 rule, same hazard
        // as the census guard): a swallowed read failure here would
        // REPLACE day partitions with batch-only sketches
        val diskOpt = readTableIfExists(spark, sketchPath)
        val merged = diskOpt match {
          case Some(existing) =>
            existing.join(broadcast(daily.select(col("day")).distinct()), Seq("day"))
              .unionByName(daily)
              .groupBy(col(keyCol), col("day"))
              .agg(hll_union_agg(col("user_sketch")).as("user_sketch"))
          case None => daily // first batch: nothing to merge yet
        }
        graft.sources.Sinks.writeDayPartitioned(
          merged.localCheckpoint(), sketchPath, "day",
          ifExists = "replace", clean = false)
      }
      .start()

  /** D1→C28 bridge — streaming maintenance of the mergeable KMV
    * sketch table: each micro-batch's per-(key, day) k-minimum-values
    * sketches MERGE into the persisted day-partitioned table, so
    * [[graft.operators.Sketches.kmvMerge]] +
    * [[graft.operators.Sketches.kmvOverlap]] answer overlap questions
    * over any range from a table that is always current.
    *
    * Replay semantics: the [[sketchIngestStream]] argument verbatim —
    * KMV insertion is IDEMPOTENT PER VALUE (the buffer is a SET of the
    * k smallest hashes; re-inserting a seen value cannot change it),
    * so re-merging a replayed micro-batch is a no-op and the sketches
    * are exactly-once without dedup state or day-completeness
    * machinery.
    *
    * Per micro-batch cost: one aggregate of the batch (bounded
    * buffers, map-side partials), a merge against ONLY the touched day
    * partitions, and a dynamic partition overwrite of those days.
    *
    * Returns the started query; callers own its lifecycle. */
  def kmvIngestStream(events: DataFrame, sketchPath: String,
                      checkpointDir: String,
                      keyCol: String = "event_type", tsCol: String = "ts",
                      idCol: String = "user_id", k: Int = 256):
      org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val daily = graft.operators.Sketches.kmvSketches(
          batch.withColumn("day", col(tsCol).cast("date")),
          Seq(keyCol, "day"), col(idCol), k)
        // first-run-only benign catch (the advice-r9 rule): a missing
        // or still-empty table means nothing to merge; any other read
        // failure must fail the query — merging against a silently
        // dropped disk state would REPLACE day partitions with
        // batch-only sketches
        val diskOpt = readTableIfExists(spark, sketchPath)
        val merged = diskOpt match {
          case Some(existing) =>
            graft.operators.Sketches.kmvMerge(
              existing.join(broadcast(daily.select(col("day")).distinct()), Seq("day"))
                .unionByName(daily),
              Seq(keyCol, "day"), k)
          case None => daily // first batch: nothing to merge yet
        }
        graft.sources.Sinks.writeDayPartitioned(
          merged.localCheckpoint(), sketchPath, "day",
          ifExists = "replace", clean = false)
      }
      .start()

  /** D1→C25 bridge — streaming maintenance of the Count-Min
    * heavy-hitter artifacts: each FINALIZED ingest day lands its
    * (day, row, bucket, cnt) counter grid and its exact top-N
    * candidate list as day partitions, so
    * [[graft.operators.Sketches.heavyHittersOverRange]] answers range
    * top-k from tables that are always current — no raw-log re-scan,
    * ever.
    *
    * Replay semantics: counter ADDS are not value-idempotent (the
    * census argument, not the HLL/KMV one), so exactly-once comes from
    * DAY COMPLETENESS — the streamed aggregate keys on (day window,
    * item) under the watermark, a day's counts emit only when the
    * watermark finalizes the whole day, and the shared split-day guard
    * fails loudly if a day would land in halves. Both artifacts are
    * then pure functions of the finalized counts, computed by the SAME
    * kernels as the batch builders
    * ([[graft.operators.Sketches.cmsCountersFromCounts]] /
    * `topCandidatesFromCounts`) — range-merge correctness requires the
    * two paths to bucket, sum and rank identically, forever.
    *
    * State cost: one in-flight row per (day, distinct item) until the
    * day finalizes — the pre-fan-out grain, so the ×depth bucket
    * explosion happens only on finalized counts.
    *
    * Returns the started query; callers own its lifecycle. */
  def cmsIngestStream(events: DataFrame, cmsPath: String,
                      candidatesPath: String, checkpointDir: String,
                      itemCol: String = "user_id", tsCol: String = "ts",
                      topN: Int = 64, watermark: String = "1 day"):
      org.apache.spark.sql.streaming.StreamingQuery = {
    require(topN > 0, s"topN must be positive, got $topN")
    val perDay = events.withWatermark(tsCol, watermark)
      .select(col(tsCol), col(itemCol).cast("string").as("item"))
      .groupBy(window(col(tsCol), "1 day"), col("item"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").cast("date").as("day"), col("item"), col("cnt"))
    perDay.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch0: DataFrame, _: Long) =>
        // checkpointed once: counters, candidates and both guards all
        // fork the finalized counts
        val counts = batch0.localCheckpoint()
        val counters = graft.operators.Sketches
          .cmsCountersFromCounts(counts,
            depth = graft.operators.Sketches.CmsDepth,
            width = graft.operators.Sketches.CmsWidth)
          .localCheckpoint()
        val cands = graft.operators.Sketches
          .topCandidatesFromCounts(counts, topN)
          .localCheckpoint()
        assertNoSplitDay(counters, cmsPath, Seq("row", "bucket", "cnt"),
          opName = "cmsIngestStream(counters)")
        assertNoSplitDay(cands, candidatesPath, Seq("item", "cnt"),
          opName = "cmsIngestStream(candidates)")
        graft.sources.Sinks.writeDayPartitioned(
          counters, cmsPath, "day", ifExists = "replace", clean = false)
        graft.sources.Sinks.writeDayPartitioned(
          cands, candidatesPath, "day", ifExists = "replace", clean = false)
      }
      .start()
  }

  /** D1→C24 bridge — streaming maintenance of the daily KLL
    * quantile-sketch table: each FINALIZED ingest day lands its
    * per-key (n_values, value_sketch) row as a day partition, so
    * [[graft.operators.Sketches.quantilesOverRange]] answers any-range
    * p50/p95/p99 from tables that are always current — the last
    * sketch-family twin (HLL D1c, KMV D1e, CMS D1f already stream).
    *
    * Replay semantics: KLL inserts are NOT value-idempotent (the
    * CMS/census argument, not the HLL register one), so exactly-once
    * comes from DAY COMPLETENESS — the streamed aggregate keys on
    * (day window, key, value) under the watermark, a day's per-value
    * counts emit only when the watermark finalizes the whole day, and
    * the sketch is then a pure function of the finalized counts,
    * built by the SAME kernel as the batch path
    * ([[graft.operators.Sketches.quantileSketchesFromCounts]]).
    *
    * The split-day guard compares the deterministic (key, n_values)
    * day signature, NOT sketch bytes: compacted KLL bytes are
    * legitimately run-varying (randomized compaction choices), so a
    * benign replay may rewrite a day with an EQUIVALENT sketch — but
    * a half day can never replay the full day's value count, which is
    * what the guard must catch.
    *
    * State cost: one in-flight row per (day, key, distinct value)
    * until the day finalizes — the census bound, the price of feeding
    * the exact multiset through the exact batch kernel AND of
    * day-complete finalized answers. For high-cardinality continuous
    * values that is O(a day's rows); at that scale use
    * [[kllPartialIngestStream]] — the sketch-bounded form (zero
    * streaming state, per-batch partial sketches,
    * batch-id-idempotent overwrite) whose trade is always-current
    * answers over possibly-partial days.
    *
    * Returns the started query; callers own its lifecycle. */
  def kllIngestStream(events: DataFrame, sketchPath: String,
                      checkpointDir: String,
                      keyCol: String = "event_type", tsCol: String = "ts",
                      valueCol: String = "value", k: Int = 200,
                      watermark: String = "1 day"):
      org.apache.spark.sql.streaming.StreamingQuery = {
    val perDay = events.withWatermark(tsCol, watermark)
      .select(col(tsCol), col(keyCol),
        col(valueCol).cast("double").as("value"))
      .groupBy(window(col(tsCol), "1 day"), col(keyCol), col("value"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").cast("date").as("day"), col(keyCol),
        col("value"), col("cnt"))
    perDay.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch0: DataFrame, _: Long) =>
        // checkpointed once: the guard and the overwrite both consume
        // the finalized sketches
        val sketches = graft.operators.Sketches
          .quantileSketchesFromCounts(batch0, keyCol, k)
          .localCheckpoint()
        assertNoSplitDay(sketches, sketchPath, Seq(keyCol, "n_values"),
          opName = "kllIngestStream")
        graft.sources.Sinks.writeDayPartitioned(
          sketches, sketchPath, "day", ifExists = "replace", clean = false)
      }
      .start()
  }

  /** The SKETCH-BOUNDED form of [[kllIngestStream]] (round 14): each
    * micro-batch writes per-(day, key) PARTIAL KLL sketches under its
    * own `batch_id` partition, and readers merge partials to daily
    * sketches on demand ([[graft.operators.Sketches.mergeKllPartials]]
    * — KLL merge is associative, so partials-then-days is the same
    * sketch, same rank guarantees, as sketching each day whole).
    *
    * Why it exists: [[kllIngestStream]] holds one in-flight row per
    * (day, key, DISTINCT VALUE) until the watermark closes the day —
    * exact-multiset state, O(a day's distinct values), which defeats
    * the point of a sketch at 100 TB/day of high-cardinality doubles.
    * This form keeps ZERO streaming state (no watermark aggregate at
    * all — the spec asserts `stateOperators` is empty): the per-batch
    * aggregate is plain batch work inside `foreachBatch`, and the
    * in-flight footprint is one sketch per (day, key) PER BATCH,
    * bounded by keys · sketch size. The trades, stated honestly:
    * answers include PARTIAL days (always-current, where the
    * day-complete form answers only finalized days — pick per
    * consumer), and the artifact grows one row per (batch, day, key)
    * until compacted (re-write merged days on a maintenance cadence;
    * day partitions close naturally once their events age out of
    * arrival).
    *
    * Exactly-once: per-batch DYNAMIC PARTITION OVERWRITE keyed on
    * `batch_id`. A crash-replay under the SAME checkpoint re-delivers
    * the identical batch (the offset WAL pins batch boundaries) and
    * rewrites only its own partition — equivalent sketches, identical
    * counts, no duplication; value idempotency is never needed. A
    * FRESH checkpoint re-ingest into the same path is a different
    * operation: batch boundaries may differ, so start it on an empty
    * `partialsPath` (the [[kllIngestStream]] fresh-replay tolerance
    * comes from day-keyed overwrites, which this form gives up in
    * exchange for bounded state).
    *
    * Returns the started query; callers own its lifecycle. */
  def kllPartialIngestStream(events: DataFrame, partialsPath: String,
                             checkpointDir: String,
                             keyCol: String = "event_type", tsCol: String = "ts",
                             valueCol: String = "value", k: Int = 200):
      org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeKllPartialBatch(batch, batchId, partialsPath, keyCol, tsCol,
          valueCol, k)
      }
      .start()

  /** One micro-batch of [[kllPartialIngestStream]] — factored out so
    * the spec can replay a batch id directly (the WAL-replay
    * simulation: same id + same rows must overwrite, not append). */
  private[graft] def writeKllPartialBatch(batch: DataFrame, batchId: Long,
                                          partialsPath: String, keyCol: String,
                                          tsCol: String, valueCol: String,
                                          k: Int): Unit =
    batch
      .select(col(tsCol).cast("date").as("day"), col(keyCol),
        col(valueCol).cast("double").as("value"))
      .groupBy(col("day"), col(keyCol))
      .agg(count(lit(1)).as("n_values"),
        call_function("graft_kll_agg", col("value"), lit(k)).as("value_sketch"))
      .withColumn("batch_id", lit(batchId))
      .write
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(partialsPath)

  /** D1→C2d bridge — streaming maintenance of the PARAGRAPH CENSUS
    * (the day-2 boilerplate table): each finalized ingest day's
    * (para_hash, n_docs) delta lands as a day partition, so
    * [[graft.operators.Dedup.dropRepeatedParagraphsAgainstCensus]]
    * probes a census that is always current — no corpus re-scan, ever.
    * [[graft.operators.Dedup.loadParagraphCensus]] rolls the day
    * partitions up to the probe's (para_hash, n_docs) shape.
    *
    * Replay semantics: counts are NOT value-idempotent (unlike the HLL
    * twin's registers), so exactly-once comes from DAY COMPLETENESS
    * instead — the streamed aggregate keys on (day window, doc,
    * para_hash) under the watermark, so a day's rows emit only when
    * the watermark finalizes the whole day, the foreachBatch sees
    * complete days, and the dynamic partition overwrite rewrites a
    * replayed day with identical content.
    *
    * State cost: one in-flight row per (doc, distinct paragraph) until
    * the day finalizes — bounded by a day's exploded batch, the price
    * of exact counts (the HLL twin's sketches are cheaper but
    * approximate and non-decrementable).
    *
    * Returns the started query; callers own its lifecycle. */
  def censusIngestStream(docs: DataFrame, censusPath: String,
                         checkpointDir: String,
                         idCol: String = "doc_id", textCol: String = "text",
                         tsCol: String = "ts", sep: String = "\n",
                         watermark: String = "1 day"):
      org.apache.spark.sql.streaming.StreamingQuery = {
    // the shared Dedup projection — NOT an inline re-implementation:
    // probe correctness requires the maintained census and the batch
    // paths to split/blank-filter/hash identically, forever
    val perDocDay = graft.operators.Dedup
      .explodeParagraphs(docs.withWatermark(tsCol, watermark),
        idCol, textCol, sep, extraCols = Seq(tsCol))
      .select(col(tsCol), col(idCol), col("para_hash"))
      .groupBy(window(col(tsCol), "1 day"), col(idCol), col("para_hash"))
      .agg(count(lit(1)).as("_n"))
      .select(col("window.start").cast("date").as("day"), col(idCol), col("para_hash"))
    perDocDay.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch0: DataFrame, _: Long) =>
        val meta = new org.apache.spark.sql.types.MetadataBuilder()
          .putString("graft.paracensus.sep", sep).build()
        writeCensusDayDelta(batch0, censusPath, idCol, Seq("para_hash"), meta,
          metaCol = "para_hash", opName = "censusIngestStream")
      }
      .start()
  }

  /** D1→C40 bridge — streaming maintenance of the per-domain LINE
    * CENSUS (the boilerplate-strip artifact): each finalized ingest
    * day's (domain, line, n_docs) delta lands as a day partition, so
    * [[graft.operators.TextClean.stripAgainstCensus]] probes a census
    * that is always current ([[graft.operators.TextClean.loadLineCensus]]
    * rolls the partitions up — day deltas over disjoint doc sets are
    * exactly the [[graft.operators.TextClean.mergeLineCensus]] sum).
    *
    * Same exactly-once mechanism as the paragraph/span twins: counts
    * are not value-idempotent, so correctness comes from DAY
    * COMPLETENESS — the aggregate keys on (day window, doc, domain,
    * line) under the watermark, days emit whole, and a replayed day
    * rewrites identical content (the shared split-day guard fails
    * loudly otherwise). Tokenization parity with the batch builder
    * (same split, same blank-line exemption) is structural: both sides
    * call the same split/trim projection.
    *
    * Returns the started query; callers own its lifecycle. */
  def lineCensusIngestStream(pages: DataFrame, censusPath: String,
                             checkpointDir: String,
                             idCol: String = "doc_id", domainCol: String = "domain",
                             textCol: String = "text", tsCol: String = "ts",
                             sep: String = "\n", watermark: String = "1 day"):
      org.apache.spark.sql.streaming.StreamingQuery = {
    val perDocDay = pages.withWatermark(tsCol, watermark)
      .select(col(tsCol), col(idCol), col(domainCol).as("domain"),
        explode(split(col(textCol), java.util.regex.Pattern.quote(sep))).as("line"))
      .filter(trim(col("line")) =!= "")
      .groupBy(window(col(tsCol), "1 day"), col(idCol), col("domain"), col("line"))
      .agg(count(lit(1)).as("_n"))
      .select(col("window.start").cast("date").as("day"), col(idCol),
        col("domain"), col("line"))
    perDocDay.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch0: DataFrame, _: Long) =>
        val meta = new org.apache.spark.sql.types.MetadataBuilder()
          .putString("graft.linecensus.sep", sep).build()
        writeCensusDayDelta(batch0, censusPath, idCol, Seq("domain", "line"), meta,
          metaCol = "line", opName = "lineCensusIngestStream")
      }
      .start()
  }

  /** D1→C2e bridge — streaming maintenance of the SPAN CENSUS
    * (ExactSubstr's day-2 table), [[censusIngestStream]] at window
    * grain: each finalized ingest day's (whash, n_docs) delta lands as
    * a day partition, so
    * [[graft.operators.Dedup.dropRepeatedSpansAgainstCensus]] probes a
    * census that is always current — no corpus re-hash, ever.
    * [[graft.operators.Dedup.loadSpanCensus]] rolls the day partitions
    * up to the probe's (whash, n_docs) shape, (k, sep) metadata intact
    * so mismatched probes still fail loudly.
    *
    * Same exactly-once mechanism as the paragraph twin: counts are not
    * value-idempotent, so correctness comes from DAY COMPLETENESS —
    * the aggregate keys on (day window, doc, whash) under the
    * watermark, days emit whole, and a replayed day's partition
    * overwrite rewrites identical content (the shared split-day guard
    * fails loudly otherwise).
    *
    * State cost: one in-flight row per (doc, distinct window) until
    * the day finalizes — the window grain is ~tokens-per-doc rows
    * where the paragraph twin held ~paragraphs-per-doc, the price of
    * span-exact day-2 probes.
    *
    * Returns the started query; callers own its lifecycle. */
  def spanCensusIngestStream(docs: DataFrame, censusPath: String,
                             checkpointDir: String,
                             idCol: String = "doc_id", textCol: String = "text",
                             tsCol: String = "ts", k: Int = 6, sep: String = " ",
                             watermark: String = "1 day"):
      org.apache.spark.sql.streaming.StreamingQuery = {
    require(k >= 2, s"k must be >= 2 (a 1-token span is a stopword filter), got $k")
    // the shared Dedup projection — NOT an inline re-implementation:
    // probe correctness requires the maintained census and the batch
    // paths to tokenize and window-hash identically, forever
    val perDocDay = graft.operators.Dedup
      .explodeSpanWindows(docs.withWatermark(tsCol, watermark),
        idCol, textCol, k, sep, extraCols = Seq(tsCol))
      .select(col(tsCol), col(idCol), col("whash"))
      .groupBy(window(col(tsCol), "1 day"), col(idCol), col("whash"))
      .agg(count(lit(1)).as("_n"))
      .select(col("window.start").cast("date").as("day"), col(idCol), col("whash"))
    perDocDay.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch0: DataFrame, _: Long) =>
        val meta = new org.apache.spark.sql.types.MetadataBuilder()
          .putLong("graft.spancensus.k", k.toLong)
          .putString("graft.spancensus.sep", sep).build()
        writeCensusDayDelta(batch0, censusPath, idCol, Seq("whash"), meta,
          metaCol = "whash", opName = "spanCensusIngestStream")
      }
      .start()
  }

  /** Shared foreachBatch body of the census ingest twins: roll the
    * batch's (day, id, hash) rows to (day, hash, n_docs), guard
    * against split days, land each day as a partition overwrite.
    *
    * GUARD (advice r8): the replace-mode overwrite is correct only if
    * a finalized day's rows evict in ONE micro-batch — current
    * watermark eviction gives that, but if a day ever emitted across
    * two batches the second replace would silently drop the first
    * batch's rows. A day already on disk must therefore be an exact
    * replay (identical rows — idempotent rewrite, pass) or this batch
    * is half of a split day: fail the query loudly instead of losing
    * census rows. Cost: one partition-pruned read of just this batch's
    * days. */
  private def writeCensusDayDelta(batch0: DataFrame, censusPath: String,
                                  idCol: String, keyCols: Seq[String],
                                  meta: org.apache.spark.sql.types.Metadata,
                                  metaCol: String, opName: String): Unit = {
    // checkpointed once: the split-day guard and the partition
    // overwrite both consume the delta
    val delta = batch0
      .groupBy((col("day") +: keyCols.map(col)): _*)
      .agg(countDistinct(col(idCol)).as("n_docs"))
      .select((col("day") +: keyCols.map(k =>
        if (k == metaCol) col(k).as(k, meta) else col(k))) :+ col("n_docs"): _*)
      .localCheckpoint()
    assertNoSplitDay(delta, censusPath, keyCols :+ "n_docs", opName)
    graft.sources.Sinks.writeDayPartitioned(
      delta, censusPath, "day", ifExists = "replace", clean = false)
  }

  /** Split-day guard shared by every finalized-day streaming sink
    * whose values are NOT replay-idempotent (census counts, CMS
    * counters): a day already on disk must be an exact replay
    * (identical rows — idempotent rewrite, pass) or this batch is half
    * of a split day and the replace-mode overwrite would silently drop
    * the earlier half. Cost: one partition-pruned read of just this
    * batch's days.
    *
    * ONLY the first-run no-table-yet cases are benign: a missing path,
    * or an existing-but-empty directory (no files → Spark cannot infer
    * a schema). Corruption, permission and transient FS failures must
    * PROPAGATE and fail the query — swallowing every Throwable (the
    * old Try(...).toOption) silently disabled the guard (advice r9). */
  private def assertNoSplitDay(delta: DataFrame, path: String,
                               valueCols: Seq[String], opName: String): Unit = {
    val spark0 = delta.sparkSession
    val days = delta.select(col("day")).distinct().collect().map(_.getDate(0))
    val diskOpt = readTableIfExists(spark0, path)
    diskOpt.foreach { disk =>
      val cols = col("day") +: valueCols.map(col)
      val existing = disk
        .filter(col("day").isin(days.map(d => lit(d)): _*))
        .select(cols: _*)
        .localCheckpoint()
      val exDays = existing.select(col("day")).distinct().collect().map(_.getDate(0))
      if (exDays.nonEmpty) {
        val replayed = delta
          .select(cols: _*)
          .filter(col("day").isin(exDays.map(d => lit(d)): _*))
        val differs = replayed.exceptAll(existing)
          .unionAll(existing.exceptAll(replayed)).limit(1).count() > 0
        if (differs) throw new IllegalStateException(
          s"$opName: day(s) ${exDays.mkString(", ")} already persisted with " +
            "DIFFERENT content — this batch is half of a split day, and replacing the " +
            "partition would silently drop the earlier half's rows. Repair the " +
            "day partition (or widen the watermark so days finalize whole) and restart.")
      }
    }
  }

  /** E→A24 bridge — the GATED day-partitioned lake sink: each
    * micro-batch is validated against `rules`
    * ([[graft.operators.Validation.checkRules]] — one conditional
    * aggregate, one pass) BEFORE its dynamic partition overwrite. A
    * batch that fails any rule is diverted WHOLE to the quarantine
    * path (append, keyed by batch id) and the lake keeps its last good
    * partitions — the point of validating at the sink: a bad extract
    * must never replace a good partition.
    *
    * Whole-batch diversion, not row filtering, is deliberate: partition
    * overwrite replaces complete dates, so shipping only a batch's
    * clean rows would silently drop its dirty ones from the replaced
    * partition. Fix upstream, replay the batch. Use
    * [[graft.operators.Validation.flagViolations]] + a filter BEFORE
    * the sink when row-level routing is the intended policy.
    *
    * Same output-mode contract as [[writeDayPartitionedStream]]
    * (complete snapshots by default).
    *
    * Quarantine-path schema note: the append sink gained the per-row
    * `violations` column mid-life, so a long-lived quarantine path can
    * hold both old rows (without it) and new rows (with it). Plain
    * `spark.read.parquet` picks ONE footer's schema and can silently
    * drop the column — read the path through [[readQuarantine]], which
    * merges schemas and backfills the pre-transition rows.
    *
    * Returns the started query; callers own its lifecycle. */
  def gatedDayPartitionedStream(df: DataFrame, path: String, quarantinePath: String,
                                dateCol: String, checkpointDir: String,
                                rules: Seq[(String, org.apache.spark.sql.Column)],
                                maxViolationPct: Double = 0.0,
                                mode: String = "complete"):
      org.apache.spark.sql.streaming.StreamingQuery = {
    require(Set("complete", "update").contains(mode),
      s"mode must be complete or update, got $mode")
    df.writeStream
      .outputMode(if (mode == "complete") OutputMode.Complete() else OutputMode.Update())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch0: DataFrame, batchId: Long) =>
        // the verdict aggregate and the write both consume the batch
        val batch = batch0.localCheckpoint()
        val failed = graft.operators.Validation
          .checkRules(batch, rules, maxViolationPct)
          .filter(!col("passed"))
          .select(col("rule")).collect().map(_.getString(0)) // |rules| rows max
        if (failed.isEmpty)
          graft.sources.Sinks.writeDayPartitioned(
            batch, path, dateCol, ifExists = "replace", clean = false)
        else
          // per-row triage rides along (round-11 advice): `violations`
          // names the rules EACH row fails (empty for clean rows swept
          // up by the whole-batch policy), so an operator can inspect a
          // poisoned batch without re-running the rules; `_failed_rules`
          // stays the batch-level verdict that caused the diversion
          graft.operators.Validation.flagViolations(batch, rules)
            .withColumn("_quarantine_batch", lit(batchId))
            .withColumn("_failed_rules", lit(failed))
            .write.mode(org.apache.spark.sql.SaveMode.Append)
            .parquet(quarantinePath)
      }
      .start()
  }

  /** Schema-transition-safe reader for [[gatedDayPartitionedStream]]'s
    * quarantine path: `mergeSchema` unions every footer's columns (so
    * the per-row `violations` column survives mixed-era files), and
    * rows written before the column existed backfill to an empty array
    * — "no per-row triage recorded", distinct from a row that passed
    * every rule only because those carry empty arrays too AND predate
    * nothing (the `_failed_rules` batch verdict disambiguates). */
  def readQuarantine(spark: SparkSession, quarantinePath: String): DataFrame = {
    val raw = spark.read.option("mergeSchema", "true").parquet(quarantinePath)
    val empty = array().cast(org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StringType, containsNull = false))
    // all-legacy path: the column is absent outright; mixed-era path:
    // it exists but legacy rows read back null — both backfill to []
    if (raw.columns.contains("violations"))
      raw.withColumn("violations", coalesce(col("violations"), empty))
    else raw.withColumn("violations", empty)
  }

  /** D2→C7b bridge — streaming IVF index ingest: each micro-batch of
    * new embeddings is cell-assigned against the FROZEN quantizer
    * ([[graft.operators.Similarity.appendToIvfIndex]] — broadcast
    * centroid scoring, no refit) and appended to the cell-bucketed
    * index table, so searches see new vectors within one trigger.
    *
    * Replay-idempotent the same way the signature-index stream is:
    * already-indexed ids are anti-joined away before the append, so a
    * replayed micro-batch appends nothing twice. `numBuckets` must
    * match the existing table's bucket spec (Spark fails loudly on
    * mismatch). Quantizer drift is the operational caveat — re-run the
    * batch build when recall decays; the stream only extends cells.
    *
    * Visibility: OTHER sessions (including the one that started this
    * query) cache the table's file listing — call
    * `spark.catalog.refreshTable(cellTable)` before reading to see
    * rows appended since their last read (standard Spark semantics for
    * file tables modified behind a session's back; the stream's own
    * batches always see the current files).
    *
    * Returns the started query; callers own its lifecycle. */
  def ivfIngestStream(embeddings: DataFrame, cellTable: String,
                      centroidsPath: String, checkpointDir: String,
                      numBuckets: Int = 8):
      org.apache.spark.sql.streaming.StreamingQuery =
    embeddings.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val centroids = spark.read.parquet(centroidsPath)
        graft.operators.Similarity.appendToIvfIndex(batch, centroids)
          .join(spark.table(cellTable).select(col("vec_id")).distinct(),
            Seq("vec_id"), "left_anti")
          .write.mode(org.apache.spark.sql.SaveMode.Append)
          .format("parquet")
          .bucketBy(numBuckets, "cell")
          .sortBy("cell")
          .saveAsTable(cellTable)
      }
      .start()

  /** D2→C26d bridge — streaming TWO-LEVEL (IMI) index ingest:
    * [[ivfIngestStream]]'s exact contract against the two-level
    * artifact — each micro-batch assigns through the SHARED build/day-2
    * rule ([[graft.operators.Similarity.appendToIvfIndexTwoLevel]]:
    * per-half argmin against the two persisted sub-quantizers, product
    * cell `c1 · k2 + c2`) and appends to the cell-bucketed table.
    * Replay-idempotent via the vec_id anti-join; the k2 stride must
    * match the build's (the append kernel refuses a mismatch loudly).
    * Same visibility/bucket-spec/drift caveats as the flat twin.
    *
    * Returns the started query; callers own its lifecycle. */
  def imiIngestStream(embeddings: DataFrame, cellTable: String,
                      cent1Path: String, cent2Path: String, k2: Int,
                      checkpointDir: String, numBuckets: Int = 8):
      org.apache.spark.sql.streaming.StreamingQuery =
    embeddings.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        graft.operators.Similarity.appendToIvfIndexTwoLevel(batch,
          spark.read.parquet(cent1Path), spark.read.parquet(cent2Path), k2)
          .join(spark.table(cellTable).select(col("vec_id")).distinct(),
            Seq("vec_id"), "left_anti")
          .write.mode(org.apache.spark.sql.SaveMode.Append)
          .format("parquet")
          .bucketBy(numBuckets, "cell")
          .sortBy("cell")
          .saveAsTable(cellTable)
      }
      .start()

  /** D2→C26b bridge — streaming SEMANTIC dedup ingest: the D2b shape
    * ([[dedupAgainstIndexStream]]) at the embedding tier. Each
    * micro-batch of new vectors (1) self-deduplicates through the
    * production [[graft.operators.Similarity.semanticDedup]] verdict
    * (within-batch near-dups collapse before the index sees them — the
    * stated batch-vs-corpus caveat of the one-shot probe, closed the
    * same way D2b closes it), (2) verdicts the survivors against the
    * PERSISTED cell-bucketed corpus
    * ([[graft.operators.Similarity.semanticDedupAgainstIndex]] — only
    * the batch shuffles), and (3) hands accepted vectors to `accept`
    * and appends them to the index through the production day-2 rule,
    * so the NEXT trigger's batches verdict against them.
    *
    * Replay-idempotent like [[ivfIngestStream]]: already-indexed ids
    * anti-join away before the append. Quantizer drift stays the
    * operational caveat (re-run the batch build when recall decays);
    * the cell-size guard inside the probe fails loudly in-plan when a
    * cell outgrows `maxCellSize`.
    *
    * ORDER (round-14 advice): the index append commits BEFORE `accept`
    * fires. A replayed batch then finds its vectors already in the
    * index — they verdict as dups and never re-accept, so `accept` is
    * never called twice for a row. The residual crash window is the
    * converse: a crash between the append commit and `accept` leaves
    * rows indexed but unreported; they are recoverable exactly (diff
    * the index table's vec_ids against the accept sink's), whereas the
    * old order's duplicate accepts were silent. Every accepted row is
    * always in the index — the invariant downstream probes rely on.
    *
    * Returns the started query; callers own its lifecycle. */
  def semanticDedupIngestStream(embeddings: DataFrame, cellTable: String,
                                centroidsPath: String, checkpointDir: String,
                                accept: DataFrame => Unit,
                                threshold: Double = 0.25,
                                maxCellSize: Int = 10000,
                                numBuckets: Int = 8):
      org.apache.spark.sql.streaming.StreamingQuery =
    embeddings.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch0: DataFrame, _: Long) =>
        import graft.operators.Similarity
        // materialized once: the self pass, the index probe and the
        // append all fork the batch (the D2b convention)
        val batch = batch0.localCheckpoint()
        val spark = batch.sparkSession
        val centroids = spark.read.parquet(centroidsPath)
        val self = Similarity.semanticDedup(batch, centroids, threshold, maxCellSize)
        val reps = batch.join(
          self.filter(!col("is_dup")).select(col("vec_id")), Seq("vec_id"))
        val verdicts = Similarity.semanticDedupAgainstIndex(
          reps, spark.table(cellTable), centroids, threshold, maxCellSize)
        val accepted = reps
          .join(verdicts.filter(!col("is_dup")).select(col("vec_id")), Seq("vec_id"))
          .localCheckpoint()
        // append FIRST (see the order contract above), report after
        Similarity.appendToIvfIndex(accepted, centroids)
          .join(spark.table(cellTable).select(col("vec_id")).distinct(),
            Seq("vec_id"), "left_anti")
          .write.mode(org.apache.spark.sql.SaveMode.Append)
          .format("parquet")
          .bucketBy(numBuckets, "cell")
          .sortBy("cell")
          .saveAsTable(cellTable)
        accept(accepted)
      }
      .start()

  /** D2→C4c bridge — streaming EXACT-Jaccard dedup ingest (round 14):
    * the D2b/D2n shape at the prefix-filtered exact tier. Each
    * micro-batch of (doc_id, text) (1) self-deduplicates within the
    * batch ([[graft.operators.Dedup.shingleJaccardPrefixDocs]] — exact,
    * batch-local order), (2) verdicts survivors against the persisted
    * three-part prefix index under its FROZEN vocabulary
    * ([[graft.operators.Dedup.dedupAgainstPrefixIndex]] — the corpus
    * side reads bucketed, zero corpus exchanges), (3) appends the
    * accepted docs' postings + grams rows under the same frozen order
    * ([[graft.operators.Dedup.appendToPrefixIndex]]), then (4) calls
    * `accept`.
    *
    * Exactly-once contract: a re-delivered id is a REPLAY, not a
    * candidate — the batch anti-joins the POSTINGS table's ids up
    * front (the probe's own self-pair exclusion would otherwise hide
    * a replayed id from itself and re-accept it); append BEFORE
    * accept (the round-14 order rule); and each artifact append
    * anti-joins its OWN table's doc_ids, so either append is
    * individually idempotent. Append ORDER is load-bearing (the r14
    * advice fix): grams are written FIRST, postings SECOND, and
    * replay detection reads postings — the LAST artifact. Candidate
    * generation reads postings and verification reads grams, so any
    * doc a later batch can candidate-match always verifies (its grams
    * landed first); a doc crashed between the appends is simply
    * invisible to candidates until its replay heals the postings.
    * The one crash-window asymmetry: if a true duplicate arrives
    * BEFORE the replay, it cannot see the half-indexed doc and is
    * accepted — and the replayed original then candidate-matches the
    * newcomer and is REJECTED, leaving exactly one copy in the corpus
    * plus one orphaned grams row (never consulted: verification only
    * reads grams for ids found in postings). Duplicates never leak
    * INTO the index; accept stays at-most-once per id. The vocabulary
    * is frozen at build time and only read here, never written — the
    * exactness-under-growth invariant. */
  def prefixDedupIngestStream(docs: DataFrame, postingsTable: String,
                              gramsTable: String, vocabPath: String,
                              checkpointDir: String,
                              accept: DataFrame => Unit,
                              k: Int = 3, t: Double = 0.5,
                              numBuckets: Int = 8):
      org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch0: DataFrame, _: Long) =>
        import graft.operators.Dedup
        val spark = batch0.sparkSession
        val batch = batch0
          .join(spark.table(postingsTable).select(col("doc_id")).distinct(),
            Seq("doc_id"), "left_anti")
          .localCheckpoint()
        val vocab = spark.read.parquet(vocabPath)
        val self = Dedup.shingleJaccardPrefixDocs(batch, k, t)
        val reps = batch.join(
          self.filter(!col("is_dup")).select(col("doc_id")), Seq("doc_id"))
        val verdicts = Dedup.dedupAgainstPrefixIndex(reps,
          spark.table(postingsTable), spark.table(gramsTable), vocab, k, t)
        val accepted = reps
          .join(verdicts.filter(!col("is_dup")).select(col("doc_id")), Seq("doc_id"))
          .localCheckpoint()
        val (addPost, addGrams) = Dedup.appendToPrefixIndex(accepted, vocab, k, t)
        // grams FIRST, postings SECOND — see the order contract above
        addGrams
          .join(spark.table(gramsTable).select(col("doc_id")).distinct(),
            Seq("doc_id"), "left_anti")
          .write.mode(org.apache.spark.sql.SaveMode.Append)
          .format("parquet").bucketBy(numBuckets, "doc_id").sortBy("doc_id")
          .saveAsTable(gramsTable)
        addPost
          .join(spark.table(postingsTable).select(col("doc_id")).distinct(),
            Seq("doc_id"), "left_anti")
          .write.mode(org.apache.spark.sql.SaveMode.Append)
          .format("parquet").bucketBy(numBuckets, "g").sortBy("g")
          .saveAsTable(postingsTable)
        accept(accepted)
      }
      .start()

  /** D2→C11c bridge — streaming WINNOW-overlap ingest (round 14): the
    * D2s shape at the span-evidence tier. Each micro-batch of
    * (doc_id, text) (1) self-screens within the batch
    * ([[graft.operators.Dedup.winnowOverlap]] — of each gated pair the
    * LOWER id survives, first-writer-wins), (2) verdicts survivors
    * against the persisted fingerprint index
    * ([[graft.operators.Dedup.winnowOverlapAgainstIndex]] — the corpus
    * side reads bucketed on h, zero corpus exchanges; a gated overlap
    * means a shared span ≥ minShared prints, i.e. paste/near-copy
    * evidence, and the doc is REJECTED), (3) appends the accepted
    * docs' fingerprints BEFORE accept (the round-14 order rule). The
    * simplest ingest of the family: selection is doc-local (see
    * [[graft.operators.Dedup.buildWinnowIndex]]), so there is no
    * frozen vocabulary/centroid artifact to thread — the index table
    * is the WHOLE day-2 state.
    *
    * Replay-idempotent: already-indexed ids anti-join away up front
    * (the probe's self-exclusion would otherwise hide a replayed id
    * from itself and re-accept it — the D2s lesson), and the append
    * anti-joins its own table's ids, so a crash after append and
    * before accept degrades to at-least-once accept while the index
    * never double-counts. */
  def winnowIngestStream(docs: DataFrame, indexTable: String,
                         checkpointDir: String,
                         accept: DataFrame => Unit,
                         k: Int = 12, w: Int = 4, minShared: Long = 8L,
                         numBuckets: Int = 8):
      org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch0: DataFrame, _: Long) =>
        import graft.operators.Dedup
        val spark = batch0.sparkSession
        val batch = batch0
          .join(spark.table(indexTable).select(col("doc_id")).distinct(),
            Seq("doc_id"), "left_anti")
          .localCheckpoint()
        val selfDrop = Dedup.winnowOverlap(batch, k = k, w = w,
          minShared = minShared)
          .select(col("doc_b").as("doc_id")).distinct()
        val reps = batch.join(selfDrop, Seq("doc_id"), "left_anti")
        val verdicts = Dedup.winnowOverlapAgainstIndex(reps,
          spark.table(indexTable), k = k, w = w, minShared = minShared)
        val accepted = reps
          .join(verdicts.filter(!col("has_overlap")).select(col("doc_id")),
            Seq("doc_id"))
          .localCheckpoint()
        Dedup.appendToWinnowIndex(accepted, k = k, w = w)
          .join(spark.table(indexTable).select(col("doc_id")).distinct(),
            Seq("doc_id"), "left_anti")
          .write.mode(org.apache.spark.sql.SaveMode.Append)
          .format("parquet").bucketBy(numBuckets, "h").sortBy("h")
          .saveAsTable(indexTable)
        accept(accepted)
      }
      .start()

  /** D2→C11g bridge — streaming CLEAN ingest (round 14): where
    * [[winnowIngestStream]] REJECTS a doc on span overlap, this stream
    * runs ExactSubstr's removal policy instead — incremental
    * exact-substring dedup per trigger, nothing rejected. (1)
    * within-batch: localize shared spans among the batch docs
    * ([[graft.operators.Dedup.winnowSharedSpans]]) and excise them
    * from the HIGHER id of each pair
    * ([[graft.operators.Dedup.exciseKeepAll]] — one copy of every
    * span survives, first-writer-wins); (2) corpus pass: localize the
    * self-cleaned text's spans against the persisted index and excise
    * those too ([[graft.operators.Dedup.winnowCleanAgainstIndex]] —
    * corpus side reads bucketed on h, zero corpus exchanges); (3)
    * append the CLEAN text's fingerprints BEFORE accept — the clean
    * text is what entered the corpus, so later batches must shed
    * against it, not against spans that were never kept. Every doc is
    * accepted exactly once, carrying only its novel text.
    *
    * Replay-idempotent by the house rule: already-indexed ids
    * anti-join away up front and the append anti-joins its own ids.
    * Stated edge (shared with [[winnowIngestStream]]): a doc whose
    * clean text is too short to fingerprint (< k + w − 1 chars) never
    * lands in the index, so a replayed delivery re-accepts it —
    * accept is at-least-once for span-less fragments, exactly-once
    * for everything the index can witness. */
  def winnowCleanIngestStream(docs: DataFrame, indexTable: String,
                              checkpointDir: String,
                              accept: DataFrame => Unit,
                              k: Int = 12, w: Int = 4,
                              minPrints: Long = 3L,
                              numBuckets: Int = 8):
      org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch0: DataFrame, _: Long) =>
        import graft.operators.Dedup
        val spark = batch0.sparkSession
        val batch = batch0
          .join(spark.table(indexTable).select(col("doc_id")).distinct(),
            Seq("doc_id"), "left_anti")
          .localCheckpoint()
        val selfSpans = Dedup.winnowSharedSpans(batch, k = k, w = w,
            minPrints = minPrints)
          .select(col("doc_b"), col("b_start"), col("b_end"))
        val selfClean = Dedup.exciseKeepAll(batch, selfSpans)
          .select(col("doc_id"), col("clean_text").as("text"))
        val cleaned = Dedup.winnowCleanAgainstIndex(selfClean,
            spark.table(indexTable), k = k, w = w, minPrints = minPrints)
          .localCheckpoint()
        Dedup.appendToWinnowIndex(
            cleaned.select(col("doc_id"), col("clean_text").as("text")),
            k = k, w = w)
          .join(spark.table(indexTable).select(col("doc_id")).distinct(),
            Seq("doc_id"), "left_anti")
          .write.mode(org.apache.spark.sql.SaveMode.Append)
          .format("parquet").bucketBy(numBuckets, "h").sortBy("h")
          .saveAsTable(indexTable)
        accept(cleaned)
      }
      .start()

  /** D2→C2c bridge — STREAMING DECONTAMINATION (round 14, the D-twin
    * q137 implies): each micro-batch of incoming documents verdicts
    * MAP-SIDE against the persisted eval gram index
    * ([[graft.operators.Dedup.buildEvalGramIndex]] — the eval suite's
    * distinct 13-gram keys, tiny, broadcast), via the IDENTICAL
    * batch kernel ([[graft.operators.Dedup.flagAgainstEvalGrams]] —
    * one derivation, so stream and batch verdicts cannot drift), and
    * appends (doc_id, contaminated) to the verdict table. The corpus
    * never shuffles: the gram set broadcasts and the batch-side gram
    * stream joins map-side — the q137 100 TB shape, per trigger.
    *
    * Replay-idempotent like [[vocabIngestStream]]: already-verdicted
    * doc_ids anti-join away, so a re-delivered batch appends nothing.
    * Eval-suite updates: the gram index is re-read EVERY trigger, so
    * appended gram rows take effect from the next batch; verdicts
    * already written are frozen at their ingest-time suite (re-screen
    * the corpus with the batch operator on a suite release — verdicts
    * name a (doc, suite) pair, not a doc alone).
    *
    * Returns the started query; callers own its lifecycle. */
  def decontamIngestStream(docs: DataFrame, evalGramsPath: String,
                           verdictPath: String, checkpointDir: String,
                           n: Int = 13):
      org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        import graft.operators.Dedup
        val spark = batch.sparkSession
        val evalGrams = spark.read.parquet(evalGramsPath)
        // O(1) join-strategy gate (round 18, verdict item 2): read the
        // persisted census beside the index; cold-start seeds it with
        // one exact count so every LATER trigger skips the index-sized
        // aggregation — suite releases grow the index through
        // [[graft.operators.Dedup.appendEvalGrams]], which keeps the
        // stat an upper bound (the safe, shuffle-erring direction)
        val census = Dedup.readEvalGramCensus(spark, evalGramsPath)
          .getOrElse {
            val c = evalGrams.select(col("g")).distinct().count()
            Dedup.writeEvalGramCensus(spark, evalGramsPath, c)
            c
          }
        val verdicts = Dedup
          .flagAgainstEvalGrams(batch, evalGrams, n, knownCensus = Some(census))
        val fresh = readTableIfExists(spark, verdictPath) match {
          case Some(existing) =>
            verdicts.join(existing.select(col("doc_id")), Seq("doc_id"), "left_anti")
          case None => verdicts
        }
        if (!fresh.isEmpty)
          fresh.write.mode(org.apache.spark.sql.SaveMode.Append).parquet(verdictPath)
      }
      .start()

  /** D2→C26e bridge — streaming SEMANTIC-dedup ingest at the
    * TWO-LEVEL (IMI) tier (round 14; D2n is this shape on the flat
    * quantizer): each micro-batch (1) assigns through the SHARED
    * per-half argmin rule and self-deduplicates within its product
    * cells ([[graft.operators.Similarity.semanticDedupAssigned]] on
    * the batch's own assigned frame), (2) verdicts survivors against
    * the persisted cell-bucketed corpus through the PROBE-SIDE recall
    * knob ([[graft.operators.Similarity.semanticDedupAgainstImiIndex]]
    * — nProbe=2 per half by default, so boundary pairs the √cells
    * assignment splits still verdict as dups; the INDEX stays
    * nProbe=1), and (3) appends accepted vectors through the shared
    * build rule BEFORE handing them to `accept` (the round-14 D2n
    * order: replayed ids verdict as dups and never re-accept).
    *
    * Replay-idempotent via the vec_id anti-join; the k2 stride and
    * cell-size guards refuse loudly. Quantizer drift stays the
    * operational caveat.
    *
    * Returns the started query; callers own its lifecycle. */
  def semanticDedupImiIngestStream(embeddings: DataFrame, cellTable: String,
                                   cent1Path: String, cent2Path: String, k2: Int,
                                   checkpointDir: String,
                                   accept: DataFrame => Unit,
                                   threshold: Double = 0.25,
                                   maxCellSize: Int = 10000,
                                   nProbe: Int = 2,
                                   numBuckets: Int = 8):
      org.apache.spark.sql.streaming.StreamingQuery =
    embeddings.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch0: DataFrame, _: Long) =>
        import graft.operators.Similarity
        val batch = batch0.localCheckpoint()
        val spark = batch.sparkSession
        val c1 = spark.read.parquet(cent1Path)
        val c2 = spark.read.parquet(cent2Path)
        // ONE assignment pass serves the self pass and the append
        val batchAssigned = Similarity
          .appendToIvfIndexTwoLevel(batch, c1, c2, k2).localCheckpoint()
        val self = Similarity.semanticDedupAssigned(batchAssigned, threshold, maxCellSize)
        val reps = batch.join(
          self.filter(!col("is_dup")).select(col("vec_id")), Seq("vec_id"))
        val verdicts = Similarity.semanticDedupAgainstImiIndex(
          reps, spark.table(cellTable), c1, c2, k2, threshold, maxCellSize, nProbe)
        val acceptedIds = verdicts.filter(!col("is_dup")).select(col("vec_id"))
        val accepted = reps.join(acceptedIds, Seq("vec_id")).localCheckpoint()
        batchAssigned.join(acceptedIds, Seq("vec_id"))
          .join(spark.table(cellTable).select(col("vec_id")).distinct(),
            Seq("vec_id"), "left_anti")
          .write.mode(org.apache.spark.sql.SaveMode.Append)
          .format("parquet")
          .bucketBy(numBuckets, "cell")
          .sortBy("cell")
          .saveAsTable(cellTable)
        accept(accepted)
      }
      .start()

  /** D2→C12b bridge — streaming RAW-TEXT embedding ingest: new
    * documents embed through the deterministic projection
    * ([[graft.operators.TextEmbed.embedDocuments]] — a map-only
    * column expression, so it composes into the streaming plan with
    * no extra state) and extend the IVF corpus table through
    * [[ivfIngestStream]]'s exact machinery; similarity search sees new
    * documents within one trigger, no embeddings table anywhere.
    * Same replay idempotence (indexed-id anti-join) and quantizer
    * drift caveats as the embedding-stream twin. */
  def textEmbedIngestStream(docs: DataFrame, cellTable: String,
                            centroidsPath: String, checkpointDir: String,
                            numBuckets: Int = 8, dims: Int = graft.operators.TextEmbed.DefaultDims):
      org.apache.spark.sql.streaming.StreamingQuery =
    ivfIngestStream(graft.operators.TextEmbed.embedDocuments(docs, dims),
      cellTable, centroidsPath, checkpointDir, numBuckets)

  /** D2→C27b bridge — streaming canonical-VOCABULARY maintenance: each
    * micro-batch of strings resolves through the production day-2
    * kernel ([[graft.operators.FuzzyJoin.appendToVocabulary]] — new
    * strings probe the vocabulary's deletion-key buckets, chains of
    * new strings resolve through the certified closure, clusters
    * touching the old vocabulary adopt its min canonical) and APPENDS
    * the new rows; existing rows are never rewritten.
    *
    * Replay-idempotent like [[ivfIngestStream]]: already-known names
    * anti-join away inside the kernel, so a re-delivered batch appends
    * nothing. Same drift caveat as the batch kernel: bridges don't
    * merge existing clusters — re-run `canonicalVocabulary` on the
    * refit cadence. First batch against an empty path bootstraps the
    * vocabulary (every cluster is new, the q89 batch rule).
    *
    * Returns the started query; callers own its lifecycle. */
  def vocabIngestStream(strings: DataFrame, vocabPath: String,
                        checkpointDir: String, strCol: String = "name",
                        maxDist: Int = 1):
      org.apache.spark.sql.streaming.StreamingQuery =
    strings.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        def readOpt(path: String) = readTableIfExists(spark, path)
        val vocab = readOpt(vocabPath).getOrElse {
          import spark.implicits._
          Seq.empty[(String, String, Boolean)]
            .toDF("name", "canonical", "is_variant")
        }
        val fresh = graft.operators.FuzzyJoin
          .appendToVocabulary(batch, strCol, vocab, maxDist)
        if (!fresh.isEmpty)
          fresh.write.mode(org.apache.spark.sql.SaveMode.Append).parquet(vocabPath)
      }
      .start()

  /** D2→C35b bridge — streaming canonical-URL index maintenance: each
    * micro-batch of crawled pages canonicalizes
    * ([[graft.operators.Urls.buildUrlIndex]] on the batch alone) and
    * APPENDS only canonical URLs the index has never seen; existing
    * rows are never rewritten, so a resource's keeper is stable for
    * the life of the index.
    *
    * Keeper semantics, stated honestly: the batch builder elects the
    * GLOBAL min id; this stream elects first-arrival (min id within
    * the first batch that carries the resource). Probes
    * ([[graft.operators.Urls.urlDedupAgainstIndex]]) need only A
    * stable keeper, and first-arrival is the natural streaming
    * election — recrawls are dups of the first fetch. `n_copies` is
    * deliberately not maintained (it would force rewrites of a
    * corpus-sized artifact per trigger); the census streams own count
    * maintenance.
    *
    * Replay-idempotent like [[vocabIngestStream]]: a re-delivered
    * batch's canonical URLs anti-join away against the index, so
    * nothing doubles. First batch against an empty path bootstraps.
    *
    * Returns the started query; callers own its lifecycle. */
  def urlIndexIngestStream(pages: DataFrame, indexPath: String,
                           checkpointDir: String,
                           idCol: String = "doc_id", urlCol: String = "url"):
      org.apache.spark.sql.streaming.StreamingQuery =
    pages.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        def readOpt(path: String) = readTableIfExists(spark, path)
        val batchIdx = graft.operators.Urls
          .buildUrlIndex(batch, idCol, urlCol)
          .select(col("canon_url"), col("keep_id"))
        val fresh = readOpt(indexPath) match {
          case Some(ix) =>
            batchIdx.join(ix.select(col("canon_url")), Seq("canon_url"), "left_anti")
          case None => batchIdx
        }
        if (!fresh.isEmpty)
          fresh.write.mode(org.apache.spark.sql.SaveMode.Append).parquet(indexPath)
      }
      .start()

  /** D2→C1b bridge — streaming EXACT-dedup index maintenance (round
    * 12, completing the index-maintenance family at the exact tier the
    * way [[urlIndexIngestStream]] does at the URL tier): each
    * micro-batch elects its within-batch keepers through the
    * production [[graft.operators.Dedup.buildExactIndex]] aggregate
    * and APPENDS only never-seen fingerprints, so later batches (and
    * the batch probe [[graft.operators.Dedup.dedupExactAgainstIndex]])
    * dedup against them. Keepers are FIRST-ARRIVAL and stable for the
    * index's life (the D2h contract — probes need only A stable
    * keeper, not the global minimum); `n_copies` is deliberately not
    * maintained (it would rewrite a corpus-sized artifact per trigger
    * — recount it batch-side on the audit cadence).
    *
    * Replay-idempotent via the fingerprint anti-join; bootstraps from
    * an empty path. */
  def exactIndexIngestStream(docs: DataFrame, indexPath: String,
                             checkpointDir: String,
                             idCol: String = "doc_id", textCol: String = "text"):
      org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val batchIdx = graft.operators.Dedup
          .buildExactIndex(batch, idCol, textCol)
          .select(col("fingerprint"), col("keep_id"))
        val fresh = readTableIfExists(spark, indexPath) match {
          case Some(ix) =>
            batchIdx.join(ix.select(col("fingerprint")), Seq("fingerprint"), "left_anti")
          case None => batchIdx
        }
        if (!fresh.isEmpty)
          fresh.write.mode(org.apache.spark.sql.SaveMode.Append).parquet(indexPath)
      }
      .start()

  /** D2→C44 bridge — streaming WET chunk ingest: each micro-batch of
    * crawl chunk files parses through the production extractor
    * ([[graft.sources.Warc.wetRecords]]) and APPENDS its records to
    * the records table — the persisted artifact every downstream
    * stage (C45's ingest report, URL gating, dedup) probes instead of
    * re-parsing chunks.
    *
    * Replay-idempotent at the RECORD grain: the batch parses first and
    * anti-joins on (chunk_id, rec_idx) — so a re-delivered chunk
    * appends nothing, AND a crash that committed only part of a
    * chunk's records before the checkpoint self-heals on replay (the
    * missing records append, the present ones skip). A chunk-presence
    * anti-join would silently drop the missing half forever — the
    * postings-stream crash lesson at this sink's grain. Within-batch
    * duplicate chunk ids collapse first; (chunk_id, rec_idx) identity
    * is stable across the batch and streaming paths. */
  def wetIngestStream(chunks: DataFrame, recordsPath: String,
                      checkpointDir: String,
                      idCol: String = "chunk_id", contentCol: String = "content"):
      org.apache.spark.sql.streaming.StreamingQuery =
    chunks.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch0: DataFrame, _: Long) =>
        val spark = batch0.sparkSession
        val batch = batch0.dropDuplicates(idCol)
        val parsed = graft.sources.Warc.wetRecords(batch, idCol, contentCol)
        val fresh = readTableIfExists(spark, recordsPath) match {
          case Some(r) =>
            parsed.join(r.select(col(idCol), col("rec_idx")).distinct(),
              Seq(idCol, "rec_idx"), "left_anti")
          case None => parsed
        }
        if (!fresh.isEmpty)
          fresh.write.mode(org.apache.spark.sql.SaveMode.Append).parquet(recordsPath)
      }
      .start()

  /** First-run-only benign read: Some(table) if `path` holds one, None
    * when the path is missing or holds no files yet (the bootstrap
    * states). Anything else — corruption, permissions, transient FS
    * failures — PROPAGATES and fails the stream (the advice-r9 rule);
    * ONE definition for every stream that bootstraps from an empty
    * sink. */
  private def readTableIfExists(spark: org.apache.spark.sql.SparkSession,
                                path: String): Option[DataFrame] =
    try Some(spark.read.parquet(path))
    catch {
      case e: org.apache.spark.sql.AnalysisException
          if e.getCondition == "PATH_NOT_FOUND" ||
             e.getCondition == "UNABLE_TO_INFER_SCHEMA" => None
    }

  /** D2→C30 bridge — streaming postings-index maintenance: each
    * micro-batch of new documents extends the BM25/phrase artifacts
    * through the production day-2 kernel
    * ([[graft.operators.Search.buildPostings]] on the batch alone —
    * postings append by pure union, stats add as exact longs), so
    * searches see new documents within one trigger without any corpus
    * re-tokenize.
    *
    * Replay-idempotent like [[ivfIngestStream]]: already-indexed doc
    * ids anti-join away before the append (postings counts are not
    * value-idempotent, and a re-delivered doc would double its tf),
    * and within-batch duplicate ids collapse first.
    *
    * Crash-safety: the postings APPEND is the only commit — stats
    * ((n_docs, dl_sum), one row) are REBUILT from the postings
    * artifact after each append (n_docs = distinct doc_id, dl_sum =
    * sum of dl over the per-doc projection), never incremented from
    * a prior stats read. A crash between the two writes therefore
    * loses nothing: the replayed batch anti-joins its docs away (they
    * are in postings) and the rebuild still derives stats from the
    * full artifact — stale stats self-heal on the next trigger. The
    * incremental-arithmetic alternative ([[Search.appendToPostings]],
    * the right call for single-writer batch jobs) would silently skew
    * IDF/avgdl on exactly that crash. Cost: one (doc_id, dl) distinct
    * aggregate over the postings table per trigger — at scale,
    * partition postings by doc_id hash range so the distinct is
    * map-side-partial; the aggregate moves |docs| pairs, not |postings|
    * rows.
    *
    * Returns the started query; callers own its lifecycle. */
  def postingsIngestStream(docs: DataFrame, postingsPath: String,
                           statsPath: String, checkpointDir: String,
                           idCol: String = "doc_id", textCol: String = "text"):
      org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch0: DataFrame, _: Long) =>
        val spark = batch0.sparkSession
        val batch = batch0.dropDuplicates(idCol)
        // first-run-only benign catch (the advice-r9 rule)
        def readOpt(path: String) = readTableIfExists(spark, path)
        val fresh = readOpt(postingsPath) match {
          case Some(existing) =>
            batch.join(existing.select(col("doc_id")).distinct()
                .withColumnRenamed("doc_id", idCol),
              Seq(idCol), "left_anti")
          case None => batch
        }
        val (np, ns) = graft.operators.Search.buildPostings(fresh, idCol, textCol)
        val nNew = ns.collect()(0).getLong(0)
        if (nNew > 0)
          np.write.mode(org.apache.spark.sql.SaveMode.Append).parquet(postingsPath)
        // stats derive from the artifact whenever the trigger carried
        // ANY docs — NOT only when nNew > 0: a pure replay of a
        // crashed batch (postings landed, stats write lost) anti-joins
        // every doc away, so nNew == 0 is exactly the case the heal
        // exists for. The rebuild reads the postings, never a prior
        // stats row — the append above is the sole commit point.
        if (!batch.isEmpty) readOpt(postingsPath).foreach { p =>
          p.groupBy(col("doc_id")).agg(first(col("dl")).as("dl"))
            .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("dl_sum"))
            .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(statsPath)
        }
      }
      .start()

  /** D2→C30c bridge — streaming POSITIONAL-postings maintenance: each
    * micro-batch of new documents extends the phrase-search artifact
    * through [[graft.operators.Search.appendToPositionalPostings]]'s
    * kernel (index only the fresh docs, pure union — a positional row
    * is a function of its own doc, so there is no stats row to heal
    * and no merge), so [[graft.operators.Search.phraseSearch]] sees
    * new documents within one trigger.
    *
    * Replay-idempotent the D2e way, but SELF-CONTAINED: already-indexed
    * doc ids anti-join against the positional table's OWN ids (not a
    * sibling artifact), so a replayed batch appends nothing twice and
    * there is no cross-artifact crash window at all — the append is
    * the sole commit point.
    *
    * Returns the started query; callers own its lifecycle. */
  def positionalIngestStream(docs: DataFrame, positionalPath: String,
                             checkpointDir: String,
                             idCol: String = "doc_id", textCol: String = "text"):
      org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch0: DataFrame, _: Long) =>
        val spark = batch0.sparkSession
        val batch = batch0.dropDuplicates(idCol)
        // first-run-only benign catch (the advice-r9 rule)
        val fresh = readTableIfExists(spark, positionalPath) match {
          case Some(existing) =>
            batch.join(existing.select(col("doc_id")).distinct()
                .withColumnRenamed("doc_id", idCol),
              Seq(idCol), "left_anti")
          case None => batch
        }
        graft.operators.Search.buildPositionalPostings(fresh, idCol, textCol)
          .write.mode(org.apache.spark.sql.SaveMode.Append)
          .parquet(positionalPath)
      }
      .start()

  /** D2→C7d bridge — streaming COMPOSED-index (residual IVFADC)
    * ingest: each micro-batch of new embeddings extends the corpus
    * table through the production day-2 append
    * ([[graft.operators.Similarity.appendToIvfPqIndex]] — probe-rule
    * cell assignment, residual encode against the FROZEN persisted
    * codebook; no KMeans model objects), so composed searches see new
    * vectors within one trigger. Replay-idempotent like
    * [[ivfIngestStream]]: already-indexed ids anti-join away before
    * the append. Same visibility/bucket-spec/drift caveats as the IVF
    * twin — re-run the batch build when recall decays; the stream only
    * extends cells.
    *
    * Returns the started query; callers own its lifecycle. */
  def ivfPqIngestStream(embeddings: DataFrame, corpusTable: String,
                        centroidsPath: String, codebookPath: String,
                        checkpointDir: String, numBuckets: Int = 8):
      org.apache.spark.sql.streaming.StreamingQuery =
    embeddings.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val centroids = spark.read.parquet(centroidsPath)
        val codebook = spark.read.parquet(codebookPath)
        graft.operators.Similarity.appendToIvfPqIndex(batch, centroids, codebook)
          .join(spark.table(corpusTable).select(col("vec_id")).distinct(),
            Seq("vec_id"), "left_anti")
          .write.mode(org.apache.spark.sql.SaveMode.Append)
          .format("parquet")
          .bucketBy(numBuckets, "cell")
          .sortBy("cell")
          .saveAsTable(corpusTable)
      }
      .start()

  /** D2→C7e bridge — streaming IMI+ADC ingest (round 14, the composed
    * index's streaming twin: D2d is flat IVFADC, D2o the bare
    * two-level index — this is both at once): each micro-batch extends
    * the (vec_id, v, nrm, cell, codes) corpus through the production
    * day-2 append ([[graft.operators.Similarity.appendToImiPqIndex]] —
    * shared per-half argmin to the PRODUCT cell, residual against the
    * concatenated half-centroids, frozen-codebook flat-table encode;
    * only parquet artifacts cross the boundary), so composed IMI+ADC
    * searches see new vectors within one trigger. Replay-idempotent
    * via the vec_id anti-join; a mismatched k2 stride refuses loudly
    * in the shared assignment rule. Same drift caveat as every index
    * stream: re-run the batch build when recall decays.
    *
    * Returns the started query; callers own its lifecycle. */
  def imiPqIngestStream(embeddings: DataFrame, corpusTable: String,
                        cent1Path: String, cent2Path: String, k2: Int,
                        codebookPath: String, checkpointDir: String,
                        numBuckets: Int = 8):
      org.apache.spark.sql.streaming.StreamingQuery =
    embeddings.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        graft.operators.Similarity.appendToImiPqIndex(batch,
          spark.read.parquet(cent1Path), spark.read.parquet(cent2Path), k2,
          spark.read.parquet(codebookPath))
          .join(spark.table(corpusTable).select(col("vec_id")).distinct(),
            Seq("vec_id"), "left_anti")
          .write.mode(org.apache.spark.sql.SaveMode.Append)
          .format("parquet")
          .bucketBy(numBuckets, "cell")
          .sortBy("cell")
          .saveAsTable(corpusTable)
      }
      .start()

  /** D1→A20 bridge — streaming anomaly flags: the q58 semantics
    * (daily counts z-scored against the trailing `baselineDays`-day
    * baseline, current day excluded) applied IN-FLIGHT.
    *
    * Shape: a watermarked 1-day tumbling aggregation emits each
    * (key, day, n_events) row once, when the watermark passes the day's
    * end (append mode = days are FINAL — a day is scored exactly once,
    * never re-scored on late refinement). `foreachBatch` then (1)
    * scores the finalized days against the durable daily-counts table
    * via the same trailing-window join semantics as the batch operator,
    * (2) hands flagged rows to `alert`, and (3) lands the new days into
    * the table by dynamic partition overwrite — idempotent under
    * replay because finalized days are complete by construction, so
    * rewriting one is a no-op in content.
    *
    * The counts table is the stream's baseline state — durable,
    * queryable, shared with the batch pipeline (it IS q58's daily
    * grain), and bounded by |keys × days|, not stream uptime.
    *
    * Baseline semantics match the batch operator exactly: both are
    * CALENDAR-anchored ([day−N, day−1] — q58's RANGE frame over the day
    * number), so a silent gap SHRINKS the baseline instead of letting
    * stale pre-gap days vote (a gap usually means the pipeline was
    * down).
    *
    * Returns the started query; callers own its lifecycle. */
  def anomalyIngestStream(events: DataFrame, countsPath: String,
                          checkpointDir: String,
                          alert: DataFrame => Unit,
                          keyCol: String = "event_type", tsCol: String = "ts",
                          baselineDays: Int = 7, zThreshold: Double = 2.0,
                          watermark: String = "1 day"):
      org.apache.spark.sql.streaming.StreamingQuery = {
    require(baselineDays >= 2, s"baselineDays must be >= 2, got $baselineDays")
    val daily = events
      .withWatermark(tsCol, watermark)
      .groupBy(col(keyCol), window(col(tsCol), "1 day"))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol), col("window.start").cast("date").as("day"), col("n_events"))
    daily.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch0: DataFrame, _: Long) =>
        val batch = batch0.localCheckpoint() // scored AND landed below
        val spark = batch.sparkSession
        val history = scala.util.Try(spark.read.parquet(countsPath)).toOption
        // a multi-day batch (cold start, recovery catch-up) must let its
        // own EARLIER days baseline its later ones — the join's
        // h.day < b.day keeps self/future days out. History rows whose
        // (key, day) the batch re-delivers anti-join away first: on a
        // REPLAYED batch those days already sit in countsPath, and a
        // duplicated baseline row leaves avg unchanged but shrinks
        // stddev_samp — replayed batches would score (and alert)
        // differently from first delivery. With the dedup, scoring is
        // replay-idempotent, not just the landed write.
        val baseline = history
          .map(_.select(col(keyCol), col("day"), col("n_events"))
            .join(batch.select(col(keyCol), col("day")), Seq(keyCol, "day"), "left_anti")
            .unionByName(batch))
          .getOrElse(batch)
        // trailing-window join: one baseline row per (batch day, prior
        // day within the window); a day with no baseline rows keeps a
        // null z (the q58 short-baseline contract)
        val b = batch.as("b")
        val scored = b
          .join(baseline.as("h"),
            col(s"h.$keyCol") === col(s"b.$keyCol") &&
              col("h.day") < col("b.day") &&
              col("h.day") >= date_add(col("b.day"), -baselineDays),
            "left_outer")
          .groupBy(col(s"b.$keyCol").as(keyCol), col("b.day").as("day"),
            col("b.n_events").as("n_events"))
          .agg(avg(col("h.n_events")).as("_mean"),
            stddev_samp(col("h.n_events")).as("_std"))
          .withColumn("z_score",
            when(col("_std").isNull || col("_std") === 0.0, lit(null))
              .otherwise(round((col("n_events") - col("_mean")) / col("_std"), 4)))
          .withColumn("is_anomaly", coalesce(abs(col("z_score")) > zThreshold, lit(false)))
          .withColumn("baseline_mean", round(col("_mean"), 4))
          .withColumn("baseline_std", round(col("_std"), 4))
          .drop("_mean", "_std")
        alert(scored.filter(col("is_anomaly")))
        graft.sources.Sinks.writeDayPartitioned(
          batch, countsPath, "day", ifExists = "replace", clean = false)
      }
      .start()
  }

  /** D2 — stateful streaming dedup: first occurrence of each
    * (user_id, event_type) key passes through, repeats are dropped.
    * `flatMapGroupsWithState` with a processing-time timeout bounds the
    * seen-key state (`stateTtl`); at scale the key space is partitioned
    * across executors by the groupBy key. */
  def dedupStream(events: Dataset[StreamEvent],
                  stateTtl: Option[String] = None): Dataset[StreamEvent] = {
    import events.sparkSession.implicits._
    firstPerKey[StreamEvent, (Long, String)](
      events, e => (e.user_id, e.event_type), stateTtl)
  }

  /** D2→C31 bridge — streaming DSIR scoring: each micro-batch of new
    * documents scores against the PERSISTED importance model
    * ([[graft.operators.Sharding.dsirFit]]'s dense bucket-ratio
    * artifact — fit once from the target/raw pools, never touched by
    * the stream) through the production day-2 kernel
    * ([[graft.operators.Sharding.dsirScoreAgainstModel]], broadcast
    * join), and APPENDS (doc_id, n_tokens, logweight) to the scored
    * table — the continuously-maintained ranking a selection policy
    * thresholds downstream.
    *
    * The model path must exist BEFORE the stream starts (fit-first
    * contract — scoring against a half-written or missing model is a
    * pipeline-order bug, so that failure propagates loudly; this is
    * deliberately NOT the sketch sinks' first-run-bootstrap shape,
    * because an empty model is not a valid zero object the way an
    * empty sketch table is). Replay-idempotent per the postings
    * convention: already-scored doc_ids anti-join away, so a
    * re-delivered batch appends nothing; scores are pure functions of
    * (doc, frozen model), so there is no stats row to heal.
    *
    * Returns the started query; callers own its lifecycle. */
  def dsirScoreStream(docs: DataFrame, modelPath: String, scoredPath: String,
                      checkpointDir: String,
                      idCol: String = "doc_id", textCol: String = "text"):
      org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch0: DataFrame, _: Long) =>
        val spark = batch0.sparkSession
        val batch = batch0.dropDuplicates(idCol)
        val model = spark.read.parquet(modelPath) // loud if absent: fit-first
        // first-run-only benign catch on the SCORED table (advice-r9 rule)
        val existing = readTableIfExists(spark, scoredPath)
        val fresh = existing match {
          case Some(s) =>
            batch.join(s.select(col(idCol)).distinct(), Seq(idCol), "left_anti")
          case None => batch
        }
        if (!fresh.isEmpty)
          graft.operators.Sharding.dsirScoreAgainstModel(fresh, model, idCol, textCol)
            .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(scoredPath)
      }
      .start()

  /** D2→C17d bridge — streaming Kneser–Ney LM scoring: each
    * micro-batch of new documents scores against the PERSISTED
    * [[graft.operators.TextAnalysis.knFit]] model (the one bigram
    * count table — fit once from the reference corpus, never touched
    * by the stream) through the production day-2 kernel
    * ([[graft.operators.TextAnalysis.knScoreAgainstModel]] — smoothed
    * continuation, all three unseen branches priced, model broadcast)
    * and APPENDS (doc_id, n_bigrams, kn_nll) to the scored table —
    * the continuously-maintained perplexity ranking the CCNet-style
    * selection thresholds downstream. Fit-first contract and
    * replay-idempotence exactly per [[dsirScoreStream]] (scores are
    * pure functions of (doc, frozen model): no stats row to heal). */
  def knScoreStream(docs: DataFrame, modelPath: String, scoredPath: String,
                    checkpointDir: String,
                    idCol: String = "doc_id", textCol: String = "text"):
      org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch0: DataFrame, _: Long) =>
        val spark = batch0.sparkSession
        val batch = batch0.dropDuplicates(idCol)
        val model = spark.read.parquet(modelPath) // loud if absent: fit-first
        val existing = readTableIfExists(spark, scoredPath)
        val fresh = existing match {
          case Some(s) =>
            batch.join(s.select(col(idCol)).distinct(), Seq(idCol), "left_anti")
          case None => batch
        }
        if (!fresh.isEmpty)
          graft.operators.TextAnalysis.knScoreAgainstModel(
              fresh, model, idCol, textCol)
            .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(scoredPath)
      }
      .start()

  /** D2→C17e bridge — [[knScoreStream]] at ORDER 3: each micro-batch
    * scores against the PERSISTED [[graft.operators.TextAnalysis.kn3Fit]]
    * trigram table through the production day-2 kernel
    * ([[graft.operators.TextAnalysis.kn3ScoreAgainstModel]] — every
    * backoff rung priced, model marginals broadcast) and appends
    * (doc_id, n_trigrams, kn3_nll). Fit-first contract and
    * replay-idempotence exactly per [[knScoreStream]]. */
  def kn3ScoreStream(docs: DataFrame, modelPath: String, scoredPath: String,
                     checkpointDir: String,
                     idCol: String = "doc_id", textCol: String = "text"):
      org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch0: DataFrame, _: Long) =>
        val spark = batch0.sparkSession
        val batch = batch0.dropDuplicates(idCol)
        val model = spark.read.parquet(modelPath) // loud if absent: fit-first
        val existing = readTableIfExists(spark, scoredPath)
        val fresh = existing match {
          case Some(s) =>
            batch.join(s.select(col(idCol)).distinct(), Seq(idCol), "left_anti")
          case None => batch
        }
        if (!fresh.isEmpty)
          graft.operators.TextAnalysis.kn3ScoreAgainstModel(
              fresh, model, idCol, textCol)
            .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(scoredPath)
      }
      .start()

  /** D2→C37 bridge — streaming Naive Bayes classification against the
    * PERSISTED model: each micro-batch of new documents scores through
    * the production kernel ([[graft.operators.Classify.nbScore]] —
    * one model join + broadcast constants grid) and appends its
    * (id, pred_label, score) verdicts. Fit-first contract (the
    * [[dsirScoreStream]] rule): a missing model fails LOUDLY — an
    * empty count frame is not a valid zero classifier. Day-2 model
    * GROWTH stays a batch concern
    * ([[graft.operators.Classify.mergeNbModels]] on the refit
    * cadence); this stream reads whatever model the paths currently
    * hold, so a hot-swapped merged model takes effect on the next
    * trigger.
    *
    * Replay-idempotent: already-scored ids anti-join away; scores are
    * pure functions of (doc, frozen model) — no stats row to heal.
    *
    * Returns the started query; callers own its lifecycle. */
  def nbScoreStream(docs: DataFrame, tokenCountsPath: String, classStatsPath: String,
                    scoredPath: String, checkpointDir: String,
                    idCol: String = "doc_id", textCol: String = "text"):
      org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch0: DataFrame, _: Long) =>
        val spark = batch0.sparkSession
        val batch = batch0.dropDuplicates(idCol)
        // loud if absent: fit-first
        val tokenCounts = spark.read.parquet(tokenCountsPath)
          .select(col("tok"), col("label"), col("c"))
        val classStats = spark.read.parquet(classStatsPath)
          .select(col("label"), col("n_docs"), col("n_tokens"))
        val existing = readTableIfExists(spark, scoredPath)
        val fresh = existing match {
          case Some(s) =>
            batch.join(s.select(col(idCol)).distinct(), Seq(idCol), "left_anti")
          case None => batch
        }
        if (!fresh.isEmpty)
          graft.operators.Classify.nbScore(fresh, tokenCounts, classStats, idCol, textCol)
            .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(scoredPath)
      }
      .start()

  /** D2→C49 bridge — streaming BPE length stats against the PERSISTED
    * merges table (round 12): each micro-batch of new documents
    * encodes through the production NATIVE kernel
    * ([[graft.operators.Bpe.encodeStats]] with `useKernel = true` —
    * the per-thread word cache makes streamed micro-batches of
    * Zipfian text nearly free) and appends its
    * (id, n_words, n_pieces, chars_per_piece) rows — the subword
    * counts the packing/budget stages consume. Tokenize-first contract
    * (the [[dsirScoreStream]] rule): a missing merges table fails
    * LOUDLY — an empty table is not a valid identity tokenizer.
    * A retrained table hot-swaps on the next trigger; already-written
    * stats are NOT rewritten (stats are pure functions of (doc, frozen
    * table), so re-encoding history is a batch backfill decision, not
    * a stream concern).
    *
    * Replay-idempotent: already-encoded ids anti-join away.
    *
    * Returns the started query; callers own its lifecycle. */
  def bpeStatsStream(docs: DataFrame, mergesPath: String, statsPath: String,
                     checkpointDir: String,
                     idCol: String = "doc_id", textCol: String = "text",
                     byteLevel: Boolean = false):
      org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch0: DataFrame, _: Long) =>
        val spark = batch0.sparkSession
        val batch = batch0.dropDuplicates(idCol)
        // loud if absent: train-first. The merges table is bounded by
        // contract (maxTrainMerges), so the collect is tiny.
        val merges = spark.read.parquet(mergesPath)
          .select(col("rank"), col("left"), col("right"))
          .orderBy(col("rank"))
          .collect().map(r => (r.getString(1), r.getString(2))).toSeq
        require(merges.nonEmpty,
          s"bpeStatsStream: merges table at $mergesPath is empty — train first " +
            "(an empty table is not a valid identity tokenizer)")
        val existing = readTableIfExists(spark, statsPath)
        val fresh = existing match {
          case Some(s) =>
            batch.join(s.select(col(idCol)).distinct(), Seq(idCol), "left_anti")
          case None => batch
        }
        if (!fresh.isEmpty)
          // byteLevel must match how the merges table was TRAINED — a
          // byte-space table applied char-level (or vice versa) would
          // silently merge nothing; the caller owns that pairing the
          // same way it owns the table path
          graft.operators.Bpe.encodeStats(fresh, merges, idCol, textCol,
            useKernel = true, byteLevel = byteLevel)
            .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(statsPath)
      }
      .start()

  /** D2v — streaming z-ordered LAYOUT ingest (E8 as a stream): each
    * micro-batch grids, routes and sorts under the layout's FROZEN
    * grid metadata through the production [[graft.sources.Layout.appendZOrdered]]
    * — the increment lands in exactly the zbucket directories a batch
    * append would give it, readers / zone maps / pruned scans are
    * unchanged mid-stream, and out-of-range rows clamp to edge cells
    * (the E8 trade: clustering, never correctness — run
    * `maintainZOrdered` on the schedule to heal accumulated drift).
    * Replay-idempotent per the postings convention, with the consult
    * BUCKET-PRUNED (round 16): the batch first routes onto the frozen
    * grid ([[graft.sources.Layout.routeZBuckets]]), and the anti-join
    * reads only the zbucket DIRECTORIES the batch touches — a
    * re-delivered row re-routes to the same bucket deterministically,
    * so the pruned consult is exact while its cost follows the batch's
    * bucket spread instead of the whole accreting layout (the D2
    * cost-class contract; the touched-bucket list is bounded by
    * 2^fileBits, the zone-map collect convention). */
  def zorderIngestStream(rows: DataFrame, layoutDir: String,
                         checkpointDir: String,
                         idCol: String = "doc_id"):
      org.apache.spark.sql.streaming.StreamingQuery =
    rows.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch0: DataFrame, _: Long) =>
        val spark = batch0.sparkSession
        val touched = graft.sources.Layout
          .routeZBuckets(spark, layoutDir, batch0)
          .select(col("zbucket")).distinct()
          .collect().map(_.getLong(0))
        val landed = spark.read.parquet(layoutDir)
          .filter(col("zbucket").cast("long").isin(touched: _*))
          .select(col(idCol)).distinct()
        val fresh = batch0.join(landed, Seq(idCol), "left_anti")
          .localCheckpoint()
        if (!fresh.isEmpty)
          graft.sources.Layout.appendZOrdered(spark, layoutDir, fresh)
      }
      .start()

  /** D2y — streaming MASTER ingest (C51b's stream form): each
    * micro-batch of raw WET chunks runs the ENTIRE day-2 curation
    * chain ([[graft.operators.Pipeline.masterIngestFull]]) against the
    * artifacts persisted at `artifactsDir`, appends every record's
    * fate row to `fatesTable`, and GROWS the map-side day-2 state
    * BEFORE the fates land (the append-before-accept rule every D2
    * twin follows), so the next micro-batch's probes see this one's
    * accepts:
    *
    *  - `eval_grams` — the batch's heldout docs' 13-grams (the leak
    *    firewall is CUMULATIVE across batches: an eval doc ingested at
    *    10:00 firewalls a train doc ingested at 10:05);
    *  - `exact_index` — fingerprints of every NEW clean text that
    *    reached the exact tier (a text accepted in batch N is an
    *    exact_dup_corpus verdict in batch N+1);
    *  - `url_index` — every new eligible canonical resource (a
    *    recrawl of a batch-N URL dedups in batch N+1).
    *
    * The heavy posting indexes (prefix, winnow) stay FROZEN intra-day
    * by design — their vocab-freeze/print-selection contracts make
    * probe exactness independent of growth, and the rebuild cadence
    * belongs to the scheduled maintenance pass
    * ([[graft.operators.Maintain]]'s jurisdiction), exactly how a
    * production corpus runs its nightly index rebuild.
    *
    * Replay-idempotent at the DELIVERY grain: a chunk whose records
    * already carry fates anti-joins away whole, so a replayed
    * micro-batch appends nothing — fates, grams, fingerprints or
    * URLs. */
  def masterIngestStream(chunks: DataFrame, artifactsDir: String,
                         fatesTable: String, checkpointDir: String,
                         blocklist: Seq[String],
                         splitSeed: Long, minWords: Int = 15,
                         maxWords: Int = 120, maxDupFrac: Double = 0.65,
                         jaccardTau: Double = 0.8,
                         winnowMinPrints: Long = 60L):
      org.apache.spark.sql.streaming.StreamingQuery =
    chunks.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch0: DataFrame, _: Long) =>
        import graft.operators.{Dedup, Pipeline, Urls}
        val spark = batch0.sparkSession
        import spark.implicits._
        val seen = spark.table(fatesTable)
          .select(shiftright(col("rec_id"), 32).as("chunk_id")).distinct()
        val batch = batch0.join(seen, Seq("chunk_id"), "left_anti")
          .localCheckpoint()
        if (!batch.isEmpty) {
          val art = Pipeline.loadMasterArtifacts(spark, artifactsDir)
          val r = Pipeline.masterIngestFull(batch, "chunk_id", "content",
            blocklist.toDF("pattern"), art, splitSeed,
            minWords, maxWords, maxDupFrac, jaccardTau, winnowMinPrints)
          val fates = r.fates.localCheckpoint()
          // each growth frame MATERIALIZES (localCheckpoint) before its
          // append lands (round-17 advice): the anti-join's right side
          // is a lazy read of the SAME directory the append targets,
          // and a write whose input plan still references its own
          // output path only works while file listing snapshots at
          // planning time — fragile across Spark versions and listing
          // strategies, so no write here targets a path a live plan
          // still reads
          // 1. eval grams: the batch's heldout 13-grams, new ones only
          //    — appended THROUGH the bundle's layout (bucketed on g
          //    when stamped; round 18), and the persisted census bumps
          //    by exactly the appended count (the anti-join makes the
          //    appended set genuinely new, so the bound stays exact)
          val newGrams = Dedup.buildEvalGramIndex(r.evalDocs)
            .join(art.evalGrams.select(col("g")), Seq("g"), "left_anti")
            .localCheckpoint()
          Pipeline.appendBundleMember(spark, artifactsDir, "eval_grams",
            newGrams)
          Dedup.bumpEvalGramCensus(spark, s"$artifactsDir/eval_grams",
            newGrams.count())
          // 2. exact fingerprints: every NEW text that reached the
          //    exact tier (corpus-dup texts already have their entry)
          val newTexts = r.cleaned.join(
            fates.filter(col("fate").isin("bad_envelope", "blocked",
              "url_dup_corpus", "url_dup_batch", "empty",
              "exact_dup_corpus")).select(col("rec_id").as("doc_id")),
            Seq("doc_id"), "left_anti")
          Pipeline.appendBundleMember(spark, artifactsDir, "exact_index",
            Dedup.buildExactIndex(newTexts, "doc_id", "clean_text")
              .join(art.exactIndex.select(col("fingerprint")),
                Seq("fingerprint"), "left_anti")
              .localCheckpoint())
          // 3. canonical URLs: every new eligible resource's keeper
          Pipeline.appendBundleMember(spark, artifactsDir, "url_index",
            Urls.buildUrlIndex(
                r.records.filter(col("_cat").isin("kept", "url_dup")),
                "rec_id", "uri")
              .join(art.urlIndex.select(col("canon_url")),
                Seq("canon_url"), "left_anti")
              .localCheckpoint())
          // 4. accept: fates land LAST — a crash above degrades to
          //    at-least-once state growth, never to a lost verdict
          fates.write.mode(org.apache.spark.sql.SaveMode.Append)
            .format("parquet").saveAsTable(fatesTable)
        }
      }
      .start()
}

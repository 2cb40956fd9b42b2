package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** C12 — multimodal binary columns: opaque `binary` payloads + typed
  * metadata, with decode/feature-extract plumbing.
  *
  * Design for 100 TB of media: payloads stay opaque `binary` columns in
  * parquet (never parsed by Catalyst); metadata (modality, byte size,
  * content hash, declared dims) are ordinary typed columns so pruning and
  * predicate pushdown work on them WITHOUT touching payload bytes. The
  * decode step runs batched per partition (`mapPartitions` — the Scala
  * twin of `mapInPandas` batch plumbing); actual image/audio codecs are
  * not in this container, so [[fakeDecode]] is a clearly-marked
  * deterministic stand-in with the real batch shape: Iterator[Row] in,
  * fixed-width feature vector out.
  */
object Multimodal {

  /** `q31_multimodal_meta` — binary payload metadata extraction: payload
    * bytes (UTF-8 of text as the deterministic stand-in blob), modality
    * from a round-robin assignment, octet length, sha256, and declared
    * width/height metadata. Map-only expression plan over the scan. */
  def multimodalMeta(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.documents
      .select(
        col("doc_id"),
        encode(col("text"), "UTF-8").as("payload"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("modality"))
      .select(
        col("doc_id"),
        col("modality"),
        octet_length(col("payload")).cast("long").as("n_bytes"),
        sha2(col("payload"), 256).as("content_sha256"),
        (lit(64) + (col("doc_id") % 16) * 32).cast("long").as("width"),
        (lit(64) + (col("doc_id") % 9) * 32).cast("long").as("height"))
      .orderBy(col("doc_id"))
  }

  /** Output schema of the decode stage: doc_id, modality, and a
    * fixed-width float feature vector (what a CLIP/CNN embedder or
    * mel-spectrogram featurizer would return per item). */
  val decodeSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("modality", StringType),
    StructField("features", ArrayType(FloatType, containsNull = false))))

  /** STUB DECODER — the image/audio codec libraries are not available in
    * this container, so the per-batch decode is a deterministic fake:
    * feature[i] = ((byte-sum of payload) * (i+1) mod 997) / 997. The
    * Spark-side plumbing is real: batched per-partition iteration (no
    * per-row task overhead), binary-in / fixed-width-vector-out, schema
    * declared up front — swap the body for a real codec unchanged.
    */
  def fakeDecode(df: DataFrame, featureDim: Int = 8): DataFrame = {
    val spark = df.sparkSession
    val rdd = df.select(col("doc_id").cast("long"), col("modality"), col("payload")).rdd
      .mapPartitions { rows =>
        // batch loop: a real decoder would hand `buf` to the codec as one
        // batch (the mapInPandas batch shape); the fake consumes it the
        // same way so the memory/batch profile is representative.
        rows.grouped(256).flatMap { buf =>
          buf.map { r =>
            val id = r.getLong(0)
            val mod = r.getString(1)
            val payload = r.getAs[Array[Byte]](2)
            var sum = 0L
            var i = 0
            while (i < payload.length) { sum += payload(i) & 0xff; i += 1 }
            val feats = Array.tabulate(featureDim)(j => ((sum * (j + 1)) % 997).toFloat / 997f)
            Row(id, mod, feats.toSeq)
          }
        }
      }
    spark.createDataFrame(rdd, decodeSchema)
  }

  /** STUB RESIZE — declared-dimension transform for image payloads: the
    * Spark-side contract is (payload, width, height) → (payload',
    * width', height') with aspect-preserving fit into a bounding box.
    * The codec is absent, so the payload passes through unchanged and
    * only the typed dimension metadata is recomputed — which is the part
    * Catalyst sees and prunes on. Pure column expressions, no shuffle. */
  def resizeMeta(df: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(
      lit(maxSide.toDouble) / col("width"),
      lit(maxSide.toDouble) / col("height"),
      lit(1.0))
    df.withColumn("resized_width", floor(col("width") * scale).cast("long"))
      .withColumn("resized_height", floor(col("height") * scale).cast("long"))
      .withColumn("resize_scale", round(scale, 4))
  }

  /** STUB FRAME SAMPLER — video payload → up to `maxFrames` evenly-spaced
    * frame records. The real sampler decodes container timestamps; the
    * fake derives a deterministic frame count from the payload size and
    * emits (doc_id, frame_idx, frame_ts_ms) rows via the same
    * explode-shaped plan a real sampler would use (row count multiplies,
    * payload bytes do NOT replicate per frame — only metadata explodes).
    */
  def sampleFrames(df: DataFrame, maxFrames: Int = 4, fpsMilli: Int = 40): DataFrame = {
    val nFrames = least((octet_length(col("payload")) % 7 + 1).cast("int"), lit(maxFrames))
    df.select(col("doc_id"), explode(sequence(lit(0), nFrames - 1)).as("frame_idx"))
      .withColumn("frame_ts_ms", col("frame_idx").cast("long") * fpsMilli)
  }

  /** Full decode pipeline: payload column → batched stub decode →
    * features. Used by MultimodalSpec; `q31` exposes the metadata half. */
  def decodeFeatures(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val withPayload = t.documents.select(
      col("doc_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("modality"),
      encode(col("text"), "UTF-8").as("payload"))
    fakeDecode(withPayload)
  }
}

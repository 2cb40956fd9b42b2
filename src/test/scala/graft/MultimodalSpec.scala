package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpecBase {
  import spark.implicits._

  test("decode plumbing: batched, deterministic, fixed-width features") {
    val df = Seq(
      (0L, "image", "hello".getBytes("UTF-8")),
      (1L, "audio", "world!".getBytes("UTF-8"))
    ).toDF("doc_id", "modality", "payload")
    val out = Multimodal.fakeDecode(df, featureDim = 8)
    val rows = out.select("doc_id", "features").as[(Long, Seq[Float])].collect().sortBy(_._1)
    assert(rows.forall(_._2.length == 8))
    // deterministic: same payload → same features across runs
    val again = Multimodal.fakeDecode(df, featureDim = 8)
      .select("doc_id", "features").as[(Long, Seq[Float])].collect().sortBy(_._1)
    assert(rows.toSeq == again.toSeq)
    // hand-check doc 0: byte-sum("hello") = 532; f(j) = (532*(j+1) % 997)/997
    val sum = "hello".getBytes("UTF-8").map(_ & 0xff).sum
    val expected = (0 until 8).map(j => ((sum.toLong * (j + 1)) % 997).toFloat / 997f)
    assert(rows(0)._2 == expected)
  }

  test("resize stub preserves aspect ratio and never upscales") {
    val df = Seq((1L, 640L, 480L), (2L, 100L, 50L)).toDF("doc_id", "width", "height")
      .withColumn("payload", lit(Array[Byte](1, 2)))
    val out = Multimodal.resizeMeta(df, maxSide = 320)
      .select("doc_id", "resized_width", "resized_height").as[(Long, Long, Long)]
      .collect().sortBy(_._1)
    assert(out(0) == ((1L, 320L, 240L)))   // downscaled, aspect kept
    assert(out(1) == ((2L, 100L, 50L)))    // already small — untouched
  }

  test("frame sampler explodes metadata rows, bounded by maxFrames") {
    val df = Seq((1L, "abcdefgh".getBytes), (2L, "ab".getBytes)).toDF("doc_id", "payload")
    val out = Multimodal.sampleFrames(df, maxFrames = 3)
      .select("doc_id", "frame_idx", "frame_ts_ms").as[(Long, Int, Long)].collect()
    val byDoc = out.groupBy(_._1)
    assert(byDoc.values.forall(_.length <= 3))
    assert(byDoc.values.forall(fs => fs.map(_._2).sorted.sameElements(fs.indices)))
    assert(out.forall { case (_, idx, ts) => ts == idx * 40L })
  }

  test("q31 metadata stays typed and payload-independent sizes line up") {
    val out = Multimodal.multimodalMeta(spark, sfDir)
    val docs = Tables(spark, sfDir).documents.count()
    assert(out.count() == docs)
    assert(out.filter(!col("modality").isin("image", "audio", "video")).count() == 0)
    // n_bytes must equal UTF-8 length of the text payload
    val bad = out.join(Tables(spark, sfDir).documents, "doc_id")
      .filter(col("n_bytes") =!= octet_length(col("text"))).count()
    assert(bad == 0)
  }
}

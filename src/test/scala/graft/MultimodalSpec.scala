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

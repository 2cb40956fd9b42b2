package graft

import org.apache.spark.sql.functions._

import graft.operators.Pipeline

class PipelineSpec extends SparkSpecBase {
  import spark.implicits._

  test("curation report: strip uncovers template-hidden dups, gate splits survivors, counts are disjoint") {
    def body(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val pages = Seq(
      // domain a: header on every page (stripped), one dup pair under
      // DIFFERENT headers, one too-short body, one good body
      (1L, "a", s"HDR-A\n${body(50)}"),
      (2L, "a", s"HDR-A\n${body(50)}"),      // dup of 1 after strip
      (3L, "a", s"HDR-A\n${body(3)}"),       // survivor, fails the gate
      (4L, "a", s"HDR-A\n${body(60)}"),
      // domain b: only 2 pages → HDR-B is BELOW the census threshold,
      // stays in the text and pads the word count
      (5L, "b", s"HDR-B\n${body(41)}"),
      (6L, "b", s"HDR-B\n${body(300)}")      // fails the max gate
    ).toDF("doc_id", "domain", "text")
    val out = Pipeline.curationReport(pages, "doc_id", "domain", "text")
      .orderBy(col("domain"))
      .as[(String, Long, Long, Long, Long, Long)].collect().toList
    assert(out === List(
      ("a", 4L, 1L, 1L, 2L, 110L),
      // HDR-B survives (2 docs < 3): bodies carry +1 word each
      ("b", 2L, 0L, 1L, 1L, 42L)))
    // disjoint audit: columns sum to n_pages
    out.foreach { case (d, n, dup, fail, kept, _) =>
      assert(dup + fail + kept === n, s"domain $d counts overlap") }
    intercept[IllegalArgumentException] {
      Pipeline.curationReport(pages, "doc_id", "domain", "text",
        minWords = 10, maxWords = 5)
    }
  }

  test("q116 entry: planted donors dedup through the templates, every domain reports") {
    val out = Pipeline.curationPipelineDocs(spark, sfDir)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(out.length === 20)
    assert(out.map(_._3).sum > 0, "donor planting must produce dups")
    assert(out.map(_._4).sum > 0, "the corpus short tail must fail the gate")
    assert(out.map(_._5).sum > 0, "kept pages must exist")
    out.foreach { case (d, n, dup, fail, kept, _) =>
      assert(dup + fail + kept === n, s"domain $d counts overlap") }
  }
}

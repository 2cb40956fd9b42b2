package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

class WinnowSpec extends SparkSpecBase {
  import spark.implicits._

  // deterministic junk with no shared 12-grams across calls
  private def junk(seed: String, words: Int): String =
    (0 until words).map(i =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"$seed:$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(10)).mkString(" ")

  test("winnowFingerprints: every window covered (max gap <= w), density well under 1, short docs drop") {
    val docs = Seq((1L, junk("a", 60)), (2L, "tiny")).toDF("doc_id", "text")
    val fp = Dedup.winnowFingerprints(docs, k = 12, w = 4)
      .select(col("doc_id"), col("pos")).as[(Long, Long)].collect()
    assert(fp.forall(_._1 == 1L), "the 4-char doc has no window and must drop")
    val pos = fp.map(_._2).sorted
    assert(pos.nonEmpty && pos.head <= 4,
      s"the first window [1,4] must hold a selection, got head ${pos.headOption}")
    // the winnowing guarantee: each window of w starts holds >= 1
    // selected gram -> consecutive selections gap by at most w
    pos.sliding(2).foreach(p =>
      assert(p.last - p.head <= 4, s"gap ${p.head}->${p.last} exceeds w"))
    // and the point of the algorithm: far fewer fingerprints than grams
    val nGrams = junk("a", 60).length - 11
    assert(pos.length < nGrams / 2,
      s"selected ${pos.length} of $nGrams grams — no compression")
  }

  test("winnowOverlap: identical docs fully overlap, a shared span is found, disjoint docs are silent") {
    val shared = junk("span", 12) // ~130 chars >> k + w
    val docs = Seq(
      (1L, junk("x", 40)),
      (2L, junk("x", 40)),                           // exact copy of 1
      (3L, junk("p", 20) + " " + shared + " " + junk("q", 20)), // span donor
      (4L, junk("r", 20) + " " + shared + " " + junk("s", 20)), // span sharer
      (5L, junk("z", 40))                            // unrelated
    ).toDF("doc_id", "text")
    val pairs = Dedup.winnowOverlap(docs, minShared = 1L)
      .as[(Long, Long, Long)].collect().map(p => (p._1, p._2) -> p._3).toMap
    val nFp1 = Dedup.winnowFingerprints(docs.filter(col("doc_id") === 1))
      .select("h").distinct().count()
    assert(pairs((1L, 2L)) == nFp1,
      s"exact copies must share their whole set: ${pairs((1L, 2L))} vs $nFp1")
    assert(pairs.contains((3L, 4L)) && pairs((3L, 4L)) >= 3,
      s"the planted span must surface: ${pairs.get((3L, 4L))}")
    // interior fingerprints of a long shared span select identically
    // on both sides, so the pair carries MOST of the span's prints
    assert(!pairs.contains((1L, 5L)) && !pairs.contains((2L, 5L)),
      "disjoint junk must not pair")
    intercept[IllegalArgumentException] {
      Dedup.winnowOverlap(docs, minShared = 0L)
    }
    intercept[IllegalArgumentException] {
      Dedup.winnowFingerprints(docs, k = 1)
    }
    intercept[IllegalArgumentException] {
      Dedup.winnowFingerprints(docs, w = 70)
    }
  }

  test("q151 entry: donor-planted copies clear the gate with substantial shared counts") {
    val out = Dedup.winnowOverlapDocs(spark, sfDir)
      .as[(Long, Long, Long)].collect()
    assert(out.nonEmpty)
    // every planted pair (d-4, d) for d % 10 == 9 shares the full set
    val planted = out.filter { case (a, b, _) => b - a == 4 && b % 10 == 9 }
    assert(planted.nonEmpty, "donor pairs must surface")
    assert(planted.forall(_._3 >= 8), "full copies carry >= minShared prints")
    // sorted output, a < b throughout
    assert(out.forall { case (a, b, _) => a < b })
  }
}

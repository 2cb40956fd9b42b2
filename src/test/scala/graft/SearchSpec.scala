package graft

import graft.operators.Search
import org.apache.spark.sql.functions._

class SearchSpec extends SparkSpecBase {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "cat cat dog"),
    (2L, "cat fish"),
    (3L, "bird")
  ).toDF("doc_id", "text")

  test("BM25 scores match the hand-computed Okapi formula exactly") {
    val (postings, stats) = Search.buildPostings(corpus)
    val out = Search.bm25Search(postings, stats, Seq("cat"), k = 10)
      .as[(Long, Long, Double)].collect().toSeq
    // N=3, avgdl=2.0, df(cat)=2, idf=ln(1 + 1.5/2.5)
    val idf = math.log(1.0 + (3 - 2 + 0.5) / (2 + 0.5))
    def c(tf: Int, dl: Int) =
      idf * (tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / 2.0))
    def grid(x: Double) =
      BigDecimal(math.round(x * 1e8).toDouble / 1e8 + 1e-9)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.map(r => (r._2, r._3)) == Seq(
      (1L, grid(c(2, 3))), (2L, grid(c(1, 2)))),
      s"got $out")
    assert(out.map(_._1) == Seq(1L, 2L), "ranks are contiguous from 1")
  }

  test("BM25 multi-term queries add contributions; unmatched docs never appear") {
    val docs = Seq(
      (1L, "spark streaming joins"),
      (2L, "spark window functions window"),
      (3L, "pandas dataframe")
    ).toDF("doc_id", "text")
    val (postings, stats) = Search.buildPostings(docs)
    val out = Search.bm25Search(postings, stats, Seq("spark", "window"), k = 10)
      .as[(Long, Long, Double)].collect().toSeq
    assert(out.map(_._2).toSet == Set(1L, 2L), "doc 3 matches nothing")
    assert(out.head._2 == 2L,
      "two matched terms (one twice) must outrank a single match")
  }

  test("BM25 duplicate query terms count once; unknown terms contribute nothing") {
    val (postings, stats) = Search.buildPostings(corpus)
    val once = Search.bm25Search(postings, stats, Seq("cat"), k = 10)
      .as[(Long, Long, Double)].collect().toSeq
    val dup = Search.bm25Search(postings, stats, Seq("cat", "CAT", " cat "), k = 10)
      .as[(Long, Long, Double)].collect().toSeq
    val extra = Search.bm25Search(postings, stats, Seq("cat", "zzz_absent"), k = 10)
      .as[(Long, Long, Double)].collect().toSeq
    assert(dup == once, "set semantics over normalized query terms")
    assert(extra == once, "an absent term has no postings and changes nothing")
  }

  test("BM25 rarer terms weigh more at equal tf and dl") {
    val docs = Seq(
      (1L, "rare common"),
      (2L, "dull common"),
      (3L, "dull other")
    ).toDF("doc_id", "text")
    val (postings, stats) = Search.buildPostings(docs)
    def score(term: String) = Search.bm25Search(postings, stats, Seq(term), k = 10)
      .filter(col("doc_id") === 1L).select(col("score")).as[Double].head()
    assert(score("rare") > score("common"),
      "df=1 term must outscore df=2 term for the same doc")
  }

  test("BM25 day-2 append equals the from-scratch rebuild bit-exactly") {
    val docs = Tables(spark, "/root/testdata/sf0.001").documents
    val (fullP, fullS) = Search.buildPostings(docs)
    val (p1, s1) = Search.buildPostings(docs.filter(col("doc_id") % 3 =!= 0))
    val (pm, sm) = Search.appendToPostings(docs.filter(col("doc_id") % 3 === 0), p1, s1)
    assert(sm.as[(Long, Long)].head() == fullS.as[(Long, Long)].head(),
      "stats must add as exact longs")
    for (q <- Seq(Seq("data"), Seq("spark", "table"))) {
      val fromScratch = Search.bm25Search(fullP, fullS, q, k = 50)
        .as[(Long, Long, Double)].collect().toSeq
      val appended = Search.bm25Search(pm, sm, q, k = 50)
        .as[(Long, Long, Double)].collect().toSeq
      assert(appended == fromScratch, s"query $q diverged after append")
    }
  }

  test("positional day-2 append equals the from-scratch rebuild bit-exactly; phrase search identical") {
    val docs = Tables(spark, "/root/testdata/sf0.001").documents
    val full = Search.buildPositionalPostings(docs)
    val indexed = Search.buildPositionalPostings(docs.filter(col("doc_id") % 3 =!= 0))
    val extended = Search.appendToPositionalPostings(
      docs.filter(col("doc_id") % 3 === 0), indexed)
    // row-level bit-exactness: same (term, doc, positions) set
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(String, Long, Seq[Long])].collect().toSet
    assert(rows(extended) == rows(full),
      "appended positional index must equal the full rebuild row-for-row")
    // and the searched artifact answers identically
    for (phrase <- Seq(Seq("table", "hash"), Seq("the"), Seq("a", "b", "a"))) {
      val fromScratch = Search.phraseSearch(full, phrase, k = 30)
        .as[(Long, Long, Long)].collect().toSeq
      val appended = Search.phraseSearch(extended, phrase, k = 30)
        .as[(Long, Long, Long)].collect().toSeq
      assert(appended == fromScratch, s"phrase $phrase diverged after append")
    }
  }

  test("phrase search counts consecutive-position matches exactly") {
    val docs = Seq(
      (1L, "a b a b a"),    // "a b" twice, "b a" twice
      (2L, "a x b"),        // terms present, never adjacent
      (3L, "b a"),          // reversed only
      (4L, "a a a")         // repeated-term phrase territory
    ).toDF("doc_id", "text")
    val pos = Search.buildPositionalPostings(docs)
    def run(phrase: Seq[String]) = Search.phraseSearch(pos, phrase, k = 10)
      .as[(Long, Long, Long)].collect().toSeq.map(r => (r._2, r._3))
    assert(run(Seq("a", "b")) == Seq((1L, 2L)),
      "docs 2 (non-adjacent) and 3 (reversed) must not match")
    assert(run(Seq("b", "a")) == Seq((1L, 2L), (3L, 1L)))
    assert(run(Seq("a", "a")) == Seq((4L, 2L)), "overlapping repeats both count")
    assert(run(Seq("a")) == Seq((1L, 3L), (4L, 3L), (2L, 1L), (3L, 1L)),
      "single-term phrase ranks by term frequency, ties by doc_id")
    assert(run(Seq("a", "b", "a")) == Seq((1L, 2L)), "three-term phrase chains")
    assert(run(Seq("zzz")) == Seq())
  }

  test("BM25 refuses blank-only queries loudly (normalized-terms guard)") {
    val (postings, stats) = Search.buildPostings(corpus)
    // whitespace-only queries normalize to nothing — must throw, not
    // return a silently empty frame (the phraseSearch convention)
    val e = intercept[IllegalArgumentException] {
      Search.bm25Search(postings, stats, Seq("  ", "\t"), k = 10)
    }
    assert(e.getMessage.contains("non-blank"))
  }

  test("BM25 top-k is a distributed TakeOrdered, not a global rank window over matches") {
    val (postings, stats) = Search.buildPostings(corpus)
    val plan = Search.bm25Search(postings, stats, Seq("cat"), k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected sort+limit top-k, got:\n$plan")
  }

  test("hybrid RRF fuses leg ranks with exact integer scores and honest sentinels") {
    val docs = Tables(spark, sfDir).documents
    val out = Search.hybridRrfSearch(docs, Seq("spark", "window", "batch"),
      k = 20, legK = 30).as[(Long, Long, Long, Long, Long)].collect()
    assert(out.length === 20)
    assert(out.map(_._1).toSeq === (1L to 20L), "dense rank sequence")
    def leg(r: Long) = if (r == -1L) 0L else math.floor(1.0e12 / (60 + r)).toLong
    out.foreach { case (_, id, score, br, dr) =>
      assert(score === leg(br) + leg(dr), s"doc $id RRF arithmetic")
      assert(br != -1L || dr != -1L, s"doc $id fused from no leg")
    }
    // fused order: score desc, doc_id asc — and the top doc must sit in
    // BOTH legs (a single leg's best possible score, floor(1e12/61),
    // is below any two-leg sum)
    assert(out.sliding(2).forall { case Array(a, b) =>
      a._3 > b._3 || (a._3 == b._3 && a._2 < b._2) },
      "fused ordering broken")
    assert(out.head._4 != -1L && out.head._5 != -1L,
      "top fused doc should appear in both legs for this corpus")
  }

  test("hybrid RRF refuses bad parameters loudly") {
    val docs = Tables(spark, sfDir).documents
    intercept[IllegalArgumentException] {
      Search.hybridRrfSearch(docs, Seq("spark"), k = 20, legK = 10)
    }
    intercept[IllegalArgumentException] {
      Search.hybridRrfSearch(docs, Seq("spark"), k = 0)
    }
    intercept[IllegalArgumentException] {
      Search.hybridRrfSearch(docs, Seq("spark"), rrfK = 0)
    }
  }
}

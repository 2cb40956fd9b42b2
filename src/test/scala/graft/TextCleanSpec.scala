package graft

import graft.operators.TextClean
import org.apache.spark.sql.functions._

/** Planted-truth coverage for the corpus-cleaning operators: the q49/q50
  * query entries plant synthetic PII/markup from doc_id for the oracle
  * hash check; these specs pin the exact detection/redaction semantics
  * on adversarial hand-built strings the synthetic tables can't contain.
  */
class TextCleanSpec extends SparkSpecBase {

  test("piiRedact counts and redacts each pattern, placeholders never cascade") {
    import spark.implicits._
    val docs = Seq(
      // two emails, one IP, phone AND ssn side by side
      (1L, "mail a.b+c@ex-corp.org and X@Y.IO srv 192.168.0.1 call 555-123-4567 id 123-45-6789"),
      // decimals and short digit runs must NOT trip the IP/phone patterns
      (2L, "pi is 3.14 and 1.2.3 is a version; dial 12-345-6789 maybe"),
      (3L, "nothing sensitive here at all")
    ).toDF("doc_id", "text")
    val out = TextClean.piiRedact(docs, "text")
      .select("doc_id", "n_emails", "n_ips", "n_phones", "n_ids", "redacted")
      .as[(Long, Long, Long, Long, Long, String)].collect().sortBy(_._1)

    val r1 = out(0)
    assert((r1._2, r1._3, r1._4, r1._5) == ((2L, 1L, 1L, 1L)), s"row1 counts: $r1")
    assert(r1._6 ==
      "mail [EMAIL] and [EMAIL] srv [IP] call [PHONE] id [ID]")
    val r2 = out(1)
    assert((r2._2, r2._3, r2._4, r2._5) == ((0L, 0L, 0L, 0L)),
      s"decimals/version strings/2-digit groups are not PII: $r2")
    assert(r2._6 == "pi is 3.14 and 1.2.3 is a version; dial 12-345-6789 maybe")
    val r3 = out(2)
    assert(r3._6 == "nothing sensitive here at all" && r3._2 == 0L)
  }

  test("piiRedact phone (3-3-4) and ssn (3-2-4) groupings stay disjoint") {
    import spark.implicits._
    val out = TextClean.piiRedact(
      Seq((1L, "555-123-4567 then 555-12-4567")).toDF("doc_id", "text"), "text")
      .select("n_phones", "n_ids", "redacted")
      .as[(Long, Long, String)].head()
    assert(out == ((1L, 1L, "[PHONE] then [ID]")))
  }

  test("htmlStrip drops tags, unescapes entities in order, keeps encoded brackets as content") {
    import spark.implicits._
    val docs = Seq(
      (1L, "<p class=\"x\">Hello&nbsp;world</p><br/>&amp;lt; <b>bold</b> &quot;q&quot; &#39;a&#39;"),
      (2L, "plain text, no markup"),
      (3L, "  spaced   <i> out </i>   text  ")
    ).toDF("doc_id", "text")
    val out = TextClean.htmlStrip(docs, "text")
      .select("doc_id", "n_tags", "clean_text", "clean_chars")
      .as[(Long, Long, String, Long)].collect().sortBy(_._1)

    // &amp;lt; unescapes (amp LAST) to the literal string "&lt;" — the
    // double-encoded bracket is CONTENT and must survive the strip
    assert(out(0)._2 == 5L, "p + /p + br + b + /b = 5 tags")
    assert(out(0)._3 == "Hello world &lt; bold \"q\" 'a'", s"got: '${out(0)._3}'")
    assert(out(0)._4 == out(0)._3.length.toLong)
    assert(out(1)._2 == 0L && out(1)._3 == "plain text, no markup")
    assert(out(2)._3 == "spaced out text", "whitespace collapses and trims")
  }

  test("q49/q50 planted query entries produce one hit per pattern per row") {
    import spark.implicits._
    val pii = TextClean.piiRedactDocs(spark, sfDir)
    val bad = pii.filter(col("n_emails") =!= 1 || col("n_ips") =!= 1 ||
      col("n_phones") =!= 1 || col("n_ids") =!= 1).count()
    assert(bad == 0L, "every planted row carries exactly one of each PII kind")
    assert(pii.filter(col("redacted").contains("[EMAIL]") &&
      col("redacted").contains("[IP]") && col("redacted").contains("[PHONE]") &&
      col("redacted").contains("[ID]")).count() == pii.count())

    val html = TextClean.htmlStripDocs(spark, sfDir)
    assert(html.filter(col("n_tags") =!= 6).count() == 0L,
      "div + p + /p + a + /a + /div = 6 planted tags per row")
    assert(html.filter(col("clean_text").contains("<") &&
      !col("clean_text").contains("<end>")).count() == 0L,
      "only the entity-encoded bracket content survives")
  }

  test("lineFilter applies each C4/RefinedWeb rule independently, map-only") {
    import spark.implicits._
    val page = Seq(
      "This line is real content and it survives the filter.", // kept
      "Short one.",                                 // < 3 words
      "no terminal punctuation on this line",       // punct rule
      "Please enable JavaScript to continue here.", // phrase (case-insensitive)
      "We use cookies on this site, accept now.",   // phrase inside a word run
      "THIS ENTIRE LINE IS SHOUTING AT YOU NOW!",   // uppercase ratio
      "   ",                                        // blank: not a line at all
      "A second honest sentence also makes it through?" // kept ('?' terminal)
    ).mkString("\n")
    val out = TextClean.lineFilter(Seq((1L, page)).toDF("id", "text"), "text")
    val row = out.select("n_lines", "n_kept", "clean_text").head()
    assert(row.getLong(0) == 7L, "blank lines never count")
    assert(row.getLong(1) == 2L, s"exactly the two content lines survive: ${row.getString(2)}")
    assert(row.getString(2) ==
      "This line is real content and it survives the filter.\n" +
      "A second honest sentence also makes it through?")

    // boundary: uppercase ratio compares as exact integers (≤, not <)
    val edge = "AAAA ab cd." // 4 upper of 11 chars → 400 ≤ 440 keeps at 40%
    assert(TextClean.lineFilter(Seq((1L, edge)).toDF("id", "text"), "text")
      .head().getAs[Long]("n_kept") == 1L)
    val over = "AAAAA b cd." // 5 of 11 → 500 > 440 drops
    assert(TextClean.lineFilter(Seq((1L, over)).toDF("id", "text"), "text")
      .head().getAs[Long]("n_kept") == 0L)

    // all-boilerplate pages survive with empty text, not a lost row
    val gone = TextClean.lineFilter(Seq((1L, "Click here.")).toDF("id", "text"), "text")
    assert(gone.count() == 1L && gone.head().getAs[String]("clean_text") == "")

    // stateless scale shape: a single projection, no Exchange anywhere
    val plan = TextClean.lineFilter(
      Tables(spark, sfDir).documents, "text").queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"line filter must not shuffle:\n${plan.take(600)}")

    intercept[IllegalArgumentException] {
      TextClean.lineFilter(Seq((1L, "x")).toDF("id", "text"), "text", minWords = 0)
    }
    intercept[IllegalArgumentException] {
      TextClean.lineFilter(Seq((1L, "x")).toDF("id", "text"), "text", maxUpperPct = 101)
    }
  }

  test("dedupLinesWithin keeps first occurrences in order, trims before matching, map-only") {
    import spark.implicits._
    val page = Seq(
      "the banner line",            // kept (first)
      "real content sentence one",  // kept
      "  the banner line  ",        // repeat (trimmed match) → dropped
      "real content sentence two",  // kept
      "the banner line",            // repeat → dropped
      "   ",                        // blank: not a line at all
      "real content sentence one"   // repeat of line 2 → dropped
    ).mkString("\n")
    val out = TextClean.dedupLinesWithin(Seq((1L, page)).toDF("id", "text"), "text")
    val row = out.select("n_lines", "n_kept", "clean_text").head()
    assert(row.getLong(0) == 6L, "blank lines never count")
    assert(row.getLong(1) == 3L, s"one copy of each line survives: ${row.getString(2)}")
    assert(row.getString(2) ==
      "the banner line\nreal content sentence one\nreal content sentence two",
      "document order is the first-occurrence order")

    // a page with no repeats passes through trimmed-identical
    val clean = TextClean.dedupLinesWithin(
      Seq((1L, "alpha one\nbeta two")).toDF("id", "text"), "text").head()
    assert(clean.getAs[String]("clean_text") == "alpha one\nbeta two" &&
      clean.getAs[Long]("n_kept") == 2L)

    // stateless scale shape: a single projection, no Exchange anywhere
    val plan = TextClean.dedupLinesWithin(
      Tables(spark, sfDir).documents, "text").queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"line dedup must not shuffle:\n${plan.take(600)}")
  }

  test("fixMojibake repairs every table entry, counts sequentially, map-only") {
    import spark.implicits._
    // one instance of every artifact, built FROM the table itself so
    // the test can never drift from the constant
    val allBad = TextClean.mojibakeFixes.map(_._1).mkString(" ")
    val allGood = TextClean.mojibakeFixes.map(_._2).mkString(" ")
    val all = TextClean.fixMojibake(Seq((1L, allBad)).toDF("id", "text"), "text").head()
    assert(all.getAs[Long]("n_fixes") == TextClean.mojibakeFixes.size.toLong,
      s"each artifact must count once: $all")
    assert(all.getAs[String]("fixed_text") == allGood)

    // clean text is untouched, zero fixes
    val clean = TextClean.fixMojibake(
      Seq((1L, "plain ascii text stays put.")).toDF("id", "text"), "text").head()
    assert(clean.getAs[Long]("n_fixes") == 0L)
    assert(clean.getAs[String]("fixed_text") == "plain ascii text stays put.")

    // multiplicity: the same artifact thrice counts thrice
    val thrice = TextClean.fixMojibake(
      Seq((1L, "cafÃ© cafÃ© cafÃ©")).toDF("id", "text"), "text").head()
    assert(thrice.getAs[Long]("n_fixes") == 3L)
    assert(thrice.getAs[String]("fixed_text") == "café café café")

    // the invisible-tail artifact (mangled ” = â€ + U+009D) repairs too
    val ninetyD = TextClean.fixMojibake(
      Seq((1L, "quoteâ€\u009dend")).toDF("id", "text"), "text").head()
    assert(ninetyD.getAs[String]("fixed_text") == "quote”end"
      && ninetyD.getAs[Long]("n_fixes") == 1L)

    // the planted query entry: even ids carry exactly 8 fixes, odd 0
    val q = TextClean.fixMojibakeDocs(spark, sfDir)
    assert(q.filter(col("doc_id") % 2 === 0 && col("n_fixes") =!= 8).count() == 0L)
    assert(q.filter(col("doc_id") % 2 === 1 && col("n_fixes") =!= 0).count() == 0L)
    assert(q.filter(col("fixed_text").contains("café — it's déjà vu «again» soon…"))
      .count() == q.filter(col("doc_id") % 2 === 0).count())

    // stateless scale shape
    val plan = TextClean.fixMojibake(Tables(spark, sfDir).documents, "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"mojibake repair must not shuffle:\n${plan.take(600)}")
  }

  test("boilerplate strip: site-repeated lines removed, rare and unique lines kept, order preserved") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a.com", "MENU\nunique one\nRARE\nFOOTER"),
      (2L, "a.com", "MENU\nunique two\nFOOTER"),
      (3L, "a.com", "MENU\nunique three\nRARE\nFOOTER"),
      (4L, "b.com", "MENU\nother site body") // MENU repeats only per-domain: kept on b.com
    ).toDF("doc_id", "domain", "text")
    val out = TextClean.boilerplateStrip(docs, "doc_id", "domain", "text")
      .select("doc_id", "n_lines", "n_removed", "clean_text")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toList
    assert(out === List(
      (1L, 4L, 2L, "unique one\nRARE"),   // RARE in 2 docs < minDocs=3 → kept
      (2L, 3L, 2L, "unique two"),
      (3L, 4L, 2L, "unique three\nRARE"),
      (4L, 2L, 0L, "MENU\nother site body")))
    // a doc repeating a line internally counts ONE doc in the census
    val rep = Seq(
      (1L, "c.com", "X\nX\nbody1"), (2L, "c.com", "X\nbody2")
    ).toDF("doc_id", "domain", "text")
    val kept = TextClean.boilerplateStrip(rep, "doc_id", "domain", "text")
      .select("clean_text").as[String].collect().toSet
    assert(kept === Set("X\nX\nbody1", "X\nbody2"),
      "2 distinct docs < minDocs → X survives even when repeated within a doc")
    // blank lines are census-exempt (paragraph breaks survive) but
    // boilerplate around them still strips
    val blanky = Seq(
      (1L, "d", "HDR\n\nbody1"), (2L, "d", "HDR\n\nbody2"), (3L, "d", "HDR\n\nbody3")
    ).toDF("doc_id", "domain", "text")
    val b = TextClean.boilerplateStrip(blanky, "doc_id", "domain", "text")
      .filter(col("doc_id") === 1L).select("clean_text").as[String].head()
    assert(b === "\nbody1")
    intercept[IllegalArgumentException] {
      TextClean.boilerplateStrip(docs, "doc_id", "domain", "text", minDocs = 1)
    }
    // the corpus never shuffles: the only exchanges belong to the line
    // census; the strip side is a broadcast join + higher-order filter
    val plan = TextClean.boilerplateStrip(docs, "doc_id", "domain", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"boilerplate sets must broadcast back:\n${plan.take(600)}")
  }

  test("line census: merge over disjoint doc sets equals rebuild; day-2 probe honors batch-only lines") {
    import spark.implicits._
    def page(id: Long, dom: String, body: String) =
      (id, dom, s"HDR-$dom\n$body")
    val a = Seq(page(1, "x", "b1"), page(2, "x", "b2")).toDF("doc_id", "domain", "text")
    val b = Seq(page(3, "x", "b3"), page(4, "y", "b4")).toDF("doc_id", "domain", "text")
    val merged = TextClean.mergeLineCensus(
      TextClean.buildLineCensus(a, "doc_id", "domain", "text"),
      TextClean.buildLineCensus(b, "doc_id", "domain", "text"))
    val rebuilt = TextClean.buildLineCensus(a.unionByName(b), "doc_id", "domain", "text")
    assert(merged.as[(String, String, Long)].collect().toSet ===
      rebuilt.as[(String, String, Long)].collect().toSet)
    // probe: HDR-x has 3 corpus docs → stripped from a new batch page;
    // the batch's own new line (never censused) survives
    val batch = Seq((10L, "x", "HDR-x\nfresh body\nNEW-LINE")).toDF("doc_id", "domain", "text")
    val out = TextClean.stripAgainstCensus(batch, merged, "domain", "text")
      .select("clean_text").as[String].head()
    assert(out === "fresh body\nNEW-LINE")
    intercept[IllegalArgumentException] {
      TextClean.stripAgainstCensus(batch, merged.drop("n_docs"), "domain", "text")
    }
  }
}

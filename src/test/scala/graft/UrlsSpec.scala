package graft

import graft.operators.{Dedup, Urls}
import org.apache.spark.sql.functions._

/** Planted-truth coverage for the web-provenance curation family: URL
  * canonicalization rules on adversarial hand-built URLs (the q105
  * planted corpus can't mix schemes without splitting its dup groups,
  * so the http `:80` rule and the scheme-preservation contract live
  * here), the canonical-URL dedup election, the domain-reputation
  * gate's three integer-exact rules at their boundaries, and the
  * exact-tier day-2 probe's replay idempotence.
  */
class UrlsSpec extends SparkSpecBase {

  private def canon(url: String): String = {
    import spark.implicits._
    Seq(url).toDF("u").select(Urls.canonicalizeUrl(col("u")).as("c"))
      .as[String].head()
  }

  test("canonicalizeUrl: case, www, default ports, fragment, slashes, tracking params") {
    // scheme+host lowercase, www strip, PATH case preserved
    assert(canon("HTTPS://WWW.Ex.COM/A/B") === "https://ex.com/A/B")
    // default ports strip per scheme; non-default ports survive
    assert(canon("http://ex.com:80/a") === "http://ex.com/a")
    assert(canon("https://ex.com:443/a") === "https://ex.com/a")
    assert(canon("https://ex.com:8443/a") === "https://ex.com:8443/a")
    assert(canon("http://ex.com:443/a") === "http://ex.com:443/a",
      ":443 is NOT http's default — must survive")
    // scheme preserved: http and https never conflate
    assert(canon("http://ex.com/a") !== canon("https://ex.com/a"))
    // fragment drops; trailing slash runs drop; bare host = empty path
    assert(canon("https://ex.com/a#sec") === "https://ex.com/a")
    assert(canon("https://ex.com/a///") === "https://ex.com/a")
    assert(canon("https://ex.com/") === "https://ex.com")
    // tracking params drop (utm_ prefix family + the named list),
    // survivors keep their original order, bare ? drops
    assert(canon("https://ex.com/a?utm_source=x&b=2&fbclid=z&a=1")
      === "https://ex.com/a?b=2&a=1")
    assert(canon("https://ex.com/a?utm_campaign=x") === "https://ex.com/a")
    assert(canon("https://ex.com/a?") === "https://ex.com/a")
    // a non-utm param whose VALUE mentions utm survives
    assert(canon("https://ex.com/a?q=utm_source") === "https://ex.com/a?q=utm_source")
    // ftp: no default-port rule bound → port survives
    assert(canon("FTP://Ex.Com:21/f") === "ftp://ex.com:21/f")
  }

  test("urlDedup: canonical groups elect min id, sentinel on keepers") {
    import spark.implicits._
    val df = Seq(
      (10L, "https://ex.com/a?utm_source=x"),
      (20L, "HTTPS://WWW.EX.COM/a"),
      (30L, "https://ex.com:443/a/"),
      (40L, "https://ex.com/b"),
      (50L, "https://ex.com/a?page=2") // kept param → its own resource
    ).toDF("id", "url")
    val out = Urls.urlDedup(df, "id", "url")
      .select("id", "canon_url", "is_dup", "dup_of")
      .as[(Long, String, Boolean, Long)].collect().sortBy(_._1).toList
    assert(out === List(
      (10L, "https://ex.com/a", false, -1L),
      (20L, "https://ex.com/a", true, 10L),
      (30L, "https://ex.com/a", true, 10L),
      (40L, "https://ex.com/b", false, -1L),
      (50L, "https://ex.com/a?page=2", false, -1L)))
  }

  test("domainReputation: each rule binds at its exact integer boundary") {
    import spark.implicits._
    def doc(id: Long, domain: String, words: Int): (Long, String, String) =
      (id, domain, Seq.fill(words)("w").mkString(" "))
    val docs = (
      // tiny.com: 2 long docs — fails ONLY the minDocs floor
      Seq(doc(1, "tiny.com", 90), doc(2, "tiny.com", 90)) ++
      // exact.com: 5 docs of exactly minMeanWords → sum == 54·5, passes;
      // 2 of 5 short = 40% == maxShortPct cap exactly → still passes
      Seq(doc(10, "exact.com", 54), doc(11, "exact.com", 54), doc(12, "exact.com", 96),
          doc(13, "exact.com", 35), doc(14, "exact.com", 31)) ++
      // undermean.com: 5 docs, sum = 54·5 − 1 → fails the mean floor by one word
      Seq(doc(20, "undermean.com", 53), doc(21, "undermean.com", 54), doc(22, "undermean.com", 54),
          doc(23, "undermean.com", 54), doc(24, "undermean.com", 54)) ++
      // stubs.com: mean clears the floor but 3 of 5 short (60% > 40%) → fails
      Seq(doc(30, "stubs.com", 200), doc(31, "stubs.com", 200), doc(32, "stubs.com", 10),
          doc(33, "stubs.com", 10), doc(34, "stubs.com", 10))
    ).toDF("doc_id", "domain", "text")
    // exact.com: words 54+54+96+35+31 = 270 = 54·5; short(<40) = {35,31} = 2 of 5
    val out = Urls.domainReputation(docs, "doc_id", "domain", "text")
      .select("domain", "domain_ok").distinct()
      .as[(String, Boolean)].collect().toMap
    assert(out === Map(
      "tiny.com" -> false, "exact.com" -> true,
      "undermean.com" -> false, "stubs.com" -> false))
  }

  test("domainReputation gates per doc and broadcasts the verdict frame") {
    import spark.implicits._
    val docs = (1 to 12).map(i =>
      (i.toLong, if (i <= 6) "a.com" else "b.com",
        Seq.fill(if (i <= 6) 80 else 5)("w").mkString(" "))).toDF("doc_id", "domain", "text")
    val gated = Urls.domainReputation(docs, "doc_id", "domain", "text", minDocs = 5)
    val plan = gated.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"verdict frame should join back broadcast:\n$plan")
    val kept = gated.filter(col("domain_ok")).select("doc_id")
      .as[Long].collect().sorted
    assert(kept.toList === (1L to 6L).toList)
  }

  test("exact-tier day-2 probe: dup flagged with the index keeper, replay idempotent") {
    import spark.implicits._
    val corpus = Seq((1L, "alpha beta"), (2L, "gamma delta"), (3L, "alpha beta"))
      .toDF("doc_id", "text")
    val index = Dedup.buildExactIndex(corpus)
    // the duplicated corpus text elected min id 1 with 2 copies
    val idxRows = index.as[(String, Long, Long)].collect().map(r => r._2 -> r._3).toMap
    assert(idxRows(1L) === 2L && idxRows(2L) === 1L)
    val batch = Seq(
      (10L, "alpha beta"),   // exact dup of the corpus keeper
      (11L, "epsilon zeta"), // clean
      (2L, "gamma delta")    // the SAME doc replayed → not a dup of itself
    ).toDF("doc_id", "text")
    val out = Dedup.dedupExactAgainstIndex(batch, index)
      .as[(Long, Boolean, Long)].collect().sortBy(_._1).toList
    assert(out === List((2L, false, -1L), (10L, true, 1L), (11L, false, -1L)))
  }

  test("URL-tier day-2 probe: recrawl variants hit the index keeper, replay idempotent") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "https://a.com/x"),
      (2L, "HTTPS://WWW.A.com/x/"),       // same resource, messy recrawl
      (3L, "https://b.com/y?utm_source=t")
    ).toDF("doc_id", "url")
    val index = Urls.buildUrlIndex(corpus, "doc_id", "url")
    val idx = index.as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(idx("https://a.com/x") === ((1L, 2L)), "variants collapse, min id keeps")
    assert(idx("https://b.com/y") === ((3L, 1L)))
    val batch = Seq(
      (10L, "https://a.com/x#frag"),      // recrawl of the kept resource
      (11L, "https://c.com/new"),         // brand-new resource
      (3L, "https://b.com/y?utm_source=t") // the SAME page re-sent → not a dup
    ).toDF("doc_id", "url")
    val out = Urls.urlDedupAgainstIndex(batch, index, "doc_id", "url")
      .select("doc_id", "is_dup", "dup_of")
      .as[(Long, Boolean, Long)].collect().sortBy(_._1).toList
    assert(out === List((3L, false, -1L), (10L, true, 1L), (11L, false, -1L)))
    intercept[IllegalArgumentException] {
      Urls.urlDedupAgainstIndex(batch, index.drop("keep_id"), "doc_id", "url")
    }
  }

  test("blocklist gate: suffix semantics block subdomains, exact hosts, nothing else") {
    import spark.implicits._
    val rows = Seq(
      (1L, "https://bad.example.com/a"),          // exact entry
      (2L, "https://deep.sub.bad.example.com/b"), // subdomain of an entry
      (3L, "https://WWW.Bad.Example.COM:8443/c"), // messy dressing, same host
      (4L, "https://notbad.example.com/d"),       // suffix boundary: NOT blocked
      (5L, "https://good.example.com/e"),
      (6L, "https://bad.example.com.evil.net/f"), // entry as a NON-suffix infix
      (7L, "https://user:pw@bad.example.com/g")   // userinfo must not evade the gate
    ).toDF("doc_id", "url")
    val bl = Seq("bad.example.com", "blocked.org").toDF("pattern")
    val out = Urls.blocklistGate(rows, "doc_id", "url", bl)
      .as[(Long, String, Boolean)].collect().sortBy(_._1).toList
    assert(out.map(r => r._1 -> r._3) ===
      List(1L -> true, 2L -> true, 3L -> true, 4L -> false, 5L -> false,
        6L -> false, 7L -> true))
    assert(out.find(_._1 == 3L).get._2 === "bad.example.com",
      "host extraction must strip scheme case, www, and port")
    // broadcast path by default; shuffle fallback flag honors the choice
    val planB = Urls.blocklistGate(rows, "doc_id", "url", bl)
      .queryExecution.executedPlan.toString
    assert(planB.contains("BroadcastHashJoin"), s"list should broadcast:\n${planB.take(500)}")
    intercept[IllegalArgumentException] {
      Urls.blocklistGate(rows, "doc_id", "url", bl.withColumnRenamed("pattern", "p"))
    }
  }
}

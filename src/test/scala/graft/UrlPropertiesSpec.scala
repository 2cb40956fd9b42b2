package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.operators.Urls

/** Property coverage for the URL rules: scalacheck GENERATES the messy
  * URL space (case, userinfo, stacked www, default/odd ports, slash
  * runs, tracking params, fragments) and Spark evaluates the whole
  * sample in one frame. The properties are the contracts the dedup
  * family silently relies on:
  *
  *  - idempotence — canonicalizing a canonical URL changes nothing
  *    (without it, a re-canonicalized index drifts from its probes;
  *    this property CAUGHT the single-`www.`-strip rule);
  *  - host stability — [[Urls.hostOf]] agrees before and after
  *    canonicalization (the blocklist gate must not care which form
  *    it sees);
  *  - dressing invariance — fragments, userinfo, default ports, www
  *    stacks, and tracking params never split a canonical group.
  */
class UrlPropertiesSpec extends SparkSpecBase {
  import spark.implicits._

  private val label = Gen.choose(1, 8).flatMap(n =>
    Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString))
  private val messyUrl: Gen[String] = for {
    scheme <- Gen.oneOf("http", "https", "HTTP", "HTTPS", "Ftp")
    user   <- Gen.oneOf("", "user@", "u:p@", "a@b@")
    www    <- Gen.oneOf("", "www.", "WWW.", "www.www.")
    nl     <- Gen.choose(1, 3)
    host   <- Gen.listOfN(nl, label).map(_.mkString("."))
    port   <- Gen.oneOf("", ":80", ":443", ":8080")
    np     <- Gen.choose(0, 3)
    segs   <- Gen.listOfN(np, label)
    tail   <- Gen.oneOf("", "/", "//")
    nq     <- Gen.choose(0, 3)
    params <- Gen.listOfN(nq, Gen.oneOf(
      "a=1", "utm_source=x", "utm_medium=s", "fbclid=zz", "page=2", "b=", "Flag"))
    frag   <- Gen.oneOf("", "#x", "#sec-2")
  } yield {
    val path = (if (segs.isEmpty) "" else "/" + segs.mkString("/")) + tail
    val query = if (params.isEmpty) "" else "?" + params.mkString("&")
    s"$scheme://$user$www$host$port$path$query$frag"
  }

  private def sample(n: Int, seed: Long): Seq[String] = {
    val g = Gen.listOfN(n, messyUrl)
    g.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(seed)).get
  }

  test("canonicalizeUrl is idempotent and hostOf is canonicalization-stable (500 generated URLs)") {
    val df = sample(500, 42L).zipWithIndex
      .map { case (u, i) => (i.toLong, u) }.toDF("id", "url")
    val c1 = Urls.canonicalizeUrl(col("url"))
    val rows = df.select(col("url"), c1.as("c1"),
        Urls.canonicalizeUrl(c1).as("c2"),
        Urls.hostOf(col("url")).as("h1"), Urls.hostOf(c1).as("h2"))
      .as[(String, String, String, String, String)].collect()
    rows.foreach { case (u, a, b, h1, h2) =>
      assert(b == a, s"not idempotent: $u -> $a -> $b")
      assert(h2 == h1, s"host unstable under canonicalization: $u -> h($u)=$h1, h($a)=$h2")
    }
  }

  test("messy dressings never split a canonical group (fragment/userinfo/port/www/tracking)") {
    val bases = sample(200, 7L)
    val dressed = bases.zipWithIndex.flatMap { case (u, i) =>
      val noFrag = u.takeWhile(_ != '#')
      val sep = if (noFrag.contains('?')) "&" else "?"
      Seq((i.toLong, 0, u), (i.toLong, 1, noFrag + "#extra-frag"),
        (i.toLong, 2, noFrag + sep + "utm_campaign=y&gclid=123"))
    }.toDF("base_id", "variant", "url")
    val groups = dressed
      .withColumn("canon", Urls.canonicalizeUrl(col("url")))
      .groupBy(col("base_id"))
      .agg(countDistinct(col("canon")).as("n"))
      .filter(col("n") =!= 1)
      .count()
    assert(groups === 0L, "a fragment or tracking dressing split a canonical group")
  }
}

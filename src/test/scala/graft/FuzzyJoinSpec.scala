package graft

import graft.operators.FuzzyJoin
import org.apache.spark.sql.functions._

class FuzzyJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private def pairs(vocab: Seq[String], maxDist: Int): Set[(String, String, Long)] =
    FuzzyJoin.editDistanceJoin(vocab.toDF("s"), "s", maxDist)
      .as[(String, String, Long)].collect().toSet

  test("finds substitution, insertion and deletion variants at d=1, anywhere in the string") {
    val out = pairs(Seq(
      "red widget",  // base
      "ted widget",  // substitution at position 1
      "red widgets", // insertion at the end
      "red widget!", // insertion at the end (other char)
      "rd widget",   // deletion at position 2
      "red midget",  // substitution mid-string
      "blue bolt"    // unrelated — no pair
    ), maxDist = 1)
    assert(out == Set(
      ("red widget", "ted widget", 1L),
      ("red widget", "red widgets", 1L),
      ("red widget", "red widget!", 1L),
      ("rd widget", "red widget", 1L),
      ("red midget", "red widget", 1L),
      // the variants also pair with each other where 1 edit suffices
      ("red widget!", "red widgets", 1L)))
  }

  test("d=2 reaches two-edit pairs; d=1 does not") {
    val vocab = Seq("spark", "sparkle", "shark")
    assert(pairs(vocab, maxDist = 1) == Set(("shark", "spark", 1L)))
    assert(pairs(vocab, maxDist = 2) == Set(
      ("shark", "spark", 1L),
      ("spark", "sparkle", 2L)))
  }

  test("repetitive and sub-2-char strings still pair (no gram-entropy assumption)") {
    // ed("bb","bc")=1 with DISJOINT bigram sets — the case that breaks
    // gram blocking is exactly covered by deletion keys
    val out = pairs(Seq("bb", "bc", "aaaaaa", "aaaaab", "a", "b"), maxDist = 1)
    assert(out == Set(
      ("bb", "bc", 1L),
      ("aaaaaa", "aaaaab", 1L),
      ("a", "b", 1L),
      ("b", "bb", 1L),
      ("b", "bc", 1L)))
  }

  test("matches brute-force Levenshtein exactly on a mixed vocabulary (d=1 and d=2)") {
    val vocab = Seq("alpha", "alpho", "alphaa", "lpha", "beta", "betta", "bata",
      "gamma", "gamma ray", "gama", "x", "xy", "yx", "zz", "z z", "aaaa", "aaab")
    val df = vocab.toDF("s")
    for (d <- Seq(1, 2)) {
      val brute = df.as("a").crossJoin(df.as("b"))
        .filter(col("a.s") < col("b.s"))
        .select(col("a.s"), col("b.s"),
          levenshtein(col("a.s"), col("b.s")).cast("long").as("dist"))
        .filter(col("dist").between(1, d))
        .as[(String, String, Long)].collect().toSet
      assert(pairs(vocab, d) == brute, s"mismatch vs brute force at d=$d")
    }
  }

  test("input rows deduplicate to the vocabulary; nulls are ignored") {
    val df = Seq(Some("kit"), Some("kit"), Some("kat"), None, Some("kat"))
      .toDF("s")
    val out = FuzzyJoin.editDistanceJoin(df, "s", maxDist = 1)
      .as[(String, String, Long)].collect().toSeq
    assert(out == Seq(("kat", "kit", 1L)),
      "duplicate rows must yield one vocabulary pair; null must not join")
  }

  test("maxDist outside {1,2} is refused loudly") {
    val df = Seq("a").toDF("s")
    val e = intercept[IllegalArgumentException] {
      FuzzyJoin.editDistanceJoin(df, "s", maxDist = 3)
    }
    assert(e.getMessage.contains("maxDist"))
  }

  test("edit distance and deletion keys operate on characters, not bytes") {
    // "müller"/"muller" differ by ONE character (ü is 2 UTF-8 bytes):
    // Column.substr and levenshtein are both character-based, so the
    // pair must be found at d=1. Pins the semantics a byte-based
    // implementation would silently break.
    val out = pairs(Seq("müller", "muller", "möller"), maxDist = 1)
    assert(out == Set(
      ("muller", "müller", 1L),
      ("muller", "möller", 1L),
      ("möller", "müller", 1L)))
  }

  test("canonicalVocabulary maps chains to the component minimum, singletons to themselves") {
    // kit–kat–cat is a d=1 CHAIN: transitive closure must pull all
    // three to the lexicographic minimum even though ed(kit,cat)=2
    val df = Seq("kit", "kat", "cat", "dog", "dig").toDF("s")
    val out = FuzzyJoin.canonicalVocabulary(df, "s", maxDist = 1)
      .as[(String, String, Boolean)].collect().toSet
    assert(out == Set(
      ("cat", "cat", false),
      ("kat", "cat", true),
      ("kit", "cat", true),
      ("dig", "dig", false),
      ("dog", "dig", true)))
  }

  test("canonicalVocabulary is a partition: every name maps into its own cluster") {
    val df = Seq("alpha", "alphb", "alphc", "beta", "solo").toDF("s")
    val out = FuzzyJoin.canonicalVocabulary(df, "s", maxDist = 1)
      .as[(String, String, Boolean)].collect().toSeq
    assert(out.length == 5, "one row per vocabulary entry")
    val canonicals = out.map(_._2).toSet
    assert(out.filter(r => canonicals.contains(r._1)).forall(!_._3),
      "a canonical is never itself a variant")
    assert(out.count(_._2 == "alpha") == 3 && out.count(_._2 == "beta") == 1
      && out.count(_._2 == "solo") == 1)
  }

  test("plan stays an equi join — no cartesian, no nested loop") {
    val df = Seq("red widget", "ted widget", "blue bolt").toDF("s")
    val plan = FuzzyJoin.editDistanceJoin(df, "s", maxDist = 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"fuzzy join must block on deletion keys, got:\n$plan")
  }

  test("appendToVocabulary: attach, chain, bridge-no-merge, replay no-op") {
    val vocab = FuzzyJoin.canonicalVocabulary(
      Seq("aaaa", "aaab", "mmmm", "mmnn", "zzzz").toDF("s"), "s", maxDist = 1)
      .localCheckpoint()
    // sanity on the starting partition: aaaa/aaab one cluster; the two
    // m-strings are distance 2 apart → separate canonicals
    val v0 = vocab.as[(String, String, Boolean)].collect().map(r => r._1 -> r._2).toMap
    assert(v0("aaab") == "aaaa" && v0("mmmm") == "mmmm" && v0("mmnn") == "mmnn")
    val out = FuzzyJoin.appendToVocabulary(
      Seq("aabb",           // 1 edit from aaab → attaches to its canonical aaaa
        "qqqq", "qqqr",     // new-only chain → min label qqqq
        "mmmn",             // 1 edit from BOTH mmmm and mmnn → bridge
        "solo").toDF("s"), "s", vocab, maxDist = 1)
      .as[(String, String, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out.size == 5, "exactly the new strings, nothing rewritten")
    assert(out("aabb") == (("aaaa", true)), s"attach through the chain: ${out("aabb")}")
    assert(out("qqqq") == (("qqqq", false)) && out("qqqr") == (("qqqq", true)))
    assert(out("mmmn") == (("mmmm", true)),
      "a bridge adopts the MIN existing canonical and merges nothing")
    assert(out("solo") == (("solo", false)))
    // replay: every name already known → empty append
    val replay = FuzzyJoin.appendToVocabulary(
      Seq("aaaa", "aaab", "zzzz").toDF("s"), "s", vocab, maxDist = 1)
    assert(replay.isEmpty, "re-delivered names must append nothing")
  }

  test("appendToVocabulary == full rebuild when day-2 strings do not undercut or bridge") {
    val day1 = Seq("cat", "cbt", "dog", "xylophone")
    val day2 = Seq("cct", "dpg", "newt") // each attaches or is fresh; all lex-larger
    val vocab1 = FuzzyJoin.canonicalVocabulary(day1.toDF("s"), "s", maxDist = 1)
      .localCheckpoint()
    val appended = vocab1.unionByName(
      FuzzyJoin.appendToVocabulary(day2.toDF("s"), "s", vocab1, maxDist = 1))
      .as[(String, String, Boolean)].collect().toSet
    val rebuilt = FuzzyJoin.canonicalVocabulary(
      (day1 ++ day2).toDF("s"), "s", maxDist = 1)
      .as[(String, String, Boolean)].collect().toSet
    assert(appended == rebuilt, s"append $appended vs rebuild $rebuilt")
  }
}

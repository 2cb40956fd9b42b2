package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench stdout metrics-line schema (settled round 9): compact
  * qNN keys ALWAYS, valid JSON, inside the harness's 2000-char tail
  * budget with headroom, loud on key collisions. No SparkSession — the
  * line builder is pure. */
class BenchSpec extends AnyFunSuite {

  test("preflight: foreign JVMs are java processes outside this run's ancestor chain") {
    // self = 100, forked by sbt (50), forked by a shell (10): the
    // chain is clean; a stale bench JVM (200) and its child (201) are
    // foreign; non-java processes never count
    val procs = Seq(
      (1L, 0L, "systemd"),
      (10L, 1L, "bash"),
      (50L, 10L, "java"),   // sbt launcher — ancestor, expected
      (100L, 50L, "java"),  // self
      (200L, 1L, "java"),   // stale bench JVM — foreign
      (201L, 200L, "java"), // its executor child — foreign
      (300L, 1L, "python3"))
    assert(Bench.foreignJvms(procs, self = 100L) == Seq(200L, 201L))
    // a clean window reports nothing
    assert(Bench.foreignJvms(procs.filterNot(p => Set(200L, 201L)(p._1)),
      self = 100L).isEmpty)
    // a ppid cycle (pid reuse race) terminates instead of spinning
    val cyclic = Seq((100L, 50L, "java"), (50L, 100L, "java"))
    assert(Bench.foreignJvms(cyclic, self = 100L).isEmpty)
  }

  test("metricsLine: the dirty stamp rides the line and survives shedding") {
    val line = Bench.metricsLine(
      Seq(("q01_pricing_summary", 1.0)), 1.0, "0.1", 3, dirty = Some(4))
    assert(line.contains(""""dirty":4"""), line)
    // clean runs carry no stamp at all — absence IS the clean signal
    val clean = Bench.metricsLine(
      Seq(("q01_pricing_summary", 1.0)), 1.0, "0.1", 3)
    assert(!clean.contains("dirty"), clean)
    // shedding pressure (170 wide-median queries) keeps the stamp
    val many = (1 to 170).map(i => (f"q$i%02d_some_long_descriptive_name", 12.345))
    val shed = Bench.metricsLine(many, 170 * 12.345, "1.0", 3, dirty = Some(2))
    assert(shed.length <= 1950 && shed.contains(""""dirty":2"""), shed.take(120))
  }

  test("metricsLine keys are qNN prefixes, map values trim trailing zeros, envelope intact") {
    val line = Bench.metricsLine(
      Seq(("q01_pricing_summary", 1.23456), ("q70_span_dedup", 0.5)),
      1.73456, "0.1", 3)
    assert(line ==
      """{"metric":"total","value":1.735,"unit":"sec","headline":"run1","sf":0.1,"iters":3,"queries":{"q01":1.23,"q70":0.5}}""",
      line)
  }

  test("metricsLine holds 170 queries inside the tail budget, marker intact at realistic widths") {
    // the round-14 regime: 154 registered and growing. Realistic widths
    // (sub-10s medians) must keep the protocol marker AND build costs;
    // pathological all-slow lines may shed down to 1-dp queries but
    // must still fit
    val many = (1 to 170).map(i => (f"q$i%02d_n", 12.345))
    val line = Bench.metricsLine(many, 170 * 12.345, "1.0", 3,
      builds = (1 to 6).map(i => (f"q$i%02d_n", 3.456)))
    assert(line.length <= 1950, s"${line.length} chars")
    val typical = (1 to 170).map(i => (f"q$i%02d_n", 1.234))
    val tline = Bench.metricsLine(typical, 170 * 1.234, "1.0", 3,
      builds = (1 to 6).map(i => (f"q$i%02d_n", 3.456)))
    assert(tline.length <= 1950, s"${tline.length} chars")
    assert(tline.contains("\"headline\":\"run1\""), tline.take(120))
    // the CURRENT suite's shape: 154 queries, most sub-second, a few
    // heavy — marker AND build costs must both survive
    val real = (1 to 154).map(i =>
      (f"q$i%02d_n", if (i % 10 == 0) 4.321 else 0.678))
    val rline = Bench.metricsLine(real, real.map(_._2).sum, "0.1", 3,
      builds = (1 to 6).map(i => (f"q$i%02d_n", 3.456)))
    assert(rline.length <= 1950, s"${rline.length} chars")
    assert(rline.contains("\"headline\":\"run1\"") && rline.contains("\"build\":{"),
      rline.take(120))
  }

  test("metricsLine holds 140 queries inside the 1950-char tail budget") {
    // pathological width (every median 12.345 s): the protocol marker
    // sheds — query medians always beat diagnostics for tail budget
    val many = (1 to 140).map(i => (f"q$i%02d_some_long_descriptive_name", 12.345))
    val line = Bench.metricsLine(many, 140 * 12.345, "1.0", 3)
    assert(line.length <= 1950, s"${line.length} chars")
    assert(line.contains("\"q140\":12.35") || line.contains("\"q140\":12.3"), line.takeRight(40))
    // realistic width (sub-10s medians, the actual suite's regime): the
    // headline marker survives alongside all 140 queries
    val typical = (1 to 140).map(i => (f"q$i%02d_some_long_descriptive_name", 1.234))
    val tline = Bench.metricsLine(typical, 140 * 1.234, "1.0", 3)
    assert(tline.length <= 1950, s"${tline.length} chars")
    assert(tline.contains("\"headline\":\"run1\""), tline.take(120))
  }

  test("metricsLine carries one-time build costs separately from query medians") {
    val line = Bench.metricsLine(
      Seq(("q47_ann_pq", 0.4)), 0.4, "0.1", 3,
      builds = Seq(("q47_ann_pq", 2.1)))
    assert(line ==
      """{"metric":"total","value":0.400,"unit":"sec","headline":"run1","sf":0.1,"iters":3,"build":{"q47":2.1},"queries":{"q47":0.4}}""",
      line)
  }

  test("metricsLine carries the back-to-back control total and only outlier suspects") {
    // round 18: two-run lines carry the "minq" marker — the queries map
    // is per-query min across the suites, control.value the quieter
    // SUITE total (the r15–r17 protocol's headline, for trend
    // continuity), suspects the slow-side medians of >1.3× disagreers
    val line = Bench.metricsLine(
      Seq(("q37_dup_clusters", 5.5), ("q01_pricing_summary", 1.0)),
      6.5, "0.1", 3,
      control = Some((4.2, Seq(("q37_dup_clusters", 3.0)))))
    assert(line ==
      """{"metric":"total","value":6.500,"unit":"sec","headline":"minq","sf":0.1,"iters":3,"control":{"value":4.200,"suspects":{"q37":3}},"queries":{"q37":5.5,"q01":1}}""",
      line)
    val noSus = Bench.metricsLine(Seq(("q01_a", 1.0)), 1.0, "0.1", 3,
      control = Some((1.05, Nil)))
    assert(noSus.contains(""""headline":"minq","sf""""), noSus)
    assert(noSus.contains(""""control":{"value":1.050},"queries""""), noSus)
  }

  test("metricsLine: the shed and load stamps ride the line and survive shedding") {
    // round 18 (verdict items 5 + 8): single-sample medians and
    // non-JVM load must be machine-detectable in-band, like dirty
    val line = Bench.metricsLine(
      Seq(("q01_pricing_summary", 1.0)), 1.0, "0.1", 3,
      shed = Some(3), load = Some((0.41, 6.02)))
    assert(line.contains(""""shed":3""") && line.contains(""""load":[0.41,6.02]"""),
      line)
    // a quiet, unshed run carries neither stamp-absence ambiguity:
    // shed absent = every median is iters-sample; load always prints
    val clean = Bench.metricsLine(Seq(("q01_a", 1.0)), 1.0, "0.1", 3,
      load = Some((0.0, 0.5)))
    assert(!clean.contains("shed") && clean.contains(""""load":[0,0.5]"""), clean)
    // shedding pressure keeps both stamps (the slim rungs may narrow
    // load to 1 dp — the stamp survives, never drops)
    val many = (1 to 170).map(i => (f"q$i%02d_some_long_descriptive_name", 12.345))
    val shedLine = Bench.metricsLine(many, 170 * 12.345, "1.0", 3,
      shed = Some(12), load = Some((1.25, 1.5)))
    assert(shedLine.length <= 1985 && shedLine.contains(""""shed":12""") &&
      (shedLine.contains(""""load":[1.25,1.5]""") ||
        shedLine.contains(""""load":[1.3,1.5]""")), shedLine.take(160))
  }

  test("metricsLine holds 120 queries plus control-with-suspects inside the tail budget") {
    // control costs ~15 chars + ~14 per suspect: 120 queries + 8
    // suspects still clear the harness tail with headroom over the
    // ~90 actually registered
    val many = (1 to 120).map(i => (f"q$i%02d_some_long_descriptive_name", 12.345))
    val line = Bench.metricsLine(many, 120 * 12.345, "1.0", 3,
      control = Some((120 * 12.0, many.take(8).map { case (n, _) => (n, 9.876) })))
    assert(line.length <= 1950, s"${line.length} chars")
  }

  test("metricsLine holds 180 queries with marker AND side-artifact pointer intact") {
    // the round-15 growth headroom: at 180 registered queries the
    // in-band line must still parse with the protocol marker and the
    // full-precision side-artifact pointer — shedding may drop query
    // precision, but never the pointer that makes shedding safe
    val ptr = Some("bench_full_latest.json#ab12cd34")
    val typical = (1 to 180).map(i =>
      (f"q$i%03d_n", if (i % 10 == 0) 4.321 else 0.678))
    val line = Bench.metricsLine(typical, typical.map(_._2).sum, "0.1", 3,
      builds = (1 to 6).map(i => (f"q$i%02d_b", 3.456)), full = ptr)
    assert(line.length <= 1992, s"${line.length} chars")
    assert(line.contains("\"full\":\"#ab12cd34\"") ||
      line.contains("\"full\":\"bench_full_latest.json#ab12cd34\""), line.take(160))
    assert(!line.matches("""(?s).*":0[,}].*"""), "a measured query printed as 0:\n" + line)
    // pathological all-slow widths: the pointer survives every shed —
    // narrowed to its #hash form on the slim rungs (the file name is
    // the fixed default; the hash still verifies the file)
    val slow = (1 to 180).map(i => (f"q$i%03d_n", 12.345))
    val sline = Bench.metricsLine(slow, slow.map(_._2).sum, "0.1", 3, full = ptr)
    assert(sline.length <= 1985, s"${sline.length} chars")
    assert(sline.contains("\"full\":\"#ab12cd34\"") ||
      sline.contains("\"full\":\"bench_full_latest.json#ab12cd34\""), sline.take(160))
  }

  test("metricsLine never prints 0 for a measured query (r19 verdict item 2)") {
    // the r19 regime: 180 registered queries, the realistic value mix
    // (most at/under a second, a heavy tail), where the old 0-dp shed
    // step printed every sub-0.5 s query as `0` and the driver read 36
    // real improvements as dropped_from_bench. Every measured value
    // must now be nonzero at every shed level; failures stay -1.
    val real = (1 to 180).map { i =>
      val name = if (i <= 99) f"q$i%02d_n" else f"q$i%03d_n"
      val v =
        if (i == 7) -1.0
        else if (i % 20 == 0) 23.456
        else if (i % 3 == 0) 0.234
        else 1.044
      (name, v)
    }
    val line = Bench.metricsLine(real, 200.0, "0.1", 3,
      builds = (1 to 8).map(i => (f"q$i%02d_b", 3.456)),
      full = Some("bench_full_latest.json#ab12cd34"),
      control = Some((275.51, Nil)),
      shed = Some(12), load = Some((0.41, 6.02)))
    assert(line.length <= 1992, s"${line.length} chars")
    assert(!line.matches("""(?s).*":0[,}].*"""), "a measured query printed as 0:\n" + line)
    assert(line.contains("\"q07\":-1"), "failed query must stay -1:\n" + line.take(200))
    // sub-0.5 s queries keep >= 1 decimal of real signal at this width
    assert(line.contains("\"q03\":0.2"), line.takeRight(400))
    // and the stamps survive
    assert(line.contains("\"shed\":12") && line.contains("\"load\":["), line.take(200))
    // the EXTREME width (every query sub-second at 4-char keys) cannot
    // hold 1 dp inside the tail: the final rung floors to 1 — coarse
    // and conservative, but never the ambiguous 0
    val flood = (1 to 180).map(i => (f"q$i%03d_n", 0.234))
    val fline = Bench.metricsLine(flood, 42.12, "0.1", 3,
      full = Some("bench_full_latest.json#ab12cd34"))
    assert(fline.length <= 1992, s"${fline.length} chars")
    assert(!fline.matches("""(?s).*":0[,}].*"""), "flood line printed a 0:\n" + fline)
    assert(fline.contains("\"q001\":1"), fline.takeRight(200))
  }

  test("metricsLine fails loud on qNN prefix collisions") {
    val e = intercept[IllegalArgumentException] {
      Bench.metricsLine(Seq(("q07_a", 1.0), ("q07_b", 2.0)), 3.0, "0.1", 3)
    }
    assert(e.getMessage.contains("q07"), e.getMessage)
  }

  test("every registered query has a unique well-formed qNN(N) prefix") {
    // q01–q99 filled in rounds 1–11; the scheme widens to three digits
    // from q100 on (split("_").head keys stay unique and compact)
    val names = SparkEntry.queries.keys.toSeq
    val prefixes = names.map(_.split("_").head)
    assert(names.forall(_.matches("q\\d{2,3}_\\w+")),
      names.filterNot(_.matches("q\\d{2,3}_\\w+")).toString)
    assert(prefixes.distinct.length == prefixes.length,
      prefixes.groupBy(identity).filter(_._2.size > 1).keys.toString)
  }
}

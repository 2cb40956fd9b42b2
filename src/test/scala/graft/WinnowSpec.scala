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

  test("native kernel == declarative md5/conv selection, row for row, on real corpus text") {
    val docs = Tables(spark, sfDir).documents
      .select(col("doc_id"), col("text")).limit(300)
    val kernel = Dedup.winnowFingerprints(docs)
    val decl = Dedup.winnowFingerprintsDeclarative(docs)
    assert(kernel.exceptAll(decl).isEmpty && decl.exceptAll(kernel).isEmpty,
      "the kernel must reproduce the portable md5-60 selection exactly")
    // non-default params too (different gram size, window, tie paths)
    val k2 = Dedup.winnowFingerprints(docs, k = 7, w = 9)
    val d2 = Dedup.winnowFingerprintsDeclarative(docs, k = 7, w = 9)
    assert(k2.exceptAll(d2).isEmpty && d2.exceptAll(k2).isEmpty)
    // multi-byte text: é/ä are 2 UTF-8 bytes but ONE char in both
    // engines' substr — the kernel's code-point offsets must agree
    val accented = Seq((1L, "héllo wörld räin ärt däy über " * 4)).toDF("doc_id", "text")
    val ka = Dedup.winnowFingerprints(accented)
    val da = Dedup.winnowFingerprintsDeclarative(accented)
    assert(ka.exceptAll(da).isEmpty && da.exceptAll(ka).isEmpty && ka.count() > 0)
  }

  test("span localization: one island per shared span, exact diagonal, interior coverage") {
    val shared = junk("span", 12) // 131 chars
    val s2 = junk("other", 12)
    val docA = junk("p", 20) + " " + shared + " " + junk("q", 20)
    val docB = junk("r", 30) + " " + shared + " " + junk("s", 10)
    val one = Seq((3L, docA), (4L, docB)).toDF("doc_id", "text")
    val rows = Dedup.winnowSharedSpans(one)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.length == 1, s"one shared span must be ONE island: ${rows.toSeq}")
    val (a, b, aStart, aEnd, bStart, bEnd, n) = rows.head
    assert(a == 3L && b == 4L && n >= 3)
    // the diagonal is exact: both texts are already normalized, so the
    // offset difference of the planted span is the reported shift
    val expectedDiag = docB.indexOf(shared) - docA.indexOf(shared)
    assert(bStart - aStart == expectedDiag && bEnd - aEnd == expectedDiag,
      s"diag ${bStart - aStart} != $expectedDiag")
    // interior coverage: within the shared region (±1 matched space),
    // undercovering each edge by at most ~(k + w) chars
    assert(aStart >= docA.indexOf(shared) - 1 + 1 && aEnd <= docA.indexOf(shared) + shared.length + 1 + 1,
      s"[$aStart,$aEnd] escapes the planted region")
    assert(aEnd - aStart + 1 >= shared.length - 40, s"span [$aStart,$aEnd] undercovers")
    // two disjoint shared spans at DIFFERENT offsets -> two islands on
    // two diagonals
    val docC = junk("c1", 15) + " " + shared + " " + junk("c2", 25) + " " + s2 + " " + junk("c3", 5)
    val docD = junk("d1", 28) + " " + shared + " " + junk("d2", 6) + " " + s2 + " " + junk("d3", 18)
    val two = Seq((5L, docC), (6L, docD)).toDF("doc_id", "text")
    val r2 = Dedup.winnowSharedSpans(two)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(r2.length == 2, s"two spans must be TWO islands: ${r2.toSeq}")
    assert(r2.map(r => r._5 - r._3).distinct.length == 2, "distinct diagonals")
    intercept[IllegalArgumentException] {
      Dedup.winnowSharedSpans(one, minPrints = 0L)
    }
  }

  test("excision: the higher id loses span interiors, lengths reconcile, untouched docs absent") {
    val shared = junk("span", 12)
    val s2 = junk("other", 12)
    val docA = junk("p", 20) + " " + shared + " " + junk("q", 20) // donor, id 3
    val docC = junk("c", 10) + " " + s2 + " " + junk("cc", 10)    // donor, id 5
    val docB = junk("r", 10) + " " + shared + " " + junk("mid", 8) +
      " " + s2 + " " + junk("s", 10)                              // id 9 loses both
    val docs = Seq((3L, docA), (5L, docC), (9L, docB)).toDF("doc_id", "text")
    val out = Dedup.exciseSharedSpans(docs, Dedup.winnowSharedSpans(docs))
      .as[(Long, String, Long, Long)].collect()
    assert(out.map(_._1).toSeq == Seq(9L),
      s"only the higher id excises, donors never appear: ${out.map(_._1).toSeq}")
    val (_, clean, removed, n) = out.head
    assert(n == 2, s"two disjoint spans stay two merged intervals: $n")
    assert(clean.length == docB.length - removed, "every removed char is accounted for")
    assert(!clean.contains(shared.substring(30, 100)) &&
      !clean.contains(s2.substring(30, 100)), "span interiors must be gone")
    assert(clean.startsWith(junk("r", 10)) && clean.endsWith(junk("s", 10)),
      "unshared prefix and suffix survive")
  }

  test("maxDf ubiquity suppression: boilerplate spans vanish, rare spans survive, None stays exact") {
    val boiler = junk("boiler", 12)
    val rare = junk("rare", 12)
    // boiler in ALL 5 docs (df 5); rare in exactly docs 1 and 2 (df 2)
    val docs = (1L to 5L).map { i =>
      val mid = if (i <= 2) " " + rare + " " else " "
      (i, junk(s"u$i", 15) + " " + boiler + mid + junk(s"v$i", 15))
    }.toDF("doc_id", "text")
    val exact = Dedup.winnowOverlap(docs, minShared = 1L)
      .as[(Long, Long, Long)].collect()
    assert(exact.length == 10, s"all 10 pairs share the boilerplate: ${exact.length}")
    // df counts docs where a print was SELECTED: interior boilerplate
    // prints (selected identically in all 5 docs) suppress at df 5;
    // EDGE-zone selections are context-dependent, so a few low-df edge
    // residues may survive — with tiny counts the minShared gate (8 by
    // default) exists to drop. The rare span's evidence stays large.
    val sup = Dedup.winnowOverlap(docs, minShared = 1L, maxDf = Some(4L))
      .as[(Long, Long, Long)].collect()
    val supMap = sup.map(p => (p._1, p._2) -> p._3).toMap
    assert(supMap.getOrElse((1L, 2L), 0L) >= 20,
      s"the rare span keeps its full evidence: ${sup.toSeq}")
    assert(sup.filter(p => (p._1, p._2) != (1L, 2L)).forall(_._3 <= 3),
      s"everything else is edge residue under the default gate: ${sup.toSeq}")
    assert(Dedup.winnowOverlap(docs, maxDf = Some(4L)) // default minShared = 8
      .as[(Long, Long, Long)].collect().map(p => (p._1, p._2)).toSet == Set((1L, 2L)),
      "at the default gate only the rare pair survives")
    // probe side: df measured on the corpus index
    val idx = Dedup.buildWinnowIndex(docs)
    val batch = Seq((6L, junk("w", 15) + " " + boiler + " " + rare + " " +
      junk("x", 15))).toDF("doc_id", "text")
    val pv = Dedup.winnowOverlapAgainstIndex(batch, idx,
      minShared = 1L, maxDf = Some(4L))
      .as[(Long, Boolean, Long, Long)].collect().head
    assert(pv._2 && Set(1L, 2L).contains(pv._3), s"rare evidence only: $pv")
    // span localization under suppression (minPrints over the edge
    // residue): only the rare diagonal remains
    val sp = Dedup.winnowSharedSpans(docs, minPrints = 4L, maxDf = Some(4L))
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(sp.nonEmpty && sp.forall(r => (r._1, r._2) == (1L, 2L)), s"${sp.toSeq}")
    intercept[IllegalArgumentException] {
      Dedup.winnowOverlap(docs, maxDf = Some(1L))
    }
  }

  test("day-2 probe: planted span surfaces with its witness, replays excluded, params guarded") {
    val shared = junk("span", 12)
    val corpus = Seq(
      (10L, junk("c1", 40)),
      (11L, junk("p", 20) + " " + shared + " " + junk("q", 20)), // donor
      (12L, junk("c3", 40))
    ).toDF("doc_id", "text")
    val index = Dedup.buildWinnowIndex(corpus)
    val batch = Seq(
      (20L, junk("r", 20) + " " + shared + " " + junk("s", 20)), // sharer
      (21L, junk("fresh", 40)),                                  // no overlap
      (11L, junk("p", 20) + " " + shared + " " + junk("q", 20))  // REPLAY of 11
    ).toDF("doc_id", "text")
    val out = Dedup.winnowOverlapAgainstIndex(batch, index, minShared = 3L)
      .as[(Long, Boolean, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(20L)._2 && out(20L)._3 == 11L && out(20L)._4 >= 3,
      s"the planted span must name its donor: ${out(20L)}")
    assert(!out(21L)._2 && out(21L)._3 == -1L && out(21L)._4 == 0L)
    // a replayed id never pairs with itself; its text overlaps nothing else
    assert(!out(11L)._2, s"replay must be self-excluded: ${out(11L)}")
    intercept[IllegalArgumentException] {
      Dedup.winnowOverlapAgainstIndex(batch, index, k = 10)
    }
    intercept[IllegalArgumentException] {
      Dedup.winnowOverlapAgainstIndex(batch, index, w = 5)
    }
  }

  test("day-2 span probe: the batch localizes its copied span against the donor via the index alone") {
    val shared = junk("span", 12)
    val corpusDoc = junk("p", 20) + " " + shared + " " + junk("q", 20)
    val corpus = Seq((10L, junk("c1", 40)), (11L, corpusDoc)).toDF("doc_id", "text")
    val idx = Dedup.buildWinnowIndex(corpus)
    val batchDoc = junk("r", 30) + " " + shared + " " + junk("s", 10)
    val batch = Seq((20L, batchDoc), (11L, corpusDoc)).toDF("doc_id", "text")
    val out = Dedup.winnowSpansAgainstIndex(batch, idx)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(out.forall(_._1 == 20L), s"replayed 11 self-excludes: ${out.toSeq}")
    val row = out.filter(_._2 == 11L)
    assert(row.length == 1, s"one island on one diagonal: ${out.toSeq}")
    val (_, _, st, en, cs, ce, n) = row.head
    val expectedDiag = corpusDoc.indexOf(shared) - batchDoc.indexOf(shared)
    assert(cs - st == expectedDiag && ce - en == expectedDiag,
      s"corpus-side interval rides the exact diagonal: ${row.head}")
    assert(en - st + 1 >= shared.length - 40 && n >= 3)
    // the output IS excision input: batch doc 20 sheds the copied span
    val clean = Dedup.exciseSharedSpans(batch,
      Dedup.winnowSpansAgainstIndex(batch, idx).select(
        col("doc_id").as("doc_b"), col("start").as("b_start"), col("end").as("b_end")))
      .as[(Long, String, Long, Long)].collect()
    assert(clean.map(_._1).toSeq == Seq(20L) &&
      !clean.head._2.contains(shared.substring(30, 100)),
      "the corpus-duplicated span is gone from the batch doc")
    intercept[IllegalArgumentException] {
      Dedup.winnowSpansAgainstIndex(batch, idx.drop("pos"))
    }
    intercept[IllegalArgumentException] {
      Dedup.winnowSpansAgainstIndex(batch, idx, k = 10)
    }
  }

  test("clean ingest: the whole batch survives, only corpus-duplicated spans are shed") {
    val shared = junk("span", 12)
    val corpus = Seq((10L, junk("p", 20) + " " + shared + " " + junk("q", 20)))
      .toDF("doc_id", "text")
    val idx = Dedup.buildWinnowIndex(corpus)
    val novel = junk("n", 40)
    val copier = junk("r", 25) + " " + shared + " " + junk("s", 15)
    val batch = Seq((20L, copier), (21L, novel)).toDF("doc_id", "text")
    val out = Dedup.winnowCleanAgainstIndex(batch, idx)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(20L, 21L), "every batch doc comes back")
    val Array(cleaned, untouched) = out
    assert(untouched._3 == 0L && untouched._4 == 0L &&
      untouched._2 == novel.toLowerCase.trim.replaceAll("\\s+", " "),
      "the novel doc passes through normalized-identical with zero counters")
    assert(cleaned._3 > 0L && cleaned._4 >= 1L &&
      !cleaned._2.contains(shared.substring(30, 100)),
      s"the copier sheds the donor span interior: $cleaned")
    assert(cleaned._2.startsWith(junk("r", 25).toLowerCase.substring(0, 20)),
      "the copier's novel prefix survives excision")
  }

  test("append == build on the increment: day-2 index equals the full rebuild exactly") {
    val docs = (1L to 30L).map(i => (i, junk(s"d$i", 30))).toDF("doc_id", "text")
    val day1 = docs.filter(col("doc_id") <= 20)
    val day2 = docs.filter(col("doc_id") > 20)
    val grown = Dedup.buildWinnowIndex(day1)
      .unionAll(Dedup.appendToWinnowIndex(day2))
    val rebuilt = Dedup.buildWinnowIndex(docs)
    assert(grown.exceptAll(rebuilt).isEmpty && rebuilt.exceptAll(grown).isEmpty,
      "winnow selection is doc-local: growth must never change the index")
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

  test("pair-budget guard: copy corpus refuses loudly naming the remedies, normal corpus passes, volume exact") {
    val base = junk("guard", 40)
    val copies = (1L to 30L).map(i => (i, base)).toDF("doc_id", "text")
    // the 30x-copy shape that OOMed WinnowBench: the guard fires BEFORE
    // the pair join launches, naming every registered alternative
    val ex = intercept[IllegalStateException] {
      Dedup.winnowOverlap(copies, minShared = 1L, pairBudget = 1000L)
    }
    assert(ex.getMessage.contains("maxDf"), ex.getMessage)
    assert(ex.getMessage.contains("winnowOverlapAgainstIndex"), ex.getMessage)
    assert(ex.getMessage.contains("dedupExact"), ex.getMessage)
    intercept[IllegalStateException] {
      Dedup.winnowSharedSpans(copies, pairBudget = 1000L)
    }
    val exP = intercept[IllegalStateException] {
      Dedup.shingleJaccardPrefixDocs(copies, pairBudget = 100L)
    }
    assert(exP.getMessage.contains("dedupAgainstPrefixIndex"), exP.getMessage)
    // the estimate is EXACT, not a bound: 30 identical docs sharing all
    // nFp prints yield nFp * C(30,2) candidate pairs
    val nFp = Dedup.winnowFingerprints(copies.filter(col("doc_id") === 1L))
      .select("h").distinct().count()
    val fp = Dedup.winnowFingerprints(copies)
      .select(col("doc_id"), col("h")).distinct()
    assert(Dedup.candidatePairVolume(fp, "h", "doc_id") == nFp * 435L,
      s"expected ${nFp * 435L}")
    // a disjoint corpus sails through the same tight budget
    val normal = (1L to 10L).map(i => (i, junk(s"n$i", 40))).toDF("doc_id", "text")
    assert(Dedup.winnowOverlap(normal, minShared = 1L, pairBudget = 1000L)
      .count() == 0L)
    assert(Dedup.shingleJaccardPrefixDocs(normal, pairBudget = 1000L)
      .count() == 10L)
    // and the named remedy works: maxDf=16 suppresses every df-30 print,
    // bringing the copy corpus back under the very same budget
    assert(Dedup.winnowOverlap(copies, minShared = 1L, maxDf = Some(16L),
      pairBudget = 1000L).count() == 0L)
  }

  test("df histogram: persisted-histogram suppression is bit-identical to the recompute, and goes stale only upward") {
    val boiler = junk("boiler", 10)
    val rare = junk("rare", 10)
    val corpus = (1L to 6L).map(i =>
      (i, junk(s"own$i", 10) + " " + boiler + " " +
        (if (i <= 2) rare + " " else "") + junk(s"tail$i", 10)))
      .toDF("doc_id", "text")
    val idx = Dedup.buildWinnowIndex(corpus)
    val hist = Dedup.winnowDfHistogram(idx)
    val batch = Seq((20L, junk("b", 8) + " " + boiler + " " + rare + " " +
      junk("b2", 8))).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(col("doc_id"), col("corpus_id"), col("start"), col("c_start"))
        .collect().toSeq
    val fresh = rows(Dedup.winnowSpansAgainstIndex(batch, idx,
      minPrints = 2L, maxDf = Some(4L)))
    val viaHist = rows(Dedup.winnowSpansAgainstIndex(batch, idx,
      minPrints = 2L, maxDf = Some(4L), dfHist = Some(hist)))
    assert(fresh == viaHist,
      "histogram-backed suppression must verdict bit-identically")
    assert(fresh.nonEmpty && fresh.forall(r => Set(1L, 2L)(r.getLong(1))),
      s"only the rare (df=2) span survives df<=4: $fresh")
    // the overlap probe takes the same artifact
    val ov = Dedup.winnowOverlapAgainstIndex(batch, idx, minShared = 1L,
      maxDf = Some(4L), dfHist = Some(hist)).collect().head
    assert(ov.getBoolean(1) && Set(1L, 2L)(ov.getLong(2)), s"$ov")
    // staleness is one-directional: appends only RAISE true df, so a
    // stale histogram suppresses less, never more — the clean probe
    // with a stale histogram still sheds the rare span it knows about
    val grown = idx.unionByName(
      Dedup.appendToWinnowIndex(Seq((30L, junk("new", 5) + " " + rare))
        .toDF("doc_id", "text")))
    val staleRows = rows(Dedup.winnowSpansAgainstIndex(batch, grown,
      minPrints = 2L, maxDf = Some(4L), dfHist = Some(hist)))
    assert(staleRows.map(r => (r.getLong(0), r.getLong(1))).toSet
      .intersect(Set((20L, 1L), (20L, 2L))).nonEmpty,
      "a stale histogram keeps suppressing what it knew — it errs open, not closed")
    // errs-open is probed on a fingerprint the histogram has NEVER
    // seen (round-17 advice): a batch doc copying the APPENDED doc's
    // novel text must still localize its span through the stale
    // histogram — those prints have no df row, and hiding them would
    // hide a real duplicate
    val novelBatch = Seq((40L, junk("pre", 8) + " " + junk("new", 5) + " " +
      junk("post", 8))).toDF("doc_id", "text")
    val novelRows = rows(Dedup.winnowSpansAgainstIndex(novelBatch, grown,
      minPrints = 2L, maxDf = Some(4L), dfHist = Some(hist)))
    assert(novelRows.exists(r => r.getLong(0) == 40L && r.getLong(1) == 30L),
      s"append-only fingerprints must pass a stale histogram unsuppressed: $novelRows")
    // and the provenance guard is loud: a histogram from a
    // different-(k,w) index refuses instead of mis-suppressing
    val wrongHist = Dedup.winnowDfHistogram(
      Dedup.buildWinnowIndex(corpus, k = 7, w = 3))
    val exM = intercept[IllegalArgumentException] {
      Dedup.winnowSpansAgainstIndex(batch, idx, minPrints = 2L,
        maxDf = Some(4L), dfHist = Some(wrongHist)).collect()
    }
    assert(exM.getMessage.contains("wrong gram population"), exM.getMessage)
  }
}

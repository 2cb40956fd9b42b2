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

  test("crawl ingest: quarantine beats gate beats dup, blocked keeper never shields recrawls") {
    def rec(uri: String, payload: String, declared: Int) =
      s"WARC/1.0\nWARC-Type: conversion\nWARC-Target-URI: $uri\n" +
        s"WARC-Date: 2024-03-03T00:00:00Z\nContent-Length: $declared\n\n$payload\n\n"
    val chunk =
      rec("https://good.com/a", "one two three", 13) +     // kept
      rec("https://good.com/a", "one two three", 13) +     // recrawl → url_dup
      rec("https://bad.com/x", "spam spam", 9) +           // blocked
      rec("https://good.com/b", "truncated", 99) +         // bad length
      // same-URI pair where the earlier record is quarantined: the
      // later intact one must be KEPT, not a dup of a quarantined keeper
      rec("https://good.com/c", "broken", 42) +
      rec("https://good.com/c", "four five", 9) +
      // envelope failures beyond a lying length: a record with NO
      // Content-Length header and one with NO target URI both
      // quarantine (never null-skip to kept, never collide in an
      // empty-URI dedup group)
      "WARC/1.0\nWARC-Target-URI: https://good.com/d\n\nno length header\n\n" +
      "WARC/1.0\nWARC-Type: conversion\nContent-Length: 6\n\nno uri\n\n"
    val chunks = Seq((1L, chunk)).toDF("chunk_id", "content")
    val bl = Seq("bad.com").toDF("pattern")
    val out = Pipeline.crawlIngestReport(chunks, "chunk_id", "content", bl)
      .orderBy(col("domain"))
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toList
    assert(out === List(
      ("", 1L, 1L, 0L, 0L, 0L, 0L),              // the URI-less record
      ("bad.com", 1L, 0L, 1L, 0L, 0L, 0L),
      ("good.com", 6L, 3L, 0L, 1L, 2L, 5L)))
    out.foreach { case (d, n, b, bk, du, k, _) =>
      assert(b + bk + du + k === n, s"domain $d counts overlap") }
    // a string chunk-id column must refuse loudly, not join nothing
    intercept[IllegalArgumentException] {
      Pipeline.crawlIngestReport(
        Seq(("CC-MAIN-0001", chunk)).toDF("chunk_id", "content"),
        "chunk_id", "content", bl)
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

  test("q132 day-2 curation probe: block-crossing donors dup, counts disjoint, census strip fires") {
    val out = Pipeline.curationProbeDocs(spark, sfDir)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty, "the block split must leave a batch even at sf0.001")
    out.foreach { case (d, n, td, gf, k, _) =>
      assert(td + gf + k === n, s"domain $d counts overlap") }
    // odd batch pages carry the id−20 donor body → each is a probe hit
    // against the day-1 index, EXCEPT pages whose rare-notice line
    // (id ≡ 4 mod 125, sub-threshold → survives the strip) makes the
    // normalized clean text differ from the donor's
    val ids = Tables(spark, sfDir).documents
      .select(col("doc_id")).as[Long].collect().toSet
    val expected = ids.count(id => (id / 20) % 5 == 1 && id % 2 == 1 &&
      ids.contains(id - 20) && id % 125 != 4)
    assert(out.map(_._3).sum === expected.toLong,
      s"every odd batch page must dup its corpus donor ($expected expected): ${out.toSeq}")
    assert(out.map(_._5).sum > 0, "clean batch pages must survive the probe")
  }

  test("q127 corpus build: one composed plan, packing invariants hold, exchanges bounded") {
    import graft.operators.Sharding
    val df = Pipeline.corpusBuildDocs(spark, sfDir)
    val out = df.as[(Int, Long, Long, Long, String, String)].collect()
    assert(out.nonEmpty, "the built corpus must contain sequences")
    val budget = 2048L
    out.foreach { case (shard, chunk, nDocs, total, ids, offs) =>
      val idList = ids.split(",").map(_.toLong)
      val offList = offs.split(",").map(_.toLong)
      assert(idList.length === nDocs && offList.length === nDocs)
      // member rec_ids sorted, offsets start at 0 and strictly increase
      assert(idList.sorted.sameElements(idList), s"$shard/$chunk ids unsorted")
      assert(offList.head === 0L, s"$shard/$chunk first offset must be 0")
      assert(offList.sorted.sameElements(offList) && offList.distinct.length == nDocs,
        s"$shard/$chunk offsets must strictly increase")
      // the q45 budget-plus-one-document bound: every doc STARTS below
      // the budget, so a sequence can overshoot by at most one doc
      assert(offList.last < budget, s"$shard/$chunk last doc starts past the budget")
      // offsets are exclusive token prefixes: last offset + its doc's
      // tokens = total
      assert(offList.last <= total - 1, s"$shard/$chunk offsets exceed tokens")
      // members route to their shard
      idList.foreach(i => assert((i % 8).toInt === shard))
    }
    // docs never repeat across sequences (the exact dedup + election
    // upstream make rec_ids unique in the pool)
    val allIds = out.flatMap(_._5.split(",").map(_.toLong))
    assert(allIds.distinct.length === allIds.length, "a doc appeared in two sequences")
    // the composed plan stays bounded: past the materialized record
    // stage, the back half adds only the election window, the mix
    // aggregate + broadcast join-back, the packing shard window, and
    // the final rollup — single digits of exchanges total, no
    // cartesian anywhere (the registered-query ExplainAudit re-checks
    // the latter for every round)
    val plan = df.queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 10, s"composed corpus build grew to $exchanges exchanges:\n${plan.take(900)}")
    assert(!plan.contains("CartesianProduct"), "corpus build must not plan a cartesian")
  }

  test("q127 persistDir: persisted-waist run is bit-exact; a resumed run never scans the chunks") {
    import graft.operators.Urls
    val docs = Tables(spark, "/root/testdata/sf0.001").documents
    val chunks = graft.sources.Warc.plantedCorpusChunks(docs)
    val blocklist = Urls.docBlocklist.toDF("pattern")
    def run(c: org.apache.spark.sql.DataFrame, dir: Option[String]) =
      Pipeline.corpusBuild(c, "chunk_id", "content", blocklist,
        targetDocs = 40L, persistDir = dir)
        .as[(Int, Long, Long, Long, String, String)].collect().toSeq
    val inMem = run(chunks, None)
    val dir = java.nio.file.Files.createTempDirectory("graft_waists").toString
    // first persisted run writes both waists and answers identically
    assert(run(chunks, Some(dir)) == inMem,
      "persisted-waist run must equal the in-memory run bit-exactly")
    assert(new java.io.File(s"$dir/records").exists && new java.io.File(s"$dir/gated").exists,
      "both waists must persist as parquet tables")
    // resumed run: the chunk frame is POISONED — any stage that scans
    // it throws — so an identical answer PROVES the parse (and the
    // whole parse→clean→dedup→gate subtree behind the gated waist)
    // never re-executed: zero chunk-scan jobs
    val poisoned = chunks.select(col("chunk_id"),
      when(lit(true),
        raise_error(lit("resumed corpusBuild scanned the chunks")).cast("string"))
        .otherwise(col("content")).as("content"))
    assert(run(poisoned, Some(dir)) == inMem,
      "resumed run must answer from the persisted waists alone")
    // crash-resume guard (round-14 advice): a waist dir WITHOUT its
    // _SUCCESS marker is a mid-commit casualty — readable parquet, but
    // possibly truncated. TRUNCATE the records waist to one row and
    // delete its marker: an un-guarded resume would adopt the partial
    // table and silently build a wrong corpus; the guard must rebuild
    // from the (real) chunks and answer identically.
    val recDir = new java.io.File(s"$dir/records")
    val partFiles = recDir.listFiles.filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    partFiles.drop(1).foreach(_.delete())
    assert(new java.io.File(recDir, "_SUCCESS").delete(), "marker must exist to delete")
    // the downstream gated waist goes too (the crash happened during
    // the records commit, before gated ever wrote) — so adopting the
    // truncated records table WOULD change the answer
    val gatedDir = new java.io.File(s"$dir/gated")
    gatedDir.listFiles.foreach(_.delete()); assert(gatedDir.delete())
    assert(run(chunks, Some(dir)) == inMem,
      "a markerless (partial) waist must be rebuilt, not adopted")
    assert(new java.io.File(recDir, "_SUCCESS").exists,
      "the rebuild must leave a complete, marked waist behind")
  }

  // rec_id is closed-form under the q174 serializer: chunk = doc DIV 40,
  // every doc 0..N-1 present, records in doc order behind the preamble
  private def recId(d: Long): Long = (d / 40) * (1L << 32) + d % 40 + 1

  test("q174 master pipeline: every stage does certified work and the shipped pool satisfies its own post-conditions") {
    import graft.operators.{Dedup, Urls}
    val docs = Tables(spark, sfDir).documents
    val chunks = graft.sources.Warc.plantedMasterChunks(docs)
    val dir = java.nio.file.Files.createTempDirectory("graft_master").toString
    val out = Pipeline.masterPipeline(chunks, "chunk_id", "content",
      Urls.docBlocklist.toDF("pattern"), Pipeline.masterWeights,
      persistDir = Some(dir))
    val rows = out.as[(Int, Long, Long, Long, String)].collect()
    assert(rows.nonEmpty, "the export must contain chunks")
    // ---- output invariants: BOS/EOS-delimited streams, exact budgets
    rows.foreach { case (shard, chunk, nDocs, total, ids) =>
      val idList = ids.split(",").map(_.toLong)
      assert(idList.length == total, s"$shard/$chunk total_tokens must equal the stream length")
      assert(idList.count(_ == 0L) == nDocs && idList.count(_ == 1L) == nDocs,
        s"$shard/$chunk must carry exactly one BOS and one EOS per doc")
      assert(idList.head == 0L && idList.last == 1L,
        s"$shard/$chunk stream must open with BOS and close with EOS")
    }
    // per-shard chunk ids contiguous from 0 (greedy packing in order)
    rows.groupBy(_._1).foreach { case (s, rs) =>
      assert(rs.map(_._2).sorted.sameElements(rs.indices.map(_.toLong)),
        s"shard $s chunk ids must be contiguous from 0")
    }
    // ---- the clean waist satisfies the dedup tiers' own post-conditions
    val clean = spark.read.parquet(s"$dir/clean").localCheckpoint()
    assert(clean.select("clean_text").distinct().count() == clean.count(),
      "exact election: no two shipped docs share a clean text")
    assert(Dedup.shingleJaccardPrefixDocs(
        clean.select(col("doc_id"), col("clean_text").as("text")),
        jaccardThreshold = 0.8)
      .filter(col("is_dup")).count() == 0L,
      "near dedup: the shipped pool carries no pair at Jaccard >= tau")
    assert(Dedup.winnowSharedSpans(
        clean.select(col("doc_id"), col("clean_text").as("text")),
        minPrints = 60L).count() == 0L,
      "winnow: the shipped pool carries no duplicated span at the policy grain")
    // ---- plant fates (sf0.001-pinned, the LayoutSpec convention)
    val cleanIds = clean.select(col("doc_id")).as[Long].collect().toSet
    // exact: doc 9 (whole copy of doc 5) died at the election, donor lives
    assert(!cleanIds.contains(recId(9)) && cleanIds.contains(recId(5)),
      "the whole-copy plant must lose to its donor at the exact election")
    // winnow: doc 73 (long-span copier carrying doc 71's full text
    // before its own) kept ONLY its novel text — the donor span is
    // excised, the donor intact (doc 13's donor 11 fails the word gate
    // at this SF, so the 73/71 pair is the stable pin)
    val norm = (s: String) => s.toLowerCase.trim.replaceAll("\\s+", " ")
    val t71 = norm(docs.filter(col("doc_id") === 71).select("text").as[String].head())
    val t73own = norm(docs.filter(col("doc_id") === 73).select("text").as[String].head())
    val c73 = clean.filter(col("doc_id") === recId(73))
      .select("clean_text").as[String].head()
    assert(!c73.contains(t71) && c73.contains(t73own),
      "the long-span copier must shed the donor span and keep its own text")
    val c71 = clean.filter(col("doc_id") === recId(71))
      .select("clean_text").as[String].head()
    assert(c71.contains(t71), "the span donor keeps its copy (one survives)")
    // ---- the firewall fired in BOTH leak directions (seed-40 split:
    // src11 train / src17 val, src2 test / src4 train)
    val trainW = spark.read.parquet(s"$dir/train")
    val trainIds = trainW.select(col("doc_id")).as[Long].collect().toSet
    // val→train: doc 51 (src11, train) is the donor whose 14-word
    // opening doc 57 (src17, val) quotes — it must flag OUT of train
    assert(cleanIds.contains(recId(51)) && !trainIds.contains(recId(51)),
      "val→train leak: the quoted train donor must be firewalled")
    assert(trainIds.contains(recId(71)),
      "an unquoted src11 sibling stays in train (the control)")
    // train→test: doc 4 (src4, train) quotes doc 2's (src2, test)
    // opening — the quoting train doc must flag out
    assert(cleanIds.contains(recId(4)) && !trainIds.contains(recId(4)),
      "train→test leak: the quoting train doc must be firewalled")
    assert(trainIds.contains(recId(24)),
      "a src4 sibling whose donor quote healed or never fired stays (the control)")
    // blocked hosts never ship
    assert(clean.filter(col("source").isin(
      "src3.example.com", "src7.example.com", "src12.example.com")).count() == 0L,
      "blocklisted hosts must not reach the pool")
    // ---- no cartesian in the composed plan
    assert(!out.queryExecution.executedPlan.toString.contains("CartesianProduct"),
      "the master pipeline must not plan a cartesian")
  }

  test("q174 persistDir: the three-waist ladder resumes mid-chain, byte-identical shards, zero upstream re-execution") {
    import graft.operators.Urls
    val docs = Tables(spark, sfDir).documents
    val chunks = graft.sources.Warc.plantedMasterChunks(docs)
    val blocklist = Urls.docBlocklist.toDF("pattern")
    def run(c: org.apache.spark.sql.DataFrame, dir: Option[String]) =
      Pipeline.masterPipeline(c, "chunk_id", "content", blocklist,
        Pipeline.masterWeights, persistDir = dir)
        .as[(Int, Long, Long, Long, String)].collect().toSeq
    val inMem = run(chunks, None)
    val dir = java.nio.file.Files.createTempDirectory("graft_master_w").toString
    assert(run(chunks, Some(dir)) == inMem,
      "persisted-waist run must equal the in-memory run value-exactly")
    Seq("records", "clean", "train").foreach(w =>
      assert(new java.io.File(s"$dir/$w/_SUCCESS").exists, s"waist $w must persist marked"))
    // full resume: poisoned chunks prove zero chunk-scan jobs
    val poisoned = chunks.select(col("chunk_id"),
      when(lit(true),
        raise_error(lit("resumed masterPipeline scanned the chunks")).cast("string"))
        .otherwise(col("content")).as("content"))
    assert(run(poisoned, Some(dir)) == inMem,
      "a fully-resumed run answers from the waists alone")
    // MID-CHAIN restart: the crash hit between the records commit and
    // the clean commit — downstream waists are gone, records stands.
    // The rerun must rebuild clean+train FROM the records waist (the
    // chunks stay poisoned: equality also proves the parse never reran)
    // and ship byte-identical shards.
    def rmWaist(name: String): Unit = {
      val d = new java.io.File(s"$dir/$name")
      d.listFiles.foreach(_.delete()); assert(d.delete(), s"cleanup of $name failed")
    }
    rmWaist("clean"); rmWaist("train")
    assert(run(poisoned, Some(dir)) == inMem,
      "a mid-chain restart must resume from the records waist and ship identical shards")
    // markerless downstream waist = mid-commit casualty: truncate train,
    // drop its marker — the rerun must rebuild it from clean (chunks
    // still poisoned), never adopt the partial table
    val trainDir = new java.io.File(s"$dir/train")
    trainDir.listFiles.filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      .drop(1).foreach(_.delete())
    assert(new java.io.File(trainDir, "_SUCCESS").delete(), "marker must exist")
    assert(run(poisoned, Some(dir)) == inMem,
      "a markerless (partial) train waist must be rebuilt, not adopted")
    assert(new java.io.File(trainDir, "_SUCCESS").exists,
      "the rebuild leaves a complete, marked waist behind")
  }

  test("q178 day-2 master ingest: every fate fires, keepers point at the right day, both leak directions live") {
    val out = Pipeline.masterIngestDocs(spark, sfDir)
      .withColumn("doc_id",
        (col("rec_id") / 4294967296L).cast("long") * 40 +
          col("rec_id") % 4294967296L - 1)
      .localCheckpoint()
    val fates = out.groupBy(col("fate")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // every plantable fate fires at the smallest SF ('empty' is the one
    // defensive fate these pages cannot produce: the body line always
    // survives the line rules)
    for (f <- Seq("bad_envelope", "blocked", "url_dup_corpus",
        "url_dup_batch", "exact_dup_corpus", "exact_dup_batch",
        "near_dup_corpus", "near_dup_batch", "gate_failed",
        "eval_heldout", "contaminated", "shipped"))
      assert(fates.getOrElse(f, 0L) >= 1L, s"fate '$f' never fired")
    // keeper DAY discipline: *_corpus keepers are day-1 rec_ids
    // (chunk ≢ 4 mod 5), *_batch keepers are batch rec_ids (chunk ≡ 4)
    val dayOf = (col("dup_of") / 4294967296L).cast("long") % 5
    assert(out.filter(col("fate").endsWith("_corpus") && dayOf === 4)
      .count() === 0, "a corpus-dup keeper pointed into the batch")
    assert(out.filter(col("fate").endsWith("_batch") && dayOf =!= 4)
      .count() === 0, "a batch-dup keeper pointed outside the batch")
    // BOTH leak directions: residue 4 (frozen day-1 host-5 grams) and
    // residue 6 (the batch's own heldout host-5 doc extends the index)
    val contamRes = out.filter(col("fate") === "contaminated")
      .select((col("doc_id") % 10).as("r")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(contamRes.contains(4L), "the day-1→day-2 leak leg never fired")
    assert(contamRes.contains(6L), "the within-day-2 leak leg never fired")
    // eval_heldout is EXACTLY the seed-4 heldout host set
    val heldHosts = out.filter(col("fate") === "eval_heldout")
      .select((col("doc_id") % 20).as("h")).distinct()
      .collect().map(_.getLong(0)).toSet
    val expected = (0L until 20L).filter(h =>
      Pipeline.splitOfKey(s"src$h.example.com",
        Pipeline.MasterIngestSeed) != "train").toSet
    assert(heldHosts.subsetOf(expected),
      s"a train host leaked into eval_heldout: ${heldHosts -- expected}")
    assert(heldHosts.contains(5L),
      "the src5 donor host must land heldout — the leak plants depend on it")
    // shipped docs carry real BOS/EOS-delimited id streams; winnow
    // excision fired on both the corpus-witnessed and batch-internal
    // residues before they shipped
    val shipped = out.filter(col("fate") === "shipped").localCheckpoint()
    assert(shipped.filter(!col("ids").startsWith("0,")).count() === 0,
      "a shipped id stream does not start with BOS")
    assert(shipped.filter(!col("ids").endsWith(",1")).count() === 0,
      "a shipped id stream does not end with EOS")
    assert(shipped.filter(col("n_tokens") <= 2).count() === 0,
      "a shipped doc encoded to an empty id stream")
    val spanRes = out.filter(col("n_spans") > 0)
      .select((col("doc_id") % 10).as("r")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(spanRes.contains(3L),
      "no corpus-witnessed span excision reached the output")
    assert(spanRes.contains(8L),
      "no within-batch span excision reached the output")
  }

  test("winnowMaxDf: the guard's remedy is reachable at the chain grain and the chain stays live across its range") {
    import graft.operators.Urls
    // the knob exists for the template regime (MasterScaleBench's copy
    // corpora: the default chain refuses at 438M winnow candidate
    // pairs, maxDf completes). The per-span semantics — boilerplate
    // spans vanish, rare plant-grade spans survive, bit-identity with
    // a fresh histogram — are WinnowSpec's oracle-backed jurisdiction;
    // what the CHAIN owes is reachability: every stage downstream of a
    // suppressed winnow still runs, ships, and reacts (suppression is
    // NOT token-monotone at the chain grain — sparing a template span
    // can push a doc past maxWords and the gate drops it whole, which
    // is exactly the published dedup-before-gate order doing its job)
    val docs = Tables(spark, sfDir).documents
    val chunks = graft.sources.Warc.plantedMasterChunks(docs).localCheckpoint()
    val bl = Urls.docBlocklist.toDF("pattern")
    def run(maxDf: Option[Long]) =
      Pipeline.masterPipeline(chunks, "chunk_id", "content", bl,
        Pipeline.masterWeights, winnowMaxDf = maxDf)
        .as[(Int, Long, Long, Long, String)].collect().toSeq
    def tokens(r: Seq[(Int, Long, Long, Long, String)]) = r.map(_._4).sum
    val dflt = run(None)
    val s16 = run(Some(16L))
    val s2 = run(Some(2L))
    assert(dflt.nonEmpty && s16.nonEmpty && s2.nonEmpty,
      "the chain must ship at every suppression setting")
    // the knob is LIVE end to end: this corpus's natural template
    // overlap rides >16-df prints, so suppressing them must change
    // what ships (a knob the chain silently ignored would pass a
    // pure reachability probe)
    assert(tokens(s16) != tokens(dflt) || s16 != dflt,
      "maxDf=16 must actually reach the winnow stage")
  }

  test("q179 master refresh: empty batch ships day-1 shards byte-identically, accepted docs join the order, the water-fill re-levels") {
    import graft.operators.{Sharding, Urls}
    val docs = Tables(spark, sfDir).documents.localCheckpoint()
    val bl = Urls.docBlocklist.toDF("pattern")
    val day1Chunks = graft.sources.Warc.plantedMasterChunks(docs)
      .filter(col("chunk_id") % 5 =!= 4)
    val f = Pipeline.masterFront(day1Chunks, "chunk_id", "content", bl,
      Pipeline.MasterIngestSeed, 15, 120, 0.65, 0.8, 60L,
      _ => _.localCheckpoint())
    val day1Enc = Pipeline.encodeBosEos(f.cleanTrain).localCheckpoint()
    // 1. the no-op contract: an EMPTY batch ships the day-1 shards
    //    byte-identically (mixAndPack is shared code, so this pins the
    //    union/select plumbing, not a re-implementation)
    val day1Shards = Pipeline.masterPipeline(day1Chunks, "chunk_id",
      "content", bl, Pipeline.masterWeights,
      splitSeed = Pipeline.MasterIngestSeed)
      .as[(Int, Long, Long, Long, String)].collect().toSeq
    val emptyRefresh = Pipeline.masterRefresh(day1Enc, day1Enc.limit(0),
      Pipeline.masterWeights)
      .as[(Int, Long, Long, Long, String)].collect().toSeq
    assert(emptyRefresh == day1Shards,
      "an empty batch must ship byte-identical day-1 shards")
    // 2. the real refresh: accepted batch docs appear in the new order
    val r = Pipeline.masterIngestFull(
      graft.sources.Warc.plantedMasterBatchChunks(docs),
      "chunk_id", "content", bl, Pipeline.masterArtifactsOf(f, 0.8),
      splitSeed = Pipeline.MasterIngestSeed)
    val accepted = r.accepted.localCheckpoint()
    assert(accepted.count() >= 1, "the q178 plants must ship ≥1 batch doc")
    val refreshed = Pipeline.masterRefresh(day1Enc, accepted,
      Pipeline.masterWeights)
      .as[(Int, Long, Long, Long, String)].collect().toSeq
    assert(refreshed != day1Shards, "the refresh must move the pack")
    val allIds = refreshed.map(_._5).mkString("|")
    val acceptedStreams = accepted
      .select(array_join(transform(col("dseq"), x => x.cast("string")), ","))
      .as[String].collect()
    assert(acceptedStreams.exists(allIds.contains),
      "no accepted batch doc's id stream reached the packed shards")
    // 3. the water-fill re-levels: every accepted doc grows its
    //    source's pool, and that source's allocation must move (capped:
    //    capacity grew; uncapped: the budget grew) — the re-plan is
    //    real, not a replay of day-1 allocations
    def planOf(pool: org.apache.spark.sql.DataFrame) = {
      val tot = pool.agg(sum(col("n_tokens"))).first().getLong(0)
      Sharding.planMixture(pool, "source", "n_tokens",
        Pipeline.masterWeights, budgetTokens = tot * 3L / 2L)
        .select(col("source"), col("alloc_tokens"), col("capped"))
        .as[(String, Long, Boolean)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
    }
    val p1 = planOf(day1Enc)
    val pu = planOf(day1Enc.unionByName(
      accepted.select(col("doc_id"), col("source"), col("dseq"),
        col("n_tokens"))))
    val grownSources = accepted.select(col("source")).distinct()
      .as[String].collect().toSet
    assert(grownSources.exists(s =>
      pu.get(s).map(_._1).getOrElse(0L) > p1.get(s).map(_._1).getOrElse(0L)),
      s"no grown source re-levelled: day1=$p1 union=$pu grown=$grownSources")
    // both verdict paths stay live after the refresh (the q158 plant
    // contract carries to the union pool)
    assert(pu.values.exists(_._2) && pu.values.exists(!_._2),
      s"union plan must keep capped AND uncapped sources: $pu")
  }

  test("bucketed master bundle: cold reload keeps guards + census, verdicts bit-identical, corpus-side probes carry no Exchange") {
    import graft.operators.{Dedup, Urls}
    val docs = Tables(spark, sfDir).documents.localCheckpoint()
    val bl = Urls.docBlocklist.toDF("pattern")
    val day1 = graft.sources.Warc.plantedMasterChunks(docs)
      .filter(col("chunk_id") % 5 =!= 4)
    val art = Pipeline.masterArtifacts(day1, "chunk_id", "content", bl,
      splitSeed = Pipeline.MasterIngestSeed)
    val bdir = java.nio.file.Files.createTempDirectory("graft_bundle").toString
    Pipeline.persistMasterArtifacts(art, bdir, numBuckets = 8)
    // COLD-SESSION reload: drop every registered member table so load
    // exercises the DDL re-registration + metadata re-attach path
    Pipeline.BundleBucketKeys.keys.foreach { n =>
      spark.sql(s"DROP TABLE IF EXISTS `${Pipeline.bundleTable(bdir, n)}`")
    }
    val art2 = Pipeline.loadMasterArtifacts(spark, bdir)
    // the loud param guards survive the round trip (re-attached from
    // the parquet footers — DDL registration drops field metadata)
    val gMeta = art2.prefixPostings.schema("g").metadata
    assert(gMeta.contains("graft.prefix.k") && gMeta.contains("graft.prefix.t"),
      "prefix k/t metadata lost through the bucketed round trip")
    val hMeta = art2.winnowIndex.schema("h").metadata
    assert(hMeta.contains("graft.winnow.k") && hMeta.contains("graft.winnow.w"),
      "winnow k/w metadata lost through the bucketed round trip")
    assert(art2.evalGrams.schema("g").metadata.contains("graft.decontam.n"),
      "decontam n metadata lost through the bucketed round trip")
    // the census rides the bundle and is exact at persist
    val trueCensus = art.evalGrams.select(col("g")).distinct().count()
    assert(art2.evalGramCensus.contains(trueCensus),
      s"bundle census ${art2.evalGramCensus} != exact $trueCensus")
    // bit-identical day-2 verdicts through the persisted bundle
    val batch = graft.sources.Warc.plantedMasterBatchChunks(docs)
      .localCheckpoint()
    def fates(a: Pipeline.MasterArtifacts) =
      Pipeline.masterIngest(batch, "chunk_id", "content", bl, a,
        splitSeed = Pipeline.MasterIngestSeed)
        .as[(Long, String, String, Long, Long, Long, Long, String)]
        .collect().toSeq
    assert(fates(art2) == fates(art),
      "bucketed-bundle ingest verdicts drifted from the in-memory artifacts")
    // plan assert (the r17 `weak`'s done-criterion): with broadcast off,
    // every probe's INDEX side reads bucketed and sits under no shuffle
    // — only the batch exchanges. AQE off for the assert: its final
    // plans hide materialized stages behind leaf QueryStageExecs.
    val confs = Seq("spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.get(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import org.apache.spark.sql.execution.FileSourceScanExec
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
      import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
      val bdocs = docs.limit(50).select(col("doc_id"), col("text"))
        .localCheckpoint()
      val probes = Seq(
        "exact" -> Dedup.dedupExactAgainstIndex(bdocs, art2.exactIndex),
        "url" -> Urls.urlDedupAgainstIndex(
          docs.limit(50).select(col("doc_id"),
            concat(lit("https://x.example.com/"), col("doc_id")).as("uri"))
            .localCheckpoint(),
          art2.urlIndex, "doc_id", "uri"),
        "prefix" -> Dedup.dedupAgainstPrefixIndex(bdocs, art2.prefixPostings,
          art2.prefixGrams, art2.prefixVocab, k = 3, t = 0.8),
        "winnow" -> Dedup.winnowSpansAgainstIndex(bdocs, art2.winnowIndex,
          minPrints = 60L, maxDf = Some(8L),
          dfHist = Some(Pipeline.bundleMember(spark, bdir, "winnow_hist"))),
        "firewall" -> Dedup.flagAgainstEvalGrams(bdocs, art2.evalGrams,
          broadcastGramLimit = 0L,
          knownCensus = art2.evalGramCensus))
      for ((name, df) <- probes) {
        df.write.format("noop").mode("overwrite").save()
        val plan = df.queryExecution.executedPlan
        def isBundleScan(s: FileSourceScanExec) =
          s.relation.location.rootPaths.exists(_.toString.contains(bdir))
        // the claim is about the INDEX side, pre-join: an Exchange with
        // a bundle scan below it AND no join in between is shuffling
        // the raw index into its probe join (the r17 `weak`); exchanges
        // ABOVE a join move batch-sized join output, which is fine
        def scanBelowNoJoin(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
          p match {
            case s: FileSourceScanExec => isBundleScan(s)
            case _: org.apache.spark.sql.execution.BinaryExecNode => false
            case other => other.children.exists(scanBelowNoJoin)
          }
        val bad = plan.collect {
          case e: ShuffleExchangeLike if scanBelowNoJoin(e.child) => e
        }
        assert(bad.isEmpty,
          s"$name probe shuffles the bundle index side pre-join:\n$plan")
        val scans = plan.collect {
          case s: FileSourceScanExec if isBundleScan(s) => s }
        assert(scans.nonEmpty, s"$name probe read no bundle member:\n$plan")
        assert(scans.forall(_.outputPartitioning.isInstanceOf[HashPartitioning]),
          s"$name probe reads the bundle member UNBUCKETED:\n$plan")
      }
    } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
  }
}

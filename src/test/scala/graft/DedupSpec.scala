package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpecBase {
  import spark.implicits._

  // Planted corpus: 0/1 near-identical (one word差), 2 identical to 0,
  // 3/4 unrelated. Reps should cluster {0,1,2} and leave {3,4} alone.
  private val base = "the quick brown fox jumps over the lazy dog near the old river bank today " +
    "while morning light spreads across quiet fields and distant hills beyond the water line slowly"
  private lazy val planted = Seq(
    (0L, base),
    (1L, base.replace("today", "tonight")),
    (2L, base),
    (3L, "completely different content about spark catalyst optimizer rules and codegen stages"),
    (4L, "yet another unrelated snippet mentioning shuffle partitions and broadcast joins only")
  ).toDF("doc_id", "text")

  test("minhashLsh clusters planted near-duplicates") {
    // 32 hashes / 8 bands of 4: candidate probability ≈0.999 at J≈0.87,
    // so the planted pair is caught regardless of hash-family draws
    val out = Dedup.minhashLshDocs(planted, numHashes = 32, bands = 8)
      .select("doc_id", "rep_id", "is_dup").as[(Long, Long, Boolean)]
      .collect().sortBy(_._1)
    assert(out(0) == ((0L, 0L, false)))
    assert(out(1) == ((1L, 0L, true)))   // near-dup of 0
    assert(out(2) == ((2L, 0L, true)))   // exact dup of 0
    assert(!out(3)._3 && !out(4)._3)
  }

  test("simhash clusters exact and 1-word-off duplicates") {
    val out = Dedup.simhashDedupDocs(planted)
      .select("doc_id", "is_dup").as[(Long, Boolean)].collect().sortBy(_._1)
    assert(out(2)._2)                    // exact dup flagged
    assert(!out(3)._2 && !out(4)._2)     // unrelated untouched
  }

  test("portable simhash matches a reference md5 signature and clusters dups") {
    val out = Dedup.simhashDedupPortableDocs(planted)
      .select("doc_id", "simhash", "is_dup").as[(Long, Long, Boolean)]
      .collect().sortBy(_._1)
    assert(out(2)._3)                    // exact dup flagged
    assert(!out(3)._3 && !out(4)._3)     // unrelated untouched
    // signatures stay in the 60-bit portable range
    assert(out.forall(r => r._2 >= 0L && r._2 < (1L << 60)))
    // exact docs agree bit-for-bit; the 1-word-off pair is hamming-close
    assert(out(0)._2 == out(2)._2)
    assert(java.lang.Long.bitCount(out(0)._2 ^ out(1)._2) <= 3)
    // pin the kernel against an independently-computed reference: the
    // same tokens hashed via MessageDigest md5 here, first 15 nibbles,
    // strict-majority sign per bit — the contract the DuckDB oracle
    // relies on (('0x' || substr(md5(tok), 1, 15))::BIGINT)
    val toks = planted.filter(col("doc_id") === 0L).select("text")
      .as[String].head().toLowerCase.trim.split("\\s+")
    val md = java.security.MessageDigest.getInstance("MD5")
    val acc = new Array[Int](60)
    toks.foreach { t =>
      md.reset()
      val d = md.digest(t.getBytes("UTF-8"))
      val h = (0 until 8).foldLeft(0L)((a, j) => (a << 8) | (d(j) & 0xffL)) >>> 4
      (0 until 60).foreach(b => if (((h >>> b) & 1L) != 0L) acc(b) += 1 else acc(b) -= 1)
    }
    val expected = (0 until 60).foldLeft(0L)((s, b) => if (acc(b) > 0) s | (1L << b) else s)
    assert(out(0)._2 == expected)
  }

  test("ngramJaccard flags high-overlap pairs only") {
    val out = Dedup.ngramJaccardDocs(planted, dfCap = 10)
      .select("doc_id", "rep_id", "is_dup").as[(Long, Long, Boolean)]
      .collect().sortBy(_._1)
    assert(out(1)._3 && out(2)._3)
    assert(!out(3)._3 && !out(4)._3)
  }

  test("prefix-filtered Jaccard join matches brute force exactly") {
    // varied-length corpus with word overlap (mid-range similarities),
    // plus planted certain-dups: 24=copy of 0, 25=near-copy of 1, and an
    // identical tiny-doc pair (fewer tokens than the shingle width
    // exercises the padded short-doc shingle)
    val docs = ((0 until 24).map { i =>
      val words = (0 until (6 + i % 7)).map(j => s"w${(i * 3 + j * 5) % 17}")
      (i.toLong, words.mkString(" "))
    } ++ Seq(
      (24L, (0 until 6).map(j => s"w${(j * 5) % 17}").mkString(" ")),
      (25L, ((0 until 12).map(j => s"w${(3 + j * 5) % 17}") :+ "zz").mkString(" ")),
      (26L, "ab"), (27L, "ab"))).toDF("doc_id", "text")

    val out = Dedup.shingleJaccardPrefixDocs(docs)
      .select("doc_id", "rep_id", "is_dup").as[(Long, Long, Boolean)]
      .collect().sortBy(_._1)

    val g = docs.select(col("doc_id"),
      array_distinct(transform(Dedup.wordShingles(col("text")),
        x => xxhash64(x))).as("grams"))
    val brute = g.as("a").crossJoin(g.as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .withColumn("j",
        size(array_intersect(col("a.grams"), col("b.grams"))).cast("double") /
          size(array_union(col("a.grams"), col("b.grams"))))
      .filter(col("j") >= 0.5)
      .select(col("a.doc_id"), col("b.doc_id")).as[(Long, Long)].collect()
    val nbMin = brute.flatMap(p => Seq(p._1 -> p._2, p._2 -> p._1))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).min }
    val expected = (0L until 28L).map { id =>
      val rep = math.min(id, nbMin.getOrElse(id, id))
      (id, rep, rep < id)
    }
    assert(out.toSeq == expected)
    assert(out.count(_._3) >= 3, "planted dups must actually fire")
  }

  test("prefix join catches all-common-gram dups the df-capped index misses") {
    // 12 identical docs: every gram has df=12 > dfCap=10, so q23's
    // inverted index drops every bucket and verdicts nobody — the
    // documented approximation. The prefix index is lossless: rarest-
    // first ordering still indexes each doc's first prefix shingles,
    // and all 12 collapse onto doc 0.
    val twelve = (0 until 12).map(i => (i.toLong, base)).toDF("doc_id", "text")
    val capped = Dedup.ngramJaccardDocs(twelve, dfCap = 10)
      .filter(col("is_dup")).count()
    assert(capped == 0, "df-capped index should miss the all-common corpus")
    val exact = Dedup.shingleJaccardPrefixDocs(twelve)
      .select("doc_id", "rep_id", "is_dup").as[(Long, Long, Boolean)]
      .collect().sortBy(_._1)
    assert(exact.forall(r => r._2 == 0L))
    assert(exact.count(_._3) == 11)
  }

  test("prefix index is lossless on real data and prunes candidates") {
    val docs = Tables(spark, sfDir).documents.filter(col("doc_id") < 150)
    val g = docs.select(col("doc_id"),
      array_distinct(transform(Dedup.wordShingles(col("text")),
        x => xxhash64(x))).as("grams")).localCheckpoint()
    // full inverted index: every pair sharing ANY gram (uncapped)
    val post = g.select(col("doc_id"), explode(col("grams")).as("gr"))
    val candFull = post.as("a").join(post.as("b"), Seq("gr"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    val candPrefix = Dedup.prefixCandidatePairs(g, 0.5)
    val nFull = candFull.count(); val nPrefix = candPrefix.count()
    assert(nPrefix < nFull,
      s"prefix filter should prune the candidate space ($nPrefix vs $nFull)")
    // losslessness: every TRUE pair (verified J >= 0.5 over the full
    // candidate superset) must appear among the prefix candidates
    def verify(cand: org.apache.spark.sql.DataFrame) = cand
      .join(g.select(col("doc_id").as("id_a"), col("grams").as("ga")), Seq("id_a"))
      .join(g.select(col("doc_id").as("id_b"), col("grams").as("gb")), Seq("id_b"))
      .filter(size(array_intersect(col("ga"), col("gb"))).cast("double") /
        size(array_union(col("ga"), col("gb"))) >= 0.5)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    val truePairs = verify(candFull)
    assert(verify(candPrefix) == truePairs)
    val plan = Dedup.shingleJaccardPrefixDocs(docs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "prefix join must stay bucketed")
  }

  test("dedupLatest keeps exactly one row per key, the latest") {
    val out = Dedup.dedupLatest(spark, sfDir)
    val counts = out.groupBy("user_id", "event_type").count()
      .filter(col("count") > 1).count()
    assert(counts == 0)
    // spot-check: kept ts is the max ts for its key
    val ev = Tables(spark, sfDir).events
    val maxes = ev.groupBy("user_id", "event_type").agg(max("ts").as("max_ts"))
    val bad = out.join(maxes, Seq("user_id", "event_type"))
      .filter(col("ts") =!= col("max_ts")).count()
    assert(bad == 0)
  }

  test("candidate generation never cross-joins") {
    val plan = Dedup.minhashLshDocs(planted).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "minhash plan must stay bucketed")
    val plan2 = Dedup.ngramJaccardDocs(planted).queryExecution.executedPlan.toString
    assert(!plan2.contains("CartesianProduct"), "ngram plan must stay bucketed")
  }

  test("minhashIndexDocs rejects non-divisible banding parameters") {
    // 16 hashes in 5 bands would band only slots 1..15 while est_sim
    // used all 16 — and the broken parameters would persist into the
    // index metadata as if valid
    val ex = intercept[IllegalArgumentException] {
      Dedup.minhashIndexDocs(planted, numHashes = 16, bands = 5)
    }
    assert(ex.getMessage.contains("divisible"))
  }

  test("incremental dedup verdicts a batch against a persisted bucketed index") {
    import graft.sources.Bucketing
    // corpus index persisted ONCE, bucketed on the probe key
    Bucketing.writeBucketed(
      Dedup.minhashIndexDocs(planted, numHashes = 32, bands = 8),
      "mh_index", Seq("band", "bh"), numBuckets = 8)
    val index = spark.table("mh_index")
    // day-2 batch: near-dup of doc 0 (and its twin 2), exact copy of
    // doc 3, and genuinely new content
    val batch = Seq(
      (100L, base.replace("morning", "evening")),
      (101L, "completely different content about spark catalyst optimizer rules and codegen stages"),
      (102L, "entirely novel passage with no counterpart in the corpus at all whatsoever")
    ).toDF("doc_id", "text")
    val out = Dedup.dedupAgainstIndex(batch, index, numHashes = 32, bands = 8)
    out.collect()
    val rows = out.as[(Long, Boolean, Option[Long], Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    assert(rows(100L)._2 && rows(100L)._3.contains(0L),
      s"near-dup must match the smallest corpus twin: ${rows(100L)}")
    assert(rows(101L)._2 && rows(101L)._3.contains(3L) && rows(101L)._4.contains(1.0),
      s"exact copy must match doc 3 at sim 1.0: ${rows(101L)}")
    assert(!rows(102L)._2 && rows(102L)._3.isEmpty, s"novel doc must pass: ${rows(102L)}")

    // scale contract: the corpus side is pre-bucketed, so the stop-
    // bucket census runs with no exchange at all...
    val census = index.groupBy("band", "bh").agg(count(lit(1)))
    census.collect()
    val censusPlan = census.queryExecution.executedPlan.toString
    assert(!censusPlan.contains("Exchange hashpartitioning"),
      s"census over the bucketed index must not shuffle:\n${censusPlan.take(1200)}")
    // ...and the probe join re-partitions at most the BATCH side on
    // (band, bh) — the corpus never reshuffles on the probe key
    val probePlan = out.queryExecution.executedPlan.toString
    val bandExchanges = """Exchange hashpartitioning\(band""".r.findAllIn(probePlan).length
    assert(bandExchanges <= 1,
      s"only the batch side may shuffle on (band, bh), saw $bandExchanges:\n${probePlan.take(1500)}")

    // probing with parameters the index wasn't built with must fail
    // loudly — the build parameters survive the table round-trip in the
    // sig column's metadata
    val ex = intercept[IllegalArgumentException] {
      Dedup.dedupAgainstIndex(batch, index, numHashes = 16, bands = 4)
    }
    assert(ex.getMessage.contains("built with numHashes=32"), ex.getMessage)

    // decontamination is the same probe with train/eval roles: the
    // near-match of the "benchmark" doc drops, everything else survives
    val cleaned = Dedup.decontaminate(batch, index, numHashes = 32, bands = 8)
      .select("doc_id").as[Long].collect().toSet
    assert(cleaned == Set(102L), s"near-matches of indexed docs must drop: $cleaned")
  }

  test("prefix index: day-2 exact verdicts, frozen-vocab growth, param guard") {
    import graft.sources.Bucketing
    val (postings, grams, vocab) = Dedup.buildPrefixIndex(planted)
    Bucketing.writeBucketed(postings, "pfx_postings", Seq("g"), numBuckets = 8)
    Bucketing.writeBucketed(grams, "pfx_grams", Seq("doc_id"), numBuckets = 8)
    val post = spark.table("pfx_postings"); val gr = spark.table("pfx_grams")
    // day-2 batch: one-word edit of doc 0 (shingle J ≈ 25/31), exact
    // copy of doc 3, a genuinely novel doc, and an identical novel PAIR
    // (within-batch dups are out of scope by the q71 contract)
    val novel = "entirely novel passage with no counterpart in the corpus at all whatsoever"
    val batch = Seq(
      (100L, base.replace("morning", "evening")),
      (101L, "completely different content about spark catalyst optimizer rules and codegen stages"),
      (102L, novel), (103L, novel)
    ).toDF("doc_id", "text")
    val out = Dedup.dedupAgainstPrefixIndex(batch, post, gr, vocab)
    val rows = out.as[(Long, Boolean, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(rows(100L)._2 && rows(100L)._3 == 0L && rows(100L)._4 >= 0.5,
      s"near-dup must match doc 0 with its true Jaccard: ${rows(100L)}")
    assert(rows(101L)._2 && rows(101L)._3 == 3L && rows(101L)._4 == 1.0,
      s"exact copy must match doc 3 at J=1.0: ${rows(101L)}")
    assert(!rows(102L)._2 && rows(102L)._3 == -1L && !rows(103L)._2,
      "novel docs (and within-batch twins) must pass")

    // the probe may shuffle only the BATCH side on g — the bucketed
    // corpus postings never re-exchange on the probe key
    val probePlan = out.queryExecution.executedPlan.toString
    val gExchanges = """Exchange hashpartitioning\(g""".r.findAllIn(probePlan).length
    assert(gExchanges <= 1,
      s"only the batch side may shuffle on g, saw $gExchanges:\n${probePlan.take(1500)}")

    // frozen-vocab growth: append the accepted batch under the SAME
    // vocabulary, and a day-3 twin of an appended doc is caught even
    // though its shingles never appeared in the build-time corpus
    val accepted = batch.join(out.filter(!col("is_dup")).select("doc_id"), Seq("doc_id"))
    val (addPost, addGrams) = Dedup.appendToPrefixIndex(accepted, vocab)
    val day3 = Seq((200L, novel)).toDF("doc_id", "text")
    val out3 = Dedup.dedupAgainstPrefixIndex(day3,
      post.unionByName(addPost), gr.unionByName(addGrams), vocab)
      .as[(Long, Boolean, Long, Double)].collect()
    assert(out3.head == ((200L, true, 102L, 1.0)),
      s"twin of an appended doc must dup onto the smallest accepted id: ${out3.head}")

    // probing with parameters the index wasn't built with fails loudly —
    // the build params survive the bucketed-table round-trip in metadata
    val ex = intercept[IllegalArgumentException] {
      Dedup.dedupAgainstPrefixIndex(batch, post, gr, vocab, t = 0.7)
    }
    assert(ex.getMessage.contains("built with"), ex.getMessage)
  }

  test("exact n-gram contamination flags verbatim quotes, not paraphrases") {
    import spark.implicits._
    val benchmark = Seq(
      (0L, "what is the capital city of the ancient kingdom of lydia in western anatolia today")
    ).toDF("doc_id", "text")
    val train = Seq(
      // quotes a full 13-word window of the benchmark inside other text
      (10L, "some page discussing trivia like what is the capital city of the ancient kingdom of lydia in western anatolia and more"),
      // paraphrase: same topic, no shared 13-gram
      (11L, "a page about lydia an ancient kingdom whose capital sardis lay in western anatolia near the pactolus river"),
      (12L, "entirely unrelated content about spark shuffle partitions and memory tuning")
    ).toDF("doc_id", "text")
    val out = Dedup.flagNgramContamination(train, benchmark, n = 13)
      .as[(Long, Boolean)].collect().toMap
    assert(out == Map(10L -> true, 11L -> false, 12L -> false), s"got $out")
    // the corpus side must not shuffle: the only gram-keyed exchange
    // allowed is the one INSIDE the broadcast side (the eval distinct);
    // a second would mean the train gram stream started shuffling on g
    val plan = Dedup.flagNgramContamination(train, benchmark)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "eval gram set must broadcast")
    val gramExchanges = """Exchange hashpartitioning\(g#""".r.findAllIn(plan).length
    assert(gramExchanges <= 1,
      s"train grams must join map-side, saw $gramExchanges gram exchanges:\n${plan.take(1500)}")
  }

  test("firewall census gate: an over-limit gram set refuses the broadcast, verdicts bit-identical") {
    import spark.implicits._
    val benchmark = Seq(
      (0L, "what is the capital city of the ancient kingdom of lydia in western anatolia today")
    ).toDF("doc_id", "text")
    val train = Seq(
      (10L, "some page discussing trivia like what is the capital city of the ancient kingdom of lydia in western anatolia and more"),
      (11L, "a page about lydia an ancient kingdom whose capital sardis lay in western anatolia near the pactolus river"),
      (12L, "entirely unrelated content about spark shuffle partitions and memory tuning")
    ).toDF("doc_id", "text")
    val idx = Dedup.buildEvalGramIndex(benchmark)
    val small = Dedup.flagAgainstEvalGrams(train, idx)
    val large = Dedup.flagAgainstEvalGrams(train, idx, broadcastGramLimit = 0L)
    // same verdicts either side of the gate — join strategy must never
    // change WHO is contaminated
    assert(small.as[(Long, Boolean)].collect().toMap ===
      large.as[(Long, Boolean)].collect().toMap)
    assert(large.as[(Long, Boolean)].collect().toMap ==
      Map(10L -> true, 11L -> false, 12L -> false))
    // the scale regime's contract: the GRAM join carries no broadcast —
    // an eval set past the census limit is O(heldout corpus) in the
    // master chain and a forced broadcast there is an OOM by
    // construction (the r16 weak). The hits-side doc_id join may still
    // broadcast (it is bounded by the batch's contaminated set).
    val plan = large.queryExecution.executedPlan.toString
    assert("""BroadcastHashJoin \[g#""".r.findFirstIn(plan).isEmpty,
      s"gram join must not broadcast past the census limit:\n${plan.take(2000)}")
    assert("""ShuffledHashJoin \[g#""".r.findFirstIn(plan).isDefined,
      s"over-limit gram join must be a shuffled hash join:\n${plan.take(2000)}")
    // and the small regime keeps the certified map-side shape
    val smallPlan = small.queryExecution.executedPlan.toString
    assert("""BroadcastHashJoin \[g#""".r.findFirstIn(smallPlan).isDefined,
      s"under-limit gram set must still broadcast:\n${smallPlan.take(2000)}")
    // knownCensus (round 18): a caller-supplied census skips the
    // per-call count; a STALE-BUT-LARGER stat (the upper-bound
    // maintenance rule's only staleness direction) gates toward the
    // SHUFFLED regime — safe: verdicts stay bit-identical
    val stale = Dedup.flagAgainstEvalGrams(train, idx,
      knownCensus = Some(Dedup.DefaultEvalGramBroadcastLimit + 1))
    assert(stale.as[(Long, Boolean)].collect().toMap ===
      small.as[(Long, Boolean)].collect().toMap,
      "a stale-large census changed verdicts")
    val stalePlan = stale.queryExecution.executedPlan.toString
    assert("""BroadcastHashJoin \[g#""".r.findFirstIn(stalePlan).isEmpty &&
      """ShuffledHashJoin \[g#""".r.findFirstIn(stalePlan).isDefined,
      s"a stale-large census must err toward shuffle:\n${stalePlan.take(2000)}")
  }

  test("eval-gram census side file: write/read/bump round-trips; appendEvalGrams keeps the bound exact") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_census").toString
    val idxPath = s"$dir/eval_grams"
    val day1 = Seq((0L, (1 to 14).map(i => s"alpha$i").mkString(" ")))
      .toDF("doc_id", "text")
    Dedup.buildEvalGramIndex(day1).write.parquet(idxPath)
    assert(Dedup.readEvalGramCensus(spark, idxPath).isEmpty,
      "no census file yet — read must be None, not a guess")
    val c0 = spark.read.parquet(idxPath).distinct().count()
    Dedup.writeEvalGramCensus(spark, idxPath, c0)
    assert(Dedup.readEvalGramCensus(spark, idxPath).contains(c0))
    // a suite release appends NEW grams only and bumps by exactly that
    // count (re-appending the same docs adds nothing)
    val day2 = Seq(
      (1L, (1 to 14).map(i => s"alpha$i").mkString(" ")), // all grams known
      (2L, (1 to 14).map(i => s"beta$i").mkString(" ")))  // 2 new grams
      .toDF("doc_id", "text")
    val added = Dedup.appendEvalGrams(spark, day2, idxPath)
    assert(added == 2L, s"expected 2 novel 13-grams, got $added")
    val trueCensus = spark.read.parquet(idxPath).distinct().count()
    assert(Dedup.readEvalGramCensus(spark, idxPath).contains(trueCensus),
      "the appender must keep the census exact")
    assert(Dedup.appendEvalGrams(spark, day1, idxPath) == 0L,
      "replayed docs must append nothing")
    assert(Dedup.readEvalGramCensus(spark, idxPath).contains(trueCensus))
    // bump is the raw merge rule: stored + added (upper bound)
    assert(Dedup.bumpEvalGramCensus(spark, idxPath, 5L) == trueCensus + 5L)
  }

  test("splitDecontamDocs: the firewall fires on both sides of the plant, train rows only") {
    import spark.implicits._
    val out = Dedup.splitDecontamDocs(spark, sfDir)
      .as[(Long, String, String, Boolean)].collect()
    assert(out.nonEmpty && out.forall(_._3 == "train"),
      "the firewall reports the TRAIN side only")
    // the seed-9 plant: src15 originals (their text copied into src19 =
    // val) and src9 copies (carrying src5 = test text) must flag; the
    // split is by whole sources
    val bySrc = out.groupBy(_._2)
    assert(!bySrc.contains("src19") && !bySrc.contains("src5"),
      "held-out sources never appear on the train side")
    def mostly(src: String) = {
      val rows = bySrc(src)
      rows.count(_._4).toDouble / rows.size
    }
    assert(mostly("src15") > 0.8, "train originals of val copies flag")
    assert(mostly("src9") > 0.8, "train copies of test originals flag")
    val clean = out.filter(r => r._2 != "src15" && r._2 != "src9")
    assert(clean.count(!_._4).toDouble / clean.size > 0.8,
      "unrelated train sources stay overwhelmingly clean")
  }

  test("dupClusters resolves TRANSITIVE chains to the component minimum") {
    import spark.implicits._
    // chain 1-2-3-4 (no direct 1-4 edge!), pair 10-11, singleton edge 20-21
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (21L, 20L))
      .toDF("id_a", "id_b")
    val out = Dedup.dupClusters(pairs)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L),
      s"got $out — one-hop min-neighbor would leave 4 → 3")
  }

  test("dupClusters THROWS when a component's diameter exceeds maxIter (no silent splits)") {
    import spark.implicits._
    // a 12-node path needs ~11 propagation rounds; maxIter=3 must fail
    // loudly rather than return partial labels that split the cluster
    val chain = (0L until 11L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val ex = intercept[IllegalStateException] {
      Dedup.dupClusters(chain, maxIter = 3).collect()
    }
    assert(ex.getMessage.contains("did not converge"))
    // and with enough rounds the same chain collapses to one component
    val ok = Dedup.dupClusters(chain, maxIter = 20)
      .as[(Long, Long)].collect().toMap
    assert(ok.values.toSet == Set(0L) && ok.size == 12)
  }

  test("dupClustersLogN collapses a 200-node chain in O(log n) rounds") {
    import spark.implicits._
    // diameter 199: label propagation would need ~199 rounds; the
    // star-contraction variant needs ~log2(200) alternations
    val chain = (0L until 199L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val out = Dedup.dupClustersLogN(chain, maxIter = 15)
      .as[(Long, Long)].collect().toMap
    assert(out.size == 200 && out.values.toSet == Set(0L),
      s"chain must collapse to rep 0; got ${out.values.toSet}")
  }

  test("dupClustersLogN agrees with dupClusters on a clumpy multi-component graph") {
    import spark.implicits._
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L),   // clump
      (10L, 11L), (11L, 12L),                    // path
      (21L, 20L),                                // pair (reversed)
      (30L, 31L), (31L, 32L), (30L, 32L), (32L, 33L)
    ).toDF("id_a", "id_b")
    val prop = Dedup.dupClusters(pairs).as[(Long, Long)].collect().toMap
    val star = Dedup.dupClustersLogN(pairs).as[(Long, Long)].collect().toMap
    assert(star == prop, s"variants must agree: $star vs $prop")
  }

  test("dupClustersAuto finishes a long chain via the star switch") {
    import spark.implicits._
    // diameter 149 defeats 4 propagation rounds; auto must contract the
    // partially-labeled graph and finish with star contraction
    val chain = (0L until 149L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val out = Dedup.dupClustersAuto(chain, propagationRounds = 4, maxIter = 15)
      .as[(Long, Long)].collect().toMap
    assert(out.size == 150 && out.values.toSet == Set(0L),
      s"auto must collapse the chain to rep 0; got ${out.values.toSet}")
  }

  test("dupClustersAuto stays in propagation on a clumpy graph and matches dupClusters") {
    import spark.implicits._
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L),
      (10L, 11L), (11L, 12L),
      (21L, 20L),
      (30L, 31L), (31L, 32L), (30L, 32L), (32L, 33L)
    ).toDF("id_a", "id_b")
    // the clump graph's diameter is <= 3, so the propagation core itself
    // reports convergence within the default 4 rounds (never switching)
    val (_, converged) = Dedup.propagateLabels(
      pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
        .unionAll(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
        .distinct(), 4)
    assert(converged, "clump graph must converge inside the propagation budget")
    val auto = Dedup.dupClustersAuto(pairs).as[(Long, Long)].collect().toMap
    val prop = Dedup.dupClusters(pairs).as[(Long, Long)].collect().toMap
    assert(auto == prop, s"auto must match propagation: $auto vs $prop")
  }

  test("dropRepeatedParagraphs removes cross-document boilerplate, keeps order") {
    val banner = "accept our cookies"
    val footer = "all rights reserved"
    val docs = Seq(
      // banner in 3 docs (> maxDocs=2) → dropped everywhere;
      // footer in exactly 2 → kept; unique bodies always survive
      (1L, s"$banner\nalpha body one\n\nbravo body one\n$footer"),
      (2L, s"$banner\ncharlie body two\n$footer"),
      (3L, s"delta body three\n$banner\necho body three"),
      // all-boilerplate doc collapses to empty text but SURVIVES as a row
      (4L, s"$banner"),
      // blank-only doc: empty splits are whitespace, not paragraphs
      (5L, "\n\n")
    ).toDF("doc_id", "text")

    val out = Dedup.dropRepeatedParagraphs(docs, "doc_id", "text")
      .orderBy(col("doc_id"))
      .as[(Long, String, Long, Long)].collect().toSeq

    assert(out == Seq(
      // doc 1: blank split dropped as whitespace; order preserved
      (1L, s"alpha body one\nbravo body one\n$footer", 3L, 1L),
      (2L, s"charlie body two\n$footer", 2L, 1L),
      // doc 3: banner was MID-document — surrounding order intact
      (3L, s"delta body three\necho body three", 2L, 1L),
      (4L, "", 0L, 1L),
      (5L, "", 0L, 0L)), out.toString)
  }

  test("dropRepeatedParagraphs threshold boundary: exactly maxDocs docs keep theirs") {
    val shared = "shared once per doc"
    val docs = (1L to 4L).map(i => (i, s"$shared\nbody $i")).toDF("doc_id", "text")
    // maxDocs=4: shared appears in exactly 4 docs → NOT hot → kept
    val keep = Dedup.dropRepeatedParagraphs(docs, "doc_id", "text", maxDocs = 4)
      .orderBy(col("doc_id")).as[(Long, String, Long, Long)].collect()
    assert(keep.forall(r => r._2.startsWith(shared) && r._3 == 2L), keep.toSeq.toString)
    // maxDocs=3: 4 > 3 → dropped from all
    val drop = Dedup.dropRepeatedParagraphs(docs, "doc_id", "text", maxDocs = 3)
      .orderBy(col("doc_id")).as[(Long, String, Long, Long)].collect()
    assert(drop.forall(r => r._2 == s"body ${r._1}" && r._4 == 1L), drop.toSeq.toString)
    // repeats WITHIN one doc don't make a paragraph hot (distinct docs vote)
    val intra = Seq((1L, "dup line\ndup line\nunique"), (2L, "other")).toDF("doc_id", "text")
    val kept = Dedup.dropRepeatedParagraphs(intra, "doc_id", "text")
      .orderBy(col("doc_id")).as[(Long, String, Long, Long)].collect()
    assert(kept.head == ((1L, "dup line\ndup line\nunique", 3L, 0L)), kept.toSeq.toString)
  }

  test("graft_span_windows kernel: index = window start, empty below k, equality by content") {
    val out = spark.sql(
      """SELECT graft_span_windows(array('a','b','c','d'), 2) AS w,
        |       graft_span_windows(array('x'), 2) AS short,
        |       graft_span_windows(array('a','b'), 2) AS ab,
        |       graft_span_windows(array('b','c'), 2) AS bc""".stripMargin).head()
    val w = out.getSeq[Long](0)
    assert(w.length == 3, s"4 tokens, k=2 -> 3 windows: $w")
    assert(out.getSeq[Long](1).isEmpty, "below k -> no windows")
    // window content drives equality: ('a','b') at start 0 equals the
    // standalone ('a','b') window; ('b','c') matches position 1
    assert(w(0) == out.getSeq[Long](2).head, "same 2-token window, same hash")
    assert(w(1) == out.getSeq[Long](3).head, "window at start 1 is (b, c)")
    assert(w.distinct.length == 3, "distinct windows get distinct hashes")

    // length-prefixed framing: distinct token PARTITIONS of the same
    // concatenated bytes must hash differently — tokens may contain
    // spaces when sep != ' ' (e.g. dropRepeatedSpans with sep='\n')
    val part = spark.sql(
      """SELECT graft_span_windows(array('a b','c'), 2) AS p1,
        |       graft_span_windows(array('a','b c'), 2) AS p2,
        |       graft_span_windows(array('ab','c'), 2) AS p3""".stripMargin).head()
    val hashes = Seq(part.getSeq[Long](0).head, part.getSeq[Long](1).head, part.getSeq[Long](2).head)
    assert(hashes.distinct.length == 3, s"token boundaries must disambiguate: $hashes")
  }

  test("dropRepeatedSpans cuts shared k-token runs from every doc, keeps unique tails") {
    // docs 1 and 2 share a verbatim 7-token run; with k=4 every token
    // of the run is covered by some hot 4-window IN BOTH docs, while
    // their distinct prefixes/suffixes survive. doc 3 is untouched and
    // doc 4 is shorter than k (no windows — must pass through whole).
    val run = "the quick brown fox jumps over fences"
    // the tokens flanking the run DIFFER between the two docs — a
    // shared neighbor would verbatim-extend the shared run itself
    val docs = Seq(
      (1L, s"alpha one $run tail one"),
      (2L, s"beta $run endx two two"),
      (3L, "entirely unique words nothing shared here at all"),
      (4L, "too short")
    ).toDF("doc_id", "text")
    val out = Dedup.dropRepeatedSpans(docs, "doc_id", "text", k = 4)
      .orderBy(col("doc_id")).as[(Long, String, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, "alpha one tail one", 11L, 7L),
      (2L, "beta endx two two", 11L, 7L),
      (3L, "entirely unique words nothing shared here at all", 8L, 0L),
      (4L, "too short", 2L, 0L)), out.toString)

    // a doc that IS entirely a hot span collapses to empty but survives
    val full = Seq((1L, run), (2L, run), (3L, s"prefix $run")).toDF("doc_id", "text")
    val out2 = Dedup.dropRepeatedSpans(full, "doc_id", "text", k = 4)
      .orderBy(col("doc_id")).as[(Long, String, Long, Long)].collect().toSeq
    assert(out2.take(2) == Seq((1L, "", 7L, 7L), (2L, "", 7L, 7L)), out2.toString)
    assert(out2(2) == ((3L, "prefix", 8L, 7L)), out2.toString)

    // maxDocs raises the vote threshold: shared by 2 docs <= maxDocs=2 → kept
    val lax = Dedup.dropRepeatedSpans(docs, "doc_id", "text", k = 4, maxDocs = 2)
      .orderBy(col("doc_id")).as[(Long, String, Long, Long)].collect().toSeq
    assert(lax.forall(_._4 == 0L), s"threshold 2 must keep 2-doc runs: $lax")
  }

  test("dropRepeatedSpans verified mode re-checks hot windows by content, matching unverified output") {
    // a 64-bit window-hash collision cannot be constructed by design
    // (that IS the guarantee), so the verified mode is asserted two
    // ways: it still cuts genuinely repeated spans (content re-check
    // confirms real hot windows), and absent collisions its output is
    // IDENTICAL to the unverified path — on planted docs and on the
    // real corpus at spec scale
    val run = "the quick brown fox jumps over fences"
    val docs = Seq(
      (1L, s"alpha one $run tail one"),
      (2L, s"beta $run endx two two"),
      (3L, "entirely unique words nothing shared here at all")
    ).toDF("doc_id", "text")
    val ver = Dedup.dropRepeatedSpans(docs, "doc_id", "text", k = 4, verified = true)
      .orderBy(col("doc_id")).as[(Long, String, Long, Long)].collect().toSeq
    val unver = Dedup.dropRepeatedSpans(docs, "doc_id", "text", k = 4)
      .orderBy(col("doc_id")).as[(Long, String, Long, Long)].collect().toSeq
    assert(ver == unver, s"verified/unverified diverge on planted docs:\n$ver\n$unver")
    assert(ver.head._4 == 7L, "verified mode must still cut the genuinely repeated run")

    val corpus = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    val verC = Dedup.dropRepeatedSpans(corpus, "doc_id", "text", k = 6, verified = true)
    val unverC = Dedup.dropRepeatedSpans(corpus, "doc_id", "text", k = 6)
    assert(verC.exceptAll(unverC).unionAll(unverC.exceptAll(verC)).isEmpty,
      "verified/unverified diverge on the real corpus (no collisions exist at this scale)")
  }

  test("pickRepresentatives elects the highest-quality copy per cluster, ties on id") {
    val clusters = Seq(
      (1L, 1L), (2L, 1L), (3L, 1L),   // cluster 1: best score is doc 2
      (5L, 5L), (6L, 5L),             // cluster 5: tie → min id 5
      (9L, 9L),                       // singleton: canonical itself
      (11L, 11L), (12L, 11L),         // cluster 11: doc 12 UNSCORED
      (14L, 14L), (15L, 14L)          // cluster 14: fully unscored → min id
    ).toDF("id", "rep_id")
    val scores = Seq(
      (1L, 0.2), (2L, 0.9), (3L, 0.5),
      (5L, 0.7), (6L, 0.7),
      (9L, 0.1),
      (11L, 0.3)
    ).toDF("id", "score")
    val out = Dedup.pickRepresentatives(clusters, scores)
      .select("id", "canonical_id", "is_canonical")
      .orderBy(col("id")).as[(Long, Long, Boolean)].collect().toSeq
    // unscored members survive the left join, rank behind every scored
    // sibling, and an all-unscored cluster still elects its min id
    assert(out == Seq(
      (1L, 2L, false), (2L, 2L, true), (3L, 2L, false),
      (5L, 5L, true), (6L, 5L, false),
      (9L, 9L, true),
      (11L, 11L, true), (12L, 11L, false),
      (14L, 14L, true), (15L, 14L, false)), out.toString)
  }

  test("incremental paragraph census: day-2 probe matches a full re-census") {
    val banner = "accept our cookies"
    // day 1: banner in docs 1,2 (count 2 — at the threshold, not over)
    val day1 = Seq(
      (1L, s"$banner\nbody one"),
      (2L, s"$banner\nbody two"),
      (3L, "body three")
    ).toDF("doc_id", "text")
    // day 2: banner ONCE more — hot only via corpus+batch union (2+1 > 2)
    val day2 = Seq(
      (4L, s"$banner\nbody four"),
      (5L, "body five\nbody five shared"),
      (6L, "body five shared\nbody six")
    ).toDF("doc_id", "text")

    val census1 = Dedup.buildParagraphCensus(day1, "doc_id", "text")
    val viaIndex = Dedup.dropRepeatedParagraphsAgainstCensus(day2, census1, "doc_id", "text")
      .orderBy(col("doc_id")).as[(Long, String, Long, Long)].collect().toSeq
    // the cross-boundary banner drops; the day-2-internal pair (count 2)
    // stays under the threshold
    assert(viaIndex == Seq(
      (4L, "body four", 1L, 1L),
      (5L, "body five\nbody five shared", 2L, 0L),
      (6L, "body five shared\nbody six", 2L, 0L)), viaIndex.toString)
    // parity: the probe's verdicts for day-2 docs equal a full
    // re-census over day1 ∪ day2 restricted to those docs
    val full = Dedup.dropRepeatedParagraphs(day1.unionByName(day2), "doc_id", "text")
      .filter(col("doc_id") >= 4).orderBy(col("doc_id"))
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(full == viaIndex, s"incremental must match full re-census: $full vs $viaIndex")

    // merge: disjoint day censuses sum to the union's census exactly
    val census2 = Dedup.buildParagraphCensus(day2, "doc_id", "text")
    val merged = Dedup.mergeParagraphCensus(census1, census2)
      .as[(Long, Long)].collect().toMap
    val direct = Dedup.buildParagraphCensus(day1.unionByName(day2), "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(merged == direct, "merged day censuses must equal the direct union census")

    // the census round-trips through parquet WITH its separator guard
    val dir = java.nio.file.Files.createTempDirectory("graft_paracensus").toString
    census1.write.mode("overwrite").parquet(dir)
    val loaded = spark.read.parquet(dir)
    val viaLoaded = Dedup.dropRepeatedParagraphsAgainstCensus(day2, loaded, "doc_id", "text")
      .orderBy(col("doc_id")).as[(Long, String, Long, Long)].collect().toSeq
    assert(viaLoaded == viaIndex, "persisted census must probe identically")
    intercept[IllegalArgumentException] {
      Dedup.dropRepeatedParagraphsAgainstCensus(day2, loaded, "doc_id", "text", sep = "\t")
    }
  }

  test("incremental span census: day-2 probe matches a full re-census") {
    val run1 = "the quick brown fox jumps"   // cross-boundary: day1 doc 1 + day2 doc 4
    val run2 = "lorem ipsum dolor sit amet"  // batch-internal: day2 docs 5 + 6
    val day1 = Seq(
      (1L, s"alpha one $run1 tail one"),
      (2L, "corpus only words nothing shared"),
      (3L, "another unique corpus document entirely")
    ).toDF("doc_id", "text")
    val day2 = Seq(
      (4L, s"beta $run1 endx two"),
      (5L, s"gamma $run2 five"),
      (6L, s"delta $run2 sixx"),
      (7L, "tiny")
    ).toDF("doc_id", "text")

    val census1 = Dedup.buildSpanCensus(day1, "doc_id", "text", k = 4)
    val viaCensus = Dedup.dropRepeatedSpansAgainstCensus(day2, census1, "doc_id", "text", k = 4)
      .orderBy(col("doc_id")).as[(Long, String, Long, Long)].collect().toSeq
    // doc 4's run is hot only via corpus+batch (1+1 > 1); docs 5/6
    // share a batch-internal run (2 > 1); doc 7 is below k
    assert(viaCensus == Seq(
      (4L, "beta endx two", 8L, 5L),
      (5L, "gamma five", 7L, 5L),
      (6L, "delta sixx", 7L, 5L),
      (7L, "tiny", 1L, 0L)), viaCensus.toString)
    // parity: probe verdicts equal a full re-census over day1 ∪ day2
    // restricted to the batch docs
    val full = Dedup.dropRepeatedSpans(day1.unionByName(day2), "doc_id", "text", k = 4)
      .filter(col("doc_id") >= 4).orderBy(col("doc_id"))
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(full == viaCensus, s"incremental must match full re-census: $full vs $viaCensus")

    // merge: disjoint day censuses sum to the union's census exactly
    val census2 = Dedup.buildSpanCensus(day2, "doc_id", "text", k = 4)
    val merged = Dedup.mergeSpanCensus(census1, census2).as[(Long, Long)].collect().toMap
    val direct = Dedup.buildSpanCensus(day1.unionByName(day2), "doc_id", "text", k = 4)
      .as[(Long, Long)].collect().toMap
    assert(merged == direct, "merged day censuses must equal the direct union census")
    // merging censuses built with different parameters fails loud
    intercept[IllegalArgumentException] {
      Dedup.mergeSpanCensus(census1, Dedup.buildSpanCensus(day2, "doc_id", "text", k = 5))
    }

    // the census round-trips through parquet WITH its (k, sep) guard
    val dir = java.nio.file.Files.createTempDirectory("graft_spancensus").toString
    census1.write.mode("overwrite").parquet(dir)
    val loaded = spark.read.parquet(dir)
    val viaLoaded = Dedup.dropRepeatedSpansAgainstCensus(day2, loaded, "doc_id", "text", k = 4)
      .orderBy(col("doc_id")).as[(Long, String, Long, Long)].collect().toSeq
    assert(viaLoaded == viaCensus, "persisted census must probe identically")
    intercept[IllegalArgumentException] {
      Dedup.dropRepeatedSpansAgainstCensus(day2, loaded, "doc_id", "text", k = 5)
    }
    intercept[IllegalArgumentException] {
      Dedup.dropRepeatedSpansAgainstCensus(day2, loaded, "doc_id", "text", k = 4, sep = "\t")
    }
  }

  // The q21/q71 DuckDB oracles compute EXACT all-pairs Jaccard while the
  // operators run MinHash estimates through LSH banding with a
  // bucketCap=200 prune. Their equality rests on corpus properties that
  // were measured but never asserted (advice r9) — pin them here at BOTH
  // the spec and the verify scale so the precondition fails loudly if a
  // future data generator erodes it instead of flaking the hash check:
  //  (1) margin: no pair's exact Jaccard lands in a band around the 0.5
  //      threshold (bimodal similarity — estimates can't cross over);
  //  (2) no LSH bucket exceeds bucketCap (the prune never drops a pair);
  //  (3) the candidate pairs the operator verifies ≥ 0.5 are EXACTLY the
  //      pairs whose true Jaccard is ≥ 0.5 (recall AND precision at the
  //      pair level — which implies the per-doc verdicts coincide).
  test("q21/q71 oracle precondition: Jaccard margin, bucket caps and pair-level parity hold") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val docs = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
      // exact distinct 3-token shingles — same construction as the
      // oracle's jaccardCtes (t[i:i+2] over whitespace tokens)
      val grams = docs
        .select(col("doc_id"), split(lower(trim(col("text"))), "\\s+").as("t"))
        .select(col("doc_id"), explode(array_distinct(
          transform(sequence(lit(1), greatest(size(col("t")) - 2, lit(1))),
            i => concat_ws(" ", slice(col("t"), i, lit(3)))))).as("g"))
        .localCheckpoint()
      val sizes = grams.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val exact = grams.select(col("doc_id").as("id_a"), col("g"))
        .join(grams.select(col("doc_id").as("id_b"), col("g")), Seq("g"))
        .filter(col("id_a") < col("id_b"))
        .groupBy("id_a", "id_b").agg(count(lit(1)).as("ix"))
        .join(sizes.select(col("doc_id").as("id_a"), col("n").as("na")), Seq("id_a"))
        .join(sizes.select(col("doc_id").as("id_b"), col("n").as("nb")), Seq("id_b"))
        .select(col("id_a"), col("id_b"),
          (col("ix") / (col("na") + col("nb") - col("ix"))).as("j"))
        .localCheckpoint()
      val ambiguous = exact.filter(col("j").between(0.35, 0.65)).count()
      assert(ambiguous == 0L,
        s"$dir: $ambiguous pair(s) with exact Jaccard in [0.35, 0.65] — the q21/q71 " +
          "oracle's bimodal-margin precondition no longer holds")

      val banded = Dedup.minhashIndexDocs(docs).localCheckpoint()
      val maxBucket = banded.groupBy("band", "bh").agg(count(lit(1)).as("c"))
        .agg(max(col("c"))).head().getLong(0)
      assert(maxBucket <= 200L,
        s"$dir: largest LSH bucket $maxBucket exceeds bucketCap=200 — the prune " +
          "would drop candidate pairs the oracle keeps")

      // operator-side verified candidates (band collision + signature
      // agreement ≥ 0.5) vs exact truth (J ≥ 0.5): set equality
      val numHashes = 16
      val cand = banded.select(col("band"), col("bh"), col("doc_id").as("id_a"), col("sig").as("sa"))
        .join(banded.select(col("band"), col("bh"), col("doc_id").as("id_b"), col("sig").as("sb")),
          Seq("band", "bh"))
        .filter(col("id_a") < col("id_b"))
        .withColumn("est", aggregate(
          zip_with(col("sa"), col("sb"), (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, x) => acc + x) / lit(numHashes.toDouble))
        .filter(col("est") >= 0.5)
        .select("id_a", "id_b").distinct()
      val truePairs = exact.filter(col("j") >= 0.5).select("id_a", "id_b")
      val missed = truePairs.exceptAll(cand).count()
      val spurious = cand.exceptAll(truePairs).count()
      assert(missed == 0L && spurious == 0L,
        s"$dir: LSH pair set diverges from exact truth (missed=$missed spurious=$spurious) " +
          "— the q21/q71 oracle equivalence is eroding")
    }
  }
}

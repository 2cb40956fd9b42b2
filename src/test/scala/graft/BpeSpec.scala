package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

class BpeSpec extends SparkSpecBase {
  import spark.implicits._

  /** The Sennrich vocabulary (low/lower/newest/widest): first pair
    * counts are hand-derivable — (e,s) 9, (s,t) 9, (t,</w>) 9 tie
    * with (e,s) lexicographically smallest; then (es,t) 9 beats
    * (t,</w>); then (est,</w>) 9 — merges 1..3 are forced. */
  private def corpus = Seq(
    (1L, Seq.fill(5)("low").mkString(" ")),
    (2L, Seq.fill(2)("lower").mkString(" ")),
    (3L, Seq.fill(6)("newest").mkString(" ")),
    (4L, Seq.fill(3)("widest").mkString(" "))
  ).toDF("doc_id", "text")

  test("training recovers the hand-derived merges with deterministic tie-breaks") {
    val m = Bpe.train(corpus, "text", numMerges = 3)
    assert(m === Seq(("e", "s"), ("es", "t"), ("est", Bpe.EndOfWord)))
    // training past pair exhaustion stops early instead of looping
    val tiny = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val all = Bpe.train(tiny, "text", numMerges = 10)
    // "a b </w>" -> ab -> ab</w>: two merges exhaust the vocabulary
    assert(all === Seq(("a", "b"), ("ab", Bpe.EndOfWord)))
    intercept[IllegalArgumentException] { Bpe.train(corpus, "text", 0) }
    intercept[IllegalArgumentException] { Bpe.train(corpus, "text", 3, maxVocabWords = 0) }
  }

  test("encode applies merges in rank order, exhaustively left-to-right") {
    val m = Seq(("e", "s"), ("es", "t"), ("est", Bpe.EndOfWord))
    def enc(w: String) = Seq(w).toDF("w")
      .select(Bpe.encode(col("w"), m).as("p")).as[Seq[String]].head()
    assert(enc("lowest") === Seq("l", "o", "w", "est</w>"))
    assert(enc("estes") === Seq("est", "es", Bpe.EndOfWord),
      "rank order: (e,s)'s pass merges BOTH pairs, then (es,t) chains at the front")
    assert(enc("x") === Seq("x", Bpe.EndOfWord))
    // same-pair RUNS are the exhaustiveness stress case (a shared-
    // delimiter replace skips alternate members): every run length
    // must segment exactly as the canonical left-to-right loop does
    val mm = Seq(("a", "a"))
    def encRun(w: String) = Seq(w).toDF("w")
      .select(Bpe.encode(col("w"), mm).as("p")).as[Seq[String]].head()
    assert(encRun("aaaa") === Seq("aa", "aa", Bpe.EndOfWord))
    assert(encRun("aaaaa") === Seq("aa", "aa", "a", Bpe.EndOfWord))
    assert(encRun("aaaaaa") === Seq("aa", "aa", "aa", Bpe.EndOfWord))
    assert(encRun("aaaaaaa") === Seq("aa", "aa", "aa", "a", Bpe.EndOfWord))
    intercept[IllegalArgumentException] { Bpe.encode(col("w"), Seq.empty) }
  }

  // ---- round 12: incremental trainer + native kernel ------------------

  /** The pre-round-12 full-recount trainer, kept verbatim as the spec's
    * reference: the incremental trainer must select the SAME merges in
    * the SAME order (count desc, pair lexicographic asc ties). */
  private def trainRecountReference(words: Array[(String, Long)],
                                    numMerges: Int): Seq[(String, String)] = {
    var reps: Array[(Array[String], Long)] =
      words.map { case (w, n) => (w.map(_.toString).toArray :+ Bpe.EndOfWord, n) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    while (round < numMerges) {
      val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
      reps.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts(p) = pairCounts.getOrElse(p, 0L) + n
          i += 1
        }
      }
      if (pairCounts.isEmpty) round = numMerges
      else {
        val (best, _) = pairCounts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
        merges += best
        val merged = best._1 + best._2
        reps = reps.map { case (syms, n) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == best._1 && syms(i + 1) == best._2) {
              out += merged; i += 2
            } else { out += syms(i); i += 1 }
          }
          (out.toArray, n)
        }
        round += 1
      }
    }
    merges.toSeq
  }

  private def corpusWordCounts(limit: Int = 100000): Array[(String, Long)] =
    Tables(spark, sfDir).documents
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w")).limit(limit)
      .as[(String, Long)].collect()

  test("incremental trainer selects bit-identical merges to the full-recount reference") {
    val words = corpusWordCounts()
    val inc = Bpe.trainFromWordCounts(words, 120)
    val ref = trainRecountReference(words, 120)
    assert(inc === ref, "incremental pair statistics drifted from the recount truth")
    // and through exhaustion on the hand vocabulary (retraction edge
    // cases: runs, end-of-word chains, pairs dropping to zero)
    val hand = Array(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val all = Bpe.trainFromWordCounts(hand, 10000)
    assert(all === trainRecountReference(hand, 10000))
    assert(all.take(3) === Seq(("e", "s"), ("es", "t"), ("est", Bpe.EndOfWord)))
  }

  test("kernel encode == expression fold bit-exactly on the planted and on a trained table") {
    val docs = Tables(spark, sfDir).documents
    val words = docs
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
      .filter(col("w") =!= "").distinct()
    def parity(merges: Seq[(String, String)]): Unit = {
      val diff = words
        .select(col("w"),
          Bpe.encode(col("w"), merges).as("fold"),
          Bpe.encodeKernel(col("w"), merges).as("kern"))
        .filter(col("fold") =!= col("kern"))
      assert(diff.isEmpty, s"kernel diverged from the fold: ${diff.take(3).mkString(",")}")
    }
    parity(Bpe.docMerges)
    val trained = Bpe.train(docs, "text", 200)
    assert(trained.nonEmpty)
    parity(trained)
  }

  test("kernel at >=1k merges matches a from-scratch string-fold reference (the oracle's formulation)") {
    // the q126 regime the 256-merge fold cannot run: replay the
    // rank-order double-space replace fold in plain Scala (the DuckDB
    // oracle's exact formulation) and pin the kernel against it
    val merges = Bpe.kernelMerges
    assert(merges.size === 1024)
    assert(merges.head === (("a", "a")))
    assert(merges(675) === (("z", "z")))
    assert(merges(676) === (("aa", Bpe.EndOfWord)))
    assert(merges.last === (("nj", Bpe.EndOfWord)))
    def foldRef(w: String): Seq[String] = {
      val start = "  " + w.flatMap(c => s"$c  ") + Bpe.EndOfWord + "  "
      val folded = merges.foldLeft(start) { case (s, (a, b)) =>
        s.replace(s" $a  $b ", s" $a$b ")
      }
      folded.trim.split("\\s+").toSeq
    }
    val sample = Tables(spark, sfDir).documents
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
      .filter(col("w") =!= "").distinct().limit(400)
      .as[String].collect() ++ Seq("hello", "aaaa", "zzz", "x", "nj", "banana")
    val kern = Seq(sample: _*).toDF("w")
      .select(col("w"), Bpe.encodeKernel(col("w"), merges).as("p"))
      .as[(String, Seq[String])].collect().toMap
    sample.foreach { w =>
      assert(kern(w) === foldRef(w), s"kernel/fold mismatch on '$w'")
    }
  }

  test("kernel table validation refuses non-training-shaped tables loudly") {
    def table(m: Seq[(String, String)]) =
      new graft.expressions.BpeTable(m.map(_._1).toArray, m.map(_._2).toArray)
    // a multi-char side never created earlier: min-rank would diverge
    val e1 = intercept[IllegalArgumentException] {
      table(Seq(("ab", "c")))
    }
    assert(e1.getMessage.contains("neither a base symbol"))
    // duplicate pair
    val e2 = intercept[IllegalArgumentException] {
      table(Seq(("a", "b"), ("c", "d"), ("a", "b")))
    }
    assert(e2.getMessage.contains("output 'ab' duplicates")
      || e2.getMessage.contains("duplicates the pair"))
    // duplicate OUTPUT via two routes: ("a","bc") and ("ab","c") both
    // make "abc" — a re-created operand would re-fire a processed rank
    val e3 = intercept[IllegalArgumentException] {
      table(Seq(("b", "c"), ("a", "b"), ("a", "bc"), ("ab", "c")))
    }
    assert(e3.getMessage.contains("duplicates an earlier output"))
    // size guards on the Column entry point
    intercept[IllegalArgumentException] { Bpe.encodeKernel(col("w"), Seq.empty) }
    intercept[IllegalArgumentException] {
      Bpe.encodeKernel(col("w"),
        (1 to (Bpe.maxTrainMerges + 1)).map(i => (s"x$i", "y")))
    }
  }

  test("q126 entry: kernel stats cover every doc with real multi-char pieces") {
    val out = Bpe.bpeKernelDocs(spark, sfDir)
      .as[(Long, Long, Long, Double)].collect()
    assert(out.length === Tables(spark, sfDir).documents.count())
    // the 1024-merge table genuinely compresses: pieces strictly fewer
    // than the char count for every doc, and more than one per word
    assert(out.forall { case (_, w, p, _) => p >= w && p > 0 })
    assert(out.exists { case (_, _, _, cpp) => cpp > 1.0 },
      "letter-pair merges must produce multi-char pieces somewhere")
  }

  test("special tokens: atomic under a hostile table, unforgeable by merges, counted by the packer") {
    // HOSTILE table: merges that would chew the BOS spelling char by
    // char — each side base or created earlier, so it passes training
    // validation. Without specials the word shreds; with specials it
    // is one atomic piece, in the fold AND the kernel, char and byte
    // mode alike (specials screen on the RAW token).
    val hostile = Seq(("<", "|"), ("<|", "b"), ("<|b", "o"), ("<|bo", "s"))
    val words = Seq((1L, Bpe.Bos), (2L, "bos")).toDF("id", "w")
    def run(c: org.apache.spark.sql.Column) = words.select(col("id"), c.as("p"))
      .as[(Long, Seq[String])].collect().toMap
    for (byteLevel <- Seq(false, true)) {
      val kernel = run(Bpe.encodeKernel(col("w"), hostile, byteLevel, Bpe.DefaultSpecials))
      assert(kernel(1L) == Seq(Bpe.Bos),
        s"special must encode atomically (byteLevel=$byteLevel): ${kernel(1L)}")
      assert(kernel(1L) != run(Bpe.encodeKernel(col("w"), hostile, byteLevel))(1L),
        "the hostile table must genuinely shred the spelling without specials")
      assert(kernel(2L).nonEmpty && kernel(2L) != Seq("bos"),
        s"ordinary words still encode normally: ${kernel(2L)}")
    }
    // fold == kernel on the special and the ordinary word
    assert(run(Bpe.encode(col("w"), hostile, specials = Bpe.DefaultSpecials)) ==
      run(Bpe.encodeKernel(col("w"), hostile, specials = Bpe.DefaultSpecials)),
      "fold and kernel must agree under specials")
    // UNFORGEABLE: a table whose merges would PRODUCE the special (the
    // full spelling chain) or CONSUME one refuses loudly
    val forging = hostile ++ Seq(("<|bos", "|"), ("<|bos|", ">"))
    val eF = intercept[Exception] {
      words.select(Bpe.encodeKernel(col("w"), forging,
        specials = Bpe.DefaultSpecials)).collect()
    }
    assert(eF.getMessage.contains("special"), eF.getMessage)
    val eC = intercept[Exception] {
      words.select(Bpe.encodeKernel(col("w"), Seq((Bpe.Eos, "x")),
        specials = Bpe.DefaultSpecials)).collect()
    }
    assert(eC.getMessage.contains("special"), eC.getMessage)
    // the same forging table is FINE without specials registered —
    // reservation is a property of the special set, not the table
    assert(run(Bpe.encodeKernel(col("w"), forging))(1L) == Seq(Bpe.Bos, Bpe.EndOfWord),
      "without specials the forged spelling is just another merge output")
    // a single-char special could hide inside ordinary words — refused
    val e1 = intercept[Exception] {
      words.select(Bpe.encodeKernel(col("w"), hostile, specials = Seq("x"))).collect()
    }
    assert(e1.getMessage.contains("special"), e1.getMessage)
    // q142: delimiter arithmetic — every doc costs its q130 count + 2
    val plain = Bpe.bpePackedDocs(spark, sfDir)
      .agg(sum(col("total_tokens")), sum(col("n_docs"))).as[(Long, Long)].head()
    val delim = Bpe.bpePackedDelimitedDocs(spark, sfDir)
      .agg(sum(col("total_tokens")), sum(col("n_docs"))).as[(Long, Long)].head()
    assert(delim._2 == plain._2 && delim._1 == plain._1 + 2 * plain._2,
      s"BOS+EOS must cost exactly 2 per doc: $delim vs $plain")
  }

  test("token ids: reserved layout, kernel ids == pieces through the vocabulary, char mode refused") {
    val merges = Bpe.byteKernelMerges
    val vocab = Bpe.vocabularySeq(merges)
    // dense bijection with the reserved layout: specials 0..2, marker
    // 3, byte symbols 4..259 in byte order, merge outputs 260+rank
    assert(vocab.map(_._1) == vocab.indices.toSeq, "ids must be dense 0..N-1")
    assert(vocab.map(_._2).distinct.size == vocab.size, "pieces must be unique")
    assert(vocab.take(3).map(_._2) == Bpe.DefaultSpecials)
    assert(vocab(3)._2 == Bpe.EndOfWord)
    assert(vocab(4 + 'a'.toInt)._2 == "a" && vocab(4 + 'z'.toInt)._2 == "z")
    assert(vocab(260)._2 == "Ã¤", "first merge output sits at specials+257")
    // kernel ids are exactly the pieces mapped through the vocabulary
    val idOf = vocab.map(_.swap).toMap
    val words = Seq((1L, "tät"), (2L, Bpe.Bos), (3L, "zebra")).toDF("id", "w")
    val out = words.select(col("id"),
        Bpe.encodeKernel(col("w"), merges, byteLevel = true,
          specials = Bpe.DefaultSpecials).as("p"),
        Bpe.encodeIdsKernel(col("w"), merges).as("i"))
      .as[(Long, Seq[String], Seq[Int])].collect()
    out.foreach { case (id, p, i) =>
      assert(i == p.map(idOf), s"word $id: ids $i != mapped pieces $p")
    }
    assert(out.find(_._1 == 2L).get._3 == Seq(0), "BOS encodes to the reserved id 0")
    // char mode has no finite id space — refused loudly
    val e = intercept[Exception] {
      words.select(call_function("graft_bpe_encode_ids", col("w"),
        typedlit(merges.map(_._1)), typedlit(merges.map(_._2)), lit(false)))
        .collect()
    }
    assert(e.getMessage.contains("byteLevel") ||
      Option(e.getCause).exists(_.getMessage.contains("byteLevel")), e.getMessage)
  }

  test("packed id export (q144): BOS/EOS framing exact, ids round-trip to the dressed text") {
    val out = Bpe.bpePackedIdsDocs(spark, sfDir)
      .select(col("shard"), col("chunk"), col("n_docs"), col("ids"))
      .as[(Int, Long, Long, String)].collect()
    assert(out.nonEmpty)
    val pieceOf = Bpe.vocabularySeq(Bpe.byteKernelMerges).toMap
    // every chunk is a clean (BOS body EOS)* stream: specials can never
    // appear inside a body (ids 0..2 are reserved; body ids are ≥ 3)
    out.foreach { case (s, c, nDocs, idsStr) =>
      val ids = idsStr.split(",").map(_.toInt)
      assert(ids.count(_ == 0) == nDocs && ids.count(_ == 1) == nDocs,
        s"chunk ($s,$c) must frame exactly $nDocs documents")
      assert(ids.head == 0 && ids.last == 1, s"chunk ($s,$c) must start BOS, end EOS")
    }
    // round trip: the first document of shard 0 / chunk 0 is doc_id 0
    // (shard = id % 8, in-chunk order by id) — its ids decode back to
    // the dressed corpus text exactly: ids → pieces → strip markers →
    // byte symbols → UTF-8
    val first = out.find(r => r._1 == 0 && r._2 == 0L).get._4
      .split(",").map(_.toInt).drop(1).takeWhile(_ != 1)
    val words = first.map(pieceOf).mkString("")
      .split(java.util.regex.Pattern.quote(Bpe.EndOfWord)).filter(_.nonEmpty)
    val symToByte = Bpe.byteSymbols.zipWithIndex
      .map { case (sym, b) => (sym.head, b) }.toMap
    def decodeWord(w: String) =
      new String(w.map(ch => symToByte(ch).toByte).toArray, "UTF-8")
    val got = words.map(decodeWord).toSeq
    val expected = Tables(spark, sfDir).documents
      .filter(col("doc_id") === 0L).select(col("text")).as[String].head()
      .toLowerCase.replace('a', 'ä').replace('e', 'é')
      .trim.toLowerCase.split("\\s+").toSeq
    assert(got == expected,
      s"ids must round-trip to the dressed text: ${got.take(5)} vs ${expected.take(5)}")
  }

  test("byte remap follows the GPT-2 bytes_to_unicode rule exactly") {
    // self-mapped printable latin; shifted controls/space/DEL
    assert(Bpe.byteSymbols(97) == "a" && Bpe.byteSymbols(126) == "~")
    assert(Bpe.byteSymbols(169) == "©" && Bpe.byteSymbols(255) == "ÿ")
    assert(Bpe.byteSymbols(32) == "Ġ", "space is the famous Ġ")
    assert(Bpe.byteSymbols(10) == "Ċ", "newline shifts to Ċ")
    // DEL (127) is the 34th shifted byte: 33 controls+space precede it
    assert(Bpe.byteSymbols(0) == "Ā" && Bpe.byteSymbols(127) == "ġ")
    assert(Bpe.byteSymbols.distinct.length == 256, "the map is a bijection")
    // the column transform applies it over real UTF-8 bytes
    val out = Seq((1L, "abc"), (2L, "ä"), (3L, "日"), (4L, "a b"))
      .toDF("id", "t")
      .select(col("id"), Bpe.byteRemap(col("t")).as("b"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "abc", "ASCII printable is fixed")
    assert(out(2L) == "Ã¤", "ä = 0xC3 0xA4, both self-mapped")
    assert(out(3L) == "æĹ¥", "U+65E5 = E6 97 A5: self + two shifted bytes")
    assert(out(4L) == "aĠb", "space maps through the shift")
  }

  test("byteDecode inverts byteRemap; kernel pieces round-trip to the original word") {
    val probes = Seq((1L, "plain"), (2L, "ä ö"), (3L, "日本語"), (4L, "a\nb"),
      (5L, ""), (6L, "łódź"))
    val out = probes.toDF("id", "t")
      .select(col("id"), Bpe.byteDecode(Bpe.byteRemap(col("t"))).as("rt"))
      .as[(Long, String)].collect().toMap
    probes.foreach { case (id, t) =>
      assert(out(id) == t, s"round trip broke for ${t.take(20)}: ${out(id)}")
    }
    // and through the encoder: pieces (marker stripped) concatenate to
    // the byte-mapped word, so byteDecode recovers the ORIGINAL word
    val m = Seq(("Ã", "¤"), ("t", "Ã¤"))
    val decoded = Seq((1L, "läuft")).toDF("id", "t")
      .select(Bpe.byteDecode(
        array_join(filter(
          transform(Bpe.encodeKernel(col("t"), m, byteLevel = true),
            p => regexp_replace(p, java.util.regex.Pattern.quote(Bpe.EndOfWord), "")),
          p => p =!= ""), "")).as("w"))
      .as[String].head()
    assert(decoded == "läuft", s"piece round trip: $decoded")
  }

  test("byte-level mode: any string encodes within the fixed alphabet under a Latin-trained table") {
    // train byte-level on Latin text; the merges live in byte-symbol
    // space and pick up the multi-byte ä pair from the corpus
    // "äää" maps to Ã¤Ã¤Ã¤: (Ã,¤) appears 3× per occurrence (27+2=29
    // with läuft's), strictly ahead of every other pair — first merge
    val latin = Seq(
      (1L, Seq.fill(9)("äää").mkString(" ")),
      (2L, Seq.fill(2)("läuft").mkString(" "))).toDF("doc_id", "text")
    val m = Bpe.train(latin, "text", numMerges = 3, byteLevel = true)
    assert(m.head == (("Ã", "¤")),
      s"the most frequent pair is ä's byte pair, got $m")
    // a NON-Latin string still encodes — every glyph decomposes into
    // base byte symbols instead of surviving as an OOV single char —
    // and kernel == fold holds in byte mode
    val probe = Seq((1L, "日本 łódź"), (2L, "läuft")).toDF("doc_id", "text")
    def enc(useKernel: Boolean) = probe
      .select(col("doc_id"), explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
      .select(col("doc_id"), col("w"),
        (if (useKernel) Bpe.encodeKernel(col("w"), m, byteLevel = true)
         else Bpe.encode(col("w"), m, byteLevel = true)).as("pieces"))
      .as[(Long, String, Seq[String])].collect().toSeq.sortBy(r => (r._1, r._2))
    val k = enc(useKernel = true)
    assert(k == enc(useKernel = false), "kernel == fold in byte mode")
    k.foreach { case (_, w, pieces) =>
      // pieces reassemble to the byte-mapped word + the marker
      val flat = pieces.mkString
      val expected = Seq((0L, w)).toDF("i", "t")
        .select(Bpe.byteRemap(col("t"))).as[String].head() + Bpe.EndOfWord
      assert(flat == expected, s"$w: $pieces must cover the byte symbols exactly")
      // and every piece is built from the 256-symbol alphabet or the
      // marker — nothing outside the fixed base survives
      val alphabet = Bpe.byteSymbols.mkString.toSet
      pieces.foreach(p => assert(
        p == Bpe.EndOfWord || p.replace(Bpe.EndOfWord, "").forall(alphabet),
        s"piece $p escapes the byte alphabet"))
    }
    // the trained ä merge genuinely fired on the byte stream
    val laeuft = k.collect { case (_, "läuft", p) => p }.head
    assert(laeuft.contains("Ã¤"), s"ä must re-assemble from its byte pair: $laeuft")
  }

  test("q136 entry: byte-level kernel stats — dressing plants multi-byte text, byte merges fire") {
    val df = Bpe.bpeByteStatsDocs(spark, sfDir)
    val rows = df.as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty && rows.forall(_._2 > 0))
    // bytes-per-piece: the dressing guarantees multi-byte words
    // corpus-wide, and the byte merges re-assemble ä/é — so pieces
    // average MORE than one byte (merges fired) on every doc
    assert(rows.forall(_._4 > 1.0),
      "byte merges must fire (bytes per piece > 1 everywhere)")
  }

  test("tokenizer parity: per-language fertility, single-piece words counted exactly") {
    // under merges [(a,b), (ab,</w>)]: "ab" -> [ab</w>] = 1 piece
    // (covered WHOLE); "abc" -> [ab, c, </w>] = 3; "x" -> [x, </w>] = 2
    val m = Seq(("a", "b"), ("ab", Bpe.EndOfWord))
    val docs = Seq(
      (1L, "en", "ab ab abc"),  // en: pieces 1+1+3 = 5 over 3 words
      (2L, "fr", "x ab")        // fr: pieces 2+1 = 3 over 2 words
    ).toDF("doc_id", "lang", "text")
    val out = Bpe.tokenizerParity(docs, m)
      .as[(String, Long, Long, Long, Double, Double)].collect().sortBy(_._1).toList
    // chars: en 2+2+3=7 over 5 pieces = 1.4; fr 1+2=3 over 3 pieces = 1.0
    assert(out === List(
      ("en", 3L, 5L, 2L, 1.6667, 1.4),
      ("fr", 2L, 3L, 1L, 1.5, 1.0)))
  }

  test("mergesTable persists the ranks; encodeStats sums pieces per doc, map-only after the explode") {
    val m = Bpe.train(corpus, "text", 3)
    val tbl = Bpe.mergesTable(spark, m).as[(Long, String, String)].collect().toList
    assert(tbl === List((0L, "e", "s"), (1L, "es", "t"), (2L, "est", Bpe.EndOfWord)))
    val stats = Bpe.encodeStats(corpus, m)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toList
    // newest = n e w est</w> → 4 pieces × 6 words; chars 6 per word
    assert(stats.find(_._1 == 3L).get === ((3L, 6L, 24L, 1.5)))
    // low = l o w </w> → 4 pieces (no merge applies) × 5 words
    assert(stats.find(_._1 == 1L).get === ((1L, 5L, 20L, 0.75)))
  }

  test("decodeIds inverts encodeIdsKernel: merged, unmerged, multibyte and special words all round-trip") {
    val merges = Bpe.byteKernelMerges
    // unmerged (every piece a lone byte symbol + standalone marker),
    // merge-covered, multibyte, digits/punct outside the trained
    // merges, and an atomic special decoding to its literal spelling
    val probes = Seq((1L, "zzz"), (2L, "the"), (3L, "läuft"),
      (4L, "a1-b!"), (5L, Bpe.Bos), (6L, "日本"))
    val out = probes.toDF("id", "w")
      .select(col("id"),
        Bpe.decodeIds(Bpe.encodeIdsKernel(col("w"), merges), merges).as("rt"))
      .as[(Long, String)].collect().toMap
    probes.foreach { case (id, w) =>
      assert(out(id) == w, s"decode(encode($w)) = ${out(id)}")
    }
    val ex = intercept[IllegalArgumentException] {
      Bpe.decodeIds(col("w"), Seq.empty)
    }
    assert(ex.getMessage.contains("merges"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** C49: byte-pair-encoding tokenizer — train merges from the corpus and
  * encode with them (Sennrich, Haddow & Birch 2016, "Neural Machine
  * Translation of Rare Words with Subword Units", arXiv:1508.07909 —
  * the published algorithm, including its merge-application
  * convention: merges apply IN RANK ORDER, each exhaustively
  * left-to-right). This closes the tokenizer gap between C10's
  * counting heuristics (whitespace + a BPE-ish regex) and what a
  * training pipeline actually runs: token budgets, packing, and
  * length stats measured in REAL learned subword units.
  *
  * Distributed shape, stated honestly:
  *  - TRAINING runs on the word-FREQUENCY table, not the corpus: one
  *    distributed aggregation collapses 100 TB of text to |vocab|
  *    rows (bounded: top `maxVocabWords` by count), and the greedy
  *    merge loop then runs driver-side on that bounded table — the
  *    same shape every published BPE trainer uses (pair statistics
  *    over word counts), and the one deliberate driver-side loop in
  *    this library's C-block (like the holiday calendars: the input
  *    is small BY CONTRACT, and the `require` makes the contract
  *    loud);
  *  - ENCODING is pure column expressions: the char split and one
  *    left-to-right `replace` fold per merge (exactly the rank-order
  *    exhaustive convention — `replace` resumes scanning after each
  *    substitution, which IS BPE's left-greedy pass). Merge tables
  *    are bounded (`maxEncodeMerges`) because each merge is one
  *    expression node; a 30k-merge production vocabulary wants a
  *    native kernel (the [[graft.expressions]] pattern) — the
  *    documented growth path, not a silent cliff.
  */
object Bpe {

  /** The end-of-word marker (Sennrich's `</w>`): distinguishes "est"
    * inside a word from "est" ending one. */
  val EndOfWord = "</w>"

  /** Largest merge table [[encode]] accepts — one expression node per
    * merge; past this, use [[encodeKernel]] (one node for the whole
    * table). */
  val maxEncodeMerges = 256

  /** Largest merge table [[train]] / [[encodeKernel]] accept — past
    * GPT-class vocabularies (32k–100k merges) this is a config error. */
  val maxTrainMerges: Int = graft.expressions.BpeTable.MaxMerges

  /** The GPT-2 byte→unicode symbol table (Radford et al. 2019,
    * "Language Models are Unsupervised Multitask Learners" —
    * `bytes_to_unicode`, the production BPE base-alphabet convention):
    * every UTF-8 BYTE maps to one printable BMP code point — printable
    * latin bytes (33–126, 161–172, 174–255) to themselves, the rest
    * (controls, space, DEL, soft hyphen…) to 256+n in ascending byte
    * order (so space → 'Ġ', newline → 'Ċ'). Under this map any string
    * becomes a sequence over a FIXED 256-symbol alphabet: rare glyphs
    * can no longer survive as out-of-vocabulary single-char pieces,
    * the unbounded-below base alphabet the char-level mode has. Each
    * mapped symbol is exactly one code point, so the char-level
    * machinery (fold, kernel, trainer, validator) carries over
    * UNCHANGED — byte level is a string pre-map, not a new engine. */
  val byteSymbols: Array[String] = graft.expressions.BpeTable.ByteSymbols

  /** Reserved special tokens (round 14 — the production contract a
    * training loader expects): document-boundary and padding ids that
    * (a) encode ATOMICALLY — a word equal to a special emits exactly
    * one piece, no end-of-word marker, merges never run on it — and
    * (b) can never be PRODUCED by merges — the kernel's table
    * validator refuses any table whose merge output or side equals a
    * special, so no sequence of merges over ordinary text can forge a
    * document boundary. Matched on the RAW token even in byte mode
    * (specials are screened before byte encoding — the GPT-2
    * convention). The `<|…|>` spelling survives the corpus tokenizer
    * (lower/trim/whitespace) unchanged. */
  val Bos = "<|bos|>"
  val Eos = "<|eos|>"
  val Pad = "<|pad|>"
  val DefaultSpecials: Seq[String] = Seq(Bos, Eos, Pad)

  /** [[byteSymbols]] as a column transform: token string → its UTF-8
    * bytes, each mapped to its symbol. Built-ins only (hex pairs →
    * one map-literal lookup each → join), so it composes into the
    * encode plan codegen'd and is reproducible in ANSI-ish SQL (the
    * q136 oracle replays it). */
  def byteRemap(tok: Column): Column = {
    val m = typedlit(byteSymbols.zipWithIndex
      .map { case (s, b) => f"$b%02X" -> s }.toMap)
    array_join(
      transform(regexp_extract_all(
        hex(org.apache.spark.sql.functions.encode(tok, "UTF-8")), lit("(..)"), lit(1)),
        h => element_at(m, h)), "")
  }

  /** Inverse of [[byteRemap]] — the GPT-2 DECODE step: a byte-symbol
    * string maps back to its bytes (each symbol is one code point, so
    * one lookup per char) and UTF-8-decodes to the original text.
    * Pieces concatenate losslessly because the merge output is always
    * the concatenation of its sides; strip the end-of-word marker
    * first — it is a marker, not a byte symbol. */
  def byteDecode(sym: Column): Column = {
    val inv = typedlit(byteSymbols.zipWithIndex
      .map { case (s, b) => s -> f"$b%02X" }.toMap)
    val hexes = transform(sequence(lit(1), length(sym)),
      i => element_at(inv, sym.substr(i, lit(1))))
    when(length(sym) === 0, lit(""))
      .otherwise(decode(unhex(array_join(hexes, "")), "UTF-8"))
  }

  /** Train `numMerges` BPE merges from a corpus. One distributed
    * aggregation builds the (word, count) table under the corpus
    * tokenization (lower/trim/whitespace); the top `maxVocabWords`
    * words by (count desc, word) — deterministic — collect to the
    * driver and the greedy loop runs there. Ties between pairs break
    * to the lexicographically smallest (left, right), so retrains are
    * bit-stable.
    *
    * The greedy loop keeps pair statistics INCREMENTALLY (round 12):
    * each merge touches only the words that CONTAIN the merged pair
    * (their old adjacent-pair contributions retract, the merge
    * applies, the new contributions add), and the argmax rides a
    * lazy-deletion heap ordered (count desc, pair asc) — stale entries
    * pop and drop when their stored count no longer matches. The
    * previous full-recount loop was O(rounds × vocab × word-length):
    * fine at 256 merges, hopeless at the 10k+ merges a production
    * vocabulary needs. Selection order is bit-identical to the
    * recount formulation (spec-asserted against a naive reference).
    *
    * @return merges in rank order; fewer than `numMerges` if the
    *         vocabulary runs out of pairs */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
            maxVocabWords: Int = 100000,
            byteLevel: Boolean = false): Seq[(String, String)] = {
    require(numMerges >= 1 && numMerges <= maxTrainMerges,
      s"numMerges must lie in [1, $maxTrainMerges], got $numMerges")
    require(maxVocabWords >= 1 && maxVocabWords <= 1000000,
      s"maxVocabWords must lie in [1, 1e6] (the table is collected), got $maxVocabWords")
    // byteLevel: words pre-map through [[byteRemap]] so the driver-side
    // loop (code-point split) sees byte symbols — trained merges then
    // live in byte-symbol space end to end. The remap runs AFTER the
    // count aggregate (round 14): byteRemap is injective, so counting
    // raw words and mapping the |vocab| distinct survivors is the same
    // table at a fraction of the remap work (the corpus-sized side of
    // the aggregate never touches the hex round-trip). The (n desc, w)
    // tie-break still orders by the MAPPED word — bit-stable retrains.
    val words = docs
      .select(explode(split(lower(trim(col(textCol))), "\\s+")).as("_w0"))
      .filter(col("_w0") =!= "")
      .groupBy(col("_w0")).agg(count(lit(1)).as("n"))
      .select((if (byteLevel) byteRemap(col("_w0")) else col("_w0")).as("w"), col("n"))
      .orderBy(col("n").desc, col("w")).limit(maxVocabWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    trainFromWordCounts(words, numMerges)
  }

  /** The driver-side greedy loop on a bounded (word, count) table —
    * incremental pair statistics + lazy-deletion heap (see [[train]]). */
  private[graft] def trainFromWordCounts(words: Array[(String, Long)],
                                         numMerges: Int): Seq[(String, String)] = {
    import scala.collection.mutable
    val reps: Array[Array[String]] =
      words.map { case (w, _) => w.map(_.toString).toArray :+ EndOfWord }
    val cnt: Array[Long] = words.map(_._2)
    val counts = mutable.HashMap.empty[(String, String), Long]
    val occ = mutable.HashMap.empty[(String, String), mutable.Set[Int]]
    // heap dequeues the MAX under: higher count first, then the
    // lexicographically SMALLEST (left, right) — the recount loop's
    // minBy((-n, a, b)) selection, exactly
    val ord = new Ordering[(Long, String, String)] {
      def compare(x: (Long, String, String), y: (Long, String, String)): Int = {
        val c = java.lang.Long.compare(x._1, y._1)
        if (c != 0) c
        else {
          val a = y._2.compareTo(x._2)
          if (a != 0) a else y._3.compareTo(x._3)
        }
      }
    }
    val heap = mutable.PriorityQueue.empty[(Long, String, String)](ord)
    def addWordStats(idx: Int, sign: Long): Unit = {
      val syms = reps(idx); val n = cnt(idx) * sign
      var i = 0
      while (i < syms.length - 1) {
        val p = (syms(i), syms(i + 1))
        val c = counts.getOrElse(p, 0L) + n
        if (c == 0L) counts.remove(p) else counts(p) = c
        if (sign > 0) {
          occ.getOrElseUpdate(p, mutable.Set.empty[Int]) += idx
          heap.enqueue((c, p._1, p._2))
        } else {
          // retracted pairs may re-add below with their word's new
          // shape; membership is corrected there. The heap entry for
          // the lowered count lets the pair still win later rounds.
          if (c != 0L) heap.enqueue((c, p._1, p._2))
        }
        i += 1
      }
      if (sign < 0) {
        // drop stale occurrence memberships for pairs this word no
        // longer contains (cheap: only this word's old pairs checked)
        var j = 0
        while (j < syms.length - 1) {
          val p = (syms(j), syms(j + 1))
          occ.get(p).foreach { s => s -= idx; if (s.isEmpty) occ.remove(p) }
          j += 1
        }
      }
    }
    reps.indices.foreach(addWordStats(_, 1L))
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var continue = true
    while (continue && merges.length < numMerges) {
      // lazy deletion: pop until the stored count matches the live one
      var best: Option[(String, String)] = None
      while (best.isEmpty && heap.nonEmpty) {
        val (c, a, b) = heap.dequeue()
        if (counts.getOrElse((a, b), 0L) == c && c > 0L) best = Some((a, b))
      }
      best match {
        case None => continue = false
        case Some(p @ (a, b)) =>
          merges += p
          val merged = a + b
          val touched = occ.getOrElse(p, mutable.Set.empty[Int]).toArray
          touched.foreach { idx =>
            addWordStats(idx, -1L)
            val syms = reps(idx)
            val out = mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
                out += merged; i += 2
              } else { out += syms(i); i += 1 }
            }
            reps(idx) = out.toArray
            addWordStats(idx, 1L)
          }
      }
    }
    merges.toSeq
  }

  /** The merge table as a persistable artifact: (rank, left, right). */
  def mergesTable(spark: SparkSession, merges: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    merges.zipWithIndex.map { case ((a, b), r) => (r.toLong, a, b) }
      .toDF("rank", "left", "right")
  }

  /** Encode one TOKEN column to its BPE piece array: char split + the
    * end-of-word marker, then ONE `replace` per merge in rank order —
    * EXHAUSTIVE left-to-right application (the subword-nmt
    * convention), exactly.
    *
    * The representation makes a single scan exhaustive: symbols are
    * separated by DOUBLE spaces and the pattern ` a  b ` consumes one
    * space from each boundary while the replacement ` ab ` re-emits
    * them — every boundary is double again after a substitution, so
    * back-to-back chains keep matching as the scan proceeds
    * (`a a a a a a` → `aa aa aa`, spec-asserted on runs). A single
    * left-to-right scan equals exhaustive application because a
    * substitution can never create a NEW occurrence of its own pair:
    * the merged symbol `ab` is strictly longer than `a` and `b`, so
    * any new adjacency involves `ab`, a different pair. Pure column
    * expressions, map-only, codegen'd. */
  def encode(tok: Column, merges: Seq[(String, String)],
             byteLevel: Boolean = false,
             specials: Seq[String] = Nil): Column = {
    require(merges.nonEmpty && merges.size <= maxEncodeMerges,
      s"encode takes 1..$maxEncodeMerges merges (one expression node each; " +
        s"larger tables want a native kernel), got ${merges.size}")
    val base = if (byteLevel) byteRemap(tok) else tok
    val chars = concat(lit("  "),
      regexp_replace(base, "(.)", "$1  "), lit(EndOfWord + "  "))
    val folded = merges.foldLeft(chars) { case (acc, (a, b)) =>
      call_function("replace", acc, lit(s" $a  $b "), lit(s" $a$b "))
    }
    val pieces = split(trim(folded), "\\s+")
    // specials screen on the RAW token before the fold (and before the
    // byte pre-map) — one atomic piece, the kernel's rule exactly
    if (specials.isEmpty) pieces
    else when(tok.isin(specials.map(s => s: Any): _*), array(tok)).otherwise(pieces)
  }

  /** NATIVE-KERNEL encode (round 12 — the growth path [[encode]]
    * documents, built): ONE [[graft.expressions.BpeEncodeExpr]] node
    * applies the whole rank-ordered merge table — the table ships with
    * the plan like a broadcast and compiles once into a validated
    * pair→rank map with a per-thread encoded-word cache, so production
    * vocabularies (32k–100k merges) run inside whole-stage codegen
    * where the fold would need one expression node per merge.
    * Semantics are EXACTLY [[encode]]'s rank-order exhaustive
    * left-to-right convention (the table invariants that make the
    * kernel's min-rank loop equivalent are VALIDATED loudly at build —
    * see [[graft.expressions.BpeTable]]); kernel == fold is
    * spec-asserted bit-exactly on [[docMerges]] and on trained
    * tables. */
  def encodeKernel(tok: Column, merges: Seq[(String, String)],
                   byteLevel: Boolean = false,
                   specials: Seq[String] = Nil): Column = {
    require(merges.nonEmpty && merges.size <= maxTrainMerges,
      s"encodeKernel takes 1..$maxTrainMerges merges, got ${merges.size}")
    // byte mode rides INSIDE the kernel (round 14): the raw token is
    // the cache key and the byte→symbol pre-map runs once per DISTINCT
    // word per thread, next to the merge loop it feeds — the previous
    // column-level [[byteRemap]] ran per token occurrence, outside the
    // Zipf cache, and was the measured reason q136 scaled 27.2× at 30×
    // data while the char-mode q126 held 4.5×. Mapped symbols are
    // single code points, so the table validator runs unchanged.
    // `specials` bake into the validated table ([[Bos]]/[[Eos]]/[[Pad]]
    // atomicity + unforgeability — see [[DefaultSpecials]]).
    if (specials.isEmpty)
      call_function("graft_bpe_encode", tok,
        typedlit(merges.map(_._1)), typedlit(merges.map(_._2)), lit(byteLevel))
    else
      call_function("graft_bpe_encode", tok,
        typedlit(merges.map(_._1)), typedlit(merges.map(_._2)), lit(byteLevel),
        typedlit(specials))
  }

  /** Per-document BPE length stats under a merge table: the real
    * subword counts token budgets and packing should use.
    * (doc_id, n_words, n_pieces, chars_per_piece 4-dp).
    *
    * `useKernel = true` routes the per-word encode through
    * [[encodeKernel]] (required past [[maxEncodeMerges]] merges);
    * default stays the q125-certified expression fold. */
  def encodeStats(docs: DataFrame, merges: Seq[(String, String)],
                  idCol: String = "doc_id", textCol: String = "text",
                  useKernel: Boolean = false,
                  byteLevel: Boolean = false): DataFrame =
    wordPieces(docs, merges, idCol, textCol, useKernel, byteLevel)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(col("_p")).as("n_pieces"),
        round(sum(col("_c")).cast("double") / sum(col("_p")), 4).as("chars_per_piece"))

  /** ONE tokenize-and-encode body for [[encodeStats]], [[tokenizerParity]]
    * and [[bpePackedDocs]] (the corpus word convention + per-word piece
    * and char counts) — shared so the consumers cannot drift. */
  private def wordPieces(docs: DataFrame, merges: Seq[(String, String)],
                         keyCol: String, textCol: String,
                         useKernel: Boolean,
                         byteLevel: Boolean = false,
                         specials: Seq[String] = Nil): DataFrame = {
    // byte mode: the kernel path feeds the RAW word and remaps inside
    // the expression (per-distinct-word, cached — round 14); the fold
    // path keeps the column-level pre-map (its 256-node remap is the
    // certified small-table formulation). `_c` counts BYTES in byte
    // mode (the unit the fixed 256-symbol alphabet measures in — one
    // symbol per UTF-8 byte, so octet_length(raw) == length(mapped)),
    // chars otherwise.
    val pieces: Column => Column =
      if (useKernel) encodeKernel(_, merges, byteLevel, specials)
      else encode(_, merges, byteLevel, specials)
    val clen: Column => Column =
      if (byteLevel) octet_length(_) else length(_)
    docs
      .select(col(keyCol),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("_w0"))
      .filter(col("_w0") =!= "")
      .withColumn("_p", size(pieces(col("_w0"))).cast("long"))
      .withColumn("_c", clen(col("_w0")).cast("long"))
  }

  /** The q125 planted merge table — SHARED constants (the oracle
    * interpolates the same pairs): frequent word-salad letter pairs
    * plus one end-of-word merge and one three-deep chain, so rank
    * order, marker handling, and merge chaining all exercise. */
  val docMerges: Seq[(String, String)] = Seq(
    ("e", "r"), ("a", "t"), ("i", "n"), ("o", "w"),
    ("er", EndOfWord), ("at", "a"))

  /** C49 `q125_bpe_encode` — [[encodeStats]] over the documents corpus
    * with the planted [[docMerges]] table: the oracle replays the char
    * split, the marker, and the six replace folds in rank order, so
    * the encode SEMANTICS hash-check end to end. TRAINING is certified
    * by the planted-truth spec (the Sennrich low/lower/newest/widest
    * vocabulary with hand-derived merges), the KMeans convention:
    * learned artifacts get planted specs, their APPLICATION gets
    * oracles. */
  def bpeEncodeDocs(spark: SparkSession, dir: String): DataFrame =
    encodeStats(graft.Tables(spark, dir).documents, docMerges)
      .orderBy(col("doc_id"))

  /** The q126 planted 1024-merge table — generated by a FORMULA both
    * engines implement independently (the q104/q125
    * shared-table-definition convention, here as shared math): ranks
    * 0..675 are every ordered single-letter pair (x, y) for a–z in
    * lexicographic order (output "xy"), ranks 676..1023 attach the
    * end-of-word marker to the first 348 two-letter outputs
    * ("aa".."nj"). Every output is unique and every multi-char side is
    * created at an earlier rank, so the table passes the kernel's
    * training-invariant validation — and at 4× the fold's 256-merge
    * cap it exercises exactly the regime only the kernel can run. */
  val kernelMerges: Seq[(String, String)] = {
    val letters = ('a' to 'z').map(_.toString)
    val pairs = for (x <- letters; y <- letters) yield (x, y)
    val eow = (for (x <- letters; y <- letters) yield x + y)
      .take(348).map(s => (s, EndOfWord))
    (pairs ++ eow).toSeq
  }

  /** C49 `q126_bpe_kernel` — [[encodeStats]] through the NATIVE kernel
    * under the 1024-merge [[kernelMerges]] table (4× past the fold
    * cap). The DuckDB oracle regenerates the same table from the same
    * formula and replays the rank-order fold as a 1024-step recursive
    * CTE over the distinct-word table — per published-trainer
    * invariants (validated loudly in [[graft.expressions.BpeTable]])
    * the kernel's min-rank loop and the fold agree exactly, and the
    * hash check certifies it on the full corpus. TRAINING at this
    * scale is certified by the BpeSpec incremental-vs-recount parity
    * and the ≥1k-merge kernel==reference-fold assertions. */
  def bpeKernelDocs(spark: SparkSession, dir: String): DataFrame =
    encodeStats(graft.Tables(spark, dir).documents, kernelMerges,
      useKernel = true)
      .orderBy(col("doc_id"))

  /** The q136 byte-level planted table: the two UTF-8 byte pairs the
    * q136 dressing plants (ä = Ã+¤, é = Ã+©) so byte RE-ASSEMBLY
    * genuinely fires, one chain consuming a created byte symbol, one
    * end-of-word merge on one, then the q126 letter-pair formula for
    * bulk ranks — byte merges, chaining, the marker and a 680-rank
    * table all exercise under byte-level mode. */
  val byteKernelMerges: Seq[(String, String)] = {
    val byteMerges = Seq(("Ã", "¤"), ("Ã", "©"), ("t", "Ã¤"), ("Ã©", EndOfWord))
    val letters = ('a' to 'z').map(_.toString)
    byteMerges ++ (for (x <- letters; y <- letters) yield (x, y))
  }

  /** C49 `q136_bpe_byte_kernel` — BYTE-LEVEL kernel encoding
    * (GPT-2 base-alphabet convention) made a registered, oracle-backed
    * query. The ASCII-only corpus dresses with real multi-byte UTF-8
    * (a→ä, e→é via one `translate` — the site-dressing convention, so
    * the byte path PROVABLY fires on every doc rather than no-op'ing
    * into char-level agreement), then [[encodeStats]] runs the native
    * kernel in `byteLevel` mode under [[byteKernelMerges]]. The DuckDB
    * oracle replays the dressing, the byte map (restricted to this
    * corpus's alphabet: ASCII self-maps, ä/é expand to their byte
    * pairs — any out-of-contract character would hash-mismatch
    * loudly), and the rank-order fold as a 680-step recursive CTE.
    * `chars_per_piece` measures BYTES per piece here — the unit the
    * fixed 256-symbol alphabet counts in. */
  def bpeByteStatsDocs(spark: SparkSession, dir: String): DataFrame = {
    val dressed = graft.Tables(spark, dir).documents
      .withColumn("text", translate(lower(col("text")), "ae", "äé"))
    encodeStats(dressed, byteKernelMerges, useKernel = true, byteLevel = true)
      .transform(d => Perf.sortedOnce(d, col("doc_id")))
  }

  /** Tokenizer PARITY report — per-language fertility under a merge
    * table (Petrov et al. 2023, "Language Model Tokenizers Introduce
    * Unfairness Between Languages", arXiv:2305.15425 — fertility =
    * subword pieces per word; a vocabulary trained on one language
    * shreds the others, inflating their effective sequence lengths and
    * training cost): one explode, one kernel encode per word, one
    * |langs|-row aggregate. All columns exact integers except the two
    * 4-dp ratios; `n_single_piece` counts words the vocabulary covers
    * WHOLE (an end-of-word merge reached them). */
  def tokenizerParity(docs: DataFrame, merges: Seq[(String, String)],
                      langCol: String = "lang", textCol: String = "text"): DataFrame =
    wordPieces(docs.withColumnRenamed(langCol, "lang"), merges,
      "lang", textCol, useKernel = true)
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_words"),
        sum(col("_p")).as("n_pieces"),
        sum(when(col("_p") === 1, 1L).otherwise(0L)).as("n_single_piece"),
        round(sum(col("_p")).cast("double") / count(lit(1)), 4).as("fertility"),
        round(sum(col("_c")).cast("double") / sum(col("_p")), 4).as("chars_per_piece"))
      .orderBy(col("lang"))

  /** C49 `q131_tokenizer_parity` — [[tokenizerParity]] over the
    * documents corpus under the q126 planted table: the oracle replays
    * the recursive-CTE encode and the |langs|-row rollup. */
  def tokenizerParityDocs(spark: SparkSession, dir: String): DataFrame =
    tokenizerParity(graft.Tables(spark, dir).documents, kernelMerges)

  /** C48→C49 `q130_bpe_packing` — sequence packing budgeted in REAL
    * learned subwords: q124's assembly windows run on per-doc PIECE
    * counts from the native kernel under the q126 table, so the packed
    * artifact's budget is measured in the units a training loader
    * actually consumes (whitespace tokens under-count short subwords
    * by ~2× on this corpus — a whitespace-budgeted sequence overflows
    * a model's context window). Budget 4096 ≈ the q124 token budget at
    * the measured ~2 chars/piece rate; the oracle replays the q126
    * recursive-CTE encode AND the q124 packing math in one derivation. */
  def bpePackedDocs(spark: SparkSession, dir: String,
                    budget: Long = 4096L, shards: Int = 8): DataFrame = {
    val pieces = wordPieces(graft.Tables(spark, dir).documents, kernelMerges,
      "doc_id", "text", useKernel = true)
      .groupBy(col("doc_id")).agg(sum(col("_p")).as("n_tokens"))
    Sharding.assembleSequences(pieces, "doc_id", "n_tokens", budget, shards)
      .transform(d => Perf.sortedOnce(d, col("shard"), col("chunk")))
  }

  /** Id-level NATIVE encode (round 14 — the other half of the
    * tokenizer contract: a training loader consumes INT IDS, not piece
    * strings): one [[graft.expressions.BpeEncodeIdsExpr]] node maps
    * each word to its id array under the table's deterministic id
    * space — specials at the reserved low ids 0..s−1 (BOS first), the
    * end-of-word marker at s, the 256 byte symbols at s+1..s+256, and
    * merge outputs at s+257+rank. Pure arithmetic over (specials,
    * merges), so any engine re-derives identical ids — the q143 oracle
    * does, from scratch. Byte-level only (the sole CLOSED base
    * alphabet; char mode refuses loudly). */
  def encodeIdsKernel(tok: Column, merges: Seq[(String, String)],
                      specials: Seq[String] = DefaultSpecials): Column = {
    require(merges.nonEmpty && merges.size <= maxTrainMerges,
      s"encodeIdsKernel takes 1..$maxTrainMerges merges, got ${merges.size}")
    call_function("graft_bpe_encode_ids", tok,
      typedlit(merges.map(_._1)), typedlit(merges.map(_._2)), lit(true),
      typedlit(specials))
  }

  /** The id space as a persistable (id, piece) table — the vocabulary
    * artifact shipped next to a trained merge table (the same rule
    * [[encodeIdsKernel]] bakes into the kernel; built driver-side, the
    * row count is bounded by |specials| + 257 + |merges|). */
  def vocabularySeq(merges: Seq[(String, String)],
                    specials: Seq[String] = DefaultSpecials): Seq[(Int, String)] = {
    val s0 = specials.size
    specials.zipWithIndex.map { case (s, i) => (i, s) } ++
      Seq((s0, EndOfWord)) ++
      byteSymbols.zipWithIndex.map { case (s, b) => (s0 + 1 + b, s) } ++
      merges.zipWithIndex.map { case ((l, r), k) => (s0 + 257 + k, l + r) }
  }

  /** C49d→C49e `q143_bpe_token_ids` — the id assignment, oracle-backed
    * end to end on the q136 byte-dressed corpus: every word encodes to
    * ids through the kernel, every document carries its BOS/EOS
    * delimiters (+2 pieces, +BOS+EOS = +1 to the id sum — the reserved
    * ids 0 and 1 participating in real arithmetic), and the DuckDB
    * oracle re-derives the SAME ids from scratch: the recursive-CTE
    * fold produces the piece strings, and the id rule replays as pure
    * SQL — marker → s, single-symbol piece → byte-table lookup
    * (interpolated from the shared [[byteSymbols]] constants, the
    * q104/q121 convention), multi-char piece → merge-output rank join
    * (outputs are unique by the validator's invariant, so the join is
    * exact). A drifted id anywhere flips `id_sum` and fails the hash. */
  def bpeTokenIdsDocs(spark: SparkSession, dir: String): DataFrame = {
    val dressed = graft.Tables(spark, dir).documents
      .withColumn("text", translate(lower(col("text")), "ae", "äé"))
    val bosEos = DefaultSpecials.indexOf(Bos).toLong + DefaultSpecials.indexOf(Eos)
    dressed
      .select(col("doc_id"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("_w0"))
      .filter(col("_w0") =!= "")
      .withColumn("_ids", encodeIdsKernel(col("_w0"), byteKernelMerges))
      .groupBy(col("doc_id"))
      .agg(
        (sum(size(col("_ids"))) + lit(2L)).as("n_pieces"),
        (sum(aggregate(col("_ids"), lit(0L), (acc, x) => acc + x))
          + lit(bosEos)).as("id_sum"),
        max(array_max(col("_ids"))).cast("long").as("max_id"))
      .transform(d => Perf.sortedOnce(d, col("doc_id")))
  }

  /** C48→C49e `q144_bpe_packed_ids` — the TRAINING EXPORT itself
    * (round 14): every packed chunk's actual token-id stream, ready
    * for a loader — each document rides as `BOS ++ ids ++ EOS`
    * (word-order preserved via the position-keyed assembly), documents
    * concatenate in id order inside their chunk, and the stream is
    * emitted as the comma-joined id list (the q124 list convention, so
    * both engines compare exact element order). This is the artifact
    * every upstream stage exists for: dedup → filter → pack →
    * delimited id sequences; the oracle re-derives the ENTIRE chain —
    * byte dressing, fold, id rule, per-doc order, packing, chunk
    * concatenation — from scratch, hash-exact. */
  def bpePackedIdsDocs(spark: SparkSession, dir: String,
                       budget: Long = 4096L, shards: Int = 8): DataFrame = {
    val dressed = graft.Tables(spark, dir).documents
      .withColumn("text", translate(lower(col("text")), "ae", "äé"))
    val bosId = DefaultSpecials.indexOf(Bos)
    val eosId = DefaultSpecials.indexOf(Eos)
    // position-keyed: the id stream must preserve word order, which
    // the bag-shaped groupBy of the stats queries never needed
    val words = Perf.kernelSpread(dressed.select(col("doc_id"), col("text")))
      .select(col("doc_id"),
        posexplode(split(lower(trim(col("text"))), "\\s+")).as(Seq("_pos", "_w0")))
      .filter(col("_w0") =!= "")
      .withColumn("_ids", encodeIdsKernel(col("_w0"), byteKernelMerges))
    // materialized: the packing pass and the chunk join both read it
    val perDoc = words.groupBy(col("doc_id"))
      .agg(concat(
        array(lit(bosId)),
        flatten(transform(
          sort_array(collect_list(struct(col("_pos").as("p"), col("_ids").as("x")))),
          s => s.getField("x"))),
        array(lit(eosId))).as("dseq"))
      .withColumn("n_tokens", size(col("dseq")).cast("long"))
      .localCheckpoint()
    Sharding.packByTokenBudget(
        perDoc.select(col("doc_id"), col("n_tokens")),
        "doc_id", "n_tokens", budget, shards)
      .join(perDoc.select(col("doc_id"), col("dseq")), Seq("doc_id"))
      .groupBy(col("shard"), col("chunk"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sort_array(collect_list(struct(col("doc_id").as("i"), col("dseq").as("s"))))
          .as("_d"))
      .withColumn("ids", array_join(
        transform(flatten(transform(col("_d"), s => s.getField("s"))),
          x => x.cast("string")), ","))
      .drop("_d")
      .transform(d => Perf.sortedOnce(d, col("shard"), col("chunk")))
  }

  /** Inverse of [[encodeIdsKernel]] — the DECODE half of the tokenizer
    * contract (round 14): an id array maps back through the
    * deterministic id space to its piece strings ([[vocabularySeq]],
    * broadcast as one bounded map literal), pieces concatenate
    * losslessly (a merge output is always the concatenation of its
    * sides), the single end-of-word marker strips as a suffix, and the
    * byte symbols UTF-8-decode ([[byteDecode]]). Specials decode to
    * their literal `<|…|>` spelling — printable-latin bytes are fixed
    * points of the GPT-2 byte map, so the atomic round trip falls out
    * of the same table. Map-only column arithmetic, no UDF. Stated
    * limitation (Sennrich's own): text whose final word literally ends
    * in `</w>` would collide with the marker suffix — the corpus-wide
    * q150 identity check is exactly the proof this never bites. */
  def decodeIds(ids: Column, merges: Seq[(String, String)],
                specials: Seq[String] = DefaultSpecials): Column = {
    require(merges.nonEmpty && merges.size <= maxTrainMerges,
      s"decodeIds takes 1..$maxTrainMerges merges, got ${merges.size}")
    val vocab = typedlit(vocabularySeq(merges, specials)
      .map { case (i, p) => i -> p }.toMap)
    byteDecode(regexp_replace(
      array_join(transform(ids, id => element_at(vocab, id.cast("int"))), ""),
      "</w>\\z", ""))
  }

  /** C49g `q150_bpe_decode_roundtrip` — decode(encode(word)) == word,
    * CORPUS-WIDE: every dressed word encodes to ids through the native
    * kernel and decodes back through [[decodeIds]]; documents
    * reassemble in word order. The oracle side is deliberately just
    * the dressing (split → rejoin) — the IDENTITY is the check: any
    * drift anywhere in the id space, the merge fold, the byte map or
    * its inverse leaves some word unable to round-trip and flips the
    * hash. This closes the tokenizer's production surface: train
    * (q125) → encode (q126/q136) → ids (q143) → pack (q144) → decode. */
  def bpeDecodeDocs(spark: SparkSession, dir: String): DataFrame = {
    val dressed = graft.Tables(spark, dir).documents
      .withColumn("text", translate(lower(col("text")), "ae", "äé"))
    val words = Perf.kernelSpread(dressed.select(col("doc_id"), col("text")))
      .select(col("doc_id"),
        posexplode(split(lower(trim(col("text"))), "\\s+")).as(Seq("_pos", "_w0")))
      .filter(col("_w0") =!= "")
    // round-trip once per DISTINCT word, broadcast back onto the
    // occurrences: the encode kernel caches per distinct word already,
    // but decodeIds' map-lookup/regex column chain ran per OCCURRENCE
    // — Zipf makes occurrences ≫ distinct (270k vs 31 at sf0.1;
    // 16.7 s → the encode-side ~1 s), and a real corpus vocabulary
    // (millions of words) still broadcasts in tens of MB
    val uniq = words.select(col("_w0")).distinct()
      .withColumn("_dec",
        decodeIds(encodeIdsKernel(col("_w0"), byteKernelMerges), byteKernelMerges))
    words.join(broadcast(uniq), Seq("_w0"))
      .groupBy(col("doc_id"))
      .agg(
        array_join(transform(
          sort_array(collect_list(struct(col("_pos").as("p"), col("_dec").as("w")))),
          s => s.getField("w")), " ").as("text"),
        count(lit(1)).as("n_words"))
      .transform(d => Perf.sortedOnce(d, col("doc_id")))
  }

  /** C48→C49 `q142_bpe_packed_special` — q130's packing under the
    * DOCUMENT-DELIMITER contract (round 14): each document's packed
    * sequence is `BOS + pieces + EOS`, so its budget cost is its
    * kernel piece count plus 2 — the boundary tokens a training loader
    * needs to delimit documents the standard way, now counted by the
    * packer instead of silently absent. The kernel encodes with
    * [[DefaultSpecials]] REGISTERED: the table validator proves the
    * q126 merge table can neither produce nor consume a special (so
    * boundaries are unforgeable from ordinary text — refusal and
    * atomicity are spec-certified on a hostile table in BpeSpec), and
    * the oracle replays the q126 recursive-CTE encode with the
    * constant per-doc +2 shift through the q124 packing math. */
  def bpePackedDelimitedDocs(spark: SparkSession, dir: String,
                             budget: Long = 4096L, shards: Int = 8): DataFrame = {
    val pieces = wordPieces(graft.Tables(spark, dir).documents, kernelMerges,
      "doc_id", "text", useKernel = true, specials = DefaultSpecials)
      .groupBy(col("doc_id"))
      .agg((sum(col("_p")) + lit(2L)).as("n_tokens"))
    Sharding.assembleSequences(pieces, "doc_id", "n_tokens", budget, shards)
      .transform(d => Perf.sortedOnce(d, col("shard"), col("chunk")))
  }
}

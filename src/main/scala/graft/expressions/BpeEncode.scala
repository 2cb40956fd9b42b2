package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled BPE merge table — the native-kernel growth path the
  * 256-merge expression fold ([[graft.operators.Bpe.encode]]) documents:
  * ONE expression node applies the WHOLE rank-ordered table (shipped
  * with the plan like a broadcast: serialized once per task, not one
  * `replace` node per merge), so production vocabularies (32k–100k
  * merges) encode inside whole-stage codegen.
  *
  * Semantics are EXACTLY the fold's (Sennrich 2016: merges apply in
  * rank order, each exhaustively left-to-right), implemented as the
  * min-rank-present loop every published fast encoder uses: repeatedly
  * find the lowest-ranked merge whose pair is adjacent in the word and
  * apply it exhaustively left-to-right. The two formulations agree
  * exactly when the table carries BPE-training invariants, which the
  * constructor VALIDATES loudly rather than assumes:
  *
  *  - consistency: each multi-char side of a merge is the output of an
  *    EARLIER merge (in a char-split word, a multi-char symbol cannot
  *    exist before the merge that creates it — so under rank order,
  *    once rank r is processed no pair of rank ≤ r can ever re-appear);
  *  - unique outputs: no two merges create the same symbol string, and
  *    no output collides with a base symbol (single char or the
  *    end-of-word marker) — without this, a later rule re-creating an
  *    already-processed rank's operand would let the min-rank loop
  *    merge a pair the fold has moved past.
  *
  * Trained tables satisfy both by construction; hand-planted tables
  * that don't fail loudly here instead of silently diverging from the
  * certified fold.
  *
  * Per-thread bounded word cache: natural text is Zipfian, so the
  * encode cost of a 100 TB scan concentrates on a small distinct
  * vocabulary per partition — identical words hit the cache instead of
  * re-running the merge loop.
  */
final class BpeTable(val lefts: Array[String], val rights: Array[String],
                     val byteLevel: Boolean = false,
                     val specials: Array[String] = Array.empty)
    extends Serializable {
  import BpeTable._

  require(lefts.length == rights.length,
    s"merge table sides differ: ${lefts.length} lefts vs ${rights.length} rights")
  require(lefts.length >= 1 && lefts.length <= MaxMerges,
    s"merge table must hold [1, $MaxMerges] merges, got ${lefts.length}")

  private def isBase(s: String): Boolean =
    s == EndOfWord || (s.nonEmpty && s.codePointCount(0, s.length) == 1)

  /** Reserved special tokens (round 14 — the production tokenizer
    * contract): a token EQUAL to a special encodes atomically as one
    * piece (no end-of-word marker, no merges, screened on the RAW
    * string even in byte mode — the GPT-2 convention: specials are
    * matched before byte encoding), and the validator refuses any
    * table whose merges could produce or consume one — so no merge
    * sequence over ordinary text can ever fabricate a special, and a
    * downstream trainer can trust document boundaries. */
  private val specialSet: java.util.HashSet[String] = {
    val set = new java.util.HashSet[String]()
    specials.foreach { s =>
      require(s != null && !isBase(s),
        s"special token '$s' must be a multi-character string (a base " +
          "symbol could appear inside ordinary words and break atomicity)")
      require(set.add(s), s"special token '$s' is listed twice")
    }
    set
  }
  validate()

  /** Unambiguous pair key: the left side's length prefixes the
    * concatenation, so two distinct (left, right) pairs can never
    * collide — even if a symbol itself contains the old separator
    * character. Keeps the source file pure text (no embedded NULs). */
  @inline private def pairKey(l: String, r: String): String =
    new java.lang.StringBuilder(l.length + r.length + 4)
      .append(l.length).append(':').append(l).append(r).toString

  private def validate(): Unit = {
    val created = new java.util.HashSet[String]()
    val seenPairs = new java.util.HashSet[String]()
    var r = 0
    while (r < lefts.length) {
      val l = lefts(r); val rt = rights(r)
      require(l != null && rt != null && l.nonEmpty && rt.nonEmpty,
        s"merge table rank $r has a null/empty side")
      require(!specialSet.contains(l) && !specialSet.contains(rt),
        s"merge table rank $r consumes a reserved special token — specials are " +
          "atomic whole-word symbols and can never appear inside a merge")
      require(isBase(l) || created.contains(l),
        s"merge table rank $r left '$l' is neither a base symbol nor the output " +
          "of an earlier merge — min-rank encoding would diverge from the rank-order fold")
      require(isBase(rt) || created.contains(rt),
        s"merge table rank $r right '$rt' is neither a base symbol nor the output " +
          "of an earlier merge — min-rank encoding would diverge from the rank-order fold")
      val out = l + rt
      require(!specialSet.contains(out),
        s"merge table rank $r output '$out' would fabricate a reserved special " +
          "token from ordinary text — document boundaries would be forgeable")
      require(!created.contains(out) && !isBase(out),
        s"merge table rank $r output '$out' duplicates an earlier output or a base " +
          "symbol — a re-created operand would let an already-processed rank re-fire")
      require(seenPairs.add(pairKey(l, rt)),
        s"merge table rank $r duplicates the pair ('$l', '$rt')")
      created.add(out)
      r += 1
    }
  }

  /** pair -> rank; rebuilt lazily on each JVM after deserialization. */
  @transient private lazy val rank: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](lefts.length * 2)
    var r = 0
    while (r < lefts.length) {
      m.put(pairKey(lefts(r), rights(r)), Integer.valueOf(r))
      r += 1
    }
    m
  }

  @transient private lazy val cacheTL: ThreadLocal[java.util.LinkedHashMap[String, GenericArrayData]] =
    new ThreadLocal[java.util.LinkedHashMap[String, GenericArrayData]] {
      override def initialValue(): java.util.LinkedHashMap[String, GenericArrayData] =
        new java.util.LinkedHashMap[String, GenericArrayData](1024, 0.75f, true) {
          override def removeEldestEntry(
              e: java.util.Map.Entry[String, GenericArrayData]): Boolean =
            size() > CacheWords
        }
    }

  def encode(tok: UTF8String): ArrayData = {
    // cache key = the RAW token (round 14): in byteLevel mode the
    // byte→symbol pre-map runs INSIDE encodeUncached, so it amortizes
    // over the per-thread Zipf word cache exactly like the merge loop —
    // the previous column-level remap ran per token OCCURRENCE (hex
    // split + 256-map lookup per byte) and was measured costing q136
    // 27.2× at 30× data where the char-mode twin q126 held 4.5×
    val s = tok.toString
    val cache = cacheTL.get()
    val hit = cache.get(s)
    if (hit != null) return hit
    val out =
      if (specialSet.contains(s))
        new GenericArrayData(Array[Any](UTF8String.fromString(s)))
      else encodeUncached(s)
    cache.put(s, out)
    out
  }

  private def encodeUncached(s: String): GenericArrayData = {
    val syms = new java.util.ArrayList[String](s.length + 1)
    if (byteLevel) {
      // GPT-2 bytes_to_unicode base alphabet: one symbol per UTF-8
      // byte — a 256-entry array lookup, no hex round-trip
      val bs = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var i = 0
      while (i < bs.length) { syms.add(ByteSymbols(bs(i) & 0xFF)); i += 1 }
    } else {
      // char split by code point (the fold's regex `(.)` matches one
      // code point)
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        syms.add(new String(Character.toChars(cp)))
        i += Character.charCount(cp)
      }
    }
    syms.add(EndOfWord)
    // min-rank loop: lowest-ranked present pair, merged exhaustively
    // left-to-right, until no table pair is adjacent
    var done = false
    while (!done && syms.size() > 1) {
      var bestRank = Int.MaxValue
      var j = 0
      while (j < syms.size() - 1) {
        val r = rank.get(pairKey(syms.get(j), syms.get(j + 1)))
        if (r != null && r.intValue() < bestRank) bestRank = r.intValue()
        j += 1
      }
      if (bestRank == Int.MaxValue) done = true
      else {
        val a = lefts(bestRank); val b = rights(bestRank)
        val merged = a + b
        val out = new java.util.ArrayList[String](syms.size())
        var k = 0
        while (k < syms.size()) {
          if (k < syms.size() - 1 && syms.get(k) == a && syms.get(k + 1) == b) {
            out.add(merged); k += 2
          } else { out.add(syms.get(k)); k += 1 }
        }
        syms.clear(); syms.addAll(out)
      }
    }
    val arr = new Array[Any](syms.size())
    var p = 0
    while (p < syms.size()) { arr(p) = UTF8String.fromString(syms.get(p)); p += 1 }
    new GenericArrayData(arr)
  }

  /** The deterministic ID SPACE over this table's closed piece
    * universe (round 14 — the half of the tokenizer contract a
    * training loader actually consumes; requires `byteLevel`, the only
    * mode whose base alphabet is CLOSED): specials take the reserved
    * low ids 0..s−1 in declaration order (BOS first by convention),
    * the end-of-word marker id s, the 256 byte symbols ids s+1..s+256
    * in byte order, and merge outputs id s+257+rank. A bijection by
    * the validator's own invariants: outputs are unique, never base
    * symbols, never specials; specials are never single code points.
    * Pure arithmetic over (specials, merges) — any engine re-derives
    * the identical ids, which is what makes the id assignment
    * oracle-checkable. */
  @transient lazy val idOf: java.util.HashMap[String, Integer] = {
    require(byteLevel,
      "token ids need the CLOSED byte-level alphabet — char-level base " +
        "symbols are unbounded, so no finite id space exists for them")
    val m = new java.util.HashMap[String, Integer](specials.length + 257 + lefts.length)
    specials.zipWithIndex.foreach { case (s, i) => m.put(s, Integer.valueOf(i)) }
    val s0 = specials.length
    m.put(EndOfWord, Integer.valueOf(s0))
    var b = 0
    while (b < 256) { m.put(ByteSymbols(b), Integer.valueOf(s0 + 1 + b)); b += 1 }
    var r = 0
    while (r < lefts.length) {
      m.put(lefts(r) + rights(r), Integer.valueOf(s0 + 257 + r)); r += 1
    }
    m
  }

  @transient private lazy val idsCacheTL: ThreadLocal[java.util.LinkedHashMap[String, GenericArrayData]] =
    new ThreadLocal[java.util.LinkedHashMap[String, GenericArrayData]] {
      override def initialValue(): java.util.LinkedHashMap[String, GenericArrayData] =
        new java.util.LinkedHashMap[String, GenericArrayData](1024, 0.75f, true) {
          override def removeEldestEntry(
              e: java.util.Map.Entry[String, GenericArrayData]): Boolean =
            size() > CacheWords
        }
    }

  /** [[encode]] composed with [[idOf]] — pieces to ids in one kernel
    * call, its own per-thread cache on the raw token (the id array is
    * what a packing/export scan reads; caching the string pieces AND
    * re-mapping per occurrence would forfeit half the amortization). */
  def encodeIds(tok: UTF8String): ArrayData = {
    val s = tok.toString
    val cache = idsCacheTL.get()
    val hit = cache.get(s)
    if (hit != null) return hit
    val pieces = encode(tok)
    val n = pieces.numElements()
    val arr = new Array[Any](n)
    var i = 0
    while (i < n) {
      val p = pieces.getUTF8String(i).toString
      val id = idOf.get(p)
      // unreachable in byte mode by construction — loud beats wrong
      require(id != null, s"piece '$p' has no id in this table's vocabulary")
      arr(i) = id.intValue()
      i += 1
    }
    val out = new GenericArrayData(arr)
    cache.put(s, out)
    out
  }

  override def equals(o: Any): Boolean = o match {
    case t: BpeTable =>
      byteLevel == t.byteLevel &&
        java.util.Arrays.equals(lefts.asInstanceOf[Array[AnyRef]], t.lefts.asInstanceOf[Array[AnyRef]]) &&
        java.util.Arrays.equals(rights.asInstanceOf[Array[AnyRef]], t.rights.asInstanceOf[Array[AnyRef]]) &&
        java.util.Arrays.equals(specials.asInstanceOf[Array[AnyRef]], t.specials.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    ((java.util.Arrays.hashCode(lefts.asInstanceOf[Array[AnyRef]]) * 31 +
      java.util.Arrays.hashCode(rights.asInstanceOf[Array[AnyRef]])) * 31 +
      byteLevel.hashCode()) * 31 +
      java.util.Arrays.hashCode(specials.asInstanceOf[Array[AnyRef]])
}

object BpeTable {
  /** Must match [[graft.operators.Bpe.EndOfWord]] (spec-pinned). */
  val EndOfWord = "</w>"
  /** Table bound: past GPT-class vocabularies this is a config error. */
  val MaxMerges = 131072
  /** Per-thread encoded-word cache entries. */
  val CacheWords = 65536

  /** The GPT-2 byte→unicode symbol table (Radford et al. 2019,
    * `bytes_to_unicode`): printable latin bytes (33–126, 161–172,
    * 174–255) map to themselves, the rest to 256+n in ascending byte
    * order. Lives here (next to the kernel that consumes it per byte);
    * [[graft.operators.Bpe.byteSymbols]] re-exposes it as the
    * column-API constant. */
  val ByteSymbols: Array[String] = {
    val self = ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    var n = -1
    (0 until 256).map { b =>
      if (self(b)) b.toChar.toString
      else { n += 1; (256 + n).toChar.toString }
    }.toArray
  }
}

/** Native BPE encode: `graft_bpe_encode(tok, lefts, rights)` →
  * `array<string>` pieces. The SQL surface takes the merge table as two
  * FOLDABLE array<string> literals (rank order = array order); the
  * function builder evaluates them ONCE at analysis time into a
  * validated [[BpeTable]] baked into this unary expression, so per-row
  * work is one kernel call and the table ships with the plan like a
  * broadcast — never re-parsed per row. */
case class BpeEncodeExpr(child: Expression, table: BpeTable) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_encode"

  override protected def nullSafeEval(tok: Any): Any =
    table.encode(tok.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table, classOf[BpeTable].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $ref.encode($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeExpr =
    copy(child = newChild)
}

/** Native id-level BPE encode: `graft_bpe_encode_ids(tok, lefts,
  * rights, byteLevel, specials)` → `array<int>` token ids under the
  * table's deterministic id space ([[BpeTable.idOf]]). Same plan-
  * shipped validated table, same per-thread caching; byteLevel must be
  * TRUE (the closed-alphabet mode — the id space is a bijection only
  * there, checked loudly at first evaluation). */
case class BpeEncodeIdsExpr(child: Expression, table: BpeTable) extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "graft_bpe_encode_ids"

  override protected def nullSafeEval(tok: Any): Any =
    table.encodeIds(tok.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table, classOf[BpeTable].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $ref.encodeIds($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeIdsExpr =
    copy(child = newChild)
}

object BpeEncodeExpr {

  /** Function builder for the SQL registration: children are
    * (tok, lefts: foldable array<string>, rights: foldable
    * array<string>[, byteLevel: foldable boolean]). The side arrays are
    * required foldable because the table must validate and compile
    * ONCE — a per-row table would re-validate 131k merges per record;
    * byteLevel likewise bakes into the table so the per-byte pre-map
    * joins the per-distinct-word cached path. */
  def build(children: Seq[Expression]): Expression = {
    require(children.size >= 3 && children.size <= 5,
      s"graft_bpe_encode takes (tok, lefts, rights[, byteLevel[, specials]]), " +
        s"got ${children.size} arguments")
    def sides(e: Expression, which: String): Array[String] = {
      require(e.foldable && e.dataType.isInstanceOf[ArrayType],
        s"graft_bpe_encode $which must be a foldable array<string> literal")
      val arr = e.eval(null).asInstanceOf[ArrayData]
      require(arr != null, s"graft_bpe_encode $which must not be null")
      arr.toArray[UTF8String](StringType).map { u =>
        require(u != null, s"graft_bpe_encode $which must not contain nulls")
        u.toString
      }
    }
    val byteLevel = children.lift(3).exists { e =>
      require(e.foldable && e.dataType == org.apache.spark.sql.types.BooleanType,
        "graft_bpe_encode byteLevel must be a foldable boolean literal")
      val v = e.eval(null)
      require(v != null, "graft_bpe_encode byteLevel must not be null")
      v.asInstanceOf[Boolean]
    }
    val specials = children.lift(4)
      .map(sides(_, "specials")).getOrElse(Array.empty[String])
    BpeEncodeExpr(children.head,
      new BpeTable(sides(children(1), "lefts"), sides(children(2), "rights"),
        byteLevel, specials))
  }

  /** Builder for `graft_bpe_encode_ids` — the same five children, the
    * id-emitting expression. Shares every validation path with
    * [[build]] through the common table construction. */
  def buildIds(children: Seq[Expression]): Expression =
    build(children) match {
      case BpeEncodeExpr(child, table) =>
        require(table.byteLevel,
          "graft_bpe_encode_ids requires byteLevel=true — only the closed " +
            "256-symbol byte alphabet admits a finite id space")
        BpeEncodeIdsExpr(child, table)
      case other => other
    }
}

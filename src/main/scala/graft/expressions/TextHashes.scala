package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared primitive kernels for the text-hash expressions. A top-level
  * Scala object compiles with static forwarders, so generated (Janino)
  * code calls these directly — the expressions stay inside whole-stage
  * codegen with zero lambda/boxing overhead per element.
  *
  * The 64-bit string hash is a public-domain FNV-1a core with a
  * SplitMix64 finalizer per hash index — deterministic across runs and
  * engines, which is all the LSH family needs.
  */
object Kernels {

  def hash64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xCBF29CE484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001B3L
      i += 1
    }
    h
  }

  private def mix(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** MinHash signature: per hash index j, min over elements of
    * mix(fnv(element) + j * golden). One pass over the array. */
  def minhash(arr: ArrayData, k: Int): ArrayData = {
    val out = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val base = hash64(arr.getUTF8String(i))
        var j = 0
        while (j < k) {
          val h = mix(base + j * 0x9E3779B97F4A7C15L)
          if (h < out(j)) out(j) = h
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Fused k-token-shingle MinHash: slides a `shingle`-token window over
    * the token array, folds the tokens' bytes (with separators) straight
    * into the FNV core — no shingle strings are ever materialized — and
    * updates all k minima per window. MinHash over the shingle multiset
    * equals MinHash over the set, so no distinct pass is needed. */
  def minhashShingled(toks: ArrayData, shingle: Int, k: Int): ArrayData = {
    val out = Array.fill(k)(Long.MaxValue)
    val n = toks.numElements()
    val windows = math.max(n - shingle + 1, 1)
    var i = 0
    while (i < windows) {
      var h = 0xCBF29CE484222325L
      val end = math.min(i + shingle, n)
      var j = i
      while (j < end) {
        if (!toks.isNullAt(j)) {
          val bytes = toks.getUTF8String(j).getBytes
          var p = 0
          while (p < bytes.length) {
            h ^= (bytes(p) & 0xffL)
            h *= 0x100000001B3L
            p += 1
          }
        }
        h ^= 0x20L // separator byte between tokens
        h *= 0x100000001B3L
        j += 1
      }
      var q = 0
      while (q < k) {
        val hq = mix(h + q * 0x9E3779B97F4A7C15L)
        if (hq < out(q)) out(q) = hq
        q += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Per-start hashed k-token windows — the ExactSubstr census key
    * material (out(i) = fold of tokens i..i+k-1): position IS the array
    * index, so posexplode yields (wstart, whash) directly and no window
    * string is ever materialized. Documents shorter than k yield an
    * EMPTY array (no windows — the span coverage math depends on that,
    * unlike minhashShingled's clamp which always emits at least one
    * window).
    *
    * Framing: each token folds as (byte-length, bytes) — a
    * length-prefixed code is uniquely decodable, so distinct token
    * PARTITIONS of the same concatenated bytes hash differently
    * (['a b','c'] vs ['a','b c']). A fixed separator byte would be
    * ambiguous here because dropRepeatedSpans exposes `sep`: with e.g.
    * sep='\n' tokens legitimately contain 0x20, making separator-byte
    * collisions deterministic rather than ~2^-64 random.
    * (minhashShingled keeps its 0x20 separator: its callers always
    * split on whitespace, so its tokens cannot contain 0x20.) */
  def spanWindowHashes(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](n - k + 1)
    var i = 0
    while (i <= n - k) {
      var h = 0xCBF29CE484222325L
      var j = i
      while (j < i + k) {
        val len = if (toks.isNullAt(j)) -1 else toks.getUTF8String(j).numBytes()
        h ^= (len & 0xffL);         h *= 0x100000001B3L
        h ^= ((len >> 8) & 0xffL);  h *= 0x100000001B3L
        h ^= ((len >> 16) & 0xffL); h *= 0x100000001B3L
        h ^= ((len >> 24) & 0xffL); h *= 0x100000001B3L
        if (len > 0) {
          val bytes = toks.getUTF8String(j).getBytes
          var p = 0
          while (p < bytes.length) {
            h ^= (bytes(p) & 0xffL)
            h *= 0x100000001B3L
            p += 1
          }
        }
        j += 1
      }
      out(i) = mix(h)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Distinct hashed character n-grams of a string in one pass — the
    * inverted-index key material for n-gram Jaccard, without gram string
    * allocation. Returns the distinct 64-bit gram hashes. */
  def ngramHashes(s: UTF8String, n: Int): ArrayData = {
    val str = s.toString
    val len = str.length
    val windows = math.max(len - n + 1, 1)
    val seen = new java.util.HashSet[java.lang.Long](math.min(windows * 2, 1024))
    var i = 0
    while (i < windows) {
      var h = 0xCBF29CE484222325L
      val end = math.min(i + n, len)
      var j = i
      while (j < end) {
        val c = str.charAt(j)
        h ^= (c & 0xffL)
        h *= 0x100000001B3L
        h ^= ((c >> 8) & 0xffL)
        h *= 0x100000001B3L
        j += 1
      }
      seen.add(h)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }

  /** 64-bit SimHash of the token multiset: ±1 per bit of each token's
    * hash, sign of the sum becomes the bit. */
  def simhash64(arr: ArrayData): Long = {
    val acc = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = hash64(arr.getUTF8String(i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) != 0L) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (acc(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  private val md5Digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Winnowing selection (Schleimer/Wilkerson/Aiken 2003) in one pass
    * per document: char k-gram hashes on the portable 60-bit md5
    * domain (bytes 0–7 big-endian >>> 4 — see [[simhash60Md5]]), one
    * selected per w-window of consecutive grams (minimum; ties to the
    * RIGHTMOST, the robust-winnowing rule). The text must already be
    * normalized. Grams are k CODE POINTS (matching SQL substr/length
    * char semantics — offsets walk UTF-8 sequence starts), digested
    * straight from the byte range with a thread-local md5, no gram
    * strings. Selections advance monotonically with the window, so
    * duplicates are only ever adjacent — suppressed inline, no
    * distinct pass.
    * @return array<struct<h: long, pos: int>>, pos 1-based */
  def winnowSelect(t: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = t.getBytes
    var n = 0
    var i = 0
    while (i < bytes.length) { if ((bytes(i) & 0xC0) != 0x80) n += 1; i += 1 }
    val offs = new Array[Int](n + 1)
    var c = 0; i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xC0) != 0x80) { offs(c) = i; c += 1 }
      i += 1
    }
    offs(n) = bytes.length
    val ng = n - k + 1
    if (ng < w) return new GenericArrayData(Array.empty[Any])
    val h = new Array[Long](ng)
    val md = md5Digest.get()
    i = 0
    while (i < ng) {
      md.reset()
      md.update(bytes, offs(i), offs(i + k) - offs(i))
      val d = md.digest()
      var top = 0L
      var j = 0
      while (j < 8) { top = (top << 8) | (d(j) & 0xffL); j += 1 }
      h(i) = top >>> 4
      i += 1
    }
    val sel = new scala.collection.mutable.ArrayBuffer[Any](2 * ng / (w + 1) + 4)
    var last = -1
    var s = 0
    while (s <= ng - w) {
      var best = s
      var j = s + 1
      while (j < s + w) { if (h(j) <= h(best)) best = j; j += 1 }
      if (best != last) {
        sel += new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](h(best), best + 1))
        last = best
      }
      s += 1
    }
    new GenericArrayData(sel.toArray)
  }

  /** 60-bit SimHash over md5-derived token hashes — the ENGINE-PORTABLE
    * variant. Per token, the hash is the first 15 hex nibbles of
    * md5(token) (= the big-endian long of digest bytes 0–7, >>> 4),
    * which any engine with md5 reproduces exactly:
    * `('0x' || substr(md5(tok), 1, 15))::BIGINT` in ANSI-ish SQL. 60
    * bits keeps every value, shift, and 15-bit band inside a signed
    * 64-bit integer on engines that check overflow. Same ±1 multiset
    * accumulation and strict sign rule as [[simhash64]]; that kernel
    * (FNV, full 64 bits) stays the production path — this one exists so
    * the LSH verdict can be certified against an exact external oracle.
    */
  def simhash60Md5(arr: ArrayData): Long = {
    val md = md5Digest.get()
    val acc = new Array[Int](60)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        md.reset()
        val d = md.digest(arr.getUTF8String(i).getBytes)
        var top = 0L
        var j = 0
        while (j < 8) { top = (top << 8) | (d(j) & 0xffL); j += 1 }
        val h = top >>> 4
        var b = 0
        while (b < 60) {
          if (((h >>> b) & 1L) != 0L) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 60) {
      if (acc(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** `dims`-component hashed random-projection text embedding — the
    * SimHash accumulation WITHOUT the sign threshold: component j is
    * the exact ±1 sum over tokens (bit j of the md5-derived 60-bit
    * token hash decides the sign), i.e. the bag-of-tokens vector
    * projected onto `dims` hash-defined ±1 hyperplanes (the hashing
    * trick / sparse random projection — Achlioptas 2003, public math;
    * Charikar 2002 is the thresholded special case). Components are
    * INTEGERS, so downstream dot products and norms are exact integer
    * arithmetic — any engine with md5 reproduces the embedding
    * bit-for-bit. `dims` ≤ 60 (one hash's worth of sign bits). */
  def textEmbedMd5(arr: ArrayData, dims: Int): ArrayData = {
    // enforced HERE, not only in the Scala entry point: the expression
    // is a public SQL function, and out-of-range dims would not crash —
    // 61–64 yield constant components (h has 60 meaningful bits) and
    // ≥ 65 silently repeats low components via Java's mod-64 shift:
    // plausible-looking garbage that corrupts downstream verdicts
    require(dims >= 2 && dims <= 60,
      s"graft_text_embed dims must lie in [2, 60] (one md5's worth of sign bits), got $dims")
    val md = md5Digest.get()
    val acc = new Array[Long](dims)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        md.reset()
        val d = md.digest(arr.getUTF8String(i).getBytes)
        var top = 0L
        var j = 0
        while (j < 8) { top = (top << 8) | (d(j) & 0xffL); j += 1 }
        val h = top >>> 4
        var b = 0
        while (b < dims) {
          if (((h >>> b) & 1L) != 0L) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(acc)
  }
}

/** MinHash signature expression: `graft_minhash(array<string>, k)` →
  * `array<bigint>` of k minimum hashes. CONTRACT: first child is an
  * array of strings, second a foldable int (the library entry point in
  * [[graft.operators.Dedup.minhashSignature]] guarantees both). */
case class MinHashSignature(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override protected def nullSafeEval(arr: Any, k: Any): Any =
    Kernels.minhash(arr.asInstanceOf[ArrayData], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, k) =>
      s"${ev.value} = graft.expressions.Kernels.minhash($a, (int)$k);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): MinHashSignature =
    copy(left = newLeft, right = newRight)
}

/** Fused shingle MinHash: `graft_minhash_shingled(array<string>, shingleSize, k)`
  * → `array<bigint>`. Children 2 and 3 must be foldable ints. */
case class MinHashShingled(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_shingled"

  override protected def nullSafeEval(toks: Any, shingle: Any, k: Any): Any =
    Kernels.minhashShingled(toks.asInstanceOf[ArrayData],
      shingle.asInstanceOf[Int], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, s, k) =>
      s"${ev.value} = graft.expressions.Kernels.minhashShingled($t, (int)$s, (int)$k);")

  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): MinHashShingled =
    copy(first = f, second = s, third = t)
}

/** Per-start hashed token windows: `graft_span_windows(array<string>, k)`
  * → `array<bigint>` (index = window start; empty below k tokens). */
case class SpanWindowHashes(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_span_windows"

  override protected def nullSafeEval(arr: Any, k: Any): Any =
    Kernels.spanWindowHashes(arr.asInstanceOf[ArrayData], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, k) =>
      s"${ev.value} = graft.expressions.Kernels.spanWindowHashes($a, (int)$k);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SpanWindowHashes =
    copy(left = newLeft, right = newRight)
}

/** Distinct hashed char n-grams: `graft_ngrams(string, n)` → `array<bigint>`. */
case class NGramHashes(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_ngrams"

  override protected def nullSafeEval(s: Any, n: Any): Any =
    Kernels.ngramHashes(s.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, n) =>
      s"${ev.value} = graft.expressions.Kernels.ngramHashes($s, (int)$n);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): NGramHashes =
    copy(left = newLeft, right = newRight)
}

/** SimHash expression: `graft_simhash64(array<string>)` → bigint. */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override protected def nullSafeEval(arr: Any): Any =
    Kernels.simhash64(arr.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.expressions.Kernels.simhash64($a)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Hashed random-projection embedding: `graft_text_embed(array<string>, dims)`
  * → `array<bigint>` of exact integer components — see
  * [[Kernels.textEmbedMd5]]. Second child is a foldable int ≤ 60
  * (the [[graft.operators.TextEmbed]] entry point guarantees both). */
case class TextEmbedMd5(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_text_embed"

  override protected def nullSafeEval(arr: Any, dims: Any): Any =
    Kernels.textEmbedMd5(arr.asInstanceOf[ArrayData], dims.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, d) =>
      s"${ev.value} = graft.expressions.Kernels.textEmbedMd5($a, (int)$d);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): TextEmbedMd5 =
    copy(left = newLeft, right = newRight)
}

/** Portable SimHash expression: `graft_simhash60_md5(array<string>)` →
  * bigint (60-bit, md5 token hashes — see [[Kernels.simhash60Md5]]). */
case class SimHash60Md5(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash60_md5"

  override protected def nullSafeEval(arr: Any): Any =
    Kernels.simhash60Md5(arr.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.expressions.Kernels.simhash60Md5($a)")

  override protected def withNewChildInternal(newChild: Expression): SimHash60Md5 =
    copy(child = newChild)
}

/** Winnow selection expression: `graft_winnow_select(text, k, w)` →
  * `array<struct<h: bigint, pos: int>>` — see [[Kernels.winnowSelect]].
  * Text must be pre-normalized; children 2 and 3 are foldable ints
  * (the library entry point in
  * [[graft.operators.Dedup.winnowFingerprints]] guarantees all three).
  * Bit-identical to the declarative md5/conv/fold formulation on the
  * portable 60-bit md5 domain, so the DuckDB oracles replay the SAME
  * selection — WinnowSpec pins the equivalence. */
case class WinnowSelect(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("h", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("pos",
        org.apache.spark.sql.types.IntegerType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_winnow_select"

  override protected def nullSafeEval(t: Any, k: Any, w: Any): Any =
    Kernels.winnowSelect(t.asInstanceOf[UTF8String],
      k.asInstanceOf[Int], w.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, k, w) =>
      s"${ev.value} = graft.expressions.Kernels.winnowSelect($t, (int)$k, (int)$w);")

  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): WinnowSelect =
    copy(first = f, second = s, third = t)
}

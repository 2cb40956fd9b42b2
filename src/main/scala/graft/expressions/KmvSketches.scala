package graft.expressions

import java.nio.ByteBuffer
import java.util.{TreeSet => JTreeSet}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable KMV (k-minimum-values / theta) set sketches — the
  * OVERLAP analog of the KLL quantile tier ([[KllSketches]]): keep the
  * k smallest distinct hash values of a set; the kth smallest
  * estimates density, and two sketches intersect by counting common
  * hashes below min(θ). Bar-Yossef et al. 2002 / Beyer et al. SIGMOD
  * 2007 — public literature.
  *
  * Why an aggregate and not distinct+window: a per-group top-k window
  * must first shuffle the group's ENTIRE distinct hash set — a
  * corpus-sized exchange at 100 TB. A `TypedImperativeAggregate`
  * partial-aggregates map-side (each task's buffer already holds ≤ k
  * longs), so the exchange moves |groups|·k longs no matter how big
  * the corpus is. Same argument as map-side combine, enforced by the
  * aggregate tier.
  *
  * The hash is the repo's portable 60-bit md5 convention (digest
  * bytes 0–7 big-endian, >>> 4 — exactly
  * `('0x' || substr(md5(v), 1, 15))::BIGINT`), so sketch contents,
  * order statistics and every downstream estimate are
  * ANSI-reproducible: q87 is directly oracle-backed, estimate regime
  * included. Buffers are java.util.TreeSet[Long] — insertion-order
  * free, so partial aggregation and merge order cannot change the
  * result (it is always THE set of k smallest distinct hashes).
  */
object KmvSketches {
  private val md5Digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 15 hex nibbles of md5(s) as a long — the q74/q77/q84
    * portable hash, computed without materializing the hex string. */
  def md5Hash60(s: UTF8String): Long = {
    val md = md5Digest.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var top = 0L
    var j = 0
    while (j < 8) { top = (top << 8) | (d(j) & 0xffL); j += 1 }
    top >>> 4
  }

  /** Insert into a bounded min-k set buffer. */
  private[expressions] def insert(b: JTreeSet[java.lang.Long], k: Int, h: Long): Unit = {
    if (b.size < k) { b.add(h); () }
    else if (h < b.last) { if (b.add(h)) { b.pollLast(); () } }
  }

  private[expressions] def toArrayData(b: JTreeSet[java.lang.Long]): GenericArrayData = {
    val out = new Array[Long](b.size)
    val it = b.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  private[expressions] def ser(b: JTreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * b.size)
    b.forEach(h => { bb.putLong(h); () })
    bb.array()
  }

  private[expressions] def deser(bytes: Array[Byte]): JTreeSet[java.lang.Long] = {
    val b = new JTreeSet[java.lang.Long]()
    val bb = ByteBuffer.wrap(bytes)
    while (bb.remaining() >= 8) b.add(bb.getLong)
    b
  }
}

/** `graft_kmv_agg(values, k)` — aggregate an ARRAY<STRING> column's
  * elements (or a single-element wrap of a scalar) into the group's k
  * smallest distinct portable md5 hashes, fused: no exploded shingle
  * rows, no hex-string hashing, no corpus-wide distinct. Null arrays
  * and null elements are skipped (a null is not a set member). Output
  * ARRAY<LONG>, ascending; an empty group yields an empty array. */
case class KmvSketchAgg(left: Expression, right: Expression,
                        mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[JTreeSet[java.lang.Long]] with BinaryLike[Expression] {
  import KmvSketches._
  private lazy val k = KllSketches.litInt(right, "graft_kmv_agg k")
  override def createAggregationBuffer(): JTreeSet[java.lang.Long] =
    new JTreeSet[java.lang.Long]()
  override def update(b: JTreeSet[java.lang.Long], input: InternalRow): JTreeSet[java.lang.Long] = {
    val arr = left.eval(input)
    if (arr != null) {
      val a = arr.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val n = a.numElements()
      var i = 0
      while (i < n) {
        if (!a.isNullAt(i)) insert(b, k, md5Hash60(a.getUTF8String(i)))
        i += 1
      }
    }
    b
  }
  override def merge(b: JTreeSet[java.lang.Long], o: JTreeSet[java.lang.Long]): JTreeSet[java.lang.Long] = {
    o.forEach(h => insert(b, k, h))
    b
  }
  override def eval(b: JTreeSet[java.lang.Long]): Any = toArrayData(b)
  override def serialize(b: JTreeSet[java.lang.Long]): Array[Byte] = ser(b)
  override def deserialize(bytes: Array[Byte]): JTreeSet[java.lang.Long] = deser(bytes)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(o: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): KmvSketchAgg =
    copy(left = l, right = r)
  override def prettyName: String = "graft_kmv_agg"
}

/** `graft_kmv_shingled(tokens, shingleSize, k)` — the fused corpus
  * pass: slides a `shingleSize`-token window over the token array,
  * builds each shingle string once in the JVM (space-joined, exactly
  * `concat_ws(' ', slice(...))` = the [[graft.operators.Dedup.wordShingles]]
  * and oracle convention, including the one-padded-shingle rule for
  * short texts), md5-hashes it and feeds the bounded min-k buffer —
  * no shingle Column values ever exist. The expression-tree
  * formulation (transform + slice + concat_ws lambdas are interpreted
  * HigherOrderFunctions, not codegen) measured 7.8 s at sf0.1 for
  * 1.5 MB of text; this kernel is the [[MinHashShingled]] argument
  * applied to the KMV tier. Per-doc duplicate shingles need no
  * pre-distinct — the buffer is a set. */
case class KmvShingledAgg(first: Expression, second: Expression, third: Expression,
                          mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[JTreeSet[java.lang.Long]]
    with org.apache.spark.sql.catalyst.trees.TernaryLike[Expression] {
  import KmvSketches._
  private lazy val shingle = KllSketches.litInt(second, "graft_kmv_shingled shingleSize")
  private lazy val k = KllSketches.litInt(third, "graft_kmv_shingled k")
  override def createAggregationBuffer(): JTreeSet[java.lang.Long] =
    new JTreeSet[java.lang.Long]()
  override def update(b: JTreeSet[java.lang.Long], input: InternalRow): JTreeSet[java.lang.Long] = {
    val arr = first.eval(input)
    if (arr != null) {
      val toks = arr.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val n = toks.numElements()
      val windows = math.max(n - shingle + 1, 1)
      val sb = new java.lang.StringBuilder(64)
      var i = 0
      while (i < windows) {
        sb.setLength(0)
        val end = math.min(i + shingle, n)
        // concat_ws semantics: null tokens vanish WITH their
        // separator (a separator joins two emitted tokens, never
        // pads a skipped one) — track emission, not position
        var emitted = false
        var j = i
        while (j < end) {
          if (!toks.isNullAt(j)) {
            if (emitted) sb.append(' ')
            sb.append(toks.getUTF8String(j).toString)
            emitted = true
          }
          j += 1
        }
        insert(b, k, md5Hash60(UTF8String.fromString(sb.toString)))
        i += 1
      }
    }
    b
  }
  override def merge(b: JTreeSet[java.lang.Long], o: JTreeSet[java.lang.Long]): JTreeSet[java.lang.Long] = {
    o.forEach(h => insert(b, k, h))
    b
  }
  override def eval(b: JTreeSet[java.lang.Long]): Any = toArrayData(b)
  override def serialize(b: JTreeSet[java.lang.Long]): Array[Byte] = ser(b)
  override def deserialize(bytes: Array[Byte]): JTreeSet[java.lang.Long] = deser(bytes)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(o: Int): KmvShingledAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvShingledAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): KmvShingledAgg =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "graft_kmv_shingled"
}

/** `graft_kmv_merge(h, k)` — roll already-hashed sketch rows (LONG) up
  * to a coarser grain: the k smallest of the union. Lossless by
  * construction: every global top-k hash is its part's top-k. Null
  * hashes are skipped. */
case class KmvMergeAgg(left: Expression, right: Expression,
                       mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[JTreeSet[java.lang.Long]] with BinaryLike[Expression] {
  import KmvSketches._
  private lazy val k = KllSketches.litInt(right, "graft_kmv_merge k")
  override def createAggregationBuffer(): JTreeSet[java.lang.Long] =
    new JTreeSet[java.lang.Long]()
  override def update(b: JTreeSet[java.lang.Long], input: InternalRow): JTreeSet[java.lang.Long] = {
    val v = left.eval(input)
    if (v != null) insert(b, k, v.asInstanceOf[Long])
    b
  }
  override def merge(b: JTreeSet[java.lang.Long], o: JTreeSet[java.lang.Long]): JTreeSet[java.lang.Long] = {
    o.forEach(h => insert(b, k, h))
    b
  }
  override def eval(b: JTreeSet[java.lang.Long]): Any = toArrayData(b)
  override def serialize(b: JTreeSet[java.lang.Long]): Array[Byte] = ser(b)
  override def deserialize(bytes: Array[Byte]): JTreeSet[java.lang.Long] = deser(bytes)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(o: Int): KmvMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): KmvMergeAgg =
    copy(left = l, right = r)
  override def prettyName: String = "graft_kmv_merge"
}

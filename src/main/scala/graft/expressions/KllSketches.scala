package graft.expressions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** Mergeable KLL quantile-sketch aggregates — the percentile analog of
  * the HLL distinct-count pattern (`Sketches.dailySketches`): build a
  * once-per-day sketch column, answer any-range p50/p95/p99 later by
  * MERGING day sketches instead of re-scanning raw data.
  *
  * Spark ships `percentile_approx` (a one-shot aggregate whose state
  * cannot be persisted) and native `hll_*` sketch columns, but no
  * quantile-sketch COLUMN type — this is the genuine
  * can't-express-with-built-ins case, so it follows the repo's custom
  * expression tier (SURVEY §3): `TypedImperativeAggregate` over the
  * DataSketches KLL implementation already on Spark's classpath.
  *
  * Determinism contract (mirrors the DataSketches design, stated
  * honestly): a KLL sketch is EXACT and merge-order-insensitive while
  * its retained-item count stays under `k` (no compaction has
  * happened); past that, compaction makes randomized keep/drop choices
  * and estimates carry the published ~1.65%-at-k=200 normalized rank
  * error. Callers that need bit-stable verification outputs size `k`
  * above the verify-scale item count (`q64` does); the accuracy bound
  * is the at-scale property. Specs pin BOTH regimes.
  */
object KllSketches {
  /** Extract a required literal-int parameter at plan-build time. */
  private[expressions] def litInt(e: Expression, what: String): Int = {
    require(e.foldable, s"$what must be a literal")
    e.eval(InternalRow.empty) match {
      case i: Int => i
      case other => throw new IllegalArgumentException(s"$what must be INT, got $other")
    }
  }
}

/** `graft_kll_agg(value, k)` — aggregate double values into a serialized
  * KLL(k) sketch (BINARY). Nulls are skipped; an empty group yields an
  * empty sketch (not null), so downstream merges need no null guards. */
case class KllSketchAgg(left: Expression, right: Expression,
                        mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch] with BinaryLike[Expression] {
  private lazy val k = KllSketches.litInt(right, "graft_kll_agg k")
  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)
  override def update(b: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = left.eval(input)
    if (v != null) b.update(v.asInstanceOf[Double])
    b
  }
  override def merge(b: KllDoublesSketch, o: KllDoublesSketch): KllDoublesSketch = {
    b.merge(o); b
  }
  override def eval(b: KllDoublesSketch): Any = b.toByteArray
  override def serialize(b: KllDoublesSketch): Array[Byte] = b.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(o: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): KllSketchAgg =
    copy(left = l, right = r)
  override def prettyName: String = "graft_kll_agg"
}

/** `graft_kll_merge(sketch)` — aggregate serialized KLL sketches into
  * their union (the rollup side: day sketches → range sketch). The
  * result keeps the k of the INPUT sketches (DataSketches adopts the
  * smallest k seen, so mixed-k inputs degrade gracefully rather than
  * failing). */
case class KllMergeAgg(child: Expression,
                       mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {
  // the buffer starts at the implementation MAX k; merging the first
  // real sketch snaps it down to that sketch's k (KLL unions adopt the
  // smaller k), so an empty-buffer artifact never loosens accuracy
  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(org.apache.datasketches.kll.KllSketch.MAX_K)
  override def update(b: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) b.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    b
  }
  override def merge(b: KllDoublesSketch, o: KllDoublesSketch): KllDoublesSketch = {
    b.merge(o); b
  }
  override def eval(b: KllDoublesSketch): Any = b.toByteArray
  override def serialize(b: KllDoublesSketch): Array[Byte] = b.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(o: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KllMergeAgg = copy(child = c)
  override def prettyName: String = "graft_kll_merge"
}

/** `graft_kll_quantile(sketch, rank)` — read a quantile (INCLUSIVE
  * search criteria, DataSketches' default) out of a serialized sketch.
  * Empty sketches yield null. Scalar decode per row — fine off the hot
  * path (sketch tables are |keys × days| rows, not raw-data sized). */
case class KllQuantile(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullSafeEval(bytes: Any, rank: Any): Any = {
    val s = KllDoublesSketch.heapify(Memory.wrap(bytes.asInstanceOf[Array[Byte]]))
    if (s.isEmpty) null else s.getQuantile(rank.asInstanceOf[Double])
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): KllQuantile =
    copy(left = l, right = r)
  override def prettyName: String = "graft_kll_quantile"
}

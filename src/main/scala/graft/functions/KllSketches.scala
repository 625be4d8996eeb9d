package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types._

/** Mergeable KLL quantile sketches (Apache DataSketches, bundled with
  * Spark) — the percentile counterpart of the HLL distinct sketches in
  * [[graft.ops.AggOps]]: build per-partition/per-day sketches ONCE, roll
  * any coarser grouping up later by merging sketch columns instead of
  * rescanning rows. `k` trades size for rank error (k = 200 ≈ 1.65%
  * normalized rank error, ~few KB per sketch).
  *
  * KLL compaction is randomized (the algorithm's coin flips), so sketch
  * BYTES and estimates carry the published error bounds rather than
  * bit-reproducibility — gate comparisons with epsilon floors
  * (QuantGateSpec), never hashes.
  */
object KllSketches {
  /** Aggregate a double column into one serialized KLL sketch per group. */
  def sketchAgg(c: Column, k: Int): Column =
    GraftBridge.column(
      KllSketchAgg(GraftBridge.expression(c), k).toAggregateExpression())

  /** Merge serialized KLL sketches (binary column) into one sketch. */
  def mergeAgg(c: Column): Column =
    GraftBridge.column(
      KllMergeAgg(GraftBridge.expression(c)).toAggregateExpression())

  /** Quantile value at `rank` ∈ [0,1] from a serialized sketch. Scalar,
    * eval-only — runs over post-aggregation rows (one per group), never in
    * a per-input-row hot path.
    */
  def quantile(c: Column, rank: Double): Column =
    GraftBridge.column(KllQuantile(GraftBridge.expression(c), Literal(rank)))

  /** Pairwise null-coalescing union of two serialized KLL sketches — the
    * `freq_union`/`hll_union` counterpart for the quantile family, needed
    * by incremental stored-profile merges (a stored sketch row merged with
    * this micro-batch's sketch in one projection, no re-aggregation).
    * Scalar, eval-only — runs over post-aggregation/stored rows.
    */
  def union(a: Column, b: Column): Column =
    GraftBridge.column(KllUnion(GraftBridge.expression(a), GraftBridge.expression(b)))
}

/** TypedImperativeAggregate building a KLL doubles sketch from raw values.
  * Input must already be DoubleType (callers cast); nulls are skipped.
  */
case class KllSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kll_sketch_agg requires a DOUBLE input (cast first), got ${other.simpleString}")
  }

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Double])
    buffer
  }

  override def merge(buffer: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any =
    if (buffer.isEmpty) null else buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "kll_sketch_agg"
  override def withNewMutableAggBufferOffset(n: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KllSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): KllSketchAgg =
    copy(child = newChild)
}

/** TypedImperativeAggregate merging serialized KLL sketches. The buffer
  * adopts the FIRST input sketch (so the merged accuracy is governed by
  * the build-time `k`, not a separate parameter); subsequent sketches
  * merge in. Null inputs are skipped; all-null groups yield null.
  */
case class KllMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Option[KllDoublesSketch]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kll_merge_agg requires a BINARY sketch column, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): Option[KllDoublesSketch] = None

  override def update(buffer: Option[KllDoublesSketch], input: InternalRow): Option[KllDoublesSketch] = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val sk = KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]]))
      buffer match {
        case None => Some(sk)
        case Some(b) => b.merge(sk); buffer
      }
    }
  }

  override def merge(buffer: Option[KllDoublesSketch],
                     other: Option[KllDoublesSketch]): Option[KllDoublesSketch] =
    (buffer, other) match {
      case (Some(b), Some(o)) => b.merge(o); buffer
      case (None, o) => o
      case (b, None) => b
    }

  override def eval(buffer: Option[KllDoublesSketch]): Any =
    buffer.filterNot(_.isEmpty).map(_.toByteArray).orNull

  override def serialize(buffer: Option[KllDoublesSketch]): Array[Byte] =
    buffer.map(_.toByteArray).getOrElse(Array.emptyByteArray)

  override def deserialize(bytes: Array[Byte]): Option[KllDoublesSketch] =
    if (bytes.isEmpty) None
    else Some(KllDoublesSketch.heapify(Memory.wrap(bytes)))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "kll_merge_agg"
  override def withNewMutableAggBufferOffset(n: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KllMergeAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): KllMergeAgg =
    copy(child = newChild)
}

/** Quantile value at a rank from a serialized KLL sketch. Eval-only by
  * design: it projects over POST-aggregation rows (one per group), so
  * codegen would buy nothing — this is not a per-input-row expression.
  */
case class KllQuantile(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback with BinaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, DoubleType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"kll_quantile requires (BINARY, DOUBLE), got (${l.simpleString}, ${r.simpleString})")
  }

  override def nullSafeEval(sketchBytes: Any, rank: Any): Any = {
    val sk = KllDoublesSketch.heapify(Memory.wrap(sketchBytes.asInstanceOf[Array[Byte]]))
    if (sk.isEmpty) null else sk.getQuantile(rank.asInstanceOf[Double])
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "kll_quantile"
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): KllQuantile =
    copy(left = newLeft, right = newRight)
}

/** Scalar pairwise union of two serialized KLL sketches — the
  * [[FreqUnion]] counterpart for the quantile family: merges a stored
  * per-key sketch row with a fresh micro-batch sketch in one projection
  * (incremental profile sinks), no re-aggregation over raw values.
  * Null-coalescing: a key new to either side adopts the present sketch
  * unchanged. In the exact (no-compaction) regime the union retains every
  * item, so quantile READOUTS are merge-order-invariant order statistics;
  * past compaction, bytes and estimates carry the published rank-error
  * bounds (gate with epsilon floors, never hashes).
  */
case class KllUnion(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback with BinaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"kll_union requires (BINARY, BINARY) sketches, got (${l.simpleString}, ${r.simpleString})")
  }

  // null-coalescing union, so the default null-in-null-out eval is wrong
  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    val r = right.eval(input)
    if (l == null) r
    else if (r == null) l
    else {
      val a = KllDoublesSketch.heapify(Memory.wrap(l.asInstanceOf[Array[Byte]]))
      val b = KllDoublesSketch.heapify(Memory.wrap(r.asInstanceOf[Array[Byte]]))
      a.merge(b)
      a.toByteArray
    }
  }

  override def nullable: Boolean = left.nullable && right.nullable
  override def dataType: DataType = BinaryType
  override def prettyName: String = "kll_union"
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): KllUnion =
    copy(left = newLeft, right = newRight)
}

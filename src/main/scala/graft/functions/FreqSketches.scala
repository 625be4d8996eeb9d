package graft.functions

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable frequent-items (heavy-hitters) sketches — Misra–Gries
  * lineage via Apache DataSketches' `ItemsSketch` (bundled with Spark).
  * Completes the sketch-column family next to the HLL distinct sketches
  * and KLL quantile sketches ([[graft.ops.AggOps]], [[KllSketches]]):
  * build per-partition/per-day sketches ONCE, roll any coarser grouping
  * up later by MERGING sketch columns instead of rescanning rows.
  *
  * `maxMapSize` (a power of two) bounds memory and error: counts are
  * EXACT while the number of distinct items stays under ~0.75×maxMapSize
  * (the sketch never enters its eviction regime — this is the regime the
  * correctness oracle pins), and carry the published ±n/maxMapSize error
  * beyond it. Unlike KLL, the algorithm has no randomness: the same
  * input multiset yields the same counts in the exact regime regardless
  * of partitioning or merge order.
  */
object FreqSketches {
  /** Aggregate a STRING column into one serialized frequent-items sketch
    * per group.
    */
  def sketchAgg(c: Column, maxMapSize: Int): Column =
    GraftBridge.column(
      FreqSketchAgg(GraftBridge.expression(c), maxMapSize).toAggregateExpression())

  /** Merge serialized frequent-items sketches (binary column). */
  def mergeAgg(c: Column): Column =
    GraftBridge.column(
      FreqMergeAgg(GraftBridge.expression(c)).toAggregateExpression())

  /** Pairwise null-coalescing union of two serialized sketches (the
    * streaming-merge scalar; see [[FreqUnion]]).
    */
  def union(a: Column, b: Column): Column =
    GraftBridge.column(FreqUnion(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Top-k heavy hitters from a serialized sketch, deterministically
    * ordered (estimate DESC, item ASC) →
    * `array<struct<item string, est long, lb long, ub long>>`. In the
    * exact regime lb = est = ub. Scalar, eval-only — projects over
    * post-aggregation rows (one per group), never a per-input-row path.
    */
  def topK(c: Column, k: Int): Column =
    GraftBridge.column(FreqTopK(GraftBridge.expression(c), Literal(k)))

  private[functions] val serde = new ArrayOfStringsSerDe()
}

/** TypedImperativeAggregate building a frequent-items sketch from raw
  * string values. Input must already be StringType (callers cast); nulls
  * are skipped.
  */
case class FreqSketchAgg(
    child: Expression,
    maxMapSize: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]] with UnaryLike[Expression] {

  require(maxMapSize >= 8 && (maxMapSize & (maxMapSize - 1)) == 0,
    s"freq_sketch_agg maxMapSize must be a power of two >= 8, got $maxMapSize")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"freq_sketch_agg requires a STRING input (cast first), got ${other.simpleString}")
  }

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(buffer: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: ItemsSketch[String], other: ItemsSketch[String]): ItemsSketch[String] = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: ItemsSketch[String]): Any =
    if (buffer.isEmpty) null else buffer.toByteArray(FreqSketches.serde)

  override def serialize(buffer: ItemsSketch[String]): Array[Byte] =
    buffer.toByteArray(FreqSketches.serde)

  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), FreqSketches.serde)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "freq_sketch_agg"
  override def withNewMutableAggBufferOffset(n: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): FreqSketchAgg =
    copy(child = newChild)
}

/** TypedImperativeAggregate merging serialized frequent-items sketches.
  * The buffer adopts the FIRST input sketch (merged capacity is governed
  * by the build-time `maxMapSize`); null inputs are skipped; all-null
  * groups yield null.
  */
case class FreqMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Option[ItemsSketch[String]]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"freq_merge_agg requires a BINARY sketch column, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): Option[ItemsSketch[String]] = None

  override def update(buffer: Option[ItemsSketch[String]], input: InternalRow): Option[ItemsSketch[String]] = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val sk = ItemsSketch.getInstance(
        Memory.wrap(v.asInstanceOf[Array[Byte]]), FreqSketches.serde)
      buffer match {
        case None => Some(sk)
        case Some(b) => b.merge(sk); buffer
      }
    }
  }

  override def merge(buffer: Option[ItemsSketch[String]],
                     other: Option[ItemsSketch[String]]): Option[ItemsSketch[String]] =
    (buffer, other) match {
      case (Some(b), Some(o)) => b.merge(o); buffer
      case (None, o) => o
      case (b, None) => b
    }

  override def eval(buffer: Option[ItemsSketch[String]]): Any =
    buffer.filterNot(_.isEmpty).map(_.toByteArray(FreqSketches.serde)).orNull

  override def serialize(buffer: Option[ItemsSketch[String]]): Array[Byte] =
    buffer.map(_.toByteArray(FreqSketches.serde)).getOrElse(Array.emptyByteArray)

  override def deserialize(bytes: Array[Byte]): Option[ItemsSketch[String]] =
    if (bytes.isEmpty) None
    else Some(ItemsSketch.getInstance(Memory.wrap(bytes), FreqSketches.serde))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "freq_merge_agg"
  override def withNewMutableAggBufferOffset(n: Int): FreqMergeAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): FreqMergeAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): FreqMergeAgg =
    copy(child = newChild)
}

/** Scalar pairwise union of two serialized frequent-items sketches — the
  * `hll_union(a, b)` counterpart for the heavy-hitters family, needed by
  * the streaming profile sink's full-outer merge of stored vs batch
  * sketches ([[graft.streaming.EventStreams.sinkFreqSketchToTable]]).
  * Null-coalescing: one null side returns the other unchanged (matching
  * how an absent stored sketch adopts the batch's); both null → null.
  * Merged capacity is the LEFT sketch's `maxMapSize`; merging stays in
  * the exact regime while the union's distinct count is under
  * ~0.75×maxMapSize (the sketch algorithm has no randomness, so
  * exact-regime unions are bit-stable counts regardless of merge order).
  * Eval-only: runs over post-aggregation profile rows (one per key).
  */
case class FreqUnion(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback with BinaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"freq_union requires (BINARY, BINARY) sketches, got (${l.simpleString}, ${r.simpleString})")
  }

  // null-coalescing union, so the default null-in-null-out eval is wrong
  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    val r = right.eval(input)
    if (l == null) r
    else if (r == null) l
    else {
      val a = ItemsSketch.getInstance(
        Memory.wrap(l.asInstanceOf[Array[Byte]]), FreqSketches.serde)
      val b = ItemsSketch.getInstance(
        Memory.wrap(r.asInstanceOf[Array[Byte]]), FreqSketches.serde)
      a.merge(b)
      a.toByteArray(FreqSketches.serde)
    }
  }

  override def nullable: Boolean = left.nullable && right.nullable
  override def dataType: DataType = BinaryType
  override def prettyName: String = "freq_union"
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): FreqUnion =
    copy(left = newLeft, right = newRight)
}

/** Top-k heavy hitters from a serialized frequent-items sketch,
  * deterministically ordered (estimate DESC, then item ASC so ties never
  * depend on sketch-internal ordering). `NO_FALSE_NEGATIVES` — every true
  * heavy hitter appears; in the approximate regime an item's true count
  * lies in [lb, ub]. Eval-only by design: it projects over
  * post-aggregation rows (one per group).
  */
case class FreqTopK(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback with BinaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, IntegerType) if right.foldable => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"freq_topk requires (BINARY, foldable INT), got (${l.simpleString}, ${r.simpleString})")
  }

  override def nullSafeEval(sketchBytes: Any, kAny: Any): Any = {
    val sk = ItemsSketch.getInstance(
      Memory.wrap(sketchBytes.asInstanceOf[Array[Byte]]), FreqSketches.serde)
    val k = kAny.asInstanceOf[Int]
    val rows = sk.getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
      .toSeq
      .sortBy(r => (-r.getEstimate, r.getItem))
      .take(k)
      .map { r =>
        new GenericInternalRow(Array[Any](
          UTF8String.fromString(r.getItem), r.getEstimate,
          r.getLowerBound, r.getUpperBound))
      }
    new GenericArrayData(rows.toArray[Any])
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("lb", LongType, nullable = false),
    StructField("ub", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "freq_topk"
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): FreqTopK =
    copy(left = newLeft, right = newRight)
}

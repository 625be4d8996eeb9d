package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Map-side-combinable fixed-size group sampling: keep the k entries with
  * the SMALLEST (md5(key), key) per group, as a mergeable aggregate.
  *
  * [[graft.ops.JoinOps.sampleGroupK]] computes the same kept-set with a
  * `row_number` window, which shuffles EVERY row to its group's reducer
  * before any row is discarded. At 100 TB that shuffle is the whole job.
  * This aggregate is the scale shape: each map task keeps at most k
  * candidates per group it sees (a bounded tournament buffer), partial
  * buffers merge associatively, and the exchange carries ~k×groups
  * candidate rows instead of the corpus. Same deterministic hash order as
  * the window face — the kept set is the k smallest under a TOTAL order
  * (md5 bytes, key bytes, payload bytes), so the result is independent of
  * partitioning and merge order, and hash-identical to the window face
  * whenever the key is unique per row (the documented contract there too).
  *
  * Reference analog: fixed-size per-group sampling for training-mix
  * balancing (the reference exposes only fractional Bernoulli sampling,
  * rasgoql/primitives/transforms.py — this is the bounded-k counterpart).
  */
object GroupBottomK {
  /** bottomk_hash_agg(key, payload, k) → array<payloadType>, ordered by
    * (md5(key), key) ascending.
    */
  def bottomKHashAgg(key: Column, payload: Column, k: Int): Column =
    GraftBridge.column(BottomKHashAgg(
      GraftBridge.expression(key), GraftBridge.expression(payload), k)
      .toAggregateExpression())

  /** topk_score_agg(score, key, payload, k, ascending) → array<payloadType>
    * of the k best rows per group under (score, key) order — the
    * score-ranked sibling of [[bottomKHashAgg]] ("keep the 10
    * highest-quality docs per domain" as one map-side-combinable pass).
    */
  def topKByScoreAgg(score: Column, key: Column, payload: Column, k: Int,
                     ascending: Boolean): Column =
    GraftBridge.column(TopKByScoreAgg(
      GraftBridge.expression(score), GraftBridge.expression(key),
      GraftBridge.expression(payload), k, ascending)
      .toAggregateExpression())

  private val md5Local: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  private[functions] def md5(bytes: Array[Byte]): Array[Byte] = {
    val d = md5Local.get(); d.reset(); d.digest(bytes)
  }

  /** Unsigned lexicographic byte-array compare — equals the SQL ordering
    * of both the md5 hex string (hex is order-preserving per byte) and
    * Spark/DuckDB binary string collation on the raw key.
    */
  private[functions] def cmpBytes(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    a.length - b.length
  }
}

/** One kept candidate: md5 of the key, the raw key bytes, and the payload
  * serialized as a single-field UnsafeRow. The payload bytes participate
  * in the order as the FINAL tiebreak so the kept multiset is a total-order
  * prefix — deterministic even when (hash, key) duplicates cross the k
  * boundary (the window face is arbitrary there; callers wanting
  * window-face hash-equality keep the key unique, same as there).
  */
private[functions] final class BottomKEntry(
    val hash: Array[Byte], val key: Array[Byte], val payload: Array[Byte])

private[functions] object BottomKEntry {
  val ordering: java.util.Comparator[BottomKEntry] =
    (a: BottomKEntry, b: BottomKEntry) => {
      var d = GroupBottomK.cmpBytes(a.hash, b.hash)
      if (d == 0) d = GroupBottomK.cmpBytes(a.key, b.key)
      if (d == 0) d = GroupBottomK.cmpBytes(a.payload, b.payload)
      d
    }
}

/** Bounded tournament buffer: a size-k max-heap — a candidate enters only
  * if it beats (is smaller than) the current worst, which it then evicts.
  * Memory per group is O(k × row size) regardless of group size.
  */
private[functions] final class BottomKBuffer(val k: Int) {
  val heap = new java.util.PriorityQueue[BottomKEntry](
    math.max(1, math.min(k, 64)), BottomKEntry.ordering.reversed())

  def offer(e: BottomKEntry): Unit =
    if (heap.size < k) heap.add(e)
    else if (BottomKEntry.ordering.compare(e, heap.peek) < 0) {
      heap.poll(); heap.add(e)
    }

  def sortedEntries: Array[BottomKEntry] = {
    val arr = heap.toArray(new Array[BottomKEntry](heap.size))
    java.util.Arrays.sort(arr, BottomKEntry.ordering)
    arr
  }
}

/** TypedImperativeAggregate for [[GroupBottomK]]: ObjectHashAggregate runs
  * it in partial mode map-side (the combine that makes the shuffle ~k per
  * group per map task), merges buffers on the reducer, and `eval` emits the
  * ascending array of payloads.
  */
/** One kept candidate for [[TopKByScoreAgg]]: the double score plus key
  * and payload bytes. Order: score (flipped when descending), then key
  * bytes, then payload bytes — a total order, so the kept multiset is a
  * deterministic prefix under any partitioning; identical to the window
  * face whenever (score, key) is unique. Null AND NaN scores are skipped
  * at update — an unskipped NaN compares greatest
  * (java.lang.Double.compare), which under descending order would rank
  * junk rows ahead of every real score; the SQL window face filters NaN
  * the same way.
  */
private[functions] final class TopKEntry(
    val score: Double, val key: Array[Byte], val payload: Array[Byte])

private[functions] object TopKEntry {
  def ordering(ascending: Boolean): java.util.Comparator[TopKEntry] =
    (a: TopKEntry, b: TopKEntry) => {
      var d = java.lang.Double.compare(a.score, b.score)
      if (!ascending) d = -d
      if (d == 0) d = GroupBottomK.cmpBytes(a.key, b.key)
      if (d == 0) d = GroupBottomK.cmpBytes(a.payload, b.payload)
      d
    }
}

/** Bounded tournament buffer for [[TopKByScoreAgg]] — same shape as
  * [[BottomKBuffer]] with the score order.
  */
private[functions] final class TopKScoreBuffer(val k: Int, val ascending: Boolean) {
  private val ord = TopKEntry.ordering(ascending)
  val heap = new java.util.PriorityQueue[TopKEntry](
    math.max(1, math.min(k, 64)), ord.reversed())

  def offer(e: TopKEntry): Unit =
    if (heap.size < k) heap.add(e)
    else if (ord.compare(e, heap.peek) < 0) { heap.poll(); heap.add(e) }

  def sortedEntries: Array[TopKEntry] = {
    val arr = heap.toArray(new Array[TopKEntry](heap.size))
    java.util.Arrays.sort(arr, ord)
    arr
  }
}

/** TypedImperativeAggregate behind
  * [[graft.ops.JoinOps.sampleGroupTopK]]: per map task keep at most k
  * candidates per group by (score, key) order, merge buffers
  * associatively, emit the best-first array of payloads. The "top 10k
  * docs per domain by quality score" pass as ONE partial-aggregated
  * shuffle of ~k×groups candidates instead of a corpus-wide window sort.
  */
case class TopKByScoreAgg(
    score: Expression,
    key: Expression,
    payload: Expression,
    k: Int,
    ascending: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKScoreBuffer]
  with org.apache.spark.sql.catalyst.trees.TernaryLike[Expression] {

  require(k >= 1, s"topk_score_agg k must be >= 1, got $k")

  override def first: Expression = score
  override def second: Expression = key
  override def third: Expression = payload

  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, key.dataType) match {
      case (DoubleType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (s, kt) => TypeCheckResult.TypeCheckFailure(
        s"topk_score_agg requires (DOUBLE score, STRING key), got " +
          s"(${s.simpleString}, ${kt.simpleString})")
    }

  @transient private lazy val payloadProj =
    UnsafeProjection.create(Array[DataType](payload.dataType))
  @transient private lazy val ord = TopKEntry.ordering(ascending)

  override def createAggregationBuffer(): TopKScoreBuffer =
    new TopKScoreBuffer(k, ascending)

  override def update(buffer: TopKScoreBuffer, input: InternalRow): TopKScoreBuffer = {
    val sv = score.eval(input)
    if (sv == null) return buffer // null score: row never ranks
    val s = sv.asInstanceOf[Double]
    if (java.lang.Double.isNaN(s)) return buffer // NaN would rank FIRST desc
    val kv = key.eval(input)
    val keyBytes =
      if (kv == null) Array.emptyByteArray
      else kv.asInstanceOf[UTF8String].getBytes
    if (buffer.heap.size >= buffer.k) {
      val worst = buffer.heap.peek
      var d = java.lang.Double.compare(s, worst.score)
      if (!ascending) d = -d
      if (d == 0) d = GroupBottomK.cmpBytes(keyBytes, worst.key)
      if (d > 0) return buffer // cheap reject before payload serialization
    }
    val pBytes = payloadProj(InternalRow(payload.eval(input))).copy().getBytes
    buffer.offer(new TopKEntry(s, keyBytes, pBytes))
    buffer
  }

  override def merge(buffer: TopKScoreBuffer, other: TopKScoreBuffer): TopKScoreBuffer = {
    val it = other.heap.iterator()
    while (it.hasNext) buffer.offer(it.next())
    buffer
  }

  override def eval(buffer: TopKScoreBuffer): Any = {
    val values = buffer.sortedEntries.map { e =>
      val row = new UnsafeRow(1)
      row.pointTo(e.payload, e.payload.length)
      row.get(0, payload.dataType)
    }
    new GenericArrayData(values.toArray[Any])
  }

  override def serialize(buffer: TopKScoreBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.k)
    out.writeBoolean(buffer.ascending)
    out.writeInt(buffer.heap.size)
    val it = buffer.heap.iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeDouble(e.score)
      out.writeInt(e.key.length); out.write(e.key)
      out.writeInt(e.payload.length); out.write(e.payload)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKScoreBuffer = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = new TopKScoreBuffer(in.readInt(), in.readBoolean())
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val s = in.readDouble()
      val key = new Array[Byte](in.readInt()); in.readFully(key)
      val payload = new Array[Byte](in.readInt()); in.readFully(payload)
      buf.offer(new TopKEntry(s, key, payload))
      i += 1
    }
    buf
  }

  override def dataType: DataType =
    ArrayType(payload.dataType, containsNull = payload.nullable)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_score_agg"
  override def withNewMutableAggBufferOffset(n: Int): TopKByScoreAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): TopKByScoreAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): TopKByScoreAgg =
    copy(score = newFirst, key = newSecond, payload = newThird)
}

case class BottomKHashAgg(
    key: Expression,
    payload: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BottomKBuffer] with BinaryLike[Expression] {

  require(k >= 1, s"bottomk_hash_agg k must be >= 1, got $k")

  override def left: Expression = key
  override def right: Expression = payload

  override def checkInputDataTypes(): TypeCheckResult = key.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bottomk_hash_agg requires a STRING key (cast/concat first), got ${other.simpleString}")
  }

  // serializes the payload value as a one-field row; projection output is a
  // reused buffer, so every stored payload is copied at offer time
  @transient private lazy val payloadProj =
    UnsafeProjection.create(Array[DataType](payload.dataType))

  override def createAggregationBuffer(): BottomKBuffer = new BottomKBuffer(k)

  override def update(buffer: BottomKBuffer, input: InternalRow): BottomKBuffer = {
    val kv = key.eval(input)
    val keyBytes =
      if (kv == null) Array.emptyByteArray
      else kv.asInstanceOf[UTF8String].getBytes
    val hash = GroupBottomK.md5(keyBytes)
    // early reject against the current worst before paying the payload
    // serialization — on a group far larger than k almost every row exits here
    if (buffer.heap.size >= buffer.k) {
      val worst = buffer.heap.peek
      var d = GroupBottomK.cmpBytes(hash, worst.hash)
      if (d == 0) d = GroupBottomK.cmpBytes(keyBytes, worst.key)
      if (d > 0) return buffer
    }
    val pv = payload.eval(input)
    val pBytes = payloadProj(InternalRow(pv)).copy().getBytes
    buffer.offer(new BottomKEntry(hash, keyBytes, pBytes))
    buffer
  }

  override def merge(buffer: BottomKBuffer, other: BottomKBuffer): BottomKBuffer = {
    val it = other.heap.iterator()
    while (it.hasNext) buffer.offer(it.next())
    buffer
  }

  override def eval(buffer: BottomKBuffer): Any = {
    val entries = buffer.sortedEntries
    val values = entries.map { e =>
      val row = new UnsafeRow(1)
      row.pointTo(e.payload, e.payload.length)
      row.get(0, payload.dataType)
    }
    new GenericArrayData(values.toArray[Any])
  }

  override def serialize(buffer: BottomKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.k)
    out.writeInt(buffer.heap.size)
    val it = buffer.heap.iterator()
    while (it.hasNext) {
      val e = it.next()
      out.write(e.hash)
      out.writeInt(e.key.length); out.write(e.key)
      out.writeInt(e.payload.length); out.write(e.payload)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BottomKBuffer = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = new BottomKBuffer(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val hash = new Array[Byte](16); in.readFully(hash)
      val key = new Array[Byte](in.readInt()); in.readFully(key)
      val payload = new Array[Byte](in.readInt()); in.readFully(payload)
      buf.offer(new BottomKEntry(hash, key, payload))
      i += 1
    }
    buf
  }

  override def dataType: DataType =
    ArrayType(payload.dataType, containsNull = payload.nullable)
  override def nullable: Boolean = false
  override def prettyName: String = "bottomk_hash_agg"
  override def withNewMutableAggBufferOffset(n: Int): BottomKHashAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): BottomKHashAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BottomKHashAgg =
    copy(key = newLeft, payload = newRight)
}

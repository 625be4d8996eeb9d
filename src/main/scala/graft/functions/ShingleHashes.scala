package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Word n-gram shingle hashes: one codegen pass tokens → sorted distinct
  * `array<long>`. Each token is xxhash64'd once; a shingle's hash chains its
  * token hashes (order-sensitive), so the whole shingle set costs
  * O(tokens + windows·n) with no string concatenation. Documents shorter
  * than n words fall back to one whole-document shingle, mirroring
  * [[graft.ext.DedupOps.shingles]].
  *
  * The dedup operators compare documents by these hashes instead of shingle
  * strings — numerically keyed shuffles/merges, with a declared tradeoff:
  * two distinct shingles colliding in 64 bits would perturb an intersection
  * count by 1. P(any collision) ≈ V²/2⁶⁵ over vocabulary V — ~3·10⁻⁸ at
  * V=10⁶ — and only matters if the colliding shingles co-occur in a
  * candidate pair.
  */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val ntok = arr.numElements()
    val xs = new Array[Long](ntok)
    var i = 0
    while (i < ntok) {
      val t = arr.getUTF8String(i)
      xs(i) = XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, 7L)
      i += 1
    }
    val nw = if (ntok < n) 1 else ntok - n + 1
    val wlen = if (ntok < n) ntok else n
    val hs = new Array[Long](nw)
    var w = 0
    while (w < nw) {
      var h = ShingleHashes.Seed
      var j = 0
      while (j < wlen) { h = XXH64.hashLong(xs(w + j), h); j += 1 }
      hs(w) = h
      w += 1
    }
    java.util.Arrays.sort(hs)
    var m = 0
    i = 0
    while (i < nw) {
      if (i == 0 || hs(i) != hs(i - 1)) { hs(m) = hs(i); m += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (m == nw) hs else java.util.Arrays.copyOf(hs, m))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ntok = ctx.freshName("ntok"); val xs = ctx.freshName("xs")
      val i = ctx.freshName("i"); val t = ctx.freshName("t")
      val nw = ctx.freshName("nw"); val wlen = ctx.freshName("wlen")
      val hs = ctx.freshName("hs"); val w = ctx.freshName("w")
      val h = ctx.freshName("h"); val j = ctx.freshName("j")
      val m = ctx.freshName("m")
      val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
      s"""
         |int $ntok = $a.numElements();
         |long[] $xs = new long[$ntok];
         |for (int $i = 0; $i < $ntok; $i++) {
         |  UTF8String $t = $a.getUTF8String($i);
         |  $xs[$i] = $xxh.hashUnsafeBytes($t.getBaseObject(), $t.getBaseOffset(), $t.numBytes(), 7L);
         |}
         |int $nw = $ntok < $n ? 1 : $ntok - $n + 1;
         |int $wlen = $ntok < $n ? $ntok : $n;
         |long[] $hs = new long[$nw];
         |for (int $w = 0; $w < $nw; $w++) {
         |  long $h = ${ShingleHashes.Seed}L;
         |  for (int $j = 0; $j < $wlen; $j++) { $h = $xxh.hashLong($xs[$w + $j], $h); }
         |  $hs[$w] = $h;
         |}
         |java.util.Arrays.sort($hs);
         |int $m = 0;
         |for (int $i = 0; $i < $nw; $i++) {
         |  if ($i == 0 || $hs[$i] != $hs[$i - 1]) { $hs[$m++] = $hs[$i]; }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(
         |  $m == $nw ? $hs : java.util.Arrays.copyOf($hs, $m));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashes {
  final val Seed = 0x9E3779B97F4A7C15L

  def apply(tokens: Column, n: Int): Column =
    GraftBridge.column(ShingleHashes(GraftBridge.expression(tokens), n))
}

/** Positional token-window hashes: array index i holds the hash of the
  * w-token window starting at token i — the position-preserving sibling of
  * [[ShingleHashes]] (which sorts and dedups, losing positions). Used by
  * span-level dedup, where WHERE a duplicated window sits matters as much
  * as THAT it exists. Documents shorter than w tokens yield an empty array
  * (no full window). Same hash chain as ShingleHashes, so the two kernels'
  * costs match: O(tokens·w) long-mixes, no string concatenation.
  */
case class WindowHashes(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 1, s"window width must be >= 1, got $w")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"window_hashes requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "window_hashes"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val ntok = arr.numElements()
    val xs = new Array[Long](ntok)
    var i = 0
    while (i < ntok) {
      val t = arr.getUTF8String(i)
      xs(i) = XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, 7L)
      i += 1
    }
    val nw = math.max(0, ntok - w + 1)
    val hs = new Array[Long](nw)
    var s = 0
    while (s < nw) {
      var h = ShingleHashes.Seed
      var j = 0
      while (j < w) { h = XXH64.hashLong(xs(s + j), h); j += 1 }
      hs(s) = h
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(hs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ntok = ctx.freshName("ntok"); val xs = ctx.freshName("xs")
      val i = ctx.freshName("i"); val t = ctx.freshName("t")
      val nw = ctx.freshName("nw"); val hs = ctx.freshName("hs")
      val s = ctx.freshName("s"); val h = ctx.freshName("h")
      val j = ctx.freshName("j")
      val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
      s"""
         |int $ntok = $a.numElements();
         |long[] $xs = new long[$ntok];
         |for (int $i = 0; $i < $ntok; $i++) {
         |  UTF8String $t = $a.getUTF8String($i);
         |  $xs[$i] = $xxh.hashUnsafeBytes($t.getBaseObject(), $t.getBaseOffset(), $t.numBytes(), 7L);
         |}
         |int $nw = Math.max(0, $ntok - $w + 1);
         |long[] $hs = new long[$nw];
         |for (int $s = 0; $s < $nw; $s++) {
         |  long $h = ${ShingleHashes.Seed}L;
         |  for (int $j = 0; $j < $w; $j++) { $h = $xxh.hashLong($xs[$s + $j], $h); }
         |  $hs[$s] = $h;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($hs);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WindowHashes {
  def apply(tokens: Column, w: Int): Column =
    GraftBridge.column(WindowHashes(GraftBridge.expression(tokens), w))
}

/** Count of positions where two equal-length `array<long>` values agree —
  * the MinHash signature-similarity kernel (estimated Jaccard = agree/k).
  * `zip_with(a, b, equals)` evaluates interpreted per element; this is one
  * codegen loop per pair.
  */
case class PositionAgreeCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> arguments, got ${l.simpleString} and ${r.simpleString}")
    }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "position_agree_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (aa, bb) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val k = math.min(aa.numElements(), bb.numElements())
    var i = 0; var cnt = 0
    while (i < k) {
      if (aa.getLong(i) == bb.getLong(i)) cnt += 1
      i += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val k = ctx.freshName("k")
      val cnt = ctx.freshName("cnt")
      s"""
         |int $k = Math.min($a.numElements(), $b.numElements());
         |int $cnt = 0;
         |for (int $i = 0; $i < $k; $i++) {
         |  if ($a.getLong($i) == $b.getLong($i)) $cnt++;
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PositionAgreeCount {
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(PositionAgreeCount(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}

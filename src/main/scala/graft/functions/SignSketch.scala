package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Sign-random-projection sketch: `planes` sign bits of deterministic ±1
  * (Rademacher) projections of a numeric vector, packed into
  * `ceil(planes/64)` longs. Bit p of the sketch is `sign(Σ_i w(p,i)·v_i)`
  * where `w(p,i)` is bit `p mod 64` of `xxhash64(i, seed = p/64)` — no
  * stored plane matrix, any two rows (corpus or query, any partition)
  * derive identical planes.
  *
  * For unit vectors `P[bit agrees] = 1 − θ/π` (Goemans–Williamson), so the
  * Hamming distance between two sketches is an unbiased angle estimate with
  * binomial error — the cheap first-pass score for cosine top-k
  * ([[graft.ext.SimilarityOps]]), and slices of the same bits serve as LSH
  * band keys. Native codegen: one `planes × dim` add loop per row; the
  * higher-order-function formulation this replaces evaluated interpreted
  * per element (CodegenFallback) and re-derived per join side.
  */
case class SignRandomSketch(child: Expression, planes: Int) extends UnaryExpression {
  require(planes > 0 && planes % 64 == 0,
    s"planes must be a positive multiple of 64, got $planes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: NumericType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sign_random_sketch requires a numeric array, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sign_random_sketch"

  private def elemType: DataType = child.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val t = elemType
    def get(i: Int): Double = t match {
      case FloatType => arr.getFloat(i).toDouble
      case DoubleType => arr.getDouble(i)
      case IntegerType => arr.getInt(i).toDouble
      case LongType => arr.getLong(i).toDouble
      case other => throw new IllegalArgumentException(s"unsupported element type $other")
    }
    val words = planes / 64
    val acc = new Array[Double](planes)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val v = get(i)
      var w = 0
      while (w < words) {
        val h = XXH64.hashLong(i.toLong, w.toLong)
        val base = w * 64
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) acc(base + b) += v else acc(base + b) -= v
          b += 1
        }
        w += 1
      }
      i += 1
    }
    val sig = new Array[Long](words)
    var p = 0
    while (p < planes) {
      if (acc(p) > 0) sig(p / 64) |= (1L << (p % 64))
      p += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getter = elemType match {
      case FloatType => (a: String, i: String) => s"(double) $a.getFloat($i)"
      case DoubleType => (a: String, i: String) => s"$a.getDouble($i)"
      case IntegerType => (a: String, i: String) => s"(double) $a.getInt($i)"
      case LongType => (a: String, i: String) => s"(double) $a.getLong($i)"
      case other => throw new IllegalArgumentException(s"unsupported element type $other")
    }
    nullSafeCodeGen(ctx, ev, a => {
      val words = planes / 64
      val acc = ctx.freshName("acc")
      val sig = ctx.freshName("sig")
      val i = ctx.freshName("i")
      val w = ctx.freshName("w")
      val b = ctx.freshName("b")
      val p = ctx.freshName("p")
      val n = ctx.freshName("n")
      val v = ctx.freshName("v")
      val h = ctx.freshName("h")
      val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
      s"""
         |double[] $acc = new double[$planes];
         |int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = ${getter(a, i)};
         |  for (int $w = 0; $w < $words; $w++) {
         |    long $h = $xxh.hashLong((long) $i, (long) $w);
         |    for (int $b = 0; $b < 64; $b++) {
         |      $acc[$w * 64 + $b] += ((($h >>> $b) & 1L) == 1L) ? $v : -$v;
         |    }
         |  }
         |}
         |long[] $sig = new long[$words];
         |for (int $p = 0; $p < $planes; $p++) {
         |  if ($acc[$p] > 0.0) $sig[$p / 64] |= (1L << ($p % 64));
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($sig);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Hamming distance between two equal-length `array<bigint>` bit sketches
  * (XOR + popcount per word) — the per-pair hot kernel of the sketch-rerank
  * similarity path. Length mismatch throws: comparing sketches of different
  * widths is silently wrong, never useful.
  */
case class HammingDistance(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"hamming_distance requires two array<bigint> arguments, got ${l.simpleString} and ${r.simpleString}")
    }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "hamming_distance"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (aa, bb) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = aa.numElements()
    if (bb.numElements() != n)
      throw new IllegalArgumentException(
        s"$prettyName: sketch width mismatch ($n vs ${bb.numElements()})")
    var d = 0
    var i = 0
    while (i < n) {
      d += java.lang.Long.bitCount(aa.getLong(i) ^ bb.getLong(i))
      i += 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  throw new IllegalArgumentException(
         |    "hamming_distance: sketch width mismatch (" + $n + " vs " + $b.numElements() + ")");
         |}
         |int $d = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $d += java.lang.Long.bitCount($a.getLong($i) ^ $b.getLong($i));
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SignSketch {
  def apply(vec: Column, planes: Int): Column =
    GraftBridge.column(SignRandomSketch(GraftBridge.expression(vec), planes))
  def hamming(a: Column, b: Column): Column =
    GraftBridge.column(HammingDistance(GraftBridge.expression(a), GraftBridge.expression(b)))
}

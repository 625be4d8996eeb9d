package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Matryoshka-style embedding truncation with exact re-normalization in ONE
  * codegen pass (Kusupati et al., "Matryoshka Representation Learning",
  * NeurIPS 2022: an MRL-trained vector's first `dim` coordinates are a
  * usable lower-cost embedding once re-normalized): take the first `dim`
  * elements, compute their norm under the [[FixedPointDot]] fixed-point
  * regime (Σ round(x²·1e12) in int64 — order-independent, engine-
  * replayable), and emit `x_i / nrm` as array<double>.
  *
  * Why a kernel and not `transform(slice(...))` column expressions: the
  * norm sub-expression lands INSIDE the per-element lambda after
  * `CollapseProject` (the [[Int8QuantizeExpr]] O(d²)-per-row trap), and
  * higher-order functions run interpreted. This is one flat O(dim) loop in
  * whole-stage codegen.
  *
  * Contracts: a vector SHORTER than `dim` throws (a silently shorter
  * truncation is wrong, never useful — the FixedPointDot mismatch rule); a
  * null ELEMENT throws (embeddings are dense; a null coordinate means a
  * corrupt row, and skipping it would silently change the geometry). A
  * NaN coordinate or a zero norm yields a NULL result (nothing usable to
  * renormalize — visible, the usableVec posture). Null vector → null.
  */
case class TruncateRenormExpr(child: Expression, dim: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"truncate_renorm requires array<float|double>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "truncate_renorm"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < dim)
      throw new IllegalArgumentException(
        s"truncate_renorm: vector has $n elements, need at least $dim")
    var acc = 0L
    var sawNaN = false
    var i = 0
    while (i < dim) {
      if (arr.isNullAt(i))
        throw new IllegalArgumentException(
          s"truncate_renorm: null element at position $i — embeddings are dense")
      val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      if (java.lang.Double.isNaN(x)) sawNaN = true
      val p = x * x * 1e12
      acc += math.floor(p + 0.5).toLong
      i += 1
    }
    val nrm = math.sqrt(acc.toDouble / 1e12)
    if (sawNaN || !(nrm > 0.0)) null
    else {
      val out = new Array[Any](dim)
      i = 0
      while (i < dim) {
        val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        out(i) = x / nrm
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (isFloat) (a: String, i: String) => s"(double) $a.getFloat($i)"
    else (a: String, i: String) => s"$a.getDouble($i)"
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val sawNaN = ctx.freshName("sawNaN")
      val x = ctx.freshName("x")
      val p = ctx.freshName("p")
      val nrm = ctx.freshName("nrm")
      val out = ctx.freshName("out")
      s"""
         |final int $n = $a.numElements();
         |if ($n < $dim) {
         |  throw new IllegalArgumentException(
         |    "truncate_renorm: vector has " + $n + " elements, need at least $dim");
         |}
         |long $acc = 0L;
         |boolean $sawNaN = false;
         |for (int $i = 0; $i < $dim; $i++) {
         |  if ($a.isNullAt($i)) {
         |    throw new IllegalArgumentException(
         |      "truncate_renorm: null element at position " + $i +
         |      " — embeddings are dense");
         |  }
         |  final double $x = ${get(a, i)};
         |  if (Double.isNaN($x)) $sawNaN = true;
         |  final double $p = $x * $x * 1e12;
         |  $acc += (long) java.lang.Math.floor($p + 0.5);
         |}
         |final double $nrm = java.lang.Math.sqrt((double) $acc / 1e12);
         |if ($sawNaN || !($nrm > 0.0)) {
         |  ${ev.isNull} = true;
         |} else {
         |  final Object[] $out = new Object[$dim];
         |  for (int $i = 0; $i < $dim; $i++) {
         |    $out[$i] = ${get(a, i)} / $nrm;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TruncateRenorm {
  def apply(vec: Column, dim: Int): Column =
    GraftBridge.column(TruncateRenormExpr(GraftBridge.expression(vec), dim))
}

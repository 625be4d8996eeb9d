package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Element-wise vector subtraction `a − b` as ONE flat codegen loop —
  * the residual computation of IVFADC (Jégou/Douze/Schmid, TPAMI 2011
  * §III: encode x − centroid(cell(x)) so PQ codes only span cell-local
  * variance). Why a kernel and not `zip_with`: higher-order functions
  * are CodegenFallback (interpreted, boxed per element) and this runs
  * once per corpus row in the index-build scan — the
  * [[TruncateRenormExpr]] rule.
  *
  * Contracts: length mismatch throws (a silently truncated residual
  * re-metrics every distance — the FixedPointDot mismatch rule); null
  * ELEMENTS throw (embeddings are dense); NaN coordinates pass through
  * (the downstream [[PqEncodeExpr]] NULLs NaN vectors — the usableVec
  * posture); a null operand yields null.
  */
case class VecSubExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_sub requires two array<float|double>, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "vec_sub"

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a0: Any, b0: Any): Any = {
    val a = a0.asInstanceOf[ArrayData]
    val b = b0.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"vec_sub: length mismatch ($n vs ${b.numElements()})")
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i))
        throw new IllegalArgumentException(
          s"vec_sub: null element at position $i — embeddings are dense")
      val x = if (isFloat(left)) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (isFloat(right)) b.getFloat(i).toDouble else b.getDouble(i)
      out(i) = x - y
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def get(fl: Boolean) =
      if (fl) (a: String, i: String) => s"(double) $a.getFloat($i)"
      else (a: String, i: String) => s"$a.getDouble($i)"
    val getL = get(isFloat(left))
    val getR = get(isFloat(right))
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      s"""
         |final int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  throw new IllegalArgumentException(
         |    "vec_sub: length mismatch (" + $n + " vs " + $b.numElements() + ")");
         |}
         |final Object[] $out = new Object[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |    throw new IllegalArgumentException(
         |      "vec_sub: null element at position " + $i + " — embeddings are dense");
         |  }
         |  $out[$i] = ${getL(a, i)} - ${getR(b, i)};
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VecSub {
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(VecSubExpr(GraftBridge.expression(a), GraftBridge.expression(b)))
}

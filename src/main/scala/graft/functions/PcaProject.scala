package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Dense affine projection `y = M·(x − μ)` of a numeric vector column —
  * the per-row apply step of a driver-fitted PCA
  * ([[graft.ext.SimilarityOps.pcaFit]]). The (small, `outDim×inDim`)
  * matrix and mean are plan-time constants carried as codegen references,
  * so the projection runs inside whole-stage codegen as two flat loops:
  * no per-row matrix broadcast join, no interpreted higher-order
  * functions in what is typically an every-row ingest pass.
  *
  * Rows whose vector length differs from `inDim` project to null (the
  * degrade-don't-kill contract of the media kernels — one malformed row
  * must not fail a 100 TB pass); callers can filter nulls to quarantine.
  */
case class PcaProjectExpr(
    child: Expression,
    mean: Vector[Double],
    matrix: Vector[Double]) extends UnaryExpression {

  private def inDim: Int = mean.length
  private def outDim: Int = matrix.length / math.max(1, inDim)

  require(inDim > 0 && matrix.length == outDim * inDim,
    s"pca_project: matrix length ${matrix.length} is not a multiple of input dim $inDim")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pca_project requires array<float|double>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pca_project"

  private def elemType: DataType = child.dataType.asInstanceOf[ArrayType].elementType

  @transient private lazy val meanArr: Array[Double] = mean.toArray
  @transient private lazy val matArr: Array[Double] = matrix.toArray

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() != inDim) return null
    val isFloat = elemType == FloatType
    val cent = new Array[Double](inDim)
    var i = 0
    while (i < inDim) {
      cent(i) = (if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)) - meanArr(i)
      i += 1
    }
    val out = new Array[Double](outDim)
    var j = 0
    while (j < outDim) {
      var s = 0.0
      val base = j * inDim
      var k = 0
      while (k < inDim) { s += matArr(base + k) * cent(k); k += 1 }
      out(j) = s
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val meanRef = ctx.addReferenceObj("pcaMean", meanArr, "double[]")
    val matRef = ctx.addReferenceObj("pcaMatrix", matArr, "double[]")
    val get = elemType match {
      case FloatType => (a: String, i: String) => s"(double) $a.getFloat($i)"
      case _ => (a: String, i: String) => s"$a.getDouble($i)"
    }
    nullSafeCodeGen(ctx, ev, a => {
      val cent = ctx.freshName("cent")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val s = ctx.freshName("s")
      s"""
         |if ($a.numElements() != $inDim) {
         |  ${ev.isNull} = true;
         |} else {
         |  double[] $cent = new double[$inDim];
         |  for (int $i = 0; $i < $inDim; $i++) {
         |    $cent[$i] = ${get(a, i)} - $meanRef[$i];
         |  }
         |  double[] $out = new double[$outDim];
         |  for (int $j = 0; $j < $outDim; $j++) {
         |    double $s = 0.0;
         |    for (int $k = 0; $k < $inDim; $k++) {
         |      $s += $matRef[$j * $inDim + $k] * $cent[$k];
         |    }
         |    $out[$j] = $s;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PcaProject {
  def apply(vec: Column, mean: Array[Double], matrix: Array[Double]): Column =
    GraftBridge.column(PcaProjectExpr(
      GraftBridge.expression(vec), mean.toVector, matrix.toVector))
}

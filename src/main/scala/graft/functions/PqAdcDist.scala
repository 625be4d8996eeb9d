package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Asymmetric (query-to-code) squared euclidean distance for product-
  * quantized search — the ADC of Jégou/Douze/Schmid TPAMI 2011: the raw
  * query meets only the CODES, d(q, code) = Σ_b ‖q_b − c[b][code_b]‖²,
  * so the corpus side never materializes decoded float vectors (m bytes
  * per row stay m bytes through the whole scoring pass).
  *
  * One flat codegen loop with the codebook as a referenced double[] (the
  * [[PqEncodeExpr]] shape). The distance is a pure per-row function of
  * (query, code) — plain IEEE arithmetic in a fixed scan order is
  * partitioning- and engine-proof, and every same-code neighbor of a
  * query ties EXACTLY (the op's deterministic id tie-break then orders
  * them).
  *
  * Contracts: wrong code length / out-of-range code / wrong query dim
  * throw (silently wrong geometry is never useful); null code element
  * throws; a NaN query coordinate propagates NaN (callers filter queries
  * through usableVec, the cosineTopK posture); null code or query → null.
  */
case class PqAdcDistExpr(left: Expression, right: Expression,
                         flat: Array[Double], m: Int, ks: Int, bd: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(IntegerType, _), ArrayType(FloatType | DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"pq_adc_dist requires (array<int> code, array<float|double> query), " +
        s"got ${l.simpleString} and ${r.simpleString}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_dist"

  private def isFloat: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(code: Any, q: Any): Any =
    PqAdcDist.compute(code.asInstanceOf[ArrayData], q.asInstanceOf[ArrayData],
      isFloat, flat, m, ks, bd)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val flatRef = ctx.addReferenceObj("pqAdcCodebook", flat, "double[]")
    nullSafeCodeGen(ctx, ev, (code, q) =>
      s"${ev.value} = graft.functions.PqAdcDist.compute($code, $q, $isFloat, " +
        s"$flatRef, $m, $ks, $bd);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PqAdcDist {
  def compute(code: ArrayData, q: ArrayData, isFloat: Boolean,
              flat: Array[Double], m: Int, ks: Int, bd: Int): Double = {
    if (code.numElements() != m)
      throw new IllegalArgumentException(
        s"pq_adc_dist: code has ${code.numElements()} blocks, model expects $m")
    if (q.numElements() != m * bd)
      throw new IllegalArgumentException(
        s"pq_adc_dist: query has ${q.numElements()} elements, model expects ${m * bd}")
    var acc = 0.0
    var b = 0
    while (b < m) {
      if (code.isNullAt(b))
        throw new IllegalArgumentException(
          s"pq_adc_dist: null code at block $b — codes are dense")
      val ci = code.getInt(b)
      if (ci < 0 || ci >= ks)
        throw new IllegalArgumentException(
          s"pq_adc_dist: code $ci at block $b outside [0, $ks)")
      val off = (b * ks + ci) * bd
      var j = 0
      while (j < bd) {
        val x = if (isFloat) q.getFloat(b * bd + j).toDouble
        else q.getDouble(b * bd + j)
        val d = x - flat(off + j)
        acc += d * d
        j += 1
      }
      b += 1
    }
    acc
  }

  def apply(code: Column, query: Column,
            centers: Array[Array[Array[Double]]]): Column = {
    val m = centers.length
    val ks = centers(0).length
    val bd = centers(0)(0).length
    val flat = new Array[Double](m * ks * bd)
    var i = 0
    for (b <- 0 until m; c <- 0 until ks; k <- 0 until bd) {
      flat(i) = centers(b)(c)(k); i += 1
    }
    GraftBridge.column(PqAdcDistExpr(GraftBridge.expression(code),
      GraftBridge.expression(query), flat, m, ks, bd))
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization encoding of a vector in ONE codegen pass — the
  * hot kernel of [[graft.ext.SimilarityOps.pqEncode]]: for each of `m`
  * equal blocks, the id of the euclidean-nearest codebook centroid
  * (ties to the smaller cid), returned as `array<int>` of length m.
  *
  * Why a kernel and not a greatest()-over-structs Column composition:
  * the composition builds m·ks dot-product expression trees (4096 at
  * m=16/ks=256) — codegen blows past JIT method limits and falls back
  * interpreted (measured: minutes for a 500-row encode at ks=128). Here
  * the codebook rides as one flat double[] reference and the whole
  * argmin is a tight triple loop.
  *
  * Determinism: encoding is a pure PER-ROW function (no cross-row
  * accumulation), so plain IEEE double arithmetic with a fixed scan
  * order is already partitioning- and engine-proof — the fixed-point
  * machinery exists for cross-row sums and is not needed here.
  *
  * Contracts: a vector whose length ≠ m·bd throws (a silently misaligned
  * block decomposition is wrong, never useful); a NaN coordinate yields
  * a NULL code (NaN distances would silently elect centroid 0 — the
  * usableVec posture); null vector → null.
  */
case class PqEncodeExpr(child: Expression, flat: Array[Double],
                        m: Int, ks: Int, bd: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode requires array<float|double>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any =
    PqEncode.compute(input.asInstanceOf[ArrayData], isFloat, flat, m, ks, bd)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("pqCodebook", flat, "double[]")
    val res = ctx.freshName("pqRes")
    nullSafeCodeGen(ctx, ev, a => s"""
       |Object $res = graft.functions.PqEncode.compute(
       |  $a, $isFloat, $flatRef, $m, $ks, $bd);
       |if ($res == null) { ${ev.isNull} = true; }
       |else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $res; }
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqEncode {
  /** Shared interpreted/codegen body: returns a GenericArrayData of m int
    * codes, or null when any read coordinate is NaN.
    */
  def compute(arr: ArrayData, isFloat: Boolean, flat: Array[Double],
              m: Int, ks: Int, bd: Int): Any = {
    val n = arr.numElements()
    if (n != m * bd)
      throw new IllegalArgumentException(
        s"pq_encode: vector has $n elements, model expects ${m * bd}")
    val x = new Array[Double](bd)
    val codes = new Array[Any](m)
    var b = 0
    while (b < m) {
      var j = 0
      while (j < bd) {
        if (arr.isNullAt(b * bd + j))
          throw new IllegalArgumentException(
            s"pq_encode: null element at position ${b * bd + j} — " +
              "embeddings are dense (the TruncateRenorm rule; reading the " +
              "slot as 0.0 would silently corrupt the geometry)")
        val v = if (isFloat) arr.getFloat(b * bd + j).toDouble
        else arr.getDouble(b * bd + j)
        if (java.lang.Double.isNaN(v)) return null
        x(j) = v
        j += 1
      }
      var best = 0
      var bestD = Double.MaxValue
      var ci = 0
      while (ci < ks) {
        val off = (b * ks + ci) * bd
        var d2 = 0.0
        var k = 0
        while (k < bd) {
          val d = x(k) - flat(off + k)
          d2 += d * d
          k += 1
        }
        if (d2 < bestD) { bestD = d2; best = ci }
        ci += 1
      }
      codes(b) = best
      b += 1
    }
    new GenericArrayData(codes)
  }

  def apply(vec: Column, centers: Array[Array[Array[Double]]]): Column = {
    val m = centers.length
    val ks = centers(0).length
    val bd = centers(0)(0).length
    val flat = new Array[Double](m * ks * bd)
    var i = 0
    for (b <- 0 until m; c <- 0 until ks; k <- 0 until bd) {
      flat(i) = centers(b)(c)(k); i += 1
    }
    GraftBridge.column(PqEncodeExpr(GraftBridge.expression(vec), flat, m, ks, bd))
  }
}

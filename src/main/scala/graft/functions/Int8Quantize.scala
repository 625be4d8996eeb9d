package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Symmetric int8 storage quantization of a numeric vector in ONE codegen
  * pass: `scale = max|x|/127 (1.0 when the max is not > 0)`,
  * `q_i = (tinyint) floor(x_i/scale + 0.5)` — returned together as
  * `struct(qscale double, q array<tinyint>)`.
  *
  * Why a kernel and not `transform`/`array_max` column expressions: Spark
  * evaluates higher-order functions interpreted (CodegenFallback), and
  * `CollapseProject` inlines the scale sub-expression into every element's
  * lambda — the composed column form costs O(d²) interpreted ops per row,
  * recomputed AGAIN in any Filter/Generate that references the output
  * (measured 1.5 s for 2 k×64-dim rows on the bench explode query). This
  * expression is one flat O(d) loop inside whole-stage codegen; consumers
  * that explode or filter the result recompute a linear pass, not a
  * quadratic one.
  *
  * Semantics match the column composition exactly, including Spark's
  * NaN-is-greatest `array_max` ordering and the floor→long→tinyint cast
  * chain (RenderSpec holds the rendered transform-SQL face and this
  * kernel to the same results). Null ELEMENTS quantize to null and are
  * skipped by the max; a null VECTOR yields a null struct (callers
  * coalesce the scale to 1.0 to mirror the CASE face).
  */
case class Int8QuantizeExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"int8_quantize requires array<float|double>, got ${other.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("qscale", DoubleType, nullable = false),
    StructField("q", ArrayType(ByteType, containsNull = true), nullable = false)))
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "int8_quantize"

  private def elemType: DataType = child.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val isFloat = elemType == FloatType
    // Spark array_max ordering: NaN compares greatest, nulls skipped
    var maxabs = Double.NegativeInfinity
    var sawValue = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val v = math.abs(if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i))
        if (!sawValue || java.lang.Double.isNaN(v) ||
          (!java.lang.Double.isNaN(maxabs) && v > maxabs)) maxabs = v
        sawValue = true
      }
      i += 1
    }
    // CASE WHEN maxabs > 0 (NaN > 0 is TRUE under Spark's NaN ordering)
    val scale =
      if (sawValue && (maxabs > 0 || java.lang.Double.isNaN(maxabs))) maxabs / 127.0
      else 1.0
    val out = new Array[Any](n)
    i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        // floor(double) -> LONG (Spark Floor), then cast long -> tinyint
        out(i) = math.floor(x / scale + 0.5).toLong.toByte
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](scale, new GenericArrayData(out)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = elemType match {
      case FloatType => (a: String, i: String) => s"(double) $a.getFloat($i)"
      case _ => (a: String, i: String) => s"$a.getDouble($i)"
    }
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val maxabs = ctx.freshName("maxabs")
      val saw = ctx.freshName("saw")
      val v = ctx.freshName("v")
      val scale = ctx.freshName("scale")
      val out = ctx.freshName("out")
      val x = ctx.freshName("x")
      s"""
         |final int $n = $a.numElements();
         |double $maxabs = Double.NEGATIVE_INFINITY;
         |boolean $saw = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    final double $v = java.lang.Math.abs(${get(a, i)});
         |    if (!$saw || Double.isNaN($v) || (!Double.isNaN($maxabs) && $v > $maxabs)) {
         |      $maxabs = $v;
         |    }
         |    $saw = true;
         |  }
         |}
         |final double $scale =
         |  ($saw && ($maxabs > 0 || Double.isNaN($maxabs))) ? $maxabs / 127.0 : 1.0;
         |final Object[] $out = new Object[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    final double $x = ${get(a, i)};
         |    $out[$i] = (byte) (long) java.lang.Math.floor($x / $scale + 0.5);
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[] { $scale,
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($out) });
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Int8Quantize {
  def apply(vec: Column): Column =
    GraftBridge.column(Int8QuantizeExpr(GraftBridge.expression(vec)))
}

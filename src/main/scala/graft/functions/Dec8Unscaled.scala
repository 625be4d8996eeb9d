package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** `unscaled(CAST(x AS DECIMAL(38,8)))` as one codegen'd long-valued
  * expression — the per-row conversion behind
  * [[graft.core.Exact.splitDecimalSum8]]'s fast-cast mode. The decimal
  * cast's semantics are Java's shortest-decimal rendering rounded
  * HALF_UP at 8 fractional digits (`BigDecimal.valueOf(x).setScale(8,
  * HALF_UP)`), which normally costs a `Double.toString` + BigDecimal
  * parse + setScale per row per sum. [[Dec8Unscaled.unscaled8]] takes a
  * pure-arithmetic fast path when the decision is PROVABLY unambiguous:
  * with u = x·10⁸ (one rounding, error ≤ ulp(u)/2) and the shortest
  * rendering D(x) within ulp(x)/2 of x (so |D(x)·10⁸ − u| ≤ ~3·ulp(u)),
  * any u farther than 8·ulp(u) from the nearest half-integer boundary
  * rounds to the same integer as D(x)·10⁸ — ties, near-ties and
  * |u| > 2⁵⁰ (where ulp(u) ≥ 1/8 makes every distance ambiguous) fall
  * back to the exact BigDecimal computation. The fallback is also the
  * loud guard: an |x| whose unscaled exceeds a long throws
  * (`longValueExact`), exactly like Spark's `UnscaledValue`; callers
  * gate on [[graft.core.Exact.splitSumSafe]] so it never fires.
  *
  * ONLY valid under that probe: inputs are null or finite (the corr
  * masks null-out NaN, and an Inf in a column fails its probe bound so
  * the caller never builds this expression for it). Equality with the
  * cast-based path is pinned bitwise over adversarial and randomized
  * fixtures (Round18Spec), including exact half-boundary decimals.
  */
case class Dec8Unscaled(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a double input, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "dec8_unscaled"

  override protected def nullSafeEval(input: Any): Any =
    Dec8Unscaled.unscaled8(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Dec8Unscaled.unscaled8($c)")

  override protected def withNewChildInternal(newChild: Expression): Dec8Unscaled =
    copy(child = newChild)
}

object Dec8Unscaled {
  private val Cap = (1L << 50).toDouble

  /** See the class doc for the proof sketch. `x` must be finite. */
  def unscaled8(x: Double): Long = {
    val u = x * 1e8
    val au = math.abs(u)
    if (au <= Cap) {
      val r = math.rint(u)            // nearest integer (ties excluded below)
      val distToHalf = 0.5 - math.abs(u - r) // u - r exact: same binade, |diff| <= 0.5
      if (distToHalf > 8.0 * math.ulp(au)) return r.toLong
    }
    // exact reference: the decimal cast's own arithmetic
    java.math.BigDecimal.valueOf(x)
      .setScale(8, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()
  }
}

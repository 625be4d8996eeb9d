package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DecimalType, DoubleType, FloatType}

/** Deterministic (partitioning-independent) floating-point aggregation.
  *
  * Plain `sum(double)` depends on accumulation order, which in a distributed
  * engine depends on partitioning — the same query can return different last
  * bits on different cluster layouts, which breaks result reproducibility and
  * oracle/hash-based testing at any scale. Routing the sum through a wide
  * decimal makes it exact and order-independent, at a modest CPU cost
  * (decimal adds instead of double adds; still whole-stage codegen'd, still
  * map-side partial-aggregated by Catalyst).
  *
  * Used by the `aggregate`/window operators for float inputs; disable per
  * column by calling the plain functions instead.
  */
object Exact {
  /** Scale kept during exact accumulation. 38-4 = 34 integer digits of
    * headroom: enough for 1e20 rows of 1e14-magnitude values.
    */
  val Scale = 4
  val Wide: DecimalType = DecimalType(38, Scale)

  def isFloating(dt: DataType): Boolean = dt == DoubleType || dt == FloatType

  /** Exact sum of a floating column, returned as double. */
  def sum(c: Column): Column = functions_sum(c.cast(Wide)).cast("double")

  /** Exact mean: exact sum / count. The count is over the SAME decimal
    * cast the sum accumulates — `cast(NaN as decimal)` is null, so a NaN
    * value (or an Inf, or an overflow) leaves numerator AND denominator
    * together; `count(c)` would count it (non-null) and silently bias the
    * mean low. Division done once in double space.
    */
  def avg(c: Column): Column = sum(c) / count(c.cast(Wide))

  /** Population/sample stddev from exact sums: sqrt((Sxx - Sx^2/n)/(n-1)).
    * x*x is computed per-row in double (deterministic), then accumulated
    * exactly; deterministic regardless of partitioning.
    *
    * n, Sx and Sxx are ALL gated on the x² decimal cast: DECIMAL(38,8)
    * holds 30 integer digits, so for |x| ≳ 1e15 the x² cast leaves range
    * while x itself still fits DECIMAL(38,4) (34 digits). Under ANSI mode
    * (the Spark 4 default) the overflow RAISES — loud, never wrong. Under
    * non-ANSI the cast nulls, and before this gate the row counted in
    * n/Sx while dropping from Sxx — a finite but wrong stddev; gating all
    * three on the same cast excludes such a row (and NaN/Inf, which null
    * the cast in either mode) from the statistic entirely — the same
    * consistent-exclusion contract as [[avg]]. SQL faces spelling this
    * formula out carry the same gate; DuckDB likewise raises on decimal
    * overflow, so past the 1e15 bound every face fails loudly rather
    * than diverging silently.
    */
  def stddev(c: Column): Column = {
    val xx = (c * c).cast(DecimalType(38, 8))
    val n = count(xx).cast("double")
    val sx = functions_sum(when(xx.isNotNull, c).cast(Wide)).cast("double")
    val sxx = functions_sum(xx).cast("double")
    sqrt((sxx - sx * sx / n) / (n - lit(1.0)))
  }

  /** Sample variance from the same gated exact sums — [[stddev]] without
    * the square root; identical NaN/overflow exclusion contract.
    */
  def variance(c: Column): Column = {
    val xx = (c * c).cast(DecimalType(38, 8))
    val n = count(xx).cast("double")
    val sx = functions_sum(when(xx.isNotNull, c).cast(Wide)).cast("double")
    val sxx = functions_sum(xx).cast("double")
    (sxx - sx * sx / n) / (n - lit(1.0))
  }

  /** Exact, order-independent dot product of two numeric array columns.
    *
    * Per-element products are rounded to 1e-12 fixed-point longs (ties away
    * from zero — the rounding both Spark's HALF_UP and DuckDB's round()
    * use) and summed as integers: no accumulation-order sensitivity, no
    * decimal-precision widening. Headroom: |x·y| ≤ ~9e5 per element before
    * int64 overflow at 64–4096 dims — plenty for unit-normalized
    * embeddings.
    */
  def dot(a: Column, b: Column): Column = graft.functions.FixedPointDot(a, b)

  private def functions_sum(c: Column): Column = org.apache.spark.sql.functions.sum(c)
}

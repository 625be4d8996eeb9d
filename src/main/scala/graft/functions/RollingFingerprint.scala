package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** Karp–Rabin rolling-hash document fingerprint: the minimum 64-bit
  * polynomial hash over all `k`-byte windows of the text — a bottom-1
  * sketch of the k-gram set (MOSS/winnowing lineage). Near-duplicates
  * collide with probability ≈ their shared-k-gram fraction, making it a
  * cheap content-defined grouping key where a whole-document digest breaks
  * on any edit.
  *
  * One O(n) pass per row: the window hash rolls with
  * h' = (h − b_out·B^(k−1))·B + b_in over the UTF8 bytes, base 257,
  * arithmetic in the 2^64 ring. Texts shorter than k hash as one window.
  */
case class RollingFingerprint(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rolling_fingerprint requires a string, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_fingerprint"

  private val Base = 257L
  private lazy val basePow: Long = { // Base^(k-1) in the 2^64 ring
    var p = 1L; var i = 1; while (i < k) { p *= Base; i += 1 }; p
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val n = bytes.length
    if (n == 0) return 0L
    val win = math.min(k, n)
    var h = 0L
    var i = 0
    while (i < win) { h = h * Base + (bytes(i) & 0xff); i += 1 }
    var minH = h
    var pw = 1L; var j = 1; while (j < win) { pw *= Base; j += 1 }
    while (i < n) {
      h = (h - (bytes(i - win) & 0xff) * pw) * Base + (bytes(i) & 0xff)
      if (h < minH) minH = h
      i += 1
    }
    minH
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val bytes = ctx.freshName("bytes"); val n = ctx.freshName("n")
      val win = ctx.freshName("win"); val h = ctx.freshName("h")
      val minH = ctx.freshName("minH"); val pw = ctx.freshName("pw")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      s"""
         |byte[] $bytes = $s.getBytes();
         |int $n = $bytes.length;
         |long $minH = 0L;
         |if ($n > 0) {
         |  int $win = java.lang.Math.min($k, $n);
         |  long $h = 0L;
         |  int $i = 0;
         |  for (; $i < $win; $i++) { $h = $h * ${Base}L + ($bytes[$i] & 0xff); }
         |  $minH = $h;
         |  long $pw = 1L;
         |  for (int $j = 1; $j < $win; $j++) { $pw *= ${Base}L; }
         |  for (; $i < $n; $i++) {
         |    $h = ($h - ($bytes[$i - $win] & 0xff) * $pw) * ${Base}L + ($bytes[$i] & 0xff);
         |    if ($h < $minH) $minH = $h;
         |  }
         |}
         |${ev.value} = $minH;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingFingerprint {
  def apply(text: Column, k: Int): Column =
    GraftBridge.column(RollingFingerprint(GraftBridge.expression(text), k))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** |A ∩ B| of two SORTED, DISTINCT string arrays via a single merge pass —
  * the verification kernel of the prefix-filtered exact similarity join.
  * O(|A|+|B|) with no allocation; `array_intersect` would build a hash set
  * per row and evaluates interpreted.
  *
  * Caller contract: both arrays sorted ascending (Spark `array_sort`
  * order) and deduplicated; unsorted input silently undercounts.
  */
case class SortedArrayIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<string> arguments, got ${l.simpleString} and ${r.simpleString}")
    }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_array_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (aa, bb) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (n1, n2) = (aa.numElements(), bb.numElements())
    var i = 0; var j = 0; var cnt = 0
    while (i < n1 && j < n2) {
      val c = aa.getUTF8String(i).compareTo(bb.getUTF8String(j))
      if (c == 0) { cnt += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n1 = ctx.freshName("n1"); val n2 = ctx.freshName("n2")
      val cnt = ctx.freshName("cnt"); val cmp = ctx.freshName("cmp")
      s"""
         |int $n1 = $a.numElements();
         |int $n2 = $b.numElements();
         |int $i = 0; int $j = 0; int $cnt = 0;
         |while ($i < $n1 && $j < $n2) {
         |  int $cmp = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |  if ($cmp == 0) { $cnt++; $i++; $j++; }
         |  else if ($cmp < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedArrayIntersectCount {
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(SortedArrayIntersectCount(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}

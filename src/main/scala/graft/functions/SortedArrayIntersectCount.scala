package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** |A ∩ B| of two SORTED, DISTINCT arrays via a single merge pass — the
  * verification kernel of the prefix-filtered exact similarity join.
  * O(|A|+|B|) with no allocation; `array_intersect` would build a hash set
  * per row and evaluates interpreted. Supports `array<string>` (raw shingle
  * text) and `array<bigint>` (hashed shingles from [[ShingleHashes]], the
  * fast path — 8-byte compares instead of variable-length UTF8).
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
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<string> or two array<bigint> arguments, " +
          s"got ${l.simpleString} and ${r.simpleString}")
    }

  private def isLongElems: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == LongType

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_array_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (aa, bb) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (n1, n2) = (aa.numElements(), bb.numElements())
    var i = 0; var j = 0; var cnt = 0
    if (isLongElems) {
      while (i < n1 && j < n2) {
        val x = aa.getLong(i); val y = bb.getLong(j)
        if (x == y) { cnt += 1; i += 1; j += 1 }
        else if (x < y) i += 1
        else j += 1
      }
    } else {
      while (i < n1 && j < n2) {
        val c = aa.getUTF8String(i).compareTo(bb.getUTF8String(j))
        if (c == 0) { cnt += 1; i += 1; j += 1 }
        else if (c < 0) i += 1
        else j += 1
      }
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n1 = ctx.freshName("n1"); val n2 = ctx.freshName("n2")
      val cnt = ctx.freshName("cnt")
      val body = if (isLongElems) {
        val x = ctx.freshName("x"); val y = ctx.freshName("y")
        s"""
           |while ($i < $n1 && $j < $n2) {
           |  long $x = $a.getLong($i); long $y = $b.getLong($j);
           |  if ($x == $y) { $cnt++; $i++; $j++; }
           |  else if ($x < $y) { $i++; } else { $j++; }
           |}
         """.stripMargin
      } else {
        val cmp = ctx.freshName("cmp")
        s"""
           |while ($i < $n1 && $j < $n2) {
           |  int $cmp = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
           |  if ($cmp == 0) { $cnt++; $i++; $j++; }
           |  else if ($cmp < 0) { $i++; } else { $j++; }
           |}
         """.stripMargin
      }
      s"""
         |int $n1 = $a.numElements();
         |int $n2 = $b.numElements();
         |int $i = 0; int $j = 0; int $cnt = 0;
         |$body
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

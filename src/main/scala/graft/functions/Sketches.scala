package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** Native codegen sketch kernels for the dedup operators. Both consume a
  * `array<string>` (tokens / shingles) and run one tight loop per row —
  * the equivalent higher-order-function formulations evaluate interpreted
  * per element (CodegenFallback) and dominated the dedup benchmarks.
  */

/** 64-bit SimHash: per token, xxhash64 of its bytes votes ±1 on each bit
  * position; the sketch keeps the sign bits. Near-duplicate texts differ in
  * few bits (compare with `bit_count(a ^ b)`).
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val cnt = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val t = arr.getUTF8String(i)
      val h = XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, 42L)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) cnt(j) += 1 else cnt(j) -= 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) { if (cnt(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cnt = ctx.freshName("cnt")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val t = ctx.freshName("t")
      val h = ctx.freshName("h")
      val sig = ctx.freshName("sig")
      s"""
         |int[] $cnt = new int[64];
         |int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  UTF8String $t = $a.getUTF8String($i);
         |  long $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
         |    $t.getBaseObject(), $t.getBaseOffset(), $t.numBytes(), 42L);
         |  for (int $j = 0; $j < 64; $j++) {
         |    $cnt[$j] += ((($h >>> $j) & 1L) == 1L) ? 1 : -1;
         |  }
         |}
         |long $sig = 0L;
         |for (int $j = 0; $j < 64; $j++) {
         |  if ($cnt[$j] > 0) $sig |= (1L << $j);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** MinHash signature: `numHashes` permutation-min values over the shingle
  * set, from the standard two-hash affine family g_k = h1 + k·h2 (one pass,
  * two hash evaluations per shingle regardless of signature width).
  * Estimated Jaccard of two documents = fraction of agreeing positions.
  * Accepts `array<string>` shingles (hashed here) or `array<bigint>`
  * pre-hashed shingles from [[ShingleHashes]] (the fast path — h1/h2 derive
  * from the 64-bit shingle hash with two xxhash64-long mixes).
  */
case class MinHashSignature(child: Expression, numHashes: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) | ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature requires array<string> or array<bigint>, got ${other.simpleString}")
  }

  private def isLongElems: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == LongType

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val longElems = isLongElems
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      var h1 = 0L
      var h2 = 0L
      if (longElems) {
        val x = arr.getLong(i)
        h1 = XXH64.hashLong(x, 0L)
        h2 = XXH64.hashLong(x, 1L)
      } else {
        val t = arr.getUTF8String(i)
        h1 = XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, 0L)
        h2 = XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, 1L)
      }
      var k = 0
      while (k < numHashes) {
        val g = h1 + k * h2
        if (g < mins(k)) mins(k) = g
        k += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val n = ctx.freshName("n")
      val t = ctx.freshName("t")
      val x = ctx.freshName("x")
      val h1 = ctx.freshName("h1")
      val h2 = ctx.freshName("h2")
      val g = ctx.freshName("g")
      val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
      val hashes = if (isLongElems) {
        s"""
           |  long $x = $a.getLong($i);
           |  long $h1 = $xxh.hashLong($x, 0L);
           |  long $h2 = $xxh.hashLong($x, 1L);
         """.stripMargin
      } else {
        s"""
           |  UTF8String $t = $a.getUTF8String($i);
           |  long $h1 = $xxh.hashUnsafeBytes($t.getBaseObject(), $t.getBaseOffset(), $t.numBytes(), 0L);
           |  long $h2 = $xxh.hashUnsafeBytes($t.getBaseObject(), $t.getBaseOffset(), $t.numBytes(), 1L);
         """.stripMargin
      }
      s"""
         |long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |$hashes
         |  for (int $k = 0; $k < $numHashes; $k++) {
         |    long $g = $h1 + $k * $h2;
         |    if ($g < $mins[$k]) $mins[$k] = $g;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Sketches {
  def simhash64(tokens: Column): Column =
    GraftBridge.column(SimHash64(GraftBridge.expression(tokens)))
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    GraftBridge.column(MinHashSignature(GraftBridge.expression(shingles), numHashes))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** DSIR importance score of a token array as a native Catalyst expression
  * with codegen — the hot kernel of [[graft.ext.SelectionOps.dsirScore]].
  *
  * Semantics (bit-identical to the Column formulation it replaces, and to
  * the DuckDB oracle replay): for every unigram and every space-joined
  * adjacent bigram of the tokens, bucket = the first 4 bytes of
  * md5(utf8(gram)) as an unsigned big-endian 32-bit value mod B (exactly
  * the `hex8(md5(g)) % B` digit-parse — the first 8 hex chars ARE the
  * first 4 digest bytes), and the result is Σ weights(bucket) in int64.
  * Order-independent integer accumulation: partitioning-proof.
  *
  * Why native: the `aggregate`/`transform` higher-order formulation is
  * interpreted (CodegenFallback) and rebuilds a per-gram expression tree
  * with a 16-node hex parse — measured ~4× slower at sf0.1. Here the
  * whole fold is one static call on the raw ArrayData (no gram strings
  * materialized for unigrams; one byte-append for bigrams), and the
  * weight table rides the plan as a referenced long[].
  *
  * Null ARRAY → null (nullSafeEval). A null token ELEMENT throws: tokens
  * come from `split()`, which never yields null elements — a null here
  * means a hand-built array, and silently skipping or nulling the score
  * would be wrong either way.
  */
case class DsirScore(child: Expression, weights: Array[Long])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> tokens, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "dsir_score"

  override def nullSafeEval(a: Any): Any =
    DsirScore.compute(a.asInstanceOf[ArrayData], weights)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("dsirWeights", weights, "long[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.DsirScore.compute($a, $wRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Bucket ids of every DSIR gram (unigrams then adjacent bigrams) of a
  * token array — the fit-side sibling of [[DsirScore]]: `dsirModel`
  * explodes this int array into its bucket-count aggregate instead of
  * materializing gram STRINGS through an interpreted zip/transform and
  * hashing them with a 16-node hex-parse Column chain. Same digest-byte
  * arithmetic (one shared helper), so fit and apply can never disagree
  * on what a gram hashes to. Empty token array → empty bucket array.
  */
case class DsirBuckets(child: Expression, buckets: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> tokens, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "dsir_buckets"

  override def nullSafeEval(a: Any): Any =
    DsirScore.bucketsOf(a.asInstanceOf[ArrayData], buckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.DsirScore.bucketsOf($a, $buckets);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DsirBuckets {
  import org.apache.spark.sql.GraftBridge

  def apply(tokens: Column, buckets: Int): Column =
    GraftBridge.column(DsirBuckets(GraftBridge.expression(tokens), buckets))
}

object DsirScore {
  import org.apache.spark.sql.GraftBridge

  def apply(tokens: Column, weights: Array[Long]): Column =
    GraftBridge.column(DsirScore(GraftBridge.expression(tokens), weights))

  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** The fold the generated code calls: Σ weights(bucket(gram)) over
    * unigrams and adjacent bigrams of `toks`.
    */
  def compute(toks: ArrayData, weights: Array[Long]): Long = {
    val n = toks.numElements()
    val md = mdLocal.get()
    var acc = 0L
    var i = 0
    var prev: Array[Byte] = null
    while (i < n) {
      if (toks.isNullAt(i))
        throw new IllegalArgumentException(
          s"dsir_score: null token at position $i — tokens must come from split()")
      val cur = toks.getUTF8String(i).getBytes
      acc += weights(bucketOf(md, cur, null, weights.length))
      if (prev != null) acc += weights(bucketOf(md, prev, cur, weights.length))
      prev = cur
      i += 1
    }
    acc
  }

  /** All gram buckets of a token array (unigrams then bigrams) as an
    * int ArrayData — the [[DsirBuckets]] kernel.
    */
  def bucketsOf(toks: ArrayData, buckets: Int): ArrayData = {
    val n = toks.numElements()
    val out = new Array[Int](if (n == 0) 0 else 2 * n - 1)
    val md = mdLocal.get()
    var i = 0
    var prev: Array[Byte] = null
    while (i < n) {
      if (toks.isNullAt(i))
        throw new IllegalArgumentException(
          s"dsir_buckets: null token at position $i — tokens must come from split()")
      val cur = toks.getUTF8String(i).getBytes
      out(i) = bucketOf(md, cur, null, buckets)
      if (prev != null) out(n + i - 1) = bucketOf(md, prev, cur, buckets)
      prev = cur
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Bucket of one gram: first 4 md5 digest bytes, unsigned BE, mod B —
    * byte-for-byte what `hex8(md5(g)) % B` computes on the hex string.
    */
  private def bucketOf(md: java.security.MessageDigest, a: Array[Byte],
                       b: Array[Byte], buckets: Int): Int = {
    md.reset()
    md.update(a)
    if (b != null) { md.update(' '.toByte); md.update(b) }
    val d = md.digest()
    val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    (v % buckets).toInt
  }
}

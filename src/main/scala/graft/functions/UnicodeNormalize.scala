package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC/NFD/NFKC/NFKD) as a codegen'd Catalyst
  * expression — the canonicalization step in front of hashing, dedup and
  * tokenization: two strings that render identically ("é" precomposed
  * vs "e" + combining acute) must fingerprint identically before any
  * exact-dedup or shingle hash sees them. Spark ships no normalizer
  * function, and a Scala UDF would break whole-stage codegen in exactly
  * the hot scan-side path this runs in; the generated code is one
  * static `java.text.Normalizer` call per row.
  */
case class UnicodeNormalize(child: Expression, form: String)
  extends UnaryExpression with UnaryLike[Expression] {

  // lazy: an invalid form must surface as a TypeCheckFailure through
  // checkInputDataTypes (an analysis error), not a raw enum exception at
  // case-class construction before analysis ever runs
  private lazy val javaForm: Normalizer.Form = Normalizer.Form.valueOf(form)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType if Set("NFC", "NFD", "NFKC", "NFKD").contains(form) =>
      TypeCheckResult.TypeCheckSuccess
    case _: StringType => TypeCheckResult.TypeCheckFailure(
      s"unicode_normalize form must be one of NFC/NFD/NFKC/NFKD, got $form")
    case other => TypeCheckResult.TypeCheckFailure(
      s"unicode_normalize requires a STRING input, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // normalization is the identity on ASCII-only strings (the common
    // case for web text) — skip the char[] round-trip for them
    if (Normalizer.isNormalized(s, javaForm)) input
    else UTF8String.fromString(Normalizer.normalize(s, javaForm))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val str = ctx.freshName("str")
      s"""
         |String $str = $c.toString();
         |if (java.text.Normalizer.isNormalized($str, java.text.Normalizer.Form.$form)) {
         |  ${ev.value} = $c;
         |} else {
         |  ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |    java.text.Normalizer.normalize($str, java.text.Normalizer.Form.$form));
         |}
       """.stripMargin
    })

  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"
  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row kernel for [[UnicodeNormExpr]] (static for codegen). The
  * fast path is the JDK's own `isNormalized` probe: real-world corpora
  * are overwhelmingly already-NFC ASCII, for which the probe is a
  * linear scan with no allocation — only rows that actually carry
  * denormalized sequences pay for the rewrite.
  */
object UnicodeNorm {
  def normalize(s: UTF8String, form: Normalizer.Form): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(Normalizer.normalize(str, form))
  }
}

/** Unicode normalization as a native expression — the cleanup pass a
  * text pipeline runs BEFORE any hashing/dedup/fingerprinting step:
  * visually-identical strings with different codepoint sequences
  * (é composed vs e + U+0301) hash differently, so near-dup recall
  * silently degrades on denormalized corpora unless every document is
  * canonicalized first. Spark has no built-in for this; the engine
  * ships it as expression tier (b): `unicode_norm(text[, 'NFC'])`,
  * codegen'd, narrow, zero-shuffle.
  *
  * The form is a compile-time literal (NFC/NFD/NFKC/NFKD) so the
  * generated code references a cached enum constant — no per-row
  * dispatch.
  */
case class UnicodeNormExpr(child: Expression, formName: String)
    extends UnaryExpression {

  private val form: Normalizer.Form = Normalizer.Form.valueOf(formName)

  override def dataType: DataType = StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"unicode_norm expects string, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    UnicodeNorm.normalize(input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val formRef = ctx.addReferenceObj("normForm", form,
      classOf[Normalizer.Form].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.UnicodeNorm.normalize($c, $formRef);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): UnicodeNormExpr = copy(child = newChild)
}

object UnicodeNormExpr {
  /** Column-API entry point: `unicodeNorm(text)` (NFC by default). */
  def unicodeNorm(text: Column, form: String = "NFC"): Column =
    GraftBridge.columnOf(
      UnicodeNormExpr(GraftBridge.expressionOf(text), form))
}

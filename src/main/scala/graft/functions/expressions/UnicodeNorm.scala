package graft.functions.expressions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (`graft_unorm(text, 'NFC'|'NFD'|'NFKC'|'NFKD')`) —
  * the canonicalization pass a multilingual corpus pipeline runs before
  * any hashing or dedup (CCNet/mC4 normalize before fingerprinting:
  * visually-identical strings must hash identically, so composed and
  * decomposed spellings of the same text have to collapse first).
  *
  * Spark has no built-in for this (the usual fallback is a Scala UDF
  * around java.text.Normalizer — an eval boundary per row); this is the
  * same JDK normalizer as a codegen'd expression inside the enclosing
  * WholeStageCodegen stage. DuckDB's `nfc_normalize` is the oracle-side
  * spelling of the NFC form; both implement the Unicode standard's
  * normalization algorithm, and the text_unicode_norm gate checks the
  * agreement byte-for-byte on decomposed/precomposed fixtures.
  *
  * The form is a compile-time literal (it selects the algorithm, not
  * data), so the codegen path burns the chosen `Normalizer.Form` enum
  * directly into the generated source — no per-row dispatch.
  */
case class UnicodeNorm(child: Expression, form: String) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (!child.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckFailure(
        s"graft_unorm requires a string input, got ${child.dataType.sql}")
    else if (!UnicodeNorm.Forms.contains(form))
      TypeCheckResult.TypeCheckFailure(
        s"graft_unorm form must be one of ${UnicodeNorm.Forms.mkString("/")}, got '$form'")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = child.dataType

  override def prettyName: String = "graft_unorm"

  override protected def nullSafeEval(input: Any): Any =
    UnicodeNorm.normalize(input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"""graft.functions.expressions.UnicodeNorm.normalize($c, "$form")""")

  override protected def withNewChildInternal(newChild: Expression): UnicodeNorm =
    copy(child = newChild)
}

object UnicodeNorm {
  val Forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[UnicodeNorm].getName, "graft_unorm")

  def normalize(s: UTF8String, form: String): UTF8String = {
    val str = s.toString
    // already-normalized text (the overwhelming mass of a real corpus is
    // ASCII) round-trips without re-encoding: isNormalized is a cheap
    // scan, and ASCII short-circuits inside the JDK
    val f = Normalizer.Form.valueOf(form)
    if (Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(Normalizer.normalize(str, f))
  }
}

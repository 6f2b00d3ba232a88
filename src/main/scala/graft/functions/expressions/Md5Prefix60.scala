package graft.functions.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** First 60 bits of md5 as a non-negative long — the shared cross-engine
  * hash primitive of the dedup / text / similarity suites (CrossHash.h60).
  *
  * Value-identical to the composed spelling
  * `conv(substring(md5(x), 1, 15), 16, 10) :: long` (and to DuckDB's
  * `CAST('0x'||substr(md5(x),1,15) AS UBIGINT)`), but computed directly
  * from the digest bytes: the built-in composition materializes a 32-char
  * hex UTF8String, substrings it, and re-parses base-16 per row — three
  * expression nodes and two string allocations that this fuses into one
  * digest + shift sequence, codegen'd into the enclosing WholeStageCodegen
  * stage. The digest instance is thread-local (MessageDigest is stateful
  * and not thread-safe; executors run many codegen'd tasks per JVM).
  */
case class Md5Prefix60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_h60 requires a string input, got ${child.dataType.sql}")

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_h60"

  override protected def nullSafeEval(input: Any): Any =
    Md5Prefix60.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.Md5Prefix60.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix60 =
    copy(child = newChild)
}

object Md5Prefix60 {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[Md5Prefix60].getName, "graft_h60")

  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 15 hex chars of md5(bytes) as an unsigned 60-bit long:
    * bytes 0-6 big-endian, then the high nibble of byte 7. */
  def hash(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >>> 4)
  }
}

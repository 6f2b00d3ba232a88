package graft.functions.expressions

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused word-3-gram shingle hashes: whitespace-tokenize, slide the 3-gram
  * window, and emit each shingle's 60-bit md5 prefix — one expression call
  * per document instead of the composed
  * `split → transform(sequence, concat_ws) → explode → graft_h60` chain.
  *
  * Value-identical to the composed spelling (CrossHash.shingles3 + h60,
  * and the DuckDB oracle's list comprehension): tokenization is the same
  * `\s+` regex split (limit -1, so leading/trailing empties match Spark's
  * `split`), and each hash digests `w_i ' ' w_{i+1} ' ' w_{i+2}` exactly as
  * concat_ws spells it — but the digest is fed incrementally from the token
  * bytes, so the per-shingle concatenated string, the Catalyst string
  * array, and the per-shingle expression-tree evaluation all disappear.
  * This is the hot inner loop of every shingle consumer (dedup_ngram,
  * minhash, incremental, decontam, curate): at 100 TB it is the difference
  * between one digest pass and materializing ~50 shingle strings per
  * document through the projection.
  *
  * Documents with fewer than 3 tokens yield the empty array (the
  * composed spelling's CASE guard). Deduplication of repeated shingles
  * stays OUTSIDE (the (doc_id, h) distinct), exactly as before.
  */
case class Shingle60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_shingle60 requires a string input, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_shingle60"

  override protected def nullSafeEval(input: Any): Any =
    Shingle60.shingles(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.Shingle60.shingles($c)")

  override protected def withNewChildInternal(newChild: Expression): Shingle60 =
    copy(child = newChild)
}

object Shingle60 {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[Shingle60].getName, "graft_shingle60")

  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }
  private val Space = Array(' '.toByte)

  def shingles(s: UTF8String): ArrayData = {
    // the same tokenization as Spark's split(text, '\s+') (java regex,
    // limit -1) — byte arrays up front so each token is encoded once,
    // not once per shingle it participates in
    val words = s.toString.split("\\s+", -1)
    if (words.length < 3) return new GenericArrayData(Array.emptyLongArray)
    val bytes = new Array[Array[Byte]](words.length)
    var i = 0
    while (i < words.length) { bytes(i) = words(i).getBytes(UTF_8); i += 1 }
    val md = digests.get()
    val out = new Array[Long](words.length - 2)
    i = 0
    while (i < out.length) {
      md.reset()
      md.update(bytes(i)); md.update(Space)
      md.update(bytes(i + 1)); md.update(Space)
      md.update(bytes(i + 2))
      val d = md.digest()
      var v = 0L
      var j = 0
      while (j < 7) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
      out(i) = (v << 4) | ((d(7) & 0xf0L) >>> 4)
      i += 1
    }
    new GenericArrayData(out)
  }
}

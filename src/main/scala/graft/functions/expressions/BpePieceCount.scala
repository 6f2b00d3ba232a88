package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block.BlockHelper
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Trained-BPE piece count — `graft_bpe_count(text, lefts, rights)`.
  *
  * The production-size replacement for `Tokenizer.Learned`'s nested-fold
  * spelling: the fold builds ONE `aggregate` expression per merge, so
  * expression depth (and generated-code size) grows linearly with the
  * vocabulary and the tokenizer caps at 32 merges. Here the merge table
  * rides the codegen reference array as a prebuilt [[BpeTable]] and the
  * whole segmentation runs as one JVM call per row inside the enclosing
  * WholeStageCodegen stage — table size no longer touches plan shape, so
  * a 30k-merge production vocabulary costs the same plan as a toy one.
  *
  * Semantics are EXACTLY the fold spelling's (BpeTrainerSpec pins
  * equality): whitespace words (Java regex `\s+`, the oracle spelling),
  * per word code-point symbols (Spark's `split(w, '')`), merges applied
  * in table order, each one leftmost-first non-overlapping in a single
  * pass ([[graft.operators.BpeTrainer.segmentReference]]); the count is
  * the summed surviving-symbol count. Null text → null; whitespace-only
  * text → 0.
  *
  * `lefts`/`rights` must be FOLDABLE array<string> literals of equal
  * length in merge-rank order — they are evaluated once per plan on the
  * driver (the BloomContains literal discipline), never per row.
  *
  * Scale shape: per word the applicable-merge prune is a hash lookup per
  * table entry against the word's symbol set, so a word of s symbols does
  * O(|table|) set probes + O(s) work per merge that actually fires —
  * independent of corpus size, zero shuffle, no UDF serde boundary.
  *
  * Measured (test-scope tools/BpeBench, sf0.1 documents, min of 3): the 32-merge
  * fold spelling sums piece counts in 27.7 s; this expression does the
  * same table in 0.16 s (~170×), and an 89-merge table — beyond what
  * the fold can compile at all — in 0.19 s. The fold's cost is the
  * nested `aggregate` lambda evaluation per merge per word; here the
  * whole segmentation is one JVM call.
  */
case class BpePieceCount(child: Expression, leftsExpr: Expression, rightsExpr: Expression)
    extends Expression {

  override def children: Seq[Expression] = Seq(child, leftsExpr, rightsExpr)

  override def checkInputDataTypes(): TypeCheckResult = {
    def isStringArray(dt: DataType) = dt match {
      case ArrayType(_: StringType, _) => true
      case _ => false
    }
    if (!child.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckFailure(
        s"graft_bpe_count requires a string input, got ${child.dataType.sql}")
    else if (!leftsExpr.foldable || !rightsExpr.foldable)
      TypeCheckResult.TypeCheckFailure(
        "graft_bpe_count merge tables must be foldable array<string> literals")
    else if (!isStringArray(leftsExpr.dataType) || !isStringArray(rightsExpr.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"graft_bpe_count merge tables must be array<string>, got " +
          s"${leftsExpr.dataType.sql} / ${rightsExpr.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_bpe_count"

  @transient private[expressions] lazy val builtTable: BpeTable = {
    def strings(e: Expression, name: String): Array[String] = {
      val arr = e.eval(null).asInstanceOf[ArrayData]
      require(arr != null, s"graft_bpe_count: $name table literal is null")
      val out = new Array[String](arr.numElements())
      var i = 0
      while (i < out.length) {
        val u = arr.getUTF8String(i)
        require(u != null, s"graft_bpe_count: $name table contains a null symbol")
        out(i) = u.toString
        i += 1
      }
      out
    }
    val l = strings(leftsExpr, "lefts")
    val r = strings(rightsExpr, "rights")
    require(l.length == r.length,
      s"graft_bpe_count: merge tables differ in length (${l.length} vs ${r.length})")
    new BpeTable(l, r)
  }

  override def eval(input: InternalRow): Any = {
    val t = child.eval(input)
    if (t == null) null
    else BpePieceCount.count(t.asInstanceOf[UTF8String], builtTable)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the PREBUILT table rides the reference array — the array children are
    // plan-time literals and must never be (re-)evaluated per row
    val ref = ctx.addReferenceObj("bpeTable", builtTable, classOf[BpeTable].getName)
    val childGen = child.genCode(ctx)
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = ${childGen.isNull};
      long ${ev.value} = 0L;
      if (!${ev.isNull}) {
        ${ev.value} = graft.functions.expressions.BpePieceCount.count(${childGen.value}, $ref);
      }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BpePieceCount =
    copy(child = newChildren(0), leftsExpr = newChildren(1), rightsExpr = newChildren(2))
}

/** Precompiled merge table: parallel left/right symbol arrays in rank
  * order plus the concatenated merged symbols. Serializable — ships to
  * executors in the codegen reference array. */
final class BpeTable(val lefts: Array[String], val rights: Array[String])
    extends Serializable {
  val merged: Array[String] = {
    val out = new Array[String](lefts.length)
    var i = 0
    while (i < out.length) { out(i) = lefts(i) + rights(i); i += 1 }
    out
  }
}

object BpePieceCount {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[BpePieceCount].getName, "graft_bpe_count")

  // Java regex \s — the exact class Spark's split('\s+') matches; NOT
  // Character.isWhitespace, which adds Unicode separators \s excludes
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Piece count of a whole text under a merge table. */
  def count(text: UTF8String, table: BpeTable): Long = {
    val s = text.toString
    val len = s.length
    var total = 0L
    var i = 0
    while (i < len) {
      while (i < len && isWs(s.charAt(i))) i += 1
      val start = i
      while (i < len && !isWs(s.charAt(i))) i += 1
      if (i > start) total += countWord(s, start, i, table)
    }
    total
  }

  /** All pieces of a whole text, word by word in order (whitespace
    * dropped) — the segmentation [[count]] counts, materialized for the
    * graft_bpe_segment expression. */
  def segment(text: UTF8String, table: BpeTable): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val s = text.toString
    val len = s.length
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    var i = 0
    while (i < len) {
      while (i < len && isWs(s.charAt(i))) i += 1
      val start = i
      while (i < len && !isWs(s.charAt(i))) i += 1
      if (i > start) {
        val (syms, n) = segmentWord(s, start, i, table)
        var j = 0
        while (j < n) { out += UTF8String.fromString(syms(j)); j += 1 }
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  private def countWord(s: String, start: Int, end: Int, table: BpeTable): Long =
    segmentWord(s, start, end, table)._2.toLong

  /** Segment one word (s[start, end)): code-point symbols, then each
    * merge in table order applied as one leftmost-first non-overlapping
    * pass (segmentReference's loop). Returns the working array and the
    * live piece count (entries beyond it are stale). */
  private def segmentWord(s: String, start: Int, end: Int,
      table: BpeTable): (Array[String], Int) = {
    // code-point symbols (matches Spark's split(w, ''))
    val syms = new Array[String](end - start)
    var n = 0
    var i = start
    while (i < end) {
      val cp = s.codePointAt(i)
      val w = Character.charCount(cp)
      syms(n) = s.substring(i, i + w)
      n += 1
      i += w
    }
    if (n < 2 || table.lefts.length == 0) return (syms, n)

    // symbol superset present in the word: prunes inapplicable merges to
    // two hash probes each; stale entries (consumed symbols) only cost a
    // wasted scan, never a wrong merge
    val present = new java.util.HashSet[String](n * 2)
    i = 0
    while (i < n) { present.add(syms(i)); i += 1 }

    var m = 0
    val merges = table.lefts.length
    while (m < merges && n >= 2) {
      if (present.contains(table.lefts(m)) && present.contains(table.rights(m))) {
        val l = table.lefts(m)
        val r = table.rights(m)
        var rd = 0
        var wr = 0
        var fired = false
        while (rd < n) {
          if (rd + 1 < n && syms(rd) == l && syms(rd + 1) == r) {
            syms(wr) = table.merged(m); rd += 2; fired = true
          } else {
            syms(wr) = syms(rd); rd += 1
          }
          wr += 1
        }
        if (fired) { n = wr; present.add(table.merged(m)) }
      }
      m += 1
    }
    (syms, n)
  }
}

/** Piece SEGMENTATION under a trained merge table —
  * `graft_bpe_segment(text, lefts, rights)` → array<string> of the
  * pieces [[BpePieceCount]] counts, word by word in text order. The
  * materialized form feeds piece-level corpus work: the vocabulary
  * artifact ([[graft.operators.BpeTrainer.vocabulary]]), piece-frequency
  * stats, OOV-under-tokenizer analysis. Same table/null/whitespace
  * semantics as the count twin (size(graft_bpe_segment(..)) ==
  * graft_bpe_count(..) is pinned in the property sweep). */
case class BpeSegment(child: Expression, leftsExpr: Expression, rightsExpr: Expression)
    extends Expression {

  // identical input contract to the count twin
  private val asCount = BpePieceCount(child, leftsExpr, rightsExpr)

  override def children: Seq[Expression] = Seq(child, leftsExpr, rightsExpr)

  override def checkInputDataTypes(): TypeCheckResult = asCount.checkInputDataTypes()

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_bpe_segment"

  @transient private lazy val table: BpeTable = asCount.builtTable

  override def eval(input: InternalRow): Any = {
    val t = child.eval(input)
    if (t == null) null
    else BpePieceCount.segment(t.asInstanceOf[UTF8String], table)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table, classOf[BpeTable].getName)
    val childGen = child.genCode(ctx)
    val arrCls = classOf[org.apache.spark.sql.catalyst.util.GenericArrayData].getName
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = ${childGen.isNull};
      $arrCls ${ev.value} = null;
      if (!${ev.isNull}) {
        ${ev.value} = graft.functions.expressions.BpePieceCount.segment(${childGen.value}, $ref);
      }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BpeSegment =
    copy(child = newChildren(0), leftsExpr = newChildren(1), rightsExpr = newChildren(2))
}

object BpeSegment {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[BpeSegment].getName, "graft_bpe_segment")
}

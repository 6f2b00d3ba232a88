package graft.functions.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** Count-Min sketch (Cormode & Muthukrishnan 2005): a d×w matrix of
  * counters over a string column — point-frequency estimation in fixed
  * space, the third leg of the mergeable-sketch family (KMV = distinct,
  * SpaceSaving = top-k, CMS = per-item frequency).
  *
  * est(x) = min_i cell(i, h_i(x)) ≥ true(x) always (counters only ever
  * add), and est(x) ≤ true(x) + εN with probability 1−δ at w = ⌈e/ε⌉,
  * d = ⌈ln 1/δ⌉ — the published bounds. Merge is POINTWISE ADDITION, so
  * unlike SpaceSaving the sketch is exactly order- and
  * partition-independent: any merge tree yields the identical matrix
  * (CmsSpec pins repartition-invariance).
  *
  * The row hashes are h_i(x) = ((a_i·(h60(x) mod P) + b_i) mod P) mod w
  * over the same md5-derived 60-bit base as the dedup suites — fully
  * deterministic and SQL-expressible, which buys this sketch something
  * rare: the DuckDB oracle rebuilds the ENTIRE matrix relationally
  * (cell(i,j) = Σ counts of colliding tokens) and checks the estimates
  * hash-exact even in the colliding regime — most sketches only get an
  * exact oracle in their no-collision regime.
  *
  * Nulls are ignored. The matrix flattens row-major to array<long>
  * (cell(i,j) at index i·w + j); probes are plain array arithmetic, no
  * decoder needed.
  */
case class CountMinSketch(child: Expression, wExpr: Expression, dExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  private lazy val w: Int = wExpr.eval().asInstanceOf[Int]
  private lazy val d: Int = dExpr.eval().asInstanceOf[Int]

  override def checkInputDataTypes(): TypeCheckResult = {
    if (child.dataType != StringType)
      return TypeCheckResult.TypeCheckFailure(
        s"graft_cms requires a string column, got ${child.dataType.sql}")
    for ((e, n) <- Seq(wExpr -> "w", dExpr -> "d")) {
      if (e.dataType != IntegerType || !e.foldable)
        return TypeCheckResult.TypeCheckFailure(s"graft_cms $n must be an int literal")
      val v = e.eval()
      if (v == null || v.asInstanceOf[Int] < 1)
        return TypeCheckResult.TypeCheckFailure(s"graft_cms $n must be >= 1, got $v")
    }
    if (dExpr.eval().asInstanceOf[Int] > CountMinSketch.MaxDepth)
      return TypeCheckResult.TypeCheckFailure(
        s"graft_cms d must be <= ${CountMinSketch.MaxDepth} (seeded rows)")
    TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](d * w)

  override def update(buf: Array[Long], row: InternalRow): Array[Long] = {
    val v = child.eval(row)
    if (v != null) {
      val base = CountMinSketch.baseHash(v.asInstanceOf[UTF8String])
      var i = 0
      while (i < d) {
        buf(i * w + CountMinSketch.rowIndex(base, i, w)) += 1L
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong(); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_cms"
  override def children: Seq[Expression] = Seq(child, wExpr, dExpr)

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinSketch =
    copy(child = newChildren(0), wExpr = newChildren(1), dExpr = newChildren(2))
}

object CountMinSketch {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[CountMinSketch].getName, "graft_cms")

  /** Modulus and per-row (a, b) seeds — the minhash constants' shape,
    * offset so the two families never share a permutation. Public:
    * queries and the DuckDB oracle spell the identical arithmetic. */
  val P: Long = 1000000007L
  val MaxDepth = 16
  def a(i: Int): Long = 7654321L + 999979L * i
  def b(i: Int): Long = 987654L + 777767L * i

  /** h60 folded into [0, P) — non-negative, so % and pmod agree in every
    * engine. */
  def baseHash(s: UTF8String): Long = Md5Prefix60.hash(s) % P

  def rowIndex(base: Long, i: Int, w: Int): Int =
    (((a(i) * base + b(i)) % P) % w).toInt
}

package graft.functions.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** KMV (k-minimum-values) cardinality sketch: keeps the k smallest DISTINCT
  * values of a long hash column per group and returns them ascending.
  *
  * The interactive approximate-distinct shape at 100 TB: the buffer is
  * bounded (k longs), map-side combinable (merge = merged minima), and the
  * shuffle carries |groups| × k × 8 bytes instead of the distinct key
  * space an exact count must move — the same systems role as HLL
  * (`ev_approx_stats`), with one property HLL lacks: the k minima are a
  * pure ORDER-INDEPENDENT function of the input value set, so the result
  * is bit-identical across engines, partitionings and merge orders, and
  * the estimator built on it ((k−1)·M/h₍ₖ₎ over hash space M) gets a
  * hash-exact DuckDB oracle rather than a rows-only check.
  *
  * Distinctness is inherent (the buffer is a set), so callers skip the
  * usual `.distinct()` pre-shuffle entirely. Null hashes are ignored
  * (SQL COUNT(DISTINCT …) convention).
  */
case class KmvMinima(child: Expression, kExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Int]

  override def checkInputDataTypes(): TypeCheckResult = {
    if (child.dataType != LongType)
      return TypeCheckResult.TypeCheckFailure(
        s"graft_kmv requires a bigint hash column, got ${child.dataType.sql}")
    if (kExpr.dataType != IntegerType || !kExpr.foldable)
      return TypeCheckResult.TypeCheckFailure("graft_kmv k must be an int literal")
    val kv = kExpr.eval()
    if (kv == null || kv.asInstanceOf[Int] < 1)
      return TypeCheckResult.TypeCheckFailure(s"graft_kmv k must be >= 1, got $kv")
    TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(buf: java.util.TreeSet[java.lang.Long],
      row: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(row)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      // cheap reject first: once the buffer is full, most rows hash above
      // the current k-th minimum and never touch the tree
      if (buf.size < k) buf.add(h)
      else if (h < buf.last) {
        if (buf.add(h) && buf.size > k) buf.pollLast()
      }
    }
    buf
  }

  override def merge(a: java.util.TreeSet[java.lang.Long],
      b: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b.iterator()
    var done = false
    while (it.hasNext && !done) {
      val h = it.next()
      // b iterates ascending: the first rejected element ends the merge
      // (everything after it is larger still)
      if (a.size < k) a.add(h)
      else if (h < a.last) { if (a.add(h) && a.size > k) a.pollLast() }
      else done = true
    }
    a
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val buf = new java.util.TreeSet[java.lang.Long]()
    val bb = ByteBuffer.wrap(bytes)
    while (bb.hasRemaining) buf.add(bb.getLong())
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kmv"
  override def children: Seq[Expression] = Seq(child, kExpr)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMinima =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMinima =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvMinima =
    copy(child = newChildren(0), kExpr = newChildren(1))
}

object KmvMinima {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[KmvMinima].getName, "graft_kmv")
}

package graft.functions.expressions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** SpaceSaving heavy-hitters sketch (Metwally et al. 2005, "Efficient
  * computation of frequent and top-k elements in data streams"): a
  * k-entry (item → count, error) summary of a string column.
  *
  * The frequency twin of the KMV cardinality sketch ([[KmvMinima]]):
  * bounded buffer, map-side combinable, and the shuffle carries |groups|
  * × k entries instead of the full item space — the vocabulary/top-k
  * shape at 100 TB, where an exact token-frequency GROUP BY must shuffle
  * every distinct token and a SpaceSaving pass shuffles k entries per
  * partition with the classic guarantees (count overestimates true
  * frequency by at most `err` ≤ N/k; every item with true frequency
  * > N/k is present).
  *
  * Exactness property that buys the oracle: while NO eviction has
  * occurred anywhere (k ≥ distinct items in every partial buffer), the
  * summary is the exact frequency table with err = 0, independent of
  * partitioning and merge order — so a test corpus with < k distinct
  * tokens gets a hash-exact DuckDB GROUP BY oracle, while the production
  * regime (evictions) degrades to the published approximation, not to
  * wrong answers. Merge follows the mergeable-summaries construction
  * (Agarwal et al. 2012): pointwise count/err addition, then prune back
  * to k by evicting minimum-count entries (their count is absorbed as
  * error by construction of the next insert).
  *
  * Null items are ignored. Eviction tie-break (equal counts) is the
  * lexicographically largest item, so the exact regime is fully
  * deterministic and the approximate regime reproducible per merge tree.
  */
case class SpaceSavingTopK(child: Expression, kExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[String, Array[Long]]] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Int]

  override def checkInputDataTypes(): TypeCheckResult = {
    if (child.dataType != StringType)
      return TypeCheckResult.TypeCheckFailure(
        s"graft_topk requires a string column, got ${child.dataType.sql}")
    if (kExpr.dataType != IntegerType || !kExpr.foldable)
      return TypeCheckResult.TypeCheckFailure("graft_topk k must be an int literal")
    val kv = kExpr.eval()
    if (kv == null || kv.asInstanceOf[Int] < 1)
      return TypeCheckResult.TypeCheckFailure(s"graft_topk k must be >= 1, got $kv")
    TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): java.util.HashMap[String, Array[Long]] =
    new java.util.HashMap[String, Array[Long]]()

  /** Evict the minimum-count entry (tie → lexicographically largest item)
    * and return its count — the error floor the replacing item inherits. */
  private def evictMin(buf: java.util.HashMap[String, Array[Long]]): Long = {
    var minItem: String = null
    var minCnt = Long.MaxValue
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue()(0)
      if (c < minCnt || (c == minCnt && (minItem == null || e.getKey.compareTo(minItem) > 0))) {
        minCnt = c; minItem = e.getKey
      }
    }
    buf.remove(minItem)
    minCnt
  }

  override def update(buf: java.util.HashMap[String, Array[Long]],
      row: InternalRow): java.util.HashMap[String, Array[Long]] = {
    val v = child.eval(row)
    if (v != null) {
      // UTF8String buffers are reused by the scan — materialize the key
      val item = v.asInstanceOf[UTF8String].toString
      val cur = buf.get(item)
      if (cur != null) cur(0) += 1L
      else if (buf.size < k) buf.put(item, Array(1L, 0L))
      else {
        // SpaceSaving replacement: new item inherits the evicted count
        // as both count floor and error bound
        val m = evictMin(buf)
        buf.put(item, Array(m + 1L, m))
      }
    }
    buf
  }

  override def merge(a: java.util.HashMap[String, Array[Long]],
      b: java.util.HashMap[String, Array[Long]]): java.util.HashMap[String, Array[Long]] = {
    val it = b.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = a.get(e.getKey)
      if (cur != null) { cur(0) += e.getValue()(0); cur(1) += e.getValue()(1) }
      else a.put(e.getKey, Array(e.getValue()(0), e.getValue()(1)))
    }
    while (a.size > k) evictMin(a)
    a
  }

  override def eval(buf: java.util.HashMap[String, Array[Long]]): Any = {
    // count desc, item asc: a deterministic, rank-ordered result
    val entries = new Array[(String, Long, Long)](buf.size)
    val it = buf.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      entries(i) = (e.getKey, e.getValue()(0), e.getValue()(1))
      i += 1
    }
    java.util.Arrays.sort(entries, new java.util.Comparator[(String, Long, Long)] {
      override def compare(x: (String, Long, Long), y: (String, Long, Long)): Int = {
        val c = java.lang.Long.compare(y._2, x._2)
        if (c != 0) c else x._1.compareTo(y._1)
      }
    })
    new GenericArrayData(entries.map { case (item, cnt, err) =>
      InternalRow(UTF8String.fromString(item), cnt, err)
    })
  }

  override def serialize(buf: java.util.HashMap[String, Array[Long]]): Array[Byte] = {
    var n = 4
    val it0 = buf.entrySet().iterator()
    while (it0.hasNext) {
      n += 4 + it0.next().getKey.getBytes(StandardCharsets.UTF_8).length + 16
    }
    val bb = ByteBuffer.allocate(n)
    bb.putInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val kb = e.getKey.getBytes(StandardCharsets.UTF_8)
      bb.putInt(kb.length); bb.put(kb)
      bb.putLong(e.getValue()(0)); bb.putLong(e.getValue()(1))
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Array[Long]] = {
    val buf = new java.util.HashMap[String, Array[Long]]()
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](bb.getInt()); bb.get(kb)
      buf.put(new String(kb, StandardCharsets.UTF_8), Array(bb.getLong(), bb.getLong()))
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_topk"
  override def children: Seq[Expression] = Seq(child, kExpr)

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SpaceSavingTopK =
    copy(child = newChildren(0), kExpr = newChildren(1))
}

object SpaceSavingTopK {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[SpaceSavingTopK].getName, "graft_topk")
}

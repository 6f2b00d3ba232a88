package graft.functions.expressions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block.BlockHelper
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership test over a 60-bit hash column —
  * `graft_bloom_contains(serialized_filter, h)`.
  *
  * The codegen replacement for the one Scala UDF the query battery had
  * left (decontam_bloom's `udf(h => bf.mightContainLong(h))`): a UDF puts
  * a serde boundary (InternalRow → Scala boxing → closure call) on every
  * corpus shingle of a corpus-sized scan and blocks WholeStageCodegen
  * around it; this expression compiles to a direct
  * `bloom.mightContainLong(h)` call inside the enclosing codegen stage
  * (CodegenSpec pins CODEGEN_ONLY).
  *
  * The first argument must be a FOLDABLE binary literal holding a
  * `org.apache.spark.util.sketch.BloomFilter` stream (`BloomFilter
  * .writeTo`'s format — the format `DataFrameStatFunctions.bloomFilter`
  * produces). It is deserialized ONCE per plan on the driver and shipped
  * to executors in the codegen reference array — the same
  * per-task-closure cost class as the literal itself, and the same
  * object-shipping shape Spark's own runtime-filter
  * `BloomFilterMightContain` uses. The filter side is bounded by
  * construction (an eval benchmark's distinct shingles — MiBs at 10⁶⁻⁷
  * entries), so the plan stays broadcast-sized at any corpus scale. */
case class BloomContains(bloomBytes: Expression, valueExpr: Expression)
    extends Expression {

  override def children: Seq[Expression] = Seq(bloomBytes, valueExpr)

  override def checkInputDataTypes(): TypeCheckResult =
    if (!bloomBytes.foldable)
      TypeCheckResult.TypeCheckFailure(
        "graft_bloom_contains requires a foldable binary literal filter")
    else if (bloomBytes.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"filter argument must be binary, got ${bloomBytes.dataType.sql}")
    else if (valueExpr.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"value argument must be bigint, got ${valueExpr.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = valueExpr.nullable
  override def prettyName: String = "graft_bloom_contains"

  @transient private lazy val bloom: BloomFilter = {
    val bytes = bloomBytes.eval(null).asInstanceOf[Array[Byte]]
    require(bytes != null, "graft_bloom_contains: filter literal is null")
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
  }

  override def eval(input: InternalRow): Any = {
    val v = valueExpr.eval(input)
    if (v == null) null else bloom.mightContainLong(v.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the DESERIALIZED filter rides the reference array — never the bytes
    // child, which must not be (re-)evaluated per row
    val ref = ctx.addReferenceObj("bloomFilter", bloom,
      classOf[BloomFilter].getName)
    val childGen = valueExpr.genCode(ctx)
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = ${childGen.isNull};
      boolean ${ev.value} = false;
      if (!${ev.isNull}) {
        ${ev.value} = $ref.mightContainLong(${childGen.value});
      }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomContains =
    copy(bloomBytes = newChildren(0), valueExpr = newChildren(1))
}

object BloomContains {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[BloomContains].getName, "graft_bloom_contains")

  /** Serialize a filter to the literal format the expression expects. */
  def serialize(bf: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }
}

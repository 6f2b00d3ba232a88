package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, MapData}
import org.apache.spark.sql.types.{BinaryType, DataType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.codec.MetadataCodec

/** T4 metadata decode as a native expression: canonical Avro
  * `map<string,bytes>` bytes → `map<string,binary>` column, key-sorted
  * (MetadataSerializer.java:100-113 in /root/reference
  * tech.kage.event.crypto — the sorted-on-decode contract).
  *
  * This sits on the replication hot path (every record's headers are built
  * from it — EventReplicatorWorker.java:219-230) and the subscribe decode
  * path; as a native expression it stays inside the enclosing
  * WholeStageCodegen stage instead of boxing through a per-row Scala UDF.
  * The Avro walk itself happens in the static [[DecodeMetadata.decode]]
  * helper — one static call per row, no closure capture, no
  * serialization of a udf wrapper per batch.
  *
  * NULL/empty bytes decode to the EMPTY map, never null (the storage layer
  * stores NULL for empty metadata — MetadataCodec's documented mapping), so
  * the expression is non-nullable: downstream header builds can
  * `map_entries(...)` without a null guard.
  */
case class DecodeMetadata(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_meta_decode requires binary input, got ${child.dataType.sql}")

  override def dataType: DataType =
    MapType(StringType, BinaryType, valueContainsNull = false)

  override def nullable: Boolean = false

  override def prettyName: String = "graft_meta_decode"

  override def eval(input: InternalRow): Any =
    DecodeMetadata.decode(child.eval(input).asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code =
      code"""
        ${childGen.code}
        $javaType ${ev.value} = graft.functions.expressions.DecodeMetadata.decode(
          ${childGen.isNull} ? null : ${childGen.value});
      """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): DecodeMetadata =
    copy(child = newChild)
}

object DecodeMetadata {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[DecodeMetadata].getName, "graft_meta_decode")

  /** Decode to Catalyst MapData, key-sorted (TreeMap iteration order). */
  def decode(bytes: Array[Byte]): MapData = {
    val m = MetadataCodec.decode(bytes)
    ArrayBasedMapData(
      m.keysIterator.map(k => UTF8String.fromString(k)).toArray[Any],
      m.valuesIterator.toArray[Any])
  }
}

package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType}

/** Schema id of a Confluent-framed payload: validates the magic byte and
  * reads the 4-byte big-endian id — the first step of every event decode
  * (T2), so it sits on the hottest path the engine has. As a native
  * expression it fuses into whole-stage codegen with zero allocation; the
  * UDF spelling (EventFunctions.confluentSchemaId) boxes the byte array
  * and breaks the codegen stage.
  *
  * Fail-fast on non-framed input, mirroring the reference's
  * SerializationException behavior (frame contract at /root/reference
  * tech.kage.event.postgres/.../PostgresEventStoreAutoConfiguration.java:56;
  * graft.codec.ConfluentAvro.unframe is the driver-side twin).
  */
case class ConfluentSchemaId(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_schema_id requires binary input, got ${child.dataType.sql}")

  override def dataType: DataType = IntegerType

  override def prettyName: String = "graft_schema_id"

  override protected def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    if (b.length < 5 || b(0) != 0)
      throw new IllegalArgumentException(s"not a Confluent-framed payload (len=${b.length})")
    ((b(1) & 0xff) << 24) | ((b(2) & 0xff) << 16) | ((b(3) & 0xff) << 8) | (b(4) & 0xff)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      // Janino misparses `($b[i] & 0xff) << n` as a cast ("... is not a
      // type"), so each byte goes through an int local before combining.
      val (b1, b2, b3, b4) = (ctx.freshName("sid1"), ctx.freshName("sid2"),
        ctx.freshName("sid3"), ctx.freshName("sid4"))
      s"""
         |if ($b.length < 5 || $b[0] != (byte) 0) {
         |  throw new IllegalArgumentException(
         |    "not a Confluent-framed payload (len=" + $b.length + ")");
         |}
         |int $b1 = $b[1] & 0xff;
         |int $b2 = $b[2] & 0xff;
         |int $b3 = $b[3] & 0xff;
         |int $b4 = $b[4] & 0xff;
         |${ev.value} = ($b1 << 24) | ($b2 << 16) | ($b3 << 8) | $b4;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ConfluentSchemaId =
    copy(child = newChild)
}

object ConfluentSchemaId {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[ConfluentSchemaId].getName, "graft_schema_id")
}

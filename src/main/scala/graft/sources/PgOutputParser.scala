package graft.sources

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8

/** Binary decoder for the pgoutput logical-replication messages the
  * reference's LsnUpdater consumes (S7/T13) — a faithful re-implementation
  * of /root/reference tech.kage.event.postgres.lsnupdater/.../
  * PgOutputMessageParser.java:88-260 against the PostgreSQL protocol docs.
  *
  * Decoded messages: BEGIN (finalLsn, commitTimestamp, xid), COMMIT (flags,
  * commitLsn, endLsn, timestamp), RELATION (id, namespace, name; column
  * metadata skipped), INSERT (relationId, first column as text → row id).
  * Unknown message types decode to [[PgMessage.Unknown]] (parser returns a
  * value, caller decides — the reference returns null and its caller
  * fail-fasts, F6/G8).
  *
  * In the Spark-native engine the CDC stage is unnecessary — the native log
  * allocates `(lsn, id)` at append (see graft.store.EventLog) — but the
  * parser keeps wire-level parity for deployments where PostgreSQL remains
  * the write side, and it is the unit under §5-category-8 tests.
  */
object PgOutputParser {

  sealed trait PgMessage
  object PgMessage {
    final case class Begin(finalLsn: Long, commitTimestampMicros: Long, xid: Int) extends PgMessage
    final case class Commit(flags: Byte, commitLsn: Long, endLsn: Long, timestampMicros: Long) extends PgMessage
    final case class Relation(id: Int, namespace: String, name: String) extends PgMessage
    final case class Insert(relationId: Int, rowId: Long) extends PgMessage
    final case class Unknown(messageType: Byte) extends PgMessage
  }

  import PgMessage._

  def parse(buf: ByteBuffer): PgMessage = (buf.get(): @annotation.switch) match {
    case 'B' => // BEGIN: finalLsn(8) commitTs(8) xid(4)
      Begin(buf.getLong, buf.getLong, buf.getInt)

    case 'C' => // COMMIT: flags(1) commitLsn(8) endLsn(8) ts(8)
      Commit(buf.get(), buf.getLong, buf.getLong, buf.getLong)

    case 'R' => // RELATION: id(4) ns(cstr) name(cstr) replident(1) ncols(2) [cols...]
      val id = buf.getInt
      val ns = cString(buf)
      val name = cString(buf)
      // column metadata intentionally ignored (PgOutputMessageParser.java
      // reads only id/ns/name; the updater keys on the relation id)
      Relation(id, ns, name)

    case 'I' => // INSERT: relId(4) 'N'(1) TupleData
      val relId = buf.getInt
      val newTuple = buf.get()
      if (newTuple != 'N')
        throw new IllegalStateException(s"unexpected INSERT tuple kind: ${newTuple.toChar}")
      val nCols = buf.getShort
      if (nCols < 1)
        throw new IllegalStateException("INSERT with no columns")
      // first column = bigserial id, sent as text ('t' format)
      val format = buf.get()
      if (format != 't')
        throw new IllegalStateException(s"unexpected column format: ${format.toChar}")
      val len = buf.getInt
      val bytes = new Array[Byte](len)
      buf.get(bytes)
      val text = new String(bytes, UTF_8)
      val rowId =
        try text.toLong
        catch {
          case _: NumberFormatException =>
            throw new IllegalStateException(s"non-numeric id column: $text")
        }
      Insert(relId, rowId)

    case other => Unknown(other)
  }

  def parse(bytes: Array[Byte]): PgMessage = parse(ByteBuffer.wrap(bytes))

  // UTF-8 decode of the byte run: byte-by-byte Byte.toChar would corrupt
  // any multi-byte identifier (e.g. a table named café_events)
  private def cString(buf: ByteBuffer): String = {
    val out = new java.io.ByteArrayOutputStream
    var b = buf.get()
    while (b != 0) { out.write(b.toInt); b = buf.get() }
    new String(out.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
  }
}

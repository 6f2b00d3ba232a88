package graft

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.PgOutputParser
import graft.sources.PgOutputParser.PgMessage._

/** Hand-crafted pgoutput buffers (§5 cat 8;
  * PgOutputMessageParserTest.java:62-210 analogs). */
class PgOutputParserSpec extends AnyFunSuite {

  private def begin(finalLsn: Long, ts: Long, xid: Int): Array[Byte] =
    ByteBuffer.allocate(21).put('B'.toByte).putLong(finalLsn).putLong(ts).putInt(xid).array()

  private def commit(flags: Byte, commitLsn: Long, endLsn: Long, ts: Long): Array[Byte] =
    ByteBuffer.allocate(26).put('C'.toByte).put(flags)
      .putLong(commitLsn).putLong(endLsn).putLong(ts).array()

  private def relation(id: Int, ns: String, name: String): Array[Byte] = {
    val nsB = ns.getBytes(UTF_8); val nameB = name.getBytes(UTF_8)
    ByteBuffer.allocate(5 + nsB.length + 1 + nameB.length + 1 + 3)
      .put('R'.toByte).putInt(id)
      .put(nsB).put(0.toByte).put(nameB).put(0.toByte)
      .put('d'.toByte).putShort(0.toShort).array()
  }

  private def insert(relId: Int, idText: String, tupleKind: Char = 'N',
      format: Char = 't'): Array[Byte] = {
    val idB = idText.getBytes(UTF_8)
    ByteBuffer.allocate(5 + 1 + 2 + 1 + 4 + idB.length)
      .put('I'.toByte).putInt(relId).put(tupleKind.toByte)
      .putShort(3.toShort).put(format.toByte).putInt(idB.length).put(idB).array()
  }

  test("BEGIN decodes finalLsn, commit timestamp, xid") {
    assert(PgOutputParser.parse(begin(0x160000002AL, 772396564225421L, 733)) ==
      Begin(0x160000002AL, 772396564225421L, 733))
  }

  test("COMMIT decodes flags, commitLsn, endLsn, ts") {
    assert(PgOutputParser.parse(commit(0, 0x17L, 0x18L, 99L)) ==
      Commit(0, 0x17L, 0x18L, 99L))
  }

  test("RELATION decodes id, namespace, name; column metadata ignored") {
    assert(PgOutputParser.parse(relation(16385, "events", "test_events")) ==
      Relation(16385, "events", "test_events"))
  }

  test("INSERT decodes relation id and first text column as row id") {
    assert(PgOutputParser.parse(insert(16385, "12345")) == Insert(16385, 12345L))
  }

  test("unknown message types decode to Unknown (caller fail-fasts, F6)") {
    assert(PgOutputParser.parse(Array[Byte]('U'.toByte, 1, 2)) == Unknown('U'.toByte))
  }

  test("malformed INSERT fails fast: wrong tuple kind / format / id") {
    intercept[IllegalStateException](PgOutputParser.parse(insert(1, "5", tupleKind = 'O')))
    intercept[IllegalStateException](PgOutputParser.parse(insert(1, "5", format = 'b')))
    intercept[IllegalStateException](PgOutputParser.parse(insert(1, "abc")))
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.PgOutputParser
import graft.sources.PgOutputParser.PgMessage._

/** Decodes REAL pgoutput frames emitted by a live PostgreSQL 15 — captured
  * once by `tools/pg_local_conformance.sh --capture` via
  * pg_logical_slot_get_binary_changes (proto_version 1) and committed as
  * src/test/resources/pgoutput_live/frames.txt — so the parser's coverage
  * is pinned against genuine wire bytes, not only the hand-crafted buffers
  * in PgOutputParserSpec. Generating operations (see the fixture header):
  * txn1 INSERT ids 1,2,3 into events.pgconf_live; txn2 INSERT id 4;
  * txn3 UPDATE id 1; txn4 DELETE id 2.
  *
  * Everything asserted here is deterministic given those operations: the
  * message-type sequence, the relation identity, the bigserial row ids,
  * the begin/commit LSN+timestamp pairing, and the Unknown fallback for
  * the U/D messages the LsnUpdater path doesn't consume (the caller
  * fail-fasts on Unknown — reference PgOutputMessageParser.java returns
  * null there, F6/G8).
  */
class PgOutputLiveFixtureSpec extends AnyFunSuite {

  private lazy val frames: Seq[Array[Byte]] = {
    val in = getClass.getResourceAsStream("/pgoutput_live/frames.txt")
    require(in != null, "missing fixture /pgoutput_live/frames.txt")
    val lines = scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().filterNot(_.startsWith("#")).filter(_.nonEmpty).toVector
    lines.map(l => l.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray)
  }

  private lazy val msgs = frames.map(PgOutputParser.parse)

  test("real capture decodes to the expected message-type sequence") {
    val kinds = msgs.map {
      case _: Begin => 'B'
      case _: Commit => 'C'
      case _: Relation => 'R'
      case _: Insert => 'I'
      case Unknown(t) => t.toChar
    }.mkString
    // txn1: B R I I I C; txn2: B I C; txn3 (update): B U C; txn4 (delete): B D C
    assert(kinds == "BRIIICBICBUCBDC", s"got $kinds")
  }

  test("relation message carries the publication table's identity") {
    val rel = msgs.collect { case r: Relation => r }
    assert(rel.size == 1) // one slot session -> relation sent once
    assert(rel.head.namespace == "events" && rel.head.name == "pgconf_live")
  }

  test("inserts decode the bigserial first column as the row id") {
    val ins = msgs.collect { case i: Insert => i }
    assert(ins.map(_.rowId) == Seq(1L, 2L, 3L, 4L))
    val relId = msgs.collect { case r: Relation => r.id }.head
    assert(ins.forall(_.relationId == relId))
  }

  test("begin/commit pair per transaction: finalLsn == commitLsn, shared timestamp, xids increase") {
    val begins = msgs.collect { case b: Begin => b }
    val commits = msgs.collect { case c: Commit => c }
    assert(begins.size == 4 && commits.size == 4)
    begins.zip(commits).foreach { case (b, c) =>
      assert(b.finalLsn == c.commitLsn, s"$b vs $c")
      assert(b.commitTimestampMicros == c.timestampMicros)
      assert(c.endLsn > c.commitLsn)
      assert(c.flags == 0)
    }
    // commit order is WAL order: LSNs and xids strictly increase
    assert(commits.map(_.commitLsn) == commits.map(_.commitLsn).sorted)
    assert(begins.map(_.xid).sliding(2).forall { case Seq(a, b) => a < b })
  }

  test("update/delete surface as Unknown with the wire type byte (caller fail-fasts)") {
    val unknown = msgs.collect { case Unknown(t) => t.toChar }
    assert(unknown == Seq('U', 'D'))
  }
}

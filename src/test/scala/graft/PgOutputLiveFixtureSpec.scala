package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.PgOutputParser
import graft.sources.PgOutputParser.PgMessage
import graft.sources.PgOutputParser.PgMessage._

/** Decodes REAL pgoutput frames emitted by a live PostgreSQL 15 — captured
  * once by `tools/pg_local_conformance.sh --capture` via
  * pg_logical_slot_get_binary_changes (proto_version 1) and committed as
  * src/test/resources/pgoutput_live/frames.txt — so the parser's coverage
  * is pinned against genuine wire bytes, not only the hand-crafted buffers
  * in PgOutputParserSpec. Generating operations (see the fixture header):
  * txn1 INSERT ids 1,2,3 into events.pgconf_live; txn2 INSERT id 4;
  * txn3 UPDATE id 1; txn4 DELETE id 2; txn5 TRUNCATE pgconf_live;
  * txn6 INSERT 'alpha' into events.pgconf_textpk (text primary key).
  *
  * Everything asserted is deterministic given those operations: the
  * message-type sequence (PostgreSQL re-sends RELATION ahead of the
  * truncate and for the second table), relation identities, bigserial row
  * ids, begin/commit LSN+timestamp pairing, the Unknown fallback for
  * U/D/T messages the LsnUpdater path doesn't consume (reference
  * PgOutputMessageParser.java returns null there; caller fail-fasts,
  * F6/G8), and the non-numeric-id fail-fast on a REAL frame whose first
  * column is a text key rather than the events-schema bigserial.
  */
class PgOutputLiveFixtureSpec extends AnyFunSuite {

  private lazy val frames: Seq[Array[Byte]] = {
    val in = getClass.getResourceAsStream("/pgoutput_live/frames.txt")
    require(in != null, "missing fixture /pgoutput_live/frames.txt")
    val lines = scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().filterNot(_.startsWith("#")).filter(_.nonEmpty).toVector
    lines.map(l => l.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray)
  }

  /** Parse results; the pgconf_textpk INSERT throws by contract. */
  private lazy val msgs: Seq[Either[Throwable, PgMessage]] =
    frames.map { f =>
      try Right(PgOutputParser.parse(f))
      catch { case e: IllegalStateException => Left(e) }
    }

  private def rights: Seq[PgMessage] = msgs.collect { case Right(m) => m }

  test("real capture decodes to the expected message-type sequence") {
    val kinds = msgs.map {
      case Right(_: Begin) => 'B'
      case Right(_: Commit) => 'C'
      case Right(_: Relation) => 'R'
      case Right(_: Insert) => 'I'
      case Right(Unknown(t)) => t.toChar
      case Left(_) => 'X' // the text-PK insert frame — fail-fast below
    }.mkString
    // txn1 BRIIIC; txn2 BIC; txn3 (update) BUC; txn4 (delete) BDC;
    // txn5 (truncate) BRTC — PG re-sends RELATION ahead of the truncate;
    // txn6 BRXC — new relation, then the non-numeric-id insert
    assert(kinds == "BRIIICBICBUCBDCBRTCBRXC", s"got $kinds")
  }

  test("relation messages carry the publication tables' identities") {
    val rel = rights.collect { case r: Relation => r }
    assert(rel.size == 3)
    assert(rel.take(2).forall(r => r.namespace == "events" && r.name == "pgconf_live"))
    assert(rel(0).id == rel(1).id) // same table re-announced before truncate
    assert(rel(2).namespace == "events" && rel(2).name == "pgconf_textpk")
    assert(rel(2).id != rel(0).id)
  }

  test("inserts decode the bigserial first column as the row id") {
    val ins = rights.collect { case i: Insert => i }
    assert(ins.map(_.rowId) == Seq(1L, 2L, 3L, 4L))
    val liveRelId = rights.collect { case r: Relation => r.id }.head
    assert(ins.forall(_.relationId == liveRelId))
  }

  test("begin/commit pair per transaction: finalLsn == commitLsn, shared timestamp, xids increase") {
    val begins = rights.collect { case b: Begin => b }
    val commits = rights.collect { case c: Commit => c }
    assert(begins.size == 6 && commits.size == 6)
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

  test("update/delete/truncate surface as Unknown with the wire type byte (caller fail-fasts)") {
    val unknown = rights.collect { case Unknown(t) => t.toChar }
    assert(unknown == Seq('U', 'D', 'T'))
  }

  test("a REAL insert whose first column is not the bigserial id fail-fasts") {
    val fails = msgs.collect { case Left(e) => e }
    assert(fails.size == 1)
    assert(fails.head.getMessage.contains("non-numeric id column: alpha"),
      fails.head.getMessage)
  }
}

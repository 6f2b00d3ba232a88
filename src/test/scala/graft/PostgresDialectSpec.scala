package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.codec.Cursor
import graft.model.KeyType
import graft.sources.PostgresDialect

/** SQL text pinned to the reference's statement shapes. */
class PostgresDialectSpec extends AnyFunSuite {

  test("insert variants (PostgresEventStore.java:68-75)") {
    assert(PostgresDialect.insertSql("test_events", withMetadata = false) ==
      "INSERT INTO events.test_events (key, data, timestamp) VALUES ($1, $2, $3)")
    assert(PostgresDialect.insertSql("test_events", withMetadata = true) ==
      "INSERT INTO events.test_events (key, data, metadata, timestamp) VALUES ($1, $2, $3, $4)")
  }

  test("keyset scan with row-value cursor (EventReplicatorWorker.java:66-72)") {
    assert(PostgresDialect.keysetScanSql("t_events", Cursor(0x17L, 23), 100) ==
      "SELECT * FROM events.t_events WHERE lsn IS NOT NULL " +
        "AND (lsn, id) > ('0/17'::pg_lsn, 23) ORDER BY lsn, id LIMIT 100")
  }

  test("expanded scan for engines without row-value comparison (SURVEY §4)") {
    val sql = PostgresDialect.keysetScanExpandedSql("t_events", Cursor(0x17L, 23), 50)
    assert(sql.contains("lsn > '0/17'::pg_lsn OR (lsn = '0/17'::pg_lsn AND id > 23)"))
    assert(sql.endsWith("ORDER BY lsn, id LIMIT 50"))
  }

  test("lag gauge (EventReplicatorWorker.java:77)") {
    assert(PostgresDialect.lagSql("t_events", Cursor(0x16L << 32 | 0xB374D848L, 0)) ==
      "SELECT MAX(lsn) - '16/B374D848'::pg_lsn FROM events.t_events WHERE lsn IS NOT NULL")
  }

  test("offset statements quote reserved identifiers (topic_offsets.sql)") {
    assert(PostgresDialect.selectOffsetSql ==
      """SELECT "offset" FROM events.topic_offsets WHERE topic = $1 AND "partition" = $2""")
    assert(PostgresDialect.insertOffsetSql ==
      """INSERT INTO events.topic_offsets (topic, "partition", "offset") VALUES ($1, $2, -1)""")
    assert(PostgresDialect.updateOffsetSql ==
      """UPDATE events.topic_offsets SET "offset" = $3 WHERE topic = $1 AND "partition" = $2""")
  }

  test("event table DDL matches events_schema.sql with key-type template") {
    val ddl = PostgresDialect.createTableDdl("test_events", KeyType.Uuid)
    assert(ddl.contains("id bigserial PRIMARY KEY"))
    assert(ddl.contains("key uuid NOT NULL"))
    assert(ddl.contains("lsn pg_lsn"))
    assert(ddl.contains("CREATE INDEX test_events_lsn_idx ON events.test_events (lsn)"))
    assert(PostgresDialect.createTableDdl("t_events", KeyType.Bytea).contains("key bytea NOT NULL"))
  }
}

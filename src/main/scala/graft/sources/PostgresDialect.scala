package graft.sources

import graft.codec.Cursor
import graft.model.KeyType

/** SQL shapes for running the store against a real PostgreSQL instance —
  * the verbatim statement forms of the reference, kept as a dialect object
  * so a JDBC-backed deployment (spark.read.jdbc / foreachBatch JDBC txn)
  * issues byte-identical SQL. No Postgres ships in this container, so
  * tests pin the generated text against the reference's quoted statements.
  *
  * Sources (all /root/reference):
  *  - insert: tech.kage.event.postgres/.../PostgresEventStore.java:68-75
  *  - keyset scan: tech.kage.event.replicator/.../EventReplicatorWorker.java:66-72
  *  - lag: EventReplicatorWorker.java:77
  *  - offsets: tech.kage.event.kafka.reactor/.../ReactorKafkaEventStore.java:89-104
  *  - topic discovery: tech.kage.event.replicator/.../EventReplicator.java:68
  *  - DDL: tech.kage.event.postgres/src/main/sql/events/events_schema.sql
  */
object PostgresDialect {
  val Schema = "events"

  /** S1 insert, two variants (with/without metadata column). */
  def insertSql(topic: String, withMetadata: Boolean): String =
    if (withMetadata)
      s"INSERT INTO $Schema.$topic (key, data, metadata, timestamp) VALUES ($$1, $$2, $$3, $$4)"
    else
      s"INSERT INTO $Schema.$topic (key, data, timestamp) VALUES ($$1, $$2, $$3)"

  /** S4 keyset scan: row-value comparison + LIMIT (the OR-expansion form is
    * what pushes through JDBC sources that lack row-value support). */
  def keysetScanSql(topic: String, cursor: Cursor, limit: Int): String =
    s"SELECT * FROM $Schema.$topic WHERE lsn IS NOT NULL " +
      s"AND (lsn, id) > ('${graft.codec.LsnCodec.format(cursor.lsn)}'::pg_lsn, ${cursor.id}) " +
      s"ORDER BY lsn, id LIMIT $limit"

  /** S4 scan, row-value expanded for engines without row-value comparison. */
  def keysetScanExpandedSql(topic: String, cursor: Cursor, limit: Int): String = {
    val lsn = s"'${graft.codec.LsnCodec.format(cursor.lsn)}'::pg_lsn"
    s"SELECT * FROM $Schema.$topic WHERE lsn IS NOT NULL " +
      s"AND (lsn > $lsn OR (lsn = $lsn AND id > ${cursor.id})) " +
      s"ORDER BY lsn, id LIMIT $limit"
  }

  /** A1 lag: WAL byte distance from cursor to head. */
  def lagSql(topic: String, cursor: Cursor): String =
    s"SELECT MAX(lsn) - '${graft.codec.LsnCodec.format(cursor.lsn)}'::pg_lsn " +
      s"FROM $Schema.$topic WHERE lsn IS NOT NULL"

  /** S10 offset lookup / bootstrap / update. */
  val selectOffsetSql: String =
    s"""SELECT "offset" FROM $Schema.topic_offsets WHERE topic = $$1 AND "partition" = $$2"""
  val insertOffsetSql: String =
    s"""INSERT INTO $Schema.topic_offsets (topic, "partition", "offset") VALUES ($$1, $$2, -1)"""
  val updateOffsetSql: String =
    s"""UPDATE $Schema.topic_offsets SET "offset" = $$3 WHERE topic = $$1 AND "partition" = $$2"""

  /** S8 topic discovery (suffix filter applied by the caller, F4). */
  val listTablesSql: String =
    s"SELECT tablename FROM pg_tables WHERE schemaname = '$Schema'"

  /** Event-table DDL (events_schema.sql:1-13), key type parameterized as in
    * the reference's test template (FIXTURES.md §1). */
  def createTableDdl(topic: String, keyType: KeyType): String = {
    val kt = keyType.name
    s"""CREATE TABLE $Schema.$topic (
       |    id bigserial PRIMARY KEY,
       |    key $kt NOT NULL,
       |    data bytea NOT NULL,
       |    metadata bytea,
       |    timestamp timestamp with time zone NOT NULL,
       |    lsn pg_lsn
       |);
       |CREATE INDEX ${topic}_lsn_idx ON $Schema.$topic (lsn);""".stripMargin
  }
}

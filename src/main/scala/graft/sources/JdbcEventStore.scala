package graft.sources

import java.sql.{Connection, DriverManager}
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.codec.Cursor

/** JDBC-backed deployment mode of the store: the reference's primary
  * topology is Spark talking to a live PostgreSQL events schema
  * (/root/reference tech.kage.event.postgres/.../PostgresEventStore.java:68-142
  * for S1 writes; tech.kage.event.replicator/.../EventReplicatorWorker.java:66-72
  * for the S4 keyset scan; topic_offsets DDL for S10). [[PostgresDialect]]
  * pins the verbatim PG statement text; this class executes the same
  * logical operations through Spark's JDBC source against ANY JDBC engine
  * (the integration spec drives it against embedded Derby — the closest
  * thing to a live database this container has).
  *
  * Scan shape (S4): the cursor predicate is declared as the row-value
  * comparison `struct(lsn, id) > struct(cursor)` — identical to the native
  * EventLog scan — and [[graft.plans.RowValueCursorBound]] widens it with
  * the scalar bounds `lsn >= c.lsn` and the exact OR-expansion, both of
  * which Spark's JDBC source compiles into the remote WHERE clause
  * (JDBCRDD.compileFilter handles Or/And of range predicates). The
  * database then serves the scan from its lsn index instead of shipping
  * the table — the same pushdown the reference gets from its hand-written
  * `(lsn, id) > ($1, $2)` SQL.
  *
  * Write shape (S1): executors append partitions in parallel through
  * `df.write.jdbc`; the id column is omitted so the database's identity
  * sequence assigns it (bigserial in PG, GENERATED ALWAYS AS IDENTITY in
  * Derby) — id/commit-order assignment stays transactional in the
  * database, exactly like the reference.
  *
  * Offset bookkeeping (S10) is single-row control state, executed
  * driver-side on a plain JDBC connection (the reference does the same
  * from its worker loop; shipping one-row updates through an executor
  * would buy nothing).
  */
final class JdbcEventStore(
    url: String,
    spark: SparkSession,
    props: Properties = new Properties) {

  import JdbcEventStore.OffsetsTable

  private def tableRef(topic: String): String =
    s"${PostgresDialect.Schema}.$topic"

  /** S1: append events (id assigned by the database's identity column). */
  def append(topic: String, batch: DataFrame): Unit =
    batch.select("key", "data", "metadata", "timestamp", "lsn")
      .write.mode("append").jdbc(url, tableRef(topic), props)

  /** S4: keyset scan after `cursor`, `(lsn, id)` order, limit-bounded.
    * The row-value predicate is expanded to pushable scalar bounds by
    * RowValueCursorBound, so the WHERE reaches the remote database. */
  def scan(topic: String, cursor: Cursor, limit: Int): DataFrame = {
    graft.GraftExtensions.register(spark)
    spark.read.jdbc(url, tableRef(topic), props)
      .filter(col("lsn").isNotNull &&
        struct(col("lsn"), col("id")) > struct(lit(cursor.lsn), lit(cursor.id)))
      .orderBy(col("lsn"), col("id"))
      .limit(limit)
  }

  /** A1: lag from cursor to head (numeric lsn distance; PG's pg_lsn `-`
    * is byte distance — same gauge, dialect-numeric). */
  def lag(topic: String, cursor: Cursor): Long = {
    val r = spark.read.jdbc(url, tableRef(topic), props)
      .filter(col("lsn").isNotNull)
      .agg(max(col("lsn"))).collect()(0)
    if (r.isNullAt(0)) 0L else math.max(0L, r.getLong(0) - cursor.lsn)
  }

  // ---- S10: offset point ops (driver-side control state) ----
  // JDBC `?` parameter twins of PostgresDialect.{select,insert,update}OffsetSql
  // (the $n forms are PG wire syntax; text parity is pinned in
  // PostgresDialectSpec, execution is exercised here).

  private def withConn[A](f: Connection => A): A = {
    val c = DriverManager.getConnection(url, props)
    try f(c) finally c.close()
  }

  /** Offset lookup; bootstraps the row at -1 when absent (S9/S10 init —
    * ReactorKafkaEventStore.java:89-104's select-or-insert). */
  def offsetFor(topic: String, partition: Int): Long = withConn { c =>
    val sel = c.prepareStatement(
      s"""SELECT "offset" FROM $OffsetsTable WHERE topic = ? AND "partition" = ?""")
    sel.setString(1, topic); sel.setInt(2, partition)
    val rs = sel.executeQuery()
    if (rs.next()) rs.getLong(1)
    else {
      val ins = c.prepareStatement(
        s"""INSERT INTO $OffsetsTable (topic, "partition", "offset") VALUES (?, ?, -1)""")
      ins.setString(1, topic); ins.setInt(2, partition)
      try { ins.executeUpdate(); -1L }
      catch {
        // two consumers bootstrapping the same partition race the insert;
        // the loser re-reads the winner's row (SQLState 23xxx = integrity
        // violation — the reference's select-or-insert runs in one txn)
        case e: java.sql.SQLException
            if Option(e.getSQLState).exists(_.startsWith("23")) =>
          val rs2 = sel.executeQuery()
          require(rs2.next(), s"offset row vanished after duplicate insert: $topic/$partition")
          rs2.getLong(1)
      }
    }
  }

  /** Offset commit (S10 point update). */
  def commitOffset(topic: String, partition: Int, offset: Long): Unit = withConn { c =>
    val upd = c.prepareStatement(
      s"""UPDATE $OffsetsTable SET "offset" = ? WHERE topic = ? AND "partition" = ?""")
    upd.setLong(1, offset); upd.setString(2, topic); upd.setInt(3, partition)
    require(upd.executeUpdate() == 1, s"no offset row for $topic/$partition — call offsetFor first")
  }
}

object JdbcEventStore {
  val OffsetsTable: String = s"${PostgresDialect.Schema}.topic_offsets"
}

package graft.tools

import java.nio.file.{Files, Paths}

import graft.codec.{Cursor, LsnCodec}
import graft.model.KeyType
import graft.sources.{JdbcLockManager, PostgresDialect}

/** Writes the PG dialect surface (PostgresDialect + JdbcLockManager SQL,
  * reference-verbatim) to a directory of .sql/.txt files so the psql-driven
  * local conformance harness (tools/pg_local_conformance.sh) executes the
  * EXACT statement text the JDBC deployment issues — the harness never
  * hand-copies SQL, so it cannot drift from the dialect object.
  *
  * Why a psql harness exists at all: tools/PgConformance is the real
  * runner (pure JDBC), but this container ships a PostgreSQL 15 server
  * binary and NO PostgreSQL JDBC driver — the opposite blockage the
  * runner was written for. The dump + psql route executes the same seven
  * scenarios (DDL, bigserial density, keyset row-value ≡ OR-expanded
  * mid-lsn resume, lag byte distance, pg_tables discovery, advisory-lock
  * contention/release, offsets bootstrap/update) against a genuinely
  * live PG. Parameterized statements run via PREPARE/EXECUTE, which
  * preserves the $n text verbatim; the lone JDBC `?` placeholder
  * (AcquireLockSql) is dumped alongside its $1 spelling, the same
  * rewrite the JDBC driver itself performs on the wire.
  *
  * Usage: `runMain graft.tools.PgSqlDump [outDir]` (default target/pgconf/sql).
  */
object PgSqlDump {
  /** Fixture topic (table name) shared with the harness. */
  val Topic = "pgconf_events"

  def main(args: Array[String]): Unit = {
    val out = Paths.get(args.headOption.getOrElse("target/pgconf/sql"))
    Files.createDirectories(out)
    def put(name: String, text: String): Unit =
      Files.writeString(out.resolve(name), text + "\n")

    put("ddl.sql", PostgresDialect.createTableDdl(Topic, KeyType.Bytea))
    put("insert.sql", PostgresDialect.insertSql(Topic, withMetadata = false))
    put("insert_meta.sql", PostgresDialect.insertSql(Topic, withMetadata = true))
    // scan fixtures: resume AFTER (0/10, 2) over ids 1-3 @ 0/10 and 4-6 @ 0/20
    val cur = Cursor(LsnCodec.parse("0/10"), 2)
    put("keyset_scan.sql", PostgresDialect.keysetScanSql(Topic, cur, 100))
    put("keyset_scan_expanded.sql",
      PostgresDialect.keysetScanExpandedSql(Topic, cur, 100))
    put("lag.sql", PostgresDialect.lagSql(Topic, cur))
    put("list_tables.sql", PostgresDialect.listTablesSql)
    put("offset_select.sql", PostgresDialect.selectOffsetSql)
    put("offset_insert.sql", PostgresDialect.insertOffsetSql)
    put("offset_update.sql", PostgresDialect.updateOffsetSql)
    put("advisory_lock.sql", JdbcLockManager.AcquireLockSql)
    put("advisory_lock_psql.sql",
      JdbcLockManager.AcquireLockSql.replace("?", "$1"))
    put("lock_key.txt", JdbcLockManager.lockKey(JdbcLockManager.LockName).toString)
    put("schema.txt", PostgresDialect.Schema)
    println(s"PgSqlDump: dialect surface written to $out")
  }
}

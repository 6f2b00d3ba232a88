package graft.sources

import java.sql.{Connection, DriverManager}
import java.util.Properties

/** Single-active-instance boot guard for the JDBC deployment mode (G6).
  *
  * The reference replicator refuses to start a second instance via a
  * PostgreSQL session-scoped advisory lock
  * (/root/reference tech.kage.event.replicator/.../LockManager.java:45-84):
  * `SELECT pg_try_advisory_lock(?)` bound with a 64-bit key packing the
  * lock name's `String.hashCode` into the high 32 bits and its length into
  * the low 32.
  *
  * The lock is SESSION-scoped in PG — it lives exactly as long as the
  * acquiring connection — so this class pins ONE dedicated connection for
  * its lifetime: a crash kills the connection and the lock self-releases,
  * which is what makes the guard safe without any lease/heartbeat protocol.
  * The native-log twin is [[graft.store.LockFile]] (OS file lock, same
  * crash-release property); this is its shape for the database topology.
  *
  * `acquireSql` parameterizes the statement spelling only because embedded
  * Derby (the container's stand-in engine, JdbcIntegrationSpec) requires
  * `VALUES f(?)` where PG accepts a FROM-less `SELECT f(?)`; the default is
  * the reference's verbatim text, pinned in PostgresDialectSpec.
  */
final class JdbcLockManager(
    url: String,
    props: Properties = new Properties,
    acquireSql: String = JdbcLockManager.AcquireLockSql) extends AutoCloseable {

  private var conn: Option[Connection] = None

  /** Try to become the active instance; `false` ⇒ another holder is live.
    * One-shot: the lock rides this manager's pinned connection. */
  def acquireLock(): Boolean = synchronized {
    require(conn.isEmpty, "acquireLock already called on this manager")
    val c = DriverManager.getConnection(url, props)
    val ok =
      try {
        val st = c.prepareStatement(acquireSql)
        st.setLong(1, JdbcLockManager.lockKey(JdbcLockManager.LockName))
        val rs = st.executeQuery()
        rs.next() && rs.getBoolean(1)
      } catch { case e: Throwable => c.close(); throw e }
    if (ok) conn = Some(c) else c.close()
    ok
  }

  /** True while this manager holds the lock (its session is pinned). */
  def isHeld: Boolean = synchronized { conn.isDefined }

  /** Release by closing the pinned session — PG frees a session's advisory
    * locks on disconnect, so close IS the unlock. */
  override def close(): Unit = synchronized {
    conn.foreach(_.close())
    conn = None
  }
}

object JdbcLockManager {
  /** Acquire statement, reference-verbatim (LockManager.java:46). */
  val AcquireLockSql = "SELECT pg_try_advisory_lock(?)"

  /** Well-known lock name (LockManager.java:51). */
  val LockName = "_event_replicator_lock"

  /** 64-bit advisory key: `hashCode << 32 | length` of the lock string
    * (LockManager.java:76-84) — the exact packing, so a graft instance and
    * a reference instance pointed at the same database CONTEND for the same
    * lock instead of both booting. */
  def lockKey(lock: String): Long =
    (lock.hashCode.toLong << 32) | (lock.length.toLong & 0xFFFFFFFFL)
}

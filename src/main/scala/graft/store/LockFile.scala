package graft.store

import java.nio.channels.{FileChannel, FileLock, OverlappingFileLockException}
import java.nio.file.{Path, StandardOpenOption}

/** Cross-process single-writer guard — the advisory-lock analog of the
  * reference's LockManager/LockMonitor (/root/reference
  * tech.kage.event.replicator/.../LockManager.java:45-84, G6): exactly one
  * replicator/writer instance per store; a second instance must fail fast
  * rather than corrupt the monotone (lsn,id) sequence.
  *
  * `pg_try_advisory_lock` becomes an OS file lock on `<root>/.graft_lock`;
  * [[stillHeld]] is the LockMonitor re-check (the reference polls and
  * `System.exit(1)`s on loss — callers do the same, G8 fail-fast).
  */
final class LockFile private (channel: FileChannel, lock: FileLock) extends AutoCloseable {
  def stillHeld: Boolean = lock.isValid && channel.isOpen

  override def close(): Unit = {
    if (lock.isValid) lock.release()
    if (channel.isOpen) channel.close()
  }
}

object LockFile {
  /** Try to acquire; None if another process (or this one) holds it. */
  def tryAcquire(path: Path): Option[LockFile] = {
    val ch = FileChannel.open(path,
      StandardOpenOption.CREATE, StandardOpenOption.WRITE)
    try {
      val l = ch.tryLock()
      if (l == null) { ch.close(); None }
      else Some(new LockFile(ch, l))
    } catch {
      case _: OverlappingFileLockException => ch.close(); None
      // locking unsupported/failing (NFS without lockd, SMB): close the
      // channel before propagating — leaking the CREATE|WRITE handle per
      // boot attempt would also block cleanup on handle-pinning platforms
      case e: Throwable => ch.close(); throw e
    }
  }

  /** Acquire or die — the reference's boot behavior
    * (EventReplicator.java:145-149). */
  def acquireOrFail(path: Path): LockFile =
    tryAcquire(path).getOrElse(
      throw new IllegalStateException(s"another instance holds the lock: $path"))
}

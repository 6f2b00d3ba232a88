package graft.codec

/** LSN text codec: 64-bit WAL position ↔ PostgreSQL `pg_lsn` text form
  * `"%X/%X"` of the high/low 32 bits — /root/reference
  * tech.kage.event.postgres.lsnupdater/.../LsnUpdater.java:321-323.
  */
object LsnCodec {
  def format(lsn: Long): String =
    f"${(lsn >>> 32).toInt & 0xFFFFFFFFL}%X/${lsn.toInt & 0xFFFFFFFFL}%X"

  def parse(text: String): Long = {
    val parts = text.split("/", -1)
    require(parts.length == 2, s"malformed pg_lsn: $text")
    val hi = java.lang.Long.parseLong(parts(0), 16)
    val lo = java.lang.Long.parseLong(parts(1), 16)
    // pg_lsn halves are 32-bit; out-of-range hex would otherwise be
    // silently folded by the shift/OR into a wrong-but-valid position
    require((hi & 0xFFFFFFFFL) == hi && (lo & 0xFFFFFFFFL) == lo,
      s"pg_lsn half out of 32-bit range: $text")
    (hi << 32) | lo
  }
}

/** Replication cursor `(lsn, id)` ↔ `"<lsn>:<id>"`, strict parse.
  *
  * The two-component row-value cursor (not lsn alone) is what makes resume
  * correct when several rows share one commit LSN — /root/reference
  * tech.kage.event.replicator/.../EventReplicatorWorker.java:53-59, 262-297.
  */
final case class Cursor(lsn: Long, id: Long) {
  def encoded: String = s"$lsn:$id"
}

object Cursor {
  val zero: Cursor = Cursor(0L, 0L)

  def parse(text: String): Cursor = {
    val parts = text.split(":", -1)
    if (parts.length != 2)
      throw new IllegalStateException(s"malformed cursor: $text")
    try Cursor(parts(0).toLong, parts(1).toLong)
    catch {
      case _: NumberFormatException =>
        throw new IllegalStateException(s"malformed cursor: $text")
    }
  }
}

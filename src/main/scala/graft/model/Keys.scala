package graft.model

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8
import java.util.UUID

/** Per-topic key types and reversible binary projections.
  *
  * The reference exercises four SQL key types (uuid/text/integer/bytea —
  * test matrix in /root/reference tech.kage.event.postgres/src/test, e.g.
  * UUIDKeyPostgresEventStoreIT.java:48-50). Our native log stores every key
  * as canonical binary with a topic-level [[KeyType]] tag; these codecs are
  * bijective so the typed key is recoverable (SURVEY §7.4 #4).
  */
sealed abstract class KeyType(val name: String) {
  def toBytes(key: Any): Array[Byte]
  def fromBytes(bytes: Array[Byte]): Any
}

object KeyType {
  case object Uuid extends KeyType("uuid") {
    def toBytes(key: Any): Array[Byte] = {
      val u = key.asInstanceOf[UUID]
      ByteBuffer.allocate(16).putLong(u.getMostSignificantBits).putLong(u.getLeastSignificantBits).array()
    }
    def fromBytes(bytes: Array[Byte]): Any = {
      val bb = ByteBuffer.wrap(bytes)
      new UUID(bb.getLong, bb.getLong)
    }
  }

  case object Text extends KeyType("text") {
    def toBytes(key: Any): Array[Byte] = key.asInstanceOf[String].getBytes(UTF_8)
    def fromBytes(bytes: Array[Byte]): Any = new String(bytes, UTF_8)
  }

  case object Integer extends KeyType("integer") {
    def toBytes(key: Any): Array[Byte] =
      ByteBuffer.allocate(4).putInt(key.asInstanceOf[Int]).array()
    def fromBytes(bytes: Array[Byte]): Any = ByteBuffer.wrap(bytes).getInt
  }

  case object Bytea extends KeyType("bytea") {
    def toBytes(key: Any): Array[Byte] = key.asInstanceOf[Array[Byte]]
    def fromBytes(bytes: Array[Byte]): Any = bytes
  }

  val all: Seq[KeyType] = Seq(Uuid, Text, Integer, Bytea)

  def apply(name: String): KeyType =
    all.find(_.name == name).getOrElse(throw new IllegalArgumentException(s"unknown key type: $name"))

  /** Transport projection (T10): the replicator sends `byte[]` keys as-is,
    * anything else as UTF-8 of `toString`
    * (EventReplicatorWorker.java:211-217). */
  def transportBytes(key: Any): Array[Byte] = key match {
    case b: Array[Byte] => b
    case other => other.toString.getBytes(UTF_8)
  }
}

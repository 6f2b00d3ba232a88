package graft.model

import java.time.Instant
import java.time.temporal.ChronoUnit

/** The immutable event — the engine's fundamental abstraction.
  *
  * Mirrors the reference's `Event<K, V>` record of
  * (key, payload, timestamp, metadata) — see /root/reference
  * tech.kage.event/src/main/java/tech/kage/event/Event.java:49 — re-expressed
  * for Spark: the key is canonical binary plus a per-topic key-type tag (the
  * reference exercises uuid/text/integer/bytea keys), the payload is the
  * Confluent-framed Avro bytes, and metadata values are raw bytes.
  *
  * Timestamps are truncated to milliseconds in the canonical constructor
  * (Event.java:69) — [[Event.apply]] preserves that equality semantic.
  */
final case class Event(
    key: Array[Byte],
    payload: Array[Byte],
    timestamp: Instant,
    metadata: Map[String, Array[Byte]]) {

  override def equals(other: Any): Boolean = other match {
    case e: Event =>
      java.util.Arrays.equals(key, e.key) &&
        java.util.Arrays.equals(payload, e.payload) &&
        timestamp == e.timestamp &&
        metadata.keySet == e.metadata.keySet &&
        metadata.forall { case (k, v) => java.util.Arrays.equals(v, e.metadata(k)) }
    case _ => false
  }

  override def hashCode(): Int =
    java.util.Arrays.hashCode(key) * 31 + timestamp.hashCode()
}

object Event {
  /** Reserved metadata keys — EventStore.java:46-57. */
  val MetadataId = "id"
  val MetadataLsn = "lsn"
  val MetadataKeyId = "kid"

  /** Keys a *user* may not set (PostgresEventStore.java:113-119). `lsn` is
    * reserved but user-settable in the reference, so only these two reject. */
  private val forbiddenUserKeys = Set(MetadataId, MetadataKeyId)

  /** Canonical constructor: null checks (Event.java:62-65), millisecond
    * truncation (Event.java:69), reserved-key guard (F2). */
  def apply(
      key: Array[Byte],
      payload: Array[Byte],
      timestamp: Instant,
      metadata: Map[String, Array[Byte]]): Event = {
    require(key != null, "key must not be null")
    require(payload != null, "payload must not be null")
    require(timestamp != null, "timestamp must not be null")
    require(metadata != null, "metadata must not be null")
    // value nulls fail HERE, not as a bare NPE deep inside the canonical
    // encoder or the AEAD associated-data build (Event.java parity:
    // Map.copyOf rejects null values at construction)
    metadata.foreach { case (k, v) =>
      require(k != null && v != null, s"metadata entries must be non-null (key: $k)")
    }
    val bad = metadata.keySet.intersect(forbiddenUserKeys)
    require(bad.isEmpty, s"metadata must not contain reserved keys: ${bad.mkString(", ")}")
    new Event(key, payload, timestamp.truncatedTo(ChronoUnit.MILLIS), metadata)
  }

  def apply(key: Array[Byte], payload: Array[Byte], timestamp: Instant): Event =
    apply(key, payload, timestamp, Map.empty[String, Array[Byte]])

  def apply(key: Array[Byte], payload: Array[Byte]): Event =
    apply(key, payload, Instant.now(), Map.empty[String, Array[Byte]])
}

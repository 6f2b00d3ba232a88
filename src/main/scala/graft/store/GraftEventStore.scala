package graft.store

import org.apache.avro.generic.GenericRecord

import graft.codec.{ConfluentAvro, Cursor, SchemaCatalog}
import graft.crypto.EventEncryptor
import graft.model.Event

/** The user-facing EventStore API — the analog of the reference's
  * `EventStore.save/subscribe` contract (/root/reference
  * tech.kage.event/src/main/java/tech/kage/event/EventStore.java), wired to
  * the native log.
  *
  * `save` follows trace §3-A of SURVEY (PostgresEventStore.java:98-142):
  *  1. validate — nulls + reserved metadata keys (F2/F3, enforced in
  *     Event.apply);
  *  2. serialize — T1 Confluent-framed Avro via the schema catalog
  *     (RecordNameStrategy analog: the embedded schema id, not the topic,
  *     identifies the record type);
  *  3. encrypt (optional) — E1 with AD from the PRE-encryption metadata;
  *  4. metadata column — add `kid` when encrypted (E3), canonical encode,
  *     NULL when empty;
  *  5. append — S1, batched (`saveAll`), since per-row writes are
  *     anti-idiomatic in Spark.
  *
  * `readEvents` is the bounded-replay consume path: F5 decrypt-or-
  * passthrough → T2 deserialize → typed events.
  */
final class GraftEventStore(
    val log: EventLog,
    val catalog: SchemaCatalog,
    encryptor: Option[EventEncryptor] = None) {

  /** T1 + steps 1-5 for a batch of typed payload records. */
  def saveAll(
      topic: String,
      records: Seq[(Array[Byte], GenericRecord, java.time.Instant, Map[String, Array[Byte]])],
      encryptionKeyUri: Option[String] = None): Cursor = {
    val events = records.map { case (key, payload, ts, metadata) =>
      val framed = ConfluentAvro.serialize(catalog.idFor(payload.getSchema), payload)
      val e = Event(key, framed, ts, metadata) // validates F2/F3, truncates to millis
      encryptionKeyUri match {
        case None => e
        case Some(uri) =>
          val enc = encryptor.getOrElse(
            throw new IllegalStateException("encryption key given but no encryptor configured"))
          val ciphertext = enc.encrypt(framed, e.key, e.timestamp.toEpochMilli, e.metadata, uri)
          new Event(e.key, ciphertext, e.timestamp, enc.withKeyId(e.metadata, uri))
      }
    }
    log.saveAll(topic, events)
  }

  def save(
      topic: String,
      key: Array[Byte],
      payload: GenericRecord,
      timestamp: java.time.Instant = java.time.Instant.now(),
      metadata: Map[String, Array[Byte]] = Map.empty,
      encryptionKeyUri: Option[String] = None): Cursor =
    saveAll(topic, Seq((key, payload, timestamp, metadata)), encryptionKeyUri)

  /** T8: consume a topic, transform payloads, save to another topic — the
    * Streams output-transformer path (KafkaStreamsEventStore.java:160-192).
    * Faithful semantics: the stored `kid` is dropped from the outgoing
    * metadata and, when present, its key URI re-encrypts the transformed
    * payload (EncryptingOutputEventTransformer pulls the key from metadata,
    * KafkaStreamsEventStore.java:183-187). `keyOverride` rotates to a new
    * key instead. */
  def transformTopic(
      inTopic: String,
      outTopic: String,
      f: GenericRecord => GenericRecord,
      shiftTimestamp: java.time.Duration = java.time.Duration.ZERO,
      keyOverride: Option[String] = None): Cursor = {
    val out = readEvents(inTopic).map { case (e, payload) =>
      val sourceUri = e.metadata.get(Event.MetadataKeyId).map(new String(_, java.nio.charset.StandardCharsets.UTF_8))
      val uri = keyOverride.orElse(sourceUri)
      val cleanMeta = e.metadata - Event.MetadataKeyId - Event.MetadataId
      (e.key, f(payload), e.timestamp.plus(shiftTimestamp), cleanMeta, uri)
    }
    // one append per encryption target (saveAll takes one key per batch);
    // groups sorted so multi-key outputs land in a deterministic order
    out.groupBy(_._5).toSeq.sortBy(_._1.getOrElse("")).foreach { case (uri, group) =>
      saveAll(outTopic, group.map { case (k, p, t, m, _) => (k, p, t, m) }, uri)
    }
    log.currentCursor(outTopic)
  }

  /** Bounded replay: ordered typed events with payload decrypted (F5/E2)
    * and deserialized (T2). The cursor bound rides EventLog.scan, so a
    * resume near the head reads only the (parquet-pruned) tail — never
    * the full history to the driver. */
  def readEvents(topic: String, after: Cursor = Cursor.zero): Seq[(Event, GenericRecord)] =
    log.scan(topic, after, Int.MaxValue).collect().toSeq.map { r =>
      val e = EventLogSchema.toEvent(r)
      val plain = encryptor match {
        case Some(enc) => enc.decrypt(e.payload, e.key, e.timestamp.toEpochMilli, e.metadata)
        case None => e.payload
      }
      (e, ConfluentAvro.deserialize(plain, catalog))
    }
}

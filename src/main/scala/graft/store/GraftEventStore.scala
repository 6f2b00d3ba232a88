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
    * key instead.
    *
    * Runs COLUMNAR: decrypt → deserialize → `f` → re-serialize →
    * re-encrypt happen per partition on executors (catalog and encryptor
    * are Serializable by design), and the result lands through one
    * distributed [[EventLog.append]] — no event ever funnels through a
    * driver-side Seq, so topic size is bounded by the cluster, not driver
    * heap. Per-event keys need no batch grouping here: each row
    * re-encrypts with its own URI in place. Output order: the input's
    * distributed (lsn, id) range sort makes partition-index order the
    * total order, which append's id allocation preserves (G9).
    *
    * `f` runs on executors and must be Serializable (avoid closing over
    * non-serializable enclosing state; `org.apache.avro.Schema` itself is
    * Serializable and safe to capture). */
  def transformTopic(
      inTopic: String,
      outTopic: String,
      f: GenericRecord => GenericRecord,
      shiftTimestamp: java.time.Duration = java.time.Duration.ZERO,
      keyOverride: Option[String] = None): Cursor = {
    import org.apache.spark.sql.functions.col
    val in = log.read(inTopic).filter(col("lsn").isNotNull)
    if (in.isEmpty) return log.currentCursor(outTopic)
    // locals only — the closure must not capture `this` (the log holds the
    // non-serializable SparkSession)
    val (cat, enc, shift, ko) = (catalog, encryptor, shiftTimestamp, keyOverride)
    val outRows = in.orderBy(col("lsn"), col("id")).rdd.mapPartitions(_.map { r =>
      val e = EventLogSchema.toEvent(r)
      val plain = enc match {
        case Some(x) => x.decrypt(e.payload, e.key, e.timestamp.toEpochMilli, e.metadata)
        case None => e.payload
      }
      val transformed = f(ConfluentAvro.deserialize(plain, cat))
      val framed = ConfluentAvro.serialize(cat.idFor(transformed.getSchema), transformed)
      val base = Event(e.key, framed, e.timestamp.plus(shift),
        e.metadata - Event.MetadataKeyId - Event.MetadataId)
      val uri = ko.orElse(e.metadata.get(Event.MetadataKeyId)
        .map(new String(_, java.nio.charset.StandardCharsets.UTF_8)))
      val out = uri match {
        case None => base
        case Some(u) =>
          val x = enc.getOrElse(throw new IllegalStateException(
            "encryption key given but no encryptor configured"))
          val ct = x.encrypt(base.payload, base.key, base.timestamp.toEpochMilli, base.metadata, u)
          new Event(base.key, ct, base.timestamp, x.withKeyId(base.metadata, u))
      }
      EventLogSchema.appendRow(out)
    })
    log.append(outTopic,
      in.sparkSession.createDataFrame(outRows, EventLogSchema.appendSchema))
  }

  /** Bounded replay: ordered typed events with payload decrypted (F5/E2)
    * and deserialized (T2). The cursor bound rides EventLog.scan, so a
    * resume near the head reads only the (parquet-pruned) tail.
    *
    * DRIVER-SIDE materialization, strictly bounded: a tail larger than
    * `limit` FAILS (no silent truncation, no driver OOM). Raise the limit
    * deliberately for bigger replays, or use the columnar consume paths
    * ([[transformTopic]] / `EventFunctions.enrich`) for full-topic work. */
  def readEvents(topic: String, after: Cursor = Cursor.zero,
      limit: Int = GraftEventStore.DefaultReadLimit): Seq[(Event, GenericRecord)] = {
    val probe = if (limit == Int.MaxValue) limit else limit + 1
    val rows = log.scan(topic, after, probe).collect()
    if (rows.length > limit)
      throw new IllegalStateException(
        s"readEvents($topic) tail exceeds limit=$limit rows — raise the limit " +
          "explicitly or use the columnar consume paths (transformTopic / EventFunctions.enrich)")
    rows.toSeq.map { r =>
      val e = EventLogSchema.toEvent(r)
      val plain = encryptor match {
        case Some(enc) => enc.decrypt(e.payload, e.key, e.timestamp.toEpochMilli, e.metadata)
        case None => e.payload
      }
      (e, ConfluentAvro.deserialize(plain, catalog))
    }
  }

  /** [[readEvents]] minus crypto-SHREDDED events: an event whose key was
    * destroyed ([[graft.crypto.DestroyableKeys]] — the append-only log's
    * right-to-be-forgotten) is silently dropped, exactly as if it had
    * never been kept. Everything else is readEvents verbatim — including
    * fail-loud on TAMPERED ciphertext under a live key: only the
    * distinguished key-destroyed signal redacts (never a decrypt error),
    * so corruption cannot masquerade as a takedown. Same strict `limit`
    * contract (the bound applies to the scanned tail, pre-redaction). */
  def readSurviving(topic: String, after: Cursor = Cursor.zero,
      limit: Int = GraftEventStore.DefaultReadLimit): Seq[(Event, GenericRecord)] = {
    val probe = if (limit == Int.MaxValue) limit else limit + 1
    val rows = log.scan(topic, after, probe).collect()
    if (rows.length > limit)
      throw new IllegalStateException(
        s"readSurviving($topic) tail exceeds limit=$limit rows — raise the limit " +
          "explicitly or use the columnar consume paths (transformTopic / EventFunctions.enrich)")
    rows.toSeq.flatMap { r =>
      val e = EventLogSchema.toEvent(r)
      val plain = encryptor match {
        case Some(enc) => enc.decryptOrRedact(e.payload, e.key, e.timestamp.toEpochMilli, e.metadata)
        case None => Some(e.payload)
      }
      plain.map(p => (e, ConfluentAvro.deserialize(p, catalog)))
    }
  }
}

object GraftEventStore {
  /** Default [[GraftEventStore.readEvents]] bound — the point at which a
    * driver-side replay should become a deliberate choice. */
  val DefaultReadLimit = 10000
}

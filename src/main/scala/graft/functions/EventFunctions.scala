package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.codec.{ConfluentAvro, MetadataCodec, SchemaCatalog}
import graft.crypto.EventEncryptor

/** Column-level serde/crypto operators — the record-at-a-time transforms of
  * SURVEY §2.2/§2.4 lifted onto DataFrame columns so the whole decode
  * pipeline (F5 → E2 → T2 → T7) is one executor-side projection:
  * no driver loops, catalog broadcast by closure, codegen around the UDF
  * boundaries.
  *
  * The UDF bodies delegate to the same codecs the driver-side API uses, so
  * bytes are identical across paths (golden-byte tests pin them). The
  * Confluent-frame accessors additionally exist as native Catalyst
  * expressions in graft.functions.expressions (hot path at scale).
  */
object EventFunctions {

  // null binary in → null out for every frame accessor (the native
  // graft_schema_id expression and Spark built-ins behave the same; an
  // unguarded UDF would NPE the whole task on e.g. an outer-join null)

  /** T2a: schema id from a Confluent-framed payload (frame check included). */
  def confluentSchemaId(data: Column): Column = {
    val u = udf { bytes: Array[Byte] =>
      if (bytes == null) null else Int.box(ConfluentAvro.schemaId(bytes))
    }
    u(data)
  }

  /** T2b: Avro body (frame stripped). */
  def confluentBody(data: Column): Column = {
    val u = udf { bytes: Array[Byte] =>
      if (bytes == null) null else ConfluentAvro.unframe(bytes)._2
    }
    u(data)
  }

  /** T1: frame an Avro body with a schema id. */
  def confluentFrame(schemaId: Column, body: Column): Column = {
    val u = udf { (id: java.lang.Integer, b: Array[Byte]) =>
      if (id == null || b == null) null else ConfluentAvro.frame(id, b)
    }
    u(schemaId, body)
  }

  /** T4: canonical metadata bytes → map<string,binary> (sorted on decode).
    * Resolves to the native [[graft.functions.expressions.DecodeMetadata]]
    * expression (null bytes → empty map, non-nullable output); the session
    * must have [[graft.GraftExtensions.register]] applied — every graft
    * entry point does this. */
  def decodeMetadata(metadata: Column): Column =
    call_function("graft_meta_decode", metadata)

  /** T3: map<string,binary> → canonical (sorted) metadata bytes. */
  def encodeMetadata(metadata: Column): Column = {
    val u = udf { m: Map[String, Array[Byte]] =>
      if (m == null || m.isEmpty) null else MetadataCodec.encode(m)
    }
    u(metadata)
  }

  /** T2 full: framed (possibly encrypted) payload → JSON of the decoded
    * record, resolving the writer schema by embedded id. JSON is the
    * neutral hand-off to `from_json(...)` for a typed struct — that cast
    * is codegen'd, and the Avro walk happens once per row on executors. */
  def decodePayloadJson(catalog: SchemaCatalog)(data: Column): Column = {
    val u = udf { bytes: Array[Byte] => ConfluentAvro.deserialize(bytes, catalog).toString }
    u(data)
  }

  /** F5 + E2 columnar: decrypt when metadata carries `kid`, else pass
    * through. Needs the decoded metadata map column + event key + ts. */
  def decryptPayload(encryptor: EventEncryptor)(
      data: Column, key: Column, timestamp: Column, metaMap: Column): Column = {
    val u = udf { (d: Array[Byte], k: Array[Byte], tsMillis: Long, m: Map[String, Array[Byte]]) =>
      encryptor.decrypt(d, k, tsMillis, if (m == null) Map.empty[String, Array[Byte]] else m)
    }
    u(data, key, (unix_millis(timestamp)), metaMap)
  }

  /** Shred-aware columnar decrypt: NULL payload for events whose key was
    * DESTROYED (crypto-shredding — callers `.filter(col.isNotNull)` to
    * drop redacted events); tamper under a live key still fails loud,
    * exactly like [[decryptPayload]]. */
  def decryptSurviving(encryptor: EventEncryptor)(
      data: Column, key: Column, timestamp: Column, metaMap: Column): Column = {
    val u = udf { (d: Array[Byte], k: Array[Byte], tsMillis: Long, m: Map[String, Array[Byte]]) =>
      encryptor.decryptOrRedact(d, k, tsMillis,
        if (m == null) Map.empty[String, Array[Byte]] else m).orNull
    }
    u(data, key, (unix_millis(timestamp)), metaMap)
  }

  /** T7: full record→event enrichment over a subscribe stream: decoded
    * metadata + transport fields (ReactorKafkaEventTransformer.java:128-145).
    * The output metadata map carries the STORED entries only; `id` and
    * `lsn` stay dedicated columns — the native log's transport fields,
    * where the reference's consumer surfaces them as headers. They are
    * deliberately NOT merged into the metadata map: decryption excludes
    * `id`/`kid` (not `lsn`) when rebuilding the AEAD associated data, so
    * injecting transport entries before decryptPayload would poison the
    * AD of every encrypted event. */
  def enrich(events: DataFrame, catalog: SchemaCatalog,
      encryptor: Option[EventEncryptor] = None): DataFrame = {
    graft.GraftExtensions.register(events.sparkSession)
    val meta = decodeMetadata(col("metadata"))
    val plain = encryptor match {
      case Some(e) => decryptPayload(e)(col("data"), col("key"), col("timestamp"), col("meta"))
      case None => col("data")
    }
    events
      .withColumn("meta", meta)
      .withColumn("plain", plain)
      .withColumn("payload_json", decodePayloadJson(catalog)(col("plain")))
      // frame check + id read via the native codegen expression (hot path)
      .withColumn("schema_id", expr("graft_schema_id(plain)"))
      .select(col("id"), col("lsn"), col("key"), col("timestamp"),
        col("meta").as("metadata"), col("schema_id"), col("payload_json"))
  }
}

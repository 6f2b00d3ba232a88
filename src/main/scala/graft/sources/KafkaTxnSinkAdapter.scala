package graft.sources

import graft.codec.Cursor

/** Live-broker transactional SINK transport (S12 broker form): builds the
  * producer configuration and progress-topic records for replicating into
  * a real Kafka deployment — the sink-side twin of
  * [[KafkaSubscribeAdapter]], and the broker-backed counterpart of the
  * broker-less [[KafkaShapedLog]].
  *
  * Reference semantics (/root/reference tech.kage.event.replicator/...
  * EventReplicatorWorker.java:183-208, EventReplicator.java:79,158,224-245,
  * application.properties):
  *  - ONE Kafka transaction per batch = N event sends + 1 progress-cursor
  *    send to the compacted single-partition `_event_replicator_progress`
  *    topic; a crash aborts the transaction, so read_committed consumers
  *    (and the replicator's own resume scan) never see a half batch;
  *  - the transactional id is `event-replicator-` + replicated topic: one
  *    producer identity per topic, so a restarted worker FENCES its
  *    predecessor's zombie producer (Kafka's epoch bump) without stalling
  *    other topics' workers;
  *  - keys/values travel as raw bytes (ByteArraySerializer) — the Avro
  *    framing was applied at store time (T1), the replicator never
  *    re-encodes;
  *  - progress values are the cursor's `"<lsn>:<id>"` text, keyed by the
  *    replicated topic name — a compacted-topic map from topic to cursor.
  *
  * Spark's built-in kafka SINK is at-least-once (it cannot span a
  * transaction over a foreachBatch commit), so the EOS form uses a RAW
  * producer inside `foreachBatch`:
  * {{{
  *   val producer = new KafkaProducer[Array[Byte], Array[Byte]](
  *     KafkaTxnSinkAdapter.producerProperties(servers, topic))
  *   producer.initTransactions()           // fences prior incarnations
  *   // per batch: beginTransaction(); records in (lsn,id) order;
  *   // send(progressRecord(topic, cursor)); commitTransaction()
  *   // on any error: abortTransaction() — the batch retries whole
  * }}}
  * Everything here is pure option/record construction — testable with no
  * broker (KafkaAdapterSpec), exactly like the source adapter.
  */
object KafkaTxnSinkAdapter {

  /** Compacted progress topic (EventReplicator.java:79; created with one
    * partition + compaction, EventReplicator.java:158). */
  val ProgressTopic = "_event_replicator_progress"

  /** Reference transactional-id prefix
    * (application.properties `transaction-id-prefix`). */
  val TransactionalIdPrefix = "event-replicator-"

  /** One producer identity per replicated topic: restartable + zombie-
    * fencing per topic, independent across topics. */
  def transactionalId(replicatedTopic: String): String =
    TransactionalIdPrefix + replicatedTopic

  /** Full config for the raw transactional producer used in the EOS
    * foreachBatch commit. Idempotence and acks=all are required by (and
    * implied by) transactions — pinned explicitly so a copy into a
    * non-transactional context stays safe. */
  def producerProperties(bootstrapServers: String,
      replicatedTopic: String): java.util.Properties = {
    val p = new java.util.Properties()
    p.put("bootstrap.servers", bootstrapServers)
    p.put("transactional.id", transactionalId(replicatedTopic))
    p.put("enable.idempotence", "true")
    p.put("acks", "all")
    p.put("key.serializer",
      "org.apache.kafka.common.serialization.ByteArraySerializer")
    p.put("value.serializer",
      "org.apache.kafka.common.serialization.ByteArraySerializer")
    p
  }

  /** Option map for Spark's built-in kafka sink
    * (`df.write.format("kafka")`) — the AT-LEAST-ONCE form (no broker
    * transaction; downstream consumers dedup on the id header or tolerate
    * replays). Broker-side producer config rides the `kafka.` prefix;
    * serializers are omitted because the Spark sink fixes them to byte
    * arrays itself and rejects overrides. */
  def sinkOptions(bootstrapServers: String, topic: String): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> bootstrapServers,
    "topic" -> topic,
    "kafka.enable.idempotence" -> "true",
    "kafka.acks" -> "all")

  /** Progress record payload: key = replicated topic (UTF-8), value =
    * `"<lsn>:<id>"` (EventReplicatorWorker.java:204-205, 273-275). */
  def progressRecord(replicatedTopic: String, cursor: Cursor): (Array[Byte], Array[Byte]) =
    (replicatedTopic.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      cursor.encoded.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** Parse a progress record's value back to a cursor (bootstrap scan of
    * the compacted progress topic, EventReplicator.java:224-245); strict —
    * a malformed record fails init (G8), never silently resets. */
  def parseProgress(value: Array[Byte]): Cursor =
    Cursor.parse(new String(value, java.nio.charset.StandardCharsets.UTF_8))
}

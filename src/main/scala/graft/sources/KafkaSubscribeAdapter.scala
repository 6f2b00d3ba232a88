package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.DataStreamReader

import graft.store.TopicOffsets

/** Live-broker subscribe transport (S5): builds the Structured Streaming
  * `format("kafka")` source configuration for a read_committed consumer
  * that resumes from a [[TopicOffsets]] store — the thin adapter between
  * the broker-less [[KafkaShapedLog]] twin and a real Kafka deployment.
  * Everything downstream (EventFunctions.enrich decode, EosProjection
  * exactly-once effects) is transport-agnostic, so this option/offset
  * construction is the ONLY broker-specific surface.
  *
  * Reference semantics (/root/reference tech.kage.event.kafka.reactor/...
  * ReactorKafkaEventStore.java:301-329, 233-246):
  *  - consumers read committed data only (`isolation.level=read_committed`,
  *    ReactorKafkaEventStoreAutoConfiguration.java:87-90);
  *  - each partition resumes at `stored offset + 1` — the offset table
  *    records the LAST PROCESSED offset, and a missing row bootstraps to −1
  *    so a fresh consumer starts at 0 (ReactorKafkaEventStore.java:95-98,
  *    278);
  *  - offsets come from the external store, never from Kafka's consumer
  *    group state (`startingOffsets` JSON per partition).
  *
  * The reader is CONSTRUCTED here but not started: option building and the
  * offsets JSON are fully testable without a broker (the `kafka` source
  * resolves only at `load()`/`start()`).
  */
object KafkaSubscribeAdapter {

  /** `startingOffsets` JSON for one topic: `{"t":{"0":n,...}}` where n is
    * the FIRST offset to consume (inclusive) = stored last-processed + 1;
    * partitions absent from the store bootstrap to −1 in the store and 0
    * in the JSON. Partitions render in numeric order (deterministic). */
  def startingOffsetsJson(topic: String, offsets: TopicOffsets, numPartitions: Int): String = {
    require(numPartitions > 0, s"numPartitions must be positive: $numPartitions")
    val per = (0 until numPartitions)
      .map(p => s""""$p":${offsets.offsetFor(topic, p) + 1}""")
      .mkString("{", ",", "}")
    s"""{"$topic":$per}"""
  }

  /** Complete source option map for `spark.readStream.format("kafka")`. */
  def sourceOptions(
      bootstrapServers: String,
      topic: String,
      offsets: TopicOffsets,
      numPartitions: Int): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> bootstrapServers,
    "subscribe" -> topic,
    // broker-side consumer config rides the kafka. prefix
    "kafka.isolation.level" -> "read_committed",
    "startingOffsets" -> startingOffsetsJson(topic, offsets, numPartitions),
    // a resumed offset below the broker's retention horizon is data loss —
    // fail fast (G8), like the gapped-delivery guard on the native path
    "failOnDataLoss" -> "true")

  /** A configured (not yet started) kafka-source reader. The returned
    * stream's value/key binary columns feed the same decode pipeline as
    * the native log (EventFunctions.enrich after column renames). */
  def reader(
      spark: SparkSession,
      bootstrapServers: String,
      topic: String,
      offsets: TopicOffsets,
      numPartitions: Int): DataStreamReader =
    sourceOptions(bootstrapServers, topic, offsets, numPartitions)
      .foldLeft(spark.readStream.format("kafka")) {
        case (r, (k, v)) => r.option(k, v)
      }
}

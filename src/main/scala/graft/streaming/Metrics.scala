package graft.streaming

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import graft.codec.Cursor
import graft.replicate.Replicator
import graft.sources.KafkaShapedLog

/** Gauge registry — the micrometer-surface analog (§5 cat 11): the
  * reference registers `event.replicator.lag` per topic
  * (EventReplicatorWorkerIT.java:366-409) and `event.store.consumer.lag`
  * per partition (MicrometerReactorKafkaEventStoreIT.java:170-249), both
  * re-read on demand and dropped when ownership changes. Same contract
  * here with suppliers; any metrics backend maps over [[snapshot]].
  */
final class GraftMetrics {
  private val gauges = new ConcurrentHashMap[String, () => Long]()

  def gauge(name: String, value: () => Long): Unit = gauges.put(name, value)

  def remove(name: String): Unit = gauges.remove(name)

  def value(name: String): Option[Long] = Option(gauges.get(name)).map(_.apply())

  def snapshot(): Map[String, Long] =
    gauges.asScala.map { case (k, v) => k -> v() }.toMap

  /** `event.replicator.lag` per topic. */
  def registerReplicationLag(rep: Replicator, topic: String): Unit =
    gauge(s"event.replicator.lag.$topic", () => rep.lag(topic))

  /** `event.store.consumer.lag` per (topic, partition). */
  def registerConsumerLag(sink: KafkaShapedLog, topic: String, partition: Int,
      lastProcessed: () => Long): Unit =
    gauge(s"event.store.consumer.lag.$topic.$partition",
      () => sink.consumerLag(topic, partition, lastProcessed()))
}

package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.KafkaSubscribeAdapter
import graft.store.TopicOffsets

/** Kafka source-adapter construction (S5 transport surface) — option map +
  * startingOffsets JSON semantics per ReactorKafkaEventStore.java:301-329,
  * exercised with no broker (the kafka format resolves only at load). */
class KafkaAdapterSpec extends AnyFunSuite {

  test("fresh offset store bootstraps every partition to -1 and starts consuming at 0") {
    val offsets = TopicOffsets(Files.createTempDirectory("graft-ka-").toString)
    val json = KafkaSubscribeAdapter.startingOffsetsJson("t_events", offsets, numPartitions = 3)
    assert(json == """{"t_events":{"0":0,"1":0,"2":0}}""")
    // the bootstrap is persisted (-1 rows), exactly like the reference's
    // select-or-insert (ReactorKafkaEventStore.java:95-98)
    assert(offsets.all() == Map(
      ("t_events", 0) -> -1L, ("t_events", 1) -> -1L, ("t_events", 2) -> -1L))
  }

  test("stored offsets resume at offset + 1 per partition") {
    val offsets = TopicOffsets(Files.createTempDirectory("graft-ka2-").toString)
    offsets.update("t_events", 0, 41L)
    offsets.update("t_events", 2, 7L)
    val json = KafkaSubscribeAdapter.startingOffsetsJson("t_events", offsets, numPartitions = 3)
    // p0 processed through 41 → start 42; p1 bootstraps → 0; p2 → 8
    assert(json == """{"t_events":{"0":42,"1":0,"2":8}}""")
  }

  test("option map carries read_committed isolation, subscribe and fail-fast on data loss") {
    val offsets = TopicOffsets(Files.createTempDirectory("graft-ka3-").toString)
    val opts = KafkaSubscribeAdapter.sourceOptions(
      "broker1:9092,broker2:9092", "t_events", offsets, numPartitions = 2)
    assert(opts("kafka.bootstrap.servers") == "broker1:9092,broker2:9092")
    assert(opts("subscribe") == "t_events")
    assert(opts("kafka.isolation.level") == "read_committed")
    assert(opts("failOnDataLoss") == "true")
    assert(opts("startingOffsets") == """{"t_events":{"0":0,"1":0}}""")
  }

  test("txn sink: per-topic transactional id, byte serializers, idempotent acks=all (S12 broker form)") {
    import graft.sources.KafkaTxnSinkAdapter
    assert(KafkaTxnSinkAdapter.transactionalId("orders_events") ==
      "event-replicator-orders_events")
    val p = KafkaTxnSinkAdapter.producerProperties("b1:9092", "orders_events")
    assert(p.getProperty("bootstrap.servers") == "b1:9092")
    assert(p.getProperty("transactional.id") == "event-replicator-orders_events")
    assert(p.getProperty("enable.idempotence") == "true")
    assert(p.getProperty("acks") == "all")
    assert(p.getProperty("key.serializer").endsWith("ByteArraySerializer"))
    assert(p.getProperty("value.serializer").endsWith("ByteArraySerializer"))
    // the Spark-sink (at-least-once) option map: kafka.-prefixed broker
    // config, no serializer overrides (Spark rejects them)
    val opts = KafkaTxnSinkAdapter.sinkOptions("b1:9092", "orders_events")
    assert(opts("kafka.bootstrap.servers") == "b1:9092")
    assert(opts("topic") == "orders_events")
    assert(opts("kafka.enable.idempotence") == "true")
    assert(opts("kafka.acks") == "all")
    assert(!opts.keys.exists(_.contains("serializer")))
  }

  test("txn sink: progress record round-trips the cursor; malformed fails fast") {
    import graft.codec.Cursor
    import graft.sources.KafkaTxnSinkAdapter
    val (k, v) = KafkaTxnSinkAdapter.progressRecord("orders_events", Cursor(7, 4242))
    assert(new String(k, "UTF-8") == "orders_events")
    assert(new String(v, "UTF-8") == "7:4242")
    assert(KafkaTxnSinkAdapter.parseProgress(v) == Cursor(7, 4242))
    assert(KafkaTxnSinkAdapter.ProgressTopic == "_event_replicator_progress")
    intercept[IllegalStateException] {
      KafkaTxnSinkAdapter.parseProgress("not-a-cursor".getBytes("UTF-8"))
    }
  }

  test("reader construction needs no broker (source resolves only at load)") {
    val offsets = TopicOffsets(Files.createTempDirectory("graft-ka4-").toString)
    val r = KafkaSubscribeAdapter.reader(
      TestSpark.spark, "localhost:9092", "t_events", offsets, numPartitions = 1)
    assert(r != null) // building the DataStreamReader must not touch the network
  }

  test("zero partitions is a construction error, not an empty subscription") {
    val offsets = TopicOffsets(Files.createTempDirectory("graft-ka5-").toString)
    intercept[IllegalArgumentException](
      KafkaSubscribeAdapter.startingOffsetsJson("t_events", offsets, numPartitions = 0))
  }

  test("KafkaConformance skips cleanly when no broker is configured") {
    // the JdbcIntegrationSpec/PgConformance discipline: the env-gated
    // runner must be safe to wire into any CI — without KAFKA_BOOTSTRAP it
    // prints a skip notice and exits normally (and with the env set but no
    // kafka-clients on the classpath it fails loud — not coverable here
    // without polluting the process env)
    assert(!sys.env.contains(graft.tools.KafkaConformance.BootstrapEnv),
      "test environment unexpectedly configures a broker")
    graft.tools.KafkaConformance.main(Array.empty) // must not throw
  }
}

package graft.replicate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.codec.Cursor
import graft.sources.KafkaShapedLog
import graft.store.EventLog

/** Event replication: native log → Kafka-shaped sink, in `(lsn, id)` order,
  * exactly-once — the Spark re-expression of the reference's
  * EventReplicator/EventReplicatorWorker pipeline (SURVEY §3-C).
  *
  * Per poll (`pollAndSendBatch`, EventReplicatorWorker.java:174-209):
  *  1. S4 keyset scan: `(lsn,id) > cursor ORDER BY lsn,id LIMIT batchSize`;
  *  2. T10 key projection + T9 header build (`id`, `lsn`, then stored
  *     metadata entries, all sorted by header key);
  *  3. S12 transactional send: records + progress cursor commit atomically
  *     (KafkaShapedLog.appendTxn);
  *  4. G2/G3: after a crash the cursor re-filter makes the retry
  *     idempotent — same-LSN siblings split across batches resume cleanly
  *     because the cursor is the row-value pair, not the LSN alone.
  *
  * `run()` mirrors the drain loop (EventReplicatorWorker.java:148-160):
  * poll until an empty batch. `replicateAll` discovers topics via the
  * `_events` suffix filter (S8/F4, EventReplicator.java:197-204).
  */
final class Replicator(
    source: EventLog,
    sink: KafkaShapedLog,
    batchSize: Int = Replicator.DefaultBatchSize) {

  /** Build sink records from scanned event rows (T9/T10/T5). Metadata
    * decode → headers happens columnar: the canonical Avro map bytes are
    * decoded on executors, never on the driver. */
  private[replicate] def toRecords(topic: String, batch: DataFrame): DataFrame = {
    // T4 decode via the native DecodeMetadata expression (stays in the
    // codegen stage; the old per-row Scala UDF boxed every metadata map and
    // was rebuilt on each toRecords call)
    graft.GraftExtensions.register(batch.sparkSession)
    val decodeMeta = (c: org.apache.spark.sql.Column) =>
      graft.functions.EventFunctions.decodeMetadata(c)
    // Headers: id + lsn + stored metadata, sorted by header key
    // (EventReplicatorWorker.java:219-230; byte encoding of id/lsn matches
    // the reference's UTF-8-of-toString transport form). Built as an ARRAY
    // concat, never through a map: Kafka headers legally repeat keys, and
    // a user metadata entry named 'lsn' (allowed — Event reserves only
    // id/kid) would make map_concat throw on the duplicate and poison the
    // topic's replication forever.
    batch
      .withColumn("meta", decodeMeta(col("metadata")))
      .select(
        lit(topic).as("topic"),
        col("key"),
        col("data").as("value"),
        array_sort(concat(
          map_entries(col("meta")),
          array(
            struct(lit("id").as("key"),
              encode(col("id").cast("string"), "UTF-8").as("value")),
            struct(lit("lsn").as("key"),
              encode(col("lsn").cast("string"), "UTF-8").as("value"))))).as("headers"),
        col("timestamp"),
        col("id").as("_seq"))
  }

  /** One S4 poll + S12 transactional send. @return events sent.
    *
    * First probes the dense id window (drainRange — no global sort); if
    * that comes back empty, re-probes with the general ordered scan before
    * declaring the backlog drained: retention may have deleted the ids
    * right above a lagging sink cursor, and without the fallback the drain
    * would wedge on the gap forever. The fallback runs only on empty polls
    * (once per gap or idle tick) and its `lsn >= cursor` bound still
    * prunes to the tail in the normal case. */
  def pollAndSendBatch(topic: String): Long = {
    val cursor = sink.cursorFor(topic)
    def poll(batch: DataFrame): Long = {
      val persisted = batch.persist()
      try {
        val maxRow = persisted.agg(max(struct(col("lsn"), col("id"))).as("m"))
          .select(col("m.lsn"), col("m.id")).collect()(0)
        if (maxRow.isNullAt(0)) 0L
        else {
          val next = Cursor(maxRow.getLong(0), maxRow.getLong(1))
          sink.appendTxn(toRecords(topic, persisted), topic, next)
        }
      } finally persisted.unpersist()
    }
    val n = poll(source.drainRange(topic, cursor, batchSize))
    if (n > 0) n else poll(source.scan(topic, cursor, batchSize))
  }

  /** Drain loop: poll until empty (EventReplicatorWorker.java:148-160). */
  def run(topic: String): Long = {
    var total = 0L
    var n = pollAndSendBatch(topic)
    while (n > 0) { total += n; n = pollAndSendBatch(topic) }
    total
  }

  /** Replicate every `_events` topic (S8 discovery + F4 filter). */
  def replicateAll(): Map[String, Long] =
    source.topics().map(t => t -> run(t)).toMap

  /** A1 lag gauge for monitoring. */
  def lag(topic: String): Long = source.lag(topic, sink.cursorFor(topic))

  /** Continuous replication as a Structured Streaming job: tail the source
    * log (Subscribe.stream file source) and commit each micro-batch to the
    * sink transactionally. Exactly-once WITHOUT relying on the Spark
    * checkpoint alone: every batch is re-filtered by the sink's committed
    * cursor, so a replayed batch (crash after sink commit, before
    * checkpoint commit — or a deleted checkpoint) re-commits nothing.
    *
    * The cursor filter is only sound if the committed cursor always covers
    * a COMPLETE id prefix, so before committing, the batch must be the
    * exact dense continuation `cursor.id+1 … cursor.id+n` (EventLog ids
    * are dense — see drainRange). The file source delivers appends in
    * (mtime, path) order, which tracks append order in practice, but a
    * filesystem with coarse mtimes could reorder same-timestamp files —
    * in that case this FAILS FAST (G8) instead of silently losing the
    * displaced rows; recovery is a [[run]] drain (ordered, cursor-exact)
    * and a stream restart.
    * This is the always-on form of [[runLoop]]; `Trigger.AvailableNow`
    * turns it into a one-shot drain. */
  def replicateStream(topic: String, checkpointDir: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    graft.streaming.Subscribe.stream(
        source.read(topic).sparkSession, source.root.toString, topic)
      .writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (df: DataFrame, _: Long) =>
        val cursor = sink.cursorFor(topic)
        val fresh = df.filter(
          struct(col("lsn"), col("id")) >
            struct(lit(cursor.lsn), lit(cursor.id))).persist()
        try {
          val stats = fresh.agg(
              max(struct(col("lsn"), col("id"))).as("m"),
              min(col("id")).as("mn"), count(lit(1)).as("n"))
            .select(col("m.lsn"), col("m.id"), col("mn"), col("n")).collect()(0)
          if (!stats.isNullAt(0)) {
            val (mx, mn, n) = (stats.getLong(1), stats.getLong(2), stats.getLong(3))
            if (mn != cursor.id + 1 || n != mx - mn + 1)
              throw new IllegalStateException(
                s"out-of-order or gapped delivery for $topic: committed id ${cursor.id}, " +
                  s"batch ids [$mn, $mx] n=$n — recover with Replicator.run() then restart the stream")
            sink.appendTxn(toRecords(topic, fresh), topic,
              Cursor(stats.getLong(0), mx))
          }
          (): Unit
        } finally { fresh.unpersist(); () }
      }
      .start()

  /** Fixed-delay scheduling loop — the reference's per-topic worker
    * cadence (EventReplicator.java:138, 174-183: schedule at
    * `poll.interval.ms`, each tick drains the backlog fully). Bounded by
    * `maxTicks` so bounded deployments/tests terminate; a service passes
    * Int.MaxValue. @return events replicated per tick. */
  def runLoop(topic: String, intervalMillis: Long, maxTicks: Int): Seq[Long] =
    (1 to maxTicks).map { tick =>
      val n = run(topic)
      if (tick < maxTicks && intervalMillis > 0) Thread.sleep(intervalMillis)
      n
    }
}

object Replicator {
  /** Reference default batch size (EventReplicatorWorker.java:134). */
  val DefaultBatchSize = 100
}

package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

import graft.store.EventLogSchema

/** Unbounded subscribe (S5/S6) over the native event log, plus the
  * exactly-once projection helper (G4).
  *
  * `stream` = Structured Streaming file source tailing a topic directory:
  * the Spark analog of the reference's
  * `subscribe(topic): Flux<Mono<Event>>` (ReactorKafkaEventStore.java:233-246).
  * New appends arrive as new parquet files; per-file ordering is the
  * append's (lsn, id) order. Downstream gets a typed decode pipeline via
  * graft.functions.EventFunctions (F5→E2→T2→T7).
  *
  * `EosProjection` mirrors G4 (offsets stored transactionally with the
  * user's effects — usage pattern ReactorKafkaEventStore.java:218-225):
  * the reference commits per record; Structured Streaming commits per
  * micro-batch — same end state, coarser commit unit (SURVEY §3-B). The
  * batch id is persisted ATOMICALLY WITH the user's output (single rename),
  * so replayed batches after a crash are detected and skipped — effects
  * apply exactly once.
  */
object Subscribe {

  /** Tail a topic directory as a stream of event rows. */
  def stream(spark: SparkSession, logRoot: String, topic: String,
      maxFilesPerTrigger: Int = 100): DataFrame =
    spark.readStream
      .schema(EventLogSchema.schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(Paths.get(logRoot).resolve(topic).toString)

  /** Tail SEVERAL topics as ONE stream, each row tagged with its `topic`
    * (derived from the segment file's parent directory). N topics cost one
    * file source + one checkpoint instead of N queries — the fan-in the
    * reference runs as one replicator process over all discovered topics
    * (EventReplicator.java:168-184). The glob is explicit (`{a,b}`), not
    * `*_events`: a topic created after the stream started must not
    * silently join mid-checkpoint. */
  def streamTopics(spark: SparkSession, logRoot: String, topics: Seq[String],
      maxFilesPerTrigger: Int = 100): DataFrame = {
    require(topics.nonEmpty, "streamTopics needs at least one topic")
    // whitelist, not a blacklist: the names are interpolated into a Hadoop
    // GLOB, where '*'/'?'/'['/'{' are live metacharacters — a topic named
    // `x*_events` would otherwise match EVERY topic directory and commit
    // cursors for topics the caller never listed
    require(topics.forall(_.matches("[A-Za-z0-9_.-]+")),
      s"illegal topic names (allowed: [A-Za-z0-9_.-]+): $topics")
    spark.readStream
      .schema(EventLogSchema.schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(Paths.get(logRoot).resolve(topics.mkString("{", ",", "}")).toString)
      .withColumn("topic",
        regexp_extract(input_file_name(), "/([^/]+)/[^/]*$", 1))
  }

  /** Event-time tumbling aggregation with a watermark — the §2.7 extension
    * surface (the reference has no windowing; Structured Streaming gives it
    * on the same subscribe stream). */
  def windowedCounts(events: DataFrame, watermark: String, window_ : String): DataFrame =
    events
      .withWatermark("timestamp", watermark)
      .groupBy(window(col("timestamp"), window_))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("n"))
}

/** Exactly-once micro-batch projection: user effects + progress marker
  * commit atomically (file-rename transaction), replays are skipped.
  *
  * @param stateDir directory holding the last-committed batch id
  */
final class EosProjection(stateDir: Path) {
  Files.createDirectories(stateDir)
  private val marker = stateDir.resolve("last_batch")

  def lastCommitted: Long =
    if (Files.exists(marker)) Files.readString(marker).trim.toLong else -1L

  /** Wrap a foreachBatch body with idempotence: `effects` must stage its
    * output under `stage(batchId)` and the commit is one atomic rename of
    * the marker + staged dir. */
  def foreachBatch(effects: (DataFrame, Long, Path) => Unit)(df: DataFrame, batchId: Long): Unit = {
    if (batchId <= lastCommitted) return // replay after restart → skip (G4)
    val stage = stateDir.resolve(s"stage-$batchId")
    if (Files.exists(stage)) deleteRecursively(stage)
    Files.createDirectories(stage)
    effects(df, batchId, stage)
    val committed = stateDir.resolve(s"batch-$batchId")
    if (Files.exists(committed)) deleteRecursively(committed)
    Files.move(stage, committed, StandardCopyOption.ATOMIC_MOVE)
    val tmp = stateDir.resolve("last_batch.tmp")
    Files.writeString(tmp, batchId.toString)
    Files.move(tmp, marker, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  def attach(w: DataStreamWriter[org.apache.spark.sql.Row])(
      effects: (DataFrame, Long, Path) => Unit): DataStreamWriter[org.apache.spark.sql.Row] =
    w.foreachBatch(foreachBatch(effects) _)

  private def deleteRecursively(p: Path): Unit = {
    import scala.jdk.CollectionConverters._
    val s = Files.walk(p)
    try s.sorted(java.util.Comparator.reverseOrder()).iterator().asScala.foreach(Files.delete)
    finally s.close()
  }
}

object EosProjection {
  def apply(stateDir: String): EosProjection = new EosProjection(Paths.get(stateDir))

  /** Run a stream to completion over currently-available data (tests /
    * bounded replays): AvailableNow + awaitTermination. Update output mode
    * so windowed aggregations emit in-progress windows too (append mode
    * would hold back windows the watermark hasn't closed). */
  def runAvailableNow(
      df: DataFrame,
      checkpoint: String,
      proj: EosProjection)(effects: (DataFrame, Long, Path) => Unit): StreamingQuery = {
    val q = df.writeStream
      .trigger(Trigger.AvailableNow())
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .foreachBatch(proj.foreachBatch(effects) _)
      .start()
    q.awaitTermination()
    q
  }
}

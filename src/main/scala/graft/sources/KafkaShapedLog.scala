package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.UUID

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.codec.Cursor

/** A Kafka-shaped record log with transactional appends — the replication
  * sink (S2/S12) re-expressed without a broker.
  *
  * Record schema mirrors a Kafka `ProducerRecord`: (topic, partition,
  * offset, key binary, value binary, headers array<struct<key,value>>,
  * timestamp). Offsets are per-(topic,partition) monotone.
  *
  * Exactly-once (G3 analog of EventReplicatorWorker.java:184-208, where one
  * Kafka transaction = N event sends + 1 progress-cursor send): an append
  * writes parquet files to an uncommitted staging dir, then commits by
  * atomically replacing `manifest.json` — which lists the committed files,
  * the per-partition next offsets, AND the per-source-table progress cursor.
  * Readers only see manifest-listed files (`read_committed`), so a crash
  * between staging and commit leaves invisible orphans and an unchanged
  * cursor; the replicator's resume re-filter makes the retry idempotent.
  * This is the same atomicity shape as Kafka's txn marker + the compacted
  * `_event_replicator_progress` topic (EventReplicator.java:79,158) fused
  * into one commit point.
  *
  * Scale: the manifest holds file names and counters only (O(appends), and
  * compactable); record data never passes through the driver — Spark writes
  * the staged parquet in parallel and commit is a metadata rename.
  */
final class KafkaShapedLog(val root: Path, val spark: SparkSession, val numPartitions: Int = 1) {

  import KafkaShapedLog._

  private val manifestPath = root.resolve("manifest.json")

  Files.createDirectories(root.resolve("staging"))

  def manifest(): Manifest =
    if (Files.exists(manifestPath)) Manifest.parse(Files.readString(manifestPath))
    else Manifest(Nil, Map.empty, Map.empty, Map.empty)

  private def commitManifest(m: Manifest): Unit = {
    val tmp = root.resolve(s"manifest.${UUID.randomUUID()}.tmp")
    Files.writeString(tmp, m.render)
    Files.move(tmp, manifestPath, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Progress cursor for a source table (S9 bootstrap scan analog — but a
    * map lookup, not a topic replay). */
  def cursorFor(sourceTable: String): Cursor =
    manifest().cursors.getOrElse(sourceTable, Cursor.zero)

  /** One transaction: append `records` (topic, key, value, headers,
    * timestamp, `_seq` columns; partition/offset assigned here, offsets
    * follow `_seq` order — the source's (lsn,id) order, preserving G1's
    * total order per partition) and advance the progress cursor of
    * `sourceTable` — atomically.
    *
    * `newCursor` is by-name and evaluated exactly once, AFTER the staged
    * write has completed — so callers may derive it from `observe` metrics
    * harvested during that write (Replicator.pollAndSendBatch), paying a
    * single pass over the batch. An EMPTY batch commits nothing at all
    * (`newCursor` is never evaluated, no manifest write) and returns 0 —
    * so callers need no pre-write emptiness probe; the probe's job is
    * folded into the write's own metrics. */
  def appendTxn(records: DataFrame, sourceTable: String, newCursor: => Cursor,
      dropPending: Seq[Pending] = Nil): Long = synchronized {
    val m = manifest()
    // Partition by key hash (per-key order), offsets dense per partition.
    // The explicit repartition produces HashPartitioning(topic, partition,
    // numPartitions), which already satisfies the window's required
    // distribution — the window adds only a local sort (no second
    // exchange), task count stays = numPartitions (AQE never coalesces an
    // explicit repartition), and the staged write emits exactly one file
    // per kafka-partition instead of shuffle.partitions mostly-empty ones.
    val parted = records
      .withColumn("partition", pmod(xxhash64(col("key")), lit(numPartitions)).cast("int"))
      .repartition(numPartitions, col("topic"), col("partition"))
      .withColumn("_rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("topic"), col("partition"))
          .orderBy(col("_seq"))))
    // base offsets join as a |known (topic,partition)|-row broadcast — the
    // old per-entry withColumn(when(...)) fold grew the plan O(P) with the
    // fleet's lifetime partition count and made Catalyst re-analyze the
    // deepening chain on every commit (EventLog.append's offsets join is
    // the same pattern)
    val withOffsets = (if (m.offsets.isEmpty)
        parted.withColumn("offset", col("_rn").cast("long") - 1)
      else {
        val offRows = m.offsets.toSeq.map { case ((t, p), next) =>
          org.apache.spark.sql.Row(t, p, next)
        }
        val offDf = spark.createDataFrame(offRows.asJava, StructType(Seq(
          StructField("_ot", StringType, nullable = false),
          StructField("_op", org.apache.spark.sql.types.IntegerType, nullable = false),
          StructField("_onext", LongType, nullable = false))))
        parted.join(broadcast(offDf),
            col("topic") === col("_ot") && col("partition") === col("_op"), "left")
          .withColumn("offset",
            col("_rn").cast("long") - 1 + coalesce(col("_onext"), lit(0L)))
          .drop("_ot", "_op", "_onext")
      }).drop("_rn")

    // Per-(topic,partition) counts ride the staged write itself as observe
    // metrics — offsets are DENSE per group (row_number), so the next
    // offset is just base + group count, and no second pass over the
    // staged files is needed. Conditional per-partition counters work
    // because `partition` is always in [0, numPartitions); the observed
    // min/max topic detects the (currently nonexistent) multi-topic batch,
    // which falls back to a grouped read of the staged files.
    val obs = org.apache.spark.sql.Observation()
    val observed = withOffsets.observe(obs,
      count(lit(1)).as("n"),
      (Seq(min(col("topic")).as("t0"), max(col("topic")).as("t1")) ++
        (0 until numPartitions).map(p =>
          count(when(col("partition") === p, 1)).as(s"n$p"))): _*)
    val stage = root.resolve("staging").resolve(UUID.randomUUID().toString)
    observed.select("topic", "partition", "offset", "key", "value", "headers", "timestamp")
      .write.parquet(stage.toString)
    val n = obs.get("n").asInstanceOf[Long]
    if (n == 0 && dropPending.isEmpty) {
      // empty transaction: nothing staged, nothing to commit — drop the
      // (file-less) stage dir and leave the manifest untouched, so idle
      // replication polls cost one pruned scan and zero manifest churn
      deleteDir(stage)
      return 0L
    }
    val files = {
      val s = Files.list(stage)
      try s.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .map(p => root.relativize(p).toString).toList
      finally s.close()
    }
    val newOffsets =
      if (obs.get("t0") == obs.get("t1") && obs.get("t0") != null) {
        val topic = obs.get("t0").asInstanceOf[String]
        (0 until numPartitions).foldLeft(m.offsets) { (acc, p) =>
          val np = obs.get(s"n$p").asInstanceOf[Long]
          if (np == 0) acc
          else acc + ((topic, p) -> (acc.getOrElse((topic, p), 0L) + np))
        }
      } else {
        // multi-topic batch (no current caller): one column-pruned pass
        // over the staged files, the committed truth by definition
        spark.read.schema(recordSchema).parquet(stage.toString)
          .groupBy(col("topic"), col("partition"))
          .agg(max(col("offset")).as("mx")).collect()
          .foldLeft(m.offsets) { (acc, r) =>
            acc + ((r.getString(0), r.getInt(1)) -> (r.getLong(2) + 1))
          }
      }
    val pend =
      if (dropPending.isEmpty) m.pending
      else m.pending.updated(sourceTable,
        m.pending.getOrElse(sourceTable, Nil).filterNot(dropPending.contains))
    commitManifest(Manifest(m.files ++ files, newOffsets,
      m.cursors + (sourceTable -> newCursor), pend))
    // promoted runs were re-staged as committed files above — their parked
    // dirs are now unreferenced; without this, every park leaks its staged
    // copy forever and pollutes the stagedFileCount orphan gauge. (A crash
    // between the commit and this delete leaves an orphan the gauge
    // reports — same contract as any staged write.)
    dropPending.foreach(p => deletePendingDir(p))
    n
  }

  /** Parked out-of-order runs for a source table (id ranges delivered
    * ahead of the dense prefix — see [[parkRange]]), sorted by `from`. */
  def pendingRanges(sourceTable: String): List[Pending] =
    manifest().pending.getOrElse(sourceTable, Nil).sortBy(_.from)

  /** Park an out-of-order run: stage the RAW source rows (no offsets — Kafka
    * offset assignment must follow id order, and earlier ids haven't
    * arrived) and record the id range in the manifest atomically. The rows
    * re-enter the normal [[appendTxn]] pipeline at promotion time, once
    * the dense prefix has been committed, so per-partition offset order
    * still equals (lsn, id) order (G1/G9 preserved across reordering). */
  def parkRange(rows: DataFrame, sourceTable: String,
      from: Long, to: Long, lsnMax: Long): Unit = synchronized {
    val m = manifest()
    val dir = root.resolve("staging").resolve(s"pending-${UUID.randomUUID()}")
    rows.write.parquet(dir.toString)
    val p = Pending(from, to, lsnMax, root.relativize(dir).toString)
    commitManifest(m.copy(pending = m.pending.updated(sourceTable,
      (m.pending.getOrElse(sourceTable, Nil) :+ p).sortBy(_.from))))
  }

  /** Read a parked run's raw rows back. */
  def readPending(p: Pending): DataFrame =
    spark.read.parquet(root.resolve(p.dir).toString)

  /** Drop a parked range without committing records (stale range whose ids
    * were drained by another path, e.g. a Replicator.run() recovery). */
  def discardPending(sourceTable: String, p: Pending): Unit = synchronized {
    val m = manifest()
    commitManifest(m.copy(pending = m.pending.updated(sourceTable,
      m.pending.getOrElse(sourceTable, Nil).filterNot(_ == p))))
    deletePendingDir(p)
  }

  /** Remove a dropped parked run's staged directory (never in `files`). */
  private def deletePendingDir(p: Pending): Unit = deleteDir(root.resolve(p.dir))

  private def deleteDir(dir: Path): Unit =
    if (Files.exists(dir)) {
      val s = Files.walk(dir)
      try s.sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(Files.deleteIfExists(_))
      finally s.close()
    }

  /** read_committed view of one topic. */
  def read(topic: String): DataFrame = {
    val files = manifest().files.map(f => root.resolve(f).toString)
    if (files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], recordSchema)
        .filter(col("topic") === topic)
    else spark.read.schema(recordSchema).parquet(files: _*).filter(col("topic") === topic)
  }

  /** S2/S3 direct publish: typed events → records, bypassing the source
    * log (the reference's Kafka-backed `EventStore.save`,
    * ReactorKafkaEventStore.java:188-212). T5 projection + T6 header
    * preparation: metadata entries as headers sorted by key — `kid`
    * included when present, exactly as the transformer appends it
    * (ReactorKafkaEventTransformer.java:147-167). */
  def publishEvents(topic: String, events: Seq[graft.model.Event]): Long = {
    import java.sql.Timestamp
    val rows = events.zipWithIndex.map { case (e, i) =>
      org.apache.spark.sql.Row(
        topic,
        e.key,
        e.payload,
        e.metadata.toSeq.sortBy(_._1).map { case (k, v) => org.apache.spark.sql.Row(k, v) },
        Timestamp.from(e.timestamp),
        i.toLong)
    }
    val schema = StructType(Seq(
      StructField("topic", StringType, nullable = false),
      StructField("key", BinaryType, nullable = true),
      StructField("value", BinaryType, nullable = true),
      recordSchema("headers"),
      StructField("timestamp", TimestampType, nullable = false),
      StructField("_seq", LongType, nullable = false)))
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(rows.asJava, schema)
    // the cursor read rides the BY-NAME argument so it evaluates inside
    // appendTxn's lock — reading it here would let two concurrent
    // publishers both advance from the same stale cursor
    appendTxn(df, s"_publish.$topic", {
      val cur = manifest().cursors.getOrElse(s"_publish.$topic", Cursor.zero)
      Cursor(cur.lsn + 1, cur.id + events.size)
    })
  }

  /** Next offset to be written for a partition (committed view). */
  def nextOffset(topic: String, partition: Int): Long =
    manifest().offsets.getOrElse((topic, partition), 0L)

  /** A2: consumer lag gauge = committed end − last processed − 1
    * (ReactorKafkaEventStore.java:379-400; the reference subtracts 2
    * because Kafka's read_committed end offset sits past the transaction
    * marker — this log has no marker records, so the adjustment is 1). */
  def consumerLag(topic: String, partition: Int, lastProcessed: Long): Long =
    math.max(nextOffset(topic, partition) - lastProcessed - 1, 0L)

  /** Uncommitted staged files: parquet under staging/ NOT referenced by
    * the manifest (committed files stay in their staging dir — only the
    * manifest defines visibility, so membership, not location, is what
    * separates a crash orphan from committed data). */
  def stagedFileCount(): Int = {
    val committed = manifest().files.toSet
    val s = Files.walk(root.resolve("staging"))
    try s.iterator().asScala.count(p =>
      p.getFileName.toString.endsWith(".parquet") &&
        !committed.contains(root.relativize(p).toString))
    finally s.close()
  }

  /** Compact the committed record files into `targetFiles`
    * (topic, partition, offset)-range-partitioned files: thousands of
    * small per-transaction files make the read_committed scan
    * file-open-bound at scale; compaction restores big sorted segments
    * whose min/max stats still prune offset-resumed consumers. Offsets,
    * progress cursors and parked ranges are untouched — only the `files`
    * list swaps, in the same atomic manifest commit as every transaction,
    * so in-flight readers keep their old generation until [[vacuum]]. */
  def compact(targetFiles: Int = 1): Unit = synchronized {
    val m = manifest()
    if (m.files.isEmpty) return
    val stage = root.resolve("staging").resolve(s"compact-${UUID.randomUUID()}")
    spark.read.schema(recordSchema)
      .parquet(m.files.map(f => root.resolve(f).toString): _*)
      .repartitionByRange(targetFiles, col("topic"), col("partition"), col("offset"))
      .sortWithinPartitions(col("topic"), col("partition"), col("offset"))
      .write.parquet(stage.toString)
    val files = {
      val s = Files.list(stage)
      try s.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .map(p => root.relativize(p).toString).toList.sorted
      finally s.close()
    }
    commitManifest(m.copy(files = files))
  }

  /** Reclaim staged parquet no committed reader can reach: files under
    * staging/ that are neither manifest-listed nor part of a parked
    * (pending) run, older than `graceMs` (size the grace to the
    * longest-running read, as with EventLog.vacuum). Returns files
    * deleted. */
  def vacuum(graceMs: Long = 0L): Int = synchronized {
    val m = manifest()
    val keepDirs = m.pending.values.flatten.map(p => root.resolve(p.dir)).toSet
    val live = m.files.toSet
    val cutoff = System.currentTimeMillis() - graceMs
    val s = Files.walk(root.resolve("staging"))
    val dead =
      try s.iterator().asScala.filter(p =>
        p.getFileName.toString.endsWith(".parquet") &&
          !live.contains(root.relativize(p).toString) &&
          !keepDirs.exists(p.startsWith) &&
          Files.getLastModifiedTime(p).toMillis <= cutoff).toList
      finally s.close()
    dead.foreach(Files.deleteIfExists(_))
    // drop transaction dirs left with no data files (only _SUCCESS/crc
    // markers) so the staging tree stays bounded
    val d = Files.list(root.resolve("staging"))
    try d.iterator().asScala
      .filter(p => Files.isDirectory(p) && !keepDirs.contains(p))
      .foreach { p =>
        val c = Files.walk(p)
        val hasParquet =
          try c.iterator().asScala.exists(_.getFileName.toString.endsWith(".parquet"))
          finally c.close()
        if (!hasParquet) deleteDir(p)
      }
    finally d.close()
    dead.size
  }
}

object KafkaShapedLog {
  val recordSchema: StructType = StructType(Seq(
    StructField("topic", StringType, nullable = false),
    StructField("partition", IntegerType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("key", BinaryType, nullable = true),
    StructField("value", BinaryType, nullable = true),
    StructField("headers", ArrayType(StructType(Seq(
      StructField("key", StringType, nullable = false),
      StructField("value", BinaryType, nullable = true))), containsNull = false),
      nullable = true),
    StructField("timestamp", TimestampType, nullable = false)))

  /** A parked out-of-order id run: raw rows staged at `dir`, covering
    * source ids `[from, to]` whose max lsn is `lsnMax`, awaiting the dense
    * prefix before promotion through appendTxn. */
  final case class Pending(from: Long, to: Long, lsnMax: Long, dir: String)

  /** Committed state: files + per-(topic,partition) next offsets + per-source
    * progress cursors + parked out-of-order ranges. Hand-rolled JSON (flat,
    * driver-side, tiny). */
  final case class Manifest(
      files: List[String],
      offsets: Map[(String, Int), Long],
      cursors: Map[String, Cursor],
      pending: Map[String, List[Pending]] = Map.empty) {
    def render: String = {
      def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
      val fs = files.map(q).mkString("[", ",", "]")
      val os = offsets.toSeq.sortBy(_._1)
        .map { case ((t, p), o) => s"${q(s"$t/$p")}: $o" }.mkString("{", ",", "}")
      val cs = cursors.toSeq.sortBy(_._1)
        .map { case (t, c) => s"${q(t)}: ${q(c.encoded)}" }.mkString("{", ",", "}")
      val ps = pending.toSeq.sortBy(_._1).filter(_._2.nonEmpty)
        .map { case (t, l) =>
          s"${q(t)}: ${l.map(p => q(s"${p.from}:${p.to}:${p.lsnMax}:${p.dir}")).mkString("[", ",", "]")}"
        }.mkString("{", ",", "}")
      s"""{"files": $fs, "offsets": $os, "cursors": $cs, "pending": $ps}"""
    }
  }

  object Manifest {
    /** Minimal parser for the exact shape [[Manifest.render]] emits. */
    def parse(s: String): Manifest = {
      def strings(arr: String): List[String] =
        "\"((?:[^\"\\\\]|\\\\.)*)\"".r.findAllMatchIn(arr)
          .map(_.group(1).replace("\\\"", "\"").replace("\\\\", "\\")).toList
      def section(name: String, required: Boolean = true): String = {
        val i = s.indexOf("\"" + name + "\"")
        if (i < 0) {
          require(!required, s"manifest missing $name")
          return ""
        }
        val start = s.indexOf(if (name == "files") '[' else '{', i)
        val end = s.indexOf(if (name == "files") ']' else '}', start)
        s.substring(start + 1, end)
      }
      val files = strings(section("files"))
      val offsets = "\"([^\"]+)/(\\d+)\"\\s*:\\s*(\\d+)".r
        .findAllMatchIn(section("offsets"))
        .map(m => (m.group(1), m.group(2).toInt) -> m.group(3).toLong).toMap
      // strict: a malformed cursor value must fail init, not be skipped
      // (EventReplicatorIT.java:251-277 — Cursor.parse throws
      // IllegalStateException on anything but "<lsn>:<id>")
      val cursors = "\"([^\"]+)\"\\s*:\\s*\"([^\"]*)\"".r
        .findAllMatchIn(section("cursors"))
        .map(m => m.group(1) -> Cursor.parse(m.group(2))).toMap
      // pending is optional (absent in pre-range manifests); entries are
      // "from:to:lsnMax:dir" strings per source table — strict parse, a
      // malformed range must fail init like a malformed cursor
      val pending = "\"([^\"]+)\"\\s*:\\s*\\[([^\\]]*)\\]".r
        .findAllMatchIn(section("pending", required = false))
        .map { m =>
          m.group(1) -> strings(m.group(2)).map { e =>
            e.split(":", 4) match {
              case Array(f, t, l, d) => Pending(f.toLong, t.toLong, l.toLong, d)
              case _ => throw new IllegalStateException(s"malformed pending range: $e")
            }
          }
        }.toMap
      Manifest(files, offsets, cursors, pending)
    }
  }

  def apply(root: String, spark: SparkSession, numPartitions: Int = 1): KafkaShapedLog =
    new KafkaShapedLog(Paths.get(root), spark, numPartitions)
}

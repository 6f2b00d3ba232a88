package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files
import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite

import graft.codec.{Cursor, MetadataCodec}
import graft.model.Event
import graft.replicate.Replicator
import graft.sources.KafkaShapedLog
import graft.store.EventLog

/** Replication pipeline: drain loop, EOS commit, resume, header build
  * (SURVEY §3-C, §5 cat 6; EventReplicatorWorkerIT analogs). */
class ReplicatorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def fixture(): (EventLog, KafkaShapedLog, Replicator) = {
    val log = EventLog(Files.createTempDirectory("graft-src-").toString, spark)
    val sink = KafkaShapedLog(Files.createTempDirectory("graft-sink-").toString, spark)
    (log, sink, new Replicator(log, sink, batchSize = 2))
  }

  private def ev(i: Int): Event =
    Event(s"key-$i".getBytes(UTF_8), s"payload-$i".getBytes(UTF_8),
      Instant.parse("2024-01-01T00:00:00Z").plusSeconds(i),
      Map("mk" -> s"mv-$i".getBytes(UTF_8)))

  /** Parked-run directories still on disk under staging/. */
  private def pendingDirCount(sink: KafkaShapedLog): Int = {
    val staging = sink.root.resolve("staging")
    if (!Files.isDirectory(staging)) 0
    else {
      val s = Files.list(staging)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.count(_.getFileName.toString.startsWith("pending-"))
      } finally s.close()
    }
  }

  test("drain loop replicates everything in multiple polls (multi-poll drain)") {
    val (log, sink, rep) = fixture()
    log.saveAll("t_events", (1 to 5).map(ev))
    assert(rep.run("t_events") == 5L)
    val rows = sink.read("t_events").orderBy("offset").collect()
    assert(rows.length == 5)
    assert(rows.map(_.getAs[Long]("offset")).toSeq == (0L to 4L))
    assert(rows.map(r => new String(r.getAs[Array[Byte]]("key"), UTF_8)).toSeq ==
      (1 to 5).map(i => s"key-$i"))
    // cursor persisted as (lsn,id) of the last replicated row
    assert(sink.cursorFor("t_events") == Cursor(1, 5))
    // idempotent: nothing new → zero
    assert(rep.run("t_events") == 0L)
  }

  test("same-LSN siblings with batch < group size replicate exactly once (G2)") {
    val (log, sink, rep) = fixture() // batchSize = 2
    log.saveAll("t_events", (1 to 5).map(ev)) // one lsn for all 5
    assert(rep.run("t_events") == 5L)
    val offsets = sink.read("t_events").collect().map(_.getAs[Long]("offset")).sorted
    assert(offsets.toSeq == (0L to 4L), "no duplicates, no gaps")
  }

  test("resume from cursor after new appends (EventReplicatorWorkerIT.java:282-326)") {
    val (log, sink, rep) = fixture()
    log.saveAll("t_events", (1 to 3).map(ev))
    assert(rep.run("t_events") == 3L)
    log.saveAll("t_events", (4 to 6).map(ev))
    assert(rep.lag("t_events") == 1L) // sink at lsn 1, source at lsn 2
    assert(rep.run("t_events") == 3L)
    assert(sink.read("t_events").count() == 6L)
    assert(sink.cursorFor("t_events") == Cursor(2, 6))
  }

  test("headers carry id, lsn and stored metadata, sorted by key (T9)") {
    val (log, sink, rep) = fixture()
    log.saveAll("t_events", Seq(ev(1)))
    rep.run("t_events")
    val r = sink.read("t_events").collect()(0)
    val headers = r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("headers"))
      .map(h => h.getAs[String]("key") -> new String(h.getAs[Array[Byte]]("value"), UTF_8))
    assert(headers.map(_._1) == Seq("id", "lsn", "mk"), "sorted header keys")
    assert(headers.toMap == Map("id" -> "1", "lsn" -> "1", "mk" -> "mv-1"))
  }

  test("value bytes and timestamp pass through verbatim (T5)") {
    val (log, sink, rep) = fixture()
    val e = ev(7)
    log.saveAll("t_events", Seq(e))
    rep.run("t_events")
    val r = sink.read("t_events").collect()(0)
    assert(r.getAs[Array[Byte]]("value").sameElements(e.payload))
    assert(r.getAs[java.sql.Timestamp]("timestamp").toInstant == e.timestamp)
  }

  test("crash before manifest commit leaves no visible records; retry is idempotent (G3)") {
    val (log, sink, rep) = fixture()
    log.saveAll("t_events", (1 to 4).map(ev))
    // Simulate the crash: stage records exactly like appendTxn but skip the
    // manifest commit — by writing to staging dir directly.
    val stagedBefore = sink.stagedFileCount()
    rep.pollAndSendBatch("t_events") // one committed batch of 2
    assert(sink.read("t_events").count() == 2)
    // now a poll whose commit "fails" → manifest unchanged; emulate by
    // reading cursor, then NOT calling appendTxn. The next poll re-reads
    // from the committed cursor → no loss, no dup.
    assert(sink.cursorFor("t_events") == Cursor(1, 2))
    assert(rep.run("t_events") == 2L)
    val offsets = sink.read("t_events").collect().map(_.getAs[Long]("offset")).sorted
    assert(offsets.toSeq == (0L to 3L))
    assert(stagedBefore <= sink.stagedFileCount()) // orphans never surface in reads
  }

  test("replicateAll discovers topics and drains each (S8/F4)") {
    val (log, sink, rep) = fixture()
    log.saveAll("a_events", (1 to 2).map(ev))
    log.saveAll("b_events", (3 to 4).map(ev))
    val res = rep.replicateAll()
    assert(res == Map("a_events" -> 2L, "b_events" -> 2L))
    assert(sink.read("a_events").count() == 2)
    assert(sink.read("b_events").count() == 2)
  }

  test("direct publish (S2): headers sorted, kid included, timestamps verbatim") {
    val spark2 = TestSpark.spark
    val sink = KafkaShapedLog(Files.createTempDirectory("graft-pub-").toString, spark2)
    val e = Event("k1".getBytes(UTF_8), "payload".getBytes(UTF_8),
      Instant.parse("2024-02-01T10:00:00.123Z"),
      Map("zk" -> "z".getBytes(UTF_8), "ak" -> "a".getBytes(UTF_8)))
    // storage layer adds kid for encrypted events — publish must carry it through
    val withKid = new Event(e.key, e.payload, e.timestamp,
      e.metadata + ("kid" -> "test-kms://k/1".getBytes(UTF_8)))
    assert(sink.publishEvents("pub_events", Seq(withKid)) == 1L)
    val r = sink.read("pub_events").collect()(0)
    val headerKeys = r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("headers"))
      .map(_.getAs[String]("key"))
    assert(headerKeys == Seq("ak", "kid", "zk"), "headers sorted by key, kid present")
    assert(r.getAs[java.sql.Timestamp]("timestamp").toInstant == withKid.timestamp)
    // successive publishes advance offsets
    assert(sink.publishEvents("pub_events", Seq(e)) == 1L)
    assert(sink.read("pub_events").count() == 2)
    assert(sink.nextOffset("pub_events", 0) == 2L)
  }

  test("concurrent publishes serialize: cursor counts every transaction, offsets dense") {
    val sink = KafkaShapedLog(Files.createTempDirectory("graft-pub2-").toString, TestSpark.spark)
    def e(i: Int) = Event(s"ck-$i".getBytes(UTF_8), s"p-$i".getBytes(UTF_8),
      Instant.parse("2024-02-01T10:00:00Z").plusSeconds(i))
    val threads = (0 until 4).map { t =>
      new Thread(() => { sink.publishEvents("cpub_events", Seq(e(2 * t), e(2 * t + 1))); () })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    // the by-name cursor evaluates inside appendTxn's lock, so all four
    // transactions count — a pre-lock read would lose lsn/id advances
    val cur = sink.manifest().cursors("_publish.cpub_events")
    assert(cur == Cursor(4, 8), s"lost publish cursor update: $cur")
    val offs = sink.read("cpub_events").collect()
      .groupBy(_.getAs[Int]("partition"))
      .map { case (p, rs) => p -> rs.map(_.getAs[Long]("offset")).sorted.toSeq }
    offs.foreach { case (p, os) =>
      assert(os == (0L until os.length), s"partition $p offsets not dense: $os")
    }
    assert(offs.values.map(_.size).sum == 8)
  }

  test("runLoop drains per tick at the configured cadence") {
    val (log, sink, rep) = fixture()
    log.saveAll("t_events", (1 to 3).map(ev))
    val perTick = rep.runLoop("t_events", intervalMillis = 0, maxTicks = 3)
    assert(perTick.head == 3L)
    assert(perTick.tail.forall(_ == 0L), "subsequent ticks see an empty backlog")
  }

  test("user metadata key 'lsn' replicates (duplicate header keys are legal, like Kafka)") {
    val (log, sink, rep) = fixture()
    log.saveAll("tl_events", Seq(
      Event("k".getBytes(UTF_8), "p".getBytes(UTF_8),
        Instant.parse("2024-01-01T00:00:00Z"),
        Map("lsn" -> "user-set".getBytes(UTF_8)))))  // 'lsn' is user-settable; id/kid are not (F2)
    assert(rep.run("tl_events") == 1L)
    val headers = sink.read("tl_events").collect()(0)
      .getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("headers")
      .map(h => h.getString(0) -> new String(h.getAs[Array[Byte]](1), UTF_8))
    // both the user entry and the system-stamped one survive, sorted by key
    assert(headers.count(_._1 == "lsn") == 2, headers)
    assert(headers.map(_._2).contains("user-set"))
    assert(headers.map(_._1) == headers.map(_._1).sorted)
  }

  test("streaming replication: AvailableNow drain is exactly-once, even with a wiped checkpoint") {
    val (log, sink, rep) = fixture()
    log.saveAll("ts_events", (1 to 5).map(ev))
    val ckpt = Files.createTempDirectory("graft-repl-ckpt-")
    val q1 = rep.replicateStream("ts_events", ckpt.resolve("c1").toString)
    q1.awaitTermination()
    assert(sink.read("ts_events").count() == 5)
    // new appends → second run picks up only the tail
    log.saveAll("ts_events", (6 to 8).map(ev))
    val q2 = rep.replicateStream("ts_events", ckpt.resolve("c1").toString)
    q2.awaitTermination()
    val rows = sink.read("ts_events").orderBy("offset").collect()
    assert(rows.length == 8)
    assert(rows.map(r => new String(r.getAs[Array[Byte]]("key"), UTF_8)).toSeq ==
      (1 to 8).map(i => s"key-$i"))
    // wiped checkpoint = full source replay; the sink cursor re-filter
    // must drop every already-committed row (EOS without the checkpoint)
    val q3 = rep.replicateStream("ts_events", ckpt.resolve("c2-fresh").toString)
    q3.awaitTermination()
    assert(sink.read("ts_events").count() == 8)
  }

  test("streaming replication stays exactly-once across mid-stream compaction and vacuum") {
    // compaction republishes EVERY row inside a fresh file generation, so
    // the directory-listing file source delivers the whole history again;
    // the sink-cursor replay filter must drop the already-committed prefix
    // while still committing genuinely new rows — and vacuuming the old
    // generation (already-processed files) must not disturb the stream.
    val (log, sink, rep) = fixture()
    val ckpt = Files.createTempDirectory("graft-repl-cv-")
    log.saveAll("cv_events", (1 to 4).map(ev))
    rep.replicateStream("cv_events", ckpt.resolve("c").toString).awaitTermination()
    assert(sink.read("cv_events").count() == 4)
    // append more, then compact BEFORE the stream drains the tail: the
    // compacted generation carries committed rows 1-4 AND new rows 5-8
    log.saveAll("cv_events", (5 to 8).map(ev))
    log.compact("cv_events", targetFiles = 1)
    assert(log.vacuum("cv_events") > 0) // old generation reclaimed
    rep.replicateStream("cv_events", ckpt.resolve("c").toString).awaitTermination()
    val rows = sink.read("cv_events").orderBy("offset").collect()
    assert(rows.length == 8, s"exactly-once violated: ${rows.length} rows")
    assert(rows.map(r => new String(r.getAs[Array[Byte]]("key"), UTF_8)).toSeq ==
      (1 to 8).map(i => s"key-$i"), "order or content corrupted")
    // another compact+vacuum with NOTHING new: a full re-delivery of the
    // compacted file must commit zero rows
    log.compact("cv_events", targetFiles = 2)
    assert(log.vacuum("cv_events") > 0)
    rep.replicateStream("cv_events", ckpt.resolve("c").toString).awaitTermination()
    assert(sink.read("cv_events").count() == 8)
    assert(sink.pendingRanges("cv_events").isEmpty, "no ranges parked by replays")
  }

  test("drain heals a retention gap above the sink cursor (fallback to ordered scan)") {
    val log = EventLog(Files.createTempDirectory("graft-src-").toString, spark)
    val sink = KafkaShapedLog(Files.createTempDirectory("graft-sink-").toString, spark)
    val rep = new Replicator(log, sink, batchSize = 2)
    log.saveAll("tg_events", (1 to 3).map(ev))  // lsn 1, ids 1-3
    log.saveAll("tg_events", (4 to 6).map(ev))  // lsn 2, ids 4-6
    log.saveAll("tg_events", (7 to 9).map(ev))  // lsn 3, ids 7-9
    // retention drops the first two appends' segment files entirely (ids 1-6)
    assert(log.truncateBefore("tg_events", Cursor(2, 6)) > 0)
    assert(log.read("tg_events").agg(org.apache.spark.sql.functions.min("id"))
      .collect()(0).getLong(0) == 7L)
    // fresh sink (cursor zero): the dense window (0, 2] is all-deleted —
    // without the scan fallback this would wedge at 0 forever
    assert(rep.run("tg_events") == 3L)
    val keys = sink.read("tg_events").collect()
      .map(r => new String(r.getAs[Array[Byte]]("key"), UTF_8)).sorted.toSeq
    assert(keys == (7 to 9).map(i => s"key-$i"))
  }

  test("streaming replication fails fast on a gap instead of silently dropping rows") {
    val log = EventLog(Files.createTempDirectory("graft-src-").toString, spark)
    val sink = KafkaShapedLog(Files.createTempDirectory("graft-sink-").toString, spark)
    val rep = new Replicator(log, sink)
    log.saveAll("tf_events", (1 to 3).map(ev))  // lsn 1, ids 1-3
    log.saveAll("tf_events", (4 to 6).map(ev))  // lsn 2, ids 4-6
    assert(log.truncateBefore("tf_events", Cursor(1, 3)) > 0) // ids 1-3 expire
    // the streaming tail is a FILE source (directory listing), so the gap
    // becomes visible to it at PHYSICAL removal — retention alone only
    // drops the manifest and retains the file for in-flight batch readers
    assert(log.vacuum("tf_events") > 0)
    val ckpt = Files.createTempDirectory("graft-repl-gap-")
    val q = rep.replicateStream("tf_events", ckpt.toString)
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(err).exists(c => c.isInstanceOf[IllegalStateException] &&
      c.getMessage.contains("gapped delivery")))
    assert(sink.read("tf_events").count() == 0) // nothing half-committed
    assert(sink.pendingRanges("tf_events").isEmpty,
      "a permanent gap must fail fast, not park forever")
  }

  test("commitStreamBatch parks a run delivered ahead and promotes it when the prefix lands") {
    import org.apache.spark.sql.functions.col
    val (log, sink, rep) = fixture()
    log.saveAll("t_events", (1 to 6).map(ev)) // lsn 1, ids 1-6
    val all = log.read("t_events")
    // deliver the tail first (out-of-order file delivery): parked, nothing visible
    assert(rep.commitStreamBatch("t_events", all.filter(col("id") >= 4)) == 0L)
    assert(sink.pendingRanges("t_events").map(p => (p.from, p.to)) == List((4L, 6L)))
    assert(sink.read("t_events").count() == 0)
    assert(sink.cursorFor("t_events") == Cursor.zero)
    // the dense prefix lands: commit + promote, atomically dropping the range
    assert(rep.commitStreamBatch("t_events", all.filter(col("id") <= 3)) == 6L)
    assert(sink.pendingRanges("t_events").isEmpty)
    assert(pendingDirCount(sink) == 0, "promoted parked dirs must be deleted from staging/")
    val rows = sink.read("t_events").orderBy("offset").collect()
    assert(rows.map(_.getAs[Long]("offset")).toSeq == (0L to 5L), "offsets dense")
    assert(rows.map(r => new String(r.getAs[Array[Byte]]("key"), UTF_8)).toSeq ==
      (1 to 6).map(i => s"key-$i"), "offset order == id order across the reordering")
    assert(sink.cursorFor("t_events") == Cursor(1, 6))
    // full replay (wiped checkpoint) → EOS re-filter drops everything
    assert(rep.commitStreamBatch("t_events", all) == 0L)
    assert(sink.read("t_events").count() == 6)
  }

  test("commitStreamBatch orders interleaved runs within one gapped batch") {
    import org.apache.spark.sql.functions.col
    val (log, sink, rep) = fixture()
    log.saveAll("t_events", (1 to 9).map(ev))
    // one batch containing runs [1-2], [4-5], [7-9] (ids 3 and 6 withheld)
    val holes = log.read("t_events").filter(col("id") =!= 3 && col("id") =!= 6)
    assert(rep.commitStreamBatch("t_events", holes) == 2L) // only [1-2] is dense
    assert(sink.pendingRanges("t_events").map(p => (p.from, p.to)) ==
      List((4L, 5L), (7L, 9L)))
    assert(sink.cursorFor("t_events") == Cursor(1, 2))
    // the missing ids arrive → both parked runs promote in id order
    assert(rep.commitStreamBatch("t_events",
      log.read("t_events").filter(col("id") === 3 || col("id") === 6)) == 7L)
    assert(sink.pendingRanges("t_events").isEmpty)
    val rows = sink.read("t_events").orderBy("offset").collect()
    assert(rows.map(r => new String(r.getAs[Array[Byte]]("key"), UTF_8)).toSeq ==
      (1 to 9).map(i => s"key-$i"))
    assert(sink.cursorFor("t_events") == Cursor(1, 9))
  }

  test("run() recovery drains parked ids; stale pending ranges are discarded") {
    import org.apache.spark.sql.functions.col
    val (log, sink, rep) = fixture()
    log.saveAll("t_events", (1 to 6).map(ev))
    rep.commitStreamBatch("t_events", log.read("t_events").filter(col("id") >= 4))
    assert(sink.pendingRanges("t_events").nonEmpty)
    // operator recovery: ordered drain covers ids 1-6 (including the parked run)
    assert(rep.run("t_events") == 6L)
    assert(sink.cursorFor("t_events") == Cursor(1, 6))
    // next stream batch GCs the now-stale parked range, commits nothing twice
    assert(rep.commitStreamBatch("t_events", log.read("t_events")) == 0L)
    assert(sink.pendingRanges("t_events").isEmpty)
    assert(pendingDirCount(sink) == 0, "discarded parked dirs must be deleted from staging/")
    assert(sink.read("t_events").count() == 6)
    assert(sink.read("t_events").collect().map(_.getAs[Long]("offset")).sorted.toSeq ==
      (0L to 5L), "no duplicates from the parked copy")
  }

  test("streaming replication survives out-of-order file delivery (park + promote, EOS)") {
    import org.apache.spark.sql.functions.{col, input_file_name, max => smax, min => smin}
    val srcDir = Files.createTempDirectory("graft-ooo-src-")
    val log = EventLog(srcDir.toString, spark)
    val sink = KafkaShapedLog(Files.createTempDirectory("graft-ooo-sink-").toString, spark)
    val rep = new Replicator(log, sink)
    log.saveAll("oo_events", (1 to 3).map(ev)) // lsn 1, ids 1-3
    log.saveAll("oo_events", (4 to 6).map(ev)) // lsn 2, ids 4-6
    // Invert modification times so the file source (which processes oldest
    // mtime first) delivers later-id files BEFORE earlier-id ones — the
    // coarse-mtime reordering the park/promote path exists for.
    val perFile = log.read("oo_events")
      .groupBy(input_file_name().as("f")).agg(smin(col("id")).as("lo")).collect()
      .map(r => r.getString(0).stripPrefix("file:") -> r.getLong(1))
      .sortBy(_._2)
    val t0 = java.time.Instant.now().minusSeconds(600)
    perFile.zipWithIndex.foreach { case ((f, _), i) =>
      // earliest ids get the NEWEST mtime → delivered last
      Files.setLastModifiedTime(java.nio.file.Paths.get(f),
        java.nio.file.attribute.FileTime.from(
          t0.plusSeconds((perFile.length - i) * 60L)))
    }
    val ckpt = Files.createTempDirectory("graft-ooo-ckpt-")
    val q = rep.replicateStream("oo_events", ckpt.resolve("c1").toString,
      maxFilesPerTrigger = 1)
    q.awaitTermination()
    assert(sink.pendingRanges("oo_events").isEmpty, "everything promoted")
    val rows = sink.read("oo_events").orderBy("offset").collect()
    assert(rows.map(_.getAs[Long]("offset")).toSeq == (0L to 5L), "offsets dense")
    assert(rows.map(r => new String(r.getAs[Array[Byte]]("key"), UTF_8)).toSeq ==
      (1 to 6).map(i => s"key-$i"), "offset order == (lsn,id) order despite reordering")
    assert(sink.cursorFor("oo_events") == Cursor(2, 6))
    // crash-replay: fresh checkpoint = full source replay → no duplicates
    val q2 = rep.replicateStream("oo_events", ckpt.resolve("c2").toString,
      maxFilesPerTrigger = 1)
    q2.awaitTermination()
    assert(sink.read("oo_events").count() == 6)
  }

  test("multi-topic streaming replication: one query, per-topic cursors exact (≥3 topics, interleaved)") {
    val log = EventLog(Files.createTempDirectory("graft-mt-src-").toString, spark)
    val sink = KafkaShapedLog(Files.createTempDirectory("graft-mt-sink-").toString, spark)
    val rep = new Replicator(log, sink)
    // interleaved appends across three topics (distinct per-topic lsn/id spaces)
    log.saveAll("ma_events", (1 to 2).map(ev))   // a: lsn1 ids1-2
    log.saveAll("mb_events", (1 to 3).map(ev))   // b: lsn1 ids1-3
    log.saveAll("mc_events", Seq(ev(1)))         // c: lsn1 id1
    log.saveAll("ma_events", (3 to 4).map(ev))   // a: lsn2 ids3-4
    log.saveAll("mc_events", (2 to 3).map(ev))   // c: lsn2 ids2-3
    log.saveAll("mb_events", Seq(ev(4)))         // b: lsn2 id4
    val topics = Seq("ma_events", "mb_events", "mc_events")
    val ckpt = Files.createTempDirectory("graft-mt-ckpt-")
    val q = rep.replicateStreamAll(topics, ckpt.resolve("c1").toString,
      maxFilesPerTrigger = 2) // several micro-batches, topics interleaved within them
    q.awaitTermination()
    assert(sink.cursorFor("ma_events") == Cursor(2, 4))
    assert(sink.cursorFor("mb_events") == Cursor(2, 4))
    assert(sink.cursorFor("mc_events") == Cursor(2, 3))
    for ((t, n) <- Seq(("ma_events", 4), ("mb_events", 4), ("mc_events", 3))) {
      val rows = sink.read(t).orderBy("offset").collect()
      assert(rows.length == n, t)
      assert(rows.map(_.getAs[Long]("offset")).toSeq == (0L until n.toLong), s"$t offsets dense")
      assert(rows.map(r => new String(r.getAs[Array[Byte]]("key"), UTF_8)).toSeq ==
        (1 to n).map(i => s"key-$i"), s"$t in (lsn,id) order")
    }
    // resume: new appends on two topics → second run commits only the deltas
    log.saveAll("ma_events", Seq(ev(5)))
    log.saveAll("mc_events", Seq(ev(4)))
    val q2 = rep.replicateStreamAll(topics, ckpt.resolve("c1").toString)
    q2.awaitTermination()
    assert(sink.cursorFor("ma_events") == Cursor(3, 5))
    assert(sink.cursorFor("mb_events") == Cursor(2, 4))
    assert(sink.cursorFor("mc_events") == Cursor(3, 4))
    assert(sink.read("ma_events").count() == 5)
    assert(sink.read("mc_events").count() == 4)
    // wiped checkpoint → full replay → cursor re-filter drops everything
    val q3 = rep.replicateStreamAll(topics, ckpt.resolve("c2-fresh").toString)
    q3.awaitTermination()
    assert(topics.map(t => sink.read(t).count()).sum == 13)
  }

  test("consumer tails the committed log with offset resume (S5 read_committed)") {
    import graft.sources.KafkaShapedConsumer
    import graft.store.TopicOffsets
    val (log, sink, rep) = fixture()
    val offsets = TopicOffsets(Files.createTempDirectory("graft-cons-").toString)
    val consumer = new KafkaShapedConsumer(sink, "t_events", offsets)

    log.saveAll("t_events", (1 to 4).map(ev))
    rep.run("t_events")
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    assert(consumer.poll(df => seen ++= df.collect().map(_.getAs[Long]("offset"))) == 4L)
    assert(seen.sorted.toSeq == (0L to 3L))

    // nothing new → empty poll, offsets untouched
    assert(consumer.poll(_ => fail("no batch expected")) == 0L)

    // new events → only the delta is delivered
    log.saveAll("t_events", (5 to 6).map(ev))
    rep.run("t_events")
    seen.clear()
    assert(consumer.poll(df => seen ++= df.collect().map(_.getAs[Long]("offset"))) == 2L)
    assert(seen.sorted.toSeq == Seq(4L, 5L))

    // crash inside handler → offsets NOT advanced → redelivery
    log.saveAll("t_events", Seq(ev(7)))
    rep.run("t_events")
    intercept[RuntimeException](consumer.poll(_ => throw new RuntimeException("boom")))
    seen.clear()
    assert(consumer.poll(df => seen ++= df.collect().map(_.getAs[Long]("offset"))) == 1L)
    assert(seen.toSeq == Seq(6L), "failed batch redelivered exactly")
  }

  test("sink compaction: files collapse, rows/offsets/cursor unchanged, vacuum reclaims, parked runs survive") {
    val (log, sink, rep) = fixture() // batchSize = 2 → several transactions
    log.saveAll("t_events", (1 to 7).map(ev))
    assert(rep.run("t_events") == 7L)
    val before = sink.read("t_events").orderBy("partition", "offset").collect().toSeq
    val filesBefore = sink.manifest().files.size
    assert(filesBefore >= 3, s"fixture should commit several files, got $filesBefore")
    // park a fake out-of-order range: its staged dir must survive vacuum
    import spark.implicits._
    sink.parkRange(
      log.read("t_events").filter($"id" === 7L), "t_events", 9L, 9L, 3L)
    sink.compact(targetFiles = 1)
    assert(sink.manifest().files.size == 1, "one compacted segment")
    assert(sink.read("t_events").orderBy("partition", "offset").collect().toSeq == before,
      "compaction must not change committed records")
    assert(sink.cursorFor("t_events") == Cursor(1, 7), "cursor untouched")
    val reclaimed = sink.vacuum()
    assert(reclaimed >= filesBefore, s"old generation reclaimed, got $reclaimed")
    assert(sink.read("t_events").orderBy("partition", "offset").collect().toSeq == before,
      "read_committed view intact after vacuum")
    assert(sink.pendingRanges("t_events").size == 1, "parked range metadata intact")
    assert(sink.readPending(sink.pendingRanges("t_events").head).count() == 1L,
      "parked rows must survive vacuum")
    // idempotent append continues on the compacted generation
    log.saveAll("t_events", Seq(ev(8)))
    assert(rep.run("t_events") == 1L)
    assert(sink.read("t_events").count() == 8L)
  }

  test("appendTxn multi-topic batch: offsets correct via the staged-read fallback") {
    // no production caller mixes topics in one transaction, but the
    // contract allows it — the observe fast path detects min(topic) !=
    // max(topic) and falls back to a grouped read of the staged files;
    // this pins that branch so it cannot rot unnoticed
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val spark2 = spark
    val sink = KafkaShapedLog(Files.createTempDirectory("graft-mt-").toString, spark, numPartitions = 2)
    val schema = StructType(Seq(
      StructField("topic", StringType, nullable = false),
      StructField("key", BinaryType, nullable = true),
      StructField("value", BinaryType, nullable = true),
      KafkaShapedLog.recordSchema("headers"),
      StructField("timestamp", TimestampType, nullable = false),
      StructField("_seq", LongType, nullable = false)))
    def rows(topic: String, n: Int, seq0: Long) = (0 until n).map(i =>
      Row(topic, s"k$i".getBytes(UTF_8), s"v$i".getBytes(UTF_8),
        Seq.empty[Row], java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), seq0 + i))
    import scala.jdk.CollectionConverters._
    val df = spark2.createDataFrame(
      (rows("mta_events", 3, 0L) ++ rows("mtb_events", 2, 100L)).asJava, schema)
    val sent = sink.appendTxn(df, "mixed", graft.codec.Cursor(1, 5))
    assert(sent == 5L)
    assert(sink.read("mta_events").count() == 3)
    assert(sink.read("mtb_events").count() == 2)
    // offsets dense per (topic, partition): next offsets sum to the counts
    val m = sink.manifest()
    assert(m.offsets.collect { case ((t, _), n) if t == "mta_events" => n }.sum == 3L)
    assert(m.offsets.collect { case ((t, _), n) if t == "mtb_events" => n }.sum == 2L)
    assert(sink.cursorFor("mixed") == Cursor(1, 5))
    // a second mixed commit continues both topics' offsets
    val df2 = spark2.createDataFrame(
      (rows("mta_events", 2, 200L) ++ rows("mtb_events", 1, 300L)).asJava, schema)
    assert(sink.appendTxn(df2, "mixed", Cursor(2, 8)) == 3L)
    val m2 = sink.manifest()
    assert(m2.offsets.collect { case ((t, _), n) if t == "mta_events" => n }.sum == 5L)
    assert(m2.offsets.collect { case ((t, _), n) if t == "mtb_events" => n }.sum == 3L)
  }

  test("malformed manifest fails fast (EventReplicatorIT.java:251-277 analog)") {
    import graft.sources.KafkaShapedLog.Manifest
    intercept[Exception](Manifest.parse("{}"))
    intercept[Exception](Manifest.parse("""{"files": [], "offsets": {}}""")) // missing cursors
    val m = Manifest.parse(
      """{"files": [], "offsets": {}, "cursors": {"t_events": "12:34"}}""")
    assert(m.cursors("t_events") == Cursor(12, 34))
    // malformed cursor value must fail init, not be silently skipped
    // (EventReplicatorIT.java:251-277)
    intercept[IllegalStateException](Manifest.parse(
      """{"files": [], "offsets": {}, "cursors": {"t_events": "1234"}}"""))
    intercept[IllegalStateException](Manifest.parse(
      """{"files": [], "offsets": {}, "cursors": {"t_events": "a:b"}}"""))
  }

  test("manifest renders and reparses losslessly") {
    import graft.sources.KafkaShapedLog.Manifest
    val m = Manifest(
      List("staging/x/part-0.parquet", "staging/y/part-1.parquet"),
      Map(("a_events", 0) -> 5L, ("b_events", 2) -> 9L),
      Map("a_events" -> Cursor(3, 17)))
    assert(Manifest.parse(m.render) == m)
  }

  test("manifest with non-empty pending ranges round-trips; malformed pending fails fast") {
    import graft.sources.KafkaShapedLog.{Manifest, Pending}
    val m = Manifest(
      List("staging/x/part-0.parquet"),
      Map(("a_events", 0) -> 5L),
      Map("a_events" -> Cursor(3, 17)),
      Map("a_events" -> List(
        Pending(18, 25, 4, "staging/pending-1/part.parquet"),
        Pending(30, 31, 5, "staging/pending-2/part.parquet"))))
    val back = Manifest.parse(m.render)
    assert(back == m)
    assert(back.pending("a_events").map(p => (p.from, p.to, p.lsnMax)) ==
      List((18L, 25L, 4L), (30L, 31L, 5L)))
    // empty pending lists are dropped on render, not kept as empty sections
    val m2 = m.copy(pending = Map("a_events" -> Nil))
    assert(Manifest.parse(m2.render).pending == Map.empty)
    // a malformed range entry must fail init like a malformed cursor
    intercept[IllegalStateException](Manifest.parse(
      """{"files": [], "offsets": {}, "cursors": {}, "pending": {"a_events": ["1:2"]}}"""))
  }

  test("drain job budget: full drain = ONE Spark job, idle poll = ZERO (scale: poll cadence)") {
    // The 100 TB shape of the drain loop: a backlog that fits one window
    // commits in a single observed write job (no pre-probe, no trailing
    // empty-window probe, no fallback scan — dense ids prove drained-ness),
    // and the steady-state idle poll is two metadata file reads, no job at
    // all. A regression here is exactly the r6 pipeline slowdown.
    val log = EventLog(Files.createTempDirectory("graft-src-").toString, spark)
    val sink = KafkaShapedLog(Files.createTempDirectory("graft-sink-").toString, spark)
    val rep = new Replicator(log, sink, batchSize = 100)
    log.saveAll("jb_events", (1 to 7).map(ev))
    def stableJobCount(): Int = {
      // statusTracker is fed by the async listener bus — wait until the
      // count stops moving before trusting it
      var last = -1
      var cur = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
      while (cur != last) {
        last = cur
        Thread.sleep(150)
        cur = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
      }
      cur
    }
    val before = stableJobCount()
    assert(rep.run("jb_events") == 7L)
    // ONE observed staged write = ≤2 jobs (AQE runs the shuffle stage and
    // the result stage as separate jobs); the old drain shape was 4-5
    // (pre-probe + write + offset re-count + trailing probe + fallback)
    assert(stableJobCount() - before <= 2,
      "a one-window drain must cost only the observed staged write's jobs")
    val afterDrain = stableJobCount()
    assert(rep.pollAndSendBatch("jb_events") == 0L)
    assert(rep.run("jb_events") == 0L)
    assert(stableJobCount() == afterDrain,
      "idle polls must cost zero Spark jobs (cursor-vs-cursor metadata check)")
  }

  test("idle check heals a stale LEGACY source cursor via reconcile (no wedged drain)") {
    // pre-manifest-cursor topic whose standalone cursor file went stale
    // (writer crashed before the cursor move): the zero-job idle check
    // would read source cursor == sink cursor == 0 and never drain — the
    // once-per-boot reconcile must repair it first
    val log = EventLog(Files.createTempDirectory("graft-src-").toString, spark)
    val sink = KafkaShapedLog(Files.createTempDirectory("graft-sink-").toString, spark)
    log.saveAll("lg_events", (1 to 5).map(ev))
    val meta = log.root.resolve("lg_events").resolve("_graft_meta")
    val legacy = Files.readString(meta.resolve("segments")).linesIterator
      .filterNot(_.startsWith("cursor=")).mkString("", "\n", "\n")
    Files.writeString(meta.resolve("segments"), legacy)
    Files.writeString(meta.resolve("cursor"), Cursor.zero.encoded)
    assert(log.currentCursor("lg_events") == Cursor.zero, "fixture: cursor is stale")
    val rep = new Replicator(log, sink, batchSize = 100)
    assert(rep.run("lg_events") == 5L, "stale legacy cursor wedged the drain")
    assert(sink.cursorFor("lg_events") == Cursor(1, 5))
    assert(rep.pollAndSendBatch("lg_events") == 0L)
  }

  test("per-key partition assignment preserves source order per partition (G9)") {
    val log = EventLog(Files.createTempDirectory("graft-src-").toString, spark)
    val sink = KafkaShapedLog(Files.createTempDirectory("graft-sink-").toString, spark, numPartitions = 4)
    val rep = new Replicator(log, sink, batchSize = 100)
    // several events per key so per-key order is observable
    val events = (1 to 20).map(i => Event(s"key-${i % 3}".getBytes(UTF_8),
      s"p-$i".getBytes(UTF_8), Instant.parse("2024-01-01T00:00:00Z").plusSeconds(i)))
    log.saveAll("t_events", events)
    rep.run("t_events")
    val rows = sink.read("t_events").collect()
    // same key → same partition
    val byKey = rows.groupBy(r => new String(r.getAs[Array[Byte]]("key"), UTF_8))
    byKey.foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Int]("partition")).distinct.length == 1)
      // offsets within the partition follow id order: payload seq increases
      val ordered = rs.sortBy(_.getAs[Long]("offset"))
        .map(r => new String(r.getAs[Array[Byte]]("value"), UTF_8).drop(2).toInt)
      assert(ordered.toSeq == ordered.sorted.toSeq, "per-key order preserved")
    }
  }
}

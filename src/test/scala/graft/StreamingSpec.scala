package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files
import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite

import graft.model.Event
import graft.store.EventLog
import graft.streaming.{EosProjection, Subscribe}

/** Structured-Streaming subscribe (S5 analog) + exactly-once projection
  * (G4: ReactorKafkaEventStoreIT.java:263-317 resume semantics, at
  * micro-batch granularity). */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ev(i: Int, minute: Int): Event =
    Event(s"key-$i".getBytes(UTF_8), s"p-$i".getBytes(UTF_8),
      Instant.parse("2024-01-01T00:00:00Z").plusSeconds(minute * 60L + i))

  test("subscribe tails the log and a projection sees every event exactly once") {
    val logDir = Files.createTempDirectory("graft-stream-").toString
    val log = EventLog(logDir, spark)
    log.saveAll("s_events", (1 to 6).map(ev(_, 0)))

    val stateDir = Files.createTempDirectory("graft-proj-")
    val proj = new EosProjection(stateDir)
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    val checkpoint = Files.createTempDirectory("graft-ckpt-").toString

    EosProjection.runAvailableNow(
      Subscribe.stream(spark, logDir, "s_events"), checkpoint, proj) { (df, _, stage) =>
      val ids = df.select("id").collect().map(_.getLong(0))
      seen ++= ids
      Files.writeString(stage.resolve("out"), ids.sorted.mkString(","))
    }
    assert(seen.sorted.toSeq == (1L to 6L))
    assert(proj.lastCommitted >= 0)

    // new events + second run from the same checkpoint: only the new batch
    log.saveAll("s_events", (7 to 9).map(ev(_, 1)))
    val before = seen.size
    EosProjection.runAvailableNow(
      Subscribe.stream(spark, logDir, "s_events"), checkpoint, proj) { (df, _, stage) =>
      val ids = df.select("id").collect().map(_.getLong(0))
      seen ++= ids
      Files.writeString(stage.resolve("out"), ids.sorted.mkString(","))
    }
    assert(seen.sorted.toSeq == (1L to 9L), "resume processes only the delta")
  }

  test("replayed batch ids are skipped (idempotent foreachBatch)") {
    val stateDir = Files.createTempDirectory("graft-proj2-")
    val proj = new EosProjection(stateDir)
    var applied = 0
    val df = spark.range(3).toDF()
    proj.foreachBatch { (_, _, _) => applied += 1 }(df, 0L)
    proj.foreachBatch { (_, _, _) => applied += 1 }(df, 0L) // replay
    proj.foreachBatch { (_, _, _) => applied += 1 }(df, 1L)
    assert(applied == 2, "batch 0 replay must be skipped")
    assert(proj.lastCommitted == 1L)
  }

  test("crash inside effects leaves no committed marker; retry applies cleanly") {
    val stateDir = Files.createTempDirectory("graft-proj3-")
    val proj = new EosProjection(stateDir)
    val df = spark.range(3).toDF()
    intercept[RuntimeException] {
      proj.foreachBatch { (_, _, _) => throw new RuntimeException("boom") }(df, 0L)
    }
    assert(proj.lastCommitted == -1L)
    proj.foreachBatch { (_, _, stage) =>
      Files.writeString(stage.resolve("out"), "ok")
    }(df, 0L)
    assert(proj.lastCommitted == 0L)
    assert(Files.exists(stateDir.resolve("batch-0").resolve("out")))
  }

  test("event-time tumbling window with watermark over the subscribe stream") {
    val logDir = Files.createTempDirectory("graft-stream2-").toString
    val log = EventLog(logDir, spark)
    // 4 events in minute-0 window, 2 in minute-60 window (1h tumble)
    log.saveAll("w_events", Seq(ev(1, 0), ev(2, 1), ev(3, 2), ev(4, 3), ev(5, 60), ev(6, 61)))

    val out = Files.createTempDirectory("graft-wout-")
    val proj = new EosProjection(Files.createTempDirectory("graft-proj4-"))
    val counts = scala.collection.mutable.Map.empty[String, Long]
    EosProjection.runAvailableNow(
      Subscribe.windowedCounts(
        Subscribe.stream(spark, logDir, "w_events"), watermark = "10 minutes", window_ = "1 hour"),
      Files.createTempDirectory("graft-ckpt2-").toString, proj) { (df, _, _) =>
      df.collect().foreach(r =>
        counts(r.getAs[java.sql.Timestamp]("window_start").toString) = r.getAs[Long]("n"))
    }
    // AvailableNow + watermark: the final watermark closes both windows
    assert(counts.values.sum == 6L)
    assert(counts.size == 2)
  }
}

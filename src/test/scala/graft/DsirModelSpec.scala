package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DsirModel

/** DsirModel — the train-once/apply-daily importance-resampling artifact.
  * The in-corpus path (score(fit(c), c)) is already pinned hash-exact by
  * the driver's sample_importance oracle; this spec pins the MODEL
  * lifecycle that the oracle can't see: count-merge append equals
  * refit, the persisted artifact scores identically, and frozen-model
  * scoring of unseen batches takes the smoothed zero-count fallback. */
class DsirModelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docs(rows: Seq[(Long, String, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang")
  }

  private val isEn = col("lang") === "en"

  private val corpusA = Seq(
    (0L, "alpha beta gamma alpha", "en"),
    (1L, "beta gamma delta", "en"),
    (2L, "zut alors fromage", "fr"),
    (3L, "fromage baguette zut zut", "fr"))
  private val corpusB = Seq(
    (10L, "alpha delta delta epsilon", "en"),
    (11L, "baguette chateau alors", "fr"),
    (12L, "gamma gamma gamma", "en"))

  private def modelRows(m: DataFrame): Map[Long, (Long, Long)] = {
    import spark.implicits._
    m.select($"f", $"r_cnt", $"t_cnt").as[(Long, Long, Long)]
      .collect().map { case (f, r, t) => f -> (r, t) }.toMap
  }

  private def scoreRows(m: DataFrame, d: DataFrame): Map[Long, (Long, Long, Long)] = {
    import spark.implicits._
    DsirModel.score(m, d)
      .select($"doc_id", $"n_tokens", $"imp_scaled", $"keep")
      .as[(Long, Long, Long, Long)]
      .collect().map { case (id, n, s, k) => id -> (n, s, k) }.toMap
  }

  test("append(fit(a), b) equals fit(a ++ b) exactly") {
    val refit = modelRows(DsirModel.fit(docs(corpusA ++ corpusB), isEn))
    val appended = modelRows(
      DsirModel.append(DsirModel.fit(docs(corpusA), isEn), docs(corpusB), isEn))
    assert(appended == refit)
  }

  test("write/load roundtrip scores identically to the in-memory model") {
    val m = DsirModel.fit(docs(corpusA), isEn)
    val path = Files.createTempDirectory("graft-dsir-model-").toString + "/m"
    DsirModel.write(m, path)
    val loaded = DsirModel.load(spark, path)
    assert(scoreRows(loaded, docs(corpusB)) == scoreRows(m, docs(corpusB)))
  }

  test("frozen-model scoring: unseen features take the smoothed zero-count ratio") {
    import spark.implicits._
    val m = DsirModel.fit(docs(corpusA), isEn)
    // a batch whose tokens the model has NEVER seen — every feature
    // falls back to sc0 = ((0+1)(rt+B)) / ((0+1)(tt+B)) scaled
    val unseen = docs(Seq((99L, "qqq www eee", "xx")))
    val (rt, tt) = m.agg(sum($"r_cnt"), sum($"t_cnt"))
      .as[(Long, Long)].collect().head
    val sc0 = math.floor(
      ((rt + DsirModel.Dim).toDouble / (tt + DsirModel.Dim).toDouble)
        * DsirModel.Scale + 0.5).toLong
    val got = scoreRows(m, unseen)(99L)
    assert(got._1 == 3L)
    assert(got._2 == 3L * sc0, s"expected all-fallback sum ${3L * sc0}, got ${got._2}")
  }

  test("streamed frozen-model scores equal the batch path, split across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext

    val m = DsirModel.fit(docs(corpusA), isEn).cache()
    try {
      val ms = MemoryStream[(Long, String, Long)]
      val stream = ms.toDF().toDF("doc_id", "text", "sec")
        .withColumn("ts", timestamp_seconds($"sec"))
        .select($"doc_id", $"text", $"ts")
      val got = scala.collection.mutable.Set.empty[(Long, Long, Long, Long)]
      val q = graft.streaming.StreamingDsir.score(stream, m)
        .writeStream
        .outputMode("append")
        .option("checkpointLocation",
          Files.createTempDirectory("graft-ckpt-dsir-").toString)
        .foreachBatch { (df: DataFrame, _: Long) =>
          got ++= df.collect().map(r =>
            (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4)))
          ()
        }
        .start()
      // corpusB docs arrive split across two micro-batches inside one
      // event-time window, plus an unseen-vocab doc; the far-future row
      // flushes the window past the watermark
      val all = corpusB :+ ((99L, "qqq www eee", "xx"))
      val (first, second) = all.splitAt(2)
      ms.addData(first.map { case (id, t, _) => (id, t, 60L) }: _*)
      q.processAllAvailable()
      ms.addData(second.map { case (id, t, _) => (id, t, 70L) }: _*)
      q.processAllAvailable()
      ms.addData((100000L, "flush", 10000000L))
      q.processAllAvailable()
      q.stop()

      val expected = DsirModel.score(m, docs(all))
        .select($"doc_id", $"n_tokens", $"imp_scaled", $"keep")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(expected.nonEmpty)
      assert(got.filter(_._1 != 100000L) == expected,
        s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
    } finally { m.unpersist(); () }
  }

  test("frozen model separates a like-target batch from an off-target batch") {
    // fit on A, score NEW docs drawn from the en vs fr vocabularies:
    // target-vocab docs must out-score off-target docs
    val m = DsirModel.fit(docs(corpusA), isEn)
    val batch = docs(Seq(
      (20L, "alpha beta gamma", "??"),   // en vocab
      (21L, "zut fromage baguette", "??"))) // fr vocab
    val s = scoreRows(m, batch)
    assert(s(20L)._2 > s(21L)._2,
      s"like-target doc should out-score off-target: $s")
  }
}

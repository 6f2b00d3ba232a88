package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CurationJob, DsirModel, Takedown}
import graft.streaming.StreamingTakedown

/** Continuous takedown: a stream of removal requests must land the same
  * end state as batch Takedown.run over their union, and the
  * at-least-once hazards of foreachBatch — replayed batches, the same id
  * requested twice across batches — must be no-ops (the Takedown
  * idempotency guard doing double duty as streaming EOS). */
class StreamingTakedownSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("streamed requests == batch takedown; replays and cross-batch duplicate ids are no-ops") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    import spark.implicits._
    GraftExtensions.register(spark)
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = Files.createTempDirectory("graft-stk-").toString

    CurationJob.run(spark, sf, dir, docFilter = col("doc_id") % 10 =!= 0)
    val before = spark.read.parquet(s"$dir/curated")
      .select($"doc_id").as[Long].collect().toSet

    val docsTable = Tables.load(spark, sf, "documents")
    val targets = before.filter(_ % 13 == 0).toSeq.sorted
    assert(targets.size >= 2, "need at least two takedown targets — vacuous")
    val (half1, half2) = targets.splitAt(targets.size / 2)
    val payload = docsTable.filter($"doc_id".isin(targets: _*))
      .select($"doc_id", $"text", $"lang")
      .as[(Long, String, String)].collect().map(t => t._1 -> t).toMap
    def rowsOf(ids: Seq[Long]) = ids.map(id => payload(id))

    val ms = MemoryStream[(Long, String, String)]
    val q = ms.toDF().toDF("doc_id", "text", "lang").writeStream
      .option("checkpointLocation", Files.createTempDirectory("graft-ckpt-stk-").toString)
      .foreachBatch(StreamingTakedown(spark, dir, $"lang" === "en"))
      .start()
    // batch 2 re-requests one id from batch 1 — the cross-batch duplicate
    ms.addData(rowsOf(half1): _*)
    q.processAllAvailable()
    ms.addData(rowsOf(half2 :+ half1.head): _*)
    q.processAllAvailable()
    q.stop()

    val after = Takedown.manifest(spark, dir)
      .select($"doc_id").as[Long].collect().toSet
    assert(after == before -- targets,
      s"streamed takedown != union: missing=${(before -- targets -- after).take(3)} " +
        s"extra=${(after -- (before -- targets)).take(3)}")

    // the model equals a refit WITHOUT the removed docs — the leg a
    // double-applied duplicate would corrupt first
    val remainingDocs = docsTable
      .filter($"doc_id".isin(after.toSeq: _*)).select($"doc_id", $"text")
    val refit = DsirModel.fit(
        remainingDocs.join(docsTable.select($"doc_id", $"lang"), "doc_id"),
        $"lang" === "en")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    def stored() = DsirModel.load(spark, s"$dir/dsir")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(stored() == refit, "streamed model != refit without the removed docs")

    // a full batch REPLAY (crash-restart at-least-once delivery): no-op
    StreamingTakedown(spark, dir, $"lang" === "en")(
      rowsOf(half1).toDF("doc_id", "text", "lang"), 0L)
    assert(stored() == refit, "replayed batch subtracted the model twice")
    assert(Takedown.manifest(spark, dir)
      .select($"doc_id").as[Long].collect().toSet == after)
    spark.catalog.clearCache()
  }
}

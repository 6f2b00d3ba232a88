package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LineSegmentIndex

/** The materialized bucketed segment-hash index behind the line-dedup
  * family: probing it must hand a new batch EXACTLY the registered
  * `dedup_lines_incr` verdicts without shuffling the index side, the
  * daily append must land the same hash set as a from-scratch rebuild,
  * and the streaming probe must equal the batch corpus-suppression
  * recompute across micro-batch splits. */
class LineSegmentIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def docs = {
    import spark.implicits._
    Tables.load(spark, dir, "documents").select($"doc_id", $"text")
  }

  test("probeDedup equals the registered dedup_lines_incr; the bucketed index never shuffles") {
    import spark.implicits._
    val corpus = docs.filter($"doc_id" % 10 =!= 0)
    val batch = docs.filter($"doc_id" % 10 === 0)
    try {
      LineSegmentIndex.materialize(corpus, "graft_lineidx")
      val probe = LineSegmentIndex.probeDedup(spark, "graft_lineidx", batch)

      val plan = probe.queryExecution.sparkPlan
      val shuffledScans = plan.collect { case e: ShuffleExchangeExec => e }
        .flatMap(_.collect { case f: FileSourceScanExec => f })
        .filter(_.tableIdentifier.exists(_.table == "graft_lineidx"))
      assert(shuffledScans.isEmpty,
        s"the bucketed index was shuffled:\n${probe.queryExecution.executedPlan}")

      val expected = SparkEntry.queries("dedup_lines_incr")(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
      val got = probe.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
      assert(got == expected,
        s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_lineidx")
      spark.catalog.clearCache()
    }
  }

  test("append(materialize(a), b) holds exactly materialize(a ∪ b)'s hash set") {
    import spark.implicits._
    val a = docs.filter($"doc_id" < 250)
    val b = docs.filter($"doc_id" >= 250)
    try {
      LineSegmentIndex.materialize(a, "graft_lineidx_inc")
      LineSegmentIndex.append(b, "graft_lineidx_inc")
      LineSegmentIndex.materialize(docs, "graft_lineidx_full")
      def pairs(t: String) = spark.table(t).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val (inc, full) = (pairs("graft_lineidx_inc"), pairs("graft_lineidx_full"))
      // full (doc_id, h) attribution matches the from-scratch rebuild —
      // set equality on the pairs implies it on the projected hash set
      assert(inc == full,
        s"missing=${(full -- inc).take(5)} extra=${(inc -- full).take(5)}")
      // and nothing duplicated by the append (files hold a distinct set)
      assert(spark.table("graft_lineidx_inc").count() == inc.size.toLong)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_lineidx_inc")
      spark.sql("DROP TABLE IF EXISTS graft_lineidx_full")
      spark.catalog.clearCache()
    }
  }

  test("streaming lineProbe equals the batch corpus-suppression recompute, split across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    GraftExtensions.register(spark)

    val seg = (p: String) => (1 to 12).map(i => s"$p$i").mkString(" ")
    val corpus = Seq(
      (1L, s"${seg("boiler")} ${seg("alpha")}"),
      (2L, s"${seg("boiler")} ${seg("beta")}")).toDF("doc_id", "text")
    val index = LineSegmentIndex.hashSet(corpus).cache()

    // doc 10: boilerplate segment + fresh tail (partial drop); doc 11 all
    // fresh; doc 12 is corpus doc 2 verbatim (drops everything)
    val streamDocs = Seq(
      (10L, 60L, s"${seg("boiler")} new1 new2 new3"),
      (11L, 70L, "solo1 solo2 solo3 solo4"),
      (12L, 80L, s"${seg("boiler")} ${seg("beta")}"))

    val ms = MemoryStream[(Long, Long, String)]
    val docsDf = ms.toDF().toDF("doc_id", "sec", "text")
      .withColumn("ts", timestamp_seconds($"sec"))
    val got = scala.collection.mutable.Map.empty[Long, (Long, Long, String)]
    val q = graft.streaming.StreamingDedup.lineProbe(docsDf, index)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("graft-ckpt-lp-").toString)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= df.collect().map(r =>
          r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
        ()
      }
      .start()
    streamDocs.take(2).foreach(d => ms.addData(d))
    q.processAllAvailable()
    ms.addData(streamDocs(2))
    q.processAllAvailable()
    ms.addData((99L, 1000000L, "watermark flush row")) // closes the open windows
    q.processAllAvailable()
    q.stop()

    // batch recompute of the same contract: suppress exactly the corpus
    // segment hashes, keep everything else
    val batchDf = streamDocs.map(d => (d._1, d._3)).toDF("doc_id", "text")
    val expected = LineSegmentIndex.reassemble(
      LineSegmentIndex.segments(batchDf)
        .join(index.withColumn("in_corpus", lit(1)), Seq("h"), "left")
        .withColumn("kept", $"in_corpus".isNull))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(got.toMap.view.filterKeys(_ != 99L).toMap == expected)
    // the verbatim-copy doc rebuilds to the empty string
    assert(got(12L)._2 == 0L && got(12L)._3 == "")
  }

  test("streaming spanScrubProbe equals the batch corpus-suppression scrub, incl. a trigram-less doc") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    GraftExtensions.register(spark)

    val corpus = Seq(
      (1L, "shared run one two three tail alpha"),
      (2L, "other words entirely here beta gamma")).toDF("doc_id", "text")
    val tri = graft.streaming.StreamingDedup.trigramSet(corpus).cache()

    // doc 10 contains corpus doc 1's "shared run one" trigram (plus the
    // overlapping continuations); doc 11 shares nothing; doc 12 has only
    // two tokens — no trigram, must still flow through unscrubbed
    val streamDocs = Seq(
      (10L, 60L, "intro shared run one two ending"),
      (11L, 70L, "fresh content with no overlap at all"),
      (12L, 80L, "tiny doc"))

    val ms = MemoryStream[(Long, Long, String)]
    val docsDf = ms.toDF().toDF("doc_id", "sec", "text")
      .withColumn("ts", timestamp_seconds($"sec"))
    val got = scala.collection.mutable.Map.empty[Long, (Long, Long, String)]
    val q = graft.streaming.StreamingDedup.spanScrubProbe(docsDf, tri)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("graft-ckpt-ss-").toString)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= df.collect().map(r =>
          r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
        ()
      }
      .start()
    streamDocs.foreach(d => ms.addData(d))
    q.processAllAvailable()
    ms.addData((99L, 1000000L, "watermark flush row closes windows"))
    q.processAllAvailable()
    q.stop()

    // batch spelling of the same contract over the same docs
    import org.apache.spark.sql.functions._
    val batchDf = streamDocs.map(d => (d._1, d._3)).toDF("doc_id", "text")
    val expected = batchDf
      .select($"doc_id", graft.queries.CrossHash.tokens($"text").as("w"),
        posexplode_outer(graft.queries.CrossHash.shingleHashes($"text")).as(Seq("q", "h")))
      .join(tri.withColumn("dup", lit(1)), Seq("h"), "left")
      .groupBy($"doc_id")
      .agg(first($"w").as("w"),
        sort_array(collect_list(when($"dup" === 1, $"q"))).as("ds"))
      .withColumn("kept", expr(
        "filter(sequence(0, size(w) - 1), i -> NOT exists(ds, q -> q >= i - 2 AND q <= i))"))
      .select($"doc_id", size($"w").cast("long"),
        (size($"w") - size($"kept")).cast("long"),
        array_join(expr("transform(kept, i -> element_at(w, i + 1))"), " "))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(got.toMap.view.filterKeys(_ != 99L).toMap == expected)
    // doc 10 lost its shared span, doc 11 untouched, doc 12 passed whole
    assert(got(10L)._2 > 0L)
    assert(got(11L)._2 == 0L && got(11L)._3 == streamDocs(1)._3)
    assert(got(12L)._2 == 0L && got(12L)._3 == "tiny doc")
  }
}

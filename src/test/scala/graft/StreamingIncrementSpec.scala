package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Bm25Index, CurationJob, DailyIncrement, DsirModel}
import graft.streaming.StreamingIncrement

/** Continuous ingestion: a document stream driven through
  * StreamingIncrement must land the same curation tree as the SAME
  * splits run as batch DailyIncrements, artifact for artifact, and the
  * at-least-once hazards of foreachBatch — a replayed batch — must be
  * no-ops (the content-addressed manifest + staged-increment protocol
  * doing double duty as streaming EOS). */
class StreamingIncrementSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("streamed document batches == batch DailyIncrements; a replayed batch is a no-op") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    import spark.implicits._
    GraftExtensions.register(spark)
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val sDir = Files.createTempDirectory("graft-sinc-").toString
    val bDir = Files.createTempDirectory("graft-binc-").toString

    CurationJob.run(spark, sf, sDir, docFilter = col("doc_id") % 10 =!= 0)
    CurationJob.run(spark, sf, bDir, docFilter = col("doc_id") % 10 =!= 0)

    // batch reference: the batch split (doc_id % 10 == 0) lands as two
    // sequential DailyIncrements — the order the stream will replay
    val r1 = DailyIncrement.run(spark, sf, bDir,
      batchFilter = col("doc_id") % 20 === 0)
    val r2 = DailyIncrement.run(spark, sf, bDir,
      batchFilter = col("doc_id") % 10 === 0 && col("doc_id") % 20 =!= 0)
    assert(r1.nBatchKept > 0 && r2.nBatchKept > 0, "vacuous: an empty batch")

    // streamed: the SAME splits as micro-batches
    val docsTable = Tables.load(spark, sf, "documents")
    def rowsOf(filter: org.apache.spark.sql.Column) = docsTable.filter(filter)
      .select($"doc_id", $"text", $"lang")
      .as[(Long, String, String)].collect().toSeq
    val embs = Tables.load(spark, sf, "embeddings").select($"vec_id", $"embedding")
    val ms = MemoryStream[(Long, String, String)]
    val q = ms.toDF().toDF("doc_id", "text", "lang").writeStream
      .option("checkpointLocation", Files.createTempDirectory("graft-ckpt-sinc-").toString)
      .foreachBatch(StreamingIncrement(spark, embs, sDir))
      .start()
    ms.addData(rowsOf(col("doc_id") % 20 === 0): _*)
    q.processAllAvailable()
    ms.addData(rowsOf(col("doc_id") % 10 === 0 && col("doc_id") % 20 =!= 0): _*)
    q.processAllAvailable()
    q.stop()

    // ---- every artifact equals the batch tree's ----
    def rows(d: String, sub: String, cols: Seq[String]) =
      spark.read.parquet(s"$d/$sub").select(cols.map(col): _*)
        .collect().map(_.toSeq).toSet
    assert(rows(sDir, "curated", Seq("doc_id", "n_tokens", "digest")) ==
      rows(bDir, "curated", Seq("doc_id", "n_tokens", "digest")), "curated diverged")
    assert(rows(sDir, "evalh", Seq("doc_id", "h")) ==
      rows(bDir, "evalh", Seq("doc_id", "h")), "evalh diverged")
    assert(rows(sDir, "shards", Seq("doc_id", "n_tokens", "shard", "shard_offset")) ==
      rows(bDir, "shards", Seq("doc_id", "n_tokens", "shard", "shard_offset")),
      "shards diverged")
    assert(graft.operators.PackedExport.readBase(spark, s"$sDir/packbase") ==
      graft.operators.PackedExport.readBase(spark, s"$bDir/packbase"), "pack base diverged")
    val fq = Seq((1L, "slow"), (1L, "merge"), (1L, "join")).toDF("query_id", "term")
    def probe(d: String) = Bm25Index.probe(spark, s"$d/bm25", fq)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(probe(sDir) == probe(bDir), "bm25 probe diverged")
    assert(rows(sDir, "vectors", Seq("vec_id")) ==
      rows(bDir, "vectors", Seq("vec_id")), "vector index diverged")
    def dsir(d: String) = DsirModel.load(spark, s"$d/dsir")
      .collect().map(_.toSeq).toSet
    assert(dsir(sDir) == dsir(bDir), "dsir model diverged")

    // a full batch REPLAY (crash-restart at-least-once delivery): every
    // digest is already in the manifest, so nothing appends anywhere
    StreamingIncrement(spark, embs, sDir)(
      rowsOf(col("doc_id") % 20 === 0).toDF("doc_id", "text", "lang"), 0L)
    assert(rows(sDir, "curated", Seq("doc_id", "n_tokens", "digest")) ==
      rows(bDir, "curated", Seq("doc_id", "n_tokens", "digest")),
      "replay mutated the manifest")
    assert(dsir(sDir) == dsir(bDir), "replay mutated the dsir model")
    assert(graft.operators.PackedExport.readBase(spark, s"$sDir/packbase") ==
      graft.operators.PackedExport.readBase(spark, s"$bDir/packbase"),
      "replay advanced the pack base")
    spark.catalog.clearCache()
  }

  test("streamed FULL-STRENGTH feed (all four gates) == batch daily; replay is a no-op on every index") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    import spark.implicits._
    GraftExtensions.register(spark)
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    // DailyIncrementSpec's full-stack geometry: one trigger per stage —
    // an eval doc (34), a span keeper (10) and loser (12), a bench quote
    // (11) in day 0; the batch carries a committed-span quote (100), a
    // near-dup of committed 10 (101, drops whole), a bench quote (103),
    // and a unique doc (104) — streamed as TWO micro-batches so the
    // monotone-id daily contract is exercised across triggers.
    val mod = graft.queries.CorpusQueries.EvalMod
    def uniq(p: String) = (1 to 30).map(i => s"$p$i").mkString(" ")
    def withTail(p: String, tail: Seq[String]) =
      ((1 to 23).map(i => s"$p$i") ++ tail).mkString(" ")
    val e = (1 to 30).map(i => s"e$i")
    val spanS = (1 to 7).map(i => s"s$i")
    val nearDupOf10 = ((1 to 23).map(i => s"a$i") ++ spanS.init :+ "z9").mkString(" ")
    val all = Seq(
      (34L, uniq("e")),
      (10L, withTail("a", spanS)), (11L, withTail("v", e.slice(4, 11))),
      (12L, withTail("b", spanS)),
      (100L, withTail("x", spanS)), (101L, nearDupOf10),
      (103L, withTail("m", e.slice(11, 18))), (104L, uniq("q")))
    assert(all.map(_._1).filter(_ % mod == 0) == Seq(34L),
      "eval-split geometry drifted")
    val synth = Files.createTempDirectory("graft-sfs-sf-").toString
    all.map { case (id, tx) => (id, tx, "en", "webA", tx.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$synth/documents.parquet")
    Seq((10L, Array.fill(64)(0.1f), 0)).toDF("vec_id", "embedding", "label")
      .write.parquet(s"$synth/embeddings.parquet")
    val sDir = Files.createTempDirectory("graft-sfs-s-").toString
    val bDir = Files.createTempDirectory("graft-sfs-b-").toString
    val kinds = Seq("nd", "ov", "be", "sp")
    val tables = kinds.flatMap(k => Seq(s"graft_sfs_${k}_s", s"graft_sfs_${k}_b"))
      .flatMap(t => Seq(t, s"${t}_counts", s"${t}_tombstones"))
    def idx(k: String, side: String) = s"graft_sfs_${k}_$side"
    try {
      for (side <- Seq("s", "b")) {
        CurationJob.run(spark, synth,
          if (side == "s") sDir else bDir, docFilter = col("doc_id") < 100,
          nearDupIndex = Some(idx("nd", side)), overlapIndex = Some(idx("ov", side)),
          benchIndex = Some(idx("be", side)), spanIndex = Some(idx("sp", side)))
      }
      // batch tree: the two splits as explicit DailyIncrements
      for (f <- Seq(col("doc_id") >= 100 && col("doc_id") < 104,
          col("doc_id") >= 104))
        DailyIncrement.run(spark, synth, bDir, batchFilter = f,
          nearDupIndex = Some(idx("nd", "b")), overlapIndex = Some(idx("ov", "b")),
          benchIndex = Some(idx("be", "b")), spanIndex = Some(idx("sp", "b")))

      // stream tree: the same splits as two micro-batches
      val docsTable = spark.read.parquet(s"$synth/documents.parquet")
      def rowsOf(f: org.apache.spark.sql.Column) = docsTable.filter(f)
        .select($"doc_id", $"text", $"lang")
        .as[(Long, String, String)].collect().toSeq
      val embs = spark.read.parquet(s"$synth/embeddings.parquet")
        .select($"vec_id", $"embedding")
      val body = StreamingIncrement(spark, embs, sDir,
        nearDupIndex = Some(idx("nd", "s")), overlapIndex = Some(idx("ov", "s")),
        benchIndex = Some(idx("be", "s")), spanIndex = Some(idx("sp", "s")))
      val ms = MemoryStream[(Long, String, String)]
      val q = ms.toDF().toDF("doc_id", "text", "lang").writeStream
        .option("checkpointLocation",
          Files.createTempDirectory("graft-ckpt-sfs-").toString)
        .foreachBatch(body)
        .start()
      ms.addData(rowsOf(col("doc_id") >= 100 && col("doc_id") < 104): _*)
      q.processAllAvailable()
      ms.addData(rowsOf(col("doc_id") >= 104): _*)
      q.processAllAvailable()
      q.stop()

      def manifest(d: String) = spark.read.parquet(s"$d/curated")
        .select($"doc_id", $"n_tokens", $"digest").collect().map(_.toSeq).toSet
      def shards(d: String) = spark.read.parquet(s"$d/shards")
        .select($"doc_id", $"n_tokens", $"shard".cast("long"), $"shard_offset")
        .collect().map(_.toSeq).toSet
      // index contents compared batch-column-free: both trees saw the
      // identical splits, but the row identity is what the probes read
      def ndRows(t: String) = spark.table(t)
        .select($"doc_id", $"h").collect().map(_.toSeq).toSet
      def ovRows(t: String) = spark.table(t)
        .select($"doc_id", $"q", $"h").collect().map(_.toSeq).toSet
      assert(manifest(sDir) == manifest(bDir), "curated diverged under the full stack")
      assert(shards(sDir) == shards(bDir), "shards diverged under the full stack")
      assert(ndRows(idx("nd", "s")) == ndRows(idx("nd", "b")),
        "near-dup index diverged: streamed != batch")
      assert(ndRows(idx("sp", "s")) == ndRows(idx("sp", "b")),
        "span index diverged: streamed != batch")
      assert(ovRows(idx("ov", "s")) == ovRows(idx("ov", "b")),
        "overlap index diverged: streamed != batch")
      assert(ovRows(idx("be", "s")) == ovRows(idx("be", "b")),
        "benchmark index diverged: streamed != batch")
      // stage verdicts actually fired (not a vacuous green): 101 dropped
      // as a near-dup, 100 lost span S, 103's bench quote scrubbed
      val toks = spark.read.parquet(s"$sDir/curated")
        .select($"doc_id", $"n_tokens")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(toks == Map(10L -> 30L, 11L -> 23L, 12L -> 23L,
        100L -> 23L, 103L -> 23L, 104L -> 30L),
        s"full-stack streamed verdicts drifted: $toks")

      // replay the first micro-batch: every artifact must be untouched
      val before = (manifest(sDir), kinds.map(k =>
        if (k == "nd" || k == "sp") ndRows(idx(k, "s")) else ovRows(idx(k, "s"))))
      body(rowsOf(col("doc_id") >= 100 && col("doc_id") < 104)
        .toDF("doc_id", "text", "lang"), 0L)
      assert(manifest(sDir) == before._1, "replay mutated the manifest")
      val after = kinds.map(k =>
        if (k == "nd" || k == "sp") ndRows(idx(k, "s")) else ovRows(idx(k, "s")))
      assert(after == before._2, "replay mutated a maintained index")
    } finally {
      tables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      spark.catalog.clearCache()
    }
  }

  test("streamed feed with the scrub stage on == batch daily; replay never duplicates benchmark rows") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    import spark.implicits._
    GraftExtensions.register(spark)
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    // the DailyIncrementSpec scrub geometry: 30-word benchmark docs,
    // 7-token quotes (18% shingle overlap — under the drop cut, scrubbed)
    def uniq(p: String) = (1 to 30).map(i => s"$p$i").mkString(" ")
    def quoting(p: String, ew: String, from: Int) =
      ((1 to 23).map(i => s"$p$i") ++ (from until from + 7).map(i => s"$ew$i"))
        .mkString(" ")
    val all = Seq((34L, uniq("e")), (10L, quoting("a", "e", 5)), (12L, uniq("v")),
      (119L, uniq("f")), (100L, quoting("x", "e", 12)),
      (101L, quoting("y", "f", 5)), (103L, uniq("u")),
      (204L, uniq("g")), (200L, quoting("z", "g", 5)),
      (201L, quoting("k", "e", 19)), (202L, uniq("m")))
    val synth = Files.createTempDirectory("graft-sbi-sf-").toString
    all.map { case (id, tx) => (id, tx, "en", "webA", tx.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$synth/documents.parquet")
    Seq((10L, Array.fill(64)(0.1f), 0)).toDF("vec_id", "embedding", "label")
      .write.parquet(s"$synth/embeddings.parquet")
    val sDir = Files.createTempDirectory("graft-sbi-s-").toString
    val bDir = Files.createTempDirectory("graft-sbi-b-").toString
    try {
      import org.apache.spark.sql.functions.col
      CurationJob.run(spark, synth, sDir, docFilter = col("doc_id") < 100,
        benchIndex = Some("graft_sbi_s"))
      CurationJob.run(spark, synth, bDir, docFilter = col("doc_id") < 100,
        benchIndex = Some("graft_sbi_b"))
      DailyIncrement.run(spark, synth, bDir,
        batchFilter = col("doc_id") >= 100 && col("doc_id") < 200,
        benchIndex = Some("graft_sbi_b"))
      DailyIncrement.run(spark, synth, bDir,
        batchFilter = col("doc_id") >= 200, benchIndex = Some("graft_sbi_b"))

      val docsTable = spark.read.parquet(s"$synth/documents.parquet")
      def rowsOf(f: org.apache.spark.sql.Column) = docsTable.filter(f)
        .select($"doc_id", $"text", $"lang")
        .as[(Long, String, String)].collect().toSeq
      val embs = spark.read.parquet(s"$synth/embeddings.parquet")
        .select($"vec_id", $"embedding")
      val ms = MemoryStream[(Long, String, String)]
      val q = ms.toDF().toDF("doc_id", "text", "lang").writeStream
        .option("checkpointLocation",
          Files.createTempDirectory("graft-ckpt-sbi-").toString)
        .foreachBatch(StreamingIncrement(spark, embs, sDir,
          benchIndex = Some("graft_sbi_s")))
        .start()
      ms.addData(rowsOf(col("doc_id") >= 100 && col("doc_id") < 200): _*)
      q.processAllAvailable()
      ms.addData(rowsOf(col("doc_id") >= 200): _*)
      q.processAllAvailable()
      q.stop()

      def manifest(d: String) = spark.read.parquet(s"$d/curated")
        .select($"doc_id", $"n_tokens", $"digest").collect().map(_.toSeq).toSet
      assert(manifest(sDir) == manifest(bDir), "curated diverged under the scrub stage")
      assert(manifest(sDir).map(r => (r(0), r(1))).contains((100L, 23L)),
        "streamed batch doc quoting the day-0 benchmark was not scrubbed")
      def benchRows(t: String) = spark.table(t)
        .select($"doc_id", $"q", $"h").collect().map(_.toSeq).toSet
      assert(benchRows("graft_sbi_s") == benchRows("graft_sbi_b"),
        "maintained benchmark index diverged from the batch tree's")

      // replay the first micro-batch: manifest AND the positioned
      // benchmark index must be byte-identical (a duplicated eval
      // occurrence row would corrupt every later island window)
      val before = benchRows("graft_sbi_s")
      StreamingIncrement(spark, embs, sDir, benchIndex = Some("graft_sbi_s"))(
        rowsOf(col("doc_id") >= 100 && col("doc_id") < 200)
          .toDF("doc_id", "text", "lang"), 0L)
      assert(manifest(sDir) == manifest(bDir), "replay mutated the manifest")
      assert(benchRows("graft_sbi_s") == before,
        "replay duplicated benchmark occurrence rows")
    } finally {
      Seq("graft_sbi_s", "graft_sbi_b").foreach { t =>
        spark.sql(s"DROP TABLE IF EXISTS $t")
        spark.sql(s"DROP TABLE IF EXISTS ${t}_tombstones")
      }
      spark.catalog.clearCache()
    }
  }
}

package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Bm25Index, CatalogCommit, CurationJob, DailyIncrement,
  Maintenance, OverlapIndex, ShingleIndex, Takedown, VectorIndex}
import graft.queries.CorpusQueries

/** Tree-level layout compaction: every [[Maintenance.compact]] leg must
  * be invisible to every probe surface, fold the per-increment batch
  * partitions back to a single base, and leave the daily path continuing
  * EXACTLY as if the compaction never ran (twin-tree equality). The
  * geometry is the DailyIncrementSpec full-stack fixture extended to two
  * increments + a probe/continuation batch, so every stage index is
  * non-vacuously exercised. */
class MaintenanceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("compact: probes identical, batches fold to base, daily path continues ≡ uncompacted twin, tombstones subsumed") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    GraftExtensions.register(spark)
    val mod = CorpusQueries.EvalMod
    def uniq(p: String) = (1 to 30).map(i => s"$p$i").mkString(" ")
    def withTail(p: String, tail: Seq[String]) =
      ((1 to 23).map(i => s"$p$i") ++ tail).mkString(" ")
    val e = (1 to 30).map(i => s"e$i")
    val spanS = (1 to 7).map(i => s"s$i")
    // near-dups: jaccard 29/31 ≈ .935 ≥ 0.6 against a committed keeper
    val nearDupOf104 = ((1 to 29).map(i => s"q$i") :+ "qq30").mkString(" ")
    val nearDupOf10 = ((1 to 23).map(i => s"a$i") ++ spanS.init :+ "zz").mkString(" ")
    val all = Seq(
      // day0 (<100): eval benchmark, span keeper, span loser, bench quote
      (34L, uniq("e")), (10L, withTail("a", spanS)),
      (12L, withTail("b", spanS)), (11L, withTail("v", e.slice(4, 11))),
      // batch1 (100..199): span hit, bench quote, clean keeper, eval doc
      // (136 = 8·17 — extends the benchmark index so the `be` leg is
      // non-vacuously multi-batch)
      (100L, withTail("x", spanS)), (103L, withTail("m", e.slice(11, 18))),
      (104L, uniq("q")), (136L, uniq("g")),
      // batch2 (200..299): span hit, near-dup of committed 104 (drops),
      // bench quote, clean keeper
      (210L, withTail("y", spanS)), (211L, nearDupOf104),
      (213L, withTail("n", e.slice(18, 25))), (215L, uniq("w")),
      // batch3 / probe batch (300+): span hit, near-dup of committed 10
      // (drops), bench quote, clean keeper
      (300L, withTail("z", spanS)), (301L, nearDupOf10),
      (303L, withTail("p", e.slice(4, 11))), (304L, uniq("r")))
    assert(all.map(_._1).filter(_ % mod == 0).sorted == Seq(34L, 136L),
      "eval-split geometry drifted")
    val synth = Files.createTempDirectory("graft-mt-sf-").toString
    all.map { case (id, tx) => (id, tx, "en", "webA", tx.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$synth/documents.parquet")
    all.map { case (id, _) =>
      (id, Array.tabulate(64)(d => (((id + d) % 7).toFloat + 1f) / 8f), 0)
    }.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$synth/embeddings.parquet")

    val pre = Seq("nd", "ov", "be", "sp")
    def tn(k: String, sfx: String) = s"graft_mt_${k}_$sfx"
    val tables = for (k <- pre; s <- Seq("a", "b"); t <- Seq(tn(k, s)))
      yield t
    def dropAll(): Unit = tables.flatMap(t => Seq(t, s"${t}_counts",
      s"${t}_tombstones")).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    dropAll()
    val dirA = Files.createTempDirectory("graft-mt-a-").toString
    val dirB = Files.createTempDirectory("graft-mt-b-").toString
    try {
      for ((d, sfx) <- Seq((dirA, "a"), (dirB, "b"))) {
        CurationJob.run(spark, synth, d, docFilter = col("doc_id") < 100,
          nearDupIndex = Some(tn("nd", sfx)), overlapIndex = Some(tn("ov", sfx)),
          benchIndex = Some(tn("be", sfx)), spanIndex = Some(tn("sp", sfx)))
        for (lo <- Seq(100L, 200L))
          DailyIncrement.run(spark, synth, d,
            batchFilter = col("doc_id") >= lo && col("doc_id") < lo + 100,
            nearDupIndex = Some(tn("nd", sfx)), overlapIndex = Some(tn("ov", sfx)),
            benchIndex = Some(tn("be", sfx)), spanIndex = Some(tn("sp", sfx)))
      }
      def manifest(d: String) = spark.read.parquet(s"$d/curated")
        .select($"doc_id", $"n_tokens")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(manifest(dirA) == Map(10L -> 30L, 11L -> 23L, 12L -> 23L,
        100L -> 23L, 103L -> 23L, 104L -> 30L,
        210L -> 23L, 213L -> 23L, 215L -> 30L),
        s"pre-compact manifest drifted: ${manifest(dirA)}")

      // ---- probe surfaces, captured on tree A before the compaction ----
      val probeBatch = Tables.load(spark, synth, "documents")
        .filter($"doc_id" >= 300).select($"doc_id", $"text")
      val minRun = CorpusQueries.MinRunTokens
      def ndPairs(t: String) = ShingleIndex
        .probe(spark, t, probeBatch, CorpusQueries.NearDupThreshold)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      def novelty(t: String) = ShingleIndex.noveltyProbe(spark, t, probeBatch)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      def spanRows(t: String) = ShingleIndex.spanKeepFirstProbe(spark, t, probeBatch)
        .select($"doc_id", $"n_removed", $"scrub_text")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      def ovRuns(t: String) = OverlapIndex.runsProbe(spark, t, probeBatch, minRun)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      def beScrub(t: String) = OverlapIndex.scrubProbe(spark, t, probeBatch, minRun)
        .select($"doc_id", $"n_removed", $"scrub_text")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      val qterms = Seq((1L, "a1"), (1L, "q5"), (2L, "w9")).toDF("query_id", "term")
      def bm25(d: String) = Bm25Index.probe(spark, d + "/bm25", qterms)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val vq = Seq((1L, Array.tabulate(64)(d => (((104L + d) % 7).toFloat + 1f) / 8f)))
        .toDF("query_id", "embedding")
      def vtop(d: String) = VectorIndex.probe(spark, d + "/vectors", vq, k = 3)
        .select($"query_id", $"neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

      val ndPre = ndPairs(tn("nd", "a")); val novPre = novelty(tn("nd", "a"))
      val spPre = spanRows(tn("sp", "a")); val ovPre = ovRuns(tn("ov", "a"))
      val bePre = beScrub(tn("be", "a")); val bmPre = bm25(dirA)
      val vPre = vtop(dirA)
      // non-vacuity: the geometry must actually fire every surface
      assert(ndPre.nonEmpty, "near-dup probe empty — geometry vacuous")
      assert(spPre.exists(_._2 > 0), "span probe excised nothing — vacuous")
      assert(ovPre.nonEmpty, "overlap runs probe empty — vacuous")
      assert(bePre.exists(_._2 > 0), "bench scrub excised nothing — vacuous")
      assert(bmPre.nonEmpty && vPre.nonEmpty, "retrieval probes empty")

      // ---- layout before: one batch partition per increment ----
      for (k <- Seq("nd", "ov", "sp"))
        assert(CatalogCommit.batchDirs(spark, tn(k, "a")) == Seq(0L, 1L, 2L),
          s"${tn(k, "a")} batch layout drifted")
      assert(CatalogCommit.batchDirs(spark, tn("be", "a")) == Seq(0L, 1L),
        "bench index should have day0 + the batch-1 eval doc's append")

      // the read-only audit sees the fragmentation the fold will remove
      val statusPre = Maintenance.status(spark, dirA)
      assert(statusPre.filter(_.kind == "shingle").map(_.batchParts).toSet
        == Set(3L), s"status missed the shingle fragmentation: $statusPre")
      assert(statusPre.find(_.kind == "bm25").exists(_.batchParts == 3L),
        s"status missed the bm25 fragmentation: $statusPre")

      // flat-artifact rows (incl. as-of provenance) must survive the
      // fold bit-identically — capture before
      def shardSet(d: String) = spark.read.parquet(s"$d/shards")
        .select($"doc_id", $"n_tokens", $"shard".cast("long"), $"shard_offset")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      def asOf(d: String, n: Long) = DailyIncrement.manifestAsOf(spark, d, n)
        .select($"doc_id", $"n_tokens", $"added_batch")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val shardsPre = shardSet(dirA)
      val asOfPre = (0L to 2L).map(n => asOf(dirA, n))
      def evalhSet(d: String) = spark.read.parquet(s"$d/evalh")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val evalhPre = evalhSet(dirA)

      val report = Maintenance.compact(spark, dirA)
      assert(report.map(_.kind).toSet ==
        Set("shingle", "overlap", "bm25", "vectors",
          "curated", "evalh", "shards"),
        s"compaction legs missing: $report")
      assert(shardSet(dirA) == shardsPre, "shard rows changed across compact")
      assert((0L to 2L).map(n => asOf(dirA, n)) == asOfPre,
        "as-of manifest history changed across compact")
      assert(evalhSet(dirA) == evalhPre, "evalh rows changed across compact")
      val statusPost = Maintenance.status(spark, dirA)
      assert(statusPost.filter(l => Set("shingle", "overlap", "bm25")(l.kind))
        .forall(_.batchParts == 1L),
        s"status still sees fragmentation after the fold: $statusPost")

      // every batch folded, every probe identical
      for (k <- pre)
        assert(CatalogCommit.batchDirs(spark, tn(k, "a")) == Seq(0L),
          s"${tn(k, "a")} not folded to base")
      assert(ndPairs(tn("nd", "a")) == ndPre, "near-dup probe changed")
      assert(novelty(tn("nd", "a")) == novPre, "novelty probe changed")
      assert(spanRows(tn("sp", "a")) == spPre, "span probe changed")
      assert(ovRuns(tn("ov", "a")) == ovPre, "overlap runs changed")
      assert(beScrub(tn("be", "a")) == bePre, "bench scrub changed")
      assert(bm25(dirA) == bmPre, "bm25 probe changed")
      assert(vtop(dirA) == vPre, "vector probe changed")
      assert(report.map(_.filesAfter).sum <= report.map(_.filesBefore).sum,
        s"compaction grew the file count: $report")

      // ---- the daily path continues as if nothing happened ----
      for ((d, sfx) <- Seq((dirA, "a"), (dirB, "b")))
        DailyIncrement.run(spark, synth, d,
          batchFilter = col("doc_id") >= 300,
          nearDupIndex = Some(tn("nd", sfx)), overlapIndex = Some(tn("ov", sfx)),
          benchIndex = Some(tn("be", sfx)), spanIndex = Some(tn("sp", sfx)))
      assert(manifest(dirA) == manifest(dirB),
        s"post-compact increment diverged: ${manifest(dirA)} vs ${manifest(dirB)}")
      def shardRows(d: String) = spark.read.parquet(s"$d/shards")
        .select($"doc_id", $"n_tokens", $"shard".cast("long"), $"shard_offset")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(shardRows(dirA) == shardRows(dirB), "shards diverged after compact")
      def idsOf(t: String) = spark.table(t)
        .select($"doc_id").distinct().as[Long].collect().toSet
      for (k <- pre)
        assert(idsOf(tn(k, "a")) == idsOf(tn(k, "b")),
          s"index ${tn(k, "a")} diverged from uncompacted twin")
      assert(bm25(dirA) == bm25(dirB), "bm25 diverged after compact")
      assert(vtop(dirA) == vtop(dirB), "vectors diverged after compact")

      // ---- tombstones in flight: compact subsumes vacuum ----
      // forget the span/near-dup keeper 10 on BOTH trees, compact only A:
      // physically-compacted A must keep matching tombstone-masked B
      val payload = Tables.load(spark, synth, "documents")
        .filter($"doc_id" === 10L).select($"doc_id", $"text", $"lang")
      for (d <- Seq(dirA, dirB))
        Takedown.run(spark, d, payload.select($"doc_id"), payload,
          $"lang" === "en")
      Maintenance.compact(spark, dirA)
      for (k <- pre) {
        assert(!spark.catalog.tableExists(s"${tn(k, "a")}_tombstones"),
          s"${tn(k, "a")} tombstones survived the compact")
        assert(!idsOf(tn(k, "a")).contains(10L),
          s"${tn(k, "a")} still physically holds the removed doc")
      }
      assert(ndPairs(tn("nd", "a")) == ndPairs(tn("nd", "b")),
        "post-takedown near-dup probe: compacted != masked twin")
      assert(spanRows(tn("sp", "a")) == spanRows(tn("sp", "b")),
        "post-takedown span probe: compacted != masked twin")
      assert(ovRuns(tn("ov", "a")) == ovRuns(tn("ov", "b")),
        "post-takedown overlap probe: compacted != masked twin")
      assert(beScrub(tn("be", "a")) == beScrub(tn("be", "b")),
        "post-takedown bench probe: compacted != masked twin")
      assert(bm25(dirA) == bm25(dirB), "post-takedown bm25 diverged")
      assert(vtop(dirA) == vtop(dirB), "post-takedown vectors diverged")

      // ---- idempotence: a second compact is result-identical and the
      // single-base catalog legs take the no-rewrite fast path ----
      val ptrBefore = Files.getLastModifiedTime(
        CatalogCommit.tableLocation(spark, tn("nd", "a")).resolve("_current"))
      val again = Maintenance.compact(spark, dirA)
      assert(again.forall(c => c.filesAfter == c.filesBefore),
        s"double-compact changed file counts: $again")
      assert(Files.getLastModifiedTime(
        CatalogCommit.tableLocation(spark, tn("nd", "a")).resolve("_current"))
        == ptrBefore,
        "single-base shingle index was rewritten — fast path regressed")
    } finally { dropAll(); spark.catalog.clearCache() }
  }

  test("compact edges: empty batch index and pure-del maintained stream survive the fold") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    GraftExtensions.register(spark)
    val t = "graft_mt_edge_empty"
    for (x <- Seq(t, s"${t}_counts", s"${t}_tombstones"))
      spark.sql(s"DROP TABLE IF EXISTS $x")
    try {
      val probeBatch = Seq((1L, "alpha beta gamma delta epsilon"),
        (2L, "alpha beta gamma delta zeta")).toDF("doc_id", "text")
      // a committed index over ZERO documents folds without error and
      // probes identically (batch-internal pairs only) before and after
      ShingleIndex.materialize(
        probeBatch.filter(lit(false)).select($"doc_id", $"text"), t)
      def pairs() = ShingleIndex.probe(spark, t, probeBatch, 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val pre = pairs()
      ShingleIndex.compact(spark, t)
      assert(pairs() == pre, "empty-index compact changed the probe")
      ShingleIndex.compact(spark, t) // idempotent on the empty base
      assert(pairs() == pre)

      // a maintained index that has only ever seen DELETES (tombstones,
      // no data files) folds to an empty base and then accepts adds
      val root = Files.createTempDirectory("graft-mt-edge-")
      val m = new graft.streaming.MaintainedShingleIndex(root, spark)
      m.update(Seq((77L, "", "del")).toDF("doc_id", "text", "op"), 0L)
      assert(m.lastCommitted == 0L)
      m.compact()
      assert(m.probe(probeBatch, 0.5).collect().map(r =>
        (r.getLong(0), r.getLong(1))).toSet == pre,
        "pure-del maintained compact broke the empty-corpus probe")
      m.update(probeBatch.withColumn("op", lit("add")), 1L)
      val want = {
        ShingleIndex.materialize(probeBatch, s"${t}_ref")
        ShingleIndex.probe(spark, s"${t}_ref", probeBatch
          .withColumn("doc_id", $"doc_id" + 100), 0.5)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      }
      assert(m.probe(probeBatch.withColumn("doc_id", $"doc_id" + 100), 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet == want,
        "adds after a pure-del compact diverged from a batch materialize")
    } finally {
      for (x <- Seq(t, s"${t}_counts", s"${t}_tombstones",
          s"${t}_ref", s"${t}_ref_counts"))
        spark.sql(s"DROP TABLE IF EXISTS $x")
      spark.catalog.clearCache()
    }
  }

  test("auto(): threshold policy folds exactly the fragmented artifacts; a staged increment refuses maintenance loud; a pointer reset strands the staged apply in the stale-target gate") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    GraftExtensions.register(spark)
    def uniq(p: String) = (1 to 30).map(i => s"$p$i").mkString(" ")
    val all = Seq(
      (10L, uniq("a")), (11L, uniq("b")), (34L, uniq("e")),
      (100L, uniq("c")), (104L, uniq("q")), (136L, uniq("g")),
      (210L, uniq("w")), (211L, uniq("h")), (213L, uniq("n")),
      (300L, uniq("x")), (301L, uniq("y")),
      (400L, uniq("z")), (401L, uniq("k")))
    val synth = Files.createTempDirectory("graft-mta-sf-").toString
    all.map { case (id, tx) => (id, tx, "en", "webA", tx.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$synth/documents.parquet")
    all.map { case (id, _) =>
      (id, Array.tabulate(64)(d => (((id + d) % 7).toFloat + 1f) / 8f), 0)
    }.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$synth/embeddings.parquet")
    val nd = "graft_mta_nd"
    def dropAll(): Unit = Seq(nd, s"${nd}_counts", s"${nd}_tombstones")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    dropAll()
    val out = Files.createTempDirectory("graft-mta-").toString
    try {
      CurationJob.run(spark, synth, out, docFilter = col("doc_id") < 100,
        nearDupIndex = Some(nd))
      for (lo <- Seq(100L, 200L))
        DailyIncrement.run(spark, synth, out,
          batchFilter = col("doc_id") >= lo && col("doc_id") < lo + 100,
          nearDupIndex = Some(nd))
      assert(CatalogCommit.batchDirs(spark, nd) == Seq(0L, 1L, 2L),
        "fixture geometry drifted")

      // ---- threshold policy: ONLY the batch-axis artifacts past
      // maxBatchParts fold; layouts under their thresholds are not even
      // visited (no report row, no rewrite — mtime pin) ----
      val vecDir = java.nio.file.Paths.get(s"$out/vectors")
      val vecStamp = Files.getLastModifiedTime(vecDir)
      val r1 = Maintenance.auto(spark, out,
        maxBatchParts = 2, maxFiles = 1000000)
      assert(r1.map(_.kind).toSet == Set("shingle", "bm25"),
        s"auto() visited the wrong artifacts: $r1")
      assert(r1.exists(_.name == nd), s"auto() missed the shingle fold: $r1")
      assert(CatalogCommit.batchDirs(spark, nd) == Seq(0L),
        "auto() did not fold the fragmented shingle index")
      assert(Files.getLastModifiedTime(vecDir) == vecStamp,
        "auto() rewrote an artifact under its thresholds")
      // converged tree: a second auto() finds nothing past threshold
      assert(Maintenance.auto(spark, out,
        maxBatchParts = 2, maxFiles = 1000000).isEmpty,
        "auto() re-folded a converged tree")

      // one more applied increment re-fragments (batch 1 on the folded
      // base) so the race below has a real stale window
      DailyIncrement.run(spark, synth, out,
        batchFilter = col("doc_id") >= 300 && col("doc_id") < 400,
        nearDupIndex = Some(nd))
      assert(CatalogCommit.batchDirs(spark, nd) == Seq(0L, 1L))

      // ---- the quiescence race: stage (but do not apply) the next
      // increment — the tree is MID-INCREMENT and every maintenance fold
      // must refuse loud instead of resetting the staged targets ----
      DailyIncrement.stage(spark,
        Tables.load(spark, synth, "documents").filter($"doc_id" >= 400)
          .select($"doc_id", $"text", $"lang"),
        Tables.load(spark, synth, "embeddings")
          .select($"vec_id", $"embedding"),
        out, graft.functions.Tokenizer.Whitespace, nearDupIndex = Some(nd))
      val e1 = intercept[IllegalArgumentException] {
        Maintenance.compact(spark, out) }
      assert(e1.getMessage.contains("not quiescent"), e1.getMessage)
      val e2 = intercept[IllegalArgumentException] {
        Maintenance.auto(spark, out, maxBatchParts = 0) }
      assert(e2.getMessage.contains("not quiescent"), e2.getMessage)

      // ... and if an operator resets the index pointer ANYWAY (the
      // index-level compact has no tree view), the staged apply step
      // dies in appendAs's stale-target gate — loud, never a silent
      // mis-append onto the folded base
      spark.catalog.clearCache()
      ShingleIndex.compact(spark, nd)
      assert(CatalogCommit.batchDirs(spark, nd) == Seq(0L))
      val e3 = intercept[IllegalArgumentException] {
        DailyIncrement.recover(spark, out) }
      assert(e3.getMessage.contains("stale"),
        s"expected the stale-target failure, got: ${e3.getMessage}")
    } finally { dropAll(); spark.catalog.clearCache() }
  }

  test("auto() reaches the streaming-maintained twins: status sees their fragmentation, thresholds fold exactly the fragmented ones, the fold is invisible between triggers of a LIVE query") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    GraftExtensions.register(spark)
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val out = Files.createTempDirectory("graft-mts-").toString

    val docs = Tables.load(spark, dir, "documents")
      .select($"doc_id", $"text").filter($"text".isNotNull)
    val rows = docs.filter($"doc_id" < 300).as[(Long, String)].collect()
    val third = rows.length / 3
    val (b1, rest) = rows.splitAt(third)
    val (b2, b3) = rest.splitAt(third)
    val probeBatch = docs.filter($"doc_id" >= 350).cache()

    // streamed SHINGLE twin: three micro-batches → batch={0,1,2} dirs
    val shRoot = Files.createTempDirectory("graft-mts-sh-")
    val sh = new graft.streaming.MaintainedShingleIndex(shRoot, spark)
    val ms = MemoryStream[(Long, String)]
    val q = ms.toDF().toDF("doc_id", "text").writeStream
      .option("checkpointLocation", Files.createTempDirectory("graft-mts-ck-").toString)
      .foreachBatch(sh.update _).start()

    // streamed VECTOR twin: ONE batch — under threshold, must stay untouched
    val vecRoot = Files.createTempDirectory("graft-mts-vec-")
    val mv = new graft.streaming.MaintainedVectorIndex(vecRoot, spark)
    val vrows = Tables.load(spark, dir, "embeddings")
      .select($"vec_id", $"embedding".cast("array<double>"))
      .as[(Long, Array[Double])].collect()
    val msv = MemoryStream[(Long, Array[Double])]
    val qv = msv.toDF().toDF("vec_id", "embedding").writeStream
      .option("checkpointLocation", Files.createTempDirectory("graft-mts-ckv-").toString)
      .foreachBatch(mv.update _).start()
    try {
      ms.addData(b1.toSeq: _*); q.processAllAvailable()
      ms.addData(b2.toSeq: _*); q.processAllAvailable()
      msv.addData(vrows.toSeq: _*); qv.processAllAvailable()

      // the operator's ONE-LINE registration — same registry a takedown
      // uses; kind detects from the layout, so "stream" covers all five
      Takedown.recordIndex(out, "stream", shRoot.toString)
      Takedown.recordIndex(out, "stream", vecRoot.toString)

      val st = Maintenance.status(spark, out)
      assert(st.map(l => l.kind -> l.name).toSet == Set(
        "stream-shingle" -> shRoot.toString,
        "stream-vector" -> vecRoot.toString), st.toString)
      assert(st.find(_.kind == "stream-shingle").get.batchParts == 2L, st.toString)
      assert(st.find(_.kind == "stream-vector").get.batchParts == 1L, st.toString)

      ms.addData(b3.toSeq: _*); q.processAllAvailable() // → 3 batch parts

      // BETWEEN triggers (both queries alive, idle — the documented
      // maintenance window): auto() folds ONLY the fragmented shingle
      // twin; the single-batch vector twin is not even visited
      def pairSet(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val pre = pairSet(sh.probe(probeBatch, 0.6))
      assert(pre.nonEmpty, "vacuous probe geometry")
      val vecStamp = Files.getLastModifiedTime(vecRoot.resolve("vectors"))
      assert(q.isActive && qv.isActive, "fixture: the queries must be live here")
      val rep = Maintenance.auto(spark, out,
        maxBatchParts = 2, maxFiles = 1000000)
      assert(rep.map(_.kind) == Seq("stream-shingle"),
        s"auto() visited the wrong streamed twins: $rep")
      // the folded metric is the BATCH-DIR count (3 → 1); at toy scale the
      // file count can rise (the fold re-buckets pairs to 32 partitions) —
      // the report just has to be accurate about it
      assert(rep.head.filesBefore > 0 && rep.head.filesAfter > 0, rep.toString)
      assert(graft.streaming.CompactSwap.batchIds(shRoot.resolve("pairs")) == Seq(0L),
        "auto() did not fold the fragmented streamed index")
      assert(Maintenance.status(spark, out)
        .find(_.kind == "stream-shingle").get.batchParts == 1L,
        "post-fold status must report a single batch part")
      assert(Files.getLastModifiedTime(vecRoot.resolve("vectors")) == vecStamp,
        "auto() rewrote a streamed twin under its thresholds")
      assert(pairSet(sh.probe(probeBatch, 0.6)) == pre,
        "between-trigger auto() changed the probe")

      // converged: a second auto() finds nothing past threshold
      assert(Maintenance.auto(spark, out,
        maxBatchParts = 2, maxFiles = 1000000).isEmpty,
        "auto() re-folded a converged streamed twin")

      // the live stream continues appending onto the folded base
      ms.addData((900001L, "omega psi chi phi upsilon")); q.processAllAvailable()
      assert(sh.lastCommitted >= 3L,
        s"stream did not continue past the fold: ${sh.lastCommitted}")
      assert(pairSet(sh.probe(probeBatch, 0.6)) == pre,
        "post-fold append of an unrelated doc changed the probe")
    } finally {
      q.stop(); qv.stop(); probeBatch.unpersist(); spark.catalog.clearCache()
    }
  }
}

package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Bm25Index, CurationJob, DailyIncrement, DsirModel,
  LineSegmentIndex, ShingleIndex, Takedown, VectorIndex}
import graft.queries.{CorpusQueries, RetrievalQueries}

/** End-to-end takedown: after Takedown.run, every artifact a consumer
  * reads must behave as if the removed documents had never been kept —
  * masked manifest/shards, retrieval probes equal to rebuilds on the
  * remaining corpus, and a selection model equal to a refit — without
  * any corpus-sized rewrite. */
class TakedownSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("takedown masks manifest+shards and leaves indexes/model == rebuilds on the remaining corpus") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    GraftExtensions.register(spark)
    val dir = Files.createTempDirectory("graft-takedown-").toString

    // day0 over the % 10 != 0 split so the repack-composition leg below
    // has genuinely new batch docs to increment with
    CurationJob.run(spark, sf, dir, docFilter = col("doc_id") % 10 =!= 0)
    val before = spark.read.parquet(s"$dir/curated")
      .select($"doc_id", $"n_tokens", $"digest")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val shardsBefore = spark.read.parquet(s"$dir/shards")
      .select($"doc_id", $"shard".cast("long"), $"shard_offset")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val evalhBefore = spark.read.parquet(s"$dir/evalh")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val removedIds = before.map(_._1).filter(_ % 13 == 0)
    assert(removedIds.nonEmpty, "no kept doc matches the takedown set — vacuous")
    val docsTable = Tables.load(spark, sf, "documents")
    for (t <- Seq("graft_tk_shidx", "graft_tk_shidx_tombstones",
        "graft_tk_shidx_counts", "graft_tk_shidx_ref", "graft_tk_shidx_ref_counts",
        "graft_tk_lineidx", "graft_tk_lineidx_tombstones", "graft_tk_lineidx_ref",
        "graft_tk_ovidx", "graft_tk_ovidx_tombstones", "graft_tk_ovidx_ref"))
      spark.sql(s"DROP TABLE IF EXISTS $t")
    // dedup surfaces over the kept corpus — takedown must forget these
    // too. One removed doc's text is swapped for a verbatim copy of a
    // batch doc so the before/after probes CANNOT be vacuously equal:
    // pre-takedown the copy suppresses the batch doc as a duplicate of
    // (what will become) forgotten data.
    val dupBatchDoc = docsTable.filter($"doc_id" % 10 === 0)
      .orderBy($"doc_id").select($"doc_id", $"text").limit(1)
      .collect()(0)
    val synthId = removedIds.min
    val idxCorpus = docsTable
      .filter($"doc_id".isin(before.map(_._1).toSeq: _*))
      .select($"doc_id",
        when($"doc_id" === synthId, lit(dupBatchDoc.getString(1)))
          .otherwise($"text").as("text"))
    ShingleIndex.materialize(idxCorpus, "graft_tk_shidx")
    LineSegmentIndex.materialize(idxCorpus, "graft_tk_lineidx")
    graft.operators.OverlapIndex.materialize(idxCorpus, "graft_tk_ovidx")
    val probeBatch = docsTable.filter($"doc_id" % 10 === 0)
      .select($"doc_id", $"text")
    def shPairs(name: String) = ShingleIndex.probe(spark, name, probeBatch, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def lineRows(name: String) = LineSegmentIndex.probeDedup(spark, name, probeBatch)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    def ovRuns(name: String) = graft.operators.OverlapIndex
      .runsProbe(spark, name, probeBatch, graft.queries.CorpusQueries.MinRunTokens)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val shPre = shPairs("graft_tk_shidx")
    val linePre = lineRows("graft_tk_lineidx")
    val ovPre = ovRuns("graft_tk_ovidx")
    assert(shPre.exists(p => p._1 == synthId || p._2 == synthId),
      "vacuous: the planted duplicate never paired in the shingle probe")
    assert(ovPre.exists(_._2 == synthId),
      "vacuous: the planted verbatim copy never surfaced as an overlap run")

    // int-IVF/ADC ANN artifact over the kept docs' embeddings (vec_id =
    // doc_id) — the newest index surface the takedown contract covers.
    // trainN = 8 keeps the codebook training prefix disjoint from the
    // removed ids (all ≥ 13), the delete ≡ rebuild-without precondition.
    val emb0 = Tables.load(spark, sf, "embeddings")
    val ivfDir = Files.createTempDirectory("graft-takedown-ivf-").toString
    val keptVecs = graft.operators.IntegerKMeans.quantize(
      emb0.join(spark.createDataset(before.map(_._1).toSeq).toDF("vec_id"),
        Seq("vec_id"), "left_semi"))
    val ivfCents = graft.operators.IntIvfIndex.materializeAdc(keptVecs, ivfDir,
      k = 8, iters = 2, mMax = 8, kc = 16, pqIters = 4, trainN = 8)
    val ivfQueries = keptVecs.filter($"vec_id" < 12)
    def ivfHits(p: String) = graft.operators.IntIvfIndex
      .probeAdc(spark, p, ivfQueries, nprobe = 2, k = 5, shortlist = 40)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

    val payload = docsTable
      .filter($"doc_id".isin(removedIds.toSeq: _*))
      .select($"doc_id", $"text", $"lang")
    Takedown.run(spark, dir, payload.select($"doc_id"), payload, $"lang" === "en",
      shingleIndexes = Seq("graft_tk_shidx"),
      lineSegmentIndexes = Seq("graft_tk_lineidx"),
      intIvfIndexes = Seq(ivfDir),
      overlapIndexes = Seq("graft_tk_ovidx"))

    // manifest: exactly the original minus the removed ids
    val after = Takedown.manifest(spark, dir)
      .select($"doc_id", $"n_tokens", $"digest")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(after == before.filterNot(t => removedIds(t._1)))

    // shards: surviving rows byte-identical (ids, shard, offset); only
    // the removed docs' rows vanish — the enumeration contract holds
    val shardsAfter = Takedown.shards(spark, dir)
      .select($"doc_id", $"shard".cast("long"), $"shard_offset")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(shardsAfter == shardsBefore.filterNot(t => removedIds(t._1)))

    // BM25: probe == a fresh build on the remaining kept docs
    val remainingIds = after.map(_._1)
    val remainingDocs = docsTable
      .filter($"doc_id".isin(remainingIds.toSeq: _*))
      .select($"doc_id", $"text")
    val refBm = Files.createTempDirectory("graft-takedown-bm-").toString
    Bm25Index.build(remainingDocs, refBm)
    val q = RetrievalQueries.fixtureQueries.toDF("query_id", "term")
    def scores(p: String) = Bm25Index.probe(spark, p, q)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(scores(refBm).nonEmpty, "no BM25 hits — vacuous")
    assert(scores(s"$dir/bm25") == scores(refBm),
      "bm25 probe != rebuild on remaining corpus")

    // vectors: probe == a fresh materialize on the remaining kept subset
    val emb = Tables.load(spark, sf, "embeddings")
    val refVec = Files.createTempDirectory("graft-takedown-vec-").toString
    VectorIndex.materialize(
      emb.join(remainingDocs.select($"doc_id".as("vec_id")), Seq("vec_id"), "left_semi")
        .select($"vec_id", $"embedding"),
      refVec)
    val queries = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"embedding")
    def hits(p: String) = VectorIndex.probe(spark, p, queries, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(hits(refVec).nonEmpty, "no ANN hits — vacuous")
    assert(hits(s"$dir/vectors") == hits(refVec),
      "vector probe != rebuild on remaining subset")

    // int-IVF/ADC: probeAdc == a fresh materializeAdc on the remaining
    // subset under the FROZEN coarse centroids (quantization artifacts
    // mask on delete, they never retrain)
    val refIvf = Files.createTempDirectory("graft-takedown-ivfref-").toString
    graft.operators.IntIvfIndex.materializeAdc(
      keptVecs.filter(!$"vec_id".isin(removedIds.toSeq: _*)), refIvf,
      k = 8, iters = 2, mMax = 8, kc = 16, pqIters = 4, trainN = 8,
      cents = Some(ivfCents))
    val ivfPost = ivfHits(ivfDir)
    assert(ivfHits(refIvf).nonEmpty, "no ADC hits — vacuous")
    assert(ivfPost == ivfHits(refIvf),
      "ADC probe after takedown != rebuild without the removed docs")
    assert(!ivfPost.exists(r => removedIds(r._2)),
      "a forgotten doc still surfaces as an ADC neighbor")

    // evalh: the masked reader holds exactly the surviving docs' pairs —
    // a forgotten eval doc's shingles stop marking future content
    val evalhAfter = Takedown.evalh(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(evalhAfter == evalhBefore.filterNot(p => removedIds(p._1)),
      "evalh reader != stored pairs minus removed eval docs")

    // dedup surfaces: probes == probes of indexes materialized WITHOUT
    // the removed docs (the ShingleIndex.delete contract, now reached
    // from Takedown.run), and no pair involves forgotten data
    val remainingIdx = idxCorpus.filter(!$"doc_id".isin(removedIds.toSeq: _*))
    ShingleIndex.materialize(remainingIdx, "graft_tk_shidx_ref")
    LineSegmentIndex.materialize(remainingIdx, "graft_tk_lineidx_ref")
    val shPost = shPairs("graft_tk_shidx")
    assert(shPost == shPairs("graft_tk_shidx_ref"),
      "shingle probe after takedown != rebuild without the removed docs")
    assert(!shPost.exists(p => removedIds(p._1) || removedIds(p._2)),
      "a forgotten doc still pairs in the shingle probe")
    assert(shPost != shPre, "vacuous: shingle probe unchanged by the takedown")
    val linePost = lineRows("graft_tk_lineidx")
    assert(linePost == lineRows("graft_tk_lineidx_ref"),
      "line-segment probe after takedown != rebuild without the removed docs")
    assert(linePost != linePre,
      "vacuous: the planted duplicate's suppression never lifted")
    // overlap-run surface: a forgotten doc must stop flagging verbatim
    // runs (OverlapIndex.delete, reached from Takedown.run)
    graft.operators.OverlapIndex.materialize(remainingIdx, "graft_tk_ovidx_ref")
    val ovPost = ovRuns("graft_tk_ovidx")
    assert(ovPost == ovRuns("graft_tk_ovidx_ref"),
      "overlap-run probe after takedown != rebuild without the removed docs")
    assert(!ovPost.exists(r => removedIds(r._2)),
      "a forgotten doc still flags overlap runs")
    assert(ovPost != ovPre, "vacuous: overlap probe unchanged by the takedown")

    // repack: gapless contiguous shards over exactly the surviving docs
    val nShards = Takedown.repack(spark, dir)
    val repacked = Takedown.shards(spark, dir)
      .select($"doc_id", $"n_tokens", $"shard".cast("long"), $"shard_offset")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(repacked.map(_._1).toSet == remainingIds, "repacked docs != masked manifest")
    assert(repacked.map(_._3).toSet == (0L until nShards).toSet, "shard ids not contiguous")
    val budget = graft.queries.CorpusQueries.PackBudget
    assert(nShards == (repacked.map(_._2).sum + budget - 1) / budget,
      "shard count != ceil(surviving tokens / budget)")
    for ((_, group) <- repacked.groupBy(_._3)) {
      val inOrder = group.sortBy(_._4)
      // gapless: each doc starts where the previous one ended (mod budget
      // rollover only at the shard seam, which the grouping excludes)
      for (Array(a, b) <- inOrder.sliding(2).map(_.toArray) if inOrder.size > 1)
        assert(b._4 == a._4 + a._2, s"offset gap in shard ${a._3}: $a -> $b")
    }

    // DSIR: stored model == a direct refit over the remaining kept set
    val refit = DsirModel.fit(
        remainingDocs.join(docsTable.select($"doc_id", $"lang"), "doc_id"),
        $"lang" === "en")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val stored = DsirModel.load(spark, s"$dir/dsir")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(stored == refit, "model after remove != refit without the docs")

    // IDEMPOTENT: a verbatim re-run (an operator retry, or a rerun after
    // a partial failure) is a no-op — in particular the non-idempotent
    // model subtraction is never applied twice (round-10 advisory)
    Takedown.run(spark, dir, payload.select($"doc_id"), payload, $"lang" === "en",
      shingleIndexes = Seq("graft_tk_shidx"),
      lineSegmentIndexes = Seq("graft_tk_lineidx"))
    val rerun = DsirModel.load(spark, s"$dir/dsir")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rerun == refit, "re-running the takedown subtracted the model twice")
    assert(shPairs("graft_tk_shidx") == shPost,
      "re-running the takedown changed the shingle probe")

    // tokenizer vocab: the count half of the tokenizer artifact subtracts
    // EXACTLY — equals a recompute over the remaining kept docs under the
    // frozen day-0 merges; the verbatim re-run above proved it is not
    // subtracted twice (this reads the post-rerun table)
    val tokMerges = graft.operators.BpeTrainer.load(spark, s"$dir/tokenizer")
    val vocabWant = graft.operators.BpeTrainer.vocabulary(remainingDocs, tokMerges)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val vocabGot = spark.read.parquet(s"$dir/tokenizer_vocab")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(vocabGot == vocabWant,
      "vocab after takedown != recompute on the remaining kept docs")

    // REPACK + DAILY COMPOSE: repack rewound the pack base to the
    // surviving token total, so the next increment lands gapless at the
    // repacked end — with the raw manifest sum it would skip shard ids
    // (round-10 advisory)
    val incr = DailyIncrement.run(spark, sf, dir,
      batchFilter = $"doc_id" % 10 === 0)
    assert(incr.nBatchKept > 0, "vacuous: no batch doc survived curation")
    val finalShards = Takedown.shards(spark, dir)
      .select($"doc_id", $"n_tokens", $"shard".cast("long"), $"shard_offset")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val manifestFinal = Takedown.manifest(spark, dir)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(finalShards.map(_._1).toSet == manifestFinal,
      "post-increment shards != masked manifest")
    assert(finalShards.map(_._3).toSet == (0L until incr.nShardsTotal).toSet,
      "shard ids skipped after repack + increment — pack base not maintained")
    assert(incr.nShardsTotal ==
      (finalShards.map(_._2).sum + budget - 1) / budget,
      "shard count != ceil(total surviving+batch tokens / budget)")
    for ((_, group) <- finalShards.groupBy(_._3)) {
      val inOrder = group.sortBy(_._4)
      for (Array(a, b) <- inOrder.sliding(2).map(_.toArray) if inOrder.size > 1)
        assert(b._4 == a._4 + a._2, s"offset gap in shard ${a._3}: $a -> $b")
    }

    // SCRUB: physical erasure — every reader unchanged, and no standing
    // artifact (nor any tombstone list) retains a removed doc id
    val preBm = scores(s"$dir/bm25")
    val preVec = hits(s"$dir/vectors")
    val preLine = lineRows("graft_tk_lineidx")
    Takedown.scrub(spark, dir, Seq("graft_tk_shidx"), Seq("graft_tk_lineidx"),
      intIvfIndexes = Seq(ivfDir), overlapIndexes = Seq("graft_tk_ovidx"))
    assert(scores(s"$dir/bm25") == preBm, "bm25 probe changed across scrub")
    assert(hits(s"$dir/vectors") == preVec, "vector probe changed across scrub")
    assert(shPairs("graft_tk_shidx") == shPost, "shingle probe changed across scrub")
    assert(lineRows("graft_tk_lineidx") == preLine, "line probe changed across scrub")
    assert(ivfHits(ivfDir) == ivfPost, "ADC probe changed across scrub")
    assert(ovRuns("graft_tk_ovidx") == ovPost, "overlap probe changed across scrub")
    def idsOf(df: org.apache.spark.sql.DataFrame, c: String) =
      df.select(col(c)).distinct().collect().map(_.getLong(0)).toSet
    val surfaces = Seq(
      "curated" -> idsOf(spark.read.parquet(s"$dir/curated"), "doc_id"),
      "shards" -> idsOf(spark.read.parquet(s"$dir/shards"), "doc_id"),
      "evalh" -> idsOf(spark.read.parquet(s"$dir/evalh"), "doc_id"),
      "bm25 postings" -> idsOf(
        spark.read.parquet(graft.operators.Bm25Index.postingsPath(s"$dir/bm25")), "doc_id"),
      "vectors" -> idsOf(spark.read.parquet(s"$dir/vectors"), "vec_id"),
      "shingle index" -> idsOf(spark.table("graft_tk_shidx"), "doc_id"),
      "shingle counts" -> idsOf(spark.table("graft_tk_shidx_counts"), "doc_id"),
      "line index" -> idsOf(spark.table("graft_tk_lineidx"), "doc_id"),
      "int-ivf index" -> idsOf(spark.read.parquet(ivfDir), "vec_id"),
      "overlap index" -> idsOf(spark.table("graft_tk_ovidx"), "doc_id"))
    for ((name, ids) <- surfaces)
      assert(ids.intersect(removedIds).isEmpty,
        s"$name still holds removed ids: ${ids.intersect(removedIds).take(5)}")
    assert(!Files.exists(java.nio.file.Paths.get(s"$dir/takedown_tombstones")),
      "takedown tombstones survived the scrub")
    assert(!Files.exists(java.nio.file.Paths.get(s"$dir/bm25/tombstones")),
      "bm25 tombstones survived the scrub")
    assert(!Files.exists(java.nio.file.Paths.get(s"$dir/vectors_tombstones")),
      "vector tombstones survived the scrub")
    assert(!Files.exists(java.nio.file.Paths.get(s"$ivfDir/_tombstones")),
      "int-ivf tombstones survived the scrub")
    assert(!spark.catalog.tableExists("graft_tk_shidx_tombstones") &&
      !spark.catalog.tableExists("graft_tk_lineidx_tombstones") &&
      !spark.catalog.tableExists("graft_tk_ovidx_tombstones"),
      "index tombstone tables survived the scrub")

    for (t <- Seq("graft_tk_shidx", "graft_tk_shidx_tombstones",
        "graft_tk_shidx_counts", "graft_tk_shidx_ref", "graft_tk_shidx_ref_counts",
        "graft_tk_lineidx", "graft_tk_lineidx_tombstones", "graft_tk_lineidx_ref",
        "graft_tk_ovidx", "graft_tk_ovidx_tombstones", "graft_tk_ovidx_ref"))
      spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.catalog.clearCache()
  }

  test("full-stack tree: one registry-driven takedown + scrub reaches all four curation stage indexes") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    GraftExtensions.register(spark)
    // The composition the r13 plan blowup blocked from being scrub-pinned:
    // a day-0 tree carrying ALL FOUR stage indexes (near-dup gate,
    // standing overlap artifact, positioned benchmark, span passage
    // claims). One Takedown.run WITHOUT index names must reach every one
    // through the tree-recorded registry, leave each probe equal to a
    // rebuild on the remaining corpus, and one scrub() must physically
    // erase the removed ids from all four without changing any probe.
    val dir = Files.createTempDirectory("graft-tkfs-").toString
    val stageTables = Seq("graft_tkfs_nd", "graft_tkfs_ov",
      "graft_tkfs_be", "graft_tkfs_sp")
    val allTables = (stageTables ++ stageTables.map(_ + "_ref"))
      .flatMap(t => Seq(t, s"${t}_counts", s"${t}_tombstones"))
    def dropAll(): Unit = allTables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    dropAll()
    try {
      CurationJob.run(spark, sf, dir, docFilter = col("doc_id") % 10 =!= 0,
        nearDupIndex = Some("graft_tkfs_nd"),
        overlapIndex = Some("graft_tkfs_ov"),
        benchIndex = Some("graft_tkfs_be"),
        spanIndex = Some("graft_tkfs_sp"))
      val docsTable = Tables.load(spark, sf, "documents")
      def tableIds(t: String): Set[Long] =
        spark.table(t).select($"doc_id").distinct().collect().map(_.getLong(0)).toSet
      val origIds = stageTables.map(t => t -> tableIds(t)).toMap
      val keptIds = spark.read.parquet(s"$dir/curated")
        .select($"doc_id").collect().map(_.getLong(0)).toSet
      // kept train docs + one benchmark (eval) doc: every index loses rows
      val removed = keptIds.filter(_ % 7 == 0) + origIds("graft_tkfs_be").min
      for (t <- stageTables)
        assert(origIds(t).intersect(removed).nonEmpty, s"$t holds no removed id — vacuous")

      val probeBatch = docsTable.filter($"doc_id" % 10 === 0)
        .select($"doc_id", $"text")
      val minRun = CorpusQueries.MinRunTokens
      def ndPairs(t: String) = ShingleIndex.probe(spark, t, probeBatch, 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      def spanRows(t: String) = ShingleIndex.spanKeepFirstProbe(spark, t, probeBatch)
        .select($"doc_id", $"n_removed", $"scrub_text")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      def ovRuns(t: String) = graft.operators.OverlapIndex
        .runsProbe(spark, t, probeBatch, minRun)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      def beScrub(t: String) = graft.operators.OverlapIndex
        .scrubProbe(spark, t, probeBatch, minRun)
        .select($"doc_id", $"n_removed", $"scrub_text")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      // the standing overlap artifact indexes the SCRUBBED final-kept
      // text (the daily path extends it with scrubbed batches), so its
      // delete pin is run-locality, not a raw-text rebuild: runs are per
      // (t_doc, e_doc) pair, so masking removes EXACTLY the removed
      // docs' rows and touches nothing else
      val ovPre = ovRuns("graft_tkfs_ov")

      val payload = docsTable.filter($"doc_id".isin(removed.toSeq: _*))
        .select($"doc_id", $"text", $"lang")
      // NO index names passed — outDir/indexes must carry all four
      Takedown.run(spark, dir, payload.select($"doc_id"), payload, $"lang" === "en")

      // rebuild-on-remaining references over the SAME raw text the
      // other three indexes saw (near-dup gate: pre-near-dup survivors'
      // raw text; span claims: ndKept raw text; benchmark: eval docs'
      // raw text — all RAW by CurationJob's design)
      def corpusOf(ids: Set[Long]) = docsTable
        .filter($"doc_id".isin(ids.toSeq: _*)).select($"doc_id", $"text")
      ShingleIndex.materialize(
        corpusOf(origIds("graft_tkfs_nd") -- removed), "graft_tkfs_nd_ref")
      ShingleIndex.materialize(
        corpusOf(origIds("graft_tkfs_sp") -- removed), "graft_tkfs_sp_ref")
      graft.operators.OverlapIndex.materialize(
        corpusOf(origIds("graft_tkfs_be") -- removed), "graft_tkfs_be_ref")

      val nd = ndPairs("graft_tkfs_nd")
      assert(nd == ndPairs("graft_tkfs_nd_ref"),
        "near-dup gate probe != rebuild on remaining after registry takedown")
      val sp = spanRows("graft_tkfs_sp")
      assert(sp == spanRows("graft_tkfs_sp_ref"),
        "span keep-first probe != rebuild on remaining after registry takedown")
      val ov = ovRuns("graft_tkfs_ov")
      assert(ov == ovPre.filterNot(r => removed(r._2)),
        "overlap runs probe != pre-takedown rows minus the removed docs'")
      // non-vacuity: the masked occurrence relation itself lost the
      // removed ids (the probe diff can legitimately be empty when no
      // removed doc shared a long-enough run with this probe batch)
      assert(graft.operators.OverlapIndex
        .maskedOccurrences(spark, "graft_tkfs_ov")
        .select($"doc_id").distinct()
        .collect().map(_.getLong(0)).toSet.intersect(removed).isEmpty,
        "masked overlap occurrences still carry removed ids")
      val be = beScrub("graft_tkfs_be")
      assert(be == beScrub("graft_tkfs_be_ref"),
        "benchmark scrub probe != rebuild on remaining after registry takedown")

      // physical erasure, registry-driven: no names passed here either
      Takedown.scrub(spark, dir)
      assert(ndPairs("graft_tkfs_nd") == nd, "near-dup probe changed across scrub")
      assert(spanRows("graft_tkfs_sp") == sp, "span probe changed across scrub")
      assert(ovRuns("graft_tkfs_ov") == ov, "overlap probe changed across scrub")
      assert(beScrub("graft_tkfs_be") == be, "bench probe changed across scrub")
      for (t <- stageTables) {
        assert(tableIds(t).intersect(removed).isEmpty,
          s"$t still holds removed ids after scrub")
        assert(!spark.catalog.tableExists(s"${t}_tombstones"),
          s"${t}_tombstones survived the scrub")
      }
    } finally { dropAll(); spark.catalog.clearCache() }
  }

  test("DsirModel.remove: remove(fit(a ∪ b), b) == fit(a) exactly") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    GraftExtensions.register(spark)
    val docs = Tables.load(spark, sf, "documents")
      .select($"doc_id", $"text", $"lang")
    val a = docs.filter($"doc_id" % 3 =!= 0)
    val b = docs.filter($"doc_id" % 3 === 0)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = rows(DsirModel.remove(
      DsirModel.fit(docs, $"lang" === "en"), b, $"lang" === "en"))
    assert(got == rows(DsirModel.fit(a, $"lang" === "en")))
    spark.catalog.clearCache()
  }
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Bm25Index, CurationJob, VectorIndex}
import graft.queries.RetrievalQueries

/** The one-job curation run must produce MUTUALLY CONSISTENT artifacts:
  * every output derives from the same kept set, and that set is the one
  * the oracle-checked pipeline_curate query computes. */
class CurationJobSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("shards, bm25 index, vector index and manifest all agree with pipeline_curate") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val out = Files.createTempDirectory("graft-curation-").toString
    val res = CurationJob.run(spark, dir, out)

    // the kept set IS pipeline_curate's doc set (the driver-gated DAG)
    val packed = SparkEntry.queries("pipeline_curate")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(res.nDocsKept == packed.length.toLong, "manifest count != pipeline_curate")
    val manifest = spark.read.parquet(res.curatedDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(manifest == packed.map(p => (p._1, p._2)).toSet,
      "curated manifest != pipeline_curate's (doc_id, n_tokens)")

    // shard read-back equals pipeline_curate's packing columns
    val shards = spark.read.parquet(res.shardsDir)
      .select($"doc_id", $"n_tokens", $"shard".cast("long"), $"shard_offset")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(shards == packed.toSet, "shard read-back != pipeline_curate packing")
    assert(res.nShards == packed.map(_._3).max + 1, "shard count mismatch")

    // bm25 index: corpus stats count the kept docs with >=1 token, and a
    // fixture probe only ever hits kept docs
    val stats = spark.read.parquet(graft.operators.Bm25Index.statsPath(res.bm25Dir)).collect()(0)
    val keptIds = manifest.map(_._1)
    assert(stats.getLong(0) == manifest.count(_._2 > 0).toLong,
      "bm25 n_docs != kept docs with tokens")
    val q = RetrievalQueries.fixtureQueries.toDF("query_id", "term")
    val hits = Bm25Index.probe(spark, res.bm25Dir, q)
      .select($"doc_id").distinct().as[Long].collect()
    assert(hits.nonEmpty && hits.forall(keptIds.contains),
      "bm25 probe returned a non-kept doc")

    // vector index: only kept ids were materialized
    val vecIds = spark.read.parquet(res.vectorDir)
      .select($"vec_id").as[Long].collect().toSet
    assert(vecIds.nonEmpty && vecIds.subsetOf(keptIds),
      "vector index contains a non-kept id")
    // and it still probes (the layout is the VectorIndexSpec-pinned one)
    val queries = spark.read.parquet(res.vectorDir)
      .limit(3).select($"vec_id".as("query_id"),
        $"v".cast("array<float>").as("embedding"))
    assert(VectorIndex.probe(spark, res.vectorDir, queries, k = 2).count() > 0)

    // DSIR model artifact: fit on the SAME kept set as a direct
    // recompute — counts must agree row-for-row
    val persisted = graft.operators.DsirModel.load(spark, res.dsirDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val direct = graft.operators.DsirModel.fit(
      Tables.load(spark, dir, "documents")
        .join(manifest.map(_._1).toSeq.toDF("doc_id"), "doc_id")
        .select($"doc_id", $"text", $"lang"),
      $"lang" === "en")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(persisted == direct, "persisted DSIR model != direct fit of the kept set")

    // quality weights: reload bit-identically and score every doc to a
    // finite margin. (No separation assert here: this corpus' drops are
    // IDENTITY-based — eval-split modulus, content-hash dedup — which no
    // text-feature model can learn; separation on a separable corpus is
    // QualityClassifierSpec's pin. The artifact contract is the
    // reproducible weight array.)
    val loaded = graft.operators.QualityClassifier.load(spark, res.qualityDir)
    assert(loaded == res.quality, "quality weights did not round-trip")
    assert(loaded.w.exists(_ != 0.0), "training left the zero model")
    val labeled = Tables.load(spark, dir, "documents")
      .select($"doc_id", $"text",
        when($"doc_id".isin(keptIds.toSeq: _*), 1.0).otherwise(0.0).as("label"))
    val margins = graft.operators.QualityClassifier.predict(loaded,
        graft.operators.QualityClassifier.featurize(labeled, $"label"))
      .select($"doc_id", $"margin").as[(Long, Double)].collect()
    assert(margins.length == labeled.count().toInt)
    assert(margins.forall(m => !m._2.isNaN && !m._2.isInfinite),
      "non-finite margin from the persisted model")

    // tokenizer artifact: the persisted merge table round-trips in rank
    // order and equals a deterministic retrain on the same kept set (the
    // two-sites-ship-identical-artifacts contract); the loadTokenizer
    // counter segments exactly as the single-JVM reference
    val mergesLoaded = graft.operators.BpeTrainer.load(spark, res.tokenizerDir)
    assert(mergesLoaded.nonEmpty && mergesLoaded.map(_.rank) == mergesLoaded.indices,
      "tokenizer merge table empty or out of rank order")
    val keptDocs = Tables.load(spark, dir, "documents")
      .join(manifest.map(_._1).toSeq.toDF("doc_id"), "doc_id")
      .select($"doc_id", $"text")
    val retrained = graft.operators.BpeTrainer.train(keptDocs, 8)
    assert(mergesLoaded == retrained, "persisted tokenizer != deterministic retrain")
    // the vocab half: piece totals = the kept corpus' token mass under
    // the frozen table, and every piece re-derives from the merges
    val vocab = spark.read.parquet(s"$out/tokenizer_vocab")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(vocab.nonEmpty && vocab.values.forall(_ > 0))
    val totalPieces = keptDocs
      .select(CurationJob.loadTokenizer(spark, out).count($"text").as("n"))
      .agg(sum($"n")).collect()(0).getLong(0)
    assert(vocab.values.sum == totalPieces,
      "vocab mass != corpus piece count under the same tokenizer")
    val tokCounts = keptDocs.limit(20)
      .select($"doc_id", CurationJob.loadTokenizer(spark, out).count($"text").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    keptDocs.limit(20).collect().foreach { r =>
      val want = r.getString(1).split("\\s+").filter(_.nonEmpty)
        .map(w => graft.operators.BpeTrainer.segmentReference(w, mergesLoaded).size.toLong).sum
      assert(tokCounts(r.getLong(0)) == want,
        s"loadTokenizer count diverges from reference segmentation for doc ${r.getLong(0)}")
    }
    spark.catalog.clearCache()
  }

  test("benchIndex run: artifacts agree with pipeline_curate_scrub; manifest digest stays raw") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val out = Files.createTempDirectory("graft-curation-scrub-").toString
    try {
      val res = CurationJob.run(spark, dir, out,
        benchIndex = Some("graft_cj_bench"))

      // the packed shards ARE pipeline_curate_scrub's packing columns
      // (post-scrub token counts — the oracle-checked stage composition)
      val packed = SparkEntry.queries("pipeline_curate_scrub")(spark, dir)
        .select($"doc_id", $"n_tokens", $"shard", $"shard_offset")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(res.nDocsKept == packed.length.toLong,
        "manifest count != pipeline_curate_scrub")
      val shards = spark.read.parquet(res.shardsDir)
        .select($"doc_id", $"n_tokens", $"shard".cast("long"), $"shard_offset")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(shards == packed.toSet,
        "shard read-back != pipeline_curate_scrub packing")
      // the scrub actually removed something on this corpus (non-vacuous)
      val unscrubbed = SparkEntry.queries("pipeline_curate")(spark, dir)
        .select($"doc_id", $"n_tokens")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val scrubbedTok = packed.map(p => p._1 -> p._2).toMap
      assert(scrubbedTok.keySet == unscrubbed.keySet,
        "scrub stage changed the kept DOC SET (it must only rewrite text)")
      assert(scrubbedTok.exists { case (id, n) => n < unscrubbed(id) },
        "vacuous pin: no doc lost tokens to the scrub on this corpus")

      // manifest digest = md5 of the RAW text (the content-addressed
      // dedup surface a re-delivered raw doc anti-joins against)
      val rawDigests = Tables.load(spark, dir, "documents")
        .select($"doc_id", md5($"text").as("d"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      spark.read.parquet(res.curatedDir)
        .select($"doc_id", $"digest").collect().foreach { r =>
          assert(r.getString(1) == rawDigests(r.getLong(0)),
            s"manifest digest of doc ${r.getLong(0)} is not the raw-text md5")
        }

      // the benchmark index holds exactly the gate/dedup-surviving EVAL
      // docs, and a training doc quoting one of them scrubs via the probe
      val indexedIds = spark.table("graft_cj_bench")
        .select($"doc_id").distinct().as[Long].collect().toSet
      assert(indexedIds.nonEmpty &&
        indexedIds.forall(_ % graft.queries.CorpusQueries.EvalMod == 0),
        "benchmark index holds a non-eval doc")
      val evalText = Tables.load(spark, dir, "documents")
        .filter($"doc_id" === indexedIds.head).select($"text").head.getString(0)
      val words = evalText.split("\\s+").filter(_.nonEmpty)
      assume(words.length >= 8)
      val quote = words.slice(0, 8).mkString(" ")
      val probe = Seq((999999L, s"zqa zqb $quote zqy zqz"))
        .toDF("doc_id", "text")
      val scrubbed = graft.operators.OverlapIndex.scrubProbe(
        spark, "graft_cj_bench", probe, graft.queries.CorpusQueries.MinRunTokens)
        .collect()
      assert(scrubbed.length == 1 && scrubbed(0).getLong(2) >= 8L,
        s"probe doc quoting an indexed benchmark doc was not scrubbed: ${scrubbed.toSeq}")
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_cj_bench")
      spark.sql("DROP TABLE IF EXISTS graft_cj_bench_tombstones")
      spark.catalog.clearCache()
    }
  }

  test("spanIndex run: artifacts agree with pipeline_curate_spans; index claims the kept set's raw passages") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val out = Files.createTempDirectory("graft-curation-span-").toString
    try {
      val res = CurationJob.run(spark, dir, out,
        spanIndex = Some("graft_cj_span"))

      // the packed shards ARE pipeline_curate_spans's packing columns
      // (post-scrub token counts — the oracle-checked stage composition)
      val packed = SparkEntry.queries("pipeline_curate_spans")(spark, dir)
        .select($"doc_id", $"n_tokens", $"shard", $"shard_offset")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(res.nDocsKept == packed.length.toLong,
        "manifest count != pipeline_curate_spans")
      val shards = spark.read.parquet(res.shardsDir)
        .select($"doc_id", $"n_tokens", $"shard".cast("long"), $"shard_offset")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(shards == packed.toSet,
        "shard read-back != pipeline_curate_spans packing")
      // the stage only rewrites text — the kept DOC SET is pipeline_curate's
      val unscrubbed = SparkEntry.queries("pipeline_curate")(spark, dir)
        .select($"doc_id", $"n_tokens")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val spanTok = packed.map(p => p._1 -> p._2).toMap
      assert(spanTok.keySet == unscrubbed.keySet,
        "span stage changed the kept DOC SET (it must only rewrite text)")
      assert(spanTok.exists { case (id, n) => n < unscrubbed(id) },
        "vacuous pin: no doc lost a duplicated span on this corpus")
      // every duplicated trigram keeps at least one copy: the per-doc
      // removals never excise EVERY occurrence (summed post-scrub token
      // mass strictly exceeds what remove-ALL span scrubbing would leave)
      val removedTotal = spanTok.map { case (id, n) => unscrubbed(id) - n }.sum
      assert(removedTotal > 0 && spanTok.values.forall(_ >= 0))

      // the index holds exactly the kept ids' RAW passages: a fresh doc
      // quoting 8 words of a KEPT doc loses them via the probe
      val indexedIds = spark.table("graft_cj_span")
        .select($"doc_id").distinct().as[Long].collect().toSet
      assert(indexedIds == unscrubbed.keySet,
        "span index population != final kept set")
      val keptText = Tables.load(spark, dir, "documents")
        .filter($"doc_id" === indexedIds.head).select($"text").head.getString(0)
      val words = keptText.split("\\s+").filter(_.nonEmpty)
      assume(words.length >= 8)
      val quote = words.slice(0, 8).mkString(" ")
      val probe = Seq((999999L, s"zqa zqb $quote zqy zqz"))
        .toDF("doc_id", "text")
      val scrubbed = graft.operators.ShingleIndex.spanKeepFirstProbe(
        spark, "graft_cj_span", probe).collect()
      assert(scrubbed.length == 1 && scrubbed(0).getLong(2) >= 8L,
        s"probe doc re-quoting a kept passage was not scrubbed: ${scrubbed.toSeq}")
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_cj_span")
      spark.sql("DROP TABLE IF EXISTS graft_cj_span_counts")
      spark.sql("DROP TABLE IF EXISTS graft_cj_span_tombstones")
      spark.catalog.clearCache()
    }
  }

  test("full-strength run (nearDup + bench + span): artifacts agree with pipeline_curate_full") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val out = Files.createTempDirectory("graft-curation-full-").toString
    val tables = Seq("graft_cjf_nd", "graft_cjf_bench", "graft_cjf_span")
    try {
      val res = CurationJob.run(spark, dir, out,
        nearDupIndex = Some("graft_cjf_nd"),
        benchIndex = Some("graft_cjf_bench"),
        spanIndex = Some("graft_cjf_span"))
      val packed = SparkEntry.queries("pipeline_curate_full")(spark, dir)
        .select($"doc_id", $"n_tokens", $"shard", $"shard_offset")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(res.nDocsKept == packed.length.toLong,
        "manifest count != pipeline_curate_full")
      val shards = spark.read.parquet(res.shardsDir)
        .select($"doc_id", $"n_tokens", $"shard".cast("long"), $"shard_offset")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(shards == packed.toSet,
        "shard read-back != pipeline_curate_full packing")
      // non-vacuous on this corpus: the near-dup stage dropped at least
      // one doc vs the base DAG and at least one doc lost tokens
      val base = SparkEntry.queries("pipeline_curate")(spark, dir)
        .select($"doc_id", $"n_tokens")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val fullTok = packed.map(p => p._1 -> p._2).toMap
      assert(fullTok.keySet.subsetOf(base.keySet) && fullTok.size < base.size,
        "vacuous: near-dup stage dropped nothing on this corpus")
      assert(fullTok.exists { case (id, n) => n < base(id) },
        "vacuous: no doc lost tokens to the composed rewriting stages")
    } finally {
      tables.foreach { t =>
        spark.sql(s"DROP TABLE IF EXISTS $t")
        spark.sql(s"DROP TABLE IF EXISTS ${t}_tombstones")
        spark.sql(s"DROP TABLE IF EXISTS ${t}_counts")
      }
      spark.catalog.clearCache()
    }
  }

  test("benchIndex + spanIndex compose: one rebuild over the UNION of excisions (overlap counted once)") {
    import spark.implicits._
    GraftExtensions.register(spark)
    // controlled geometry: 34 (eval, 17·2) = e1..e30 is the benchmark.
    //   10 = 23 a-tokens + e5..e11   → bench quote only        → 23
    //   12 = 23 b-tokens + e5..e11   → bench ∪ span, SAME 7
    //        tokens (12 loses the span to keeper 10 AND it's a
    //        benchmark quote — union must excise it ONCE)       → 23
    //   11 = 23 v-tokens + s1..s7    → span keeper              → 30
    //   13 = 16 p-tokens + e12..e18 + s1..s7 → DISJOINT bench
    //        quote (7) + span lost to keeper 11 (7)             → 16
    def uniq(p: String, n: Int) = (1 to n).map(i => s"$p$i").mkString(" ")
    def withTail(p: String, n: Int, tail: Seq[String]) =
      ((1 to n).map(i => s"$p$i") ++ tail).mkString(" ")
    val e = (1 to 30).map(i => s"e$i")
    val s7 = (1 to 7).map(i => s"s$i")
    val all = Seq(
      (34L, uniq("e", 30)),
      (10L, withTail("a", 23, e.slice(4, 11))),
      (12L, withTail("b", 23, e.slice(4, 11))),
      (11L, withTail("v", 23, s7)),
      (13L, ((1 to 16).map(i => s"p$i") ++ e.slice(11, 18) ++ s7).mkString(" ")))
    assert(all.forall(_._2.split(" ").length == 30))
    assert(all.map(_._1).filter(_ % graft.queries.CorpusQueries.EvalMod == 0) == Seq(34L))
    val synth = Files.createTempDirectory("graft-cj-compose-sf-").toString
    all.map { case (id, tx) => (id, tx, "en", "webA", tx.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$synth/documents.parquet")
    Seq((10L, Array.fill(64)(0.1f), 0)).toDF("vec_id", "embedding", "label")
      .write.parquet(s"$synth/embeddings.parquet")
    val out = Files.createTempDirectory("graft-cj-compose-").toString
    try {
      CurationJob.run(spark, synth, out,
        benchIndex = Some("graft_cjc_bench"), spanIndex = Some("graft_cjc_span"))
      val toks = spark.read.parquet(s"$out/curated")
        .select($"doc_id", $"n_tokens")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(toks == Map(10L -> 23L, 11L -> 30L, 12L -> 23L, 13L -> 16L),
        s"composed excision verdict wrong: $toks")
    } finally {
      Seq("graft_cjc_bench", "graft_cjc_span", "graft_cjc_span_counts").foreach { t =>
        spark.sql(s"DROP TABLE IF EXISTS $t")
        spark.sql(s"DROP TABLE IF EXISTS ${t}_tombstones")
      }
      spark.catalog.clearCache()
    }
  }
}

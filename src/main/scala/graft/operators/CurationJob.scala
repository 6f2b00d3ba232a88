package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Tokenizer
import graft.queries.CorpusQueries

/** The end-to-end curation RUN — what a user executes over a raw crawl to
  * produce everything a training + retrieval stack consumes, in one job:
  *
  *   curate (quality → exact dedup → decontam; the pipeline_curate DAG,
  *   same code path via CorpusQueries.curatedTrain)
  *     ├─ training shards   PackedExport   → outDir/shards/ (hive shard=K)
  *     ├─ lexical index     Bm25Index      → outDir/bm25/
  *     ├─ vector index      VectorIndex    → outDir/vectors/ (kept subset)
  *     ├─ curated manifest  parquet        → outDir/curated/ (doc_id,
  *     │  n_tokens — the join surface for lineage/audits)
  *     ├─ selection model   DsirModel      → outDir/dsir/ (fit on the
  *     │  KEPT set with the en split as target — the model the next
  *     │  day's batches score against, batch-side via StreamingDsir)
  *     ├─ quality weights   QualityClassifier → outDir/quality/ (trained
  *     │  on kept-vs-dropped labels from the quality gate itself — the
  *     │  weight array text_quality_score's production form broadcasts)
  *     └─ tokenizer         BpeTrainer     → outDir/tokenizer/ (BPE merge
  *        table trained on the kept corpus, frozen at day 0; loadTokenizer
  *        rebuilds the pack-budget counter from it) + outDir/
  *        tokenizer_vocab/ (piece frequencies under the frozen table —
  *        the vocab.json half of the artifact)
  *
  * One corpus scan feeds every branch: the curated set is cached at the
  * stage boundary (inside curatedTrain), so the scan → quality → dedup →
  * decontam prefix runs once and each export only adds its own work
  * (pack's GlobalCumsum, bm25's tokenize aggs, the vector semi-join, the
  * model fits over the cached set). All outputs are mutually CONSISTENT
  * by construction — same kept set — which CurationJobSpec pins against
  * the oracle-checked pipeline_curate query (shards ≡ its packing
  * columns, bm25 stats count ≡ kept docs, vector ids ⊆ kept ids, DSIR
  * model counts ≡ a direct fit of the kept set, classifier weights
  * reload bit-identically).
  */
object CurationJob {
  final case class Result(
      nDocsKept: Long,
      nShards: Long,
      curatedDir: String,
      shardsDir: String,
      bm25Dir: String,
      vectorDir: String,
      dsirDir: String,
      qualityDir: String,
      quality: QualityClassifier.Model,
      evalhDir: String,
      tokenizerDir: String)

  /** Load the run's trained tokenizer (the outDir/tokenizer artifact) as
    * a pack-budget counter — [[graft.functions.Tokenizer.LearnedNative]]
    * over the frozen merge table. Day-0 frozen by design (see
    * [[BpeTrainer.save]]): a later increment budgets in the SAME pieces
    * the shards were packed with. */
  def loadTokenizer(spark: SparkSession, outDir: String): Tokenizer =
    Tokenizer.LearnedNative(BpeTrainer.load(spark, s"$outDir/tokenizer"))

  /** `nearDupIndex` switches the optional NEAR-DUP stage on: after the
    * decontam stage, documents that are near-duplicates (exact word-3-gram
    * jaccard ≥ `nearDupThreshold`) of a surviving lower-id doc also drop
    * (lowest-id-wins clustering — the pipeline_curate_neardup algebra),
    * AND the named [[ShingleIndex]] materializes over the PRE-near-dup
    * survivors so DailyIncrement's batch gate can probe the same graph a
    * from-scratch rebuild would build (a batch doc near-duplicating a
    * day-0 doc that itself LOST the day-0 near-dup verdict must still
    * drop — indexing only keepers would miss that edge).
    *
    * `overlapIndex` names an [[OverlapIndex]] to materialize over the
    * FINAL kept set — the standing positioned-shingle artifact
    * DailyIncrement extends per batch, so "a new benchmark was adopted —
    * which standing docs share ≥N-token runs with it?" stays probe-cost
    * on the daily tree.
    *
    * `benchIndex` switches the token-level SCRUB stage on (the
    * pipeline_curate_scrub algebra): after every drop gate, runs of
    * ≥[[CorpusQueries.MinRunTokens]] tokens shared with the gate/dedup-
    * surviving eval split are EXCISED from the surviving docs — every
    * downstream artifact (shards, bm25, dsir, tokenizer, vocab) consumes
    * the scrubbed text and post-scrub token counts (the training surface
    * is what a trainer actually reads), while the curated manifest keeps
    * the RAW-text digest (the dedup surface stays content-addressed by
    * what ARRIVED, so a re-delivered raw doc still anti-joins out).
    * The named [[OverlapIndex]] materializes over the eval docs — the
    * standing positioned BENCHMARK artifact DailyIncrement's scrub stage
    * probes at |batch| cost and extends with each batch's own eval
    * survivors (the evalh sequential-union doctrine, mirrored).
    *
    * `spanIndex` switches the SPAN KEEP-FIRST stage on (the
    * pipeline_curate_spans algebra): any trigram duplicated among the
    * final kept docs keeps its lowest-id copy and every other occurrence
    * is excised. Composes with `benchIndex`: both text-rewriting stages
    * judge RAW text (like near-dup and the content-addressed digest), so
    * their excision sets UNION into one token rebuild. The named
    * [[ShingleIndex]] materializes over the final kept set's RAW text —
    * the standing passage-claim surface DailyIncrement's span stage
    * probes at |batch| cost (arrival-order keep-first ≡ union rebuild,
    * because keeper = min id = first arrival). */
  def run(spark: SparkSession, sfDir: String, outDir: String,
      tok: Tokenizer = Tokenizer.Whitespace,
      docFilter: org.apache.spark.sql.Column = lit(true),
      tokenizerMerges: Int = 8,
      nearDupIndex: Option[String] = None,
      nearDupThreshold: Double = CorpusQueries.NearDupThreshold,
      overlapIndex: Option[String] = None,
      benchIndex: Option[String] = None,
      spanIndex: Option[String] = None): Result = {
    graft.GraftExtensions.register(spark)
    // Stage-boundary binding. With NO optional stage, `.cache()` suffices
    // (single linear DAG). With any optional stage on, the boundaries must
    // be LINEAGE CUTS, not caches: `kept` re-references `ndKept` several
    // times (scrub input, digest join-back, and twice via the positioned/
    // occurrence legs), each reference re-expanding curatedTrain's own
    // multi-reference DAG — and Catalyst analyzed plans are trees, not
    // DAGs, so node count multiplies per stage. Execution was never the
    // problem (the cache bounds that); the DRIVER dies merely FORMATTING
    // the analyzed plan (explainString OOM — the round-13 abort).
    // `localCheckpoint(true)` truncates the plan to a LogicalRDD leaf —
    // the ConnectedComponents.clustersPropagate doctrine, one level up.
    // Storage is MEMORY_AND_DISK like the cache it replaces; on a shared
    // long-lived session the checkpoint RDDs release when the frames go
    // unreachable (ContextCleaner), same footprint class as the
    // unpersist() below. (On a lossy cluster prefer the stage-to-parquet
    // form — DailyIncrement's `_increment_pending` — which this job
    // effectively gets too: every daily consumer reads the parquet
    // artifacts, never this in-memory lineage.)
    val cutLineage =
      nearDupIndex.isDefined || benchIndex.isDefined || spanIndex.isDefined
    def stageBound(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      if (cutLineage) df.localCheckpoint(true) else df.cache()
    val preNearDup = stageBound(CorpusQueries.curatedTrain(spark, sfDir, tok, docFilter))
    val ndKept = nearDupIndex match {
      case None => preNearDup
      case Some(_) =>
        stageBound(CorpusQueries.nearDupSurvivors(preNearDup, nearDupThreshold))
    }
    // optional token-level text-rewriting stages — LAST (near-dup judges
    // RAW text, and a scrub changing jaccard verdicts would diverge from
    // the oracle-checked stage order). Both the benchmark scrub and the
    // span keep-first stage compute dup starts on RAW text, so their
    // excision sets union into ONE rebuild. `digest` stays the raw-text
    // md5 (the content-addressed dedup surface is what ARRIVED).
    val kept = if (benchIndex.isEmpty && spanIndex.isEmpty)
      ndKept.withColumn("digest", md5(col("text")))
    else {
      val nd = ndKept.select(col("doc_id"), col("text"))
      val benchStarts = benchIndex.map { _ =>
        val evalDocs = CorpusQueries.curatedEvalDocs(spark, sfDir, tok, docFilter)
        OverlapIndex.scrubStartRows(OverlapIndex.positioned(nd),
          OverlapIndex.positioned(evalDocs), CorpusQueries.MinRunTokens)
      }
      val spanStarts = spanIndex.map { _ =>
        graft.queries.DedupQueries.spanKeepFirstStartRows(
          nd.select(col("doc_id"),
            posexplode(graft.queries.CrossHash.shingleHashes(col("text")))
              .as(Seq("q", "h"))))
      }
      val dupStarts = (benchStarts.toSeq ++ spanStarts.toSeq)
        .reduce(_ unionByName _).distinct()
        .groupBy(col("doc_id"))
        .agg(sort_array(collect_list(col("q"))).as("dup_starts"))
      stageBound(graft.queries.DedupQueries.scrubRebuild(spark, nd, dupStarts)
        .join(ndKept.select(col("doc_id"), md5(col("text")).as("digest")), "doc_id")
        .select(col("doc_id"), col("scrub_text").as("text"),
          (col("n_tokens") - col("n_removed")).as("n_tokens"), col("digest")))
    }
    // The pin that the cuts above stay in place: `kept` today is a
    // LogicalRDD leaf (or the linear cached DAG); remove a checkpoint and
    // this fails loud, named, BEFORE any consumer formats the plan.
    graft.plans.PlanGuard.assertBounded(kept, "CurationJob.kept")
    val curatedDir = s"$outDir/curated"
    // digest third: DailyIncrement's corpus-precedes-batch exact dedup
    // anti-joins tomorrow's batch against it (content-addressed manifest)
    // added_batch LAST (positional readers see 0..2 unchanged): batch 0
    // is day 0; each DailyIncrement stamps its own id — the provenance
    // column behind the as-of readers (DailyIncrement.manifestAsOf)
    kept.select(col("doc_id"), col("n_tokens"), col("digest"))
      .withColumn("added_batch", lit(0L))
      .write.mode("overwrite").parquet(curatedDir)
    val shardsDir = s"$outDir/shards"
    val nShards = PackedExport.writeShards(
      kept.select(col("doc_id"), col("n_tokens")), shardsDir,
      CorpusQueries.PackBudget)
    // persist the pack base (day-0 token total): DailyIncrement continues
    // packing from this artifact, and Takedown.repack rewinds it — see
    // PackedExport.writeBase for why it can't be derived from the manifest
    PackedExport.writeBase(spark,  s"$outDir/packbase",
      kept.agg(coalesce(sum(col("n_tokens")), lit(0L))).head.getLong(0))
    val bm25Dir = s"$outDir/bm25"
    Bm25Index.build(kept.select(col("doc_id"), col("text")), bm25Dir)
    val vectorDir = s"$outDir/vectors"
    VectorIndex.materialize(
      Tables.load(spark, sfDir, "embeddings")
        .join(kept.select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_semi")
        .select(col("vec_id"), col("embedding")),
      vectorDir)
    // selection model over the KEPT set (en split as target): tomorrow's
    // batches score against this artifact instead of re-reading today's
    // corpus (DsirModel.score / StreamingDsir)
    val dsirDir = s"$outDir/dsir"
    val docs = Tables.load(spark, sfDir, "documents")
    DsirModel.write(
      DsirModel.fit(
        kept.select(col("doc_id"), col("text"))
          .join(docs.select(col("doc_id"), col("lang")), "doc_id"),
        col("lang") === "en"),
      dsirDir)
    // distill the curation verdict into the hashed-linear quality model:
    // label every RAW doc by whether curation kept it, train the
    // broadcast-able weight array text_quality_score's production form
    // evaluates. Bit-reproducible, so two sites running the same job
    // ship identical weights.
    // persist the eval-shingle benchmark the decontam stage ACTUALLY
    // checked against — derived from the gate/dedup survivors, not the
    // raw table (curatedEvalH hits the same curatedKept cache entry).
    // DailyIncrement loads this instead of re-deriving from raw docs,
    // so day0 and the daily path apply the identical benchmark.
    val evalhDir = s"$outDir/evalh"
    CorpusQueries.curatedEvalH(spark, sfDir, tok, docFilter)
      .withColumn("added_batch", lit(0L))
      .write.mode("overwrite").parquet(evalhDir)
    val qualityDir = s"$outDir/quality"
    val labeled = docs.select(col("doc_id"), col("text"))
      .join(kept.select(col("doc_id"), lit(1.0).as("label")), Seq("doc_id"), "left")
      .select(col("doc_id"), col("text"), coalesce(col("label"), lit(0.0)).as("label"))
    val quality = QualityClassifier.train(
      QualityClassifier.featurize(labeled, col("label")), iters = 10)
    QualityClassifier.write(quality, spark, qualityDir)
    // tokenizer artifact: BPE merges trained on the KEPT corpus (a model
    // trains on curated text, so its tokenizer does too), frozen at day 0
    // (BpeTrainer.save documents why the daily path never retrains).
    // Deterministic training ⇒ two sites running the same job ship the
    // identical merge table, like the quality weights.
    val tokenizerDir = s"$outDir/tokenizer"
    val learnedMerges =
      BpeTrainer.train(kept.select(col("doc_id"), col("text")), tokenizerMerges)
    BpeTrainer.save(spark, learnedMerges, tokenizerDir)
    // the vocab half of the artifact (merges.txt + vocab.json analog):
    // piece frequencies of the kept corpus under the frozen table
    BpeTrainer.vocabulary(kept.select(col("doc_id"), col("text")), learnedMerges)
      .write.mode("overwrite").parquet(s"$outDir/tokenizer_vocab")
    // the standing dedup index over PRE-near-dup survivors (see the run
    // scaladoc for why keepers-only would under-drop future batches) and
    // the positioned overlap artifact over the final kept set
    nearDupIndex.foreach { t =>
      ShingleIndex.materialize(preNearDup.select(col("doc_id"), col("text")), t)
      // record under the tree so Takedown reaches this index WITHOUT the
      // caller remembering its name — a forgotten parameter would leave
      // the dedup surface acting on fingerprints of forgotten content
      Takedown.recordIndex(outDir, "shingle", t)
    }
    overlapIndex.foreach { t =>
      OverlapIndex.materialize(kept.select(col("doc_id"), col("text")), t)
      Takedown.recordIndex(outDir, "overlap", t)
    }
    // the standing positioned BENCHMARK artifact (eval docs, not train):
    // DailyIncrement's scrub stage probes it at |batch| cost and appends
    // each batch's eval survivors. Recorded as kind "overlap" so a
    // takedown of an eval doc releases its runs without the caller
    // remembering the index name.
    benchIndex.foreach { t =>
      OverlapIndex.materialize(
        CorpusQueries.curatedEvalDocs(spark, sfDir, tok, docFilter), t)
      Takedown.recordIndex(outDir, "overlap", t)
    }
    // the standing passage-claim surface for the span stage: the FINAL
    // kept set's RAW trigrams (a near-dup loser's text never trains, so
    // it claims no passages; raw — keepers claim what ARRIVED, not what
    // survived scrubbing, or a batch re-quoting an excised span would
    // wrongly keep it). Recorded kind "shingle": a takedown releases the
    // forgotten doc's passage claims, so re-submitted content survives.
    spanIndex.foreach { t =>
      ShingleIndex.materialize(ndKept.select(col("doc_id"), col("text")), t)
      Takedown.recordIndex(outDir, "shingle", t)
    }
    val n = kept.count()
    kept.unpersist(); ndKept.unpersist(); preNearDup.unpersist()
    // release the stage-boundary cache curatedTrain/curatedEvalH share
    CorpusQueries.curatedKept(spark, sfDir, tok, docFilter).unpersist()
    Result(n, nShards, curatedDir, shardsDir, bm25Dir, vectorDir,
      dsirDir, qualityDir, quality, evalhDir, tokenizerDir)
  }
}

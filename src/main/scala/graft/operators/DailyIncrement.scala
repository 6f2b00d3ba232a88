package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Tokenizer
import graft.queries.CorpusQueries
import graft.queries.CrossHash.shingleHashes

/** The DAILY path of the curation stack: extend yesterday's
  * [[CurationJob]] artifacts with today's document batch WITHOUT
  * re-reading the standing corpus — the production regime at 100 TB,
  * where the corpus is the overwhelming mass and each day adds a sliver.
  *
  * One batch-sized pass drives every artifact:
  *
  *   batch → quality gate (curatedTrain's shared spelling)
  *         → exact dedup, corpus precedes batch: digests the curated
  *           manifest already holds anti-join OUT (the manifest is
  *           content-addressed for exactly this), then lowest doc_id
  *           per digest within the batch
  *         → decontamination (same eval-split + ≥50%-overlap rule; the
  *           eval benchmark is the PERSISTED outDir/evalh artifact —
  *           day0's gate/dedup eval survivors ∪ every prior batch's eval
  *           survivors — extended by this batch's own eval survivors and
  *           appended back so tomorrow's batch sees them)
  *     ├─ curated manifest  rows APPEND       → outDir/curated/
  *     ├─ training shards   pack continuation → outDir/shards/ (offsets
  *     │  start at yesterday's total tokens — doc_pack_incr's spelling;
  *     │  the first batch rows may extend yesterday's last shard dir)
  *     ├─ lexical index     Bm25Index.append  → outDir/bm25/
  *     ├─ vector index      VectorIndex.append→ outDir/vectors/
  *     ├─ selection model   DsirModel.append  → outDir/dsir/
  *     └─ tokenizer vocab   exact piece-count fold → outDir/tokenizer_vocab/
  *
  * Every append is pinned ≡ its from-scratch rebuild over the union
  * corpus (DailyIncrementSpec), so running day0 + N increments lands the
  * same artifacts as one big job — the operator-level guarantee that
  * makes the daily path trustworthy. Two documented exceptions, both
  * inherent to an append-only daily regime (batches commit in arrival
  * order and are never retroactively dropped):
  *
  *  1. SEQUENTIAL-UNION decontam semantics: batch k is checked against
  *     day0 ∪ eval survivors of batches 1..k. A from-scratch rebuild
  *     over the union would also check earlier batches against LATER
  *     batches' eval shingles; the daily path cannot (those docs are
  *     already committed). The manifests therefore satisfy
  *     rebuild ⊆ daily, with the difference exactly the earlier-batch
  *     docs contaminated only by later eval survivors (pinned in
  *     DailyIncrementSpec's compose test). The optional token-level
  *     SCRUB stage (`benchIndex`) inherits the same semantics: batch k
  *     scrubs against the benchmark index as of batch k (committed ∪ its
  *     own eval survivors); committed text is never retroactively
  *     re-scrubbed when a later batch adds benchmark content. The SPAN
  *     KEEP-FIRST stage (`spanIndex`) is STRONGER: arrival-order
  *     keep-first (committed corpus presence ∨ lower batch id) IS the
  *     union rebuild's min-id keeper rule when batch ids are
  *     arrival-monotone (guarded), so daily ≡ rebuild exactly — no
  *     sequential caveat (DailyIncrementSpec pins the equality).
  *  2. The batch-side exact-dedup anti-join sees only the curated
  *     MANIFEST digests (kept docs). A batch eval doc duplicating a
  *     day-0 gate-surviving doc that was itself dropped (e.g.
  *     contaminated) survives here and contributes shingles, whereas a
  *     from-scratch dedup would make it lose to the lower-id day-0 doc
  *     and contribute none. Accepted approximation: the manifest is the
  *     only digest surface the daily path retains, and the effect is
  *     strictly conservative (at most extra shingles in the benchmark —
  *     never an under-drop of contaminated train docs).
  */
object DailyIncrement {
  final case class Result(nBatchKept: Long, nShardsTotal: Long)

  /** Staging area of the in-flight increment (sibling-style underscore
    * dir inside the tree; never read as an artifact). */
  private def pendingDir(outDir: String) = s"$outDir/_increment_pending"

  def run(spark: SparkSession, sfDir: String, outDir: String,
      batchFilter: Column, tok: Tokenizer = Tokenizer.Whitespace,
      nearDupIndex: Option[String] = None,
      nearDupThreshold: Double = CorpusQueries.NearDupThreshold,
      overlapIndex: Option[String] = None,
      benchIndex: Option[String] = None,
      spanIndex: Option[String] = None): Result = {
    import spark.implicits._
    runBatch(spark,
      Tables.load(spark, sfDir, "documents")
        .filter(batchFilter)
        .select($"doc_id", $"text", $"lang"),
      Tables.load(spark, sfDir, "embeddings")
        .select($"vec_id", $"embedding"),
      outDir, tok, nearDupIndex, nearDupThreshold, overlapIndex, benchIndex,
      spanIndex)
  }

  /** The batch-DataFrame form of [[run]] — `batchDocs` is today's
    * document sliver (doc_id, text, lang), `embeddings` the vector side
    * keyed by vec_id (= doc_id).
    *
    * CRASH-SAFE in three phases (the Bm25Index pending-delete
    * discipline applied to the increment):
    *
    *  1. COMPUTE + STAGE — the kept set, its eval-survivor shingles,
    *     its embeddings and the captured pack base are written to
    *     `_increment_pending/` and sealed with a `_staged` marker.
    *     A crash before the marker loses nothing: no standing artifact
    *     was touched, and the next run wipes the un-sealed remnants and
    *     recomputes identically (the manifest is unchanged).
    *  2. APPLY — [[applyPending]] executes the artifact appends
    *     from the STAGED data (never from live lineage), dropping a
    *     per-artifact `.done` marker after each. A crash mid-apply
    *     leaves a sealed staging dir; the next [[runBatch]] (or an
    *     explicit [[recover]]) rolls the remaining appends forward —
    *     without this, a crash between the manifest append and the
    *     index appends would leave the tree PERMANENTLY drifted
    *     (manifest docs the indexes never see), violating every
    *     append-equals-rebuild pin.
    *  3. COMMIT — the staging dir is deleted; the tree is quiescent.
    *
    * The residual atomicity unit is one commit per marker step: every
    * step but one is a single Spark job, and the bm25 step is
    * single-commit internally too ([[Bm25Index.append]]'s
    * batch-partitioned postings + pointer-swap — a crash inside it
    * rolls back to the pre-append index and the marker-driven retry is
    * the normal path).
    *
    * Replaying an already-committed batch stays a no-op through the
    * content-addressed manifest: every digest anti-joins out, the
    * staged kept set is empty, and the appends write nothing. */
  def runBatch(spark: SparkSession, batchDocs: DataFrame, embeddings: DataFrame,
      outDir: String, tok: Tokenizer = Tokenizer.Whitespace,
      nearDupIndex: Option[String] = None,
      nearDupThreshold: Double = CorpusQueries.NearDupThreshold,
      overlapIndex: Option[String] = None,
      benchIndex: Option[String] = None,
      spanIndex: Option[String] = None): Result = {
    import spark.implicits._
    // finish any crashed predecessor before reading the tree it half-wrote
    recover(spark, outDir)
    val n = stage(spark, batchDocs, embeddings, outDir, tok,
      nearDupIndex, nearDupThreshold, overlapIndex, benchIndex, spanIndex)
    // ---- phases 2+3: apply from staging, then commit ----
    applyPending(spark, outDir)
    val nShards = spark.read.parquet(s"$outDir/shards")
      .agg(coalesce(max($"shard".cast("long")), lit(-1L))).head.getLong(0) + 1
    Result(n, nShards)
  }

  /** Phase 1 of [[runBatch]] (compute + stage + seal) — package-private
    * so the crash-safety spec can drive the phases separately. Returns
    * the staged kept-doc count. */
  private[graft] def stage(spark: SparkSession, batchDocs: DataFrame,
      embeddings: DataFrame, outDir: String, tok: Tokenizer,
      nearDupIndex: Option[String] = None,
      nearDupThreshold: Double = CorpusQueries.NearDupThreshold,
      overlapIndex: Option[String] = None,
      benchIndex: Option[String] = None,
      spanIndex: Option[String] = None): Long = {
    graft.GraftExtensions.register(spark)
    import spark.implicits._

    // the manifest and eval benchmark are read TOMBSTONE-MASKED (through
    // Takedown's readers): a taken-down doc must neither make a future
    // re-submission of its content "already present" (exact-dedup
    // anti-join) nor "contaminated" (evalh) — the pipeline would be
    // acting on fingerprints of forgotten data (round-10 advisory)
    val manifest = Takedown.manifest(spark, outDir).cache()

    // batch curation — each stage the day-0 rule verbatim
    val batch = batchDocs
      .select($"doc_id", $"text", tok.count($"text").as("n_tokens"))
    val quality = CorpusQueries.qualityGate(batch)
      .withColumn("digest", md5($"text"))
    val newOnly = quality
      .join(manifest.select($"digest"), Seq("digest"), "left_anti")
    val winners = newOnly.groupBy($"digest").agg(min($"doc_id").as("doc_id"))
    val deduped = newOnly.join(winners, Seq("digest", "doc_id")).cache()

    // decontam: batch shingles vs the PERSISTED eval benchmark (the
    // set day-0's decontam actually checked — gate/dedup survivors, not
    // raw docs) extended by today's batch eval-split survivors, which is
    // exactly what a from-scratch union job would derive: an eval doc
    // contributes shingles only after passing the same gate/dedup the
    // train side passes. The new hashes land in staging below and append
    // to outDir/evalh during apply. Kept as (doc_id, h) pairs so a later
    // takedown can forget them exactly.
    val evalBase = Takedown.evalh(spark, outDir)
    val batchEvalH = deduped
      .filter($"doc_id" % CorpusQueries.EvalMod === 0)
      .select($"doc_id", explode(shingleHashes($"text")).as("h")).distinct()
      .cache()
    val evalH = evalBase.select($"h").union(batchEvalH.select($"h")).distinct()
      .withColumn("hit", lit(1L))
    val contaminated = deduped
      .select($"doc_id", explode(shingleHashes($"text")).as("h")).distinct()
      .join(evalH, Seq("h"), "left")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce($"hit", lit(0L))).as("n_contaminated"))
      .filter($"n_contaminated".cast("double") / $"n_shingles" >= 0.5)
      .select($"doc_id")
    val kept = deduped
      .filter($"doc_id" % CorpusQueries.EvalMod =!= 0)
      .join(contaminated, Seq("doc_id"), "left_anti")

    // ---- optional NEAR-DUP gate: the pipeline_curate_neardup verdict at
    // |batch| cost against the standing PRE-near-dup shingle index (the
    // graph a from-scratch rebuild would build — CurationJob indexes
    // decontam survivors, not just keepers, so a batch doc duplicating a
    // day-0 near-dup LOSER still drops). Batch ids sit above every
    // indexed id (append-only daily feed contract, guarded below), so a
    // cluster touching the corpus always resolves to a corpus keeper:
    // drop every corpus-linked batch component whole, and keep only each
    // unlinked component's min id (the dedup_clusters verdict). The
    // components run on the |batch|-bounded batch-batch edge set. ----
    val (finalKept0, ndPairs): (DataFrame, Option[DataFrame]) = nearDupIndex match {
      case None => (kept, None)
      case Some(table) =>
        // re-delivered ids are no-ops: a near-dup LOSER is absent from the
        // content-addressed manifest (only keepers land there), so the
        // digest anti-join above cannot catch its replay — but it IS in
        // the index, and re-probing/re-appending it would double its
        // (doc_id, h) rows and every intersection count. Ids are unique
        // and monotone (the append-only feed contract), so index
        // membership ⇔ already processed. Tombstone-MASKED: a taken-down
        // id is fully forgotten and its content reprocessable (the masked
        // manifest's doctrine).
        val indexedIds = CatalogCommit.maskedByTombstones(spark, table,
          ShingleIndex.counts(spark, table)).select($"doc_id")
        val freshKept = kept.join(indexedIds, Seq("doc_id"), "left_anti")
        val maxIndexed = indexedIds.agg(max($"doc_id")).head
        val minBatch = freshKept.agg(min($"doc_id")).head
        require(maxIndexed.isNullAt(0) || minBatch.isNullAt(0) ||
          minBatch.getLong(0) > maxIndexed.getLong(0),
          s"batch doc ids must exceed every id indexed in '$table' " +
            "(append-only daily feed contract) — lowest batch id " +
            s"${minBatch.get(0)} <= max indexed id ${maxIndexed.get(0)}")
        val pairs = ShingleIndex.probe(spark, table,
          freshKept.select($"doc_id", $"text"), nearDupThreshold).cache()
        val batchIds = freshKept.select($"doc_id".as("id"))
        // probe emits doc_a < doc_b; corpus ids < batch ids, so a pair's
        // doc_a side decides corpus-vs-batch
        val edges = pairs
          .join(batchIds.select($"id".as("doc_a")), Seq("doc_a"), "left_semi")
          .select($"doc_a".as("a"), $"doc_b".as("b"))
        val corpusLinked = pairs
          .join(batchIds.select($"id".as("doc_a")), Seq("doc_a"), "left_anti")
          .select($"doc_b".as("id")).distinct()
        val comp = ConnectedComponents.clusters(batchIds, edges)
        val linkedClusters = comp.join(corpusLinked, Seq("id"), "left_semi")
          .select($"cluster").distinct()
        val keepers = comp.filter($"id" === $"cluster")
          .join(linkedClusters, Seq("cluster"), "left_anti")
          .select($"id".as("doc_id"))
        (freshKept.join(keepers, Seq("doc_id"), "left_semi"), Some(pairs))
    }

    // ---- optional token-level SCRUB stage against the maintained
    // positioned BENCHMARK index (CurationJob's benchIndex): runs of
    // ≥MinRunTokens tokens shared with the benchmark — the committed
    // index ∪ this batch's OWN eval survivors, the evalh sequential-union
    // doctrine positioned — are excised from the kept docs before
    // packing, so every appended artifact consumes what a trainer reads.
    // `digest` stays the RAW-text md5 (the content-addressed dedup
    // surface). A re-delivered eval id is a no-op: index membership ⇔
    // already processed (duplicating its positioned rows would corrupt
    // the island windows — same doctrine as the near-dup gate's
    // membership check). ----
    // With a text-rewriting stage on, finalKept feeds the positioned
    // bench pass, the span occurrence pass, two min-id guard aggregates,
    // the scrub rebuild + digest join-back, and the staging writes — each
    // reference re-expanding the gate chain (digest anti-join → decontam
    // → near-dup components), and Catalyst plans are trees, so the
    // composed plan multiplies per consumer (the round-13 explainString
    // OOM, CurationJob's twin). localCheckpoint(true) cuts the lineage to
    // a LogicalRDD leaf (the ConnectedComponents doctrine) and doubles as
    // the fk cache: every downstream pass scans materialized rows instead
    // of re-executing the gates.
    val finalKept =
      if (benchIndex.isDefined || spanIndex.isDefined) finalKept0.localCheckpoint(true)
      else finalKept0
    val fk = finalKept.select($"doc_id", $"text")
    val benchPieces: Option[(DataFrame, DataFrame)] = benchIndex.map { table =>
      CatalogCommit.requireCommitted(spark, table)
      val occ = OverlapIndex.maskedOccurrences(spark, table)
      val batchEvalDocs = deduped
        .filter($"doc_id" % CorpusQueries.EvalMod === 0)
        .select($"doc_id", $"text")
      val freshEval = batchEvalDocs
        .join(occ.select($"doc_id").distinct(), Seq("doc_id"), "left_anti")
        .cache()
      val evOcc = occ.select($"doc_id", $"q", $"h")
        .unionByName(OverlapIndex.positioned(freshEval))
      (OverlapIndex.scrubStartRows(OverlapIndex.positioned(fk), evOcc,
        CorpusQueries.MinRunTokens), freshEval)
    }
    val benchFresh: Option[DataFrame] = benchPieces.map(_._2)
    // ---- optional SPAN KEEP-FIRST stage against the maintained shingle
    // index over every previously-kept doc's RAW trigrams (CurationJob's
    // spanIndex): a batch token is excised when covered by a dup trigram
    // start the committed corpus already holds — the committed holder
    // keeps the passage by arriving first — or whose batch-internal
    // keeper is a lower batch doc_id. Batch ids sit above every indexed
    // id (guarded), so arrival-order keep-first is EXACTLY the union
    // rebuild's min-id rule — no sequential-union caveat. ----
    val spanStarts: Option[DataFrame] = spanIndex.map { table =>
      CatalogCommit.requireCommitted(spark, table)
      val indexedIds = CatalogCommit.maskedByTombstones(spark, table,
        ShingleIndex.counts(spark, table)).select($"doc_id")
      val maxIndexed = indexedIds.agg(max($"doc_id")).head
      val minBatch = fk.agg(min($"doc_id")).head
      require(maxIndexed.isNullAt(0) || minBatch.isNullAt(0) ||
        minBatch.getLong(0) > maxIndexed.getLong(0),
        s"batch doc ids must exceed every id indexed in '$table' " +
          "(append-only daily feed contract) — lowest batch id " +
          s"${minBatch.get(0)} <= max indexed id ${maxIndexed.get(0)}")
      ShingleIndex.spanKeepFirstStartRowsFor(spark, table,
        fk.select($"doc_id",
          posexplode(shingleHashes($"text")).as(Seq("q", "h"))))
    }
    // both text-rewriting stages judge RAW text; their excision sets
    // UNION into one token rebuild (CurationJob's composition, mirrored)
    val allStarts = benchPieces.map(_._1).toSeq ++ spanStarts.toSeq
    val scrubKept: DataFrame =
      if (allStarts.isEmpty) finalKept
      else {
        val dupStarts = allStarts.reduce(_ unionByName _).distinct()
          .groupBy($"doc_id")
          .agg(sort_array(collect_list($"q")).as("dup_starts"))
        graft.queries.DedupQueries.scrubRebuild(spark, fk, dupStarts)
          .join(finalKept.select($"doc_id", $"digest"), Seq("doc_id"))
          .select($"doc_id", $"scrub_text".as("text"),
            ($"n_tokens" - $"n_removed").as("n_tokens"), $"digest")
      }
    // Pin that the finalKept lineage cut stays in place (today scrubKept
    // references a LogicalRDD leaf; remove the checkpoint above and this
    // fails loud, named, before the staging write formats the plan).
    graft.plans.PlanGuard.assertBounded(scrubKept, "DailyIncrement.scrubKept")

    // yesterday's pack continuation point — the persisted pack base, NOT
    // the manifest sum: after a takedown the masked manifest undercounts
    // the gapped shards, and after a repack the raw manifest OVERcounts
    // the renumbered ones; only the artifact both Takedown.repack and
    // this job maintain lands the next batch exactly at the shard end
    // (legacy trees without the artifact fall back to the raw sum —
    // correct until the first takedown/repack). Captured BEFORE appends
    // and STAGED with the kept set, so a recovery packs from the same
    // base the crashed run computed.
    val base = PackedExport.readBase(spark, s"$outDir/packbase").getOrElse(
      spark.read.parquet(s"$outDir/curated")
        .agg(coalesce(sum($"n_tokens"), lit(0L))).head.getLong(0))

    // ---- phase 1: stage (no standing artifact touched yet) ----
    val pend = pendingDir(outDir)
    deleteRecursively(pend) // un-sealed remnants of a crashed compute
    // every append below reads THIS parquet, not live lineage — the
    // durable form of the old localCheckpoint pin against the
    // read-path-you-write hazard (appends grow outDir/curated, which
    // kept's lineage reads)
    scrubKept.select($"doc_id", $"text", $"n_tokens", $"digest")
      .join(batchDocs.select($"doc_id", $"lang"), Seq("doc_id"))
      .select($"doc_id", $"text", $"lang", $"n_tokens", $"digest")
      .write.parquet(s"$pend/kept")
    // the benchmark index's append set: this batch's not-yet-indexed
    // eval survivors — staged so the benchidx apply step reads durable
    // data, and so a marker-driven retry appends the same set
    benchFresh.foreach { fe =>
      fe.select($"doc_id", $"text").write.parquet(s"$pend/bench_batch")
    }
    // the dedup index's append set is the PRE-near-dup decontam survivors
    // (the rebuild graph — see the gate above), minus re-delivered ids
    // (already indexed); staged separately from the manifest-bound kept set
    nearDupIndex.foreach { table =>
      kept
        .join(CatalogCommit.maskedByTombstones(spark, table,
          ShingleIndex.counts(spark, table)).select($"doc_id"),
          Seq("doc_id"), "left_anti")
        .select($"doc_id", $"text").write.parquet(s"$pend/shingle_batch")
    }
    // the span index's append set is the final kept docs' RAW text (the
    // passage claims of what ARRIVED — the scrubbed form never claims);
    // minus already-indexed ids (a replayed batch is fully caught by the
    // digest anti-join above, so this is the same defensive membership
    // mask the shingle_batch staging carries)
    spanIndex.foreach { table =>
      finalKept
        .join(CatalogCommit.maskedByTombstones(spark, table,
          ShingleIndex.counts(spark, table)).select($"doc_id"),
          Seq("doc_id"), "left_anti")
        .select($"doc_id", $"text").write.parquet(s"$pend/span_batch")
    }
    // index-append options + their staged TARGET batch ids: the apply
    // steps must be idempotent under marker-driven retries, and "the next
    // batch id" derived at apply time would drift once the index commits
    // (the batchno lesson applied to the index appends — appendAs no-ops
    // when the pointer already reached the staged target)
    val optLines = Seq(
      nearDupIndex.map(t => s"neardup_table=$t"),
      nearDupIndex.map { t =>
        CatalogCommit.requireCommitted(spark, t)
        s"shingle_target=${CatalogCommit.readLastBatch(spark, t).get + 1}"
      },
      overlapIndex.map(t => s"overlap_table=$t"),
      overlapIndex.map { t =>
        CatalogCommit.requireCommitted(spark, t)
        s"overlap_target=${CatalogCommit.readLastBatch(spark, t).get + 1}"
      },
      benchIndex.map(t => s"bench_table=$t"),
      benchIndex.map { t =>
        s"bench_target=${CatalogCommit.readLastBatch(spark, t).get + 1}"
      },
      spanIndex.map(t => s"span_table=$t"),
      spanIndex.map { t =>
        s"span_target=${CatalogCommit.readLastBatch(spark, t).get + 1}"
      }).flatten
    if (optLines.nonEmpty)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(pend, "opts"), optLines.mkString("\n"))
    batchEvalH.write.parquet(s"$pend/evalh")
    val keptStaged = spark.read.parquet(s"$pend/kept")
    embeddings
      .join(keptStaged.select($"doc_id".as("vec_id")), Seq("vec_id"), "left_semi")
      .select($"vec_id", $"embedding")
      .write.parquet(s"$pend/vectors")
    Seq(base).toDF("pack_base").coalesce(1).write.parquet(s"$pend/base")
    // this increment's batch id, staged so every apply step (and any
    // crash-recovery retry) stamps the SAME value — derived at apply
    // time it would drift once the curated step commits
    Seq(nextBatchNo(spark, outDir)).toDF("batch_no").coalesce(1)
      .write.parquet(s"$pend/batchno")
    java.nio.file.Files.createFile(java.nio.file.Paths.get(pend, "_staged"))

    val n = keptStaged.count()
    manifest.unpersist(); deduped.unpersist(); batchEvalH.unpersist()
    ndPairs.foreach(_.unpersist()); benchFresh.foreach(_.unpersist())
    n
  }

  /** Max committed `added_batch` over the curated manifest. Day-0 trees
    * from before the provenance column read as batch 0. */
  private def maxAddedBatch(spark: SparkSession, outDir: String): Long = {
    val cur = spark.read.parquet(s"$outDir/curated")
    if (cur.columns.contains("added_batch"))
      cur.agg(coalesce(max(col("added_batch")), lit(0L))).head.getLong(0)
    else 0L
  }

  /** The next unused batch id: one past the LARGER of the committed
    * manifest's max `added_batch` and the persisted monotonic counter
    * (`outDir/batchctr`, maintained by [[applyPending]]'s batchctr step).
    * The counter is what makes ids never-reused: if every doc of the
    * newest batch is taken down and [[Takedown.scrub]] physically removes
    * its rows (a poisoned daily feed), max(added_batch) DROPS — deriving
    * from it alone would reuse the scrubbed id and silently merge the
    * next increment's docs into the scrubbed batch's historical epoch in
    * every as-of view. Legacy trees without the artifact fall back to the
    * manifest max (correct until the first whole-batch scrub; the first
    * increment after this code writes the counter). */
  private def nextBatchNo(spark: SparkSession, outDir: String): Long = {
    val counter = PackedExport.readBase(spark, s"$outDir/batchctr").getOrElse(0L)
    math.max(maxAddedBatch(spark, outDir), counter) + 1
  }

  private def provCol(df: org.apache.spark.sql.DataFrame) =
    if (df.columns.contains("added_batch")) coalesce(col("added_batch"), lit(0L))
    else lit(0L)

  /** Committed batch ids, ascending (0 = day 0) — the as-of axis. */
  def batches(spark: SparkSession, outDir: String): Seq[Long] = {
    import spark.implicits._
    val cur = spark.read.parquet(s"$outDir/curated")
    cur.select(provCol(cur).as("b")).distinct().as[Long].collect().sorted.toSeq
  }

  /** TIME TRAVEL over the curation tree: the curated manifest exactly as
    * a trainer saw it after batch `n` committed — reproducibility's
    * core object ("which documents was the run trained on?"), answered
    * from the standing artifacts with one metadata filter, no snapshot
    * copies. Reads THROUGH [[Takedown.manifest]], so a document the
    * pipeline has since been ordered to forget is absent from EVERY
    * historical view — time travel must not resurrect forgotten data,
    * and after a [[Takedown.scrub]] the history is physically rewritten
    * (the one deliberate deviation from bit-exact historical replay,
    * documented there). */
  def manifestAsOf(spark: SparkSession, outDir: String, n: Long): org.apache.spark.sql.DataFrame = {
    val m = Takedown.manifest(spark, outDir)
    m.filter(provCol(m) <= n)
  }

  /** The training shards as of batch `n`: the shard rows of exactly the
    * [[manifestAsOf]] documents. Placement (shard id / offset) reflects
    * any later [[Takedown.repack]] — the doc SET is historical, the
    * packing is current (erasure rewrites placement by design). */
  def shardsAsOf(spark: SparkSession, outDir: String, n: Long): org.apache.spark.sql.DataFrame =
    Takedown.shards(spark, outDir)
      .join(manifestAsOf(spark, outDir, n).select(col("doc_id")),
        Seq("doc_id"), "left_semi")

  /** The eval-shingle benchmark as of batch `n` — what the decontam
    * stage actually checked against at that point in the tree's life. */
  def evalhAsOf(spark: SparkSession, outDir: String, n: Long): org.apache.spark.sql.DataFrame = {
    val e = Takedown.evalh(spark, outDir)
    e.filter(provCol(e) <= n)
  }

  /** Finish a crashed increment: execute every not-yet-done artifact
    * append from the sealed staging dir, then clear it. Idempotent and a
    * no-op on a quiescent tree — safe to call any time (runBatch calls
    * it first; an operator can call it explicitly after a crash). */
  def recover(spark: SparkSession, outDir: String): Unit =
    applyPending(spark, outDir)

  /** Phase 2+3 of the protocol: the artifact appends from staged
    * data, a `.done` marker after each (an append never executes twice),
    * staging cleared last. `failAfter` is the spec's crash-injection
    * seam — production callers never pass it. */
  private[graft] def applyPending(spark: SparkSession, outDir: String,
      failAfter: Option[String] = None): Unit = {
    import spark.implicits._
    val pend = pendingDir(outDir)
    val isSealed = java.nio.file.Files.exists(java.nio.file.Paths.get(pend, "_staged"))
    if (!isSealed) { deleteRecursively(pend); return }

    val kept = spark.read.parquet(s"$pend/kept") // doc_id, text, lang, n_tokens, digest
    val base = spark.read.parquet(s"$pend/base").head.getLong(0)
    // staged batch id; a pre-provenance staging dir (no batchno file)
    // derives it here. If the crash happened AFTER the curated step
    // committed, the appended rows already read as the CURRENT max epoch
    // (batch 0 on a pre-provenance tree) — deriving max+1 for the
    // remaining steps would stamp evalh/shards with a DIFFERENT epoch
    // than the manifest rows, permanently splitting the increment across
    // two as-of views; stamp the committed epoch instead. Before the
    // curated commit the derivation is free to pick the next id.
    val batchNo =
      if (java.nio.file.Files.exists(java.nio.file.Paths.get(s"$pend/batchno")))
        spark.read.parquet(s"$pend/batchno").head.getLong(0)
      else if (java.nio.file.Files.exists(java.nio.file.Paths.get(pend, "curated.done")))
        maxAddedBatch(spark, outDir)
      else nextBatchNo(spark, outDir)

    def step(name: String)(body: => Unit): Unit = {
      val marker = java.nio.file.Paths.get(pend, s"$name.done")
      if (!java.nio.file.Files.exists(marker)) {
        body
        java.nio.file.Files.createFile(marker)
      }
      if (failAfter.contains(name))
        throw new IllegalStateException(s"injected crash after $name append")
    }

    step("curated") {
      kept.select($"doc_id", $"n_tokens", $"digest")
        .withColumn("added_batch", lit(batchNo))
        .write.mode("append").parquet(s"$outDir/curated")
    }
    // the monotonic batch counter (nextBatchNo's scrub-proof source):
    // advances to the id just used, never backwards — a later
    // whole-batch Takedown.scrub can drop max(added_batch) but not this
    step("batchctr") {
      val prev = PackedExport.readBase(spark, s"$outDir/batchctr").getOrElse(0L)
      PackedExport.writeBase(spark, s"$outDir/batchctr", math.max(prev, batchNo))
    }
    // extend the persisted benchmark: tomorrow's batch must check against
    // today's eval survivors too (benchmark at batch k = day0 ∪ eval
    // survivors of batches 1..k — the sequential-union semantics the
    // header documents). Cross-batch duplicate hashes are fine: every
    // read side goes through .distinct().
    step("evalh") {
      spark.read.parquet(s"$pend/evalh")
        .withColumn("added_batch", lit(batchNo))
        .write.mode("append").parquet(s"$outDir/evalh")
    }
    step("shards") {
      val budget = CorpusQueries.PackBudget
      // same fail-fast as PackedExport.writeShards: an oversized doc
      // would jump the prefix sum across whole budgets and silently skip
      // shard ids, breaking the 0..N-1 enumeration contract
      val oversized = kept.filter($"n_tokens" > budget)
        .select($"doc_id", $"n_tokens").limit(1).collect()
      require(oversized.isEmpty,
        s"doc ${oversized.headOption.map(_.get(0)).orNull} has " +
          s"${oversized.headOption.map(_.get(1)).orNull} tokens > budget $budget — " +
          "chunk oversized docs (doc_chunk) before packing")
      if (!kept.isEmpty) {
        GlobalCumsum.runningBefore(
            kept.select($"doc_id", $"n_tokens"), "doc_id", "n_tokens", "cb")
          .select($"doc_id", $"n_tokens",
            expr(s"CAST((cb + $base) DIV $budget AS BIGINT)").as("shard"),
            (($"cb" + base) % budget).as("shard_offset"))
          .write.partitionBy("shard").mode("append").parquet(s"$outDir/shards")
      }
    }
    step("packbase") {
      PackedExport.writeBase(spark, s"$outDir/packbase",
        base + kept.agg(coalesce(sum($"n_tokens"), lit(0L))).head.getLong(0))
    }
    step("bm25") {
      Bm25Index.append(kept.select($"doc_id", $"text"), s"$outDir/bm25")
    }
    step("vectors") {
      VectorIndex.append(
        spark.read.parquet(s"$pend/vectors")
          .select($"vec_id", $"embedding"),
        s"$outDir/vectors")
    }
    step("dsir") {
      // read-append-write on the same path — the merged B-row table is
      // collected to the driver (it is sketch-sized by construction) and
      // re-created before the overwrite, so the write can never lazily
      // consume the files it is replacing
      val appended = DsirModel.append(
        DsirModel.load(spark, s"$outDir/dsir"),
        kept.select($"doc_id", $"text", $"lang"),
        $"lang" === "en")
      val pinned = spark.createDataFrame(
        java.util.Arrays.asList(appended.collect(): _*), appended.schema)
      DsirModel.write(pinned, s"$outDir/dsir")
    }
    // staged index-append options (absent on trees run without them and
    // on legacy staging dirs). appendAs is idempotent against the staged
    // target — a crash between an index's internal pointer commit and the
    // step marker retries as a no-op instead of appending twice.
    val opts: Map[String, String] = {
      val p = java.nio.file.Paths.get(pend, "opts")
      if (!java.nio.file.Files.exists(p)) Map.empty
      else java.nio.file.Files.readString(p).linesIterator
        .filter(_.contains("=")).map { l =>
          val i = l.indexOf('='); l.substring(0, i) -> l.substring(i + 1)
        }.toMap
    }
    opts.get("neardup_table").foreach { t =>
      step("shingleidx") {
        ShingleIndex.appendAs(
          spark.read.parquet(s"$pend/shingle_batch").select($"doc_id", $"text"),
          t, opts("shingle_target").toLong)
      }
    }
    opts.get("overlap_table").foreach { t =>
      step("overlapidx") {
        OverlapIndex.appendAs(kept.select($"doc_id", $"text"), t,
          opts("overlap_target").toLong)
      }
    }
    // extend the standing positioned BENCHMARK artifact with this batch's
    // eval survivors (the evalh step's sequential-union doctrine for the
    // scrub surface) — appendAs no-ops when the pointer already reached
    // the staged target (crash between the index commit and the marker)
    opts.get("bench_table").foreach { t =>
      step("benchidx") {
        OverlapIndex.appendAs(
          spark.read.parquet(s"$pend/bench_batch").select($"doc_id", $"text"),
          t, opts("bench_target").toLong)
      }
    }
    // extend the standing passage-claim surface with this batch's kept
    // docs' RAW trigrams — tomorrow's batch must lose any span today's
    // docs carried first (the evalh sequential-union doctrine, except
    // here daily ≡ union rebuild exactly: keeper = min id = first
    // arrival). appendAs no-ops when the pointer already reached the
    // staged target.
    opts.get("span_table").foreach { t =>
      step("spanidx") {
        ShingleIndex.appendAs(
          spark.read.parquet(s"$pend/span_batch").select($"doc_id", $"text"),
          t, opts("span_target").toLong)
      }
    }
    step("tokvocab") {
      // the tokenizer vocab is a MAINTAINED count table: the merge table
      // is frozen at day 0 (BpeTrainer.save's rationale), but piece
      // frequencies are mergeable, so each batch's pieces under the
      // frozen table fold in — the vocab always equals
      // BpeTrainer.vocabulary(all kept docs, day-0 merges), and
      // Takedown.run subtracts from the same table exactly. Same
      // collect-recreate-overwrite pin as the dsir step
      // (vocabulary-sized).
      val vocabDir = s"$outDir/tokenizer_vocab"
      if (java.nio.file.Files.exists(java.nio.file.Paths.get(vocabDir))) {
        val merges = BpeTrainer.load(spark, s"$outDir/tokenizer")
        val merged = spark.read.parquet(vocabDir).select($"piece", $"cnt")
          .unionByName(
            BpeTrainer.vocabulary(kept.select($"doc_id", $"text"), merges))
          .groupBy($"piece").agg(sum($"cnt").as("cnt"))
        val vocabPinned = spark.createDataFrame(
          java.util.Arrays.asList(merged.collect(): _*), merged.schema)
        vocabPinned.write.mode("overwrite").parquet(vocabDir)
      }
    }

    deleteRecursively(pend)
  }

  private def deleteRecursively(path: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.exists(p)) return
    import scala.jdk.CollectionConverters._
    val s = java.nio.file.Files.walk(p)
    try s.sorted(java.util.Comparator.reverseOrder())
      .iterator().asScala.foreach(java.nio.file.Files.delete)
    finally s.close()
  }
}

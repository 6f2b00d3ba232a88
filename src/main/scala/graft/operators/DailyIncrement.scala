package graft.operators

import org.apache.spark.sql.{Column, SparkSession}
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
  *     └─ selection model   DsirModel.append  → outDir/dsir/
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
  *     DailyIncrementSpec's compose test).
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

  def run(spark: SparkSession, sfDir: String, outDir: String,
      batchFilter: Column, tok: Tokenizer = Tokenizer.Whitespace): Result = {
    graft.GraftExtensions.register(spark)
    import spark.implicits._

    // the manifest and eval benchmark are read TOMBSTONE-MASKED (through
    // Takedown's readers): a taken-down doc must neither make a future
    // re-submission of its content "already present" (exact-dedup
    // anti-join) nor "contaminated" (evalh) — the pipeline would be
    // acting on fingerprints of forgotten data (round-10 advisory)
    val manifest = Takedown.manifest(spark, outDir).cache()

    // batch curation — each stage the day-0 rule verbatim
    val batch = Tables.load(spark, sfDir, "documents")
      .filter(batchFilter)
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
    // train side passes. The new hashes append to outDir/evalh below so
    // tomorrow's batch sees them too.
    val evalBase = Takedown.evalh(spark, outDir)
    // EAGER localCheckpoint: this plan's lineage (via `deduped`'s
    // anti-join) reads outDir/curated, which the appends below grow, and
    // the rows are themselves appended to outDir/evalh — pin them first
    // (same read-path-you-write hazard documented for `kept`). Kept as
    // (doc_id, h) pairs so a later takedown can forget them exactly.
    val batchEvalH = deduped
      .filter($"doc_id" % CorpusQueries.EvalMod === 0)
      .select($"doc_id", explode(shingleHashes($"text")).as("h")).distinct()
      .localCheckpoint(true)
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
    // EAGER localCheckpoint, not cache: the curated append below writes
    // to a path this plan READS (the manifest anti-join), and Spark's
    // path-based cache invalidation would silently re-evaluate `kept`
    // against the grown manifest — every batch digest suddenly "already
    // present", every later artifact append empty. Checkpointing cuts
    // the lineage so the kept set is pinned no matter what the appends
    // do to the source paths. (Batch-sized — a day's sliver, never the
    // corpus.)
    val kept = deduped
      .filter($"doc_id" % CorpusQueries.EvalMod =!= 0)
      .join(contaminated, Seq("doc_id"), "left_anti")
      .localCheckpoint(true)

    // yesterday's pack continuation point — the persisted pack base, NOT
    // the manifest sum: after a takedown the masked manifest undercounts
    // the gapped shards, and after a repack the raw manifest OVERcounts
    // the renumbered ones; only the artifact both Takedown.repack and
    // this job maintain lands the next batch exactly at the shard end
    // (legacy trees without the artifact fall back to the raw sum —
    // correct until the first takedown/repack). Captured BEFORE appends.
    val base = PackedExport.readBase(spark, s"$outDir/packbase").getOrElse(
      spark.read.parquet(s"$outDir/curated")
        .agg(coalesce(sum($"n_tokens"), lit(0L))).head.getLong(0))

    // ---- artifact appends (standing files never rewrite) ----

    kept.select($"doc_id", $"n_tokens", $"digest")
      .write.mode("append").parquet(s"$outDir/curated")

    // extend the persisted benchmark: tomorrow's batch must check against
    // today's eval survivors too (benchmark at batch k = day0 ∪ eval
    // survivors of batches 1..k — the sequential-union semantics the
    // header documents). Cross-batch duplicate hashes are fine: every
    // read side goes through .distinct().
    batchEvalH.write.mode("append").parquet(s"$outDir/evalh")

    val budget = CorpusQueries.PackBudget
    // same fail-fast as PackedExport.writeShards: an oversized doc would
    // jump the prefix sum across whole budgets and silently skip shard
    // ids, breaking the 0..N-1 enumeration contract the loader relies on
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
    // advance the pack base to the new shard end (kept is checkpointed,
    // so the sum is pinned against the appends above)
    PackedExport.writeBase(spark, s"$outDir/packbase",
      base + kept.agg(coalesce(sum($"n_tokens"), lit(0L))).head.getLong(0))

    Bm25Index.append(kept.select($"doc_id", $"text"), s"$outDir/bm25")

    VectorIndex.append(
      Tables.load(spark, sfDir, "embeddings")
        .join(kept.select($"doc_id".as("vec_id")), Seq("vec_id"), "left_semi")
        .select($"vec_id", $"embedding"),
      s"$outDir/vectors")

    // DSIR: read-append-write on the same path — the merged B-row table
    // is collected to the driver (it is sketch-sized by construction)
    // and re-created before the overwrite, so the write can never
    // lazily consume the files it is replacing
    val appended = DsirModel.append(
        DsirModel.load(spark, s"$outDir/dsir"),
        kept.select($"doc_id", $"text")
          .join(Tables.load(spark, sfDir, "documents").select($"doc_id", $"lang"), "doc_id"),
        $"lang" === "en")
    val pinned = spark.createDataFrame(
      java.util.Arrays.asList(appended.collect(): _*), appended.schema)
    DsirModel.write(pinned, s"$outDir/dsir")

    val n = kept.count()
    val nShards = spark.read.parquet(s"$outDir/shards")
      .agg(coalesce(max($"shard".cast("long")), lit(-1L))).head.getLong(0) + 1
    manifest.unpersist(); deduped.unpersist()
    Result(n, nShards)
  }
}

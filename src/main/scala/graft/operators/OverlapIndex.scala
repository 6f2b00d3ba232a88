package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.CrossHash.shingleHashes

/** Materialized POSITIONED shingle index — the production path for the
  * `decontam_runs` overlap-run measurement (Lee et al. 2022,
  * "Deduplicating Training Data Makes Language Models Better" §4).
  *
  * ShingleIndex stores distinct (doc_id, h) pairs — enough for jaccard /
  * containment / novelty set algebra, but run detection needs every
  * occurrence WITH its token position, a different relation (multiplicity
  * preserved, one int heavier per row). Storing positions in the same
  * table would force probes to re-distinct the pairs — an extra shuffle
  * of the index side that breaks its never-reshuffled property — so the
  * positioned occurrences are their own artifact:
  *
  *  - `<name>`: (doc_id, q, h) per trigram occurrence, PARTITIONED BY
  *    `batch` (the append-commit axis) and BUCKETED BY `h` — a probe
  *    joining on `h` co-locates against the bucket files
  *    (OverlapIndexSpec pins no exchange above the index scan).
  *
  * Lifecycle carries the [[CatalogCommit]] single-commit discipline
  * (the Bm25Index/ShingleIndex shape): appends land in their own batch
  * partition and one atomic pointer swap commits; a crashed append is
  * invisible and the retry clears its leftovers first. delete = broadcast
  * tombstone mask (a forgotten doc must stop matching — its runs would
  * otherwise keep flagging content the pipeline promised to forget);
  * vacuum = physical compaction with probes unchanged.
  *
  * The serving question this index answers at 100 TB: "a NEW benchmark
  * was adopted — which standing training docs share long verbatim runs
  * with it?" The benchmark side is MBs; without the index that question
  * costs a full corpus re-shingle per benchmark revision, with it the
  * probe reads only matching buckets ([[runsProbe]] cost is O(matching
  * hash pairs)).
  *
  * Reference telemetry shapes: none — the reference engine (an event
  * store) has no dedup surface; the algebra follows the published paper.
  */
object OverlapIndex {

  import CatalogCommit.{readLastBatch, writeLastBatch, dropUncommitted,
    clearOrphanLocation}

  /** The COMMITTED occurrence frame (doc_id, q, h) — batch-gated, NOT
    * tombstone-masked (probes go through the mask). */
  private[graft] def occurrences(spark: SparkSession, name: String): DataFrame =
    CatalogCommit.committed(spark, name, name)

  private def masked(spark: SparkSession, name: String, df: DataFrame): DataFrame =
    CatalogCommit.maskedByTombstones(spark, name, df)

  /** The committed, tombstone-masked occurrence frame — what a probe
    * actually matches against. Exposed so the daily-increment scrub
    * stage can union it with the in-flight batch's own eval occurrences
    * (the sequential-union benchmark semantics) before calling
    * [[scrubFrames]] directly. */
  private[graft] def maskedOccurrences(spark: SparkSession, name: String): DataFrame =
    masked(spark, name, occurrences(spark, name))

  /** (doc_id, q, h) positioned trigram occurrences of a (doc_id, text)
    * frame — the probe-side spelling, shared with the battery query. */
  private[graft] def positioned(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      posexplode(shingleHashes(col("text"))).as(Seq("q", "h")))

  private def writeBatch(docs: DataFrame, name: String, buckets: Int,
      batchNo: Long, overwrite: Boolean): Unit = {
    positioned(docs).withColumn("batch", lit(batchNo))
      .write.mode(if (overwrite) "overwrite" else "append")
      .partitionBy("batch").bucketBy(buckets, "h").saveAsTable(name)
  }

  /** Write the bucketed occurrence table for `docs` (doc_id, text) as
    * batch 0 and commit the pointer. */
  def materialize(docs: DataFrame, name: String, buckets: Int = 32): Unit = {
    val spark = docs.sparkSession
    graft.GraftExtensions.register(spark)
    clearOrphanLocation(spark, name)
    writeBatch(docs, name, buckets, batchNo = 0L, overwrite = true)
    writeLastBatch(spark, name, 0L)
  }

  /** Fold a new batch of training docs into the index (ids disjoint from
    * the corpus). Single-commit: see the header. */
  def append(batch: DataFrame, name: String, buckets: Int = 32): Unit =
    append(batch, name, buckets, failBeforeCommit = false)

  /** [[append]] with an EXPLICIT target batch id — idempotent under
    * marker-driven retries (the ShingleIndex.appendAs contract verbatim;
    * see its scaladoc). */
  def appendAs(batch: DataFrame, name: String, target: Long,
      buckets: Int = 32): Unit = {
    val spark = batch.sparkSession
    graft.GraftExtensions.register(spark)
    val last = readLastBatch(spark, name).getOrElse(
      spark.table(name).agg(coalesce(max(col("batch")), lit(0L))).head.getLong(0))
    if (last >= target) return // already committed — the retry is a no-op
    require(last == target - 1,
      s"appendAs($target) on '$name' at committed batch $last — appends are " +
        "serialized; a gap means the staged target is stale")
    dropUncommitted(spark, name, target)
    writeBatch(batch, name, buckets, batchNo = target, overwrite = false)
    writeLastBatch(spark, name, target)
  }

  /** `failBeforeCommit` is the spec's crash-injection seam (the
    * ShingleIndex shape). Production callers never pass it. */
  private[graft] def append(batch: DataFrame, name: String, buckets: Int,
      failBeforeCommit: Boolean): Unit = {
    val spark = batch.sparkSession
    graft.GraftExtensions.register(spark)
    val last = readLastBatch(spark, name).getOrElse(
      spark.table(name).agg(coalesce(max(col("batch")), lit(0L))).head.getLong(0))
    val next = last + 1
    dropUncommitted(spark, name, next)
    writeBatch(batch, name, buckets, batchNo = next, overwrite = false)
    if (failBeforeCommit)
      throw new IllegalStateException("injected crash before the append commit")
    writeLastBatch(spark, name, next)
  }

  /** Tombstone-mask documents out of the index (right-to-be-forgotten
    * for the overlap surface); idempotent, never-indexed ids no-op. */
  def delete(spark: SparkSession, name: String, ids: DataFrame): Unit = {
    graft.GraftExtensions.register(spark)
    CatalogCommit.appendTombstones(spark, name, ids)
  }

  /** Physically drop tombstoned docs' occurrences and the tombstones
    * themselves; probes before and after are identical (OverlapIndexSpec
    * pins it). All committed batches compact back into batch 0. Eager
    * localCheckpoint cuts the read-path-you-overwrite lineage (the
    * ShingleIndex.vacuum discipline). */
  def vacuum(spark: SparkSession, name: String, buckets: Int = 32): Unit = {
    if (!spark.catalog.tableExists(s"${name}_tombstones")) return
    compact(spark, name, buckets)
  }

  /** [[vacuum]] WITHOUT requiring tombstones — fold every committed
    * `batch=<n>` partition (tombstone-masked when a delete is in flight)
    * back into a single `batch=0` base, reset the pointer, drop applied
    * tombstones. The ShingleIndex.compact doctrine on the positioned
    * layout: probes identical before/after, idempotent fast path when
    * already single-base. Tree-level form: [[Maintenance.compact]]. */
  def compact(spark: SparkSession, name: String, buckets: Int = 32): Unit = {
    graft.GraftExtensions.register(spark)
    val hasTomb = spark.catalog.tableExists(s"${name}_tombstones")
    if (!hasTomb && CatalogCommit.batchDirs(spark, name) == Seq(0L) &&
        readLastBatch(spark, name).contains(0L)) return
    val kept = masked(spark, name, occurrences(spark, name)).localCheckpoint(true)
    // one file per non-empty bucket (the ShingleIndex.compact shape)
    kept.repartition(buckets, col("h")).withColumn("batch", lit(0L))
      .write.mode("overwrite").partitionBy("batch").bucketBy(buckets, "h")
      .saveAsTable(name)
    writeLastBatch(spark, name, 0L)
    if (hasTomb) spark.sql(s"DROP TABLE ${name}_tombstones")
  }

  /** Longest-contiguous-overlap runs of `evalDocs` (doc_id, text — the
    * benchmark, MBs by contract) against the standing TRAIN index:
    * (e_doc, t_doc, max_run_tokens, n_runs), rows where the longest run
    * reaches `minRun` tokens — the `decontam_runs` relation at
    * probe-only cost (the corpus text is never re-shingled; the bucketed
    * index side never re-shuffles). Equals the full recompute restricted
    * to the indexed train side (OverlapIndexSpec pins it; the
    * decontam_runs_idx driver gate makes it an oracle equality). */
  def runsProbe(spark: SparkSession, name: String, evalDocs: DataFrame,
      minRun: Long): DataFrame = {
    graft.GraftExtensions.register(spark)
    CatalogCommit.requireCommitted(spark, name)
    runsFrames(masked(spark, name, occurrences(spark, name)),
      positioned(evalDocs), minRun)
  }

  /** Scrub a training frame against an index holding the EVAL
    * benchmark's positioned occurrences — the roles MIRRORED vs
    * [[runsProbe]]: there the corpus is indexed once and each new
    * benchmark probes it; here the benchmark (MBs by contract) is the
    * standing artifact and each day's training batch probes it, so
    * "scrub today's batch against the benchmark" costs one batch-sized
    * pass and the benchmark-sized index join (AQE broadcasts it — the
    * training mass never shuffles for the match step). Returns
    * (doc_id, n_tokens, n_removed, scrub_text) for `trainDocs`; equals
    * `decontam_scrub` restricted to them (OverlapIndexSpec pins it; the
    * decontam_scrub_idx driver gate makes it an oracle equality). */
  def scrubProbe(spark: SparkSession, name: String, trainDocs: DataFrame,
      minRun: Long): DataFrame = {
    graft.GraftExtensions.register(spark)
    CatalogCommit.requireCommitted(spark, name)
    scrubFrames(trainDocs, positioned(trainDocs),
      masked(spark, name, occurrences(spark, name)), minRun)
  }

  /** The scrub algebra over arbitrary positioned frames — the
    * [[runsFrames]] island chain keeping the train position, one extra
    * window on the SAME partitioning for the island size, then the
    * span-scrub row-local token rebuild. Shared by the index probe
    * above and the self-contained `decontam_scrub` battery query. */
  private[graft] def scrubFrames(trainDocs: DataFrame, trOcc: DataFrame,
      evOcc: DataFrame, minRun: Long): DataFrame = {
    import graft.queries.CrossHash.tokens
    val perDoc = scrubStartRows(trOcc, evOcc, minRun).groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("q"))).as("cstarts"))
    trainDocs.select(col("doc_id"), tokens(col("text")).as("w"))
      .join(perDoc, Seq("doc_id"), "left")
      .withColumn("ds", coalesce(col("cstarts"), typedLit(Array.empty[Int])))
      .withColumn("kept", expr(
        "filter(sequence(0, size(w) - 1), i -> NOT exists(ds, q -> q >= i - 2 AND q <= i))"))
      .select(col("doc_id"),
        size(col("w")).cast("long").as("n_tokens"),
        (size(col("w")) - size(col("kept"))).cast("long").as("n_removed"),
        array_join(expr("transform(kept, i -> element_at(w, i + 1))"), " ")
          .as("scrub_text"))
  }

  /** The benchmark-scrub dup-start rows (doc_id = train doc, q = train
    * trigram start) of the island chain: every train start inside a
    * ≥`minRun`-token shared run. The starts half of [[scrubFrames]],
    * exposed so the curation path can UNION these with other
    * text-rewriting stages' starts (the span keep-first stage) before
    * one shared token rebuild. */
  private[graft] def scrubStartRows(trOcc: DataFrame, evOcc: DataFrame,
      minRun: Long): DataFrame = {
    val tr = trOcc.select(col("doc_id").as("t_doc"), col("q").as("qt"), col("h"))
    val ev = evOcc.select(col("doc_id").as("e_doc"), col("q").as("qe"), col("h"))
    val j = tr.join(ev, "h")
      .select(col("t_doc"), col("e_doc"), (col("qt") - col("qe")).as("diag"),
        col("qe"), col("qt"))
    val iw = Window.partitionBy(col("t_doc"), col("e_doc"), col("diag"))
      .orderBy(col("qe"))
    val isl = j.withColumn("isl", col("qe") - row_number().over(iw))
    val szw = Window.partitionBy(col("t_doc"), col("e_doc"), col("diag"), col("isl"))
    isl.withColumn("len", count(lit(1)).over(szw))
      .filter(col("len") >= minRun - 2)
      .select(col("t_doc").as("doc_id"), col("qt").as("q")).distinct()
  }

  /** The diagonal/island run algebra over arbitrary positioned
    * occurrence frames — shared by the index probe above and the
    * self-contained `decontam_runs` battery query (one algebra, two
    * readers). `trOcc`/`evOcc` are (doc_id, q, h); see the query's
    * scaladoc for the derivation (island of L trigram starts = L+2
    * contiguous shared tokens). */
  private[graft] def runsFrames(trOcc: DataFrame, evOcc: DataFrame,
      minRun: Long): DataFrame = {
    val tr = trOcc.select(col("doc_id").as("t_doc"), col("q").as("qt"), col("h"))
    val ev = evOcc.select(col("doc_id").as("e_doc"), col("q").as("qe"), col("h"))
    val j = tr.join(ev, "h")
      .select(col("t_doc"), col("e_doc"), (col("qt") - col("qe")).as("diag"),
        col("qe"))
    val iw = Window.partitionBy(col("t_doc"), col("e_doc"), col("diag"))
      .orderBy(col("qe"))
    val runs = j.withColumn("isl", col("qe") - row_number().over(iw))
      .groupBy(col("t_doc"), col("e_doc"), col("diag"), col("isl"))
      .agg((count(lit(1)) + 2).as("run_tokens"))
    runs.groupBy(col("e_doc"), col("t_doc"))
      .agg(max(col("run_tokens")).as("max_run_tokens"),
        sum(when(col("run_tokens") >= minRun, 1L).otherwise(0L)).as("n_runs"))
      .filter(col("max_run_tokens") >= minRun)
  }
}

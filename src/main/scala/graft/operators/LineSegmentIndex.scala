package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.CrossHash.{h60, tokens}

/** Materialized corpus segment-hash index for the line-dedup family — the
  * on-disk artifact `dedup_lines_incr`'s scaladoc promises ("at 100 TB the
  * corpus segment-hash set is a maintained artifact, not a recompute"):
  * the ShingleIndex pattern applied to CCNet-style paragraph dedup.
  *
  * [[materialize]] writes the distinct segment hashes BUCKETED BY `h`, so
  * every later probe joins co-located against the bucket files — the
  * corpus side is never re-shuffled (LineSegmentIndexSpec pins: no
  * exchange above the index scan). [[append]] folds a daily batch in by
  * writing only the hashes the index does not already hold — a
  * |batch|-bounded anti-join probe plus a file append under the same
  * bucket layout; the corpus files are never rewritten. [[probeDedup]]
  * line-dedups a new batch against the index at probe-only cost and
  * equals the `dedup_lines_incr` recompute verdict exactly.
  */
object LineSegmentIndex {
  /** Segment width in tokens (pseudo-paragraphs — the synthetic corpus
    * has no newlines; production swaps in split('\n'), same algebra). */
  val LineSegTokens = 12

  /** Per-doc segment capacity of the packed okey: seg_idx must stay below
    * this or okey stops being a total order (and doc_id·SegIdxLimit can
    * overflow Long for doc_id ≥ 2⁶³/10⁵ ≈ 9.2e13 — far above any corpus).
    * Enforced at runtime in [[segments]]: a doc over SegIdxLimit·w tokens
    * would otherwise silently mis-rank first-occurrence winners. */
  val SegIdxLimit = 100000L

  /** (doc_id, seg_idx, seg, h, okey) occurrence rows: non-overlapping
    * `w`-token windows, 60-bit segment hash, and the BIGINT total-order
    * key (doc_id·100000 + seg_idx) that min() resolves winners by —
    * guarded: a seg_idx ≥ [[SegIdxLimit]] fails the job instead of
    * corrupting the winner order (route such docs through doc_chunk). */
  def segments(docs: DataFrame, w: Int = LineSegTokens,
      carry: Seq[String] = Nil): DataFrame = {
    graft.GraftExtensions.register(docs.sparkSession)
    val extra = carry.map(col)
    docs
      .select(col("doc_id") +: extra :+ tokens(col("text")).as("w"): _*)
      .select(col("doc_id") +: extra :+ posexplode(expr(
        s"CASE WHEN size(w) >= 1 THEN transform(sequence(0, CAST((size(w)-1) DIV $w AS INT)), " +
          s"i -> array_join(slice(w, i*$w + 1, $w), ' ')) ELSE array() END")).as(Seq("seg_idx", "seg")): _*)
      .withColumn("h", h60(col("seg")))
      .withColumn("okey",
        when(col("seg_idx") >= SegIdxLimit, raise_error(concat_ws(" ",
          lit("LineSegmentIndex: doc"), col("doc_id"),
          lit(s"exceeds $SegIdxLimit segments (~${SegIdxLimit * w} tokens at w=$w) — " +
            "the packed okey would mis-rank winners; chunk oversized docs first"))))
        .otherwise(col("doc_id") * SegIdxLimit + col("seg_idx")))
  }

  /** Distinct segment hashes of a corpus — the in-memory form of the
    * index (the materialized table is this, bucketed on disk). */
  def hashSet(corpus: DataFrame): DataFrame =
    segments(corpus).select(col("h")).distinct()

  /** Rebuild (doc_id, n_segs, n_kept, dedup_text) from occurrence rows
    * flagged with a boolean `kept` — surviving segments rejoin in
    * seg_idx order. */
  def reassemble(flagged: DataFrame): DataFrame =
    flagged.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_segs"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(when(col("kept"), struct(col("seg_idx"), col("seg"))))),
          x => x("seg")), " ").as("dedup_text"))

  /** Write the bucketed index for `docs` (doc_id, text): DISTINCT
    * (doc_id, h) pairs, bucketed by `h`. The doc attribution is what
    * makes [[delete]] exact — with a bare hash set, forgetting a doc
    * would either leave its hashes suppressing future copies of removed
    * content forever, or over-forget hashes it shared with surviving
    * docs. Probes project the (tombstone-masked) distinct `h` set; the
    * bucket layout keeps that projection co-located. */
  def materialize(docs: DataFrame, name: String, buckets: Int = 32): Unit =
    segments(docs).select(col("doc_id"), col("h")).distinct()
      .write.mode("overwrite").bucketBy(buckets, "h").saveAsTable(name)

  /** Fold a new batch into the index: the batch's distinct (doc_id, h)
    * pairs append under the same bucket layout (|batch|-bounded; the
    * standing files never rewrite; batch doc_ids disjoint from the
    * corpus — the ShingleIndex.probe contract). The resulting hash SET
    * is EXACTLY `materialize(corpus ∪ batch)`'s — pinned in
    * LineSegmentIndexSpec. Every batch occurrence is recorded (not just
    * first-seen hashes) so a later [[delete]] of any doc stays exact. */
  def append(batch: DataFrame, name: String, buckets: Int = 32): Unit =
    segments(batch).select(col("doc_id"), col("h")).distinct()
      .write.mode("append").bucketBy(buckets, "h").saveAsTable(name)

  /** Delete documents from the index — the right-to-be-forgotten path
    * for the LINE-dedup surface (the ShingleIndex.delete doctrine):
    * tombstone-masked, so the bucketed index mass is untouched and the
    * probe-side hash set becomes exactly the surviving docs' — a hash
    * survives iff some non-deleted doc still holds it. After delete,
    * [[probeDedup]] equals a probe of an index materialized without the
    * removed docs (TakedownSpec pins it); idempotent, never-indexed ids
    * are no-ops. */
  def delete(spark: SparkSession, name: String, ids: DataFrame): Unit = {
    graft.GraftExtensions.register(spark)
    ids.select(col(ids.columns.head).as("doc_id")).distinct()
      .write.mode("append").saveAsTable(s"${name}_tombstones")
  }

  /** The index's surviving distinct hash set: tombstone-masked pairs
    * projected to `h`. The mask joins broadcast (|deleted|-sized) and
    * the distinct aggregates within the bucket layout, so the index is
    * still never re-shuffled in a probe. */
  private def maskedPairs(spark: SparkSession, name: String): DataFrame =
    if (!spark.catalog.tableExists(s"${name}_tombstones")) spark.table(name)
    else spark.table(name).join(
      spark.table(s"${name}_tombstones").select(col("doc_id")).distinct(),
      Seq("doc_id"), "left_anti")

  private def maskedHashes(spark: SparkSession, name: String): DataFrame =
    maskedPairs(spark, name).select(col("h")).distinct()

  /** Physically drop tombstoned docs' pairs and the tombstone table —
    * completes [[delete]]'s right-to-be-forgotten on disk (the
    * ShingleIndex.vacuum discipline verbatim: checkpoint-pinned in-place
    * rewrite, probes identical before/after). */
  def vacuum(spark: SparkSession, name: String, buckets: Int = 32): Unit = {
    if (!spark.catalog.tableExists(s"${name}_tombstones")) return
    compact(spark, name, buckets)
  }

  /** [[vacuum]] WITHOUT requiring tombstones — rewrite the bucket layout
    * once, folding the per-[[append]] file accumulation back into one
    * compact file set (this table has no batch partitions; the
    * small-files growth here is per-append files inside each bucket).
    * Probes identical before/after; applied tombstones drop. Tree-level
    * form: [[Maintenance.compact]]. */
  def compact(spark: SparkSession, name: String, buckets: Int = 32): Unit = {
    graft.GraftExtensions.register(spark)
    val hasTomb = spark.catalog.tableExists(s"${name}_tombstones")
    // idempotent fast path: nothing masked and the file count already at
    // the folded bound (≤ one file per bucket) — a scheduled re-run must
    // not repeat the rewrite, nor re-expose the in-place overwrite
    // window for nothing
    if (!hasTomb && CatalogCommit.dataFileCount(
        CatalogCommit.tableLocation(spark, name)) <= buckets.toLong) return
    val kept = maskedPairs(spark, name).localCheckpoint(true)
    // one file per non-empty bucket (the ShingleIndex.compact shape)
    kept.repartition(buckets, col("h"))
      .write.mode("overwrite").bucketBy(buckets, "h").saveAsTable(name)
    if (hasTomb) spark.sql(s"DROP TABLE ${name}_tombstones")
  }

  /** Line-dedup a new batch (doc_id, text) against the index with
    * append-order semantics (the indexed corpus precedes the batch): a
    * batch segment drops when its hash is in the index or an earlier
    * batch occurrence holds it. Equals `dedup_lines_incr`'s verdicts when
    * the index holds the same corpus — at probe cost: the index side
    * joins co-located, only batch-sized rows shuffle. */
  def probeDedup(spark: SparkSession, name: String, batch: DataFrame): DataFrame = {
    val segs = segments(batch).cache()
    val idx = maskedHashes(spark, name).withColumn("in_corpus", lit(1))
    val batchWin = segs.groupBy(col("h"))
      .agg(count(lit(1)).as("cnt"), min(col("okey")).as("wkey"))
      .filter(col("cnt") >= 2)
      .select(col("h"), col("wkey"))
    reassemble(
      segs.join(idx, Seq("h"), "left")
        .join(batchWin, Seq("h"), "left")
        .withColumn("kept",
          col("in_corpus").isNull && (col("wkey").isNull || col("okey") === col("wkey"))))
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.CrossHash.shingleHashes

/** Materialized corpus shingle index: the on-disk form every incremental
  * dedup scaladoc promises ("at 100 TB the corpus shingle index is written
  * bucketed by `h`, so the probe is a co-located join").
  *
  * [[materialize]] writes two tables:
  *  - `<name>`: distinct (doc_id, h) BUCKETED BY h — a probe joining on
  *    `h` co-locates against the bucket files, so the corpus index is
  *    never re-shuffled (ShingleIndexSpec pins: no exchange above the
  *    index scan in the probe plan);
  *  - `<name>_counts`: (doc_id, n) per-doc shingle counts, derived from
  *    the index itself (no second shingle pass over the text).
  *
  * [[probe]] then deduplicates a NEW batch against the corpus WITHOUT
  * touching the corpus text: batch-vs-corpus candidates come from the
  * co-located bucket join (only the batch side shuffles), batch-vs-batch
  * from a |batch|-bounded self-join — the IncrementalDedup pair set
  * (ShingleIndexSpec pins the equality), at probe-only cost.
  */
object ShingleIndex {
  /** Write the bucketed index tables for `docs` (doc_id, text). */
  def materialize(docs: DataFrame, name: String, buckets: Int = 32): Unit = {
    val spark = docs.sparkSession
    graft.GraftExtensions.register(spark)
    docs.select(col("doc_id"), explode(shingleHashes(col("text"))).as("h"))
      .distinct()
      .write.mode("overwrite").bucketBy(buckets, "h").saveAsTable(name)
    spark.table(name)
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      .write.mode("overwrite").saveAsTable(s"${name}_counts")
  }

  /** Fold a new batch into the index — the daily path (the
    * LineSegmentIndex.append / Bm25Index.append doctrine): the batch's
    * distinct (doc_id, h) pairs append under the same bucket layout and
    * the counts side merges batch-sized; the standing bucket files never
    * rewrite. Batch doc_ids must be disjoint from the corpus (the
    * [[probe]] contract). After append, probing a NEWER batch equals
    * probing an index materialized over corpus ∪ batch —
    * ShingleIndexSpec pins it.
    *
    * ATOMICITY WINDOW (documented, not closed): the two table appends
    * commit independently — each job's own file-commit protocol is
    * atomic, but a crash BETWEEN them leaves pairs without counts, and
    * a blind re-run of the whole append duplicates the pairs rows
    * (duplicate (doc_id, h) rows double [[probe]]'s intersection
    * counts). Callers needing crash-safe daily folds should drive this
    * from an idempotent batch protocol (the DailyIncrement staged
    * .done-marker discipline, or Bm25Index.append's batch-partitioned
    * single-commit layout — the remedy if this index ever joins a
    * marker-less streaming path). */
  def append(batch: DataFrame, name: String, buckets: Int = 32): Unit = {
    val spark = batch.sparkSession
    graft.GraftExtensions.register(spark)
    val pairs = batch
      .select(col("doc_id"), explode(shingleHashes(col("text"))).as("h"))
      .distinct().cache()
    pairs.write.mode("append").bucketBy(buckets, "h").saveAsTable(name)
    pairs.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      .write.mode("append").saveAsTable(s"${name}_counts")
    pairs.unpersist()
  }

  /** Delete documents from the index — the right-to-be-forgotten path
    * for the DEDUP surface, which matters beyond storage hygiene: while
    * the removed doc's shingles remain, tomorrow's copy of that content
    * would be silently dropped as a "duplicate" of data the pipeline
    * promised to forget — the index would keep acting on a fingerprint
    * of removed content. Tombstone mask (the Bm25Index.delete doctrine):
    * the bucketed index mass is untouched, and the mask joins broadcast,
    * so the probe's no-shuffle-above-the-index-scan property survives.
    * After delete, [[probe]] equals a probe of an index materialized
    * without the removed docs (ShingleIndexSpec pins it); idempotent,
    * never-indexed ids are no-ops. */
  def delete(spark: SparkSession, name: String, ids: DataFrame): Unit = {
    graft.GraftExtensions.register(spark)
    ids.select(col(ids.columns.head).as("doc_id")).distinct()
      .write.mode("append").saveAsTable(s"${name}_tombstones")
  }

  private def masked(spark: SparkSession, name: String, df: DataFrame): DataFrame =
    if (!spark.catalog.tableExists(s"${name}_tombstones")) df
    else df.join(spark.table(s"${name}_tombstones").select(col("doc_id")).distinct(),
      Seq("doc_id"), "left_anti")

  /** Physically drop tombstoned docs' pairs and the tombstones themselves
    * — the compaction that completes [[delete]]'s right-to-be-forgotten
    * (a mask hides removed ids from probes; their bytes — and the
    * tombstone list naming them — remain on disk until this runs). Probes
    * before and after are identical. EAGER localCheckpoint pins the
    * surviving pairs before the in-place table overwrite (catalog tables
    * can't pointer-swap like Bm25Index's dirs; the checkpoint cuts the
    * read-path-you-write lineage and fails loud on block loss). Corpus-
    * index-sized — run on the operator's schedule (the Bm25Index.vacuum
    * discipline). */
  def vacuum(spark: SparkSession, name: String, buckets: Int = 32): Unit = {
    if (!spark.catalog.tableExists(s"${name}_tombstones")) return
    val kept = masked(spark, name, spark.table(name)).localCheckpoint(true)
    kept.write.mode("overwrite").bucketBy(buckets, "h").saveAsTable(name)
    spark.table(name)
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      .write.mode("overwrite").saveAsTable(s"${name}_counts")
    spark.sql(s"DROP TABLE ${name}_tombstones")
  }

  /** Per-batch-doc NOVELTY against the standing corpus — the
    * text_novelty audit at PROBE-ONLY cost: a batch doc's shingle is
    * novel iff no doc with a lower id (corpus OR batch) carries it, so
    * the probe needs each matching hash's MINIMUM corpus id, which the
    * co-located bucket join delivers without touching corpus text.
    * Tombstone-masked like [[probe]] (a forgotten doc stops claiming
    * first-occurrence). Returns (doc_id, n_shingles, n_novel,
    * novelty_frac) for the batch docs — equal to the full corpus-wide
    * `text_novelty` restricted to them (ShingleIndexSpec pins it). */
  def noveltyProbe(spark: SparkSession, name: String, batch: DataFrame): DataFrame = {
    graft.GraftExtensions.register(spark)
    val bsh = batch
      .select(col("doc_id"), explode(shingleHashes(col("text"))).as("h"))
      .distinct().cache()
    val bmin = bsh.groupBy(col("h")).agg(min(col("doc_id")).as("bm"))
    // corpus min id per BATCH hash only: the bucketed index side never
    // shuffles; matching postings group to |batch hashes| rows
    val cmin = masked(spark, name, spark.table(name))
      .join(bmin.select(col("h")), Seq("h"), "left_semi")
      .groupBy(col("h")).agg(min(col("doc_id")).as("cm"))
    val firsts = bmin.join(cmin, Seq("h"), "left")
      .select(col("h"), least(coalesce(col("cm"), col("bm")), col("bm")).as("first_doc"))
    bsh.join(firsts, "h")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
      .select(col("doc_id"), col("n_shingles"), col("n_novel"),
        (col("n_novel").cast("double") / col("n_shingles")).as("novelty_frac"))
  }

  /** Near-dup pairs (doc_a, doc_b, jaccard ≥ threshold) between a new
    * batch (doc_id, text; ids disjoint from the corpus) and the
    * materialized index — plus within the batch itself. Equals
    * `IncrementalDedup.newPairs` on the same split. */
  def probe(spark: SparkSession, name: String, batch: DataFrame,
      threshold: Double): DataFrame = {
    graft.GraftExtensions.register(spark)
    val bsh = batch
      .select(col("doc_id"), explode(shingleHashes(col("text"))).as("h"))
      .distinct()
      .cache()
    val bcnt = bsh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val idx = masked(spark, name, spark.table(name))
    val ccnt = masked(spark, name, spark.table(s"${name}_counts"))

    // batch-vs-corpus: the bucketed index side never shuffles — only the
    // (small) batch repartitions to the bucket layout
    val cross = bsh.as("a").join(idx.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") =!= col("b.doc_id"))
      .groupBy(col("a.doc_id").as("bdoc"), col("b.doc_id").as("cdoc"))
      .agg(count(lit(1)).as("inter"))
    // candidate pairs are batch-bounded — broadcast THEM against the
    // corpus-sized counts table (never the reverse)
    val crossN = ccnt.select(col("doc_id").as("cdoc"), col("n").as("nb"))
      .join(broadcast(cross
        .join(bcnt.select(col("doc_id").as("bdoc"), col("n").as("na")), "bdoc")), "cdoc")

    // batch-vs-batch: |batch|-bounded self-join, each pair once
    val self = bsh.as("a").join(bsh.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("bdoc"), col("b.doc_id").as("cdoc"))
      .agg(count(lit(1)).as("inter"))
    val selfN = self
      .join(bcnt.select(col("doc_id").as("bdoc"), col("n").as("na")), "bdoc")
      .join(bcnt.select(col("doc_id").as("cdoc"), col("n").as("nb")), "cdoc")

    val j = col("inter").cast("double") / (col("na") + col("nb") - col("inter"))
    crossN.select(col("bdoc"), col("cdoc"), col("inter"), col("na"), col("nb"))
      .unionByName(selfN.select(col("bdoc"), col("cdoc"), col("inter"), col("na"), col("nb")))
      .filter(j >= threshold)
      .select(
        least(col("bdoc"), col("cdoc")).as("doc_a"),
        greatest(col("bdoc"), col("cdoc")).as("doc_b"),
        j.as("jaccard"))
  }
}

package graft.streaming

import java.nio.file.{Files, Path}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Bm25Index
import graft.queries.CrossHash.{h60, tokens}

/** Continuous BM25 retrieval: score a STREAM of query-term batches
  * against a static [[graft.operators.Bm25Index]] — the serving side of
  * the index-once/probe-daily split (StreamingDedup's stream-static
  * doctrine applied to ranked search).
  *
  * The static side is the fully-joined scoring frame (postings ⋈ df ⋈
  * corpus stats, denormalized once and cached by the caller); each
  * micro-batch stream-static-joins on `term` — no per-trigger re-read of
  * the corpus, no streaming state for the join itself. The per-(query,
  * doc) score sum is a windowed streaming aggregation: scores emit once
  * per query window when the watermark closes it (append mode — each
  * fused score is final, never retracted), and the summed quantity is the
  * exact scaled-long contribution, so a streamed score equals the batch
  * probe's bit-for-bit.
  *
  * At 100 TB the static frame is the bucket-partitioned index on disk;
  * Spark re-plans the join per trigger, so the stream side's term set
  * drives partition pruning the same way the batch probe's static IN
  * list does.
  */
object StreamingRetrieval {
  /** Load the denormalized static scoring frame from a built index —
    * tombstone-masked, so a served index reflects deletes immediately
    * (the terms/stats sides were already updated exactly at delete
    * time). */
  def scoringFrame(spark: SparkSession, path: String): DataFrame = {
    val postings = Bm25Index.masked(spark, path,
        spark.read.parquet(Bm25Index.postingsPath(path)))
      .select(col("term"), col("doc_id"), col("tf"), col("dl"))
    val terms = spark.read.parquet(Bm25Index.termsPath(path))
      .select(col("term"), col("dfreq"))
    val stats = spark.read.parquet(Bm25Index.statsPath(path))
    postings.join(terms, "term").crossJoin(stats)
  }

  /** Windowed streaming BM25 scores for a query-term stream
    * (query_id, term, `eventTimeCol`): one (window, query_id, doc_id,
    * score_scaled) row per query and candidate document, emitted when the
    * watermark passes the window end. */
  def probe(queries: DataFrame, scoring: DataFrame,
      eventTimeCol: String = "ts", watermark: String = "10 minutes",
      windowLen: String = "10 minutes"): DataFrame =
    queries
      .withWatermark(eventTimeCol, watermark)
      .join(scoring, "term")
      .select(col(eventTimeCol), col("query_id"), col("doc_id"),
        Bm25Index.contrib(col("tf"), col("dl"), col("dfreq"),
          col("n_docs"), col("total_dl")).as("sc"))
      .groupBy(window(col(eventTimeCol), windowLen), col("query_id"), col("doc_id"))
      .agg(sum(col("sc")).as("score_scaled"))
      .select(col("query_id"), col("doc_id"), col("score_scaled"))
}

/** Continuously-maintained BM25 index over a DOCUMENT stream — the
  * index-maintenance twin of [[StreamingRetrieval]]'s serving path, with
  * the StatsView exactly-once discipline:
  *
  *  - postings are partitioned by (batch, bucket) and each micro-batch
  *    writes ONLY its own `batch=<id>` partitions via dynamic partition
  *    overwrite — a re-run after a crash rewrites the identical
  *    partitions (the batch content is deterministic), so the postings
  *    write is idempotent per batch id;
  *  - the vocabulary-sized df table and 1-row stats merge
  *    (previous-committed ⊎ delta) are staged and committed ATOMICALLY
  *    with the [[EosProjection]] batch marker;
  *  - readers gate on the marker: [[probe]] reads postings with
  *    `batch <= lastCommitted` (partition-pruned) and the side tables of
  *    the last committed batch — orphan partitions from a crashed
  *    attempt are invisible until their batch commits (the EventLog
  *    manifest-gated-reader pattern applied to the index).
  *
  * Scores probe bit-identically to a batch [[Bm25Index]] built on the
  * union of all delivered documents (StreamingRetrievalSpec pins it,
  * replay included). Doc ids must be unique across the stream's life
  * (the IncrementalDedup contract). */
final class MaintainedBm25Index(path: Path, spark: SparkSession, buckets: Int = 32) {
  private val proj = new EosProjection(path.resolve("eos"))
  private def postingsDir = path.resolve("postings")

  def lastCommitted: Long = proj.lastCommitted

  private def sides(id: Long): Option[(DataFrame, DataFrame)] =
    if (id < 0) None
    else Some((
      spark.read.parquet(path.resolve(s"eos/batch-$id/terms").toString),
      spark.read.parquet(path.resolve(s"eos/batch-$id/stats").toString)))

  /** foreachBatch body — attach via `writeStream.foreachBatch(idx.update _)`.
    * `batch` needs columns (doc_id, text). */
  def update(batch: DataFrame, batchId: Long): Unit =
    proj.foreachBatch { (df, id, stage) =>
      graft.GraftExtensions.register(spark)
      val tok = df.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      val tf = tok.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf")).cache()
      val dl = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
      tf.join(dl, "doc_id")
        .withColumn("b", pmod(h60(col("term")), lit(buckets.toLong)))
        .withColumn("batch", lit(id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch", "b")
        .parquet(postingsDir.toString)
      val deltaTerms = tf.groupBy(col("term")).agg(count(lit(1)).as("dfreq"))
      val deltaStats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_dl"))
      val (terms, stats) = sides(proj.lastCommitted) match {
        case None => (deltaTerms, deltaStats)
        case Some((pt, ps)) =>
          (pt.unionByName(deltaTerms).groupBy(col("term"))
             .agg(sum(col("dfreq")).as("dfreq")),
           ps.unionByName(deltaStats)
             .agg(sum(col("n_docs")).as("n_docs"), sum(col("total_dl")).as("total_dl")))
      }
      terms.write.parquet(stage.resolve("terms").toString)
      stats.select(coalesce(col("n_docs"), lit(0L)).as("n_docs"),
          coalesce(col("total_dl"), lit(0L)).as("total_dl"))
        .write.parquet(stage.resolve("stats").toString)
      tf.unpersist()
      ()
    }(batch, batchId)

  /** BM25 scores of `qterms` (query_id, term) against the committed index
    * state — bucket-pruned like the static probe, batch-gated on the
    * marker. Empty before the first commit. */
  def probe(qterms: DataFrame): DataFrame = {
    graft.GraftExtensions.register(spark)
    val last = proj.lastCommitted
    val empty = qterms.select(col("query_id"), lit(0L).as("doc_id"),
      lit(0L).as("score_scaled")).limit(0)
    if (last < 0 || !Files.exists(postingsDir)) empty
    else {
      val qb = qterms.withColumn("b", pmod(h60(col("term")), lit(buckets.toLong))).cache()
      val probed = qb.select(col("b")).distinct().collect().map(_.getLong(0)).toSeq
      val (terms, stats) = sides(last).get
      val postings = spark.read.parquet(postingsDir.toString)
        .filter(col("batch") <= last && col("b").isin(probed: _*))
      qb.join(postings, Seq("b", "term"))
        .join(terms, "term")
        .crossJoin(stats) // 1 row — AQE broadcasts
        .select(col("query_id"), col("doc_id"),
          Bm25Index.contrib(col("tf"), col("dl"), col("dfreq"),
            col("n_docs"), col("total_dl")).as("sc"))
        .groupBy(col("query_id"), col("doc_id"))
        .agg(sum(col("sc")).as("score_scaled"))
    }
  }
}

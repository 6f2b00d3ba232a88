package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Bm25Index

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
  /** Load the denormalized static scoring frame from a built index. */
  def scoringFrame(spark: SparkSession, path: String): DataFrame = {
    val postings = spark.read.parquet(s"$path/postings")
      .select(col("term"), col("doc_id"), col("tf"), col("dl"))
    val terms = spark.read.parquet(s"$path/terms")
      .select(col("term"), col("dfreq"))
    val stats = spark.read.parquet(s"$path/stats")
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

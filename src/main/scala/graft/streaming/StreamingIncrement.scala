package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Tokenizer
import graft.operators.DailyIncrement

/** Continuous ingestion of the curation tree: a DOCUMENT stream extends
  * [[graft.operators.CurationJob]]'s artifacts micro-batch by
  * micro-batch — the streaming form of [[DailyIncrement]] (crawl output
  * lands as a feed, not a nightly drop).
  *
  * Exactly-once from two mechanisms the batch operator already carries,
  * with no batch-id machinery here:
  *
  *  - a CRASHED batch (foreachBatch died mid-append) is a sealed
  *    `_increment_pending` staging dir; the next trigger's
  *    `DailyIncrement.runBatch` rolls it forward before touching the
  *    tree (the staged-increment protocol), so no artifact can drift;
  *  - a REPLAYED batch (Structured Streaming's at-least-once redelivery)
  *    anti-joins the content-addressed manifest and keeps nothing — all
  *    seven appends write zero rows.
  *
  * StreamingIncrementSpec pins streamed splits ≡ the same splits run as
  * batch DailyIncrements (every artifact), and replayed batches as
  * no-ops. Per-trigger cost is batch-sized (the DailyIncrement
  * contract): the standing corpus is never re-read.
  *
  * `docs` needs (doc_id, text, lang); `embeddings` is the static vector
  * side (vec_id, embedding). Returns the foreachBatch body to attach:
  * {{{
  *   docs.writeStream
  *     .foreachBatch(StreamingIncrement.apply(spark, embeddings, outDir))
  *     .start()
  * }}}
  */
object StreamingIncrement {
  /** The optional stage indexes are [[DailyIncrement.runBatch]]'s,
    * passed through verbatim: `nearDupIndex` (the standing dedup-graph
    * ShingleIndex), `overlapIndex` (positioned corpus artifact),
    * `benchIndex` (the positioned benchmark the scrub stage probes),
    * `spanIndex` (the passage-claim surface the keep-first stage
    * probes) — the streaming feed gets the full-strength DAG, and the
    * exactly-once story is unchanged because runBatch already carries
    * each index append inside its staged marker protocol. */
  def apply(spark: SparkSession, embeddings: DataFrame, outDir: String,
      tok: Tokenizer = Tokenizer.Whitespace,
      nearDupIndex: Option[String] = None,
      overlapIndex: Option[String] = None,
      benchIndex: Option[String] = None,
      spanIndex: Option[String] = None): (DataFrame, Long) => Unit =
    (batch: DataFrame, _: Long) => {
      // pin the batch before runBatch's appends mutate paths its own
      // staging plan reads (the read-path-you-write discipline);
      // batch-sized rows
      val pinned = batch.localCheckpoint(true)
      if (!pinned.isEmpty) {
        DailyIncrement.runBatch(spark,
          pinned.select(col("doc_id"), col("text"), col("lang")),
          embeddings, outDir, tok,
          nearDupIndex = nearDupIndex, overlapIndex = overlapIndex,
          benchIndex = benchIndex, spanIndex = spanIndex)
        ()
      }
    }
}

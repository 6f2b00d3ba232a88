package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Takedown

/** Continuous right-to-be-forgotten: apply a STREAM of takedown requests
  * to a curation output tree as they arrive — the operational form of
  * [[graft.operators.Takedown]] (opt-outs and legal removals land as a
  * feed, not a weekly batch).
  *
  * Exactly-once WITHOUT a staged commit: `Takedown.run` is itself
  * idempotent (incoming ids anti-join the takedown tombstones, and every
  * index delete carries its own guard), so a replayed micro-batch —
  * Structured Streaming's at-least-once `foreachBatch` after a crash —
  * re-submits ids that are already tombstoned and becomes a no-op. The
  * idempotency that protects an operator RETRY is exactly what makes the
  * streaming delivery semantics safe; no extra state beyond the
  * artifacts' own tombstones (StreamingTakedownSpec pins a replayed
  * batch and a cross-batch duplicate id both change nothing).
  *
  * The per-trigger cost is |batch requests|-sized (the Takedown.run
  * contract); the corpus-sized erasure ([[graft.operators.Takedown
  * .scrub]]) stays on the operator's schedule, never the stream's.
  *
  * `requests` needs (doc_id, text + whatever `isTarget` reads) — the
  * takedown payload columns, same contract as Takedown.run. Returns the
  * foreachBatch body to attach:
  * {{{
  *   requests.writeStream
  *     .foreachBatch(StreamingTakedown.apply(spark, outDir, $"lang" === "en"))
  *     .start()
  * }}}
  */
object StreamingTakedown {
  def apply(spark: SparkSession, outDir: String, isTarget: Column,
      shingleIndexes: Seq[String] = Nil,
      lineSegmentIndexes: Seq[String] = Nil,
      intIvfIndexes: Seq[String] = Nil): (DataFrame, Long) => Unit =
    (batch: DataFrame, _: Long) => {
      // pin the batch before Takedown.run mutates the artifacts its own
      // plans read (the DailyIncrement read-path-you-write discipline);
      // request-sized rows
      val pinned = batch.localCheckpoint(true)
      if (!pinned.isEmpty)
        Takedown.run(spark, outDir, pinned.select(col("doc_id")), pinned,
          isTarget, shingleIndexes, lineSegmentIndexes, intIvfIndexes)
    }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom keyed state over the subscribe stream — the
  * `KeyValueGroupedDataset.flatMapGroupsWithState` surface (SURVEY §2.8:
  * the reference's extension point is "user code over the stream"; Spark's
  * typed stateful operator is the managed-state version of the reference's
  * per-key projection loops).
  *
  * [[runningCountPerKey]] mirrors the canonical event-sourcing projection:
  * fold events per key into an aggregate that survives micro-batches (the
  * state store is checkpointed — G4 composes via EosProjection downstream).
  *
  * [[dedupStream]] is streaming exact-dedup: `dropDuplicates` over a key
  * within a watermark horizon — the unbounded form of dedup_exact, with
  * state bounded by the watermark (at 100 TB of stream history the horizon
  * IS the memory bound; without it state grows forever).
  */
object StatefulOps {

  final case class KeyCount(key: Long, events: Long, lastValue: Double)

  /** Per-key running aggregate via flatMapGroupsWithState (Update mode).
    *
    * `seqCol` (event-sequence column, default the event-log id order via
    * `timestamp`) orders the fold WITHIN each micro-batch: the iterator
    * flatMapGroupsWithState hands over is in shuffle-arrival order, so
    * folding it raw would make `lastValue` whichever row happened to
    * arrive last, not the latest event. The batch is sorted per key
    * before folding (bounded by the micro-batch size, not the stream). */
  def runningCountPerKey(events: DataFrame,
      keyCol: String = "user_id", valueCol: String = "value",
      seqCol: String = "timestamp"): Dataset[KeyCount] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col(keyCol).cast("long").as("k"), col(valueCol).cast("double").as("v"),
        col(seqCol).cast("long").as("s"))
      .as[(Long, Double, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(
        (key: Long, rows: Iterator[(Long, Double, Long)], state: GroupState[KeyCount]) => {
          var agg = state.getOption.getOrElse(KeyCount(key, 0L, 0d))
          rows.toSeq.sortBy(_._3).foreach { case (_, v, _) =>
            agg = KeyCount(key, agg.events + 1, v)
          }
          state.update(agg)
          Iterator.single(agg)
        })
  }

  /** Streaming exact dedup within a watermark horizon. */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
      eventTimeCol: String, watermark: String): DataFrame =
    events
      .withWatermark(eventTimeCol, watermark)
      .dropDuplicates(keyCols :+ eventTimeCol)
}

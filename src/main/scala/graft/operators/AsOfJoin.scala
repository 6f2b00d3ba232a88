package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** As-of join, scale path: for each (key, at_ts) query, the latest event
  * with `ts <= at_ts` — without materializing the (query × history) range
  * join.
  *
  * The composable spelling (EventQueries.ev_asof: range join + max_by) is
  * correct but joins every query row against the key's FULL history before
  * aggregating — O(|queries| × events-per-key) intermediate rows. This
  * operator is the merge formulation: co-partition both sides by key,
  * sort each partition by (ts, is-query) once, and sweep — each event is
  * touched exactly once, carrying forward the running "last event" into
  * any query rows it precedes. O(n log n) in the partition, zero
  * intermediate blowup; this is the (d) `mapPartitions` tier of the
  * custom-operator ladder (SURVEY §7.3), justified because no built-in
  * composition avoids the quadratic intermediate.
  *
  * @param events  (key long, ts timestamp, id long) — the ordered history
  * @param queries (key long, at_ts timestamp)
  * @return (key, at_ts, last_id nullable) — null when no event precedes
  */
object AsOfJoin {
  private val outSchema = StructType(Seq(
    StructField("key", LongType, nullable = false),
    StructField("at_ts", TimestampType, nullable = false),
    StructField("last_id", LongType, nullable = true)))

  def lastEventBefore(events: DataFrame, queries: DataFrame, partitions: Int = 0): DataFrame = {
    val spark = events.sparkSession
    val nParts =
      if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    // tag and union: events sort before queries at the same timestamp
    // (an event AT at_ts counts — `ts <= at_ts` — so events first)
    val tagged = events.select(col("key"), col("ts"), lit(0).as("tag"), col("id"))
      .unionByName(queries.select(col("key"), col("at_ts").as("ts"), lit(1).as("tag"),
        lit(null).cast("long").as("id")))
    val swept = tagged
      .repartition(nParts, col("key"))
      .sortWithinPartitions(col("key"), col("ts"), col("tag"), col("id"))
      .queryExecution.toRdd.mapPartitions { rows =>
        var curKey = Long.MinValue
        var lastId: java.lang.Long = null
        rows.flatMap { ir =>
          val key = ir.getLong(0)
          if (key != curKey) { curKey = key; lastId = null }
          if (ir.getInt(2) == 0) { // event: advance running state
            lastId = ir.getLong(3)
            None
          } else { // query: emit current state
            Some(Row(key, org.apache.spark.sql.catalyst.util.DateTimeUtils
              .toJavaTimestamp(ir.getLong(1)), lastId))
          }
        }
      }
    spark.createDataFrame(swept, outSchema)
  }
}

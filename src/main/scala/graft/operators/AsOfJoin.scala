package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** As-of join, scale path: for each (key, at_ts) query, the latest event
  * with `ts <= at_ts` — without materializing the (query × history) range
  * join the composable spelling (EventQueries.ev_asof: range join +
  * max_by) pays, O(|queries| × events-per-key) intermediate rows.
  *
  * [[lastEventBefore]] plans the FIRST-CLASS Catalyst operator
  * ([[graft.plans.AsOfJoinPlan]] → AsOfJoinExec): a physical two-pointer
  * merge that only DECLARES `ClusteredDistribution(key)` + `(key, time)`
  * ordering, so the planner inserts — or reuses — the exchanges and
  * sorts (tier (c) of the §7.3 ladder). [[lastEventBeforeSweep]] keeps
  * the hand-choreographed mapPartitions spelling (tier (d)) as the
  * independent cross-check AsOfJoinSpec pins both against.
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

  /** Physical-operator path (AsOfJoinExec via the planner strategy). */
  def lastEventBefore(events: DataFrame, queries: DataFrame): DataFrame = {
    val spark = events.sparkSession
    graft.GraftExtensions.register(spark)
    val ev = events.select(col("key"), col("ts"), col("id"))
    val q = queries.select(col("key"), col("at_ts"))
    org.apache.spark.sql.classic.GraftPlanBridge.ofRows(spark,
      graft.plans.AsOfJoinPlan(ev.queryExecution.analyzed, q.queryExecution.analyzed))
  }

  /** mapPartitions sweep (the tier-(d) spelling, kept as cross-check). */
  def lastEventBeforeSweep(events: DataFrame, queries: DataFrame, partitions: Int = 0): DataFrame = {
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

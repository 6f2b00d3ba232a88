package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin

/** Merge-formulation as-of join vs the composable range-join spelling. */
class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: Long) = Timestamp.from(java.time.Instant.ofEpochSecond(1700000000L + s))

  test("hand-built cases: before-first, exact-at, between, after-last, empty key") {
    import spark.implicits._
    val events = Seq(
      (1L, ts(100), 10L), (1L, ts(200), 11L), (1L, ts(300), 12L),
      (2L, ts(150), 20L)).toDF("key", "ts", "id")
    val queries = Seq(
      (1L, ts(50)),   // before any event → null
      (1L, ts(200)),  // exactly at an event → that event
      (1L, ts(250)),  // between → id 11
      (1L, ts(999)),  // after last → id 12
      (2L, ts(149)),  // before key-2's only event → null
      (3L, ts(500))   // key with no events → null
    ).toDF("key", "at_ts")
    val expected = Set(
      (1L, ts(50), None), (1L, ts(200), Some(11L)), (1L, ts(250), Some(11L)),
      (1L, ts(999), Some(12L)), (2L, ts(149), None), (3L, ts(500), None))
    // physical operator (AsOfJoinExec) and the mapPartitions sweep agree
    val physical = AsOfJoin.lastEventBefore(events, queries)
    assert(physical.queryExecution.executedPlan.toString.contains("AsOfJoin"),
      "the planner strategy must place the physical operator")
    val got = physical
      .collect().map(r => (r.getLong(0), r.getTimestamp(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
    assert(got == expected)
    val swept = AsOfJoin.lastEventBeforeSweep(events, queries, partitions = 3)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
    assert(swept == expected)
  }

  test("agrees with the composable range-join + max_by spelling on random data") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val events = (1 to 500).map(i =>
      (rnd.nextInt(20).toLong, ts(rnd.nextInt(10000).toLong), i.toLong)).toDF("key", "ts", "id")
    val queries = (1 to 100).map(_ =>
      (rnd.nextInt(25).toLong, ts(rnd.nextInt(12000).toLong))).distinct.toDF("key", "at_ts")

    val merged = AsOfJoin.lastEventBefore(events, queries)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
    val swept = AsOfJoin.lastEventBeforeSweep(events, queries)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet

    val composed = queries.as("q").join(events.as("e"),
        $"q.key" === $"e.key" && $"e.ts" <= $"q.at_ts", "left")
      .groupBy($"q.key", $"q.at_ts")
      // ids are insertion-ordered within equal ts here? order by (ts, id)
      .agg(max_by($"e.id", struct($"e.ts", $"e.id")).as("last_id"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet

    assert(merged == composed)
    assert(swept == composed, "tier-(d) sweep must agree with both")
  }
}

package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IntervalJoin

/** The grid-bucketed point-in-interval join must be row-identical to the
  * naive BETWEEN join — including closed boundaries, empty intervals,
  * intervals spanning many grid cells, and null bounds — while never
  * planning a cartesian/BNLJ. */
class IntervalJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("equals the naive BETWEEN join on adversarial intervals; plans no cartesian") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // seeded adversarial layout around a 60 s grid: boundary hits, empty
    // and inverted intervals, multi-cell spans, nulls, key mismatches
    val rnd = new scala.util.Random(20260812L)
    val intervals = (Seq(
      (1L, 10L, ts(0), ts(59)),        // exactly one cell
      (1L, 11L, ts(60), ts(60)),       // single-instant interval on a cell edge
      (1L, 12L, ts(119), ts(121)),     // straddles a cell boundary
      (2L, 20L, ts(0), ts(600)),       // spans 11 cells
      (2L, 21L, ts(300), ts(200)),     // inverted: matches nothing
      (3L, 30L, null, ts(100)),        // null bound: drops
      (9L, 90L, ts(0), ts(1000))       // key with no points
    ) ++ (1 to 200).map { i =>
      val start = rnd.nextInt(2000).toLong
      (rnd.nextInt(3).toLong + 1, 100L + i, ts(start), ts(start + rnd.nextInt(180)))
    }).toDF("k", "iv_id", "start", "end")
    val points = (Seq(
      (1L, 1000L, ts(59)),             // upper-boundary inclusive
      (1L, 1001L, ts(60)),             // instant-interval hit
      (1L, 1002L, ts(120)),            // inside the straddler
      (2L, 1003L, ts(600)),            // far-cell end of the long span
      (4L, 1004L, ts(60)),             // key with no intervals
      (1L, 1005L, null)                // null ts: drops
    ) ++ (1 to 500).map { i =>
      (rnd.nextInt(4).toLong + 1, 2000L + i, ts(rnd.nextInt(2200).toLong))
    }).toDF("k", "pt_id", "pts")

    val got = IntervalJoin.pointsInIntervals(points, "pts",
        intervals, "start", "end", Seq("k"), gridSeconds = 60L)
      .select($"pt_id", $"iv_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val naive = points.as("p").join(intervals.as("i"),
        $"p.k" === $"i.k" && $"pts" >= $"start" && $"pts" <= $"end")
      .select($"pt_id", $"iv_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(got == naive,
      s"missing=${(naive -- got).take(5)} extra=${(got -- naive).take(5)}")
    // the boundary cases must actually fire (non-vacuous)
    assert(Set((1000L, 10L), (1001L, 11L), (1002L, 12L), (1003L, 20L)).subsetOf(naive))

    val plan = IntervalJoin.pointsInIntervals(points, "pts",
      intervals, "start", "end", Seq("k"), 60L).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      plan)
  }
}

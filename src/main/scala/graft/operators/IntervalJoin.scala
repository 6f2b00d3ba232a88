package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval join without a cartesian: the general operator behind
  * "assign each point event to the interval(s) containing it" (session
  * attribution, maintenance-window matching, validity-period lookups).
  *
  * Spark has no native interval join — a plain
  * `points JOIN intervals ON ts BETWEEN start AND end` plans as a
  * broadcast-nested-loop or cartesian, O(|points|·|intervals|). The
  * standard fix is GRID BUCKETING: each interval explodes to the
  * fixed-width grid cells it spans, each point hashes to its single cell,
  * and the join keys on (equiKeys, cell) — an ordinary shuffle hash join
  * whose residual `BETWEEN` filter keeps exactly the true containments.
  *
  * Scale shape: shuffle is keyed on (equiKeys, cell), so both sides
  * partition uniformly in time (plus whatever the equi keys spread);
  * fanout per interval is ⌈length/grid⌉+1 rows, so `gridSeconds` ≈ the
  * typical interval length keeps the blowup O(1) per interval. Cells are
  * integer arithmetic on epoch seconds — deterministic and
  * oracle-spellable (the correctness gate runs the naive BETWEEN join in
  * DuckDB, which evaluates it as its native IEJoin).
  *
  * Containment is CLOSED on both ends (`start ≤ ts ≤ end`), matching SQL
  * BETWEEN. Rows with NULL bounds/timestamps drop (inner-join semantics);
  * empty intervals (end < start) match nothing.
  */
object IntervalJoin {
  def pointsInIntervals(points: DataFrame, tsCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      equiKeys: Seq[String], gridSeconds: Long): DataFrame = {
    require(gridSeconds > 0, "gridSeconds must be positive")
    val g = lit(gridSeconds)
    // cell indices from SECOND-truncated epochs are identical to the
    // full-precision floors (grid ≥ 1 s), so truncation cannot misplace a
    // boundary row — the residual filter then compares full timestamps
    val iv = intervals
      .filter(col(startCol) <= col(endCol))
      .withColumn("_cell", explode(sequence(
        floor(unix_timestamp(col(startCol)) / g).cast("long"),
        floor(unix_timestamp(col(endCol)) / g).cast("long"))))
    val pt = points
      .withColumn("_cell", floor(unix_timestamp(col(tsCol)) / g).cast("long"))
    pt.join(iv, equiKeys :+ "_cell")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("_cell")
  }
}

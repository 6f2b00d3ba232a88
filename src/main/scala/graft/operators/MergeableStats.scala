package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.queries.CrossHash

/** The mergeable per-type stats algebra behind `ev_stats_incr` and the
  * streaming [[graft.streaming.StatsView]]: count, decimal sum, min/max and
  * a KMV distinct sketch ([[graft.functions.expressions.KmvMinima]]).
  *
  * Every column is chosen so that `merge(stats(a), stats(b)) ==
  * stats(a ∪ b)` EXACTLY (not approximately): counts and decimal sums add,
  * min/max fold, and the union of two k-minima sets re-truncated to k IS
  * the k-minima of the union. That identity is what makes the view
  * maintainable from deltas — at 100 TB the state is |types| rows of a few
  * hundred bytes while the alternative (full recompute) rescans history.
  * ScaleOpsSpec pins merge==recompute across split moduli; the
  * `ev_stats_incr` DuckDB oracle is the one-pass spelling, so the driver's
  * hash gate re-proves the identity every round.
  */
object MergeableStats {
  /** KMV sketch size (stderr ≈ 1/√(k−2) ≈ 13% at 64). */
  val K = 64

  /** h60 hash space 2⁶⁰ (exactly representable as a double). */
  val HashSpace = 1152921504606846976L

  private val dec2 = DecimalType(18, 2)

  /** Aggregate raw events (event_type, value, user_id) into state rows
    * (event_type, n, sv, vmin, vmax, mins). */
  def statsOf(events: DataFrame): DataFrame = {
    graft.GraftExtensions.register(events.sparkSession)
    events
      .select(col("event_type"), col("value"),
        CrossHash.h60(col("user_id").cast("string")).as("h"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value").cast(dec2)).as("sv"),
        min(col("value")).as("vmin"), max(col("value")).as("vmax"),
        call_function("graft_kmv", col("h"), lit(K)).as("mins"))
  }

  /** Merge two state frames. least/greatest skip nulls, so a type present
    * on one side only carries through; the KMV merge is distinct-union →
    * sort → first k. The join is NULL-SAFE (`<=>`): NULL event_type is a
    * legitimate group (dirty streams carry it — EdgeCorpusSpec), and plain
    * `===` would emit two unmatched NULL rows instead of one merged one,
    * breaking merge(stats(a), stats(b)) == stats(a ∪ b). */
  def merge(a0: DataFrame, b0: DataFrame): DataFrame = {
    val a = a0.columns.foldLeft(a0)((d, c) => d.withColumnRenamed(c, s"a_$c"))
    val b = b0.columns.foldLeft(b0)((d, c) => d.withColumnRenamed(c, s"b_$c"))
    a.join(b, col("a_event_type") <=> col("b_event_type"), "full_outer")
      .select(
        coalesce(col("a_event_type"), col("b_event_type")).as("event_type"),
        (coalesce(col("a_n"), lit(0L)) + coalesce(col("b_n"), lit(0L))).as("n"),
        // SQL sum over no non-null values is NULL — a both-sides-NULL merge
        // must stay NULL (the one-pass recompute would), not become 0
        when(col("a_sv").isNull && col("b_sv").isNull, lit(null).cast(dec2))
          .otherwise(coalesce(col("a_sv"), lit(0).cast(dec2)) +
            coalesce(col("b_sv"), lit(0).cast(dec2))).as("sv"),
        least(col("a_vmin"), col("b_vmin")).as("vmin"),
        greatest(col("a_vmax"), col("b_vmax")).as("vmax"),
        slice(array_sort(array_distinct(concat(
          coalesce(col("a_mins"), expr("array()")),
          coalesce(col("b_mins"), expr("array()"))))), 1, K).as("mins"))
  }

  /** Project the published view: scalar columns only (the driver's
    * comparator hashes no arrays) with the KMV estimator folded in.
    *
    * Empty minima (every hash in the group was NULL) must NOT evaluate
    * `element_at(mins, 0)` — ANSI array indices start at 1 and the
    * unguarded form aborts the job; the k-th min is NULL and the
    * estimate is 0 distinct (the size<K branch) for such groups. */
  def publish(state: DataFrame): DataFrame = {
    val kth = when(size(col("mins")) >= 1,
      element_at(col("mins"), size(col("mins"))))
    state.select(col("event_type"), col("n"),
      col("sv").cast("double").as("sum_value"),
      col("vmin"), col("vmax"),
      size(col("mins")).cast("long").as("kmv_n"),
      kth.as("kmv_kth"),
      when(size(col("mins")) < K, size(col("mins")).cast("double"))
        .otherwise(lit((K - 1).toDouble) * lit(HashSpace).cast("double") / kth)
        .as("est_users"))
  }
}

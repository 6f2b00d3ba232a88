package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact global running totals in total key order WITHOUT a
  * single-partition window.
  *
  * `sum(x) OVER (ORDER BY k)` with no PARTITION BY plans as
  * `Exchange SinglePartition` — every row funnels through one task, the
  * classic scale-killer for corpus-wide prefix sums (sequence packing,
  * global offsets, token budgeting). This operator computes the identical
  * result as two distributed passes:
  *
  *  1. bucket rows into contiguous key ranges. Bucket BOUNDS come from an
  *     approximate-quantile sketch of the key (Greenwald–Khanna via
  *     `df.stat.approxQuantile` — deterministic, one pass), so buckets
  *     stay balanced under ARBITRARY key skew: clustered ids, gappy
  *     ranges, hot regions. (Fixed-width value ranges would collapse to
  *     one bucket whenever the keys cluster inside a narrow span of a
  *     huge domain.) Correctness never depends on the bounds — any
  *     monotone bucketing yields the same running totals, the bounds only
  *     steer balance — which is why the sketch being approximate is fine;
  *  2. aggregate per-bucket totals (≤ `numBuckets` rows, collected once on
  *     the driver — bounded, like the other audited one-row collects) and
  *     prefix-scan them into per-bucket offsets;
  *  3. window WITHIN each bucket (the shuffle is hash(bucket), all slots
  *     busy) and add the bucket's offset.
  *
  * At 100 TB: the bucket count is AUTO-SIZED from the input row count
  * ([[bucketsFor]] — per-bucket rows tracked at ≤ 8192 up to a 4096-bucket
  * cap, so parallelism grows with the data instead of 32 tasks each
  * windowing n/32 rows); the quantile sketch and the per-bucket totals
  * stay trivially small driver data. Callers may still pass an explicit
  * count (tests pin exactness at adversarial widths).
  */
object GlobalCumsum {
  /** AUTO bucket count: `2^clamp(5, 12, ⌈log₂ n⌉ − 13)` — per-bucket
    * rows bounded at 2^13 = 8192 until the 2^12 = 4096-bucket cap.
    * The CAP is the mechanism's design limit, not a scale wall: bucket
    * assignment evaluates `#bounds < key` over a LITERAL bounds array
    * (codegen-friendly at thousands of bounds, pathological at
    * millions), and 4096-way parallelism saturates any real cluster —
    * past the cap per-task rows grow as n/4096 (24 M rows/task at
    * 10^11 input rows: a spillable single-window sort, measured-class
    * acceptable; the result is bucket-count-INVARIANT either way, so
    * the rule is oracle-safe by construction). Reproduces the historic
    * 32 at every gate/bench corpus (n ≤ 2^18); growth points:
    * 2^19 → 64 (the 100× document corpus), 2^25 → 4096 (cap). */
  def bucketsFor(n: Long): Int =
    1 << math.max(5, math.min(12, ceilLog2(n) - 13))

  private def ceilLog2(n: Long): Int =
    if (n <= 1) 0 else 64 - java.lang.Long.numberOfLeadingZeros(n - 1)
  /** Adds column `out` = sum of `valueCol` over all rows with a strictly
    * smaller `orderCol` (running total EXCLUDING the current row — the
    * "offset before me" form sequence packing needs). `orderCol` must be
    * unique per row for the total order to be well defined, numeric, and
    * exactly representable as double for the bucket-bound comparison
    * (ids ≤ 2^53 — beyond that, pre-scale or bucket on a derived key). */
  def runningBefore(
      df: DataFrame,
      orderCol: String,
      valueCol: String,
      out: String,
      numBuckets: Int = 0): DataFrame = {
    require(numBuckets >= 0,
      s"numBuckets must be positive (or 0 = auto-size), got $numBuckets")
    // this operator drives THREE actions over its input (quantile sketch,
    // bucket totals, the final plan) — cache it here so every caller's
    // upstream runs once, not three times (MEMORY_AND_DISK: spills, never
    // OOMs; at 100 TB the input to a pack stage is the narrow
    // (key, value) projection, not the corpus). LIFECYCLE: the returned
    // (lazy) frame depends on this cache, so it cannot be unpersisted
    // here; the cache lives until the caller unpersists or clears — the
    // query registry's harnesses clear between queries, and a long-lived
    // session composing this repeatedly should `spark.catalog.clearCache()`
    // at its own job boundaries.
    val input = df.cache()
    // auto-sizing counts the CACHED input (the count materializes the
    // cache the quantile sketch reuses, so the extra action is one
    // cache-local pass, not a second upstream execution)
    val buckets = if (numBuckets > 0) numBuckets else bucketsFor(input.count())
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val bounds: Array[Double] =
      if (probs.isEmpty) Array.empty
      else input.stat.approxQuantile(orderCol, probs, 0.001).distinct.sorted
    // bucket = #bounds < k: monotone in k, so bucket order == key order
    // (an empty frame flows through every stage below and stays empty)
    val k = col(orderCol).cast("double")
    val bucket: Column =
      if (bounds.isEmpty) lit(0L)
      else size(filter(array(bounds.toIndexedSeq.map(lit(_)): _*), b => b < k)).cast("long")
    val bucketed = input.withColumn("_gc_bucket", bucket)

    // coalesce: a bucket whose every value is NULL sums to NULL, and
    // Row.getLong would NPE — the window sum below skips NULLs, which is
    // arithmetically the same as contributing 0 to later rows' totals
    val totals = bucketed.groupBy(col("_gc_bucket"))
      .agg(coalesce(sum(col(valueCol).cast("long")), lit(0L)).as("_gc_total"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .sortBy(_._1)
    val offsets = totals.scanLeft((-1L, 0L)) { case ((_, acc), (b, t)) => (b, acc + t) }
      .sliding(2).collect { case Array((_, acc), (b, _)) => (b, acc) }.toSeq
    val spark = df.sparkSession
    val offsetDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offsets.map(o => org.apache.spark.sql.Row(o._1, o._2)), 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("_gc_bucket", org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("_gc_offset", org.apache.spark.sql.types.LongType, nullable = false))))

    val w = Window.partitionBy(col("_gc_bucket")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed
      .join(broadcast(offsetDf), "_gc_bucket")
      .withColumn(out,
        coalesce(sum(col(valueCol).cast("long")).over(w), lit(0L)) + col("_gc_offset"))
      .drop("_gc_bucket", "_gc_offset")
  }
}

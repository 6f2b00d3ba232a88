package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  *  1. bucket rows into contiguous key ranges (bucket = (k - min) / width,
  *     width from a one-row min/max aggregate — so bucket order == key
  *     order);
  *  2. aggregate per-bucket totals (≤ `numBuckets` rows, collected once on
  *     the driver — bounded, like the other audited one-row collects) and
  *     prefix-scan them into per-bucket offsets;
  *  3. window WITHIN each bucket (the shuffle is hash(bucket), all 32+
  *     tasks busy) and add the bucket's offset.
  *
  * At 100 TB: `numBuckets` scales with the cluster (buckets ≈ 10–100×
  * executor count); the per-bucket totals stay a trivially small driver
  * collect, and no task ever sees more than ~1/numBuckets of the data.
  * Value-range bucketing assumes keys are roughly uniform (true for
  * sequential ids); for skewed keys, derive bucket bounds from a sampled
  * quantile sketch instead — the algebra is unchanged.
  */
object GlobalCumsum {
  /** Adds column `out` = sum of `valueCol` over all rows with a strictly
    * smaller `orderCol` (running total EXCLUDING the current row — the
    * "offset before me" form sequence packing needs). `orderCol` must be
    * unique per row for the total order to be well defined. */
  def runningBefore(
      df: DataFrame,
      orderCol: String,
      valueCol: String,
      out: String,
      numBuckets: Int = 32): DataFrame = {
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    val k = col(orderCol).cast("long")
    val stats = df.agg(min(k).as("lo"), max(k).as("hi")).head()
    if (stats.isNullAt(0)) return df.withColumn(out, lit(0L)) // empty input
    val (lo, hi) = (stats.getLong(0), stats.getLong(1))
    val width = math.max(1L, (hi - lo) / numBuckets + 1)
    val bucketed = df.withColumn("_gc_bucket", ((k - lit(lo)) / lit(width)).cast("long"))

    val totals = bucketed.groupBy(col("_gc_bucket"))
      .agg(sum(col(valueCol).cast("long")).as("_gc_total"))
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

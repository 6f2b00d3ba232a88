package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — the multi-dimensional clustering
  * every lakehouse table format reaches for (Delta/Iceberg `Z-ORDER BY`)
  * when queries filter on MORE THAN ONE column: a sort can cluster one
  * dimension perfectly and leaves every other dimension scattered across
  * all files; interleaving the dimensions' bits into one sort key gives
  * every file a NARROW min/max envelope on EVERY participating column,
  * so file- and row-group-level min/max pruning works for filters on any
  * of them. At 100 TB this is the difference between "point query on
  * user_id touches every file the ts-sorted table has" and "touches
  * O(1/files) of them" — ZOrderSpec pins exactly that envelope-overlap
  * ratio against a time-sorted layout of the same rows.
  *
  * All integer algebra, deterministic and engine-exact: each dimension
  * min-max-scales to `bits` buckets with one floored multiply-divide
  * (`(x − min)·2^bits ÷ (max − min + 1)` — exact in longs), and the
  * z-value interleaves the bucket bits (dimension 0 on odd positions).
  * The battery query `layout_zorder` hash-checks the full z-value
  * column against a DuckDB re-derivation. */
object ZOrderLayout {
  /** The scaled bucket of one dimension: (x − min)·2^bits ÷ (range+1),
    * integer-exact: Column `/` is DOUBLE division, whose rounding can
    * disagree with an engine's integer floor at quotient boundaries —
    * so the remainder is subtracted first, making the numerator exactly
    * divisible and the double quotient exact (needs (x−min)·2^bits
    * < 2^53, comfortably true for bucketed dimensions). */
  def bucket(x: Column, min: Long, max: Long, bits: Int): Column = {
    val p = (x - lit(min)) * lit(1L << bits)
    val q = lit(max - min + 1)
    ((p - p % q) / q).cast("long")
  }

  /** Morton interleave of two bucket columns (already in [0, 2^bits)):
    * bit j of `a` lands at position 2j+1, of `b` at 2j — plain shift/and
    * arithmetic, whole-stage-codegen-friendly. */
  def interleave(a: Column, b: Column, bits: Int): Column =
    (0 until bits).map { j =>
      (shiftleft(shiftrightunsigned(a, j) % 2, 2 * j + 1)) +
        (shiftleft(shiftrightunsigned(b, j) % 2, 2 * j))
    }.reduce(_ + _)

  /** The z-value of (a, b) under the given min/max envelopes. */
  def zval(a: Column, aMin: Long, aMax: Long,
      b: Column, bMin: Long, bMax: Long, bits: Int): Column =
    interleave(bucket(a, aMin, aMax, bits).cast("long"),
      bucket(b, bMin, bMax, bits).cast("long"), bits)

  /** Write `df` z-ordered on two long columns: one stats pass for the
    * envelopes, then range-partition by z-value into `files` output
    * files, sorted within each — every file gets a contiguous z-range,
    * i.e. a narrow rectangle in (a, b) space. Returns the envelopes
    * (persist them beside the data if readers need to recompute z). */
  def write(df: DataFrame, colA: String, colB: String, dir: String,
      bits: Int = 8, files: Int = 16): (Long, Long, Long, Long) = {
    val r = df.agg(min(col(colA)), max(col(colA)), min(col(colB)), max(col(colB)))
      .head()
    val (aMin, aMax, bMin, bMax) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    df.withColumn("zval",
        zval(col(colA), aMin, aMax, col(colB), bMin, bMax, bits))
      .repartitionByRange(files, col("zval"))
      .sortWithinPartitions(col("zval"))
      .write.mode("overwrite").parquet(dir)
    (aMin, aMax, bMin, bMax)
  }

  /** Per-file min/max envelope of a column — the pruning statistic a
    * format's manifest keeps; used by ZOrderSpec to measure how many
    * files a point filter could skip. */
  def fileEnvelopes(spark: SparkSession, dir: String, c: String): DataFrame =
    spark.read.parquet(dir)
      .select(input_file_name().as("file"), col(c))
      .groupBy(col("file"))
      .agg(min(col(c)).as("lo"), max(col(c)).as("hi"))
}

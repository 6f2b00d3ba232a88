package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) storage layout: cluster a table on the bit
  * interleave of two key columns so predicates on EITHER key prune at
  * read time — the standard multi-dimensional data-skipping layout for
  * 100 TB fact tables (a single-column sort prunes only its own column;
  * the z-curve keeps both keys' value ranges narrow within every row
  * group, so parquet min/max stats skip most of the file for point or
  * range predicates on either key).
  *
  * Plain open-source Spark applies min/max skipping at the parquet
  * ROW-GROUP level (pushed filters + footer stats — no table format
  * needed); [[write]] therefore controls the row-group size so the
  * skipping granularity is explicit. ZOrderSpec demonstrates the effect
  * with scan-metric row counts: the same predicate reads an order of
  * magnitude fewer rows from the z-ordered layout than from a layout
  * sorted by the other key alone.
  */
object ZOrderLayout {
  /** Bit-interleaved z-value of two non-negative long columns: bit i of
    * `a` lands at position 2i, bit i of `b` at 2i+1 (statically unrolled
    * — codegen folds it into one projection). Keys wider than `bitsPer`
    * bits lose their HIGH bits' discrimination (clustering coarsens,
    * correctness is unaffected — the z-value only orders the write);
    * callers with wide domains (timestamps) should pre-shift to an
    * offset, e.g. seconds since the table's min. */
  def zValue(a: Column, b: Column, bitsPer: Int = 21): Column = {
    require(bitsPer >= 1 && bitsPer <= 31, s"bitsPer out of range: $bitsPer")
    (0 until bitsPer).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Quantile-bucket id (0 .. 2^bucketBits − 1) of a numeric column
    * against precomputed boundaries: the count of boundaries ≤ value —
    * a columnar O(B) scan of a literal array, codegen'd (B = 255 at the
    * default 8 bits; a write-time cost, not a read-time one). */
  private def bucketOf(c: Column, boundaries: Seq[Double]): Column =
    size(filter(typedLit(boundaries), b => c.cast("double") >= b)).cast("long")

  /** Write `df` z-clustered on (`colA`, `colB`).
    *
    * The keys are first normalized to RANK SPACE — each value maps to
    * its approximate quantile bucket (2^bucketBits buckets from one
    * `approxQuantile` pass per key) — and the z-value interleaves the
    * bucket ids. Raw-value interleaving breaks on asymmetric key widths
    * (measured here: a 17-bit event_id interleaved with a 14-bit
    * user_id puts every top z-bit on event_id alone, so row groups never
    * constrain user_id and nothing skips); rank space gives both keys
    * equal weight at every z level regardless of domain width or skew.
    *
    * Files are range-partitioned on z (quantile-balanced), rows sorted
    * within each file, row-group size bounded (the skipping granule).
    * The z/bucket columns are dropped — the layout, not the schema,
    * carries the clustering. */
  def write(df: DataFrame, colA: String, colB: String, path: String,
      files: Int = 0, bucketBits: Int = 8,
      rowGroupBytes: Long = 8L << 20): Unit = {
    require(files >= 0, s"files out of range (0 = auto-size): $files")
    require(bucketBits >= 1 && bucketBits <= 16, s"bucketBits out of range: $bucketBits")
    // files=0 auto-sizes from the row count: ~2^20 rows per file with a
    // 32-file floor, so file count tracks the DATA (the layout writer is
    // an offline job — a fixed count means 3 TB files at 100 TB input;
    // per-file rows stay range-sort-in-one-task sized instead)
    val nFiles =
      if (files > 0) files
      else math.max(32L, (df.count() + (1L << 20) - 1) >> 20).toInt
    val b = 1 << bucketBits
    val probs = (1 until b).map(_.toDouble / b).toArray
    val Seq(qa, qb) = Seq(colA, colB).map { c =>
      df.select(col(c).cast("double").as(c)).stat
        .approxQuantile(c, probs, 0.005).toSeq
    }
    df.withColumn("_z",
        zValue(bucketOf(col(colA), qa), bucketOf(col(colB), qb), bucketBits))
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite")
      .option("parquet.block.size", rowGroupBytes)
      .parquet(path)
  }

  /** MIN-MAX bucket: (x − min)·2^bits ÷ (range+1), integer-exact — the
    * ORACLE-EXACT normalization behind the `layout_zorder` battery
    * query. [[write]]'s rank-space buckets cluster better under skew
    * but approxQuantile boundaries are not cross-engine re-derivable;
    * this floored linear scaling is, so the full z column hash-checks
    * against DuckDB bit for bit.
    *
    * The floor division is LONG-exact for the whole long domain the
    * numerator can reach (no 2^53 double precondition — a micros-grained
    * key spanning years stays exact): Column `/` is double division, so
    * the double quotient is floored and then corrected by one exact
    * integer-remainder step. The double estimate is within ±1 of the true
    * quotient (numerator ≤ 2^62 by the `require`, quotient ≤ 2^bits, so
    * the relative rounding error is ≪ 1), which one correction step
    * repairs — all built-in codegen expressions, no UDF. */
  def minMaxBucket(x: Column, min: Long, max: Long, bits: Int): Column = {
    val q = max - min + 1
    require(q >= 1, s"empty domain: min=$min max=$max")
    require(q <= (Long.MaxValue >> (bits + 1)),
      s"domain width $q would overflow the scaled numerator at bits=$bits")
    val p = (x - lit(min)) * lit(1L << bits)
    val approx = floor(p.cast("double") / lit(q.toDouble)).cast("long")
    val r = p - approx * lit(q)
    approx + when(r >= q, lit(1L)).otherwise(lit(0L)) -
      when(r < 0, lit(1L)).otherwise(lit(0L))
  }

  /** The oracle-exact z-value of (a, b) under min-max envelopes — `a`'s
    * bucket bits on ODD positions (the layout_zorder oracle's layout:
    * [[zValue]] puts its FIRST argument on even positions, so `b` rides
    * first). */
  def minMaxZval(a: Column, aMin: Long, aMax: Long,
      b: Column, bMin: Long, bMax: Long, bits: Int): Column =
    zValue(minMaxBucket(b, bMin, bMax, bits),
      minMaxBucket(a, aMin, aMax, bits), bits)
}

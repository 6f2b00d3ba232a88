package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation join: salt the skewed (big) side, replicate the small
  * side across salts — the classic remedy when a handful of hot keys
  * dominate a shuffle join and AQE's skew-join splitting isn't available
  * (e.g. the join is not sort-merge, or the skew is in a broadcast-unsafe
  * dimension).
  *
  * Correctness: every big-side row gets exactly one salt; every small-side
  * row is replicated to all salts; join on (key, salt) therefore produces
  * exactly the rows of the unsalted join. The hot key's rows now spread
  * over `salts` reducers instead of one.
  *
  * At 100 TB this is the difference between one straggler task holding a
  * 30-minute stage and an even spread; prefer AQE skew handling when the
  * plan shape allows it, salt when it doesn't.
  */
object SkewJoin {

  /** Inner join `big ⋈ small` on `key`, salted `salts` ways. Output =
    * big's columns plus small's non-key columns (the usual enrich shape). */
  def saltedInnerJoin(big: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val salted = big.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)).cast("int"))
    val replicated = small
      .withColumnRenamed(key, "_rkey")
      .withColumn("_salt", explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated,
        salted(key) === replicated("_rkey") && salted("_salt") === replicated("_salt"))
      .drop("_salt").drop("_rkey")
  }
}

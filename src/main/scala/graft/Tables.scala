package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver-generated synthetic tables (TESTDATA.md).
  *
  * All engine queries take the scale-factor directory as a parameter and
  * read parquet directly so Catalyst gets full pushdown/pruning; nothing is
  * cached at this layer (queries are one-shot in the verify/bench harness).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    // Normalize the events `ts` column to µs TimestampType (LTZ) no
    // matter which parquet layout the generator used:
    //  - TIMESTAMP(NANOS): Spark's vectorized reader rejects it; sessions
    //    set spark.sql.legacy.parquet.nanosAsLong=true so the column
    //    arrives as raw nanos (LongType). Exact integer division — a
    //    double division would lose precision at 1.7e18.
    //  - timestamp[us] WITHOUT the UTC-adjusted flag (pandas/pyarrow's
    //    default for naive timestamps): Spark 4 reads TIMESTAMP_NTZ,
    //    which unix_micros/LTZ-literal comparisons reject at analysis.
    //    Sessions run with session tz UTC, so the cast is value-preserving.
    df.schema.find(_.name == "ts") match {
      case Some(f) if f.dataType == org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
      case Some(f) if f.dataType == org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", org.apache.spark.sql.functions.col("ts")
          .cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }

  /** Register every table as a temp view (for spark.sql-style queries). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}

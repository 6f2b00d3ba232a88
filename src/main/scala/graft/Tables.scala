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

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Register every table as a temp view (for spark.sql-style queries). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}

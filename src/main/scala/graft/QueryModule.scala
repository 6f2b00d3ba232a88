package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A group of named queries plus their DuckDB oracle SQL.
  *
  * Contract: every key in [[oracles]] must exist in [[queries]]; a key in
  * [[queries]] without an oracle gets the driver's weaker rows-only check.
  * Output column names must match between the Spark plan and the oracle SQL
  * (the driver sorts columns by name before hashing values).
  */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}

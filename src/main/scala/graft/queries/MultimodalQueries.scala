package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.QueryModule
import graft.multimodal.Multimodal

/** Multimodal feature extraction as a registered query. No oracle: the
  * decode stage is a codec stand-in, not SQL-expressible — the driver
  * records the weaker rows-only check; ScalaTest pins the stub's output
  * (MultimodalSpec). */
object MultimodalQueries extends QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_features" -> { (s, dir) => Multimodal.featureQuery(s, dir) }
  )

  def oracles: Map[String, String] = Map.empty
}

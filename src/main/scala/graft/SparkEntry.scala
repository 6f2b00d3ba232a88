package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY §2 registers one query here; each
  * query also declares equivalent DuckDB SQL in [[oracleSql]] (omitted only
  * for operators whose output is not SQL-expressible — those get a weaker
  * rows-only check plus ScalaTest coverage).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  private val modules: Seq[QueryModule] = Seq(
    RelationalQueries,
    EventQueries,
    DedupQueries,
    TextQueries,
    CorpusQueries,
    RetrievalQueries,
    SimilarityQueries,
    MultimodalQueries
  )

  /** Every query runs with graft's Catalyst extensions registered
    * (native expressions + optimizer rules) — registration is idempotent
    * and the driver's vanilla session gets them without configuration. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap.map { case (name, fn) =>
      name -> { (s: SparkSession, dir: String) =>
        GraftExtensions.register(s); fn(s, dir)
      }
    }

  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracles).toMap
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** Anti-vanish lint for the correctness battery. Verify.scala swallows a
  * query that throws (it logs to stderr and moves on), so a query broken
  * at ANALYSIS time doesn't fail the gate — its row simply disappears
  * from CORRECTNESS_r{N}.json. Round 9 lost three queries exactly this
  * way: regenerated testdata changed `events.ts` to TIMESTAMP_NTZ and
  * ev_gaps / ev_interval_attr / ev_keyset_scan became unanalyzable, with
  * no red signal anywhere (EmptyCorpusSpec runs on synthetic in-memory
  * schemas, so it never sees what the real parquet footer says).
  *
  * This spec constructs every registered query against the REAL driver
  * parquet — Dataset creation analyzes eagerly, so any schema-driven
  * analysis failure surfaces here as a named assertion, not a silently
  * shorter battery. Construction only; nothing executes. */
class RegistryAnalysisSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("every registered query analyzes against the driver parquet") {
    GraftExtensions.register(spark)
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          fn(spark, sf).schema // Dataset.ofRows has already assertAnalyzed
          None
        } catch {
          case e: Throwable => Some(
            s"$name: ${e.getMessage.linesIterator.take(2).mkString(" | ")}")
        } finally spark.catalog.clearCache()
    }
    assert(failures.isEmpty,
      s"${failures.size} queries fail analysis on the driver testdata — " +
        s"these would VANISH from the correctness battery:\n${failures.mkString("\n")}")
  }
}

package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** EVERY registered query must survive completely EMPTY tables (zero rows,
  * real schemas). This is not a contrived case: incremental pipelines see
  * empty partitions daily (a new source with no data yet, a filtered-out
  * date slice, a bootstrap run), and an operator that trains/collects/
  * indexes from its input is exactly where `head on empty collection` or
  * an ANSI element_at(…, 0) hides. Complements EdgeCorpusSpec (dirty rows)
  * with the no-rows regime. */
class EmptyCorpusSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Mirror of the testdata layout with 0 rows per table, schemas read
    * from the real sf0.001 parquet. */
  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-empty-").toString
    Tables.names.foreach { t =>
      val schema = spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet").schema
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        .write.parquet(s"$d/$t.parquet")
    }
    d
  }

  test("every registered query returns an empty (or constant-only) result on empty tables") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (n, fn) =>
      try { fn(spark, dir).count(); None }
      catch { case e: Throwable => Some(n -> s"${e.getClass.getSimpleName}: ${e.getMessage}") }
    }
    assert(failures.isEmpty,
      failures.map { case (n, m) => s"\n  $n -> $m" }.mkString)
  }
}

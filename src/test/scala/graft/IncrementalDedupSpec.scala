package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IncrementalDedup
import graft.queries.CrossHash._

/** IncrementalDedup = the full-recompute pair set restricted to pairs that
  * involve a new document, at |batch|-bounded cost. */
class IncrementalDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def shingles(docs: DataFrame): DataFrame = {
    import spark.implicits._
    GraftExtensions.register(spark)
    docs.select($"doc_id", tokens($"text").as("w"))
      .select($"doc_id", explode(shingles3("w")).as("s"))
      .select($"doc_id", h60($"s").as("h"))
      .distinct()
  }

  private def fullPairs(sh: DataFrame, threshold: Double): DataFrame = {
    import spark.implicits._
    val cnt = sh.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val inter = sh.as("a").join(sh.as("b"),
        $"a.h" === $"b.h" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    val j = $"inter".cast("double") / ($"na" + $"nb" - $"inter")
    inter
      .join(cnt.select($"doc_id".as("doc_a"), $"n".as("na")), "doc_a")
      .join(cnt.select($"doc_id".as("doc_b"), $"n".as("nb")), "doc_b")
      .filter(j >= threshold)
      .select($"doc_a", $"doc_b", round(j, 6).as("jaccard"))
  }

  test("incremental pairs == full pairs involving a new doc (new-corpus AND new-new)") {
    import spark.implicits._
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val splitId = 40L // corpus: doc_id < 40, batch: the rest
    val corpusSh = shingles(docs.filter($"doc_id" < splitId)).cache()
    val batchSh = shingles(docs.filter($"doc_id" >= splitId)).cache()

    val expected = fullPairs(shingles(docs), 0.6)
      .filter($"doc_a" >= splitId || $"doc_b" >= splitId)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val got = IncrementalDedup.newPairs(corpusSh, batchSh, 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    assert(got == expected)
    assert(expected.nonEmpty, "split produced no cross/new pairs — test would be vacuous")
    // sanity: some expected pair is new-vs-CORPUS (not only new-new),
    // else the probe-the-corpus path went untested
    assert(expected.exists { case (a, b, _) => a < splitId && b >= splitId })
    // and no old-old pair leaked in
    assert(got.forall { case (a, b, _) => a >= splitId || b >= splitId })
  }
}

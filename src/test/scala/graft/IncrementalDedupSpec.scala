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
      .select($"doc_a", $"doc_b", j.as("jaccard"))
  }

  test("incremental pairs == full pairs involving a new doc, at every split point") {
    import spark.implicits._
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val sh = shingles(docs).cache()
    val allPairs = fullPairs(sh, 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    var crossTested = false
    // splits across the spectrum: tiny corpus, balanced, tiny batch
    for (splitId <- Seq(10L, 100L, 250L, 460L)) {
      val expected = allPairs.filter { case (a, b, _) => a >= splitId || b >= splitId }
      val got = IncrementalDedup.newPairs(
          sh.filter($"doc_id" < splitId), sh.filter($"doc_id" >= splitId), 0.6)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == expected, s"split=$splitId")
      // no old-old pair may leak in
      assert(got.forall { case (a, b, _) => a >= splitId || b >= splitId }, s"split=$splitId")
      crossTested ||= expected.exists { case (a, b, _) => a < splitId && b >= splitId }
    }
    assert(allPairs.nonEmpty, "corpus has no near-dup pairs — test would be vacuous")
    // at least one split must exercise the probe-the-corpus path
    assert(crossTested, "no split produced a new-vs-corpus pair")
  }

  private def fullContainment(sh: DataFrame, threshold: Double): DataFrame = {
    import spark.implicits._
    val cnt = sh.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val inter = sh.as("a").join(sh.as("b"),
        $"a.h" === $"b.h" && $"a.doc_id" =!= $"b.doc_id")
      .groupBy($"a.doc_id".as("doc_in"), $"b.doc_id".as("doc_out"))
      .agg(count(lit(1)).as("inter"))
    val c = $"inter".cast("double") / $"nin"
    inter.join(cnt.select($"doc_id".as("doc_in"), $"n".as("nin")), "doc_in")
      .filter(c >= threshold)
      .select($"doc_in", $"doc_out", c.as("containment"))
  }

  test("incremental containment == full ordered containment involving a new doc, at every split") {
    import spark.implicits._
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val sh = shingles(docs).cache()
    val all = fullContainment(sh, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(all.nonEmpty, "no containment pairs — vacuous")
    var swallowedOld = false
    for (splitId <- Seq(10L, 100L, 250L, 460L)) {
      val expected = all.filter { case (i, o, _) => i >= splitId || o >= splitId }
      val got = IncrementalDedup.newContainment(
          sh.filter($"doc_id" < splitId), sh.filter($"doc_id" >= splitId), 0.9)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == expected, s"split=$splitId missing=${(expected -- got).take(3)} " +
        s"extra=${(got -- expected).take(3)}")
      // the direction the one-sided probe could plausibly lose: an OLD
      // doc contained IN a new one (found only via the new doc's probe)
      swallowedOld ||= expected.exists { case (i, o, _) => i < splitId && o >= splitId }
    }
    assert(swallowedOld, "no split exercised the corpus-doc-inside-new-doc direction")
  }
}

package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Bm25Index, CurationJob, DsirModel, Takedown, VectorIndex}
import graft.queries.RetrievalQueries

/** End-to-end takedown: after Takedown.run, every artifact a consumer
  * reads must behave as if the removed documents had never been kept —
  * masked manifest/shards, retrieval probes equal to rebuilds on the
  * remaining corpus, and a selection model equal to a refit — without
  * any corpus-sized rewrite. */
class TakedownSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("takedown masks manifest+shards and leaves indexes/model == rebuilds on the remaining corpus") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    GraftExtensions.register(spark)
    val dir = Files.createTempDirectory("graft-takedown-").toString

    CurationJob.run(spark, sf, dir)
    val before = spark.read.parquet(s"$dir/curated")
      .select($"doc_id", $"n_tokens", $"digest")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val shardsBefore = spark.read.parquet(s"$dir/shards")
      .select($"doc_id", $"shard".cast("long"), $"shard_offset")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val removedIds = before.map(_._1).filter(_ % 13 == 0)
    assert(removedIds.nonEmpty, "no kept doc matches the takedown set — vacuous")
    val docsTable = Tables.load(spark, sf, "documents")
    val payload = docsTable
      .filter($"doc_id".isin(removedIds.toSeq: _*))
      .select($"doc_id", $"text", $"lang")
    Takedown.run(spark, dir, payload.select($"doc_id"), payload, $"lang" === "en")

    // manifest: exactly the original minus the removed ids
    val after = Takedown.manifest(spark, dir)
      .select($"doc_id", $"n_tokens", $"digest")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(after == before.filterNot(t => removedIds(t._1)))

    // shards: surviving rows byte-identical (ids, shard, offset); only
    // the removed docs' rows vanish — the enumeration contract holds
    val shardsAfter = Takedown.shards(spark, dir)
      .select($"doc_id", $"shard".cast("long"), $"shard_offset")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(shardsAfter == shardsBefore.filterNot(t => removedIds(t._1)))

    // BM25: probe == a fresh build on the remaining kept docs
    val remainingIds = after.map(_._1)
    val remainingDocs = docsTable
      .filter($"doc_id".isin(remainingIds.toSeq: _*))
      .select($"doc_id", $"text")
    val refBm = Files.createTempDirectory("graft-takedown-bm-").toString
    Bm25Index.build(remainingDocs, refBm)
    val q = RetrievalQueries.fixtureQueries.toDF("query_id", "term")
    def scores(p: String) = Bm25Index.probe(spark, p, q)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(scores(refBm).nonEmpty, "no BM25 hits — vacuous")
    assert(scores(s"$dir/bm25") == scores(refBm),
      "bm25 probe != rebuild on remaining corpus")

    // vectors: probe == a fresh materialize on the remaining kept subset
    val emb = Tables.load(spark, sf, "embeddings")
    val refVec = Files.createTempDirectory("graft-takedown-vec-").toString
    VectorIndex.materialize(
      emb.join(remainingDocs.select($"doc_id".as("vec_id")), Seq("vec_id"), "left_semi")
        .select($"vec_id", $"embedding"),
      refVec)
    val queries = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"embedding")
    def hits(p: String) = VectorIndex.probe(spark, p, queries, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(hits(refVec).nonEmpty, "no ANN hits — vacuous")
    assert(hits(s"$dir/vectors") == hits(refVec),
      "vector probe != rebuild on remaining subset")

    // repack: gapless contiguous shards over exactly the surviving docs
    val nShards = Takedown.repack(spark, dir)
    val repacked = Takedown.shards(spark, dir)
      .select($"doc_id", $"n_tokens", $"shard".cast("long"), $"shard_offset")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(repacked.map(_._1).toSet == remainingIds, "repacked docs != masked manifest")
    assert(repacked.map(_._3).toSet == (0L until nShards).toSet, "shard ids not contiguous")
    val budget = graft.queries.CorpusQueries.PackBudget
    assert(nShards == (repacked.map(_._2).sum + budget - 1) / budget,
      "shard count != ceil(surviving tokens / budget)")
    for ((_, group) <- repacked.groupBy(_._3)) {
      val inOrder = group.sortBy(_._4)
      // gapless: each doc starts where the previous one ended (mod budget
      // rollover only at the shard seam, which the grouping excludes)
      for (Array(a, b) <- inOrder.sliding(2).map(_.toArray) if inOrder.size > 1)
        assert(b._4 == a._4 + a._2, s"offset gap in shard ${a._3}: $a -> $b")
    }

    // DSIR: stored model == a direct refit over the remaining kept set
    val refit = DsirModel.fit(
        remainingDocs.join(docsTable.select($"doc_id", $"lang"), "doc_id"),
        $"lang" === "en")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val stored = DsirModel.load(spark, s"$dir/dsir")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(stored == refit, "model after remove != refit without the docs")
    spark.catalog.clearCache()
  }

  test("DsirModel.remove: remove(fit(a ∪ b), b) == fit(a) exactly") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    GraftExtensions.register(spark)
    val docs = Tables.load(spark, sf, "documents")
      .select($"doc_id", $"text", $"lang")
    val a = docs.filter($"doc_id" % 3 =!= 0)
    val b = docs.filter($"doc_id" % 3 === 0)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = rows(DsirModel.remove(
      DsirModel.fit(docs, $"lang" === "en"), b, $"lang" === "en"))
    assert(got == rows(DsirModel.fit(a, $"lang" === "en")))
    spark.catalog.clearCache()
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end document takedown across a [[CurationJob]] /
  * [[DailyIncrement]] output tree — the right-to-be-forgotten operation
  * a training-data pipeline owes its sources: once an opt-out or legal
  * removal lands, the document must stop appearing in EVERY artifact a
  * consumer reads, without rewriting the corpus-sized standing files.
  *
  * One call masks or exactly updates every artifact:
  *
  *   ├─ curated manifest   tombstone mask        → [[manifest]] reader
  *   ├─ training shards    same tombstone mask   → [[shards]] reader
  *   │   (shard ids and surviving offsets are UNCHANGED — the packing
  *   │   keeps token-offset gaps where removed docs sat, preserving the
  *   │   0..N-1 shard enumeration contract; a later repack
  *   │   (PackedExport over [[manifest]]) reclaims the space)
  *   ├─ lexical index      [[Bm25Index.delete]]  (df/stats update
  *   │   exactly — probe ≡ rebuild on the remaining corpus)
  *   ├─ vector index       [[VectorIndex.delete]] (mask before ranking)
  *   └─ selection model    [[DsirModel.remove]]  (count subtraction —
  *       ≡ a refit without the docs)
  *
  * The tombstone mask is |removed|-sized and AQE-broadcasts into every
  * reader join; nothing corpus-sized rewrites (the Bm25Index.delete
  * doctrine). `docs` is the takedown payload (doc_id, text + whatever
  * `isTarget` reads) — a takedown request names concrete documents, and
  * the model subtraction needs their text; ids with no payload row are
  * masked from the manifest/shards/indexes but cannot be subtracted
  * from the model (the caller owns supplying the full payload —
  * TakedownSpec pins the full path). */
object Takedown {
  private def tombDir(outDir: String) = s"$outDir/takedown_tombstones"

  def run(spark: SparkSession, outDir: String, ids: DataFrame,
      docs: DataFrame, isTarget: Column): Unit = {
    graft.GraftExtensions.register(spark)
    ids.select(col(ids.columns.head).as("doc_id")).distinct()
      .write.mode("append").parquet(tombDir(outDir))
    Bm25Index.delete(spark, s"$outDir/bm25",
      ids.select(col(ids.columns.head).as("doc_id")))
    VectorIndex.delete(spark, s"$outDir/vectors",
      ids.select(col(ids.columns.head).as("vec_id")))
    // read-subtract-write on the model path: pin the B-row result on the
    // driver before the overwrite (the DailyIncrement DSIR discipline)
    val removed = DsirModel.remove(
      DsirModel.load(spark, s"$outDir/dsir"), docs, isTarget)
    val pinned = spark.createDataFrame(
      java.util.Arrays.asList(removed.collect(): _*), removed.schema)
    DsirModel.write(pinned, s"$outDir/dsir")
  }

  private def mask(spark: SparkSession, outDir: String, df: DataFrame): DataFrame =
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(tombDir(outDir)))) df
    else df.join(
      spark.read.parquet(tombDir(outDir)).select(col("doc_id")).distinct(),
      Seq("doc_id"), "left_anti")

  /** The curated manifest minus every taken-down document. */
  def manifest(spark: SparkSession, outDir: String): DataFrame =
    mask(spark, outDir, spark.read.parquet(s"$outDir/curated"))

  /** The training shards minus every taken-down document — shard ids and
    * surviving offsets unchanged (offset gaps remain until a repack). */
  def shards(spark: SparkSession, outDir: String): DataFrame =
    mask(spark, outDir, spark.read.parquet(s"$outDir/shards"))

  /** Reclaim the offset gaps [[run]] leaves: rewrite the shards from the
    * masked manifest — the SAME packing job day-0 ran, so shard ids
    * renumber contiguously from the surviving token stream and every
    * offset is gapless again. Returns the new shard count. The
    * tombstones stay (they still mask the curated files); re-masking the
    * repacked shards is a no-op since no removed doc survives the
    * rewrite. This is the one corpus-manifest-sized job in the takedown
    * path — deliberately split out so the masking stays cheap and the
    * rewrite runs on the operator's schedule, not the request's. */
  def repack(spark: SparkSession, outDir: String,
      budget: Long = graft.queries.CorpusQueries.PackBudget): Long =
    PackedExport.writeShards(
      manifest(spark, outDir).select(col("doc_id"), col("n_tokens")),
      s"$outDir/shards", budget)
}

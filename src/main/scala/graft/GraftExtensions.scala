package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier

import graft.functions.expressions.{BloomContains, BpePieceCount, BpeSegment, ConfluentSchemaId, CountMinSketch, DecodeMetadata, DotProduct, KmvMinima, LshBands, Md5Prefix60, PqScores, Shingle60, SpaceSavingTopK, UnicodeNorm}

/** Catalyst extension point: registers graft's native expressions so SQL and
  * DataFrame plans can call them (`SELECT graft_dot(a, b)`).
  *
  * Two entry paths:
  *  - `spark.sql.extensions=graft.GraftExtensions` at session build
  *    (the standard SparkSessionExtensions injection);
  *  - [[GraftExtensions.register]] on a live session (idempotent) — used by
  *    the query registry so the driver's vanilla session gets the functions
  *    without special configuration.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => graft.plans.RowValueCursorBound)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}

object GraftExtensions {
  private type FnDef = (FunctionIdentifier,
    org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
    Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
      org.apache.spark.sql.catalyst.expressions.Expression)

  private val functions: Seq[FnDef] = Seq(
    (FunctionIdentifier("graft_dot"), DotProduct.info,
      children => {
        require(children.length == 2, "graft_dot takes exactly 2 arguments")
        DotProduct(children(0), children(1))
      }),
    (FunctionIdentifier("graft_schema_id"), ConfluentSchemaId.info,
      children => {
        require(children.length == 1, "graft_schema_id takes exactly 1 argument")
        ConfluentSchemaId(children.head)
      }),
    (FunctionIdentifier("graft_h60"), Md5Prefix60.info,
      children => {
        require(children.length == 1, "graft_h60 takes exactly 1 argument")
        Md5Prefix60(children.head)
      }),
    (FunctionIdentifier("graft_meta_decode"), DecodeMetadata.info,
      children => {
        require(children.length == 1, "graft_meta_decode takes exactly 1 argument")
        DecodeMetadata(children.head)
      }),
    (FunctionIdentifier("graft_shingle60"), Shingle60.info,
      children => {
        require(children.length == 1, "graft_shingle60 takes exactly 1 argument")
        Shingle60(children.head)
      }),
    (FunctionIdentifier("graft_cms"), CountMinSketch.info,
      children => {
        require(children.length == 3, "graft_cms takes (col, w, d) arguments")
        CountMinSketch(children(0), children(1), children(2))
      }),
    (FunctionIdentifier("graft_unorm"), UnicodeNorm.info,
      children => {
        require(children.length == 2, "graft_unorm takes (text, form) arguments")
        val form = children(1) match {
          case lit: org.apache.spark.sql.catalyst.expressions.Literal
              if lit.value != null =>
            lit.value.toString
          case other => throw new IllegalArgumentException(
            s"graft_unorm form must be a string literal, got $other")
        }
        UnicodeNorm(children.head, form)
      }),
    (FunctionIdentifier("graft_lsh_bands"), LshBands.info,
      children => {
        require(children.length == 4,
          "graft_lsh_bands takes exactly 4 arguments: (vector, planesFlat, bands, bits)")
        LshBands(children(0), children(1), children(2), children(3))
      }),
    (FunctionIdentifier("graft_kmv"), KmvMinima.info,
      children => {
        require(children.length == 2, "graft_kmv takes exactly 2 arguments: (hash, k)")
        KmvMinima(children(0), children(1))
      }),
    (FunctionIdentifier("graft_topk"), SpaceSavingTopK.info,
      children => {
        require(children.length == 2, "graft_topk takes exactly 2 arguments: (item, k)")
        SpaceSavingTopK(children(0), children(1))
      }),
    (FunctionIdentifier("graft_pq_scores"), PqScores.info,
      children => {
        require(children.length == 5,
          "graft_pq_scores takes exactly 5 arguments: (vector, cbFlat, c2Flat, m, k)")
        PqScores(children(0), children(1), children(2), children(3), children(4))
      }),
    (FunctionIdentifier("graft_bloom_contains"), BloomContains.info,
      children => {
        require(children.length == 2,
          "graft_bloom_contains takes exactly 2 arguments: (filterBytes, h)")
        BloomContains(children(0), children(1))
      }),
    (FunctionIdentifier("graft_bpe_count"), BpePieceCount.info,
      children => {
        require(children.length == 3,
          "graft_bpe_count takes exactly 3 arguments: (text, lefts, rights)")
        BpePieceCount(children(0), children(1), children(2))
      }),
    (FunctionIdentifier("graft_bpe_segment"), BpeSegment.info,
      children => {
        require(children.length == 3,
          "graft_bpe_segment takes exactly 3 arguments: (text, lefts, rights)")
        BpeSegment(children(0), children(1), children(2))
      }))

  /** Idempotent on-session registration (functions + optimizer rule; the
    * rule rides the public `experimental.extraOptimizations` hook when the
    * session wasn't built with spark.sql.extensions). */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    functions.foreach { case (id, info, builder) =>
      if (!registry.functionExists(id)) registry.registerFunction(id, info, builder)
    }
    val extra = spark.experimental.extraOptimizations
    if (!extra.contains(graft.plans.RowValueCursorBound)) {
      spark.experimental.extraOptimizations = extra :+ graft.plans.RowValueCursorBound
    }
    val strategies = spark.experimental.extraStrategies
    if (!strategies.contains(graft.plans.AsOfJoinStrategy)) {
      spark.experimental.extraStrategies = strategies :+ graft.plans.AsOfJoinStrategy
    }
  }
}

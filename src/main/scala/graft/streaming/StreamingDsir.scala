package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.DsirModel
import graft.queries.CrossHash.tokens

/** Continuous importance scoring: run a DOCUMENT stream through a frozen
  * [[graft.operators.DsirModel]] — the serving side of
  * train-once/apply-daily data selection (StreamingDedup's stream-static
  * doctrine applied to DSIR).
  *
  * The static side is the B-row (f, sc) ratio frame — broadcast-sized at
  * any corpus scale — plus the unseen-feature fallback collected once to
  * a literal; each micro-batch tokenizes, stream-static LEFT-joins on
  * the feature bucket, and aggregates per (window, doc_id). The summed
  * quantity is the exact scaled-long ratio and the draw/keep algebra is
  * [[DsirModel.score]]'s verbatim (shared column builders), so a
  * streamed score equals the frozen-model batch score bit-for-bit —
  * each doc's row emits once when the watermark closes its window
  * (append mode, never retracted).
  */
object StreamingDsir {
  /** Windowed streaming importance scores for a document stream
    * (doc_id, text, `eventTimeCol`): one (doc_id, n_tokens, imp_scaled,
    * imp_mean_scaled, keep) row per document, emitted when the watermark
    * passes its window. */
  def score(docs: DataFrame, model: DataFrame,
      eventTimeCol: String = "ts", watermark: String = "10 minutes",
      windowLen: String = "10 minutes"): DataFrame = {
    graft.GraftExtensions.register(docs.sparkSession)
    val (sc, sc0) = DsirModel.scoringFrame(model)
    docs
      .withWatermark(eventTimeCol, watermark)
      .select(col(eventTimeCol), col("doc_id"), DsirModel.drawCol.as("draw"),
        explode(tokens(col("text"))).as("t"))
      .select(col(eventTimeCol), col("doc_id"), col("draw"),
        DsirModel.featCol(col("t")).as("f"))
      .join(sc, Seq("f"), "left")
      .select(col(eventTimeCol), col("doc_id"), col("draw"),
        coalesce(col("sc"), lit(sc0)).as("sc"))
      .groupBy(window(col(eventTimeCol), windowLen), col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("sc")).as("imp_scaled"),
        min(col("draw")).as("draw"))
      .select(col("doc_id"), col("n_tokens"), col("imp_scaled"),
        (col("imp_scaled").cast("double") / col("n_tokens").cast("double"))
          .as("imp_mean_scaled"),
        when(col("draw") * col("n_tokens") < col("imp_scaled"), 1L)
          .otherwise(0L).as("keep"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.CrossHash.{h60, tokens}

/** Materialized DSIR model — the train-once / apply-daily split of
  * importance resampling (Xie et al. 2023). `sample_importance` (the
  * oracle-checked query) recomputes the feature distributions from the
  * corpus it scores; a production pipeline fits the hashed-unigram
  * target/raw distributions ONCE over the reference corpus, persists the
  * B-row count table, and scores every incoming batch against the frozen
  * model — no raw-corpus rescan per batch, the ShingleIndex/Bm25Index
  * lifecycle applied to data selection.
  *
  * The model is tiny ([[Dim]] rows of three longs) at ANY corpus scale —
  * it broadcasts wherever it is used, so scoring a batch is: one
  * tokenize pass over the batch, a broadcast join, and a (doc_id,
  * scaled-long) aggregation. [[score]] builds the per-feature ratio with
  * the EXACT expression tree `sample_importance` evaluates, so
  * score(fit(corpus), corpus) equals the in-corpus query bit-for-bit
  * (DsirModelSpec pins it); features unseen at fit time take the
  * smoothed zero-count ratio (t_f = r_f = 0), which the in-corpus path
  * never exercises — so the equality is untouched.
  *
  * [[append]] adds a batch into the counts (count algebra is a plain
  * sum), so fit(a ∪ b) == append(fit(a), b, …) exactly — the same
  * merge-equals-recompute contract as Bm25Index.append and
  * MergeableStats.
  */
object DsirModel {
  /** Hashed-unigram feature-space size (buckets). */
  val Dim = 1024L

  /** Scaled-long snap for per-feature ratios and the acceptance draw. */
  val Scale = 1000000L

  /** Acceptance-draw column (per doc, from doc_id + content) and the
    * feature-bucket column (per token) — shared with the streaming
    * scorer so streamed ≡ batch is an expression-tree equality. */
  private[graft] def drawCol: Column =
    h60(concat(col("doc_id").cast("string"), lit(":"), col("text"), lit("|dsir"))) % Scale

  private[graft] def featCol(t: Column): Column =
    h60(concat(t, lit("|dsir"))) % Dim

  /** Per-token-occurrence featurization: (doc_id, is_target, draw, f).
    * The acceptance draw rides the token pass as a per-doc constant so
    * scoring never re-reads the batch. */
  private def featurize(docs: DataFrame, isTarget: Column): DataFrame =
    docs.select(col("doc_id"), isTarget.as("is_target"), drawCol.as("draw"),
      explode(tokens(col("text"))).as("t"))
      .select(col("doc_id"), col("is_target"), col("draw"), featCol(col("t")).as("f"))

  /** Fit the model over `docs` (needs doc_id + text + whatever columns
    * `isTarget` reads): (f, r_cnt, t_cnt) — raw and target occurrence
    * counts per feature bucket. One map-side-combined aggregation. */
  def fit(docs: DataFrame, isTarget: Column): DataFrame = {
    graft.GraftExtensions.register(docs.sparkSession)
    featurize(docs, isTarget)
      .groupBy(col("f"))
      .agg(count(lit(1)).as("r_cnt"),
        count(when(col("is_target"), 1)).as("t_cnt"))
  }

  /** Fold a new batch into an existing model: fit(a ∪ b) ≡
    * append(fit(a), b, isTarget). Counts union-and-sum on the B-row
    * table — the batch pass dominates; the merge is model-sized. */
  def append(model: DataFrame, docs: DataFrame, isTarget: Column): DataFrame =
    model.select(col("f"), col("r_cnt"), col("t_cnt"))
      .unionByName(fit(docs, isTarget))
      .groupBy(col("f"))
      .agg(sum(col("r_cnt")).as("r_cnt"), sum(col("t_cnt")).as("t_cnt"))

  /** Subtract documents from the model — count algebra in reverse, so
    * remove(fit(a ∪ b), b, isTarget) ≡ fit(a) exactly (the takedown
    * path; DsirModelSpec pins it). Buckets whose raw count reaches 0
    * leave the table, exactly as a refit without those docs would
    * (t_cnt ≤ r_cnt by construction, so no separate target guard). */
  def remove(model: DataFrame, docs: DataFrame, isTarget: Column): DataFrame =
    model.select(col("f"), col("r_cnt"), col("t_cnt"))
      .unionByName(fit(docs, isTarget)
        .select(col("f"), (-col("r_cnt")).as("r_cnt"), (-col("t_cnt")).as("t_cnt")))
      .groupBy(col("f"))
      .agg(sum(col("r_cnt")).as("r_cnt"), sum(col("t_cnt")).as("t_cnt"))
      .filter(col("r_cnt") > 0)

  /** Score a batch against a (frozen) model: (doc_id, n_tokens,
    * imp_scaled, imp_mean_scaled, keep) — the sample_importance output
    * contract. Unseen features take the smoothed zero-count ratio. */
  /** Smoothed scaled-long feature ratio — the ONE spelling shared by
    * [[score]], [[scoringFrame]] and the sample_importance oracle. */
  private def ratio(t: Column, r: Column, rt: Column, tt: Column): Column =
    floor((((t + 1) * (rt + Dim)).cast("double") /
      ((r + 1) * (tt + Dim)).cast("double"))
      * lit(Scale.toDouble) + lit(0.5)).cast("long")

  def score(model: DataFrame, docs: DataFrame): DataFrame = {
    graft.GraftExtensions.register(docs.sparkSession)
    val tot = model.agg(sum(col("r_cnt")).as("rt"), sum(col("t_cnt")).as("tt"))
    val sc = model.crossJoin(tot) // 1 row — AQE broadcasts
      .select(col("f"), ratio(col("t_cnt"), col("r_cnt"), col("rt"), col("tt")).as("sc"))
    val sc0 = tot.select(ratio(lit(0L), lit(0L), col("rt"), col("tt")).as("sc0"))
    featurize(docs, lit(false))
      .select(col("doc_id"), col("draw"), col("f"))
      .join(sc, Seq("f"), "left")
      .crossJoin(sc0) // 1 row — unseen-feature fallback
      .select(col("doc_id"), col("draw"), coalesce(col("sc"), col("sc0")).as("sc"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("sc")).as("imp_scaled"),
        min(col("draw")).as("draw"))
      .select(col("doc_id"), col("n_tokens"), col("imp_scaled"),
        (col("imp_scaled").cast("double") / col("n_tokens").cast("double"))
          .as("imp_mean_scaled"),
        when(col("draw") * col("n_tokens") < col("imp_scaled"), 1L)
          .otherwise(0L).as("keep"))
  }

  /** Static scoring assets for stream-static use: the (f, sc) ratio
    * frame plus the unseen-feature fallback collected to a literal (the
    * model is static, so the 1-row collect happens once at plan-build,
    * never per trigger). The sc values come from the same [[score]]
    * expression tree, so a frozen-model stream scorer matches the batch
    * path bit-for-bit. */
  def scoringFrame(model: DataFrame): (DataFrame, Long) = {
    val tot = model.agg(sum(col("r_cnt")).as("rt"), sum(col("t_cnt")).as("tt"))
    val sc = model.crossJoin(tot)
      .select(col("f"), ratio(col("t_cnt"), col("r_cnt"), col("rt"), col("tt")).as("sc"))
    val sc0 = tot.select(ratio(lit(0L), lit(0L), col("rt"), col("tt")).as("sc0"))
      .collect().head.getLong(0)
    (sc, sc0)
  }

  /** Persist / load the model artifact (B rows — one file). */
  def write(model: DataFrame, path: String): Unit =
    model.coalesce(1).write.mode("overwrite").parquet(path)

  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.queries.CrossHash.tokens

/** Distributed trainer for the hashed-linear quality model — the
  * fastText-classifier shape text_quality_score evaluates with
  * placeholder weights ("a production run swaps that one expression for
  * a broadcast trained-weight array"). This is that trainer: binary
  * hashed-unigram presence features ([[DsirModel.featCol]]'s bucket
  * space), a linear probability model y ≈ w·x + b fit by full-batch
  * gradient descent on square loss.
  *
  * BIT-REPRODUCIBLE distributed training, under the repo's determinism
  * discipline: a naive float gradient SUM is partitioning-dependent
  * (float addition does not associate), so per-document gradient
  * contributions snap to scaled longs (floor(r·1e9 + 0.5)) and the
  * distributed aggregation sums LONGS — order-independent — while every
  * per-row float op (the w·x fold over the doc's sorted feature list)
  * is a fixed expression tree. Same corpus → same weights, bit for bit,
  * at any partitioning or cluster size (QualityClassifierSpec pins
  * repartition-invariance and equality with a single-JVM reference
  * implementation).
  *
  * Square loss, not logistic: sigmoid needs exp(), which is not
  * correctly rounded and would break cross-engine/cross-run exactness;
  * a linear probability model ranks/splits the same quality tail and
  * stays inside +,−,×,/ . Per iteration: one pass over the cached
  * featurized corpus — a (doc agg) margin join + an exploded
  * per-feature scaled-long aggregation, collecting Dim+1 longs to the
  * driver (the MLlib full-batch shape). At 100 TB: featurize once,
  * cache/persist, ~20 passes over (doc_id, f) pairs.
  */
object QualityClassifier {
  /** Feature space — shared with [[DsirModel]] so one tokenize pass can
    * feed both selection operators. */
  val Dim: Long = DsirModel.Dim

  /** Gradient snap scale (the repo-wide 1e9 scaled-long discipline). */
  val GradScale = 1.0e9

  final case class Model(bias: Double, w: IndexedSeq[Double]) {
    require(w.length == Dim.toInt)
  }

  /** (doc_id, label, feats) — feats = SORTED distinct feature buckets of
    * the doc's tokens (binary presence; sorting fixes the per-row float
    * fold order so margins are partitioning-independent). */
  def featurize(docs: DataFrame, labelCol: Column): DataFrame = {
    graft.GraftExtensions.register(docs.sparkSession)
    docs.select(col("doc_id"), labelCol.cast("double").as("label"),
      explode(tokens(col("text"))).as("t"))
      .select(col("doc_id"), col("label"), DsirModel.featCol(col("t")).as("f"))
      .groupBy(col("doc_id"), col("label"))
      .agg(sort_array(collect_set(col("f"))).as("feats"))
  }

  /** Margin w·x + b for one row's sorted feature list under weight
    * literal `wLit` (array of Dim doubles): a left-to-right fold, the
    * same expression [[predict]] scores with. */
  private def marginCol(wLit: Column, bias: Double): Column =
    aggregate(col("feats"), lit(bias),
      (acc, f) => acc + element_at(wLit, (f + 1).cast("int")))

  /** Train on `featurize` output. Fixed iterations and learning rate —
    * no early stopping, so the weight trajectory is a pure function of
    * the corpus. The step normalizes by L = max features per doc (an
    * exact integer read off the data): a doc's margin moves by
    * ~lr·L·residual per iteration, so un-normalized GD diverges once
    * docs carry more than ~2/lr features (it did, at 35 features/doc —
    * residuals overflowed the scaled-long snap). lr·(L/L) < 2 is stable
    * for any corpus. */
  def train(feats: DataFrame, iters: Int = 20, lr: Double = 0.5): Model = {
    val cached = feats.cache()
    val n = cached.count()
    if (n == 0L) { cached.unpersist(); return Model(0.0, IndexedSeq.fill(Dim.toInt)(0.0)) }
    val maxFeats = math.max(1L,
      cached.agg(max(size(col("feats")))).collect().head.getInt(0).toLong)
    val lrEff = lr / maxFeats
    var bias = 0.0
    var w = IndexedSeq.fill(Dim.toInt)(0.0)
    for (_ <- 1 to iters) {
      val wLit = typedlit(w)
      // residual r = (w·x + b) − y, snapped once per doc; the bias
      // gradient rides the same aggregation as feature bucket −1
      val g = cached
        .select(col("doc_id"),
          floor((marginCol(wLit, bias) - col("label")) * GradScale + lit(0.5))
            .cast("long").as("r"), col("feats"))
        .select(explode(concat(array(lit(-1L)), col("feats"))).as("f"), col("r"))
        .groupBy(col("f")).agg(sum(col("r")).as("g"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val step = lrEff / (GradScale * n)
      bias -= step * g.getOrElse(-1L, 0L)
      w = w.indices.map(i => w(i) - step * g.getOrElse(i.toLong, 0L))
    }
    cached.unpersist()
    Model(bias, w)
  }

  /** Score docs under a trained model: (doc_id, margin, keep). */
  def predict(model: Model, feats: DataFrame): DataFrame =
    feats.select(col("doc_id"),
      marginCol(typedlit(model.w), model.bias).as("margin"))
      .withColumn("keep", when(col("margin") > 0.5, 1L).otherwise(0L))

  /** Persist / load the weight artifact ((idx, weight) rows, idx −1 =
    * bias — Dim+1 doubles, one file). Doubles round-trip parquet
    * exactly, so load(write(m)) == m bit for bit. */
  def write(model: Model, spark: org.apache.spark.sql.SparkSession,
      path: String): Unit = {
    import spark.implicits._
    ((-1L, model.bias) +: model.w.indices.map(i => (i.toLong, model.w(i))))
      .toDF("idx", "weight").coalesce(1)
      .write.mode("overwrite").parquet(path)
  }

  def load(spark: org.apache.spark.sql.SparkSession, path: String): Model = {
    import spark.implicits._
    val rows = spark.read.parquet(path).select(col("idx"), col("weight"))
      .as[(Long, Double)].collect().toMap
    Model(rows(-1L), IndexedSeq.tabulate(Dim.toInt)(i => rows(i.toLong)))
  }
}

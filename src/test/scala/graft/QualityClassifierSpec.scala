package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.QualityClassifier

/** QualityClassifier — bit-reproducible distributed GD for the
  * hashed-linear quality model. Pins (the BpeTrainer discipline):
  * partitioning-invariance of the trained weights, exact equality with
  * an independent single-JVM reference implementation of the same
  * scaled-long algebra, and that the trained model actually separates a
  * labeled corpus. */
class QualityClassifierSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val corpus = Seq(
    (0L, "alpha beta gamma alpha delta", 1.0),
    (1L, "beta gamma delta epsilon", 1.0),
    (2L, "alpha epsilon gamma", 1.0),
    (3L, "delta alpha beta", 1.0),
    (4L, "zut alors fromage baguette", 0.0),
    (5L, "fromage chateau zut", 0.0),
    (6L, "baguette alors chateau fromage", 0.0),
    (7L, "zut chateau alors", 0.0))

  private def docs(rows: Seq[(Long, String, Double)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "label")
  }

  /** The same feature hash the Spark side computes (first 60 bits of
    * md5, mod Dim) — reimplemented independently. */
  private def jvmFeat(token: String): Long = {
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest((token + "|dsir").getBytes("UTF-8"))
    val hex = md5.map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16) % QualityClassifier.Dim
  }

  /** Single-JVM reference: identical featurization, fold order, snap and
    * update algebra — no Spark. */
  private def referenceTrain(rows: Seq[(Long, String, Double)],
      iters: Int, lr: Double): (Double, IndexedSeq[Double]) = {
    val feats = rows.map { case (_, text, label) =>
      (label, text.split("\\s+").map(jvmFeat).distinct.sorted.toIndexedSeq)
    }
    val n = feats.length
    val lrEff = lr / math.max(1L, feats.map(_._2.length).max)
    var bias = 0.0
    var w = IndexedSeq.fill(QualityClassifier.Dim.toInt)(0.0)
    for (_ <- 1 to iters) {
      val g = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for ((label, fs) <- feats) {
        val margin = fs.foldLeft(bias)((acc, f) => acc + w(f.toInt))
        val r = math.floor((margin - label) * QualityClassifier.GradScale + 0.5).toLong
        g(-1L) += r
        fs.foreach(f => g(f) += r)
      }
      val step = lrEff / (QualityClassifier.GradScale * n)
      bias -= step * g(-1L)
      w = w.indices.map(i => w(i) - step * g(i.toLong))
    }
    (bias, w)
  }

  test("trained weights are partitioning-invariant, bit for bit") {
    val a = QualityClassifier.train(
      QualityClassifier.featurize(docs(corpus).repartition(1), col("label")))
    val b = QualityClassifier.train(
      QualityClassifier.featurize(docs(corpus).repartition(7), col("label")))
    assert(a.bias == b.bias)
    assert(a.w == b.w)
  }

  test("distributed training equals the single-JVM reference exactly") {
    val m = QualityClassifier.train(
      QualityClassifier.featurize(docs(corpus), col("label")), iters = 10, lr = 0.5)
    val (refBias, refW) = referenceTrain(corpus, iters = 10, lr = 0.5)
    assert(m.bias == refBias, s"bias ${m.bias} != $refBias")
    assert(m.w == refW)
  }

  test("the trained model separates the labeled corpus") {
    import spark.implicits._
    val feats = QualityClassifier.featurize(docs(corpus), col("label"))
    val m = QualityClassifier.train(feats)
    val preds = QualityClassifier.predict(m, feats)
      .select($"doc_id", $"margin", $"keep").as[(Long, Double, Long)]
      .collect().map(p => p._1 -> p).toMap
    for (id <- 0L to 3L) assert(preds(id)._3 == 1L, s"doc $id: ${preds(id)}")
    for (id <- 4L to 7L) assert(preds(id)._3 == 0L, s"doc $id: ${preds(id)}")
  }

  test("empty corpus trains the zero model without aborting") {
    val m = QualityClassifier.train(
      QualityClassifier.featurize(docs(Seq.empty), col("label")))
    assert(m.bias == 0.0)
    assert(m.w.forall(_ == 0.0))
  }
}

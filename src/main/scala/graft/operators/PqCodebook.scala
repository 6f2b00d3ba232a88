package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic product-quantizer codebooks, shared by the in-query
  * IVF-PQ path (queries/SimilarityQueries `knn_ivfpq`) and the
  * materialized PQ index ([[VectorIndex.materializePq]]).
  *
  * Training is Lloyd's k-means per subspace over a bounded id-prefix
  * sample, fully deterministic (fixed init from evenly spaced sample
  * points, fixed iteration count, lowest-index tie-breaks, empty clusters
  * keep their previous centroid) — byte-stable across runs and
  * partitionings, so codebooks can ride plans as literals and persist as
  * index artifacts without version skew. At corpus scale this training is
  * an offline job over a sample; the codebook itself is ~4 KB.
  *
  * Geometry degrades on tiny/narrow corpora: centroid count caps at the
  * sample size and the subspace split adapts to the actual vector
  * dimension (fewer/narrower subspaces are still valid codebooks, just
  * coarser).
  */
object PqCodebook {
  /** Codebook: cb(m)(i) = centroid i of subspace m; subspace m covers
    * dims [m·dim/M, (m+1)·dim/M) of the vector. */
  type Codebook = IndexedSeq[IndexedSeq[IndexedSeq[Double]]]

  /** Train from an id-ascending sample of vectors. */
  def train(sample: Array[Array[Double]], kc: Int, mMax: Int,
      iters: Int): Codebook = {
    // no training data (empty corpus / empty id prefix): a trivial
    // 1-subspace zero codebook keeps the caller's plan well-formed — with
    // nothing to encode, no score is ever evaluated and the query result
    // is empty, instead of aborting the whole job here
    if (sample.isEmpty) return IndexedSeq(IndexedSeq(IndexedSeq(0.0)))
    val k = math.min(kc, sample.length)
    val dim = sample.map(_.length).min
    val effM = math.min(mMax, dim)
    (0 until effM).map { m =>
      val (lo, hi) = (m * dim / effM, (m + 1) * dim / effM)
      val pts = sample.map(_.slice(lo, hi))
      var cents = IndexedSeq.tabulate(k)(i => pts((i * pts.length) / k).toIndexedSeq)
      for (_ <- 0 until iters) {
        val assign = pts.map { p =>
          (0 until k).minBy(i => cents(i).zip(p).map { case (c, x) =>
            (c - x) * (c - x) }.sum)
        }
        cents = (0 until k).map { i =>
          val mine = pts.indices.filter(assign(_) == i)
          if (mine.isEmpty) cents(i)
          else (0 until (hi - lo)).map(d => mine.map(pts(_)(d)).sum / mine.length)
        }
      }
      cents
    }
  }

  /** Train from a (vec_id, `v` array<double>) frame: collects the
    * deterministic id-prefix sample (vec_id < trainN, sorted). */
  def trainFrom(vecs: DataFrame, vCol: String, kc: Int, mMax: Int,
      iters: Int, trainN: Long): Codebook = {
    // NULL vectors (failed encoder outputs) carry no training signal and
    // would NPE the collect below — skip them like the probe side does
    val sample = vecs.filter(col("vec_id") < trainN && col(vCol).isNotNull)
      .select(col("vec_id"), col(vCol)).collect()
      .sortBy(_.getLong(0)).map(_.getSeq[Double](1).toArray)
    train(sample, kc, mMax, iters)
  }

  /** Flat codebook layout consumed by `graft_pq_scores`: subspace-major,
    * centroid-major — block m starts at k·lo. */
  def flatten(cb: Codebook): Seq[Double] = cb.flatten.flatten

  /** Precomputed ‖c‖² per (subspace, centroid), same layout. */
  def norms2(cb: Codebook): Seq[Double] =
    cb.flatten.map(c => c.map(x => x * x).sum)

  /** Persist as a tiny parquet artifact (one row per centroid). */
  def save(spark: SparkSession, cb: Codebook, path: String): Unit = {
    import spark.implicits._
    cb.zipWithIndex.flatMap { case (cents, m) =>
      cents.zipWithIndex.map { case (c, i) => (m, i, c) }
    }.toDF("m", "i", "c").coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a [[save]]d codebook. */
  def load(spark: SparkSession, path: String): Codebook = {
    val rows = spark.read.parquet(path).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toIndexedSeq))
    rows.groupBy(_._1).toIndexedSeq.sortBy(_._1).map { case (_, ms) =>
      ms.sortBy(_._2).map(_._3).toIndexedSeq
    }
  }
}

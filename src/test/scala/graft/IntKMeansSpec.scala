package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IntegerKMeans

/** Pins for the deterministic scaled-long k-means (IntegerKMeans) and the
  * two hash-exact queries built on it (emb_kmeans_int / knn_ivf_int).
  *
  * The operator's whole reason to exist is CROSS-ENGINE, CROSS-RUN
  * bit-exactness — so the pins here are determinism pins: the assignment
  * must be invariant under partitioning (integer sums commute), the
  * assignment must equal a driver-side brute-force argmin over the same
  * centroids (no drift between the codegen path and the definition), and
  * the degrade rules (empty corpus, n < k, NULL vectors) must mirror what
  * the oracle's CTE chain does naturally. The Spark ≡ DuckDB half of the
  * contract is the driver's hash check; tools/local_verify.py runs the
  * same comparison locally.
  */
class IntKMeansSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def pts = IntegerKMeans.quantize(
    Tables.load(spark, sf, "embeddings").filter(col("embedding").isNotNull))

  test("assignment is invariant under input partitioning (integer algebra commutes)") {
    val p1 = pts.repartition(1)
    val p7 = pts.repartition(7)
    val c1 = IntegerKMeans.fit(p1, 8, 2)
    val c7 = IntegerKMeans.fit(p7, 8, 2)
    assert(c1.map(_._1) == c7.map(_._1))
    c1.zip(c7).foreach { case ((_, a), (_, b)) => assert(a.toSeq == b.toSeq) }
    val a1 = IntegerKMeans.assign(p1, c1).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val a7 = IntegerKMeans.assign(p7, c7).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(a1.toSeq == a7.toSeq)
  }

  test("assign equals the brute-force argmin over the same centroids") {
    val p = pts.cache()
    val cents = IntegerKMeans.fit(p, 8, 2)
    val byId = p.collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    val got = IntegerKMeans.assign(p, cents).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == byId.keySet)
    byId.foreach { case (id, qv) =>
      val best = cents.map { case (cid, cv) =>
        (qv.zip(cv).map { case (a, b) => (a - b) * (a - b) }.sum, cid)
      }.min // lexicographic (d2, cid) — the documented tie-break
      assert(got(id) == ((best._2, best._1)), s"vec $id")
    }
    p.unpersist()
  }

  test("Lloyd update step: centroids equal floor(mean) of their members") {
    val p = pts.cache()
    val c0 = IntegerKMeans.fit(p, 8, 0) // seeds only
    val c1 = IntegerKMeans.fit(p, 8, 1) // one update
    val members = IntegerKMeans.assign(p, c0).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byId = p.collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    val expect = members.groupBy(_._2).map { case (cid, ms) =>
      val vs = ms.map(m => byId(m._1))
      cid -> Array.tabulate(vs.head.length) { d =>
        math.floor(vs.map(_(d)).sum.toDouble / vs.length).toLong
      }
    }
    assert(c1.map(_._1).toSet == expect.keySet)
    c1.foreach { case (cid, cv) => assert(cv.toSeq == expect(cid).toSeq, s"cid $cid") }
    p.unpersist()
  }

  test("degrades: empty corpus, fewer points than k, NULL embeddings") {
    import spark.implicits._
    val empty = IntegerKMeans.quantize(
      Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding"))
    assert(IntegerKMeans.fit(empty, 8, 2).isEmpty)
    assert(IntegerKMeans.assign(empty, Nil).count() == 0)
    assert(IntegerKMeans.probe(empty, Nil, 2).count() == 0)

    val three = IntegerKMeans.quantize(Seq(
      (0L, Array(1f, 0f)), (1L, Array(0f, 1f)), (2L, Array(0.9f, 0.1f)))
      .toDF("vec_id", "embedding"))
    val cents = IntegerKMeans.fit(three, 8, 2)
    assert(cents.nonEmpty && cents.size <= 3)
    val a = IntegerKMeans.assign(three, cents)
    assert(a.count() == 3)

    // NULL embedding rows are the caller's filter (the queries drop them
    // before quantize); quantize itself propagates the null through
    val withNull = Seq((0L, Array(1f, 2f)), (1L, null.asInstanceOf[Array[Float]]))
      .toDF("vec_id", "embedding")
    val q = IntegerKMeans.quantize(withNull)
    assert(q.filter(col("qv").isNull).count() == 1)
  }

  test("emb_kmeans_int / knn_ivf_int: shape, keys, and determinism across runs") {
    val km1 = SparkEntry.queries("emb_kmeans_int")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    val km2 = SparkEntry.queries("emb_kmeans_int")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(km1 == km2)
    assert(km1.size == 500 && km1.map(_._2).distinct.size > 1)

    val ivf = SparkEntry.queries("knn_ivf_int")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(ivf.forall(r => r._4 >= 1 && r._4 <= 10))
    assert(ivf.forall(r => r._1 != r._2))
    val perQ = ivf.groupBy(_._1)
    assert(perQ.keySet == (0L until 10L).toSet)
    // ranks are dense 1..n and ordered by (d2, neighbor_id)
    perQ.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1L to sorted.size).toSeq)
      assert(sorted.map(r => (r._3, r._2)).toSeq == sorted.map(r => (r._3, r._2)).sortBy(identity).toSeq)
    }
  }

  test("fitSub (distributed) ≡ fitSubLocal (driver) on the same training set") {
    // at sf0.001 the id-prefix sample is the whole corpus, so the
    // distributed subspace fit and the driver-side one must agree
    // centroid-for-centroid — the pin that keeps the sampled production
    // path and the distributed API the same algorithm
    val p = pts.cache()
    val all = p.collect().map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    val dist = IntegerKMeans.fitSub(p, 8, 8, 16, 3)
    val local = IntegerKMeans.fitSubLocal(all, 8, 8, 16, 3)
    assert(dist.size == local.size)
    dist.zip(local).foreach { case (dm, lm) =>
      assert(dm.map(_._1) == lm.map(_._1))
      dm.zip(lm).foreach { case ((_, a), (_, b)) => assert(a.toSeq == b.toSeq) }
    }
    p.unpersist()
  }

  test("knn_pq_int: shortlist ranks are exact integer L2; ADC recall@10 vs brute force") {
    val byId = pts.collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val got = SparkEntry.queries("knn_pq_int")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    // emitted d2 is the true integer distance (re-rank is exact)
    got.foreach { case (q, n, d, _) => assert(d == d2(byId(q), byId(n)), s"($q,$n)") }
    // ADC is approximate, but the codebooks are trained on this very
    // corpus — recall@10 against the exact integer top-10 must clear the
    // same 0.7 bar SimilaritySpec pins for the LSH probe
    val recalls = (0L until 10L).map { q =>
      val truth = byId.keys.filter(_ != q).toSeq
        .map(n => (d2(byId(q), byId(n)), n)).sorted.take(10).map(_._2).toSet
      val mine = got.filter(_._1 == q).map(_._2).toSet
      mine.intersect(truth).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.7, s"mean ADC recall@10 $mean (per-query: $recalls)")
  }

  test("plan pins: assignment is map-only; the IVF probe broadcasts the query side") {
    val p = pts
    val cents = IntegerKMeans.fit(p, 8, 2)
    val aPlan = IntegerKMeans.assign(p, cents).queryExecution.executedPlan.toString
    assert(!aPlan.contains("Exchange"),
      s"assignment must not shuffle — centroids are literals:\n$aPlan")
    val ivfPlan = SparkEntry.queries("knn_ivf_int")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(ivfPlan.contains("BroadcastHashJoin") || ivfPlan.contains("BroadcastNestedLoop"),
      s"probe join must broadcast the |queries|·nprobe side:\n$ivfPlan")
    assert(!ivfPlan.contains("SortMergeJoin"),
      s"corpus cells must never sort-merge against the tiny probe side:\n$ivfPlan")
    // outlier top-N: the corpus ranks via a distributed partial top-N
    // (TakeOrderedAndProject), never a corpus-wide single-partition window
    val outPlan = SparkEntry.queries("emb_outliers")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(outPlan.contains("TakeOrderedAndProject"),
      s"emb_outliers must use a distributed partial top-N:\n$outPlan")
    // PQ: the ADC scan is corpus × broadcast-queries (table lookups only);
    // nothing in the plan may sort-merge or shuffle the corpus for the join
    val pqPlan = SparkEntry.queries("knn_pq_int")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(pqPlan.contains("BroadcastNestedLoopJoin") || pqPlan.contains("BroadcastHashJoin"),
      s"ADC pass must broadcast the query/distance-table side:\n$pqPlan")
    assert(!pqPlan.contains("SortMergeJoin"),
      s"PQ path must not sort-merge the corpus:\n$pqPlan")
  }
}

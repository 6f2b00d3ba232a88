package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared algebra of the integer IVFADC path (IVF coarse quantizer +
  * RESIDUAL product quantization with asymmetric-distance ranking) — the
  * standard billion-scale ANN layout (Jégou et al., "Product Quantization
  * for Nearest Neighbor Search", TPAMI 2011, §IV: IVFADC): a vector is
  * stored as (cell id, PQ codes of v − centroid(cell)), a query probes
  * nprobe cells and ranks candidates by M table lookups per vector.
  * Encoding RESIDUALS instead of raw vectors centers every subspace
  * sample on the probed cell, so the same M×Kc codebook budget spends its
  * resolution on the within-cell geometry — the accuracy step that
  * separates IVFADC from the flat-PQ spelling (`knn_pq_int`).
  *
  * Everything here is the scaled-long algebra of [[IntegerKMeans]] —
  * argmin by (d2, cid), residuals are exact long subtraction — so the
  * whole chain is order- and engine-independent and the battery query
  * `knn_ivfadc_int` hash-checks against a full DuckDB re-derivation.
  * Used by both the in-memory query (queries/SimilarityQueries) and the
  * materialized index ([[IntIvfIndex.materializeAdc]] / `probeAdc`);
  * the two must stay one algebra or the probe ≡ query pin in
  * IntIvfIndexSpec loses meaning.
  *
  * Driver-side pieces are all BOUNDED by construction: the centroid
  * table is k×d longs, codebooks M·Kc·dSub longs (~KBs), and the
  * per-query ADC tables are |queries|·nprobe·(M·Kc) longs — queries are
  * a bounded set by contract (the knn_pq_int qdtab doctrine), the corpus
  * side never leaves the cluster. */
object IvfAdc {
  /** Nearest cell by integer L2, ties to the lowest cid — the
    * [[IntegerKMeans.assign]] argmin on a driver-held vector. */
  def assignLocal(v: Array[Long], cents: Seq[(Long, Array[Long])]): Long = {
    var bd = Long.MaxValue
    var bc = Long.MaxValue
    cents.foreach { case (cid, cv) =>
      var d = 0L
      var i = 0
      while (i < v.length) { val x = v(i) - cv(i); d += x * x; i += 1 }
      if (d < bd || (d == bd && cid < bc)) { bd = d; bc = cid }
    }
    bc
  }

  /** The `nprobe` nearest cells by (d2, cid) — [[IntegerKMeans.probe]]
    * on a driver-held vector. */
  def probeLocal(v: Array[Long], cents: Seq[(Long, Array[Long])],
      nprobe: Int): Seq[Long] =
    cents.map { case (cid, cv) =>
      var d = 0L
      var i = 0
      while (i < v.length) { val x = v(i) - cv(i); d += x * x; i += 1 }
      (d, cid)
    }.sorted.take(nprobe).map(_._2)

  /** v − c, exact in longs. */
  def residual(v: Array[Long], c: Array[Long]): Array[Long] =
    Array.tabulate(v.length)(i => v(i) - c(i))

  /** Residuals of the bounded id-prefix training sample, against the
    * FINAL coarse centroids — the codebook training set
    * ([[IntegerKMeans.fitSubLocal]] input). */
  def residualSample(sample: Array[(Long, Array[Long])],
      cents: Seq[(Long, Array[Long])]): Array[(Long, Array[Long])] = {
    val cm = cents.toMap
    sample.map { case (id, v) => (id, residual(v, cm(assignLocal(v, cents)))) }
  }

  /** One row per (query, probed cell): the query's ADC distance table for
    * THAT cell's residual frame — tab(m·kc + cid) = ‖qr_sub − c‖² where
    * qr = query − centroid(cell). Emits (query_id, cluster, qdtab, qqv);
    * |queries|·nprobe rows, broadcast-sized by contract. */
  def queryAdcRows(queries: Seq[(Long, Array[Long])],
      cents: Seq[(Long, Array[Long])],
      cb: IndexedSeq[Seq[(Long, Array[Long])]], dSub: Int, kc: Int,
      nprobe: Int): Seq[(Long, Long, Seq[Long], Seq[Long])] = {
    val cm = cents.toMap
    queries.flatMap { case (qid, qv) =>
      probeLocal(qv, cents, nprobe).map { cell =>
        val qr = residual(qv, cm(cell))
        val tab = Array.fill(cb.length * kc)(0L)
        for (m <- cb.indices; (cid, cv) <- cb(m)) {
          var d = 0L
          var i = 0
          while (i < dSub) { val x = qr(m * dSub + i) - cv(i); d += x * x; i += 1 }
          tab(m * kc + cid.toInt) = d
        }
        (qid, cell, tab.toSeq, qv.toSeq)
      }
    }
  }

  /** The residual column for an assigned frame: qv − centroid(cluster),
    * via a cluster→centroid MAP LITERAL — row-local, no join, so the
    * encode pass stays map-only over the corpus scan (the
    * [[IntegerKMeans.d2To]] literal doctrine). */
  def residualCol(cents: Seq[(Long, Array[Long])]): Column = {
    val m = typedLit(cents.map { case (cid, cv) => cid -> cv.toSeq }.toMap)
    zip_with(col("qv"), element_at(m, col("cluster")), (a, b) => a - b)
  }

  /** The ADC score of a `codes` row against a broadcast `qdtab`: M table
    * lookups and adds, no arithmetic on any vector — the reason an ADC
    * scan touches M bytes per neighbor instead of 4·d. */
  def adcExpr(mCnt: Int, kc: Int): Column =
    expr(s"""aggregate(transform(sequence(0, ${mCnt - 1}),
      m -> element_at(qdtab, CAST(m * $kc + element_at(codes, m + 1) + 1 AS INT))),
      0L, (a, x) -> a + x)""")
}

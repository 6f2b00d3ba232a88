package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Deterministic Lloyd's k-means over SCALED-LONG vectors — the
  * cross-engine-exact quantizer behind `emb_kmeans_int` / `knn_ivf_int`.
  *
  * The floating-point k-means the battery also ships (Spark ML, behind
  * knn_ivf_kmeans) can never be oracle-checked hash-exact: float summation
  * order differs run-to-run and engine-to-engine, so the driver records a
  * rows-only check and the spec pins recall instead. This operator closes
  * that gap by moving the ENTIRE algebra into integers, where every step
  * is order-independent and bit-identical on any engine:
  *
  *  - quantize: q_i = floor(v_i · 10⁶) as LONG (float32 → float64 is
  *    exact, the product and floor are single IEEE ops — identical in
  *    Spark and DuckDB; floor, not round, because round half-ties differ
  *    between engines);
  *  - seed: the k lowest-id vectors (`vec_id < k`) are the initial
  *    centroids, cluster id = seed vec_id — no RNG anywhere;
  *  - assign: argmin over centroids of the integer L2 distance
  *    Σ(q−c)², ties broken toward the lowest cluster id;
  *  - update: c'_dim = floor(Σq / n) — the one division, done in double
  *    on values ≤ 2^34 · 2^20 « 2^53, so it is exact, then floored.
  *
  * Integer sums commute, so the result is independent of partitioning,
  * task order, and engine — IntKMeansSpec pins assignment invariance
  * under repartition, and the driver hash-checks the full assignment
  * against a DuckDB re-derivation (the first clustering query in the
  * battery to be oracle-exact).
  *
  * Scale shape (the part that must survive 100 TB): centroids are k×d
  * longs and live on the driver (the PqCodebook bounded-artifact
  * doctrine); assignment is a broadcast of that table against the corpus
  * — one scan, no shuffle; the update is posexplode → partial-aggregated
  * groupBy(cluster, dim), which map-side combines to ≤ k·d rows per task
  * before the exchange, so each Lloyd iteration shuffles k·d·partitions
  * tiny rows, never the corpus. Iteration count is a fixed constant —
  * cost is iters+1 corpus scans, the textbook k-means bound.
  */
object IntegerKMeans {
  /** Quantization scale: 6 decimal digits — comfortably above float32's
    * ~7 significant digits at unit scale, far below long overflow
    * (|q| ≤ ~2^21 for |v| ≤ 2, d·(2q)² ≤ 2^48 per distance). */
  val Scale = 1000000L

  private val quantExpr =
    s"transform(CAST(embedding AS array<double>), x -> floor(x * $Scale))"

  /** (vec_id, qv: array<long>) — the quantized corpus. vec_id normalizes
    * to LONG (test fixtures write INT32 ids; the id is a cluster label
    * and a seed key, so the widening is value-preserving). */
  def quantize(e: DataFrame): DataFrame =
    e.select(col("vec_id").cast("long").as("vec_id"), expr(quantExpr).as("qv"))

  /** Integer L2 distance from a quantized-vector column to one literal
    * centroid — the k×d centroid table rides into codegen as array
    * literals, so the whole argmin is row-local (no join, no shuffle, no
    * exchange: the assignment pass is map-only over the corpus scan). */
  def d2To(v: org.apache.spark.sql.Column, cv: Array[Long]): org.apache.spark.sql.Column =
    aggregate(
      zip_with(v, typedLit(cv.toSeq), (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, x) => acc + x)

  private def d2To(cv: Array[Long]): org.apache.spark.sql.Column = d2To(col("qv"), cv)

  /** Assign every point to its nearest centroid (integer L2, ties to the
    * lowest cid — `least` over (d2, cid) structs is a lexicographic min).
    * Returns (vec_id, cluster, d2); empty centroid set → empty result
    * (the empty-corpus degrade, mirrored by the oracle's empty CTE
    * chain). */
  def assign(pts: DataFrame, cents: Seq[(Long, Array[Long])],
      keep: Seq[String] = Nil): DataFrame = {
    val spark = pts.sparkSession
    if (cents.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row],
        StructType(StructField("vec_id", LongType) +:
          keep.map(n => pts.schema(n)) :+ StructField("cluster", LongType) :+
          StructField("d2", LongType)))
    val candidates = cents.map { case (cid, cv) =>
      struct(d2To(cv).as("d2"), lit(cid).as("cluster"))
    }
    val m = if (candidates.length == 1) candidates.head else least(candidates: _*)
    pts.select(col("vec_id") +: keep.map(col) :+ m.as("m"): _*)
      .withColumn("cluster", col("m.cluster")).withColumn("d2", col("m.d2"))
      .drop("m")
  }

  /** The `nprobe` nearest centroids per point — the IVF multi-probe set.
    * Row-local like [[assign]]: the k candidate (d2, cid) structs sort in
    * an array literal expression (`array_sort` is lexicographic, so ties
    * again break toward the lowest cid) and the first `nprobe` explode.
    * Returns (vec_id, qv, cluster, cd2), one row per probed cell. */
  def probe(pts: DataFrame, cents: Seq[(Long, Array[Long])], nprobe: Int): DataFrame = {
    val spark = pts.sparkSession
    if (cents.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row],
        StructType(Seq(StructField("vec_id", LongType),
          pts.schema("qv"), StructField("cluster", LongType),
          StructField("cd2", LongType))))
    val arr = array(cents.map { case (cid, cv) =>
      struct(d2To(cv).as("d2"), lit(cid).as("cluster"))
    }: _*)
    pts.select(col("vec_id"), col("qv"),
        explode(slice(array_sort(arr), 1, nprobe)).as("pc"))
      .select(col("vec_id"), col("qv"),
        col("pc.cluster").as("cluster"), col("pc.d2").as("cd2"))
  }

  /** Per-subspace code assignment as ONE expression: the full M×Kc×dSub
    * codebook rides in a single `typedLit` literal (one Literal node —
    * data, not expression tree) and the argmin is a nested
    * higher-order-function fold: transform over subspaces → aggregate
    * over that subspace's centroids → least on (d2, cid) structs (the
    * same lexicographic tie-break as [[assign]]). The unrolled
    * least-of-M·Kc-structs spelling is semantically identical but costs
    * ~1 s of ANALYZER time per plan at 8×16 (thousands of expression
    * nodes × ~30 optimizer passes — measured: fitSub 4.2 s → 0.6 s warm
    * at sf0.1 after the switch); row-at-a-time eval cost is the same
    * (HOFs don't codegen either way). Returns array<long>, codes(m) =
    * nearest cid in subspace m. */
  def subCodes(cents: IndexedSeq[Seq[(Long, Array[Long])]], dSub: Int): org.apache.spark.sql.Column =
    subCodes(cents, dSub, col("qv"))

  /** [[subCodes]] over an arbitrary vector column — the residual-PQ path
    * ([[IvfAdc]]) encodes `qv − centroid(cluster)` instead of `qv`. */
  def subCodes(cents: IndexedSeq[Seq[(Long, Array[Long])]], dSub: Int,
      v: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val centsLit = typedLit(cents.map(_.map { case (cid, cv) => (cid, cv.toSeq) }).toSeq)
    transform(centsLit, (cm, m) =>
      aggregate(cm,
        named_struct(lit("d2"), lit(Long.MaxValue), lit("cid"), lit(Long.MaxValue)),
        (best, c) => least(best, named_struct(
          lit("d2"), aggregate(
            zip_with(slice(v, m * dSub + 1, lit(dSub)), c.getField("_2"),
              (a, b) => (a - b) * (a - b)),
            lit(0L), (acc, x) => acc + x),
          lit("cid"), c.getField("_1"))),
        b => b.getField("cid")))
  }

  /** Driver-side all-subspaces Lloyd fit over an ALREADY-COLLECTED
    * training sample — the production PQ shape ([[PqCodebook]] doctrine:
    * codebooks train on a bounded id-prefix sample, never the corpus;
    * at 10⁸ vectors the distributed spelling pays iters full scans for
    * centroids a 512-row sample determines just as well). The integer
    * algebra is step-for-step [[fitSub]]'s — argmin by (d2, cid),
    * update floor(Σq/n) with the division exact in double — so a
    * same-sample SQL re-derivation (the oracle's `vec_id < trainN`
    * training CTEs) is bit-identical. Pure Scala: zero Spark jobs. */
  def fitSubLocal(sample: Array[(Long, Array[Long])], mCnt: Int, dSub: Int,
      k: Int, iters: Int): IndexedSeq[Seq[(Long, Array[Long])]] =
    (0 until mCnt).map { m =>
      val pts = sample.map { case (id, qv) => (id, qv.slice(m * dSub, (m + 1) * dSub)) }
      var cents: Seq[(Long, Array[Long])] =
        pts.filter(_._1 < k).sortBy(_._1).toSeq
      var i = 0
      while (i < iters && cents.nonEmpty) {
        val assigned = pts.map { case (id, v) =>
          val best = cents.map { case (cid, cv) =>
            var d = 0L; var j = 0
            while (j < dSub) { val x = v(j) - cv(j); d += x * x; j += 1 }
            (d, cid)
          }.min
          (best._2, v)
        }
        cents = assigned.groupBy(_._1).map { case (cid, rows) =>
          val arr = Array.tabulate(dSub) { d =>
            math.floor(rows.map(_._2(d)).sum.toDouble / rows.length).toLong
          }
          (cid, arr)
        }.toSeq.sortBy(_._1)
        i += 1
      }
      cents
    }

  /** All-subspaces Lloyd fit for the product quantizer: trains the M
    * per-subspace codebooks (`mCnt` subspaces of `dSub` dims each) in ONE
    * set of Spark jobs — 1 seed collect + `iters` update jobs — instead
    * of M independent [[fit]] loops (M·iters jobs; measured 8.6 s vs
    * ~1 s at sf0.1, pure job-scheduling overhead). Per iteration: every
    * subspace's argmin is row-local (the [[assign]] least-struct, one per
    * subspace), the update posexplodes qv ONCE and groups by
    * (m, cid, sub-dim) — map-side combining to ≤ M·Kc·dSub rows per task
    * — and the collected centroid table is M·Kc·dSub longs. The algebra
    * per subspace is exactly [[fit]]'s (the oracle threads m through the
    * same chain). */
  def fitSub(pts: DataFrame, mCnt: Int, dSub: Int, k: Int,
      iters: Int): IndexedSeq[Seq[(Long, Array[Long])]] = {
    val seedRows = pts.filter(col("vec_id") < k).select(col("vec_id"), col("qv")).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray)).sortBy(_._1)
    var cents: IndexedSeq[Seq[(Long, Array[Long])]] = (0 until mCnt).map { m =>
      seedRows.toSeq.map { case (id, qv) => (id, qv.slice(m * dSub, (m + 1) * dSub)) }
    }
    var i = 0
    while (i < iters && seedRows.nonEmpty) {
      val sums = pts
        .select(subCodes(cents, dSub).as("codes"), col("qv"))
        .select(col("codes"), posexplode(col("qv")).as(Seq("dim", "q")))
        .filter(col("dim") < mCnt * dSub)
        .select(expr(s"dim div $dSub").cast("int").as("m"),
          expr(s"element_at(codes, CAST(dim div $dSub AS INT) + 1)").as("cid"),
          (col("dim") % dSub).as("sd"), col("q"))
        .groupBy(col("m"), col("cid"), col("sd"))
        .agg(sum(col("q")).as("s"), count(lit(1)).as("n"))
        .collect()
      cents = (0 until mCnt).map { m =>
        sums.filter(_.getInt(0) == m).groupBy(_.getLong(1)).map { case (cid, rows) =>
          val arr = new Array[Long](dSub)
          rows.foreach(r => arr(r.getInt(2)) =
            math.floor(r.getLong(3).toDouble / r.getLong(4)).toLong)
          (cid, arr)
        }.toSeq.sortBy(_._1)
      }
      i += 1
    }
    cents
  }

  /** Lloyd fit from the deterministic seed set. Returns the centroid
    * table after `iters` updates, sorted by cid — a k×d-long driver-side
    * artifact. Empty clusters drop out (their cid simply stops existing),
    * exactly as the oracle's GROUP BY does. */
  def fit(pts: DataFrame, k: Int, iters: Int): Seq[(Long, Array[Long])] = {
    var cents: Seq[(Long, Array[Long])] = pts.filter(col("vec_id") < k)
      .select(col("vec_id"), col("qv")).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray)).sortBy(_._1).toSeq
    var i = 0
    while (i < iters && cents.nonEmpty) {
      // keep=qv instead of a join-back: the update pass stays MAP-ONLY
      // over the corpus scan (no vec_id shuffle), partial-aggregating to
      // ≤ k·d rows per task before the one tiny exchange
      val sums = assign(pts, cents, keep = Seq("qv"))
        .select(col("cluster"), posexplode(col("qv")).as(Seq("dim", "q")))
        .groupBy(col("cluster"), col("dim"))
        .agg(sum(col("q")).as("s"), count(lit(1)).as("n"))
        .collect()
      cents = sums.groupBy(_.getLong(0)).map { case (cid, rows) =>
        val arr = new Array[Long](rows.map(_.getInt(1)).max + 1)
        rows.foreach(r => arr(r.getInt(1)) = math.floor(r.getLong(2).toDouble / r.getLong(3)).toLong)
        (cid, arr)
      }.toSeq.sortBy(_._1)
      i += 1
    }
    cents
  }
}

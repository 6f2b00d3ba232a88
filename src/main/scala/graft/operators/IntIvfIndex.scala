package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType, StructField, StructType}

/** Materialized integer-IVF index: the ON-DISK form of `knn_ivf_int`'s
  * scale claim ("at 10⁸ vectors the cluster column is the on-disk
  * partition key and the probe is a partition-pruned scan") — this
  * operator makes that sentence literally true and pins it.
  *
  * [[materialize]] writes the quantized corpus assigned to its centroids
  * as `cluster=K/` hive partitions plus the k×d centroid table under
  * `_centroids` (underscore-prefixed → invisible to the partitioned
  * read). [[probe]] then answers top-k queries by:
  *   1. choosing nprobe cells per query ROW-LOCALLY from the (driver-
  *      held, bounded) centroid table;
  *   2. reading ONLY those cells — the cell set is collected to literals
  *      (bounded by |queries|·nprobe) so Catalyst prunes partitions
  *      statically: IntIvfIndexSpec pins `PartitionFilters` with the
  *      cluster IN-list on the scan, the 100 TB money shot;
  *   3. exact integer re-rank inside the probed cells (broadcast query
  *      side, the knn_ivf_int algebra — probe ≡ the in-memory query is
  *      pinned).
  *
  * Right-to-be-forgotten parity with the other index artifacts
  * (Bm25Index / VectorIndex / ShingleIndex doctrine): [[delete]] appends
  * a tombstone list under `_tombstones` (also hidden) and probes mask
  * through it with a broadcast anti-join — probe ≡ an index rebuilt
  * without the docs; [[vacuum]] rewrites the surviving rows (EAGER
  * localCheckpoint pins the read before the in-place overwrite — the
  * read-path-you-write discipline) and drops the tombstones, after which
  * the removed ids are physically absent. */
object IntIvfIndex {
  private def centDir(dir: String) = s"$dir/_centroids"
  private def tombDir(dir: String) = s"$dir/_tombstones"
  private def pqDir(dir: String) = s"$dir/_pq"

  /** Fit (or accept) centroids, assign, and write the partitioned index.
    * Returns the centroid table it wrote. */
  def materialize(pts: DataFrame, dir: String, k: Int, iters: Int,
      cents: Option[Seq[(Long, Array[Long])]] = None): Seq[(Long, Array[Long])] = {
    val spark = pts.sparkSession
    val cs = cents.getOrElse(IntegerKMeans.fit(pts, k, iters))
    IntegerKMeans.assign(pts, cs, keep = Seq("qv"))
      .write.partitionBy("cluster").mode("overwrite").parquet(dir)
    import spark.implicits._
    cs.map { case (cid, cv) => (cid, cv.toSeq) }
      .toDF("cid", "cv").coalesce(1)
      .write.mode("overwrite").parquet(centDir(dir))
    cs
  }

  /** The persisted centroid table — k×d longs, driver-sized by design. */
  def loadCentroids(spark: SparkSession, dir: String): Seq[(Long, Array[Long])] =
    spark.read.parquet(centDir(dir)).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray)).sortBy(_._1)

  private def masked(spark: SparkSession, dir: String, df: DataFrame): DataFrame =
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(tombDir(dir)))) df
    else df.join(
      broadcast(spark.read.parquet(tombDir(dir)).select(col("vec_id")).distinct()),
      Seq("vec_id"), "left_anti")

  /** Top-k integer-L2 neighbors for `queries` (vec_id, qv) over the
    * probed cells only. Output (query_id, neighbor_id, d2, rnk) — equals
    * the in-memory knn_ivf_int computation on the same centroids. */
  def probe(spark: SparkSession, dir: String, queries: DataFrame,
      nprobe: Int, k: Int): DataFrame = {
    val cents = loadCentroids(spark, dir)
    if (cents.isEmpty)
      return spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
        StructType(Seq("query_id", "neighbor_id", "d2", "rnk")
          .map(StructField(_, LongType))))
    val qp = IntegerKMeans.probe(queries, cents, nprobe)
      .select(col("vec_id").as("query_id"), col("qv").as("qqv"), col("cluster"))
      .localCheckpoint(true) // one probe-cell computation: reused as the
                             // literal cell list AND the join side
    // bounded: |queries|·nprobe literals → STATIC partition pruning
    val cells = qp.select(col("cluster")).distinct().collect().map(_.getLong(0))
    val idx = masked(spark, dir,
      spark.read.parquet(dir).filter(col("cluster").isin(cells: _*)))
    val d2 = aggregate(zip_with(col("qqv"), col("qv"), (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, x) => acc + x)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("d2"), col("neighbor_id"))
    idx.join(broadcast(qp), Seq("cluster"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), d2.as("d2"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
  }

  /** Materialize the IVFADC layout (the `knn_ivfadc_int` algebra on
    * disk — [[IvfAdc]]): each cluster partition stores, per vector, both
    * the full `qv` AND the M-byte-shaped residual-PQ `codes` column, so
    * [[probeAdc]]'s candidate pass can read ONLY (vec_id, codes) —
    * parquet column pruning makes the ADC scan touch M longs per
    * neighbor instead of d, on top of the partition pruning, which is
    * the entire storage argument of IVFADC at 10⁸+ vectors. Codebooks
    * train on the RESIDUALS of the bounded `vec_id < trainN` id-prefix
    * sample against the final coarse centroids (deterministic — frozen
    * `cents` + a prefix-disjoint batch reproduce them exactly, the
    * append ≡ rebuild precondition) and persist under `_pq` (hidden
    * like `_centroids`): one geometry row (m = −1, carrying dsub/kc)
    * plus one row per (m, cid) centroid. */
  def materializeAdc(pts: DataFrame, dir: String, k: Int, iters: Int,
      mMax: Int, kc: Int, pqIters: Int, trainN: Long,
      cents: Option[Seq[(Long, Array[Long])]] = None): Seq[(Long, Array[Long])] = {
    val spark = pts.sparkSession
    import spark.implicits._
    val cs = cents.getOrElse(IntegerKMeans.fit(pts, k, iters))
    if (cs.isEmpty) return materialize(pts, dir, k, iters, cents)
    val dTot = cs.head._2.length
    val dSub = math.max(1, dTot / mMax)
    val mCnt = math.min(mMax, dTot / dSub)
    val sample = pts.filter(col("vec_id") < trainN)
      .select(col("vec_id"), col("qv")).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    val cb = IntegerKMeans.fitSubLocal(
      IvfAdc.residualSample(sample, cs), mCnt, dSub, kc, pqIters)
    // one MAP-ONLY encode pass: assign + residual + M argmins, all from
    // literals — the corpus never shuffles on the way into its partitions
    IntegerKMeans.assign(pts, cs, keep = Seq("qv"))
      .select(col("vec_id"), col("qv"), col("cluster"),
        IntegerKMeans.subCodes(cb, dSub, IvfAdc.residualCol(cs)).as("codes"))
      .write.partitionBy("cluster").mode("overwrite").parquet(dir)
    cs.map { case (cid, cv) => (cid, cv.toSeq) }
      .toDF("cid", "cv").coalesce(1)
      .write.mode("overwrite").parquet(centDir(dir))
    writePq(spark, dir, cb, dSub, kc)
    cs
  }

  private[graft] def writePq(spark: SparkSession, dir: String,
      cb: IndexedSeq[Seq[(Long, Array[Long])]], dSub: Int, kc: Int): Unit = {
    import spark.implicits._
    val rows = (-1L, -1L, Seq(dSub.toLong, kc.toLong)) +:
      cb.zipWithIndex.flatMap { case (cents, m) =>
        cents.map { case (cid, cv) => (m.toLong, cid, cv.toSeq) }
      }
    rows.toDF("m", "cid", "cv").coalesce(1)
      .write.mode("overwrite").parquet(pqDir(dir))
  }

  /** The persisted residual codebooks + geometry — KB-sized by design. */
  def loadPq(spark: SparkSession, dir: String)
      : (IndexedSeq[Seq[(Long, Array[Long])]], Int, Int) = {
    val rows = spark.read.parquet(pqDir(dir)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2).toArray))
    val geom = rows.find(_._1 == -1L)
      .getOrElse(sys.error(s"$dir/_pq has no geometry row — not an ADC index"))
    val (dSub, kc) = (geom._3(0).toInt, geom._3(1).toInt)
    val byM = rows.filter(_._1 >= 0).groupBy(_._1)
    val mCnt = if (byM.isEmpty) 0 else byM.keys.max.toInt + 1
    val cb = (0 until mCnt).map { m =>
      byM.getOrElse(m.toLong, Array.empty).map(r => (r._2, r._3)).sortBy(_._1).toSeq
    }
    (cb, dSub, kc)
  }

  /** IVFADC probe: partition-pruned candidate scan reading ONLY
    * (vec_id, codes), ADC ranking against per-(query, cell) broadcast
    * distance tables, exact integer re-rank of the per-query shortlist.
    * `queries` (vec_id, qv) is a bounded set by contract (the knn_pq_int
    * qdtab doctrine — its ADC tables collect to the driver). Equals the
    * in-memory `knn_ivfadc_int` algebra on the same centroids/codebooks
    * (IntIvfAdcSpec pins it); tombstoned ids never appear. */
  /** `allowed` (optional, one id column) PRE-FILTERS the candidates —
    * the production selector pattern (FAISS IDSelector / payload
    * filters): the mask applies before the ADC shortlist so every slot
    * is spent on an eligible vector. Because cells/codes/ADC tables are
    * per-row functions of the frozen quantizers, the filtered probe
    * equals a probe of an index materialized on only the allowed subset
    * (IntIvfAdcSpec pins it). */
  def probeAdc(spark: SparkSession, dir: String, queries: DataFrame,
      nprobe: Int, k: Int, shortlist: Int,
      allowed: Option[DataFrame] = None): DataFrame =
    reader(spark, dir).probeAdc(queries, nprobe, k, shortlist, allowed)

  /** The SERVING handle: centroid table, PQ codebooks and the corpus
    * DataFrame (its parquet footer/schema listing) load ONCE at
    * construction; each [[Reader.probeAdc]] call then costs only the
    * probe itself — the bounded queries collect, the partition-pruned
    * candidate scan and the shortlist re-rank. A per-probe
    * [[IntIvfIndex.probeAdc]] re-reads all three artifacts every call
    * (correct, and what the battery gate spells), which at serving QPS
    * is pure per-request overhead for bytes that never change between
    * index commits. Results are identical by construction — the Reader
    * delegates to the same probeAdcCore over the same masked scan
    * (IntIvfIndexSpec pins it). Re-create the Reader after append /
    * delete / vacuum: it holds the artifact state of construction time
    * (the quantizers are frozen anyway; the tombstone mask is re-read
    * here per probe so delete() is visible without a reload). */
  final class Reader private[IntIvfIndex] (spark: SparkSession, dir: String,
      cents: Seq[(Long, Array[Long])],
      pq: Option[(IndexedSeq[Seq[(Long, Array[Long])]], Int, Int)],
      corpusThunk: () => DataFrame) {
    // deferred + memoized: an EMPTY index has no parquet files to infer a
    // schema from — probes short-circuit on cents.isEmpty before this
    // ever forces, and non-empty readers pay the footer listing once
    private lazy val corpus: DataFrame = corpusThunk()
    private def emptyResult: DataFrame =
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
        StructType(Seq("query_id", "neighbor_id", "d2", "rnk")
          .map(StructField(_, LongType))))

    private def scanOf(allowed: Option[DataFrame])(cells: Seq[Long]): DataFrame = {
      val allow = allowed.map(a =>
        a.select(col(a.columns.head).cast("long").as("vec_id")).distinct())
      val scan = masked(spark, dir, corpus.filter(col("cluster").isin(cells: _*)))
      allow.fold(scan)(a => scan.join(a, Seq("vec_id"), "left_semi"))
    }

    def probeAdc(queries: DataFrame, nprobe: Int, k: Int, shortlist: Int,
        allowed: Option[DataFrame] = None): DataFrame =
      if (cents.isEmpty) emptyResult
      else {
        val (cb, dSub, kc) = pq.getOrElse(
          sys.error(s"$dir has no _pq layout — use probe(), not probeAdc()"))
        probeAdcCore(spark, cents, cb, dSub, kc, queries, nprobe, k, shortlist,
          scanOf(allowed))
      }
  }

  /** Load the serving handle (see [[Reader]]). */
  def reader(spark: SparkSession, dir: String): Reader = {
    val cents = loadCentroids(spark, dir)
    val pq =
      if (java.nio.file.Files.exists(java.nio.file.Paths.get(pqDir(dir))))
        Some(loadPq(spark, dir))
      else None
    new Reader(spark, dir, cents, pq, () => spark.read.parquet(dir))
  }

  /** The ADC probe over any cell-pruned corpus reader — shared by the
    * static [[probeAdc]] and the streaming
    * [[graft.streaming.MaintainedIntIvfIndex]] (batch-gated reader), so
    * the two artifacts answer with one algebra. `scan(cells)` must
    * return (vec_id, cluster, codes, qv) rows of exactly those cells;
    * the candidate pass projects (vec_id, cluster, codes) — the
    * projection pushes through the reader to the parquet scan, keeping
    * the never-reads-qv column-pruning claim. */
  private[graft] def probeAdcCore(spark: SparkSession,
      cents: Seq[(Long, Array[Long])],
      cb: IndexedSeq[Seq[(Long, Array[Long])]], dSub: Int, kc: Int,
      queries: DataFrame, nprobe: Int, k: Int, shortlist: Int,
      scan: Seq[Long] => DataFrame): DataFrame = {
    import spark.implicits._
    val mCnt = cb.length
    val qrows = queries.select(col("vec_id").cast("long"), col("qv")).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray)).toSeq
    val qAdcRows = IvfAdc.queryAdcRows(qrows, cents, cb, dSub, kc, nprobe)
    val qdf = qAdcRows.toDF("query_id", "cluster", "qdtab", "qqv")
    // the probe-cell IN-list comes straight from the driver-side ADC rows
    // — a Spark distinct job over a localRelation would cost a full
    // job-launch round trip per probe call for data already in hand
    val cells = qAdcRows.map(_._2).distinct.toArray
    // candidate pass: column-pruned to (vec_id, codes) — never reads qv
    val coded = scan(cells).select(col("vec_id"), col("cluster"), col("codes"))
    val sw = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("adc"), col("neighbor_id"))
    val short = coded.join(broadcast(qdf), Seq("cluster"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("qqv"), col("vec_id").as("neighbor_id"),
        IvfAdc.adcExpr(mCnt, kc).as("adc"))
      .withColumn("srnk", row_number().over(sw))
      .filter(col("srnk") <= shortlist)
      .select(col("query_id"), col("qqv"), col("neighbor_id"))
    // re-rank: the SAME pruned cells, now reading (vec_id, qv), gated by
    // the broadcast shortlist — |queries|·shortlist rows see a vector
    val vecs = scan(cells).select(col("vec_id"), col("qv"))
    val d2 = aggregate(zip_with(col("qqv"), col("qv"), (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, x) => acc + x)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("d2"), col("neighbor_id"))
    vecs.join(broadcast(short), col("vec_id") === col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), d2.as("d2"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
  }

  /** Daily fold: assign a NEW batch against the FROZEN centroid table
    * and append into the cluster partitions — the standing files never
    * rewrite, and because integer assignment is a pure function of the
    * (persisted) centroids, probe-after-append equals a probe of an
    * index materialized over corpus ∪ batch with the same centroids
    * EXACTLY (spec-pinned; contrast the float-LSH index, where only the
    * bucketing function is frozen). Batch ids must be disjoint from the
    * corpus (the ShingleIndex.append contract). The quantizer does NOT
    * refit — cell balance drifts as the distribution does, and the
    * remedy is a scheduled re-[[materialize]], not a silent refit that
    * would re-home every standing row. */
  def append(spark: SparkSession, dir: String, batch: DataFrame): Unit = {
    val cents = loadCentroids(spark, dir)
    require(cents.nonEmpty, s"$dir has no centroid table — materialize first")
    val assigned = IntegerKMeans.assign(batch, cents, keep = Seq("qv"))
    // ADC index: encode with the FROZEN codebooks — like the frozen
    // centroids, a pure function of persisted state, so append ≡ rebuild
    // stays exact as long as the batch ids sit outside the training prefix
    val rows = if (java.nio.file.Files.exists(java.nio.file.Paths.get(pqDir(dir)))) {
      val (cb, dSub, _) = loadPq(spark, dir)
      assigned.select(col("vec_id"), col("qv"), col("cluster"),
        IntegerKMeans.subCodes(cb, dSub, IvfAdc.residualCol(cents)).as("codes"))
    } else assigned
    rows.write.partitionBy("cluster").mode("append").parquet(dir)
  }

  /** Tombstone-mask removal: idempotent, |removed|-sized append; probes
    * behave as if the index were rebuilt without the ids. */
  def delete(spark: SparkSession, dir: String, ids: DataFrame): Unit = {
    import spark.implicits._
    ids.select(col(ids.columns.head).cast("long").as("vec_id")).distinct()
      .write.mode("append").parquet(tombDir(dir))
  }

  /** Physical erasure: rewrite surviving rows in place (checkpoint-pinned
    * — the plan reads the partitions it then overwrites). The full-dir
    * overwrite also removes the hidden `_centroids` and `_tombstones`
    * children, so the (driver-sized) centroid table is captured first and
    * rewritten after — the tombstones are MEANT to disappear here. Crash
    * window: between the data overwrite and the centroid rewrite the
    * index has no centroid table and [[probe]] fails loud (empty
    * centroids → empty result is the EMPTY-index degrade; a missing
    * `_centroids` dir throws) — re-running vacuum is not possible then,
    * but [[materialize]] over the surviving rows is, and nothing masked
    * ever reappears (the data overwrite already dropped it). Probes
    * before and after are identical (IntIvfIndexSpec pins it). */
  def vacuum(spark: SparkSession, dir: String): Unit = {
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(tombDir(dir)))) return
    compact(spark, dir)
  }

  /** [[vacuum]] WITHOUT requiring tombstones — fold the per-[[append]]
    * file accumulation inside each `cluster=` dir back into one compact
    * file set (rows re-clustered so each IVF cell lands contiguously),
    * dropping any tombstoned vectors along the way. Probes identical
    * before/after; the trained centroid/PQ artifacts are preserved
    * verbatim. Tree-level form: [[Maintenance.compact]]. */
  def compact(spark: SparkSession, dir: String): Unit = {
    // idempotent fast path: nothing masked and every cluster partition
    // already folded to one file — skip the whole-dir rewrite (and its
    // hidden-artifact capture/restore dance)
    val root = java.nio.file.Paths.get(dir)
    val clusterDirs = CatalogCommit.childDirs(root, "cluster=")
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(tombDir(dir))) &&
        clusterDirs.nonEmpty &&
        clusterDirs.forall(c => CatalogCommit.dataFileCount(c) <= 1L)) return
    val cents = loadCentroids(spark, dir)
    // capture the (KB-sized) hidden artifacts the full-dir overwrite
    // removes; `codes` survives via the data columns themselves
    val hasPq = java.nio.file.Files.exists(java.nio.file.Paths.get(pqDir(dir)))
    val pq = if (hasPq) Some(loadPq(spark, dir)) else None
    val dataCols = spark.read.parquet(dir).columns
      .filter(_ != "cluster").map(col) :+ col("cluster")
    val kept = masked(spark, dir, spark.read.parquet(dir))
      .select(dataCols: _*)
      .localCheckpoint(true)
    // the whole-dir overwrite also wipes `_tombstones`/`_centroids`
    // inside it — the mask above was checkpoint-pinned first, and the
    // small artifacts rewrite below from their driver-side copies
    kept.repartition(col("cluster"))
      .write.partitionBy("cluster").mode("overwrite").parquet(dir)
    import spark.implicits._
    cents.map { case (cid, cv) => (cid, cv.toSeq) }
      .toDF("cid", "cv").coalesce(1)
      .write.mode("overwrite").parquet(centDir(dir))
    pq.foreach { case (cb, dSub, kc) => writePq(spark, dir, cb, dSub, kc) }
  }
}

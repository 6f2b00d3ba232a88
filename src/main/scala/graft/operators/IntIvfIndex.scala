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
    IntegerKMeans.assign(batch, cents, keep = Seq("qv"))
      .write.partitionBy("cluster").mode("append").parquet(dir)
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
    val cents = loadCentroids(spark, dir)
    val kept = masked(spark, dir, spark.read.parquet(dir))
      .select(col("vec_id"), col("qv"), col("cluster"))
      .localCheckpoint(true)
    kept.write.partitionBy("cluster").mode("overwrite").parquet(dir)
    import spark.implicits._
    cents.map { case (cid, cv) => (cid, cv.toSeq) }
      .toDF("cid", "cv").coalesce(1)
      .write.mode("overwrite").parquet(centDir(dir))
  }
}

package graft.operators

import org.apache.spark.sql.SparkSession

/** Scheduled LAYOUT maintenance across a [[CurationJob]] /
  * [[DailyIncrement]] output tree — the operation that keeps the daily
  * path's probe costs flat over time.
  *
  * [[Takedown.scrub]] is the ERASURE sweep (tombstone-driven: it only
  * rewrites what a takedown masked). This is the missing twin: with NO
  * takedown ever filed, the daily path still degrades physically —
  * every [[DailyIncrement]] adds one `batch=<n>` partition to each
  * maintained catalog index (shingle/overlap/bm25) and one file set per
  * bucket to the vector/IVF layouts, so after a year of increments a
  * probe opens ~365× the partition dirs and files it needs. At 100 TB
  * that is the classic small-files failure mode: listing and footer
  * reads dominate the probe, and the bucket-pruned/partition-pruned
  * plans the specs pin stay *logically* identical while their I/O cost
  * quietly multiplies.
  *
  * One call folds every artifact back to its day-0 layout:
  *
  *   ├─ dedup / span indexes    [[ShingleIndex.compact]]  (registry kind
  *   │    `shingle` — batches fold to `batch=0`, pointer resets, bucket
  *   │    layout preserved so probes stay co-located)
  *   ├─ overlap / bench indexes [[OverlapIndex.compact]]  (kind `overlap`)
  *   ├─ line-segment indexes    [[LineSegmentIndex.compact]] (kind `line`)
  *   ├─ int-IVF/ADC indexes     [[IntIvfIndex.compact]]   (kind `intivf`)
  *   ├─ lexical index           [[Bm25Index.compact]]     (pointer-swapped
  *   │    fresh postings dir — no plan overwrites files it reads)
  *   └─ vector index            [[VectorIndex.compact]]   (rows re-cluster
  *        so each bucket lands contiguously)
  *
  * Indexes are reached through the tree-recorded registry
  * ([[Takedown.recordIndex]]) exactly like a takedown — the caller does
  * not have to remember what CurationJob materialized; explicit names
  * union in. Every leg is probe-identical before/after (each compact's
  * own contract, MaintenanceSpec pins them through the composed tree)
  * and individually idempotent, so re-running after a crash just
  * re-folds whatever is left. In-flight tombstones are APPLIED by the
  * fold (a compact subsumes the artifact's vacuum). Quiescent-tree
  * contract, like vacuum/scrub/repack: run on the operator's schedule
  * (e.g. weekly), never concurrently with an in-flight increment —
  * a staged-but-unapplied increment's index targets would go stale
  * against the reset pointers and fail loud in `appendAs`.
  *
  * Scale shape: each leg is one bounded rewrite of that index's
  * committed mass (never the corpus text), embarrassingly parallel
  * across legs, and the manifest/shards/evalh are NOT touched — those
  * only rewrite under [[Takedown.scrub]]/[[Takedown.repack]], which
  * compose freely with this.
  */
object Maintenance {
  /** One compacted artifact: physical parquet file count before/after
    * (the small-files metric the operation exists to bound). */
  final case class Compacted(kind: String, name: String,
      filesBefore: Long, filesAfter: Long)

  private def dataFiles(p: java.nio.file.Path): Long = {
    if (!java.nio.file.Files.exists(p)) 0L
    else {
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.walk(p)
      try s.iterator().asScala.count { f =>
        val n = f.getFileName.toString
        n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith(".")
      }
      finally s.close()
    }
  }

  private def tableFiles(spark: SparkSession, table: String): Long =
    if (!spark.catalog.tableExists(table)) 0L
    else dataFiles(CatalogCommit.tableLocation(spark, table))

  private def pathFiles(dir: String): Long =
    dataFiles(java.nio.file.Paths.get(dir))

  /** One artifact's physical layout: `batchParts` counts its `batch=`
    * partition dirs (0 for layouts without a batch axis), `files` its
    * parquet data files — the two quantities [[compact]] folds. */
  final case class Layout(kind: String, name: String,
      batchParts: Long, files: Long)

  private def batchDirCount(p: java.nio.file.Path): Long = {
    if (!java.nio.file.Files.exists(p)) 0L
    else {
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.list(p)
      try s.iterator().asScala
        .count(_.getFileName.toString.startsWith("batch="))
      finally s.close()
    }
  }

  /** READ-ONLY fragmentation audit of the tree — the "should I compact
    * yet?" signal, same artifact walk as [[compact]] with nothing
    * rewritten. An operator schedules the fold off these numbers (e.g.
    * any index past ~30 batch partitions), instead of either compacting
    * blindly every night or discovering the small-files tax in probe
    * latency. */
  def status(spark: SparkSession, outDir: String,
      shingleIndexes: Seq[String] = Nil,
      lineSegmentIndexes: Seq[String] = Nil,
      intIvfIndexes: Seq[String] = Nil,
      overlapIndexes: Seq[String] = Nil): Seq[Layout] = {
    def recorded(kind: String, explicit: Seq[String]): Seq[String] =
      (explicit ++ Takedown.recordedIndexes(outDir, kind)).distinct
    def table(kind: String, n: String) = Layout(kind, n,
      CatalogCommit.batchDirs(spark, n).size.toLong, tableFiles(spark, n))
    def dir(kind: String, n: String, batchRoot: Option[String]) = Layout(
      kind, n, batchRoot.map(r => batchDirCount(java.nio.file.Paths.get(r)))
        .getOrElse(0L), pathFiles(n))
    val bm25 = s"$outDir/bm25"
    val vectors = s"$outDir/vectors"
    recorded("shingle", shingleIndexes).map(table("shingle", _)) ++
      recorded("overlap", overlapIndexes).map(table("overlap", _)) ++
      recorded("line", lineSegmentIndexes).map(table("line", _)) ++
      recorded("intivf", intIvfIndexes).map(dir("intivf", _, None)) ++
      (if (java.nio.file.Files.exists(java.nio.file.Paths.get(bm25)))
        Seq(dir("bm25", bm25, Some(Bm25Index.postingsPath(bm25)))) else Nil) ++
      (if (java.nio.file.Files.exists(java.nio.file.Paths.get(vectors)))
        Seq(dir("vectors", vectors, None)) else Nil) ++
      Seq("curated", "evalh", "shards").flatMap { rel =>
        val d = s"$outDir/$rel"
        if (java.nio.file.Files.exists(java.nio.file.Paths.get(d)))
          Seq(dir(rel, d, None)) else Nil
      }
  }

  /** Compact every artifact of the tree (see header). Returns one
    * [[Compacted]] row per artifact touched, file counts before/after. */
  def compact(spark: SparkSession, outDir: String,
      shingleIndexes: Seq[String] = Nil,
      lineSegmentIndexes: Seq[String] = Nil,
      intIvfIndexes: Seq[String] = Nil,
      overlapIndexes: Seq[String] = Nil,
      buckets: Int = 32): Seq[Compacted] = {
    graft.GraftExtensions.register(spark)
    // Quiescent-tree op: drop cached plans before rewriting the tables
    // they may reference. A cached frame whose lineage reads a table
    // being overwritten is a live hazard — the CacheManager re-resolves
    // such plans mid-INSERT (recacheByPath) and finds the table dropped
    // (overwrite = drop + recreate), failing the unrelated write; and a
    // survivor would pin pre-compact data. Nothing legitimate holds
    // cached index lineage across a maintenance window.
    spark.catalog.clearCache()
    def recorded(kind: String, explicit: Seq[String]): Seq[String] =
      (explicit ++ Takedown.recordedIndexes(outDir, kind)).distinct
    val report = scala.collection.mutable.ArrayBuffer.empty[Compacted]
    def leg(kind: String, name: String, before: => Long, after: => Long)(
        run: => Unit): Unit = {
      val b = before; run; report += Compacted(kind, name, b, after)
    }
    for (n <- recorded("shingle", shingleIndexes))
      leg("shingle", n, tableFiles(spark, n), tableFiles(spark, n)) {
        ShingleIndex.compact(spark, n, buckets)
      }
    for (n <- recorded("overlap", overlapIndexes))
      leg("overlap", n, tableFiles(spark, n), tableFiles(spark, n)) {
        OverlapIndex.compact(spark, n, buckets)
      }
    for (n <- recorded("line", lineSegmentIndexes))
      leg("line", n, tableFiles(spark, n), tableFiles(spark, n)) {
        LineSegmentIndex.compact(spark, n, buckets)
      }
    for (n <- recorded("intivf", intIvfIndexes))
      leg("intivf", n, pathFiles(n), pathFiles(n)) {
        IntIvfIndex.compact(spark, n)
      }
    val bm25 = s"$outDir/bm25"
    if (java.nio.file.Files.exists(java.nio.file.Paths.get(bm25)))
      leg("bm25", bm25, pathFiles(bm25), pathFiles(bm25)) {
        Bm25Index.compact(spark, bm25)
      }
    val vectors = s"$outDir/vectors"
    if (java.nio.file.Files.exists(java.nio.file.Paths.get(vectors)))
      leg("vectors", vectors, pathFiles(vectors), pathFiles(vectors)) {
        VectorIndex.compact(spark, vectors)
      }
    // The flat parquet artifacts accumulate one file set per daily
    // APPEND (curated/evalh rows append; shards grow per-batch files
    // inside their hive dirs) and, unlike the indexes, had no
    // non-tombstone rewrite path at all — Takedown.scrub/repack only
    // fire on removals. These folds are ROW-IDENTICAL rewrites: the
    // manifest/evalh keep `added_batch` (the as-of provenance column —
    // collapsing it would rewrite history), shards keep (doc_id, shard,
    // offset) exactly (re-clustered one partition per shard dir), and
    // takedown tombstones are deliberately NOT applied here — masking
    // is the readers' job and erasure is scrub()'s, so compact stays
    // semantics-free. Same checkpoint-pinned in-place-overwrite
    // discipline as scrub's manifest rewrite.
    for (rel <- Seq("curated", "evalh")) {
      val d = s"$outDir/$rel"
      if (java.nio.file.Files.exists(java.nio.file.Paths.get(d)))
        leg(rel, d, pathFiles(d), pathFiles(d)) {
          val kept = spark.read.parquet(d).localCheckpoint(true)
          kept.coalesce(math.max(1, spark.sparkContext.defaultParallelism))
            .write.mode("overwrite").parquet(d)
        }
    }
    val shards = s"$outDir/shards"
    if (java.nio.file.Files.exists(java.nio.file.Paths.get(shards)))
      leg("shards", shards, pathFiles(shards), pathFiles(shards)) {
        val kept = spark.read.parquet(shards).localCheckpoint(true)
        kept.repartition(org.apache.spark.sql.functions.col("shard"))
          .write.mode("overwrite")
          .partitionBy("shard").parquet(shards)
      }
    report.toSeq
  }
}

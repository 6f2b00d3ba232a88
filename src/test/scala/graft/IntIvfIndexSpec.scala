package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{IntIvfIndex, IntegerKMeans}

/** The materialized integer-IVF index must (a) answer probes exactly as
  * the in-memory knn_ivf_int algebra does, (b) actually PRUNE — the scan
  * must carry the probed cells as PartitionFilters, reading only their
  * directories, and (c) honor the index-artifact deletion contract
  * (tombstone probe ≡ rebuilt-without, vacuum = physical absence with
  * probes unchanged). */
class IntIvfIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def pts = IntegerKMeans.quantize(
    Tables.load(spark, sf, "embeddings").filter(col("embedding").isNotNull))

  private def probeRows(dir: String, queries: org.apache.spark.sql.DataFrame) =
    IntIvfIndex.probe(spark, dir, queries, nprobe = 2, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

  test("probe equals the in-memory IVF computation on the same centroids") {
    val dir = Files.createTempDirectory("graft-ivf-").toString
    val p = pts.cache()
    val cents = IntIvfIndex.materialize(p, dir, k = 8, iters = 2)
    assert(IntIvfIndex.loadCentroids(spark, dir).map(_._1) == cents.map(_._1))
    val queries = p.filter(col("vec_id") < 10)
    // in-memory reference: the knn_ivf_int spelling on the same fit
    val cells = IntegerKMeans.assign(p, cents, keep = Seq("qv"))
    val qp = IntegerKMeans.probe(queries, cents, 2)
      .select(col("vec_id").as("query_id"), col("qv").as("qqv"), col("cluster"))
    val d2 = aggregate(zip_with(col("qqv"), col("qv"), (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, x) => acc + x)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("d2"), col("neighbor_id"))
    val expect = cells.join(broadcast(qp), Seq("cluster"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), d2.as("d2"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(probeRows(dir, queries) == expect)
    p.unpersist()
  }

  test("the probe scan carries the probed cells as PartitionFilters (partition-pruned read)") {
    val dir = Files.createTempDirectory("graft-ivf-").toString
    val p = pts.cache()
    IntIvfIndex.materialize(p, dir, k = 8, iters = 2)
    val plan = IntIvfIndex.probe(spark, dir, p.filter(col("vec_id") < 10), 2, 10)
      .queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator.find(l =>
      l.contains("PartitionFilters") && l.contains("cluster")).getOrElse("")
    assert(scanLine.contains("IN") || scanLine.contains("in("),
      s"probe scan must prune on the literal cell list:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"probe must broadcast:\n$plan")
    p.unpersist()
  }

  test("append(batch) ≡ materialize over corpus ∪ batch with the same centroids") {
    val dirA = Files.createTempDirectory("graft-ivf-").toString
    val dirB = Files.createTempDirectory("graft-ivf-").toString
    val p = pts.cache()
    val corpus = p.filter(col("vec_id") % 10 =!= 0)
    val batch = p.filter(col("vec_id") % 10 === 0)
    val cents = IntIvfIndex.materialize(corpus, dirA, k = 8, iters = 2)
    IntIvfIndex.append(spark, dirA, batch)
    IntIvfIndex.materialize(p, dirB, k = 8, iters = 2, cents = Some(cents))
    val queries = p.filter(col("vec_id") < 10)
    assert(probeRows(dirA, queries) == probeRows(dirB, queries))
    assert(probeRows(dirA, queries).nonEmpty)
    p.unpersist()
  }

  test("delete: probe ≡ index materialized without the docs; vacuum erases physically, probes unchanged") {
    import spark.implicits._
    val dirA = Files.createTempDirectory("graft-ivf-").toString
    val dirB = Files.createTempDirectory("graft-ivf-").toString
    val p = pts.cache()
    val cents = IntIvfIndex.materialize(p, dirA, k = 8, iters = 2)
    val removed = Seq(42L, 43L, 44L)
    // same centroids for the reference index: delete must not refit
    IntIvfIndex.materialize(p.filter(!col("vec_id").isin(removed: _*)), dirB,
      k = 8, iters = 2, cents = Some(cents))
    IntIvfIndex.delete(spark, dirA, removed.toDF("vec_id"))
    IntIvfIndex.delete(spark, dirA, removed.toDF("vec_id")) // idempotent
    val queries = p.filter(col("vec_id") < 10)
    val afterDelete = probeRows(dirA, queries)
    assert(afterDelete == probeRows(dirB, queries))
    assert(!afterDelete.exists(r => removed.contains(r._2)))
    IntIvfIndex.vacuum(spark, dirA)
    assert(probeRows(dirA, queries) == afterDelete)
    // physical absence + tombstones gone
    val rawIds = spark.read.parquet(dirA).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(removed.forall(!rawIds.contains(_)))
    assert(!Files.exists(java.nio.file.Paths.get(s"$dirA/_tombstones")))
    p.unpersist()
  }
}

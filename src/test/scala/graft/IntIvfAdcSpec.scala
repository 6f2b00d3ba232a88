package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{IntIvfIndex, IntegerKMeans}

/** The materialized IVFADC layout must (a) probe exactly as the
  * in-memory `knn_ivfadc_int` algebra (the battery query itself is the
  * reference — it is oracle-checked against DuckDB, so transitivity
  * makes the index cross-engine-exact too), (b) actually be the IVFADC
  * read path — the candidate scan partition-prunes to the probed cells
  * AND column-prunes to (vec_id, codes), never touching `qv` until the
  * shortlist re-rank, and (c) honor the index-artifact lifecycle
  * contracts (append ≡ rebuild under frozen centroids+codebooks,
  * delete ≡ rebuilt-without for ids outside the training prefix,
  * vacuum = physical erasure with probes unchanged). */
class IntIvfAdcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def pts = IntegerKMeans.quantize(
    Tables.load(spark, sf, "embeddings").filter(col("embedding").isNotNull))

  private def probeRows(dir: String, queries: org.apache.spark.sql.DataFrame) =
    IntIvfIndex.probeAdc(spark, dir, queries, nprobe = 2, k = 10, shortlist = 80)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

  test("probeAdc equals the oracle-checked knn_ivfadc_int battery query") {
    val dir = Files.createTempDirectory("graft-ivfadc-").toString
    val p = pts.cache()
    // battery-query geometry: coarse 8×2, PQ 8×16×4 on prefix 512,
    // nprobe 2, shortlist 80, k 10
    IntIvfIndex.materializeAdc(p, dir, k = 8, iters = 2,
      mMax = 8, kc = 16, pqIters = 4, trainN = 512)
    val got = probeRows(dir, p.filter(col("vec_id") < 10))
    val expect = SparkEntry.queries("knn_ivfadc_int")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expect)
    assert(got.nonEmpty)
    p.unpersist()
  }

  test("Reader.probeAdc (preloaded serving handle) ≡ per-call probeAdc, tombstones still live") {
    val dir = Files.createTempDirectory("graft-ivfadc-").toString
    val p = pts.cache()
    IntIvfIndex.materializeAdc(p, dir, k = 8, iters = 2,
      mMax = 8, kc = 16, pqIters = 4, trainN = 512)
    val queries = p.filter(col("vec_id") < 10)
    val rd = IntIvfIndex.reader(spark, dir)
    def rdRows(q: org.apache.spark.sql.DataFrame) =
      rd.probeAdc(q, nprobe = 2, k = 10, shortlist = 80)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val viaReader = rdRows(queries)
    assert(viaReader == probeRows(dir, queries) && viaReader.nonEmpty)
    // a delete AFTER reader construction must be visible without a reload
    // (the mask is per-probe). Any served neighbor works as the victim:
    // both sides of the equality apply the same tombstone mask, so the
    // training-prefix caveat of the rebuilt-without pin doesn't bind here.
    val victim = viaReader.map(_._2).min
    import spark.implicits._
    IntIvfIndex.delete(spark, dir, Seq(victim).toDF("vec_id"))
    val after = rdRows(queries)
    assert(!after.exists(_._2 == victim))
    assert(after == probeRows(dir, queries))
    p.unpersist()
  }

  test("ADC candidate scan is partition-pruned AND column-pruned (no qv before the re-rank)") {
    val dir = Files.createTempDirectory("graft-ivfadc-").toString
    val p = pts.cache()
    IntIvfIndex.materializeAdc(p, dir, k = 8, iters = 2,
      mMax = 8, kc = 16, pqIters = 4, trainN = 512)
    val plan = IntIvfIndex.probeAdc(spark, dir, p.filter(col("vec_id") < 10), 2, 10, 80)
      .queryExecution.executedPlan.toString
    val scans = plan.linesIterator.filter(_.contains("ReadSchema")).toSeq
    val codesScans = scans.filter(_.contains("codes"))
    assert(codesScans.nonEmpty, s"no codes scan found:\n$plan")
    codesScans.foreach { l =>
      assert(!l.contains("qv"),
        s"the ADC candidate scan must not read qv (column pruning is the M-bytes-per-vector claim):\n$l")
      assert(l.contains("IN") || l.contains("in("),
        s"the ADC candidate scan must prune on the literal cell list:\n$l")
    }
    // the re-rank scan reads qv but still only the probed cells
    val qvScans = scans.filter(l => l.contains("qv") && !l.contains("codes"))
    assert(qvScans.nonEmpty && qvScans.forall(l => l.contains("IN") || l.contains("in(")),
      s"re-rank scan must stay partition-pruned:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"probe must broadcast:\n$plan")
    p.unpersist()
  }

  test("filtered probeAdc (allowed selector) ≡ probe of an index built on only the allowed subset") {
    import spark.implicits._
    val dirA = Files.createTempDirectory("graft-ivfadc-").toString
    val dirB = Files.createTempDirectory("graft-ivfadc-").toString
    val p = pts.cache()
    // allowed set holds the whole training prefix, so the subset index
    // trains the identical codebooks (the delete-pin precondition)
    val cents = IntIvfIndex.materializeAdc(p, dirA, k = 8, iters = 2,
      mMax = 8, kc = 16, pqIters = 4, trainN = 64)
    val allowed = p.filter($"vec_id" < 64 || $"vec_id" % 3 === 0).select($"vec_id")
    IntIvfIndex.materializeAdc(p.join(allowed, Seq("vec_id"), "left_semi"), dirB,
      k = 8, iters = 2, mMax = 8, kc = 16, pqIters = 4, trainN = 64,
      cents = Some(cents))
    val queries = p.filter(col("vec_id") < 10)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val filtered = rows(IntIvfIndex.probeAdc(spark, dirA, queries, 2, 10, 80,
      allowed = Some(allowed)))
    val subset = rows(IntIvfIndex.probeAdc(spark, dirB, queries, 2, 10, 80))
    assert(filtered == subset)
    assert(filtered.nonEmpty)
    // the selector BINDS: unfiltered probe differs
    assert(filtered != probeRows(dirA, queries), "vacuous: filter excluded nothing")
    p.unpersist()
  }

  test("append(batch) ≡ materializeAdc over corpus ∪ batch (frozen centroids, prefix-disjoint batch)") {
    val dirA = Files.createTempDirectory("graft-ivfadc-").toString
    val dirB = Files.createTempDirectory("graft-ivfadc-").toString
    val p = pts.cache()
    // training prefix (ids < 64) fully inside day0 — the append ≡ rebuild
    // precondition: both sides train codebooks on the identical sample
    val corpus = p.filter(col("vec_id") < 64 || col("vec_id") % 3 =!= 0)
    val batch = p.filter(col("vec_id") >= 64 && col("vec_id") % 3 === 0)
    val cents = IntIvfIndex.materializeAdc(corpus, dirA, k = 8, iters = 2,
      mMax = 8, kc = 16, pqIters = 4, trainN = 64)
    IntIvfIndex.append(spark, dirA, batch)
    IntIvfIndex.materializeAdc(p, dirB, k = 8, iters = 2,
      mMax = 8, kc = 16, pqIters = 4, trainN = 64, cents = Some(cents))
    val queries = p.filter(col("vec_id") < 10)
    assert(probeRows(dirA, queries) == probeRows(dirB, queries))
    assert(probeRows(dirA, queries).nonEmpty)
    p.unpersist()
  }

  test("delete: probeAdc ≡ index rebuilt without the docs; vacuum erases physically, probes and codebooks unchanged") {
    import spark.implicits._
    val dirA = Files.createTempDirectory("graft-ivfadc-").toString
    val dirB = Files.createTempDirectory("graft-ivfadc-").toString
    val p = pts.cache()
    val cents = IntIvfIndex.materializeAdc(p, dirA, k = 8, iters = 2,
      mMax = 8, kc = 16, pqIters = 4, trainN = 64)
    // removed ids sit OUTSIDE the training prefix: quantization artifacts
    // mask on delete, they never retrain (the Bm25 doctrine), so the
    // rebuilt-without reference trains the same codebooks
    val removed = Seq(142L, 143L, 144L)
    IntIvfIndex.materializeAdc(p.filter(!col("vec_id").isin(removed: _*)), dirB,
      k = 8, iters = 2, mMax = 8, kc = 16, pqIters = 4, trainN = 64,
      cents = Some(cents))
    IntIvfIndex.delete(spark, dirA, removed.toDF("vec_id"))
    IntIvfIndex.delete(spark, dirA, removed.toDF("vec_id")) // idempotent
    val queries = p.filter(col("vec_id") < 10)
    val afterDelete = probeRows(dirA, queries)
    assert(afterDelete == probeRows(dirB, queries))
    assert(!afterDelete.exists(r => removed.contains(r._2)))
    val pqBefore = IntIvfIndex.loadPq(spark, dirA)
    IntIvfIndex.vacuum(spark, dirA)
    assert(probeRows(dirA, queries) == afterDelete)
    val pqAfter = IntIvfIndex.loadPq(spark, dirA)
    assert(pqBefore._2 == pqAfter._2 && pqBefore._3 == pqAfter._3 &&
      pqBefore._1.map(_.map { case (c, v) => (c, v.toSeq) }) ==
        pqAfter._1.map(_.map { case (c, v) => (c, v.toSeq) }),
      "vacuum must preserve the persisted codebooks verbatim")
    val rawIds = spark.read.parquet(dirA).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(removed.forall(!rawIds.contains(_)))
    assert(!Files.exists(java.nio.file.Paths.get(s"$dirA/_tombstones")))
    p.unpersist()
  }
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.VectorIndex
import graft.queries.CrossHash

/** The materialized LSH-partitioned vector layout: probes must prune to
  * the queries' bucket partitions (file-level, not post-scan) and return
  * exactly the in-memory bucketed top-k. */
class VectorIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  private val Bits = 4

  test("probe prunes to the query buckets and equals the in-memory bucketed top-k") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val path = Files.createTempDirectory("graft-vecidx-").toString
    val vecs = Tables.load(spark, dir, "embeddings").select($"vec_id", $"embedding")
    VectorIndex.materialize(vecs, path, bits = Bits)

    // partition layout exists
    val dirs = new java.io.File(path).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("bucket=")), dirs.toSeq)

    val queries = vecs.filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"embedding")
    val got = VectorIndex.probe(spark, path, queries, k = 3, bits = Bits)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet

    // file-level pruning: the filtered corpus reads strictly fewer files
    // than the full table (unless every bucket is probed — not the case
    // with 5 queries over 16 buckets)
    val planes = CrossHash.embPlanesFor(1, Bits, 64)
    def bucketOf(v: Array[Double]): Long =
      (0 until Bits).map { j =>
        val dot = v.zip(planes(j)).map { case (x, p) => x * p }.sum
        if (dot > 0) 1L << j else 0L
      }.sum
    val qBuckets = queries.select($"embedding".cast("array<double>")).as[Array[Double]]
      .collect().map(bucketOf).toSet
    assert(qBuckets.size < dirs.length, "every bucket probed — pruning unobservable")
    val all = spark.read.parquet(path)
    val prunedFiles = TestSpark.filesRead(all.filter($"bucket".isin(qBuckets.toSeq: _*)))
    val allFiles = TestSpark.filesRead(all)
    assert(prunedFiles < allFiles,
      s"no file-level pruning: $prunedFiles vs $allFiles")

    // equality with the in-memory bucketed spelling
    val e = vecs.select($"vec_id", $"embedding".cast("array<double>").as("v"))
      .as[(Long, Array[Double])].collect()
    val byBucket = e.groupBy { case (_, v) => bucketOf(v) }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val expected = (for {
      (qid, qv) <- e.filter(_._1 < 5)
      mates = byBucket(bucketOf(qv))
      ranked = mates.map { case (nid, nv) => (nid, cos(qv, nv)) }
        .sortBy { case (nid, c) => (-c, nid) }
      ((nid, c), i) <- ranked.zipWithIndex.take(3)
    } yield (qid, (i + 1).toLong, nid, c)).toSet
    // the probe does not exclude self-matches (rank 1 is the query itself,
    // cosine 1.0) — neither does the expected spelling
    assert(expected.nonEmpty)
    assert(got.map(t => (t._1, t._2, t._3)) == expected.map(t => (t._1, t._2, t._3)),
      s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")

    // multi-probe: flipping the smallest-margin planes widens each query's
    // candidate set, so recall vs the exact brute-force top-k can only
    // grow — and it must equal the in-memory multi-probe spelling
    def dotOf(a: Array[Double], p: IndexedSeq[Int]): Double =
      a.zip(p).map { case (x, s) => x * s }.sum
    def probeSet(qv: Array[Double], nprobe: Int): Set[Long] = {
      val base = bucketOf(qv)
      val margins = (0 until Bits).map(j => j -> math.abs(dotOf(qv, planes(j)))).sortBy(_._2)
      (base +: margins.take(nprobe - 1).map { case (j, _) => base ^ (1L << j) }).toSet
    }
    val got3 = VectorIndex.probe(spark, path, queries, k = 3, bits = Bits, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val expected3 = (for {
      (qid, qv) <- e.filter(_._1 < 5)
      mates = probeSet(qv, 3).toSeq.flatMap(b => byBucket.getOrElse(b, Array.empty[(Long, Array[Double])]))
      ((nid, _), i) <- mates.map { case (nid, nv) => (nid, cos(qv, nv)) }
        .sortBy { case (nid, c) => (-c, nid) }.zipWithIndex.take(3)
    } yield (qid, (i + 1).toLong, nid)).toSet
    assert(got3 == expected3,
      s"missing=${(expected3 -- got3).take(5)} extra=${(got3 -- expected3).take(5)}")
    // recall vs exact brute top-3 is monotone in nprobe
    val brute = (for {
      (qid, qv) <- e.filter(_._1 < 5)
      ((nid, _), i) <- e.map { case (nid, nv) => (nid, cos(qv, nv)) }
        .sortBy { case (nid, c) => (-c, nid) }.zipWithIndex.take(3)
    } yield (qid, nid)).toSet
    def recall(s: Set[(Long, Long, Long)]) =
      s.map(t => (t._1, t._3)).intersect(brute).size.toDouble / brute.size
    assert(recall(got3) >= recall(got.map(t => (t._1, t._2, t._3))),
      "multi-probe recall must not drop below single-probe")
    spark.catalog.clearCache()
  }

  test("filtered probe: every hit satisfies the predicate, ranking equals the filter-then-rank spelling, pruning intact") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val path = Files.createTempDirectory("graft-vecidxf-").toString
    val vecs = Tables.load(spark, dir, "embeddings").select($"vec_id", $"embedding")
    VectorIndex.materialize(vecs, path, bits = Bits)
    val queries = vecs.filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"embedding")
    // the allowed set stands in for a metadata predicate resolved in the
    // document store (knn_filtered's lang filter): here, even ids
    val allowed = vecs.select($"vec_id").filter($"vec_id" % 2 === 0)
    val got = VectorIndex.probeFiltered(spark, path, queries, allowed, k = 3, bits = Bits)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got.nonEmpty)
    assert(got.forall(_._3 % 2 == 0), s"unfiltered hits: ${got.filter(_._3 % 2 != 0).take(5)}")

    // equality with the in-memory filter-then-rank spelling over the
    // probed bucket's candidates
    val planes = CrossHash.embPlanesFor(1, Bits, 64)
    def bucketOf(v: Array[Double]): Long =
      (0 until Bits).map { j =>
        val dot = v.zip(planes(j)).map { case (x, p) => x * p }.sum
        if (dot > 0) 1L << j else 0L
      }.sum
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val e = vecs.select($"vec_id", $"embedding".cast("array<double>").as("v"))
      .as[(Long, Array[Double])].collect()
    val byBucket = e.groupBy { case (_, v) => bucketOf(v) }
    val expected = (for {
      (qid, qv) <- e.filter(_._1 < 5)
      mates = byBucket(bucketOf(qv)).filter(_._1 % 2 == 0)
      ((nid, c), i) <- mates.map { case (nid, nv) => (nid, cos(qv, nv)) }
        .sortBy { case (nid, c) => (-c, nid) }.zipWithIndex.take(3)
    } yield (qid, (i + 1).toLong, nid)).toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
    spark.catalog.clearCache()
  }

  test("PQ index: codes-only hot table prunes to probed buckets; exact re-ranked cosines; recall pinned vs raw probe") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val path = Files.createTempDirectory("graft-pqidx-").toString
    val vecs = Tables.load(spark, dir, "embeddings").select($"vec_id", $"embedding")
    VectorIndex.materializePq(vecs, path, bits = Bits)

    // layout: codebook artifact + bucket-partitioned codes + raw
    val codeDirs = new java.io.File(s"$path/codes").listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(codeDirs.nonEmpty && codeDirs.forall(_.startsWith("bucket=")), codeDirs.toSeq)
    val cb = graft.operators.PqCodebook.load(spark, s"$path/codebook")
    assert(cb.nonEmpty && cb.forall(_.nonEmpty))

    val queries = vecs.filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"embedding")
    val got = VectorIndex.probePq(spark, path, queries, k = 3, bits = Bits, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.nonEmpty)

    // the hot-table scan prunes files (codes partitions outside the probe
    // set are never read)
    val all = spark.read.parquet(s"$path/codes")
    val planes = CrossHash.embPlanesFor(1, Bits, 64)
    def bucketOf(v: Array[Double]): Long =
      (0 until Bits).map { j =>
        val dot = v.zip(planes(j)).map { case (x, p) => x * p }.sum
        if (dot > 0) 1L << j else 0L
      }.sum
    val qv = queries.select($"embedding".cast("array<double>")).as[Array[Double]].collect()
    val qBuckets = qv.map(bucketOf).toSet
    assert(qBuckets.size < codeDirs.length, "every bucket probed — pruning unobservable")

    // emitted cosines are EXACT (re-ranked against raw), never ADC approx
    val e = vecs.select($"vec_id", $"embedding".cast("array<double>").as("v"))
      .as[(Long, Array[Double])].collect().toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    got.foreach { case (q, _, n, c) =>
      assert(math.abs(cos(e(q), e(n)) - c) < 1e-12, s"cosine not exact at ($q,$n)")
    }

    // PQ loss only narrows the shortlist: recall@3 vs the raw-index probe
    // at the same nprobe (deterministic codebooks ⇒ a regression pin, not
    // a flaky bound; measured 1.0 at sf0.001 with shortlist=20)
    val rawPath = Files.createTempDirectory("graft-rawidx-").toString
    VectorIndex.materialize(vecs, rawPath, bits = Bits)
    val rawGot = VectorIndex.probe(spark, rawPath, queries, k = 3, bits = Bits, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val pqPairs = got.map(t => (t._1, t._3)).toSet
    val recallVsRaw = pqPairs.intersect(rawGot).size.toDouble / rawGot.size
    assert(recallVsRaw >= 0.8, f"PQ recall vs raw probe = $recallVsRaw%.2f")
    spark.catalog.clearCache()
  }

  test("delete: probes equal a rebuild on the remaining vectors; PQ refills the shortlist; vacuum preserves and clears") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val idx = Files.createTempDirectory("graft-vecdel-").toString
    val ref = Files.createTempDirectory("graft-vecrem-").toString
    val vecs = Tables.load(spark, dir, "embeddings").select($"vec_id", $"embedding")
    VectorIndex.materialize(vecs, idx, bits = Bits)
    VectorIndex.materialize(vecs.filter($"vec_id" % 5 =!= 0), ref, bits = Bits)

    val deleted = vecs.filter($"vec_id" % 5 === 0).select($"vec_id")
    VectorIndex.delete(spark, idx, deleted)
    val queries = vecs.filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"embedding")
    def hits(path: String) =
      VectorIndex.probe(spark, path, queries, k = 3, bits = Bits, nprobe = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val expected = hits(ref)
    assert(expected.nonEmpty, "no ANN hits — test would be vacuous")
    // ranks REFILL with the next candidates, exactly as a rebuild's would
    assert(hits(idx) == expected, "deleted probe != rebuild on remaining")

    // filtered probe composes with the mask
    val allowed = vecs.filter($"vec_id" % 2 === 0).select($"vec_id")
    def fhits(path: String) =
      VectorIndex.probeFiltered(spark, path, queries, allowed, k = 3, bits = Bits)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(fhits(idx) == fhits(ref), "filtered probe diverges after delete")

    // PQ: deleted ids vanish from results and the shortlist refills to k
    // (a rebuild retrains codebooks, so the pin is exclusion + refill,
    // not set equality)
    val pq = Files.createTempDirectory("graft-vecdelpq-").toString
    VectorIndex.materializePq(vecs, pq, bits = Bits)
    VectorIndex.delete(spark, pq, deleted)
    val delSet = deleted.as[Long].collect().toSet
    val pqGot = VectorIndex.probePq(spark, pq, queries, k = 3, bits = Bits, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pqGot.nonEmpty && pqGot.forall(t => !delSet(t._3)),
      s"deleted id surfaced in PQ probe: ${pqGot.filter(t => delSet(t._3))}")
    assert(pqGot.groupBy(_._1).values.forall(_.size == 3),
      "PQ shortlist did not refill to k after delete")

    // idempotent double-delete + never-indexed id, then vacuum
    VectorIndex.delete(spark, idx, deleted.union(Seq(999999L).toDF("vec_id")))
    assert(hits(idx) == expected, "repeated delete mutated the index")
    VectorIndex.vacuum(spark, idx)
    assert(hits(idx) == expected, "vacuum changed probe results")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"${idx}_tombstones")), "tombstones not cleared")

    // PQ vacuum: probes identical across it (codebook untouched ⇒ exact
    // ADC-score equality, not just exclusion), tombstones cleared, and the
    // removed ids physically absent from BOTH derived tables
    VectorIndex.vacuumPq(spark, pq)
    val pqAfter = VectorIndex.probePq(spark, pq, queries, k = 3, bits = Bits, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pqAfter == pqGot, "vacuumPq changed PQ probe results")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"${pq}_tombstones")), "PQ tombstones not cleared")
    val codeIds = spark.read.parquet(s"$pq/codes").select($"vec_id").as[Long].collect().toSet
    val rawIds = spark.read.parquet(s"$pq/raw").select($"vec_id").as[Long].collect().toSet
    assert(codeIds.intersect(delSet).isEmpty, "removed ids survive in codes")
    assert(rawIds.intersect(delSet).isEmpty, "removed ids survive in raw")
    assert(codeIds == rawIds && codeIds.nonEmpty, "codes/raw id sets diverged")
    spark.catalog.clearCache()
  }

  test("evaluate: metrics equal a driver-side recall/MRR computation; multi-probe never hurts; masked eval == rebuilt eval") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val path = Files.createTempDirectory("graft-veceval-").toString
    val vecs = Tables.load(spark, dir, "embeddings").select($"vec_id", $"embedding")
    VectorIndex.materialize(vecs, path, bits = Bits)
    val queries = vecs.filter($"vec_id" < 8)
      .select($"vec_id".as("query_id"), $"embedding")
    val k = 3

    def metrics(p: String, nprobe: Int) =
      VectorIndex.evaluate(spark, p, queries, k, bits = Bits, nprobe = nprobe)
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toMap

    val got = metrics(path, 1)
    // driver-side reference from the probe and an exact truth scan
    val run = VectorIndex.probe(spark, path, queries, k, bits = Bits)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(1)))
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(t => t._2 -> t._3).toMap }
    val all = vecs.select($"vec_id", $"embedding".cast("array<double>")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map(t => t._1 * t._2).sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    for (qid <- got.keys) {
      val qv = all(qid)
      val truth = all.toSeq.filter(_._1 != qid)
        .map { case (id, v) => (id, cos(qv, v)) }
        .sortBy { case (id, c) => (-c, id) }.take(k).map(_._1)
      val hits = run.getOrElse(qid, Map.empty)
      val nHit = truth.count(hits.contains)
      val firstHit = truth.filter(hits.contains).map(hits).sorted.headOption
      val (nT, nH, recall, rr) = got(qid)
      assert(nT == truth.size.toLong && nH == nHit.toLong, s"q$qid counts")
      assert(recall == nHit.toLong * 1000000L / truth.size, s"q$qid recall")
      assert(rr == firstHit.map(1000000L / _).getOrElse(0L), s"q$qid rr")
    }
    // multi-probe recall is monotone non-decreasing per query
    val multi = metrics(path, 3)
    assert(got.keys.forall(q => multi(q)._3 >= got(q)._3),
      "multi-probe lowered recall for a query")

    // eval of a masked (deleted) index == eval of a rebuilt-remaining one
    val refp = Files.createTempDirectory("graft-vecevalr-").toString
    VectorIndex.materialize(vecs.filter($"vec_id" % 7 =!= 0), refp, bits = Bits)
    VectorIndex.delete(spark, path, vecs.filter($"vec_id" % 7 === 0).select($"vec_id"))
    val evalQueries = queries.filter($"query_id" % 7 =!= 0)
    val maskedEval = VectorIndex.evaluate(spark, path, evalQueries, k, bits = Bits)
      .collect().map(_.toSeq).toSet
    val rebuiltEval = VectorIndex.evaluate(spark, refp, evalQueries, k, bits = Bits)
      .collect().map(_.toSeq).toSet
    assert(maskedEval == rebuiltEval, "masked eval != rebuilt-remaining eval")
    spark.catalog.clearCache()
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** ANN quality: the bucketed variants are approximations of knn_brute —
  * assert they return well-formed rankings and nonzero overlap with the
  * exact top-k (the planted structure is weak, so thresholds are loose;
  * the exact result sets themselves are oracle-checked by the driver). */
class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def resultSet(name: String): Map[(Long, Long), Long] =
    queries.SimilarityQueries.queries(name)(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) -> r.getAs[Long]("rnk"))
      .toMap

  test("knn_self_topk at a second geometry (6 bits): equals the within-bucket exact top-3 (independent spelling)") {
    // the bucket width is a corpus-size knob (the registered query
    // auto-sizes via CrossHash.semGeometryFor, which reproduces 4 bits at
    // gate scale where the static oracle lives) — pin a NON-default width
    // against a driver-side brute force so the parameterization stays
    // correct at every width the rule can pick. Planes re-derived here
    // from the md5 formula (independent of hyperplanesFor).
    val bits = 6
    val vs = Tables.load(spark, dir, "embeddings").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray)
    val planes = (0 until bits).map { j =>
      (0 until vs.head._2.length).map { d =>
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(s"${j}_$d".getBytes("UTF-8"))
        if ((md(0) & 1) == 0) 1.0 else -1.0
      }
    }
    def dot(a: Array[Double], b: Seq[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def bucket(v: Array[Double]): Long =
      (0 until bits).map(j => if (dot(v, planes(j)) > 0) 1L << j else 0L).sum
    val byBucket = vs.groupBy { case (_, v) => bucket(v) }
    val expected = byBucket.values.toSeq.flatMap { members =>
      members.toSeq.flatMap { case (qid, qv) =>
        val qnrm = math.sqrt(dot(qv, qv.toSeq))
        members.toSeq.filter(_._1 != qid)
          .map { case (nid, nv) =>
            (qid, nid, dot(qv, nv.toSeq) / (qnrm * math.sqrt(dot(nv, nv.toSeq)))) }
          .sortBy { case (_, nid, cos) => (-cos, nid) }
          .take(3).zipWithIndex
          .map { case ((q, n, c), i) => (q, (i + 1).toLong, n, c) }
      }
    }.toSet
    val got = queries.SimilarityQueries.selfTopK(spark, dir, bits = bits)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(expected.nonEmpty, "vacuous: no bucket-mates at 6 bits")
    assert(got == expected,
      s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
    spark.catalog.clearCache()
  }

  test("brute-force top-k is a dense ranking per query") {
    val brute = resultSet("knn_brute")
    val perQuery = brute.keys.groupBy(_._1)
    assert(perQuery.size == 10)
    perQuery.foreach { case (q, pairs) =>
      val ranks = pairs.map(brute).toSeq.sorted
      assert(ranks == (1L to pairs.size), s"dense ranks for query $q")
    }
  }

  test("ivf/kmeans/lsh probes return subsets consistent with their buckets") {
    val brute = resultSet("knn_brute").keySet
    Seq("knn_ivf", "knn_lsh", "knn_ivf_kmeans").foreach { name =>
      val approx = resultSet(name)
      assert(approx.nonEmpty, s"$name returned rows")
      // every approximate neighbor must also exist as SOME brute pair
      // universe member (sanity: ids in range, no self-pairs)
      approx.keys.foreach { case (q, n) =>
        assert(q != n, s"$name produced a self-pair")
        assert(q < 10 && n >= 0)
      }
      val overlap = approx.keySet.intersect(brute).size
      assert(overlap > 0, s"$name shares no pairs with exact top-k")
    }
  }

  test("IVF-PQ: exact-cosine output, recall@10 >= 0.7 vs the exact in-cell top-k (isolates PQ loss)") {
    // knn_ivf is the EXACT within-label-cell top-k, so comparing against
    // it isolates what the PQ code + ADC shortlist lose (cell assignment
    // is identical); measured 0.82 at sf0.001 with M=8, Kc=16,
    // shortlist=2k — fully deterministic (driver-side Lloyd, fixed init),
    // so the floor is a regression pin. The emitted cosines must be exact
    // (re-ranked against raw vectors): any pair PQ shares with knn_ivf
    // must carry the identical double.
    val ivfCos = queries.SimilarityQueries.queries("knn_ivf")(spark, dir).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) -> r.getAs[Double]("cosine"))
      .toMap
    val pqCos = queries.SimilarityQueries.queries("knn_ivfpq")(spark, dir).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) -> r.getAs[Double]("cosine"))
      .toMap
    val shared = pqCos.keySet.intersect(ivfCos.keySet)
    val recall = shared.size.toDouble / ivfCos.size
    assert(recall >= 0.7, f"recall@10 vs exact in-cell = $recall%.2f")
    shared.foreach(k => assert(pqCos(k) == ivfCos(k), s"re-ranked cosine differs at $k"))
    spark.catalog.clearCache()
  }

  test("trained IVF multi-probe recall@10 >= 0.6 vs exact top-k (deterministic seed)") {
    val brute = resultSet("knn_brute").keySet
    val ivf = resultSet("knn_ivf_kmeans").keySet
    val recall = ivf.intersect(brute).size.toDouble / brute.size
    // measured 0.67 at sf0.001 with k=16, nprobe=4, seed=42 — everything
    // deterministic, so the floor is a regression pin, not a flaky bound
    assert(recall >= 0.6, f"recall@10 = $recall%.2f")
  }

  test("retrieve_mmr: valid greedy trace, diversity actually binds, one exchange after candidates") {
    import org.apache.spark.sql.functions._
    val df = queries.SimilarityQueries.queries("retrieve_mmr")(spark, dir)
    val rows = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rnk"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("rel")))
    val byQ = rows.groupBy(_._1)
    assert(byQ.size == 10)
    // integer relevance order per query from the exact dot products
    val pts = graft.operators.IntegerKMeans.quantize(
      Tables.load(spark, dir, "embeddings").filter(col("embedding").isNotNull)).cache()
    val q = pts.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("qv").as("qqv"))
    val rel = aggregate(zip_with(col("qqv"), col("qv"), (a, b) => a * b),
      lit(0L), (acc, x) => acc + x)
    val relRows = pts.crossJoin(broadcast(q)).filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("id"), rel.as("rel"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    var diverged = false
    for ((qid, picks) <- byQ) {
      val ordered = picks.sortBy(_._2)
      assert(ordered.map(_._2).toSeq == (1L to picks.length), s"dense rnk for query $qid")
      assert(ordered.map(_._3).distinct.length == picks.length, s"duplicate pick for $qid")
      // first pick IS the relevance argmax (ties to lowest id)
      val best = relRows.filter(_._1._1 == qid).toSeq.map { case ((_, id), r) => (-r, id) }.min
      assert(ordered.head._3 == best._2, s"first MMR pick != argmax rel for $qid")
      assert(ordered.head._4 == -best._1)
      // rel column carries the true dot product for every pick
      ordered.foreach { case (_, _, id, r) => assert(relRows((qid, id)) == r) }
      // diversity must bind somewhere: picks 2..k not the pure rel order
      val topByRel = relRows.filter(_._1._1 == qid).toSeq
        .map { case ((_, id), r) => (-r, id) }.sorted.take(picks.length).map(_._2)
      if (ordered.map(_._3).toSeq != topByRel) diverged = true
    }
    assert(diverged, "vacuous: MMR equals pure relevance ranking on every query")
    // one shuffle: the window and the groupBy share the query_id hash
    // partitioning, and the greedy itself is a projection — so the whole
    // selection costs the candidate top-N exchange and nothing more
    val full = df.queryExecution.executedPlan.toString
    val p = full.split("== Initial Plan ==")(0) // AQE echoes the pre-AQE plan below
    val nEx = "(?m)^[^\\n]*\\bExchange hashpartitioning".r.findAllIn(p).size
    assert(nEx <= 1, s"MMR plan re-shuffles after the candidate pass:\n$p")
    spark.catalog.clearCache()
  }
}

package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** The registered queries must SURVIVE adversarial inputs — empty and
  * sub-3-token documents, punctuation-only text, zero embedding vectors,
  * singleton event types, same-timestamp events — under Spark 4's default
  * ANSI mode (where an unguarded /0 or out-of-bounds element_at aborts the
  * job). The DuckDB cross-check of the same corpus lives in
  * tools/make_edge_corpus.py + local_verify; this spec keeps the guards
  * enforced in plain CI. */
class EdgeCorpusSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val dir: String = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-edge-").toString
    Seq(
      (0L, "", "en", "web", 0L),
      (1L, "one", "en", "web", 3L),
      (2L, "one two", "en", "web", 7L),
      (3L, "a b c", "en", "web", 5L),
      (4L, "的 是 了", "zh", "web", 5L),
      (5L, "!!! ??? ...", "en", "web", 11L),
      (6L, "the quick brown fox jumps over the lazy dog again and again", "en", "books", 60L),
      (7L, "the quick brown fox jumps over the lazy dog again and again", "en", "books", 60L),
      (8L, "der die und das ein zwei drei vier", "de", "web", 34L),
      (9L, "   ", "en", "web", 3L),
      (10L, null, "en", "web", 0L)) // NULL text — dirty-crawl reality
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    Seq(
      (0L, Array(0f, 0f, 0f, 0f), 0),
      (1L, Array(1f, 2f, 3f, 4f), 1),
      (2L, Array(1f, 2f, 3f, 4.1f), 1),
      (3L, Array(-1f, 0.5f, 2f, 0f), 0),
      (4L, Array(0.1f, 0.1f, 0.1f, 0.1f), 1),
      (5L, null, 0)) // NULL embedding — a failed encoder output
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$d/embeddings.parquet")
    locally {
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types._
      def ts(s: String) = java.sql.Timestamp.valueOf(s)
      val rows = java.util.Arrays.asList(
        Row(1L, ts("2024-01-01 00:00:00"), 1L, "click", 10.0, """{"k": 60}"""),
        Row(2L, ts("2024-01-01 00:00:00"), 1L, "click", 10.0, """{"k": 1}"""),
        Row(3L, ts("2024-01-01 01:00:00"), 1L, "singleton", 5.0, "{}"),
        Row(4L, ts("2024-01-01 02:00:00"), 2L, "click", 10.0, "{}"),
        Row(5L, ts("2024-01-01 02:00:00"), 2L, "click", 10.0, "{}"),
        Row(6L, ts("2024-01-02 00:00:00"), 2L, "view", 7.5, "{}"),
        // dirty-stream rows: NULL type/value/props and an epoch-extreme ts
        Row(7L, ts("2024-01-02 00:00:01"), 3L, null, null, null),
        Row(8L, ts("1970-01-01 00:00:00"), 3L, "click", -1e15, "not json"),
        // a type whose EVERY row has NULL user and NULL value — the
        // all-null group that empties sketch buffers and sums
        Row(9L, ts("2024-01-02 01:00:00"), null, "ghost", null, "{}"),
        Row(10L, ts("2024-01-02 01:00:01"), null, "ghost", null, "{}"))
      val schema = StructType(Seq(
        StructField("event_id", LongType, nullable = false),
        StructField("ts", TimestampType, nullable = false),
        StructField("user_id", LongType, nullable = true),
        StructField("event_type", StringType, nullable = true),
        StructField("value", DoubleType, nullable = true),
        StructField("props", StringType, nullable = true)))
      spark.createDataFrame(rows, schema).write.parquet(s"$d/events.parquet")
    }
    d
  }

  test("every documents/embeddings/events query survives the edge corpus (no ANSI aborts)") {
    // queries over TPC-H tables are out of scope (those tables don't
    // exist here); knn_lsh's hyperplanes assume 64-dim embeddings
    val applicable = SparkEntry.queries.keys.filter(n =>
      (n.startsWith("text_") || n.startsWith("dedup_") || n.startsWith("mm_") ||
        n.startsWith("ev_") || n.startsWith("knn_") || n.startsWith("sim_") ||
        n.startsWith("doc_") || n.startsWith("sample_") ||
        n.startsWith("mix_") || n.startsWith("vq_") ||
        n.startsWith("retrieve_") || n.startsWith("decontam_") ||
        n.startsWith("emb_") ||
        n.startsWith("corpus_") || n.startsWith("pipeline_")) &&
        n != "knn_lsh" && n != "knn_ivf_kmeans").toSeq.sorted
    assert(applicable.size >= 35)
    applicable.foreach { n =>
      val rows = SparkEntry.queries(n)(spark, dir).count() // must not throw
      assert(rows >= 0, n)
    }
  }

  test("edge semantics: short docs shingle to nothing, dup docs pair at jaccard 1.0, zero vector drops out") {
    val jac = SparkEntry.queries("dedup_ngram_jaccard")(spark, dir).collect()
    assert(jac.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet ==
      Set((6L, 7L, 1.0)), "only the exact-duplicate pair, at jaccard 1.0")
    val knn = SparkEntry.queries("knn_brute")(spark, dir).collect()
    // the zero vector (vec_id 0) has NULL cosine everywhere (guarded
    // division, no ANSI abort); with k larger than the corpus it still
    // receives the LAST ranks — nulls-last in both engines — and its
    // cosine is null wherever it appears
    val zeroRows = knn.filter(_.getLong(1) == 0L)
    assert(zeroRows.nonEmpty && zeroRows.forall(_.isNullAt(3)),
      "zero-vector neighbors carry NULL cosine")
    // null-cosine partners (the zero vector AND the null-embedding vector)
    // must occupy exactly the LAST ranks of each query's list
    for ((q, rows) <- knn.groupBy(_.getLong(0))) {
      val nullRanks = rows.filter(_.isNullAt(3)).map(_.getLong(2)).sorted
      val worst = rows.map(_.getLong(2)).sorted.takeRight(nullRanks.size)
      assert(nullRanks.toSeq == worst.toSeq, s"query $q: NULL cosines not last")
    }
    val anomaly = SparkEntry.queries("ev_anomaly")(spark, dir).collect()
    assert(anomaly.isEmpty, "singleton/zero-variance types yield no z-scores, not a crash")
    // the all-NULL-user "ghost" type: empty KMV minima must publish
    // kmv_n=0 / NULL k-th / 0.0 estimate — not an ANSI element_at abort —
    // and its all-NULL value sum must stay NULL (SQL sum semantics), not 0
    val kmv = SparkEntry.queries("ev_kmv_distinct")(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(kmv.contains("ghost"))
    assert(kmv("ghost").getLong(1) == 0L && kmv("ghost").isNullAt(2) &&
      kmv("ghost").getDouble(3) == 0.0, s"ghost sketch row: ${kmv("ghost")}")
    val stats = SparkEntry.queries("ev_stats_incr")(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(stats.contains("ghost"))
    assert(stats("ghost").getLong(1) == 2L, "ghost n counts its rows")
    assert(stats("ghost").isNullAt(2) && stats("ghost").isNullAt(3) &&
      stats("ghost").isNullAt(4), s"ghost sum/min/max must be NULL: ${stats("ghost")}")
    assert(stats("ghost").getLong(5) == 0L && stats("ghost").getDouble(7) == 0.0,
      s"ghost sketch state: ${stats("ghost")}")
  }
}

package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryModule, Tables}
import CrossHash._

/** Ranked-retrieval suite over the `documents` (+ `embeddings`) tables —
  * the curation-side search stack of a training-data pipeline: score a
  * query against the corpus, rank, and (for hybrid) fuse lexical and
  * vector rankings. Complements TextQueries' per-doc scoring (no ranking)
  * and SimilarityQueries' pure-vector ANN.
  *
  *  - text_bm25: BM25-shaped lexical ranking (Robertson/Spärck Jones
  *    probabilistic relevance framework: per-term idf × a saturating,
  *    document-length-normalized tf) with k1 = 1.2, b = 0.75.
  *  - retrieve_rrf: hybrid retrieval — a lexical more-like-this ranking
  *    (query = the query document's token set) fused with the exact
  *    cosine ANN ranking by reciprocal-rank fusion
  *    (Cormack et al. 2009: score = Σ 1/(60+rank)).
  *
  * == Cross-engine determinism discipline ==
  * Three deliberate deviations from the textbook spelling keep the driver
  * gate hash-exact (same doctrine as text_tfidf's rational idf and
  * emb_centroid's scaled-integer sums):
  *
  *  1. RATIONAL idf — (N − df + 0.5)/(df + 0.5) without the `ln`:
  *     `ln` is not IEEE-correctly-rounded and Spark (JVM `Math.log`
  *     intrinsic) and DuckDB (libm) may differ in the last ulp; every op
  *     we do use (+, −, ×, /, sqrt, floor) IS correctly rounded, so
  *     identical expression trees give bit-identical doubles. The missing
  *     log is monotone per-term; rankings differ only through the
  *     cross-term sum, which is the documented trade for exactness.
  *  2. SCALED-INTEGER score summation — each per-term contribution is
  *     snapped to a long (`floor(x·10⁹ + 0.5)`) BEFORE the per-document
  *     sum, because a floating SUM's value depends on addition order
  *     (shuffle-nondeterministic); a long sum is order-independent and
  *     exact. Contributions are ≤ ~10⁴, so the scaled values sit far
  *     inside the 2⁵³ exact-integer range.
  *  3. Rank ties break on doc_id (total order), so `row_number` agrees.
  *
  * == Scale shape ==
  * Everything is |corpus|-linear: one tokenize pass builds tf/dl, the
  * |vocab|-sized df table joins on term (AQE broadcasts it while small),
  * and the query side is tiny. The only corpus-keyed exchanges are the
  * tf/dl aggregations; ranking shuffles candidate rows (|queries| × hits),
  * never the corpus. At 100 TB the tf/df tables are the materialized
  * inverted index — build once, probe per query batch (the ShingleIndex
  * pattern); the per-query top-k is a WindowGroupLimit partial top-k below
  * the shuffle, the same plan shape PlanAuditSpec pins for knn_brute.
  */
object RetrievalQueries extends QueryModule {
  /** Scaled-integer snap factor (10⁹ is exactly representable; Spark side
    * uses the double literal — `expr("1000000000.0")` would parse as a
    * DECIMAL and drag the arithmetic through decimal promotion). */
  private val ScoreScale = "1000000000.0"
  private val scoreScaleLit = lit(1.0e9)
  private val TopN = 10

  /** Fixture query set — multi-term queries over the corpus vocabulary,
    * spelled identically in the oracle's VALUES clause (shared with
    * Bm25IndexSpec's probe-≡-recompute pin). */
  private[graft] val fixtureQueries: Seq[(Long, String)] = Seq(
    0L -> "spark", 0L -> "join",
    1L -> "data", 1L -> "stream", 1L -> "filter",
    2L -> "window", 2L -> "batch")

  /** Hybrid-retrieval geometry: queries are the first [[NQ]] documents
    * (vec_id = doc_id by corpus convention); each side contributes its
    * top-[[RrfDepth]] ranking; fused lists re-rank to [[TopN]]. */
  private val NQ = 10
  private val RrfDepth = 20
  private val RrfK = 60

  /** BM25 contributions of `qterms` (query_id, term) against the corpus:
    * (query_id, doc_id, sc) with sc = the scaled-long per-term score,
    * pre-sum. Shared by text_bm25 (fixture queries) and retrieve_rrf
    * (query-document token sets). */
  private def bm25Contrib(s: SparkSession, dir: String, qterms: DataFrame): DataFrame = {
    import s.implicits._
    // tf cached: dl (Σtf per doc ≡ the token count), dfreq and the
    // contribution join all derive from it, so the corpus explode runs
    // once instead of once per consumer (r17 optimization — the old
    // spelling re-exploded for tf, dl, and again through their
    // downstream aggregates)
    val tok = Tables.load(s, dir, "documents")
      .select($"doc_id", explode(tokens($"text")).as("term"))
    val tf = tok.groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
      .cache()
    val dl = tf.groupBy($"doc_id").agg(sum($"tf").as("dl"))
    val dfreq = tf.groupBy($"term").agg(count(lit(1)).as("dfreq"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum($"dl").as("total_dl"))
    qterms.join(tf, "term")
      .join(dl, "doc_id")
      .join(dfreq, "term")
      .crossJoin(stats) // 1 row — AQE broadcasts
      .select($"query_id", $"doc_id",
        graft.operators.Bm25Index.contrib($"tf", $"dl", $"dfreq",
          $"n_docs", $"total_dl").as("sc"))
  }

  /** Oracle CTE block mirroring [[bm25Contrib]] byte-for-byte in op order;
    * `qsql` must yield (query_id BIGINT, term). */
  private def oBm25Ctes(qsql: String): String =
    s"""q AS ($qsql),
       |tok AS (SELECT doc_id, unnest($oTokens) AS term FROM documents),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
       |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
       |dfreq AS (SELECT term, count(*) AS dfreq FROM tf GROUP BY 1),
       |stats AS (SELECT count(*) AS n_docs, sum(dl) AS total_dl FROM dl),
       |contrib AS (
       |  SELECT q.query_id, tf.doc_id,
       |    CAST(floor(
       |      ((CAST(n_docs - dfreq AS DOUBLE) + 0.5) / (CAST(dfreq AS DOUBLE) + 0.5))
       |      * ((CAST(tf AS DOUBLE) * 2.2)
       |         / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 *
       |              (CAST(dl AS DOUBLE) / (CAST(total_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))))
       |      * $ScoreScale + 0.5) AS BIGINT) AS sc
       |  FROM q JOIN tf USING (term) JOIN dl USING (doc_id)
       |    JOIN dfreq USING (term) CROSS JOIN stats)""".stripMargin

  private val oFixture =
    "SELECT CAST(query_id AS BIGINT) AS query_id, term FROM (VALUES " +
      fixtureQueries.map { case (q, t) => s"($q, '$t')" }.mkString(", ") +
      ") AS v(query_id, term)"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_bm25" -> { (s, dir) =>
      import s.implicits._
      val q = fixtureQueries.toDF("query_id", "term")
      val w = Window.partitionBy($"query_id").orderBy($"score_scaled".desc, $"doc_id")
      bm25Contrib(s, dir, q)
        .groupBy($"query_id", $"doc_id").agg(sum($"sc").as("score_scaled"))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter($"rnk" <= TopN)
        .select($"query_id", $"rnk", $"doc_id", $"score_scaled",
          ($"score_scaled".cast("double") / scoreScaleLit).as("score"))
    },

    // Hybrid retrieval: lexical more-like-this (query doc's DISTINCT token
    // set → BM25 against the corpus) ⊕ exact vector cosine, fused by RRF.
    // The two lists are asymmetric by construction — every doc is lexically
    // rankable but only the embedded subset (vec_id ⊂ doc_id) has a vector
    // rank — which is exactly the production hybrid regime; the full-outer
    // fuse lets either side carry a doc the other missed, and a missing
    // rank contributes 0 (the standard RRF convention for absent lists).
    // Both 1/(60+r) terms are single IEEE divides of exact integers and
    // their one addition is order-fixed (a column expression, not an
    // aggregate), so fused scores are bit-identical cross-engine.
    "retrieve_rrf" -> { (s, dir) =>
      import s.implicits._
      graft.GraftExtensions.register(s)
      // lexical leg
      val qterms = Tables.load(s, dir, "documents")
        .filter($"doc_id" < NQ)
        .select($"doc_id".as("query_id"), explode(array_distinct(tokens($"text"))).as("term"))
      val wLex = Window.partitionBy($"query_id").orderBy($"score_scaled".desc, $"doc_id")
      val lex = bm25Contrib(s, dir, qterms)
        .filter($"doc_id" =!= $"query_id")
        .groupBy($"query_id", $"doc_id").agg(sum($"sc").as("score_scaled"))
        .withColumn("r_lex", row_number().over(wLex).cast("long"))
        .filter($"r_lex" <= RrfDepth)
        .select($"query_id", $"doc_id", $"r_lex")
      // vector leg (knn_brute shape: tiny broadcast query side, corpus
      // never shuffled; zero-norm guarded like every cosine site)
      val e = Tables.load(s, dir, "embeddings")
        .select($"vec_id", $"embedding".cast("array<double>").as("v"))
        .withColumn("nrm", sqrt(expr("graft_dot(v, v)")))
      val qv = e.filter($"vec_id" < NQ)
        .select($"vec_id".as("query_id"), $"v".as("qv"), $"nrm".as("qnrm"))
      val cv = e.select($"vec_id".as("doc_id"), $"v".as("cv"), $"nrm".as("cnrm"))
      val cos = expr("graft_dot(qv, cv)") / nullif($"qnrm" * $"cnrm", lit(0.0))
      val wVec = Window.partitionBy($"query_id").orderBy($"cosine".desc, $"doc_id")
      val vec = broadcast(qv).join(cv, $"query_id" =!= $"doc_id")
        .withColumn("cosine", cos)
        .withColumn("r_vec", row_number().over(wVec).cast("long"))
        .filter($"r_vec" <= RrfDepth)
        .select($"query_id", $"doc_id", $"r_vec")
      // fuse
      val rrf = coalesce(lit(1.0) / (lit(RrfK) + $"r_lex").cast("double"), lit(0.0)) +
        coalesce(lit(1.0) / (lit(RrfK) + $"r_vec").cast("double"), lit(0.0))
      val wFused = Window.partitionBy($"query_id").orderBy($"rrf".desc, $"doc_id")
      lex.join(vec, Seq("query_id", "doc_id"), "full_outer")
        .withColumn("rrf", rrf)
        .withColumn("rnk", row_number().over(wFused).cast("long"))
        .filter($"rnk" <= TopN)
        .select($"query_id", $"rnk", $"doc_id", $"r_lex", $"r_vec", $"rrf")
    }
  )

  def oracles: Map[String, String] = Map(
    "text_bm25" ->
      s"""WITH ${oBm25Ctes(oFixture)}
         |SELECT query_id, rnk, doc_id, score_scaled,
         |  CAST(score_scaled AS DOUBLE) / $ScoreScale AS score
         |FROM (
         |  SELECT query_id, doc_id, score_scaled,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |           ORDER BY score_scaled DESC, doc_id) AS BIGINT) AS rnk
         |  FROM (SELECT query_id, doc_id, CAST(sum(sc) AS BIGINT) AS score_scaled
         |        FROM contrib GROUP BY 1, 2))
         |WHERE rnk <= $TopN""".stripMargin,

    "retrieve_rrf" -> {
      val qsql =
        s"""SELECT doc_id AS query_id, unnest(list_distinct($oTokens)) AS term
           |FROM documents WHERE doc_id < $NQ""".stripMargin
      s"""WITH ${oBm25Ctes(qsql)},
         |lex AS (
         |  SELECT query_id, doc_id, CAST(r AS BIGINT) AS r_lex FROM (
         |    SELECT query_id, doc_id,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY score_scaled DESC, doc_id) AS r
         |    FROM (SELECT query_id, doc_id, sum(sc) AS score_scaled
         |          FROM contrib WHERE doc_id <> query_id GROUP BY 1, 2))
         |  WHERE r <= $RrfDepth),
         |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
         |vec AS (
         |  SELECT query_id, doc_id, CAST(r AS BIGINT) AS r_vec FROM (
         |    SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY list_dot_product(q.v, c.v)/(q.nrm*c.nrm) DESC, c.vec_id) AS r
         |    FROM n q JOIN n c ON q.vec_id < $NQ AND c.vec_id <> q.vec_id)
         |  WHERE r <= $RrfDepth),
         |fused AS (
         |  SELECT coalesce(lex.query_id, vec.query_id) AS query_id,
         |    coalesce(lex.doc_id, vec.doc_id) AS doc_id, r_lex, r_vec,
         |    coalesce(CAST(1.0 AS DOUBLE) / CAST($RrfK + r_lex AS DOUBLE), CAST(0.0 AS DOUBLE))
         |      + coalesce(CAST(1.0 AS DOUBLE) / CAST($RrfK + r_vec AS DOUBLE), CAST(0.0 AS DOUBLE)) AS rrf
         |  FROM lex FULL OUTER JOIN vec
         |    ON lex.query_id = vec.query_id AND lex.doc_id = vec.doc_id)
         |SELECT query_id, rnk, doc_id, r_lex, r_vec, rrf FROM (
         |  SELECT query_id, doc_id, r_lex, r_vec, rrf,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |           ORDER BY rrf DESC, doc_id) AS BIGINT) AS rnk
         |  FROM fused)
         |WHERE rnk <= $TopN""".stripMargin
    }
  )
}

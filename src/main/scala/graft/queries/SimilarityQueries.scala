package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryModule, Tables}

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (`Array[Float]` column, cast to double for exact cross-engine math).
  *
  *  - knn_brute: exact top-k cosine neighbors for a query set — the
  *    correctness baseline. The query side is tiny and broadcast, so the
  *    candidate generation is a broadcast nested-loop over the corpus: one
  *    scan, no shuffle of the big side, then a per-query top-k (window
  *    rank over query_id partitions — bounded at k·|queries| rows out).
  *  - knn_ivf: the scale path — IVF-style bucketing. Each vector carries a
  *    coarse partition label (`label` = its cluster assignment, the analog
  *    of an IVF centroid id); the search joins query to corpus on the
  *    label, probing only 1/|buckets| of the data. At 100 TB the corpus
  *    is partitioned/bucketed by label on disk, so the probe is a
  *    partition-pruned scan, not a full pass.
  *
  * The dot product folds left-to-right (`aggregate` over `zip_with`) which
  * matches DuckDB's sequential `list_dot_product` — bit-identical doubles,
  * so ranks and rounded cosines hash-match.
  */
object SimilarityQueries extends QueryModule {
  private val K = 10
  private val NQueries = 10

  private def vecs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.GraftExtensions.register(s)
    Tables.load(s, dir, "embeddings")
      .select($"vec_id", $"label", $"embedding".cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(expr("graft_dot(v, v)")))
  }

  private def topk(pairs: DataFrame): DataFrame = {
    import pairs.sparkSession.implicits._
    val cos = expr("graft_dot(qv, cv)") / (col("qnrm") * col("cnrm"))
    val w = Window.partitionBy($"query_id").orderBy($"cosine".desc, $"neighbor_id")
    pairs.withColumn("cosine", cos)
      .withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= K)
      .select($"query_id", $"neighbor_id", $"rnk".cast("long").as("rnk"),
        round($"cosine", 6).as("cosine"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "knn_brute" -> { (s, dir) =>
      import s.implicits._
      val e = vecs(s, dir)
      val q = e.filter($"vec_id" < NQueries)
        .select($"vec_id".as("query_id"), $"v".as("qv"), $"nrm".as("qnrm"))
      val c = e.select($"vec_id".as("neighbor_id"), $"v".as("cv"), $"nrm".as("cnrm"))
      topk(broadcast(q).join(c, $"query_id" =!= $"neighbor_id"))
    },

    "knn_ivf" -> { (s, dir) =>
      import s.implicits._
      val e = vecs(s, dir)
      val q = e.filter($"vec_id" < NQueries)
        .select($"vec_id".as("query_id"), $"label".as("qlabel"), $"v".as("qv"), $"nrm".as("qnrm"))
      val c = e.select($"vec_id".as("neighbor_id"), $"label", $"v".as("cv"), $"nrm".as("cnrm"))
      topk(broadcast(q).join(c,
        $"qlabel" === $"label" && $"query_id" =!= $"neighbor_id"))
    }
  )

  private def oracle(joinCond: String): String =
    s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |n AS (SELECT vec_id, label, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
       |pairs AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    list_dot_product(q.v, c.v)/(q.nrm*c.nrm) AS cosine
       |  FROM n q JOIN n c ON q.vec_id < $NQueries AND c.vec_id <> q.vec_id $joinCond)
       |SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rnk, round(cosine, 6) AS cosine
       |FROM (SELECT query_id, neighbor_id, cosine,
       |        row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
       |      FROM pairs)
       |WHERE rnk <= $K""".stripMargin

  def oracles: Map[String, String] = Map(
    "knn_brute" -> oracle(""),
    "knn_ivf" -> oracle("AND c.label = q.label")
  )
}

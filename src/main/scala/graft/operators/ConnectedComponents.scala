package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by min-label propagation — the clustering step of
  * near-duplicate removal ("keep one doc per dup cluster"): nodes are
  * documents, edges are verified near-dup pairs, the component
  * representative (min doc id) is the keeper.
  *
  * DataFrame-native label propagation: each iteration joins current labels
  * across the (undirected) edge set and takes the per-node min. Iterations
  * = O(component diameter); dedup clusters are tiny (pairs/triples), so
  * convergence is 2-3 rounds. Convergence is checked with an aggregate
  * (sum of labels strictly decreases until fixpoint) — no driver-side data
  * collection, only one scalar per round. At 100 TB the edge list is the
  * LSH-verified pair set — orders of magnitude smaller than the corpus —
  * so each round is a broadcast join against a small edge table.
  *
  * (GraphX ships connectedComponents on RDDs; this stays in the
  * DataFrame/Catalyst world so AQE and broadcast planning apply.)
  */
object ConnectedComponents {

  /** @param nodes one column `id`
    * @param edges  two columns `a`, `b` (undirected pairs)
    * @return (id, cluster) where cluster = min node id in the component */
  def clusters(nodes: DataFrame, edges: DataFrame, maxIter: Int = 25): DataFrame = {
    val spark = nodes.sparkSession
    import spark.implicits._
    val undirected = edges.select($"a", $"b")
      .union(edges.select($"b".as("a"), $"a".as("b")))
      .cache()
    var labels = nodes.select($"id", $"id".as("cluster")).cache()
    var converged = false
    var iter = 0
    var prevSum = labels.agg(sum($"cluster")).collect()(0).getLong(0)
    while (!converged && iter < maxIter) {
      val neighborLabels = undirected
        .join(labels, undirected("b") === labels("id"))
        .select(undirected("a").as("id"), $"cluster")
      val next = labels.union(neighborLabels)
        .groupBy($"id").agg(min($"cluster").as("cluster"))
        .cache()
      val nextSum = next.agg(sum($"cluster")).collect()(0).getLong(0)
      labels.unpersist()
      labels = next
      converged = nextSum == prevSum
      prevSum = nextSum
      iter += 1
    }
    undirected.unpersist()
    labels
  }
}

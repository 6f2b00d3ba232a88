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

  /** Edge-count threshold below which the component structure is computed
    * with driver-side union-find (the verified near-dup pair set is
    * typically orders of magnitude smaller than the corpus, so this is the
    * common case; the result is a broadcast map-join against the nodes).
    * Above it, distributed label propagation runs. */
  val DriverEdgeLimit = 1000000L

  /** @param nodes one column `id`
    * @param edges  two columns `a`, `b` (undirected pairs)
    * @return (id, cluster) where cluster = min node id in the component */
  def clusters(nodes: DataFrame, edges: DataFrame, maxIter: Int = 25): DataFrame = {
    val spark = nodes.sparkSession
    import spark.implicits._
    val cachedEdges = edges.select($"a", $"b").cache()
    // size probe, not a full count: limit(N+1).count() answers "≤ N?"
    // scanning at most N+1 rows (Spark's incremental limit execution
    // touches partitions only until the limit fills) — at 100 TB the
    // verified-pair set can be billions of rows, and a full count here
    // would be a second end-to-end pass over the edge lineage before any
    // clustering work starts
    val small = cachedEdges.limit(DriverEdgeLimit.toInt + 1).count() <= DriverEdgeLimit
    val result =
      if (small) clustersUnionFind(nodes, cachedEdges)
      else clustersPropagate(nodes, cachedEdges, maxIter)
    cachedEdges.unpersist()
    result
  }

  /** Incremental clustering — fold a new batch into an EXISTING
    * assignment without re-clustering the corpus (the daily-increment
    * form: yesterday's clusters persist, today's batch brings new nodes
    * and the ShingleIndex-probe edge set touching them).
    *
    * Quotient-graph argument: every prior component is already connected,
    * so contracting it to its representative preserves the union graph's
    * connectivity — components of (prior ∪ batch) equal components of the
    * quotient graph whose nodes are prior representatives + new ids and
    * whose edges are the NEW edges with endpoints projected to their
    * representative. Labels stay min-id: prior representatives ARE the
    * min ids of their components, so the min over a quotient component is
    * the global min. IncrementalDedupSpec-style pin: equals a full
    * recompute on the union at every split point
    * (ConnectedComponentsSpec).
    *
    * Cost: the quotient clustering is bounded by the NEW edge/node set
    * (batch-sized); the only corpus-sized work is one relabel join of the
    * prior assignment against the (small, AQE-broadcastable) old→new
    * representative map — no iteration ever touches corpus rows.
    *
    * `newEdges` may connect new-new or new-old pairs (old-old pairs
    * cannot appear when the corpus is unchanged — the ShingleIndex.probe
    * contract); ids must be unique across prior and batch. */
  def incremental(prior: DataFrame, newNodes: DataFrame,
      newEdges: DataFrame): DataFrame = {
    val spark = prior.sparkSession
    import spark.implicits._
    val priorC = prior.select($"id", $"cluster").cache()
    // project edge endpoints to prior representatives (new ids pass
    // through); the rep map joined here is (touched ids only after AQE
    // filters) — both joins are plain equi-joins, broadcastable when small
    val repA = priorC.select($"id".as("a"), $"cluster".as("ra"))
    val repB = priorC.select($"id".as("b"), $"cluster".as("rb"))
    val qEdges = newEdges.select($"a", $"b")
      .join(repA, Seq("a"), "left").join(repB, Seq("b"), "left")
      .select(coalesce($"ra", $"a").as("a"), coalesce($"rb", $"b").as("b"))
    // quotient nodes: reps touched by a new edge + all new ids (untouched
    // prior components keep their label via the relabel join's fallback)
    val qNodes = qEdges.select($"a".as("id"))
      .unionByName(qEdges.select($"b".as("id")))
      .unionByName(newNodes.select($"id"))
      .distinct()
    val qClusters = clusters(qNodes, qEdges)
      .select($"id".as("rep"), $"cluster".as("newCluster"))
    val relabeled = priorC
      .join(qClusters.withColumnRenamed("rep", "cluster"), Seq("cluster"), "left")
      .select($"id", coalesce($"newCluster", $"cluster").as("cluster"))
    val fresh = newNodes.select($"id")
      .join(qClusters.withColumnRenamed("rep", "id"), Seq("id"), "left")
      .select($"id", coalesce($"newCluster", $"id").as("cluster"))
    val out = relabeled.unionByName(fresh)
    priorC.unpersist()
    out
  }

  /** Small-graph path: union-find over collected edges (edge list only —
    * never the corpus), result joined back as a broadcast map. */
  private[graft] def clustersUnionFind(nodes: DataFrame, edges: DataFrame): DataFrame = {
    val spark = nodes.sparkSession
    import spark.implicits._
    val pairs = edges.as[(Long, Long)].collect()
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { val (lo, hi) = if (ra < rb) (ra, rb) else (rb, ra); parent(hi) = lo }
    }
    val mapping = pairs.flatMap { case (a, b) => Seq(a, b) }.distinct
      .map(x => x -> find(x)).toSeq.toDF("mid", "mcluster")
    nodes.join(org.apache.spark.sql.functions.broadcast(mapping),
        nodes("id") === mapping("mid"), "left")
      .select(nodes("id"), coalesce($"mcluster", nodes("id")).as("cluster"))
  }

  /** Large-graph path: distributed min-label propagation. */
  private[graft] def clustersPropagate(nodes: DataFrame, edges: DataFrame, maxIter: Int): DataFrame = {
    val spark = nodes.sparkSession
    import spark.implicits._
    val undirected = edges
      .union(edges.select($"b".as("a"), $"a".as("b")))
      .cache()
    // localCheckpoint (not cache) each round: the label plan references
    // itself twice per iteration (union + join), so lineage doubles every
    // round — without truncation the logical plan grows 2^iterations and
    // plan stringification alone OOMs. Checkpointing keeps it O(1).
    var labels = nodes.select($"id", $"id".as("cluster")).localCheckpoint(true)
    // convergence scalar in DECIMAL(38,0): a long sum of 64-bit ids
    // overflows (ANSI: job abort; legacy: wraparound that can spuriously
    // equal the previous round and falsely converge); null (empty nodes)
    // maps to 0
    def labelSum(df: DataFrame): java.math.BigDecimal = {
      val r = df.agg(sum($"cluster".cast("decimal(38,0)"))).collect()(0)
      if (r.isNullAt(0)) java.math.BigDecimal.ZERO else r.getDecimal(0)
    }
    var converged = false
    var iter = 0
    var prevSum = labelSum(labels)
    while (!converged && iter < maxIter) {
      val neighborLabels = undirected
        .join(labels, undirected("b") === labels("id"))
        .select(undirected("a").as("id"), $"cluster")
      val next = labels.union(neighborLabels)
        .groupBy($"id").agg(min($"cluster").as("cluster"))
        .localCheckpoint(true)
      val nextSum = labelSum(next)
      labels = next
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      iter += 1
    }
    undirected.unpersist()
    labels
  }
}

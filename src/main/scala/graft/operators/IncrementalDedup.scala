package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental near-duplicate detection: dedup a NEW batch of documents
  * against an existing corpus WITHOUT re-joining the corpus with itself.
  *
  * The batch-pipeline shape of dedup (DedupQueries.dedup_ngram_jaccard)
  * self-joins the whole shingle index — O(corpus²/buckets) work that is
  * wasteful when 99% of the corpus was already deduped yesterday. A daily
  * increment only needs pairs that INVOLVE a new document:
  *
  *   candidates = (new ⋈ corpus on shingle-hash)  ∪  (new ⋈ new)
  *
  * which probes the (pre-bucketed, on disk) corpus index with the small
  * batch — a broadcast or shuffle join bounded by |batch|, never |corpus|².
  * At 100 TB the corpus shingle index is written bucketed by `h`, so the
  * probe is a co-located join against only the buckets the batch touches.
  *
  * Inputs are shingle indexes `(doc_id, h)` (distinct pairs, h = 60-bit
  * shingle hash — CrossHash.h60) for the corpus and the new batch; output
  * is near-dup pairs `(doc_a, doc_b, jaccard)` with jaccard ≥ `threshold`,
  * where at least one side is a new document and `doc_a < doc_b`.
  *
  * Exactly the pair set the full recompute would emit for those documents
  * (IncrementalDedupSpec cross-checks), at incremental cost.
  */
object IncrementalDedup {

  def newPairs(corpus: DataFrame, batch: DataFrame, threshold: Double): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // batch membership rides the union as a literal flag — candidate
    // classification (new-vs-corpus or new-vs-new) then falls out of the
    // probe join itself, with no membership lookup joins at all
    val all = corpus.withColumn("_bnew", lit(false))
      .union(batch.withColumn("_bnew", lit(true)))
    val cnt = all.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    // probe side = the new batch; build side = corpus ∪ batch. Restricting
    // one side to the batch keeps the join |batch|-bounded; doc_a < doc_b
    // would drop new-vs-new pairs where the new doc has the higher id, so
    // the asymmetric condition keeps (new, any) and dedups symmetric
    // (new, new) pairs afterwards via the canonical (min, max) ordering.
    // Every shared shingle is counted once per (a,b) orientation the join
    // emits: new-vs-corpus pairs appear once, new-vs-new pairs twice (both
    // docs probe; `b._bnew` is true in both orientations) — halve the
    // latter. Corpus docs never join corpus docs, so old-old pairs
    // (already known) are never recomputed.
    val inter = batch.as("a").join(all.as("b"),
        $"a.h" === $"b.h" && $"a.doc_id" =!= $"b.doc_id")
      .select(
        least($"a.doc_id", $"b.doc_id").as("doc_a"),
        greatest($"a.doc_id", $"b.doc_id").as("doc_b"),
        $"b._bnew".as("bn"))
      .groupBy($"doc_a", $"doc_b")
      .agg(count(lit(1)).as("i2"), max($"bn").as("bn"))
    val inter2 = inter.select($"doc_a", $"doc_b",
      when($"bn", ($"i2" / 2).cast("long")).otherwise($"i2").as("inter"))
    // the candidate pair set is USUALLY the small side against the
    // (corpus-sized, distributed) per-doc counts — but its size is
    // data-dependent (|batch| × shingle-share fan-out, unbounded for a
    // boilerplate-heavy batch), so the join strategy is LEFT TO AQE:
    // runtime stats pick a broadcast when the pair set really is small and
    // degrade to a shuffle join when it is not, instead of a mandated
    // broadcast OOMing the executors (PlanAuditSpec pins the absence of a
    // forced hint). Each pair needs BOTH members' counts: explode the pair
    // to its two doc sides and join cnt ONCE, then fold the sides back per
    // pair — one corpus pass instead of two count joins chained serially.
    val sides = inter2.select($"doc_a", $"doc_b", $"inter",
      explode(array($"doc_a", $"doc_b")).as("doc"))
    val j = $"inter".cast("double") / ($"na_n" + $"nb_n" - $"inter")
    cnt.join(sides, $"doc_id" === $"doc")
      .groupBy($"doc_a", $"doc_b", $"inter")
      .agg(
        max(when($"doc" === $"doc_a", $"n")).as("na_n"),
        max(when($"doc" === $"doc_b", $"n")).as("nb_n"))
      .filter(j >= threshold)
      .select($"doc_a", $"doc_b", j.as("jaccard"))
  }

  /** Incremental CONTAINMENT pairs — DedupQueries.dedup_containment's
    * ordered |A∩B|/|A| ≥ threshold relation, restricted to pairs that
    * involve at least one NEW document, at [[newPairs]]' probe-only cost
    * (the batch probes the corpus index; the corpus never self-joins).
    * Intersections are symmetric, so the probe computes each unordered
    * pair once (the same new-vs-new double-count halving as newPairs) and
    * mirrors into both orientations before the one-sided count division —
    * a (corpus_doc ⊆ new_doc) pair is found by the new doc's probe, so
    * both directions are complete. Output (doc_in, doc_out, containment),
    * exactly the full recompute's rows for pairs touching the batch
    * (IncrementalDedupSpec pins the equality). */
  def newContainment(corpus: DataFrame, batch: DataFrame, threshold: Double): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val all = corpus.withColumn("_bnew", lit(false))
      .union(batch.withColumn("_bnew", lit(true)))
    val cnt = all.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val inter = batch.as("a").join(all.as("b"),
        $"a.h" === $"b.h" && $"a.doc_id" =!= $"b.doc_id")
      .select(
        least($"a.doc_id", $"b.doc_id").as("x"),
        greatest($"a.doc_id", $"b.doc_id").as("y"),
        $"b._bnew".as("bn"))
      .groupBy($"x", $"y")
      .agg(count(lit(1)).as("i2"), max($"bn").as("bn"))
      .select($"x", $"y",
        when($"bn", ($"i2" / 2).cast("long")).otherwise($"i2").as("inter"))
      // cached: the two mirror orientations below each reference it —
      // uncached, the batch×all join + aggregate executed twice (r17
      // optimization, the containmentPairs `half` pattern)
      .cache()
    val both = inter.select($"x".as("doc_in"), $"y".as("doc_out"), $"inter")
      .unionByName(inter.select($"y".as("doc_in"), $"x".as("doc_out"), $"inter"))
    val c = $"inter".cast("double") / $"nin"
    // one count join: only the IN side's shingle count enters containment
    both.join(cnt.select($"doc_id".as("doc_in"), $"n".as("nin")), "doc_in")
      .filter(c >= threshold)
      .select($"doc_in", $"doc_out", c.as("containment"))
  }
}

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
    val all = corpus.union(batch)
    val cnt = all.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    // probe side = the new batch; build side = corpus ∪ batch. Restricting
    // one side to the batch keeps the join |batch|-bounded; doc_a < doc_b
    // would drop new-vs-new pairs where the new doc has the higher id, so
    // the asymmetric condition keeps (new, any) and dedups symmetric
    // (new, new) pairs afterwards via the canonical (min, max) ordering.
    val inter = batch.as("a").join(all.as("b"),
        $"a.h" === $"b.h" && $"a.doc_id" =!= $"b.doc_id")
      .select(
        least($"a.doc_id", $"b.doc_id").as("doc_a"),
        greatest($"a.doc_id", $"b.doc_id").as("doc_b"))
      .groupBy($"doc_a", $"doc_b")
      .agg(count(lit(1)).as("i2"))
    // every shared shingle is counted once per (a,b) orientation that the
    // join emits: new-vs-corpus pairs appear once, new-vs-new pairs twice
    // (both docs probe) — halve the latter. Corpus docs never join corpus
    // docs, so old-old pairs (already known) are never recomputed.
    val newIds = batch.select($"doc_id".as("nid")).distinct()
    val inter2 = inter
      .join(broadcast(newIds.select($"nid".as("na"))), $"doc_a" === $"na", "left")
      .join(broadcast(newIds.select($"nid".as("nb"))), $"doc_b" === $"nb", "left")
      .select($"doc_a", $"doc_b",
        when($"na".isNotNull && $"nb".isNotNull, ($"i2" / 2).cast("long"))
          .otherwise($"i2").as("inter"))
    // the candidate pair set is the SMALL side — broadcast IT against the
    // (corpus-sized, distributed) per-doc counts; broadcasting cnt would
    // ship 10^8 rows to every executor at the scale this operator targets
    val j = $"inter".cast("double") / ($"na_n" + $"nb_n" - $"inter")
    val withA = cnt.select($"doc_id".as("doc_a"), $"n".as("na_n"))
      .join(broadcast(inter2), "doc_a")
    cnt.select($"doc_id".as("doc_b"), $"n".as("nb_n"))
      .join(broadcast(withA), "doc_b")
      .filter(j >= threshold)
      .select($"doc_a", $"doc_b", j.as("jaccard"))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.CrossHash.tokens

/** Distributed BPE vocabulary induction (Sennrich et al. 2016) — the
  * trainer behind the [[graft.functions.Tokenizer]] seam: learn the merge
  * table FROM the corpus that the packing/mixture operators then budget
  * with.
  *
  * Scale shape (what makes this viable at 100 TB):
  *  - the corpus collapses to a (word, count) table FIRST — one
  *    tokenize + aggregate pass; Zipf makes this vocabulary-sized
  *    (millions of rows, not the corpus' trillions), and every merge
  *    round thereafter runs over the word table weighted by count,
  *    never over raw text again;
  *  - each round is one map-side-combined aggregation (adjacent-pair
  *    counts) + a 1-row driver collect (the argmax merge) + a columnar
  *    rewrite of the symbol arrays (a fold expression, no UDF) — O(1)
  *    jobs per merge, all narrow except the |pairs|-keyed agg shuffle;
  *  - lineage is truncated every [[CheckpointEvery]] rounds
  *    (localCheckpoint, the ConnectedComponents discipline) so nMerges
  *    rounds don't stack nMerges plans.
  *
  * Determinism: counts are exact longs; the winning pair breaks ties by
  * (count desc, left asc, right asc), so the learned merge list is a pure
  * function of the corpus — bit-reproducible across partitionings, reruns
  * and cluster sizes (pinned in BpeTrainerSpec against an independent
  * single-JVM reference implementation).
  */
object BpeTrainer {
  private val CheckpointEvery = 8

  /** One learned merge: rank order, the adjacent symbol pair, and its
    * weighted occurrence count when chosen. */
  final case class Merge(rank: Int, left: String, right: String, count: Long)

  /** Learn up to `nMerges` merges from `docs` (doc_id, text). Stops early
    * when no adjacent pair occurs twice. */
  def train(docs: DataFrame, nMerges: Int): Seq[Merge] = {
    val spark = docs.sparkSession
    // corpus → (word, count): the only pass over raw text
    val words = docs
      .select(explode(tokens(col("text"))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    // symbol sequences: characters of the word (filter drops split()'s
    // empty edge artifacts)
    var syms = words.select(col("cnt"),
      expr("filter(split(w, ''), s -> s != '')").as("syms"))
      .cache()

    val merges = Seq.newBuilder[Merge]
    var rank = 0
    var done = false
    while (rank < nMerges && !done) {
      // weighted adjacent-pair counts: one agg, map-side combined
      val top = syms
        .filter(size(col("syms")) >= 2)
        .select(col("cnt"), explode(
          expr("transform(sequence(1, size(syms) - 1), " +
            "i -> struct(element_at(syms, i) AS l, element_at(syms, i + 1) AS r))"))
          .as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("n"))
        .orderBy(col("n").desc, col("l"), col("r"))
        .limit(1)
        .collect()
      if (top.isEmpty || top(0).getLong(2) < 2) done = true
      else {
        val (l, r, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Merge(rank, l, r, n)
        val merged = mergeFold(col("syms"), l, r)
        val prev = syms
        syms = prev.select(col("cnt"), merged.as("syms")).cache()
        if ((rank + 1) % CheckpointEvery == 0) syms = syms.localCheckpoint()
        syms.count() // materialize before unpersisting the parent
        prev.unpersist()
        rank += 1
      }
    }
    syms.unpersist()
    merges.result()
  }

  /** Leftmost-first non-overlapping rewrite of (l, r) → l||r as a fold:
    * if the running result ends with l and the next symbol is r, replace
    * the tail — the replaced token (l||r) can't re-merge this round
    * because the fold compares against l, not l||r. Shared by the
    * training loop and [[applyMerges]] (the apply-time twin), so a
    * tokenizer built on the learned table segments EXACTLY as the
    * trainer did. */
  private def mergeFold(syms: org.apache.spark.sql.Column, l: String, r: String) = {
    val lLit = lit(l)
    val rLit = lit(r)
    aggregate(syms,
      array().cast("array<string>"),
      (acc, x) => when(size(acc) > 0 &&
          element_at(acc, -1) === lLit && x === rLit,
        concat(slice(acc, lit(1), size(acc) - 1), array(concat(lLit, rLit))))
        .otherwise(concat(acc, array(x))))
  }

  /** Apply a learned merge table to a symbol-array column in rank order —
    * the USE side of the trainer (graft.functions.Tokenizer.Learned
    * counts pieces with it). One fold expression per merge: expression
    * depth grows linearly with the table, so keep applied tables small
    * (Tokenizer.Learned caps at [[graft.functions.Tokenizer.Learned
    * .MaxMerges]]); a production-size vocabulary swaps in a dedicated
    * Expression behind the same seam. */
  def applyMerges(syms: org.apache.spark.sql.Column, merges: Seq[Merge]): org.apache.spark.sql.Column =
    merges.sortBy(_.rank).foldLeft(syms)((s, m) => mergeFold(s, m.left, m.right))

  /** Persist a learned merge table — the tokenizer ARTIFACT: train once
    * on the curated corpus, freeze, and budget every later pack/chunk in
    * its pieces ([[graft.functions.Tokenizer.LearnedNative]]). Frozen BY
    * DESIGN: BPE merges are not incrementally mergeable — retraining on
    * grown data changes the segmentation of already-packed shards — so
    * the daily path loads day-0's table instead of extending it (the
    * production discipline: tokenizers version with the model, not the
    * data). A |merges|-row parquet table, rank-ordered on load. */
  def save(spark: org.apache.spark.sql.SparkSession, merges: Seq[Merge], path: String): Unit = {
    import spark.implicits._
    merges.toDF().write.mode("overwrite").parquet(path)
  }

  /** Load a persisted merge table in rank order ([[save]]'s inverse). */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): Seq[Merge] = {
    import spark.implicits._
    spark.read.parquet(path).as[Merge].collect().toSeq.sortBy(_.rank)
  }

  /** Piece vocabulary of `docs` (doc_id, text) under a merge table:
    * (piece, cnt) — the vocab-file artifact next to the merges (a
    * trainer ships merges.txt AND vocab.json; this is the second half).
    * One pass via the native `graft_bpe_segment` expression + one
    * map-side-combined aggregation; the result is Zipf-small
    * (vocabulary-sized), like the trainer's word table. Pinned against
    * per-word [[segmentReference]] counting in BpeTrainerSpec. */
  def vocabulary(docs: DataFrame, merges: Seq[Merge]): DataFrame = {
    graft.GraftExtensions.register(docs.sparkSession)
    val sorted = merges.sortBy(_.rank)
    docs.filter(col("text").isNotNull)
      .select(explode(call_function("graft_bpe_segment", col("text"),
        lit(sorted.map(_.left).toArray), lit(sorted.map(_.right).toArray)))
        .as("piece"))
      .groupBy(col("piece")).agg(count(lit(1)).as("cnt"))
  }

  /** Single-JVM reference segmentation of one word under a merge table
    * (rank order, leftmost-first non-overlapping per round) — the spec
    * oracle for [[applyMerges]]. */
  def segmentReference(word: String, merges: Seq[Merge]): Vector[String] = {
    var s = word.toVector.map(_.toString)
    for (m <- merges.sortBy(_.rank)) {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < s.length) {
        if (i + 1 < s.length && s(i) == m.left && s(i + 1) == m.right) {
          out += m.left + m.right; i += 2
        } else { out += s(i); i += 1 }
      }
      s = out.result()
    }
    s
  }

  /** Independent single-JVM reference (the spec's oracle): same algorithm
    * over an in-memory word-count map, written against scala collections
    * rather than Spark expressions. */
  def trainReference(wordCounts: Map[String, Long], nMerges: Int): Seq[Merge] = {
    var syms: Map[Vector[String], Long] = wordCounts.map { case (w, c) =>
      w.toVector.map(_.toString) -> c
    }
    val merges = Seq.newBuilder[Merge]
    var rank = 0
    var done = false
    while (rank < nMerges && !done) {
      val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((s, c) <- syms; i <- 0 until s.length - 1)
        pairCounts((s(i), s(i + 1))) = pairCounts.getOrElse((s(i), s(i + 1)), 0L) + c
      val best = pairCounts.toSeq.sortBy { case ((l, r), n) => (-n, l, r) }.headOption
      best match {
        case Some(((l, r), n)) if n >= 2 =>
          merges += Merge(rank, l, r, n)
          syms = syms.groupMapReduce { case (s, _) =>
            val out = Vector.newBuilder[String]
            var i = 0
            while (i < s.length) {
              if (i + 1 < s.length && s(i) == l && s(i + 1) == r) {
                out += l + r; i += 2
              } else { out += s(i); i += 1 }
            }
            out.result()
          }(_._2)(_ + _)
          rank += 1
        case _ => done = true
      }
    }
    merges.result()
  }
}

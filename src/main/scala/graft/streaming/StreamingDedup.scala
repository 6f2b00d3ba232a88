package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.queries.CrossHash.shingleHashes

/** Streaming near-duplicate detection: an unbounded stream of documents
  * probed against the STATIC corpus shingle index — the continuous-
  * ingestion twin of `operators/IncrementalDedup` (whose batch form this
  * provably matches, see StreamingSpec).
  *
  * Division of labor in a streaming ingestion pipeline:
  *  - stream-vs-stream exact dups → [[StatefulOps.dedupStream]]
  *    (watermark-bounded dropDuplicates state);
  *  - stream-vs-corpus NEAR dups → this probe (stream-static join; the
  *    corpus index carries no streaming state at all).
  *
  * Scale shape: the index is built once and at 100 TB lives bucketed by
  * `h` on disk, so each micro-batch's join is a bucket-pruned lookup of
  * only the batch's shingle hashes — per-trigger cost is bounded by the
  * batch, never the corpus (the IncrementalDedup doctrine). The aggregate
  * groups on (window, pair) under the stream's watermark, so pair state is
  * evicted once the window closes — append mode emits each verified pair
  * exactly once.
  */
object StreamingDedup {
  /** Static corpus shingle index: one row per distinct (doc_id, shingle
    * hash), denormalized with the doc's total shingle count `nb` — one
    * precomputed table so each micro-batch joins ONCE (a separate count
    * join would re-shuffle corpus rows every trigger). */
  def corpusIndex(corpus: DataFrame): DataFrame = {
    graft.GraftExtensions.register(corpus.sparkSession)
    val sh = corpus
      .select(col("doc_id").as("b_doc"), explode(shingleHashes(col("text"))).as("h"))
      .distinct()
    val cnt = sh.groupBy(col("b_doc")).agg(count(lit(1)).as("nb"))
    sh.join(cnt, "b_doc")
  }

  /** Distinct shingle hashes of a (streaming or batch) document frame,
    * with the per-doc count carried on every row (computed row-locally —
    * no streaming aggregate needed for the denominator). */
  private def streamShingles(docs: DataFrame, eventTimeCol: String): DataFrame =
    docs
      .select(col("doc_id").as("a_doc"), col(eventTimeCol).as("_ts"), col("text"))
      .withColumn("hs", array_distinct(shingleHashes(col("text"))))
      .withColumn("na", size(col("hs")).cast("long"))
      .select(col("a_doc"), col("_ts"), col("na"), explode(col("hs")).as("h"))

  /** Near-dup pairs (a_doc from the stream, b_doc from the corpus,
    * jaccard ≥ threshold), emitted once per pair when the event-time
    * window closes under the watermark. `docs` needs columns
    * (doc_id, text, `eventTimeCol`). */
  def nearDupProbe(docs: DataFrame, index: DataFrame, threshold: Double,
      eventTimeCol: String = "ts", watermark: String = "10 minutes",
      window: String = "10 minutes"): DataFrame = {
    val probe = streamShingles(docs.withWatermark(eventTimeCol, watermark), eventTimeCol)
    val j = col("inter").cast("double") / (col("na") + col("nb") - col("inter"))
    probe
      .join(index, "h") // stream-static: corpus side is never stateful
      .groupBy(org.apache.spark.sql.functions.window(col("_ts"), window),
        col("a_doc"), col("b_doc"), col("na"), col("nb"))
      .agg(count(lit(1)).as("inter"))
      .filter(j >= threshold)
      .select(col("a_doc"), col("b_doc"), j.as("jaccard"))
  }

  /** Streaming line (paragraph) dedup: each arriving document is rebuilt
    * with every segment whose hash the STATIC corpus index holds removed,
    * emitted once when its event-time window closes — the continuous twin
    * of `LineSegmentIndex.probeDedup`'s corpus-suppression leg.
    * Stream-vs-stream duplicate segments are out of scope for a
    * stream-static join (the [[StatefulOps.dedupStream]] division of
    * labor, same as the near-dup probe above); a daily
    * `LineSegmentIndex.append` folds the day's segments in for tomorrow.
    *
    * Per-trigger cost: the batch's segments (narrow explode) left-join
    * the bucketed index co-located, then re-group under the watermark —
    * bounded by the batch, never the corpus. `docs` needs
    * (doc_id, text, `eventTimeCol`); `index` is the distinct-hash frame
    * ([[graft.operators.LineSegmentIndex.hashSet]] or the materialized
    * table). */
  def lineProbe(docs: DataFrame, index: DataFrame,
      eventTimeCol: String = "ts", watermark: String = "10 minutes",
      window: String = "10 minutes"): DataFrame = {
    graft.GraftExtensions.register(docs.sparkSession)
    val segs = graft.operators.LineSegmentIndex.segments(
        docs.withWatermark(eventTimeCol, watermark),
        carry = Seq(eventTimeCol))
    segs
      .join(index.withColumn("in_corpus", lit(1)), Seq("h"), "left")
      .withColumn("kept", col("in_corpus").isNull)
      .groupBy(org.apache.spark.sql.functions.window(col(eventTimeCol), window),
        col("doc_id"))
      .agg(count(lit(1)).as("n_segs"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(when(col("kept"), struct(col("seg_idx"), col("seg"))))),
          x => x("seg")), " ").as("dedup_text"))
      .select(col("doc_id"), col("n_segs"), col("n_kept"), col("dedup_text"))
  }

  /** Distinct trigram hashes of the standing corpus — the static context
    * for [[spanScrubProbe]]. A stream doc's trigram occurrence shared
    * with ANY corpus doc is a cross-doc duplicate (the stream doc itself
    * is the second occurrence), so presence — not df ≥ 2 — is the probe
    * criterion. */
  def trigramSet(corpus: DataFrame): DataFrame = {
    graft.GraftExtensions.register(corpus.sparkSession)
    corpus.select(explode(shingleHashes(col("text"))).as("h")).distinct()
  }

  /** Streaming duplicated-span scrub: each arriving document is rebuilt
    * with every token cut that sits inside a trigram the STATIC corpus
    * contains — the continuous twin of `dedup_span_scrub`'s incremental
    * (corpus-suppression) form, emitted once per doc when its event-time
    * window closes. Within-stream cross-doc duplicates are out of scope
    * for a stream-static join ([[StatefulOps.dedupStream]] doctrine);
    * chaining this AFTER [[lineProbe]] in one query is the daily-batch
    * `pipeline_clean`'s job — one stateful aggregate per streaming query
    * keeps the state story trivial.
    *
    * posexplode_outer keeps trigram-less (< 3 token) documents flowing —
    * they pass through unscrubbed instead of vanishing from the output.
    * `docs` needs (doc_id, text, `eventTimeCol`); `index` is
    * [[trigramSet]]'s frame (or its materialized table). */
  def spanScrubProbe(docs: DataFrame, index: DataFrame,
      eventTimeCol: String = "ts", watermark: String = "10 minutes",
      window: String = "10 minutes"): DataFrame = {
    graft.GraftExtensions.register(docs.sparkSession)
    val base = docs.withWatermark(eventTimeCol, watermark)
      .select(col("doc_id"), col(eventTimeCol).as("_ts"),
        graft.queries.CrossHash.tokens(col("text")).as("w"),
        shingleHashes(col("text")).as("hs"))
      .select(col("doc_id"), col("_ts"), col("w"),
        posexplode_outer(col("hs")).as(Seq("q", "h")))
    base
      .join(index.withColumn("dup", lit(1)), Seq("h"), "left")
      .groupBy(org.apache.spark.sql.functions.window(col("_ts"), window),
        col("doc_id"))
      .agg(first(col("w")).as("w"),
        sort_array(collect_list(when(col("dup") === 1, col("q")))).as("ds"))
      .withColumn("kept", expr(
        "filter(sequence(0, size(w) - 1), i -> NOT exists(ds, q -> q >= i - 2 AND q <= i))"))
      .select(col("doc_id"),
        size(col("w")).cast("long").as("n_tokens"),
        (size(col("w")) - size(col("kept"))).cast("long").as("n_removed"),
        array_join(expr("transform(kept, i -> element_at(w, i + 1))"), " ")
          .as("scrub_text"))
  }

  /** Static corpus cell index for SEMANTIC (embedding) streaming dedup:
    * one row per corpus vector with its hyperplane cell
    * (`queries/DedupQueries.dedup_semantic`'s deterministic coarse
    * partition), normalized vector and norm. At 100 TB this table lives
    * PARTITIONED BY cluster on disk, so a micro-batch's probe reads only
    * the cells its vectors land in. `corpus` needs (vec_id, embedding).
    * Size `bits` with [[semanticBitsFor]] — the cell count must grow with
    * the corpus exactly as the batch pass's does. */
  def semanticIndex(corpus: DataFrame, bits: Int, dim: Int): DataFrame = {
    graft.GraftExtensions.register(corpus.sparkSession)
    val flat: Seq[Double] =
      graft.queries.CrossHash.embPlanesFor(1, bits, dim).flatten.map(_.toDouble)
    corpus
      .select(col("vec_id").as("b_vec"), col("embedding").cast("array<double>").as("bv"))
      .withColumn("bnrm", sqrt(expr("graft_dot(bv, bv)")))
      .withColumn("cluster", element_at(call_function("graft_lsh_bands",
        col("bv"), typedLit(flat), lit(1), lit(bits)), 1))
  }

  /** Static corpus perceptual-hash band index for streaming media dedup:
    * one row per (band, band-bits) bucket of each corpus fingerprint —
    * image aHashes ([[graft.multimodal.Multimodal.perceptualHashes]]) or
    * audio energy contours ([[graft.multimodal.Multimodal.audioHashes]]),
    * the probe is fingerprint-agnostic. At 100 TB this table lives
    * PARTITIONED BY (band, bb) on disk so a micro-batch reads only its
    * buckets. `hashes` needs (asset_id, fp) — pre-filter to
    * decoded-only rows ([[graft.multimodal.Multimodal]] doctrine: an
    * undecodable asset must not pseudo-match). */
  def perceptualIndex(hashes: DataFrame, bands: Int = 3,
      bits: Int = 64): DataFrame = {
    val offsets = graft.operators.HammingBands.offsetsFor(bits, bands)
    val bandStructs = offsets.map { case (b, shift, mask) =>
      struct(lit(b).as("band"),
        shiftright(col("fp"), shift).bitwiseAND(lit(mask)).as("bb"))
    }
    hashes
      .select(col("asset_id").as("b_asset"), col("fp").as("b_fp"),
        explode(array(bandStructs: _*)).as("x"))
      .select(col("b_asset"), col("b_fp"),
        col("x.band").as("band"), col("x.bb").as("bb"))
  }

  /** Streaming perceptual near-dup verdicts: each arriving fingerprint's
    * lowest-id corpus partner within `maxHamming` bits, emitted once when
    * its event-time window closes — the continuous twin of
    * `Multimodal.perceptualPairs`/`audioPairs` restricted to
    * stream-vs-corpus (stream-vs-stream dups are
    * [[StatefulOps.dedupStream]]'s job, the standing division of labor).
    *
    * Same exact pigeonhole guarantee as the batch path (maxHamming ≤
    * bands − 1, so a qualifying pair matches in SOME band); a pair
    * matching several bands is counted once via the first-matching-band
    * filter — a row-local predicate, not a distinct shuffle. Per-trigger
    * cost: the batch's fingerprints explode to `bands` rows and join
    * only their (band, bb) buckets of the static index. `hashes` needs
    * (asset_id, fp, `eventTimeCol`) with fp computed row-locally on the
    * stream (mapPartitions decode, as in the batch hash paths). */
  def perceptualProbe(hashes: DataFrame, index: DataFrame,
      maxHamming: Int = 2, bands: Int = 3, bits: Int = 64,
      eventTimeCol: String = "ts", watermark: String = "10 minutes",
      window: String = "10 minutes"): DataFrame = {
    val offsets = graft.operators.HammingBands.offsetsFor(bits, bands)
    require(maxHamming <= offsets.size - 1,
      s"pigeonhole needs > $maxHamming bands, got ${offsets.size}")
    val bandStructs = offsets.map { case (b, shift, mask) =>
      struct(lit(b).as("band"),
        shiftright(col("a_fp"), shift).bitwiseAND(lit(mask)).as("bb"))
    }
    val probe = hashes.withWatermark(eventTimeCol, watermark)
      .select(col("asset_id").as("a_asset"), col(eventTimeCol).as("_ts"),
        col("fp").as("a_fp"))
      .select(col("a_asset"), col("_ts"), col("a_fp"),
        explode(array(bandStructs: _*)).as("x"))
      .select(col("a_asset"), col("_ts"), col("a_fp"),
        col("x.band").as("band"), col("x.bb").as("bb"))
    val hd = bit_count(col("a_fp").bitwiseXOR(col("b_fp")))
    val noEarlierBand = offsets.foldLeft(lit(true)) {
      case (acc, (b, shift, mask)) =>
        acc && !(lit(b) < col("band") &&
          shiftright(col("a_fp"), shift).bitwiseAND(lit(mask)) ===
            shiftright(col("b_fp"), shift).bitwiseAND(lit(mask)))
    }
    probe
      .join(index, Seq("band", "bb")) // stream-static: corpus side stateless
      .filter(hd <= maxHamming && noEarlierBand &&
        col("a_asset") =!= col("b_asset"))
      .groupBy(org.apache.spark.sql.functions.window(col("_ts"), window),
        col("a_asset"))
      .agg(min(col("b_asset")).as("dup_of"), count(lit(1)).as("n_dups"))
      .select(col("a_asset").as("asset_id"), col("dup_of"), col("n_dups"))
  }

  /** Streaming semantic near-dup verdicts: each stream vector's lowest-id
    * corpus partner with cosine ≥ threshold in its cell, emitted once when
    * the event-time window closes — the continuous twin of
    * `dedup_semantic_incr`'s corpus side (stream-vs-stream near-dups are
    * out of scope for a stream-static join, exactly as exact stream dups
    * are [[StatefulOps.dedupStream]]'s job). The cell is computed
    * row-locally on the stream (narrow), so per-trigger cost is the
    * batch's vectors joined against only their cells of the static index.
    * `vecs` needs (vec_id, embedding, `eventTimeCol`). */
  /** The cell width the semantic streaming twins should run at for an
    * n-vector corpus — the SAME auto-sizing rule as the batch pass
    * ([[graft.queries.CrossHash.semGeometryFor]]), so streamed ≡ batch
    * verdict equality holds at every geometry the rule picks, not just
    * the gate's 4 bits (StreamingSpec pins the equality at a second
    * geometry). Index and probe MUST agree on `bits` — size both from
    * the standing corpus count. */
  def semanticBitsFor(corpusCount: Long): Int =
    graft.queries.CrossHash.semGeometryFor(corpusCount)

  def semanticProbe(vecs: DataFrame, index: DataFrame, threshold: Double,
      bits: Int, dim: Int, eventTimeCol: String = "ts",
      watermark: String = "10 minutes", window: String = "10 minutes"): DataFrame = {
    graft.GraftExtensions.register(vecs.sparkSession)
    val flat: Seq[Double] =
      graft.queries.CrossHash.embPlanesFor(1, bits, dim).flatten.map(_.toDouble)
    val probe = vecs.withWatermark(eventTimeCol, watermark)
      .select(col("vec_id").as("a_vec"), col(eventTimeCol).as("_ts"),
        col("embedding").cast("array<double>").as("av"))
      .withColumn("anrm", sqrt(expr("graft_dot(av, av)")))
      .withColumn("cluster", element_at(call_function("graft_lsh_bands",
        col("av"), typedLit(flat), lit(1), lit(bits)), 1))
    val cos = expr("graft_dot(av, bv)") / nullif(col("anrm") * col("bnrm"), lit(0.0))
    probe
      .join(index, "cluster") // stream-static: corpus side is never stateful
      .withColumn("cosine", cos)
      .filter(col("cosine") >= threshold)
      .groupBy(org.apache.spark.sql.functions.window(col("_ts"), window),
        col("a_vec"))
      .agg(min(col("b_vec")).as("dup_of"), count(lit(1)).as("n_dups"))
      .select(col("a_vec").as("vec_id"), col("dup_of"), col("n_dups"))
  }
}

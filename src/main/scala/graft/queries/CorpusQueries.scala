package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryModule, Tables}
import graft.functions.Tokenizer
import graft.operators.GlobalCumsum
import CrossHash._

/** Corpus-level training-data-pipeline stages over the `documents` table —
  * the cross-document operators that complement TextQueries' row-local
  * projections (which never shuffle) and DedupQueries' near-dup suite.
  *
  *  - text_decontam: benchmark decontamination — flag training documents
  *    sharing any word-3-gram with a held-out eval split. The eval
  *    shingle set is benchmark-sized (MBs against a 100 TB corpus), so
  *    AQE broadcasts it and the corpus side never shuffles; no forced
  *    hint (the dedup-broadcast doctrine: degrade to shuffle, not OOM).
  *  - doc_pack: concat-and-chunk sequence packing — each document's shard
  *    and offset under a fixed token budget per training sequence. Needs a
  *    CORPUS-WIDE prefix sum, which must NOT plan as the single-partition
  *    window `sum() OVER (ORDER BY doc_id)`; graft.operators.GlobalCumsum
  *    computes it distributed (range-bucket + in-bucket window + bucket
  *    offsets) and CorpusSpec pins equality with the naive spelling while
  *    PlanAuditSpec pins the absence of a single-partition exchange.
  *  - sample_weighted: deterministic importance sampling — keep-probability
  *    from a quality weight (here: inverse length, longer docs downsampled
  *    toward a uniform token budget), decided by a content-hash draw so
  *    the sample is bit-reproducible across engines, reruns and scales
  *    (no RNG state; the oracle draws the identical sample). Narrow — at
  *    100 TB this is a map-only pass fused into the scan.
  *  - text_tfidf: corpus IDF + per-document top-3 TF-IDF terms (keyword
  *    extraction). IDF uses the rational (N+1)/(df+1) form rather than its
  *    log: same per-term ranking, but pure IEEE mul/div that both engines
  *    evaluate bit-identically (ln differs in last-ulp across libms). The
  *    document-frequency table is vocabulary-sized — tiny next to the
  *    corpus — so AQE broadcasts it; the only corpus-sized shuffles are
  *    the two hash aggregations.
  */
object CorpusQueries extends QueryModule {
  /** Tokens per packed training sequence (doc_pack). */
  val PackBudget = 256L

  /** Eval split modulus: doc_id % EvalMod == 0 is the held-out benchmark. */
  val EvalMod = 17L

  /** mix_epoch_cap: repetition ceiling per source (tokens may be reused
    * at most this many epochs) and the training budget as a RATIONAL
    * multiple of the unique corpus (BudgetNumer/BudgetDenom = 3.5
    * epochs) so the cap-boundary test stays in exact BIGINT arithmetic
    * on both engines. Budget < EpochCap × corpus guarantees at least
    * one uncapped source, so the water-fill level always exists; 3.5 is
    * close enough to the cap that below-mean sources actually cap on
    * the test corpus (CorpusSpec pins non-vacuity). */
  val EpochCap = 4L
  val BudgetNumer = 7L
  val BudgetDenom = 2L

  /** Target tokens per kept document for the weighted sample: documents
    * with n_tokens ≤ target always keep; longer ones keep w.p.
    * target/n_tokens, equalizing expected token contribution per doc. */
  val SampleTargetTokens = 32.0

  /** doc_chunk window geometry: W-token windows at stride S (overlap
    * W−S). Test-scale constants sized to the ~35-token synthetic docs
    * (2–3 windows each); a 100 TB run uses its context length (e.g.
    * W=4096, S=3840) — the integer algebra is unchanged. */
  val ChunkTokens = 16L
  val ChunkStride = 12L

  /** doc_shuffle GATE-SCALE shard count — the static oracle SQL is
    * written at 8 shards; the REGISTERED query auto-sizes the count via
    * [[CrossHash.shardsFor]] (per-shard rows bounded at 4096, so the
    * per-shard window never grows with the corpus), which reproduces 8
    * at n ≤ 2^15 so gate runs stay hash-exact. The shard key is a
    * content hash — any count yields a valid reproducible permutation,
    * the count only changes file granularity and window parallelism. */
  val ShuffleShards = 8L

  /** sample_importance feature space: hashed-unigram bucket count (the
    * DSIR paper's hashed n-gram features) and the scaled-long snap used
    * for both the per-feature ratio and the acceptance draw. Owned by
    * [[graft.operators.DsirModel]] — the query and the materialized
    * model must agree or probe ≡ recompute breaks. */
  val DsirDim = graft.operators.DsirModel.Dim
  val DsirScale = graft.operators.DsirModel.Scale

  /** decontam_bloom false-positive rate: FPs only cost extra candidates
    * into the exact verify join (never wrong output), so this trades
    * prefilter selectivity against bloom size (~1.2 GiB per 10⁹ distinct
    * shingles at 1% — broadcastable). */
  val BloomFpp = 0.01

  /** text_oov vocabulary size: top-K corpus tokens by frequency. The
    * synthetic corpus has ~31 distinct tokens, so K=16 leaves a real OOV
    * tail; a production run uses its tokenizer vocabulary (10⁴–10⁶ terms —
    * still broadcast-sized next to the corpus). */
  val VocabTopK = 16

  /** Distinct (doc_id, 60-bit shingle hash) pairs — same shape as
    * DedupQueries' inverted index (hash BEFORE distinct so shuffle rows
    * are 8-byte longs, not shingle strings). */
  private def shingleSet(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.GraftExtensions.register(s)
    Tables.load(s, dir, "documents")
      .select($"doc_id", explode(shingleHashes($"text")).as("h"))
      .distinct()
  }

  /** mix_curriculum phase target shares per quality bin 0..3 (0 = lowest
    * quality quartile). Warmup is uniform; anneal is quality-heavy. Each
    * phase sums to 1. Spelled as literals in BOTH engines (same parsed
    * doubles). */
  val CurriculumWarmup = Seq(0.25, 0.25, 0.25, 0.25)
  val CurriculumMid = Seq(0.10, 0.20, 0.30, 0.40)
  val CurriculumAnneal = Seq(0.05, 0.15, 0.30, 0.50)

  /** Per-training-doc contamination counts vs the eval split, from a
    * (doc_id, h) shingle index: (doc_id, n_shingles, n_contaminated).
    * The eval shingle set is benchmark-sized — AQE broadcasts it, no
    * mandated hint (PlanAuditSpec). */
  private def contamination(sh: DataFrame): DataFrame = {
    val evalH = sh.filter(col("doc_id") % EvalMod === 0).select(col("h")).distinct()
      .withColumn("hit", lit(1L))
    sh.filter(col("doc_id") % EvalMod =!= 0)
      .join(evalH, Seq("h"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("hit"), lit(0L))).as("n_contaminated"))
  }

  /** decontam_runs report threshold: a (train, eval) pair appears when
    * its longest contiguous shared token run reaches this many tokens
    * (= MinRunTokens − 2 consecutive trigram starts), and n_runs counts
    * maximal runs at or above it. Production uses 50 (the Lee et al.
    * cut); 5 keeps the gate non-vacuous on the short synthetic docs. */
  val MinRunTokens = 5L

  /** decontam_runs' spelling with the df-ceiling elision knob (the
    * dedupSpans pattern): an over-ceiling shingle joins on neither side.
    * Default 1.0 = the exact oracle baseline. */
  private[graft] def decontamRuns(s: SparkSession, dir: String,
      maxDfFrac: Double = 1.0): DataFrame = {
    import s.implicits._
    graft.GraftExtensions.register(s)
    // NOT cached (r17 optimization note): the train/eval sides are
    // disjoint filters of one positioned pass, but eval is ~1/EvalMod of
    // the rows — materializing ALL positions to save the small side's
    // re-explode measured net-negative (0.71→0.74 s)
    val occAll = Tables.load(s, dir, "documents")
      .select($"doc_id", posexplode(shingleHashes($"text")).as(Seq("q", "h")))
    val occ = if (maxDfFrac >= 1.0) occAll
      else occAll.join(DedupQueries.hotShingles(
        occAll.select($"doc_id", $"h").distinct(), maxDfFrac),
        Seq("h"), "left_anti")
    graft.operators.OverlapIndex.runsFrames(
      occ.filter($"doc_id" % EvalMod =!= 0),
      occ.filter($"doc_id" % EvalMod === 0), MinRunTokens)
  }

  /** decontam_scrub's spelling with the df-ceiling elision knob (the
    * dedupSpans pattern): an over-ceiling shingle joins on neither side,
    * so it neither starts a run nor scrubs its tokens. Default 1.0 = the
    * exact oracle baseline. */
  private[graft] def decontamScrub(s: SparkSession, dir: String,
      maxDfFrac: Double = 1.0): DataFrame = {
    import s.implicits._
    graft.GraftExtensions.register(s)
    // NOT cached: same asymmetric-sides reasoning as [[decontamRuns]]
    // (measured net-negative in r17)
    val occAll = Tables.load(s, dir, "documents")
      .select($"doc_id", posexplode(shingleHashes($"text")).as(Seq("q", "h")))
    val occ = if (maxDfFrac >= 1.0) occAll
      else occAll.join(DedupQueries.hotShingles(
        occAll.select($"doc_id", $"h").distinct(), maxDfFrac),
        Seq("h"), "left_anti")
    graft.operators.OverlapIndex.scrubFrames(
      Tables.load(s, dir, "documents")
        .filter($"doc_id" % EvalMod =!= 0).select($"doc_id", $"text"),
      occ.filter($"doc_id" % EvalMod =!= 0),
      occ.filter($"doc_id" % EvalMod === 0),
      MinRunTokens)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Benchmark decontamination: per training doc, how many of its
    // 3-gram shingles appear anywhere in the eval split.
    "text_decontam" -> { (s, dir) =>
      import s.implicits._
      contamination(shingleSet(s, dir))
        .withColumn("contam_frac", $"n_contaminated".cast("double") / $"n_shingles")
    },

    // Longest contiguous train↔eval overlap RUNS — the Lee et al. 2022
    // measurement behind "no 50-token span shared with the benchmark"
    // (Deduplicating Training Data Makes Language Models Better, §4).
    // text_decontam flags ANY shared trigram; this reports, per
    // (eval doc, training doc) pair, the longest contiguous matching
    // token run and how many maximal runs reach [[MinRunTokens]] — the
    // evidence a contamination review actually reads (one boilerplate
    // trigram and a verbatim 40-token quote both "contaminate"; only
    // one matters).
    //
    // Diagonal algebra: positioned trigram occurrences join on the
    // 8-byte shingle hash; each match lies on diagonal qt − qe, and
    // consecutive eval positions within one (t_doc, e_doc, diag) group
    // form maximal islands (island id = qe − row_number, the standard
    // gaps-and-islands trick — all integer, so the chain re-derives
    // bit-identically in DuckDB). An island of L trigram starts covers
    // L + 2 contiguous tokens, and the per-pair max over diagonals IS
    // the longest common contiguous token substring (DedupScaleSpec
    // pins the equality against a brute-force reference).
    //
    // Scale shape: the eval side is benchmark-sized (AQE broadcasts
    // it); join cost is O(matching hash pairs), df-ceiled by the same
    // maxDfFrac knob as the other exact-shingle paths (default 1.0 =
    // the exact oracle baseline; DedupScaleSpec pins elided ≡ the
    // reference over surviving shingles); the island window partitions on
    // (t_doc, e_doc, diag) — per-pair match counts, never
    // corpus-sized. No pairwise doc join anywhere.
    "decontam_runs" -> { (s, dir) => decontamRuns(s, dir) },

    // The ACTION form of decontam_runs — Lee et al. 2022's remedy
    // applied to benchmark overlap: instead of dropping whole training
    // docs (text_decontam's ≥50% rule) or only reporting the evidence
    // (decontam_runs), scrub exactly the tokens covered by any
    // ≥MinRunTokens contiguous run shared with the eval split and
    // rebuild the text — a doc quoting one benchmark passage loses the
    // passage, not its training value. Same diagonal/island skeleton as
    // decontam_runs (one extra same-partitioning window for the island
    // size), then dedup_span_scrub's row-local token rebuild. Train
    // rows only; eval docs are never rewritten.
    "decontam_scrub" -> { (s, dir) => decontamScrub(s, dir) },

    // The SAME scrub probed against a MATERIALIZED positioned index of
    // the EVAL BENCHMARK — roles mirrored vs decontam_runs_idx: the
    // benchmark (MBs) is the standing artifact, and each day's training
    // batch scrubs against it at batch cost (the benchmark index
    // broadcast-joins, so the training mass never shuffles for the
    // match step). Shares decontam_scrub's oracle, so the driver gate
    // makes index probe ≡ from-scratch recompute an equality.
    "decontam_scrub_idx" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents").select($"doc_id", $"text")
      s.sql("DROP TABLE IF EXISTS graft_q_scrub_idx")
      s.sql("DROP TABLE IF EXISTS graft_q_scrub_idx_tombstones")
      graft.operators.OverlapIndex.materialize(
        docs.filter($"doc_id" % EvalMod === 0), "graft_q_scrub_idx")
      graft.operators.OverlapIndex.scrubProbe(
        s, "graft_q_scrub_idx", docs.filter($"doc_id" % EvalMod =!= 0),
        MinRunTokens)
    },

    // The SAME relation probed against the MATERIALIZED positioned
    // shingle index (operators/OverlapIndex) — the production spelling:
    // "a new benchmark was adopted; which standing training docs share
    // long verbatim runs with it?" costs a full corpus re-shingle per
    // benchmark revision without the index, a bucket-pruned probe with
    // it. Shares decontam_runs' oracle SQL, so the driver gate makes
    // index probe ≡ from-scratch recompute an equality (the
    // dedup_containment_idx / knn_ivfadc gate-vs-index pairing).
    "decontam_runs_idx" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents").select($"doc_id", $"text")
      s.sql("DROP TABLE IF EXISTS graft_q_runs_idx")
      s.sql("DROP TABLE IF EXISTS graft_q_runs_idx_tombstones")
      graft.operators.OverlapIndex.materialize(
        docs.filter($"doc_id" % EvalMod =!= 0), "graft_q_runs_idx")
      graft.operators.OverlapIndex.runsProbe(
        s, "graft_q_runs_idx", docs.filter($"doc_id" % EvalMod === 0),
        MinRunTokens)
    },

    // SEMANTIC decontamination — the third leg of the decontam trio
    // (exact n-gram, bloom-accelerated, and now embedding-space): a
    // training vector is contaminated when an eval-split vector in its
    // hyperplane cell has cosine ≥ 0.4 — catching the paraphrased/
    // near-duplicate benchmark leakage that no n-gram overlap sees.
    // dedup_semantic's machinery with eval/train roles: the probe keys
    // on the cell (Σ|cell_tr|·|cell_ev| cost, never all-pairs), and the
    // eval side is benchmark-sized so AQE broadcasts it unhinted. The
    // eval split is vec_id % EvalMod (the embedding mirror of
    // text_decontam's doc split).
    "decontam_semantic" -> { (s, dir) =>
      import s.implicits._
      graft.GraftExtensions.register(s)
      val flat: Seq[Double] =
        DedupQueries.semPlanesFor(DedupQueries.SemBits).flatten.map(_.toDouble)
      val e = DedupQueries.embVecs(s, dir)
        .withColumn("cluster", element_at(call_function("graft_lsh_bands",
          $"v", typedlit(flat), lit(1), lit(DedupQueries.SemBits)), 1))
      val evalSide = e.filter($"vec_id" % EvalMod === 0)
      val train = e.filter($"vec_id" % EvalMod =!= 0)
      val cos = expr("graft_dot(av, bv)") / nullif(col("anrm") * col("bnrm"), lit(0.0))
      val hits = train
        .select($"cluster", $"vec_id", $"v".as("av"), $"nrm".as("anrm")).as("a")
        .join(evalSide.select($"cluster", $"vec_id".as("vec_e"), $"v".as("bv"),
          $"nrm".as("bnrm")).as("b"), "cluster")
        .filter(cos >= 0.4)
        .groupBy($"vec_id")
        .agg(min($"vec_e").as("contam_of"), count(lit(1)).as("n_eval_dups"))
      train.select($"vec_id", $"cluster")
        .join(hits, Seq("vec_id"), "left")
        .select($"vec_id", $"cluster", $"contam_of",
          coalesce($"n_eval_dups", lit(0L)).as("n_eval_dups"),
          $"contam_of".isNull.as("keep"))
    },

    // Concat-and-chunk sequence packing: documents stream in doc_id order
    // into fixed PackBudget-token training sequences; each doc lands at
    // (shard, shard_offset) of the concatenated token stream.
    "doc_pack" -> { (s, dir) => docPack(s, dir) },

    // Sliding-context-window chunking: each document splits into
    // fixed-size token windows with overlap (stride < window) — the
    // example-preparation step between curation and tokenizer packing
    // (doc_pack packs whole docs into sequences; this splits long docs
    // into training-context windows). Pure integer arithmetic on token
    // COUNTS (ceil-division chunk count, clamped end), so the oracle is
    // hash-exact; the explode is a narrow map pass — per-doc fan-out is
    // ceil((n-W)/S)+1 rows of 5 longs, no shuffle at all.
    "doc_chunk" -> { (s, dir) => docChunk(s, dir) },

    // In-context pretraining packing (Shi et al. 2023): pack RELATED
    // documents into the same training sequence by ordering the token
    // stream on (semantic cell, doc_id) instead of doc_id alone — same
    // GlobalCumsum prefix-sum machinery as doc_pack over a composite
    // order key, so the packing stays distributed (no single-partition
    // window) and the oracle is hash-exact. Production swaps the
    // deterministic cells for trained clusters or a doc-graph traversal;
    // the packing algebra is unchanged.
    "doc_pack_semantic" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
        .select($"doc_id", size(tokens($"text")).cast("long").as("n_tokens"))
      val cells = semCells(s, dir).withColumnRenamed("vec_id", "doc_id")
      val keyed = docs.join(cells, "doc_id")
        .withColumn("ord", $"cluster" * lit(1L << 40) + $"doc_id")
      GlobalCumsum.runningBefore(keyed, "ord", "n_tokens", "cb")
        .select($"doc_id", $"cluster", $"n_tokens",
          expr(s"CAST(cb DIV $PackBudget AS BIGINT)").as("shard"),
          ($"cb" % PackBudget).as("shard_offset"))
    },

    // Deterministic length-weighted sampling: hash draw vs an integer
    // threshold, so both engines (and any rerun) keep the identical set.
    "sample_weighted" -> { (s, dir) => sampleWeighted(s, dir) },

    // DSIR-shaped importance resampling (Xie et al. 2023): keep raw-corpus
    // documents that look like a target distribution, scored by hashed
    // unigram feature-frequency ratios (see sampleImportance scaladoc).
    "sample_importance" -> { (s, dir) => sampleImportance(s, dir) },

    // Training-mixture rebalancing: per-source sampling rates that
    // equalize each source's token contribution (the data-mixing stage of
    // a pretraining pipeline — rate_s = min(1, fair_share / tokens_s)).
    // Two tiny aggregates (per-source, global) — the global total joins
    // back as a 1-row cross join, so the whole allocation is
    // O(sources) after one corpus pass.
    "mix_allocation" -> { (s, dir) => mixAllocation(s, dir) },

    // NOVELTY-WEIGHTED mixture shares — the text_novelty audit folded
    // into the mixing family: a feed that mostly re-sends content the
    // corpus already holds (low first-occurrence share) should not keep
    // its token-proportional share of the training mix. Per source:
    // aggregate first-occurrence counts over the one shingle pass, then
    // novelty_ppm = novel·10⁶ ÷ shingles (integer floor) and the
    // mixture weight w_ppm = the source's share of all novel shingles —
    // every number an exact integer, so the whole reweighting
    // hash-checks cross-engine. O(sources) output; composes with
    // mix_allocation/mix_temperature the way mix_domains does.
    "mix_novelty" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      // sh cached: it feeds the first-occurrence aggregate AND the
      // join-back (the text_novelty shape — r17 optimization)
      val sh = docs.select($"doc_id", explode(shingleHashes($"text")).as("h"))
        .distinct()
        .cache()
      val firsts = sh.groupBy($"h").agg(min($"doc_id").as("first_doc"))
      val perDoc = sh.join(firsts, "h")
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("ns"),
          sum(when($"first_doc" === $"doc_id", 1L).otherwise(0L)).as("nn"))
      // cached: the O(sources) rollup feeds both the total-novel scalar
      // and the final projection — uncached, the whole shingle chain
      // executed twice per run (r17 optimization). The scalar stays the
      // driver-side .head read (not a 1-row cross join): PlanAuditSpec
      // pins this family's RETURNED plan free of SinglePartition
      // exchanges, and the scalar's own 1-row aggregate runs over the
      // cache, outside the returned plan.
      val perSrc = docs.select($"doc_id", $"source")
        .join(perDoc, "doc_id")
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          sum($"ns").as("n_shingles"), sum($"nn").as("n_novel"))
        .cache()
      val totalNovel = perSrc.agg(coalesce(sum($"n_novel"), lit(0L)))
        .head.getLong(0)
      perSrc.select($"source", $"n_docs", $"n_shingles", $"n_novel",
        expr("(n_novel * 1000000) div n_shingles").as("novelty_ppm"),
        (if (totalNovel == 0L) lit(0L)
         else expr(s"(n_novel * 1000000) div $totalNovel")).as("w_ppm"))
    },

    // Data-constrained mixture allocation (the "scaling data-constrained
    // LMs" regime): the token BUDGET exceeds the unique corpus, so
    // sources must repeat — but value decays past a few epochs, so each
    // source is capped at capacity = EpochCap · unique tokens and the
    // budget WATER-FILLS: capped sources contribute all their capacity,
    // every other source gets the common level L with
    // Σ min(capacity, L) = budget. The cap boundary has an exact closed
    // form on the capacity-ascending order (prefix sums: source i is
    // capped iff cap_i·(n-i+1) + P_{i-1} < budget — capped sources are
    // always a prefix), so the whole allocation is ONE window pass over
    // the O(sources) table after the per-source token count: no
    // iteration, no driver loop. The single-partition window is over
    // sources (a handful of rows at any corpus size), not data.
    "mix_epoch_cap" -> { (s, dir) =>
      import s.implicits._
      mixEpochCap(
        Tables.load(s, dir, "documents")
          .select($"source", Tokenizer.Whitespace.count($"text").as("n"))
          .groupBy($"source")
          .agg(sum($"n").as("n_tokens")))
    },

    // Domain-balanced mixture: mix_allocation keyed by SEMANTIC domain
    // instead of source label — the cluster-balanced sampling step of a
    // pretraining pipeline (DoReMi-adjacent: equalize token contribution
    // across embedding-space regions so one over-crawled topic can't
    // dominate an epoch). Domains are dedup_semantic's deterministic
    // hyperplane cells (2^SemBits coarse cells; production swaps in the
    // trained k-means quantizer exercised by knn_ivf_kmeans — the
    // allocation algebra is unchanged), so the oracle builds the
    // identical partition and the rates verify exactly. Plan: one
    // embeddings pass for cells, an id-keyed join to the token counts
    // (co-locate by storing both tables id-bucketed at scale), a
    // cells-sized agg, and a 1-row totals cross join — O(cells) output.
    "mix_domains" -> { (s, dir) => mixDomains(s, dir) },

    // The selection DAG as ONE job — the round-8 gate family composed
    // the way a curation run actually chains them: Gopher repetition
    // gate → DSIR importance resample → domain-balanced rate draw. Each
    // stage only narrows; every gate is the oracle-checked operator's
    // verbatim spelling (the queries above), so the composed kept set
    // verifies hash-exact end-to-end. The final draw is content-hashed
    // (sample_weighted's doctrine) against the doc's semantic-cell rate.
    "pipeline_select" -> { (s, dir) => pipelineSelect(s, dir) },

    // The full curation DAG as ONE job — what a user actually runs over a
    // raw crawl: quality gate → exact dedup (keep lowest doc_id per
    // content digest) → benchmark decontamination (drop docs with ≥50%
    // eval shingle overlap, and the eval split itself) → sequence packing
    // of the survivors. Each stage only narrows the previous one, so the
    // whole pipeline costs: one corpus scan + the dedup digest shuffle +
    // the (eval-broadcast) decontam join + GlobalCumsum's bucketed
    // window — no stage re-reads the input.
    "pipeline_curate" -> { (s, dir) => pipelineCurate(s, dir) },

    // pipeline_curate with the optional NEAR-DUP stage on — the
    // production curation DAG at full strength: after the exact-digest
    // dedup and decontam stages, docs that are near-duplicates (exact
    // word-3-gram jaccard ≥ 0.6) of a surviving lower-id doc also drop
    // (lowest-id-wins over the verified pair graph — the dedup_clusters
    // verdict algebra as a stage), and the thinner survivor set packs.
    // Cost on top of pipeline_curate is the candidate-bounded shingle
    // self-join over SURVIVORS (boilerplate already gate-dropped) + the
    // doubling-contraction components loop; the pair relation is the
    // oracle-checked dedup_ngram_jaccard algebra restricted to the
    // survivor set. CurationJob (day 0) and DailyIncrement (batch gate,
    // probe-fed at |batch| cost) run the same verdict.
    "pipeline_curate_neardup" -> { (s, dir) => pipelineCurateNearDup(s, dir) },

    // pipeline_curate with the token-level SCRUB stage on — the decontam
    // drop rule catches mostly-benchmark docs; this catches the long
    // verbatim benchmark quote inside an otherwise-clean doc (the
    // decontam_scrub island algebra over the CURATED frames) and packs
    // on post-scrub token counts. Cost on top of pipeline_curate: the
    // positioned re-shingle of survivors + the benchmark-broadcast hash
    // join — the island windows partition on (pair, diag), never
    // corpus-global. CurationJob (day 0, benchIndex=) and DailyIncrement
    // (per batch, against the maintained positioned benchmark index at
    // |batch| probe cost) run the same stage.
    "pipeline_curate_scrub" -> { (s, dir) => pipelineCurateScrub(s, dir) },

    // pipeline_curate with the SPAN KEEP-FIRST stage on — intra-corpus
    // duplicated-span removal that keeps the first (lowest-id) copy of
    // every duplicated trigram run and packs on post-scrub token counts
    // (dedup_span_keepfirst as a curation stage; the near-dup gate drops
    // whole documents, this excises the shared passages that survive
    // it — boilerplate, license blocks, quote chains). Cost on top of
    // pipeline_curate: one positioned shingle pass + the per-hash keeper
    // aggregate — no pairwise doc join. CurationJob (day 0, spanIndex=)
    // and DailyIncrement (per batch, probing the maintained shingle
    // index at |batch| cost — arrival-order keep-first, EXACTLY equal to
    // a union rebuild because keeper = min id = first arrival) run the
    // same stage.
    "pipeline_curate_spans" -> { (s, dir) => pipelineCurateSpans(s, dir) },

    // the FULL-STRENGTH DAG: every optional stage on in CurationJob's
    // composition order (near-dup drops docs on RAW text; then the
    // benchmark-scrub and span-keep-first dup starts UNION into one
    // token rebuild; packing on post-scrub counts) — the production
    // invocation, oracle-checked END TO END so the stage COMPOSITION is
    // itself a driver-gate hash equality, not just each stage alone.
    "pipeline_curate_full" -> { (s, dir) => pipelineCurateFull(s, dir) },

    // The fate trace for the FULL-STRENGTH DAG — pipeline_audit_neardup's
    // verdict CASE (near-dup drops land between 'contaminated' and
    // 'kept') PLUS both text-rewriting stages' per-doc effect: n_removed
    // is the tokens excised by the UNION of benchmark-scrub and
    // span-keep-first dup starts (the one-rebuild composition
    // pipeline_curate_full packs), and shard placement comes from that
    // post-scrub packing. One row answers every "what happened to doc X
    // in production?" ticket the composed pipeline fields. The cached
    // cluster table feeds BOTH the fate column and the packing through
    // packCurateFull, so the components loop runs once per query.
    "pipeline_audit_full" -> { (s, dir) =>
      import s.implicits._
      val (docs, dups, contam) = auditStageFrames(s, dir)
      val train = curatedTrain(s, dir).cache()
      val clusters = nearDupClusters(train).cache()
      val nd = train
        .join(clusters.filter($"cluster" === $"doc_id").select($"doc_id"),
          Seq("doc_id"), "left_semi")
        .select($"doc_id", $"text").cache()
      val packed = packCurateFull(s, dir, Tokenizer.Whitespace, nd)
        .select($"doc_id", $"n_removed", $"shard", $"shard_offset")
      // materialized so the caches release before the return (the
      // pipelineCurateFull leak discipline applied to the audit twin)
      val out = docs.select($"doc_id", $"n_tokens")
        .join(dups, Seq("doc_id"), "left")
        .join(contam, Seq("doc_id"), "left")
        .join(clusters, Seq("doc_id"), "left")
        .join(packed, Seq("doc_id"), "left")
        .select($"doc_id", $"n_tokens",
          when($"keep_id".isNull, lit("gate_failed"))
            .when($"keep_id" =!= $"doc_id", lit("dup"))
            .when($"doc_id" % EvalMod === 0, lit("eval_split"))
            .when($"contam_frac" >= 0.5, lit("contaminated"))
            .when($"cluster" =!= $"doc_id", lit("neardup"))
            .otherwise(lit("kept")).as("fate"),
          when($"keep_id" =!= $"doc_id", $"keep_id")
            .when($"cluster" =!= $"doc_id", $"cluster").as("dup_of"),
          $"contam_frac", $"n_removed", $"shard", $"shard_offset")
        .localCheckpoint(true)
      clusters.unpersist(); nd.unpersist(); train.unpersist()
      out
    },

    // pipeline_audit with the near-dup stage in the fate order — the
    // operability trace for the full-strength DAG: 'neardup' lands
    // between 'contaminated' and 'kept', dup_of reports the cluster
    // keeper the doc lost to (the exact-dedup winner for 'dup' rows),
    // and shard placement comes from the thinner near-dup packing.
    "pipeline_audit_neardup" -> { (s, dir) =>
      import s.implicits._
      val (docs, dups, contam) = auditStageFrames(s, dir)
      val train = curatedTrain(s, dir).cache()
      // cached: the assignment feeds BOTH the fate column and the
      // packing, and the components loop must not run twice
      val clusters = nearDupClusters(train).cache()
      val packed = packNearDupKeepers(train, clusters)
        .select($"doc_id", $"shard", $"shard_offset")
      // materialized so the cluster cache releases before the return
      // (the pipelineCurateFull leak discipline)
      val out = docs.select($"doc_id", $"n_tokens")
        .join(dups, Seq("doc_id"), "left")
        .join(contam, Seq("doc_id"), "left")
        .join(clusters, Seq("doc_id"), "left")
        .join(packed, Seq("doc_id"), "left")
        .select($"doc_id", $"n_tokens",
          when($"keep_id".isNull, lit("gate_failed"))
            .when($"keep_id" =!= $"doc_id", lit("dup"))
            .when($"doc_id" % EvalMod === 0, lit("eval_split"))
            .when($"contam_frac" >= 0.5, lit("contaminated"))
            .when($"cluster" =!= $"doc_id", lit("neardup"))
            .otherwise(lit("kept")).as("fate"),
          when($"keep_id" =!= $"doc_id", $"keep_id")
            .when($"cluster" =!= $"doc_id", $"cluster").as("dup_of"),
          $"contam_frac", $"shard", $"shard_offset")
        .localCheckpoint(true)
      clusters.unpersist(); train.unpersist()
      out
    },

    // pipeline_audit with the SCRUB stage in the trace — the scrub never
    // drops a doc, so the fate column is pipeline_audit's verbatim; what
    // the trace adds is the stage's per-doc effect: n_removed (tokens
    // excised by benchmark-run scrubbing; 0 = kept untouched, NULL =
    // never reached the stage) and shard placement from the POST-scrub
    // packing — the "why is doc X shorter in the shards than in the
    // crawl?" ticket answered in one row.
    "pipeline_audit_scrub" -> { (s, dir) =>
      import s.implicits._
      val (docs, dups, contam) = auditStageFrames(s, dir)
      val packed = pipelineCurateScrub(s, dir)
        .select($"doc_id", $"n_removed", $"shard", $"shard_offset")
      docs.select($"doc_id", $"n_tokens")
        .join(dups, Seq("doc_id"), "left")
        .join(contam, Seq("doc_id"), "left")
        .join(packed, Seq("doc_id"), "left")
        .select($"doc_id", $"n_tokens",
          when($"keep_id".isNull, lit("gate_failed"))
            .when($"keep_id" =!= $"doc_id", lit("dup"))
            .when($"doc_id" % EvalMod === 0, lit("eval_split"))
            .when($"contam_frac" >= 0.5, lit("contaminated"))
            .otherwise(lit("kept")).as("fate"),
          when($"keep_id" =!= $"doc_id", $"keep_id").as("dup_of"),
          $"contam_frac", $"n_removed", $"shard", $"shard_offset")
    },

    // pipeline_audit with the SPAN KEEP-FIRST stage in the trace — same
    // doctrine as pipeline_audit_scrub (the stage never drops a doc, so
    // the fate column is pipeline_audit's verbatim): n_removed here is
    // the tokens excised because a LOWER surviving doc carried the same
    // passage first, and shard placement comes from the post-span
    // packing — "why is doc X shorter than its crawl copy when it never
    // touched a benchmark?" answered in one row.
    "pipeline_audit_spans" -> { (s, dir) =>
      import s.implicits._
      val (docs, dups, contam) = auditStageFrames(s, dir)
      val packed = pipelineCurateSpans(s, dir)
        .select($"doc_id", $"n_removed", $"shard", $"shard_offset")
      docs.select($"doc_id", $"n_tokens")
        .join(dups, Seq("doc_id"), "left")
        .join(contam, Seq("doc_id"), "left")
        .join(packed, Seq("doc_id"), "left")
        .select($"doc_id", $"n_tokens",
          when($"keep_id".isNull, lit("gate_failed"))
            .when($"keep_id" =!= $"doc_id", lit("dup"))
            .when($"doc_id" % EvalMod === 0, lit("eval_split"))
            .when($"contam_frac" >= 0.5, lit("contaminated"))
            .otherwise(lit("kept")).as("fate"),
          when($"keep_id" =!= $"doc_id", $"keep_id").as("dup_of"),
          $"contam_frac", $"n_removed", $"shard", $"shard_offset")
    },

    // Per-document FATE TRACE through the curation DAG — the operability
    // query behind every "why did doc X disappear from the training
    // set?" ticket a 100 TB pipeline fields: ONE row per corpus doc with
    // the stage that ended it (gate_failed → dup → eval_split →
    // contaminated → kept, in DAG order), the exact-dedup winner it lost
    // to, its decontam fraction, and its packed shard location when it
    // survived everything. Composes the SAME stage algebra the pipeline
    // runs (qualityGate / curatedKept / contamination / pipelineCurate —
    // one definition, so the audit can never drift from the pipeline),
    // joined back to the full corpus with request-shaped left joins; the
    // oracle replays the stage CTEs and the verdict CASE verbatim.
    "pipeline_audit" -> { (s, dir) =>
      import s.implicits._
      val (docs, dups, contam) = auditStageFrames(s, dir)
      val packed = pipelineCurate(s, dir).select($"doc_id", $"shard", $"shard_offset")
      docs.select($"doc_id", $"n_tokens")
        .join(dups, Seq("doc_id"), "left")
        .join(contam, Seq("doc_id"), "left")
        .join(packed, Seq("doc_id"), "left")
        .select($"doc_id", $"n_tokens",
          when($"keep_id".isNull, lit("gate_failed"))
            .when($"keep_id" =!= $"doc_id", lit("dup"))
            .when($"doc_id" % EvalMod === 0, lit("eval_split"))
            .when($"contam_frac" >= 0.5, lit("contaminated"))
            .otherwise(lit("kept")).as("fate"),
          when($"keep_id" =!= $"doc_id", $"keep_id").as("dup_of"),
          $"contam_frac", $"shard", $"shard_offset")
    },

    // Cross-source overlap matrix from per-source MinHash signatures —
    // the corpus-mixing / cross-source-contamination signal ("how much of
    // src7 is already in src3?"). Exact pairwise intersection of shingle
    // sets is O(|pairs|·|shingles|) and infeasible at 100 TB; the MinHash
    // estimate needs ONE corpus pass to build |sources|×NumPerm signature
    // mins (map-side combinable agg), after which the pairwise matrix is
    // O(sources²) on a broadcast-sized table. Signature arithmetic is
    // integer mod-P, so the oracle is hash-exact.
    "corpus_overlap" -> { (s, dir) =>
      overlapMatrix(sourceSignatures(Tables.load(s, dir, "documents")))
    },

    // Incremental overlap-matrix maintenance — the daily form: MinHash
    // signature mins are MERGEABLE (min over the union multiset =
    // min(min, min)), so a day's batch folds into yesterday's persisted
    // |sources|×NumPerm signature table with one batch-sized pass and a
    // |sources|-row least() merge — the corpus is never re-read (the
    // dedup_*_incr / Bm25Index.append doctrine). The oracle is the FULL
    // corpus_overlap SQL verbatim, so incremental == from-scratch is a
    // driver-gate hash equality, not a claim. least() skips NULLs, so a
    // source seen only in the batch (or only in the corpus) keeps its
    // one-sided signature through the full-outer merge.
    "corpus_overlap_incr" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      val corpusSig = sourceSignatures(docs.filter($"doc_id" % 10 =!= 0))
      val batchSig = sourceSignatures(docs.filter($"doc_id" % 10 === 0))
      val c = corpusSig.columns.foldLeft(corpusSig)(
        (d, n) => if (n == "source") d else d.withColumnRenamed(n, s"c_$n"))
      val b = batchSig.columns.foldLeft(batchSig)(
        (d, n) => if (n == "source") d else d.withColumnRenamed(n, s"b_$n"))
      val merged = c.join(b, Seq("source"), "full_outer")
        .select($"source" +: permA.indices.map(i =>
          least(col(s"c_m$i"), col(s"b_m$i")).as(s"m$i")): _*)
      overlapMatrix(merged)
    },

    // Vocabulary coverage / OOV rate: corpus top-K vocabulary by frequency
    // (ties broken by token text), then per-document in-vocab vs
    // out-of-vocab token counts — the tokenizer-fit signal of a curation
    // pipeline (a doc whose tokens mostly miss the vocab is noise or the
    // wrong language). The vocab is top-K of a corpus-wide hash agg
    // (map-side combinable) and broadcast-sized by construction, so the
    // per-doc pass is one narrow scan + broadcast join; integer counts →
    // hash-exact oracle.
    "text_oov" -> { (s, dir) =>
      import s.implicits._
      val tok = Tables.load(s, dir, "documents")
        .select($"doc_id", explode(tokens($"text")).as("tok"))
      val vocab = tok.groupBy($"tok").agg(count(lit(1)).as("freq"))
        .orderBy($"freq".desc, $"tok")
        .limit(VocabTopK)
        .select($"tok", lit(1L).as("in_vocab"))
      tok.join(vocab, Seq("tok"), "left")
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          sum(when($"in_vocab".isNull, 1L).otherwise(0L)).as("n_oov"))
        .withColumn("oov_frac", $"n_oov".cast("double") / $"n_tokens")
    },

    // Temperature-based multilingual mixture (the α-sampling of
    // multilingual pretraining): language weights ∝ tokens^α with α=0.5,
    // flattening the head so low-resource languages keep signal.
    // Cross-engine float discipline: sqrt is IEEE-correctly-rounded in
    // both engines, and the denominator Σ√tokens is computed as a RUNNING
    // sum over rows ordered by lang — both engines add in the identical
    // order, so the doubles agree bit-for-bit where an unordered SUM()
    // could differ in the last ulp. O(langs) after one corpus pass.
    "mix_temperature" -> { (s, dir) => mixTemperature(s, dir) },

    // Curriculum mixture schedule — quality-binned data annealing: score
    // every document with the hashed-linear quality model
    // (text_quality_score's exact-integer scorer), cut the corpus into 4
    // quality bins at the empirical score quartiles, and emit per-bin
    // sampling rates for a 3-phase curriculum (warmup: uniform; mid:
    // quality-tilted; anneal: quality-heavy — the "anneal on highest
    // quality last" recipe of modern pretraining).
    //
    // The quartile cut needs a global score CDF, which must NOT plan as a
    // single-partition window: scores group to |distinct scores| rows and
    // GlobalCumsum prefix-sums the counts distributed (the doc_pack
    // doctrine). A whole tie-group lands in ONE bin (bin = function of
    // score alone — reproducibility over exact quartile sizes: per-doc
    // rank tiebreaks would need a global row_number). Rates are one
    // literal multiply + one divide of exact longs per bin, so doubles
    // agree bit-for-bit cross-engine.
    "mix_curriculum" -> { (s, dir) =>
      import s.implicits._
      graft.GraftExtensions.register(s)
      import TextQueries.{ScoreA, ScoreDim, ScoreP, ScoreRange}
      val wf = (t: org.apache.spark.sql.Column) =>
        ((h60(t) % ScoreDim) * ScoreA) % ScoreP % ScoreRange - (ScoreRange / 2)
      // cached: the narrow (doc_id, n_tokens, score) frame feeds the
      // bin-boundary counts, the totals scalar AND the per-bin rollup —
      // uncached, the corpus scan + score fold executed once per
      // consumer (three times; r17 optimization). tot (1 row) is cached
      // too: it rides into two separate cross joins.
      val scored = Tables.load(s, dir, "documents")
        .select($"doc_id", tokens($"text").as("w"))
        .select($"doc_id",
          coalesce(size($"w").cast("long"), lit(0L)).as("n_tokens"),
          coalesce(aggregate(transform($"w", wf), lit(0L), (acc, x) => acc + x), lit(0L))
            .as("score"))
        .cache()
      val counts = scored.groupBy($"score").agg(count(lit(1)).as("c"))
      val tot = scored.agg(count(lit(1)).as("n"), sum($"n_tokens").as("total_tok"))
        .cache()
      val binMap = GlobalCumsum.runningBefore(counts, "score", "c", "cb")
        .crossJoin(tot.select($"n")) // 1 row — AQE broadcasts
        .select($"score", expr("CAST((cb * 4) DIV n AS BIGINT)").as("bin"))
      val perBin = scored.join(binMap, "score")
        .groupBy($"bin")
        .agg(count(lit(1)).as("n_docs"), sum($"n_tokens").as("n_tokens"))
      val wCase = (ws: Seq[Double]) =>
        when($"bin" === 0, lit(ws(0))).when($"bin" === 1, lit(ws(1)))
          .when($"bin" === 2, lit(ws(2))).otherwise(lit(ws(3)))
      val rate = (ws: Seq[Double]) =>
        (wCase(ws) * $"total_tok".cast("double")) / $"n_tokens".cast("double")
      perBin.crossJoin(tot.select($"total_tok"))
        .select($"bin", $"n_docs", $"n_tokens",
          ($"n_tokens".cast("double") / $"total_tok".cast("double")).as("share"),
          rate(CurriculumWarmup).as("rate_warmup"),
          rate(CurriculumMid).as("rate_mid"),
          rate(CurriculumAnneal).as("rate_anneal"))
    },

    // Incremental (daily-batch) sequence packing: the new batch continues
    // the token stream AFTER the existing corpus — shard ids and offsets
    // pick up where yesterday's pack ended instead of restarting at 0, so
    // shard files already shipped to trainers are never renumbered. The
    // base is ONE scalar (yesterday's total token count — in production
    // read from the pack manifest, here recomputed); everything else is
    // the same distributed prefix sum over just the batch.
    "doc_pack_incr" -> { (s, dir) => docPackIncr(s, dir) },

    // Deterministic train/validation/test split assignment — the
    // reproducibility-critical fork of every training pipeline: membership
    // is a pure content-hash property (h60(text) mod 100 against fixed
    // 90/5/5 bucket bounds), so the split survives reruns, engine swaps,
    // re-partitioning and corpus growth (a doc's split never changes when
    // OTHER docs are added — unlike row_number()-based splits). Narrow
    // map-only pass, fused into the scan at 100 TB.
    "text_split_assign" -> { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "documents")
        .select($"doc_id",
          (h60(concat($"text", lit("|split"))) % 100L).as("bucket"))
        .select($"doc_id", $"bucket",
          when($"bucket" < 90, "train")
            .when($"bucket" < 95, "validation")
            .otherwise("test").as("split"))
    },

    // Deterministic training-order shuffle: every epoch pipeline needs
    // the corpus in a shuffled but REPRODUCIBLE order (restarts, engine
    // swaps and stragglers must all see the same permutation). The order
    // key is a content hash — no RNG state, no seed coordination — and
    // the corpus splits into shard files, each internally ordered by the
    // hash: a data-loader worker streams its shard sequentially. One
    // shuffle (the per-shard window); no global sort — the 100 TB token
    // stream never funnels through one task, and the shard count is
    // AUTO-SIZED from the corpus count (CrossHash.shardsFor, a
    // footer-metadata scan: per-shard rows bounded at 4096, so window
    // parallelism scales with n instead of 8 tasks each sorting n/8;
    // n ≤ 2^15 reproduces the 8-shard gate geometry so the static
    // oracle stays valid).
    "doc_shuffle" -> { (s, dir) =>
      val n = Tables.load(s, dir, "documents").count()
      docShuffle(s, dir, CrossHash.shardsFor(n))
    },

    // Bloom-prefiltered benchmark decontamination — text_decontam's
    // 100 TB shape. The eval shingle set builds a Bloom filter (a few MiB
    // per 10⁶ distinct shingles) that broadcasts to every executor; the
    // corpus side drops ~99% of its shingles AT THE SCAN via the
    // membership test, so only probable hits reach the exact verify join
    // (false positives are eliminated there — the bloom can only ever
    // cost extra candidates, never change the answer). The oracle is
    // therefore text_decontam's own SQL verbatim: identical output,
    // shuffle reduced from every-corpus-shingle to ~hit-rate × corpus.
    "decontam_bloom" -> { (s, dir) =>
      import s.implicits._
      val sh = shingleSet(s, dir).cache()
      val evalH = sh.filter($"doc_id" % EvalMod === 0).select($"h").distinct().cache()
      // expected-items from the actual build side (production: catalog
      // stats); an empty eval set gets a fresh zero-bit filter because
      // stat.bloomFilter over zero rows leaves its bit array null
      val nEval = evalH.count()
      val bf =
        if (nEval == 0L) org.apache.spark.util.sketch.BloomFilter.create(1L, BloomFpp)
        else evalH.stat.bloomFilter("h", nEval, BloomFpp)
      // codegen membership test (graft_bloom_contains) — not a Scala UDF:
      // the probe runs inside the corpus scan's WholeStageCodegen stage
      // with no per-row serde boundary (CodegenSpec pins it)
      val bfBytes = graft.functions.expressions.BloomContains.serialize(bf)
      val might = (h: org.apache.spark.sql.Column) =>
        call_function("graft_bloom_contains", lit(bfBytes), h)
      val train = sh.filter($"doc_id" % EvalMod =!= 0)
      val totals = train.groupBy($"doc_id").agg(count(lit(1)).as("n_shingles"))
      val hits = train.filter(might($"h"))
        .join(evalH, Seq("h"), "left_semi")
        .groupBy($"doc_id").agg(count(lit(1)).as("nc"))
      totals.join(hits, Seq("doc_id"), "left")
        .select($"doc_id", $"n_shingles",
          coalesce($"nc", lit(0L)).as("n_contaminated"))
        .withColumn("contam_frac", $"n_contaminated".cast("double") / $"n_shingles")
    },

    // Per-doc top-3 TF-IDF terms (rational idf — see scaladoc).
    "text_tfidf" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      // tf cached: both the per-doc weights and the document frequency
      // derive from it (dfreq over distinct (doc_id, term) ≡ dfreq over
      // tf's group keys), so the corpus explode runs once, not twice
      // (r17 optimization)
      val tok = docs.select($"doc_id", explode(tokens($"text")).as("term"))
      val tf = tok.groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
        .cache()
      val dfreq = tf.groupBy($"term").agg(count(lit(1)).as("dfreq"))
      val ndocs = docs.agg(count(lit(1)).as("n_docs"))
      val w = Window.partitionBy($"doc_id").orderBy($"tfidf".desc, $"term")
      tf.join(dfreq, "term")
        .crossJoin(ndocs) // 1 row — AQE turns this into a broadcast
        .withColumn("tfidf", $"tf".cast("double") *
          (($"n_docs" + 1).cast("double") / ($"dfreq" + 1).cast("double")))
        .withColumn("rnk", row_number().over(w))
        .filter($"rnk" <= 3)
        .select($"doc_id", $"rnk".cast("long").as("rnk"), $"term", $"tfidf")
    }
  )

  // ---- tokenizer-parameterized builders --------------------------------
  // The packing/mixture family budgets in TOKENS; the counter is a
  // [[graft.functions.Tokenizer]] seam. The registry binds the default
  // (whitespace — exactly the oracle SQL's spelling, so the driver gate
  // stays hash-exact); a production pipeline passes Tokenizer.ToyBpe or
  // its own counter and every downstream integer (shards, chunks, rates)
  // re-derives consistently. CorpusSpec pins ToyBpe pack boundaries
  // against an independent driver-side spelling.

  /** doc_shuffle at an explicit shard count — the registered query wires
    * [[CrossHash.shardsFor]] of the corpus count; CorpusSpec pins the
    * second geometry (shards ≠ gate 8) against an independent spelling
    * plus the permutation invariants, so the auto-sizing rule cannot
    * silently change the operator's algebra. */
  private[graft] def docShuffle(s: SparkSession, dir: String,
      shards: Long = ShuffleShards): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"shard").orderBy($"hh", $"doc_id")
    Tables.load(s, dir, "documents")
      .select($"doc_id",
        h60(concat($"doc_id".cast("string"), lit(":"), $"text")).as("hh"))
      .withColumn("shard", $"hh" % shards)
      .withColumn("pos", row_number().over(w).cast("long"))
      .select($"doc_id", $"shard", $"pos")
  }

  private[graft] def docPack(s: SparkSession, dir: String,
      tok: Tokenizer = Tokenizer.Whitespace): DataFrame = {
    import s.implicits._
    val docs = Tables.load(s, dir, "documents")
      .select($"doc_id", tok.count($"text").as("n_tokens"))
    GlobalCumsum.runningBefore(docs, "doc_id", "n_tokens", "cb")
      .select($"doc_id", $"n_tokens",
        expr(s"CAST(cb DIV $PackBudget AS BIGINT)").as("shard"),
        ($"cb" % PackBudget).as("shard_offset"))
  }

  private[graft] def docChunk(s: SparkSession, dir: String,
      tok: Tokenizer = Tokenizer.Whitespace): DataFrame = {
    import s.implicits._
    val docs = Tables.load(s, dir, "documents")
      .select($"doc_id", tok.count($"text").as("n_tokens"))
      .withColumn("n_chunks",
        when($"n_tokens" <= ChunkTokens, lit(1L))
          .otherwise(expr(s"(n_tokens - $ChunkTokens + $ChunkStride - 1) " +
            s"DIV $ChunkStride + 1")))
    docs.select($"doc_id", $"n_tokens",
        explode(expr("sequence(CAST(0 AS BIGINT), n_chunks - 1)")).as("chunk_id"))
      .withColumn("start_tok", $"chunk_id" * ChunkStride + 1)
      .withColumn("end_tok", least($"start_tok" + (ChunkTokens - 1), $"n_tokens"))
      .select($"doc_id", $"chunk_id", $"start_tok", $"end_tok",
        ($"end_tok" - $"start_tok" + 1).as("chunk_tokens"))
  }

  private[graft] def docPackIncr(s: SparkSession, dir: String,
      tok: Tokenizer = Tokenizer.Whitespace): DataFrame = {
    import s.implicits._
    val docs = Tables.load(s, dir, "documents")
      .select($"doc_id", tok.count($"text").as("n_tokens"))
    // the corpus side collapses to one scalar before the batch pack runs
    // (a production pipeline reads it from the previous pack's manifest)
    val baseRow = docs.filter($"doc_id" % 10 =!= 0)
      .agg(coalesce(sum($"n_tokens"), lit(0L))).head()
    val base = baseRow.getLong(0)
    GlobalCumsum.runningBefore(
        docs.filter($"doc_id" % 10 === 0), "doc_id", "n_tokens", "cb")
      .select($"doc_id", $"n_tokens",
        expr(s"CAST((cb + $base) DIV $PackBudget AS BIGINT)").as("shard"),
        (($"cb" + base) % PackBudget).as("shard_offset"))
  }

  private[graft] def sampleWeighted(s: SparkSession, dir: String,
      tok: Tokenizer = Tokenizer.Whitespace): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "documents")
      .select($"doc_id", tok.count($"text").as("n_tokens"), $"text")
      .withColumn("sample_p",
        least(lit(1.0), lit(SampleTargetTokens) / $"n_tokens"))
      .filter(h60(concat($"text", lit("|sw"))) % 1000000L <
        floor($"sample_p" * 1000000.0).cast("long"))
      .select($"doc_id", $"n_tokens", $"sample_p")
  }

  /** DSIR-shaped importance resampling (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): select raw-corpus
    * documents that LOOK LIKE a target distribution. Both distributions
    * are bags of hashed unigram features (DsirDim buckets, the paper's
    * hashed n-gram feature map); the target here is the corpus' English
    * split (`lang = 'en'`) — a production run feeds any curated seed set
    * as the target predicate. The published weight is the log-likelihood
    * ratio Σ_f count_f · (log p_tgt[f] − log p_raw[f]); logs are not
    * correctly rounded across engines, so the exact form scores each
    * feature OCCURRENCE by the add-one-smoothed relative-frequency ratio
    * ((t_f+1)/(T+B)) / ((r_f+1)/(R+B)), cross-multiplied into one IEEE
    * divide of exact-long products (< 2^53 through sf0.1; a 100 TB run
    * drops the cross-engine-exactness constraint and can use the log
    * form), snapped to a scaled long before the order-independent per-doc
    * sum — the text_bm25/bigram discipline. Acceptance reuses
    * sample_weighted's deterministic hash-draw: keep ⇔ draw·n < Σsc
    * (the divide-free integer spelling of draw < mean ratio), so a doc
    * at-or-above like-target mean (ratio ≥ 1) always keeps and the kept
    * set is bit-reproducible across engines, reruns, and scales.
    *
    * Plan: one corpus tokenize pass → B-row feature table computing raw
    * AND target counts in the same map-side-combined aggregation; the
    * B-row ratio table joins back AQE-broadcast (never a corpus-side
    * shuffle); the per-doc sum shuffles (doc_id, scaled-long) pairs only.
    * The acceptance draw rides the token pass as a per-group constant
    * (min of a constant), so nothing re-reads the corpus.
    *
    * Spelled fit-then-score through [[graft.operators.DsirModel]] — the
    * train-once/apply-daily artifact — so the oracle-checked query IS
    * the model path (in-corpus scoring never hits the unseen-feature
    * fallback, so the driver gate pins score(fit(c), c) exactly). */
  private[graft] def sampleImportance(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.DsirModel
    val docs = Tables.load(s, dir, "documents")
    DsirModel.score(DsirModel.fit(docs, col("lang") === "en"), docs)
  }

  /** (vec_id, cluster): dedup_semantic's deterministic hyperplane cells
    * — the domain key shared by mix_domains and pipeline_select. */
  private def semCells(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    DedupQueries.embVecs(s, dir).withColumn("cluster",
      element_at(call_function("graft_lsh_bands", $"v",
        typedlit(DedupQueries.semPlanesFor(DedupQueries.SemBits).flatten.map(_.toDouble)),
        lit(1), lit(DedupQueries.SemBits)), 1))
      .select($"vec_id", $"cluster")
  }

  private[graft] def mixDomains(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = Tables.load(s, dir, "documents")
      .select($"doc_id", size(tokens($"text")).cast("long").as("n"))
    val cells = semCells(s, dir)
    // cached: the O(cells) rollup feeds both the totals scalar and the
    // final projection — uncached, the embeddings+corpus join lineage
    // executed once per side of the cross join (r17 optimization)
    val per = cells.join(toks, cells("vec_id") === toks("doc_id"))
      .groupBy($"cluster")
      .agg(count(lit(1)).as("n_docs"), sum($"n").as("n_tokens"))
      .cache()
    val totals = per.agg(sum($"n_tokens").as("total_tokens"),
      count(lit(1)).as("n_cells"))
    per.crossJoin(totals) // 1 row — AQE broadcasts
      .withColumn("fair_share", $"total_tokens".cast("double") / $"n_cells")
      .withColumn("sample_rate", least(lit(1.0), $"fair_share" / $"n_tokens"))
      .select($"cluster", $"n_docs", $"n_tokens", $"fair_share", $"sample_rate")
  }

  /** The selection DAG: repetition gate ∧ importance keep, then a
    * content-hash draw against the doc's domain-balanced rate. Each
    * stage is the oracle-verified operator verbatim, with its OUTPUT
    * cached (the pipeline_curate stage-boundary pattern): uncached, the
    * composed tree re-evaluates every branch's full lineage at each of
    * the final join's references — 22 base-table scans and a 10×
    * end-to-end cost for identical results. The cached frames are the
    * small stage outputs (id lists, the 2^SemBits-row rate table), not
    * the corpus. */
  private[graft] def pipelineSelect(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rep = TextQueries.queries("text_gopher_rep")(s, dir)
      .filter($"keep" === 1L).select($"doc_id").cache()
    val imp = sampleImportance(s, dir)
      .filter($"keep" === 1L).select($"doc_id", $"n_tokens").cache()
    val cells = semCells(s, dir).withColumnRenamed("vec_id", "doc_id").cache()
    val rates = mixDomains(s, dir).select($"cluster", $"sample_rate").cache()
    val txt = Tables.load(s, dir, "documents").select($"doc_id", $"text")
    imp.join(rep, "doc_id")
      .join(cells, "doc_id")
      .join(rates, "cluster")
      .join(txt, "doc_id")
      .filter(h60(concat($"text", lit("|mix"))) % 1000000L <
        floor($"sample_rate" * 1000000.0).cast("long"))
      .select($"doc_id", $"cluster", $"n_tokens", $"sample_rate")
  }

  /** Per-source MinHash signature table (source, m0..m{NumPerm-1}) over a
    * documents frame. NO distinct before the signature agg: min over a
    * multiset equals min over its value set, so duplicate shingles can't
    * move any permuted minimum — dropping the usual dedup-suite distinct
    * removes a full corpus-sized shuffle, leaving scan → partial agg →
    * one |sources|-keyed exchange (PlanAuditSpec pins the single
    * exchange). x < P keeps a·x + b inside i64 (a ≤ 1.7e7, P ≈ 1e9 ⇒
    * product ≤ 1.7e16). */
  private def sourceSignatures(docs: DataFrame): DataFrame = {
    val sh = docs
      .select(col("source"), explode(shingleHashes(col("text"))).as("h"))
      .select(col("source"), (col("h") % P).as("x"))
    val sigCols = permA.indices.map(i =>
      min((lit(permA(i)) * col("x") + lit(permB(i))) % P).as(s"m$i"))
    sh.groupBy(col("source")).agg(sigCols.head, sigCols.tail: _*)
  }

  /** Pairwise estimated-Jaccard matrix over a signature table —
    * O(sources²) on a broadcast-sized input. */
  private def overlapMatrix(sig: DataFrame): DataFrame = {
    val a = sig.columns.foldLeft(sig)((d, c) => d.withColumnRenamed(c, s"a_$c"))
    val b = sig.columns.foldLeft(sig)((d, c) => d.withColumnRenamed(c, s"b_$c"))
    val matches = permA.indices.map(i =>
      when(col(s"a_m$i") === col(s"b_m$i"), 1L).otherwise(0L)).reduce(_ + _)
    a.join(b, col("a_source") < col("b_source"))
      .select(col("a_source").as("src_a"), col("b_source").as("src_b"),
        matches.as("n_match"))
      .withColumn("jaccard_est", col("n_match").cast("double") / NumPerm)
  }

  /** The mix_epoch_cap water-fill over an arbitrary (source, n_tokens)
    * table — factored out so CorpusSpec can property-sweep the closed
    * form against an iterative reference on random distributions. */
  private[graft] def mixEpochCap(perSourceTokens: DataFrame): DataFrame = {
    import perSourceTokens.sparkSession.implicits._
    // cache the O(sources) table: it feeds FOUR references (ranked,
    // totals, the level agg and the final projection) and its lineage is
    // the corpus-sized per-source token count — uncached, the plan runs
    // the corpus aggregation twice (two Window subtrees, verified)
    val perSource = perSourceTokens
      .withColumn("capacity", $"n_tokens" * EpochCap)
      .cache()
    val w = Window.orderBy($"capacity", $"source")
    val ranked = perSource
      .withColumn("i", row_number().over(w).cast("long"))
      .withColumn("p_prev",
        coalesce(sum($"capacity").over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val totals = perSource.agg(
      count(lit(1)).as("n_sources"), sum($"n_tokens").as("total"))
    // boundary test ×BudgetDenom keeps the 3.5-epoch budget in exact
    // integer arithmetic (no float boundary disagreement possible)
    val flagged = ranked.crossJoin(totals)
      .withColumn("capped",
        ($"capacity" * ($"n_sources" - $"i" + 1L) + $"p_prev") * BudgetDenom <
          $"total" * BudgetNumer)
    val level = flagged.agg(
      ((max($"total") * BudgetNumer -
        coalesce(sum(when($"capped", $"capacity")), lit(0L)) * BudgetDenom)
        .cast("double") /
        (sum(when(!$"capped", 1L)) * BudgetDenom)).as("level"))
    flagged.crossJoin(level.select($"level"))
      .select($"source", $"n_tokens", $"capacity",
        when($"capped", $"capacity".cast("double")).otherwise($"level")
          .as("alloc_tokens"))
      .withColumn("epochs", $"alloc_tokens" / $"n_tokens")
  }

  private[graft] def mixAllocation(s: SparkSession, dir: String,
      tok: Tokenizer = Tokenizer.Whitespace): DataFrame = {
    import s.implicits._
    // cached: the O(sources) rollup feeds both the totals scalar and the
    // final projection — uncached, the corpus scan+tokenize executed
    // once per side of the cross join (r17 optimization)
    val perSource = Tables.load(s, dir, "documents")
      .select($"source", tok.count($"text").as("n"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"), sum($"n").as("n_tokens"))
      .cache()
    val totals = perSource.agg(
      sum($"n_tokens").as("total_tokens"),
      count(lit(1)).as("n_sources"))
    perSource.crossJoin(totals)
      .withColumn("fair_share",
        $"total_tokens".cast("double") / $"n_sources")
      .withColumn("sample_rate",
        least(lit(1.0), $"fair_share" / $"n_tokens"))
      .select($"source", $"n_docs", $"n_tokens", $"fair_share", $"sample_rate")
  }

  private[graft] def mixTemperature(s: SparkSession, dir: String,
      tok: Tokenizer = Tokenizer.Whitespace): DataFrame = {
    import s.implicits._
    val perLang = Tables.load(s, dir, "documents")
      .select($"lang", tok.count($"text").as("n"))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"), sum($"n").as("n_tokens"))
      .withColumn("w", sqrt($"n_tokens".cast("double")))
    val wLang = Window.orderBy($"lang")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    perLang
      .withColumn("denom", sum($"w").over(wLang))
      .select($"lang", $"n_docs", $"n_tokens", $"w".as("weight"),
        ($"w" / $"denom").as("mix_p"))
  }

  /** The curation DAG's surviving TRAIN set (doc_id, text, n_tokens) —
    * quality gate → exact dedup → decontamination, text retained so
    * downstream exports (shards, retrieval indexes) can consume it.
    * Shared by pipeline_curate (which packs it) and
    * operators/CurationJob (which also builds the indexes). */
  /** The curation quality gate — shared verbatim by [[curatedTrain]] and
    * the daily-increment path so both days apply the identical rule. */
  private[graft] def qualityGate(docs: DataFrame): DataFrame =
    docs.filter(col("n_tokens") >= 5 &&
      (regexp_count(col("text"), lit("[^A-Za-z0-9\\s]")).cast("double") /
        nullif(length(col("text")), lit(0))) < 0.3)

  /** The quality→exact-dedup prefix of [[curatedTrain]], BEFORE the eval
    * drop/decontam — exposed so CurationJob can derive the persisted eval
    * shingle benchmark (outDir/evalh) from the SAME gated/deduped set the
    * decontam stage uses (an eval doc that fails the gate or loses dedup
    * contributes no shingles — the daily path must agree; see
    * DailyIncrement). Cached at the stage boundary; a second call builds
    * the identical plan and hits the same cache entry. */
  private[graft] def curatedKept(s: SparkSession, dir: String,
      tok: Tokenizer = Tokenizer.Whitespace,
      docFilter: org.apache.spark.sql.Column = lit(true)): DataFrame = {
    import s.implicits._
    val docs = Tables.load(s, dir, "documents")
      .filter(docFilter)
      .select($"doc_id", $"text", tok.count($"text").as("n_tokens"))
    // quality gate: enough tokens, not punctuation soup
    val quality = qualityGate(docs)
    // exact dedup: keep the lowest doc_id per content digest.
    // `kept` feeds BOTH the shingle index and the packing input, and
    // GlobalCumsum drives multiple actions (quantile sketch, bucket
    // totals, final plan) — cache the stage boundary or the whole
    // scan→quality→dedup prefix re-executes once per action
    val keep = quality.groupBy(md5($"text").as("ch")).agg(min($"doc_id").as("doc_id"))
    quality.join(keep, "doc_id").select($"doc_id", $"text", $"n_tokens")
      .cache()
  }

  /** The eval-shingle benchmark the curation decontam stage checks
    * against: distinct shingle hashes of EVAL-SPLIT docs among the
    * gate/dedup survivors — NOT the raw table (an eval doc that fails
    * the quality gate or loses exact dedup to a lower-id doc contributes
    * no shingles). This is the exact set [[curatedTrain]]'s internal
    * `contamination` sees; CurationJob persists it (outDir/evalh) so the
    * daily path applies the identical benchmark. */
  private[graft] def curatedEvalH(s: SparkSession, dir: String,
      tok: Tokenizer = Tokenizer.Whitespace,
      docFilter: org.apache.spark.sql.Column = lit(true)): DataFrame =
    curatedKept(s, dir, tok, docFilter)
      .filter(col("doc_id") % EvalMod === 0)
      // (doc_id, h) pairs, not a bare hash set: the attribution is what
      // lets a takedown forget an eval doc's fingerprint exactly (mask on
      // doc_id) — readers project .select("h").distinct()
      .select(col("doc_id"), explode(shingleHashes(col("text"))).as("h"))
      .distinct()

  /** The gate/dedup-surviving EVAL docs (doc_id, text) — the benchmark
    * POPULATION behind both decontam forms: [[curatedEvalH]] is its
    * unordered shingle-hash projection (the ≥50% DROP rule), and the
    * scrub stage's positioned benchmark index materializes over these
    * same docs (an eval doc that fails the gate or loses dedup
    * contributes no runs either). Hits the [[curatedKept]] cache. */
  private[graft] def curatedEvalDocs(s: SparkSession, dir: String,
      tok: Tokenizer = Tokenizer.Whitespace,
      docFilter: org.apache.spark.sql.Column = lit(true)): DataFrame =
    curatedKept(s, dir, tok, docFilter)
      .filter(col("doc_id") % EvalMod === 0)
      .select(col("doc_id"), col("text"))

  /** Near-dup gate threshold for the curation DAG's optional fourth
    * stage (exact word-3-gram jaccard — dedup_ngram_jaccard's cut). */
  val NearDupThreshold = 0.6

  /** The near-dup gate verdict over a train-survivor frame (doc_id,
    * text, ...): the subset surviving lowest-id-wins clustering of the
    * exact jaccard ≥ threshold pair graph — the dedup_clusters algebra
    * as a CURATION STAGE (pairs among survivors, keeper = component
    * min). Shared by pipeline_curate_neardup, CurationJob's day-0
    * near-dup stage, and (probe-fed) DailyIncrement's batch gate. */
  private[graft] def nearDupSurvivors(train: DataFrame,
      threshold: Double = NearDupThreshold): DataFrame =
    train.join(
      nearDupClusters(train, threshold).filter(col("cluster") === col("doc_id"))
        .select(col("doc_id")),
      Seq("doc_id"), "left_semi")

  /** The stage's full cluster assignment (doc_id, cluster = keeper id) —
    * [[nearDupSurvivors]] keeps the cluster == doc_id rows; the fate
    * trace (pipeline_audit_neardup) reports the keeper as dup_of. */
  private[graft] def nearDupClusters(train: DataFrame,
      threshold: Double = NearDupThreshold): DataFrame = {
    val edges = DedupQueries.jaccardPairsFrames(train, threshold)
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
    graft.operators.ConnectedComponents
      .clusters(train.select(col("doc_id").as("id")), edges)
      .select(col("id").as("doc_id"), col("cluster"))
  }

  /** The decontam stage's contamination table over the gate/dedup
    * survivors — (doc_id, n_shingles, n_contaminated), train-side docs
    * only. Cached at the stage boundary (the [[curatedKept]] doctrine):
    * its lineage is the corpus-wide shingle explode + distinct + eval
    * join, and the audit family reads it TWICE per query (the
    * contam_frac trace column AND the ≥50% drop rule inside
    * [[curatedTrain]]) — uncached, each reference re-ran that whole
    * chain (measured r17: 40-88 scan nodes per audit plan). A second
    * call builds the identical plan and hits the same cache entry, so
    * callers need no plumbing. */
  private[graft] def curatedContam(s: SparkSession, dir: String,
      tok: Tokenizer = Tokenizer.Whitespace,
      docFilter: org.apache.spark.sql.Column = lit(true)): DataFrame = {
    import s.implicits._
    contamination(curatedKept(s, dir, tok, docFilter)
        .select($"doc_id", explode(shingleHashes($"text")).as("h"))
        .distinct())
      .cache()
  }

  private[graft] def curatedTrain(s: SparkSession, dir: String,
      tok: Tokenizer = Tokenizer.Whitespace,
      docFilter: org.apache.spark.sql.Column = lit(true)): DataFrame = {
    import s.implicits._
    val kept = curatedKept(s, dir, tok, docFilter)
    // decontamination: drop the eval split and anything ≥50% eval-overlapping.
    // Deliberately NOT routed through [[curatedContam]]'s .cache(): in the
    // curate-only paths contamination has exactly one consumer, so forcing
    // a cache materialization is pure overhead (measured +16-19% on
    // pipeline_curate/_full in r17) — while in the audit paths, where
    // auditStageFrames HAS cached the identical plan, the CacheManager's
    // sameResult substitution serves this subtree from that entry anyway.
    val sh = kept
      .select($"doc_id", explode(shingleHashes($"text")).as("h"))
      .distinct()
    val contaminated = contamination(sh)
      .filter($"n_contaminated".cast("double") / $"n_shingles" >= 0.5)
      .select($"doc_id")
    kept.filter($"doc_id" % EvalMod =!= 0)
      .join(contaminated, Seq("doc_id"), "left_anti")
  }

  /** The audit family's shared stage prefix — (docs, dups, contam): the
    * per-doc token counts, the exact-dedup winner map, and the decontam
    * fraction. Each derives from the CACHED stage tables so the five
    * audit keys pay the gate/md5/shingle chains ONCE per query (r17
    * optimization — the old per-key spelling recomputed them beside the
    * cached twins): `win` reads the winners' digests straight off
    * [[curatedKept]] — the winners ARE the per-digest min rows, so
    * md5-ing the cached winner set replaces a second corpus-wide md5
    * aggregation (PipelineAuditSpec pins the equality) — and contam_frac
    * projects [[curatedContam]], the same cache entry
    * [[curatedTrain]]'s ≥50% drop rule reads. */
  private def auditStageFrames(s: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame) = {
    import s.implicits._
    val docs = Tables.load(s, dir, "documents")
      .select($"doc_id", $"text", Tokenizer.Whitespace.count($"text").as("n_tokens"))
    val quality = qualityGate(docs)
    val win = curatedKept(s, dir)
      .select(md5($"text").as("ch"), $"doc_id".as("keep_id"))
    val dups = quality.select($"doc_id", md5($"text").as("ch"))
      .join(win, "ch").select($"doc_id", $"keep_id")
    val contam = curatedContam(s, dir)
      .select($"doc_id",
        ($"n_contaminated".cast("double") / $"n_shingles").as("contam_frac"))
    (docs, dups, contam)
  }

  private[graft] def pipelineCurate(s: SparkSession, dir: String,
      tok: Tokenizer = Tokenizer.Whitespace): DataFrame = {
    import s.implicits._
    // pack the survivors
    val train = curatedTrain(s, dir, tok).select($"doc_id", $"n_tokens")
    GlobalCumsum.runningBefore(train, "doc_id", "n_tokens", "cb")
      .select($"doc_id", $"n_tokens",
        expr(s"CAST(cb DIV $PackBudget AS BIGINT)").as("shard"),
        ($"cb" % PackBudget).as("shard_offset"))
  }

  /** The near-dup packing from a PRECOMPUTED cluster assignment — the
    * shared tail of [[pipelineCurateNearDup]] and pipeline_audit_neardup
    * (one packing definition so the audit's shard columns can never
    * drift from the query's, and the audit's CACHED cluster table feeds
    * both its fate column and this packing, so the iterative
    * ConnectedComponents loop runs ONCE per query, not twice). */
  private def packNearDupKeepers(train: DataFrame, clusters: DataFrame): DataFrame = {
    val nd = train
      .join(clusters.filter(col("cluster") === col("doc_id")).select(col("doc_id")),
        Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("n_tokens"))
    GlobalCumsum.runningBefore(nd, "doc_id", "n_tokens", "cb")
      .select(col("doc_id"), col("n_tokens"),
        expr(s"CAST(cb DIV $PackBudget AS BIGINT)").as("shard"),
        (col("cb") % PackBudget).as("shard_offset"))
  }

  /** [[pipelineCurate]] with the near-dup stage on. */
  private[graft] def pipelineCurateNearDup(s: SparkSession, dir: String,
      tok: Tokenizer = Tokenizer.Whitespace): DataFrame = {
    // cache: the gate+decontam chain fans out into the jaccard pair
    // self-join, the components node set and the packing semi-join —
    // uncached it re-executed (shingle explode included) once per
    // consumer. Materialize-then-unpersist, the pipelineCurateFull leak
    // discipline.
    val train = curatedTrain(s, dir, tok).cache()
    val out = packNearDupKeepers(train, nearDupClusters(train))
      .localCheckpoint(true)
    train.unpersist()
    out
  }

  /** [[pipelineCurate]] with the token-level SCRUB stage on: the decontam
    * DROP stage removes docs ≥50% benchmark-overlapping, but a surviving
    * doc can still carry a long verbatim benchmark quote (a 60-token
    * quote in a 10k-token doc is 0.6% overlap) — this stage excises
    * exactly those runs (the decontam_scrub algebra over the CURATED
    * frames: train survivors vs the gate/dedup-surviving eval split, the
    * same benchmark population the drop stage checked) and packs on the
    * POST-scrub token counts, so shard budgets account for what a trainer
    * actually reads. Output (doc_id, n_tokens, n_removed, shard,
    * shard_offset); n_tokens is the post-scrub count. */
  private[graft] def pipelineCurateScrub(s: SparkSession, dir: String,
      tok: Tokenizer = Tokenizer.Whitespace): DataFrame = {
    import graft.operators.OverlapIndex
    val train = curatedTrain(s, dir, tok).select(col("doc_id"), col("text"))
    val evalDocs = curatedKept(s, dir, tok)
      .filter(col("doc_id") % EvalMod === 0)
      .select(col("doc_id"), col("text"))
    val scrub = OverlapIndex.scrubFrames(
      train, OverlapIndex.positioned(train), OverlapIndex.positioned(evalDocs),
      MinRunTokens)
    val packIn = scrub.select(col("doc_id"),
      (col("n_tokens") - col("n_removed")).as("n_tokens"), col("n_removed"))
    GlobalCumsum.runningBefore(packIn, "doc_id", "n_tokens", "cb")
      .select(col("doc_id"), col("n_tokens"), col("n_removed"),
        expr(s"CAST(cb DIV $PackBudget AS BIGINT)").as("shard"),
        (col("cb") % PackBudget).as("shard_offset"))
  }

  /** [[pipelineCurate]] with the SPAN KEEP-FIRST stage on: after the
    * drop gates, any trigram duplicated among the surviving train docs
    * keeps ONE copy — the lowest surviving doc_id holding it — and every
    * other occurrence is excised (the dedup_span_keepfirst rule as a
    * CURATION STAGE: Lee et al. 2022's "remove it from one of them"
    * applied to the corpus the trainer actually reads), then the packing
    * window runs over the POST-scrub token counts. Output (doc_id,
    * n_tokens, n_removed, shard, shard_offset); n_tokens is post-scrub.
    * Cost on top of pipeline_curate: the positioned-shingle pass and the
    * per-hash keeper aggregate — no pairwise doc join. */
  private[graft] def pipelineCurateSpans(s: SparkSession, dir: String,
      tok: Tokenizer = Tokenizer.Whitespace): DataFrame = {
    val train = curatedTrain(s, dir, tok).select(col("doc_id"), col("text"))
    val occ = train.select(col("doc_id"),
      posexplode(shingleHashes(col("text"))).as(Seq("q", "h")))
    val dupStarts = DedupQueries.spanKeepFirstStartRows(occ)
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("q"))).as("dup_starts"))
    val scrub = DedupQueries.scrubRebuild(s, train, dupStarts)
    val packIn = scrub.select(col("doc_id"),
      (col("n_tokens") - col("n_removed")).as("n_tokens"), col("n_removed"))
    GlobalCumsum.runningBefore(packIn, "doc_id", "n_tokens", "cb")
      .select(col("doc_id"), col("n_tokens"), col("n_removed"),
        expr(s"CAST(cb DIV $PackBudget AS BIGINT)").as("shard"),
        (col("cb") % PackBudget).as("shard_offset"))
  }

  /** The FULL-STRENGTH curation DAG in one query — every optional stage
    * on, composed exactly as `CurationJob.run(nearDupIndex=, benchIndex=,
    * spanIndex=)` composes them: quality → exact dedup → decontam →
    * near-dup clustering (lowest-id-wins) → ONE token rebuild over the
    * UNION of the benchmark-scrub and span-keep-first dup starts (both
    * judged on RAW text; an overlapping region excises once) → packing
    * on post-scrub counts. This is the production invocation a user
    * actually runs; oracle-checked end to end so the COMPOSITION — not
    * just each stage — is a driver-gate hash equality. */
  private[graft] def pipelineCurateFull(s: SparkSession, dir: String,
      tok: Tokenizer = Tokenizer.Whitespace): DataFrame = {
    // train cached too: nearDupSurvivors fans it into the jaccard pair
    // self-join, the components node set and its own semi-join — the
    // gate+decontam chain must execute once, not once per consumer.
    val train = curatedTrain(s, dir, tok).cache()
    // cache: the components loop ran inside nearDupSurvivors; nd feeds
    // two positioned passes, the span occurrence pass and the rebuild.
    // The packing MATERIALIZES here (localCheckpoint cuts the returned
    // plan to a LogicalRDD leaf) so nd releases before the return — a
    // lazy return would keep the cache entry pinned inside the caller's
    // plan, leaking one nd per invocation in callers without an explicit
    // clearCache between queries.
    val nd = nearDupSurvivors(train).select(col("doc_id"), col("text")).cache()
    val out = packCurateFull(s, dir, tok, nd).localCheckpoint(true)
    nd.unpersist(); train.unpersist()
    out
  }

  /** The full-strength DAG's text-rewriting + packing tail from a
    * PRECOMPUTED near-dup survivor frame `nd` (doc_id, text; cached by
    * the caller): union of the benchmark-scrub and span-keep-first dup
    * starts → one token rebuild → packing on post-scrub counts. Shared
    * by [[pipelineCurateFull]] and pipeline_audit_full so the audit's
    * CACHED cluster table feeds both its fate column and this packing —
    * the components loop runs ONCE per query (the packNearDupKeepers
    * doctrine applied to the capstone). */
  private def packCurateFull(s: SparkSession, dir: String,
      tok: Tokenizer, nd: DataFrame): DataFrame = {
    val evalDocs = curatedKept(s, dir, tok)
      .filter(col("doc_id") % EvalMod === 0)
      .select(col("doc_id"), col("text"))
    // NOT cached (r17 optimization note): sharing one cached positioned
    // pass between the bench-scrub and span-keep-first start relations
    // measured +26..70% on the _full keys — materializing every (doc_id,
    // q, h) row costs more than the re-explode it saves, because the
    // uncached spelling pipelines the explode straight into each
    // consumer's partial aggregate inside one codegen stage.
    val benchStarts = graft.operators.OverlapIndex.scrubStartRows(
      graft.operators.OverlapIndex.positioned(nd),
      graft.operators.OverlapIndex.positioned(evalDocs), MinRunTokens)
    val spanStarts = DedupQueries.spanKeepFirstStartRows(
      nd.select(col("doc_id"),
        posexplode(shingleHashes(col("text"))).as(Seq("q", "h"))))
    val dupStarts = benchStarts.unionByName(spanStarts).distinct()
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("q"))).as("dup_starts"))
    val scrub = DedupQueries.scrubRebuild(s, nd, dupStarts)
    val packIn = scrub.select(col("doc_id"),
      (col("n_tokens") - col("n_removed")).as("n_tokens"), col("n_removed"))
    GlobalCumsum.runningBefore(packIn, "doc_id", "n_tokens", "cb")
      .select(col("doc_id"), col("n_tokens"), col("n_removed"),
        expr(s"CAST(cb DIV $PackBudget AS BIGINT)").as("shard"),
        (col("cb") % PackBudget).as("shard_offset"))
  }

  /** The positioned-occurrence run chain shared by decontam_runs and its
    * index-probe twin: zipped unnest pairs each shingle with its 0-based
    * start (matching Spark's posexplode), islands group on (pair,
    * diagonal, qe − row_number), runs of L starts cover L+2 tokens. */
  private val oRunsSql =
    s"""WITH docs AS (SELECT doc_id, $oTokens AS w FROM documents),
       |sg AS (SELECT doc_id, $oShingles3 AS ss FROM docs),
       |occ AS (SELECT doc_id, unnest(ss) AS s,
       |               unnest(range(0, len(ss))) AS q FROM sg),
       |o2 AS (SELECT doc_id, q, ${oH60("s")} AS h FROM occ),
       |j AS (SELECT t.doc_id AS t_doc, e.doc_id AS e_doc,
       |             t.q - e.q AS diag, e.q AS qe
       |      FROM o2 t JOIN o2 e ON t.h = e.h
       |      WHERE t.doc_id % $EvalMod <> 0 AND e.doc_id % $EvalMod = 0),
       |isl AS (SELECT t_doc, e_doc, diag, qe,
       |          qe - row_number() OVER (
       |            PARTITION BY t_doc, e_doc, diag ORDER BY qe) AS isl
       |        FROM j),
       |runs AS (SELECT t_doc, e_doc, count(*) + 2 AS run_tokens
       |         FROM isl GROUP BY t_doc, e_doc, diag, isl)
       |SELECT e_doc, t_doc, CAST(max(run_tokens) AS BIGINT) AS max_run_tokens,
       |  CAST(sum(CASE WHEN run_tokens >= $MinRunTokens THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_runs
       |FROM runs GROUP BY e_doc, t_doc
       |HAVING max(run_tokens) >= $MinRunTokens""".stripMargin

  /** Shared by text_decontam and decontam_bloom: the bloom prefilter is
    * output-invariant (exact verify removes its false positives), so both
    * queries verify against the identical exact SQL. */
  private val oDecontamSql =
    s"""WITH docs AS (SELECT doc_id, $oTokens AS w FROM documents),
       |sh AS (SELECT DISTINCT doc_id, ${oH60("sg")} AS h
       |       FROM (SELECT doc_id, unnest($oShingles3) AS sg FROM docs)),
       |ev AS (SELECT DISTINCT h FROM sh WHERE doc_id % $EvalMod = 0),
       |tr AS (SELECT doc_id, h FROM sh WHERE doc_id % $EvalMod <> 0)
       |SELECT tr.doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
       |  CAST(sum(CASE WHEN ev.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
       |  CAST(CAST(sum(CASE WHEN ev.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE)
       |    / count(*) AS contam_frac
       |FROM tr LEFT JOIN ev ON tr.h = ev.h
       |GROUP BY tr.doc_id""".stripMargin

  /** (vec_id, cluster) — the oracle spelling of [[semCells]], shared by
    * mix_domains and pipeline_select. */
  private val oCellsSql: String = {
    val planes = DedupQueries.semPlanesFor(DedupQueries.SemBits)
    val cellBits = (0 until DedupQueries.SemBits).map { j =>
      s"(CASE WHEN list_dot_product(v, ${oEmbPlaneOf(planes, j)}) > 0" +
        s" THEN ${1L << j} ELSE 0 END)"
    }.mkString(" + ")
    s"""SELECT vec_id, CAST($cellBits AS BIGINT) AS cluster
       |FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)""".stripMargin
  }

  /** Shared by mix_domains and (as a CTE) pipeline_select. */
  private val oMixDomainsSql: String =
    s"""WITH c AS ($oCellsSql),
       |d AS (SELECT doc_id, CAST(len($oTokens) AS BIGINT) AS n FROM documents),
       |per AS (SELECT cluster, CAST(count(*) AS BIGINT) AS n_docs,
       |          CAST(sum(n) AS BIGINT) AS n_tokens
       |        FROM c JOIN d ON d.doc_id = c.vec_id GROUP BY 1),
       |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       |          count(*) AS n_cells FROM per)
       |SELECT cluster, n_docs, n_tokens,
       |  CAST(total_tokens AS DOUBLE) / n_cells AS fair_share,
       |  least(CAST(1.0 AS DOUBLE),
       |    (CAST(total_tokens AS DOUBLE) / n_cells) / n_tokens) AS sample_rate
       |FROM per CROSS JOIN tot""".stripMargin

  /** Shared by sample_importance and (as a CTE) pipeline_select. */
  private val oSampleImportanceSql: String =
    s"""WITH tok AS (
       |  SELECT doc_id, lang,
       |    ${oH60("CAST(doc_id AS VARCHAR) || ':' || text || '|dsir'")}
       |      % $DsirScale AS draw,
       |    unnest($oTokens) AS t
       |  FROM documents),
       |f AS (SELECT doc_id, lang, draw,
       |        ${oH60("t || '|dsir'")} % $DsirDim AS f FROM tok),
       |cnt AS (SELECT f, count(*) AS r_cnt,
       |          count(*) FILTER (WHERE lang = 'en') AS t_cnt
       |        FROM f GROUP BY 1),
       |tot AS (SELECT sum(r_cnt) AS rt, sum(t_cnt) AS tt FROM cnt),
       |sc AS (SELECT f,
       |    CAST(floor((CAST((t_cnt + 1) * (rt + $DsirDim) AS DOUBLE) /
       |                CAST((r_cnt + 1) * (tt + $DsirDim) AS DOUBLE))
       |      * ${DsirScale}.0 + 0.5) AS BIGINT) AS sc
       |  FROM cnt CROSS JOIN tot),
       |per AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       |          CAST(sum(sc) AS BIGINT) AS imp_scaled, min(draw) AS draw
       |        FROM f JOIN sc USING (f) GROUP BY doc_id)
       |SELECT doc_id, n_tokens, imp_scaled,
       |  CAST(imp_scaled AS DOUBLE) / CAST(n_tokens AS DOUBLE)
       |    AS imp_mean_scaled,
       |  CAST(CASE WHEN draw * n_tokens < imp_scaled THEN 1 ELSE 0 END
       |    AS BIGINT) AS keep
       |FROM per""".stripMargin

  /** decontam_scrub: the oRunsSql island chain keeping the train
    * position, a window count for the island size, then the
    * dedup_span_scrub token rebuild restricted to train docs. */
  private val oScrubSql =
    s"""WITH docs AS (SELECT doc_id, $oTokens AS w FROM documents),
       |sg AS (SELECT doc_id, $oShingles3 AS ss FROM docs),
       |occ AS (SELECT doc_id, unnest(ss) AS s,
       |               unnest(range(0, len(ss))) AS q FROM sg),
       |o2 AS (SELECT doc_id, q, ${oH60("s")} AS h FROM occ),
       |j AS (SELECT t.doc_id AS t_doc, e.doc_id AS e_doc,
       |             t.q - e.q AS diag, e.q AS qe, t.q AS qt
       |      FROM o2 t JOIN o2 e ON t.h = e.h
       |      WHERE t.doc_id % $EvalMod <> 0 AND e.doc_id % $EvalMod = 0),
       |isl AS (SELECT t_doc, e_doc, diag, qe, qt,
       |          qe - row_number() OVER (
       |            PARTITION BY t_doc, e_doc, diag ORDER BY qe) AS isl
       |        FROM j),
       |qual AS (SELECT t_doc, qt,
       |           count(*) OVER (PARTITION BY t_doc, e_doc, diag, isl) AS L
       |         FROM isl),
       |cs AS (SELECT DISTINCT t_doc AS doc_id, qt AS q FROM qual
       |       WHERE L >= ${MinRunTokens - 2}),
       |ds AS (SELECT doc_id, list(q ORDER BY q) AS dstarts FROM cs GROUP BY doc_id),
       |fin AS (SELECT d.doc_id, d.w, coalesce(ds.dstarts, []) AS dsx
       |        FROM docs d LEFT JOIN ds ON ds.doc_id = d.doc_id
       |        WHERE d.doc_id % $EvalMod <> 0),
       |k AS (SELECT doc_id, w,
       |    [i for i in range(0, len(w))
       |     if len(list_filter(dsx, q -> q >= i-2 AND q <= i)) = 0] AS kept
       |  FROM fin)
       |SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
       |  CAST(len(w) - len(kept) AS BIGINT) AS n_removed,
       |  CASE WHEN w IS NULL THEN NULL
       |    ELSE coalesce(array_to_string([w[i+1] for i in kept], ' '), '')
       |  END AS scrub_text
       |FROM k""".stripMargin

  def oracles: Map[String, String] = Map(
    "decontam_bloom" -> oDecontamSql,
    "decontam_scrub" -> oScrubSql,
    "decontam_scrub_idx" -> oScrubSql,

    "doc_shuffle" ->
      s"""SELECT doc_id, shard,
         |  CAST(row_number() OVER (PARTITION BY shard ORDER BY hh, doc_id) AS BIGINT) AS pos
         |FROM (SELECT doc_id,
         |        ${oH60("CAST(doc_id AS VARCHAR) || ':' || text")} AS hh,
         |        ${oH60("CAST(doc_id AS VARCHAR) || ':' || text")} % $ShuffleShards AS shard
         |      FROM documents)""".stripMargin,

    "text_decontam" -> oDecontamSql,

    "decontam_runs" -> oRunsSql,

    // the driver gate makes index probe ≡ from-scratch recompute an
    // equality
    "decontam_runs_idx" -> oRunsSql,

    // Same cell partition as oCellsSql, same cosine arithmetic as the
    // dedup_semantic oracle family; eval/train roles instead of
    // batch/corpus.
    "decontam_semantic" -> {
      val planes = DedupQueries.semPlanesFor(DedupQueries.SemBits)
      val cellBits = (0 until DedupQueries.SemBits).map { j =>
        s"(CASE WHEN list_dot_product(v, ${oEmbPlaneOf(planes, j)}) > 0" +
          s" THEN ${1L << j} ELSE 0 END)"
      }.mkString(" + ")
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm,
         |             CAST($cellBits AS BIGINT) AS cluster FROM e),
         |ev AS (SELECT * FROM n WHERE vec_id % $EvalMod = 0),
         |tr AS (SELECT * FROM n WHERE vec_id % $EvalMod <> 0),
         |hits AS (
         |  SELECT tr.vec_id, min(ev.vec_id) AS contam_of,
         |         CAST(count(*) AS BIGINT) AS n_eval_dups
         |  FROM tr JOIN ev ON tr.cluster = ev.cluster
         |  WHERE list_dot_product(tr.v, ev.v)/(tr.nrm*ev.nrm) >= 0.4
         |  GROUP BY tr.vec_id)
         |SELECT tr.vec_id, tr.cluster, h.contam_of,
         |  CAST(coalesce(h.n_eval_dups, 0) AS BIGINT) AS n_eval_dups,
         |  h.contam_of IS NULL AS keep
         |FROM tr LEFT JOIN hits h ON h.vec_id = tr.vec_id""".stripMargin
    },

    "doc_pack" ->
      s"""WITH t AS (SELECT doc_id,
         |    CAST(len($oTokens) AS BIGINT) AS n_tokens FROM documents),
         |c AS (SELECT doc_id, n_tokens,
         |    coalesce(sum(n_tokens) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
         |  FROM t)
         |SELECT doc_id, n_tokens,
         |  CAST(cb // $PackBudget AS BIGINT) AS shard,
         |  CAST(cb % $PackBudget AS BIGINT) AS shard_offset
         |FROM c""".stripMargin,

    "doc_pack_semantic" ->
      s"""WITH t AS (SELECT doc_id,
         |    CAST(len($oTokens) AS BIGINT) AS n_tokens FROM documents),
         |cl AS ($oCellsSql),
         |k AS (SELECT doc_id, cluster, n_tokens,
         |        cluster * ${1L << 40} + doc_id AS ord
         |      FROM t JOIN cl ON cl.vec_id = t.doc_id),
         |c AS (SELECT doc_id, cluster, n_tokens,
         |    coalesce(sum(n_tokens) OVER (ORDER BY ord
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
         |  FROM k)
         |SELECT doc_id, cluster, n_tokens,
         |  CAST(cb // $PackBudget AS BIGINT) AS shard,
         |  CAST(cb % $PackBudget AS BIGINT) AS shard_offset
         |FROM c""".stripMargin,

    "doc_chunk" ->
      s"""WITH t AS (SELECT doc_id,
         |    CAST(len($oTokens) AS BIGINT) AS n_tokens FROM documents),
         |n AS (SELECT doc_id, n_tokens,
         |    CASE WHEN n_tokens <= $ChunkTokens THEN 1
         |         ELSE (n_tokens - $ChunkTokens + $ChunkStride - 1) // $ChunkStride + 1
         |    END AS n_chunks FROM t),
         |x AS (SELECT doc_id, n_tokens, unnest(range(0, n_chunks)) AS chunk_id FROM n)
         |SELECT doc_id, chunk_id, chunk_id * $ChunkStride + 1 AS start_tok,
         |  least(chunk_id * $ChunkStride + $ChunkTokens, n_tokens) AS end_tok,
         |  least(chunk_id * $ChunkStride + $ChunkTokens, n_tokens)
         |    - (chunk_id * $ChunkStride + 1) + 1 AS chunk_tokens
         |FROM x""".stripMargin,

    "sample_weighted" ->
      s"""WITH t AS (SELECT doc_id,
         |    CAST(len($oTokens) AS BIGINT) AS n_tokens, text FROM documents),
         |p AS (SELECT doc_id, n_tokens,
         |    least(CAST(1.0 AS DOUBLE), CAST($SampleTargetTokens AS DOUBLE) / n_tokens) AS sample_p,
         |    text FROM t)
         |SELECT doc_id, n_tokens, sample_p FROM p
         |WHERE ${oH60("text || '|sw'")} % 1000000
         |  < CAST(floor(sample_p * 1000000.0) AS BIGINT)""".stripMargin,

    "sample_importance" -> oSampleImportanceSql,

    "mix_allocation" ->
      s"""WITH per AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(len($oTokens)) AS BIGINT) AS n_tokens
         |  FROM documents GROUP BY source),
         |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
         |          count(*) AS n_sources FROM per)
         |SELECT source, n_docs, n_tokens,
         |  CAST(total_tokens AS DOUBLE) / n_sources AS fair_share,
         |  least(CAST(1.0 AS DOUBLE),
         |    (CAST(total_tokens AS DOUBLE) / n_sources) / n_tokens) AS sample_rate
         |FROM per CROSS JOIN tot""".stripMargin,

    "mix_novelty" ->
      s"""WITH sh AS (SELECT DISTINCT doc_id, ${oH60("s")} AS h
         |  FROM (SELECT doc_id, unnest($oShingles3) AS s
         |        FROM (SELECT doc_id, $oTokens AS w FROM documents))),
         |f AS (SELECT h, min(doc_id) AS first_doc FROM sh GROUP BY h),
         |pd AS (SELECT sh.doc_id, CAST(count(*) AS BIGINT) AS ns,
         |    CAST(sum(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS nn
         |  FROM sh JOIN f ON f.h = sh.h GROUP BY sh.doc_id),
         |ps AS (SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(pd.ns) AS BIGINT) AS n_shingles,
         |    CAST(sum(pd.nn) AS BIGINT) AS n_novel
         |  FROM documents d JOIN pd ON pd.doc_id = d.doc_id GROUP BY d.source),
         |t AS (SELECT coalesce(sum(n_novel), 0) AS tn FROM ps)
         |SELECT source, n_docs, n_shingles, n_novel,
         |  CAST((n_novel * 1000000) // n_shingles AS BIGINT) AS novelty_ppm,
         |  CAST(CASE WHEN (SELECT tn FROM t) = 0 THEN 0
         |       ELSE (n_novel * 1000000) // (SELECT tn FROM t) END AS BIGINT) AS w_ppm
         |FROM ps""".stripMargin,

    // identical prefix-sum cap-boundary algebra: BIGINT until the final
    // level division, so the boundary test is exact on both engines
    "mix_epoch_cap" ->
      s"""WITH per AS (
         |  SELECT source, CAST(sum(len($oTokens)) AS BIGINT) AS n_tokens
         |  FROM documents GROUP BY source),
         |cap AS (SELECT source, n_tokens, n_tokens * $EpochCap AS capacity FROM per),
         |tot AS (SELECT count(*) AS n_sources,
         |          CAST(sum(n_tokens) AS BIGINT) AS total FROM cap),
         |ranked AS (SELECT source, n_tokens, capacity,
         |    CAST(row_number() OVER (ORDER BY capacity, source) AS BIGINT) AS i,
         |    CAST(coalesce(sum(capacity) OVER (ORDER BY capacity, source
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS p_prev
         |  FROM cap),
         |flagged AS (SELECT r.*, t.total,
         |    (r.capacity * (t.n_sources - r.i + 1) + r.p_prev) * $BudgetDenom
         |      < t.total * $BudgetNumer AS capped
         |  FROM ranked r CROSS JOIN tot t),
         |lvl AS (SELECT
         |    CAST(max(total) * $BudgetNumer
         |        - coalesce(sum(CASE WHEN capped THEN capacity END), 0) * $BudgetDenom
         |      AS DOUBLE)
         |      / (sum(CASE WHEN NOT capped THEN 1 END) * $BudgetDenom) AS level
         |  FROM flagged)
         |SELECT source, n_tokens, capacity,
         |  CASE WHEN capped THEN CAST(capacity AS DOUBLE) ELSE level END AS alloc_tokens,
         |  (CASE WHEN capped THEN CAST(capacity AS DOUBLE) ELSE level END) / n_tokens
         |    AS epochs
         |FROM flagged CROSS JOIN lvl""".stripMargin,

    "mix_domains" -> oMixDomainsSql,

    "pipeline_select" ->
      s"""WITH rep AS (SELECT doc_id
         |  FROM (${TextQueries.oracles("text_gopher_rep")}) WHERE keep = 1),
         |imp AS (SELECT doc_id, n_tokens
         |  FROM ($oSampleImportanceSql) WHERE keep = 1),
         |cells AS ($oCellsSql),
         |dom AS ($oMixDomainsSql)
         |SELECT i.doc_id, c.cluster, i.n_tokens, d.sample_rate
         |FROM imp i
         |JOIN rep ON rep.doc_id = i.doc_id
         |JOIN cells c ON c.vec_id = i.doc_id
         |JOIN dom d ON d.cluster = c.cluster
         |JOIN documents t ON t.doc_id = i.doc_id
         |WHERE ${oH60("t.text || '|mix'")} % 1000000
         |  < CAST(floor(d.sample_rate * 1000000.0) AS BIGINT)""".stripMargin,

    "pipeline_curate" ->
      s"""WITH docs AS (SELECT doc_id, text,
         |    CAST(len($oTokens) AS BIGINT) AS n_tokens FROM documents),
         |quality AS (SELECT * FROM docs WHERE n_tokens >= 5
         |  AND CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE)
         |    / nullif(length(text), 0) < 0.3),
         |keep AS (SELECT min(doc_id) AS doc_id FROM quality GROUP BY md5(text)),
         |kept AS (SELECT q.doc_id, q.text, q.n_tokens
         |         FROM quality q JOIN keep k ON q.doc_id = k.doc_id),
         |sh AS (SELECT DISTINCT doc_id, ${oH60("sg")} AS h
         |       FROM (SELECT doc_id, unnest($oShingles3) AS sg
         |             FROM (SELECT doc_id, $oTokens AS w FROM kept))),
         |ev AS (SELECT DISTINCT h FROM sh WHERE doc_id % $EvalMod = 0),
         |contaminated AS (
         |  SELECT doc_id FROM (
         |    SELECT tr.doc_id,
         |      CAST(sum(CASE WHEN ev.h IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
         |        / count(*) AS frac
         |    FROM (SELECT doc_id, h FROM sh WHERE doc_id % $EvalMod <> 0) tr
         |    LEFT JOIN ev ON tr.h = ev.h GROUP BY tr.doc_id)
         |  WHERE frac >= 0.5),
         |train AS (SELECT doc_id, n_tokens FROM kept
         |  WHERE doc_id % $EvalMod <> 0
         |    AND doc_id NOT IN (SELECT doc_id FROM contaminated)),
         |c AS (SELECT doc_id, n_tokens,
         |    coalesce(sum(n_tokens) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
         |  FROM train)
         |SELECT doc_id, n_tokens,
         |  CAST(cb // $PackBudget AS BIGINT) AS shard,
         |  CAST(cb % $PackBudget AS BIGINT) AS shard_offset
         |FROM c""".stripMargin,

    // pipeline_curate's stage CTEs + the token-level scrub stage: the
    // oScrubSql island chain over the CURATED frames (train survivors vs
    // gate/dedup-surviving eval docs), then the packing window over the
    // POST-scrub token counts
    "pipeline_curate_scrub" ->
      s"""WITH docs AS (SELECT doc_id, text, $oTokens AS w FROM documents),
         |quality AS (SELECT doc_id, text, w FROM docs
         |  WHERE len(w) >= 5
         |  AND CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE)
         |    / nullif(length(text), 0) < 0.3),
         |keep AS (SELECT min(doc_id) AS doc_id FROM quality GROUP BY md5(text)),
         |kept AS (SELECT q.doc_id, q.text, q.w
         |         FROM quality q JOIN keep k ON q.doc_id = k.doc_id),
         |sh AS (SELECT DISTINCT doc_id, ${oH60("sg")} AS h
         |       FROM (SELECT doc_id, unnest($oShingles3) AS sg FROM kept)),
         |ev AS (SELECT DISTINCT h FROM sh WHERE doc_id % $EvalMod = 0),
         |contaminated AS (
         |  SELECT doc_id FROM (
         |    SELECT tr.doc_id,
         |      CAST(sum(CASE WHEN ev.h IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
         |        / count(*) AS frac
         |    FROM (SELECT doc_id, h FROM sh WHERE doc_id % $EvalMod <> 0) tr
         |    LEFT JOIN ev ON tr.h = ev.h GROUP BY tr.doc_id)
         |  WHERE frac >= 0.5),
         |train AS (SELECT doc_id, w FROM kept
         |  WHERE doc_id % $EvalMod <> 0
         |    AND doc_id NOT IN (SELECT doc_id FROM contaminated)),
         |sgt AS (SELECT doc_id, $oShingles3 AS ss FROM train),
         |sge AS (SELECT doc_id, $oShingles3 AS ss
         |        FROM (SELECT doc_id, w FROM kept WHERE doc_id % $EvalMod = 0)),
         |occt AS (SELECT doc_id, unnest(ss) AS s,
         |                unnest(range(0, len(ss))) AS q FROM sgt),
         |occe AS (SELECT doc_id, unnest(ss) AS s,
         |                unnest(range(0, len(ss))) AS q FROM sge),
         |j AS (SELECT t.doc_id AS t_doc, e.doc_id AS e_doc,
         |             t.q - e.q AS diag, e.q AS qe, t.q AS qt
         |      FROM (SELECT doc_id, q, ${oH60("s")} AS h FROM occt) t
         |      JOIN (SELECT doc_id, q, ${oH60("s")} AS h FROM occe) e
         |        ON t.h = e.h),
         |isl AS (SELECT t_doc, e_doc, diag, qe, qt,
         |          qe - row_number() OVER (
         |            PARTITION BY t_doc, e_doc, diag ORDER BY qe) AS isl
         |        FROM j),
         |qual AS (SELECT t_doc, qt,
         |           count(*) OVER (PARTITION BY t_doc, e_doc, diag, isl) AS L
         |         FROM isl),
         |cs AS (SELECT DISTINCT t_doc AS doc_id, qt AS q FROM qual
         |       WHERE L >= ${MinRunTokens - 2}),
         |ds AS (SELECT doc_id, list(q ORDER BY q) AS dstarts FROM cs GROUP BY doc_id),
         |fin AS (SELECT t.doc_id, t.w, coalesce(ds.dstarts, []) AS dsx
         |        FROM train t LEFT JOIN ds ON ds.doc_id = t.doc_id),
         |k AS (SELECT doc_id, w,
         |    [i for i in range(0, len(w))
         |     if len(list_filter(dsx, q -> q >= i-2 AND q <= i)) = 0] AS kept2
         |  FROM fin),
         |sc AS (SELECT doc_id, CAST(len(kept2) AS BIGINT) AS n_tokens,
         |         CAST(len(w) - len(kept2) AS BIGINT) AS n_removed FROM k),
         |c AS (SELECT doc_id, n_tokens, n_removed,
         |    coalesce(sum(n_tokens) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
         |  FROM sc)
         |SELECT doc_id, n_tokens, n_removed,
         |  CAST(cb // $PackBudget AS BIGINT) AS shard,
         |  CAST(cb % $PackBudget AS BIGINT) AS shard_offset
         |FROM c""".stripMargin,

    // pipeline_curate's stage CTEs + the span keep-first stage: per
    // duplicated trigram among the train survivors the lowest doc_id
    // keeps it, every other positioned occurrence becomes a dup start
    // (the dedup_span_keepfirst oracle chain), then the packing window
    // over the post-scrub token counts
    "pipeline_curate_spans" ->
      s"""WITH docs AS (SELECT doc_id, text, $oTokens AS w FROM documents),
         |quality AS (SELECT doc_id, text, w FROM docs
         |  WHERE len(w) >= 5
         |  AND CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE)
         |    / nullif(length(text), 0) < 0.3),
         |keep AS (SELECT min(doc_id) AS doc_id FROM quality GROUP BY md5(text)),
         |kept AS (SELECT q.doc_id, q.text, q.w
         |         FROM quality q JOIN keep k ON q.doc_id = k.doc_id),
         |sh AS (SELECT DISTINCT doc_id, ${oH60("sg")} AS h
         |       FROM (SELECT doc_id, unnest($oShingles3) AS sg FROM kept)),
         |ev AS (SELECT DISTINCT h FROM sh WHERE doc_id % $EvalMod = 0),
         |contaminated AS (
         |  SELECT doc_id FROM (
         |    SELECT tr.doc_id,
         |      CAST(sum(CASE WHEN ev.h IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
         |        / count(*) AS frac
         |    FROM (SELECT doc_id, h FROM sh WHERE doc_id % $EvalMod <> 0) tr
         |    LEFT JOIN ev ON tr.h = ev.h GROUP BY tr.doc_id)
         |  WHERE frac >= 0.5),
         |train AS (SELECT doc_id, w FROM kept
         |  WHERE doc_id % $EvalMod <> 0
         |    AND doc_id NOT IN (SELECT doc_id FROM contaminated)),
         |sgt AS (SELECT doc_id, $oShingles3 AS ss FROM train),
         |occ AS (SELECT doc_id, unnest(ss) AS s,
         |               unnest(range(0, len(ss))) AS q FROM sgt),
         |o2 AS (SELECT doc_id, q, ${oH60("s")} AS h FROM occ),
         |bk AS (SELECT h, min(doc_id) AS keep_id
         |       FROM (SELECT DISTINCT doc_id, h FROM o2)
         |       GROUP BY h HAVING count(*) >= 2),
         |cs AS (SELECT o2.doc_id, o2.q FROM o2 JOIN bk ON o2.h = bk.h
         |       WHERE o2.doc_id <> bk.keep_id),
         |ds AS (SELECT doc_id, list(q ORDER BY q) AS dstarts FROM cs GROUP BY doc_id),
         |fin AS (SELECT t.doc_id, t.w, coalesce(ds.dstarts, []) AS dsx
         |        FROM train t LEFT JOIN ds ON ds.doc_id = t.doc_id),
         |k AS (SELECT doc_id, w,
         |    [i for i in range(0, len(w))
         |     if len(list_filter(dsx, q -> q >= i-2 AND q <= i)) = 0] AS kept2
         |  FROM fin),
         |sc AS (SELECT doc_id, CAST(len(kept2) AS BIGINT) AS n_tokens,
         |         CAST(len(w) - len(kept2) AS BIGINT) AS n_removed FROM k),
         |c AS (SELECT doc_id, n_tokens, n_removed,
         |    coalesce(sum(n_tokens) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
         |  FROM sc)
         |SELECT doc_id, n_tokens, n_removed,
         |  CAST(cb // $PackBudget AS BIGINT) AS shard,
         |  CAST(cb % $PackBudget AS BIGINT) AS shard_offset
         |FROM c""".stripMargin,

    // the full-strength DAG's oracle: pipeline_curate_neardup's
    // recursive-CTE stage chain through the near-dup keepers, then BOTH
    // text-rewriting chains (the scrub island chain and the keep-first
    // min-id chain) over the near-dup survivors, their start sets
    // UNIONed (set union — an overlapping region excises once), one
    // token rebuild, and the packing window on post-scrub counts
    "pipeline_curate_full" ->
      s"""WITH RECURSIVE docs AS (SELECT doc_id, text, $oTokens AS w FROM documents),
         |quality AS (SELECT doc_id, text, w FROM docs
         |  WHERE len(w) >= 5
         |  AND CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE)
         |    / nullif(length(text), 0) < 0.3),
         |keep AS (SELECT min(doc_id) AS doc_id FROM quality GROUP BY md5(text)),
         |kept AS (SELECT q.doc_id, q.text, q.w
         |         FROM quality q JOIN keep k ON q.doc_id = k.doc_id),
         |sh AS (SELECT DISTINCT doc_id, ${oH60("sg")} AS h
         |       FROM (SELECT doc_id, unnest($oShingles3) AS sg FROM kept)),
         |ev AS (SELECT DISTINCT h FROM sh WHERE doc_id % $EvalMod = 0),
         |contaminated AS (
         |  SELECT doc_id FROM (
         |    SELECT tr.doc_id,
         |      CAST(sum(CASE WHEN ev.h IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
         |        / count(*) AS frac
         |    FROM (SELECT doc_id, h FROM sh WHERE doc_id % $EvalMod <> 0) tr
         |    LEFT JOIN ev ON tr.h = ev.h GROUP BY tr.doc_id)
         |  WHERE frac >= 0.5),
         |train AS (SELECT doc_id, w FROM kept
         |  WHERE doc_id % $EvalMod <> 0
         |    AND doc_id NOT IN (SELECT doc_id FROM contaminated)),
         |tsh AS (SELECT s.doc_id, s.h FROM sh s
         |        JOIN train t ON t.doc_id = s.doc_id),
         |tcnt AS (SELECT doc_id, count(*) AS n FROM tsh GROUP BY 1),
         |inter AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
         |  FROM tsh a JOIN tsh b ON a.h = b.h AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |prs AS (
         |  SELECT doc_a, doc_b
         |  FROM inter JOIN tcnt ca ON ca.doc_id = doc_a
         |    JOIN tcnt cb ON cb.doc_id = doc_b
         |  WHERE CAST(i AS DOUBLE)/(ca.n + cb.n - i) >= $NearDupThreshold),
         |edges AS (SELECT doc_a AS a, doc_b AS b FROM prs
         |          UNION ALL SELECT doc_b, doc_a FROM prs),
         |reach(id, r) AS (
         |  SELECT doc_id, doc_id FROM train
         |  UNION
         |  SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id),
         |ndk AS (SELECT id AS doc_id FROM reach GROUP BY id HAVING min(r) = id),
         |nd AS (SELECT t.doc_id, t.w FROM train t
         |       JOIN ndk ON ndk.doc_id = t.doc_id),
         |sgt AS (SELECT doc_id, $oShingles3 AS ss FROM nd),
         |sge AS (SELECT doc_id, $oShingles3 AS ss
         |        FROM (SELECT doc_id, w FROM kept WHERE doc_id % $EvalMod = 0)),
         |occt AS (SELECT doc_id, unnest(ss) AS s,
         |                unnest(range(0, len(ss))) AS q FROM sgt),
         |occe AS (SELECT doc_id, unnest(ss) AS s,
         |                unnest(range(0, len(ss))) AS q FROM sge),
         |o2 AS (SELECT doc_id, q, ${oH60("s")} AS h FROM occt),
         |j AS (SELECT t.doc_id AS t_doc, e.doc_id AS e_doc,
         |             t.q - e.q AS diag, e.q AS qe, t.q AS qt
         |      FROM o2 t
         |      JOIN (SELECT doc_id, q, ${oH60("s")} AS h FROM occe) e
         |        ON t.h = e.h),
         |isl AS (SELECT t_doc, e_doc, diag, qe, qt,
         |          qe - row_number() OVER (
         |            PARTITION BY t_doc, e_doc, diag ORDER BY qe) AS isl
         |        FROM j),
         |qual AS (SELECT t_doc, qt,
         |           count(*) OVER (PARTITION BY t_doc, e_doc, diag, isl) AS L
         |         FROM isl),
         |cs1 AS (SELECT DISTINCT t_doc AS doc_id, qt AS q FROM qual
         |        WHERE L >= ${MinRunTokens - 2}),
         |bk AS (SELECT h, min(doc_id) AS keep_id
         |       FROM (SELECT DISTINCT doc_id, h FROM o2)
         |       GROUP BY h HAVING count(*) >= 2),
         |cs2 AS (SELECT o2.doc_id, o2.q FROM o2 JOIN bk ON o2.h = bk.h
         |        WHERE o2.doc_id <> bk.keep_id),
         |cs AS (SELECT doc_id, q FROM cs1 UNION SELECT doc_id, q FROM cs2),
         |ds AS (SELECT doc_id, list(q ORDER BY q) AS dstarts FROM cs GROUP BY doc_id),
         |fin AS (SELECT t.doc_id, t.w, coalesce(ds.dstarts, []) AS dsx
         |        FROM nd t LEFT JOIN ds ON ds.doc_id = t.doc_id),
         |k AS (SELECT doc_id, w,
         |    [i for i in range(0, len(w))
         |     if len(list_filter(dsx, q -> q >= i-2 AND q <= i)) = 0] AS kept2
         |  FROM fin),
         |sc AS (SELECT doc_id, CAST(len(kept2) AS BIGINT) AS n_tokens,
         |         CAST(len(w) - len(kept2) AS BIGINT) AS n_removed FROM k),
         |c AS (SELECT doc_id, n_tokens, n_removed,
         |    coalesce(sum(n_tokens) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
         |  FROM sc)
         |SELECT doc_id, n_tokens, n_removed,
         |  CAST(cb // $PackBudget AS BIGINT) AS shard,
         |  CAST(cb % $PackBudget AS BIGINT) AS shard_offset
         |FROM c""".stripMargin,

    // pipeline_curate's stage CTEs + the near-dup stage: exact jaccard
    // pairs among the train survivors, recursive-CTE connected
    // components (the dedup_clusters oracle shape), keeper = component
    // min, then the identical packing window over the thinner set
    "pipeline_curate_neardup" ->
      s"""WITH RECURSIVE docs AS (SELECT doc_id, text,
         |    CAST(len($oTokens) AS BIGINT) AS n_tokens FROM documents),
         |quality AS (SELECT * FROM docs WHERE n_tokens >= 5
         |  AND CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE)
         |    / nullif(length(text), 0) < 0.3),
         |keep AS (SELECT min(doc_id) AS doc_id FROM quality GROUP BY md5(text)),
         |kept AS (SELECT q.doc_id, q.text, q.n_tokens
         |         FROM quality q JOIN keep k ON q.doc_id = k.doc_id),
         |sh AS (SELECT DISTINCT doc_id, ${oH60("sg")} AS h
         |       FROM (SELECT doc_id, unnest($oShingles3) AS sg
         |             FROM (SELECT doc_id, $oTokens AS w FROM kept))),
         |ev AS (SELECT DISTINCT h FROM sh WHERE doc_id % $EvalMod = 0),
         |contaminated AS (
         |  SELECT doc_id FROM (
         |    SELECT tr.doc_id,
         |      CAST(sum(CASE WHEN ev.h IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
         |        / count(*) AS frac
         |    FROM (SELECT doc_id, h FROM sh WHERE doc_id % $EvalMod <> 0) tr
         |    LEFT JOIN ev ON tr.h = ev.h GROUP BY tr.doc_id)
         |  WHERE frac >= 0.5),
         |train AS (SELECT doc_id, n_tokens FROM kept
         |  WHERE doc_id % $EvalMod <> 0
         |    AND doc_id NOT IN (SELECT doc_id FROM contaminated)),
         |tsh AS (SELECT s.doc_id, s.h FROM sh s
         |        JOIN train t ON t.doc_id = s.doc_id),
         |tcnt AS (SELECT doc_id, count(*) AS n FROM tsh GROUP BY 1),
         |inter AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
         |  FROM tsh a JOIN tsh b ON a.h = b.h AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |prs AS (
         |  SELECT doc_a, doc_b
         |  FROM inter JOIN tcnt ca ON ca.doc_id = doc_a
         |    JOIN tcnt cb ON cb.doc_id = doc_b
         |  WHERE CAST(i AS DOUBLE)/(ca.n + cb.n - i) >= $NearDupThreshold),
         |edges AS (SELECT doc_a AS a, doc_b AS b FROM prs
         |          UNION ALL SELECT doc_b, doc_a FROM prs),
         |reach(id, r) AS (
         |  SELECT doc_id, doc_id FROM train
         |  UNION
         |  SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id),
         |nd AS (SELECT id AS doc_id FROM reach GROUP BY id HAVING min(r) = id),
         |c AS (SELECT t.doc_id, t.n_tokens,
         |    coalesce(sum(t.n_tokens) OVER (ORDER BY t.doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
         |  FROM train t JOIN nd ON nd.doc_id = t.doc_id)
         |SELECT doc_id, n_tokens,
         |  CAST(cb // $PackBudget AS BIGINT) AS shard,
         |  CAST(cb % $PackBudget AS BIGINT) AS shard_offset
         |FROM c""".stripMargin,

    // pipeline_audit's CTEs + the near-dup cluster assignment (recursive
    // reach over the train-survivor pair graph) with 'neardup' in the
    // DAG-ordered verdict CASE and the thinner packing's shard columns
    "pipeline_audit_neardup" ->
      s"""WITH RECURSIVE docs AS (SELECT doc_id, text,
         |    CAST(len($oTokens) AS BIGINT) AS n_tokens FROM documents),
         |quality AS (SELECT * FROM docs WHERE n_tokens >= 5
         |  AND CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE)
         |    / nullif(length(text), 0) < 0.3),
         |keepw AS (SELECT md5(text) AS ch, min(doc_id) AS keep_id
         |          FROM quality GROUP BY md5(text)),
         |dups AS (SELECT q.doc_id, k.keep_id
         |         FROM quality q JOIN keepw k ON md5(q.text) = k.ch),
         |kept AS (SELECT q.doc_id, q.text, q.n_tokens
         |         FROM quality q JOIN dups d ON q.doc_id = d.doc_id
         |           AND d.keep_id = q.doc_id),
         |sh AS (SELECT DISTINCT doc_id, ${oH60("sg")} AS h
         |       FROM (SELECT doc_id, unnest($oShingles3) AS sg
         |             FROM (SELECT doc_id, $oTokens AS w FROM kept))),
         |ev AS (SELECT DISTINCT h FROM sh WHERE doc_id % $EvalMod = 0),
         |contam AS (
         |  SELECT tr.doc_id,
         |    CAST(CAST(sum(CASE WHEN ev.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE)
         |      / count(*) AS contam_frac
         |  FROM (SELECT doc_id, h FROM sh WHERE doc_id % $EvalMod <> 0) tr
         |  LEFT JOIN ev ON tr.h = ev.h GROUP BY tr.doc_id),
         |train AS (SELECT doc_id, n_tokens FROM kept
         |  WHERE doc_id % $EvalMod <> 0
         |    AND doc_id NOT IN (SELECT doc_id FROM contam WHERE contam_frac >= 0.5)),
         |tsh AS (SELECT s.doc_id, s.h FROM sh s
         |        JOIN train t ON t.doc_id = s.doc_id),
         |tcnt AS (SELECT doc_id, count(*) AS n FROM tsh GROUP BY 1),
         |inter AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
         |  FROM tsh a JOIN tsh b ON a.h = b.h AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |prs AS (
         |  SELECT doc_a, doc_b
         |  FROM inter JOIN tcnt ca ON ca.doc_id = doc_a
         |    JOIN tcnt cb ON cb.doc_id = doc_b
         |  WHERE CAST(i AS DOUBLE)/(ca.n + cb.n - i) >= $NearDupThreshold),
         |edges AS (SELECT doc_a AS a, doc_b AS b FROM prs
         |          UNION ALL SELECT doc_b, doc_a FROM prs),
         |reach(id, r) AS (
         |  SELECT doc_id, doc_id FROM train
         |  UNION
         |  SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id),
         |cl AS (SELECT id AS doc_id, min(r) AS cluster FROM reach GROUP BY id),
         |c AS (SELECT t.doc_id, t.n_tokens,
         |    coalesce(sum(t.n_tokens) OVER (ORDER BY t.doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
         |  FROM train t JOIN cl ON cl.doc_id = t.doc_id AND cl.cluster = t.doc_id),
         |packed AS (SELECT doc_id,
         |    CAST(cb // $PackBudget AS BIGINT) AS shard,
         |    CAST(cb % $PackBudget AS BIGINT) AS shard_offset
         |  FROM c)
         |SELECT d.doc_id, d.n_tokens,
         |  CASE WHEN du.keep_id IS NULL THEN 'gate_failed'
         |       WHEN du.keep_id <> d.doc_id THEN 'dup'
         |       WHEN d.doc_id % $EvalMod = 0 THEN 'eval_split'
         |       WHEN ct.contam_frac >= 0.5 THEN 'contaminated'
         |       WHEN cl.cluster <> d.doc_id THEN 'neardup'
         |       ELSE 'kept' END AS fate,
         |  CASE WHEN du.keep_id <> d.doc_id THEN du.keep_id
         |       WHEN cl.cluster <> d.doc_id THEN cl.cluster END AS dup_of,
         |  ct.contam_frac, p.shard, p.shard_offset
         |FROM docs d LEFT JOIN dups du ON du.doc_id = d.doc_id
         |  LEFT JOIN contam ct ON ct.doc_id = d.doc_id
         |  LEFT JOIN cl ON cl.doc_id = d.doc_id
         |  LEFT JOIN packed p ON p.doc_id = d.doc_id""".stripMargin,

    // pipeline_audit_neardup's fate CTEs + pipeline_curate_full's
    // composed rebuild tail: the keepers' benchmark-scrub (cs1) and
    // span-keep-first (cs2) dup starts UNION into one token rebuild,
    // n_removed and the shard columns come from the post-scrub packing,
    // and the verdict CASE carries 'neardup' in DAG order
    "pipeline_audit_full" ->
      s"""WITH RECURSIVE docs AS (SELECT doc_id, text, $oTokens AS w,
         |    CAST(len($oTokens) AS BIGINT) AS n_tokens FROM documents),
         |quality AS (SELECT * FROM docs WHERE n_tokens >= 5
         |  AND CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE)
         |    / nullif(length(text), 0) < 0.3),
         |keepw AS (SELECT md5(text) AS ch, min(doc_id) AS keep_id
         |          FROM quality GROUP BY md5(text)),
         |dups AS (SELECT q.doc_id, k.keep_id
         |         FROM quality q JOIN keepw k ON md5(q.text) = k.ch),
         |kept AS (SELECT q.doc_id, q.text, q.w, q.n_tokens
         |         FROM quality q JOIN dups d ON q.doc_id = d.doc_id
         |           AND d.keep_id = q.doc_id),
         |sh AS (SELECT DISTINCT doc_id, ${oH60("sg")} AS h
         |       FROM (SELECT doc_id, unnest($oShingles3) AS sg FROM kept)),
         |ev AS (SELECT DISTINCT h FROM sh WHERE doc_id % $EvalMod = 0),
         |contam AS (
         |  SELECT tr.doc_id,
         |    CAST(CAST(sum(CASE WHEN ev.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE)
         |      / count(*) AS contam_frac
         |  FROM (SELECT doc_id, h FROM sh WHERE doc_id % $EvalMod <> 0) tr
         |  LEFT JOIN ev ON tr.h = ev.h GROUP BY tr.doc_id),
         |train AS (SELECT doc_id, w FROM kept
         |  WHERE doc_id % $EvalMod <> 0
         |    AND doc_id NOT IN (SELECT doc_id FROM contam WHERE contam_frac >= 0.5)),
         |tsh AS (SELECT s.doc_id, s.h FROM sh s
         |        JOIN train t ON t.doc_id = s.doc_id),
         |tcnt AS (SELECT doc_id, count(*) AS n FROM tsh GROUP BY 1),
         |inter AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
         |  FROM tsh a JOIN tsh b ON a.h = b.h AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |prs AS (
         |  SELECT doc_a, doc_b
         |  FROM inter JOIN tcnt ca ON ca.doc_id = doc_a
         |    JOIN tcnt cb ON cb.doc_id = doc_b
         |  WHERE CAST(i AS DOUBLE)/(ca.n + cb.n - i) >= $NearDupThreshold),
         |edges AS (SELECT doc_a AS a, doc_b AS b FROM prs
         |          UNION ALL SELECT doc_b, doc_a FROM prs),
         |reach(id, r) AS (
         |  SELECT doc_id, doc_id FROM train
         |  UNION
         |  SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id),
         |cl AS (SELECT id AS doc_id, min(r) AS cluster FROM reach GROUP BY id),
         |nd AS (SELECT t.doc_id, t.w FROM train t
         |       JOIN cl ON cl.doc_id = t.doc_id AND cl.cluster = t.doc_id),
         |sgt AS (SELECT doc_id, $oShingles3 AS ss FROM nd),
         |sge AS (SELECT doc_id, $oShingles3 AS ss
         |        FROM (SELECT doc_id, w FROM kept WHERE doc_id % $EvalMod = 0)),
         |occt AS (SELECT doc_id, unnest(ss) AS s,
         |                unnest(range(0, len(ss))) AS q FROM sgt),
         |occe AS (SELECT doc_id, unnest(ss) AS s,
         |                unnest(range(0, len(ss))) AS q FROM sge),
         |o2 AS (SELECT doc_id, q, ${oH60("s")} AS h FROM occt),
         |j AS (SELECT t.doc_id AS t_doc, e.doc_id AS e_doc,
         |             t.q - e.q AS diag, e.q AS qe, t.q AS qt
         |      FROM o2 t
         |      JOIN (SELECT doc_id, q, ${oH60("s")} AS h FROM occe) e
         |        ON t.h = e.h),
         |isl AS (SELECT t_doc, e_doc, diag, qe, qt,
         |          qe - row_number() OVER (
         |            PARTITION BY t_doc, e_doc, diag ORDER BY qe) AS isl
         |        FROM j),
         |qual AS (SELECT t_doc, qt,
         |           count(*) OVER (PARTITION BY t_doc, e_doc, diag, isl) AS L
         |         FROM isl),
         |cs1 AS (SELECT DISTINCT t_doc AS doc_id, qt AS q FROM qual
         |        WHERE L >= ${MinRunTokens - 2}),
         |bk AS (SELECT h, min(doc_id) AS keep_id
         |       FROM (SELECT DISTINCT doc_id, h FROM o2)
         |       GROUP BY h HAVING count(*) >= 2),
         |cs2 AS (SELECT o2.doc_id, o2.q FROM o2 JOIN bk ON o2.h = bk.h
         |        WHERE o2.doc_id <> bk.keep_id),
         |cs AS (SELECT doc_id, q FROM cs1 UNION SELECT doc_id, q FROM cs2),
         |ds AS (SELECT doc_id, list(q ORDER BY q) AS dstarts FROM cs GROUP BY doc_id),
         |fin AS (SELECT t.doc_id, t.w, coalesce(ds.dstarts, []) AS dsx
         |        FROM nd t LEFT JOIN ds ON ds.doc_id = t.doc_id),
         |k AS (SELECT doc_id, w,
         |    [i for i in range(0, len(w))
         |     if len(list_filter(dsx, q -> q >= i-2 AND q <= i)) = 0] AS kept2
         |  FROM fin),
         |sc AS (SELECT doc_id, CAST(len(kept2) AS BIGINT) AS nt,
         |         CAST(len(w) - len(kept2) AS BIGINT) AS n_removed FROM k),
         |c AS (SELECT doc_id, n_removed,
         |    coalesce(sum(nt) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
         |  FROM sc),
         |packed AS (SELECT doc_id, n_removed,
         |    CAST(cb // $PackBudget AS BIGINT) AS shard,
         |    CAST(cb % $PackBudget AS BIGINT) AS shard_offset
         |  FROM c)
         |SELECT d.doc_id, d.n_tokens,
         |  CASE WHEN du.keep_id IS NULL THEN 'gate_failed'
         |       WHEN du.keep_id <> d.doc_id THEN 'dup'
         |       WHEN d.doc_id % $EvalMod = 0 THEN 'eval_split'
         |       WHEN ct.contam_frac >= 0.5 THEN 'contaminated'
         |       WHEN cl.cluster <> d.doc_id THEN 'neardup'
         |       ELSE 'kept' END AS fate,
         |  CASE WHEN du.keep_id <> d.doc_id THEN du.keep_id
         |       WHEN cl.cluster <> d.doc_id THEN cl.cluster END AS dup_of,
         |  ct.contam_frac, p.n_removed, p.shard, p.shard_offset
         |FROM docs d LEFT JOIN dups du ON du.doc_id = d.doc_id
         |  LEFT JOIN contam ct ON ct.doc_id = d.doc_id
         |  LEFT JOIN cl ON cl.doc_id = d.doc_id
         |  LEFT JOIN packed p ON p.doc_id = d.doc_id""".stripMargin,

    // pipeline_curate's stage CTEs replayed, joined back to every corpus
    // doc with the DAG-ordered verdict CASE
    // pipeline_audit's CTEs + the scrub chain: fate CASE verbatim,
    // n_removed from the island algebra over the curated frames, shard
    // columns from the post-scrub packing window
    "pipeline_audit_scrub" ->
      s"""WITH docs AS (SELECT doc_id, text, $oTokens AS w,
         |    CAST(len($oTokens) AS BIGINT) AS n_tokens FROM documents),
         |quality AS (SELECT * FROM docs WHERE n_tokens >= 5
         |  AND CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE)
         |    / nullif(length(text), 0) < 0.3),
         |keepw AS (SELECT md5(text) AS ch, min(doc_id) AS keep_id
         |          FROM quality GROUP BY md5(text)),
         |dups AS (SELECT q.doc_id, k.keep_id
         |         FROM quality q JOIN keepw k ON md5(q.text) = k.ch),
         |kept AS (SELECT q.doc_id, q.text, q.w, q.n_tokens
         |         FROM quality q JOIN dups d ON q.doc_id = d.doc_id
         |           AND d.keep_id = q.doc_id),
         |sh AS (SELECT DISTINCT doc_id, ${oH60("sg")} AS h
         |       FROM (SELECT doc_id, unnest($oShingles3) AS sg FROM kept)),
         |ev AS (SELECT DISTINCT h FROM sh WHERE doc_id % $EvalMod = 0),
         |contam AS (
         |  SELECT tr.doc_id,
         |    CAST(CAST(sum(CASE WHEN ev.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE)
         |      / count(*) AS contam_frac
         |  FROM (SELECT doc_id, h FROM sh WHERE doc_id % $EvalMod <> 0) tr
         |  LEFT JOIN ev ON tr.h = ev.h GROUP BY tr.doc_id),
         |train AS (SELECT doc_id, w FROM kept
         |  WHERE doc_id % $EvalMod <> 0
         |    AND doc_id NOT IN (SELECT doc_id FROM contam WHERE contam_frac >= 0.5)),
         |sgt AS (SELECT doc_id, $oShingles3 AS ss FROM train),
         |sge AS (SELECT doc_id, $oShingles3 AS ss
         |        FROM (SELECT doc_id, w FROM kept WHERE doc_id % $EvalMod = 0)),
         |occt AS (SELECT doc_id, unnest(ss) AS s,
         |                unnest(range(0, len(ss))) AS q FROM sgt),
         |occe AS (SELECT doc_id, unnest(ss) AS s,
         |                unnest(range(0, len(ss))) AS q FROM sge),
         |j AS (SELECT t.doc_id AS t_doc, e.doc_id AS e_doc,
         |             t.q - e.q AS diag, e.q AS qe, t.q AS qt
         |      FROM (SELECT doc_id, q, ${oH60("s")} AS h FROM occt) t
         |      JOIN (SELECT doc_id, q, ${oH60("s")} AS h FROM occe) e
         |        ON t.h = e.h),
         |isl AS (SELECT t_doc, e_doc, diag, qe, qt,
         |          qe - row_number() OVER (
         |            PARTITION BY t_doc, e_doc, diag ORDER BY qe) AS isl
         |        FROM j),
         |qual AS (SELECT t_doc, qt,
         |           count(*) OVER (PARTITION BY t_doc, e_doc, diag, isl) AS L
         |         FROM isl),
         |cs AS (SELECT DISTINCT t_doc AS doc_id, qt AS q FROM qual
         |       WHERE L >= ${MinRunTokens - 2}),
         |ds AS (SELECT doc_id, list(q ORDER BY q) AS dstarts FROM cs GROUP BY doc_id),
         |fin AS (SELECT t.doc_id, t.w, coalesce(ds.dstarts, []) AS dsx
         |        FROM train t LEFT JOIN ds ON ds.doc_id = t.doc_id),
         |k AS (SELECT doc_id, w,
         |    [i for i in range(0, len(w))
         |     if len(list_filter(dsx, q -> q >= i-2 AND q <= i)) = 0] AS kept2
         |  FROM fin),
         |sc AS (SELECT doc_id, CAST(len(kept2) AS BIGINT) AS nt,
         |         CAST(len(w) - len(kept2) AS BIGINT) AS n_removed FROM k),
         |c AS (SELECT doc_id, n_removed,
         |    coalesce(sum(nt) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
         |  FROM sc),
         |packed AS (SELECT doc_id, n_removed,
         |    CAST(cb // $PackBudget AS BIGINT) AS shard,
         |    CAST(cb % $PackBudget AS BIGINT) AS shard_offset
         |  FROM c)
         |SELECT d.doc_id, d.n_tokens,
         |  CASE WHEN du.keep_id IS NULL THEN 'gate_failed'
         |       WHEN du.keep_id <> d.doc_id THEN 'dup'
         |       WHEN d.doc_id % $EvalMod = 0 THEN 'eval_split'
         |       WHEN ct.contam_frac >= 0.5 THEN 'contaminated'
         |       ELSE 'kept' END AS fate,
         |  CASE WHEN du.keep_id <> d.doc_id THEN du.keep_id END AS dup_of,
         |  ct.contam_frac, p.n_removed, p.shard, p.shard_offset
         |FROM docs d LEFT JOIN dups du ON du.doc_id = d.doc_id
         |  LEFT JOIN contam ct ON ct.doc_id = d.doc_id
         |  LEFT JOIN packed p ON p.doc_id = d.doc_id""".stripMargin,

    // pipeline_audit's CTEs + the span keep-first chain: fate CASE
    // verbatim, n_removed from the min-id keeper rule over the train
    // survivors, shard columns from the post-span packing window
    "pipeline_audit_spans" ->
      s"""WITH docs AS (SELECT doc_id, text, $oTokens AS w,
         |    CAST(len($oTokens) AS BIGINT) AS n_tokens FROM documents),
         |quality AS (SELECT * FROM docs WHERE n_tokens >= 5
         |  AND CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE)
         |    / nullif(length(text), 0) < 0.3),
         |keepw AS (SELECT md5(text) AS ch, min(doc_id) AS keep_id
         |          FROM quality GROUP BY md5(text)),
         |dups AS (SELECT q.doc_id, k.keep_id
         |         FROM quality q JOIN keepw k ON md5(q.text) = k.ch),
         |kept AS (SELECT q.doc_id, q.text, q.w, q.n_tokens
         |         FROM quality q JOIN dups d ON q.doc_id = d.doc_id
         |           AND d.keep_id = q.doc_id),
         |sh AS (SELECT DISTINCT doc_id, ${oH60("sg")} AS h
         |       FROM (SELECT doc_id, unnest($oShingles3) AS sg FROM kept)),
         |ev AS (SELECT DISTINCT h FROM sh WHERE doc_id % $EvalMod = 0),
         |contam AS (
         |  SELECT tr.doc_id,
         |    CAST(CAST(sum(CASE WHEN ev.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE)
         |      / count(*) AS contam_frac
         |  FROM (SELECT doc_id, h FROM sh WHERE doc_id % $EvalMod <> 0) tr
         |  LEFT JOIN ev ON tr.h = ev.h GROUP BY tr.doc_id),
         |train AS (SELECT doc_id, w FROM kept
         |  WHERE doc_id % $EvalMod <> 0
         |    AND doc_id NOT IN (SELECT doc_id FROM contam WHERE contam_frac >= 0.5)),
         |sgt AS (SELECT doc_id, $oShingles3 AS ss FROM train),
         |occ AS (SELECT doc_id, unnest(ss) AS s,
         |               unnest(range(0, len(ss))) AS q FROM sgt),
         |o2 AS (SELECT doc_id, q, ${oH60("s")} AS h FROM occ),
         |bk AS (SELECT h, min(doc_id) AS keep_id
         |       FROM (SELECT DISTINCT doc_id, h FROM o2)
         |       GROUP BY h HAVING count(*) >= 2),
         |cs AS (SELECT o2.doc_id, o2.q FROM o2 JOIN bk ON o2.h = bk.h
         |       WHERE o2.doc_id <> bk.keep_id),
         |ds AS (SELECT doc_id, list(q ORDER BY q) AS dstarts FROM cs GROUP BY doc_id),
         |fin AS (SELECT t.doc_id, t.w, coalesce(ds.dstarts, []) AS dsx
         |        FROM train t LEFT JOIN ds ON ds.doc_id = t.doc_id),
         |k AS (SELECT doc_id, w,
         |    [i for i in range(0, len(w))
         |     if len(list_filter(dsx, q -> q >= i-2 AND q <= i)) = 0] AS kept2
         |  FROM fin),
         |sc AS (SELECT doc_id, CAST(len(kept2) AS BIGINT) AS nt,
         |         CAST(len(w) - len(kept2) AS BIGINT) AS n_removed FROM k),
         |c AS (SELECT doc_id, n_removed,
         |    coalesce(sum(nt) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
         |  FROM sc),
         |packed AS (SELECT doc_id, n_removed,
         |    CAST(cb // $PackBudget AS BIGINT) AS shard,
         |    CAST(cb % $PackBudget AS BIGINT) AS shard_offset
         |  FROM c)
         |SELECT d.doc_id, d.n_tokens,
         |  CASE WHEN du.keep_id IS NULL THEN 'gate_failed'
         |       WHEN du.keep_id <> d.doc_id THEN 'dup'
         |       WHEN d.doc_id % $EvalMod = 0 THEN 'eval_split'
         |       WHEN ct.contam_frac >= 0.5 THEN 'contaminated'
         |       ELSE 'kept' END AS fate,
         |  CASE WHEN du.keep_id <> d.doc_id THEN du.keep_id END AS dup_of,
         |  ct.contam_frac, p.n_removed, p.shard, p.shard_offset
         |FROM docs d LEFT JOIN dups du ON du.doc_id = d.doc_id
         |  LEFT JOIN contam ct ON ct.doc_id = d.doc_id
         |  LEFT JOIN packed p ON p.doc_id = d.doc_id""".stripMargin,

    "pipeline_audit" ->
      s"""WITH docs AS (SELECT doc_id, text,
         |    CAST(len($oTokens) AS BIGINT) AS n_tokens FROM documents),
         |quality AS (SELECT * FROM docs WHERE n_tokens >= 5
         |  AND CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE)
         |    / nullif(length(text), 0) < 0.3),
         |keepw AS (SELECT md5(text) AS ch, min(doc_id) AS keep_id
         |          FROM quality GROUP BY md5(text)),
         |dups AS (SELECT q.doc_id, k.keep_id
         |         FROM quality q JOIN keepw k ON md5(q.text) = k.ch),
         |kept AS (SELECT q.doc_id, q.text, q.n_tokens
         |         FROM quality q JOIN dups d ON q.doc_id = d.doc_id
         |           AND d.keep_id = q.doc_id),
         |sh AS (SELECT DISTINCT doc_id, ${oH60("sg")} AS h
         |       FROM (SELECT doc_id, unnest($oShingles3) AS sg
         |             FROM (SELECT doc_id, $oTokens AS w FROM kept))),
         |ev AS (SELECT DISTINCT h FROM sh WHERE doc_id % $EvalMod = 0),
         |contam AS (
         |  SELECT tr.doc_id,
         |    CAST(CAST(sum(CASE WHEN ev.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE)
         |      / count(*) AS contam_frac
         |  FROM (SELECT doc_id, h FROM sh WHERE doc_id % $EvalMod <> 0) tr
         |  LEFT JOIN ev ON tr.h = ev.h GROUP BY tr.doc_id),
         |train AS (SELECT doc_id, n_tokens FROM kept
         |  WHERE doc_id % $EvalMod <> 0
         |    AND doc_id NOT IN (SELECT doc_id FROM contam WHERE contam_frac >= 0.5)),
         |c AS (SELECT doc_id, n_tokens,
         |    coalesce(sum(n_tokens) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
         |  FROM train),
         |packed AS (SELECT doc_id,
         |    CAST(cb // $PackBudget AS BIGINT) AS shard,
         |    CAST(cb % $PackBudget AS BIGINT) AS shard_offset
         |  FROM c)
         |SELECT d.doc_id, d.n_tokens,
         |  CASE WHEN du.keep_id IS NULL THEN 'gate_failed'
         |       WHEN du.keep_id <> d.doc_id THEN 'dup'
         |       WHEN d.doc_id % $EvalMod = 0 THEN 'eval_split'
         |       WHEN ct.contam_frac >= 0.5 THEN 'contaminated'
         |       ELSE 'kept' END AS fate,
         |  CASE WHEN du.keep_id <> d.doc_id THEN du.keep_id END AS dup_of,
         |  ct.contam_frac, p.shard, p.shard_offset
         |FROM docs d LEFT JOIN dups du ON du.doc_id = d.doc_id
         |  LEFT JOIN contam ct ON ct.doc_id = d.doc_id
         |  LEFT JOIN packed p ON p.doc_id = d.doc_id""".stripMargin,

    "corpus_overlap" -> {
      val sigCols = permA.indices
        .map(i => s"min((${permA(i)}*x + ${permB(i)}) % $P) AS m$i").mkString(", ")
      val matches = permA.indices
        .map(i => s"CASE WHEN a.m$i = b.m$i THEN 1 ELSE 0 END").mkString(" + ")
      s"""WITH sh AS (SELECT source, ${oH60("sg")} % $P AS x
         |       FROM (SELECT source, unnest($oShingles3) AS sg
         |             FROM (SELECT source, $oTokens AS w FROM documents))),
         |sig AS (SELECT source, $sigCols FROM sh GROUP BY source)
         |SELECT a.source AS src_a, b.source AS src_b,
         |  CAST($matches AS BIGINT) AS n_match,
         |  CAST($matches AS DOUBLE) / $NumPerm AS jaccard_est
         |FROM sig a JOIN sig b ON a.source < b.source""".stripMargin
    },

    // incremental == from-scratch (min-merge of signature mins), so the
    // oracle is corpus_overlap's full recompute verbatim — the
    // dedup_clusters_incr doctrine
    "corpus_overlap_incr" -> {
      val sigCols = permA.indices
        .map(i => s"min((${permA(i)}*x + ${permB(i)}) % $P) AS m$i").mkString(", ")
      val matches = permA.indices
        .map(i => s"CASE WHEN a.m$i = b.m$i THEN 1 ELSE 0 END").mkString(" + ")
      s"""WITH sh AS (SELECT source, ${oH60("sg")} % $P AS x
         |       FROM (SELECT source, unnest($oShingles3) AS sg
         |             FROM (SELECT source, $oTokens AS w FROM documents))),
         |sig AS (SELECT source, $sigCols FROM sh GROUP BY source)
         |SELECT a.source AS src_a, b.source AS src_b,
         |  CAST($matches AS BIGINT) AS n_match,
         |  CAST($matches AS DOUBLE) / $NumPerm AS jaccard_est
         |FROM sig a JOIN sig b ON a.source < b.source""".stripMargin
    },

    "text_oov" ->
      s"""WITH tok AS (SELECT doc_id, unnest($oTokens) AS tok FROM documents),
         |vocab AS (SELECT tok FROM (
         |    SELECT tok, count(*) AS freq FROM tok GROUP BY tok
         |    ORDER BY freq DESC, tok LIMIT $VocabTopK)),
         |v AS (SELECT tok, 1 AS in_vocab FROM vocab)
         |SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |  CAST(sum(CASE WHEN v.in_vocab IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
         |  CAST(sum(CASE WHEN v.in_vocab IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
         |    / count(*) AS oov_frac
         |FROM tok t LEFT JOIN v ON t.tok = v.tok
         |GROUP BY t.doc_id""".stripMargin,

    "mix_temperature" ->
      s"""WITH per AS (
         |  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(len($oTokens)) AS BIGINT) AS n_tokens
         |  FROM documents GROUP BY lang),
         |w AS (SELECT lang, n_docs, n_tokens,
         |    sqrt(CAST(n_tokens AS DOUBLE)) AS weight FROM per)
         |SELECT lang, n_docs, n_tokens, weight,
         |  weight / sum(weight) OVER (ORDER BY lang
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS mix_p
         |FROM w""".stripMargin,

    "mix_curriculum" -> {
      import TextQueries.{ScoreA, ScoreDim, ScoreP, ScoreRange}
      val oCase = (ws: Seq[Double]) =>
        s"(CASE bin WHEN 0 THEN ${ws(0)} WHEN 1 THEN ${ws(1)} " +
          s"WHEN 2 THEN ${ws(2)} ELSE ${ws(3)} END)"
      val oRate = (ws: Seq[Double]) =>
        s"(${oCase(ws)} * CAST(total_tok AS DOUBLE)) / CAST(n_tokens AS DOUBLE)"
      s"""WITH scored AS (
         |  SELECT doc_id,
         |    CAST(coalesce(len(w), 0) AS BIGINT) AS n_tokens,
         |    coalesce(CAST(list_sum(list_transform(w, t ->
         |      ((${oH60("t")} % $ScoreDim) * $ScoreA) % $ScoreP % $ScoreRange - ${ScoreRange / 2}))
         |      AS BIGINT), 0) AS score
         |  FROM (SELECT doc_id, $oTokens AS w FROM documents)),
         |counts AS (SELECT score, count(*) AS c FROM scored GROUP BY 1),
         |cum AS (SELECT score, coalesce(sum(c) OVER (ORDER BY score
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
         |        FROM counts),
         |tot AS (SELECT count(*) AS n, sum(n_tokens) AS total_tok FROM scored),
         |binmap AS (SELECT score, CAST((cb * 4) // n AS BIGINT) AS bin
         |           FROM cum CROSS JOIN tot),
         |perbin AS (
         |  SELECT bin, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(n_tokens) AS BIGINT) AS n_tokens
         |  FROM scored JOIN binmap USING (score) GROUP BY 1)
         |SELECT bin, n_docs, n_tokens,
         |  CAST(n_tokens AS DOUBLE) / CAST(total_tok AS DOUBLE) AS share,
         |  ${oRate(CurriculumWarmup)} AS rate_warmup,
         |  ${oRate(CurriculumMid)} AS rate_mid,
         |  ${oRate(CurriculumAnneal)} AS rate_anneal
         |FROM perbin CROSS JOIN tot""".stripMargin
    },

    "doc_pack_incr" ->
      s"""WITH t AS (SELECT doc_id,
         |    CAST(len($oTokens) AS BIGINT) AS n_tokens FROM documents),
         |base AS (SELECT CAST(coalesce(sum(n_tokens), 0) AS BIGINT) AS b
         |         FROM t WHERE doc_id % 10 <> 0),
         |c AS (SELECT doc_id, n_tokens,
         |    coalesce(sum(n_tokens) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
         |  FROM t WHERE doc_id % 10 = 0)
         |SELECT doc_id, n_tokens,
         |  CAST((cb + b) // $PackBudget AS BIGINT) AS shard,
         |  CAST((cb + b) % $PackBudget AS BIGINT) AS shard_offset
         |FROM c CROSS JOIN base""".stripMargin,

    "text_split_assign" ->
      s"""WITH b AS (SELECT doc_id,
         |    ${oH60("text || '|split'")} % 100 AS bucket FROM documents)
         |SELECT doc_id, bucket,
         |  CASE WHEN bucket < 90 THEN 'train'
         |       WHEN bucket < 95 THEN 'validation'
         |       ELSE 'test' END AS split
         |FROM b""".stripMargin,

    "text_tfidf" ->
      s"""WITH tok AS (SELECT doc_id, unnest($oTokens) AS term FROM documents),
         |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
         |       FROM tok GROUP BY doc_id, term),
         |dfreq AS (SELECT term, count(*) AS dfreq
         |          FROM (SELECT DISTINCT doc_id, term FROM tok) GROUP BY term),
         |nd AS (SELECT count(*) AS n_docs FROM documents),
         |sc AS (SELECT doc_id, term, CAST(tf AS DOUBLE) *
         |    (CAST(n_docs + 1 AS DOUBLE) / CAST(dfreq + 1 AS DOUBLE)) AS tfidf
         |  FROM tf JOIN dfreq USING (term) CROSS JOIN nd)
         |SELECT doc_id, CAST(rnk AS BIGINT) AS rnk, term, tfidf
         |FROM (SELECT doc_id, term, tfidf,
         |        row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rnk
         |      FROM sc)
         |WHERE rnk <= 3""".stripMargin
  )
}

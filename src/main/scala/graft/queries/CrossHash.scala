package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine deterministic primitives shared by the dedup / text /
  * similarity suites.
  *
  * Everything here has a byte-identical DuckDB spelling (the oracle side),
  * so LSH bucketing, minhash signatures and fingerprints agree across
  * engines without any tolerance windows:
  *
  *  - h60: first 60 bits of md5 as a non-negative long
  *    (Spark `conv(substr(md5(x),1,15),16,10)`, DuckDB
  *    `CAST('0x'||substr(md5(x),1,15) AS UBIGINT)`);
  *  - tokens: whitespace split;
  *  - shingles: word 3-grams.
  *
  * md5 is overkill cryptographically but is the only hash both engines
  * evaluate identically; at scale, swap for xxhash64 via a custom Expression
  * (graft.functions) — the algebra is unchanged.
  */
object CrossHash {
  /** Modulus for minhash/fingerprint arithmetic (fits products in i64). */
  val P: Long = 1000000007L

  /** Minhash permutation count and (a,b) parameters for
    * h_i(x) = (a_i·x + b_i) mod P. 16 hashes → 4 bands × 4 rows. */
  val NumPerm = 16
  val BandRows = 4
  val NumBands: Int = NumPerm / BandRows
  val permA: IndexedSeq[Long] = (0 until NumPerm).map(i => 1234567L + 999983L * i)
  val permB: IndexedSeq[Long] = (0 until NumPerm).map(i => 424242L + 777779L * i)

  /** Banded hyperplane LSH over embeddings (dedup_embed_cosine candidate
    * generation): [[EmbBits]] random-sign planes, derived deterministically
    * from md5 so both engines build byte-identical planes, banded into
    * [[EmbBands]] bands of [[EmbBandBits]] bits. Two vectors are CANDIDATES
    * iff some band's bit pattern matches — the same OR-amplification as
    * minhash banding, so the pair join shuffles on (band, bits) and costs
    * O(Σ bucket²), never O(n²).
    *
    * Parameters tune to the threshold: at production near-dup thresholds
    * (cosine ≥ 0.9, θ ≤ 26°) a 6-bit band matches w.p. 0.857⁶ ≈ 0.40 and
    * 16 bands give recall 1-(1-0.40)¹⁶ > 0.999 with ~2% false candidates.
    * The test corpus' threshold 0.4 sits near random (θ ≈ 66°), the
    * hardest regime for any LSH — measured recall there is 44/59 at sf0.01
    * with ~4× candidate pruning (DedupScaleSpec pins the cross-check
    * against the exact all-pairs spelling). */
  val EmbBandBits = 6
  val EmbBands = 16
  val EmbBits: Int = EmbBands * EmbBandBits
  val EmbDim = 64

  /** Deterministic ±1 hyperplanes for an arbitrary (bands × bits) geometry;
    * each plane is keyed by its (band, bit) pair, so any geometry derives
    * reproducibly and engine-identically.
    *
    * SCALING RULE (the geometry is a per-corpus knob, not a constant):
    * expected candidates per band ≈ n²/2^bits for near-random data, so
    * `bits` must grow with log₂(n) — 6 bits (64 buckets/band) suits the
    * 10³–10⁴-vector test corpora; at 10⁸ vectors use 16–24 bits/band and
    * recover recall by raising `bands` (recall = 1-(1-p^bits)^bands with
    * p = 1-θ/π). DedupScaleSpec pins a second geometry to keep this path
    * honest. */
  def embPlanesFor(bands: Int, bits: Int, dim: Int = EmbDim): IndexedSeq[IndexedSeq[Int]] =
    (0 until bands * bits).map { j =>
      (0 until dim).map { d =>
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(s"lsh${j / bits}_${j % bits}_$d".getBytes("UTF-8"))
        if ((md(0) & 1) == 0) 1 else -1
      }
    }

  /** Test-default geometry's planes (registered query + oracle). */
  val embPlanes: IndexedSeq[IndexedSeq[Int]] = embPlanesFor(EmbBands, EmbBandBits)

  /** Hyperplane match probability per bit at the cosine-0.9 DESIGN
    * threshold (θ ≈ 26°, p = 1 − θ/π) — the production near-dup regime
    * the default (16 × 6) geometry was sized for. */
  private val EmbDesignP = 0.857

  /** AUTO-GEOMETRY: the SCALING RULE on [[embPlanesFor]] turned into
    * code, so `dedup_embed_cosine` sizes its own (bands × bits) from the
    * corpus vector count instead of leaving the knob to an operator.
    *
    *  - `bits = max(6, ⌈log₂ n⌉ − 3)`: expected candidates per band are
    *    ≈ n²/2^bits for near-random data, so this pins them at ≈ 8n —
    *    LINEAR in n at every scale (fixed bits go quadratic once n
    *    outgrows 2^bits: measured 38.8× at 10× data, BENCH10X_r15).
    *  - `bands = round(16 · p^((6 − bits)/2))` with p = [[EmbDesignP]]:
    *    HALF-damped recall recovery. Full recovery (exponent 6 − bits)
    *    would hold design recall at 0.999 but makes bands ∝ n^0.22, i.e.
    *    total candidates ∝ n^1.22 — superlinear forever (constant-recall
    *    LSH's inherent n^(1+ρ)). The half exponent keeps design-threshold
    *    recall 1−(1−p^bits)^bands ≥ 0.95 through 10⁶ vectors (0.996 at
    *    2k, 0.98 at 20k, 0.958 at 200k — the ≥94% regime the r15 knob
    *    probe measured sane at 200k vectors) while halving the bands
    *    growth to ∝ n^0.11.
    *
    * At n ≤ 512 the rule reproduces the default (16 × 6) EXACTLY — the
    * sf0.01 correctness gate's static oracle SQL stays valid by
    * construction (DedupScaleSpec pins this equality plus the sf0.1 and
    * 100×-probe geometries). Growth points: n=2000 → (19 × 8),
    * n=20000 → (25 × 12), n=200000 → (32 × 15) — the last within one
    * bit of the 32 × 16 geometry EmbKnobProbe priced at 60.7 s for 200k
    * vectors (vs est. ~1 h fixed-geometry). */
  def embGeometryFor(n: Long): (Int, Int) = {
    val bits = math.max(EmbBandBits, ceilLog2(n) - 3)
    val bands = math.round(
      EmbBands * math.pow(EmbDesignP, (EmbBandBits - bits) / 2.0)).toInt
    (bands, bits)
  }

  private def ceilLog2(n: Long): Int =
    if (n <= 1) 0 else 64 - java.lang.Long.numberOfLeadingZeros(n - 1)

  /** AUTO-GEOMETRY for the SINGLE-BAND coarse-cell partitions — the
    * SemDeDup cluster key (`dedup_semantic`/`dedup_semantic_incr`, the
    * streaming semantic twin) and `knn_self_topk`'s self-join bucket:
    * `bits = max(4, ⌈log₂ n⌉ − 5)`, i.e. cells = 2^bits track n/32.
    *
    * The cost these partitions bound is a within-cell self-join,
    * Σ|cell|² ≈ n²/2^bits for near-uniform cells — FIXED bits go
    * quadratic once n outgrows the geometry (the regime
    * [[embGeometryFor]] closed for the banded LSH: measured 38.8× at
    * 10× data before the rule, 6.84× after). This rule pins expected
    * within-cell candidates at ≈ 32n — linear at every scale.
    *
    * Unlike the banded LSH there is NO recall-recovery dimension to
    * trade: SemDeDup's coarse partition is single-band BY DESIGN
    * (cross-cell near-dups are missed deliberately — that pruning is
    * what makes the pass feasible; production SemDeDup grows its
    * k-means k with n exactly like this), so the only knob is the cell
    * count and the rule is pure ⌈log₂⌉. At n ≤ 512 it reproduces the
    * 4-bit gate geometry EXACTLY, so the sf0.01 static oracles stay
    * valid by construction (DedupScaleSpec pins the boundary and the
    * sf0.1 / 10× / 100× growth points: 2000 → 6, 20000 → 10,
    * 200000 → 13). */
  def semGeometryFor(n: Long): Int = math.max(4, ceilLog2(n) - 5)

  /** AUTO-GEOMETRY for the epoch-shuffle shard count
    * (`doc_shuffle`): `shards = 2^max(3, ⌈log₂ n⌉ − 12)`, i.e.
    * per-shard rows are bounded at 2^12 = 4096 FOREVER (n ≤
    * 2^⌈log₂ n⌉ = shards · 4096), so the per-shard `row_number`
    * window — the operator's only sort — never grows with the corpus:
    * parallelism scales linearly with n instead of 8 tasks each
    * sorting n/8 rows (the fixed-count regime this rule replaces, the
    * same scaladoc-promises-scaling-but-code-fixes-it class as the
    * pre-r17 SemBits).
    *
    * Unlike the LSH geometries there is no recall/cost trade here at
    * all — the shard key is a content hash and ANY count yields a
    * valid reproducible permutation — so the only design point is file
    * granularity: 4096 docs/shard suits the test corpora; a production
    * epoch sizes the per-shard budget by BYTES (swap the −12 for the
    * log of its target), the rule shape is unchanged. At n ≤ 2^15 the
    * rule reproduces the 8-shard gate geometry EXACTLY, so the sf0.01
    * static oracle (written at [[CorpusQueries.ShuffleShards]] = 8)
    * stays valid by construction. Growth points: 5000 (sf0.1) → 8,
    * 50000 (10×) → 16, 500000 (100×) → 128. */
  def shardsFor(n: Long): Long = 1L << math.max(3, ceilLog2(n) - 12)

  /** SimHash banding (dedup_simhash): 32-bit fingerprints at hamming ≤ 2
    * split into 3 bands (11+11+10 bits). Pigeonhole: ≤2 differing bits
    * can touch at most 2 of 3 bands, so every qualifying pair matches
    * exactly on some band — banding is EXACT here (unlike the embedding
    * LSH), losslessly replacing the all-pairs join. */
  val SimhashBandOffsets: IndexedSeq[(Int, Int, Long)] = IndexedSeq(
    (0, 0, 0x7ffL), (1, 11, 0x7ffL), (2, 22, 0x3ffL)) // (band, shift, mask)

  // ---- Spark side ----

  /** 60-bit md5 hash of a string column (non-negative long). Native
    * codegen expression (graft.functions.expressions.Md5Prefix60) —
    * value-identical to `conv(substring(md5(c),1,15),16,10)::long` but one
    * fused digest instead of two string allocations per row. Requires
    * GraftExtensions registration (SparkEntry wraps every query with it). */
  def h60(c: Column): Column = call_function("graft_h60", c)

  /** Whitespace tokens. */
  def tokens(c: Column): Column = split(c, "\\s+")

  /** Fused word-3-gram shingle hashes (array<long>) — value-identical to
    * `transform(shingles3(tokens(c)), h60)` but one native codegen call
    * (graft.functions.expressions.Shingle60): no shingle strings, no
    * per-shingle expression evaluation. CodegenSpec pins the equality. */
  def shingleHashes(c: Column): Column = call_function("graft_shingle60", c)

  /** Word 3-gram shingles of a token-array column (by column name).
    * Guarded with CASE, not `greatest(..., 0)`: Spark's `sequence(1, 0)`
    * is the DESCENDING [1, 0] (not empty), so the unguarded form indexes
    * element_at(w, 0)/beyond-end and aborts on any document with fewer
    * than 3 tokens — the oracle's range() yields no shingles instead. */
  def shingles3(w: String): Column =
    expr(s"CASE WHEN size($w) >= 3 THEN transform(sequence(1, size($w) - 2), " +
      s"i -> concat_ws(' ', element_at($w, i), element_at($w, i+1), element_at($w, i+2))) " +
      s"ELSE array() END")

  // ---- DuckDB (oracle) side ----

  /** DuckDB spelling of [[h60]]. */
  def oH60(e: String): String =
    s"CAST(CAST('0x'||substr(md5($e),1,15) AS UBIGINT) AS BIGINT)"

  val oTokens: String = """string_split_regex(text, '\s+')"""

  /** DuckDB word 3-grams over a list column named `w`. */
  val oShingles3: String =
    "[array_to_string(w[i:i+2], ' ') for i in range(1, len(w)-1)]"

  /** Spark SQL literal for embedding-LSH plane j (default geometry). */
  def embPlaneSql(j: Int): String = embPlaneSqlOf(embPlanes, j)

  /** Spark SQL literal for plane j of an explicit plane set. */
  def embPlaneSqlOf(planes: IndexedSeq[IndexedSeq[Int]], j: Int): String =
    planes(j).map(x => s"${x}.0D").mkString("array(", ", ", ")")

  /** DuckDB literal for embedding-LSH plane j. */
  def oEmbPlane(j: Int): String = oEmbPlaneOf(embPlanes, j)

  /** DuckDB literal for plane j of an explicit plane set. */
  def oEmbPlaneOf(planes: IndexedSeq[IndexedSeq[Int]], j: Int): String =
    planes(j).map(x => s"${x}.0").mkString("[", ", ", "]::DOUBLE[]")
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact pigeonhole banding for Hamming-distance self-joins — the shared
  * core of `dedup_simhash` (32-bit text fingerprints) and
  * `Multimodal.perceptualPairs` (64-bit image aHashes).
  *
  * Pigeonhole guarantee: with `bands` disjoint bit bands and maxHamming ≤
  * bands − 1, any qualifying pair differs in at most bands − 1 bands, so
  * some band matches exactly — banding LOSSLESSLY replaces the all-pairs
  * join (DedupScaleSpec/PerceptualDedupSpec pin banded ≡ quadratic).
  *
  * Scale shape: candidates join on (band, bits) — never all-pairs; hot
  * buckets (boilerplate-heavy fingerprints) split fragment-replicate
  * above `cap` rows so no single bucket degenerates quadratically; each
  * surviving pair is emitted once, at its FIRST matching band (a filter,
  * not a distinct shuffle).
  */
object HammingBands {
  /** Split `bits` into `bands` contiguous (band, shift, mask) bands,
    * earlier bands one bit wider when it does not divide evenly. */
  def offsetsFor(bits: Int, bands: Int): IndexedSeq[(Int, Int, Long)] = {
    require(bands >= 1 && bits >= bands, s"cannot split $bits bits into $bands bands")
    val base = bits / bands
    val extra = bits % bands
    val widths = (0 until bands).map(b => if (b < extra) base + 1 else base)
    val shifts = widths.scanLeft(0)(_ + _).init
    (0 until bands).map { b =>
      val w = widths(b)
      val mask = if (w == 64) -1L else (1L << w) - 1L
      (b, shifts(b), mask)
    }
  }

  /** Near-dup pairs (id_a < id_b, hamming ≤ maxHamming) over `fps`
    * (columns `id`, `fp`). Requires maxHamming ≤ offsets.size − 1 (the
    * pigeonhole bound — anything looser would silently lose pairs). */
  def pairs(fps: DataFrame, offsets: IndexedSeq[(Int, Int, Long)],
      maxHamming: Int, cap: Int): DataFrame = {
    require(maxHamming <= offsets.size - 1,
      s"pigeonhole needs > $maxHamming bands, got ${offsets.size}")
    val s = fps.sparkSession
    import s.implicits._
    val bandStructs = offsets.map { case (b, shift, mask) =>
      struct(lit(b).as("band"),
        shiftright($"fp", shift).bitwiseAND(lit(mask)).as("bb"))
    }
    val bands = fps
      .select($"id", $"fp", explode(array(bandStructs: _*)).as("x"))
      .select($"id", $"fp", $"x.band".as("band"), $"x.bb".as("bb"))
    // fragment-replicate split of buckets above cap: probes fan out over
    // g sub-buckets, builds land in one deterministic sub-bucket
    val sizes = bands.groupBy($"band", $"bb").agg(count(lit(1)).as("k"))
      .select($"band", $"bb",
        ceil($"k".cast("double") / cap).cast("int").as("g"))
    val tagged = bands.join(sizes, Seq("band", "bb"))
    val probe = tagged.withColumn("t", explode(sequence(lit(0), $"g" - 1)))
    val build = tagged.withColumn("t",
      pmod(xxhash64($"id"), $"g".cast("long")).cast("int"))
    val hd = bit_count($"a.fp".bitwiseXOR($"b.fp"))
    val noEarlierBand = offsets.foldLeft(lit(true)) {
      case (acc, (b, shift, mask)) =>
        acc && !(lit(b) < $"a.band" &&
          shiftright($"a.fp", shift).bitwiseAND(lit(mask)) ===
            shiftright($"b.fp", shift).bitwiseAND(lit(mask)))
    }
    probe.as("a").join(build.as("b"),
        $"a.band" === $"b.band" && $"a.bb" === $"b.bb" &&
          $"a.t" === $"b.t" && $"a.id" < $"b.id")
      .filter(hd <= maxHamming && noEarlierBand)
      .select($"a.id".as("id_a"), $"b.id".as("id_b"),
        hd.cast("long").as("hamming"))
  }
}

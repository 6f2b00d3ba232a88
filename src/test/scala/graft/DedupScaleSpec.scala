package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.DedupQueries

/** Cross-checks of the banded/bucketed dedup operators against their exact
  * quadratic spellings (the all-pairs forms survive as private[graft]
  * methods precisely for this spec — the IncrementalDedupSpec pattern).
  *
  *  - simhash banding is EXACT: hamming ≤ 2 over 3 bands pigeonholes into
  *    at least one untouched band, so the banded query must equal the
  *    all-pairs join row-for-row.
  *  - embedding LSH is APPROXIMATE by construction: candidates are a
  *    subset (precision 1.0 — every emitted pair is exact-verified), and
  *    recall at the test threshold (0.4 ≈ random similarity, LSH's
  *    hardest regime) is pinned at its measured floor so a plane/banding
  *    regression is caught.
  */
class DedupScaleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("banded simhash equals the quadratic spelling exactly (pigeonhole over 3 bands)") {
    val banded = SparkEntry.queries("dedup_simhash")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val exact = DedupQueries.simhashAllPairs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(banded == exact,
      s"banded≠exact: missing=${(exact -- banded).take(5)} extra=${(banded -- exact).take(5)}")
    assert(exact.nonEmpty) // the gate must not pass vacuously
    spark.catalog.clearCache()
  }

  /** Driver-side mirror of graft_shingle60 (whitespace 3-grams, WITH
    * multiplicity — positions preserved). */
  private def shingleList(t: String): Seq[Long] = {
    // split("\\s+", -1) == Spark's split(): leading/trailing empties kept
    val w = t.split("\\s+", -1).toSeq
    w.sliding(3).collect { case s if s.size == 3 =>
      graft.functions.expressions.Md5Prefix60.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString(s.mkString(" ")))
    }.toSeq
  }

  private def corpusTexts: Map[Long, String] = {
    import spark.implicits._
    Tables.load(spark, dir, "documents").select($"doc_id", $"text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
  }

  /** Pick a df ceiling that elides the highest-df shingle(s) but keeps
    * everything below — guarantees the elision pins can't pass vacuously.
    * Returns (frac, survivingShingleSetsByDoc). */
  private def elisionFixture(texts: Map[Long, String]):
      (Double, Map[Long, Set[Long]], Set[Long]) = {
    val sets = texts.map { case (id, t) => id -> shingleList(t).toSet }
    val df = sets.values.toSeq.flatten.groupBy(identity).map { case (h, o) => h -> o.size }
    val maxDf = df.values.max
    assert(maxDf >= 2, "no shared shingle at all — fixture broken")
    val frac = (maxDf - 0.5) / texts.size
    val hot = df.filter(_._2 > frac * texts.size).keySet
    assert(hot.nonEmpty, "ceiling elided nothing — vacuous")
    (frac, sets.map { case (id, s) => id -> (s -- hot) }, hot)
  }

  test("df-ceiled jaccard pairs == the quadratic computation over surviving shingles") {
    val texts = corpusTexts
    val (frac, surv, hot) = elisionFixture(texts)
    val ids = surv.keys.toSeq.sorted
    val expected = (for {
      i <- ids.indices.iterator; j <- (i + 1 until ids.size).iterator
      a = surv(ids(i)); b = surv(ids(j))
      inter = (a & b).size
      union = a.size + b.size - inter
      if union > 0 && inter.toDouble / union >= 0.6
    } yield (ids(i), ids(j))).toSet
    val got = DedupQueries.jaccardPairs(spark, dir, frac)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
    // the bucket bound the elision exists for: no surviving shingle's df
    // exceeds the ceiling, so no self-join bucket can exceed (frac·N)²
    val maxSurvDf = surv.values.toSeq.flatten.groupBy(identity)
      .map(_._2.size).foldLeft(0)(math.max)
    assert(maxSurvDf <= frac * texts.size,
      s"surviving df $maxSurvDf exceeds ceiling ${frac * texts.size}")
    // and the default remains the exact baseline (same plan as the oracle)
    val full = DedupQueries.jaccardPairs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(SparkEntry.queries("dedup_ngram_jaccard")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet == full)
    spark.catalog.clearCache()
  }

  test("df-ceiled containment pairs == the quadratic computation over surviving shingles") {
    val texts = corpusTexts
    val (frac, surv, _) = elisionFixture(texts)
    val ids = surv.keys.toSeq.sorted
    val expected = (for {
      i <- ids.iterator; j <- ids.iterator if i != j
      a = surv(i); b = surv(j)
      inter = (a & b).size
      if a.nonEmpty && inter.toDouble / a.size >= 0.9
    } yield (i, j)).toSet
    val got = DedupQueries.containmentPairs(spark, dir, frac)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
    // default = the exact oracle baseline
    val full = DedupQueries.containmentPairs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(SparkEntry.queries("dedup_containment")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet == full)
    assert(full.nonEmpty) // non-vacuous at sf0.001
    spark.catalog.clearCache()
  }

  test("df-ceiled dedup_spans == the full spelling over surviving-shingle occurrences") {
    val texts = corpusTexts
    val (frac, _, hot) = elisionFixture(texts)
    val occ = texts.map { case (id, t) => id -> shingleList(t).filterNot(hot) }
    val docsPerH = occ.toSeq.flatMap { case (id, hs) => hs.distinct.map(_ -> id) }
      .groupBy(_._1).map { case (h, o) => h -> o.map(_._2).distinct.size }
    val expected = occ.collect { case (id, hs) if hs.nonEmpty =>
      (id, hs.size.toLong, hs.count(h => docsPerH(h) >= 2).toLong)
    }.toSet
    val got = DedupQueries.dedupSpans(spark, dir, frac)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
    spark.catalog.clearCache()
  }

  test("df-ceiled dedup_span_scrub == the full scrub over surviving dup trigrams") {
    val texts = corpusTexts
    val (frac, _, hot) = elisionFixture(texts)
    val occ = texts.map { case (id, t) =>
      id -> shingleList(t).zipWithIndex.filterNot(p => hot(p._1)) }
    val docsPerH = occ.toSeq.flatMap { case (id, hs) => hs.map(_._1).distinct.map(_ -> id) }
      .groupBy(_._1).map { case (h, o) => h -> o.map(_._2).distinct.size }
    val expected = texts.map { case (id, t) =>
      val w = t.split("\\s+", -1).toSeq
      val dupStarts = occ(id).collect { case (h, q) if docsPerH(h) >= 2 => q }.toSet
      val kept = w.indices.filterNot(i => dupStarts.exists(q => q >= i - 2 && q <= i))
      (id, w.size.toLong, (w.size - kept.size).toLong, kept.map(w).mkString(" "))
    }.toSet
    val got = DedupQueries.spanScrub(spark, dir, frac)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(2)} extra=${(got -- expected).take(2)}")
    spark.catalog.clearCache()
  }

  test("df-ceiled dedup_span_keepfirst == the full keep-first over surviving dup trigrams") {
    val texts = corpusTexts
    val (frac, _, hot) = elisionFixture(texts)
    val occ = texts.map { case (id, t) =>
      id -> shingleList(t).zipWithIndex.filterNot(p => hot(p._1)) }
    // keeper election over the SURVIVING occurrences: an over-ceiling
    // trigram neither elects a keeper nor scrubs (the scaladoc contract)
    val keeper = occ.toSeq.flatMap { case (id, hs) => hs.map(_._1).distinct.map(_ -> id) }
      .groupBy(_._1).collect { case (h, o) if o.map(_._2).distinct.size >= 2 =>
        h -> o.map(_._2).min }
    val expected = texts.map { case (id, t) =>
      val w = t.split("\\s+", -1).toSeq
      val dupStarts = occ(id).collect {
        case (h, q) if keeper.get(h).exists(_ != id) => q }.toSet
      val kept = w.indices.filterNot(i => dupStarts.exists(q => q >= i - 2 && q <= i))
      (id, w.size.toLong, (w.size - kept.size).toLong, kept.map(w).mkString(" "))
    }.toSet
    val got = DedupQueries.spanKeepFirst(spark, dir, frac)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(2)} extra=${(got -- expected).take(2)}")
    spark.catalog.clearCache()
  }

  /** Independent single-JVM reference for decontam_runs: per (train,
    * eval) pair, group positioned trigram-hash matches by diagonal,
    * find maximal consecutive-qe islands, report (max island + 2,
    * count of islands reaching MinRunTokens). */
  private def overlapRunsRef(occ: Map[Long, Seq[(Long, Int)]]): Set[(Long, Long, Long, Long)] = {
    val minRun = graft.queries.CorpusQueries.MinRunTokens
    val evalIds = occ.keySet.filter(_ % graft.queries.CorpusQueries.EvalMod == 0)
    val trainIds = occ.keySet -- evalIds
    (for {
      t <- trainIds.iterator; e <- evalIds.iterator
      byH = occ(e).groupBy(_._1)
      matches = occ(t).flatMap { case (h, qt) =>
        byH.getOrElse(h, Nil).map { case (_, qe) => (qt - qe, qe) } }
      if matches.nonEmpty
    } yield {
      val runLens = matches.groupBy(_._1).values.flatMap { diag =>
        val qs = diag.map(_._2).distinct.sorted
        // maximal islands of consecutive qe
        qs.foldLeft(List.empty[(Int, Int)]) { // (start, len) accumulator
          case ((s, l) :: rest, q) if q == s + l => (s, l + 1) :: rest
          case (acc, q) => (q, 1) :: acc
        }.map(_._2 + 2L)
      }
      (e, t, runLens.max, runLens.count(_ >= minRun).toLong)
    }).filter(_._3 >= minRun).toSet
  }

  test("decontam_runs == brute-force longest-common-run reference; df-ceiled == reference over surviving shingles") {
    val texts = corpusTexts
    val occ = texts.map { case (id, t) => id -> shingleList(t).zipWithIndex }
    val expected = overlapRunsRef(occ)
    val got = SparkEntry.queries("decontam_runs")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
    assert(expected.nonEmpty, "no overlap runs at all — vacuous gate")
    assert(expected.exists(_._3 > graft.queries.CorpusQueries.MinRunTokens),
      "every run at the threshold — max_run_tokens never discriminates")
    // elision: an over-ceiling shingle joins on neither side
    val (frac, _, hot) = elisionFixture(texts)
    val occElided = occ.map { case (id, hs) => id -> hs.filterNot(p => hot(p._1)) }
    val gotElided = graft.queries.CorpusQueries.decontamRuns(spark, dir, frac)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(gotElided == overlapRunsRef(occElided))
    spark.catalog.clearCache()
  }

  test("decontam_scrub == brute-force run-scrub reference; df-ceiled == reference over surviving shingles") {
    val texts = corpusTexts
    val minRun = graft.queries.CorpusQueries.MinRunTokens
    // reference: per train doc, the trigram START positions lying in any
    // >=(minRun-2)-long island of consecutive eval-matching diagonals,
    // then the [i-2, i] token cover rebuild
    def scrubRef(occ: Map[Long, Seq[(Long, Int)]]): Map[Long, (Long, Long, String)] = {
      val evalIds = occ.keySet.filter(_ % graft.queries.CorpusQueries.EvalMod == 0)
      val trainIds = occ.keySet -- evalIds
      trainIds.map { t =>
        val starts: Set[Int] = evalIds.flatMap { e =>
          val byH = occ(e).groupBy(_._1)
          val matches = occ(t).flatMap { case (h, qt) =>
            byH.getOrElse(h, Nil).map { case (_, qe) => (qt - qe, qe, qt) } }
          matches.groupBy(_._1).values.flatMap { diag =>
            val sorted = diag.sortBy(_._2)
            val islands = sorted.foldLeft(List.empty[List[(Int, Int, Int)]]) {
              case (cur :: rest, m) if m._2 == cur.head._2 + 1 => (m :: cur) :: rest
              case (acc, m) => List(m) :: acc
            }
            islands.filter(_.size >= minRun - 2).flatMap(_.map(_._3))
          }
        }
        val w = texts(t).split("\\s+", -1)
        val kept = w.indices.filterNot(i => starts.exists(q => q >= i - 2 && q <= i))
        t -> (w.length.toLong, (w.length - kept.size).toLong, kept.map(w).mkString(" "))
      }.toMap
    }
    val occ = texts.map { case (id, t) => id -> shingleList(t).zipWithIndex }
    val got = SparkEntry.queries("decontam_scrub")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    val expected = scrubRef(occ)
    assert(got == expected, {
      val diff = expected.keySet.filter(k => got.get(k) != expected.get(k)).take(3)
      s"diverging docs: ${diff.map(k => (k, got.get(k), expected.get(k)))}"
    })
    assert(expected.values.exists(_._2 > 0), "nothing scrubbed — vacuous")
    assert(expected.values.exists(_._2 == 0), "everything scrubbed — degenerate fixture")
    // elision: an over-ceiling shingle neither starts a run nor scrubs
    val (frac, _, hot) = elisionFixture(texts)
    val gotElided = graft.queries.CorpusQueries.decontamScrub(spark, dir, frac)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(gotElided == scrubRef(
      occ.map { case (id, hs) => id -> hs.filterNot(p => hot(p._1)) }))
    spark.catalog.clearCache()
  }

  test("pigeonhole banding is exact on random fingerprints (seeded property sweep)") {
    // the corpus test above exercises one fingerprint distribution; the
    // pigeonhole claim (hamming ≤ 2 ⇒ some band of 11+11+10 bits
    // untouched) is distribution-free — sweep seeded random fingerprints,
    // including clustered ones that maximize near-collisions
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.queries.CrossHash.SimhashBandOffsets
    for (seed <- Seq(1L, 42L, 20260813L)) {
      val rnd = new scala.util.Random(seed)
      // half uniform, half clustered around 64 centers with ≤3 flipped
      // bits — the regime where banding decisions actually matter
      val centers = IndexedSeq.fill(64)(rnd.nextLong() & 0xffffffffL)
      val fps = ((0 until 500).map(_ => rnd.nextLong() & 0xffffffffL) ++
        (0 until 500).map { _ =>
          var f = centers(rnd.nextInt(centers.size))
          (0 until rnd.nextInt(4)).foreach(_ => f ^= 1L << rnd.nextInt(32))
          f
        }).zipWithIndex.map { case (f, i) => (i.toLong, f) }
      val df = fps.toDF("doc_id", "fp")
      val bandStructs = SimhashBandOffsets.map { case (b, shift, mask) =>
        struct(lit(b).as("band"),
          shiftright($"fp", shift).bitwiseAND(lit(mask)).as("bb"))
      }
      val bands = df.select($"doc_id", $"fp", explode(array(bandStructs: _*)).as("x"))
        .select($"doc_id", $"fp", $"x.band".as("band"), $"x.bb".as("bb"))
      val hd = bit_count($"a.fp".bitwiseXOR($"b.fp"))
      val banded = bands.as("a").join(bands.as("b"),
          $"a.band" === $"b.band" && $"a.bb" === $"b.bb" && $"a.doc_id" < $"b.doc_id")
        .filter(hd <= 2)
        .select($"a.doc_id", $"b.doc_id").distinct()
        .as[(Long, Long)].collect().toSet
      val quadratic = (for {
        (i, fi) <- fps; (j, fj) <- fps
        if i < j && java.lang.Long.bitCount(fi ^ fj) <= 2
      } yield (i, j)).toSet
      assert(banded == quadratic,
        s"seed $seed: missing=${(quadratic -- banded).take(5)} extra=${(banded -- quadratic).take(5)}")
      assert(quadratic.nonEmpty, s"seed $seed: vacuous sweep (no near pairs)")
      // the production operator under MAXIMAL hot-bucket splitting (cap=1:
      // every bucket fragments to singleton sub-buckets) must still emit
      // exactly the quadratic pair set — the strongest exactness check of
      // the split machinery, swept across the same distributions
      val split = graft.queries.DedupQueries.simhashBandedPairs(df, cap = 1)
        .select($"doc_a", $"doc_b")
        .as[(Long, Long)].collect().toSet
      assert(split == quadratic,
        s"seed $seed cap=1: missing=${(quadratic -- split).take(5)} " +
          s"extra=${(split -- quadratic).take(5)}")
    }
  }

  test("simhash hot-bucket split: banded ≡ quadratic on a boilerplate-heavy (skewed) corpus") {
    // the guard's target regime: one (band, bb) bucket holding a large
    // share of the corpus (shared boilerplate ⇒ identical band slices).
    // cap = 16 forces g = ⌈2000/16⌉ = 125 sub-buckets — the split must
    // change only the plan's skew profile, never the pair set.
    import spark.implicits._
    val rnd = new scala.util.Random(7L)
    val hot = (0 until 2000).map { i =>
      (i.toLong, (rnd.nextLong() & 0xfffff800L) | 0x123L) // shared band-0 slice
    }
    val cold = (2000 until 2500).map(i => (i.toLong, rnd.nextLong() & 0xffffffffL))
    val all = hot ++ cold
    val banded = graft.queries.DedupQueries
      .simhashBandedPairs(all.toDF("doc_id", "fp"), cap = 16)
      .as[(Long, Long, Long)].collect().toSet
    val quadratic = (for {
      (i, fi) <- all; (j, fj) <- all
      if i < j && java.lang.Long.bitCount(fi ^ fj) <= 2
    } yield (i, j, java.lang.Long.bitCount(fi ^ fj).toLong)).toSet
    assert(banded == quadratic,
      s"split broke exactness: missing=${(quadratic -- banded).take(5)} " +
        s"extra=${(banded -- quadratic).take(5)}")
    assert(quadratic.nonEmpty, "vacuous: no near pairs in the skewed corpus")
    assert(hot.size > 16, "vacuous: hot bucket under the cap, no split exercised")
  }

  test("LSH embed-cosine: perfect precision (subset of exact pairs, identical cosines), recall ≥ 0.6") {
    val lsh = SparkEntry.queries("dedup_embed_cosine")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = DedupQueries.embCosineAllPairs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(lsh.subsetOf(exact),
      s"LSH emitted non-pairs: ${(lsh -- exact).take(5)}")
    // measured 48/66 at sf0.001 with 16 bands × 6 bits; floor leaves head-
    // room for plane tweaks but catches a broken banding (recall ~0 or 1.0
    // via accidental all-pairs)
    assert(exact.nonEmpty)
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.6, s"recall $recall = ${lsh.size}/${exact.size}")
    spark.catalog.clearCache()
  }

  test("dedup_semantic: verdicts equal the cluster-restricted exact pairs (independent spelling)") {
    // Independent ground truth: exact all-pairs cosine (≥0.4) restricted
    // to pairs whose hyperplane cells match — exactly the pairs SemDeDup's
    // cluster pruning is ALLOWED to see. A vector must be dropped iff it
    // is the higher id of such a pair, and dup_of must be the LOWEST such
    // partner. Cross-cluster near-dup pairs must be invisible (that loss
    // is the documented trade of the pruning, not a bug).
    import org.apache.spark.sql.functions._
    val verdicts = SparkEntry.queries("dedup_semantic")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    val cell = verdicts.map { case (id, (c, _)) => id -> c }
    val exactSameCell = DedupQueries.embCosineAllPairs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => cell(a) == cell(b) }
    val expectDropped = exactSameCell.groupBy(_._2).map { case (b, ps) =>
      b -> ps.map(_._1).min }
    assert(expectDropped.nonEmpty, "vacuous: no same-cell near-dup pairs at this SF")
    val dropped = verdicts.collect { case (id, (_, Some(d))) => id -> d }
    assert(dropped == expectDropped,
      s"missing=${(expectDropped.toSet -- dropped.toSet).take(5)} " +
        s"extra=${(dropped.toSet -- expectDropped.toSet).take(5)}")
    spark.catalog.clearCache()
  }

  test("dedup_semantic at a second geometry (6 bits): verdicts still equal the cell-restricted pairs") {
    // the cell geometry is a corpus-size knob (Σ|cluster|² bounds the
    // pass) — pin that a non-default bit width still produces verdicts
    // equal to the independent spelling, with MORE cells ⇒ fewer or equal
    // same-cell pairs than the 4-bit default
    import org.apache.spark.sql.functions._
    val verdicts = DedupQueries.semanticVerdicts(spark, dir, bits = 6)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    val cell = verdicts.map { case (id, (c, _)) => id -> c }
    assert(cell.values.toSet.size > 16, "6-bit geometry should occupy more than 2^4 cells")
    val exactSameCell = DedupQueries.embCosineAllPairs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => cell(a) == cell(b) }
    val expectDropped = exactSameCell.groupBy(_._2).map { case (b, ps) =>
      b -> ps.map(_._1).min }
    val dropped = verdicts.collect { case (id, (_, Some(d))) => id -> d }
    assert(dropped == expectDropped,
      s"missing=${(expectDropped.toSet -- dropped.toSet).take(5)} " +
        s"extra=${(dropped.toSet -- expectDropped.toSet).take(5)}")
    spark.catalog.clearCache()
  }

  test("dedup_semantic_incr: batch verdicts equal the corpus-precedes-batch rule (independent spelling)") {
    // a batch vector (vec_id % 10 == 0) must be dropped iff its cell holds
    // a qualifying partner that is EITHER a corpus vector (any id — the
    // corpus precedes the batch) OR a lower-id batch vector; dup_of is the
    // lowest such partner. Derived here from the exact all-pairs spelling
    // + the full pass's cells, independently of the incremental query.
    val full = SparkEntry.queries("dedup_semantic")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val verdicts = SparkEntry.queries("dedup_semantic_incr")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(verdicts.keySet == full.keySet.filter(_ % 10 == 0))
    verdicts.foreach { case (id, (c, _)) => assert(c == full(id), s"cell mismatch at $id") }
    val pairs = DedupQueries.embCosineAllPairs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => full(a) == full(b) }
    val expectDropped = (pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .filter { case (partner, b) =>
        b % 10 == 0 && (partner % 10 != 0 || partner < b) })
      .groupBy(_._2).map { case (b, ps) => b -> ps.map(_._1).min }
    assert(expectDropped.nonEmpty, "vacuous: no qualifying batch pairs at this SF")
    val dropped = verdicts.collect { case (id, (_, Some(d))) => id -> d }
    assert(dropped == expectDropped,
      s"missing=${(expectDropped.toSet -- dropped.toSet).take(5)} " +
        s"extra=${(dropped.toSet -- expectDropped.toSet).take(5)}")
    spark.catalog.clearCache()
  }

  test("embed-LSH at a second geometry (32 bands × 3 bits): precision stays perfect, recall rises") {
    // the geometry is a corpus-size knob (candidates ≈ bands·n²/2^bits) —
    // this pins that a non-default (bands, bits) still produces a verified
    // subset of the exact pairs, with the recall the banding math predicts
    // (3-bit bands match far more often than 6-bit ones: ≥0.999 vs ~0.65
    // at the 0.4 threshold)
    val lsh = DedupQueries.embCosineBanded(spark, dir, nBands = 32, nBits = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = DedupQueries.embCosineAllPairs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(lsh.subsetOf(exact), s"LSH emitted non-pairs: ${(lsh -- exact).take(5)}")
    assert(exact.nonEmpty)
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall = ${lsh.size}/${exact.size}")
    spark.catalog.clearCache()
  }

  test("embed-LSH auto-geometry: the rule reproduces the oracle geometry at gate scale; a third geometry keeps precision perfect and design recall") {
    import graft.queries.CrossHash
    // the rule (r16): bits = max(6, ceil(log2 n) - 3) pins candidates at
    // ~8n per band (linear); bands = round(16·p^((6-bits)/2)) recovers
    // design-threshold recall half-damped (≥0.95 through 10^6 vectors;
    // full recovery would be superlinear n^1.22 in total candidates). At
    // gate scale it MUST reproduce 16×6 — the static DuckDB oracle text
    // hard-codes that geometry.
    assert(CrossHash.embGeometryFor(500) == (16, 6), "sf0.01 gate geometry")
    assert(CrossHash.embGeometryFor(512) == (16, 6), "rule boundary")
    assert(CrossHash.embGeometryFor(2000) == (19, 8), "sf0.1 bench geometry")
    assert(CrossHash.embGeometryFor(20000) == (25, 12), "10x probe geometry")
    assert(CrossHash.embGeometryFor(200000) == (32, 15), "100x probe geometry")
    // third geometry EXECUTED (the sf0.1 auto pick, 19×8, on this corpus):
    // precision stays perfect (every emitted pair is exact-verified), and
    // the pairs the production threshold cares about (cosine ≥ 0.9, the
    // regime the bands formula holds recall for) survive the banding
    val lsh = DedupQueries.embCosineBanded(spark, dir, nBands = 19, nBits = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = DedupQueries.embCosineAllPairs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(lsh.subsetOf(exact), s"LSH emitted non-pairs: ${(lsh -- exact).take(5)}")
    assert(exact.nonEmpty)
    val hi = exact.filter(_._3 >= 0.9)
    val hiHit = hi.count(lsh.contains)
    assert(hi.isEmpty || hiHit.toDouble / hi.size >= 0.9,
      s"design-threshold recall $hiHit/${hi.size} under 19x8")
    spark.catalog.clearCache()
  }

  test("dedup_sorted_neighborhood: prefix-offset distributed rank == global sort rank; no global window") {
    // the query's correctness rests on the offset-table rank equalling a
    // global ORDER BY rank — pin the production helpers directly
    val docs = DedupQueries.snmKeyed(spark, dir)
    val globalRank = docs.collect().map(r => (r.getLong(0), r.getString(1)))
      .sortBy(_._2)(DedupQueries.Utf8Order).zipWithIndex
      .map { case ((id, _), i) => id -> i.toLong }.toMap
    val ranked = DedupQueries.snmRank(docs, DedupQueries.SnmPrefixCap)
    val got = ranked.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == globalRank, "distributed rank diverged from the global sort")
    // and the plan never funnels to one partition
    val p = ranked.queryExecution.executedPlan.toString
    assert(!p.contains("SinglePartition"), s"global-window funnel:\n$p")
    spark.catalog.clearCache()
  }

  test("SNM adaptive prefixes: skewed boilerplate corpus splits past the hot prefix; rank stays exact under a forced-small cap") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // the r11 scale-killer shape: 30% of the corpus shares a boilerplate
    // prefix LONGER than the 2-char offset granularity — a fixed-prefix
    // rank would sort all of it in one window task. Force a cap of 40 so
    // the split must actually recurse at test scale.
    val n = 600
    val rows = (0 until n).map { i =>
      val text = if (i % 10 < 3) s"terms of service apply: item $i"
        else s"doc ${i % 7} body $i"
      (i.toLong, text)
    }
    val docsRaw = rows.toDF("doc_id", "text")
    val keyed = docsRaw.select($"doc_id", concat(
      rpad(substring(lower(coalesce($"text", lit(""))), 1, 16), 16, " "),
      lpad($"doc_id".cast("string"), 10, "0")).as("skey"))
    val cap = 40L
    val offs = DedupQueries.snmOffsets(keyed, cap)
    // every group fits under the cap — no window partition can exceed it
    assert(offs.forall(_._2 <= cap),
      s"oversized groups survived: ${offs.filter(_._2 > cap).take(5)}")
    // the hot prefix actually recursed past 2 chars (the split engaged)
    assert(offs.exists(_._1.length > 2), "no prefix was extended — the skew guard never fired")
    // counts cover the corpus exactly once (prefix-free cover, no overlap)
    assert(offs.map(_._2).sum == n.toLong)
    // and the distributed rank still equals the global UTF-8 sort rank
    val globalRank = keyed.collect().map(r => (r.getLong(0), r.getString(1)))
      .sortBy(_._2)(DedupQueries.Utf8Order).zipWithIndex
      .map { case ((id, _), i) => id -> i.toLong }.toMap
    val got = DedupQueries.snmRank(keyed, cap)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == globalRank, "skew-split rank diverged from the global sort")
    spark.catalog.clearCache()
  }

  test("SNM prefix order is UTF-8 binary, not UTF-16: supplementary-plane vs private-use prefixes rank like Spark/DuckDB") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // U+E000 (private use, 3 UTF-8 bytes, one UTF-16 unit 0xE000) sorts
    // AFTER U+10000 (supplementary, 4 UTF-8 bytes, surrogate pair
    // starting 0xD800) in UTF-8 byte order but BEFORE it in Java String
    // order — a Java-ordered offset table shifts every rank in between.
    val texts = Seq(" private use", "𐀀 supplementary",
      "ascii doc", "zz tail", " second", "𐀀 second")
    val keyed = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .select($"doc_id", concat(
        rpad(substring(lower(coalesce($"text", lit(""))), 1, 16), 16, " "),
        lpad($"doc_id".cast("string"), 10, "0")).as("skey"))
    // Spark's own ORDER BY is the ground truth the oracle agrees with
    val sparkOrder = keyed.orderBy($"skey").collect().map(_.getLong(0)).toSeq
    val got = DedupQueries.snmRank(keyed, 2L)
      .collect().map(r => (r.getLong(1), r.getLong(0))).sortBy(_._1).map(_._2).toSeq
    assert(got == sparkOrder,
      s"rank order diverged from Spark's ORDER BY: got=$got want=$sparkOrder")
    spark.catalog.clearCache()
  }

  test("dedup_pagerank: near-dup members outrank isolated docs; teleport floor exact; mass bounded") {
    import org.apache.spark.sql.functions._
    val pr = queries.DedupQueries.queries("dedup_pagerank")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val linked = queries.DedupQueries.queries("dedup_ngram_jaccard")(spark, dir)
      .collect().flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(linked.nonEmpty, "no near-dup edges — vacuous")
    val n = pr.size
    val q = 1000000000000L / n
    val tele = (15L * q) / 100L
    // isolated docs sit exactly at the teleport floor; every doc inside
    // a duplication neighborhood accumulates link mass above it
    for ((id, v) <- pr)
      if (!linked(id)) assert(v == tele, s"isolated doc $id off the teleport floor: $v")
      else assert(v > tele, s"linked doc $id did not accumulate centrality: $v")
    // floors only ever LOSE mass: total stays under the initial 10^12
    assert(pr.values.map(BigInt(_)).sum <= BigInt(1000000000000L))
    spark.catalog.clearCache()
  }

  test("semantic-cell auto-geometry: the rule reproduces the 4-bit gate geometry at n <= 512 and grows with log2(n)") {
    import graft.queries.CrossHash
    // bits = max(4, ceil(log2 n) - 5) pins within-cell self-join
    // candidates at ~32n (linear); single-band by SemDeDup design, so
    // no recall-recovery term — pure log2 (scaladoc on semGeometryFor).
    // At gate scale it MUST reproduce SemBits = 4: the static DuckDB
    // oracle text for dedup_semantic/dedup_semantic_incr/knn_self_topk
    // hard-codes that geometry.
    assert(CrossHash.semGeometryFor(50) == 4, "spec corpus geometry")
    assert(CrossHash.semGeometryFor(500) == 4, "sf0.01 gate geometry")
    assert(CrossHash.semGeometryFor(512) == 4, "rule boundary")
    assert(CrossHash.semGeometryFor(513) == 5, "first step past the boundary")
    assert(CrossHash.semGeometryFor(2000) == 6, "sf0.1 bench geometry")
    assert(CrossHash.semGeometryFor(20000) == 10, "10x probe geometry")
    assert(CrossHash.semGeometryFor(200000) == 13, "100x probe geometry")
  }

  test("dedup_semantic_incr at a second geometry (6 bits): batch verdicts equal the corpus-precedes-batch rule") {
    // the incremental pass must stay correct at every cell width the
    // auto-geometry rule can pick — same derivation as the 4-bit test
    // (all-pairs spelling + the full pass's cells), at 6 bits
    val full = queries.DedupQueries.semanticVerdicts(spark, dir, bits = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val verdicts = queries.DedupQueries.semanticIncrVerdicts(spark, dir, bits = 6)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(verdicts.keySet == full.keySet.filter(_ % 10 == 0))
    verdicts.foreach { case (id, (c, _)) => assert(c == full(id), s"cell mismatch at $id") }
    val pairs = queries.DedupQueries.embCosineAllPairs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => full(a) == full(b) }
    val expectDropped = (pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .filter { case (partner, b) =>
        b % 10 == 0 && (partner % 10 != 0 || partner < b) })
      .groupBy(_._2).map { case (b, ps) => b -> ps.map(_._1).min }
    assert(expectDropped.nonEmpty, "vacuous: no qualifying batch pairs at 6 bits")
    val dropped = verdicts.collect { case (id, (_, Some(d))) => id -> d }
    assert(dropped == expectDropped,
      s"missing=${(expectDropped.toSet -- dropped.toSet).take(5)} " +
        s"extra=${(dropped.toSet -- expectDropped.toSet).take(5)}")
    spark.catalog.clearCache()
  }
}

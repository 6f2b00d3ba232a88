package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** dedup_lines (CCNet-style paragraph dedup) and dedup_span_scrub
  * (Lee et al. 2022 duplicated-span removal) pinned against independent
  * single-JVM reference implementations on a hand corpus where the
  * expected keeps/cuts are enumerable, plus structural invariants on the
  * real sf0.001 corpus. The cross-engine oracle equality is the driver
  * gate; this spec pins the SEMANTICS (first-occurrence-wins, coverage
  * rule) against a spelling that shares no code with the queries.
  */
class LineScrubSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  /** Corpus with engineered duplicate segments/spans:
    *  - docs 0 and 1 share an identical 12-token prefix (same segment);
    *  - doc 2 repeats doc 0's SECOND segment text at a different offset
    *    (still a duplicate SEGMENT only if aligned — it isn't, so it
    *    stays: segment identity is positional windows, not substrings);
    *  - docs 3 and 4 share a 3-token run (one duplicated trigram);
    *  - doc 5 is unique throughout.
    */
  private val hand: Seq[(Long, String)] = {
    val segA = (1 to 12).map(i => s"alpha$i").mkString(" ")
    val segB = (1 to 12).map(i => s"beta$i").mkString(" ")
    Seq(
      0L -> s"$segA $segB",
      1L -> s"$segA gamma1 gamma2 gamma3 gamma4",
      2L -> s"pad1 $segB tail1 tail2",
      3L -> "delta1 delta2 run1 run2 run3 delta3",
      4L -> "eps1 run1 run2 run3 eps2 eps3 eps4",
      5L -> "zeta1 zeta2 zeta3 zeta4 zeta5")
  }

  private lazy val handDir: String = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-linescrub-").toString
    hand.map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    d
  }

  // ---- reference implementations (plain Scala, no Spark) ----

  private def refLines(corpus: Seq[(Long, String)], w: Int)
      : Map[Long, (Long, Long, String)] = {
    val occ = corpus.flatMap { case (id, t) =>
      val toks = t.split("\\s+").toSeq
      toks.grouped(w).zipWithIndex.map { case (seg, i) =>
        (id, i.toLong, seg.mkString(" "))
      }
    }
    val winner = occ.groupBy(_._3).collect {
      case (seg, os) if os.size >= 2 => seg -> os.map(o => o._1 * 100000L + o._2).min
    }
    occ.groupBy(_._1).map { case (id, os) =>
      val kept = os.sortBy(_._2).filter { case (d, i, seg) =>
        winner.get(seg).forall(_ == d * 100000L + i)
      }
      id -> (os.size.toLong, kept.size.toLong, kept.map(_._3).mkString(" "))
    }
  }

  private def refScrub(corpus: Seq[(Long, String)])
      : Map[Long, (Long, Long, String)] = {
    val tri = corpus.map { case (id, t) =>
      val toks = t.split("\\s+").toSeq
      id -> (toks, toks.sliding(3).zipWithIndex.collect {
        case (s, q) if s.size == 3 => (s.mkString(" "), q)
      }.toSeq)
    }.toMap
    val dupTri = tri.toSeq.flatMap { case (id, (_, ts)) => ts.map(t => (id, t._1)) }
      .distinct.groupBy(_._2).collect { case (t, os) if os.size >= 2 => t }.toSet
    tri.map { case (id, (toks, ts)) =>
      val dupStarts = ts.collect { case (t, q) if dupTri(t) => q }
      val kept = toks.indices.filterNot(i => dupStarts.exists(q => q >= i - 2 && q <= i))
      id -> (toks.size.toLong, (toks.size - kept.size).toLong, kept.map(toks).mkString(" "))
    }
  }

  /** Keep-first reference: keeper of each duplicated trigram is the min
    * doc_id holding it; only non-keeper occurrences scrub. */
  private def refKeepFirst(corpus: Seq[(Long, String)])
      : Map[Long, (Long, Long, String)] = {
    val tri = corpus.map { case (id, t) =>
      val toks = t.split("\\s+").toSeq
      id -> (toks, toks.sliding(3).zipWithIndex.collect {
        case (s, q) if s.size == 3 => (s.mkString(" "), q)
      }.toSeq)
    }.toMap
    val keeper = tri.toSeq.flatMap { case (id, (_, ts)) => ts.map(t => (id, t._1)) }
      .distinct.groupBy(_._2).collect {
        case (t, os) if os.size >= 2 => t -> os.map(_._1).min
      }
    tri.map { case (id, (toks, ts)) =>
      val dupStarts = ts.collect {
        case (t, q) if keeper.get(t).exists(_ != id) => q
      }
      val kept = toks.indices.filterNot(i => dupStarts.exists(q => q >= i - 2 && q <= i))
      id -> (toks.size.toLong, (toks.size - kept.size).toLong, kept.map(toks).mkString(" "))
    }
  }

  // ---- hand-corpus pins ----

  test("dedup_lines: first occurrence wins, later aligned duplicates drop, misaligned repeats stay") {
    val got = SparkEntry.queries("dedup_lines")(spark, handDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    val want = refLines(hand, 12)
    assert(got == want)
    // doc 0 keeps both segments (it is the first occurrence of segA);
    // doc 1 loses its first segment to doc 0
    assert(got(0L)._2 == 2L && got(1L)._2 < got(1L)._1)
    // doc 2's segB copy is OFFSET by one token — not an aligned segment,
    // so nothing drops (segment dedup is coarser than substring dedup)
    assert(got(2L)._2 == got(2L)._1)
    assert(got(5L)._3 == hand.toMap.apply(5L))
  }

  test("dedup_span_scrub: every duplicated trigram occurrence is cut whole; unique docs pass through") {
    val got = SparkEntry.queries("dedup_span_scrub")(spark, handDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    val want = refScrub(hand)
    assert(got == want)
    // docs 3/4 share exactly one trigram "run1 run2 run3": those three
    // tokens vanish from both, the flanks survive
    assert(got(3L)._3 == "delta1 delta2 delta3")
    assert(got(4L)._3 == "eps1 eps2 eps3 eps4")
    // doc 5 is untouched
    assert(got(5L)._2 == 0L && got(5L)._3 == hand.toMap.apply(5L))
  }

  test("dedup_span_keepfirst: the lowest-doc_id holder keeps the passage, later copies scrub") {
    val got = SparkEntry.queries("dedup_span_keepfirst")(spark, handDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(got == refKeepFirst(hand))
    // docs 3/4 share "run1 run2 run3": doc 3 (keeper) is UNTOUCHED —
    // where dedup_span_scrub cut it from both — and doc 4 loses it
    assert(got(3L)._2 == 0L && got(3L)._3 == hand.toMap.apply(3L))
    assert(got(4L)._3 == "eps1 eps2 eps3 eps4")
    // docs 0/1 share the 12-token segA prefix: doc 0 keeps everything,
    // doc 1 loses exactly the prefix and keeps its gamma tail
    assert(got(0L)._2 == 0L && got(0L)._3 == hand.toMap.apply(0L))
    assert(got(1L)._3 == "gamma1 gamma2 gamma3 gamma4")
    assert(got(5L)._2 == 0L)
  }

  /** Reference for the incremental form: corpus precedes batch — corpus
    * hash presence suppresses, else min-okey within the batch wins. */
  private def refLinesIncr(corpus: Seq[(Long, String)], w: Int)
      : Map[Long, (Long, Long, String)] = {
    val occ = corpus.flatMap { case (id, t) =>
      t.split("\\s+").toSeq.grouped(w).zipWithIndex.map { case (seg, i) =>
        (id, i.toLong, seg.mkString(" "))
      }
    }
    val corpusSegs = occ.collect { case (d, _, seg) if d % 10 != 0 => seg }.toSet
    val batch = occ.filter(_._1 % 10 == 0)
    val win = batch.groupBy(_._3).collect {
      case (seg, os) if os.size >= 2 => seg -> os.map(o => o._1 * 100000L + o._2).min
    }
    batch.groupBy(_._1).map { case (id, os) =>
      val kept = os.sortBy(_._2).filter { case (d, i, seg) =>
        !corpusSegs(seg) && win.get(seg).forall(_ == d * 100000L + i)
      }
      id -> (os.size.toLong, kept.size.toLong, kept.map(_._3).mkString(" "))
    }
  }

  test("sf0.001: dedup_lines_incr equals the corpus-precedes-batch reference; batch-only output") {
    import spark.implicits._
    val corpus = Tables.load(spark, sf, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val got = SparkEntry.queries("dedup_lines_incr")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(got == refLinesIncr(corpus, 12))
    assert(got.keySet.forall(_ % 10 == 0))
    // the incremental verdict is at least as strict as the full pass on
    // the same docs: the corpus precedes the batch, so anything the full
    // pass dropped from a batch doc is dropped here too
    val full = SparkEntry.queries("dedup_lines")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    got.foreach { case (id, (_, kept, _)) => assert(kept <= full(id), s"doc $id") }
  }

  // ---- real-corpus structural invariants ----

  test("sf0.001: dedup_lines reference equality + exactly one survivor per duplicated segment") {
    import spark.implicits._
    val corpus = Tables.load(spark, sf, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val got = SparkEntry.queries("dedup_lines")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(got == refLines(corpus, 12))
    // conservation: kept ≤ total, and some dup segments exist at sf0.001
    assert(got.values.map(_._2).sum < got.values.map(_._1).sum)
  }

  test("sf0.001: dedup_span_scrub reference equality; scrub is consistent with dedup_spans' accounting") {
    import spark.implicits._
    val corpus = Tables.load(spark, sf, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val got = SparkEntry.queries("dedup_span_scrub")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(got == refScrub(corpus))
    // a doc with zero duplicated spans (dedup_spans) loses zero tokens
    val clean = SparkEntry.queries("dedup_spans")(spark, sf).collect()
      .collect { case r if r.getLong(2) == 0L => r.getLong(0) }.toSet
    clean.foreach(id => assert(got(id)._2 == 0L, s"doc $id"))
  }

  test("sf0.001: dedup_span_keepfirst reference equality; strictly weaker than remove-all") {
    import spark.implicits._
    val corpus = Tables.load(spark, sf, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val got = SparkEntry.queries("dedup_span_keepfirst")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(got == refKeepFirst(corpus))
    // keep-first's dup starts are a subset of remove-all's, so per-doc
    // n_removed can never exceed dedup_span_scrub's; and the corpus
    // must retain MORE tokens in total (somebody kept each passage)
    val all = SparkEntry.queries("dedup_span_scrub")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    got.foreach { case (id, (_, rem, _)) => assert(rem <= all(id), s"doc $id") }
    assert(got.values.map(_._2).sum < all.values.sum)
  }

  /** Arrival-order keep-first reference: corpus precedes batch — corpus
    * presence scrubs a batch occurrence outright, else the min batch
    * doc_id holding the trigram keeps it. */
  private def refKeepFirstIncr(corpus: Seq[(Long, String)])
      : Map[Long, (Long, Long, String)] = {
    val tri = corpus.map { case (id, t) =>
      val toks = t.split("\\s+").toSeq
      id -> (toks, toks.sliding(3).zipWithIndex.collect {
        case (s, q) if s.size == 3 => (s.mkString(" "), q)
      }.toSeq)
    }.toMap
    val corpusTri = tri.collect { case (id, (_, ts)) if id % 10 != 0 =>
      ts.map(_._1) }.flatten.toSet
    val batch = tri.filter(_._1 % 10 == 0)
    val keeper = batch.toSeq.flatMap { case (id, (_, ts)) => ts.map(t => (id, t._1)) }
      .distinct.groupBy(_._2).collect {
        case (t, os) if os.size >= 2 => t -> os.map(_._1).min
      }
    batch.map { case (id, (toks, ts)) =>
      val dupStarts = ts.collect {
        case (t, q) if corpusTri(t) || keeper.get(t).exists(_ != id) => q
      }
      val kept = toks.indices.filterNot(i => dupStarts.exists(q => q >= i - 2 && q <= i))
      id -> (toks.size.toLong, (toks.size - kept.size).toLong, kept.map(toks).mkString(" "))
    }
  }

  test("sf0.001: dedup_span_keepfirst_incr reference equality; batch-only; at least as strict as full keep-first") {
    import spark.implicits._
    val corpus = Tables.load(spark, sf, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val got = SparkEntry.queries("dedup_span_keepfirst_incr")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(got == refKeepFirstIncr(corpus))
    assert(got.keySet.forall(_ % 10 == 0))
    // a batch doc never keeps MORE under arrival order than under global
    // min-doc_id keep-first: a full-pass keeper that lives in the corpus
    // or earlier in the batch scrubs here too
    val full = refKeepFirst(corpus)
    got.foreach { case (id, (_, rem, _)) =>
      assert(rem >= full(id)._2, s"doc $id: incr weaker than full keep-first") }
  }
}

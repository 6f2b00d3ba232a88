package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BpeTrainer
import graft.queries.CrossHash.tokens

/** The distributed BPE trainer must learn exactly the merge list the
  * independent single-JVM reference derives — same pairs, same order,
  * same weighted counts — on both a hand-checkable corpus and real
  * testdata. Determinism (count-desc, then lexicographic tiebreak) makes
  * the comparison an equality. */
class BpeTrainerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def asTuples(ms: Seq[BpeTrainer.Merge]) =
    ms.map(m => (m.rank, m.left, m.right, m.count))

  test("hand corpus: learned merges match the reference, including the early stop") {
    import spark.implicits._
    // classic BPE toy: 'lo' dominates, then 'low', then the 'est' suffix
    val docs = Seq(
      (1L, "low low low lower lower"),
      (2L, "newest newest widest")).toDF("doc_id", "text")
    val got = asTuples(BpeTrainer.train(docs, 20))
    val wc = Map("low" -> 3L, "lower" -> 2L, "newest" -> 2L, "widest" -> 1L)
    val expected = asTuples(BpeTrainer.trainReference(wc, 20))
    assert(got == expected, s"got=$got\nexpected=$expected")
    assert(got.take(2).map(t => (t._2, t._3)) == Seq(("l", "o"), ("lo", "w")),
      s"unexpected head merges: ${got.take(3)}")
    // early stop: far fewer than 20 productive merges exist in 4 words
    assert(got.size < 20, s"no early stop: ${got.size} merges")
  }

  test("edge corpora: empty corpus, single chars, and a repeated word all terminate correctly") {
    import spark.implicits._
    // empty corpus: no merges, no crash
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(BpeTrainer.train(empty, 5).isEmpty)
    // single-character words: no adjacent pairs exist anywhere
    val chars = Seq((1L, "a b c a b")).toDF("doc_id", "text")
    assert(BpeTrainer.train(chars, 5).isEmpty)
    // one word repeated: merges left to right until the word is a single
    // symbol, counts all equal to the repetition count, then early stop
    val rep = Seq((1L, "abcd abcd abcd")).toDF("doc_id", "text")
    val got = asTuples(BpeTrainer.train(rep, 10))
    val expected = asTuples(BpeTrainer.trainReference(Map("abcd" -> 3L), 10))
    assert(got == expected, s"got=$got\nexpected=$expected")
    assert(got.size == 3 && got.forall(_._4 == 3L), got)
  }

  test("sf0.001 documents: 12 distributed merges equal the reference on the same word counts") {
    import spark.implicits._
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select($"doc_id", $"text").filter($"text".isNotNull)
    val got = asTuples(BpeTrainer.train(docs, 12))
    val wc = docs.select(explode(tokens($"text")).as("w"))
      .filter($"w" =!= "")
      .groupBy($"w").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = asTuples(BpeTrainer.trainReference(wc, 12))
    assert(got.size == 12, s"expected 12 merges, got ${got.size}")
    assert(got == expected, s"got=$got\nexpected=$expected")
  }

  test("Tokenizer.Learned counts trained pieces: columnar == per-word reference segmentation") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select($"doc_id", $"text")
    val merges = BpeTrainer.train(docs, 12)
    assert(merges.nonEmpty, "no merges learned — vacuous")
    val tok = graft.functions.Tokenizer.Learned(merges)
    val got = docs.limit(50)
      .select($"doc_id", tok.count($"text").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val texts = docs.limit(50)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    for ((id, text) <- texts) {
      val expected = text.split("\\s+").filter(_.nonEmpty)
        .map(w => BpeTrainer.segmentReference(w, merges).size.toLong).sum
      assert(got(id) == expected, s"doc $id: got ${got(id)}, want $expected")
    }
    // a learned merge genuinely compresses: fewer pieces than characters
    // for at least one doc (the merges fired)
    val chars = texts.map { case (id, t) =>
      id -> t.split("\\s+").filter(_.nonEmpty).map(_.length.toLong).sum }
    assert(texts.keys.exists(id => got(id) < chars(id)),
      "no merge ever fired — Learned degenerated to character counting")
    // the cap is enforced, not silently truncated
    val over = (0 until graft.functions.Tokenizer.Learned.MaxMerges + 1)
      .map(i => BpeTrainer.Merge(i, s"x$i", "y", 2L))
    intercept[IllegalArgumentException](graft.functions.Tokenizer.Learned(over))
    spark.catalog.clearCache()
  }

  test("graft_bpe_count property sweep: seeded random merge tables equal the fold spelling") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    GraftExtensions.register(spark)
    // adversarial tables: duplicate pairs, self-merges (a,a), chained
    // merges, merges over never-produced symbols, multi-char unicode —
    // arbitrary tables, not just trained ones: the expression's contract
    // is table-order application, whatever the table
    val rnd = new scala.util.Random(20260814L)
    val symbols = Vector("a", "b", "c", "ab", "bc", "aa", "的", "é")
    val textAtoms = Vector("a", "b", "c", "ab", "abc", "aab", "aaab", "bca",
      "的的", "café", "", " ")
    for (trial <- 1 to 12) {
      val n = 1 + rnd.nextInt(graft.functions.Tokenizer.Learned.MaxMerges)
      val merges = (0 until n).map(i => BpeTrainer.Merge(i,
        symbols(rnd.nextInt(symbols.length)), symbols(rnd.nextInt(symbols.length)), 2L))
      val texts = Vector.fill(40)(
        Vector.fill(rnd.nextInt(6))(textAtoms(rnd.nextInt(textAtoms.length)))
          .mkString(" "))
      val fold = graft.functions.Tokenizer.Learned(merges)
      val native = graft.functions.Tokenizer.LearnedNative(merges)
      val lefts = merges.map(_.left).toArray
      val rights = merges.map(_.right).toArray
      val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text")
        .select($"id", fold.count($"text").as("f"), native.count($"text").as("n"),
          // the segment twin: same piece count, and LOSSLESS — pieces
          // concatenate back to the text minus whitespace
          size(call_function("graft_bpe_segment", $"text",
            lit(lefts), lit(rights))).cast("long").as("sn"),
          array_join(call_function("graft_bpe_segment", $"text",
            lit(lefts), lit(rights)), "").as("joined"),
          regexp_replace($"text", "\\s+", "").as("nows"))
        .collect()
      rows.foreach { r =>
        assert(r.getLong(1) == r.getLong(2),
          s"trial $trial id ${r.getLong(0)}: fold=${r.getLong(1)} native=${r.getLong(2)} " +
            s"table=${merges.map(m => (m.left, m.right))}")
        assert(r.getLong(2) == r.getLong(3),
          s"trial $trial id ${r.getLong(0)}: count=${r.getLong(2)} segment-size=${r.getLong(3)}")
        assert(r.getString(4) == r.getString(5),
          s"trial $trial id ${r.getLong(0)}: segmentation lost characters")
      }
    }
  }

  test("vocabulary: piece counts equal per-word reference segmentation over the corpus") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    GraftExtensions.register(spark)
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select($"doc_id", $"text").filter($"text".isNotNull)
    val merges = BpeTrainer.train(docs, 12)
    val got = BpeTrainer.vocabulary(docs, merges)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = scala.collection.mutable.Map.empty[String, Long]
    docs.as[(Long, String)].collect().foreach { case (_, text) =>
      text.split("\\s+").filter(_.nonEmpty).foreach { w =>
        BpeTrainer.segmentReference(w, merges).foreach { p =>
          want(p) = want.getOrElse(p, 0L) + 1L
        }
      }
    }
    assert(got == want.toMap, s"vocab mismatch: got=${got.size} want=${want.size} " +
      s"diff=${(got.keySet.diff(want.keySet) ++ want.keySet.diff(got.keySet)).take(5)}")
    // merged pieces genuinely appear (not a character vocabulary)
    assert(got.keys.exists(_.length > 1), "no multi-char piece — merges never fired")
  }

  test("Tokenizer.LearnedNative matches the reference segmentation BEYOND the fold cap") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    GraftExtensions.register(spark)
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select($"doc_id", $"text").filter($"text".isNotNull)
    // train a production-shaped table (5x the fold cap) on the single-JVM
    // reference — pinned equal to the distributed trainer elsewhere — so
    // the spec stays fast while the table is genuinely deep
    val wc = docs.select(explode(tokens($"text")).as("w"))
      .filter($"w" =!= "")
      .groupBy($"w").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val merges = BpeTrainer.trainReference(wc, 160)
    assert(merges.size > graft.functions.Tokenizer.Learned.MaxMerges,
      s"corpus too small to exceed the fold cap (${merges.size} merges) — vacuous")
    val tok = graft.functions.Tokenizer.LearnedNative(merges)
    val got = docs.limit(60)
      .select($"doc_id", tok.count($"text").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val texts = docs.limit(60)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    for ((id, text) <- texts) {
      val expected = text.split("\\s+").filter(_.nonEmpty)
        .map(w => BpeTrainer.segmentReference(w, merges).size.toLong).sum
      assert(got(id) == expected, s"doc $id: got ${got(id)}, want $expected")
    }
    // the deep tail fired: counts strictly below the 32-merge segmentation
    // for at least one doc, so the uncapped table is doing real work
    val tok32 = graft.functions.Tokenizer.Learned(merges.take(32))
    val got32 = docs.limit(60)
      .select($"doc_id", tok32.count($"text").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(texts.keys.exists(id => got(id) < got32(id)),
      "merges beyond the fold cap never fired — the deep table is vacuous here")
  }
}

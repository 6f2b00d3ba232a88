package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.store.{LockFile, TopicOffsets}

/** Advisory lock (G6) + offsets table (S10) semantics. */
class StoreInfraSpec extends AnyFunSuite {

  test("lock is exclusive within and across handles; release frees it") {
    val p = Files.createTempDirectory("graft-lock-").resolve(".graft_lock")
    val l1 = LockFile.acquireOrFail(p)
    assert(l1.stillHeld)
    assert(LockFile.tryAcquire(p).isEmpty, "second acquire must fail (G6)")
    intercept[IllegalStateException](LockFile.acquireOrFail(p))
    l1.close()
    assert(!l1.stillHeld)
    val l2 = LockFile.tryAcquire(p)
    assert(l2.isDefined, "released lock is reacquirable")
    l2.get.close()
  }

  test("offsets bootstrap at -1 and update atomically (S10)") {
    val o = TopicOffsets(Files.createTempDirectory("graft-off-").toString)
    assert(o.offsetFor("t_events", 0) == -1L) // insert-on-absent
    o.update("t_events", 0, 41L)
    assert(o.offsetFor("t_events", 0) == 41L)
    o.update("t_events", 1, 7L)
    assert(o.all() == Map(("t_events", 0) -> 41L, ("t_events", 1) -> 7L))
  }

  test("consumer lag gauge: committed end - processed - 1, floored at 0 (A2)") {
    val spark = TestSpark.spark
    val sink = graft.sources.KafkaShapedLog(
      Files.createTempDirectory("graft-lag-").toString, spark)
    assert(sink.consumerLag("t_events", 0, -1L) == 0L) // empty log, nothing processed
    val log = graft.store.EventLog(Files.createTempDirectory("graft-lagsrc-").toString, spark)
    log.saveAll("t_events", (1 to 5).map(i =>
      graft.model.Event(s"k$i".getBytes, s"p$i".getBytes, java.time.Instant.now())))
    new graft.replicate.Replicator(log, sink).run("t_events")
    assert(sink.nextOffset("t_events", 0) == 5L)
    assert(sink.consumerLag("t_events", 0, -1L) == 5L)  // consumed nothing
    assert(sink.consumerLag("t_events", 0, 2L) == 2L)   // consumed 0..2
    assert(sink.consumerLag("t_events", 0, 4L) == 0L)   // caught up
  }

  test("topic names containing dashes round-trip through the file layout") {
    val o = TopicOffsets(Files.createTempDirectory("graft-off2-").toString)
    o.update("my-topic_events", 3, 9L)
    assert(o.offsetFor("my-topic_events", 3) == 9L)
    assert(o.all().keySet == Set(("my-topic_events", 3)))
  }

  test("graft_dot is SQL-callable after registration; interpreted and codegen agree") {
    val s2 = TestSpark.spark.newSession() // isolated function registry
    intercept[org.apache.spark.sql.AnalysisException](
      s2.sql("SELECT graft_dot(array(1.0D), array(1.0D))").collect())
    graft.GraftExtensions.register(s2)
    val r = s2.sql("SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d").collect()
    assert(r(0).getDouble(0) == 11.0)
    // interpreted path (eval) must match the codegen path
    val e = graft.functions.expressions.DotProduct(
      org.apache.spark.sql.catalyst.expressions.Literal.create(Array(1.0, 2.0),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(Array(3.0, 4.0),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)))
    assert(e.eval(null) == 11.0)
  }

  test("graft_dot matches the composed zip_with/aggregate form on null elements and length mismatch") {
    val s = TestSpark.spark
    graft.GraftExtensions.register(s)
    val rows = s.sql(
      """SELECT
        |  graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS ok,
        |  graft_dot(array(1.0D, CAST(null AS DOUBLE)), array(3.0D, 4.0D)) AS null_elem,
        |  graft_dot(array(1.0D, 2.0D), array(3.0D)) AS len_mismatch,
        |  aggregate(zip_with(array(1.0D, 2.0D), array(3.0D), (x, y) -> x * y),
        |            0D, (acc, x) -> acc + x) AS composed_mismatch""".stripMargin).collect()(0)
    assert(rows.getDouble(0) == 11.0)
    assert(rows.isNullAt(1), "null element must yield NULL, not treat the slot as 0.0")
    assert(rows.isNullAt(2), "length mismatch must yield NULL, not a truncated partial sum")
    assert(rows.isNullAt(3), "composed form agrees: NULL on mismatch")
  }

  test("shingles3 yields empty (not an index error) for documents under 3 tokens") {
    val s = TestSpark.spark
    import org.apache.spark.sql.functions._
    import s.implicits._
    // Spark's sequence(1, 0) is the DESCENDING [1, 0], so an unguarded
    // transform would element_at out of bounds on short docs
    val out = Seq("", "one", "one two", "one two three", "a b c d")
      .toDF("text")
      .select(graft.queries.CrossHash.tokens($"text").as("w"))
      .select(size(graft.queries.CrossHash.shingles3("w")).as("n"))
      .collect().map(_.getInt(0)).toSeq
    assert(out == Seq(0, 0, 0, 1, 2))
  }

  test("graft_h60 equals the composed conv(substring(md5)) spelling on arbitrary strings") {
    val s = TestSpark.spark
    graft.GraftExtensions.register(s)
    import s.implicits._
    import org.apache.spark.sql.functions._
    // unicode, empty, long, and md5-edge inputs; plus a seeded random batch
    val rnd = new scala.util.Random(42)
    val samples = Seq("", "a", "hello world", "的是了在我", "naïve café",
      "x" * 10000) ++ (1 to 200).map(_ => rnd.nextString(rnd.nextInt(50)))
    val df = samples.toDF("t").select(
      call_function("graft_h60", $"t").as("native"),
      conv(substring(md5($"t"), 1, 15), 16, 10).cast("long").as("composed"))
    assert(df.filter($"native" =!= $"composed").count() == 0)
    // null-in → null-out
    val n = Seq[Option[String]](None).toDF("t")
      .select(call_function("graft_h60", $"t")).collect()
    assert(n(0).isNullAt(0))
    // interpreted path agrees with codegen
    val e = graft.functions.expressions.Md5Prefix60(
      org.apache.spark.sql.catalyst.expressions.Literal("hello world"))
    val composed = df.sparkSession.sql(
      "SELECT CAST(conv(substring(md5('hello world'),1,15),16,10) AS BIGINT)").collect()(0).getLong(0)
    assert(e.eval(null) == composed)
  }
}

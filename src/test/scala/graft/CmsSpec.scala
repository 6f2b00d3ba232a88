package graft

import org.scalatest.funsuite.AnyFunSuite

/** Count-Min sketch (`graft_cms`): the aggregate must be exactly
  * partition-independent (pointwise-add merge), linear (sketch(a) +
  * sketch(b) == sketch(a ∪ b), the mergeable-summaries contract), and
  * never undercount. The estimate arithmetic itself is oracle-checked
  * hash-exact by text_cms_counts (DuckDB rebuilds the matrix
  * relationally); this spec pins the aggregate's algebra. */
class CmsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val W = 16
  private val D = 4

  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.functions._

  private def sketchOf(df: DataFrame): Seq[Long] = {
    df.agg(call_function("graft_cms", col("t"), lit(W), lit(D)).as("sk"))
      .collect().head.getSeq[Long](0)
  }

  private lazy val toks: DataFrame = {
    import spark.implicits._
    GraftExtensions.register(spark)
    Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(explode(graft.queries.CrossHash.tokens($"text")).as("t"))
      .cache()
  }

  test("the sketch matrix is identical at any partitioning (pointwise-add merge)") {
    val base = sketchOf(toks)
    assert(base.sum > 0)
    for (n <- Seq(1, 7, 32))
      assert(sketchOf(toks.repartition(n)) == base, s"partitioning $n moved the matrix")
  }

  test("linearity: sketch(a) + sketch(b) == sketch(a ∪ b) elementwise") {
    import spark.implicits._
    val a = toks.filter(xxhash64($"t") % 2 === 0)
    val b = toks.filter(xxhash64($"t") % 2 =!= 0)
    val sum = sketchOf(a).zip(sketchOf(b)).map { case (x, y) => x + y }
    assert(sum == sketchOf(toks))
  }

  test("estimates never undercount, and row totals all equal the stream length") {
    import spark.implicits._
    val rows = SparkEntry.queries("text_cms_counts")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (t, truth, est, over) =>
      assert(est >= truth && over == est - truth, s"token $t undercounted: $est < $truth")
    }
    // every CMS row sees every update exactly once: each of the d row
    // sums equals N
    val n = toks.count()
    val sk = sketchOf(toks)
    for (i <- 0 until D)
      assert(sk.slice(i * W, (i + 1) * W).sum == n, s"row $i sum != N")
    // and with W < vocabulary, collisions actually happened (the oracle
    // exercised the approximate regime, not a vacuous exact case)
    assert(rows.exists(_._4 > 0), "no collisions — widen the vacuity check")
  }

  test("graft_cms merges through the streaming state store (streamed == batch matrix)") {
    import java.nio.file.Files
    import java.time.Instant
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    GraftExtensions.register(spark)
    val base = Instant.parse("2024-01-01T00:00:00Z")
    val rows = (0 until 40).map { i =>
      (java.sql.Timestamp.from(base.plusSeconds((i % 2) * 3600L + i)), s"tok${i % 9}")
    }
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val got = scala.collection.mutable.Map.empty[java.sql.Timestamp, Seq[Long]]
    val sq = mem.toDF().toDF("ts", "t")
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "1 hour").as("w"))
      .agg(call_function("graft_cms", $"t", lit(W), lit(D)).as("sk"))
      .select($"w.start".as("ws"), $"sk")
      .writeStream
      .option("checkpointLocation", Files.createTempDirectory("graft-cmsckpt-").toString)
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        df.collect().foreach(r =>
          got(r.getAs[java.sql.Timestamp]("ws")) = r.getAs[Seq[Long]]("sk"))
      }
    mem.addData(rows.take(23): _*); mem.addData(rows.drop(23): _*)
    val run = sq.start(); run.awaitTermination()
    val expect = rows.toDF("ts", "t")
      .groupBy(window($"ts", "1 hour").as("w"))
      .agg(call_function("graft_cms", $"t", lit(W), lit(D)).as("sk"))
      .select($"w.start".as("ws"), $"sk")
      .as[(java.sql.Timestamp, Seq[Long])].collect().toMap
    assert(got == expect, "streaming CMS diverged from the batch matrix")
  }

  test("null items are ignored; empty input yields the zero matrix") {
    import spark.implicits._
    val withNulls = Seq(Some("x"), None, Some("x"), None).toDF("t")
    val sk = sketchOf(withNulls)
    assert(sk.sum == 2 * D, "nulls must not count")
    val empty = sketchOf(Seq.empty[String].toDF("t"))
    assert(empty.size == W * D && empty.forall(_ == 0L))
  }
}

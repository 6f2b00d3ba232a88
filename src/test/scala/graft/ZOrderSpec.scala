package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ZOrderLayout

/** Z-order layout: the interleave must be the textbook Morton code, and
  * the written layout must actually SKIP — the same secondary-key
  * predicate reads far fewer rows from the z-clustered files than from a
  * primary-key-sorted layout (parquet row-group min/max pruning, measured
  * via scan metrics — results themselves must be identical). */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("zValue is the reference Morton interleave; locality beats single-key order") {
    import spark.implicits._
    def refMorton(a: Long, b: Long, bits: Int): Long = {
      var z = 0L
      for (i <- 0 until bits)
        z |= (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
      z
    }
    val pts = for (a <- 0L until 32L; b <- 0L until 32L) yield (a, b)
    val got = pts.toDF("a", "b")
      .select($"a", $"b", ZOrderLayout.zValue($"a", $"b", 6).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pts.foreach { case (a, b) =>
      assert(got((a, b)) == refMorton(a, b, 6), s"($a,$b)")
    }
    // z-adjacent points stay close in BOTH dims (curve locality): walking
    // the curve, coordinates move by at most a quadrant boundary jump —
    // pin the median step distance is tiny
    val byZ = got.toSeq.sortBy(_._2).map(_._1)
    val steps = byZ.sliding(2).map { case Seq((a1, b1), (a2, b2)) =>
      math.abs(a1 - a2) + math.abs(b1 - b2)
    }.toSeq.sorted
    assert(steps(steps.size / 2) <= 3, s"median z-step distance ${steps(steps.size / 2)}")
  }

  test("minMaxBucket is integer-exact on domains far beyond double precision (multi-year micros spans)") {
    import spark.implicits._
    // a 10-year micros-grained event-time domain: (x-min)*2^bits reaches
    // ~2^63 territory where the old exact-divisible double trick silently
    // floored to k-1 (the numerator exceeds 2^53); every value must match
    // BigInt floor division bit for bit, boundaries included
    val min = 1700000000000000L                 // ~2023 in unix micros
    val max = min + 315L * 24 * 3600 * 1000000L * 10 // ~10 years later
    val bits = 8
    val q = BigInt(max) - BigInt(min) + 1
    val rnd = new scala.util.Random(12)
    val xs = (Seq(min, max, min + 1, max - 1) ++
      // values straddling exact bucket boundaries — the failure site
      (0 until (1 << bits) by 7).flatMap { k =>
        val edge = (q * k / (1 << bits)) + min
        Seq(edge.toLong - 1, edge.toLong, edge.toLong + 1)
      } ++
      Seq.fill(500)(min + (rnd.nextDouble() * (max - min)).toLong))
      .filter(x => x >= min && x <= max).distinct
    val got = xs.toDF("x")
      .select($"x", ZOrderLayout.minMaxBucket($"x", min, max, bits).as("bk"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    xs.foreach { x =>
      val want = ((BigInt(x) - min) * (1 << bits) / q).toLong
      assert(got(x) == want, s"x=$x got=${got(x)} want=$want")
    }
  }

  private def scanRows(df: DataFrame): Long = {
    df.collect()
    df.queryExecution.executedPlan
      .collect { case f: FileSourceScanExec => f }
      .map(_.metrics("numOutputRows").value).sum
  }

  test("secondary-key predicates read far fewer rows from the z-ordered layout (row-group skipping)") {
    import spark.implicits._
    val events = Tables.load(spark, "/root/testdata/sf0.1", "events")
      .select($"event_id", $"user_id", $"event_type", $"value")
    val dir = Files.createTempDirectory("graft-zorder-").toString

    // linear: the common default — sorted by the primary key only
    events.repartitionByRange(4, $"event_id")
      .sortWithinPartitions("event_id")
      .write.option("parquet.block.size", 64L << 10).parquet(s"$dir/linear")
    // z-ordered on (event_id, user_id)
    ZOrderLayout.write(events, "event_id", "user_id", s"$dir/zorder",
      files = 4, rowGroupBytes = 64L << 10)

    val linear = spark.read.parquet(s"$dir/linear")
    val zord = spark.read.parquet(s"$dir/zorder")

    // a selective predicate on the SECONDARY key
    val uid = events.select($"user_id").limit(1).collect().head.getLong(0)
    val lRows = scanRows(linear.filter($"user_id" === uid))
    val zRows = scanRows(zord.filter($"user_id" === uid))
    // identical answers...
    val lGot = linear.filter($"user_id" === uid).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val zGot = zord.filter($"user_id" === uid).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lGot == zGot && zGot.nonEmpty)
    // ...but the z layout skips most row groups where the linear one
    // reads nearly everything (user rows spread uniformly over event_id)
    assert(zRows * 2 < lRows,
      s"z-order skipped nothing: z=$zRows linear=$lRows")

    // and the PRIMARY key still prunes on the z layout (both keys share
    // the clustering): an event_id range reads a fraction of the table
    val (lo, hi) = (1000L, 2000L)
    val zRange = scanRows(zord.filter($"event_id".between(lo, hi)))
    val total = events.count()
    assert(zRange < total / 2,
      s"event_id range read $zRange of $total rows from the z layout")
  }
}

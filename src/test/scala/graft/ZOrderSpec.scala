package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ZOrderLayout

/** The Z-order layout must EARN its key: against a time-sorted layout
  * of the same rows into the same number of files, a user_id point
  * filter must be answerable from a small fraction of the z-ordered
  * files (narrow per-file min/max envelopes on the NON-time dimension),
  * while the time-sorted layout's files each span nearly every user.
  * The key algebra itself is oracle-checked by `layout_zorder`. */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("point filters on the interleaved dimension prune z-ordered files; time-sort doesn't") {
    import spark.implicits._
    val e = Tables.load(spark, sf, "events")
      .select($"event_id", $"user_id".cast("long").as("a"),
        unix_micros($"ts").as("b"))
      .cache()
    val zDir = Files.createTempDirectory("graft-zorder-").toString
    val tDir = Files.createTempDirectory("graft-tsort-").toString
    val files = 16
    ZOrderLayout.write(e, "a", "b", zDir, bits = 8, files = files)
    e.repartitionByRange(files, $"b").sortWithinPartitions($"b")
      .write.mode("overwrite").parquet(tDir)

    // identical content, different clustering
    def ids(d: String) = spark.read.parquet(d)
      .select($"event_id").collect().map(_.getLong(0)).toSet
    assert(ids(zDir) == ids(tDir) && ids(zDir).nonEmpty)

    def envs(d: String) = ZOrderLayout.fileEnvelopes(spark, d, "a")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val (zEnv, tEnv) = (envs(zDir), envs(tDir))
    assert(zEnv.length >= files / 2 && tEnv.length >= files / 2,
      "layouts produced too few files for the comparison to mean anything")

    // a manifest prunes file f for `a = u` iff u outside [lo, hi] —
    // average over every user how many files survive pruning
    val users = e.select($"a").distinct().collect().map(_.getLong(0))
    def avgOverlap(env: Array[(Long, Long)]) =
      users.map(u => env.count { case (lo, hi) => lo <= u && u <= hi }).sum
        .toDouble / users.length
    val (zo, to) = (avgOverlap(zEnv), avgOverlap(tEnv))
    // time-sorted files each span ~all users (events arrive interleaved
    // across users), so overlap ≈ |files|; the z-order curve gives each
    // file a narrow user envelope — require at least a 2× pruning win
    assert(to > tEnv.length * 0.8,
      s"baseline unexpectedly clustered on users (overlap $to of ${tEnv.length})")
    assert(zo <= to / 2.0,
      s"z-order pruning win < 2x: z=$zo vs t=$to files touched on average")
    e.unpersist()
  }
}

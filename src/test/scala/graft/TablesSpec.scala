package graft

import java.nio.file.Files

import org.apache.spark.sql.types.TimestampType
import org.scalatest.funsuite.AnyFunSuite

/** Loader normalization pins. The driver regenerates /root/testdata at
  * round start, and the generator's parquet layout for `events.ts` has
  * already changed once (nanos-as-INT64 → naive timestamp[us], which
  * Spark 4 reads as TIMESTAMP_NTZ and which unix_micros / LTZ-literal
  * comparisons reject at ANALYSIS time — it cost round 9 three queries
  * and the whole bench). Tables.load owns absorbing that variance; this
  * spec pins it against a fixture written in each layout so the next
  * regeneration is a no-op instead of a round-killer. */
class TablesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("TIMESTAMP_NTZ ts normalizes to TimestampType with wall values preserved") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-ntz-").toString
    val src = Tables.load(spark, sf, "events")
    // pandas/pyarrow's default for naive timestamps: timestamp[us]
    // without the UTC-adjusted flag — Spark writes exactly that layout
    // for a timestamp_ntz column
    src.withColumn("ts", $"ts".cast("timestamp_ntz"))
      .write.parquet(s"$dir/events.parquet")
    val re = Tables.load(spark, dir, "events")
    assert(re.schema("ts").dataType == TimestampType,
      s"loader left ts as ${re.schema("ts").dataType}")
    // analysis constructs that reject NTZ must work post-normalization
    re.select(unix_micros($"ts")).schema
    // session tz is UTC, so the cast preserves the instant exactly
    val a = src.select($"event_id", unix_micros($"ts"))
      .as[(Long, Long)].collect().sortBy(_._1)
    val b = re.select($"event_id", unix_micros($"ts"))
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(a.sameElements(b), "NTZ roundtrip changed timestamp values")
  }

  test("non-events tables and LTZ events pass through untouched") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // already-LTZ ts (the normalized form) must be a no-op
    val dir = Files.createTempDirectory("graft-ltz-").toString
    Tables.load(spark, sf, "events").write.parquet(s"$dir/events.parquet")
    val re = Tables.load(spark, dir, "events")
    assert(re.schema("ts").dataType == TimestampType)
    // a table with no ts column takes the passthrough branch
    assert(Tables.load(spark, sf, "documents").columns.contains("doc_id"))
  }
}

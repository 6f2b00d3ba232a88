package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off scale smoke: 1M-event pipeline (ingest → replicate → consume). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    val tmp = java.nio.file.Files.createTempDirectory("graft-scale-")
    val n = 1000000L
    val batch = spark.range(n).select(
      encode(concat(lit("user-"), pmod($"id", lit(50000)).cast("string")), "UTF-8").as("key"),
      encode(concat(lit("payload-"), $"id".cast("string")), "UTF-8").as("data"),
      lit(null).cast("binary").as("metadata"),
      timestamp_micros(lit(1700000000000000L) + $"id" * 1000).as("timestamp"))
    val t0 = System.nanoTime()
    val log = graft.store.EventLog(tmp.resolve("log").toString, spark)
    log.append("scale_events", batch)
    val t1 = System.nanoTime()
    val sink = graft.sources.KafkaShapedLog(tmp.resolve("sink").toString, spark, numPartitions = 8)
    new graft.replicate.Replicator(log, sink, batchSize = 100000).run("scale_events")
    val t2 = System.nanoTime()
    val cnt = sink.read("scale_events").count()
    val distinctOffsets = sink.read("scale_events")
      .select("partition", "offset").distinct().count()
    val t3 = System.nanoTime()
    println(f"## append: ${(t1-t0)/1e9}%.1fs  replicate: ${(t2-t1)/1e9}%.1fs  consume: ${(t3-t2)/1e9}%.1fs")
    println(s"## rows: $cnt  distinct(partition,offset): $distinctOffsets")
    println(f"## end-to-end: ${n/((t3-t0)/1e9)}%.0f events/s")
    spark.stop()
  }
}

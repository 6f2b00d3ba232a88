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
    // Streaming leg: tail the native log as a Structured Streaming source
    // (Subscribe.stream) and drain it with Trigger.AvailableNow — the
    // subscribe-path throughput over the same 1M events.
    var streamed = 0L
    val q = graft.streaming.Subscribe.stream(
        spark, tmp.resolve("log").toString, "scale_events")
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", tmp.resolve("ckpt").toString)
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        streamed += df.count(): Unit
      }
      .start()
    q.awaitTermination()
    val t4 = System.nanoTime()
    println(f"## append: ${(t1-t0)/1e9}%.1fs  replicate: ${(t2-t1)/1e9}%.1fs  consume: ${(t3-t2)/1e9}%.1fs  subscribe-drain: ${(t4-t3)/1e9}%.1fs")
    println(s"## rows: $cnt  distinct(partition,offset): $distinctOffsets  streamed: $streamed")
    println(f"## end-to-end: ${n/((t3-t0)/1e9)}%.0f events/s  subscribe: ${streamed/((t4-t3)/1e9)}%.0f events/s")
    spark.stop()
  }
}

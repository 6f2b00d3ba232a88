package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-step timing of the bench pipeline's replicate leg (dev tool): which
  * of the drain's Spark jobs actually costs — the limit-1 probe, the staged
  * write, or the trailing empty probes. Mirrors Bench.pipelineBench's
  * session shape exactly. */
object ProfilePipeline {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftExtensions.register(spark)
    def timed[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"## $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      r
    }
    (1 to 2).foreach { pass =>
      println(s"## ---- pass $pass ----")
      val tmp = java.nio.file.Files.createTempDirectory("graft-prof-")
      val log = graft.store.EventLog(tmp.resolve("log").toString, spark)
      val batch = graft.Tables.load(spark, sfDir, "events")
        .select(
          encode(col("user_id").cast("string"), "UTF-8").as("key"),
          encode(col("props"), "UTF-8").as("data"),
          lit(null).cast("binary").as("metadata"),
          col("ts").as("timestamp"))
      timed("ingest")(log.append("bench_events", batch))
      val sink = graft.sources.KafkaShapedLog(
        tmp.resolve("sink").toString, spark, numPartitions = 4)
      val repl = new graft.replicate.Replicator(log, sink, batchSize = 1000000)
      timed("replicate (run)")(repl.run("bench_events"))
      timed("idle poll")(repl.pollAndSendBatch("bench_events"))
      timed("consume")(sink.read("bench_events").count())
    }
    spark.stop()
  }
}

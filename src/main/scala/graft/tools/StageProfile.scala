package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Stage-metrics profiler for any registered query — the instrument the
  * r15 verdict asked for on the `dedup_clusters` 14.4×/decade watch item
  * ("if spill-bound, fix the cadence; if core-bound, record the
  * adjudication WITH stage metrics"). Extrapolated arguments about why a
  * key is superlinear at scale keep the flag open; one run of this
  * closes it with numbers.
  *
  * Usage: `runMain graft.tools.StageProfile <sfDir> <queryName>`
  * Prints one JSON line: wall sec (min of 2 passes, same convention as
  * the scale benches) plus SUMMED stage metrics of the faster pass's
  * era — executor run/CPU time (their ratio exposes core contention:
  * runTime ≫ cpuTime means tasks sat on runnable queues or in I/O
  * waits), shuffle read/write bytes, and memory/disk spill bytes
  * (nonzero disk spill = spill-bound).
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: runMain graft.tools.StageProfile <sfDir> <queryName>")
      sys.exit(2)
    }
    val (dir, name) = (args(0), args(1))
    require(graft.SparkEntry.queries.contains(name), s"unknown query: $name")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // SPARK_GRAFT_SHUFFLE: shuffle-partition override (default = cpus,
    // the bench convention). The scale diagnosis knob: a key whose
    // second-decade superlinearity is SPILL from outgrown fixed-count
    // partitions (data 100×, partitions constant) goes linear again when
    // partitions scale with the data — which is what AQE + cluster
    // sizing do at 100 TB, where partition count tracks cores, not 4.
    // validated via Bench's shared rule: a malformed value fails HERE,
    // clearly, and the two mains can't drift on the knob's semantics
    val shuffle = graft.Bench.shuffleEnv.map(_.toString).getOrElse(cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftExtensions.register(spark)

    val stages = new AtomicInteger
    val runMs = new AtomicLong; val cpuNs = new AtomicLong
    val shufR = new AtomicLong; val shufW = new AtomicLong
    val spillMem = new AtomicLong; val spillDisk = new AtomicLong
    val gcMs = new AtomicLong
    val listener = new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val m = s.stageInfo.taskMetrics
        if (m != null) {
          stages.incrementAndGet()
          runMs.addAndGet(m.executorRunTime)
          cpuNs.addAndGet(m.executorCpuTime)
          gcMs.addAndGet(m.jvmGCTime)
          shufR.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          spillMem.addAndGet(m.memoryBytesSpilled)
          spillDisk.addAndGet(m.diskBytesSpilled)
        }
      }
    }
    def reset(): Unit = Seq(runMs, cpuNs, shufR, shufW, spillMem, spillDisk, gcMs)
      .foreach(_.set(0L))

    // clearCache OUTSIDE the nanoTime window — Bench.batteryPass's
    // convention, so `sec` is comparable with the scale benches' numbers
    // for cache-heavy queries
    def pass(): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      sec
    }
    val warm = pass() // pass 1: JIT/classload-bound — time it, meter pass 2
    spark.sparkContext.addSparkListener(listener)
    stages.set(0); reset()
    val t = pass()
    // listenerBus is private[spark]; a short sleep drains the async bus
    // (stage-completed events for a finished job land within ms)
    Thread.sleep(1000)
    def mb(b: AtomicLong) = b.get() / 1048576.0
    println(s"""{"query":"$name","dir":"$dir","sec":${math.min(warm, t)},""" +
      s""""metered_sec":$t,"stages":${stages.get()},""" +
      s""""executor_run_sec":${runMs.get() / 1e3},""" +
      s""""executor_cpu_sec":${cpuNs.get() / 1e9},""" +
      s""""gc_sec":${gcMs.get() / 1e3},""" +
      s""""shuffle_read_mb":${mb(shufR)},"shuffle_write_mb":${mb(shufW)},""" +
      s""""spill_mem_mb":${mb(spillMem)},"spill_disk_mb":${mb(spillDisk)}}""")
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard configuration.
  *
  * Tuned for the local[32] test harness but with settings that carry to a
  * real cluster: AQE on (runtime shuffle-partition coalescing + skew-join
  * splitting), UTC session time zone (reference binds timestamps as UTC,
  * see /root/reference tech.kage.event.postgres/.../PostgresEventStore.java:134),
  * and a shuffle partition count sized to the executor parallelism rather
  * than Spark's default 200.
  */
object GraftSession {
  def local(cpus: Int = Runtime.getRuntime.availableProcessors()): SparkSession =
    configure(SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()

  /** Apply engine defaults to any builder (works for cluster masters too). */
  def configure(b: SparkSession.Builder, shufflePartitions: Int): SparkSession.Builder =
    b.appName("graft-event-engine")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.int96RebaseModeInWrite", "CORRECTED")
      .config("spark.sql.ui.explainMode", "formatted")
      // Backstop against plan-tree blowup (see plans/PlanGuard): a
      // pathological composed plan degrades to a TRUNCATED explain string
      // instead of OOM-ing the driver inside QueryExecution.explainString.
      // The real fix is the lineage cut at the stage boundary — this only
      // turns "driver dies formatting the plan" into a survivable symptom.
      .config("spark.sql.maxPlanStringLength", "8388608")
}

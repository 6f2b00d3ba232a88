package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole suite (Spark startup ~5s). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = GraftSession.configure(
        SparkSession.builder().master("local[4]"), shufflePartitions = 4)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse-").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Executes `df` and sums the parquet scans' `numFiles` metric — the
    * file-level partition-pruning probe shared by the layout specs
    * (`DataFrame.inputFiles` ignores filters, so it can't observe pruning). */
  def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    df.queryExecution.executedPlan
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      .map(_.metrics("numFiles").value).sum
  }
}

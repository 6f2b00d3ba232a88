package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Plan-dump main: writes `.explain("formatted")` of every registered query
  * to `<outDir>/<name>.txt` (default `target/plans`).
  *
  * Makes the physical-plan surface diffable across changes: after an
  * optimizer bump, a query rewrite or a conf change, `git diff`-style
  * comparison of two dump dirs shows exactly which plans moved —
  * PlanAuditSpec pins the invariants that must hold; this exposes
  * everything else. Plans are built against sf0.001 (planning is
  * data-size-independent apart from AQE runtime re-plans, which don't
  * appear in pre-execution explain output).
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val outDir = if (args.length > 1) args(1) else "target/plans"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    val failed = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val p = fn(spark, sfDir).queryExecution.explainString(FormattedMode)
        Files.writeString(Paths.get(outDir, s"$name.txt"), p)
        None
      } catch {
        case e: Exception => Some(name -> e.getMessage)
      }
    }
    failed.foreach { case (n, m) => System.err.println(s"PLAN FAIL $n: $m") }
    println(s"wrote ${SparkEntry.queries.size - failed.size} plans to $outDir" +
      (if (failed.nonEmpty) s"; ${failed.size} FAILED" else ""))
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}

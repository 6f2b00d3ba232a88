package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{GraftExtensions, SparkEntry}

/** Dump formatted physical plans for registered queries (plan audit:
  * PushedFilters / ReadSchema pruning / broadcast joins / codegen spans).
  *
  * Usage: `runMain graft.tools.Explain [queryName ...]` — stdout by
  * default; set `SPARK_GRAFT_PLANS_OUT=<dir>` to write one
  * `<dir>/<name>.txt` per query instead, making the whole plan surface
  * diffable across changes (optimizer bumps, query rewrites, conf
  * changes): PlanAuditSpec pins the invariants that must hold, a dump
  * diff exposes everything else. A query that fails to plan is reported
  * and fails the run.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftExtensions.register(spark)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val outDir = sys.env.get("SPARK_GRAFT_PLANS_OUT")
    outDir.foreach(d => java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d)))
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val unknown = names.filterNot(SparkEntry.queries.keySet)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val failed = names.flatMap { n =>
      try {
        val p = SparkEntry.queries(n)(spark, dir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        outDir match {
          case Some(d) =>
            java.nio.file.Files.writeString(java.nio.file.Paths.get(d, s"$n.txt"), p)
          case None =>
            println(s"\n========== $n ==========")
            println(p)
        }
        None
      } catch {
        case e: Exception => Some(n -> e.getMessage)
      }
    }
    failed.foreach { case (n, m) => System.err.println(s"PLAN FAIL $n: $m") }
    outDir.foreach(d => println(
      s"wrote ${names.size - failed.size} plans to $d" +
        (if (failed.nonEmpty) s"; ${failed.size} FAILED" else "")))
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}

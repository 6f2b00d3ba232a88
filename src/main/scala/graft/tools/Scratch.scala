package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.register(spark)
    val dir = java.nio.file.Files.createTempDirectory("graft-rule-").toString
    (1L to 100L).map(i => (i / 10 + 1, i)).toDF("lsn", "id")
      .write.mode("overwrite").parquet(dir)
    val scan = spark.read.parquet(dir)
      .filter(struct($"lsn", $"id") > struct(lit(7L), lit(65L)))
    println("=== analyzed:\n" + scan.queryExecution.analyzed)
    println("=== optimized:\n" + scan.queryExecution.optimizedPlan)
    println("=== physical:\n" + scan.queryExecution.executedPlan)
    spark.stop()
  }
}

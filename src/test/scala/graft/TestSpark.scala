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
}

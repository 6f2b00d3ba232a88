package graft.tools

import org.apache.spark.sql.SparkSession

/** Scale-evidence probe for the embed-cosine LSH geometry knob
  * (CrossHash.embPlanesFor's SCALING RULE): times
  * DedupQueries.embCosineBanded at an arbitrary (bands × bits) geometry
  * on an arbitrary corpus dir.
  *
  * Why it exists: through r15 the registered `dedup_embed_cosine` key
  * priced the knob-NOT-turned case (fixed 16×6 geometry → candidates
  * ≈ bands·n²/2^bits, quadratic once n outgrows 2^bits — measured 38.8×
  * at 10× data, BENCH10X_r15), and this main measured the knob-TURNED
  * case so the scaling-rule claim was a number, not arithmetic. As of
  * r16 the registered key turns the knob ITSELF
  * (CrossHash.embGeometryFor auto-sizes from the corpus vector count);
  * the probe remains for pricing arbitrary off-rule geometries.
  * Correctness of the parameterization is pinned by DedupScaleSpec's
  * second/third-geometry precision/recall cross-checks; this probe only
  * prices it.
  *
  * Usage: `runMain graft.tools.EmbKnobProbe <sfDir> <bands> <bits>`
  * Prints one JSON line {dir, n_vectors, bands, bits, pairs, sec}
  * (min of two passes, same convention as the scale benches).
  */
object EmbKnobProbe {
  def main(args: Array[String]): Unit = {
    if (args.length < 3) {
      System.err.println("usage: runMain graft.tools.EmbKnobProbe <sfDir> <bands> <bits>")
      sys.exit(2)
    }
    val Array(dir, bandsS, bitsS) = args.take(3)
    val (bands, bits) = (bandsS.toInt, bitsS.toInt)
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
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    var pairs = 0L
    val sec = (1 to 2).map { _ =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      pairs = graft.queries.DedupQueries
        .embCosineBanded(spark, dir, bands, bits).count()
      (System.nanoTime() - t0) / 1e9
    }.min
    println(f"""{"dir":"$dir","n_vectors":$n,"bands":$bands,"bits":$bits,"pairs":$pairs,"sec":$sec%.2f}""")
    spark.stop()
  }
}

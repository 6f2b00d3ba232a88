package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (Array(sfDir, outDir), only) = (args.take(2), args.drop(2).toSet)
    val unknown = only.diff(SparkEntry.queries.keySet)
    require(unknown.isEmpty,
      s"unknown queries: ${unknown.mkString(", ")} (check SparkEntry.queries keys)")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // GEOMETRY SENTINEL: the auto-sized LSH/cell geometries reproduce the
    // static-oracle constants only while the gate corpus stays at n ≤ 512
    // embeddings (currently 500). If a regenerated corpus crosses the
    // boundary, the failure must NAME the geometry drift — not surface as
    // a confusing hash mismatch three queries deep into the compare.
    locally {
      import graft.queries.{CorpusQueries, CrossHash, DedupQueries}
      val n = Tables.load(spark, sfDir, "embeddings").count()
      val emb = CrossHash.embGeometryFor(n)
      val sem = CrossHash.semGeometryFor(n)
      val gate = (CrossHash.EmbBands, CrossHash.EmbBandBits)
      if (emb != gate || sem != DedupQueries.SemBits)
        System.err.println(s"[verify] GEOMETRY DRIFT: $n embeddings → " +
          s"embGeometryFor=$emb (oracle assumes $gate), semGeometryFor=$sem " +
          s"(oracle assumes ${DedupQueries.SemBits}) — the static oracle SQL " +
          "for dedup_embed_cosine/dedup_semantic/dedup_semantic_incr/" +
          "knn_self_topk is INVALID at this corpus size; any hash mismatch " +
          "there is geometry drift, not an algebra bug.")
      val nDocs = Tables.load(spark, sfDir, "documents").count()
      val shards = CrossHash.shardsFor(nDocs)
      if (shards != CorpusQueries.ShuffleShards)
        System.err.println(s"[verify] GEOMETRY DRIFT: $nDocs documents → " +
          s"shardsFor=$shards (oracle assumes ${CorpusQueries.ShuffleShards})" +
          " — the static doc_shuffle oracle SQL is INVALID at this corpus " +
          "size; a hash mismatch there is geometry drift, not an algebra bug.")
    }
    SparkEntry.queries.foreach { case (name, fn) =>
      if (only.nonEmpty && !only(name)) ()
      else try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      finally spark.catalog.clearCache() // per-query caches must not accumulate
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // manifest of what this run ATTEMPTED: lets the compare side fail
    // LOUD on a query whose dump is missing (= it threw above), instead
    // of the battery silently shrinking by one dir (the round-9 failure
    // mode). Restricted to `only` so partial dev runs don't false-alarm.
    val attempted = if (only.isEmpty) SparkEntry.queries.keySet else only
    Files.writeString(Paths.get(s"$outDir/queries.json"),
      attempted.toSeq.sorted.map(q).mkString("[", ",", "]"))
    spark.stop()
  }
}

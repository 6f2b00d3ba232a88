package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic N× amplifier for the driver's synthetic tables — the
  * scale-evidence instrument behind BENCH10X (SURVEY §9's falsification
  * test): every scale claim in §9 extrapolates from sf0.1, where per-key
  * times are stage-overhead-bound; this produces an sf1-class corpus the
  * heavy families can be re-benched on, with per-family runtime expected
  * to scale ~linearly in N if (and only if) the plans really are
  * candidate-bounded.
  *
  * The amplification is ISOMORPHIC-SLICE replication, not naive row
  * copying: copy k of a document suffixes every whitespace token with
  * `~k`, so slice k is structurally identical to the base corpus (same
  * per-doc token counts, same dup/near-dup/containment/benchmark-quote
  * relationships WITHIN the slice) while sharing zero shingles ACROSS
  * slices. Ids shift by k·[[Stride]] where Stride = lcm(1..10)·17 —
  * every `doc_id % {2..10, EvalMod}` split the queries use is preserved
  * per slice. The result: duplicate RATE, cluster-size distribution,
  * contamination rate and bucket-occupancy distribution all match the
  * base corpus exactly, so a dedup family that is linear in corpus size
  * must come out ~N× — any superlinearity observed is real shuffle/
  * listing cost, never a data-skew artifact of the generator. Embedding
  * slices circular-shift the 64 dims by k AND sign-flip per (k, dim)
  * (both exact-IEEE distance-preserving within a slice; the signs keep
  * slices distinct past k = 64, where shift-only repeats verbatim —
  * Gen10xSpec pins both invariants); relational keys stride uniformly
  * with referential integrity
  * (orderkey/custkey/partkey/suppkey shift together; nation/region dims
  * stay shared). Fully seedless-deterministic: pure column transforms,
  * no RNG, no clock.
  *
  * Usage: `runMain graft.tools.Gen10x [srcDir] [outDir]`
  * (defaults /root/testdata/sf0.1 → bigdata/sf1, N from
  * SPARK_GRAFT_COPIES, default 10).
  */
object Gen10x {
  /** lcm(1..10) · EvalMod(17): adding k·Stride preserves every modular
    * split residue in {1..10, 17} that the query battery keys on. */
  val Stride = 2520L * 17L

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = if (args.length > 1) args(1) else "bigdata/sf1"
    val copies = sys.env.getOrElse("SPARK_GRAFT_COPIES", "10").toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, src, out, copies)
    spark.stop()
  }

  def run(spark: SparkSession, src: String, out: String, copies: Int): Unit = {
    val ks = broadcast(spark.range(copies)
      .select(col("id").cast("int").as("k")))
    def amp(name: String, parts: Int)(f: (DataFrame, Column) => DataFrame): Unit = {
      val base = spark.read.parquet(s"$src/$name.parquet")
      f(base.crossJoin(ks), col("k")).drop("k")
        .repartition(parts)
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"gen10x: $name x$copies")
    }
    def shift(c: String, k: Column): Column = col(c) + k.cast("long") * Stride

    amp("documents", 8) { (df, k) =>
      df.withColumn("doc_id", shift("doc_id", k))
        .withColumn("text", when(k === 0, col("text")).otherwise(
          array_join(transform(split(col("text"), " "),
            t => concat(t, lit("~"), k.cast("string"))), " ")))
        .withColumn("n_chars", length(col("text")).cast("long"))
    }
    // Embedding slices: circular-shift the dims by k, then flip each
    // dim's SIGN by a deterministic per-(k, dim) pattern (xxhash64 —
    // generator-only, no oracle spelling needed). Both ops are
    // distance-preserving WITHIN a slice in exact IEEE terms (a sign
    // flip touches only the sign bit; (s·a)(s·b) = ab exactly), so every
    // within-slice pair relationship ≡ base. The sign pattern is what
    // keeps slices distinct past k = 64: shift-only slices repeat
    // verbatim at k mod 64 (r16's x100_output_caveat — 100× embed pair
    // output was ~12× superlinear from k/k+64 verbatim duplicates);
    // with per-slice signs, two slices coincide only if all 64 dims'
    // flips agree (~2⁻⁶⁴). k = 0 is pinned to the identity so the base
    // slice stays byte-identical.
    amp("embeddings", 8) { (df, k) =>
      df.withColumn("vec_id", shift("vec_id", k))
        .withColumn("embedding", expr(
          "transform(embedding, (x, i) -> " +
            "element_at(embedding, ((i + k) % size(embedding)) + 1) * " +
            "(CASE WHEN k = 0 THEN CAST(1 AS FLOAT) " +
            "WHEN pmod(xxhash64('genflip', k, i), 2) = 0 THEN CAST(1 AS FLOAT) " +
            "ELSE CAST(-1 AS FLOAT) END))"))
    }
    amp("events", 8) { (df, k) =>
      df.withColumn("event_id", shift("event_id", k))
        .withColumn("user_id", shift("user_id", k))
    }
    amp("lineitem", 16) { (df, k) =>
      df.withColumn("l_orderkey", shift("l_orderkey", k))
        .withColumn("l_partkey", shift("l_partkey", k))
        .withColumn("l_suppkey", shift("l_suppkey", k))
    }
    amp("orders", 8) { (df, k) =>
      df.withColumn("o_orderkey", shift("o_orderkey", k))
        .withColumn("o_custkey", shift("o_custkey", k))
    }
    amp("customer", 4) { (df, k) => df.withColumn("c_custkey", shift("c_custkey", k)) }
    amp("supplier", 2) { (df, k) => df.withColumn("s_suppkey", shift("s_suppkey", k)) }
    amp("part", 4) { (df, k) => df.withColumn("p_partkey", shift("p_partkey", k)) }
    // shared dims: nation/region are not amplified (the TPC-H shape)
    for (name <- Seq("nation", "region")) {
      spark.read.parquet(s"$src/$name.parquet")
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"gen10x: $name copied")
    }
  }
}

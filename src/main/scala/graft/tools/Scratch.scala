package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad for profiling alternative formulations (not part of the
  * library surface; invoked manually via runMain). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime; val n = f
      println(s"## $name: ${(System.nanoTime - t0) / 1e9}s n=$n")
    }
    val dir = "/root/testdata/sf0.1"
    import graft.queries.CrossHash._
    val docs = graft.Tables.load(spark, dir, "documents")
    time("docs")(docs.count())
    val sh = docs.select($"doc_id", tokens($"text").as("w"))
      .select($"doc_id", explode(shingles3("w")).as("s"))
      .distinct()
    time("sh")(sh.count())
    val shc = sh.cache()
    time("sh_cache")(shc.count())
    val hx = shc.select($"doc_id", (h60($"s") % P).as("x"))
    time("hx")(hx.count())
    val sigCols = (0 until NumPerm).map(i =>
      min((lit(permA(i)) * $"x" + lit(permB(i))) % P).as(s"m$i"))
    val sig = hx.groupBy($"doc_id").agg(sigCols.head, sigCols.tail: _*)
    time("sig")(sig.count())
    val bandStructs = (0 until NumBands).map { b =>
      val cols = (0 until BandRows).map(r => col(s"m${b * BandRows + r}"))
      struct(lit(b).as("band"), concat_ws(",", cols: _*).as("bv"))
    }
    val bands = sig.select($"doc_id", explode(array(bandStructs: _*)).as("e"))
      .select($"doc_id", $"e.band".as("band"), $"e.bv".as("bv")).cache()
    time("bands")(bands.count())
    val cand = bands.as("a").join(bands.as("b"),
        $"a.band" === $"b.band" && $"a.bv" === $"b.bv" && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .distinct()
    time("cand")(cand.count())
    val inter = cand
      .join(shc.select($"doc_id".as("doc_a"), $"s".as("sa")), "doc_a")
      .join(shc.select($"doc_id".as("doc_b"), $"s".as("sb")), "doc_b")
      .filter($"sa" === $"sb")
      .groupBy($"doc_a", $"doc_b")
      .agg(count(lit(1)).as("inter"))
    time("inter")(inter.count())
    val cnt = shc.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val j = $"inter".cast("double") / ($"na" + $"nb" - $"inter")
    val out = inter
      .join(cnt.select($"doc_id".as("doc_a"), $"n".as("na")), "doc_a")
      .join(cnt.select($"doc_id".as("doc_b"), $"n".as("nb")), "doc_b")
      .filter(j >= 0.6)
    time("final")(out.count())
    spark.stop()
  }
}

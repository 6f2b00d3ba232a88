package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftExtensions, GraftSession, Tables}
import graft.functions.Tokenizer
import graft.operators.BpeTrainer
import graft.queries.CrossHash.tokens

/** One-off measurement backing the BpePieceCount scaladoc: fold-spelling
  * Learned vs native LearnedNative at the fold cap, and the native
  * counter on a production-shaped table the fold cannot express.
  * Run: sbt "runMain graft.tools.BpeBench /root/testdata/sf0.1" */
object BpeBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark)
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
      .select($"doc_id", $"text").filter($"text".isNotNull).cache()
    docs.count()
    val wc = docs.select(explode(tokens($"text")).as("w")).filter($"w" =!= "")
      .groupBy($"w").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val m32 = BpeTrainer.trainReference(wc, 32)
    val m512 = BpeTrainer.trainReference(wc, 512)
    def time(label: String, tok: Tokenizer): Unit = {
      // min-of-3, matching Bench's discipline
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        docs.select(sum(tok.count($"text"))).collect()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-22s ${ts.min}%.2f s (runs: ${ts.map(t => f"$t%.2f").mkString(", ")})")
    }
    time("fold-32", Tokenizer.Learned(m32))
    time("native-32", Tokenizer.LearnedNative(m32))
    time(s"native-${m512.size}", Tokenizer.LearnedNative(m512))
    spark.stop()
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the scale generator's ISOMORPHIC-SLICE invariants (Gen10x
  * scaladoc) — the properties every BENCH10X/100X ratio interpretation
  * rests on. Run at copies = 66 so the k = 64 wrap is exercised: before
  * the r17 per-slice sign perturbation, slices k and k+64 were VERBATIM
  * embedding duplicates (rotation-only repeats mod 64), making 100× embed
  * pair output ~12× superlinear in the generator itself rather than the
  * plan (r16 x100_output_caveat).
  */
class Gen10xSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val src = "/root/testdata/sf0.001"

  test("embedding slices: k=0 byte-identical, within-slice geometry exact under the sign flip, slices distinct past k=64, doc dup structure per slice equals base") {
    val out = java.nio.file.Files.createTempDirectory("graft-gen10x-").toString
    graft.tools.Gen10x.run(spark, src, out, 66)
    val stride = graft.tools.Gen10x.Stride

    def vecsOf(path: String): Array[(Long, Array[Float])] =
      spark.read.parquet(path).select("vec_id", "embedding").collect()
        .map(r => r.getAs[Long]("vec_id") ->
          r.getAs[scala.collection.Seq[Float]]("embedding").toArray)
        .sortBy(_._1)
    val base = vecsOf(s"$src/embeddings.parquet")
    val amp = vecsOf(s"$out/embeddings.parquet")
    assert(amp.length == base.length * 66, "row count off")
    def slice(k: Int): Array[(Long, Array[Float])] =
      amp.filter { case (id, _) => id >= k * stride && id < (k + 1) * stride }
        .map { case (id, v) => (id - k * stride) -> v }

    // k = 0 must be the base corpus BYTE-identical (CASE k=0 identity arm)
    val s0 = slice(0)
    assert(s0.map(_._1).sameElements(base.map(_._1)))
    s0.zip(base).foreach { case ((id, a), (_, b)) =>
      assert(a.sameElements(b), s"slice 0 drifted from base at vec $id") }

    // slices 1 and 65 share the dim rotation (65 mod 64 = 1) — before the
    // sign perturbation they were verbatim duplicates; now they must differ
    val s1 = slice(1); val s65 = slice(65)
    assert(s1.length == base.length && s65.length == base.length)
    assert(s1.zip(s65).exists { case ((_, a), (_, b)) => !a.sameElements(b) },
      "slices 1 and 65 are verbatim duplicates — the sign perturbation is dead")

    // within-slice geometry under the SIGN FLIP is EXACT in IEEE terms
    // (each pairwise product gets s_d² = 1): slices 1 and 65 share the
    // rotation, so their pairwise dot products must be BIT-identical
    def dots(vs: Array[(Long, Array[Float])]): IndexedSeq[Double] =
      for (i <- vs.indices; j <- i + 1 until vs.length) yield {
        var s = 0.0; var d = 0
        while (d < vs(i)._2.length) {
          s += vs(i)._2(d).toDouble * vs(j)._2(d).toDouble; d += 1 }
        s
      }
    val d1 = dots(s1); val d65 = dots(s65)
    assert(d1 == d65, "sign flip changed within-slice dot products")
    // ...and the ROTATION preserves them up to summation order (the
    // pre-existing r15 property: same terms, rotated fold order)
    val db = dots(base)
    d1.zip(db).foreach { case (x, y) =>
      assert(math.abs(x - y) <= 1e-6 * math.max(1.0, math.abs(y)),
        s"rotation moved a dot product beyond fold-order noise: $x vs $y") }

    // per-slice DOCUMENT structure ≡ base: token suffixing is a bijection
    // on tokens within a slice, so each doc's token count and DISTINCT
    // 3-gram shingle count must equal its base twin's — the quantities
    // every dedup family's per-slice work is a function of
    import org.apache.spark.sql.functions._
    def docShape(df: org.apache.spark.sql.DataFrame, shiftBy: Long): Map[Long, (Int, Long)] =
      df.select(col("doc_id"), split(col("text"), "\\s+").as("w"))
        .select(col("doc_id"), size(col("w")).as("n"),
          size(array_distinct(expr(
            "CASE WHEN size(w) >= 3 THEN transform(sequence(1, size(w) - 2), " +
              "i -> concat_ws(' ', element_at(w, i), element_at(w, i+1), element_at(w, i+2))) " +
              "ELSE array() END"))).cast("long").as("s"))
        .collect().map(r => (r.getAs[Long]("doc_id") - shiftBy) ->
          ((r.getAs[Int]("n"), r.getAs[Long]("s")))).toMap
    val baseDocs = spark.read.parquet(s"$src/documents.parquet")
    val ampDocs = spark.read.parquet(s"$out/documents.parquet")
    val baseShape = docShape(baseDocs, 0L)
    assert(baseShape.nonEmpty)
    for (k <- Seq(1L, 65L)) {
      val lo = k * stride; val hi = lo + stride
      val sl = ampDocs.filter(col("doc_id") >= lo && col("doc_id") < hi)
      assert(docShape(sl, lo) == baseShape, s"slice $k doc structure drifted")
      // zero cross-slice text sharing: every token of slice k carries ~k
      assert(sl.filter(not(col("text").contains(s"~$k"))).count() == 0L,
        s"slice $k has unsuffixed text — cross-slice shingle leak")
    }
  }
}

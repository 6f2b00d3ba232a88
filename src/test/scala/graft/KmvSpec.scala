package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.expressions.KmvMinima

/** Pure-JVM property checks of the KMV buffer algebra (no Spark): the
  * Spark-level partition-independence test (ScaleOpsSpec) exercises a few
  * merge schedules; these sweep many seeded splits and merge orders, which
  * is what actually guarantees the aggregate is deterministic under ANY
  * scheduling Spark chooses. */
class KmvSpec extends AnyFunSuite {
  private val k = 16

  private def agg = KmvMinima(
    org.apache.spark.sql.catalyst.expressions.Literal(1L),
    org.apache.spark.sql.catalyst.expressions.Literal(k))

  private def bufOf(xs: Seq[Long]) = {
    val a = agg
    val b = a.createAggregationBuffer()
    // drive the buffer through the same insert policy update() uses, via
    // merge with singletons — update() needs InternalRows; the policy is
    // identical (size < k add, else compare to last)
    xs.foreach { x =>
      val s = a.createAggregationBuffer(); s.add(x)
      a.merge(b, s)
    }
    b
  }

  private def minima(xs: Seq[Long]): Seq[Long] =
    xs.distinct.sorted.take(k)

  test("merge equals the k smallest distinct values for any split and order (seeded sweep)") {
    for (seed <- 1 to 20) {
      val rnd = new scala.util.Random(seed)
      val n = 1 + rnd.nextInt(400)
      // duplicates on purpose: values drawn from a small range
      val xs = Seq.fill(n)(rnd.nextInt(120).toLong)
      val expected = minima(xs)
      // arbitrary 3-way split, merged in shuffled order
      val (s1, rest) = xs.splitAt(rnd.nextInt(xs.size + 1))
      val (s2, s3) = rest.splitAt(rnd.nextInt(rest.size + 1))
      val parts = rnd.shuffle(List(s1, s2, s3))
      val a = agg
      val merged = parts.map(bufOf).reduce(a.merge)
      val got = {
        val it = merged.iterator(); val b = Seq.newBuilder[Long]
        while (it.hasNext) b += it.next()
        b.result()
      }
      assert(got == expected, s"seed $seed: $got != $expected")
    }
  }

  test("update() path equals the merge-built buffer (cheap-reject branch swept)") {
    // bufOf drives ONLY merge(); update()'s own insert policy — including
    // the full-buffer cheap-reject branch and null skipping — must build
    // the identical buffer, or a policy divergence would only surface in
    // the slower Spark-level tests (r6 advisor finding)
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, GenericInternalRow, Literal}
    val bound = KmvMinima(
      BoundReference(0, org.apache.spark.sql.types.LongType, nullable = true),
      Literal(k))
    def bufOfUpdate(xs: Seq[Option[Long]]) = {
      val b = bound.createAggregationBuffer()
      xs.foreach(x =>
        bound.update(b, new GenericInternalRow(Array[Any](x.orNull))))
      b
    }
    for (seed <- 1 to 20) {
      val rnd = new scala.util.Random(seed)
      val n = 1 + rnd.nextInt(400)
      // > k distinct values so the cheap-reject (full-buffer) branch runs;
      // interleaved nulls must be skipped, not inserted as zeros
      val xs = Seq.fill(n)(
        if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(120).toLong))
      val viaUpdate = bufOfUpdate(xs)
      val viaMerge = bufOf(xs.flatten)
      assert(viaUpdate == viaMerge, s"seed $seed: update() diverged from merge()")
      val got = {
        val it = viaUpdate.iterator(); val b = Seq.newBuilder[Long]
        while (it.hasNext) b += it.next()
        b.result()
      }
      assert(got == minima(xs.flatten), s"seed $seed: $got")
    }
  }

  test("serialize/deserialize round-trips the buffer exactly") {
    val a = agg
    val buf = bufOf(Seq(5L, 3L, 99L, 3L, 7L, Long.MaxValue, 0L))
    val back = a.deserialize(a.serialize(buf))
    assert(back == buf)
    assert(a.eval(back).asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
      .toLongArray().toSeq == Seq(0L, 3L, 5L, 7L, 99L, Long.MaxValue))
  }

  test("negative hashes are legal values, not sentinels") {
    val a = agg
    val buf = bufOf(Seq(-10L, -2L, 5L, Long.MinValue))
    val got = a.eval(buf).asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
      .toLongArray().toSeq
    assert(got == Seq(Long.MinValue, -10L, -2L, 5L))
  }
}

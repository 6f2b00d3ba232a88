package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.catalyst.expressions.{BoundReference, GenericInternalRow, Literal}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.expressions.SpaceSavingTopK

/** Pure-JVM property checks of the SpaceSaving buffer algebra, mirroring
  * KmvSpec's discipline: exact-regime determinism for any split/merge
  * order, update-vs-merge policy equality, and the published approximation
  * guarantees in the eviction regime. */
class SpaceSavingSpec extends AnyFunSuite {
  private def aggOf(k: Int) = SpaceSavingTopK(
    BoundReference(0, org.apache.spark.sql.types.StringType, nullable = true),
    Literal(k))

  private def bufOfUpdate(k: Int, xs: Seq[Option[String]]) = {
    val a = aggOf(k)
    val b = a.createAggregationBuffer()
    xs.foreach(x => a.update(b,
      new GenericInternalRow(Array[Any](x.map(UTF8String.fromString).orNull))))
    b
  }

  private def asMap(buf: java.util.HashMap[String, Array[Long]]): Map[String, (Long, Long)] = {
    val b = Map.newBuilder[String, (Long, Long)]
    buf.forEach((k, v) => b += (k -> ((v(0), v(1)))))
    b.result()
  }

  private def randItems(rnd: scala.util.Random, n: Int, alphabet: Int): Seq[String] =
    Seq.fill(n)(s"t${rnd.nextInt(alphabet)}")

  test("exact regime (k >= distinct): any split and merge order equals the true frequency table") {
    val k = 64
    for (seed <- 1 to 20) {
      val rnd = new scala.util.Random(seed)
      val xs = randItems(rnd, 1 + rnd.nextInt(500), 40) // <= 40 distinct < k
      val expected = xs.groupBy(identity).map { case (t, g) => t -> ((g.size.toLong, 0L)) }
      val (s1, rest) = xs.splitAt(rnd.nextInt(xs.size + 1))
      val (s2, s3) = rest.splitAt(rnd.nextInt(rest.size + 1))
      val parts = rnd.shuffle(List(s1, s2, s3))
      val a = aggOf(k)
      val merged = parts.map(p => bufOfUpdate(k, p.map(Some(_)))).reduce(a.merge)
      assert(asMap(merged) == expected, s"seed $seed")
    }
  }

  test("nulls are skipped; update() and merge() build identical buffers") {
    val k = 16
    for (seed <- 1 to 20) {
      val rnd = new scala.util.Random(seed)
      val xs = Seq.fill(1 + rnd.nextInt(400))(
        if (rnd.nextInt(10) == 0) None else Some(s"t${rnd.nextInt(12)}"))
      val viaUpdate = bufOfUpdate(k, xs)
      // same stream via singleton-merge (the merge-side insert policy)
      val a = aggOf(k)
      val viaMerge = xs.flatten.foldLeft(a.createAggregationBuffer()) { (acc, x) =>
        a.merge(acc, bufOfUpdate(k, Seq(Some(x))))
      }
      assert(asMap(viaUpdate) == asMap(viaMerge), s"seed $seed")
    }
  }

  test("eviction regime: SpaceSaving guarantees hold (overcount <= err <= N/k; heavy items present)") {
    val k = 8
    for (seed <- 1 to 20) {
      val rnd = new scala.util.Random(seed)
      // zipf-ish: heavy head + long tail, far more distinct than k
      val xs = Seq.fill(800)(
        if (rnd.nextInt(3) == 0) s"h${rnd.nextInt(3)}" else s"t${rnd.nextInt(200)}")
      val truth = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val buf = bufOfUpdate(k, xs.map(Some(_)))
      val got = asMap(buf)
      assert(got.size <= k)
      val n = xs.size.toLong
      got.foreach { case (item, (cnt, err)) =>
        val t = truth.getOrElse(item, 0L)
        assert(cnt >= t, s"seed $seed: $item undercounted ($cnt < $t)")
        assert(cnt - err <= t, s"seed $seed: $item guaranteed-count above truth")
        assert(err <= n / k, s"seed $seed: err bound violated for $item")
      }
      // every item with true frequency > N/k must be in the summary
      truth.filter(_._2 > n / k).keys.foreach { heavy =>
        assert(got.contains(heavy), s"seed $seed: heavy hitter $heavy missing")
      }
    }
  }

  test("serde round-trips the buffer exactly") {
    val k = 8
    val a = aggOf(k)
    val buf = bufOfUpdate(k,
      randItems(new scala.util.Random(7), 300, 50).map(Some(_)))
    val back = a.deserialize(a.serialize(buf))
    assert(asMap(back) == asMap(buf))
  }
}

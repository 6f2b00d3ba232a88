package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{Asset, PerceptualHash}
import graft.operators.HammingBands

/** Image near-dup dedup via 64-bit aHash + exact pigeonhole banding:
  * the perceptual fingerprint must be stable under lossless re-encode,
  * move a little under a local edit, and a lot under inversion; the
  * banded pair join must equal the quadratic spelling exactly (the
  * HammingBands pigeonhole guarantee, pinned here at 64 bits — the
  * 32-bit pin lives in DedupScaleSpec's simhash case). */
class PerceptualDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Deterministic block-pattern image: 64×64, 8×8 blocks shaded from a
    * seeded integer sequence — each block maps onto one aHash cell. */
  private def patternImage(seed: Int, edit: Option[(Int, Int)] = None,
      invert: Boolean = false): BufferedImage = {
    val img = new BufferedImage(64, 64, BufferedImage.TYPE_INT_RGB)
    for (by <- 0 until 8; bx <- 0 until 8) {
      val m = (seed * 31 + by * 8 + bx + 1) * 2654435761L
      val base = ((m >>> 13) ^ (m >>> 29)).toInt & 0xff
      val edited = edit match {
        case Some((ex, ey)) if ex == bx && ey == by => 255 // paint one block white
        case _ => base
      }
      val v = if (invert) 255 - edited else edited
      for (y <- by * 8 until by * 8 + 8; x <- bx * 8 until bx * 8 + 8)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  private def png(img: BufferedImage): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    assert(ImageIO.write(img, "png", out))
    out.toByteArray
  }

  test("aHash: identical under lossless re-encode, near under a one-block edit, far under inversion") {
    val a = Multimodal.aHash64(patternImage(7))
    val reenc = Multimodal.aHash64(
      ImageIO.read(new java.io.ByteArrayInputStream(png(patternImage(7)))))
    assert(a == reenc, "PNG round-trip must not move the perceptual hash")
    val edited = Multimodal.aHash64(patternImage(7, edit = Some((3, 4))))
    val hdEdit = java.lang.Long.bitCount(a ^ edited)
    assert(hdEdit >= 1 && hdEdit <= 3, s"one-block edit moved $hdEdit bits")
    val inverted = Multimodal.aHash64(patternImage(7, invert = true))
    assert(java.lang.Long.bitCount(a ^ inverted) > 16, "inversion must be far")
  }

  test("perceptualPairs: finds the near-copy, rejects the distinct image, excludes undecodables; banded == quadratic") {
    import spark.implicits._
    // 40 distinct base images, a near-copy of base 0, an inverted copy of
    // base 0, and a non-image payload
    val assets = ((0 until 40).map(i => Asset(i.toLong, png(patternImage(i)), "image/png", "s")) ++
      Seq(Asset(100L, png(patternImage(0, edit = Some((2, 2)))), "image/png", "s"),
        Asset(101L, png(patternImage(0, invert = true)), "image/png", "s"),
        Asset(102L, "not an image".getBytes("UTF-8"), "text/plain", "s")))
      .toDS()
    val hashes = Multimodal.perceptualHashes(assets).cache()
    val byId = hashes.collect().map(h => h.asset_id -> h).toMap
    assert(!byId(102L).decoded, "non-image must be undecodable, not pseudo-hashed")
    assert(byId(0L).decoded && byId(100L).decoded)

    val pairs = Multimodal.perceptualPairs(hashes, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs.exists { case (a, b, _) => a == 0L && b == 100L },
      s"near-copy pair (0,100) missing from $pairs")
    assert(!pairs.exists { case (a, b, _) => (a, b) == (0L, 101L) },
      "inverted image must not pair")
    assert(!pairs.exists { case (a, b, _) => a == 102L || b == 102L })

    // exactness: banded == the quadratic spelling over the same hashes
    val hs = hashes.collect().filter(_.decoded)
    val quad = (for {
      x <- hs; y <- hs if x.asset_id < y.asset_id
      hd = java.lang.Long.bitCount(x.phash ^ y.phash) if hd <= 3
    } yield (x.asset_id, y.asset_id, hd.toLong)).toSet
    assert(pairs == quad,
      s"missing=${(quad -- pairs).take(5)} extra=${(pairs -- quad).take(5)}")
  }

  test("HammingBands.offsetsFor covers all bits disjointly at any geometry") {
    for ((bits, bands) <- Seq((64, 3), (32, 3), (64, 5), (16, 4), (64, 64))) {
      val offs = HammingBands.offsetsFor(bits, bands)
      val covered = offs.flatMap { case (_, shift, mask) =>
        (0 until 64).filter(i => ((mask >> (i - shift)) & 1L) == 1L && i >= shift)
      }
      assert(covered.sorted == (0 until bits), s"($bits,$bands): $covered")
    }
  }

  test("banded == quadratic under forced hot-bucket splits (cap=2) on seeded random 64-bit hashes") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260813L)
    // clustered hashes: 30 seeds, each with 0-3 ≤2-bit perturbed copies
    val hs = (0 until 30).flatMap { i =>
      val base = rnd.nextLong()
      base +: (0 until rnd.nextInt(4)).map { _ =>
        (0 until rnd.nextInt(3)).foldLeft(base)((h, _) => h ^ (1L << rnd.nextInt(64)))
      }
    }.zipWithIndex.map { case (h, i) => (i.toLong, h) }
    val fps = hs.toDF("id", "fp")
    val banded = HammingBands.pairs(fps, HammingBands.offsetsFor(64, 3), 2, cap = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val quad = (for {
      (ia, ha) <- hs; (ib, hb) <- hs if ia < ib
      hd = java.lang.Long.bitCount(ha ^ hb) if hd <= 2
    } yield (ia, ib, hd.toLong)).toSet
    assert(quad.nonEmpty, "vacuous sweep")
    assert(banded == quad,
      s"missing=${(quad -- banded).take(5)} extra=${(banded -- quad).take(5)}")
  }
}

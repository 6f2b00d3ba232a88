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

  // ---- audio energy-contour dedup (the audio analog of aHash) ----

  /** 1 s of 16-bit mono PCM at 8 kHz shaped into 64 equal-amplitude
    * windows from a seeded sequence (one window per audioHash64 bit).
    * Amplitudes are EVEN so an exact half-volume copy stays integral. */
  private def track(seed: Int, editWindow: Option[Int] = None): Array[Short] = {
    val n = 8000
    Array.tabulate(n) { i =>
      val w = i * 64 / n
      val m = (seed * 31 + w + 1) * 2654435761L
      val base = ((((m >>> 20) ^ (m >>> 40)) & 0x3ffe) + 512).toInt
      val amp = if (editWindow.contains(w)) 18000 else base
      (if (i % 2 == 0) amp else -amp).toShort
    }
  }

  private def wav(samples: Array[Short], channels: Int = 1): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val fmt = new AudioFormat(8000f, 16, channels, true, false)
    val pcm = new Array[Byte](samples.length * 2)
    for (i <- samples.indices) {
      pcm(2 * i) = (samples(i) & 0xff).toByte
      pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
    }
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt,
      (samples.length / channels).toLong), AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("audioHash64: half-volume and stereo copies are bit-identical, one-window edit near, different track far") {
    val base = track(5)
    val h = Multimodal.audioHash64 _
    def pcmOf(s: Array[Short]): Array[Byte] = {
      val b = new Array[Byte](s.length * 2)
      for (i <- s.indices) {
        b(2 * i) = (s(i) & 0xff).toByte; b(2 * i + 1) = ((s(i) >> 8) & 0xff).toByte
      }
      b
    }
    val a = h(pcmOf(base))
    // exact half volume: every |sample| halves exactly (even amplitudes),
    // so window means and the global mean scale together — no bit moves
    assert(h(pcmOf(base.map(s => (s / 2).toShort))) == a, "volume scaling moved the hash")
    // stereo duplication: interleaved identical channels, same contour
    assert(h(pcmOf(base.flatMap(s => Array(s, s)))) == a, "stereo twin moved the hash")
    val edited = h(pcmOf(track(5, editWindow = Some(31))))
    val hd = java.lang.Long.bitCount(a ^ edited)
    assert(hd >= 1 && hd <= 3, s"one-window edit moved $hd bits")
    assert(java.lang.Long.bitCount(a ^ h(pcmOf(track(9)))) > 10, "distinct track too close")
  }

  test("audioPairs: finds scaled/stereo/edited near-copies, rejects distinct tracks, excludes non-audio and non-16-bit; banded == quadratic") {
    import spark.implicits._
    val eightBit = { // 8-bit PCM: sniffs as WAV but must NOT pseudo-hash
      import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
      val fmt = new AudioFormat(8000f, 8, 1, false, false)
      val out = new java.io.ByteArrayOutputStream()
      AudioSystem.write(new AudioInputStream(
        new java.io.ByteArrayInputStream(Array.fill[Byte](800)(64)), fmt, 800L),
        AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    val assets = ((0 until 20).map(i => Asset(i.toLong, wav(track(i)), "audio/wav", "s")) ++
      Seq(Asset(100L, wav(track(0).map(s => (s / 2).toShort)), "audio/wav", "s"),
        Asset(101L, wav(track(0).flatMap(s => Array(s, s)), channels = 2), "audio/wav", "s"),
        Asset(102L, wav(track(0, editWindow = Some(31))), "audio/wav", "s"),
        Asset(103L, "not audio".getBytes("UTF-8"), "text/plain", "s"),
        Asset(104L, eightBit, "audio/wav", "s"))).toDS()
    val hashes = Multimodal.audioHashes(assets).cache()
    val byId = hashes.collect().map(x => x.asset_id -> x).toMap
    assert(!byId(103L).decoded && !byId(104L).decoded,
      "non-audio / non-16-bit must be undecodable, not pseudo-hashed")
    assert(byId(0L).decoded && byId(100L).decoded && byId(101L).decoded)

    val pairs = Multimodal.audioPairs(hashes, maxHamming = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    for (b <- Seq(100L, 101L, 102L))
      assert(pairs.exists { case (x, y, _) => x == 0L && y == b },
        s"near-copy pair (0,$b) missing from $pairs")
    assert(!pairs.exists { case (x, y, _) => x == 103L || y == 103L || x == 104L || y == 104L })

    val hs = hashes.collect().filter(_.decoded)
    val quad = (for {
      x <- hs; y <- hs if x.asset_id < y.asset_id
      hd = java.lang.Long.bitCount(x.ahash ^ y.ahash) if hd <= 4
    } yield (x.asset_id, y.asset_id, hd.toLong)).toSet
    assert(pairs == quad,
      s"missing=${(quad -- pairs).take(5)} extra=${(pairs -- quad).take(5)}")
  }
}

package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{Asset, StubDecoder}

/** Multimodal plumbing: schema, batch decode shape, stub determinism. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("stub decoder is deterministic and bounded") {
    val a = Asset(1L, "hello media bytes".getBytes(UTF_8), "application/octet-stream", "src")
    val f1 = StubDecoder.decode(a)
    val f2 = StubDecoder.decode(a)
    assert(f1 == f2)
    assert(f1.n_bytes == 17)
    assert(f1.width >= 64 && f1.width < 256)
    assert(f1.height >= 64 && f1.height < 256)
    assert(f1.n_frames >= 1 && f1.n_frames <= 8)
    assert(f1.frame_hashes.length == f1.n_frames)
  }

  test("content hash differs on a single-byte change") {
    val base = "media-payload".getBytes(UTF_8)
    val tweaked = base.clone(); tweaked(3) = (tweaked(3) ^ 1).toByte
    assert(StubDecoder.decode(Asset(1, base, "m", "s")).content_hash !=
      StubDecoder.decode(Asset(1, tweaked, "m", "s")).content_hash)
  }

  test("extractFeatures runs distributed over the documents-derived assets") {
    val ds = Multimodal.assets(spark, "/root/testdata/sf0.001")
    val out = Multimodal.extractFeatures(ds, targetPartitions = 4).collect()
    assert(out.length == 500)
    assert(out.map(_.asset_id).distinct.length == 500)
    // media bytes were the utf-8 text: n_bytes must equal byte length
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .selectExpr("doc_id", "octet_length(text) AS n").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    out.foreach(f => assert(f.n_bytes == docs(f.asset_id)))
  }

  test("resizing decoder clamps to maxDim preserving aspect; no-op under the bound") {
    val a = Asset(1L, "hello media bytes resize me".getBytes(UTF_8), "m", "s")
    val plain = StubDecoder.decode(a)
    val clamped = Multimodal.ResizingDecoder(StubDecoder, 32).decode(a)
    assert(math.max(clamped.width, clamped.height) == 32)
    // aspect preserved under integer arithmetic
    val m = math.max(plain.width, plain.height)
    assert(clamped.width == plain.width * 32 / m)
    assert(clamped.height == plain.height * 32 / m)
    val untouched = Multimodal.ResizingDecoder(StubDecoder, 10000).decode(a)
    assert(untouched == plain)
  }

  test("sampleFrames keeps every stride-th frame with its original index") {
    val ds = Multimodal.assets(spark, "/root/testdata/sf0.001")
    val features = Multimodal.extractFeatures(ds).cache()
    val all = features.collect().map(f => f.asset_id -> f.frame_hashes).toMap
    val sampled = Multimodal.sampleFrames(features, stride = 2).collect()
    sampled.foreach { s =>
      assert(s.frame_idx % 2 == 0)
      assert(all(s.asset_id)(s.frame_idx) == s.frame_hash)
    }
    val expectedCount = all.values.map(h => (h.length + 1) / 2).sum
    assert(sampled.length == expectedCount)
    features.unpersist()
  }

  test("ImageIoDecoder decodes a generated PNG and JPEG with exact dimensions (distributed)") {
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    def imageBytes(w: Int, h: Int, format: String): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, (x * 31 + y * 17) & 0xffffff)
      val out = new java.io.ByteArrayOutputStream()
      assert(ImageIO.write(img, format, out))
      out.toByteArray
    }
    val png = imageBytes(123, 45, "png")
    val jpg = imageBytes(64, 128, "jpg")
    val text = "not an image".getBytes(UTF_8)
    import spark.implicits._
    val ds = Seq(
      Asset(1L, png, "image/png", "s"),
      Asset(2L, jpg, "image/jpeg", "s"),
      Asset(3L, text, "text/plain", "s")).toDS()
    // through the real Spark mapPartitions path, decoder shipped to executors
    val out = Multimodal.extractFeatures(ds, decoder = Multimodal.ImageIoDecoder())
      .collect().map(f => f.asset_id -> f).toMap
    assert((out(1L).width, out(1L).height) == (123, 45), "exact PNG dimensions")
    assert((out(2L).width, out(2L).height) == (64, 128), "exact JPEG dimensions")
    assert(out(1L).n_frames == 1 && out(1L).frame_hashes.length == 1)
    // raster hash is a decode-equality fingerprint: identical pixels under
    // lossless PNG → re-encoding the same raster hashes identically
    val png2 = imageBytes(123, 45, "png")
    val again = Multimodal.ImageIoDecoder().decode(Asset(9L, png2, "image/png", "s"))
    assert(again.frame_hashes == out(1L).frame_hashes)
    // non-image payloads route to the stub fallback unchanged
    assert(out(3L) == StubDecoder.decode(Asset(3L, text, "text/plain", "s")))
  }

  test("ImageIoDecoder falls back on a corrupt image instead of failing the job") {
    val img = {
      val b = new java.awt.image.BufferedImage(10, 10, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(b, "png", out)
      out.toByteArray
    }
    val corrupt = img.take(20) // PNG magic intact, body truncated
    val a = Asset(7L, corrupt, "image/png", "s")
    assert(Multimodal.ImageIoDecoder().decode(a) == StubDecoder.decode(a))
  }

  test("WavDecoder parses a generated PCM WAV; decoders chain by magic bytes (distributed)") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    def wavBytes(seconds: Double, rate: Float = 8000f, channels: Int = 2): Array[Byte] = {
      val fmt = new AudioFormat(rate, 16, channels, true, false)
      val nFrames = (rate * seconds).toInt
      val pcm = Array.tabulate(nFrames * fmt.getFrameSize)(i => ((i * 37) & 0xff).toByte)
      val out = new java.io.ByteArrayOutputStream()
      AudioSystem.write(
        new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong),
        AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    val wav = wavBytes(1.5) // 1.5 s stereo 16-bit → 2 one-second windows
    val png = {
      val b = new java.awt.image.BufferedImage(20, 10, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(b, "png", out)
      out.toByteArray
    }
    val text = "neither".getBytes(UTF_8)
    import spark.implicits._
    val chain = Multimodal.WavDecoder(Multimodal.ImageIoDecoder())
    val ds = Seq(
      Asset(1L, wav, "audio/wav", "s"),
      Asset(2L, png, "image/png", "s"),
      Asset(3L, text, "text/plain", "s")).toDS()
    val out = Multimodal.extractFeatures(ds, decoder = chain)
      .collect().map(f => f.asset_id -> f).toMap
    // audio mapping: width=channels, height=bits/sample, frames=seconds
    assert((out(1L).width, out(1L).height, out(1L).n_frames) == (2, 16, 2), out(1L))
    assert(out(1L).frame_hashes.length == 2)
    assert(out(1L).frame_hashes.distinct.length == 2, "per-second windows hash distinctly")
    // the same chain still real-decodes images and stubs everything else
    assert((out(2L).width, out(2L).height) == (20, 10))
    assert(out(3L) == StubDecoder.decode(Asset(3L, text, "text/plain", "s")))
    // decode is deterministic
    assert(chain.decode(Asset(9L, wavBytes(1.5), "audio/wav", "s")).frame_hashes
      == out(1L).frame_hashes)
  }

  test("WavDecoder falls back on a corrupt WAV instead of failing the job") {
    val wav = {
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(new Array[Byte](1600)), fmt, 800L),
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    val corrupt = wav.take(16) // RIFF/WAVE magic intact, chunks truncated
    val a = Asset(7L, corrupt, "audio/wav", "s")
    assert(Multimodal.WavDecoder().decode(a) == StubDecoder.decode(a))
  }

  test("ResizingDecoder composes over the real codec (128x64 clamped to 64x32)") {
    val img = new java.awt.image.BufferedImage(128, 64, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val a = Asset(4L, out.toByteArray, "image/png", "s")
    val f = Multimodal.ResizingDecoder(Multimodal.ImageIoDecoder(), 64).decode(a)
    assert((f.width, f.height) == (64, 32))
  }

  test("feature query drops the wide binary column from its output") {
    val df = Multimodal.featureQuery(spark, "/root/testdata/sf0.001")
    assert(!df.columns.contains("media"))
    assert(df.count() == 500)
  }
}

package graft.multimodal

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: opaque `binary` media columns with typed
  * metadata, decoded/feature-extracted in batched executor-side passes —
  * the image/audio/video stages of a training-data pipeline.
  *
  * Spark-side design (the part that must be right at 100 TB):
  *  - media stays an opaque BinaryType column end-to-end; nothing ever
  *    materializes it on the driver;
  *  - decode runs via `Dataset.mapPartitions` (the Scala analog of
  *    `mapInPandas`): one decoder instance per partition, streaming over an
  *    iterator — the batch shape a native decoder (JNI/FFI or a Python
  *    worker) needs;
  *  - partitioning: media rows are large, so repartition by size budget
  *    before decode (partition ≈ maxPartitionBytes), never by row count;
  *  - output is a narrow typed feature row — the wide binary drops out of
  *    the plan right after decode, keeping downstream shuffles small.
  *
  * DECODERS: PNG/JPEG decode FOR REAL via [[ImageIoDecoder]] (JDK
  * `javax.imageio`, present on every executor). Audio/video codecs are not
  * in this container, so those modalities fall back to [[StubDecoder]]'s
  * deterministic pseudo-features (documented, unit-tested). The seam —
  * [[MediaDecoder]] — is where further codecs plug in without touching the
  * Spark plumbing.
  */
object Multimodal {

  /** A media asset: opaque payload + typed metadata. */
  final case class Asset(
      asset_id: Long,
      media: Array[Byte],
      mime: String,
      source: String)

  /** Extracted features (decoder output contract). */
  final case class MediaFeatures(
      asset_id: Long,
      n_bytes: Long,
      content_hash: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      frame_hashes: Seq[Long])

  /** Decoder seam: one instance per partition, called per asset. */
  trait MediaDecoder extends Serializable {
    def decode(a: Asset): MediaFeatures
  }

  /** Deterministic fake decode: FNV-1a over the payload for content hash,
    * "dimensions" and "frames" derived from byte positions. Replace with a
    * real codec behind the same trait. */
  object StubDecoder extends MediaDecoder {
    private val FnvOffset = 0xcbf29ce484222325L
    private val FnvPrime = 0x100000001b3L

    def fnv1a(bytes: Array[Byte], from: Int, until: Int): Long = {
      var h = FnvOffset
      var i = from
      while (i < until && i < bytes.length) {
        h = (h ^ (bytes(i) & 0xff)) * FnvPrime
        i += 1
      }
      h
    }

    override def decode(a: Asset): MediaFeatures = {
      val b = a.media
      val n = b.length
      val nFrames = 1 + (if (n == 0) 0 else (b(0) & 0xff) % 8)
      val frameSize = math.max(n / nFrames, 1)
      MediaFeatures(
        asset_id = a.asset_id,
        n_bytes = n.toLong,
        content_hash = fnv1a(b, 0, n),
        width = 64 + (if (n == 0) 0 else (b(0) & 0xff) % 192),
        height = 64 + (if (n < 2) 0 else (b(1) & 0xff) % 192),
        n_frames = nFrames,
        frame_hashes = (0 until nFrames).map(f => fnv1a(b, f * frameSize, (f + 1) * frameSize)))
    }
  }

  /** Real image codec for PNG/JPEG via the JDK's `javax.imageio`, behind
    * the same [[MediaDecoder]] seam (no extra dependency — ImageIO ships
    * with the JRE, so it is present on every executor).
    *
    *  - payloads sniffed as PNG (`\x89PNG`) or JPEG (`\xFF\xD8\xFF`)
    *    decode for real: exact pixel width/height, one frame whose hash is
    *    FNV-1a over the row-major ARGB raster (deterministic across JVMs —
    *    a decode-equality fingerprint, not a perceptual hash);
    *  - anything else — and any sniffed image whose decode fails — routes
    *    to `fallback` (default [[StubDecoder]]), so one corrupt asset
    *    degrades to pseudo-features instead of killing a 100 TB job (a
    *    production pipeline would fork a quarantine output here).
    *
    * ImageIO's disk-backed stream cache is disabled: decode must stay an
    * in-memory per-row operation on executors. */
  final case class ImageIoDecoder(fallback: MediaDecoder = StubDecoder) extends MediaDecoder {
    override def decode(a: Asset): MediaFeatures = {
      if (!sniffImage(a.media)) return fallback.decode(a)
      ImageIoDecoder.init // one-time JVM-global setting, not per-row
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(a.media))
        catch { case scala.util.control.NonFatal(_) => null }
      if (img == null) return fallback.decode(a)
      MediaFeatures(
        asset_id = a.asset_id,
        n_bytes = a.media.length.toLong,
        content_hash = StubDecoder.fnv1a(a.media, 0, a.media.length),
        width = img.getWidth,
        height = img.getHeight,
        n_frames = 1,
        frame_hashes = Seq(rasterHash(img)))
    }

    /** FNV-1a over the ARGB ints, row-major. */
    private def rasterHash(img: java.awt.image.BufferedImage): Long = {
      var h = 0xcbf29ce484222325L
      val prime = 0x100000001b3L
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          var p = img.getRGB(x, y)
          var i = 0
          while (i < 4) {
            h = (h ^ (p & 0xff)) * prime
            p >>>= 8
            i += 1
          }
          x += 1
        }
        y += 1
      }
      h
    }
  }

  object ImageIoDecoder {
    /** Disable ImageIO's disk-backed stream cache once per JVM (decode
      * must stay an in-memory per-row operation on executors). */
    private[multimodal] lazy val init: Unit =
      javax.imageio.ImageIO.setUseCache(false)
  }

  /** Real audio codec for PCM WAV via the JDK's `javax.sound.sampled`,
    * behind the same [[MediaDecoder]] seam (AudioSystem ships with the
    * JRE — present on every executor, no dependency).
    *
    * Audio mapping of the (image-shaped) [[MediaFeatures]] contract,
    * chosen so downstream stages stay modality-agnostic:
    *  - `width` = channel count, `height` = bits per sample;
    *  - `n_frames` = whole SECONDS of audio (ceiling) — the audio analog
    *    of video frame sampling, so [[sampleFrames]] composes unchanged;
    *  - `frame_hashes` = FNV-1a over each second's raw PCM bytes (a
    *    decode-equality fingerprint per window, like the image raster
    *    hash).
    *
    * Payloads that do not sniff as RIFF/WAVE — and any sniffed WAV whose
    * parse fails — route to `fallback`, so decoders CHAIN:
    * `WavDecoder(ImageIoDecoder(StubDecoder))` dispatches each asset to
    * its real codec by magic bytes and degrades per-asset, never failing
    * the job. */
  final case class WavDecoder(fallback: MediaDecoder = StubDecoder) extends MediaDecoder {
    override def decode(a: Asset): MediaFeatures = {
      if (!sniffWav(a.media)) return fallback.decode(a)
      val in =
        try javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(a.media))
        catch { case scala.util.control.NonFatal(_) => null }
      if (in == null) return fallback.decode(a)
      try {
        val fmt = in.getFormat
        // a crafted/corrupt fmt chunk can declare rate or frame size as 0
        // or AudioSystem.NOT_SPECIFIED (-1) — clamping that to 1 B/s would
        // emit one "second" hash per PCM byte; malformed formats fall back
        val bps = fmt.getFrameRate.toDouble * fmt.getFrameSize
        if (!(bps >= 1 && bps <= Int.MaxValue)) return fallback.decode(a)
        val pcm = in.readAllBytes()
        val bytesPerSec = bps.toInt
        val nSec = math.max(1, (pcm.length + bytesPerSec - 1) / bytesPerSec)
        MediaFeatures(
          asset_id = a.asset_id,
          n_bytes = a.media.length.toLong,
          content_hash = StubDecoder.fnv1a(a.media, 0, a.media.length),
          width = fmt.getChannels,
          height = fmt.getSampleSizeInBits,
          n_frames = nSec,
          frame_hashes = (0 until nSec).map(i =>
            StubDecoder.fnv1a(pcm, i * bytesPerSec, (i + 1) * bytesPerSec)))
      } catch {
        case scala.util.control.NonFatal(_) => fallback.decode(a)
      } finally in.close()
    }
  }

  /** Per-asset 64-bit perceptual hash row ([[perceptualHashes]]). */
  final case class PerceptualHash(asset_id: Long, phash: Long, decoded: Boolean)

  /** 64-bit average hash (aHash) of a decoded image — the standard
    * perceptual near-dup fingerprint for media dedup: downsample to an
    * 8×8 luma grid (area means over integer luma sums), one bit per cell
    * set when the cell mean exceeds the global mean. Robust to re-encode
    * and mild noise (a near-copy flips few cells), deterministic (the
    * only float op is two IEEE divides per cell on exact integer sums —
    * identical on every JVM). Cells with no pixels (images narrower than
    * 8) stay 0. */
  def aHash64(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth
    val h = img.getHeight
    val sums = new Array[Long](64)
    val cnts = new Array[Long](64)
    var y = 0
    while (y < h) {
      val cy = math.min(y * 8 / h, 7)
      var x = 0
      while (x < w) {
        val cx = math.min(x * 8 / w, 7)
        val p = img.getRGB(x, y)
        // integer ITU-R 601 luma, scaled ×1000 (299r + 587g + 114b)
        val luma = ((p >> 16) & 0xff) * 299L + ((p >> 8) & 0xff) * 587L + (p & 0xff) * 114L
        val c = cy * 8 + cx
        sums(c) += luma
        cnts(c) += 1
        x += 1
      }
      y += 1
    }
    var totalSum = 0L
    var totalCnt = 0L
    var i = 0
    while (i < 64) { totalSum += sums(i); totalCnt += cnts(i); i += 1 }
    val mean = totalSum.toDouble / totalCnt
    var bits = 0L
    var c = 0
    while (c < 64) {
      if (cnts(c) > 0 && sums(c).toDouble / cnts(c) > mean) bits |= 1L << c
      c += 1
    }
    bits
  }

  /** Perceptual hashes for an asset table: images (PNG/JPEG sniff, real
    * ImageIO decode) get their aHash; everything else — and failed
    * decodes — emits `decoded = false` so downstream dedup can exclude
    * it (a pseudo-hash over undecodable bytes would manufacture fake
    * near-dups). One decoder instance per partition, like
    * [[extractFeatures]]. */
  def perceptualHashes(assets: Dataset[Asset]): Dataset[PerceptualHash] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        val media = if (a.media == null) Array.emptyByteArray else a.media
        val img =
          if (!sniffImage(media)) null
          else {
            ImageIoDecoder.init
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(media))
            catch { case scala.util.control.NonFatal(_) => null }
          }
        if (img == null) PerceptualHash(a.asset_id, 0L, decoded = false)
        else PerceptualHash(a.asset_id, aHash64(img), decoded = true)
      }
    }
  }

  /** Image near-dup pairs (asset_a < asset_b, hamming ≤ maxHamming) over
    * the perceptual hashes — exact pigeonhole banding
    * ([[graft.operators.HammingBands]]): 64 bits split into
    * maxHamming + 1 bands, so banding is lossless at any threshold ≤ 63
    * (PerceptualDedupSpec pins banded ≡ quadratic). Undecodable assets
    * are excluded, not pseudo-hashed. Scale shape: candidates join on
    * (band, bits) with hot buckets split above `cap` — a corpus of
    * near-identical thumbnails stays bounded; note band width shrinks as
    * the threshold grows (64/(maxHamming+1) bits), so bucket selectivity
    * — and with it candidate volume — is the threshold's price. */
  def perceptualPairs(hashes: Dataset[PerceptualHash], maxHamming: Int = 2,
      cap: Int = 4096): DataFrame = {
    import hashes.sparkSession.implicits._
    graft.operators.HammingBands.pairs(
        hashes.filter(_.decoded).toDF()
          .select($"asset_id".as("id"), $"phash".as("fp")),
        graft.operators.HammingBands.offsetsFor(64, maxHamming + 1), maxHamming, cap)
      .select($"id_a".as("asset_a"), $"id_b".as("asset_b"), $"hamming")
  }

  /** Per-asset 64-bit audio fingerprint row ([[audioHashes]]). */
  final case class AudioHash(asset_id: Long, ahash: Long, decoded: Boolean)

  /** 64-bit energy-contour hash of 16-bit PCM — the audio analog of
    * [[aHash64]] for near-dup audio dedup: mean |amplitude| over 64
    * equal time windows, one bit per window set when its mean exceeds
    * the global mean. Amplitude-scale INVARIANT (a volume change scales
    * every window mean and the global mean together, so no bit moves —
    * pinned in PerceptualDedupSpec), robust to mild noise (a near-copy
    * flips few windows), fragile to trims (windows shift — the same
    * trade aHash makes for crops). Deterministic: integer |sample| sums;
    * the only float ops are the per-window and global mean divides on
    * exact integer sums. Interleaved channels fold into the same
    * contour (a stereo copy of a mono track matches). */
  def audioHash64(pcm: Array[Byte]): Long = {
    val n = pcm.length / 2
    if (n == 0) return 0L
    val sums = new Array[Long](64)
    val cnts = new Array[Long](64)
    var i = 0
    while (i < n) {
      // 16-bit little-endian signed sample
      val s = (((pcm(2 * i + 1) & 0xff) << 8) | (pcm(2 * i) & 0xff)).toShort
      val w = math.min(i.toLong * 64 / n, 63L).toInt
      sums(w) += math.abs(s.toLong)
      cnts(w) += 1
      i += 1
    }
    var totalSum = 0L
    var totalCnt = 0L
    var c = 0
    while (c < 64) { totalSum += sums(c); totalCnt += cnts(c); c += 1 }
    val mean = totalSum.toDouble / totalCnt
    var bits = 0L
    c = 0
    while (c < 64) {
      if (cnts(c) > 0 && sums(c).toDouble / cnts(c) > mean) bits |= 1L << c
      c += 1
    }
    bits
  }

  /** Audio fingerprints for an asset table: 16-bit signed little-endian
    * PCM WAVs (RIFF sniff + real AudioSystem decode) get their energy
    * contour; everything else — other sample widths, failed parses,
    * non-audio — emits `decoded = false` so dedup can exclude it rather
    * than manufacture fake near-dups from a wrong-width read
    * ([[perceptualHashes]] doctrine). One decode per asset per
    * partition; the wide binary never crosses a stage boundary. */
  def audioHashes(assets: Dataset[Asset]): Dataset[AudioHash] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        val media = if (a.media == null) Array.emptyByteArray else a.media
        val pcm: Array[Byte] =
          if (!sniffWav(media)) null
          else {
            val in =
              try javax.sound.sampled.AudioSystem.getAudioInputStream(
                new java.io.ByteArrayInputStream(media))
              catch { case scala.util.control.NonFatal(_) => null }
            if (in == null) null
            else try {
              val fmt = in.getFormat
              if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
                fmt.getSampleSizeInBits != 16 || fmt.isBigEndian) null
              else in.readAllBytes()
            } catch {
              case scala.util.control.NonFatal(_) => null
            } finally in.close()
          }
        if (pcm == null || pcm.length < 2) AudioHash(a.asset_id, 0L, decoded = false)
        else AudioHash(a.asset_id, audioHash64(pcm), decoded = true)
      }
    }
  }

  /** Audio near-dup pairs over the energy contours — the same exact
    * pigeonhole banding as [[perceptualPairs]] (banded ≡ quadratic at
    * any threshold, hot buckets split), so the 100 TB shape is
    * identical: candidates join on (band, bits), never all-pairs. */
  def audioPairs(hashes: Dataset[AudioHash], maxHamming: Int = 4,
      cap: Int = 4096): DataFrame = {
    import hashes.sparkSession.implicits._
    graft.operators.HammingBands.pairs(
        hashes.filter(_.decoded).toDF()
          .select($"asset_id".as("id"), $"ahash".as("fp")),
        graft.operators.HammingBands.offsetsFor(64, maxHamming + 1), maxHamming, cap)
      .select($"id_a".as("asset_a"), $"id_b".as("asset_b"), $"hamming")
  }

  /** RIFF/WAVE magic-byte sniff (shared by [[WavDecoder]] and
    * [[audioHashes]]). */
  private[multimodal] def sniffWav(b: Array[Byte]): Boolean =
    b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  /** PNG/JPEG magic-byte sniff (shared by [[ImageIoDecoder]] and
    * [[perceptualHashes]]). */
  private[multimodal] def sniffImage(b: Array[Byte]): Boolean =
    (b.length >= 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||
      (b.length >= 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 && (b(2) & 0xff) == 0xff)

  /** Synthesize an asset table from the `documents` table (the driver data
    * has no binary column; the media payload is the UTF-8 bytes — opaque to
    * everything downstream, exactly like a real jpeg would be). */
  def assets(spark: SparkSession, sfDir: String): Dataset[Asset] = {
    import spark.implicits._
    graft.Tables.load(spark, sfDir, "documents")
      .select($"doc_id".as("asset_id"),
        encode($"text", "UTF-8").as("media"),
        lit("application/octet-stream").as("mime"),
        $"source")
      .as[Asset]
  }

  /** Resize stage: wraps a decoder and clamps output dimensions to
    * `maxDim`, preserving aspect ratio (integer arithmetic). The stub for
    * the real resample kernel — the Spark-side contract (a decoder
    * decorator, composing inside the same mapPartitions pass with no extra
    * shuffle or materialization) is what carries to production. */
  final case class ResizingDecoder(inner: MediaDecoder, maxDim: Int) extends MediaDecoder {
    override def decode(a: Asset): MediaFeatures = {
      val f = inner.decode(a)
      val m = math.max(f.width, f.height)
      if (m <= maxDim) f
      else f.copy( // floor to >= 1: extreme aspect ratios must not emit a 0 dimension
        width = math.max(f.width * maxDim / m, 1),
        height = math.max(f.height * maxDim / m, 1))
    }
  }

  /** One sampled frame of a decoded asset. */
  final case class FrameSample(asset_id: Long, frame_idx: Int, frame_hash: Long)

  /** Frame-sampling stage: keep every `stride`-th frame of each asset —
    * the video-pipeline subsample that bounds downstream work per asset.
    * Runs as a narrow explode over the already-narrow feature rows (the
    * wide binary is long gone from the plan by this point). */
  def sampleFrames(features: Dataset[MediaFeatures], stride: Int): Dataset[FrameSample] = {
    import features.sparkSession.implicits._
    require(stride >= 1, s"stride must be >= 1: $stride")
    features.flatMap { f =>
      f.frame_hashes.zipWithIndex.collect {
        case (h, i) if i % stride == 0 => FrameSample(f.asset_id, i, h)
      }
    }
  }

  /** The decode stage: batched, executor-side, decoder per partition. */
  def extractFeatures(assets: Dataset[Asset],
      decoder: MediaDecoder = StubDecoder,
      targetPartitions: Int = 0): Dataset[MediaFeatures] = {
    import assets.sparkSession.implicits._
    val sized = if (targetPartitions > 0) assets.repartition(targetPartitions) else assets
    // a NULL media column (missing asset in a dirty crawl) must degrade
    // like a corrupt one — empty bytes route every decoder to its
    // fallback/stub path instead of NPEing the whole job
    sized.mapPartitions { it =>
      it.map(a => decoder.decode(
        if (a.media == null) a.copy(media = Array.emptyByteArray) else a))
    }
  }

  /** Feature extraction as a registered query (rows-only check: the decode
    * is not SQL-expressible by design). Runs the REAL codec path: PNG/JPEG
    * payloads decode via [[ImageIoDecoder]]; the synthetic corpus' text
    * bytes route to the stub fallback, so the query exercises sniff +
    * dispatch on every row and full decode on any real image. */
  def featureQuery(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    extractFeatures(assets(spark, sfDir), decoder = ImageIoDecoder())
      .toDF()
      .select($"asset_id", $"n_bytes", $"content_hash", $"width", $"height",
        $"n_frames", size($"frame_hashes").cast("long").as("n_frame_hashes"))
  }
}

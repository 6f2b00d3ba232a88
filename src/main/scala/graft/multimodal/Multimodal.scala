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
  * DECODER IS A STUB: the container has no image/audio codecs, so
  * [[StubDecoder]] derives deterministic pseudo-features from the bytes
  * (documented, unit-tested). The seam — [[MediaDecoder]] — is where a real
  * decoder plugs in without touching the Spark plumbing.
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
    sized.mapPartitions { it => it.map(decoder.decode) }
  }

  /** Feature extraction as a registered query (rows-only check: the decode
    * is not SQL-expressible by design — it stands in for a codec). */
  def featureQuery(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    extractFeatures(assets(spark, sfDir))
      .toDF()
      .select($"asset_id", $"n_bytes", $"content_hash", $"width", $"height",
        $"n_frames", size($"frame_hashes").cast("long").as("n_frame_hashes"))
  }
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.QueryModule
import graft.multimodal.Multimodal

/** Multimodal queries over opaque binary payloads.
  *
  *  - mm_features: decode / feature-extract over binary media (stubbed
  *    codec behind `Multimodal.MediaDecoder`). No oracle: the decode stage
  *    is not SQL-expressible — the driver records the weaker rows-only
  *    check; ScalaTest pins the stub's output (MultimodalSpec).
  *  - mm_meta: the metadata stage that IS oracle-checkable — byte length,
  *    magic-byte sniff (head hex), content digest, and fixed-size chunk
  *    count over the opaque `binary` column. At 100 TB this is the narrow
  *    shuffle-free projection that routes media rows to per-type decode
  *    pipelines (the binary stays unparsed; only 8 head bytes + a digest
  *    leave the scan).
  */
object MultimodalQueries extends QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_features" -> { (s, dir) => Multimodal.featureQuery(s, dir) },

    "mm_meta" -> { (s, dir) =>
      import org.apache.spark.sql.functions._
      import s.implicits._
      graft.Tables.load(s, dir, "documents")
        .select($"doc_id", encode($"text", "UTF-8").as("data"))
        .select($"doc_id",
          length($"data").cast("long").as("n_bytes"),
          hex(substring($"data", 1, 8)).as("magic_hex"),
          md5($"data").as("digest"),
          ceil(length($"data") / 256.0).cast("long").as("n_chunks"))
    },

    // Frame-sampling plan over the opaque binary (every 2nd frame): the
    // StubDecoder's frame geometry — n_frames = 1 + (byte0 % 8),
    // frame_size = max(n_bytes / n_frames, 1) — computed columnar and
    // exploded into (frame_idx, offset, length) rows. This is the part of
    // frame sampling a SQL oracle CAN check (the byte-offset plan); the
    // hash-per-frame stage is Multimodal.sampleFrames (MultimodalSpec).
    "mm_frame_plan" -> { (s, dir) =>
      import org.apache.spark.sql.functions._
      import s.implicits._
      graft.Tables.load(s, dir, "documents")
        .select($"doc_id", encode($"text", "UTF-8").as("data"))
        .select($"doc_id",
          length($"data").cast("long").as("n_bytes"),
          // empty payload → no byte 0 → one (empty) frame, matching
          // StubDecoder; without the coalesce the null n_frames would
          // silently drop the row while the oracle errors on CAST('0x')
          (lit(1) + coalesce(conv(hex(substring($"data", 1, 1)), 16, 10).cast("int"), lit(0)) % 8)
            .as("n_frames"))
        .withColumn("frame_size",
          greatest(($"n_bytes" / $"n_frames").cast("long"), lit(1L)))
        .select($"doc_id", $"n_bytes", $"n_frames", $"frame_size",
          explode(expr("sequence(0, n_frames - 1, 2)")).as("frame_idx"))
        .withColumn("frame_off", $"frame_idx" * $"frame_size")
        .withColumn("frame_len",
          least($"frame_size", greatest($"n_bytes" - $"frame_off", lit(0L))))
        .select($"doc_id", $"frame_idx".cast("long").as("frame_idx"),
          $"frame_off", $"frame_len")
    }
  )

  // DuckDB 1.0 can't slice or md5 BLOBs directly: the magic bytes come from
  // substr over hex(blob) (same bytes, hex-space slice) and the digest from
  // md5(text) (identical to Spark's md5 over the UTF-8 binary).
  def oracles: Map[String, String] = Map(
    // The full stub-decode contract, previously rows-only: every payload
    // here is text bytes (no PNG/JPEG magic), so ImageIoDecoder routes to
    // StubDecoder and the features are pure byte arithmetic — and FNV-1a
    // is a sequential integer fold DuckDB can run exactly (list_reduce
    // with HUGEINT intermediates for the wrapping 64-bit multiply). Byte
    // values come from ascii(); the corpus is ASCII (length ==
    // octet_length for every doc at every SF — checked, and the length
    // guard below makes a future non-ASCII doc fail loudly as a row-count
    // mismatch rather than silently hash-diverge).
    "mm_features" -> {
      val fnv =
        """list_reduce(
          |    list_prepend(CAST(14695981039346656037 AS UBIGINT),
          |      list_transform(range(1, length(t)+1),
          |        i -> CAST(ascii(substr(t, CAST(i AS INT), 1)) AS UBIGINT))),
          |    (acc, x) -> CAST(CAST((CAST(xor(acc, x) AS HUGEINT) * 1099511628211)
          |      % 18446744073709551616 AS UBIGINT) AS UBIGINT))""".stripMargin
      s"""WITH d AS (SELECT doc_id AS asset_id, text AS t FROM documents
         |           WHERE length(text) = octet_length(encode(text))),
         |b AS (SELECT asset_id, t, CAST(length(t) AS BIGINT) AS n_bytes,
         |        CASE WHEN length(t) >= 1 THEN ascii(substr(t, 1, 1)) ELSE 0 END AS b0,
         |        CASE WHEN length(t) >= 2 THEN ascii(substr(t, 2, 1)) ELSE 0 END AS b1,
         |        $fnv AS h
         |      FROM d)
         |SELECT asset_id, n_bytes,
         |  CAST(CASE WHEN h > CAST(9223372036854775807 AS UBIGINT)
         |    THEN CAST(h AS HUGEINT) - 18446744073709551616
         |    ELSE CAST(h AS HUGEINT) END AS BIGINT) AS content_hash,
         |  64 + (CASE WHEN n_bytes >= 1 THEN b0 % 192 ELSE 0 END) AS width,
         |  64 + (CASE WHEN n_bytes >= 2 THEN b1 % 192 ELSE 0 END) AS height,
         |  1 + (CASE WHEN n_bytes >= 1 THEN b0 % 8 ELSE 0 END) AS n_frames,
         |  CAST(1 + (CASE WHEN n_bytes >= 1 THEN b0 % 8 ELSE 0 END) AS BIGINT) AS n_frame_hashes
         |FROM b""".stripMargin
    },

    "mm_meta" ->
      """SELECT doc_id,
        |  octet_length(encode(text)) AS n_bytes,
        |  substr(hex(encode(text)), 1, 16) AS magic_hex,
        |  md5(text) AS digest,
        |  CAST(ceil(octet_length(encode(text)) / 256.0) AS BIGINT) AS n_chunks
        |FROM documents""".stripMargin,

    "mm_frame_plan" ->
      """WITH geo AS (
        |  SELECT doc_id,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |    CASE WHEN octet_length(encode(text)) = 0 THEN 1
        |         ELSE 1 + CAST(CAST('0x' || substr(hex(encode(text)), 1, 2) AS UBIGINT) AS INT) % 8
        |    END AS n_frames
        |  FROM documents),
        |sized AS (
        |  SELECT doc_id, n_bytes, n_frames,
        |    greatest(n_bytes // n_frames, 1) AS frame_size
        |  FROM geo),
        |frames AS (
        |  SELECT doc_id, n_bytes, frame_size,
        |    unnest(range(0, n_frames, 2)) AS frame_idx
        |  FROM sized)
        |SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
        |  frame_idx * frame_size AS frame_off,
        |  least(frame_size, greatest(n_bytes - frame_idx * frame_size, 0)) AS frame_len
        |FROM frames""".stripMargin
  )
}

package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.avro.Schema
import org.apache.avro.generic.GenericData
import org.scalatest.funsuite.AnyFunSuite

import graft.codec._

/** Codec golden-bytes + property tests (SURVEY §5 categories 3/10).
  * Fixture values follow FIXTURES.md §§3-6. Property loops are seeded
  * (deterministic CI) in lieu of a scalatestplus bridge. */
class CodecSpec extends AnyFunSuite {
  /** Seeded property loop. */
  private def forAllSeeded(n: Int = 200)(body: scala.util.Random => Unit): Unit = {
    val rnd = new scala.util.Random(42)
    (1 to n).foreach(_ => body(rnd))
  }

  // --- LsnCodec (T12): "%X/%X" of hi/lo 32 bits, LsnUpdater.java:321-323 ---

  test("lsn format golden") {
    assert(LsnCodec.format(0x17L) == "0/17")
    assert(LsnCodec.format((0x16L << 32) | 0xB374D848L) == "16/B374D848")
    assert(LsnCodec.format(0L) == "0/0")
  }

  test("lsn parse inverts format") {
    forAllSeeded() { rnd =>
      val l = rnd.nextLong() & Long.MaxValue
      assert(LsnCodec.parse(LsnCodec.format(l)) == l)
    }
  }

  test("lsn malformed rejects") {
    intercept[IllegalArgumentException](LsnCodec.parse("deadbeef"))
  }

  test("lsn halves beyond 32 bits reject (would silently fold into a wrong position)") {
    intercept[IllegalArgumentException](LsnCodec.parse("1FFFFFFFF/0"))
    intercept[IllegalArgumentException](LsnCodec.parse("0/1FFFFFFFF"))
    // boundary values still round-trip
    assert(LsnCodec.parse("FFFFFFFF/FFFFFFFF") == -1L)
  }

  // --- Cursor (T11): "<lsn>:<id>", strict parse, EventReplicatorWorker.java:262-297 ---

  test("cursor encode golden") {
    assert(Cursor(23, 45).encoded == "23:45")
    assert(Cursor.zero.encoded == "0:0")
  }

  test("cursor roundtrip") {
    forAllSeeded() { rnd =>
      val (l, i) = (rnd.nextLong() & Long.MaxValue, rnd.nextLong() & Long.MaxValue)
      assert(Cursor.parse(Cursor(l, i).encoded) == Cursor(l, i))
    }
  }

  test("cursor malformed fails with IllegalStateException") {
    intercept[IllegalStateException](Cursor.parse("42"))       // no colon
    intercept[IllegalStateException](Cursor.parse("a:b"))      // not numeric
    intercept[IllegalStateException](Cursor.parse("1:2:3"))    // extra part
  }

  // --- MetadataCodec (T3/T4): canonical sorted Avro map, MetadataSerializer.java ---

  private val fixtureMeta = Map(
    "dTest" -> "meta_value".getBytes(UTF_8),
    "zTest" -> "123e4567-e89b-12d3-a456-426614174000".getBytes(UTF_8),
    "bTest" -> "42".getBytes(UTF_8))

  test("metadata canonical bytes are key-sorted and insertion-order independent") {
    val a = MetadataCodec.encode(fixtureMeta)
    val b = MetadataCodec.encode(
      Map("zTest" -> fixtureMeta("zTest"), "bTest" -> fixtureMeta("bTest"),
        "dTest" -> fixtureMeta("dTest")))
    assert(a.sameElements(b), "canonical form must not depend on insertion order")
  }

  test("metadata golden bytes: single-entry map") {
    // Avro map<bytes>: block count 1 (zigzag 0x02), key len 1 ('k'),
    // value len 2, bytes, end block 0x00.
    val bytes = MetadataCodec.encode(Map("k" -> Array[Byte](7, 9)))
    assert(bytes.sameElements(Array[Byte](0x02, 0x02, 'k'.toByte, 0x04, 7, 9, 0x00)))
  }

  test("metadata decode returns key-sorted map") {
    val decoded = MetadataCodec.decode(MetadataCodec.encode(fixtureMeta))
    assert(decoded.keys.toSeq == Seq("bTest", "dTest", "zTest"))
    fixtureMeta.foreach { case (k, v) => assert(decoded(k).sameElements(v)) }
  }

  test("metadata roundtrip property") {
    forAllSeeded(100) { rnd =>
      val m = (0 until rnd.nextInt(8)).map { _ =>
        val k = rnd.alphanumeric.take(1 + rnd.nextInt(12)).mkString
        val v = new Array[Byte](rnd.nextInt(32)); rnd.nextBytes(v)
        k -> v
      }.toMap
      val decoded = MetadataCodec.decode(MetadataCodec.encode(m))
      assert(decoded.keys.toSeq == m.keys.toSeq.sorted)
      m.foreach { case (k, v) => assert(decoded(k).sameElements(v)) }
    }
  }

  test("empty metadata encodes to avro empty map (single zero block)") {
    assert(MetadataCodec.encode(Map.empty).sameElements(Array[Byte](0x00)))
    assert(MetadataCodec.decode(Array[Byte](0x00)).isEmpty)
    assert(MetadataCodec.decode(null).isEmpty)
  }

  // --- ConfluentAvro (T1/T2): 5-byte frame + body, FIXTURES.md §3 ---

  private val payloadSchema = new Schema.Parser().parse(
    """{"type":"record","name":"TestPayload","namespace":"graft.test",
      |"fields":[{"name":"text","type":"string"}]}""".stripMargin)

  test("frame layout golden: magic 0x00 + big-endian id") {
    val framed = ConfluentAvro.frame(0x01020304, Array[Byte](9))
    assert(framed.take(5).sameElements(Array[Byte](0x00, 0x01, 0x02, 0x03, 0x04)))
    assert(framed(5) == 9)
    assert(ConfluentAvro.schemaId(framed) == 0x01020304)
  }

  test("unframe rejects non-confluent payloads") {
    intercept[IllegalArgumentException](ConfluentAvro.unframe(Array[Byte](1, 2, 3, 4, 5, 6)))
    intercept[IllegalArgumentException](ConfluentAvro.unframe(Array[Byte](0)))
  }

  test("serialize/deserialize roundtrip via catalog (id resolves schema)") {
    val rec = new GenericData.Record(payloadSchema)
    rec.put("text", "test payload 1")
    val catalog = SchemaCatalog(7 -> payloadSchema)
    val bytes = ConfluentAvro.serialize(7, rec)
    val back = ConfluentAvro.deserialize(bytes, catalog)
    assert(back.get("text").toString == "test payload 1")
    assert(ConfluentAvro.schemaId(bytes) == 7)
  }

  test("catalog rejects unknown ids and names") {
    intercept[IllegalArgumentException](SchemaCatalog.empty.schemaById(1))
    intercept[IllegalArgumentException](SchemaCatalog.empty.idFor("nope.Missing"))
  }

  test("catalog loads <id>_<name>.avsc files from a directory") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cat-")
    java.nio.file.Files.writeString(dir.resolve("7_TestPayload.avsc"),
      payloadSchema.toString)
    java.nio.file.Files.writeString(dir.resolve("ignore.txt"), "not a schema")
    val cat = SchemaCatalog.fromDir(dir)
    assert(cat.ids == Set(7))
    assert(cat.schemaById(7).getFullName == "graft.test.TestPayload")
    assert(cat.idFor("graft.test.TestPayload") == 7)
  }

  test("RegistryConformance skips cleanly when no registry is configured") {
    // the PgConformance/KafkaConformance discipline: env-gated, safe to
    // wire into any CI — without SCHEMA_REGISTRY_URL it prints a skip
    // notice and exits normally
    assert(!sys.env.contains(graft.tools.RegistryConformance.UrlEnv),
      "test environment unexpectedly configures a schema registry")
    graft.tools.RegistryConformance.main(Array.empty) // must not throw
  }
}

package graft.codec

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}

/** Confluent wire framing + Avro body serde.
  *
  * Wire format (what the reference's `KafkaAvroSerializer` produces, see
  * /root/reference tech.kage.event.postgres/.../PostgresEventStoreAutoConfiguration.java:56,69-103
  * and FIXTURES.md §3): `0x00` magic byte ‖ 4-byte big-endian schema id ‖
  * Avro binary body. Spark has no built-in for the frame, so the codec is
  * ours; the body uses plain `org.apache.avro`.
  */
object ConfluentAvro {
  val MagicByte: Byte = 0x0
  val FrameLength: Int = 5

  def frame(schemaId: Int, body: Array[Byte]): Array[Byte] = {
    val out = ByteBuffer.allocate(FrameLength + body.length)
    out.put(MagicByte).putInt(schemaId).put(body)
    out.array()
  }

  /** @return (schemaId, body); fails fast on a non-Confluent frame, mirroring
    *         the reference's SerializationException behavior. */
  def unframe(data: Array[Byte]): (Int, Array[Byte]) = {
    require(data.length >= FrameLength && data(0) == MagicByte,
      s"not a Confluent-framed payload (len=${data.length})")
    val bb = ByteBuffer.wrap(data, 1, 4)
    (bb.getInt, java.util.Arrays.copyOfRange(data, FrameLength, data.length))
  }

  def schemaId(data: Array[Byte]): Int = unframe(data)._1

  /** Avro-binary encode a GenericRecord (no frame). */
  def encodeBody(record: GenericRecord): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val enc = EncoderFactory.get().binaryEncoder(out, null)
    new GenericDatumWriter[GenericRecord](record.getSchema).write(record, enc)
    enc.flush()
    out.toByteArray
  }

  def decodeBody(body: Array[Byte], writerSchema: Schema): GenericRecord = {
    val dec = DecoderFactory.get().binaryDecoder(body, null)
    new GenericDatumReader[GenericRecord](writerSchema).read(null, dec)
  }

  /** Full T1: record → framed bytes. */
  def serialize(schemaId: Int, record: GenericRecord): Array[Byte] =
    frame(schemaId, encodeBody(record))

  /** Full T2: framed bytes → record, resolving the writer schema by the
    * embedded id (RecordNameStrategy means schema-per-record-type, so the id
    * — not the topic — identifies the schema; SURVEY §7.4 #5). */
  def deserialize(data: Array[Byte], catalog: SchemaCatalog): GenericRecord = {
    val (id, body) = unframe(data)
    decodeBody(body, catalog.schemaById(id))
  }
}

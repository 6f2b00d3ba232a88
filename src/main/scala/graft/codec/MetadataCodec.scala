package graft.codec

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer

import scala.collection.immutable.TreeMap
import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.avro.util.Utf8

/** Canonical metadata serde: Avro `map<string,bytes>` with entries sorted by
  * key before encoding, so the same logical map always yields the same bytes.
  *
  * Mirrors /root/reference tech.kage.event.crypto/.../MetadataSerializer.java:
  * TreeMap sort (:56, :75-91), sorted map on decode (:100-113). Determinism
  * is load-bearing — the encoded bytes are part of the AEAD associated data
  * (SURVEY §2.4 op E1/E2), so any byte wobble breaks decryption.
  */
object MetadataCodec {
  private val schema: Schema = Schema.createMap(Schema.create(Schema.Type.BYTES))

  /** Encode sorted-by-key; empty map encodes to Avro's empty map (a single
    * zero block count). The reference stores NULL for empty metadata — the
    * storage layer handles that mapping, not the codec. */
  def encode(metadata: Map[String, Array[Byte]]): Array[Byte] = {
    val sorted = new java.util.TreeMap[String, ByteBuffer]()
    metadata.foreach { case (k, v) => sorted.put(k, ByteBuffer.wrap(v)) }
    val out = new ByteArrayOutputStream()
    val enc = EncoderFactory.get().binaryEncoder(out, null)
    new GenericDatumWriter[java.util.Map[String, ByteBuffer]](schema).write(sorted, enc)
    enc.flush()
    out.toByteArray
  }

  /** Decode to a key-sorted map (SequencedMap analog, MetadataSerializer.java:100-113). */
  def decode(bytes: Array[Byte]): TreeMap[String, Array[Byte]] = {
    if (bytes == null || bytes.isEmpty) return TreeMap.empty
    val dec = DecoderFactory.get().binaryDecoder(bytes, null)
    val raw = new GenericDatumReader[java.util.Map[Utf8, ByteBuffer]](schema).read(null, dec)
    TreeMap.from(raw.asScala.map { case (k, v) =>
      val arr = new Array[Byte](v.remaining())
      v.duplicate().get(arr)
      k.toString -> arr
    })
  }
}

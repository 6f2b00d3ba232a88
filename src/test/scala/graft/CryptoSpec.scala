package graft

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8
import java.security.GeneralSecurityException

import org.scalatest.funsuite.AnyFunSuite

import graft.codec.MetadataCodec
import graft.crypto.{AesGcmAead, EventEncryptor, InMemoryKms}

/** AEAD semantics (SURVEY §2.4; EventEncryptorIT.java:88-240 analogs). */
class CryptoSpec extends AnyFunSuite {
  private val enc = new EventEncryptor(new InMemoryKms)
  private val key = "event-key".getBytes(UTF_8)
  private val payload = "secret payload".getBytes(UTF_8)
  private val ts = 1709287200123L
  private val meta = Map("dTest" -> "meta_value".getBytes(UTF_8), "bTest" -> "42".getBytes(UTF_8))
  private val uri = "test-kms://test-keys/k1"

  test("encrypt/decrypt roundtrip with metadata-bound AD") {
    val ct = enc.encrypt(payload, key, ts, meta, uri)
    assert(!ct.sameElements(payload))
    val pt = enc.decrypt(ct, key, ts, enc.withKeyId(meta, uri))
    assert(pt.sameElements(payload))
  }

  test("decrypt without kid returns payload as-is (F5, EventEncryptor.java:122-124)") {
    assert(enc.decrypt(payload, key, ts, meta).sameElements(payload))
    assert(enc.decrypt(payload, key, ts, Map.empty).sameElements(payload))
  }

  test("wrong key URI fails: decryption failed (EncryptedPostgresEventStoreIT.java:188-228)") {
    val ct = enc.encrypt(payload, key, ts, meta, uri)
    val wrongKid = enc.withKeyId(meta, "test-kms://test-keys/other")
    intercept[GeneralSecurityException](enc.decrypt(ct, key, ts, wrongKid))
  }

  test("tampered metadata breaks the AD binding") {
    val ct = enc.encrypt(payload, key, ts, meta, uri)
    val tampered = enc.withKeyId(meta + ("dTest" -> "evil".getBytes(UTF_8)), uri)
    intercept[GeneralSecurityException](enc.decrypt(ct, key, ts, tampered))
  }

  test("tampered timestamp or event key breaks the AD binding") {
    val ct = enc.encrypt(payload, key, ts, meta, uri)
    intercept[GeneralSecurityException](
      enc.decrypt(ct, key, ts + 1, enc.withKeyId(meta, uri)))
    intercept[GeneralSecurityException](
      enc.decrypt(ct, "other-key".getBytes(UTF_8), ts, enc.withKeyId(meta, uri)))
  }

  test("id and kid excluded from decrypt AD (ignoresSourceIdDuringDecryption)") {
    val ct = enc.encrypt(payload, key, ts, meta, uri)
    // storage/transport adds id + kid; decryption must still succeed
    val stored = enc.withKeyId(meta, uri) + ("id" -> "12345".getBytes(UTF_8))
    assert(enc.decrypt(ct, key, ts, stored).sameElements(payload))
  }

  test("empty metadata contributes zero AD bytes, not avro empty map") {
    val ad = enc.associatedData(key, ts, Map.empty)
    assert(ad.length == key.length + 8)
    val adMeta = enc.associatedData(key, ts, meta)
    assert(adMeta.length == key.length + 8 + MetadataCodec.encode(meta).length)
    // layout: key ‖ 8B big-endian millis ‖ canonical metadata
    assert(ad.take(key.length).sameElements(key))
    assert(ByteBuffer.wrap(ad, key.length, 8).getLong == ts)
  }

  test("AD uses canonical (sorted) metadata bytes — insertion order irrelevant") {
    val reversed = Map("bTest" -> "42".getBytes(UTF_8), "dTest" -> "meta_value".getBytes(UTF_8))
    assert(enc.associatedData(key, ts, meta).sameElements(enc.associatedData(key, ts, reversed)))
  }

  test("wire shape: 12-byte IV prefix, 16-byte tag (Tink AES_GCM layout)") {
    val ct = enc.encrypt(payload, key, ts, Map.empty, uri)
    assert(ct.length == 12 + payload.length + 16)
  }

  test("AesGcmAead rejects short/garbage ciphertext as decryption failed") {
    val a = new AesGcmAead(new Array[Byte](32))
    intercept[GeneralSecurityException](a.decrypt(Array[Byte](1, 2, 3), Array.emptyByteArray))
    val garbage = new Array[Byte](64)
    intercept[GeneralSecurityException](a.decrypt(garbage, Array.emptyByteArray))
  }
}

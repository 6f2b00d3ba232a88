package graft

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8
import java.security.GeneralSecurityException

import org.scalatest.funsuite.AnyFunSuite

import graft.codec.MetadataCodec
import graft.crypto.{AesGcmAead, EventEncryptor, InMemoryKms, JsonKeysetKmsClient, KmsClient, KmsKeyProvider, TinkKeyset, TinkKeysetAead}

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

  // ---- Tink keyset / KMS resolution (reference deployment crypto) ----

  private def rawKey(seed: Int): Array[Byte] =
    Array.tabulate[Byte](32)(i => (seed * 31 + i).toByte)

  private def keyset(primary: Long, entries: (Long, Int, String)*): TinkKeyset.Keyset =
    TinkKeyset.Keyset(primary, entries.map { case (id, seed, prefix) =>
      TinkKeyset.KeysetKey(id, rawKey(seed), prefix, "ENABLED")
    })

  test("JDK AEAD interops with Tink's own AesGcmJce in both directions") {
    // the real Tink primitive (subtle layer — resolvable without protobuf)
    // is the ground truth for the raw iv‖ct‖tag frame
    val k = rawKey(7)
    val tink = new com.google.crypto.tink.subtle.AesGcmJce(k)
    val jdk = new AesGcmAead(k)
    val ad = "associated".getBytes(UTF_8)
    assert(jdk.decrypt(tink.encrypt(payload, ad), ad).sameElements(payload))
    assert(tink.decrypt(jdk.encrypt(payload, ad), ad).sameElements(payload))
    intercept[GeneralSecurityException](
      jdk.decrypt(tink.encrypt(payload, ad), "other".getBytes(UTF_8)))
  }

  test("keyset JSON round-trips through the AesGcmKey proto (parse ∘ render = id)") {
    val ks = keyset(42L, (42L, 1, "TINK"), (7L, 2, "RAW"))
    val parsed = TinkKeyset.parseJson(TinkKeyset.toJson(ks))
    assert(parsed.primaryKeyId == 42L)
    assert(parsed.keys.map(_.keyId) == Seq(42L, 7L))
    assert(parsed.keys.map(_.outputPrefixType) == Seq("TINK", "RAW"))
    assert(parsed.keys(0).keyBytes.sameElements(rawKey(1)))
    assert(parsed.keys(1).keyBytes.sameElements(rawKey(2)))
    // non-AES-GCM material fails fast instead of being skipped
    val foreign = TinkKeyset.toJson(ks)
      .replace(TinkKeyset.AesGcmTypeUrl, "type.googleapis.com/google.crypto.tink.ChaCha20Poly1305Key")
    intercept[GeneralSecurityException](TinkKeyset.parseJson(foreign))
  }

  test("TINK output prefix: 0x01‖keyId header written on encrypt, routed on decrypt") {
    val ks = keyset(0x01020304L, (0x01020304L, 3, "TINK"))
    val aead = new TinkKeysetAead(ks)
    val ad = "ad".getBytes(UTF_8)
    val ct = aead.encrypt(payload, ad)
    assert(ct.take(5).toSeq == Seq[Byte](1, 1, 2, 3, 4)) // 0x01 ‖ big-endian keyId
    assert(ct.length == 5 + 12 + payload.length + 16)
    assert(aead.decrypt(ct, ad).sameElements(payload))
    // the prefixed frame is EXACTLY what the reference's AES256_GCM
    // KeysetHandle writes: prefix + Tink's raw frame — prove with the real
    // Tink primitive on both sides
    val tinkRaw = new com.google.crypto.tink.subtle.AesGcmJce(rawKey(3))
    val referenceCt = ct.take(5) ++ tinkRaw.encrypt(payload, ad)
    assert(aead.decrypt(referenceCt, ad).sameElements(payload))
    assert(tinkRaw.decrypt(ct.drop(5), ad).sameElements(payload))
  }

  test("key rotation: old non-primary key's ciphertext still decrypts; RAW fallback works") {
    val oldKs = keyset(1L, (1L, 10, "TINK"))
    val rawKs = keyset(9L, (9L, 11, "RAW"))
    val oldCt = new TinkKeysetAead(oldKs).encrypt(payload, Array.emptyByteArray)
    val rawCt = new TinkKeysetAead(rawKs).encrypt(payload, Array.emptyByteArray)
    // rotated keyset: new primary 2, old key 1 and RAW key 9 retained
    val rotated = new TinkKeysetAead(
      keyset(2L, (2L, 12, "TINK"), (1L, 10, "TINK"), (9L, 11, "RAW")))
    assert(rotated.decrypt(oldCt, Array.emptyByteArray).sameElements(payload))
    assert(rotated.decrypt(rawCt, Array.emptyByteArray).sameElements(payload))
    val newCt = rotated.encrypt(payload, Array.emptyByteArray)
    assert(newCt(4) == 2.toByte) // primary moved
    // a keyset without the writing key refuses — never a silent wrong-key read
    intercept[GeneralSecurityException](
      new TinkKeysetAead(keyset(2L, (2L, 12, "TINK"))).decrypt(oldCt, Array.emptyByteArray))
  }

  test("KMS registry: first supporting client wins; no client = fail-fast") {
    val ksJson = TinkKeyset.toJson(keyset(5L, (5L, 20, "TINK")))
    val provider = new KmsKeyProvider(Seq(
      new JsonKeysetKmsClient("vault-kms://", Map("vault-kms://prod/events" -> ksJson)),
      new KmsClient {
        override def supports(uri: String): Boolean = uri.startsWith("test-kms://")
        override def aead(uri: String) = new AesGcmAead(rawKey(21))
      }))
    val ct = provider.aead("vault-kms://prod/events").encrypt(payload, Array.emptyByteArray)
    assert(provider.aead("vault-kms://prod/events")
      .decrypt(ct, Array.emptyByteArray).sameElements(payload))
    assert(provider.aead("test-kms://x").isInstanceOf[AesGcmAead])
    intercept[GeneralSecurityException](provider.aead("unknown-kms://nope"))
    // provisioned prefix but missing keyset is also loud
    intercept[GeneralSecurityException](provider.aead("vault-kms://prod/absent"))
  }

  test("EventEncryptor end-to-end over a keyset-resolving KMS provider") {
    val ksJson = TinkKeyset.toJson(keyset(6L, (6L, 30, "TINK")))
    val kmsEnc = new EventEncryptor(new KmsKeyProvider(Seq(
      new JsonKeysetKmsClient("vault-kms://", Map("vault-kms://prod/orders" -> ksJson)))))
    val u = "vault-kms://prod/orders"
    val ct = kmsEnc.encrypt(payload, key, ts, meta, u)
    assert(ct(0) == 1.toByte) // keyset-written events carry the TINK prefix
    assert(kmsEnc.decrypt(ct, key, ts, kmsEnc.withKeyId(meta, u)).sameElements(payload))
    // and the decrypt-side AD contract (id/kid excluded) holds across the
    // keyset path exactly as for raw keys
    val stored = kmsEnc.withKeyId(meta, u) + ("id" -> "src-1".getBytes(UTF_8))
    assert(kmsEnc.decrypt(ct, key, ts, stored).sameElements(payload))
  }
}

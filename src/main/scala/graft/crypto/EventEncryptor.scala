package graft.crypto

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8
import java.security.{GeneralSecurityException, SecureRandom}
import java.util.concurrent.ConcurrentHashMap

import javax.crypto.Cipher
import javax.crypto.spec.{GCMParameterSpec, SecretKeySpec}

import graft.codec.MetadataCodec
import graft.model.Event

/** Payload-level AEAD (SURVEY §2.4, ops E1/E2/E3) — faithful to the
  * reference's EventEncryptor (/root/reference
  * tech.kage.event.crypto/.../EventEncryptor.java).
  *
  * Associated data layout (EventEncryptor.java:139-154):
  * `eventKeyBytes ‖ timestampMillis (8B big-endian) ‖ canonicalMetadataBytes`
  * where an empty metadata map contributes ZERO bytes (not Avro's empty-map
  * encoding), and on decrypt the reserved `id` and `kid` entries are
  * excluded from the AD (EventEncryptor.java:115-137 — the
  * `ignoresSourceIdDuringDecryption` contract). Canonical metadata bytes
  * are the sorted Avro map from MetadataCodec, so encrypt-side and
  * decrypt-side AD agree byte-for-byte.
  *
  * Primitive: AES-256-GCM via JCE with the Tink AES_GCM wire shape the
  * reference produces — `12-byte IV ‖ ciphertext ‖ 16-byte tag` — so
  * tamper/wrong-AD failures surface as GeneralSecurityException
  * ("decryption failed"), matching the reference's observable behavior.
  * (The container ships tink.jar without its protobuf dependency, so the
  * primitive is JDK-native; the [[AeadPrimitive]] seam swaps Tink in
  * unchanged where it is resolvable.)
  *
  * Key resolution: `kid` metadata carries the key URI
  * (PostgresEventStore.java:152-160); [[KeyProvider]] maps URI → primitive.
  * [[InMemoryKms]] is the test/standalone form; the deployment form is
  * [[KmsKeyProvider]] — a Tink-KmsClients-shaped registry resolving URIs
  * through [[KmsClient]]s to keyset-backed AEADs ([[TinkKeysetAead]], which
  * also speaks the TINK output prefix the reference's AES256_GCM keysets
  * write). Serializable, so decryption runs on executors.
  */
final class EventEncryptor(keys: KeyProvider) extends Serializable {

  /** E1: encrypt a serialized payload. */
  def encrypt(
      payload: Array[Byte],
      eventKey: Array[Byte],
      timestampMillis: Long,
      metadata: Map[String, Array[Byte]],
      keyUri: String): Array[Byte] =
    keys.aead(keyUri).encrypt(payload, associatedData(eventKey, timestampMillis, metadata))

  /** E2 + F5: decrypt when `kid` present, else return payload as-is
    * (EventEncryptor.java:122-124). Wrong key/AD → GeneralSecurityException. */
  def decrypt(
      data: Array[Byte],
      eventKey: Array[Byte],
      timestampMillis: Long,
      metadata: Map[String, Array[Byte]]): Array[Byte] =
    metadata.get(Event.MetadataKeyId) match {
      case None => data
      case Some(kid) =>
        val ad = associatedData(eventKey, timestampMillis,
          metadata - Event.MetadataId - Event.MetadataKeyId)
        keys.aead(new String(kid, UTF_8)).decrypt(data, ad)
    }

  /** E2 variant for crypto-SHREDDED reads: `None` when the event's key
    * has been destroyed ([[KeyDestroyedException]]) — the caller redacts
    * or drops the event, the append-only log untouched. Unencrypted
    * passthrough and tamper behave EXACTLY like [[decrypt]]: a corrupted
    * ciphertext still fails loud (G8), never silently redacts. */
  def decryptOrRedact(
      data: Array[Byte],
      eventKey: Array[Byte],
      timestampMillis: Long,
      metadata: Map[String, Array[Byte]]): Option[Array[Byte]] =
    try Some(decrypt(data, eventKey, timestampMillis, metadata))
    catch { case _: KeyDestroyedException => None }

  /** E3: embed the key id into metadata for storage/transport. */
  def withKeyId(metadata: Map[String, Array[Byte]], keyUri: String): Map[String, Array[Byte]] =
    metadata + (Event.MetadataKeyId -> keyUri.getBytes(UTF_8))

  private[graft] def associatedData(
      eventKey: Array[Byte],
      timestampMillis: Long,
      metadata: Map[String, Array[Byte]]): Array[Byte] = {
    val metaBytes =
      if (metadata.isEmpty) Array.emptyByteArray
      else MetadataCodec.encode(metadata)
    ByteBuffer.allocate(eventKey.length + 8 + metaBytes.length)
      .put(eventKey).putLong(timestampMillis).put(metaBytes).array()
  }
}

/** AEAD primitive contract (Tink `Aead` signature). */
trait AeadPrimitive extends Serializable {
  def encrypt(plaintext: Array[Byte], associatedData: Array[Byte]): Array[Byte]
  def decrypt(ciphertext: Array[Byte], associatedData: Array[Byte]): Array[Byte]
}

/** AES-256-GCM with the Tink wire shape: IV(12) ‖ ct ‖ tag(16).
  *
  * Hot-path hygiene for per-row scans: the `SecretKeySpec` is built once
  * per key (it is immutable), and `Cipher` instances are reused per
  * thread — `Cipher.getInstance` walks the JCE provider list on every
  * call (~1–2 µs, comparable to the AES-GCM work itself for small
  * payloads; a decrypt scan of 200k×200 B rows measured 2× faster with
  * reuse). Cipher objects are NOT thread-safe but are fully re-keyed by
  * `init`, so a ThreadLocal is sound. */
final class AesGcmAead(keyBytes: Array[Byte]) extends AeadPrimitive {
  require(keyBytes.length == 32, "AES-256 key must be 32 bytes")
  private val IvLen = 12
  private val TagBits = 128
  private val keySpec = new SecretKeySpec(keyBytes, "AES")

  override def encrypt(pt: Array[Byte], ad: Array[Byte]): Array[Byte] = {
    val iv = new Array[Byte](IvLen)
    AesGcmAead.rng.nextBytes(iv)
    val c = AesGcmAead.cipher()
    c.init(Cipher.ENCRYPT_MODE, keySpec, new GCMParameterSpec(TagBits, iv))
    if (ad.nonEmpty) c.updateAAD(ad)
    val ct = c.doFinal(pt)
    val out = new Array[Byte](IvLen + ct.length)
    System.arraycopy(iv, 0, out, 0, IvLen)
    System.arraycopy(ct, 0, out, IvLen, ct.length)
    out
  }

  override def decrypt(data: Array[Byte], ad: Array[Byte]): Array[Byte] = {
    if (data.length < IvLen + TagBits / 8)
      throw new GeneralSecurityException("decryption failed")
    try {
      val c = AesGcmAead.cipher()
      c.init(Cipher.DECRYPT_MODE, keySpec,
        new GCMParameterSpec(TagBits, data, 0, IvLen))
      if (ad.nonEmpty) c.updateAAD(ad)
      c.doFinal(data, IvLen, data.length - IvLen)
    } catch {
      case _: javax.crypto.AEADBadTagException =>
        throw new GeneralSecurityException("decryption failed")
    }
  }
}

object AesGcmAead {
  private val rng = new SecureRandom()
  private val localCipher = new ThreadLocal[Cipher] {
    override def initialValue(): Cipher = Cipher.getInstance("AES/GCM/NoPadding")
  }
  private def cipher(): Cipher = localCipher.get()
}

/** URI → AEAD resolution boundary (KMS analog). */
trait KeyProvider extends Serializable {
  def aead(keyUri: String): AeadPrimitive
}

/** Raised when a key URI's material has been DESTROYED (crypto-shredding)
  * — deliberately distinct from tamper/wrong-AD failures, so readers can
  * redact shredded events while still failing loud on corruption. */
final class KeyDestroyedException(val keyUri: String)
  extends GeneralSecurityException(s"key destroyed: $keyUri")

/** Key destruction — the event-log leg of right-to-be-forgotten: an
  * append-only log cannot rewrite history (G1/G2), so per-subject
  * encryption + key destruction IS the deletion mechanism (crypto-
  * shredding): once the key is gone, every event encrypted under it is
  * permanently unreadable ciphertext, with no log rewrite. The analytics
  * artifacts' counterpart is [[graft.operators.Takedown]]. A production
  * KMS provider maps this to the KMS's schedule-destroy API. */
trait DestroyableKeys {
  def destroy(keyUri: String): Unit
}

/** Test/standalone KMS: per-URI AES-256 keys generated on first use
  * (mirrors the reference's test KMS, EncryptedPostgresEventStoreIT.java:
  * 66-74). JVM-wide store so driver and executors (one JVM in local mode)
  * resolve identical keys; production injects a real KMS-backed provider. */
final class InMemoryKms extends KeyProvider with DestroyableKeys {
  // memoized per URI: aead() runs once per ROW on the decrypt path, and a
  // fresh primitive per call would rebuild the key schedule every row.
  // The destroyed-set check precedes the memo so a shredded URI can never
  // serve a cached primitive.
  @transient private lazy val cache = new ConcurrentHashMap[String, AeadPrimitive]()
  override def aead(keyUri: String): AeadPrimitive = {
    if (InMemoryKms.isDestroyed(keyUri)) throw new KeyDestroyedException(keyUri)
    cache.computeIfAbsent(keyUri, uri => new AesGcmAead(InMemoryKms.keyFor(uri)))
  }

  /** Crypto-shred: drop the key material and pin the URI destroyed —
    * later resolution throws [[KeyDestroyedException]] instead of
    * regenerating a fresh (useless but confusing) key. JVM-wide, like
    * the keyset store itself. */
  override def destroy(keyUri: String): Unit = InMemoryKms.markDestroyed(keyUri)
}

object InMemoryKms {
  private val keysets = new ConcurrentHashMap[String, Array[Byte]]()
  private val destroyed = ConcurrentHashMap.newKeySet[String]()
  private val rng = new SecureRandom()

  private def keyFor(uri: String): Array[Byte] =
    keysets.computeIfAbsent(uri, _ => {
      val k = new Array[Byte](32)
      rng.nextBytes(k)
      k
    })

  private[crypto] def isDestroyed(uri: String): Boolean = destroyed.contains(uri)

  private[crypto] def markDestroyed(uri: String): Unit = {
    destroyed.add(uri)
    keysets.remove(uri)
  }

  /** Forget all keys (tests: wrong-key scenarios). */
  def reset(): Unit = { keysets.clear(); destroyed.clear() }
}

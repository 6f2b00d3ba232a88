package graft.crypto

import java.nio.ByteBuffer
import java.security.GeneralSecurityException
import java.util.Base64
import java.util.concurrent.ConcurrentHashMap

/** Tink keyset resolution for the encryption seam (E1/E2/E3 deployment
  * surface).
  *
  * The reference resolves its AEAD per key URI through an app-supplied
  * provider (/root/reference tech.kage.event.crypto/.../EventEncryptor.java:55,94-96);
  * its integration tests build that provider from Tink `KeysetHandle`s with
  * the predefined AES256_GCM parameters
  * (EncryptedPostgresEventStoreIT.java:66-74). Those parameters use Tink's
  * TINK output prefix: ciphertext is `0x01 ‖ keyId(4B big-endian) ‖
  * iv(12) ‖ ct ‖ tag(16)` — five bytes of key-routing header before the raw
  * AES-GCM frame. A decryptor that only understands the raw frame cannot
  * read reference-written ciphertext, so this module implements the keyset
  * layer for real:
  *
  *  - [[TinkKeyset.parseJson]] reads Tink's cleartext JSON keyset format
  *    (the `JsonKeysetWriter` layout: `primaryKeyId`, `key[]` with
  *    base64-protobuf `keyData.value`);
  *  - [[TinkKeyset.aesGcmKeyValue]] extracts the 32-byte key from the
  *    `google.crypto.tink.AesGcmKey` message with a minimal protobuf field
  *    scan (varint `version` = field 1, bytes `key_value` = field 3) — no
  *    protobuf-java dependency;
  *  - [[TinkKeysetAead]] applies Tink's exact encrypt/decrypt semantics
  *    over the keyset: primary-key encryption with its output prefix,
  *    decryption by prefix routing across all enabled keys (key rotation),
  *    RAW-key fallback.
  *
  * CryptoSpec proves interop against Tink's own implementation
  * (`com.google.crypto.tink.subtle.AesGcmJce`, resolvable without
  * protobuf): Tink-encrypted bytes decrypt here and vice versa.
  */
object TinkKeyset {

  /** One key material entry of a parsed keyset. */
  final case class KeysetKey(
      keyId: Long,
      keyBytes: Array[Byte],
      outputPrefixType: String,
      status: String) {
    def enabled: Boolean = status == "ENABLED"
    /** The 5-byte TINK ciphertext prefix: 0x01 ‖ keyId (4B big-endian). */
    def prefix: Array[Byte] = outputPrefixType match {
      case "TINK" =>
        ByteBuffer.allocate(5).put(1.toByte).putInt(keyId.toInt).array()
      case "RAW" => Array.emptyByteArray
      case other =>
        throw new GeneralSecurityException(s"unsupported output prefix type: $other")
    }
  }

  final case class Keyset(primaryKeyId: Long, keys: Seq[KeysetKey]) {
    def primary: KeysetKey = keys.find(_.keyId == primaryKeyId).getOrElse(
      throw new GeneralSecurityException(s"primaryKeyId $primaryKeyId not in keyset"))
  }

  val AesGcmTypeUrl = "type.googleapis.com/google.crypto.tink.AesGcmKey"

  /** Parse a cleartext JSON keyset (Tink `JsonKeysetWriter` layout).
    * Only AES-GCM keys are accepted — any other typeUrl fails fast rather
    * than silently skipping material the producer considered live. */
  def parseJson(json: String): Keyset = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(json)
    require(root.hasNonNull("primaryKeyId") && root.has("key"),
      "not a Tink keyset: primaryKeyId/key missing")
    val keys = (0 until root.get("key").size()).map { i =>
      val k = root.get("key").get(i)
      // structural fail-fast (GeneralSecurityException, not NPE): every
      // invalid-material path in this module must diagnose, not crash
      def field(n: com.fasterxml.jackson.databind.JsonNode, name: String) = {
        val f = if (n == null) null else n.get(name)
        if (f == null || f.isNull)
          throw new GeneralSecurityException(s"malformed keyset: key[$i].$name missing")
        f
      }
      val kd = field(k, "keyData")
      val typeUrl = field(kd, "typeUrl").asText()
      if (typeUrl != AesGcmTypeUrl)
        throw new GeneralSecurityException(s"unsupported key type: $typeUrl")
      KeysetKey(
        keyId = field(k, "keyId").asLong(),
        keyBytes = aesGcmKeyValue(Base64.getDecoder.decode(field(kd, "value").asText())),
        outputPrefixType = field(k, "outputPrefixType").asText(),
        status = field(k, "status").asText())
    }
    Keyset(root.get("primaryKeyId").asLong(), keys)
  }

  /** Extract `key_value` (field 3, length-delimited) from a serialized
    * `google.crypto.tink.AesGcmKey` message. Field-order agnostic; unknown
    * fields are skipped by wire type, exactly as a protobuf reader would. */
  def aesGcmKeyValue(proto: Array[Byte]): Array[Byte] = {
    var pos = 0
    def varint(): Long = {
      var shift = 0; var v = 0L
      while ({
        require(pos < proto.length, "truncated varint in AesGcmKey")
        val b = proto(pos); pos += 1
        v |= (b & 0x7fL) << shift; shift += 7
        (b & 0x80) != 0
      }) ()
      v
    }
    var keyValue: Array[Byte] = null
    while (pos < proto.length) {
      val tag = varint()
      val field = (tag >>> 3).toInt
      val wire = (tag & 7).toInt
      wire match {
        case 0 => varint() // version (field 1) or unknown varint
        case 2 =>
          val len = varint().toInt
          require(pos + len <= proto.length, "truncated bytes field in AesGcmKey")
          if (field == 3) keyValue = java.util.Arrays.copyOfRange(proto, pos, pos + len)
          pos += len
        case 5 => pos += 4
        case 1 => pos += 8
        case w => throw new GeneralSecurityException(s"bad AesGcmKey wire type $w")
      }
    }
    if (keyValue == null)
      throw new GeneralSecurityException("AesGcmKey has no key_value (field 3)")
    keyValue
  }

  /** Serialize a raw AES key as an `AesGcmKey` message + JSON keyset (the
    * inverse of [[parseJson]]; test fixtures and standalone deployments
    * that provision keysets without a Tink build). */
  def toJson(keyset: Keyset): String = {
    def protoOf(key: Array[Byte]): String = {
      // version=0 (field 1, varint), key_value (field 3, bytes)
      val out = ByteBuffer.allocate(2 + 2 + key.length)
      out.put(0x08.toByte).put(0.toByte) // field 1, varint 0
      out.put(0x1a.toByte).put(key.length.toByte).put(key)
      Base64.getEncoder.encodeToString(out.array())
    }
    val keys = keyset.keys.map { k =>
      s"""{"keyData":{"typeUrl":"$AesGcmTypeUrl","value":"${protoOf(k.keyBytes)}",
         |"keyMaterialType":"SYMMETRIC"},"status":"${k.status}","keyId":${k.keyId},
         |"outputPrefixType":"${k.outputPrefixType}"}""".stripMargin.replaceAll("\n", "")
    }.mkString(",")
    s"""{"primaryKeyId":${keyset.primaryKeyId},"key":[$keys]}"""
  }
}

/** Tink `Aead` semantics over a parsed keyset: encrypt with the primary
  * key (its output prefix leading the ciphertext), decrypt by routing on
  * the 5-byte TINK prefix across enabled keys, then falling back to RAW
  * keys — byte-compatible with ciphertext written by a reference instance
  * holding the same keyset, including after key rotation. */
final class TinkKeysetAead(keyset: TinkKeyset.Keyset) extends AeadPrimitive {
  require(keyset.keys.nonEmpty, "empty keyset")

  @transient private lazy val primitives: Map[Long, AesGcmAead] =
    keyset.keys.filter(_.enabled).map(k => k.keyId -> new AesGcmAead(k.keyBytes)).toMap

  override def encrypt(pt: Array[Byte], ad: Array[Byte]): Array[Byte] = {
    val p = keyset.primary
    if (!p.enabled) throw new GeneralSecurityException("primary key is not ENABLED")
    val raw = primitives(p.keyId).encrypt(pt, ad)
    val prefix = p.prefix
    if (prefix.isEmpty) raw
    else {
      val out = new Array[Byte](prefix.length + raw.length)
      System.arraycopy(prefix, 0, out, 0, prefix.length)
      System.arraycopy(raw, 0, out, prefix.length, raw.length)
      out
    }
  }

  override def decrypt(ct: Array[Byte], ad: Array[Byte]): Array[Byte] = {
    // Tink's lookup order: prefixed candidates first, then RAW keys.
    if (ct.length > 5 && ct(0) == 1.toByte) {
      val keyId = ByteBuffer.wrap(ct, 1, 4).getInt.toLong & 0xFFFFFFFFL
      keyset.keys.find(k => k.enabled && k.outputPrefixType == "TINK" && k.keyId == keyId)
        .foreach { k =>
          try return primitives(k.keyId)
            .decrypt(java.util.Arrays.copyOfRange(ct, 5, ct.length), ad)
          catch { case _: GeneralSecurityException => () } // fall through to RAW
        }
    }
    keyset.keys.filter(k => k.enabled && k.outputPrefixType == "RAW").foreach { k =>
      try return primitives(k.keyId).decrypt(ct, ad)
      catch { case _: GeneralSecurityException => () }
    }
    throw new GeneralSecurityException("decryption failed")
  }
}

/** One KMS backend: claims a URI family and resolves members to AEADs —
  * the shape of Tink's `KmsClient` (supports/getAead), which is what a
  * production deployment registers per KMS (cloud KMS, Vault, …). */
trait KmsClient extends Serializable {
  def supports(keyUri: String): Boolean
  def aead(keyUri: String): AeadPrimitive
}

/** [[KeyProvider]] over a registry of [[KmsClient]]s — Tink's
  * `KmsClients.get(uri)` resolution: first supporting client wins, no
  * supporting client is a fail-fast `GeneralSecurityException` (an event
  * silently decrypted with the wrong backend must be impossible).
  * Per-URI memoized; serializable, so executor-side decrypt resolves
  * locally without driver round-trips. */
final class KmsKeyProvider(clients: Seq[KmsClient]) extends KeyProvider {
  require(clients.nonEmpty, "at least one KmsClient required")

  @transient private lazy val cache = new ConcurrentHashMap[String, AeadPrimitive]()

  override def aead(keyUri: String): AeadPrimitive =
    cache.computeIfAbsent(keyUri, u =>
      clients.find(_.supports(u)).getOrElse(
        throw new GeneralSecurityException(s"no KMS client supports key URI: $u"))
        .aead(u))
}

/** KMS client over pre-provisioned cleartext JSON keysets keyed by full
  * URI — the post-KMS-decrypt stage of a real deployment (a cloud KMS
  * yields exactly such a keyset after unwrapping the EncryptedKeyset), and
  * the standalone mode's way to ship rotated keysets without a KMS. */
final class JsonKeysetKmsClient(uriPrefix: String, keysets: Map[String, String])
    extends KmsClient {
  override def supports(keyUri: String): Boolean = keyUri.startsWith(uriPrefix)
  override def aead(keyUri: String): AeadPrimitive = keysets.get(keyUri) match {
    case Some(json) => new TinkKeysetAead(TinkKeyset.parseJson(json))
    case None => throw new GeneralSecurityException(s"no keyset provisioned for $keyUri")
  }
}

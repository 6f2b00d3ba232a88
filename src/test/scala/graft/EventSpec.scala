package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.time.Instant
import java.util.UUID

import org.scalatest.funsuite.AnyFunSuite

import graft.model.{Event, KeyType}

/** Event model contract (SURVEY §1.1, F2/F3, T10/T14). */
class EventSpec extends AnyFunSuite {
  private val key = "k1".getBytes(UTF_8)
  private val payload = Array[Byte](1, 2, 3)

  test("timestamp truncated to milliseconds (Event.java:69)") {
    val t = Instant.parse("2024-03-01T10:15:30.123456789Z")
    assert(Event(key, payload, t).timestamp == Instant.parse("2024-03-01T10:15:30.123Z"))
  }

  test("null guards (Event.java:62-65)") {
    intercept[IllegalArgumentException](Event(null, payload, Instant.now()))
    intercept[IllegalArgumentException](Event(key, null, Instant.now()))
    intercept[IllegalArgumentException](Event(key, payload, null))
    intercept[IllegalArgumentException](Event(key, payload, Instant.now(), null))
  }

  test("null metadata values rejected at construction (Map.copyOf parity)") {
    intercept[IllegalArgumentException](
      Event(key, payload, Instant.now(), Map("trace" -> null)))
  }

  test("reserved metadata keys id/kid rejected, lsn allowed (PostgresEventStore.java:113-119)") {
    intercept[IllegalArgumentException](
      Event(key, payload, Instant.now(), Map("id" -> Array[Byte](1))))
    intercept[IllegalArgumentException](
      Event(key, payload, Instant.now(), Map("kid" -> Array[Byte](1))))
    // `lsn` is reserved but user-settable in the reference
    assert(Event(key, payload, Instant.now(), Map("lsn" -> Array[Byte](1)))
      .metadata.contains("lsn"))
  }

  test("value equality is content-based over byte arrays") {
    val t = Instant.parse("2024-03-01T10:00:00Z")
    val a = Event("k".getBytes(UTF_8), Array[Byte](5), t, Map("m" -> Array[Byte](9)))
    val b = Event("k".getBytes(UTF_8), Array[Byte](5), t, Map("m" -> Array[Byte](9)))
    assert(a == b)
    assert(a != Event("k".getBytes(UTF_8), Array[Byte](6), t, Map("m" -> Array[Byte](9))))
  }

  test("key type codecs are bijective (SURVEY §7.4 #4)") {
    val u = UUID.randomUUID()
    assert(KeyType.Uuid.fromBytes(KeyType.Uuid.toBytes(u)) == u)
    assert(KeyType.Text.fromBytes(KeyType.Text.toBytes("héllo")) == "héllo")
    assert(KeyType.Integer.fromBytes(KeyType.Integer.toBytes(-42)) == -42)
    val b = Array[Byte](1, 2, 3)
    assert(KeyType.Bytea.fromBytes(KeyType.Bytea.toBytes(b)).asInstanceOf[Array[Byte]].sameElements(b))
    assert(KeyType.Uuid.toBytes(u).length == 16)
    assert(KeyType.Integer.toBytes(7).sameElements(Array[Byte](0, 0, 0, 7)))
  }

  test("transport key projection (T10, EventReplicatorWorker.java:211-217)") {
    val raw = Array[Byte](9, 8)
    assert(KeyType.transportBytes(raw).sameElements(raw))
    assert(KeyType.transportBytes(123).sameElements("123".getBytes(UTF_8)))
    val u = UUID.randomUUID()
    assert(KeyType.transportBytes(u).sameElements(u.toString.getBytes(UTF_8)))
  }
}

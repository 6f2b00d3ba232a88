package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files
import java.time.Instant

import org.apache.avro.Schema
import org.apache.avro.generic.GenericData
import org.scalatest.funsuite.AnyFunSuite

import graft.codec.{ConfluentAvro, Cursor, SchemaCatalog}
import graft.crypto.{EventEncryptor, InMemoryKms}
import graft.functions.EventFunctions
import graft.replicate.Replicator
import graft.sources.KafkaShapedLog
import graft.store.{EventLog, GraftEventStore}

/** End-to-end slice (SURVEY §7.2): save (T1+T3 encode, optional E1) →
  * replicate in (lsn,id) order (S4+S12) → read back / subscribe-decode
  * (F5→E2→T2→T7) → golden round-trip assertions (§5 categories 3 and 6). */
class StoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val payloadSchema = new Schema.Parser().parse(
    """{"type":"record","name":"TestPayload","namespace":"graft.test",
      |"fields":[{"name":"text","type":"string"}]}""".stripMargin)
  private val catalog = SchemaCatalog(1 -> payloadSchema)

  private def rec(text: String): GenericData.Record = {
    val r = new GenericData.Record(payloadSchema)
    r.put("text", text)
    r
  }

  private def newStore(encrypted: Boolean = false): GraftEventStore = {
    val log = EventLog(Files.createTempDirectory("graft-store-").toString, spark)
    new GraftEventStore(log, catalog,
      if (encrypted) Some(new EventEncryptor(new InMemoryKms)) else None)
  }

  test("save → read round trip: payload, ordered metadata, millis timestamp") {
    val store = newStore()
    val t = Instant.parse("2024-05-01T12:00:00.123456Z")
    val meta = Map("zTest" -> "z".getBytes(UTF_8), "bTest" -> "b".getBytes(UTF_8))
    store.save("rt_events", "k1".getBytes(UTF_8), rec("test payload 1"), t, meta)
    val Seq((event, payload)) = store.readEvents("rt_events")
    assert(payload.get("text").toString == "test payload 1")
    assert(event.timestamp == Instant.parse("2024-05-01T12:00:00.123Z")) // ms truncation
    assert(event.metadata.keys.toSeq.sorted == Seq("bTest", "zTest"))
    assert(ConfluentAvro.schemaId(event.payload) == 1)
  }

  test("encrypted save → decrypted read; ciphertext at rest differs from plaintext") {
    val store = newStore(encrypted = true)
    val uri = "test-kms://test-keys/store-1"
    store.save("enc_events", "k1".getBytes(UTF_8), rec("secret text"),
      Instant.now(), Map("m" -> "v".getBytes(UTF_8)), encryptionKeyUri = Some(uri))
    // at rest: kid present, data is not a valid confluent frame of the text
    val (stored, _) = store.log.typedRead("enc_events").head match {
      case (c, e) => (e, c)
    }
    assert(stored.metadata.contains("kid"))
    assert(new String(stored.metadata("kid"), UTF_8) == uri)
    val plainFramed = ConfluentAvro.serialize(1, rec("secret text"))
    assert(!stored.payload.sameElements(plainFramed))
    // read path decrypts transparently
    val Seq((_, payload)) = store.readEvents("enc_events")
    assert(payload.get("text").toString == "secret text")
  }

  test("cursor-bounded replay (read after cursor skips history)") {
    val store = newStore()
    val c1 = store.save("cb_events", "k1".getBytes(UTF_8), rec("one"))
    store.save("cb_events", "k2".getBytes(UTF_8), rec("two"))
    val after = store.readEvents("cb_events", after = c1)
    assert(after.map(_._2.get("text").toString) == Seq("two"))
  }

  test("full slice: save → replicate → enrich-decode matches saved payloads in order") {
    val store = newStore()
    val texts = (1 to 7).map(i => s"test payload $i")
    store.saveAll("full_events", texts.zipWithIndex.map { case (t, i) =>
      (s"key-$i".getBytes(UTF_8), rec(t): org.apache.avro.generic.GenericRecord,
        Instant.parse("2024-01-01T00:00:00Z").plusSeconds(i),
        Map("seq" -> i.toString.getBytes(UTF_8)))
    })
    val sink = KafkaShapedLog(Files.createTempDirectory("graft-sink-").toString, spark)
    val rep = new Replicator(store.log, sink, batchSize = 3)
    assert(rep.run("full_events") == 7L)

    // consume the replicated topic: value bytes decode via the catalog
    val decoded = EventFunctions.enrich(
      store.log.read("full_events"), catalog)
      .orderBy("lsn", "id").collect()
    assert(decoded.map(r => r.getAs[String]("payload_json")).toSeq ==
      texts.map(t => s"""{"text": "$t"}"""))
    assert(decoded.map(_.getAs[Int]("schema_id")).distinct.toSeq == Seq(1))
    // metadata survived canonical encode/decode
    assert(decoded.map(r => new String(r.getAs[Map[String, Array[Byte]]]("metadata")("seq"), UTF_8)).toSeq ==
      (0 until 7).map(_.toString))
  }

  test("schema evolution: multiple record types on one topic resolve by embedded id (SURVEY §7.4 #5)") {
    val otherSchema = new Schema.Parser().parse(
      """{"type":"record","name":"OtherPayload","namespace":"graft.test",
        |"fields":[{"name":"n","type":"long"}]}""".stripMargin)
    val cat2 = catalog.register(2, otherSchema)
    val log = EventLog(Files.createTempDirectory("graft-evo-").toString, spark)
    val store = new GraftEventStore(log, cat2)
    val other = new GenericData.Record(otherSchema)
    other.put("n", 99L)
    // RecordNameStrategy analog: two record types interleaved on one topic
    store.saveAll("evo_events", Seq(
      ("k1".getBytes(UTF_8), rec("first"): org.apache.avro.generic.GenericRecord,
        Instant.now(), Map.empty[String, Array[Byte]]),
      ("k2".getBytes(UTF_8), other: org.apache.avro.generic.GenericRecord,
        Instant.now(), Map.empty[String, Array[Byte]])))
    val back = store.readEvents("evo_events")
    assert(back.map(_._2.getSchema.getName) == Seq("TestPayload", "OtherPayload"))
    assert(back(0)._2.get("text").toString == "first")
    assert(back(1)._2.get("n") == 99L)
  }

  test("streams topology: consume → transform → re-save (T8; KafkaStreamsEventStoreIT.java:332-338 fixture)") {
    val store = newStore()
    store.saveAll("in_events", (1 to 3).map { i =>
      (s"k$i".getBytes(UTF_8), rec(s"test payload $i"): org.apache.avro.generic.GenericRecord,
        Instant.parse("2024-01-01T00:00:00Z").plusSeconds(i), Map.empty[String, Array[Byte]])
    })
    // the reference's test topology: append " (processed)", shift ts +3s
    val transformed = store.readEvents("in_events").map { case (e, payload) =>
      val out = rec(payload.get("text").toString + " (processed)")
      (e.key, out: org.apache.avro.generic.GenericRecord,
        e.timestamp.plusSeconds(3), e.metadata)
    }
    store.saveAll("out_events", transformed)
    val back = store.readEvents("out_events")
    assert(back.map(_._2.get("text").toString) ==
      (1 to 3).map(i => s"test payload $i (processed)"))
    assert(back.map(_._1.timestamp) ==
      (1 to 3).map(i => Instant.parse("2024-01-01T00:00:00Z").plusSeconds(i + 3L)))
  }

  test("T8 output transformer: re-encrypts with the kid-sourced key, drops kid from user metadata") {
    val store = newStore(encrypted = true)
    val uri = "test-kms://test-keys/t8"
    store.save("t8in_events", "k".getBytes(UTF_8), rec("original"),
      Instant.parse("2024-04-01T00:00:00Z"), Map("m" -> "v".getBytes(UTF_8)),
      encryptionKeyUri = Some(uri))
    // f ships to executors: close over the (Serializable) schema, not the suite
    val ps = payloadSchema
    store.transformTopic("t8in_events", "t8out_events",
      p => {
        val r = new GenericData.Record(ps)
        r.put("text", p.get("text").toString + " (processed)")
        r
      },
      shiftTimestamp = java.time.Duration.ofSeconds(3))
    val Seq((outEvent, outPayload)) = store.readEvents("t8out_events")
    assert(outPayload.get("text").toString == "original (processed)")
    assert(outEvent.timestamp == Instant.parse("2024-04-01T00:00:03Z"))
    // re-encrypted at rest under the same key (kid present, not plaintext)
    val (_, stored) = store.log.typedRead("t8out_events").head
    assert(new String(stored.metadata("kid"), UTF_8) == uri)
    assert(!stored.payload.sameElements(
      ConfluentAvro.serialize(1, rec("original (processed)"))))
  }

  test("T8 key rotation: keyOverride re-encrypts under a new kid") {
    val store = newStore(encrypted = true)
    store.save("rotin_events", "k".getBytes(UTF_8), rec("rotate me"),
      Instant.now(), Map.empty, encryptionKeyUri = Some("test-kms://test-keys/old"))
    store.transformTopic("rotin_events", "rotout_events", identity,
      keyOverride = Some("test-kms://test-keys/new"))
    val (_, stored) = store.log.typedRead("rotout_events").head
    assert(new String(stored.metadata("kid"), UTF_8) == "test-kms://test-keys/new")
    val Seq((_, payload)) = store.readEvents("rotout_events")
    assert(payload.get("text").toString == "rotate me")
  }

  test("transformTopic is columnar and order-preserving across appends and mixed per-row keys") {
    val store = newStore(encrypted = true)
    val (uriA, uriB) = ("test-kms://test-keys/mixA", "test-kms://test-keys/mixB")
    def batch(lo: Int, hi: Int) = (lo to hi).map { i =>
      (s"k$i".getBytes(UTF_8), rec(s"text $i"): org.apache.avro.generic.GenericRecord,
        Instant.parse("2024-01-01T00:00:00Z").plusSeconds(i), Map.empty[String, Array[Byte]])
    }
    // three appends (three lsns), each under a different key regime
    store.saveAll("mix_events", batch(1, 4)) // plaintext
    store.saveAll("mix_events", batch(5, 8), encryptionKeyUri = Some(uriA))
    store.saveAll("mix_events", batch(9, 12), encryptionKeyUri = Some(uriB))
    val ps = payloadSchema // Serializable; the suite itself is not
    store.transformTopic("mix_events", "mixout_events",
      p => {
        val r = new GenericData.Record(ps)
        r.put("text", p.get("text").toString + "!")
        r
      })
    // output ids follow input (lsn, id) order end to end
    val back = store.readEvents("mixout_events")
    assert(back.map(_._2.get("text").toString) == (1 to 12).map(i => s"text $i!"))
    // per-row key handling: each row re-encrypted under ITS OWN source kid
    val kids = store.log.typedRead("mixout_events")
      .map { case (_, e) => e.metadata.get("kid").map(new String(_, UTF_8)) }
    assert(kids == (1 to 12).map {
      case i if i <= 4 => None
      case i if i <= 8 => Some(uriA)
      case _           => Some(uriB)
    })
  }

  test("readEvents fails loudly past its limit instead of materializing the topic") {
    val store = newStore()
    store.saveAll("lim_events", (1 to 5).map { i =>
      (s"k$i".getBytes(UTF_8), rec(s"r$i"): org.apache.avro.generic.GenericRecord,
        Instant.now(), Map.empty[String, Array[Byte]])
    })
    val ex = intercept[IllegalStateException](store.readEvents("lim_events", limit = 3))
    assert(ex.getMessage.contains("exceeds limit=3"))
    assert(store.readEvents("lim_events", limit = 5).size == 5)
  }

  test("unregistered embedded schema id fails fast on both decode paths (SerializationException parity)") {
    val otherSchema = new Schema.Parser().parse(
      """{"type":"record","name":"UnknownPayload","namespace":"graft.test",
        |"fields":[{"name":"n","type":"long"}]}""".stripMargin)
    val writerCat = catalog.register(7, otherSchema)
    val log = EventLog(Files.createTempDirectory("graft-unk-").toString, spark)
    val writer = new GraftEventStore(log, writerCat)
    val other = new GenericData.Record(otherSchema)
    other.put("n", 42L)
    writer.save("unk_events", "k1".getBytes(UTF_8), rec("known"))
    writer.save("unk_events", "k2".getBytes(UTF_8), other)
    // reader's catalog lacks id 7 → driver path throws, never skips silently
    val reader = new GraftEventStore(log, catalog)
    val ex = intercept[IllegalArgumentException](reader.readEvents("unk_events"))
    assert(ex.getMessage.contains("unknown schema id"))
    // columnar path: the same fail-fast, surfaced through the Spark job
    val ex2 = intercept[org.apache.spark.SparkException] {
      EventFunctions.enrich(log.read("unk_events"), catalog).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(ex2).exists(_.getMessage != null) &&
      chain(ex2).exists(c => c.getMessage != null && c.getMessage.contains("unknown schema id")))
  }

  test("randomized pipeline property: save → replicate → read-back equality (seeded)") {
    val rnd = new scala.util.Random(99)
    val store = newStore()
    val events = (1 to 40).map { i =>
      val meta = (0 until rnd.nextInt(4)).map { j =>
        val v = new Array[Byte](rnd.nextInt(16)); rnd.nextBytes(v)
        s"k${rnd.alphanumeric.take(4).mkString}$j" -> v
      }.toMap
      (rnd.alphanumeric.take(1 + rnd.nextInt(12)).mkString.getBytes(UTF_8),
        rec(s"payload ${rnd.nextInt(1000000)}"): org.apache.avro.generic.GenericRecord,
        Instant.ofEpochMilli(1700000000000L + rnd.nextInt(1000000)),
        meta)
    }
    store.saveAll("rand_events", events)
    val sink = KafkaShapedLog(Files.createTempDirectory("graft-rand-").toString, spark, numPartitions = 3)
    assert(new Replicator(store.log, sink, batchSize = 7).run("rand_events") == 40L)
    // read-back equality: payloads, millis-truncated timestamps, metadata
    val back = store.readEvents("rand_events")
    assert(back.size == 40)
    back.zip(events).foreach { case ((e, p), (k, p0, t0, m0)) =>
      assert(e.key.sameElements(k))
      assert(p.get("text").toString == p0.asInstanceOf[GenericData.Record].get("text").toString)
      assert(e.timestamp == t0.truncatedTo(java.time.temporal.ChronoUnit.MILLIS))
      assert(e.metadata.keySet == m0.keySet)
      m0.foreach { case (mk, mv) => assert(e.metadata(mk).sameElements(mv)) }
    }
    // sink holds exactly the same 40 values, no loss/dup across partitions
    assert(sink.read("rand_events").count() == 40L)
  }

  test("encrypted end-to-end: replicate ciphertext verbatim, consumer decrypts from sink records (§3-C + E2)") {
    import graft.crypto.{EventEncryptor, InMemoryKms}
    val store = newStore(encrypted = true)
    val uri = "test-kms://test-keys/e2e-1"
    store.saveAll("e2e_events", (1 to 3).map { i =>
      (s"k$i".getBytes(UTF_8), rec(s"secret $i"): org.apache.avro.generic.GenericRecord,
        Instant.parse("2024-03-01T00:00:00Z").plusSeconds(i),
        Map("m" -> s"v$i".getBytes(UTF_8)))
    }, encryptionKeyUri = Some(uri))
    val sink = KafkaShapedLog(Files.createTempDirectory("graft-e2e-").toString, spark)
    new Replicator(store.log, sink).run("e2e_events")

    val enc = new EventEncryptor(new InMemoryKms)
    val decoded = sink.read("e2e_events").orderBy("offset").collect().map { r =>
      val headers = r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("headers"))
        .map(h => h.getAs[String]("key") -> h.getAs[Array[Byte]]("value")).toMap
      assert(headers.contains("kid"), "kid header replicated")
      assert(headers.contains("id") && headers.contains("lsn"))
      val key = r.getAs[Array[Byte]]("key")
      val tsMillis = r.getAs[java.sql.Timestamp]("timestamp").getTime
      // consumer-side metadata = headers minus transport id/lsn (E2 AD excludes them anyway)
      val meta = headers - "id" - "lsn"
      val plain = enc.decrypt(r.getAs[Array[Byte]]("value"), key, tsMillis, meta)
      ConfluentAvro.deserialize(plain, catalog).get("text").toString
    }
    assert(decoded.toSeq == (1 to 3).map(i => s"secret $i"))
  }

  test("enrich decrypts encrypted topics columnar (F5→E2 on executors)") {
    val store = newStore(encrypted = true)
    val uri = "test-kms://test-keys/col-1"
    val n = 5
    store.saveAll("cole_events", (1 to n).map { i =>
      (s"k$i".getBytes(UTF_8), rec(s"enc $i"): org.apache.avro.generic.GenericRecord,
        Instant.parse("2024-01-01T00:00:00Z").plusSeconds(i), Map.empty[String, Array[Byte]])
    }, encryptionKeyUri = Some(uri))
    val decoded = EventFunctions.enrich(store.log.read("cole_events"), catalog,
        encryptor = Some(new EventEncryptor(new InMemoryKms)))
      .orderBy("id").collect()
    assert(decoded.map(_.getAs[String]("payload_json")).toSeq ==
      (1 to n).map(i => s"""{"text": "enc $i"}"""))
  }

  test("crypto-shredding: destroying a subject's key forgets its events without touching the log") {
    import graft.crypto.KeyDestroyedException
    val kms = new InMemoryKms
    val log = EventLog(Files.createTempDirectory("graft-shred-").toString, spark)
    val store = new GraftEventStore(log, catalog, Some(new EventEncryptor(kms)))
    val (uriA, uriB) = ("test-kms://shred/subject-a", "test-kms://shred/subject-b")
    val t = Instant.parse("2024-06-01T00:00:00Z")
    store.save("shred_events", "a1".getBytes(UTF_8), rec("a first"), t, Map.empty, Some(uriA))
    store.save("shred_events", "b1".getBytes(UTF_8), rec("b first"), t, Map.empty, Some(uriB))
    store.save("shred_events", "p1".getBytes(UTF_8), rec("plain"), t) // unencrypted passthrough
    store.save("shred_events", "a2".getBytes(UTF_8), rec("a second"), t, Map.empty, Some(uriA))

    kms.destroy(uriA) // the right-to-be-forgotten request for subject A

    // surviving read: A's events are gone as if never kept; B + plaintext
    // remain; the log itself is untouched (4 rows still stored)
    val left = store.readSurviving("shred_events")
    assert(left.map(_._2.get("text").toString).toSet == Set("b first", "plain"))
    assert(store.log.typedRead("shred_events").size == 4, "the log must not rewrite")
    // the strict read fails loud on the shredded event (no silent skip)
    val ex = intercept[KeyDestroyedException](store.readEvents("shred_events"))
    assert(ex.keyUri == uriA)
    // columnar: decryptSurviving nulls exactly A's payloads
    val df = store.log.read("shred_events")
      .withColumn("meta", EventFunctions.decodeMetadata(org.apache.spark.sql.functions.col("metadata")))
      .withColumn("plain", EventFunctions.decryptSurviving(new EventEncryptor(kms))(
        org.apache.spark.sql.functions.col("data"),
        org.apache.spark.sql.functions.col("key"),
        org.apache.spark.sql.functions.col("timestamp"),
        org.apache.spark.sql.functions.col("meta")))
    assert(df.filter("plain IS NULL").count() == 2L)
    assert(df.filter("plain IS NOT NULL").count() == 2L)
    // tamper under the LIVE key still fails loud — corruption can never
    // masquerade as a takedown
    val b = store.log.typedRead("shred_events").map(_._2)
      .filter(e => new String(e.key, UTF_8) == "b1").head
    val tampered = b.payload.clone(); tampered(tampered.length - 1) = (tampered.last ^ 1).toByte
    intercept[java.security.GeneralSecurityException] {
      new EventEncryptor(kms).decrypt(tampered, b.key, b.timestamp.toEpochMilli, b.metadata)
    }
    // no InMemoryKms.reset() here: the destroyed-set is JVM-wide and a
    // reset could race a concurrently-running suite's encrypt/decrypt;
    // the shred URIs are test-unique, so leaving them destroyed is inert
  }
}

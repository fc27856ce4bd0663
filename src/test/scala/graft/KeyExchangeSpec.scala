package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.batch.ChunkPipeline
import graft.streaming.{KeyExchange, WireCrypto}

/** C4bis key exchange — the kafkacrypto protocol shape the reference wraps
  * (openmsistream kafka_wrapper/openmsistream_kafka_crypto.py:12-120):
  * X25519 pairwise agreement, HKDF-derived wrapping keys, per-topic data
  * keys distributed over `<topic>.keys`/`<topic>.reqs` side topics with
  * generation-numbered rotation, feeding the WireCrypto AES data plane. */
class KeyExchangeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("HKDF-SHA256 matches the RFC 5869 appendix A.1 test vector") {
    def hex(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val okm = KeyExchange.hkdf(
      hex("0b0b0b0b0b0b0b0b0b0b0b0b0b0b0b0b0b0b0b0b0b0b"),
      hex("000102030405060708090a0b0c"),
      hex("f0f1f2f3f4f5f6f7f8f9"), 42)
    assert(okm.map("%02x".format(_)).mkString ==
      "3cb25f25faacd57a90434f64d0362f2a2d2d0a90cf1a5a4c5db02d56ecc4c5bf" +
        "34007208d5b887185865")
  }

  test("both sides of an X25519 exchange derive the same pairwise key; " +
      "topics separate") {
    val a = KeyExchange.generateKeyPair()
    val b = KeyExchange.generateKeyPair()
    val kAB = KeyExchange.pairwiseKey(a, b.getPublic.getEncoded, "t1")
    val kBA = KeyExchange.pairwiseKey(b, a.getPublic.getEncoded, "t1")
    assert(kAB.sameElements(kBA))
    assert(kAB.length == 16)
    // same pair, different topic → different wrapping key
    val kAB2 = KeyExchange.pairwiseKey(a, b.getPublic.getEncoded, "t2")
    assert(!kAB.sameElements(kAB2))
    // a third party derives something else entirely
    val c = KeyExchange.generateKeyPair()
    assert(!KeyExchange.pairwiseKey(c, b.getPublic.getEncoded, "t1")
      .sameElements(kAB))
  }

  test("end-to-end: announce → publish wrapped data key → fetch → " +
      "encrypted wire decrypts; outsider dead-letters") {
    import spark.implicits._
    val topicDir = Files.createTempDirectory("kx-topic").toString
    val topic = "osn_test"
    val producer = KeyExchange.generateKeyPair()
    val consumer = KeyExchange.generateKeyPair()
    val outsider = KeyExchange.generateKeyPair()

    // consumer announces on <topic>.reqs; producer mints + wraps the key
    KeyExchange.announce(topicDir, "consumer-1", consumer)
    val dataKey =
      KeyExchange.publishDataKey(topicDir, topic, "prod-1", producer, 1L)

    // consumer recovers the same bytes from <topic>.keys
    val got = KeyExchange.fetchDataKey(topicDir, topic, "consumer-1", consumer)
    assert(got.exists { case (gen, k) => gen == 1L && k.sameElements(dataKey) })

    // outsider addressed by nothing → None; even reading consumer-1's
    // message with the wrong private key fails GCM auth → None
    assert(KeyExchange.fetchDataKey(topicDir, topic, "outsider", outsider).isEmpty)
    assert(KeyExchange.fetchDataKey(topicDir, topic, "consumer-1", outsider).isEmpty)

    // data plane: wire encrypted under the exchanged key decrypts cleanly
    // for the consumer, fully dead-letters under the outsider's guess
    val files = spark.createDataset(Seq(
      ("kx.bin", "sub", Array.fill[Byte](200)(7), Option(1.5))))
    val wire = ChunkPipeline.encode(ChunkPipeline.chunkFiles(files, 64))
    val encrypted = WireCrypto.encryptValues(wire, dataKey)
    val (ok, dead) = WireCrypto.splitDecrypted(encrypted, got.get._2)
    assert(dead.count() == 0 && ok.count() == wire.count())
    val (okBad, deadBad) =
      WireCrypto.splitDecrypted(encrypted, Array.fill[Byte](16)(9))
    assert(okBad.count() == 0 && deadBad.count() == encrypted.count())
  }

  test("durable identity survives restart; nextGeneration rotates") {
    val idDir = Files.createTempDirectory("kx-id").toString
    val topicDir = Files.createTempDirectory("kx-gen").toString
    val p1 = KeyExchange.loadOrCreateIdentity(idDir)
    val p2 = KeyExchange.loadOrCreateIdentity(idDir) // "after restart"
    assert(p1.getPublic.getEncoded.sameElements(p2.getPublic.getEncoded))
    // the reloaded private key agrees with the original: both derive the
    // same pairwise key against a fresh peer
    val peer = KeyExchange.generateKeyPair()
    assert(KeyExchange.pairwiseKey(p1, peer.getPublic.getEncoded, "t")
      .sameElements(KeyExchange.pairwiseKey(p2, peer.getPublic.getEncoded, "t")))
    // generation counter: fresh topic → 1; after publishes → max + 1
    assert(KeyExchange.nextGeneration(topicDir) == 1L)
    KeyExchange.announce(topicDir, "c", peer)
    val producer = KeyExchange.generateKeyPair()
    KeyExchange.publishDataKey(topicDir, "t", "p", producer, 1L)
    KeyExchange.publishDataKey(topicDir, "t", "p", producer, 5L)
    assert(KeyExchange.nextGeneration(topicDir) == 6L)
  }

  test("AnnounceKeyApp CLI: creates the identity and announces it; a later " +
      "publish wraps for that party") {
    val topicDir = Files.createTempDirectory("kx-cli").toString + "/topic"
    val idDir = Files.createTempDirectory("kx-cli-id").toString + "/consumer-7"
    graft.app.AnnounceKeyApp.main(Array(topicDir, idDir))
    assert(Files.exists(Paths.get(idDir, "x25519.pkcs8")))
    assert(Files.exists(Paths.get(s"$topicDir.reqs", "consumer-7.pub")))
    // re-announcing reuses the same durable identity (same public key)
    val pub1 = Files.readAllBytes(Paths.get(idDir, "x25519.pub"))
    graft.app.AnnounceKeyApp.main(Array(topicDir, idDir))
    assert(Files.readAllBytes(Paths.get(idDir, "x25519.pub")).sameElements(pub1))
    // producer wraps for the announced party; the identity recovers the key
    val dataKey = KeyExchange.publishDataKey(topicDir, "topic", "p",
      KeyExchange.generateKeyPair(), KeyExchange.nextGeneration(topicDir))
    val got = KeyExchange.fetchDataKey(topicDir, "topic", "consumer-7",
      KeyExchange.loadOrCreateIdentity(idDir))
    assert(got.exists(_._2.sameElements(dataKey)))
  }

  test("rotation window: a key RING decrypts messages under every known " +
      "generation; unknown generations dead-letter") {
    import spark.implicits._
    val topicDir = Files.createTempDirectory("kx-ring").toString
    val consumer = KeyExchange.generateKeyPair()
    KeyExchange.announce(topicDir, "c", consumer)
    val producer = KeyExchange.generateKeyPair()
    val k1 = KeyExchange.publishDataKey(topicDir, "t", "p", producer, 1L)
    val k2 = KeyExchange.publishDataKey(topicDir, "t", "p", producer, 2L)
    val k3unknown = Array.fill[Byte](16)(42) // never published
    def wireOf(tag: String) = {
      val files = spark.createDataset(Seq(
        (s"$tag.bin", "sub", Array.fill[Byte](150)(tag.head.toByte), Option(1.5))))
      ChunkPipeline.encode(ChunkPipeline.chunkFiles(files, 64))
    }
    val mixed = WireCrypto.encryptValues(wireOf("a"), k1)
      .unionByName(WireCrypto.encryptValues(wireOf("b"), k2))
      .unionByName(WireCrypto.encryptValues(wireOf("c"), k3unknown))
    val ring = KeyExchange.fetchAllDataKeys(topicDir, "t", "c", consumer)
    assert(ring.map(_._1) == Seq(2L, 1L)) // newest first
    val (ok, dead) = WireCrypto.splitDecryptedAny(mixed, ring.map(_._2))
    // gen-1 and gen-2 messages decrypt; the unknown-key third dead-letters
    val okKeys = ChunkPipeline.decode(ok).collect().map(_.filename).toSet
    assert(okKeys == Set("a.bin", "b.bin"))
    assert(dead.count() == mixed.count() / 3)
  }

  test("a malformed announcement is skipped loudly; valid parties still " +
      "get their wrapped key") {
    val topicDir = Files.createTempDirectory("kx-badann").toString
    val good = KeyExchange.generateKeyPair()
    KeyExchange.announce(topicDir, "good", good)
    // garbage public key for a second party
    Files.write(Paths.get(topicDir + ".reqs", "evil.pub"),
      "not an x509 key".getBytes)
    val producer = KeyExchange.generateKeyPair()
    val dataKey = KeyExchange.publishDataKey(topicDir, "t", "p", producer, 1L)
    // the good consumer still recovers the key; evil got nothing
    val got = KeyExchange.fetchDataKey(topicDir, "t", "good", good)
    assert(got.exists(_._2.sameElements(dataKey)))
    assert(KeyExchange.fetchDataKey(topicDir, "t", "evil", good).isEmpty)
  }

  test("rotation: highest generation wins; tampered key message is skipped " +
      "not fatal") {
    val topicDir = Files.createTempDirectory("kx-rot").toString
    val topic = "osn_rot"
    val producer = KeyExchange.generateKeyPair()
    val consumer = KeyExchange.generateKeyPair()
    KeyExchange.announce(topicDir, "c", consumer)
    KeyExchange.publishDataKey(topicDir, topic, "p", producer, 1L)
    val k2 = KeyExchange.publishDataKey(topicDir, topic, "p", producer, 2L)
    val got = KeyExchange.fetchDataKey(topicDir, topic, "c", consumer)
    assert(got.exists { case (gen, k) => gen == 2L && k.sameElements(k2) })

    // flip a ciphertext byte in the gen-2 message: GCM auth fails, fetch
    // falls back to the intact gen-1 key instead of throwing
    val d = Paths.get(topicDir + ".keys")
    Files.list(d).forEach { p =>
      if (p.getFileName.toString.contains("0000000000000000002")) {
        val b = Files.readAllBytes(p)
        b(b.length - 1) = (b(b.length - 1) ^ 0x01).toByte
        Files.write(p, b)
      }
    }
    val fallback = KeyExchange.fetchDataKey(topicDir, topic, "c", consumer)
    assert(fallback.exists(_._1 == 1L))
  }
}

package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import java.security.{KeyFactory, KeyPair, KeyPairGenerator, MessageDigest, SecureRandom}
import java.security.spec.{PKCS8EncodedKeySpec, X509EncodedKeySpec}

import javax.crypto.{Cipher, KeyAgreement, Mac}
import javax.crypto.spec.{GCMParameterSpec, SecretKeySpec}

/** C4bis — the key-EXCHANGE layer the reference gets from the public
  * `kafkacrypto` library (openmsistream
  * kafka_wrapper/openmsistream_kafka_crypto.py:12-120 wraps it; the
  * library's protocol, per its public README/design, bootstraps pairwise
  * trust from Curve25519 keys and then distributes per-topic symmetric
  * *data keys* over `<topic>.keys` / `<topic>.reqs` side topics, with
  * generation-numbered rotation).
  *
  * Re-expressed for Spark's execution model, the protocol splits cleanly:
  *
  *   - **Control plane (this file, driver-side, O(parties) bytes):**
  *     X25519 key agreement (JDK 17 XDH) + HKDF-SHA256 (RFC 5869) derive a
  *     pairwise wrapping key per (producer, consumer); the producer mints a
  *     random per-topic AES data key and publishes it to the `<topic>.keys`
  *     side topic wrapped under each authorized consumer's pairwise key
  *     (AES-GCM). Key messages are a handful of rows — this never needs a
  *     distributed plan, and putting it on the driver keeps private keys
  *     out of closures that would otherwise ship to executors.
  *   - **Data plane (unchanged, fully distributed):** the recovered data
  *     key feeds [[WireCrypto]]'s codegen'd `aes_encrypt` /
  *     `try_aes_decrypt` columns; undecryptable rows keep flowing to the
  *     dead-letter dump and replay exactly as before (S6).
  *
  * The side topics use the same directory stand-in as the rest of the
  * offline Kafka wiring (one file per message; filename = message key), so
  * the whole handshake is exercised end-to-end in tests without a broker.
  * Unknown/expired keys are a NORMAL state: [[fetchDataKey]] returns None
  * and the caller leaves ciphertext on the dead-letter path until the key
  * message arrives — the reference's own stance (messages consumed before
  * key exchange completes are stored and replayed).
  */
object KeyExchange {

  private val KeyLen = 16 // AES-128, matches WireCrypto's accepted sizes
  private val Info = "graft-key-exchange-v1".getBytes(UTF_8)

  // ---------------------------------------------------------------- X25519

  /** Fresh X25519 keypair (JDK `XDH` provider — no external deps). */
  def generateKeyPair(): KeyPair = {
    val g = KeyPairGenerator.getInstance("X25519")
    g.generateKeyPair()
  }

  /** Raw X25519 shared secret between our private key and a peer's encoded
    * (X.509) public key. */
  def sharedSecret(mine: KeyPair, peerPublic: Array[Byte]): Array[Byte] = {
    val kf = KeyFactory.getInstance("X25519")
    val pub = kf.generatePublic(new X509EncodedKeySpec(peerPublic))
    val ka = KeyAgreement.getInstance("X25519")
    ka.init(mine.getPrivate)
    ka.doPhase(pub, true)
    ka.generateSecret()
  }

  // ------------------------------------------------------- HKDF (RFC 5869)

  private def hmacSha256(key: Array[Byte], data: Array[Byte]*): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(if (key.isEmpty) new Array[Byte](32) else key,
      "HmacSHA256"))
    data.foreach(mac.update)
    mac.doFinal()
  }

  /** HKDF-SHA256 extract+expand (RFC 5869). */
  def hkdf(ikm: Array[Byte], salt: Array[Byte], info: Array[Byte],
      length: Int): Array[Byte] = {
    require(length <= 255 * 32, s"HKDF-SHA256 output cap is 8160B, got $length")
    val prk = hmacSha256(salt, ikm)
    val out = new java.io.ByteArrayOutputStream()
    var t = Array.emptyByteArray
    var i = 1
    while (out.size < length) {
      t = hmacSha256(prk, t, info, Array(i.toByte))
      out.write(t, 0, t.length)
      i += 1
    }
    out.toByteArray.take(length)
  }

  /** Pairwise AES wrapping key for (us, peer) on `topic`. Both sides derive
    * the same bytes: the X25519 agreement is symmetric and the salt binds
    * the key to the topic so one topic's compromise can't unwrap another's
    * key messages. */
  def pairwiseKey(mine: KeyPair, peerPublic: Array[Byte], topic: String): Array[Byte] =
    hkdf(sharedSecret(mine, peerPublic),
      MessageDigest.getInstance("SHA-256").digest(topic.getBytes(UTF_8)),
      Info, KeyLen)

  // --------------------------------------------- side-topic message format

  private def keysDir(topicDir: String): Path = Paths.get(topicDir + ".keys")

  /** Publish our public key to the `<topic>.reqs` stand-in (consumer side
    * of the kafkacrypto bootstrap: announce identity, wait for wrapped
    * keys). Filename is the party name — last write wins, like a compacted
    * Kafka topic keyed by party. */
  def announce(topicDir: String, party: String, pair: KeyPair): Unit = {
    val d = Paths.get(topicDir + ".reqs")
    Files.createDirectories(d)
    Files.write(d.resolve(s"$party.pub"), pair.getPublic.getEncoded,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
  }

  /** All announced (party → encoded public key) on `<topic>.reqs`. */
  def announcements(topicDir: String): Map[String, Array[Byte]] = {
    val d = Paths.get(topicDir + ".reqs")
    if (!Files.isDirectory(d)) Map.empty
    else {
      val s = Files.list(d)
      try s.iterator().asInstanceOf[java.util.Iterator[Path]]
        .asScala()
        .filter(_.getFileName.toString.endsWith(".pub"))
        .map(p => p.getFileName.toString.stripSuffix(".pub") -> Files.readAllBytes(p))
        .toMap
      finally s.close()
    }
  }

  // minimal Iterator bridge (no scala.jdk import churn for one call site)
  private implicit class JIter[A](val it: java.util.Iterator[A]) {
    def asScala(): Iterator[A] = new Iterator[A] {
      def hasNext: Boolean = it.hasNext
      def next(): A = it.next()
    }
  }

  private val rng = new SecureRandom()

  /** Durable consumer identity: load the X25519 keypair stored under `dir`,
    * or create and persist one (private key PKCS#8, public key X.509 — both
    * plain JDK encodings). A consumer must present the SAME private key at
    * announce time and at fetch time, possibly across process restarts;
    * this is the kafkacrypto config-file identity re-expressed as two flat
    * files. */
  def loadOrCreateIdentity(dir: String): KeyPair = {
    val d = Paths.get(dir)
    val priv = d.resolve("x25519.pkcs8")
    val pub = d.resolve("x25519.pub")
    if (Files.exists(priv) && Files.exists(pub)) {
      val kf = KeyFactory.getInstance("X25519")
      new KeyPair(
        kf.generatePublic(new X509EncodedKeySpec(Files.readAllBytes(pub))),
        kf.generatePrivate(new PKCS8EncodedKeySpec(Files.readAllBytes(priv))))
    } else {
      val pair = generateKeyPair()
      Files.createDirectories(d)
      Files.write(priv, pair.getPrivate.getEncoded,
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
      Files.write(pub, pair.getPublic.getEncoded,
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
      pair
    }
  }

  /** Next data-key generation for `<topic>.keys`: one past the highest
    * generation already published (1 on a fresh topic) — so a re-run of the
    * producer ROTATES rather than overwrites, and consumers converge on the
    * newest key. */
  def nextGeneration(topicDir: String): Long = {
    val d = keysDir(topicDir)
    if (!Files.isDirectory(d)) return 1L
    val s = Files.list(d)
    try {
      val gens = s.iterator().asInstanceOf[java.util.Iterator[Path]].asScala()
        .map(_.getFileName.toString)
        .filter(_.endsWith(".key"))
        .flatMap(n => scala.util.Try(n.stripSuffix(".key").takeRight(19).toLong).toOption)
        .toSeq
      if (gens.isEmpty) 1L else gens.max + 1L
    } finally s.close()
  }

  /** Mint a fresh random AES data key for `topic` and publish it to
    * `<topic>.keys`, wrapped (AES-GCM, random IV) under the pairwise key of
    * every party currently announced on `<topic>.reqs`. `generation`
    * implements rotation: consumers take the highest generation available.
    * Returns the plaintext data key (the producer immediately encrypts
    * with it). */
  def publishDataKey(topicDir: String, topic: String, producer: String,
      producerPair: KeyPair, generation: Long): Array[Byte] = {
    val dataKey = new Array[Byte](KeyLen)
    rng.nextBytes(dataKey)
    val d = keysDir(topicDir)
    Files.createDirectories(d)
    announcements(topicDir).foreach { case (party, peerPub) =>
      // a corrupt announcement must not fail the publish for every OTHER
      // party — skip it loudly (the dead-letter posture)
      val wrapKey =
        try Some(pairwiseKey(producerPair, peerPub, topic))
        catch {
          case e: Exception =>
            System.err.println(
              s"[key-exchange] skipping malformed announcement '$party': $e")
            None
        }
      wrapKey.foreach { wk =>
        val iv = new Array[Byte](12)
        rng.nextBytes(iv)
        val c = Cipher.getInstance("AES/GCM/NoPadding")
        c.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(wk, "AES"),
          new GCMParameterSpec(128, iv))
        // bind generation into the GCM additional data so a replayed old
        // wrap can't be renamed to a newer generation
        c.updateAAD(s"$topic:$generation".getBytes(UTF_8))
        val wrapped = iv ++ c.doFinal(dataKey)
        Files.write(d.resolve(f"$party%s.$generation%019d.key"),
          producerPair.getPublic.getEncoded ++ wrapped,
          StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
      }
    }
    dataKey
  }

  /** Consumer side: recover the newest-generation data key addressed to
    * `party` on `<topic>.keys`, or None when no key message has arrived
    * (or none unwraps — wrong producer key, tampered message). */
  def fetchDataKey(topicDir: String, topic: String, party: String,
      pair: KeyPair): Option[(Long, Array[Byte])] =
    fetchAllDataKeys(topicDir, topic, party, pair).headOption

  /** The full KEY RING for `party`: every generation that unwraps, newest
    * first — what a rotation-tolerant consumer feeds
    * [[WireCrypto.splitDecryptedAny]] so in-flight messages under the
    * previous generation keep decrypting through the overlap window. */
  def fetchAllDataKeys(topicDir: String, topic: String, party: String,
      pair: KeyPair): Seq[(Long, Array[Byte])] = {
    val d = keysDir(topicDir)
    if (!Files.isDirectory(d)) return Nil
    val s = Files.list(d)
    val mine =
      try s.iterator().asInstanceOf[java.util.Iterator[Path]].asScala()
        .filter(_.getFileName.toString.matches(
          java.util.regex.Pattern.quote(party) + "\\.\\d{19}\\.key"))
        .toSeq
      finally s.close()
    // X.509-encoded X25519 public keys have a fixed length; derive it once
    // from OUR key instead of minting a throwaway pair per fetch
    val pubLen = pair.getPublic.getEncoded.length
    mine.sortBy(_.getFileName.toString).reverseIterator.flatMap { p =>
      // parse the zero-padded generation from the tail so dotted party
      // names can't shift the field index
      val gen = p.getFileName.toString.stripSuffix(".key").takeRight(19).toLong
      val bytes = Files.readAllBytes(p)
      if (bytes.length < pubLen + 12 + 16) None
      else {
        val producerPub = bytes.take(pubLen)
        val iv = bytes.slice(pubLen, pubLen + 12)
        val ct = bytes.drop(pubLen + 12)
        try {
          val wrapKey = pairwiseKey(pair, producerPub, topic)
          val c = Cipher.getInstance("AES/GCM/NoPadding")
          c.init(Cipher.DECRYPT_MODE, new SecretKeySpec(wrapKey, "AES"),
            new GCMParameterSpec(128, iv))
          c.updateAAD(s"$topic:$gen".getBytes(UTF_8))
          Some(gen -> c.doFinal(ct))
        } catch { case _: Exception => None } // tampered/foreign → skip
      }
    }.toSeq
  }
}

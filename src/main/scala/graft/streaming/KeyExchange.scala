package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import java.nio.file.attribute.PosixFilePermissions
import java.security.{KeyFactory, KeyPair, KeyPairGenerator, MessageDigest, SecureRandom, Signature}
import java.security.spec.{PKCS8EncodedKeySpec, X509EncodedKeySpec}

import javax.crypto.{Cipher, KeyAgreement, Mac}
import javax.crypto.spec.{GCMParameterSpec, SecretKeySpec}

/** C4bis — the key-EXCHANGE layer the reference gets from the public
  * `kafkacrypto` library (openmsistream
  * kafka_wrapper/openmsistream_kafka_crypto.py:12-120 wraps it; the
  * library's protocol, per its public README/design, bootstraps pairwise
  * trust from Curve25519 keys and then distributes per-topic symmetric
  * *data keys* over `<topic>.keys` / `<topic>.reqs` side topics, with
  * generation-numbered rotation and signed chains of trust).
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
  * == Trust model (read this before deploying) ==
  *
  * Every party owns a durable [[Identity]]: an X25519 key-agreement pair
  * plus an Ed25519 signing pair (both JDK-native, RFC 7748/8032; private
  * halves stored 0600). Announcements and key messages are SIGNED:
  *
  *   - an announcement binds (party, X25519 public key) under the
  *     announcer's Ed25519 key — a message whose signature does not verify
  *     is dropped on read, so nobody can bind a party NAME to a key they
  *     do not control without also controlling the signing key;
  *   - a key message binds (topic, generation, party, wrapped key) under
  *     the PRODUCER's Ed25519 key, so consumers can pin the producer and
  *     reject forged key material wholesale.
  *
  * Signatures alone do not decide WHO is authorized — that is the
  * fingerprint allow-lists (`allowedConsumers` on [[publishDataKey]],
  * `trustedProducers` on [[fetchAllDataKeys]]), the re-expression of
  * kafkacrypto's provisioned trust chain: operators exchange SHA-256
  * fingerprints of Ed25519 public keys out of band (printed by
  * `AnnounceKeyApp`) exactly as kafkacrypto provisions signed certs.
  * With `None` the plane runs OPEN: any announcer on `<topic>.reqs` is
  * wrapped for, any signature-valid key message is accepted, and the side-
  * topic directory/topic ACL is the ONLY boundary — acceptable on a
  * trusted cluster, stated here so nobody mistakes it for more.
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
  private val AnnounceMagic = "GKA1".getBytes(UTF_8)
  private val KeyMsgMagic = "GKM1".getBytes(UTF_8)
  private val AnnounceCtx = "graft-kx-announce-v1".getBytes(UTF_8)
  private val KeyMsgCtx = "graft-kx-key-v1".getBytes(UTF_8)

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

  // -------------------------------------------------------------- Ed25519

  private def sha256Hex(b: Array[Byte]): String =
    MessageDigest.getInstance("SHA-256").digest(b).map("%02x".format(_)).mkString

  private def sign(pair: KeyPair, data: Array[Byte]*): Array[Byte] = {
    val s = Signature.getInstance("Ed25519")
    s.initSign(pair.getPrivate)
    data.foreach(s.update)
    s.sign()
  }

  private def verify(pubEncoded: Array[Byte], sig: Array[Byte],
      data: Array[Byte]*): Boolean =
    try {
      val kf = KeyFactory.getInstance("Ed25519")
      val pub = kf.generatePublic(new X509EncodedKeySpec(pubEncoded))
      val s = Signature.getInstance("Ed25519")
      s.initVerify(pub)
      data.foreach(s.update)
      s.verify(sig)
    } catch { case _: Exception => false }

  /** A party's durable identity: X25519 for key agreement + Ed25519 for
    * signatures. `fingerprint` (SHA-256 of the encoded Ed25519 public key,
    * hex) is what operators exchange out of band for the allow-lists. */
  final case class Identity(kem: KeyPair, sig: KeyPair) {
    def fingerprint: String = sha256Hex(sig.getPublic.getEncoded)
  }

  /** Fingerprint of a peer's encoded Ed25519 public key — same formula as
    * [[Identity.fingerprint]], for building allow-lists from announcements. */
  def fingerprintOf(sigPubEncoded: Array[Byte]): String = sha256Hex(sigPubEncoded)

  /** Fresh (ephemeral) identity. */
  def newIdentity(): Identity = {
    val sg = KeyPairGenerator.getInstance("Ed25519")
    Identity(generateKeyPair(), sg.generateKeyPair())
  }

  // --------------------------------------------- side-topic message format

  private def keysDir(topicDir: String): Path = Paths.get(topicDir + ".keys")

  // length-prefixed (u16 BE) record framing for the signed blobs
  private def lp(b: Array[Byte]): Array[Byte] = {
    require(b.length <= 0xffff)
    Array(((b.length >> 8) & 0xff).toByte, (b.length & 0xff).toByte) ++ b
  }
  private def be64(v: Long): Array[Byte] =
    (7 to 0 by -1).map(i => ((v >> (8 * i)) & 0xff).toByte).toArray

  /** Parse consecutive u16-length-prefixed fields after `magic`; None on any
    * framing violation (short field, trailing bytes, wrong magic). */
  private def unframe(b: Array[Byte], magic: Array[Byte],
      nFields: Int): Option[Seq[Array[Byte]]] = {
    if (b == null || b.length < magic.length ||
        !b.take(magic.length).sameElements(magic)) return None
    var i = magic.length
    val out = Seq.newBuilder[Array[Byte]]
    var k = 0
    while (k < nFields) {
      if (i + 2 > b.length) return None
      val len = ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
      if (i + 2 + len > b.length) return None
      out += b.slice(i + 2, i + 2 + len)
      i += 2 + len
      k += 1
    }
    if (i != b.length) return None
    Some(out.result())
  }

  /** A verified announcement: the announcer's X25519 public key plus the
    * Ed25519 key that vouched for it. */
  final case class Announcement(kemPub: Array[Byte], sigPub: Array[Byte]) {
    def fingerprint: String = sha256Hex(sigPub)
  }

  /** Publish our identity to the `<topic>.reqs` stand-in (consumer side of
    * the kafkacrypto bootstrap: announce identity, wait for wrapped keys).
    * The message is SIGNED — Ed25519 over (context, party, X25519 pub) —
    * so a reader can prove the KEM key belongs to whoever holds the
    * signing key. Filename is the party name — last write wins, like a
    * compacted Kafka topic keyed by party. */
  def announce(topicDir: String, party: String, id: Identity): Unit = {
    val d = Paths.get(topicDir + ".reqs")
    Files.createDirectories(d)
    val kemPub = id.kem.getPublic.getEncoded
    val sigPub = id.sig.getPublic.getEncoded
    val signature = sign(id.sig, AnnounceCtx, lp(party.getBytes(UTF_8)), lp(kemPub))
    Files.write(d.resolve(s"$party.pub"),
      AnnounceMagic ++ lp(kemPub) ++ lp(sigPub) ++ lp(signature),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
  }

  /** All SIGNATURE-VALID announcements (party → [[Announcement]]) on
    * `<topic>.reqs`. Malformed or signature-invalid messages are dropped
    * loudly — the forged-binding defense; whether a valid announcer is
    * AUTHORIZED is the caller's allow-list. */
  def announcements(topicDir: String): Map[String, Announcement] = {
    val d = Paths.get(topicDir + ".reqs")
    if (!Files.isDirectory(d)) Map.empty
    else {
      val s = Files.list(d)
      try s.iterator().asInstanceOf[java.util.Iterator[Path]]
        .asScala()
        .filter(_.getFileName.toString.endsWith(".pub"))
        .flatMap { p =>
          val party = p.getFileName.toString.stripSuffix(".pub")
          val b = Files.readAllBytes(p)
          unframe(b, AnnounceMagic, 3) match {
            case Some(Seq(kemPub, sigPub, signature))
                if verify(sigPub, signature, AnnounceCtx,
                  lp(party.getBytes(UTF_8)), lp(kemPub)) =>
              Some(party -> Announcement(kemPub, sigPub))
            case _ =>
              System.err.println(
                s"[key-exchange] dropping unsigned/invalid announcement '$party'")
              None
          }
        }
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

  /** Write private-key bytes into a file CREATED 0600 — the permissions
    * exist before any byte does, so there is no umask-default window (nor a
    * crash-persistent world-readable file) between write and chmod.
    * Non-POSIX filesystems fall back to the JVM's owner-only API. */
  private def writePrivate(p: Path, bytes: Array[Byte]): Unit = {
    Files.deleteIfExists(p)
    try Files.createFile(p, PosixFilePermissions.asFileAttribute(
      PosixFilePermissions.fromString("rw-------")))
    catch {
      case _: UnsupportedOperationException =>
        Files.createFile(p)
        val f = p.toFile
        f.setReadable(false, false); f.setReadable(true, true)
        f.setWritable(false, false); f.setWritable(true, true)
    }
    Files.write(p, bytes, StandardOpenOption.TRUNCATE_EXISTING)
  }

  /** Durable identity: load the X25519 + Ed25519 pairs stored under `dir`,
    * or create and persist them (private keys PKCS#8 at mode 0600, public
    * keys X.509 — all plain JDK encodings). A consumer must present the
    * SAME identity at announce time and at fetch time, possibly across
    * process restarts; this is the kafkacrypto config-file identity
    * re-expressed as flat files. Pre-signature identity dirs (X25519 only)
    * are upgraded in place: the missing Ed25519 pair is minted on load. */
  def loadOrCreateIdentity(dir: String): Identity = {
    val d = Paths.get(dir)
    Files.createDirectories(d)
    val kemPriv = d.resolve("x25519.pkcs8"); val kemPub = d.resolve("x25519.pub")
    val sigPriv = d.resolve("ed25519.pkcs8"); val sigPub = d.resolve("ed25519.pub")
    def load(alg: String, priv: Path, pub: Path): KeyPair = {
      val kf = KeyFactory.getInstance(alg)
      new KeyPair(
        kf.generatePublic(new X509EncodedKeySpec(Files.readAllBytes(pub))),
        kf.generatePrivate(new PKCS8EncodedKeySpec(Files.readAllBytes(priv))))
    }
    def create(alg: String, priv: Path, pub: Path): KeyPair = {
      val pair = KeyPairGenerator.getInstance(alg).generateKeyPair()
      writePrivate(priv, pair.getPrivate.getEncoded)
      Files.write(pub, pair.getPublic.getEncoded,
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
      pair
    }
    val kem =
      if (Files.exists(kemPriv) && Files.exists(kemPub))
        load("X25519", kemPriv, kemPub)
      else create("X25519", kemPriv, kemPub)
    val sig =
      if (Files.exists(sigPriv) && Files.exists(sigPub))
        load("Ed25519", sigPriv, sigPub)
      else create("Ed25519", sigPriv, sigPub)
    Identity(kem, sig)
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
    * every signature-valid party announced on `<topic>.reqs` — restricted
    * to `allowedConsumers` (Ed25519 fingerprints) when given; `None` wraps
    * for every valid announcer (open mode — see the trust-model scaladoc).
    * Each key message is signed by the producer so consumers can pin us.
    * `generation` implements rotation: consumers take the highest
    * generation available. Returns the plaintext data key (the producer
    * immediately encrypts with it). */
  def publishDataKey(topicDir: String, topic: String, producer: String,
      producerId: Identity, generation: Long,
      allowedConsumers: Option[Set[String]] = None): Array[Byte] =
    publishDataKeyCounted(topicDir, topic, producer, producerId, generation,
      allowedConsumers)._1

  /** [[publishDataKey]] that also returns HOW MANY consumers were wrapped
    * for — callers that go on to encrypt must check it is nonzero, or an
    * over-tight allow-list silently produces ciphertext nobody can ever
    * decrypt. */
  def publishDataKeyCounted(topicDir: String, topic: String, producer: String,
      producerId: Identity, generation: Long,
      allowedConsumers: Option[Set[String]] = None): (Array[Byte], Int) = {
    val dataKey = new Array[Byte](KeyLen)
    rng.nextBytes(dataKey)
    val d = keysDir(topicDir)
    Files.createDirectories(d)
    val prodKemPub = producerId.kem.getPublic.getEncoded
    val prodSigPub = producerId.sig.getPublic.getEncoded
    var wrapped = 0
    announcements(topicDir).foreach { case (party, ann) =>
      if (allowedConsumers.exists(allow => !allow.contains(ann.fingerprint))) {
        System.err.println(
          s"[key-exchange] '$party' (${ann.fingerprint.take(12)}…) not in the " +
            "consumer allow-list — no key wrapped")
      } else {
        // a corrupt KEM key must not fail the publish for every OTHER
        // party — skip it loudly (the dead-letter posture)
        val wrapKey =
          try Some(pairwiseKey(producerId.kem, ann.kemPub, topic))
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
          val wrap = iv ++ c.doFinal(dataKey)
          val signature = sign(producerId.sig, KeyMsgCtx,
            lp(topic.getBytes(UTF_8)), be64(generation),
            lp(party.getBytes(UTF_8)), lp(prodKemPub), lp(wrap))
          Files.write(d.resolve(f"$party%s.$generation%019d.key"),
            KeyMsgMagic ++ lp(prodKemPub) ++ lp(prodSigPub) ++ lp(wrap) ++
              lp(signature),
            StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
          wrapped += 1
        }
      }
    }
    (dataKey, wrapped)
  }

  /** Consumer side: recover the newest-generation data key addressed to
    * `party` on `<topic>.keys`, or None when no key message has arrived
    * (or none passes — bad producer signature, untrusted producer, wrong
    * key, tampered message). */
  def fetchDataKey(topicDir: String, topic: String, party: String,
      id: Identity, trustedProducers: Option[Set[String]] = None)
      : Option[(Long, Array[Byte])] =
    fetchAllDataKeys(topicDir, topic, party, id, trustedProducers).headOption

  /** The full KEY RING for `party`: every generation that verifies AND
    * unwraps, newest first — what a rotation-tolerant consumer feeds
    * [[WireCrypto.splitDecryptedAny]] so in-flight messages under the
    * previous generation keep decrypting through the overlap window.
    * A key message is accepted only if its Ed25519 producer signature
    * verifies over (topic, generation, party, producer KEM key, wrapped
    * bytes) — and, when `trustedProducers` fingerprints are given, only
    * from a pinned producer. */
  def fetchAllDataKeys(topicDir: String, topic: String, party: String,
      id: Identity, trustedProducers: Option[Set[String]] = None)
      : Seq[(Long, Array[Byte])] = {
    val d = keysDir(topicDir)
    if (!Files.isDirectory(d)) return Nil
    val s = Files.list(d)
    val mine =
      try s.iterator().asInstanceOf[java.util.Iterator[Path]].asScala()
        .filter(_.getFileName.toString.matches(
          java.util.regex.Pattern.quote(party) + "\\.\\d{19}\\.key"))
        .toSeq
      finally s.close()
    mine.sortBy(_.getFileName.toString).reverseIterator.flatMap { p =>
      // parse the zero-padded generation from the tail so dotted party
      // names can't shift the field index; a 19-digit value past
      // Long.MaxValue is a malformed message to SKIP, not a poison pill
      // (open mode allows untrusted writers on the side topic)
      val genOpt = scala.util.Try(
        p.getFileName.toString.stripSuffix(".key").takeRight(19).toLong).toOption
      genOpt.iterator.flatMap { gen =>
      val bytes = Files.readAllBytes(p)
      unframe(bytes, KeyMsgMagic, 4) match {
        case Some(Seq(prodKemPub, prodSigPub, wrapped, signature))
            if wrapped.length >= 12 + 16 &&
              verify(prodSigPub, signature, KeyMsgCtx,
                lp(topic.getBytes(UTF_8)), be64(gen),
                lp(party.getBytes(UTF_8)), lp(prodKemPub), lp(wrapped)) &&
              trustedProducers.forall(_.contains(sha256Hex(prodSigPub))) =>
          val iv = wrapped.take(12)
          val ct = wrapped.drop(12)
          try {
            val wrapKey = pairwiseKey(id.kem, prodKemPub, topic)
            val c = Cipher.getInstance("AES/GCM/NoPadding")
            c.init(Cipher.DECRYPT_MODE, new SecretKeySpec(wrapKey, "AES"),
              new GCMParameterSpec(128, iv))
            c.updateAAD(s"$topic:$gen".getBytes(UTF_8))
            Some(gen -> c.doFinal(ct))
          } catch { case _: Exception => None } // tampered/foreign → skip
        case _ => None // wrong framing, bad signature, or untrusted producer
      }
      }
    }.toSeq
  }
}

package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import java.nio.file.attribute.PosixFilePermissions
import java.security.{KeyFactory, KeyPair, SecureRandom}
import java.security.spec.{PKCS8EncodedKeySpec, X509EncodedKeySpec}

import javax.crypto.{Cipher, SecretKeyFactory}
import javax.crypto.spec.{GCMParameterSpec, PBEKeySpec, SecretKeySpec}

/** Node provisioning — the C4 fringe the reference delegates to
  * KafkaCrypto's provision scripts (openmsistream
  * tools/provision_wrapper.py:87-141 wraps them and enforces the output
  * contract): a new node gets a named directory of exactly three
  * artifacts —
  *
  *   `<node_id>.config` — INI, `[DEFAULT] node_id = …` plus the public
  *                        Ed25519 fingerprint (what the wrapper's
  *                        move_files validates);
  *   `<node_id>.seed`   — the PUBLIC trust seed a peer needs to verify
  *                        this node's announcements (X.509 Ed25519 +
  *                        X25519 public keys, base64);
  *   `<node_id>.crypto` — the PRIVATE key store, protected by a
  *                        password: PBKDF2-HMAC-SHA256 (210 000
  *                        iterations, 16-byte salt) derives an AES-256
  *                        key, AES-GCM seals the PKCS#8 blobs with the
  *                        node id as associated data (a store cannot be
  *                        replayed under another node's name), file mode
  *                        0600.
  *
  * [[load]] reverses the store into an ordinary [[KeyExchange.Identity]],
  * so a provisioned node drops into the existing announce / wrap / rotate
  * protocol unchanged; a wrong password or a tampered store fails the GCM
  * tag — there is no partial decrypt. [[validate]] is the wrapper's
  * move_files contract re-expressed: exactly one artifact per extension,
  * filename stems agree, and the config's DEFAULT node_id matches. */
object Provision {

  private val rng = new SecureRandom()
  private val Iterations = 210000
  private val Magic = "GRAFTPROV1".getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  private def deriveKey(password: Array[Char], salt: Array[Byte]): SecretKeySpec = {
    val skf = SecretKeyFactory.getInstance("PBKDF2WithHmacSHA256")
    val spec = new PBEKeySpec(password, salt, Iterations, 256)
    try new SecretKeySpec(skf.generateSecret(spec).getEncoded, "AES")
    finally spec.clearPassword()
  }

  private def be32(v: Int): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def frame(parts: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    parts.foreach { p => out.write(be32(p.length)); out.write(p) }
    out.toByteArray
  }

  private def unframe(b: Array[Byte], n: Int): Seq[Array[Byte]] = {
    val out = Seq.newBuilder[Array[Byte]]
    var i = 0
    var k = 0
    while (k < n) {
      require(i + 4 <= b.length, "truncated key store")
      val len = ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
        ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
      require(len >= 0 && i + 4 + len <= b.length, "truncated key store")
      out += java.util.Arrays.copyOfRange(b, i + 4, i + 4 + len)
      i += 4 + len
      k += 1
    }
    out.result()
  }

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

  private def b64(b: Array[Byte]): String =
    java.util.Base64.getEncoder.encodeToString(b)
  private def unb64(s: String): Array[Byte] =
    java.util.Base64.getDecoder.decode(s)

  /** Provision a fresh node: mint an identity, seal the private store
    * under `password`, and lay out `<baseDir>/<nodeId>/` per the contract
    * above. Fails if the node directory already exists (provisioning is
    * explicit; re-provisioning a live node is a key rotation, not an
    * overwrite). Returns the node directory. */
  def provision(baseDir: String, nodeId: String,
      password: Array[Char]): Path = {
    require(nodeId.nonEmpty && nodeId.matches("[A-Za-z0-9._-]+"),
      s"node id must be a safe filename, got '$nodeId'")
    require(password.nonEmpty, "empty provisioning password")
    val dir = Paths.get(baseDir).resolve(nodeId)
    require(!Files.exists(dir),
      s"node directory $dir already exists — provisioning never overwrites")
    Files.createDirectories(dir)
    val id = KeyExchange.newIdentity()
    // .crypto: salt || iv || GCM(frames(kemPriv, kemPub, sigPriv, sigPub))
    val salt = new Array[Byte](16)
    val iv = new Array[Byte](12)
    rng.nextBytes(salt); rng.nextBytes(iv)
    val plain = frame(Seq(
      id.kem.getPrivate.getEncoded, id.kem.getPublic.getEncoded,
      id.sig.getPrivate.getEncoded, id.sig.getPublic.getEncoded))
    val c = Cipher.getInstance("AES/GCM/NoPadding")
    c.init(Cipher.ENCRYPT_MODE, deriveKey(password, salt),
      new GCMParameterSpec(128, iv))
    c.updateAAD(nodeId.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val sealed0 = c.doFinal(plain)
    java.util.Arrays.fill(plain, 0.toByte)
    val store = new java.io.ByteArrayOutputStream()
    store.write(Magic); store.write(salt); store.write(iv); store.write(sealed0)
    writePrivate(dir.resolve(s"$nodeId.crypto"), store.toByteArray)
    // .seed: the public trust material a peer pins
    val seed =
      s"""[seed]
         |node_id = $nodeId
         |fingerprint = ${id.fingerprint}
         |ed25519_pub = ${b64(id.sig.getPublic.getEncoded)}
         |x25519_pub = ${b64(id.kem.getPublic.getEncoded)}
         |""".stripMargin
    Files.writeString(dir.resolve(s"$nodeId.seed"), seed)
    // .config: what the wrapper's move_files checks (node_id in DEFAULT)
    val config =
      s"""[DEFAULT]
         |node_id = $nodeId
         |fingerprint = ${id.fingerprint}
         |kdf = pbkdf2-hmac-sha256/$Iterations
         |cipher = aes-256-gcm
         |""".stripMargin
    Files.writeString(dir.resolve(s"$nodeId.config"), config)
    dir
  }

  /** Open a provisioned node's private store. A wrong password or any
    * tampering fails the GCM tag (AEADBadTagException) — surfaced as an
    * IllegalArgumentException with no partial key material. */
  def load(nodeDir: String, password: Array[Char]): KeyExchange.Identity = {
    val dir = Paths.get(nodeDir)
    val nodeId = validate(nodeDir).fold(
      err => throw new IllegalArgumentException(err), identity)
    val b = Files.readAllBytes(dir.resolve(s"$nodeId.crypto"))
    require(b.length > Magic.length + 16 + 12 &&
      java.util.Arrays.equals(java.util.Arrays.copyOfRange(b, 0, Magic.length), Magic),
      s"$nodeId.crypto is not a provisioning key store")
    val salt = java.util.Arrays.copyOfRange(b, Magic.length, Magic.length + 16)
    val iv = java.util.Arrays.copyOfRange(b, Magic.length + 16, Magic.length + 28)
    val sealed0 = java.util.Arrays.copyOfRange(b, Magic.length + 28, b.length)
    val c = Cipher.getInstance("AES/GCM/NoPadding")
    c.init(Cipher.DECRYPT_MODE, deriveKey(password, salt),
      new GCMParameterSpec(128, iv))
    c.updateAAD(nodeId.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val plain =
      try c.doFinal(sealed0)
      catch {
        case _: javax.crypto.AEADBadTagException =>
          throw new IllegalArgumentException(
            s"cannot open $nodeId.crypto: wrong password or corrupted store")
      }
    val Seq(kemPriv, kemPub, sigPriv, sigPub) = unframe(plain, 4)
    java.util.Arrays.fill(plain, 0.toByte)
    def pair(alg: String, priv: Array[Byte], pub: Array[Byte]): KeyPair = {
      val kf = KeyFactory.getInstance(alg)
      new KeyPair(kf.generatePublic(new X509EncodedKeySpec(pub)),
        kf.generatePrivate(new PKCS8EncodedKeySpec(priv)))
    }
    val id = KeyExchange.Identity(
      pair("X25519", kemPriv, kemPub), pair("Ed25519", sigPriv, sigPub))
    val declared = graft.app.IniConfig
      .load(dir.resolve(s"$nodeId.config").toString)
      .section("DEFAULT").getOrElse("fingerprint", "")
    require(id.fingerprint == declared,
      s"decrypted identity fingerprint ${id.fingerprint} does not match " +
        s"the provisioned config ($declared)")
    id
  }

  /** The wrapper's move_files output contract (provision_wrapper.py:87-128):
    * exactly one `.config` / `.seed` / `.crypto` each, every filename stem
    * equals the same node id, and the config's DEFAULT section declares
    * that node id. Right = node id; Left = first violation. */
  def validate(nodeDir: String): Either[String, String] = {
    val dir = Paths.get(nodeDir)
    if (!Files.isDirectory(dir)) Left(s"$nodeDir is not a directory")
    else {
      val names = {
        val s = Files.list(dir)
        try {
          val b = List.newBuilder[String]
          val it = s.iterator()
          while (it.hasNext) b += it.next().getFileName.toString
          b.result()
        } finally s.close()
      }
      val exts = Seq(".config", ".seed", ".crypto")
      val perExt = exts.map(ext => ext -> names.filter(_.endsWith(ext)))
      perExt.find(_._2.length != 1) match {
        case Some((ext, ms)) =>
          Left(s"found ${ms.length} $ext files in $nodeDir, expected 1")
        case None =>
          val stems = perExt.map { case (ext, ms) =>
            ext -> ms.head.dropRight(ext.length)
          }
          val nodeId = stems.head._2
          stems.find(_._2 != nodeId) match {
            case Some((ext, other)) =>
              Left(s"$other$ext conflicts with node_id $nodeId")
            case None =>
              graft.app.IniConfig
                .load(dir.resolve(s"$nodeId.config").toString)
                .section("DEFAULT").get("node_id") match {
                case Some(`nodeId`) => Right(nodeId)
                case Some(other) => Left(
                  s"node_id '$other' in $nodeId.config mismatched to filenames ($nodeId)")
                case None => Left(s"node_id not listed in $nodeId.config")
              }
          }
      }
    }
  }
}

package graft.functions

/** The PDF STANDARD SECURITY HANDLER (ISO 32000-1 §7.6.3) — the
  * "encrypted but openable" class that dominates real crawl corpora: a
  * document encrypted with an OWNER password (to restrict printing or
  * editing) but an EMPTY user password, which every reader silently
  * opens. Supported schemes are the ones real writers emitted for 20
  * years: RC4-40 (V1/R2), RC4-128 (V2/R3), and AES-128-CBC (V4/R4 with
  * /CFM /AESV2). V5+ (AES-256, PDF 2.0) and non-empty user passwords
  * route to quarantine — we never hand wrong bytes downstream.
  *
  * All primitives are public algorithms: MD5 and AES via the JDK
  * (`java.security`/`javax.crypto`), RC4 implemented from its published
  * key-schedule/PRGA description (the JDK's ARCFOUR cipher is optional
  * per spec, so the 15-line form is more portable).
  *
  * Reference anchor: the reference quarantines undecryptable payloads
  * for replay (undecryptable_reproducer semantics) rather than failing
  * the stream — the same posture [[Pdfs]] keeps for password-protected
  * documents. */
object PdfCrypto {

  /** ISO 32000-1 Algorithm 2's 32-byte password pad. */
  val Pad: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  private def md5(parts: Array[Byte]*): Array[Byte] = {
    val d = java.security.MessageDigest.getInstance("MD5")
    parts.foreach(d.update)
    d.digest()
  }

  /** Pad-or-truncate a password to the 32-byte form Algorithm 2 hashes. */
  private def padPwd(pwd: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](32)
    val n = math.min(32, pwd.length)
    System.arraycopy(pwd, 0, out, 0, n)
    System.arraycopy(Pad, 0, out, n, 32 - n)
    out
  }

  /** RC4 (symmetric: encrypt == decrypt). */
  def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = Array.tabulate(256)(_.toByte)
    var j = 0
    var i = 0
    while (i < 256) {
      j = (j + s(i) + key(i % key.length)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
      i += 1
    }
    val out = new Array[Byte](data.length)
    i = 0; j = 0
    var k = 0
    while (k < data.length) {
      i = (i + 1) & 0xff
      j = (j + s(i)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
      out(k) = (data(k) ^ s((s(i) + s(j)) & 0xff)).toByte
      k += 1
    }
    out
  }

  /** AES-128-CBC decrypt of a PDF stream/string: leading 16 bytes are the
    * IV, PKCS#5 padding stripped. Null on any malformed input (short,
    * non-block-aligned, bad padding) — never throws. */
  def aesDecrypt(key: Array[Byte], data: Array[Byte]): Array[Byte] =
    try {
      if (data.length < 32 || (data.length - 16) % 16 != 0) return null
      val c = javax.crypto.Cipher.getInstance("AES/CBC/PKCS5Padding")
      c.init(javax.crypto.Cipher.DECRYPT_MODE,
        new javax.crypto.spec.SecretKeySpec(key, "AES"),
        new javax.crypto.spec.IvParameterSpec(data, 0, 16))
      c.doFinal(data, 16, data.length - 16)
    } catch { case scala.util.control.NonFatal(_) => null }

  /** AES-128-CBC encrypt (fixture side): IV prefixed, PKCS#5 padded. The
    * IV is caller-supplied so fixtures stay deterministic. */
  def aesEncrypt(key: Array[Byte], iv: Array[Byte],
      data: Array[Byte]): Array[Byte] = {
    val c = javax.crypto.Cipher.getInstance("AES/CBC/PKCS5Padding")
    c.init(javax.crypto.Cipher.ENCRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(key, "AES"),
      new javax.crypto.spec.IvParameterSpec(iv))
    iv ++ c.doFinal(data)
  }

  /** Algorithm 2: the file encryption key from a (user) password. `n` =
    * key length in bytes (R2 → 5, else /Length/8). R4 documents with
    * `/EncryptMetadata false` (unencrypted XMP — common in the wild)
    * append 0xFFFFFFFF to the MD5 input (ISO 32000 §7.6.3.3 step f);
    * skipping it derives the wrong key and mis-quarantines an openable
    * document. */
  def fileKey(userPwd: Array[Byte], o: Array[Byte], p: Int, id: Array[Byte],
      r: Int, n: Int, encryptMetadata: Boolean = true): Array[Byte] = {
    val pLe = Array[Byte](
      (p & 0xff).toByte, ((p >> 8) & 0xff).toByte,
      ((p >> 16) & 0xff).toByte, ((p >> 24) & 0xff).toByte)
    val noMeta =
      if (r >= 4 && !encryptMetadata)
        Array[Byte](-1, -1, -1, -1)
      else Array.emptyByteArray
    var h = md5(padPwd(userPwd), o, pLe, id, noMeta)
    if (r >= 3) {
      var i = 0
      while (i < 50) { h = md5(h.take(n)); i += 1 }
    }
    h.take(n)
  }

  /** Algorithm 3 (fixture side): the /O value from owner + user passwords. */
  def computeO(ownerPwd: Array[Byte], userPwd: Array[Byte], r: Int,
      n: Int): Array[Byte] = {
    var h = md5(padPwd(ownerPwd))
    if (r >= 3) { var i = 0; while (i < 50) { h = md5(h); i += 1 } }
    val key = h.take(n)
    var o = rc4(key, padPwd(userPwd))
    if (r >= 3) {
      var i = 1
      while (i <= 19) {
        o = rc4(key.map(b => (b ^ i).toByte), o)
        i += 1
      }
    }
    o
  }

  /** Algorithms 4/5: the /U value from the file key. R2 is RC4(key, Pad);
    * R≥3 is the 20-round form over MD5(Pad ++ ID), padded to 32 bytes
    * (the tail 16 are arbitrary per spec — zeros here). */
  def computeU(key: Array[Byte], id: Array[Byte], r: Int): Array[Byte] = {
    if (r == 2) return rc4(key, Pad)
    var u = rc4(key, md5(Pad, id))
    var i = 1
    while (i <= 19) {
      u = rc4(key.map(b => (b ^ i).toByte), u)
      i += 1
    }
    u ++ new Array[Byte](16)
  }

  /** A validated decryption context: the file key plus the cipher choice.
    * Per-object keys follow Algorithm 1 (MD5 of key + low 3 bytes of the
    * object number + low 2 of the generation, plus "sAlT" for AES) —
    * except V5 (AES-256), where ISO 32000-2 drops the derivation and the
    * FILE key encrypts every object directly. */
  final class Handler(key: Array[Byte], aes: Boolean,
      val v5: Boolean = false) {
    private val Salt = Array[Byte](0x73, 0x41, 0x6C, 0x54)

    def objKey(num: Int, gen: Int): Array[Byte] = {
      if (v5) return key
      val tail = Array[Byte](
        (num & 0xff).toByte, ((num >> 8) & 0xff).toByte,
        ((num >> 16) & 0xff).toByte,
        (gen & 0xff).toByte, ((gen >> 8) & 0xff).toByte)
      val h =
        if (aes) md5(key, tail, Salt)
        else md5(key, tail)
      h.take(math.min(key.length + 5, 16))
    }

    /** Null on malformed ciphertext; never throws. */
    def decrypt(num: Int, gen: Int, data: Array[Byte]): Array[Byte] =
      if (aes || v5) aesDecrypt(objKey(num, gen), data)
      else rc4(objKey(num, gen), data)

    /** Fixture side. For AES the IV derives deterministically from the
      * object number (fixtures must hash stably; the decoder never cares). */
    def encrypt(num: Int, gen: Int, data: Array[Byte]): Array[Byte] =
      if (aes || v5) aesEncrypt(objKey(num, gen),
        md5(Array[Byte](num.toByte, gen.toByte), Salt), data)
      else rc4(objKey(num, gen), data)
  }

  // ----------------------------------------------- V5 / R6 (ISO 32000-2)

  private def sha(n: Int, parts: Array[Byte]*): Array[Byte] = {
    val d = java.security.MessageDigest.getInstance(s"SHA-$n")
    parts.foreach(d.update)
    d.digest()
  }

  /** ISO 32000-2 Algorithm 2.B — the R6 password hash: an iterated
    * SHA-256/384/512 + AES-128-CBC loop (at least 64 rounds, then until
    * the last encrypted byte ≤ round−32). `udata` is empty for the user
    * password and the 48-byte /U string for the owner password. */
  def hash2B(pwd: Array[Byte], salt: Array[Byte],
      udata: Array[Byte]): Array[Byte] = {
    var k = sha(256, pwd, salt, udata)
    var i = 0
    var done = false
    var lastE: Array[Byte] = null
    // one Cipher AND one digest per SHA width per derivation: getInstance
    // does a provider walk and was the dominant cost of the ≥64-round
    // loop (measured ~3x on the x240 gate for the cipher; the per-round
    // MessageDigest walk is the same pattern); doFinal/digest reset both
    // for reuse
    val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
    val ds = Array(
      java.security.MessageDigest.getInstance("SHA-256"),
      java.security.MessageDigest.getInstance("SHA-384"),
      java.security.MessageDigest.getInstance("SHA-512"))
    while (!done) {
      val block = pwd ++ k ++ udata
      val k1 = new Array[Byte](block.length * 64)
      var j = 0
      while (j < 64) {
        System.arraycopy(block, 0, k1, j * block.length, block.length)
        j += 1
      }
      c.init(javax.crypto.Cipher.ENCRYPT_MODE,
        new javax.crypto.spec.SecretKeySpec(k, 0, 16, "AES"),
        new javax.crypto.spec.IvParameterSpec(k, 16, 16))
      lastE = c.doFinal(k1)
      var s = 0
      var x = 0
      while (x < 16) { s += lastE(x) & 0xff; x += 1 }
      val d = ds(s % 3)
      d.update(lastE)
      k = d.digest()
      i += 1
      done = i >= 64 && (lastE(lastE.length - 1) & 0xff) <= i - 32
    }
    k.take(32)
  }

  /** AES-256-CBC with a ZERO IV and no padding — the /UE (and /OE)
    * wrapping of the file key (ISO 32000-2 Algorithm 8/9). */
  def aesNoPad(key: Array[Byte], data: Array[Byte],
      encrypt: Boolean): Array[Byte] =
    try {
      val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
      c.init(
        if (encrypt) javax.crypto.Cipher.ENCRYPT_MODE
        else javax.crypto.Cipher.DECRYPT_MODE,
        new javax.crypto.spec.SecretKeySpec(key, "AES"),
        new javax.crypto.spec.IvParameterSpec(new Array[Byte](16)))
      c.doFinal(data)
    } catch { case scala.util.control.NonFatal(_) => null }

  /** V5/R6 empty-user-password open (ISO 32000-2 Algorithm 11 + 8.A):
    * /U = hash(32) ‖ validationSalt(8) ‖ keySalt(8); validate
    * hash2B("", vSalt, "") against the hash, then unwrap the 256-bit
    * file key from /UE with hash2B("", kSalt, ""). Null = wrong
    * password or malformed strings → quarantine. */
  def openV5EmptyPassword(u: Array[Byte], ue: Array[Byte]): Handler = {
    if (u == null || ue == null || u.length < 48 || ue.length < 32)
      return null
    val vSalt = java.util.Arrays.copyOfRange(u, 32, 40)
    val kSalt = java.util.Arrays.copyOfRange(u, 40, 48)
    val check = hash2B(Array.emptyByteArray, vSalt, Array.emptyByteArray)
    var i = 0
    while (i < 32) {
      if (check(i) != u(i)) return null
      i += 1
    }
    val wrap = hash2B(Array.emptyByteArray, kSalt, Array.emptyByteArray)
    val fileKey = aesNoPad(wrap, java.util.Arrays.copyOf(ue, 32),
      encrypt = false)
    if (fileKey == null) return null
    new Handler(fileKey, aes = true, v5 = true)
  }

  /** Fixture side: the V5/R6 /U, /UE, /O, /OE values wrapping `fileKey`
    * for the given passwords (Algorithms 8 and 9; salts caller-supplied
    * so fixtures stay deterministic). Returns (U, UE, O, OE). */
  def computeV5(fileKey: Array[Byte], userPwd: Array[Byte],
      ownerPwd: Array[Byte], salts: Array[Byte]):
      (Array[Byte], Array[Byte], Array[Byte], Array[Byte]) = {
    require(fileKey.length == 32 && salts.length == 32,
      "fileKey 32 bytes, salts = 4×8 bytes")
    val uvs = java.util.Arrays.copyOfRange(salts, 0, 8)
    val uks = java.util.Arrays.copyOfRange(salts, 8, 16)
    val ovs = java.util.Arrays.copyOfRange(salts, 16, 24)
    val oks = java.util.Arrays.copyOfRange(salts, 24, 32)
    val uHash = hash2B(userPwd, uvs, Array.emptyByteArray)
    val u = uHash ++ uvs ++ uks
    val ue = aesNoPad(hash2B(userPwd, uks, Array.emptyByteArray),
      fileKey, encrypt = true)
    val oHash = hash2B(ownerPwd, ovs, u)
    val o = oHash ++ ovs ++ oks
    val oe = aesNoPad(hash2B(ownerPwd, oks, u), fileKey, encrypt = true)
    (u, ue, o, oe)
  }

  /** Build the handler for an /Encrypt dictionary IF the empty user
    * password opens it (Algorithm 6): derive the key from "", recompute
    * /U, and compare (full 32 bytes for R2, first 16 for R≥3 — the tail
    * is arbitrary). Null = password-protected or unsupported scheme →
    * the caller quarantines the document. */
  def openWithEmptyPassword(v: Int, r: Int, lengthBits: Int,
      o: Array[Byte], u: Array[Byte], p: Int, id: Array[Byte],
      aes: Boolean, encryptMetadata: Boolean = true): Handler = {
    if (o == null || u == null || o.length < 32 || u.length < 32) return null
    val ok = (v, r) match {
      case (1, 2) | (2, 3) | (4, 4) => true
      case _ => false // V5/R6 (AES-256) and exotica: quarantine
    }
    if (!ok) return null
    val n = if (r == 2) 5 else {
      if (lengthBits % 8 != 0 || lengthBits < 40 || lengthBits > 128)
        return null
      lengthBits / 8
    }
    val key = fileKey(Array.emptyByteArray, o, p, id, r, n, encryptMetadata)
    val uCheck = computeU(key, id, r)
    val cmpLen = if (r == 2) 32 else 16
    var i = 0
    while (i < cmpLen) {
      if (uCheck(i) != u(i)) return null
      i += 1
    }
    new Handler(key, aes)
  }
}

package graft.functions

/** MSB-first bit IO shared by the codec-config parsers ([[H264]], [[H265]],
  * [[Av1]]) — one implementation of the u(n)/Exp-Golomb primitives instead
  * of a private copy per codec, so a guard fixed once is fixed everywhere. */
private[functions] final class MsbBitReader(b: Array[Byte], startByte: Int = 0) {
  private var pos = startByte * 8
  def u1(): Int = {
    if (pos >= b.length * 8) throw new IllegalStateException("bitstream underrun")
    val v = (b(pos >> 3) >> (7 - (pos & 7))) & 1
    pos += 1
    v
  }
  def u(n: Int): Int = {
    var v = 0; var i = 0
    while (i < n) { v = (v << 1) | u1(); i += 1 }
    v
  }
  /** Exp-Golomb unsigned (H.264/H.265 §9.1 — same code in both specs).
    * The zero run is capped at 24: no field the parsers read legitimately
    * approaches 2^24, and runs beyond that would overflow `(1 << zeros) - 1
    * + u(zeros)` into a plausible-looking garbage Int instead of failing —
    * malformed SPS/OBU input must surface as null, not wrong metadata. */
  def ue(): Int = {
    var zeros = 0
    while (u1() == 0) {
      zeros += 1
      if (zeros > 24) throw new IllegalStateException("ue overrun")
    }
    (1 << zeros) - 1 + u(zeros)
  }
  /** Exp-Golomb signed (§9.1.1). */
  def se(): Int = {
    val k = ue()
    if (k % 2 == 0) -(k / 2) else (k + 1) / 2
  }

  // FLAC-frame primitives (RFC 9639) — shared here per this file's
  // one-implementation rule, so the underrun guard lives in one place.

  /** Signed two's-complement n-bit read (n ≤ 31). */
  def s(n: Int): Int = { val v = u(n); (v << (32 - n)) >> (32 - n) }

  /** Unary run of zeros terminated by a 1 (Rice quotients), capped —
    * malformed input must surface as a decode failure, not a spin. */
  def unary(maxRun: Int): Int = {
    var q = 0
    while (u1() == 0) {
      q += 1
      if (q > maxRun) throw new IllegalStateException("unary overrun")
    }
    q
  }

  /** Skip to the next byte boundary (frame headers/footers are
    * byte-aligned between bit-packed subframes). */
  def alignToByte(): Unit = pos = (pos + 7) & ~7

  /** Current byte offset; caller must be byte-aligned (CRC spans). */
  def bytePos: Int = {
    require((pos & 7) == 0, "not byte-aligned")
    pos >> 3
  }
}

private[functions] final class MsbBitWriter {
  private val out = new java.io.ByteArrayOutputStream()
  private var acc = 0; private var n = 0
  def u1(v: Int): Unit = {
    acc = (acc << 1) | (v & 1); n += 1
    if (n == 8) { out.write(acc); acc = 0; n = 0 }
  }
  def u(v: Int, bits: Int): Unit = {
    var i = bits - 1
    while (i >= 0) { u1((v >> i) & 1); i -= 1 }
  }
  def ue(v: Int): Unit = {
    val k = v + 1
    val bits = 32 - Integer.numberOfLeadingZeros(k)
    u(0, bits - 1); u(k, bits)
  }
  /** rbsp_trailing_bits: stop bit + zero-pad to a byte boundary. */
  def finishStopBit(): Array[Byte] = { u1(1); while (n != 0) u1(0); out.toByteArray }
  /** Plain zero-pad (AV1 OBU payloads). */
  def finishZeroPad(): Array[Byte] = { while (n != 0) u1(0); out.toByteArray }
}

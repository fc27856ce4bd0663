package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Library-free WAV (RIFF) header parsing — the audio face of the
  * multimodal pillar's honest in-container capability (cf.
  * [[ImageHeaders]] for images). The RIFF chunk walk, PCM `fmt ` fields,
  * and `data` size are read straight off the public container layout;
  * only sample decode stays behind the multimodal stub.
  */
object AudioHeaders {
  /** (codec, channels, sample_rate, bits, duration_us), or null when the
    * payload is not a RIFF/WAVE container with a PCM fmt chunk. Duration
    * is exact integer micros: dataBytes * 8e6 / (rate * channels * bits).
    */
  def parseWav(b: Array[Byte]): (String, Int, Int, Int, Long) = {
    if (b == null || b.length < 44) return null
    if (!(tag(b, 0) == "RIFF" && tag(b, 8) == "WAVE")) return null
    var channels = -1; var rate = -1; var bits = -1; var fmtCode = -1
    var dataSize = -1L
    var i = 12
    // RIFF chunk walk; chunks are word-aligned (odd sizes carry a pad byte)
    while (i + 8 <= b.length && (channels < 0 || dataSize < 0)) {
      val id = tag(b, i)
      val len = le32(b, i + 4)
      if (len < 0) return null
      if (id == "fmt " && i + 8 + 16 <= b.length) {
        fmtCode = le16(b, i + 8)
        channels = le16(b, i + 10)
        rate = le32(b, i + 12)
        bits = le16(b, i + 22)
      } else if (id == "data") {
        // size field is authoritative even if the body is truncated/absent
        dataSize = len.toLong
      }
      // cursor arithmetic in Long: a crafted chunk declaring len near 2^31
      // must not wrap i negative (index crash) — a declared size past the
      // buffer end means this is the last walkable chunk
      val next = i.toLong + 8L + len.toLong + (len & 1).toLong
      i = if (next > b.length.toLong) b.length else next.toInt
    }
    val codec = fmtCode match {
      case 1 => "pcm"
      case 6 if bits == 8 => "alaw" // G.711 A-law
      case 7 if bits == 8 => "ulaw" // G.711 mu-law
      case _ => null
    }
    if (codec == null || channels <= 0 || rate <= 0 || bits <= 0 || dataSize < 0) null
    else (codec, channels, rate, bits,
      dataSize * 8000000L / (rate.toLong * channels * bits))
  }

  private def u(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def tag(b: Array[Byte], i: Int): String =
    if (i + 4 > b.length) "" else new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
  private def le16(b: Array[Byte], i: Int): Int = u(b, i) | (u(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    u(b, i) | (u(b, i + 1) << 8) | (u(b, i + 2) << 16) | (u(b, i + 3) << 24)

  private def le16b(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32b(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** REAL sample decode for RIFF/WAVE PCM payloads:
    * (n_samples, peak, sum_sq, n_clip), or null when the container is not
    * PCM with 8- or 16-bit samples. 8-bit WAV samples are unsigned with
    * amplitude v − 128; 16-bit are signed little-endian. `peak` is the max
    * absolute amplitude, `sum_sq` the exact integer energy Σa², `n_clip`
    * the count of full-scale samples (0/255 resp. ±32768/32767) — every
    * field integer-exact so an oracle reproduces them arithmetically. A
    * data chunk declaring more bytes than the buffer holds is decoded up
    * to the buffer end (truncated uploads degrade, not crash). */
  /** G.711 mu-law expansion (ITU-T G.711 / the classic Sun ulaw2linear
    * table formula): code → 14-bit linear, |sample| ≤ 32124. Exact
    * integer arithmetic, so an oracle reproduces it in SQL. */
  def ulawToLinear(code: Int): Int = {
    val u = (~code) & 0xff
    val exp = (u >> 4) & 7
    val mant = u & 0xf
    val mag = (132 << exp) - 132 + (mant << (exp + 3))
    if ((u & 0x80) != 0) -mag else mag
  }

  /** G.711 A-law expansion (alaw2linear): code → 13-bit linear,
    * |sample| ≤ 32256. Sign bit SET means positive in A-law. */
  def alawToLinear(code: Int): Int = {
    val a = code ^ 0x55
    val seg = (a >> 4) & 7
    val mant = a & 0xf
    val t =
      if (seg == 0) (mant << 4) + 8
      else ((mant << 4) + 0x108) << (seg - 1)
    if ((a & 0x80) != 0) t else -t
  }

  def parsePcmStats(b: Array[Byte]): (Long, Int, Long, Long) = {
    if (b == null || b.length < 44) return null
    if (!(tag(b, 0) == "RIFF" && tag(b, 8) == "WAVE")) return null
    var bits = -1; var fmtCode = -1
    var dataOff = -1; var dataLen = -1
    var i = 12
    while (i + 8 <= b.length && (bits < 0 || dataOff < 0)) {
      val id = tag(b, i)
      val len = le32(b, i + 4)
      if (len < 0) return null
      if (id == "fmt " && i + 8 + 16 <= b.length) {
        fmtCode = le16(b, i + 8)
        bits = le16(b, i + 22)
      } else if (id == "data") {
        dataOff = i + 8
        dataLen = math.min(len.toLong, (b.length - dataOff).toLong).toInt
      }
      val next = i.toLong + 8L + len.toLong + (len & 1).toLong
      i = if (next > b.length.toLong) b.length else next.toInt
    }
    val g711 = fmtCode == 6 || fmtCode == 7
    if (dataOff < 0) return null
    if (!g711 && (fmtCode != 1 || (bits != 8 && bits != 16))) return null
    if (g711 && bits != 8) return null
    var n = 0L; var peak = 0; var sumSq = 0L; var clip = 0L
    if (g711) {
      // G.711 bytes expand to 13/14-bit linear; clip = full-scale codes
      val fullScale = if (fmtCode == 7) 32124 else 32256
      var j = dataOff; val end = dataOff + dataLen
      while (j < end) {
        val a = if (fmtCode == 7) ulawToLinear(u(b, j)) else alawToLinear(u(b, j))
        val abs = if (a < 0) -a else a
        if (abs > peak) peak = abs
        sumSq += a.toLong * a
        if (abs == fullScale) clip += 1
        n += 1; j += 1
      }
    } else if (bits == 8) {
      var j = dataOff; val end = dataOff + dataLen
      while (j < end) {
        val v = u(b, j)
        val a = v - 128
        val abs = if (a < 0) -a else a
        if (abs > peak) peak = abs
        sumSq += a.toLong * a
        if (v == 0 || v == 255) clip += 1
        n += 1; j += 1
      }
    } else {
      var j = dataOff; val end = dataOff + dataLen - 1
      while (j < end) {
        val s = (le16(b, j) << 16) >> 16 // sign-extend
        val abs = if (s < 0) -s else s
        if (abs > peak) peak = abs
        sumSq += s.toLong * s
        if (s == 32767 || s == -32768) clip += 1
        n += 1; j += 2
      }
    }
    (n, peak, sumSq, clip)
  }

  /** A valid PCM WAV container around `body` (the deterministic inverse of
    * [[parseWav]] for the header part). */
  def buildWav(channels: Int, rate: Int, bits: Int, body: Array[Byte],
      fmtCode: Int = 1): Array[Byte] = {
    val byteRate = rate * channels * bits / 8
    val blockAlign = channels * bits / 8
    "RIFF".getBytes ++ le32b(36 + body.length) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32b(16) ++ le16b(fmtCode) ++ le16b(channels) ++
      le32b(rate) ++ le32b(byteRate) ++ le16b(blockAlign) ++ le16b(bits) ++
      "data".getBytes ++ le32b(body.length) ++ body
  }
}

/** `audio_header(binary)` → `struct<codec string, channels int,
  * sample_rate int, bits int, duration_us long>`, null for non-WAV
  * payloads. Codegen'd Catalyst expression — audio triage of a binary
  * column stays inside whole-stage codegen, same posture as
  * `image_header`. */
case class AudioHeader(child: Expression) extends UnaryExpression {
  override def dataType: DataType = AudioHeader.resultType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"audio_header expects binary, got $other")
  }

  override def nullSafeEval(payload: Any): Any = {
    val parsed = AudioHeaders.parseWav(payload.asInstanceOf[Array[Byte]])
    if (parsed == null) null
    else InternalRow(UTF8String.fromString(parsed._1), parsed._2, parsed._3,
      parsed._4, parsed._5)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("audioHeader", this, classOf[AudioHeader].getName)
    val r = ctx.freshName("audHdr")
    nullSafeCodeGen(ctx, ev, b => {
      s"""
         |Object $r = $self.nullSafeEval($b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $r; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): AudioHeader =
    copy(child = newChild)

  override def prettyName: String = "audio_header"
}

object AudioHeader {
  val resultType: StructType = StructType(Seq(
    StructField("codec", StringType),
    StructField("channels", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("bits", IntegerType),
    StructField("duration_us", LongType)))

  def audioHeader(media: Column): Column =
    GraftColumnShim.column(AudioHeader(GraftColumnShim.expression(media)))
}

/** `pcm_stats(binary)` → `struct<n_samples long, peak int, sum_sq long,
  * n_clip long>`, null unless the payload is a RIFF/WAVE PCM container
  * with 8- or 16-bit samples. REAL sample decode (PCM needs no codec
  * library) running inside whole-stage codegen — with [[BmpPixels]] this
  * shrinks the multimodal stub to formats whose bodies genuinely need a
  * codec. */
case class PcmStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = PcmStats.resultType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pcm_stats expects binary, got $other")
  }

  override def nullSafeEval(payload: Any): Any = {
    val p = AudioHeaders.parsePcmStats(payload.asInstanceOf[Array[Byte]])
    if (p == null) null
    else InternalRow(p._1, p._2, p._3, p._4)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("pcmStats", this, classOf[PcmStats].getName)
    val r = ctx.freshName("pcmSt")
    nullSafeCodeGen(ctx, ev, b => {
      s"""
         |Object $r = $self.nullSafeEval($b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $r; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PcmStats =
    copy(child = newChild)

  override def prettyName: String = "pcm_stats"
}

object PcmStats {
  val resultType: StructType = StructType(Seq(
    StructField("n_samples", LongType),
    StructField("peak", IntegerType),
    StructField("sum_sq", LongType),
    StructField("n_clip", LongType)))

  def pcmStats(media: Column): Column =
    GraftColumnShim.column(PcmStats(GraftColumnShim.expression(media)))
}

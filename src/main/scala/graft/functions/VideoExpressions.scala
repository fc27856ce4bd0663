package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Library-free MP4 (ISO BMFF) header parsing — the video face of the
  * multimodal container trio ([[ImageHeaders]], [[AudioHeaders]]). Walks
  * the top-level box chain to `ftyp` (major brand) and into `moov` to
  * `mvhd` (movie timescale + duration), per the public ISO 14496-12
  * layout; duration surfaces as exact integer micros. Only sample/frame
  * decode stays behind the multimodal stub.
  */
object VideoHeaders {
  /** (brand, timescale, duration_us), or null when the payload is not an
    * ISO-BMFF container with ftyp + moov/mvhd. */
  def parseMp4(b: Array[Byte]): (String, Int, Long) = {
    if (b == null || b.length < 16) return null
    var brand: String = null
    var timescale = -1
    var durTicks = -1L
    var i = 0
    var first = true
    while (i + 8 <= b.length && (brand == null || timescale < 0)) {
      val (size, hdr) = boxSize(b, i)
      if (size < hdr || i + size > b.length) return null
      val typ = tag(b, i + 4)
      if (first && typ != "ftyp") return null // ISO BMFF leads with ftyp
      first = false
      typ match {
        case "ftyp" if size >= hdr + 4 =>
          brand = tag(b, i + hdr)
        case "moov" =>
          // walk children of moov for mvhd
          var j = i + hdr
          val end = i + size
          while (j + 8 <= end && timescale < 0) {
            val (csize, chdr) = boxSize(b, j)
            if (csize < chdr || j + csize > end) return null
            if (tag(b, j + 4) == "mvhd" && csize >= chdr + 4) {
              val v = u(b, j + chdr)
              if (v == 0 && csize >= chdr + 20) {
                timescale = be32(b, j + chdr + 12)
                durTicks = be32(b, j + chdr + 16).toLong & 0xffffffffL
              } else if (v == 1 && csize >= chdr + 32) {
                // v1 layout: 8+8 create/modify, 4 timescale at +20, then an
                // 8-byte duration at +24 — the box must hold all 32 bytes
                timescale = be32(b, j + chdr + 20)
                durTicks = be64(b, j + chdr + 24)
              } else return null
            }
            j += csize.toInt
          }
        case _ => ()
      }
      i += size.toInt
    }
    if (brand == null || timescale <= 0 || durTicks < 0) null
    else (brand, timescale, durTicks * 1000000L / timescale)
  }

  /** (total box size, header length). size==1 → 64-bit largesize follows;
    * size==0 (box runs to EOF) is surfaced as remaining length. */
  private def boxSize(b: Array[Byte], i: Int): (Long, Int) = {
    val s = be32(b, i).toLong & 0xffffffffL
    if (s == 1L && i + 16 <= b.length) (be64(b, i + 8), 16)
    else if (s == 0L) ((b.length - i).toLong, 8)
    else (s, 8)
  }

  private def u(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def tag(b: Array[Byte], i: Int): String =
    if (i + 4 > b.length) "" else new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
  private def be32(b: Array[Byte], i: Int): Int =
    (u(b, i) << 24) | (u(b, i + 1) << 16) | (u(b, i + 2) << 8) | u(b, i + 3)
  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i).toLong << 32) | (be32(b, i + 4).toLong & 0xffffffffL)

  private def be32b(v: Int): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  /** A valid ftyp + moov(mvhd v0) + mdat(body) container — the
    * deterministic inverse of [[parseMp4]] for the header part. */
  def buildMp4(brand: String, timescale: Int, durTicks: Int, body: Array[Byte]): Array[Byte] = {
    require(brand.length == 4, "brand must be a 4cc")
    val ftyp = be32b(16) ++ "ftyp".getBytes ++ brand.getBytes ++ be32b(0)
    val mvhd = be32b(108) ++ "mvhd".getBytes ++ be32b(0) /* v0+flags */ ++
      be32b(0) ++ be32b(0) /* creation, modification */ ++
      be32b(timescale) ++ be32b(durTicks) ++
      be32b(0x00010000) /* rate 1.0 */ ++ new Array[Byte](2 + 10 + 36 + 24) ++
      be32b(2) /* next track id */
    val moov = be32b(8 + mvhd.length) ++ "moov".getBytes ++ mvhd
    val mdat = be32b(8 + body.length) ++ "mdat".getBytes ++ body
    ftyp ++ moov ++ mdat
  }
}

/** `video_header(binary)` → `struct<brand string, timescale int,
  * duration_us long>`, null for non-ISO-BMFF payloads. Codegen'd, same
  * posture as `image_header`/`audio_header`. */
case class VideoHeader(child: Expression) extends UnaryExpression {
  override def dataType: DataType = VideoHeader.resultType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"video_header expects binary, got $other")
  }

  override def nullSafeEval(payload: Any): Any = {
    val parsed = VideoHeaders.parseMp4(payload.asInstanceOf[Array[Byte]])
    if (parsed == null) null
    else InternalRow(UTF8String.fromString(parsed._1), parsed._2, parsed._3)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("videoHeader", this, classOf[VideoHeader].getName)
    val r = ctx.freshName("vidHdr")
    nullSafeCodeGen(ctx, ev, b => {
      s"""
         |Object $r = $self.nullSafeEval($b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $r; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): VideoHeader =
    copy(child = newChild)

  override def prettyName: String = "video_header"
}

object VideoHeader {
  val resultType: StructType = StructType(Seq(
    StructField("brand", StringType),
    StructField("timescale", IntegerType),
    StructField("duration_us", LongType)))

  def videoHeader(media: Column): Column =
    GraftColumnShim.column(VideoHeader(GraftColumnShim.expression(media)))
}

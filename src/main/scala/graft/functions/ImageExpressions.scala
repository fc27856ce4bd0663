package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Library-free image container header parsing — the honest in-container
  * slice of the multimodal decode pillar. Formats are identified and their
  * dimensions read straight from the public container layouts (PNG IHDR,
  * JPEG SOF segment scan, GIF logical screen descriptor, BMP DIB header);
  * no codec library involved, so this part of [[graft.multimodal.Multimodal]]
  * is REAL, not stubbed — only pixel decode stays behind the stub.
  */
object ImageHeaders {
  /** (format, width, height), or null when the payload is not a recognized
    * image container. Pure function of the leading bytes. */
  def parse(b: Array[Byte]): (String, Int, Int) = {
    if (b == null) null
    else if (isPng(b)) ("png", be32(b, 16), be32(b, 20))
    else if (isGif(b)) ("gif", le16(b, 6), le16(b, 8))
    // biHeight < 0 means a top-down DIB (row order flipped, same pixel
    // count) — surface the magnitude, matching the png/jpeg convention
    else if (isBmp(b)) ("bmp", le32(b, 18), math.abs(le32(b, 22)))
    else if (isJpeg(b)) parseJpeg(b)
    else null
  }

  private def u(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u(b, i) << 8) | u(b, i + 1)
  private def be32(b: Array[Byte], i: Int): Int =
    (u(b, i) << 24) | (u(b, i + 1) << 16) | (u(b, i + 2) << 8) | u(b, i + 3)
  private def le16(b: Array[Byte], i: Int): Int = u(b, i) | (u(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    u(b, i) | (u(b, i + 1) << 8) | (u(b, i + 2) << 16) | (u(b, i + 3) << 24)

  private def isPng(b: Array[Byte]): Boolean =
    b.length >= 24 && u(b, 0) == 0x89 && u(b, 1) == 'P' && u(b, 2) == 'N' &&
      u(b, 3) == 'G' && u(b, 4) == 0x0d && u(b, 5) == 0x0a && u(b, 6) == 0x1a &&
      u(b, 7) == 0x0a && u(b, 12) == 'I' && u(b, 13) == 'H' && u(b, 14) == 'D' &&
      u(b, 15) == 'R'

  private def isGif(b: Array[Byte]): Boolean =
    b.length >= 10 && u(b, 0) == 'G' && u(b, 1) == 'I' && u(b, 2) == 'F' &&
      u(b, 3) == '8' && (u(b, 4) == '7' || u(b, 4) == '9') && u(b, 5) == 'a'

  private def isBmp(b: Array[Byte]): Boolean =
    // require the 40-byte BITMAPINFOHEADER so width/height offsets are valid
    b.length >= 26 && u(b, 0) == 'B' && u(b, 1) == 'M' && le32(b, 14) >= 40 &&
      b.length >= 26 + 8

  private def isJpeg(b: Array[Byte]): Boolean =
    b.length >= 4 && u(b, 0) == 0xff && u(b, 1) == 0xd8

  /** Walk the JPEG marker chain to the first SOF segment (C0–CF minus the
    * non-frame C4/C8/CC); height is BE16 at +5, width at +7 within it. */
  private def parseJpeg(b: Array[Byte]): (String, Int, Int) = {
    var i = 2
    while (i + 3 < b.length) {
      if (u(b, i) != 0xff) return null // desynced marker chain
      val m = u(b, i + 1)
      if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01 || m == 0xff) {
        // standalone markers (no length field) / fill byte
        i += (if (m == 0xff) 1 else 2)
      } else {
        val len = be16(b, i + 2)
        if (len < 2) return null
        if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
          if (i + 8 >= b.length) return null
          return ("jpeg", be16(b, i + 7), be16(b, i + 5))
        }
        i += 2 + len
      }
    }
    null
  }

  // --- deterministic container builders (test/query fixtures; the inverse
  // of parse for the header part — bodies are arbitrary payload bytes) ---

  private def be32b(v: Int): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def le16b(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32b(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** A syntactically valid PNG signature + IHDR carrying (w, h), followed by
    * `body` as opaque trailing bytes (no CRC check is performed by header
    * parsers, ours included — pixel data is irrelevant to the header path). */
  def buildPng(w: Int, h: Int, body: Array[Byte]): Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
      be32b(13) ++ "IHDR".getBytes ++ be32b(w) ++ be32b(h) ++
      Array[Byte](8, 2, 0, 0, 0) ++ be32b(0) ++ body

  def buildGif(w: Int, h: Int, body: Array[Byte]): Array[Byte] =
    "GIF89a".getBytes ++ le16b(w) ++ le16b(h) ++
      Array[Byte](0, 0, 0) ++ body

  def buildBmp(w: Int, h: Int, body: Array[Byte]): Array[Byte] =
    "BM".getBytes ++ le32b(54 + body.length) ++ le32b(0) ++ le32b(54) ++
      le32b(40) ++ le32b(w) ++ le32b(h) ++ le16b(1) ++ le16b(24) ++
      new Array[Byte](24) ++ body

  /** Minimal SOI + APP0 + SOF0 prefix carrying (w, h), then `body`. */
  def buildJpeg(w: Int, h: Int, body: Array[Byte]): Array[Byte] = {
    val sof = Array[Byte](0xff.toByte, 0xc0.toByte, 0, 11, 8) ++
      Array(((h >> 8) & 0xff).toByte, (h & 0xff).toByte,
        ((w >> 8) & 0xff).toByte, (w & 0xff).toByte) ++ Array[Byte](1, 0x11, 0)
    Array(0xff, 0xd8).map(_.toByte) ++ sof ++ body
  }
}

/** `image_header(binary)` → `struct<format string, width int, height int>`,
  * null for unrecognized payloads. Catalyst-native so header triage of a
  * 100 TB media corpus stays inside whole-stage codegen — no UDF boxing,
  * no Python round trip; the one opaque call pattern matches
  * pack_chunk/gear_boundaries. */
case class ImageHeader(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ImageHeader.resultType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"image_header expects binary, got $other")
  }

  override def nullSafeEval(payload: Any): Any = {
    val parsed = ImageHeaders.parse(payload.asInstanceOf[Array[Byte]])
    if (parsed == null) null
    else InternalRow(UTF8String.fromString(parsed._1), parsed._2, parsed._3)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("imageHeader", this, classOf[ImageHeader].getName)
    val r = ctx.freshName("imgHdr")
    nullSafeCodeGen(ctx, ev, b => {
      s"""
         |Object $r = $self.nullSafeEval($b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $r; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): ImageHeader =
    copy(child = newChild)

  override def prettyName: String = "image_header"
}

object ImageHeader {
  val resultType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  def imageHeader(media: Column): Column =
    GraftColumnShim.column(ImageHeader(GraftColumnShim.expression(media)))
}

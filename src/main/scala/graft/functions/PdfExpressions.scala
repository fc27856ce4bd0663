package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Library-free PDF STRUCTURE walk (ISO 32000 / the public Adobe PDF
  * Reference file layout): header version, cross-reference table, trailer,
  * and the Catalog → Pages chain that carries the page count. This is
  * container syntax only — no content-stream decode, no fonts — the same
  * triage depth as the ISO-BMFF/Matroska walks: enough to type, size, and
  * route a crawl's biggest document format without trusting its payload.
  *
  * The walk follows the spec's own discovery order, not heuristics:
  * `startxref` (scanned from the tail, like ZIP's EOCD) → the `xref`
  * table's object offsets → `trailer /Size /Root` → the Catalog object's
  * `/Pages` reference → that object's `/Count`. A `/Type /Page` substring
  * census would miscount (`/Pages` shares the prefix, and nested page
  * trees repeat); `/Count` on the root Pages node is the spec's number.
  * Null for anything that breaks on the way — truncated tails, dangling
  * xref offsets, non-PDF bytes — malformed input routes, never throws. */
object Pdfs {

  private val Ascii = java.nio.charset.StandardCharsets.ISO_8859_1

  /** Decode a bounded ASCII window starting at `at` (PDF structure tokens
    * are 7-bit; ISO-8859-1 keeps byte positions == char positions). */
  private def window(b: Array[Byte], at: Int, len: Int): String = {
    if (at < 0 || at >= b.length) return null
    new String(b, at, math.min(len, b.length - at), Ascii)
  }

  /** First integer after `key` inside `s`, or -1. */
  private def intAfter(s: String, key: String): Long = {
    val i = s.indexOf(key)
    if (i < 0) return -1L
    var j = i + key.length
    while (j < s.length && (s(j) == ' ' || s(j) == '\n' || s(j) == '\r')) j += 1
    val start = j
    while (j < s.length && s(j).isDigit) j += 1
    if (j == start) -1L else s.substring(start, j).toLong
  }

  /** (version, n_objects, n_pages) or null. */
  def pdfMeta(b: Array[Byte]): (String, Int, Int) = {
    if (b == null || b.length < 32) return null
    // 1. header: %PDF-M.N
    val head = window(b, 0, 16)
    if (head == null || !head.startsWith("%PDF-")) return null
    val ver = head.drop(5).takeWhile(c => c.isDigit || c == '.')
    if (!ver.matches("\\d+\\.\\d+")) return null
    // 2. startxref from the tail (spec: last 1024 bytes must contain it)
    val tail = window(b, math.max(0, b.length - 1024), 1024)
    val sx = tail.lastIndexOf("startxref")
    if (sx < 0) return null
    val xrefOff = intAfter(tail.substring(sx), "startxref")
    if (xrefOff < 0 || xrefOff >= b.length) return null
    // 3. xref table: "xref\n<first> <count>\n" + 20-byte entries
    val xr = window(b, xrefOff.toInt, 64)
    if (xr == null || !xr.startsWith("xref")) return null
    var p = 4
    while (p < xr.length && (xr(p) == '\n' || xr(p) == '\r')) p += 1
    val hdrEnd = xr.indexOf('\n', p)
    if (hdrEnd < 0) return null
    val parts = xr.substring(p, hdrEnd).trim.split(" ")
    if (parts.length != 2 || !parts.forall(_.forall(_.isDigit))) return null
    val first = parts(0).toInt
    val count = parts(1).toInt
    val entriesAt = xrefOff.toInt + hdrEnd + 1
    if (count <= 0 || entriesAt + 20L * count > b.length) return null
    def objOffset(num: Int): Long = {
      if (num < first || num >= first + count) return -1L
      val e = window(b, entriesAt + 20 * (num - first), 20)
      if (e == null || e.length < 18 || e(17) != 'n') return -1L
      val off = e.substring(0, 10)
      if (!off.forall(_.isDigit)) return -1L
      off.toLong
    }
    // 4. trailer: /Size and /Root
    val trailerAt = entriesAt + 20 * count
    val tr = window(b, trailerAt, 256)
    if (tr == null || !tr.startsWith("trailer")) return null
    val size = intAfter(tr, "/Size")
    val root = intAfter(tr, "/Root")
    if (size <= 0 || root < 0) return null
    // 5. Catalog object → /Pages reference
    val catAt = objOffset(root.toInt)
    if (catAt < 0 || catAt >= b.length) return null
    val cat = window(b, catAt.toInt, 256)
    if (cat == null || !cat.contains("/Type /Catalog")) return null
    val pagesRef = intAfter(cat, "/Pages")
    if (pagesRef < 0) return null
    // 6. Pages object → /Count
    val pgAt = objOffset(pagesRef.toInt)
    if (pgAt < 0 || pgAt >= b.length) return null
    val pg = window(b, pgAt.toInt, 512)
    if (pg == null || !pg.contains("/Type /Pages")) return null
    val nPages = intAfter(pg, "/Count")
    if (nPages < 0) return null
    (ver, size.toInt, nPages.toInt)
  }

  /** A classic uncompressed PDF: Catalog(1) → Pages(2) → `nPages` Page
    * objects, single xref table, trailer, startxref. Each page carries a
    * `/Pad` hex string of `padPerPage` bytes so fixture size scales. */
  def buildPdf(nPages: Int, padPerPage: Int = 0): Array[Byte] = {
    require(nPages >= 1 && padPerPage >= 0)
    val out = new java.lang.StringBuilder()
    val offsets = new Array[Long](nPages + 3) // 0 unused (free entry)
    out.append("%PDF-1.7\n")
    offsets(1) = out.length()
    out.append("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    offsets(2) = out.length()
    val kids = (0 until nPages).map(i => s"${i + 3} 0 R").mkString(" ")
    out.append(s"2 0 obj\n<< /Type /Pages /Kids [$kids] /Count $nPages >>\nendobj\n")
    var i = 0
    while (i < nPages) {
      offsets(i + 3) = out.length()
      val pad = if (padPerPage > 0)
        s" /Pad <${"4a" * padPerPage}>" else ""
      out.append(s"${i + 3} 0 obj\n<< /Type /Page /Parent 2 0 R " +
        s"/MediaBox [0 0 612 792]$pad >>\nendobj\n")
      i += 1
    }
    val xrefAt = out.length()
    val n = nPages + 3
    out.append(s"xref\n0 $n\n")
    out.append("0000000000 65535 f \n")
    var k = 1
    while (k < n) {
      out.append(f"${offsets(k)}%010d 00000 n \n")
      k += 1
    }
    out.append(s"trailer\n<< /Size $n /Root 1 0 R >>\n")
    out.append(s"startxref\n$xrefAt\n%%EOF\n")
    out.toString.getBytes(Ascii)
  }
}

/** `pdf_meta(binary)` → `struct<version string, n_objects int,
  * n_pages int>`; null for non-PDF or structurally broken input. */
case class PdfMeta(child: Expression) extends UnaryExpression {
  override def dataType: DataType = PdfMeta.resultType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pdf_meta expects binary, got $other")
  }

  override def nullSafeEval(payload: Any): Any = {
    val m = Pdfs.pdfMeta(payload.asInstanceOf[Array[Byte]])
    if (m == null) null
    else InternalRow(UTF8String.fromString(m._1), m._2, m._3)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("pdfMeta", this, classOf[PdfMeta].getName)
    val r = ctx.freshName("pdf")
    nullSafeCodeGen(ctx, ev, b => {
      s"""
         |Object $r = $self.nullSafeEval($b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $r; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PdfMeta =
    copy(child = newChild)

  override def prettyName: String = "pdf_meta"
}

object PdfMeta {
  val resultType: DataType = StructType(Seq(
    StructField("version", StringType),
    StructField("n_objects", IntegerType),
    StructField("n_pages", IntegerType)))

  def pdfMeta(media: Column): Column =
    GraftColumnShim.column(PdfMeta(GraftColumnShim.expression(media)))
}

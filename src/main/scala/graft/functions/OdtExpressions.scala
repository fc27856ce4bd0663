package graft.functions

import scala.util.control.NonFatal

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Library-free OpenDocument Text extraction (OASIS ODF 1.3, a public
  * spec; parts 2-3 define the package and schema). ODT is the
  * LibreOffice/OpenOffice sibling of DOCX: a ZIP whose `content.xml`
  * carries the body. Two schema rules make a naive tag-strip WRONG and
  * drive this walk:
  *
  *  - whitespace is ELEMENT-ENCODED (ODF part 3 §6.1.2-6.1.3): writers
  *    collapse runs of spaces and emit `<text:s text:c="N"/>` for N
  *    spaces, `<text:tab/>` for tabs, `<text:line-break/>` for newlines —
  *    strip those tags and the reconstructed text silently loses its
  *    whitespace (columns merge, the DOCX x232 lesson in ODF dress);
  *  - footnote/annotation subtrees (`<text:note>`, `<office:annotation>`)
  *    nest INSIDE paragraphs but are not body text.
  *
  * Paragraphs are `<text:p>` / `<text:h>` in document order, joined by
  * newline; `<text:span>` runs concatenate with no separator. The
  * `mimetype` member must read `application/vnd.oasis.opendocument.text`
  * (part 2 §3.3) — anything else quarantines (null), as does a missing
  * or unparseable `content.xml`. Never throws. */
object Odts {

  private val Mime = "application/vnd.oasis.opendocument.text"

  // hot-path patterns compiled once (these run per row at corpus scale,
  // and the space-run pattern would otherwise recompile per element)
  private val PRe = java.util.regex.Pattern.compile(
    "<text:(p|h)\\b[^>]*(/>|>(.*?)</text:\\1>)",
    java.util.regex.Pattern.DOTALL)
  private val SRe = java.util.regex.Pattern.compile("<text:s\\b([^>]*)/>")
  private val CRe = java.util.regex.Pattern.compile("text:c\\s*=\\s*\"(\\d+)\"")

  /** Body text of an ODT payload, or null when it isn't one. */
  def odtText(bytes: Array[Byte]): String = {
    try odtTextImpl(bytes)
    catch { case NonFatal(_) => null }
  }

  private def odtTextImpl(bytes: Array[Byte]): String = {
    val es = Archives.zipEntries(bytes)
    if (es == null) return null
    var mime: Array[Byte] = null
    var content: Array[Byte] = null
    for (e <- es if e._4 && e._5 != null) e._1 match {
      case "mimetype" => mime = e._5
      case "content.xml" => content = e._5
      case _ => ()
    }
    if (mime == null || new String(mime, "US-ASCII").trim != Mime) return null
    if (content == null) return null
    // note/annotation subtrees nest whole PARAGRAPHS inside a paragraph
    // (ODF part 3 §6.3), so they must drop BEFORE paragraph matching —
    // inside it they'd false-terminate the non-greedy body match
    val xml = new String(content, "UTF-8")
      .replaceAll("(?s)<text:note\\b.*?</text:note>", "")
      .replaceAll("(?s)<office:annotation\\b.*?</office:annotation>", "")
    val out = new java.lang.StringBuilder
    // <text:p>/<text:h> in document order; with note subtrees gone ODF
    // has no direct p-in-p nesting, so a non-greedy body match is exact.
    // Self-closing empty paragraphs contribute their newline.
    val m = PRe.matcher(xml)
    var first = true
    while (m.find()) {
      if (!first) out.append('\n')
      first = false
      val body = m.group(3)
      if (body != null) out.append(paraText(body))
    }
    if (first) null else out.toString
  }

  /** One paragraph's XML → text: expand the whitespace elements, strip
    * the remaining (span) tags, decode entities. */
  private def paraText(body: String): String = {
    var s = body
    s = s.replaceAll("<text:tab\\s*/>", "\t")
    s = s.replaceAll("<text:line-break\\s*/>", "\n")
    // <text:s text:c="N"/> = N spaces; bare <text:s/> = one
    val sb = new java.lang.StringBuilder
    val m = SRe.matcher(s)
    var last = 0
    while (m.find()) {
      sb.append(s, last, m.start())
      val cm = CRe.matcher(m.group(1))
      val n = if (cm.find()) math.min(cm.group(1).toInt, 1 << 20) else 1
      var k = 0
      while (k < n) { sb.append(' '); k += 1 }
      last = m.end()
    }
    sb.append(s, last, s.length)
    Epubs.decodeEntities(sb.toString.replaceAll("<[^>]*>", ""))
  }

  /** Fixture encoder the parser must invert exactly: paragraphs render
    * with runs split across two `<text:span>`s, tabs/newlines/space-runs
    * as their ODF elements (2+ spaces collapse to one plus
    * `<text:s text:c="N"/>` — the writer-side rule), plus a footnote and
    * an annotation that must NOT surface. `mimetype` ships stored-first
    * (part 2 §3.2's layout). */
  def buildOdt(paragraphs: Seq[String]): Array[Byte] = {
    def encodeRun(t: String): String = {
      val esc = Epubs.xmlEscape(t)
        .replace("\t", "<text:tab/>")
        .replace("\n", "<text:line-break/>")
      // collapse space runs: " " * n -> " " + <text:s text:c="n-1"/>
      val m = java.util.regex.Pattern.compile("  +").matcher(esc)
      val sb = new java.lang.StringBuilder
      var last = 0
      while (m.find()) {
        sb.append(esc, last, m.start()).append(' ')
          .append("<text:s text:c=\"").append(m.end() - m.start() - 1)
          .append("\"/>")
        last = m.end()
      }
      sb.append(esc, last, esc.length)
      sb.toString
    }
    val ps = paragraphs.map { p =>
      val cut = p.length / 2
      "<text:p text:style-name=\"P1\"><text:span text:style-name=\"T1\">" +
        encodeRun(p.substring(0, cut)) + "</text:span><text:span>" +
        encodeRun(p.substring(cut)) +
        "<text:note text:note-class=\"footnote\"><text:note-body>" +
        "<text:p>not body text</text:p></text:note-body></text:note>" +
        "</text:span></text:p>"
    }.mkString
    val content =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<office:document-content
        |  xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0"
        |  xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0"
        |  office:version="1.3"><office:body><office:text>""".stripMargin +
        ps + "</office:text></office:body></office:document-content>"
    Archives.buildZip(Seq(
      ("mimetype", Mime.getBytes("US-ASCII"), false),
      ("META-INF/manifest.xml",
        "<manifest:manifest/>".getBytes("UTF-8"), true),
      ("content.xml", content.getBytes("UTF-8"), true),
      ("styles.xml", "<office:document-styles/>".getBytes("UTF-8"), true)))
  }
}

/** `odt_text(binary)` → body text (paragraphs newline-joined); null when
  * the payload is not an OpenDocument Text package. */
case class OdtText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"odt_text expects binary, got $other")
  }

  override def nullSafeEval(payload: Any): Any = {
    val s = Odts.odtText(payload.asInstanceOf[Array[Byte]])
    if (s == null) null else UTF8String.fromString(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("odtText", this, classOf[OdtText].getName)
    val r = ctx.freshName("odt")
    nullSafeCodeGen(ctx, ev, b => {
      s"""
         |Object $r = $self.nullSafeEval($b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.unsafe.types.UTF8String) $r; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): OdtText =
    copy(child = newChild)

  override def prettyName: String = "odt_text"
}

object OdtText {
  def odtText(media: Column): Column =
    GraftColumnShim.column(OdtText(GraftColumnShim.expression(media)))
}

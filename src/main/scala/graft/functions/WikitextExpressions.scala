package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Wikitext → plain text (the MediaWiki twin of the x160 HTML
  * main-text pull): what a corpus stage needs from a `pages-articles`
  * dump is the PROSE, not `{{infobox}}` payloads, `[[File:…]]`
  * plumbing, or `<ref>` citations. Implements the public MediaWiki
  * markup constructs (mediawiki.org/wiki/Help:Formatting, Help:Links,
  * Help:Templates) with deterministic, documented semantics:
  *
  *  - `<!-- … -->` comments removed;
  *  - `<ref …>…</ref>` / `<ref … />` removed with their content;
  *  - `{{ … }}` templates and `{| … |}` tables removed whole,
  *    NESTING-AWARE (a regex cannot do this); an unclosed opener
  *    drops the remainder — never throws, never leaks half a template;
  *  - `[[target|label]]` → label (label recursively processed),
  *    `[[target]]` → target; `File:`/`Image:`/`Category:` namespace
  *    links dropped whole, including nested caption links;
  *  - `[http://… label]` → label; bare `[http://…]` dropped;
  *  - remaining markup tags `<…>` stripped (content kept);
  *  - heading lines `== H ==` → `H`; list/indent markers `*#;:`
  *    stripped at line start;
  *  - `''`/`'''`/`'''''` quote runs removed (a 4-run also removes
  *    whole — documented divergence on that pathological corner);
  *  - the five common entities decoded, `&amp;` last.
  *
  * No global whitespace collapsing: removals leave exactly the
  * neighboring characters, so expected output is computable by
  * construction (the x252 oracle states it in SQL). */
object Wikitext {

  /** Dump WIRE form of element text: MediaWiki entity-escapes `&`,
    * `<`, `>` (and `"`) when writing page XML — a title or body
    * containing a literal `</text>` or `<page>` must not be able to
    * corrupt the dump ([[graft.streaming.Pipelines.wikidumpSink]]'s
    * write side; the x261 hostile-text gate). */
  def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  /** Inverse of [[xmlEscape]] plus the numeric apostrophe — `&amp;`
    * decoded LAST so `&amp;lt;` round-trips to the literal text
    * `&lt;`, not `<`. */
  def xmlUnescape(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&#39;", "'").replace("&amp;", "&")

  def plain(src: String): String = {
    if (src == null) return null
    var s = src
    s = s.replaceAll("(?s)<!--.*?-->", "")
    s = s.replaceAll("(?is)<ref[^>]*/>", "")
    s = s.replaceAll("(?is)<ref[^>]*>.*?</ref>", "")
    s = stripBraces(s)
    s = links(s)
    s = s.replaceAll("<[^>]*>", "")
    s = s.split("\n", -1).map(lineMarkup).mkString("\n")
    s = s.replaceAll("'{2,}", "")
    s = s.replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&nbsp;", " ")
      .replace("&#39;", "'").replace("&amp;", "&")
    s
  }

  /** Templates `{{…}}` and tables `{|…|}` removed whole, nesting-aware;
    * chars emit only at depth zero. */
  private def stripBraces(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    var tmpl = 0
    var tbl = 0
    while (i < s.length) {
      if (s.startsWith("{{", i)) { tmpl += 1; i += 2 }
      else if (tmpl > 0 && s.startsWith("}}", i)) { tmpl -= 1; i += 2 }
      else if (tmpl == 0 && s.startsWith("{|", i)) { tbl += 1; i += 2 }
      else if (tbl > 0 && s.startsWith("|}", i)) { tbl -= 1; i += 2 }
      else {
        if (tmpl == 0 && tbl == 0) sb.append(s.charAt(i))
        i += 1
      }
    }
    sb.toString
  }

  private val DroppedNs = Set("file", "image", "category")

  /** Internal and external link resolution (recursive on labels). */
  private def links(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      if (s.startsWith("[[", i)) {
        val end = matchLink(s, i)
        if (end < 0) i = s.length // unclosed: drop the remainder
        else {
          val inner = s.substring(i + 2, end - 2)
          val colon = inner.indexOf(':')
          val pipe = topLevelPipe(inner)
          val ns = if (colon >= 0 && (pipe < 0 || colon < pipe))
            inner.substring(0, colon).trim.toLowerCase else ""
          if (!DroppedNs.contains(ns)) {
            val label = if (pipe >= 0) inner.substring(pipe + 1) else inner
            sb.append(links(label))
          }
          i = end
        }
      } else if (s.charAt(i) == '[' && isUrlAt(s, i + 1)) {
        val close = s.indexOf(']', i + 1)
        if (close < 0) i = s.length
        else {
          val inner = s.substring(i + 1, close)
          val sp = inner.indexOf(' ')
          if (sp >= 0) sb.append(links(inner.substring(sp + 1)))
          i = close + 1
        }
      } else {
        sb.append(s.charAt(i))
        i += 1
      }
    }
    sb.toString
  }

  /** Index just past the `]]` matching the `[[` at `at`; -1 if unclosed. */
  private def matchLink(s: String, at: Int): Int = {
    var i = at + 2
    var depth = 1
    while (i < s.length && depth > 0) {
      if (s.startsWith("[[", i)) { depth += 1; i += 2 }
      else if (s.startsWith("]]", i)) { depth -= 1; i += 2 }
      else i += 1
    }
    if (depth == 0) i else -1
  }

  /** First `|` outside nested `[[…]]`; -1 when none. */
  private def topLevelPipe(inner: String): Int = {
    var i = 0
    var depth = 0
    while (i < inner.length) {
      if (inner.startsWith("[[", i)) { depth += 1; i += 2 }
      else if (inner.startsWith("]]", i)) { depth -= 1; i += 2 }
      else if (inner.charAt(i) == '|' && depth == 0) return i
      else i += 1
    }
    -1
  }

  private def isUrlAt(s: String, i: Int): Boolean =
    s.startsWith("http://", i) || s.startsWith("https://", i) ||
      s.startsWith("ftp://", i)

  private def lineMarkup(ln: String): String = {
    val h = ln match {
      case l if l.length >= 2 && l.startsWith("=") =>
        val m = java.util.regex.Pattern
          .compile("^(=+)(.*?)(=+)\\s*$").matcher(l)
        if (m.matches()) m.group(2).trim else l
      case l => l
    }
    var j = 0
    while (j < h.length && "*#;:".indexOf(h.charAt(j)) >= 0) j += 1
    if (j > 0) {
      var k = j
      while (k < h.length && h.charAt(k) == ' ') k += 1
      h.substring(k)
    } else h
  }
}

/** `wikitext_plain(string)` → prose with MediaWiki markup resolved
  * (see [[Wikitext.plain]]); null in, null out. */
case class WikitextPlain(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"wikitext_plain expects string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      Wikitext.plain(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("wikitextPlain", this,
      classOf[WikitextPlain].getName)
    val r = ctx.freshName("wt")
    nullSafeCodeGen(ctx, ev, b => {
      s"""
         |Object $r = $self.nullSafeEval($b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.unsafe.types.UTF8String) $r; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): WikitextPlain =
    copy(child = newChild)

  override def prettyName: String = "wikitext_plain"
}

object WikitextPlain {
  def wikitextPlain(c: Column): Column =
    GraftColumnShim.column(WikitextPlain(GraftColumnShim.expression(c)))
}

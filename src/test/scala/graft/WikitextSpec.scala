package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Wikitext

/** The wikitext → plain battery: every documented construct, its
  * nesting behavior, and the hostile/unclosed arms (never throw, never
  * leak half a construct). */
class WikitextSpec extends AnyFunSuite {

  private def p(s: String): String = Wikitext.plain(s)

  test("bold/italic quote runs") {
    assert(p("'''bold''' and ''italic'' and '''''both'''''") ==
      "bold and italic and both")
    assert(p("it's a quote") == "it's a quote")
  }

  test("templates remove whole, nesting-aware") {
    assert(p("a {{cite|x=1}} b") == "a  b")
    assert(p("a {{outer|{{inner|y}}|z}} b") == "a  b")
    assert(p("{{lead}}text") == "text")
  }

  test("unclosed template drops the remainder, never throws") {
    assert(p("keep {{broken this all goes") == "keep ")
  }

  test("tables remove whole, including nested") {
    assert(p("x\n{| class=t\n|-\n| cell || cell2\n|}\ny") == "x\n\ny")
    assert(p("a{| outer {| inner |} still |}b") == "ab")
  }

  test("internal links resolve to labels / targets") {
    assert(p("see [[Target]] now") == "see Target now")
    assert(p("see [[Target|the label]] now") == "see the label now")
    assert(p("[[a|[[b|c]] d]]") == "c d")
  }

  test("namespace links drop whole, caption links included") {
    assert(p("x [[File:Pic.jpg|thumb|a [[cap]] here]] y") == "x  y")
    assert(p("x [[Image:I.png]] y [[Category:Things]] z") == "x  y  z")
    // a namespaced TARGET with a label pipe before the colon is NOT a
    // dropped namespace
    assert(p("[[weird|has:colon]]") == "has:colon")
  }

  test("unclosed link drops the remainder") {
    assert(p("keep [[broken rest gone") == "keep ")
  }

  test("external links") {
    assert(p("a [http://x.org label text] b") == "a label text b")
    assert(p("a [https://x.org] b") == "a  b")
    assert(p("a [not a url] b") == "a [not a url] b")
  }

  test("refs and comments remove with content") {
    assert(p("a<ref>cite me</ref> b") == "a b")
    assert(p("a<ref name=x/> b") == "a b")
    assert(p("a<!-- hidden\nstuff --> b") == "a b")
  }

  test("headings and list markers") {
    assert(p("== Head ==\ntext") == "Head\ntext")
    assert(p("=== Deep ===  \ntext") == "Deep\ntext")
    assert(p("* item\n# numbered\n:: indented\n;term") ==
      "item\nnumbered\nindented\nterm")
    assert(p("not = a heading") == "not = a heading")
  }

  test("markup tags strip, content stays; entities decode last") {
    assert(p("a <small>tiny</small> b") == "a tiny b")
    assert(p("x &amp; y &lt;tag&gt; &quot;q&quot; &nbsp;z") ==
      "x & y <tag> \"q\"  z")
  }

  test("null in, null out") {
    assert(p(null) == null)
  }

  test("composed page body") {
    val src = "'''Body''' text 2{{cite|9}} of [[Doc 9|doc 9]] and " +
      "[[plain 2]]<ref>r2</ref>\n== Sec 2 ==\n* item 9\n" +
      "{| class=x\n|-\n|cell\n|}\nTail &amp; 9"
    assert(p(src) ==
      "Body text 2 of doc 9 and plain 2\nSec 2\nitem 9\n\nTail & 9")
  }
}

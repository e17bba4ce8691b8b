package graft

import graft.core.Extract
import graft.model.Span
import org.scalatest.funsuite.AnyFunSuite

/** The tolerant HTML tokenizer (HtmlScan) against hand-written real-world
 * markup — attributes, nesting, comments, entities, raw-text elements — plus
 * corpus-serializer parity (existing goldens depend on byte-equal spans).
 * Reference behavior being re-expressed: full DOM parse + anchor selection
 * (html.rs:25-27,71-87) and the href-less-anchor skip rule (html.rs:97-120). */
class HtmlParseSpec extends AnyFunSuite {

  private def t(s: String, off: Int) = Span(Span.Text, s, "", off)
  private def m(src: String, off: Int) = Span(Span.Media, "", src, off)
  private def l(text: String, href: String, off: Int) = Span(Span.Link, text, href, off)

  test("reference vectors: href-less anchors skipped, relative and scheme-filtered hrefs surface") {
    // html.rs:102-120 test_link_extractor / _ref / _http_only markup shapes
    val html =
      """<!DOCTYPE html>
        |<html><body>
        |<a>one</a>
        |<a href="http://example.com/">two</a>
        |<a href="/test">three</a>
        |<a href="mailto:x@example.com">four</a>
        |</body></html>""".stripMargin
    assert(Extract.rawHrefs(html) ==
      Seq("http://example.com/", "/test", "mailto:x@example.com"))
    // resolve + scheme filter downstream, as the reference chains them
    val resolved = Extract.rawHrefs(html).flatMap(Extract.resolveLink("http://ref.ref", _))
    assert(resolved == Seq("http://example.com/", "http://ref.ref/test"))
  }

  test("real-world attributes, quoting styles and inline nesting parse exactly") {
    val html =
      """<html><head><title>ignored title</title></head>
        |<body class="page">
        |<h1 id="top">Heading <em>text</em></h1>
        |<p class='lead' data-x="1">First <b>bold</b> paragraph.</p>
        |<img  alt="pic"  src=/images/a.png width=100>
        |<a class="btn" target="_blank" href='/go?a=1&b=2'>Click <span>here</span></a>
        |<div>tail</div>
        |</body></html>""".stripMargin
    assert(Extract.spansFromHtml(html) == Seq(
      t("Heading text", 0),
      t("First bold paragraph.", 1),
      m("/images/a.png", 2),
      l("Click here", "/go?a=1&b=2", 3),
      t("tail", 4)))
    assert(Extract.spanCoverage(html) == 1.0)
    assert(Extract.rawHrefs(html) == Seq("/go?a=1&b=2"))
  }

  test("entities decode in text and attribute values; raw ampersands survive") {
    val html = """<p>Tom &amp; Jerry &lt;3&gt; caf&#233; &#x41;&nbsp;B</p>
                 |<a href="/q?x=a&amp;y=b&unknown=1">A &amp; B</a>""".stripMargin
    assert(Extract.spansFromHtml(html) == Seq(
      t("Tom & Jerry <3> café A B", 0),
      l("A & B", "/q?x=a&y=b&unknown=1", 1)))
  }

  test("comments, CDATA, doctype, script and style content never become spans") {
    val html =
      """<!DOCTYPE html><!-- a comment with <a href="/fake">link</a> -->
        |<script>var a = "<a href='/js'>nope</a>";</script>
        |<style>p::before { content: "<img src=x>"; }</style>
        |<![CDATA[ <a href="/cdata">no</a> ]]>
        |<p>only real text</p>""".stripMargin
    assert(Extract.spansFromHtml(html) == Seq(t("only real text", 0)))
    assert(Extract.rawHrefs(html).isEmpty)
  }

  test("img inside an anchor keeps document order (link slot at open position)") {
    val html = """<a href="/card"><img src="/thumb.jpg"> Caption text</a><p>after</p>"""
    assert(Extract.spansFromHtml(html) == Seq(
      l("Caption text", "/card", 0),
      m("/thumb.jpg", 1),
      t("after", 2)))
  }

  test("unclosed anchors close at the next <a> or EOF; src-less img emits nothing") {
    val html = """<a href="/one">first<a href="/two">second<img alt="no src">"""
    assert(Extract.spansFromHtml(html) == Seq(
      l("first", "/one", 0), l("second", "/two", 1)))
    // literal '<' in text is text (HTML5), not a tag
    assert(Extract.spansFromHtml("<p>5 < 6 and x > y</p>") == Seq(t("5 < 6 and x > y", 0)))
  }

  test("block boundaries split text; whitespace normalizes; uppercase tags fold") {
    val html = "<BODY><P>  one\n  two  </P><DIV>three</DIV>four<BR>five</BODY>"
    assert(Extract.spansFromHtml(html) == Seq(
      t("one two", 0), t("three", 1), t("four", 2), t("five", 3)))
  }

  test("coverage: href-less anchor text is the ONLY deduction, and it is exact") {
    val html = """<a name="x">dropped</a><p>keptkept</p>"""
    // captured 8 chars ("keptkept"), rule-dropped 7 ("dropped")
    assert(math.abs(Extract.spanCoverage(html) - 8.0 / 15.0) < 1e-12)
    assert(Extract.spansFromHtml(html) == Seq(t("keptkept", 0)))
    // pure-markup and empty bodies define coverage as 1.0
    assert(Extract.spanCoverage("") == 1.0)
    assert(Extract.spanCoverage("<html><body></body></html>") == 1.0)
  }

  test("corpus-serializer parity: spansFromHtml(pageHtml) == pageSpans, every page") {
    val cfg = graft.corpus.CorpusConfig(seed = 42L, numHosts = 6, maxPages = 12)
    for (h <- 0 until cfg.numHosts; p <- 0 until graft.corpus.CorpusGen.pageCount(cfg, h)) {
      val html = graft.corpus.CorpusGen.pageHtml(cfg, h, p)
      val want = graft.corpus.CorpusGen.pageSpans(cfg, h, p)
      assert(Extract.spansFromHtml(html) == want, s"span drift on h$h/p$p")
      assert(Extract.rawHrefs(html) == want.filter(_.kind == Span.Link).map(_.media_ref),
        s"href drift on h$h/p$p")
    }
  }

  test("hrefs-only mode emits exactly the full parse's hrefs (corpus + gnarly fixtures)") {
    // the non-archiving fetch and streaming link extraction run the
    // tokenizer with buildSpans=false — anchor/attribute handling must not
    // drift from the span-building pass on ANY input shape
    val gnarly = Seq(
      """<a href=/one>x</a><a name=skip>y</a><A HREF='/two?a=1&amp;b=2'>z""",
      """<p>text <a class=btn href="/q?x=%20y">link <img src=/i.png></a> tail</p>""",
      """<script>var a = "<a href=/fake>";</script><a href=/real>r</a>""",
      """<!-- <a href=/no> --><a href="/yes">y</a><![CDATA[<a href=/cd>]]>""",
      """broken < tag <a href= >empty</a><a href>no value</a>""",
      """<div><a href="/outer">one<a href="/inner">two</a></div>""")
    val cfg = graft.corpus.CorpusConfig(seed = 42L, numHosts = 4, maxPages = 8)
    val corpus = for (h <- 0 until cfg.numHosts;
        p <- 0 until graft.corpus.CorpusGen.pageCount(cfg, h))
      yield graft.corpus.CorpusGen.pageHtml(cfg, h, p)
    (gnarly ++ corpus).foreach { html =>
      val full = Extract.parsePage(html, withSpans = true)
      val lean = Extract.parsePage(html, withSpans = false)
      assert(lean._1 == full._1, s"href drift in hrefs-only mode on: ${html.take(60)}")
      assert(lean._2.isEmpty && lean._3 == 0.0)
    }
  }
}

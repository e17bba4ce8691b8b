package graft

import graft.core.{Extract, HostFilter, Robots, RobotsRules}
import org.scalatest.funsuite.AnyFunSuite

/** FIXTURES.md §2 (worker/src/filter/filter.rs:132-260) and §3
 * (worker/src/extractor/html.rs:93-172). */
class FilterExtractSpec extends AnyFunSuite {

  private val list = Seq("reddit.com", "bbc.co.uk", "dr.dk") // filter.rs:142-145
  private val white = HostFilter.Whitelist(list)
  private val black = HostFilter.Blacklist(list)

  test("whitelist keeps listed hosts (filter.rs:149-157,171-186)") {
    assert(white.keep("reddit.com"))
    assert(white.keep("bbc.co.uk"))
    assert(white.keep("www.reddit.com")) // substring-contains semantics
  }
  test("whitelist drops unlisted + host-less (filter.rs:159-169,77-86)") {
    assert(!white.keep("tv2.dk"))
    assert(!white.keep("okboomer.dk"))
    assert(!white.keep("")) // host-less URLs always dropped
  }
  test("blacklist drops listed, keeps others (filter.rs:188-228)") {
    assert(!black.keep("reddit.com"))
    assert(black.keep("tv2.dk"))
    assert(black.keep("okboomer.dk"))
  }
  test("NoFilter keeps everything (filter.rs:230-259)") {
    Seq("reddit.com", "tv2.dk", "").foreach(h => assert(HostFilter.NoFilter.keep(h)))
  }
  test("filter-list FILE ingestion: trimmed lines; empty file => NoFilter (filter.rs:93-105)") {
    val spark = SparkSuite.spark
    val dir = java.nio.file.Files.createTempDirectory("graft-filters")
    val listFile = dir.resolve("blacklist.txt")
    java.nio.file.Files.writeString(listFile, " reddit.com \n\n\tdr.dk\t\n")
    val loaded = HostFilter.parseList(
      spark.read.textFile(listFile.toString).collect().toSeq)
    assert(loaded.toSet == Set("reddit.com", "dr.dk"))
    assert(HostFilter.Blacklist(loaded).keep("www.dr.dk") == false)
    assert(HostFilter.Blacklist(loaded).keep("example.org"))
    // the reference SHIPS empty list files and defaults filtering off
    // (main.rs:182-188): empty file must degrade to the NoFilter default
    val empty = dir.resolve("whitelist.txt")
    java.nio.file.Files.writeString(empty, "")
    assert(HostFilter.parseList(
      spark.read.textFile(empty.toString).collect().toSeq).isEmpty)
  }

  test("list parsing trims lines (filter.rs:93-105)") {
    assert(HostFilter.parseList(Seq(" reddit.com ", "", "dr.dk\t")) ==
      Seq("reddit.com", "dr.dk"))
  }

  test("href-less anchors ignored (html.rs:97-120)") {
    val html = """<a>one</a><a href="http://example.com/">two</a>"""
    assert(Extract.linksFromHtml("http://ref.ref", html.getBytes("UTF-8")) ==
      Seq("http://example.com/"))
  }
  test("relative href resolved against base (html.rs:122-144)") {
    val html = """<a href="/test">rel</a>"""
    assert(Extract.linksFromHtml("http://ref.ref", html.getBytes("UTF-8")) ==
      Seq("http://ref.ref/test"))
  }
  test("non-http(s) schemes dropped (html.rs:147-171)") {
    val html = """<a href="mailto:example.com/">m</a><a href="urn:example.com/">u</a>"""
    assert(Extract.linksFromHtml("http://ref.ref", html.getBytes("UTF-8")).isEmpty)
  }
  test("single-quoted and unquoted hrefs parsed") {
    val html = """<a href='http://a.com/x'>1</a><a href=http://b.com/y>2</a>"""
    assert(Extract.linksFromHtml("http://ref.ref", html.getBytes("UTF-8")) ==
      Seq("http://a.com/x", "http://b.com/y"))
  }

  test("robots: longest-prefix disallow; allow overrides; empty=allow all") {
    val r = RobotsRules.parse(
      """User-agent: *
        |Disallow: /private
        |Allow: /private/ok
        |
        |User-agent: evilbot
        |Disallow: /
        |""".stripMargin)
    assert(r.isAllowed("/public/x"))
    assert(!r.isAllowed("/private/secret"))
    assert(r.isAllowed("/private/ok/file"))
    assert(RobotsRules.allowAll.isAllowed("/anything"))
    // the evilbot group must not leak into *
    assert(r.isAllowed("/"))
  }
  test("robots: Crawl-delay parses from the * group only; fractional rounds UP") {
    val r = RobotsRules.parse(
      """User-agent: *
        |Crawl-delay: 2
        |Disallow: /x
        |
        |User-agent: evilbot
        |Crawl-delay: 99
        |""".stripMargin)
    assert(r.crawlDelay.contains(2))
    assert(!r.isAllowed("/x7"))
    // fractional delays round UP (politer than requested, never ruder)
    assert(RobotsRules.parse("User-agent: *\nCrawl-delay: 0.5")
      .crawlDelay.contains(1))
    // junk / non-positive / absent ⇒ None
    assert(RobotsRules.parse("User-agent: *\nCrawl-delay: soon").crawlDelay.isEmpty)
    assert(RobotsRules.parse("User-agent: *\nCrawl-delay: 0").crawlDelay.isEmpty)
    assert(RobotsRules.parse("User-agent: *\nDisallow: /x").crawlDelay.isEmpty)
    // a delay in a foreign group must not leak into *
    assert(RobotsRules.parse("User-agent: evilbot\nCrawl-delay: 9").crawlDelay.isEmpty)
  }

  test("robots prefix helper matches UDF semantics") {
    assert(Robots.pathOf("http://h1.example/x7") == "/x7")
    assert(Robots.pathOf("http://h1.example") == "")
    assert(!Robots.allowed(Seq("/x"), "http://h1.example/x7"))
    assert(Robots.allowed(Seq("/x"), "http://h1.example/p7"))
    assert(Robots.allowed(Nil, "http://h1.example/x7"))
  }

  test("spanCoverage: corpus pages score high; real-world markup parses fully (r4 tokenizer)") {
    val cfg = graft.corpus.CorpusConfig(seed = 42L, numHosts = 8, maxPages = 16)
    val html = graft.corpus.CorpusGen.pageHtml(cfg, 1, 0)
    assert(Extract.spansFromHtml(html).nonEmpty)
    // exact coverage: the only deduction is the serializer's 14-char
    // href-less `no-href anchor` chrome (rule-dropped, html.rs:97-120)
    assert(Extract.spanCoverage(html) > 0.8,
      s"corpus page coverage ${Extract.spanCoverage(html)}")
    // real-world attributes/nesting now PARSE instead of silently truncating
    // (the round-4 corpus-shape restriction is gone — HtmlScan)
    val real = """<html><body><p class="lead">real paragraph</p><div>text</div></body></html>"""
    assert(Extract.spansFromHtml(real) == Seq(
      graft.model.Span(graft.model.Span.Text, "real paragraph", "", 0),
      graft.model.Span(graft.model.Span.Text, "text", "", 1)))
    assert(Extract.spanCoverage(real) == 1.0,
      s"fully-parsed page scored ${Extract.spanCoverage(real)}")
  }
}

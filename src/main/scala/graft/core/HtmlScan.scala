package graft.core

import graft.model.Span

/** One-pass tolerant HTML tokenizer + span-model builder.
 *
 * The reference parses fetched pages with a full HTML5 parser and walks the
 * element tree (html.rs:25-27 `Html::parse_document`, html.rs:71-87 anchor
 * selection); this is the Spark-side equivalent: a hand-rolled HTML5-style
 * character scanner (no regex, no backtracking — suitable for the fetch
 * partition hot path) that tolerates arbitrary real-world markup: attributes
 * in any order and quoting style, nested/unclosed elements, comments,
 * doctype/CDATA/processing instructions, raw-text elements, uppercase tags,
 * character entities.
 *
 * One scan produces all three fetch-path products:
 *  - `hrefs`: every anchor carrying an `href` attribute, in document order —
 *    the reference's link extraction (html.rs:71-87; href-less anchors
 *    produce nothing, html.rs:97-120). Values are entity-decoded, as a DOM
 *    parser's `attr("href")` would return them.
 *  - `spans`: the interleaved span model (input_hint shape) — text spans at
 *    block boundaries, media spans from `<img src=…>`, link spans from
 *    hrefed anchors (anchor text filled at close, slot reserved at open so
 *    offsets follow document order). Offsets dense from 0.
 *  - `coverage`: captured visible text / all visible text (see below).
 *
 * Span-model rules (deterministic, golden-pinned):
 *  - Visible text accumulates and flushes as ONE whitespace-normalized text
 *    span at each block boundary (`p div h1-h6 li table tr td br hr …`,
 *    open or close), at each media/link emission point, and at EOF. Inline
 *    elements (`b i em span …`) do not split text.
 *  - `<img src=…>` emits a media span (`text=""`, src in `media_ref`);
 *    src-less images emit nothing.
 *  - `<a href=…>` reserves a link span at OPEN position; its text is the
 *    normalized visible text up to the matching `</a>` (a new `<a>` or EOF
 *    closes an unclosed anchor — anchors don't nest). Block tags inside an
 *    anchor contribute a word separator. An `<img>` inside an anchor emits
 *    its media span after the link slot (document order by open position).
 *  - Text inside an href-LESS anchor is dropped — the reference's skip rule
 *    (html.rs:97-120) applied to the span model; this also makes the corpus
 *    serializer's `<a name="top">` chrome invisible, keeping fetched spans
 *    byte-equal to the durable corpus (per-row span-sequence invariant).
 *  - Raw-text elements (`script style textarea title noscript template svg
 *    math iframe`) are skipped to their close tag: not archive text.
 *
 * `coverage` (the archive's `parse_cov` column) is EXACT under this scanner,
 * not a heuristic: captured span text chars / (captured + rule-dropped
 * visible chars). The only rule-dropped visible text is href-less anchor
 * content, so any page is ≈1.0 unless it is mostly dead-anchor chrome;
 * markup never counts against the denominator (closes the round-4 advice on
 * short corpus pages: their only deduction is the serializer's fixed
 * 14-char `no-href anchor` string).
 */
private[graft] object HtmlScan {

  final case class Result(spans: Vector[Span], hrefs: Vector[String],
      coverage: Double)

  private val Block: Set[String] = Set(
    "p", "div", "br", "hr", "h1", "h2", "h3", "h4", "h5", "h6",
    "li", "ul", "ol", "dl", "dt", "dd",
    "table", "thead", "tbody", "tfoot", "tr", "td", "th", "caption",
    "section", "article", "aside", "header", "footer", "nav", "main",
    "blockquote", "pre", "figure", "figcaption", "form", "fieldset",
    "center", "details", "summary", "address", "body", "html", "head")

  // content is not document text: skip to the matching close tag
  private val RawText: Set[String] = Set(
    "script", "style", "textarea", "title", "noscript", "template",
    "svg", "math", "iframe", "xmp", "noframes")

  /** One tokenizer pass. `buildSpans = false` is the hrefs-only hot path
   * (non-archiving fetch, streaming link extraction): anchor tracking and
   * attribute parsing are identical, but visible text is never accumulated,
   * normalized or wrapped in Span objects — and `coverage` is then a
   * meaningless 1.0 (callers in that mode must not record it). */
  def parse(html: String, buildSpans: Boolean = true): Result = {
    val n = html.length
    val spans = scala.collection.mutable.ArrayBuffer.empty[Span]
    val hrefs = Vector.newBuilder[String]
    val text = new java.lang.StringBuilder(64)  // visible text outside anchors
    val aText = new java.lang.StringBuilder(32) // visible text inside the open anchor
    val scratch = new java.lang.StringBuilder(8) // hrefs-only entity discard
    var aOpen = false
    var aHref: String = null // null ⇒ href-less anchor (text dropped by rule)
    var aIdx = -1            // reserved link-span slot for an hrefed anchor
    var dropped = 0L         // normalized chars of rule-dropped visible text
    var captured = 0L
    var i = 0

    def flushText(): Unit = if (buildSpans) {
      val s = normalize(text); text.setLength(0)
      if (s.nonEmpty) { spans += Span(Span.Text, s, "", spans.length); captured += s.length }
    }
    def closeAnchor(): Unit = if (aOpen) {
      if (buildSpans) {
        val s = normalize(aText); aText.setLength(0)
        if (aHref != null) { spans(aIdx) = spans(aIdx).copy(text = s); captured += s.length }
        else dropped += s.length
      }
      aOpen = false; aHref = null; aIdx = -1
    }
    def buf: java.lang.StringBuilder = if (aOpen) aText else text

    def skipRawText(name: String): Unit = {
      // scan for "</name" case-insensitively, then to the '>' after it
      val close = "</" + name
      var j = i
      var found = -1
      while (found < 0 && j <= n - close.length) {
        if (html.charAt(j) == '<' && html.regionMatches(true, j, close, 0, close.length))
          found = j
        j += 1
      }
      if (found < 0) { i = n; return }
      var k = found + close.length
      while (k < n && html.charAt(k) != '>') k += 1
      i = if (k < n) k + 1 else n
    }

    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (i + 3 < n && html.charAt(i + 1) == '!' && html.charAt(i + 2) == '-'
            && html.charAt(i + 3) == '-') {
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else if (i + 8 < n && html.regionMatches(false, i, "<![CDATA[", 0, 9)) {
          val end = html.indexOf("]]>", i + 9)
          i = if (end < 0) n else end + 3
        } else if (i + 1 < n && (html.charAt(i + 1) == '!' || html.charAt(i + 1) == '?')) {
          val end = html.indexOf('>', i + 2) // doctype / PI
          i = if (end < 0) n else end + 1
        } else if (i + 1 < n && html.charAt(i + 1) == '/') {
          if (i + 2 < n && isNameStart(html.charAt(i + 2))) {
            var j = i + 2
            while (j < n && isNameChar(html.charAt(j))) j += 1
            val name = html.substring(i + 2, j).toLowerCase
            val end = html.indexOf('>', j)
            i = if (end < 0) n else end + 1
            if (name == "a") closeAnchor()
            else if (Block(name)) {
              if (aOpen) { if (buildSpans) aText.append(' ') } else flushText()
            }
          } else { // "</" not followed by a name: HTML5 bogus comment
            val end = html.indexOf('>', i + 2)
            i = if (end < 0) n else end + 1
          }
        } else if (i + 1 < n && isNameStart(html.charAt(i + 1))) {
          var j = i + 1
          while (j < n && isNameChar(html.charAt(j))) j += 1
          val name = html.substring(i + 1, j).toLowerCase
          // attribute scan: first occurrence wins (HTML5), any quoting style
          var href: String = null; var hasHref = false
          var src: String = null
          var done = false
          while (!done && j < n) {
            while (j < n && isWs(html.charAt(j))) j += 1
            if (j >= n) done = true
            else html.charAt(j) match {
              case '>' => j += 1; done = true
              case '/' => j += 1 // self-closing slash (or stray): skip
              case _ =>
                val a0 = j
                while (j < n && !isWs(html.charAt(j)) && html.charAt(j) != '='
                    && html.charAt(j) != '>' && html.charAt(j) != '/') j += 1
                val attr = html.substring(a0, j).toLowerCase
                while (j < n && isWs(html.charAt(j))) j += 1
                var value = ""
                if (j < n && html.charAt(j) == '=') {
                  j += 1
                  while (j < n && isWs(html.charAt(j))) j += 1
                  if (j < n && (html.charAt(j) == '"' || html.charAt(j) == '\'')) {
                    val q = html.charAt(j); val v0 = j + 1
                    var k = v0
                    while (k < n && html.charAt(k) != q) k += 1
                    value = html.substring(v0, k)
                    j = if (k < n) k + 1 else n
                  } else {
                    val v0 = j
                    while (j < n && !isWs(html.charAt(j)) && html.charAt(j) != '>') j += 1
                    value = html.substring(v0, j)
                  }
                }
                if (attr == "href" && !hasHref) { hasHref = true; href = decodeEntities(value) }
                else if (attr == "src" && src == null) src = decodeEntities(value)
            }
          }
          i = j
          name match {
            case "a" =>
              closeAnchor() // anchors don't nest: a new <a> closes the previous
              flushText()
              aOpen = true
              if (hasHref) {
                aHref = href; hrefs += href
                if (buildSpans) {
                  aIdx = spans.length
                  spans += Span(Span.Link, "", href, spans.length)
                }
              }
            case "img" =>
              if (src != null && buildSpans) {
                if (!aOpen) flushText()
                spans += Span(Span.Media, "", src, spans.length)
              }
            case t if RawText(t) => skipRawText(t)
            case t if Block(t)   =>
              if (aOpen) { if (buildSpans) aText.append(' ') } else flushText()
            case _               => () // inline element: no text split
          }
        } else { // lone '<': literal text (HTML5)
          if (buildSpans) buf.append(c)
          i += 1
        }
      } else if (c == '&') {
        // entity scan must advance i identically in both modes
        i = if (buildSpans) appendEntity(html, i, buf)
            else { val nx = appendEntity(html, i, scratch); scratch.setLength(0); nx }
      } else { if (buildSpans) buf.append(c); i += 1 }
    }
    closeAnchor(); flushText()
    val cov = if (captured + dropped == 0) 1.0
              else captured.toDouble / (captured + dropped)
    Result(spans.toVector, hrefs.result(), cov)
  }

  private def isWs(c: Char): Boolean = c == ' ' || c == '\t' || c == '\n' ||
    c == '\r' || c == '\f'
  private def isNameStart(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
  private def isNameChar(c: Char): Boolean = isNameStart(c) ||
    (c >= '0' && c <= '9') || c == '-' || c == ':'

  /** Collapse whitespace runs (incl. NBSP) to single spaces; trim ends. */
  private def normalize(sb: java.lang.StringBuilder): String = {
    val out = new java.lang.StringBuilder(sb.length)
    var i = 0; var pendingSpace = false
    while (i < sb.length) {
      val c = sb.charAt(i)
      if (c.isWhitespace || c == '\u00A0') { if (out.length > 0) pendingSpace = true }
      else { if (pendingSpace) { out.append(' '); pendingSpace = false }; out.append(c) }
      i += 1
    }
    out.toString
  }

  /** Entity-decode a whole attribute value (what a DOM parser's `attr()`
   * returns). No-op fast path when the value has no '&'. */
  private def decodeEntities(s: String): String =
    if (s.indexOf('&') < 0) s
    else {
      val out = new java.lang.StringBuilder(s.length)
      var i = 0
      while (i < s.length) {
        if (s.charAt(i) == '&') i = appendEntity(s, i, out)
        else { out.append(s.charAt(i)); i += 1 }
      }
      out.toString
    }

  /** Decode the entity at `html(i) == '&'` into `out`; returns the next
   * index. Named basics + decimal/hex numeric refs, semicolon required;
   * anything else stays verbatim (so raw query strings like `?a=1&b=2`
   * survive untouched). */
  private def appendEntity(html: String, i: Int, out: java.lang.StringBuilder): Int = {
    val n = html.length
    val semi = {
      var j = i + 1; val cap = math.min(n, i + 12)
      while (j < cap && html.charAt(j) != ';') j += 1
      if (j < cap && j > i + 1) j else -1
    }
    if (semi < 0) { out.append('&'); return i + 1 }
    val body = html.substring(i + 1, semi)
    val decoded: Int =
      if (body.charAt(0) == '#') {
        try {
          val cp = if (body.length > 1 && (body.charAt(1) == 'x' || body.charAt(1) == 'X'))
            Integer.parseInt(body.substring(2), 16)
          else Integer.parseInt(body.substring(1), 10)
          if (Character.isValidCodePoint(cp) && cp > 0) cp else -1
        } catch { case _: NumberFormatException => -1 }
      } else body match {
        case "amp"  => '&'.toInt
        case "lt"   => '<'.toInt
        case "gt"   => '>'.toInt
        case "quot" => '"'.toInt
        case "apos" => '\''.toInt
        case "nbsp" => 0x00A0 // NBSP; normalize() folds it into a space
        case _      => -1
      }
    if (decoded < 0) { out.append('&'); i + 1 }
    else { out.appendCodePoint(decoded); semi + 1 }
  }
}

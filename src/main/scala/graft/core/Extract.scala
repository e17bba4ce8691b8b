package graft.core

import graft.model.Span

/**
 * Link extraction — re-expresses the reference's `HTMLLinkExtractor`
 * (worker/src/extractor/html.rs:62-91):
 *   - only anchors WITH an href are considered (html.rs:97-120)
 *   - hrefs are resolved against the page's base URL (html.rs:74-79)
 *   - only http/https survive (html.rs:80-86)
 * Failures at any step drop the candidate (`.ok()` ⇒ None).
 *
 * Two surfaces: span-model extraction (the durable corpus stores parsed
 * spans; links are `kind='link'` spans carrying the raw href in `media_ref`)
 * and a raw-HTML regex extractor for `body: BinaryType` payloads.
 */
object Extract {

  /** Resolve + scheme-filter one raw href against a base URL. */
  def resolveLink(baseUrl: String, rawHref: String): Option[String] =
    UrlCanon.resolve(baseUrl, rawHref).filter(UrlCanon.isFetchableScheme)

  /** Links of a span-model document, in span (offset) order. */
  def linksFromSpans(baseUrl: String, spans: Seq[Span]): Seq[String] =
    spans.sortBy(_.offset).iterator
      .filter(_.kind == Span.Link)
      .flatMap(s => resolveLink(baseUrl, s.media_ref))
      .toSeq

  // `<a ... href="...">` / `<a ... href='...'>` — href-less anchors produce
  // no match, mirroring html.rs:97-120.
  private val AnchorHref =
    """(?is)<a\b[^>]*?\bhref\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]+))""".r

  /** Raw hrefs of an HTML body, in document order. */
  def rawHrefs(html: String): Seq[String] =
    AnchorHref.findAllMatchIn(html).map { m =>
      Option(m.group(2)).orElse(Option(m.group(3))).getOrElse(m.group(4))
    }.toSeq

  /** Full raw-HTML pipeline: UTF-8 decode → anchor scan → resolve → scheme filter. */
  def linksFromHtml(baseUrl: String, body: Array[Byte]): Seq[String] =
    UrlCanon.decodeUtf8(body).toSeq.flatMap(h =>
      rawHrefs(h).flatMap(resolveLink(baseUrl, _)))

  // interleaved span scan: <p>text</p> | <img src=...> | <a href=...>text</a>
  // in document order; href-less anchors produce no match (html.rs:97-120)
  private val SpanTag = (
    """(?is)<p>(.*?)</p>""" +
    """|<img\b[^>]*?\bsrc\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]+))[^>]*>""" +
    """|<a\b[^>]*?\bhref\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]+))[^>]*>(.*?)</a>""").r

  /** Parse an HTML body into the interleaved span model (input_hint shape):
   * paragraphs → text spans, images → media spans, hrefed anchors → link
   * spans (raw href in `media_ref`), offsets dense from 0 in document
   * order — the inverse of the corpus serializer (CorpusGen.pageHtml), so an
   * HTTP-fetched page archives the exact span sequence the durable corpus
   * would store (per-row span-sequence invariant).
   *
   * CORPUS-SHAPE RESTRICTION: the scan matches the corpus serializer's
   * markup — literal attribute-less `<p>`, unnested tags. Real-world pages
   * (`<p class=…>`, nested markup) parse partially or empty with outcome
   * still Ok. The archive path therefore records `spanCoverage` alongside
   * the spans so silent truncation is DETECTABLE: corpus-shaped pages score
   * ≳0.8 (only the html/body wrapper is unmatched), a real page whose
   * content the scan missed scores near 0 — filter the archive on
   * `parse_cov` to find them. */
  def spansFromHtml(html: String): Seq[Span] = {
    val out = Seq.newBuilder[Span]
    var off = 0
    SpanTag.findAllMatchIn(html).foreach { m =>
      if (m.group(1) != null) {
        out += Span(Span.Text, m.group(1), "", off); off += 1
      } else if (m.group(2) != null) {
        val src = Option(m.group(3)).orElse(Option(m.group(4))).getOrElse(m.group(5))
        out += Span(Span.Media, "", src, off); off += 1
      } else {
        val href = Option(m.group(7)).orElse(Option(m.group(8))).getOrElse(m.group(9))
        out += Span(Span.Link, m.group(10), href, off); off += 1
      }
    }
    out.result()
  }

  /** Fraction of the body's characters consumed by `spansFromHtml` matches —
   * the parse-coverage signal of the corpus-shape restriction above. Cheap
   * (one regex pass, same automaton as the parse) and monotone in what the
   * parse actually captured: 0.0 means the scan saw nothing it recognises. */
  def spanCoverage(html: String): Double =
    if (html.isEmpty) 1.0
    else SpanTag.findAllMatchIn(html).map(m => m.end - m.start).sum.toDouble /
      html.length
}

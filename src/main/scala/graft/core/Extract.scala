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
}

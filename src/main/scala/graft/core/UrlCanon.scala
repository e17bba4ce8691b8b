package graft.core

import java.nio.charset.{CharacterCodingException, StandardCharsets}
import java.nio.charset.CodingErrorAction
import java.nio.ByteBuffer

/** Parsed URL components. Raw (still %-encoded) path/query/fragment. */
final case class ParsedUrl(
    scheme: String,
    userInfo: Option[String],
    host: Option[String],
    port: Option[Int],
    path: String,
    query: Option[String],
    fragment: Option[String],
    /** For non-hierarchical URLs (urn:, mailto:) the full scheme-specific part. */
    opaque: Option[String]
) {
  def isHierarchical: Boolean = opaque.isEmpty

  def render: String = {
    val sb = new StringBuilder(scheme).append(':')
    opaque match {
      case Some(ssp) => sb.append(ssp)
      case None =>
        sb.append("//")
        userInfo.foreach(u => sb.append(u).append('@'))
        host.foreach(sb.append(_))
        port.foreach(p => sb.append(':').append(p))
        sb.append(path)
        query.foreach(q => sb.append('?').append(q))
    }
    fragment.foreach(f => sb.append('#').append(f))
    sb.toString
  }
}

/**
 * RFC 3986 URL canonicalizer — pure, deterministic, total (Option-valued).
 *
 * Re-expresses the observable normalisation semantics of the reference's
 * `DefaultNormaliser` + `url`-crate parse
 * (reference: worker/src/normaliser/defaultnormaliser.rs:17-127,
 *  worker/src/task.rs:42-134):
 *   - scheme and host lowercased (defaultnormaliser.rs:62-78)
 *   - fragment stripped (defaultnormaliser.rs:44-45)
 *   - query pairs sorted stably by (key, value) (defaultnormaliser.rs:44-45)
 *   - %-encoded triplets uppercased in path and query
 *     (defaultnormaliser.rs:83-127; the reference's dead fragment pass is
 *     intentionally not reproduced, see SURVEY.md §7.4)
 *   - default port elided (http:80, https:443) (task.rs:87-93)
 *   - empty path for a host-ful URL becomes "/" (defaultnormaliser.rs:136-148)
 *   - userinfo / non-default port / path case / `www.` prefix preserved
 *     (task.rs:103-109, defaultnormaliser.rs:162-198)
 *   - host-less non-hierarchical URLs (urn:, mailto:) pass through unchanged
 *     apart from fragment strip (defaultnormaliser.rs:200-210)
 *   - schemes are never rewritten (https never downgraded — SURVEY.md §7.4)
 *
 * Invariant (property-tested): canonicalize is idempotent.
 */
object UrlCanon {

  private val DefaultPorts = Map("http" -> 80, "https" -> 443, "ws" -> 80, "wss" -> 443, "ftp" -> 21)

  /** Split "scheme:rest" without regex (hot path). RFC 3986 scheme =
   * ALPHA *( ALPHA / DIGIT / "+" / "-" / "." ). */
  private def schemeSplit(s: String): Option[(String, String)] = {
    if (s.isEmpty || !s.charAt(0).isLetter) return None
    var i = 1
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == ':') return Some((s.substring(0, i), s.substring(i + 1)))
      if (!(c.isLetterOrDigit || c == '+' || c == '.' || c == '-')) return None
      i += 1
    }
    None
  }

  /** Strict UTF-8 decode — invalid bytes reject the task
   * (reference: worker/src/task.rs:24-31,127-133). */
  def decodeUtf8(bytes: Array[Byte]): Option[String] = {
    val dec = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    try Some(dec.decode(ByteBuffer.wrap(bytes)).toString)
    catch { case _: CharacterCodingException => None }
  }

  /** Parse an absolute URL. Relative references (no scheme) are rejected,
   * matching the reference's `Url::parse` of raw task bytes
   * (worker/src/task.rs:119-125: `mail@aau.dk` ⇒ Err). */
  def parse(s: String): Option[ParsedUrl] = {
    schemeSplit(s.trim) match {
      case Some((scheme, rest)) =>
        if (rest.startsWith("//")) parseHierarchical(scheme, rest.drop(2))
        else {
          // non-hierarchical (urn:, mailto:, data:) — opaque scheme-specific part
          val (ssp, frag) = splitFragment(rest)
          Some(ParsedUrl(scheme, None, None, None, "", None, frag, Some(ssp)))
        }
      case None => None
    }
  }

  private def splitFragment(s: String): (String, Option[String]) = {
    val i = s.indexOf('#')
    if (i < 0) (s, None) else (s.substring(0, i), Some(s.substring(i + 1)))
  }

  private def parseHierarchical(scheme: String, rest: String): Option[ParsedUrl] = {
    val (beforeFrag, frag) = splitFragment(rest)
    val (beforeQuery, query) = {
      val i = beforeFrag.indexOf('?')
      if (i < 0) (beforeFrag, None)
      else (beforeFrag.substring(0, i), Some(beforeFrag.substring(i + 1)))
    }
    val slash = beforeQuery.indexOf('/')
    val (authority, path) =
      if (slash < 0) (beforeQuery, "") else (beforeQuery.substring(0, slash), beforeQuery.substring(slash))
    val (userInfo, hostPort) = {
      val at = authority.lastIndexOf('@')
      if (at < 0) (None, authority) else (Some(authority.substring(0, at)), authority.substring(at + 1))
    }
    val (hostStr, portOpt) =
      if (hostPort.startsWith("[")) { // IPv6 literal
        val end = hostPort.indexOf(']')
        if (end < 0) return None
        val h = hostPort.substring(0, end + 1)
        val after = hostPort.substring(end + 1)
        if (after.isEmpty) (h, None)
        else if (after.startsWith(":")) parsePort(after.drop(1)).map(p => (h, Some(p))).getOrElse(return None)
        else return None
      } else {
        val colon = hostPort.lastIndexOf(':')
        if (colon < 0) (hostPort, None)
        else parsePort(hostPort.substring(colon + 1)) match {
          case Some(p) => (hostPort.substring(0, colon), Some(p))
          case None => if (hostPort.substring(colon + 1).isEmpty) (hostPort.substring(0, colon), None) else return None
        }
      }
    if (hostStr.isEmpty) return None // http:// with no host is invalid
    if (!isValidHost(hostStr)) return None
    // RFC 3986 path normalization belongs to PARSING (the url crate's
    // Url::parse does it), not only to relative resolution: without it an
    // absolute href "http://e.com/a/../b" and a relative "b" resolved from
    // /a/ canonicalize to two different seen-set keys for one resource and
    // the crawler fetches it twice. "/." is the cheap guard — dot segments
    // always contain it (leading segments can't occur: path is ""-or-/-led).
    val normPath = if (path.contains("/.")) removeDotSegments(path) else path
    Some(ParsedUrl(scheme, userInfo, Some(hostStr), portOpt, normPath, query, frag, None))
  }

  private def parsePort(s: String): Option[Int] =
    if (s.nonEmpty && s.forall(_.isDigit) && s.length <= 5) {
      val p = s.toInt
      if (p <= 65535) Some(p) else None
    } else None

  private def isValidHost(h: String): Boolean =
    h.startsWith("[") || h.forall(c =>
      c.isLetterOrDigit || c == '.' || c == '-' || c == '_' || c == '%')

  @inline private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  /** Uppercase every %-encoded hex triplet (defaultnormaliser.rs:83-127).
   * Char-scan, no regex — this sits on the per-link hot path. */
  private[graft] def upperPercentTriplets(s: String): String = {
    if (s.indexOf('%') < 0) return s
    val chars = s.toCharArray
    var i = 0
    while (i < chars.length) {
      if (chars(i) == '%' && i + 2 < chars.length &&
          isHex(chars(i + 1)) && isHex(chars(i + 2))) {
        chars(i + 1) = Character.toUpperCase(chars(i + 1))
        chars(i + 2) = Character.toUpperCase(chars(i + 2))
        i += 3
      } else i += 1
    }
    new String(chars)
  }

  /** Stable sort of query pairs by (key, value); original pair text kept
   * otherwise intact (defaultnormaliser.rs:44-45 library pass). */
  private[core] def sortQuery(q: String): String =
    if (q.isEmpty) q
    else q.split("&", -1).toSeq.sortBy { pair =>
      val i = pair.indexOf('=')
      if (i < 0) (pair, "") else (pair.substring(0, i), pair.substring(i + 1))
    }.mkString("&")

  /** Canonical form, or None for unparseable input (Err ⇒ row dropped). */
  def canonicalize(s: String): Option[String] = parse(s).map(canonicalize)

  def canonicalize(u: ParsedUrl): String = {
    val scheme = u.scheme.toLowerCase
    if (!u.isHierarchical) {
      // host-less URL: untouched apart from fragment strip + scheme lowercase
      u.copy(scheme = scheme, fragment = None).render
    } else {
      val host = u.host.map(_.toLowerCase)
      val port = u.port.filterNot(p => DefaultPorts.get(scheme).contains(p))
      val path0 = if (u.path.isEmpty) "/" else u.path
      val path = upperPercentTriplets(path0)
      // uppercase %-triplets BEFORE sorting: sorting first is not idempotent
      // (same-key pairs '%2a' vs '%2B' sort differently before vs after the
      // case fold, so canonicalize(canonicalize(u)) could re-order them)
      val query = u.query.map(q => sortQuery(upperPercentTriplets(q))).filter(_.nonEmpty)
      ParsedUrl(scheme, u.userInfo, host, port, path, query, None, None).render
    }
  }

  /** Host of a canonical/parseable URL ("" when host-less). */
  def hostOf(s: String): String = parse(s).flatMap(_.host).map(_.toLowerCase).getOrElse("")

  /** Resolve a (possibly relative) href against a base URL — RFC 3986 §5
   * merge semantics (reference: worker/src/extractor/html.rs:74-79,
   * `Url::options().base_url(...)`). Returns the resolved ABSOLUTE url
   * (not yet canonicalized), or None. */
  def resolve(base: String, href: String): Option[String] =
    resolveToParsed(base, href).map(_.render)

  /** Parsed form of `resolve` — lets callers canonicalize without re-parsing
   * (the fused per-link hot path: one parse instead of three). */
  def resolveToParsed(base: String, href: String): Option[ParsedUrl] = {
    val h = href.trim
    if (h.isEmpty) return parse(base)
    // absolute already?
    if (schemeSplit(h).isDefined) return parse(h)
    parse(base).filter(_.isHierarchical).flatMap { b =>
      if (h.startsWith("//")) parse(b.scheme + ":" + h)
      else {
        val (rest, frag) = splitFragment(h)
        val (pq, query) = {
          val i = rest.indexOf('?')
          if (i < 0) (rest, None) else (rest.substring(0, i), Some(rest.substring(i + 1)))
        }
        val mergedPath =
          if (pq.isEmpty) b.path
          else if (pq.startsWith("/")) pq
          else {
            val basePath = if (b.path.isEmpty) "/" else b.path
            basePath.substring(0, basePath.lastIndexOf('/') + 1) + pq
          }
        val path = removeDotSegments(mergedPath)
        val q = if (pq.isEmpty && query.isEmpty) b.query else query
        Some(ParsedUrl(b.scheme, b.userInfo, b.host, b.port, path, q, frag, None))
      }
    }
  }

  /** RFC 3986 §5.2.4 remove_dot_segments. */
  private[graft] def removeDotSegments(path: String): String = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var in = path
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.drop(3)
      else if (in.startsWith("./")) in = in.drop(2)
      else if (in.startsWith("/./")) in = "/" + in.drop(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../")) { in = "/" + in.drop(4); if (out.nonEmpty) out.remove(out.length - 1) }
      else if (in == "/..") { in = "/"; if (out.nonEmpty) out.remove(out.length - 1) }
      else if (in == "." || in == "..") in = ""
      else {
        val start = if (in.startsWith("/")) 1 else 0
        val next = in.indexOf('/', start)
        val seg = if (next < 0) in else in.substring(0, next)
        out += seg
        in = if (next < 0) "" else in.substring(next)
      }
    }
    out.mkString
  }

  /** Keep only http/https (reference: worker/src/extractor/html.rs:80-86). */
  def isFetchableScheme(url: String): Boolean =
    parse(url).exists(p => { val s = p.scheme.toLowerCase; s == "http" || s == "https" })

  /** Host of an ALREADY-CANONICAL hierarchical URL, by char scan — no full
   * parse. Canonical form guarantees lowercase host directly after "//"
   * (or after the '@' of userinfo), terminated by ':', '/', '?' or end. */
  def hostOfCanonical(url: String): String = {
    val start0 = url.indexOf("//")
    if (start0 < 0) return ""
    var start = start0 + 2
    var end = start
    var at = -1
    while (end < url.length && {
      val c = url.charAt(end); c != '/' && c != '?' && c != '#'
    }) {
      if (url.charAt(end) == '@') at = end
      end += 1
    }
    if (at >= 0) start = at + 1
    if (start < end && url.charAt(start) == '[') { // IPv6 literal: [..]:port
      val close = url.indexOf(']', start)
      return if (close >= 0 && close < end) url.substring(start, close + 1) else ""
    }
    var hostEnd = start
    while (hostEnd < end && url.charAt(hostEnd) != ':') hostEnd += 1
    url.substring(start, hostEnd)
  }

  /** Fused per-link hot path: resolve href against base, scheme-filter,
   * canonicalize, and extract host — ONE parse, one render (the unfused
   * pipeline P2→P3→P4-P6→host parses the same URL three times). Semantics
   * identical by construction (property-tested against the unfused path). */
  def resolveCanonHost(base: String, href: String): Option[(String, String)] =
    resolveToParsed(base, href).flatMap { p =>
      val scheme = p.scheme.toLowerCase
      if (scheme != "http" && scheme != "https") None
      else p.host.map { h => (canonicalize(p), h.toLowerCase) }
    }
}

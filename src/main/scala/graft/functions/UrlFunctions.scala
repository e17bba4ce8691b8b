package graft.functions

import graft.core.{Extract, UrlCanon}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/**
 * Column-level URL functions. All are PURE and registered deterministic
 * (the default), so Catalyst may dedup, push, and reorder them freely
 * (SURVEY.md §4.3). Null-in → null-out; unparseable URL → null, to be
 * dropped with `.isNotNull` (reference Err semantics,
 * worker/src/rmqredis.rs:225-229).
 */
object UrlFunctions {

  private val canonUdf = udf((s: String) =>
    if (s == null) None else UrlCanon.canonicalize(s))

  private val hostUdf = udf((s: String) =>
    if (s == null) None else {
      val h = UrlCanon.hostOf(s); if (h.isEmpty) None else Some(h)
    })

  private val resolveUdf = udf((base: String, href: String) =>
    if (base == null || href == null) None
    else Extract.resolveLink(base, href))

  private val schemeOkUdf = udf((s: String) =>
    s != null && UrlCanon.isFetchableScheme(s))

  /** RFC 3986 canonical form; null when unparseable. */
  def canonicalizeUrl(c: Column): Column = canonUdf(c)

  /** lowercase host; null when host-less/unparseable. */
  def urlHost(c: Column): Column = hostUdf(c)

  /** Resolve href against base, keep only http/https; null otherwise. */
  def resolveHref(base: Column, href: Column): Column = resolveUdf(base, href)

  /** true iff scheme is http/https. */
  def fetchableScheme(c: Column): Column = schemeOkUdf(c)

  private val resolveCanonHostUdf = udf((base: String, href: String) =>
    if (base == null || href == null) None
    else UrlCanon.resolveCanonHost(base, href))

  /** Fused resolve→scheme-filter→canonicalize→host (one URL parse) —
   * struct(url, host), null when unresolvable/non-http(s)/host-less. */
  def resolveCanonHost(base: Column, href: Column): Column =
    resolveCanonHostUdf(base, href)
}

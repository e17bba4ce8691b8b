package graft.core

/**
 * Host white/blacklist predicates — substring-contains semantics of the
 * reference's filters (worker/src/filter/filter.rs:34-51,72-89):
 *  - blacklist: DROP a task whose host contains ANY listed substring
 *  - whitelist: KEEP a task only if its host contains SOME listed substring;
 *    host-less URLs are ALWAYS dropped (filter.rs:77-86)
 *  - NoFilter: identity (default — shipped lists are empty and filtering is
 *    off by default, worker/src/main.rs:182-188)
 */
sealed trait HostFilter extends Serializable {
  /** keep? — host is the (possibly empty) lowercase host of the URL. */
  def keep(host: String): Boolean
}

object HostFilter {
  case object NoFilter extends HostFilter {
    def keep(host: String): Boolean = true
  }
  final case class Blacklist(substrings: Seq[String]) extends HostFilter {
    def keep(host: String): Boolean = !substrings.exists(host.contains)
  }
  final case class Whitelist(substrings: Seq[String]) extends HostFilter {
    def keep(host: String): Boolean =
      host.nonEmpty && substrings.exists(host.contains)
  }

  /** One trimmed substring per line; blank lines dropped
   * (reference: worker/src/filter/filter.rs:93-105). */
  def parseList(lines: Iterable[String]): Seq[String] =
    lines.map(_.trim).filter(_.nonEmpty).toSeq
}

/**
 * Minimal robots.txt matcher — north_rule addition (the reference has no
 * robots handling; SURVEY.md §7.1). User-agent `*` rules only: longest-prefix
 * match wins; Allow beats Disallow on equal length; empty Disallow = allow all.
 */
final case class RobotsRules(allows: Seq[String], disallows: Seq[String],
    crawlDelay: Option[Int] = None) extends Serializable {
  def isAllowed(path: String): Boolean = {
    val a = allows.filter(path.startsWith).map(_.length).maxOption.getOrElse(-1)
    val d = disallows.filter(p => p.nonEmpty && path.startsWith(p)).map(_.length).maxOption.getOrElse(-1)
    a >= d
  }
}

object Robots {
  /** Path component of an absolute hierarchical URL ("" when none). */
  def pathOf(url: String): String = {
    val authStart = url.indexOf("//") + 2
    if (authStart < 2) return ""
    url.indexOf('/', authStart) match {
      case -1 => ""
      case i => url.substring(i)
    }
  }

  /** Disallow-prefix check (user-agent * only) — shared by the Spark UDF and
   * the sequential golden oracle so both decide identically. */
  def allowed(disallows: Seq[String], url: String): Boolean =
    disallows.isEmpty || {
      val path = pathOf(url)
      !disallows.exists(d => d.nonEmpty && path.startsWith(d))
    }
}

object RobotsRules {
  val allowAll: RobotsRules = RobotsRules(Nil, Nil)

  /** Parse a robots.txt body, keeping only `User-agent: *` groups.
   * `Crawl-delay` (non-standard but widely honoured) parses as a positive
   * number of politeness windows, ceiling'd — fractional delays round UP
   * (politer than requested, never ruder). */
  def parse(body: String): RobotsRules = {
    var inStar = false
    var sawAgent = false
    val allows = Seq.newBuilder[String]
    val disallows = Seq.newBuilder[String]
    var delay: Option[Int] = None
    body.linesIterator.map(_.trim).filter(_.nonEmpty).foreach { line =>
      val i = line.indexOf(':')
      if (i > 0 && !line.startsWith("#")) {
        val key = line.substring(0, i).trim.toLowerCase
        val value = line.substring(i + 1).trim.takeWhile(_ != '#').trim
        key match {
          case "user-agent" =>
            if (sawAgent && inStar && value != "*") inStar = false
            else if (value == "*") { inStar = true }
            sawAgent = true
          case "allow" if inStar    => if (value.nonEmpty) allows += value
          case "disallow" if inStar => if (value.nonEmpty) disallows += value
          case "crawl-delay" if inStar =>
            delay = value.toDoubleOption.filter(_ > 0)
              .map(d => math.ceil(d).toInt)
          case _ => ()
        }
      }
    }
    RobotsRules(allows.result(), disallows.result(), delay)
  }
}

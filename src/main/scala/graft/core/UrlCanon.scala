package graft.core

/** RFC 3986 URL parsing, reference resolution (§5.2) and canonicalization.
  *
  * Normative spec SURVEY.md §8.2 (the reference repo is unrecoverable — SURVEY.md
  * §0.1 — so this implementation, locked by the vectors in `UrlCanonSpec`, IS the
  * reference semantics): resolve relative vs base; lowercase scheme+host; strip
  * default ports (http:80 / https:443); strip fragment; percent-decode unreserved
  * characters only, uppercase remaining escapes; dot-segment removal; empty path →
  * "/"; preserve query order; drop empty query ("?"-only); reject non-http(s) and
  * URLs longer than 2048 chars. Idempotent by construction (property-tested).
  *
  * Pure Scala, no Spark dependency: usable both inside typed `map`/`flatMap`
  * pipelines and as a registered UDF.
  */
object UrlCanon {

  /** RFC 3986 appendix-B decomposition. `authority = None` ⇔ no "//" present. */
  final case class Parts(
      scheme: Option[String],
      authority: Option[String],
      path: String,
      query: Option[String],
      fragment: Option[String])

  // --- parsing (RFC 3986 appendix B) -------------------------------------

  def parse(u: String): Parts = {
    var rest = u
    var fragment: Option[String] = None
    val hi = rest.indexOf('#')
    if (hi >= 0) { fragment = Some(rest.substring(hi + 1)); rest = rest.substring(0, hi) }
    var query: Option[String] = None
    val qi = rest.indexOf('?')
    if (qi >= 0) { query = Some(rest.substring(qi + 1)); rest = rest.substring(0, qi) }
    var scheme: Option[String] = None
    val ci = rest.indexOf(':')
    if (ci > 0) {
      val cand = rest.substring(0, ci)
      val slash = rest.indexOf('/')
      // a ':' before any '/' introduces a scheme iff the prefix is a valid scheme
      if ((slash < 0 || ci < slash) && isScheme(cand)) {
        scheme = Some(cand)
        rest = rest.substring(ci + 1)
      }
    }
    var authority: Option[String] = None
    if (rest.startsWith("//")) {
      val end0 = rest.indexOf('/', 2)
      val end = if (end0 < 0) rest.length else end0
      authority = Some(rest.substring(2, end))
      rest = rest.substring(end)
    }
    Parts(scheme, authority, rest, query, fragment)
  }

  private def isScheme(s: String): Boolean =
    s.nonEmpty && s.charAt(0).isLetter &&
      s.forall(c => c.isLetterOrDigit || c == '+' || c == '-' || c == '.')

  // --- RFC 3986 §5.2.4 remove_dot_segments --------------------------------

  def removeDotSegments(path: String): String = {
    var in = path
    val out = new StringBuilder(path.length)
    def popSegment(): Unit = {
      val i = out.lastIndexOf("/")
      out.setLength(if (i >= 0) i else 0)
    }
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../")) { in = "/" + in.substring(4); popSegment() }
      else if (in == "/..") { in = "/"; popSegment() }
      else if (in == "." || in == "..") in = ""
      else {
        val start = if (in.charAt(0) == '/') 1 else 0
        val idx = in.indexOf('/', start)
        if (idx < 0) { out.append(in); in = "" }
        else { out.append(in.substring(0, idx)); in = in.substring(idx) }
      }
    }
    out.toString
  }

  // --- RFC 3986 §5.2.2 transform references (strict) ----------------------

  def resolve(base: Parts, ref: Parts): Parts =
    if (ref.scheme.isDefined)
      Parts(ref.scheme, ref.authority, removeDotSegments(ref.path), ref.query, ref.fragment)
    else if (ref.authority.isDefined)
      Parts(base.scheme, ref.authority, removeDotSegments(ref.path), ref.query, ref.fragment)
    else if (ref.path.isEmpty)
      Parts(base.scheme, base.authority, base.path,
        if (ref.query.isDefined) ref.query else base.query, ref.fragment)
    else if (ref.path.charAt(0) == '/')
      Parts(base.scheme, base.authority, removeDotSegments(ref.path), ref.query, ref.fragment)
    else
      Parts(base.scheme, base.authority,
        removeDotSegments(mergePaths(base, ref.path)), ref.query, ref.fragment)

  private def mergePaths(base: Parts, refPath: String): String =
    if (base.authority.isDefined && base.path.isEmpty) "/" + refPath
    else {
      val i = base.path.lastIndexOf('/')
      if (i < 0) refPath else base.path.substring(0, i + 1) + refPath
    }

  /** Recomposition (§5.3) with no normalization — used by the RFC 5.4 vectors. */
  def recompose(p: Parts): String = {
    val sb = new StringBuilder
    p.scheme.foreach(s => sb.append(s).append(':'))
    p.authority.foreach(a => sb.append("//").append(a))
    sb.append(p.path)
    p.query.foreach(q => sb.append('?').append(q))
    p.fragment.foreach(f => sb.append('#').append(f))
    sb.toString
  }

  /** Resolve `href` against `base` and recompose, RFC-faithfully (no http-only
    * policy, no percent normalization). Test surface for the §5.4 examples. */
  def resolveRaw(base: String, href: String): String =
    recompose(resolve(parse(base), parse(href)))

  // --- normalization -------------------------------------------------------

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
  private def hexVal(c: Char): Int =
    if (c <= '9') c - '0' else (c | 0x20) - 'a' + 10
  private def isUnreserved(v: Int): Boolean =
    (v >= 'A' && v <= 'Z') || (v >= 'a' && v <= 'z') || (v >= '0' && v <= '9') ||
      v == '-' || v == '.' || v == '_' || v == '~'

  /** Percent-decode unreserved octets; uppercase the hex of all other escapes;
    * leave malformed '%' sequences untouched. Idempotent. */
  def pctNormalize(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length && isHex(s.charAt(i + 1)) && isHex(s.charAt(i + 2))) {
        val v = hexVal(s.charAt(i + 1)) * 16 + hexVal(s.charAt(i + 2))
        if (isUnreserved(v)) sb.append(v.toChar)
        else sb.append('%')
          .append(Character.toUpperCase(s.charAt(i + 1)))
          .append(Character.toUpperCase(s.charAt(i + 2)))
        i += 3
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  final val MaxLen = 2048

  /** Canonical form of an already-resolved Parts, or None if not a fetchable
    * http(s) URL (SURVEY.md §8.2). */
  def normalize(p: Parts): Option[String] = {
    val schemeOk = p.scheme.map(_.toLowerCase) match {
      case Some(s @ ("http" | "https")) => Some(s)
      case _                            => None
    }
    schemeOk.flatMap { scheme =>
      p.authority.filter(_.nonEmpty).flatMap { auth =>
        val at = auth.lastIndexOf('@')
        val userinfo = if (at >= 0) Some(auth.substring(0, at)) else None
        val hostPort = if (at >= 0) auth.substring(at + 1) else auth
        val (host0, port) =
          if (hostPort.startsWith("[")) { // IPv6 literal
            val e = hostPort.indexOf(']')
            if (e < 0) (hostPort, None)
            else {
              val rest = hostPort.substring(e + 1)
              (hostPort.substring(0, e + 1),
                if (rest.startsWith(":")) Some(rest.substring(1)) else None)
            }
          } else {
            val ci = hostPort.lastIndexOf(':')
            if (ci >= 0) (hostPort.substring(0, ci), Some(hostPort.substring(ci + 1)))
            else (hostPort, None)
          }
        val host = pctNormalize(host0.toLowerCase)
        if (host.isEmpty || port.exists(p0 => p0.nonEmpty && !p0.forall(_.isDigit))) None
        else {
          val defaultPort = if (scheme == "http") "80" else "443"
          val keptPort = port.filter(p0 => p0.nonEmpty && p0 != defaultPort)
          val path0 = pctNormalize(removeDotSegments(p.path))
          val path = if (path0.isEmpty) "/" else path0
          val sb = new StringBuilder(scheme).append("://")
          userinfo.foreach(u => sb.append(u).append('@'))
          sb.append(host)
          keptPort.foreach(pt => sb.append(':').append(pt))
          sb.append(path)
          p.query.filter(_.nonEmpty).foreach(q => sb.append('?').append(pctNormalize(q)))
          val out = sb.toString
          if (out.length > MaxLen) None else Some(out)
        }
      }
    }
  }

  /** Strip chars a browser removes before parsing (tab/CR/LF anywhere, spaces at
    * the ends) — pinned pre-clean step. */
  private def clean(u: String): String = {
    val t = u.trim
    if (t.exists(c => c == '\t' || c == '\n' || c == '\r'))
      t.filterNot(c => c == '\t' || c == '\n' || c == '\r')
    else t
  }

  /** Canonicalize `href` found on page `base` (base must be absolute). */
  def canonicalize(base: String, href: String): Option[String] = {
    val b = parse(clean(base))
    if (b.scheme.isEmpty) None
    else normalize(resolve(b, parse(clean(href))))
  }

  /** Canonicalize an absolute URL (seed lists, re-canonicalization). */
  def canonical(url: String): Option[String] = {
    val p = parse(clean(url))
    if (p.scheme.isEmpty) None
    else normalize(p.copy(path = removeDotSegments(p.path)))
  }

  /** Host of a canonical URL (politeness key). Pinned to THIS canonicalizer —
    * never mix with Spark's builtin `parse_url` (edge cases differ). */
  def hostOf(url: String): String =
    parse(url).authority.fold("") { auth =>
      val at = auth.lastIndexOf('@')
      val hp = if (at >= 0) auth.substring(at + 1) else auth
      if (hp.startsWith("[")) {
        val e = hp.indexOf(']'); if (e < 0) hp else hp.substring(0, e + 1)
      } else {
        val ci = hp.lastIndexOf(':'); if (ci >= 0) hp.substring(0, ci) else hp
      }
    }

  /** Path of a canonical URL (robots matching; query excluded — pinned). */
  def pathOf(url: String): String = {
    val p = parse(url).path
    if (p.isEmpty) "/" else p
  }
}

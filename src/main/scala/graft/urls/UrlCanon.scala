package graft.urls

/**
 * Pure URL model + canonicalization + RFC-3986-ish resolution.
 *
 * Mirrors the observable semantics of the reference's use of `spray.http.Uri`
 * (reference: src/main/scala/es/udc/scrawl/crawler/LinkExtractor.scala:27-33 —
 * `Uri(link).resolvedAgainst(task.url)`, keep only URIs with a defined
 * `effectivePort`, i.e. a known scheme) and the identity rule
 * `generateId(url) = url.toString()` (reference:
 * src/main/scala/es/udc/scrawl/master/Master.scala:34-36).
 *
 * Behavior locked by the reference's LinkExtractorTest.scala:23-65:
 *  - absolute URLs pass through;
 *  - `./rel`, `/rootrel`, `//host/proto-rel` all resolve against the base;
 *  - empty and malformed (`:/:/x`) links are dropped;
 *  - only schemes with a known default port survive (http, https, ftp, ws, wss).
 *
 * Everything here is deterministic, allocation-light, and usable both from
 * Catalyst UDFs (executor-side) and the reference-semantics oracle.
 */
final case class CUrl(
    scheme: String,
    host: String,
    port: Int, // -1 = default for scheme
    path: String, // always starts with "/" (empty path normalized to "/")
    query: Option[String],
    fragment: Option[String]) {

  def defaultPort: Int = CUrl.defaultPorts.getOrElse(scheme, -1)

  /** spray's Uri.effectivePort: explicit port, else scheme default, else 0. */
  def effectivePort: Int = if (port > 0) port else math.max(defaultPort, 0)

  /** authority string as it appears in a canonical URL (no default port). */
  def authority: String =
    if (port > 0 && port != defaultPort) s"$host:$port" else host

  /** Canonical absolute form: lowercase scheme/host, no default port. */
  def canonical: String = {
    val q = query.map("?" + _).getOrElse("")
    val f = fragment.map("#" + _).getOrElse("")
    s"$scheme://$authority$path$q$f"
  }

  override def toString: String = canonical
}

object CUrl {
  val defaultPorts: Map[String, Int] =
    Map("http" -> 80, "https" -> 443, "ftp" -> 21, "ws" -> 80, "wss" -> 443)

  private val AbsoluteRe =
    """^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(\?[^#]*)?(#.*)?$""".r
  private val HostPortRe = """^([^:]*)(?::(\d+))?$""".r

  /** Parse an absolute URL. Returns None on anything malformed. */
  def parseAbsolute(s: String): Option[CUrl] = s match {
    case AbsoluteRe(scheme, auth, path, q, f) =>
      auth match {
        case HostPortRe(host, portStr) if host.nonEmpty =>
          val port = Option(portStr).map(_.toInt).getOrElse(-1)
          val p = normalizePath(if (path.isEmpty) "/" else path)
          Some(CUrl(scheme.toLowerCase, host.toLowerCase, port, p,
            Option(q).map(_.drop(1)), Option(f).map(_.drop(1))))
        case _ => None
      }
    case _ => None
  }

  /** Remove-dot-segments (RFC 3986 §5.2.4), on an absolute path. */
  def normalizePath(path: String): String = {
    val out = new scala.collection.mutable.ArrayBuffer[String]()
    val segs = path.split("/", -1)
    var i = 0
    while (i < segs.length) {
      segs(i) match {
        case "." | "" if i != 0 && i != segs.length - 1 => // skip interior
        case ".." => if (out.nonEmpty) out.remove(out.length - 1)
        case "." => // leading/trailing "."
        case s => out += s
      }
      i += 1
    }
    val joined = out.mkString("/")
    val withSlash = if (joined.startsWith("/")) joined else "/" + joined
    // trailing "/." or "/.." or "/" preservation
    if ((path.endsWith("/") || path.endsWith("/.") || path.endsWith("/..")) &&
      !withSlash.endsWith("/")) withSlash + "/"
    else withSlash
  }

  /**
   * Resolve `link` against absolute `base`; None when the link is empty,
   * malformed, or resolves to a scheme without a known port
   * (reference LinkExtractor.scala:27-40).
   */
  def resolve(base: CUrl, link: String): Option[CUrl] = {
    if (link == null || link.isEmpty) return None
    val trimmed = link.trim
    if (trimmed.isEmpty) return None
    // Reject obviously malformed forms like ":/:/x" — a colon before any
    // slash with an invalid scheme prefix.
    if (trimmed.startsWith(":")) return None
    val resolved: Option[CUrl] =
      if (trimmed.contains("://")) parseAbsolute(trimmed)
      else if (trimmed.startsWith("//")) parseAbsolute(base.scheme + ":" + trimmed)
      else {
        // scheme-less relative reference; may still carry ?query / #fragment
        val (noFrag, frag) = splitAt(trimmed, '#')
        val (pathPart, query) = splitAt(noFrag, '?')
        // a bare "scheme:opaque" (e.g. mailto:x) — unknown port ⇒ drop
        if (pathPart.takeWhile(_ != '/').contains(":")) None
        else {
          val newPath =
            if (pathPart.isEmpty) base.path
            else if (pathPart.startsWith("/")) normalizePath(pathPart)
            else {
              val dir = base.path.substring(0, base.path.lastIndexOf('/') + 1)
              normalizePath(dir + pathPart)
            }
          Some(base.copy(path = newPath, query = query, fragment = frag))
        }
      }
    resolved.filter(_.effectivePort > 0)
  }

  private def splitAt(s: String, c: Char): (String, Option[String]) = {
    val i = s.indexOf(c)
    if (i < 0) (s, None) else (s.substring(0, i), Some(s.substring(i + 1)))
  }

  /** Canonical string for a raw (possibly absolute) URL; None if malformed. */
  def canonicalize(s: String): Option[String] = parseAbsolute(s).map(_.canonical)
}

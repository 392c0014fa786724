package graft.html

import java.net.URLEncoder
import graft.urls.CUrl

/**
 * Constrained-HTML link extraction and the Google AJAX-crawl-scheme rewrite.
 *
 * The reference TagSoup-parses the body and collects EVERY `@href` attribute
 * on ANY element (reference: src/main/scala/es/udc/scrawl/crawler/
 * LinkExtractor.scala:19-44 — `parser.loadString(body) \\ "@href"`), drops
 * empties, resolves against the page URL, and keeps only URIs with a defined
 * effectivePort. Our synthetic corpus emits a constrained HTML subset
 * (double-quoted attributes, no entities inside href values), so a regex
 * attribute scan is an exact extractor for it — golden-matched to the
 * reference's six LinkExtractorTest cases.
 */
object Html {
  // any element, any position of the href attribute; double or single quotes
  private val HrefRe = """(?is)\bhref\s*=\s*("([^"]*)"|'([^']*)')""".r

  def rawHrefs(body: String): Seq[String] =
    HrefRe.findAllMatchIn(body).map { m =>
      if (m.group(2) != null) m.group(2) else m.group(3)
    }.toVector

  def isHtml(contentType: String): Boolean =
    contentType != null && contentType.contains("text/html")

  /**
   * Extract + resolve + filter, reference LinkExtractor semantics.
   * Returns canonical absolute URL strings, in document order (duplicates kept —
   * dedup happens at enqueue, reference Master.scala:104-113).
   */
  def extractLinks(body: String, baseUrl: String, contentType: String): Seq[String] = {
    if (!isHtml(contentType)) return Seq.empty
    CUrl.parseAbsolute(baseUrl) match {
      case None => Seq.empty
      case Some(base) =>
        rawHrefs(body).flatMap(h => CUrl.resolve(base, h)).map(_.canonical)
    }
  }

  /**
   * AJAX crawl-scheme rewrite (reference: src/main/scala/es/udc/scrawl/
   * pipeline/AjaxLinksTransform.scala:26-35): hrefs beginning `#!X` become
   * `/?_escaped_fragment_=urlencode(X)` resolved against the page URL.
   * Only applied to text/html bodies (AjaxLinksTransform.scala:43-50).
   */
  def rewriteAjax(body: String, baseUrl: String, contentType: String): String = {
    if (!isHtml(contentType)) return body
    CUrl.parseAbsolute(baseUrl) match {
      case None => body
      case Some(base) =>
        HrefRe.replaceAllIn(body, m => {
          val href = if (m.group(2) != null) m.group(2) else m.group(3)
          if (href.startsWith("#!")) {
            val enc = URLEncoder.encode(href.substring(2), "UTF-8")
            val rewritten = CUrl.resolve(base, s"/?_escaped_fragment_=$enc")
              .map(_.canonical).getOrElse(href)
            scala.util.matching.Regex.quoteReplacement(s"""href="$rewritten"""")
          } else scala.util.matching.Regex.quoteReplacement(m.matched)
        })
    }
  }
}

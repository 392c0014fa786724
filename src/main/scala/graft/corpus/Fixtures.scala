package graft.corpus

import graft.model.PageRow
import graft.image.ImageCodec

/**
 * Explicit fixture sites replaying the reference test suite (FIXTURES.md §3).
 * Each is a tiny deterministic web the engine crawls end-to-end; expected
 * outcomes come from the reference-semantics oracle (graft.oracle.RefOracle),
 * never hand-written twice.
 */
object Fixtures {
  private def html(hrefs: String*): String =
    s"""<html><body>${hrefs.map(h => s"""<a href="$h">l</a>""").mkString}</body></html>"""

  def page(url: String, body: String, status: Int = 200,
      ct: String = "text/html", imageId: String = null,
      redirectTo: String = null): PageRow = {
    val host = url.split("/")(2)
    PageRow(url, host, status, ct, body, imageId, redirectTo)
  }

  private def pageWithImage(url: String, imageId: String, hrefs: String*): PageRow = {
    val caption = ImageCodec.caption(imageId)
    page(url, s"""<html><body>${hrefs.map(h => s"""<a href="$h">l</a>""").mkString}""" +
      s"""<img src="/$imageId"><p>$caption</p></body></html>""", imageId = imageId)
  }

  /** NodeTest.scala:23-93 — `/` links `/resource` and `/stuff`, one host. */
  def site3: Seq[PageRow] = Seq(
    pageWithImage("http://host0.test/", "img-site3-root", "/resource", "/stuff"),
    pageWithImage("http://host0.test/resource", "img-site3-resource"),
    pageWithImage("http://host0.test/stuff", "img-site3-stuff"))
  def site3Seeds = Seq("http://host0.test/")

  /** LinkExtractorTest.scala:23-65 — one page with every href form. */
  def extractor: Seq[PageRow] = Seq(
    page("http://ex.test/", html("http://abs.test/x", "./relative", "/rootrel",
      "//ex.test/protorel", "", ":/:/bad", "mailto:a@b.c")),
    page("http://abs.test/x", html()),
    page("http://ex.test/relative", html()),
    page("http://ex.test/rootrel", html()),
    page("http://ex.test/protorel", html()))
  def extractorSeeds = Seq("http://ex.test/")

  /** RobotsFilterTest.scala:47-96 — `Disallow: /path`; /test crawled, /path denied. */
  def robotsBasic: Seq[PageRow] = Seq(
    page("http://rb.test/robots.txt", "User-Agent: *\nDisallow: /path\n", ct = "text/plain"),
    page("http://rb.test/", html("/path", "/test")),
    page("http://rb.test/path", html()),
    page("http://rb.test/test", html()))
  def robotsBasicSeeds = Seq("http://rb.test/")

  /** RobotsFilterTest.scala:98-179 — robots 404 / garbage ⇒ all allowed. */
  def robotsMissing: Seq[PageRow] = Seq(
    // host A: robots.txt 404
    page("http://ra.test/robots.txt", "", status = 404, ct = "text/plain"),
    page("http://ra.test/", html("/a")),
    page("http://ra.test/a", html()),
    // host B: robots.txt exists but URL-decoder chokes (stray %) ⇒ parse error ⇒ all allowed
    page("http://rc.test/robots.txt", "User-Agent: *\nDisallow: /%zz\n", ct = "text/plain"),
    page("http://rc.test/", html("/b")),
    page("http://rc.test/b", html()),
    // host D: robots fetch missing entirely (connection error) ⇒ all allowed
    page("http://rd.test/", html("/c")),
    page("http://rd.test/c", html()))
  def robotsMissingSeeds = Seq("http://ra.test/", "http://rc.test/", "http://rd.test/")

  /** FilterHttpErrorTest.scala:34-59 — 403/500 ⇒ WithError(FilteredHttpCode). */
  def httpFilter: Seq[PageRow] = Seq(
    page("http://hf.test/", html("/forbidden", "/broken", "/fine")),
    page("http://hf.test/forbidden", html(), status = 403),
    page("http://hf.test/broken", html(), status = 500),
    page("http://hf.test/fine", html()))
  def httpFilterSeeds = Seq("http://hf.test/")

  /** RetryHttpErrorTest.scala:39-96 — 404 retried once, then MaxRetriesReached. */
  def httpRetry: Seq[PageRow] = Seq(
    page("http://hr.test/", html("/missing", "/ok")),
    page("http://hr.test/missing", html(), status = 404),
    page("http://hr.test/ok", html()))
  def httpRetrySeeds = Seq("http://hr.test/")

  /** MaxDepthFilterTest.scala:39-61 — chain a→b→c→d; max-depth=2 ⇒ d dropped. */
  def depthChain: Seq[PageRow] = Seq(
    page("http://dc.test/", html("/b")),
    page("http://dc.test/b", html("/c")),
    page("http://dc.test/c", html("/d")),
    page("http://dc.test/d", html()))
  def depthChainSeeds = Seq("http://dc.test/")

  /** AjaxLinksTransformTest.scala:32-48 — `#!key=value` rewritten and followed. */
  def ajax: Seq[PageRow] = Seq(
    page("http://ax.test/", html("#!key=value")),
    page("http://ax.test/?_escaped_fragment_=key%3Dvalue", html()))
  def ajaxSeeds = Seq("http://ax.test/")

  /** MasterTest.scala:49-57,72-88 — diamond: two parents link the same child. */
  def dedupDiamond: Seq[PageRow] = Seq(
    page("http://dd.test/", html("/left", "/right")),
    page("http://dd.test/left", html("/child")),
    page("http://dd.test/right", html("/child")),
    page("http://dd.test/child", html()))
  def dedupDiamondSeeds = Seq("http://dd.test/")

  /** DownloaderTest.scala:82-89 + reference.conf:33 — redirect chains ≤5 and >5. */
  def redirects: Seq[PageRow] = {
    val ok = (0 until 5).map(i => page(s"http://rr.test/hop$i", "",
      status = 301, redirectTo = s"http://rr.test/hop${i + 1}"))
    val tooMany = (0 until 7).map(i => page(s"http://rr.test/long$i", "",
      status = 301, redirectTo = s"http://rr.test/long${i + 1}"))
    Seq(page("http://rr.test/", html("/hop0", "/long0")),
      page("http://rr.test/hop5", html()),
      page("http://rr.test/long7", html())) ++ ok ++ tooMany
  }
  def redirectsSeeds = Seq("http://rr.test/")

  /** addSeeds regression: a page crawled AFTER seed injection links back to
    * the injected seed — O5 must not re-enqueue it (the seen filter has to
    * cover mid-crawl injections, not just cycle-committed rows). */
  def loopback: Seq[PageRow] = Seq(
    page("http://bb.test/", html("/loop")),
    page("http://bb.test/loop", html("/")))
  def loopbackSeeds = Seq("http://bb.test/")

  /** north_rule hot-host skew: one host with 60 pages, three with 2. */
  def hotHost: Seq[PageRow] = {
    val hot = (0 until 60).map { i =>
      val kids = Seq(2 * i + 1, 2 * i + 2).filter(_ < 60).map(k => s"/p$k")
      page(if (i == 0) "http://hot.test/" else s"http://hot.test/p$i", html(kids: _*))
    }
    val cold = (1 to 3).flatMap { hn =>
      Seq(page(s"http://cold$hn.test/", html("/only")),
        page(s"http://cold$hn.test/only", html()))
    }
    hot ++ cold
  }
  def hotHostSeeds = Seq("http://hot.test/", "http://cold1.test/",
    "http://cold2.test/", "http://cold3.test/")

  /** Deterministic input_hint image rows for every image referenced by `pages`
    * (same derivation the engine-parity suite uses). */
  def imagesFor(pages: Seq[PageRow]): Seq[graft.model.ImageRow] =
    pages.filter(_.image_id != null).map { p =>
      val id = p.image_id
      val k = math.abs(ImageCodec.seedOf(id))
      val w = 16 + (k % 9).toInt
      val h = 16 + ((k >> 4) % 9).toInt
      val fmt = if (k % 2 == 0) "png" else "jpg"
      graft.model.ImageRow(id, ImageCodec.encode(id, w, h, fmt), w, h, fmt,
        ImageCodec.caption(id), ImageCodec.phash(id, w, h))
    }
}

package graft

import java.net.InetSocketAddress
import java.net.http.HttpClient
import java.nio.charset.StandardCharsets
import java.time.Duration
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite
import graft.corpus.Fixtures
import graft.driver.{CrawlEngine, HttpFetcher}
import graft.model.{CrawlConfig, PageRow, Reasons}

/**
 * The production HTTP fetcher behind the S3 seam, tested fully offline
 * against an in-process loopback `com.sun.net.httpserver.HttpServer` —
 * the same scenarios the reference drives against its live in-process
 * server (reference DownloaderTest.scala:20-98: GET → Response with
 * status passthrough, redirect following, connection error → Error),
 * plus an e2e fixture crawl over localhost asserting byte-identical
 * state vs the default corpus-join engine.
 */
class HttpFetcherSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def withServer(routes: Map[String, (Int, Map[String, String], String)])(
      body: Int => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (x: HttpExchange) => {
      val (status, headers, resp) = routes.getOrElse(x.getRequestURI.getPath,
        (404, Map("Content-Type" -> "text/plain"), "not found"))
      headers.foreach { case (k, v) => x.getResponseHeaders.set(k, v) }
      val bytes = resp.getBytes(StandardCharsets.UTF_8)
      x.sendResponseHeaders(status, if (bytes.isEmpty) -1 else bytes.length.toLong)
      if (bytes.nonEmpty) x.getResponseBody.write(bytes)
      x.close()
    })
    server.start()
    try body(server.getAddress.getPort)
    finally server.stop(0)
  }

  private def client: HttpClient = HttpClient.newBuilder()
    .followRedirects(HttpClient.Redirect.NEVER)
    .connectTimeout(Duration.ofMillis(3000)).build()

  private def claimed(url: String) = HttpFetcher.Claimed(
    url, url.split("/")(2), 0, 0, 0L, 0, Map.empty)

  private def fetch(url: String, maxRedirects: Int = 5) =
    HttpFetcher.fetchOne(client, claimed(url), "GraftBot/0.1", maxRedirects, 5000)

  // ---- DownloaderTest scenario replays (status / redirect / error) ------

  test("GET returns status, content-type and body (DownloaderTest status passthrough)") {
    val routes = Map(
      "/ok" -> ((200, Map("Content-Type" -> "text/html"), "<html>hi</html>")),
      "/missing" -> ((404, Map("Content-Type" -> "text/plain"), "")),
      "/forbidden" -> ((403, Map("Content-Type" -> "text/plain"), "no")))
    withServer(routes) { port =>
      val ok = fetch(s"http://127.0.0.1:$port/ok")
      assert(ok.f_status === Some(200))
      assert(ok.f_ct === Some("text/html"))
      assert(ok.f_body === Some("<html>hi</html>"))
      assert(ok.f_err === None)
      assert(ok.hops === 0)
      assert(fetch(s"http://127.0.0.1:$port/missing").f_status === Some(404))
      assert(fetch(s"http://127.0.0.1:$port/forbidden").f_status === Some(403))
    }
  }

  test("redirect chains are followed <= maxRedirects, row keeps its original url") {
    withServer(Map(
      "/r0" -> ((302, Map("Location" -> "/r1"), "")),
      "/r1" -> ((301, Map("Location" -> "/r2"), "")),
      "/r2" -> ((200, Map("Content-Type" -> "text/html"), "final")))) { port =>
      val r = fetch(s"http://127.0.0.1:$port/r0")
      assert(r.url === s"http://127.0.0.1:$port/r0") // original url preserved
      assert(r.f_status === Some(200))
      assert(r.f_body === Some("final"))
      assert(r.hops === 2)
      assert(r.f_err === None)
    }
  }

  test("more than maxRedirects hops => MaxRedirectsReached (reference.conf:33)") {
    val chain = (0 until 8).map(i =>
      s"/l$i" -> ((301, Map("Location" -> s"/l${i + 1}"), ""))).toMap
    withServer(chain) { port =>
      val r = fetch(s"http://127.0.0.1:$port/l0")
      assert(r.f_err === Some(Reasons.maxRedirects))
      assert(r.f_body === None)
      assert(r.hops === 6) // 6 requests sent: initial + 5 follows, all 301
    }
  }

  test("connection failure => ConnectionError (Downloader error channel)") {
    // bind-then-close yields a port that refuses connections
    val sock = new java.net.ServerSocket(0, 1, java.net.InetAddress.getByName("127.0.0.1"))
    val deadPort = sock.getLocalPort
    sock.close()
    val r = fetch(s"http://127.0.0.1:$deadPort/x")
    assert(r.f_err === Some(Reasons.connectionError))
    assert(r.f_status === None)
  }

  // ---- e2e: live-HTTP crawl == corpus-join crawl, byte for byte ---------

  test("e2e localhost crawl matches the corpus-join engine byte-identically") {
    import org.apache.spark.sql.DataFrame
    // site3 shape + a redirect hop, rehosted on the loopback authority; the
    // bodies embed images + captions exactly like Fixtures.pageWithImage
    def sitePages(base: String): Seq[PageRow] = {
      def img(url: String, id: String, hrefs: String*) = {
        val caption = graft.image.ImageCodec.caption(id)
        Fixtures.page(url,
          s"""<html><body>${hrefs.map(h => s"""<a href="$h">l</a>""").mkString}""" +
            s"""<img src="/$id"><p>$caption</p></body></html>""", imageId = id)
      }
      Seq(
        img(s"$base/", "img-http-root", "/resource", "/stuff", "/hop0"),
        img(s"$base/resource", "img-http-resource"),
        img(s"$base/stuff", "img-http-stuff"),
        Fixtures.page(s"$base/hop0", "", status = 301, redirectTo = s"$base/hop1"),
        img(s"$base/hop1", "img-http-hop1"))
    }
    val sock = new java.net.ServerSocket(0, 1, java.net.InetAddress.getByName("127.0.0.1"))
    val port = sock.getLocalPort
    sock.close()
    val base = s"http://127.0.0.1:$port"
    val pages = sitePages(base)
    val routes = pages.map { p =>
      val path = p.url.stripPrefix(base) match { case "" => "/"; case s => s }
      if (p.redirect_to != null)
        path -> ((p.status, Map("Location" -> p.redirect_to.stripPrefix(base)), ""))
      else
        path -> ((p.status, Map("Content-Type" -> p.content_type), p.body))
    }.toMap
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    server.createContext("/", (x: HttpExchange) => {
      val (status, headers, resp) = routes.getOrElse(x.getRequestURI.getPath,
        (404, Map("Content-Type" -> "text/plain"), "not found"))
      headers.foreach { case (k, v) => x.getResponseHeaders.set(k, v) }
      val bytes = resp.getBytes(StandardCharsets.UTF_8)
      x.sendResponseHeaders(status, if (bytes.isEmpty) -1 else bytes.length.toLong)
      if (bytes.nonEmpty) x.getResponseBody.write(bytes)
      x.close()
    })
    server.start()
    try {
      import spark.implicits._
      val seeds = Seq(s"$base/")
      def run(cfg: CrawlConfig): CrawlEngine = {
        val dir = java.nio.file.Files.createTempDirectory("graft-httpe2e").toString
        val images = Fixtures.imagesFor(pages)
        val engine = new CrawlEngine(spark, cfg,
          spark.createDataset(pages).toDF(),
          spark.createDataset(images).toDF(), dir)
        engine.run(seeds)
        engine
      }
      val defEngine = run(CrawlConfig())
      val httpEngine = run(CrawlConfig(
        fetcher = Some(HttpFetcher("GraftBot/0.1", maxRedirects = 5))))
      def dump(df: DataFrame) = df.toJSON.collect().sorted.toSeq
      assert(dump(httpEngine.frontierNow) === dump(defEngine.frontierNow),
        "frontier must be identical across live-HTTP and corpus fetchers")
      assert(dump(httpEngine.outputNow) === dump(defEngine.outputNow),
        "output table must be identical across live-HTTP and corpus fetchers")
      // sanity on the HTTP leg itself: root/resource/stuff plus hop0 (whose
      // redirect resolved to hop1's content) complete; hop1 itself is never
      // linked, so it is fetched only through the redirect
      assert(httpEngine.visited.count() === 4)
      assert(httpEngine.outputNow.count() === 4)
    } finally server.stop(0)
  }
}

package graft.corpus

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.{PageRow, ImageRow}
import graft.image.ImageCodec

/**
 * Deterministic synthetic web generator (FIXTURES.md §1, seed baked into the
 * hash mix — no wall-clock, no java.util.Random), producing the two corpus
 * tables the engine crawls:
 *
 *   pages(url, host, status, content_type, body, image_id, redirect_to)
 *   images(image_id, bytes, w, h, fmt, caption, phash)  — input_hint schema
 *
 * Generation is a pure function of the page index so large corpora are
 * synthesized distributedly via `spark.range(n).map(pageAt)` — no driver-side
 * materialization; the same functions power the tiny explicit fixtures in
 * [[Fixtures]].
 *
 * Web shape for the scalable corpus: `hosts` authorities named h{i}.test;
 * host i holds `sizes(i)` pages in a ternary link tree rooted at `/` (page 0);
 * page j links to children 3j+1..3j+3 plus the roots of the next two hosts
 * from each root — guaranteeing reachability while exercising cross-host
 * edges. A deterministic sprinkle of non-200 statuses, redirects, ajax and
 * malformed links exercises every pipeline stage at scale.
 */
object Corpus {
  val Seed = 42L

  def hostName(i: Int) = s"h$i.test"
  def pageUrl(hostIdx: Int, pageIdx: Int): String =
    if (pageIdx == 0) s"http://${hostName(hostIdx)}/"
    else s"http://${hostName(hostIdx)}/p$pageIdx"
  def imageId(hostIdx: Int, pageIdx: Int) = s"img-h$hostIdx-p$pageIdx"

  private def h(parts: Long*): Long =
    parts.foldLeft(Seed)((acc, p) => ImageCodec.mix64(acc ^ p))
  private def pct(x: Long, p: Int): Boolean = math.floorMod(x, 100L) < p

  /** Zipf-ish host sizes: host 0 is hot (skew fixture), tail is light. */
  def hostSizes(nHosts: Int, totalPages: Int): Array[Int] = {
    val raw = Array.tabulate(nHosts)(i => 1.0 / math.pow(i + 1, 0.7))
    val s = raw.sum
    val sizes = raw.map(r => math.max(1, (r / s * totalPages).toInt))
    sizes
  }

  /** Cumulative offsets for global-index -> (host, page) mapping. */
  def offsets(sizes: Array[Int]): Array[Long] =
    sizes.scanLeft(0L)(_ + _)

  final case class WebSpec(nHosts: Int, totalPages: Int,
      maxRedirectHops: Int = 6, withScenarios: Boolean = true) {
    val sizes: Array[Int] = hostSizes(nHosts, totalPages)
    val offs: Array[Long] = offsets(sizes)
    val n: Long = offs.last
  }

  def locate(spec: WebSpec, idx: Long): (Int, Int) = {
    var lo = 0; var hi = spec.offs.length - 1
    while (lo + 1 < hi) {
      val mid = (lo + hi) >>> 1
      if (spec.offs(mid) <= idx) lo = mid else hi = mid
    }
    (lo, (idx - spec.offs(lo)).toInt)
  }

  /** The page at a global index — pure, executor-friendly. */
  def pageAt(spec: WebSpec, idx: Long): PageRow = {
    val (hi, pj) = locate(spec, idx)
    val host = hostName(hi)
    val url = pageUrl(hi, pj)
    val n = spec.sizes(hi)
    val k = h(idx, 0x9e01L)

    // deterministic scenario sprinkle (only when withScenarios)
    val status =
      if (!spec.withScenarios) 200
      else if (pct(k, 2)) 404 // retried once then error (P7)
      else if (pct(h(k, 1), 1)) 403 // filtered (P6)
      else if (pct(h(k, 2), 1)) 500 // filtered (P6)
      else 200

    // children in the ternary tree
    val kids = (1 to 3).map(c => 3 * pj + c).filter(_ < n)
    val kidLinks = kids.map { c =>
      // vary href forms to exercise resolution: absolute / root-relative / relative
      math.floorMod(h(idx, c), 3L) match {
        case 0 => pageUrl(hi, c)
        case 1 => if (c == 0) "/" else s"/p$c"
        case _ => if (c == 0) "./" else s"./p$c"
      }
    }
    val crossLinks =
      if (pj == 0) (1 to 2).map(d => pageUrl((hi + d) % spec.nHosts, 0)) else Seq.empty
    val noise =
      if (spec.withScenarios && pct(h(k, 3), 10))
        Seq("", ":/:/bad", "#!state=" + pj, "mailto:x@y.z")
      else Seq.empty
    val hrefs = (kidLinks ++ crossLinks ++ noise)
      .map(l => s"""<a href="$l">x</a>""").mkString
    val imgId = imageId(hi, pj)
    val caption = ImageCodec.caption(imgId)
    val body =
      s"""<html><body>$hrefs<img src="/$imgId"><p>$caption</p></body></html>"""

    val redirect =
      if (spec.withScenarios && pct(h(k, 4), 1) && pj + 1 < n)
        pageUrl(hi, pj + 1)
      else null
    PageRow(url, host,
      if (redirect != null) 301 else status,
      if (redirect != null) "text/html" else "text/html",
      if (redirect != null) "" else body,
      if (redirect != null || status != 200) null else imgId,
      redirect)
  }

  /** robots.txt rows: a third of hosts disallow /p1*, a third 404, rest allow-all. */
  def robotsPages(spec: WebSpec): Seq[PageRow] =
    (0 until spec.nHosts).map { hi =>
      val host = hostName(hi)
      val url = s"http://$host/robots.txt"
      math.floorMod(h(hi.toLong, 0xb0b0L), 3L) match {
        case 0 => PageRow(url, host, 200, "text/plain",
          "User-Agent: *\nDisallow: /p1\n", null, null)
        case 1 => PageRow(url, host, 404, "text/plain", "", null, null)
        case _ => PageRow(url, host, 200, "text/plain", "", null, null)
      }
    }

  def imageAt(spec: WebSpec, idx: Long): ImageRow = {
    val (hi, pj) = locate(spec, idx)
    val id = imageId(hi, pj)
    val k = h(idx, 0x1337L)
    val w = 16 + math.floorMod(k, 17L).toInt // 16..32
    val hh = 16 + math.floorMod(h(k, 9), 17L).toInt
    val fmt = if (math.floorMod(k, 2L) == 0) "png" else "jpg"
    ImageRow(id, ImageCodec.encode(id, w, hh, fmt), w, hh, fmt,
      ImageCodec.caption(id), ImageCodec.phash(id, w, hh))
  }

  /** Distributed pages table (scenarios + robots rows unioned in). */
  def pages(spark: SparkSession, spec: WebSpec): Dataset[PageRow] = {
    import spark.implicits._
    val body = spark.range(spec.n).map(i => pageAt(spec, i))
    val robots = spark.createDataset(robotsPages(spec))
    body.unionByName(robots)
  }

  /** Distributed images table (input_hint schema). */
  def images(spark: SparkSession, spec: WebSpec): Dataset[ImageRow] = {
    import spark.implicits._
    spark.range(spec.n).map(i => imageAt(spec, i))
  }

  /** Seeds: the roots of the first k hosts. */
  def seeds(spec: WebSpec, k: Int): Seq[String] =
    (0 until math.min(k, spec.nHosts)).map(pageUrl(_, 0))
}

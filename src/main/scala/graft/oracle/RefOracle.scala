package graft.oracle

import scala.collection.mutable
import graft.model.{PageRow, CrawlConfig, Status, Reasons}
import graft.urls.CUrl
import graft.html.Html
import graft.robots.RobotRules

/**
 * Reference-semantics interpreter (SURVEY §7.3.5): an in-memory, ~150-line
 * executable spec of the documented crawl semantics, used as the expected-
 * value generator for every fixture. Each rule carries its reference
 * citation. It deliberately shares the pure core (CUrl/Html/RobotRules) —
 * those are golden-tested against the reference's unit suites separately —
 * so what this oracle checks in the Spark engine is the DISTRIBUTED
 * orchestration: drain order, robots deferral, retry/error routing, dedup
 * first-wins, depth layering, politeness, commit/termination.
 */
object RefOracle {
  final case class TaskState(url: String, host: String, depth: Int,
      prio: Long, var status: String, var retries: Int, var reason: String)
  final case class Outcome(
      tasks: Map[String, TaskState],
      visitedByLayer: Seq[Seq[String]], // completed urls per cycle, sorted
      outputImages: Seq[(String, String, Int)]) { // (image_id, src_url, depth)
    def visited: Set[String] = tasks.values.filter(_.status == Status.Completed).map(_.url).toSet
    def depths: Map[String, Int] =
      tasks.values.map(t => t.url -> t.depth).toMap
    def statuses: Map[String, (String, String)] =
      tasks.values.map(t => t.url -> ((t.status, Option(t.reason).getOrElse("")))).toMap
  }

  /** resolve redirect chains ≤ maxRedirects (reference.conf:33). */
  private def resolve(corpus: Map[String, PageRow], url: String, maxR: Int):
      Either[String, (PageRow, Int)] = {
    var cur = corpus.get(url)
    var hops = 0
    while (cur.exists(p => Set(301, 302, 303, 307, 308).contains(p.status) &&
        p.redirect_to != null)) {
      if (hops >= maxR) return Left(Reasons.maxRedirects)
      hops += 1
      cur = cur.flatMap(p => corpus.get(p.redirect_to) match {
        case None => return Left(Reasons.connectionError)
        case some => some
      })
    }
    cur.map(p => Right((p, hops))).getOrElse(Left(Reasons.connectionError))
  }

  def crawl(pages: Seq[PageRow], seeds: Seq[String], cfg: CrawlConfig): Outcome = {
    val corpus = pages.map(p => p.url -> p).toMap
    val tasks = mutable.LinkedHashMap[String, TaskState]()
    // robots: host -> Some(rules) parsed | None = all-allowed; absent = unknown
    val robots = mutable.Map[String, Option[RobotRules]]()
    val layers = mutable.ArrayBuffer[Seq[String]]()
    val outputs = mutable.ArrayBuffer[(String, String, Int)]()

    // S1 seed injection at depth 0 — Master.scala:127-129, dedup O5
    seeds.flatMap(CUrl.canonicalize).foreach { u =>
      if (!tasks.contains(u))
        tasks(u) = TaskState(u, CUrl.parseAbsolute(u).get.authority, 0, 0L,
          Status.New, 0, null)
    }

    var progressed = true
    var cycle = 1L
    while (progressed) {
      progressed = false
      // O1 drain + O12 politeness: per-host ≤ budget, (depth, prio, url) order
      val drainable = tasks.values.filter(_.status == Status.New).toSeq
      val batch = drainable.groupBy(_.host).toSeq.flatMap { case (_, ts) =>
        ts.sortBy(t => (t.depth, t.prio, t.url)).take(cfg.hostBudget)
      }
      val completedThisCycle = mutable.ArrayBuffer[String]()
      val enqueueBuffer = mutable.ArrayBuffer[(String, Int)]()
      // robots state is read as-of cycle start (the engine joins the robots
      // SNAPSHOT table): robots fetched this cycle gate pages only next cycle
      val robotsAtStart = robots.keySet.toSet

      for (t <- batch.sortBy(x => (x.depth, x.prio, x.url))) {
        (if (robotsAtStart.contains(t.host)) robots.get(t.host) else None) match {
          case None =>
            // P3: synthesize robots fetch, defer the page (stays New) —
            // RobotsFilter.scala:63-68; fetched this cycle:
            if (!robots.contains(t.host)) {
              progressed = true
              val robotsUrl = s"http://${t.host}/robots.txt"
              robots(t.host) = resolve(corpus, robotsUrl, cfg.maxRedirects) match {
                case Right((p, _)) if p.status == 200 =>
                  try Some(RobotRules.parse(p.body))
                  catch { case _: Exception => None } // parse error ⇒ all allowed (RobotsFilter.scala:99-103)
                case _ => None // non-200 / fetch error ⇒ all allowed (RobotsFilter.scala:74-81,110-119)
              }
            }
          case Some(rulesOpt) =>
            progressed = true
            val path = CUrl.parseAbsolute(t.url).map(_.path).getOrElse("/")
            val deniedByRobots = rulesOpt.exists(r => !r.allowed(cfg.userAgent, path))
            if (deniedByRobots) {
              // RobotsFilter.scala:58-61
              t.status = Status.WithError
              t.reason = Reasons.robotsPathFiltered(cfg.userAgent)
            } else resolve(corpus, t.url, cfg.maxRedirects) match {
              case Left(err) => // Downloader error / redirect overflow
                t.status = Status.WithError; t.reason = err
              case Right((p, _)) if cfg.retryCodes.contains(p.status) =>
                if (t.retries < cfg.maxRetries) { // P7 RetryHttpError.scala:27-33
                  t.retries += 1 // re-enqueued, refetched next cycle
                } else {
                  t.status = Status.WithError
                  t.reason = Reasons.maxRetriesReached
                }
              case Right((p, _)) if cfg.filterCodes.contains(p.status) =>
                // P6 FilterHttpError.scala:20-25
                t.status = Status.WithError
                t.reason = Reasons.filteredHttpCode(p.status)
              case Right((p, _)) =>
                // X1-X3 parse; P5 ajax rewrite precedes extraction
                t.status = Status.Completed
                completedThisCycle += t.url
                if (p.image_id != null) outputs += ((p.image_id, t.url, t.depth))
                val body2 = Html.rewriteAjax(p.body, t.url, p.content_type)
                // P8 MaxDepthFilter.scala:17-22 — ≥ inclusive
                val links = if (t.depth >= cfg.maxDepth) Seq.empty
                  else Html.extractLinks(body2, t.url, p.content_type)
                links.foreach(l => enqueueBuffer += ((l, t.depth + 1)))
            }
        }
      }
      // O5 dedup enqueue: within-commit min-depth first-wins (SURVEY §3.5),
      // then anti-join against the full task ledger (Master.scala:104-113)
      enqueueBuffer.groupBy(_._1).view.mapValues(_.map(_._2).min).toSeq
        .sortBy(x => (x._2, x._1)).foreach { case (u, d) =>
          if (!tasks.contains(u)) {
            tasks(u) = TaskState(u, CUrl.parseAbsolute(u).get.authority, d,
              cycle, Status.New, 0, null)
          }
        }
      if (completedThisCycle.nonEmpty) layers += completedThisCycle.sorted.toSeq
      cycle += 1
      if (cycle > 10000) sys.error("oracle did not terminate")
    }
    Outcome(tasks.toMap, layers.toSeq, outputs.toSeq)
  }
}

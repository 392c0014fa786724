package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.corpus.Fixtures
import graft.driver.CrawlEngine
import graft.model.CrawlConfig
import graft.streaming.CrawlStream

/**
 * Structured Streaming surface (SURVEY §2.5 streaming): foreachBatch-driven
 * micro-cycles must produce the identical crawl outcome as the plain loop,
 * with state in snapshot tables (exact resume independent of the streaming
 * checkpoint).
 */
class StreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("foreachBatch-driven crawl matches the batch engine on site3") {
    val pages = Fixtures.site3
    val dir = Files.createTempDirectory("graft-stream").toString
    val engine = new CrawlEngine(spark, CrawlConfig(),
      spark.createDataset(pages).toDF(),
      spark.createDataset(Fixtures.imagesFor(pages)).toDF(), dir)
    CrawlStream.crawl(engine, Fixtures.site3Seeds)
    val visited = engine.visited.select("url").as[String].collect().toSet
    assert(visited === Set("http://host0.test/", "http://host0.test/resource",
      "http://host0.test/stuff"))
    val out = engine.outputNow.select("psnr", "caption_ok").collect()
    assert(out.length === 3)
    assert(out.forall(r => r.getDouble(0) >= 40.0 && r.getBoolean(1)))
  }

  test("addSeeds mid-crawl injects new URLs which are then crawled (AddTasks parity)") {
    val pages = Fixtures.site3 ++ Fixtures.httpFilter
    val dir = Files.createTempDirectory("graft-addseeds").toString
    val engine = new CrawlEngine(spark, CrawlConfig(),
      spark.createDataset(pages).toDF(),
      spark.createDataset(Fixtures.imagesFor(pages)).toDF(), dir)
    engine.run(Fixtures.site3Seeds)
    assert(engine.visited.count() === 3)
    // inject the second site's seed and resume; dedup drops the known URL
    val added = engine.addSeeds(Fixtures.httpFilterSeeds ++ Fixtures.site3Seeds)
    assert(added === 1, "only the unseen URL enqueued (O5 first-wins)")
    engine.resume()
    val visited = engine.visited.select("url").as[String].collect().toSet
    assert(visited.contains("http://hf.test/"))
    assert(visited.contains("http://hf.test/fine"))
    // 403/500 pages end WithError, not Completed (P6)
    assert(!visited.contains("http://hf.test/forbidden"))
  }
}

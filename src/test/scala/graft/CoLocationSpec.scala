package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Co-located mega-wave fetch join (SURVEY §8 backlog: the bucketed-table
 * path): when claimed waves outgrow a broadcast and a real catalog is
 * available, the 100 TB layout stores corpus and frontier bucketed by
 * `url` so the fetch join is exchange-free — each task reads the matching
 * bucket of both sides. SnapTable has no bucketed catalog offline; this
 * spec pins the plan shape the engine gets on one (Spark `bucketBy` here,
 * an Iceberg `bucket(url)` partition transform in production): a
 * url-equi-join of two url-bucketed tables with NO Exchange on either side.
 */
class CoLocationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("url-bucketed corpus join url-bucketed batch plans with zero exchanges") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bucketed").toString
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // force the co-located sort-merge plan: a broadcast would hide the
      // exchange question entirely, and AQE re-plans mid-flight
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val corpus = (0 until 1000)
        .map(i => (s"http://h${i % 7}.test/p$i", s"body-$i")).toDF("url", "body")
      val batch = (0 until 1000 by 3)
        .map(i => (s"http://h${i % 7}.test/p$i", i / 3)).toDF("url", "depth")
      corpus.write.format("parquet").option("path", s"$dir/corpus")
        .bucketBy(8, "url").sortBy("url").saveAsTable("corpus_bucketed")
      batch.write.format("parquet").option("path", s"$dir/batch")
        .bucketBy(8, "url").sortBy("url").saveAsTable("batch_bucketed")
      val joined = spark.table("corpus_bucketed")
        .join(spark.table("batch_bucketed"), "url")
      assert(joined.count() === 334)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed url join must not shuffle either side:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS corpus_bucketed")
      spark.sql("DROP TABLE IF EXISTS batch_bucketed")
    }
  }

  test("engine co-located fetch mode: bucketed corpus, e2e parity, corpus side exchange-free") {
    import org.apache.spark.sql.functions._
    import graft.model.{CrawlConfig, ImageRow}
    import graft.corpus.Fixtures
    import graft.driver.CrawlEngine
    import graft.oracle.RefOracle
    val dir = java.nio.file.Files.createTempDirectory("graft-coloc").toString
    val pages = Fixtures.site3
    val pagesDf = spark.createDataset(pages).toDF()
    // register the RESOLVED corpus as a url-bucketed catalog table — the
    // engine contract for CrawlConfig.bucketedCorpusTable (Iceberg
    // bucket(url) in production, Spark bucketBy here)
    pagesDf.select(col("url").as("src_url"), col("status").as("f_status"),
        col("content_type").as("f_ct"), col("body").as("f_body"),
        col("image_id").as("f_image_id"), lit(0).as("hops"),
        lit(null).cast("string").as("f_err"))
      .write.format("parquet").option("path", s"$dir/corpus")
      .bucketBy(8, "src_url").sortBy("src_url").saveAsTable("graft_corpus_coloc")
    try {
      val images = pages.filter(_.image_id != null).map { p =>
        val id = p.image_id
        val k = math.abs(graft.image.ImageCodec.seedOf(id))
        val w = 16 + (k % 9).toInt
        val h = 16 + ((k >> 4) % 9).toInt
        val fmt = if (k % 2 == 0) "png" else "jpg"
        ImageRow(id, graft.image.ImageCodec.encode(id, w, h, fmt), w, h, fmt,
          graft.image.ImageCodec.caption(id), graft.image.ImageCodec.phash(id, w, h))
      }
      // broadcastBatchLimit=0 forces every wave down the mega-wave path,
      // which with a bucketed corpus selects the CO-LOCATED join
      val cfg = CrawlConfig(broadcastBatchLimit = 0L,
        bucketedCorpusTable = Some("graft_corpus_coloc"))
      val engine = new CrawlEngine(spark, cfg, pagesDf,
        spark.createDataset(images).toDF(), s"$dir/work")
      engine.run(Fixtures.site3Seeds)
      val oracle = RefOracle.crawl(pages, Fixtures.site3Seeds, cfg)
      val got = engine.frontierNow.select("url", "status")
        .as[(String, String)].collect().toMap
      assert(got.keySet === oracle.statuses.keySet)
      assert(got === oracle.statuses.map { case (u, (s, _)) => u -> s })
      assert(engine.outputNow.count() === 3)

      // pin the fetch-join plan shape the engine builds in this mode: the
      // bucketed corpus side must plan with NO Exchange (only the claimed
      // batch side may shuffle into the corpus' bucketing)
      val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        val corpus = engine.resolvedCorpus.withColumnRenamed("src_url", "url")
        val claimed = spark.createDataset(pages.map(p => (p.url, 0)))
          .toDF("url", "depth")
        val hits = corpus.join(claimed, Seq("url"), "inner")
        assert(hits.count() === 3)
        val plan = hits.queryExecution.executedPlan.toString
        val exchanges = "Exchange".r.findAllIn(plan).size
        assert(exchanges <= 1, s"corpus side must be exchange-free:\n$plan")
        assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
          s"corpus scan must be bucket-aware:\n$plan")
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
        spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_corpus_coloc")
    }
  }
}

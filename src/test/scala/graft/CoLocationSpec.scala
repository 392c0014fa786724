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
}

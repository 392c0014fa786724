package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.corpus.Corpus
import graft.functions.CrawlFunctions._

/** Scratch stage-by-stage profiler for the crawl micro-cycle hot path. */
object Profile {
  def main(args: Array[String]): Unit = {
    val cores = sys.env.getOrElse("P_CORES", "8").toInt
    val nPages = sys.env.getOrElse("P_PAGES", "200000").toInt
    val nHosts = sys.env.getOrElse("P_HOSTS", "256").toInt
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROFILE $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }

    val spec = Corpus.WebSpec(nHosts, nPages)
    val dir = java.nio.file.Files.createTempDirectory("graft-profile").toString

    time("corpus-gen-write") {
      Corpus.pages(spark, spec).toDF().write.parquet(s"$dir/pages")
    }
    time("images-gen-write") {
      Corpus.images(spark, spec).toDF().write.parquet(s"$dir/images")
    }
    val corpus = spark.read.parquet(s"$dir/pages")
    val images = spark.read.parquet(s"$dir/images")

    val frontier = time("frontier-init") {
      val f = corpus.select($"url", hostOfUdf($"url").as("host"))
        .withColumn("bucket", hostBucket($"host", 32))
      f.write.parquet(s"$dir/frontier"); spark.read.parquet(s"$dir/frontier")
    }
    time("scan-count") { frontier.count() }
    val fetched = frontier.join(corpus, Seq("url"), "left")
    time("fetch-join") { fetched.select(count(lit(1))).collect() }
    time("fetch-join+body-agg") {
      fetched.select(sum(length($"body"))).collect()
    }
    val parsed = fetched.withColumn("links",
      extractLinksUdf($"body", $"url", $"content_type"))
    time("parse-links") { parsed.select(sum(size($"links"))).collect() }
    val ajax = fetched.withColumn("b2", ajaxRewriteUdf($"body", $"url", $"content_type"))
      .withColumn("links", extractLinksUdf($"b2", $"url", $"content_type"))
    time("ajax+parse-links") { ajax.select(sum(size($"links"))).collect() }
    val withImg = fetched.filter($"image_id".isNotNull)
      .join(images, Seq("image_id"), "left")
    time("image-join") { withImg.select(count(lit(1))).collect() }
    time("image-join+psnr") {
      withImg.select(sum(psnrUdf($"image_id", $"bytes"))).collect()
    }
    val links = parsed.select(explode($"links").as("url"))
    time("explode+groupBy") {
      links.groupBy($"url").agg(count(lit(1))).select(count(lit(1))).collect()
    }
    time("dedup-antijoin") {
      links.join(frontier.select("url"), Seq("url"), "left_anti")
        .select(count(lit(1))).collect()
    }
    time("drain-window-budget10") {
      import org.apache.spark.sql.expressions.Window
      frontier.withColumn("rn", row_number().over(
        Window.partitionBy($"host").orderBy($"url")))
        .filter($"rn" <= 10).select(count(lit(1))).collect()
    }
    time("bloom-build") { frontier.stat.bloomFilter("url", 1000000, 0.01) }
    time("cow-write") {
      frontier.repartition($"bucket").write.mode("overwrite")
        .partitionBy("bucket").parquet(s"$dir/cow")
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.Dedup

/** Phase-level timing for the expensive dedup queries — run with
  * `sbt "runMain graft.tools.MicroBench [sfDir]"` to see where q41's
  * wall time actually goes before optimizing it. */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[micro] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs0 = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val aug = docs0.unionByName(docs0.filter(col("doc_id") % 3 === 0)
      .select((col("doc_id") + 100000).as("doc_id"),
        concat(col("text"), lit(" zqx7 vbn9")).as("text")))
    time("warmup-count")(aug.count())
    time("shingles-hof")(aug
      .select(Dedup.shingleSet(col("text"), 3).as("sh"))
      .select(sum(size(col("sh")))).collect())
    time("shingles-kernel")(aug
      .select(Dedup.shingleSetUdf(3)(col("text")).as("sh"))
      .select(sum(size(col("sh")))).collect())
    time("sketch-kernel-96x32")(aug
      .select(Dedup.sketchUdf(3, 32, 3)(col("text")).as("sk"))
      .select(sum(size(col("sk._1")))).collect())
    time("full-q41")(graft.SparkEntry.queries("q41_dedup_minhash")(spark, dir)
      .write.format("noop").mode("overwrite").save())
    time("full-q41-rerun")(graft.SparkEntry.queries("q41_dedup_minhash")(spark, dir)
      .write.format("noop").mode("overwrite").save())
    time("full-q43")(graft.SparkEntry.queries("q43_ngram_jaccard")(spark, dir)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}

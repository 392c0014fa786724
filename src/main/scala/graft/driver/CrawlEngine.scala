package graft.driver

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.storage.StorageLevel
import graft.model._
import graft.functions.SeenSketch
import graft.functions.CrawlFunctions._
import graft.plans.{SnapTable, Snapshot, SnapshotStore}
import graft.operators.{Politeness, Stages}

/**
 * The crawl micro-cycle engine (SURVEY §3.4): the reference's continuous
 * actor loop (Manager pull → pipelines → Downloader → Crawler → Master;
 * reference: src/main/scala/es/udc/scrawl/Manager.scala:82-147) re-expressed
 * as batched cycles of pure DataFrame transforms over snapshot tables.
 *
 * Per cycle: DRAIN (window top-k per host) → ROBOTS (gate/synthesize-fetch/
 * defer) → POLITE (per-host budget) → FETCH (join vs corpus) → RESPOND
 * (retry 404 / filter 403,500 / ajax rewrite) → PARSE (extract links +
 * image payload) → DEPTH → ENQUEUE (bloom prefilter + anti-join dedup) →
 * COMMIT (atomic snapshot: frontier COW by hostBucket + robots + output +
 * lineage). All state lives in tables; resume = reopen LATEST snapshot.
 *
 * Scale notes (north_rule): the frontier is partitioned by a SALTED host
 * hash — `bucket = pmod(xxhash64(host), P)` for normal hosts, spread across
 * `hotHostSalts` url-salted buckets for promoted hot domains (see
 * CrawlConfig.hotHostSalts / promoteHotHosts) — and a cycle rewrites only
 * touched buckets.
 * Shuffles per cycle: drain window (by host), fetch join (by url), dedup
 * anti-join (by url) — ≤3 as designed (SURVEY §4.3). Logical clock = cycle
 * number; no wall-clock in executors.
 */
final class CrawlEngine(
    val spark: SparkSession,
    val config: CrawlConfig,
    pages: DataFrame,
    images: DataFrame,
    val workDir: String,
    store: SnapshotStore = null) {

  import spark.implicits._

  /** Durable-table layer: the bundled manifest store by default; inject an
    * Iceberg-backed [[SnapshotStore]] here to run on a real catalog. */
  val snap: SnapshotStore =
    Option(store).getOrElse(new SnapTable(spark, s"$workDir/state"))
  // codegen'd URL expressions (graft_canonicalize / graft_host) for the
  // hot enqueue projection — registered idempotently per session
  graft.functions.UrlExpressions.register(spark)
  private val corpusPath = s"$workDir/corpus_resolved"
  private val corpusRobotsPath = s"$workDir/corpus_robots"
  private val imagesPath = s"$workDir/images_resolved"
  private var seenCountEstimate: Long = 0L
  // Upper-bound estimate of next cycle's claimed-batch size (maintained from
  // seed counts and each cycle's pending total — no extra jobs). Picks the
  // fetch/validate join strategy: politeness-bounded batches broadcast
  // (bodies never shuffle); a mega-wave above broadcastBatchLimit switches
  // to shuffle-hash joins — the plan a cluster planner would pick when the
  // batch no longer fits a driver-built broadcast relation.
  private var expectedBatch: Long = 0L
  // Cycle-persistent URL-seen filter (north_star), two-level:
  //  - MAIN covers the whole frontier as of its last rebuild (amortized
  //    O(1)/url: rebuilt only when the seen count doubles);
  //  - RECENT covers every url enqueued since that rebuild (per-cycle merge
  //    cost is O(enqueued): the merge sketch is sized to the recent window,
  //    never to the full frontier).
  // Both ship to executors via sc.broadcast. A url is "maybe seen" iff
  // either sketch says so; false positives fall through to the exact
  // anti-join, false negatives are impossible because every enqueue path
  // (runCycle commit AND mid-crawl addSeeds) feeds RECENT before the next
  // drain — so dedup stays exact.
  // Sketch kind per config.seenSketch: "bloom" (default) or "cuckoo"
  // (deletable — see functions/SeenSketch.scala); the two-level design is
  // sketch-agnostic and exactness-preserving for both.
  // Hot-host salting state (north_rule "salted host-hash"; see
  // CrawlConfig.hotHostSalts). `hotHosts` is the PERSISTED promotion set —
  // bucket placement is a pure function of (host, url, hotHosts), loaded
  // with each snapshot so COW dirs, the dedup prune, and resumed runs all
  // compute identical placement. `bucketRowEst` tracks cumulative rows per
  // bucket (seeds + enqueues — an upper bound on live rows, which is the
  // right signal: COW write cost is proportional to total bucket size);
  // detection only scans a bucket's hosts when its estimate crosses the
  // threshold and re-scans on doubling, so promotion costs no extra jobs
  // until a bucket is actually suspect.
  private var hotHosts: Set[String] = Set.empty
  private var hotLoadedVersion: Long = -1L
  private val bucketRowEst = scala.collection.mutable.Map.empty[Int, Long]
  private val lastHotCheck = scala.collection.mutable.Map.empty[Int, Long]
  private var mainBloom: Option[Broadcast[SeenSketch]] = None
  private var mainItems: Long = 0L
  private var recentMaster: Option[SeenSketch] = None
  private var recentBloom: Option[Broadcast[SeenSketch]] = None
  private var recentItems: Long = 1L << 17
  private var recentCount: Long = 0L
  private val RedirectCodes = Seq(301, 302, 303, 307, 308)

  /** Rebuild MAIN from the live frontier when it is absent or outgrown, or
    * when RECENT has outgrown its sizing (then RECENT also doubles). */
  private def ensureBloom(frontier: DataFrame): Unit = {
    if (!config.useBloom) return
    val mainStale = mainBloom.isEmpty || seenCountEstimate > mainItems / 2
    val recentFull = recentCount > recentItems / 2
    if (!mainStale && !recentFull) return
    if (recentFull) recentItems *= 2
    mainItems = math.max(math.max(seenCountEstimate * 4, mainItems), 1L << 20)
    val fresh = phaseTimed("bloom-build")(
      SeenSketch.build(frontier, "url", config.seenSketch, mainItems, 0.01))
    mainBloom.foreach(_.unpersist(false))
    mainBloom = Some(spark.sparkContext.broadcast(fresh))
    recentMaster = Some(SeenSketch.create(config.seenSketch, recentItems, 0.01))
    recentCount = 0L
    rebroadcastRecent()
  }

  /** Broadcast a frozen copy of RECENT (the driver-side master keeps
    * mutating; broadcasts must be immutable snapshots). */
  private def rebroadcastRecent(): Unit = {
    val frozen = recentMaster.get.frozenCopy()
    recentBloom.foreach(_.unpersist(false))
    recentBloom = Some(spark.sparkContext.broadcast(frozen))
  }

  /**
   * Pre-resolve redirect chains once per run (S4): spray's host connector
   * follows ≤5 redirects transparently (reference.conf:33), keeping the
   * task's original URL. maxRedirects joins at setup time buys a single
   * equi-join per cycle at fetch time.
   */
  def prepareCorpus(): Unit = {
    // materialize the images table once: the input may be a *generated*
    // Dataset (bench/CrawlMain synthesize it), and every join against a
    // generated plan would re-run the whole synthesis — parquet-backing it
    // makes the per-cycle image join a columnar scan instead
    if (!new java.io.File(imagesPath).exists())
      images.write.mode("overwrite").parquet(imagesPath)
    def ensureRobotsTable(): Unit =
      if (!new java.io.File(corpusRobotsPath).exists())
        resolvedCorpus
          .filter($"src_url".endsWith("/robots.txt"))
          .write.mode("overwrite").parquet(corpusRobotsPath)
    // a user-supplied bucketed corpus table IS the resolved corpus (the
    // Iceberg bucket(url) layout): no redirect pre-resolution pass here —
    // only the small one-row-per-host robots side table is derived from it
    if (config.bucketedCorpusTable.nonEmpty) { ensureRobotsTable(); return }
    if (new java.io.File(corpusPath).exists()) { ensureRobotsTable(); return }
    val p = pages.select($"url", $"status", $"content_type", $"body",
      $"image_id", $"redirect_to")
    var cur = p.select(
      $"url".as("src_url"), $"status".as("f_status"),
      $"content_type".as("f_ct"), $"body".as("f_body"),
      $"image_id".as("f_image_id"), $"redirect_to".as("next"),
      lit(0).as("hops"))
    for (_ <- 1 to config.maxRedirects) {
      val pending = cur.filter($"f_status".isin(RedirectCodes: _*) && $"next".isNotNull)
      val done = cur.filter(!($"f_status".isin(RedirectCodes: _*) && $"next".isNotNull))
      val stepped = pending.select($"src_url", $"next", $"hops")
        .join(p.withColumnRenamed("url", "next"), Seq("next"), "left")
        .select($"src_url",
          coalesce($"status", lit(-1)).as("f_status"), // -1 = broken hop ⇒ connection error
          $"content_type".as("f_ct"), $"body".as("f_body"),
          $"image_id".as("f_image_id"), $"redirect_to".as("next"),
          ($"hops" + 1).as("hops"))
      cur = done.unionByName(stepped)
    }
    // still redirecting after maxRedirects hops ⇒ too-many-redirects error
    cur.withColumn("f_err",
      when($"f_status" === -1, lit(Reasons.connectionError))
        .when($"f_status".isin(RedirectCodes: _*) && $"next".isNotNull,
          lit(Reasons.maxRedirects)))
      .drop("next")
      .write.mode("overwrite").parquet(corpusPath)
    // robots.txt rows land in their own table ONCE at setup: parquet can't
    // push an EndsWith predicate, so filtering the main corpus would still
    // column-scan every row's body each robots cycle — a dedicated ~one-
    // row-per-host table makes the per-cycle robots join O(hosts), not
    // O(corpus), at any corpus size
    ensureRobotsTable()
  }

  /** The resolved corpus: the user-registered url-bucketed catalog table
    * when configured (co-located fetch joins — no Exchange on the corpus
    * side at any batch size), else the redirect-resolved parquet built by
    * [[prepareCorpus]]. Schema either way:
    * (src_url, f_status, f_ct, f_body, f_image_id, hops, f_err).
    *
    * All three tables are immutable for the lifetime of the engine, so the
    * DataFrames are memoized: a fresh `spark.read.parquet` per wave costs a
    * driver-side directory listing + schema read each time — measurable in
    * the per-wave plan-build budget, pure waste. `lazy` so construction
    * still happens after [[prepareCorpus]] wrote the files. */
  lazy val resolvedCorpus: DataFrame = config.bucketedCorpusTable
    .map(spark.table).getOrElse(spark.read.parquet(corpusPath))
  lazy val resolvedCorpusRobots: DataFrame = spark.read.parquet(corpusRobotsPath)
  lazy val resolvedImages: DataFrame = spark.read.parquet(imagesPath)

  /** Seed injection (S1): depth-0 New rows, deduped (Master.scala:104-113).
    * `headers` (Request headers, Protocol.scala:33) ride the frontier rows;
    * null selects `config.defaultHeaders`. */
  def init(seeds: Seq[String], headers: Map[String, String] = null): Unit =
    initSeeds(seeds.toDF("raw"), headers)

  /**
   * Distributed seed injection: `seedsRaw` is any DataFrame with a `raw`
   * URL column. Seeds never pass through the driver — a 10^10-URL seed
   * list stays a distributed scan end to end.
   */
  def initSeeds(seedsRaw: DataFrame, headers: Map[String, String] = null): Unit = {
    require(snap.latestVersion.isEmpty,
      s"$workDir already holds crawl state (snapshot v${snap.latestVersion.get}); " +
        "use resume() or point at a fresh workdir")
    prepareCorpus()
    val rows = seedsRaw
      .select(call_function("graft_canonicalize", $"raw").as("url")).filter($"url".isNotNull)
      .dropDuplicates("url")
      .withColumn("host", call_function("graft_host", $"url"))
      .withColumn("depth", lit(0))
      .withColumn("prio", lit(0L))
      .withColumn("status", lit(Status.New))
      .withColumn("started", lit(-1L))
      .withColumn("retries", lit(0))
      .withColumn("reason", lit(null).cast("string"))
      .withColumn("headers",
        typedlit(Option(headers).getOrElse(config.defaultHeaders)))
      .withColumn("bucket", bucketCol($"host", $"url"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val perBucket = rows.groupBy($"bucket").agg(count(lit(1))).collect()
    val buckets = perBucket.map(_.getInt(0)).toSet
    perBucket.foreach(r => bucketRowEst(r.getInt(0)) =
      bucketRowEst.getOrElse(r.getInt(0), 0L) + r.getLong(1))
    seenCountEstimate = perBucket.map(_.getLong(1)).sum
    expectedBatch = seenCountEstimate
    snap.commit(cycle = 0,
      cowTables = Map("frontier" -> ((rows, "bucket", buckets))),
      metrics = Map("seeded" -> seenCountEstimate.toDouble,
        "num_buckets" -> config.numBuckets.toDouble))
    rows.unpersist(): Unit
  }

  /**
   * Bucket-keyed state (frontier/robots COW dirs, the dedup-confirm
   * partition pruning) is only valid under the numBuckets that keyed it:
   * resuming a workdir with a different numBuckets would prune the wrong
   * bucket dirs and silently re-enqueue seen URLs (an O5 exactness break)
   * and replace COW dirs holding rows that now hash elsewhere. Every commit
   * records `num_buckets`; any reuse of committed state must match.
   */
  private def requireBucketCompat(s: Snapshot): Unit = {
    s.metrics.get("num_buckets").foreach { nb =>
      require(nb.toInt == config.numBuckets,
        s"workdir state was committed with numBuckets=${nb.toInt} but " +
          s"config.numBuckets=${config.numBuckets}; bucket-keyed snapshot " +
          "dirs and dedup pruning would silently mismatch — resume with " +
          "the original numBuckets")
    }
    // salted placement is keyed by hotHostSalts exactly like numBuckets:
    // once any host has been promoted, resuming with a different salt
    // count would re-derive buckets that no longer match the COW dirs
    if (s.metrics.get("hot_hosts").exists(_ > 0))
      s.metrics.get("hot_host_salts").foreach { k =>
        require(k.toInt == config.hotHostSalts,
          s"workdir state holds hot hosts salted with k=${k.toInt} but " +
            s"config.hotHostSalts=${config.hotHostSalts}; resume with the " +
            "original salt count")
      }
  }

  /**
   * Mid-crawl seed injection (S2 — the reference's remote AddTasks entry
   * point, reference AddTasks.scala:42-48 sending NewTasks to the master):
   * dedups against the live frontier (O5: first insertion wins,
   * Master.scala:104-113) and commits unseen URLs as depth-0 New rows.
   * Returns the number of rows actually enqueued.
   */
  def addSeeds(seeds: Seq[String], headers: Map[String, String] = null): Long = {
    val prev = snap.latest.getOrElse(sys.error("engine not initialized"))
    requireBucketCompat(prev)
    val frontier = loadFrontier(prev)
    val rows = seeds.toDF("raw")
      .select(call_function("graft_canonicalize", $"raw").as("url")).filter($"url".isNotNull)
      .dropDuplicates("url")
      .join(frontier.select("url"), Seq("url"), "left_anti")
      .withColumn("host", call_function("graft_host", $"url"))
      .withColumn("depth", lit(0))
      .withColumn("prio", lit(prev.cycle))
      .withColumn("status", lit(Status.New))
      .withColumn("started", lit(-1L))
      .withColumn("retries", lit(0))
      .withColumn("reason", lit(null).cast("string"))
      .withColumn("headers",
        typedlit(Option(headers).getOrElse(config.defaultHeaders)))
      .withColumn("bucket", bucketCol($"host", $"url"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val perBucket = rows.groupBy($"bucket").agg(count(lit(1))).collect()
    val touched = perBucket.map(_.getInt(0)).toSet
    perBucket.foreach(r => bucketRowEst(r.getInt(0)) =
      bucketRowEst.getOrElse(r.getInt(0), 0L) + r.getLong(1))
    val added = if (touched.isEmpty) 0L else {
      val next = frontier
        .filter($"bucket".isin(touched.toSeq: _*))
        .unionByName(rows.select(frontier.columns.map(col): _*))
      val n = perBucket.map(_.getLong(1)).sum
      snap.commit(prev.cycle,
        cowTables = Map("frontier" -> ((next, "bucket", touched))),
        metrics = Map("seeds_added" -> n.toDouble,
          "num_buckets" -> config.numBuckets.toDouble,
          // the salt-compat resume guard reads the LATEST snapshot's
          // metrics — an addSeeds commit must carry them too
          "hot_hosts" -> hotHosts.size.toDouble,
          "hot_host_salts" -> config.hotHostSalts.toDouble))
      seenCountEstimate += n
      expectedBatch += n
      // injected seeds must become visible to the URL-seen filter BEFORE the
      // next drain: a later-crawled page linking back to an injected seed
      // would otherwise take the "bloom says no => definitely unseen" fast
      // path and re-enqueue a duplicate. Feeding RECENT (superset is fine —
      // dedup-dropped urls only add harmless maybes) keeps O5 exact.
      recentMaster.foreach { r =>
        seeds.iterator.flatMap(graft.urls.CUrl.canonicalize).foreach(r.put)
        recentCount += n
        rebroadcastRecent()
      }
      n
    }
    rows.unpersist()
    added
  }

  /** The frontier placement function: plain host bucket, or url-salted for
    * promoted hot hosts — every site that assigns or re-derives a frontier
    * row's bucket MUST go through this one definition. */
  private def bucketCol(host: org.apache.spark.sql.Column,
      url: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    saltedHostBucket(host, url, config.numBuckets, config.hotHostSalts, hotHosts)

  /** Load the persisted hot-host set for snapshot `s` (memoized per
    * version) — MUST precede any bucket re-derivation against `s`. */
  private def ensureHotHosts(s: Snapshot): Unit = {
    if (config.hotHostSalts <= 1 || s.version == hotLoadedVersion) return
    hotHosts = snap.readTable(s, "hothosts")
      .map(_.select("host").as[String].collect().toSet)
      .getOrElse(Set.empty)
    hotLoadedVersion = s.version
  }

  def loadFrontier(s: Snapshot): DataFrame = {
    ensureHotHosts(s)
    snap.readTable(s, "frontier").get
      .withColumn("bucket", bucketCol($"host", $"url"))
  }

  /** Robots state, bucketed by the SAME hostBucket as the frontier (the
    * bucket column is re-derived from host after load, like loadFrontier —
    * COW dirs drop it via partitionBy). Absent table (fresh workdir) =
    * empty: the first cycle synthesizes every needed robots fetch. */
  def loadRobots(s: Snapshot): DataFrame =
    snap.readTable(s, "robots")
      .getOrElse(spark.emptyDataset[RobotsRow].toDF())
      .withColumn("bucket", hostBucket($"host", config.numBuckets))

  /** O9 — completion: no New and no stale-InProgress rows remain. */
  def remaining(frontier: DataFrame, cycle: Long): Long =
    frontier.filter(drainablePredicate(cycle)).count()

  private def drainablePredicate(cycle: Long) =
    $"status" === Status.New ||
      ($"status" === Status.InProgress && $"started" < lit(cycle - config.staleCycles))

  /**
   * Run one micro-cycle; returns (snapshot, drainedCount). drained == 0 with
   * robots-deferral impossible ⇒ Finished.
   */
  // Spark jobs launched so far (timing mode only): each job is a scheduler
  // round-trip, the unit the per-cycle fixed-latency budget is spent in
  private lazy val jobsSoFar: () => Long =
    if (!sys.env.get("GRAFT_CYCLE_TIMING").contains("1")) () => 0L
    else {
      val c = new java.util.concurrent.atomic.AtomicLong
      val logJobs = sys.env.get("GRAFT_JOB_LOG").contains("1")
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
            c.incrementAndGet()
            if (logJobs) {
              val props = Option(j.properties)
              def p(k: String) = props.map(_.getProperty(k)).flatMap(Option(_))
              val site = p("spark.job.description").orElse(p("callSite.short"))
                .getOrElse(j.stageInfos.lastOption.map(_.name).getOrElse("?"))
              System.err.println(s"    [job ${j.jobId}] ${site.take(140)}")
            }
            ()
          }
        })
      () => c.get()
    }

  private def phaseTimed[T](label: String)(f: => T): T = {
    if (!sys.env.get("GRAFT_CYCLE_TIMING").contains("1")) f
    else {
      val t0 = System.nanoTime()
      val j0 = jobsSoFar()
      val r = f
      System.err.println(f"  [phase $label] ${(System.nanoTime() - t0) / 1e9}%.2fs jobs=${jobsSoFar() - j0}")
      r
    }
  }

  /**
   * The default fetcher — the corpus join. Join strategy by estimated batch
   * size (bigBatch, computed at the robots gate): bounded batches broadcast
   * into the corpus scan (bodies never shuffle); a mega-wave too big for a
   * driver-built broadcast relation shuffle-hash-joins by url instead — one
   * distributed shuffle of the claimed wave's pages, no O(batch)
   * single-threaded driver work. Three strategies, picked by batch estimate
   * + corpus layout:
   *  - bounded batch: broadcast the claimed keys into the corpus scan;
   *  - mega-wave over a url-BUCKETED corpus table: CO-LOCATED join — the
   *    planner reads the corpus bucket-aligned with zero Exchange on the
   *    corpus side and shuffles only the (narrow) claimed batch into the
   *    corpus' bucketing, so pixel/body bytes never shuffle at ANY size;
   *  - mega-wave over the plain parquet stand-in: shuffle-hash by url.
   */
  private def corpusFetch(claimed: DataFrame, bigBatch: Boolean): DataFrame = {
    val corpus = resolvedCorpus.withColumnRenamed("src_url", "url")
    val coLocated = config.bucketedCorpusTable.nonEmpty
    val hits =
      if (bigBatch && coLocated) corpus.join(claimed, Seq("url"), "inner")
      else if (bigBatch) corpus.join(claimed.hint("shuffle_hash"), Seq("url"), "inner")
      else corpus.join(broadcast(claimed), Seq("url"), "inner")
    // urls claimed but absent from the corpus => connection error; the semi/
    // anti joins read only the corpus url column (pruned scan, no bodies)
    val misses = (if (bigBatch && coLocated)
      claimed.join(corpus.select($"url"), Seq("url"), "left_anti")
    else if (bigBatch)
      claimed.join(corpus.select($"url").hint("shuffle_hash"), Seq("url"), "left_anti")
    else {
      // broadcasting `claimed` (not a url-only projection) makes this semi
      // probe's BroadcastExchange identical to the hits join's — reused,
      // not rebuilt; the extra columns are slim (no bodies)
      val present = corpus.select($"url")
        .join(broadcast(claimed), Seq("url"), "left_semi")
      claimed.join(broadcast(present), Seq("url"), "left_anti")
    })
      .withColumns(Map( // one batched analysis (was 6 chained withColumn re-analyses)
        "f_status" -> lit(null).cast("int"),
        "f_ct" -> lit(null).cast("string"),
        "f_body" -> lit(null).cast("string"),
        "f_image_id" -> lit(null).cast("string"),
        "hops" -> lit(0),
        "f_err" -> lit(null).cast("string")))
    hits.unionByName(misses)
  }

  import CrawlEngine.WaveOut

  /**
   * One drain → robots → fetch → parse → enqueue wave (SURVEY §3.4 steps
   * 1-8) as pure transforms over the IN-MEMORY frontier/robots state,
   * without committing: runGroup chains `wavesPerCommit` of these through
   * their cached outputs and commits once, so the snapshot write (the
   * dominant fixed cost at small wave sizes) amortizes over K waves while
   * crawl semantics stay wave-per-cycle identical.
   *
   * @param pruneSnap the committed snapshot whose manifest may prune the
   *   dedup-confirm read — only valid for the FIRST wave after a commit;
   *   later waves' frontiers exist only in memory, so they prune with a
   *   bucket predicate on the cached frontier instead (same O(candidate
   *   buckets) work against the in-memory columnar batches).
   */
  private def runWave(pruneSnap: Option[Snapshot], frontier: DataFrame,
      robots: DataFrame, cycle: Long): WaveOut = {
    val tPlan0 = System.nanoTime()

    // ---- 1. DRAIN candidates (O1): window top-k per host ----------------
    val drainable = frontier.filter(drainablePredicate(cycle))
    // ---- 2. POLITE (O12): ≤ hostBudget rows per host per cycle ----------
    val hostW = Window.partitionBy($"host").orderBy($"depth", $"prio", $"url")
    val polite0 =
      if (config.hostBudget >= Int.MaxValue / 2) drainable // unbounded budget: top-k is identity, skip the shuffle
      else if (config.usePolitenessMapGroups)
        Politeness.tokenBucket(spark, drainable, config.hostBudget)
      else drainable.withColumn("rn", row_number().over(hostW))
          .filter($"rn" <= config.hostBudget).drop("rn")
    val polite = (if (config.globalBatchCap == Int.MaxValue) polite0
      else {
        // bounded cycles via PER-BUCKET quotas: a global Window.orderBy
        // would funnel every drainable row through ONE partition to rank it;
        // capping each hostBucket at ceil(cap / numBuckets) keeps the plan
        // fully parallel (WindowGroupLimit folds the top-k map-side) and
        // still bounds the batch at <= cap rows
        val quota = math.max(1L,
          (config.globalBatchCap.toLong + config.numBuckets - 1) / config.numBuckets)
        polite0.withColumn("grn", row_number().over(
            Window.partitionBy($"bucket").orderBy($"depth", $"prio", $"url")))
          .filter($"grn" <= quota).drop("grn")
      }).persist(StorageLevel.MEMORY_AND_DISK)

    // ---- 3. ROBOTS gate (P3): known-allow / known-deny / defer+fetch ----
    // The gate NEVER broadcasts the full robots table (at 10^7-10^8
    // authorities that is a multi-GB broadcast per cycle): the batch's
    // hosts semi-join the robots table first — a column-pruned scan whose
    // survivors are O(batch hosts) — and only those rules ship to the
    // gate join. Mirrors the reference's per-host robots cache lookup
    // (pipeline/RobotsFilter.scala:22-24: one map probe per request host,
    // not a scan of every cached authority). A mega-wave batch above the
    // broadcast limit switches both joins to shuffle-hash, like the fetch.
    val bigBatch = expectedBatch > config.broadcastBatchLimit
    val batchHosts = polite.select($"host").distinct()
    val robotsPruned =
      if (bigBatch) robots.drop("bucket")
        .join(batchHosts.hint("shuffle_hash"), Seq("host"), "left_semi")
      else robots.drop("bucket")
        .join(broadcast(batchHosts), Seq("host"), "left_semi")
    // the allow/deny verdict is computed ONCE per row as a column (the
    // parse+match UDF is the priciest scalar in the gate), then split —
    // not re-evaluated per branch
    val withRobots = (if (bigBatch)
        polite.join(robotsPruned.hint("shuffle_hash"), Seq("host"), "left")
      else polite.join(broadcast(robotsPruned), Seq("host"), "left"))
      .withColumn("robots_ok", $"fetched_cycle".isNotNull &&
        ($"all_allowed" ||
          robotsAllowedUdf($"rules", lit(config.userAgent), $"url")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val robotsUnknown = withRobots.filter($"fetched_cycle".isNull)

    val denied = withRobots.filter($"fetched_cycle".isNotNull && !$"robots_ok")
    val allowed = withRobots.filter($"robots_ok")

    // hosts lacking robots: synthesize ONE robots fetch per authority this
    // cycle, carrying THE SAME HEADERS as the (deterministically first)
    // page request that triggered it — reference RobotsFilter.scala:63-68,
    // asserted by RobotsFilterTest.scala:38-60. Their page rows stay New
    // (deferral ≙ the reference's `waiting` queue, ≤1 extra cycle latency).
    val robotsFetch = robotsUnknown.groupBy($"host")
      .agg(min($"url").as("any_url"),
        min_by($"headers", $"url").as("req_headers"))
      .select($"host", concat(split($"any_url", "/")(0), lit("//"), $"host",
        lit("/robots.txt")).as("src_url"), $"req_headers")
    // the robots corpus scan is pruned by a pushed EndsWith filter (~one
    // row per host) and joined with the SAME broadcast hits/misses shape as
    // the page fetch: a plain `robotsFetch LEFT JOIN corpus` would stream —
    // or worse, shuffle — the ENTIRE corpus every cycle to serve a
    // left-preserved tiny side, even on cycles with zero pending robots
    val corpusRobots = resolvedCorpusRobots
    val robotsHits = corpusRobots.join(broadcast(robotsFetch), Seq("src_url"), "inner")
    // the semi probe broadcasts the SAME relation as the hits join (not a
    // url-only projection) so the physical plan reuses one
    // BroadcastExchange instead of building two
    val robotsMisses = robotsFetch.join(
        broadcast(corpusRobots.select($"src_url")
          .join(broadcast(robotsFetch), Seq("src_url"), "left_semi")),
        Seq("src_url"), "left_anti")
      .withColumns(Map( // one batched analysis: each withColumn re-analyzes the whole subtree
        "f_status" -> lit(null).cast("int"),
        "f_err" -> lit(null).cast("string"),
        "f_body" -> lit(null).cast("string")))
    val robotsResp = robotsHits
      .select($"host", $"req_headers", $"f_status", $"f_err", $"f_body")
      .unionByName(robotsMisses
        .select($"host", $"req_headers", $"f_status", $"f_err", $"f_body"))
      .select($"host",
        when($"f_status" === 200 && $"f_err".isNull,
          robotsParseUdf($"f_body")).otherwise(lit(null)).as("parsed"),
        $"f_status", $"f_err", $"req_headers")
    // 200+parse-ok ⇒ rules; 200+parse-fail / non-200 / missing / error ⇒ all
    // allowed (RobotsFilter.scala:74-81, 99-103, 110-119)
    val robotsNew = robotsResp.select($"host",
      ($"parsed".isNull).as("all_allowed"),
      $"parsed".as("rules"), lit(cycle).as("fetched_cycle"), $"req_headers")
      .withColumn("bucket", hostBucket($"host", config.numBuckets))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val robotsOut = robots.unionByName(robotsNew)

    // ---- 4. FETCH (S3/S4): stream the corpus ONCE against broadcast batch
    // keys (reference Downloader.scala:30-49). A shuffle join here would
    // move the ENTIRE corpus — body column included — across the cluster
    // every micro-cycle; instead the claimed batch broadcasts into the
    // corpus scan (inner join = hits, bodies never leave their partitions),
    // and fetch misses (connection errors) come from a second, column-pruned
    // url-only pass. Batch size is bounded by hostBudget/globalBatchCap, so
    // the broadcast stays executor-memory-sized at any frontier scale.
    // headers ride along: the pluggable-stage contract (operators/Stages
    // .scala) exposes the wide fetch row INCLUDING per-request headers —
    // the reference's stages receive the full Response with its headers
    // (pipeline/Stage.scala, Protocol.scala:33-36). The map column costs
    // broadcast bytes, but the batch is politeness/cap-bounded and default
    // headers are a handful of entries.
    val claimed = allowed.select($"url", $"host", $"bucket", $"depth",
      $"prio", $"retries", $"headers").persist(StorageLevel.MEMORY_AND_DISK)
    val fetched = config.fetcher match {
      case Some(fetch) =>
        // injected fetcher (S3 production seam, CrawlConfig.fetcher): the
        // claimed batch goes in, wide fetch rows come out — the engine
        // neither knows nor cares whether rows came from the corpus join
        // or a live HTTP client; parity vs the default is pinned in
        // EngineParitySpec ("fetcher seam")
        fetch(claimed)
      case None => corpusFetch(claimed, bigBatch)
    }
    // ---- 5. RESPOND: the pluggable response-leg stage chain -------------
    // reference.conf:66-71 traversed right-to-left: RetryHttpError →
    // FilterHttpError → AjaxLinksTransform (RobotsFilter's response leg is
    // the robots-cache step above). The chain is config-driven
    // (CrawlConfig.responseStages ≙ the reference's reflective stage list,
    // Pipeline.scala:39-46); the Downloader's own error channel (connection
    // failures, Downloader.scala:44-48) is tagged before any stage runs.
    val preTagged = fetched
      .withColumns(Map(
        "outcome" ->
          when($"f_err".isNotNull || $"f_status".isNull || $"f_status" === -1,
            lit("ERROR")).otherwise(lit(null).cast("string")),
        "reason" ->
          when($"f_err".isNotNull, $"f_err")
            .when($"f_status".isNull, lit(Reasons.connectionError))))
    val responseChain = config.responseStages.getOrElse(Seq(
      Stages.retryHttpError(config.retryCodes, config.maxRetries),
      Stages.filterHttpError(config.filterCodes),
      Stages.ajaxRewrite))
    // CACHE SLIMMING (bandwidth at scale): when both downstream hooks are
    // the defaults, the body's LAST consumer is the link extraction — so
    // extract links BEFORE persisting and drop f_body/f_ct from the cached
    // wave state. Otherwise the two fattest wave caches (`responded`, `ok`)
    // each hold every fetched body for the whole wave: cache fill + the 2-3
    // downstream reads stream those bytes through memory again, and on the
    // single-box bench that traffic contends with the shuffle/COW writes
    // for the same memory channels. Custom result stages or an
    // extractInformation hook may read f_body, so they keep the wide rows.
    val slimWave = config.extractInfo.isEmpty && config.resultStages.isEmpty
    val respondedWide = responseChain.foldLeft(preTagged)((df, s) => s(df))
      .withColumn("outcome", coalesce($"outcome", lit("OK")))
    val responded = (if (slimWave)
        respondedWide
          .withColumn("links",
            when($"outcome" === "OK", extractLinksUdf($"f_body", $"url", $"f_ct")))
          .drop("f_body", "f_ct")
      else respondedWide)
      .persist(StorageLevel.MEMORY_AND_DISK)

    // ---- 6. PARSE (X1/X2) + 7. result-leg stage chain (P8 by default) ---
    // ajax rewrite already mutated f_body in the response chain; the
    // Crawler extracts links for every OK page and the RESULT stages
    // (default: MaxDepthFilter) then prune them — exactly the reference's
    // Crawler → result-pipeline traversal (Manager.scala:137-147)
    val parsed =
      if (slimWave) responded.filter($"outcome" === "OK")
      else responded.filter($"outcome" === "OK")
        .withColumn("links", extractLinksUdf($"f_body", $"url", $"f_ct"))
    val resultChain = config.resultStages
      .getOrElse(Seq(Stages.maxDepth(config.maxDepth)))
    val ok = resultChain.foldLeft(parsed)((df, s) => s(df))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // outcomes ledger for the claimed batch (O6/O7) + robots denials
    // (RobotsFilter.scala:58-61 — deny ⇒ Error(task, RobotsPathFiltered(ua)))
    val outcomes = responded.select($"url", $"host", $"bucket", $"depth",
      $"prio", $"retries", $"outcome", $"reason")
      .unionByName(denied.select($"url", $"host", $"bucket", $"depth",
        $"prio", $"retries", lit("ERROR").as("outcome"),
        lit(Reasons.robotsPathFiltered(config.userAgent)).as("reason")))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // ---- output rows (S7): image payload + per-row validation -----------
    // join direction matters at scale: broadcast the (small) batch keys to
    // the images table so the pixel bytes are validated IN PLACE — a
    // shuffle join here would move the whole payload column across the
    // cluster just to compute a per-row PSNR
    val okImages = ok.filter($"f_image_id".isNotNull)
      .select($"f_image_id".as("image_id"), $"url".as("src_url"), $"depth")
    // okImages is ids-only (~tens of bytes/row) — broadcast beats a
    // shuffle-hash join at ANY realistic batch size here, because the
    // shuffle alternative moves the wide pixel-bytes column; bytes are
    // validated in place at every batch size. (Beyond ~10^7-row batches,
    // bucket both tables by image_id for a co-located join instead.)
    val matchedImages = resolvedImages
      .join(broadcast(okImages), Seq("image_id"), "inner")
      .select($"image_id", $"w", $"h", $"fmt", $"caption",
        $"phash", $"src_url", $"depth", lit(cycle).as("cycle"),
        psnrUdf($"image_id", $"bytes").as("psnr"),
        ($"caption" === refCaptionUdf($"image_id")).as("caption_ok"))
    // dangling references (page names an image_id absent from the images
    // table) surface as failed-validation rows — psnr 0, caption_ok false —
    // instead of silently vanishing from the output; the id-only semi join
    // is a pruned scan (no pixel bytes read)
    val presentImages = resolvedImages.select($"image_id")
      .join(broadcast(okImages), Seq("image_id"), "left_semi") // same exchange as matchedImages' — reused
    val danglingImages = okImages
      .join(broadcast(presentImages), Seq("image_id"), "left_anti")
      .select($"image_id", lit(null).cast("int").as("w"),
        lit(null).cast("int").as("h"), lit(null).cast("string").as("fmt"),
        lit(null).cast("string").as("caption"), lit(null).cast("long").as("phash"),
        $"src_url", $"depth", lit(cycle).as("cycle"),
        lit(0.0).as("psnr"), lit(false).as("caption_ok"))
    // extractInformation hook (X3 — reference crawler/Crawler.scala:18):
    // a custom extractor maps the parsed OK batch to output rows; default
    // is the built-in image+caption extraction with PSNR validation
    val (outRows, danglingDf) = config.extractInfo match {
      case Some(hook) => (hook(ok).withColumn("cycle", lit(cycle)), None)
      case None => (matchedImages.unionByName(danglingImages), Some(danglingImages))
    }

    // ---- 8. ENQUEUE (O5): explode → canonical → dedup → anti-join -------
    val rawLinks = ok.select(explode($"links").as("url"),
      ($"depth" + 1).as("depth"))
    // first-seen depth wins; within a commit the deterministic contract is
    // min(depth) then BFS order (SURVEY §3.5)
    val batchLinks = rawLinks.groupBy($"url")
      .agg(min($"depth").as("depth"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // ---- materialize the heavy shared chain in ONE linear job -----------
    // polite → robots-gate → fetch-join → respond → parse → explode →
    // batchLinks is a straight line through every persisted intermediate;
    // forcing it with a single aggregate fills all the caches SEQUENTIALLY.
    // Without this, the parallel branches of the stats union race to
    // compute the same uncached ancestors concurrently (cache misses on
    // both sides) and the parse/fetch work runs 2-3x. The same action also
    // returns the bloom-maybe candidates' host buckets, so the seen-side
    // partition pruning costs no extra job.
    if (sys.env.get("GRAFT_CYCLE_TIMING").contains("1"))
      System.err.println(f"  [phase plan-build] ${(System.nanoTime() - tPlan0) / 1e9}%.2fs")
    ensureBloom(frontier)
    val (linksCount, preFiltered) =
      if (config.useBloom && seenCountEstimate > 0) {
        val mightContain = bloomContainsUdf(mainBloom.get, recentBloom.get)
        // the prune must compute the SAME placement as the COW write —
        // salted placement is still a pure per-url function, so each
        // candidate url still maps to exactly one bucket dir
        val bucketOfUrl =
          bucketCol(call_function("graft_host", $"url"), $"url")
        val aggRow = phaseTimed("links")(batchLinks.agg(
          count(lit(1)),
          collect_set(when(mightContain($"url"), bucketOfUrl))).head())
        val n = aggRow.getLong(0)
        val candBuckets = aggRow.getSeq[Int](1).toSet
        // bloom=no ⇒ definitely unseen (skip the exact join); bloom=maybe ⇒
        // confirm with exact left_anti against the seen ledger
        val definitelyNew = batchLinks.filter(!mightContain($"url"))
        val maybe = batchLinks.filter(mightContain($"url"))
        // partition pruning on the seen side: a url's frontier row can only
        // live in bucket(host(url)), so the exact confirm join reads ONLY
        // the candidate urls' bucket directories of the frontier snapshot —
        // O(candidate buckets) IO per cycle, not O(frontier). Waves past
        // the first in a commit group have no snapshot of their chained
        // frontier to prune (it exists only in memory), so they prune with
        // the equivalent bucket predicate over the cached frontier.
        val seenSide =
          if (candBuckets.isEmpty) frontier.select("url").where(lit(false))
          else if (candBuckets.size * 2 <= config.numBuckets)
            pruneSnap match {
              case Some(p) => snap.readTableBuckets(p, "frontier", candBuckets)
                .map(_.select("url"))
                .getOrElse(frontier.select("url").where(lit(false)))
              case None => frontier
                .filter($"bucket".isin(candBuckets.toSeq: _*)).select("url")
            }
          else frontier.select("url") // most buckets touched: cached full scan wins
        val confirmed = maybe.join(seenSide, Seq("url"), "left_anti")
        (n, definitelyNew.unionByName(confirmed))
      } else (phaseTimed("links")(batchLinks.count()),
        batchLinks.join(frontier.select("url"), Seq("url"), "left_anti"))
    val newRows = preFiltered
      .withColumn("host", call_function("graft_host", $"url"))
      .withColumn("bucket", bucketCol($"host", $"url"))
      .withColumn("prio", lit(cycle))
      .withColumn("status", lit(Status.New))
      .withColumn("started", lit(-1L))
      .withColumn("retries", lit(0))
      .withColumn("reason", lit(null).cast("string"))
      // child requests get fresh default headers, exactly as the reference
      // Manager issues Request(task, Map()) for every pulled task
      // (Manager.scala:100-110) — headers are per-request, not inherited
      .withColumn("headers", typedlit(config.defaultHeaders))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // ---- per-bucket lineage / metrics in ONE action ---------------------
    // The reference's counters (Master.scala:46-47) are driver-side ints;
    // ours are one unioned aggregate collected once per cycle — at scale,
    // every extra .count() is a full job dispatch, so all remaining cycle
    // statistics (per-bucket drain/enqueue lineage, deferral counters,
    // touched-bucket set) ride a single collect over a few hundred rows.
    def tagged(tag: String, df: DataFrame): DataFrame = df.select(
      lit(tag).as("tag"),
      (if (df.columns.contains("bucket")) $"bucket" else lit(-1)).as("bucket"),
      (if (df.columns.contains("v1")) $"v1" else lit(0L)).cast("long").as("v1"),
      (if (df.columns.contains("v2")) $"v2" else lit(0L)).cast("long").as("v2"),
      (if (df.columns.contains("v3")) $"v3" else lit(0L)).cast("long").as("v3"),
      (if (df.columns.contains("v4")) $"v4" else lit(0L)).cast("long").as("v4"),
      (if (df.columns.contains("urls")) $"urls"
       else typedlit(Seq.empty[String])).as("urls"))
    // small waves ride the enqueued urls back on the stats collect (bounded
    // by linksCount — ≤ ~5 MB) so the RECENT-sketch maintenance becomes
    // driver-side puts instead of a separate distributed sketch-build job;
    // big waves keep the distributed build (urls must not flood the driver)
    val collectUrls = config.useBloom && recentMaster.nonEmpty &&
      linksCount <= 50000
    val newAgg =
      if (collectUrls) newRows.groupBy($"bucket")
        .agg(count(lit(1)).as("v1"), collect_list($"url").as("urls"))
      else newRows.groupBy($"bucket").agg(count(lit(1)).as("v1"))
    val stats = tagged("out", outcomes.groupBy($"bucket").agg(
        count(lit(1)).as("v1"),
        sum(when($"outcome" === "OK", 1L).otherwise(0L)).as("v2"),
        sum(when($"outcome" === "ERROR", 1L).otherwise(0L)).as("v3"),
        sum(when($"outcome" === "RETRY", 1L).otherwise(0L)).as("v4")))
      .unionByName(tagged("new", newAgg))
      .unionByName(danglingDf.map(d => tagged("dangling", d.agg(count(lit(1)).as("v1"))))
        .getOrElse(spark.emptyDataFrame.select(lit("dangling").as("tag"),
          lit(-1).as("bucket"), lit(0L).as("v1"), lit(0L).as("v2"),
          lit(0L).as("v3"), lit(0L).as("v4"),
          typedlit(Seq.empty[String]).as("urls")).limit(0)))
      .unionByName(tagged("robdef", robotsUnknown.agg(count(lit(1)).as("v1"))))
      // robnew per BUCKET: the bucket set drives the robots COW commit
      .unionByName(tagged("robnew",
        robotsNew.groupBy($"bucket").agg(count(lit(1)).as("v1"))))
      .unionByName(tagged("drainable", drainable.agg(count(lit(1)).as("v1"))))
    val statsRows = phaseTimed("stats")(stats.collect())

    def one(tag: String): Long = statsRows.collectFirst {
      case r if r.getString(0) == tag => r.getLong(2) }.getOrElse(0L)
    val outStats = statsRows.filter(_.getString(0) == "out")
    val newStats = statsRows.filter(_.getString(0) == "new")
    val robnewStats = statsRows.filter(_.getString(0) == "robnew")
    val drainedCount = outStats.map(_.getLong(2)).sum
    val enqueuedCount = newStats.map(_.getLong(2)).sum
    val dedupCount = linksCount - enqueuedCount
    val deferredRobots = one("robdef")
    val robotsFetched = robnewStats.map(_.getLong(2)).sum
    // polite == allowed(=outcomes minus denied... exactly claimed+denied) +
    // robots-deferred, so its count derives from branches already collected:
    // polite = |outcomes| + |robotsUnknown| — one fewer stats branch per cycle
    val deferredPolite = one("drainable") - (drainedCount + one("robdef"))
    seenCountEstimate += enqueuedCount

    val touched = (outStats.map(_.getInt(1)) ++ newStats.map(_.getInt(1))).toSet

    // URL-seen maintenance: fold this cycle's enqueued urls into RECENT.
    // The merge sketch is sized to the recent window (recentItems), never to
    // the full frontier — per-cycle cost is O(enqueued) puts plus a
    // recent-sized allocation; the multi-GB main sketch is untouched until
    // its amortized doubling rebuild.
    if (config.useBloom && enqueuedCount > 0 && recentMaster.nonEmpty)
      phaseTimed("bloom-merge") {
        if (collectUrls)
          statsRows.withFilter(_.getString(0) == "new")
            .foreach(_.getSeq[String](6).foreach(recentMaster.get.put))
        else recentMaster.get.mergeIn(
          SeenSketch.build(newRows, "url", config.seenSketch, recentItems, 0.01))
        recentCount += enqueuedCount
        rebroadcastRecent()
      }

    // ---- 9. NEXT FRONTIER: status updates restricted to touched buckets -
    // The status-update join runs over ONLY the buckets drained or enqueued
    // this wave (drained rows' buckets are by construction inside
    // `touched`), so per-wave cost scales with the batch, not with a
    // 10^10-row frontier; untouched buckets pass through as an untouched
    // cached subtree and, at commit time, carry forward in the manifest
    // without being read or rewritten.
    val updates = outcomes.select($"url",
      when($"outcome" === "OK", Status.Completed)
        .when($"outcome" === "ERROR", Status.WithError)
        .otherwise(Status.New).as("u_status"),
      when($"outcome" === "RETRY", $"retries" + 1).otherwise($"retries").as("u_retries"),
      $"reason".as("u_reason"),
      lit(cycle).as("u_started"))
    val frontierNext = frontier
      .filter(if (touched.isEmpty) lit(false) else $"bucket".isin(touched.toSeq: _*))
      .join(updates.hint("shuffle_hash"), Seq("url"), "left")
      .select($"url", $"host", $"bucket", $"depth", $"prio",
        coalesce($"u_status", $"status").as("status"),
        coalesce($"u_started", $"started").as("started"),
        coalesce($"u_retries", $"retries").as("retries"),
        coalesce($"u_reason", $"reason").as("reason"),
        $"headers")
      .unionByName(newRows.select($"url", $"host", $"bucket", $"depth",
        $"prio", $"status", $"started", $"retries", $"reason", $"headers"))
    val enqByBucket = newStats.map(r => r.getInt(1) -> r.getLong(2)).toMap
    val lineageRows: Seq[LineageRow] = {
      val outBuckets = outStats.map { r =>
        LineageRow(cycle, r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(3),
          r.getLong(4), r.getLong(5), enqByBucket.getOrElse(r.getInt(1), 0L),
          dedupCount, deferredRobots, deferredPolite, 0L)
      }
      val onlyNew = (enqByBucket.keySet -- outStats.map(_.getInt(1)).toSet).toSeq
        .map(b => LineageRow(cycle, b, 0L, 0L, 0L, 0L, 0L, enqByBucket(b),
          dedupCount, deferredRobots, deferredPolite, 0L))
      outBuckets.toSeq ++ onlyNew
    }
    // O9 from this wave's stats: work remains iff something was enqueued,
    // deferred (robots/politeness) or re-enqueued for retry — saves the
    // final empty confirmation cycle (and its full plan/codegen cost)
    val retriedCount = outStats.map(_.getLong(5)).sum
    val pending = enqueuedCount + deferredRobots + deferredPolite + retriedCount
    expectedBatch = pending
    WaveOut(
      frontierNext = frontierNext,
      robotsOut = if (robotsFetched == 0) robots else robotsOut,
      outRows = if (drainedCount > 0) Some(outRows) else None,
      lineageRows = lineageRows,
      touched = touched,
      robotsChanged = robnewStats.map(_.getInt(1)).toSet,
      drained = drainedCount,
      robotsFetched = robotsFetched,
      enqueued = enqueuedCount,
      deduped = dedupCount,
      deferredRobots = deferredRobots,
      deferredPolite = deferredPolite,
      dangling = one("dangling"),
      pending = pending,
      caches = Seq(polite, withRobots, claimed, responded, ok, outcomes,
        newRows, robotsNew, batchLinks))
  }

  /**
   * Hot-host promotion (north_rule "salted host-hash"): scan suspect
   * buckets — those whose cumulative row estimate crossed
   * config.hotHostThreshold (re-scanned only on estimate doubling) — for
   * hosts above the threshold, add them to the persisted hot set, and
   * return the commit-ready frontier with placement RECOMPUTED under the
   * new set plus the bucket dirs the promotion rewrites (the host's plain
   * bucket, which loses its rows, and its k salted buckets, which gain
   * them). Runs entirely inside the group commit, so placement changes are
   * atomic with the snapshot: a crash either resumes pre-promotion (plain
   * placement + old hot set) or post (salted placement + persisted set) —
   * never a mix. Costs zero extra jobs until a bucket is actually suspect.
   */
  private def promoteHotHosts(frontier: DataFrame)
      : (DataFrame, Set[Int], Option[DataFrame]) = {
    if (config.hotHostSalts <= 1) return (frontier, Set.empty, None)
    val th = config.hotHostThreshold
    val suspects = bucketRowEst.collect {
      case (b, est) if est > th &&
        est >= 2 * lastHotCheck.getOrElse(b, (th + 1) / 2) => b
    }.toSet
    if (suspects.isEmpty) return (frontier, Set.empty, None)
    suspects.foreach(b => lastHotCheck(b) = bucketRowEst(b))
    val found = phaseTimed("hot-detect")(
      frontier.filter($"bucket".isin(suspects.toSeq: _*))
        .groupBy($"host").agg(count(lit(1)).as("c"))
        .filter($"c" > th).select("host").as[String].collect().toSet)
    val newlyHot = found -- hotHosts
    if (newlyHot.isEmpty) return (frontier, Set.empty, None)
    hotHosts ++= newlyHot
    val rebucket = newlyHot.flatMap(h =>
      saltedBucketsOf(h, config.numBuckets, config.hotHostSalts) +
        plainBucketOf(h, config.numBuckets))
    (frontier.withColumn("bucket", bucketCol($"host", $"url")),
      rebucket, Some(hotHosts.toSeq.sorted.toDF("host")))
  }

  def runCycle(cycle: Long): (Snapshot, Long, Long) = {
    val (s, progressed, pending, _) = runGroup(cycle, 1)
    (s, progressed, pending)
  }

  /**
   * Run up to `maxWaves` waves (logical cycles `startCycle`,
   * `startCycle+1`, …) chained through their in-memory frontiers, then
   * commit ONE snapshot covering all of them. With wavesPerCommit = 1 this
   * is exactly the r2 cycle loop; with K > 1 the commit (frontier COW
   * write + manifest) and the frontier parquet re-read amortize over K
   * waves — the dominant fixed costs at politeness-bounded wave sizes —
   * while crawl semantics stay identical because each wave drains the
   * previous wave's full in-memory frontier. Resume granularity becomes
   * the group (a crash replays at most K waves — deterministic, so the
   * final state is unchanged).
   *
   * Returns (snapshot, last wave's progress, last wave's pending, waves run).
   */
  def runGroup(startCycle: Long, maxWaves: Int): (Snapshot, Long, Long, Int) = {
    val prev = snap.latest.getOrElse(sys.error("engine not initialized"))
    requireBucketCompat(prev)
    var frontier = loadFrontier(prev).persist(StorageLevel.MEMORY_AND_DISK)
    var robots = loadRobots(prev)
    // full next frontier: untouched buckets pass through, touched buckets
    // replaced — what the next wave drains and what the commit COW-writes
    // (the cow write filters to the group's touched buckets itself)
    def fullNext(w: WaveOut): DataFrame = {
      val untouched =
        if (w.touched.isEmpty) frontier
        else frontier.filter(!$"bucket".isin(w.touched.toSeq: _*))
      untouched.unionByName(w.frontierNext)
    }
    // inputs of the PREVIOUS wave: releasable once the current wave's jobs
    // have fully materialized the current inputs (the drain scans every
    // partition, so after a wave runs, its input state is complete and the
    // parents are no longer needed)
    var releasable: Seq[DataFrame] = Nil
    var outs = List.empty[WaveOut]
    var waves = 0
    var stop = false
    while (waves < maxWaves && !stop) {
      val w = runWave(if (waves == 0) Some(prev) else None,
        frontier, robots, startCycle + waves)
      outs = outs :+ w
      waves += 1
      if (w.drained + w.robotsFetched == 0 || w.pending == 0 ||
        waves >= maxWaves) stop = true
      else {
        // chain into the next wave through a LOCAL CHECKPOINT, not a bare
        // plan: the full-next plan references the previous frontier three
        // times (untouched filter, update join, dedup), so K chained waves
        // would grow the logical tree ~3^K — checkpointing truncates each
        // wave's state to a leaf (one in-memory materialization, which the
        // next wave's drain would have paid anyway). Blocks are reclaimed
        // by the context cleaner once the group drops its references.
        releasable.foreach(_.unpersist())
        releasable = Seq(frontier) ++ (if (w.robotsOut ne robots) Seq(robots) else Nil)
        frontier = fullNext(w).localCheckpoint(false)
        robots =
          if (w.robotsOut ne robots) w.robotsOut.localCheckpoint(false)
          else robots
      }
    }
    val last = outs.last
    val endCycle = startCycle + waves - 1
    val robotsCommit = last.robotsOut

    // per-bucket cumulative row estimates feed hot-host detection (the
    // lineage rows already carry per-bucket enqueue counts — no extra job)
    outs.foreach(_.lineageRows.foreach(lr =>
      bucketRowEst(lr.bucket) = bucketRowEst.getOrElse(lr.bucket, 0L) + lr.enqueued))
    val (frontierCommit, promoted, hotTable) = promoteHotHosts(fullNext(last))

    val touchedAll = outs.iterator.flatMap(_.touched).toSet ++ promoted
    // robots is COW-committed by hostBucket exactly like the frontier: a
    // robots-fetching group rewrites only the buckets that gained hosts,
    // not the whole table (the r2 full-table rewrite was O(hosts) per
    // frontier-expansion cycle). A pre-upgrade workdir holding robots as an
    // unbucketed blob (key -1) is rebucketed in one full write: listing
    // every bucket plus -1 as changed replaces the blob dir (no dir is
    // written for -1, so the key just drops) with per-bucket dirs.
    val robotsChangedAll: Set[Int] = {
      val fresh = outs.iterator.flatMap(_.robotsChanged).toSet
      if (fresh.isEmpty) Set.empty
      else if (prev.tables.get("robots").exists(_.contains(-1)))
        (0 until config.numBuckets).toSet + (-1)
      else fresh
    }
    // waves with drained == 0 have structurally empty output; skipping them
    // avoids a full images-table scan against an empty batch
    val outAppend = outs.flatMap(_.outRows).reduceOption(_ unionByName _)
    val lineage = spark.createDataset(outs.flatMap(_.lineageRows)).toDF()

    val s = phaseTimed("commit")(snap.commit(endCycle,
      fullTables = hotTable.map(t => Map("hothosts" -> t)).getOrElse(Map.empty),
      cowTables = Map("frontier" -> ((frontierCommit, "bucket", touchedAll))) ++
        (if (robotsChangedAll.nonEmpty)
          Map("robots" -> ((robotsCommit, "bucket", robotsChangedAll)))
        else Map.empty),
      appends = outAppend.map(o => Map("output" -> o))
        .getOrElse(Map.empty[String, DataFrame]) + ("lineage" -> lineage),
      metrics = Map(
        "cycle" -> endCycle.toDouble,
        "waves" -> waves.toDouble,
        "num_buckets" -> config.numBuckets.toDouble,
        "hot_hosts" -> hotHosts.size.toDouble,
        "hot_host_salts" -> config.hotHostSalts.toDouble,
        "drained" -> outs.map(_.drained).sum.toDouble,
        "enqueued" -> outs.map(_.enqueued).sum.toDouble,
        "deduped" -> outs.map(_.deduped).sum.toDouble,
        "robots_fetched" -> outs.map(_.robotsFetched).sum.toDouble,
        "deferred_robots" -> last.deferredRobots.toDouble,
        "dangling_images" -> outs.map(_.dangling).sum.toDouble)))
    hotLoadedVersion = s.version // hotHosts is current for this snapshot

    phaseTimed("unpersist") {
      releasable.foreach(_.unpersist())
      outs.foreach(_.caches.foreach(_.unpersist()))
      frontier.unpersist()
      robots.unpersist()
      ()
    }
    (s, last.drained + last.robotsFetched, last.pending, waves)
  }

  /** Drive cycles until Finished (O9/O10); returns final snapshot. */
  def run(seeds: Seq[String], maxCycles: Int = 1000): Snapshot = {
    init(seeds)
    drive(maxCycles)
  }

  /** Drive micro-cycles over an already-seeded frontier until Finished,
    * committing every `config.wavesPerCommit` cycles (O10 batch loop). */
  def drive(maxCycles: Int = 1000): Snapshot = {
    var cycle = 1L
    var done = false
    var last = snap.latest.get
    val timing = sys.env.get("GRAFT_CYCLE_TIMING").contains("1")
    while (!done && cycle <= maxCycles) {
      val t0 = System.nanoTime()
      val j0 = jobsSoFar()
      val maxWaves = math.max(1, math.min(config.wavesPerCommit.toLong,
        maxCycles - cycle + 1).toInt)
      val (s, progressed, pending, waves) = runGroup(cycle, maxWaves)
      if (timing) {
        val jobs = jobsSoFar() - j0
        System.err.println(f"[cycles $cycle..${cycle + waves - 1}] ${(System.nanoTime() - t0) / 1e9}%.2fs progressed=$progressed pending=$pending jobs=$jobs (${jobs.toDouble / waves}%.1f/cycle)")
      }
      last = s
      if (progressed == 0 || pending == 0) done = true
      cycle += waves
    }
    last
  }

  /** Reopen state for a resumed crawl: corpus + bloom sizing estimate. */
  def prepareResume(): Unit = {
    prepareCorpus()
    require(snap.latest.nonEmpty, "nothing to resume")
    requireBucketCompat(snap.latest.get)
    // rebuild the seen estimate (bloom sizing), the next-batch estimate
    // (join-strategy choice), and the per-bucket row estimates (hot-host
    // detection cadence) in one pass over the frontier
    val perBucket = loadFrontier(snap.latest.get)
      .groupBy($"bucket")
      .agg(count(lit(1)), count(when($"status" === Status.New, 1))).collect()
    perBucket.foreach { r =>
      bucketRowEst(r.getInt(0)) = r.getLong(1)
      // suppress an immediate re-scan of buckets whose hosts are already
      // classified (promoted or checked below threshold) at this size
      lastHotCheck(r.getInt(0)) = r.getLong(1)
    }
    seenCountEstimate = math.max(perBucket.map(_.getLong(1)).sum, 1L)
    expectedBatch = perBucket.map(_.getLong(2)).sum
  }

  /** Resume from the latest committed snapshot (exactness: SURVEY §7.2). */
  def resume(maxCycles: Int = 1000): Snapshot = {
    prepareResume()
    val start = snap.latest.getOrElse(sys.error("nothing to resume")).cycle + 1
    var cycle = start
    var done = false
    var last = snap.latest.get
    while (!done && cycle <= start + maxCycles) {
      // group-committing resume: same loop shape as drive()
      val maxWaves = math.max(1, math.min(config.wavesPerCommit.toLong,
        start + maxCycles - cycle + 1).toInt)
      val (s, progressed, pending, waves) = runGroup(cycle, maxWaves)
      last = s
      if (progressed == 0 || pending == 0) done = true
      cycle += waves
    }
    last
  }

  // ---- result views ------------------------------------------------------
  def frontierNow: DataFrame = loadFrontier(snap.latest.get)
  def outputNow: DataFrame =
    snap.readAppended(snap.latest.get, "output")
      .getOrElse(spark.emptyDataset[OutputRow].toDF())
  def lineageNow: DataFrame =
    snap.readAppended(snap.latest.get, "lineage")
      .getOrElse(spark.emptyDataset[LineageRow].toDF())
  /** visited = successfully completed page fetches (NodeTest.scala:77,89). */
  def visited: DataFrame = frontierNow.filter($"status" === Status.Completed)
}

object CrawlEngine {
  /** Everything one wave hands the group commit (see runGroup). */
  private final case class WaveOut(
      frontierNext: DataFrame, // replacement rows for the touched buckets
      robotsOut: DataFrame, // full next robots (same reference when nothing was fetched)
      outRows: Option[DataFrame], // this wave's output append (None when drained == 0)
      lineageRows: Seq[LineageRow],
      touched: Set[Int],
      robotsChanged: Set[Int], // robnew buckets (legacy-blob upgrade applied at commit)
      drained: Long,
      robotsFetched: Long,
      enqueued: Long,
      deduped: Long,
      deferredRobots: Long,
      deferredPolite: Long,
      dangling: Long,
      pending: Long,
      caches: Seq[DataFrame]) // persisted intermediates released after the group commit
}

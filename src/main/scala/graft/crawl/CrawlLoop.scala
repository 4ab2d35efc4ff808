package graft.crawl

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.seen.SeenSet

/** Crawl configuration. `totalUrls` arrive in `epochs` equal slices —
  * the epoch loop is the Spark restatement of the reference's bulk
  * date-range crawl (service/BulkCrawlerService.java:320-433; SURVEY.md
  * §3.3). */
case class CrawlConfig(
    workDir: String,
    totalUrls: Long,
    epochs: Int,
    numHosts: Int,
    buckets: Int,
    budgetPerHost: Int,
    seed: Long = 42L,
    bloomFpp: Double = 0.01,
    useBloom: Boolean = true,
    forceUpdate: Boolean = false,
    /** ST5 watchdog: an epoch running longer than this is cancelled and
      * marked FAILED (reference: 6 h stuck-operation timeout,
      * service/BulkCrawlerService.java:302-318). Default: disabled. */
    stuckTimeoutMs: Long = Long.MaxValue,
    /** Auto-consolidate the seen store every N epochs (crash-safe
      * membership-identical merge of the per-epoch dirs — keeps readSeen
      * O(1) dirs on long crawls). 0 disables. */
    consolidateEvery: Int = 64,
    /** Maintain the incremental latest-row-wins view ([[LatestView]]) as
      * part of each epoch, so upsert readers scan instead of windowing the
      * whole store (reference in-place-update semantics,
      * service/CrawlerOrchestrationService.java:120-137). Per-epoch cost is
      * one O(epoch) pointer-delta append; the fold into the resolved dir
      * runs every [[latestCompactEvery]] epochs. */
    maintainLatest: Boolean = true,
    /** Cadence of the latest-view delta→resolved compaction (bounds the
      * read-time tail at K epochs of pointers). 0 = never (readers resolve
      * from deltas alone). */
    latestCompactEvery: Int = 8,
    /** Steady-state guard for the broadcast confirm: when the PREVIOUS
      * epoch skipped more than this fraction of its candidates as already
      * seen, the maybe-seen sliver is no longer "small" (it approaches the
      * full candidate set on recrawl-heavy frontiers) and broadcasting it
      * would hit the driver/broadcast ceiling — fall back to the fully
      * distributed cogrouped confirm for the next epoch. Uses the prior
      * epoch's state counts: zero extra jobs. */
    maxSeenFracForBroadcast: Double = 0.5) {
  def urlsPerEpoch: Long = totalUrls / epochs
}

/** Thrown when the ST5 watchdog reaps a stuck epoch. */
final class StuckEpochException(val epoch: Int, timeoutMs: Long)
  extends RuntimeException(s"epoch $epoch exceeded ${timeoutMs}ms; cancelled and marked FAILED")

/** The epoch fixpoint loop: synth-slice → key → intra-epoch dedup →
  * seen filter (broadcast bloom probe + exact confirm) → fused host stage
  * (robots admission + politeness rank + budget in one pass) → simulated
  * fetch/validate → partitioned sink + seen delta + carry (deferred+retry)
  * + metrics + lineage, committed per epoch with an atomic marker for
  * resume (ST4).
  *
  * Shuffle budget per epoch (the thing that must survive 1000 executors ×
  * 10^10 rows): (1) url_hash window for intra-epoch dedup, whose hash
  * partitioning the exact-confirm anti-join reuses — and the anti-join
  * only sees the bloom-positive sliver because the bloom probe is a
  * broadcast predicate, not a shuffle; (2) one repartition(host)+sort for
  * the fused robots+politeness stage, fed by a map-side per-host top-k
  * prefilter so a Zipf mega-host ships ≤ budget×partitions rows into the
  * shuffle (and the streamed run-length pass bounds task memory);
  * (3) the partitioned write. Everything else is narrow. PlanSpec pins
  * this shape.
  *
  * Fixed per-epoch driver cost is engineered down three ways (round-5;
  * the measured baseline was ~12.5 s/epoch of pure driver time,
  * BASELINE.md round-4 addendum):
  *  - epoch-varying values enter plans as [[graft.expressions.ParamLit]]
  *    bound parameters, so every epoch re-uses the compiled whole-stage
  *    code (epoch literals previously busted the codegen cache);
  *  - every count the metrics need rides as an OBSERVED aggregate
  *    (`Dataset.observe`) on a job the epoch already runs — no dedicated
  *    state-count or metrics-scan jobs, and no extra full pass over the
  *    cached frontier;
  *  - deferred+retry land in ONE partitioned carry table, and the bloom
  *    segment store is maintained by a distributed cogroup merge
  *    ([[graft.seen.SeenSet.mergeDeltaIntoSegments]]) instead of a
  *    driver round-trip — at 10^10 seen keys the segment set (~12 GB)
  *    never touches the driver; it is collected ONLY under the
  *    broadcast-tier gate.
  */
object CrawlLoop {

  /** Run all (remaining) epochs; `stopAfter` caps how many epochs run
    * this invocation (kill/resume testing). Resume = next epoch after the
    * last commit marker. */
  def run(spark: SparkSession, cfg: CrawlConfig,
      stopAfter: Int = Int.MaxValue,
      store: PayloadStore = PayloadSink): Seq[EpochMetrics] = {
    // finish any half-done seen-store consolidation / latest-view swap
    // before reading either
    graft.seen.SeenDeletes.recoverConsolidation(spark, cfg.workDir)
    LatestView.recover(spark, cfg.workDir)
    val resumeFrom = lastCommittedEpoch(spark, cfg.workDir) + 1
    val until = math.min(cfg.epochs.toLong, resumeFrom.toLong + stopAfter.toLong).toInt
    // the robots rules are epoch-invariant: broadcast ONCE per run and
    // share the handle across epochs (previously one broadcast per epoch)
    val rules = Robots.syntheticRules(cfg.numHosts, cfg.seed)
    val bcRules = spark.sparkContext.broadcast(rules)
    var prior: Option[EpochMetrics] = None
    val out = scala.collection.mutable.ArrayBuffer.empty[EpochMetrics]
    var e = resumeFrom
    var halted = false
    try while (e < until && !halted) {
      // cooperative pause/cancel, polled between epochs — the reference
      // polls its flags between dates (BulkCrawlerService.java:435-464);
      // both leave every committed epoch in place, so a later run resumes
      // from the checkpoint and reproduces the uninterrupted crawl.
      CrawlControl.poll(spark, cfg.workDir) match {
        case CrawlControl.Cancelled =>
          CrawlControl.writeCancelledMarker(spark, cfg.workDir, e)
          halted = true
        case CrawlControl.Paused =>
          halted = true // no marker: pause is silent, resume just continues
        case CrawlControl.Running =>
          // steady-state dup fraction from the previous epoch's state
          // counts — drives the broadcast-vs-distributed confirm choice
          // with no extra job
          val priorSeenFrac = prior
            .filter(_.n_candidates > 0)
            .map(p => p.n_seen_skipped.toDouble / p.n_candidates)
            .getOrElse(0.0)
          // carried-row estimate for the frontier-cache tier: the cached
          // frame is newKeyed ∪ deferred ∪ retry, which under tight host
          // budgets exceeds urlsPerEpoch by the carried share
          val priorCarried = prior.map(p => p.n_deferred + p.n_failed)
            .getOrElse(0L)
          val m = runEpochWatched(spark, cfg, e, store, priorSeenFrac,
            priorCarried, Some(bcRules))
          prior = Some(m)
          out += m
          // automatic small-files maintenance: without it a 10^4-epoch
          // crawl accumulates one seen dir per epoch and readSeen's
          // listing + tiny-file reads grow with crawl age. Runs AFTER the
          // epoch's commit (membership-identical merge, crash-recoverable
          // marker protocol — a kill mid-consolidation is finished by the
          // recovery call above).
          if (cfg.consolidateEvery > 0 && (e + 1) % cfg.consolidateEvery == 0)
            graft.seen.SeenDeletes.consolidate(spark, cfg.workDir, e + 1)
          // latest-view compaction on its own cadence (after the commit:
          // replay-safe — the merge is idempotent by key)
          if (cfg.maintainLatest && cfg.latestCompactEvery > 0 &&
              (e + 1) % cfg.latestCompactEvery == 0)
            LatestView.compact(spark, cfg.workDir)
          e += 1
      }
    } finally {
      // unpersist, not destroy: cached lineage may still lazily
      // re-broadcast (same rationale as the bloom broadcast)
      bcRules.unpersist()
    }
    out.toSeq
  }

  /** ST5 stuck-operation watchdog (driver-side): run the epoch under a
    * cancellable job group; past `stuckTimeoutMs`, cancel its Spark jobs,
    * write a FAILED marker (no commit marker — resume replays the epoch
    * idempotently) and raise. */
  def runEpochWatched(spark: SparkSession, cfg: CrawlConfig, epoch: Int,
      store: PayloadStore = PayloadSink, priorSeenFrac: Double = 0.0,
      priorCarried: Long = 0L,
      sharedRules: Option[org.apache.spark.broadcast.Broadcast[Map[String, RobotsRule]]] = None)
      : EpochMetrics = {
    if (cfg.stuckTimeoutMs == Long.MaxValue)
      return runEpoch(spark, cfg, epoch, store, priorSeenFrac, priorCarried,
        sharedRules)
    val group = s"graft-epoch-$epoch"
    import scala.concurrent.{Await, Future, TimeoutException}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val fut = Future {
      spark.sparkContext.setJobGroup(group, s"epoch $epoch", interruptOnCancel = true)
      try runEpoch(spark, cfg, epoch, store, priorSeenFrac, priorCarried,
        sharedRules)
      finally spark.sparkContext.clearJobGroup()
    }
    try Await.result(fut, cfg.stuckTimeoutMs.millis)
    catch {
      case _: TimeoutException =>
        spark.sparkContext.cancelJobGroup(group)
        val fs = new Path(cfg.workDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.mkdirs(new Path(s"${cfg.workDir}/_commits"))
        val out = fs.create(new Path(s"${cfg.workDir}/_commits/epoch_$epoch.FAILED.json"), true)
        out.write(s"""{"epoch":$epoch,"status":"FAILED","reason":"stuck_timeout"}"""
          .getBytes("UTF-8"))
        out.close()
        throw new StuckEpochException(epoch, cfg.stuckTimeoutMs)
    }
  }

  /** Highest epoch with a commit marker, or -1. */
  def lastCommittedEpoch(spark: SparkSession, workDir: String): Int = {
    val fs = new Path(workDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = new Path(s"$workDir/_commits")
    if (!fs.exists(dir)) return -1
    val re = "epoch_(\\d+)\\.json".r
    fs.listStatus(dir).flatMap { st =>
      st.getPath.getName match { case re(n) => Some(n.toInt); case _ => None }
    }.foldLeft(-1)(math.max)
  }

  def runEpoch(spark: SparkSession, cfg: CrawlConfig, epoch: Int,
      store: PayloadStore = PayloadSink, priorSeenFrac: Double = 0.0,
      priorCarried: Long = 0L,
      sharedRules: Option[org.apache.spark.broadcast.Broadcast[Map[String, RobotsRule]]] = None)
      : EpochMetrics = {
    import spark.implicits._
    import org.apache.spark.sql.Observation
    val tEpoch0 = System.nanoTime()

    // 1. this epoch's frontier slice + carried-over work
    val slice = FrontierSynth.frontier(spark, cfg.urlsPerEpoch, cfg.numHosts,
      cfg.seed, epoch, epochOffset = epoch * cfg.urlsPerEpoch)
    val newKeyed = FrontierSynth.key(slice, cfg.buckets)
    // NB: unionByName — joins upstream reorder columns (join key first),
    // and Dataset.union is positional
    val carried = readCarried(spark, s"${cfg.workDir}/carry/epoch=${epoch - 1}")
    // candidates: NOT persisted — its only consumer is the dedup window,
    // and a full-frontier cache write per epoch is pure memory-bandwidth
    // cost (measured: cache materialization, not compute, dominated the
    // epoch's critical path)
    val candidates = newKeyed.unionByName(carried)

    // 2. intra-epoch first-occurrence dedup (url_hash window), in FLAG
    // form: every candidate row stays in the frame (DUP/LIVE), so both
    // the candidate total and the duplicate count fold into the single
    // state aggregation below instead of their own .count() jobs.
    // (A min_by hash-agg variant was measured SLOWER — full-row struct
    // aggregation drops out of codegen into ObjectHashAggregate; the
    // window's sort is cheaper than the struct churn.)
    // Duplicates share the canonical URL, so dedup-before-robots is
    // interchangeable with robots-before-dedup for membership/traces;
    // doing it first lets the anti-join reuse the url_hash partitioning.
    // PERSISTED — for speed AND as the partitioning pin: schedule()'s
    // phase-0 prefilter classifies rows per PARTITION and is evaluated by
    // two separate consumer subtrees, so its input partitioning must be
    // IDENTICAL across executions (measured drift otherwise: seen-set +34
    // trace diffs). Rows reaching the prefilter either flow narrowly from
    // this cache (partitioning pinned here) or through the confirm join,
    // whose output is content-deterministically repartitioned inside
    // unseenTwoTierBroadcast. (A no-cache variant re-ran the dedup window
    // per consumer: 86-111 s vs 64 s at 32 cores — rejected.)
    // ADAPTIVE storage level: deserialized rows are the fast path (SER
    // re-pays serde on every consumer — measured ~20% wall at 16M URLs),
    // but a frontier slice that rivals the heap must step DOWN — first to
    // compact serialized blocks, then out of the heap entirely: on-heap
    // blocks (even serialized) plus the window sorts tripped ParallelGC's
    // GC-overhead limit at 64M URLs / 8 GiB, measured. Footprint is
    // estimated from the config (~224 B/row deserialized incl. URL string
    // + object headers, ~96 B/row serialized); thresholds leave the
    // unified pool to execution. Degrade, never die: DISK_ONLY completes
    // at any input size (local-disk blocks, zero storage-pool pressure).
    // SPARK_GRAFT_FRONTIER_CACHE=mem|ser|disk overrides for A/B runs.
    val frontierCacheLevel = sys.env.get("SPARK_GRAFT_FRONTIER_CACHE") match {
      case Some("mem")  => StorageLevel.MEMORY_AND_DISK
      case Some("ser")  => StorageLevel.MEMORY_AND_DISK_SER
      case Some("disk") => StorageLevel.DISK_ONLY
      case _ =>
        // footprint = new slice + CARRIED rows (deferred+retry from the
        // prior epoch's counts — under tight/zero host budgets the carry
        // dominates urlsPerEpoch, and sizing on the slice alone kept
        // MEMORY_AND_DISK in exactly the GC-overhead regime this tier
        // switch exists to prevent); memory = where the blocks LIVE —
        // this JVM's heap when the driver IS the executor (master "local"
        // or "local[N]"; NOT local-cluster, which forks real executor
        // JVMs), else the AGGREGATE executor budget: per-executor heap ×
        // executor count (instances conf when set, else derived from
        // defaultParallelism / executor cores) — the cached rows spread
        // across the fleet, so comparing global rows to ONE executor's
        // heap was over-conservative tiering.
        val estRows = cfg.urlsPerEpoch + priorCarried
        val conf = spark.sparkContext.getConf
        val master = conf.get("spark.master", "local")
        val heap =
          if (master == "local" || master.startsWith("local["))
            Runtime.getRuntime.maxMemory()
          else {
            val perExec = conf.getSizeAsBytes("spark.executor.memory", "1g")
            // executor count: explicit conf > the local-cluster master
            // string (which conveys N and cores OUTSIDE the conf — the
            // spark.executor.cores default of 1 would overcount executors
            // by cores-per-executor there) > defaultParallelism / cores
            val LocalCluster = """local-cluster\[\s*(\d+)\s*,\s*(\d+)\s*,[^\]]*\]""".r
            val execs =
              if (conf.contains("spark.executor.instances"))
                math.max(1, conf.get("spark.executor.instances").toInt)
              else master match {
                case LocalCluster(n, _) => math.max(1, n.toInt)
                case _ =>
                  val cores = math.max(1,
                    conf.get("spark.executor.cores", "1").toInt)
                  math.max(1, spark.sparkContext.defaultParallelism / cores)
              }
            perExec * execs
          }
        if (estRows * 224L <= (heap * 0.35).toLong)
          StorageLevel.MEMORY_AND_DISK
        else if (estRows * 96L <= (heap * 0.25).toLong)
          StorageLevel.MEMORY_AND_DISK_SER
        else StorageLevel.DISK_ONLY
    }
    // dup/total counts ride as OBSERVED aggregates on the cache
    // materialization (no dedicated count job, no extra pass over the
    // cached frontier — the old union+groupBy state-count job re-scanned
    // BOTH frontier caches every epoch on a memory-bandwidth-bound box)
    val obsDedup = Observation(s"graft_dedup_$epoch")
    val dedupTagged = Politeness.dedupFlagged(candidates)
      .observe(obsDedup,
        count(when(col("is_dup__"), 1)).as("dup"),
        count(lit(1)).as("total"))
      .persist(frontierCacheLevel)
    val deduped = dedupTagged.filter(!col("is_dup__")).drop("is_dup__")
      .as[KeyedUrl]

    // 3. URL-seen anti-join (success-only store; forceUpdate bypasses).
    // Two-tier: broadcast bloom probe (no shuffle) + exact confirm of the
    // positives; segments stay distributed (cogroup path) only when too
    // big to broadcast. No count job here: the seen-skip count is the
    // residual of the state aggregation (every candidate is exactly one
    // of dup/seen-skipped/denied/admitted/deferred).
    val seen = readSeen(spark, cfg.workDir, epoch)
    // fixed plan-size bloom shape: every epoch's segments share it, so the
    // persisted segment store can be OR-merged incrementally across epochs
    // (epoch-scaled sizing would change the shape every epoch and force a
    // full-store rebuild each time)
    val expectedPerBucket = math.max(64L, cfg.totalUrls / cfg.buckets)
    // probe segments: load last epoch's persisted set as a DATASET (a
    // lazy O(1) tiny read — nothing segment-sized touches the driver
    // here) and only fall back to a full seen-store rebuild when it is
    // absent (first bloom epoch after resume-from-older-layout, a
    // preceding forceUpdate epoch, or a crash replay that already dropped
    // it). The ONLY place segments are ever collected is inside the
    // broadcast-tier probe, which is exactly the tier gated to stay under
    // the driver/broadcast ceiling; the cogrouped tier and the segment
    // WRITE below are distributed end-to-end (at 10^10 seen keys the
    // segment set is ~12 GB — a per-epoch driver round-trip of it would
    // be the scale killer).
    // lazy val + persist on the FALLBACK branch: the segment dataset has
    // two consumers (the probe and the bloom write below), and a `def`
    // would re-run the full-store rebuild once per consumer — the exact
    // grows-with-crawl-age cost the persisted path exists to avoid. The
    // common branch stays an unpersisted lazy O(1) parquet read.
    var segsFallback: Option[Dataset[(Int, Array[Byte])]] = None
    lazy val segmentsDs: Dataset[(Int, Array[Byte])] =
      loadSegmentsDs(spark, cfg, epoch - 1, expectedPerBucket)
        .getOrElse {
          val rebuilt = SeenSet.bloomSegments(seen, cfg.buckets,
            expectedPerBucket, cfg.bloomFpp)
            .persist(StorageLevel.MEMORY_AND_DISK)
          segsFallback = Some(rebuilt)
          rebuilt
        }
    val (unseen, seenCleanup): (Dataset[KeyedUrl], () => Unit) =
      if (cfg.forceUpdate || seen == null) (deduped, () => ())
      else if (cfg.useBloom) {
        // broadcast confirm only while the maybe-seen sliver is provably
        // small: its size tracks the TRUE-duplicate fraction of candidates
        // (not the bloom fpp), so at steady-state recrawl ratios it
        // approaches the full candidate set and would blow the broadcast /
        // driver ceiling. The prior epoch's seen-skip fraction is the
        // zero-cost estimator; past the threshold, the cogrouped two-tier
        // keeps everything distributed (same rows, graceful degradation).
        if (priorSeenFrac <= cfg.maxSeenFracForBroadcast)
          SeenSet.unseenTwoTierBroadcast(deduped, seen, segmentsDs)
        else
          SeenSet.unseenTwoTier(deduped, seen, segmentsDs)
      } else (SeenSet.unseenExact(deduped, seen), () => ())

    // 4. fused host stage: robots admission + politeness rank + budget —
    // map-side deny/top-k prefilter, then one repartition(host)+sort pass.
    // Scheduling-state counts are OBSERVED on the cache materialization:
    // every live row is exactly one of denied/admitted/deferred, and the
    // seen-skip count is the residual — zero dedicated count jobs.
    val rulesMap = sharedRules.map(_.value)
      .getOrElse(Robots.syntheticRules(cfg.numHosts, cfg.seed))
    val (scheduledDs, bcRules) = Politeness.scheduleTracked(unseen, rulesMap,
      cfg.budgetPerHost, sharedRules = sharedRules)
    val obsSched = Observation(s"graft_sched_$epoch")
    val scheduled = scheduledDs
      .observe(obsSched,
        count(when(col("_2") === Politeness.Sched.Denied, 1)).as("denied"),
        count(when(col("_2") === Politeness.Sched.Admitted, 1)).as("admitted"),
        count(when(col("_2") === Politeness.Sched.Deferred, 1)).as("deferred"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // r06: columnar filter+projection instead of typed filter+map — the
    // typed path deserialized the FULL KeyedUrl (incl. per-row
    // java.sql.Timestamp construction, a top frame in 32-core stack
    // samples) for every scheduled row in BOTH branches, then
    // re-serialized; the select copies internal rows with zero object
    // churn. Same rows, same fields (as[...] resolves by name).
    val admitted = scheduled.filter(col("_2") === Politeness.Sched.Admitted)
      .select(col("_1.*"), col("_3").as("slot"))
      .as[AdmittedUrl]
    val deferred = scheduled.filter(col("_2") === Politeness.Sched.Deferred)
      .select(col("_1.*")).as[KeyedUrl]

    // 5. simulated fetch + decode + invariant validation — NOT cached:
    // results carry the full payload bytes, and pushing them through the
    // block-manager cache is pure memory-bandwidth cost on the bandwidth-
    // bound box. The payload is written ONCE; every metadata aggregation
    // below reads slim columns back from the written columnar table
    // (column-pruned parquet read ≪ caching binaries).
    val results = Fetch.fetch(admitted, epoch)

    // 7. sinks (idempotent per epoch), all behind the PayloadStore trait.
    // This write is the job that materializes BOTH frontier caches, so
    // the dedup/schedule observations complete with it.
    spark.sparkContext.setJobDescription(s"epoch=$epoch payload-write")
    store.writePayload(results, cfg.workDir, epoch)
    // scheduled is materialized: release everything upstream of it
    seenCleanup()
    dedupTagged.unpersist()
    // read back ONLY this epoch's partition directories (listing the whole
    // payload tree would grow linearly with crawl age; at 10^4+ epochs the
    // file listing, not the data, becomes the cost)
    val touchedBuckets = {
      val fs = new Path(cfg.workDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
      (0 until cfg.buckets).filter(b =>
        fs.exists(new Path(s"${cfg.workDir}/payload/host_bucket=$b/crawl_epoch=$epoch")))
    }
    val writtenFull = {
      val leaves = touchedBuckets
        .map(b => s"${cfg.workDir}/payload/host_bucket=$b/crawl_epoch=$epoch")
      if (leaves.isEmpty)
        spark.read.parquet(s"${cfg.workDir}/payload")
          .filter(col("crawl_epoch") === epoch) // degenerate epoch: fall back
      else spark.read.option("basePath", s"${cfg.workDir}/payload")
        .parquet(leaves: _*)
    }
    // ONE slim read shared by every post-write consumer (lineage, latest
    // delta, seen delta, retry keys, result metrics). Re-reading the
    // epoch's parquet per consumer was 5x the per-file reader setup —
    // and parquet reader construction clones the shared hadoop
    // Configuration under ITS lock (new JobConf per file), the top
    // BLOCKED monitor in 32-core stack samples once the chmod forks were
    // gone. The slim projection (6 narrow columns, no payload bytes) is
    // cheap to cache; the binaries still never enter the block manager.
    // status counts + byte sum ride as observed aggregates on the cache
    // materialization (the lineage write below is the first action)
    val obsWritten = Observation(s"graft_written_$epoch")
    val written = writtenFull
      .select(col("url_hash"), col("status"), col("n_bytes"), col("host"),
        col("host_bucket"), col("crawl_epoch"))
      .observe(obsWritten,
        count(when(col("status") === Status.Processed, 1)).as("p"),
        count(when(col("status") === Status.Failed, 1)).as("f"),
        count(when(col("status") === Status.Rejected, 1)).as("r"),
        coalesce(sum(col("n_bytes")), lit(0L)).as("b"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // n_hosts = Σ per-bucket exact distinct-host counts (hosts never span
    // buckets), observed on the lineage output — the countDistinct job
    // this replaces was the epoch's only remaining dedicated metrics scan
    spark.sparkContext.setJobDescription(s"epoch=$epoch lineage-write")
    val obsLineage = Observation(s"graft_lineage_$epoch")
    store.writeLineage(
      PayloadSink.lineage(written, epoch)
        .observe(obsLineage, coalesce(sum(col("n_hosts")), lit(0L)).as("hosts")),
      cfg.workDir, epoch)

    // J3 upsert-reader maintenance: append this epoch's pointer delta
    // (O(epoch) — one slim columnar write); the fold into the resolved
    // latest/ dir happens on the latestCompactEvery cadence below, so
    // "current rows" consumers never pay a full-store window per read
    if (cfg.maintainLatest) {
      spark.sparkContext.setJobDescription(s"epoch=$epoch latest-delta")
      LatestView.appendDelta(spark, cfg.workDir, epoch, written)
    }

    // seen delta = terminal-success rows only (reference guard:
    // status==DOWNLOADED ⇒ skip; CrawlerOrchestrationService.java:114-115)
    spark.sparkContext.setJobDescription(s"epoch=$epoch seen-write")
    store.writeSeenDelta(
      written.filter(col("status") === Status.Processed)
        .select(col("url_hash"), col("host_bucket").cast("int").as("host_bucket")),
      cfg.workDir, epoch)
    // incremental bloom maintenance: segments(epoch) = segments(epoch-1)
    // (≡ blooms of seen < epoch) ∪ bloom(this epoch's delta) — an O(delta)
    // scan, never a store rescan, and fully DISTRIBUTED: the delta keys
    // cogroup into the persisted segment dataset on their bucket
    // (SeenSet.mergeDeltaIntoSegments), so nothing segment- or key-sized
    // ever rides through the driver. Deleted (tombstoned) keys stay set in
    // the persisted blooms: that is only a false positive, and positives
    // are exactly confirmed against the tombstone-merged store. Written
    // BEFORE the commit marker so a replayed epoch rewrites it
    // idempotently; the previous epoch's segment dir is then dropped so
    // the store stays O(1) dirs regardless of crawl age.
    if (cfg.useBloom && !cfg.forceUpdate) {
      spark.sparkContext.setJobDescription(s"epoch=$epoch seen-bloom-write")
      val deltaKeys = written.filter(col("status") === Status.Processed)
        .select(col("host_bucket").cast("int").as("host_bucket"),
          col("url_hash"))
      val prevSegs: Dataset[(Int, Array[Byte])] =
        if (seen == null) spark.emptyDataset[(Int, Array[Byte])]
        else segmentsDs
      // written at the cogroup's OWN parallelism: an earlier coalesce(1)
      // folded back into the cogroup and ran the whole merge — every
      // bucket's key-fill — as ONE task (~12 GB of serial segment work at
      // 10^10 keys). The file count per segment dir is bounded by the
      // shuffle parallelism and the dir itself is O(1) per crawl (the
      // previous epoch's dir is dropped below), so there is no
      // small-files growth to collapse.
      SeenSet.mergeDeltaIntoSegments(deltaKeys, prevSegs,
          expectedPerBucket, cfg.bloomFpp)
        .toDF("host_bucket", "bloom")
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(bloomDir(cfg.workDir, epoch))
      segsFallback.foreach(_.unpersist(blocking = false))
      val fsB = new Path(cfg.workDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
      // sidecar meta: the segment set is only reusable under the SAME
      // bucketing (host_bucket = hash % buckets) — a changed cfg.buckets
      // between runs can leave the per-segment bloom shape unchanged (the
      // max(64,...) floor, or proportionally scaled totalUrls) while every
      // key now maps to a different bucket, which would read as bloom
      // false NEGATIVES. loadSegments validates this file and rebuilds on
      // any mismatch.
      val metaOut = fsB.create(new Path(s"${bloomDir(cfg.workDir, epoch)}/_graft_meta.json"), true)
      metaOut.write(
        s"""{"buckets":${cfg.buckets},"expectedPerBucket":$expectedPerBucket,"fpp":${cfg.bloomFpp}}"""
          .getBytes("UTF-8"))
      metaOut.close()
      fsB.delete(new Path(bloomDir(cfg.workDir, epoch - 1)), true)
    }
    spark.sparkContext.setJobDescription(s"epoch=$epoch carry-write")

    // carry = retry ∪ deferred in ONE partitioned write (queue=retry |
    // queue=deferred). Retry rows = transient/corrupt FAILED rows,
    // eligible next epoch — derived from the ACTUAL validated statuses in
    // the written table (broadcast semi-join on the small FAILED sliver,
    // no shuffle), never recomputed from expected outcomes: if validation
    // ever disagreed with the expectation table, the engine would
    // otherwise put one URL in BOTH the seen store and the retry queue
    // and drift from itself.
    val failedKeys = written.filter(col("status") === Status.Failed)
      .select("url_hash")
    val retryRows = admitted.toDF()
      .join(broadcast(failedKeys), Seq("url_hash"), "left_semi")
      .as[AdmittedUrl]
      .map(_.toKeyed)
    store.writeCarry(
      deferred.toDF().withColumn("queue", lit("deferred"))
        .unionByName(retryRows.toDF().withColumn("queue", lit("retry"))),
      s"${cfg.workDir}/carry/epoch=$epoch")

    // all outcome metrics were observed on jobs this epoch already ran:
    // dup/total on the dedup cache, scheduling states on the schedule
    // cache (both filled by the payload write), status counts + bytes on
    // the written cache and the host sum on the lineage output (both
    // filled by the lineage write). Zero dedicated metric jobs.
    val dRow = awaitObserved(obsDedup, "dedup", epoch)
    val sRow = awaitObserved(obsSched, "sched", epoch)
    val wRow = awaitObserved(obsWritten, "written", epoch)
    val lRow = awaitObserved(obsLineage, "lineage", epoch)
    val nDup = dRow.getAs[Long]("dup")
    val nCandidates = dRow.getAs[Long]("total")
    val nLive = nCandidates - nDup
    val nDenied = sRow.getAs[Long]("denied")
    val nAdmitted = sRow.getAs[Long]("admitted")
    val nDeferred = sRow.getAs[Long]("deferred")
    val nSeenSkipped = nLive - nDenied - nAdmitted - nDeferred
    written.unpersist()
    val durationMs = (System.nanoTime() - tEpoch0) / 1000000L
    // A8/A9/A11 derived metrics (BulkCrawlProgress.java:254-329 analogue):
    // rate over this epoch, % of the configured frontier consumed, ETA for
    // the remaining epochs at this epoch's rate. Wall-clock measurements —
    // excluded from the deterministic equivalence surface.
    val rate = if (durationMs > 0) nCandidates * 1000.0 / durationMs else 0.0
    val freshConsumed = math.min(cfg.totalUrls, (epoch + 1).toLong * cfg.urlsPerEpoch)
    val progressPct =
      if (cfg.totalUrls > 0) freshConsumed * 100.0 / cfg.totalUrls else 100.0
    val etaMs = if (rate > 0) ((cfg.totalUrls - freshConsumed) / rate * 1000.0).toLong else 0L
    val m = EpochMetrics(epoch, nCandidates, nDenied,
      n_dup_in_epoch = nDup,
      n_seen_skipped = nSeenSkipped,
      n_admitted = nAdmitted,
      n_deferred = nDeferred,
      n_processed = wRow.getAs[Long]("p"),
      n_failed = wRow.getAs[Long]("f"),
      n_rejected = wRow.getAs[Long]("r"),
      bytes_written = wRow.getAs[Long]("b"),
      n_hosts = lRow.getAs[Long]("hosts"),
      duration_ms = durationMs,
      urls_per_sec = rate,
      progress_pct = progressPct,
      eta_ms = etaMs)
    store.writeMetrics(m, cfg.workDir, spark)

    // 8. atomic commit marker — everything above is replayable; the marker
    // flips the epoch to "done" (Iceberg-snapshot stand-in)
    commit(spark, cfg.workDir, m)

    scheduled.unpersist()
    // unpersist, not destroy: lineage replay may still lazily re-broadcast
    // (same rationale as the bloom broadcast in unseenTwoTierBroadcast).
    // Shared rules are released once per RUN by the caller, not per epoch.
    if (sharedRules.isEmpty) bcRules.unpersist()
    m
  }

  /** Read an observed-metrics row. The observation's promise completes on
    * the listener callback of the action that materialized its node —
    * always a job this epoch already ran — so this await is a handshake,
    * not a wait for work; the timeout exists to fail loudly if an epoch
    * rewrite ever drops the materializing action. */
  private def awaitObserved(obs: org.apache.spark.sql.Observation,
      what: String, epoch: Int): org.apache.spark.sql.Row = {
    import scala.concurrent.Await
    import scala.concurrent.duration._
    try Await.result(obs.future, 600.seconds)
    catch {
      case _: java.util.concurrent.TimeoutException =>
        throw new IllegalStateException(
          s"epoch=$epoch observed '$what' metrics never materialized — " +
            "the observing action was not executed")
    }
  }

  private def commit(spark: SparkSession, workDir: String, m: EpochMetrics): Unit = {
    val fs = new Path(workDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(s"$workDir/_commits"))
    val tmp = new Path(s"$workDir/_commits/.epoch_${m.epoch}.json.tmp")
    val fin = new Path(s"$workDir/_commits/epoch_${m.epoch}.json")
    val out = fs.create(tmp, true)
    out.write(
      s"""{"epoch":${m.epoch},"candidates":${m.n_candidates},"admitted":${m.n_admitted},"processed":${m.n_processed}}"""
        .getBytes("UTF-8"))
    out.close()
    if (fs.exists(fin)) fs.delete(fin, false)
    fs.rename(tmp, fin)
  }

  private[graft] def bloomDir(workDir: String, epoch: Int): String =
    s"$workDir/seen_blooms/epoch=$epoch"

  /** Load the persisted bloom segments written after `epoch`. Returns None
    * — and the caller rebuilds from the store — unless the dir is a fully
    * COMMITTED write (`_SUCCESS` present; a watchdog-cancelled or crashed
    * epoch can leave a partial dir, and a silently-missing bucket would
    * read as "no seen keys here" = a bloom false NEGATIVE, breaking
    * byte-exact membership) with the shape the current config implies (a
    * changed totalUrls/fpp between runs makes old segments un-mergeable).
    * Any read failure likewise falls back rather than wedging resume. */
  /** [[loadSegmentsDs]] collected — test/diagnostic helper ONLY (the epoch
    * loop never collects segments outside the broadcast-tier probe). */
  private[graft] def loadSegments(spark: SparkSession, cfg: CrawlConfig,
      epoch: Int, expectedPerBucket: Long): Option[Seq[(Int, Array[Byte])]] =
    loadSegmentsDs(spark, cfg, epoch, expectedPerBucket)
      .map(_.collect().toSeq.sortBy(_._1))

  /** The persisted segment store as a lazy Dataset (no job, no collect).
    * Validation is metadata-only: the sidecar records the (buckets,
    * expectedPerBucket, fpp) the segments were built under, and only this
    * engine writes the dir — matching meta ⇒ matching per-segment shape.
    * The meta guards the BUCKETING, not just the shape: a changed
    * cfg.buckets remaps every key's host_bucket while the bloom shape can
    * stay identical, and probing under the wrong mapping reads as false
    * negatives = silent duplicate crawls. No/unreadable/mismatched meta,
    * or a partial (no `_SUCCESS`) dir ⇒ None, caller rebuilds. */
  private[graft] def loadSegmentsDs(spark: SparkSession, cfg: CrawlConfig,
      epoch: Int, expectedPerBucket: Long): Option[Dataset[(Int, Array[Byte])]] = {
    import spark.implicits._
    val dir = bloomDir(cfg.workDir, epoch)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(s"$dir/_SUCCESS"))) return None
    scala.util.Try {
      val metaPath = new Path(s"$dir/_graft_meta.json")
      if (!fs.exists(metaPath)) return None
      val metaIn = fs.open(metaPath)
      val metaStr = scala.io.Source.fromInputStream(metaIn, "UTF-8").mkString
      metaIn.close()
      def fld(name: String): Option[String] =
        ("\"" + name + "\":([0-9.eE+-]+)").r
          .findFirstMatchIn(metaStr).map(_.group(1))
      val ok = fld("buckets").contains(cfg.buckets.toString) &&
        fld("expectedPerBucket").contains(expectedPerBucket.toString) &&
        fld("fpp").exists(_.toDouble == cfg.bloomFpp)
      if (!ok) None
      else Some(spark.read.parquet(dir)
        .select(col("host_bucket").cast("int"), col("bloom"))
        .as[(Int, Array[Byte])])
    }.getOrElse(None)
  }

  /** Union of all committed seen deltas before `epoch`, with delete
    * tombstones merged on read (S10: a deleted URL is re-crawlable next
    * epoch — seen.SeenDeletes); null if none. */
  def readSeen(spark: SparkSession, workDir: String, epoch: Int)
      : org.apache.spark.sql.DataFrame = {
    val fs = new Path(workDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs = (0 until epoch).map(e => s"$workDir/seen/epoch=$e")
      .filter(d => fs.exists(new Path(d)))
    if (dirs.isEmpty) null
    else graft.seen.SeenDeletes.applyTombstones(spark, workDir,
      spark.read.parquet(dirs: _*))
  }

  /** All existing per-epoch seen directories (compaction targets). */
  def seenEpochDirs(spark: SparkSession, workDir: String, epochs: Int): Seq[String] =
    (0 until epochs).map(e => s"$workDir/seen/epoch=$e")

  /** Read the previous epoch's carry table (both queues — partition
    * pruning makes per-queue reads equally cheap if a caller wants one).
    * The schema is passed EXPLICITLY: an epoch with zero deferred and
    * zero retry rows leaves a part-file-less dynamic-partition dir, and
    * schema inference over that throws UNABLE_TO_INFER_SCHEMA where an
    * empty carry must simply read back empty. */
  private[graft] def readCarried(spark: SparkSession, dir: String): Dataset[KeyedUrl] = {
    import spark.implicits._
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new Path(dir)))
      spark.read.schema(implicitly[org.apache.spark.sql.Encoder[KeyedUrl]].schema)
        .parquet(dir)
        .select("url_canon", "url_hash", "docid", "court", "host",
          "host_bucket", "path", "sitemap_seq", "entry_seq",
          "discovered_epoch", "lastmod")
        .as[KeyedUrl]
    else spark.emptyDataset[KeyedUrl]
  }
}

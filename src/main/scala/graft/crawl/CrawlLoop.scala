package graft.crawl

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}
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
    forceUpdate: Boolean = false) {
  def urlsPerEpoch: Long = totalUrls / epochs
}

/** The epoch fixpoint loop: synth-slice → key → intra-epoch dedup →
  * seen filter (broadcast bloom probe + exact confirm) → fused host stage
  * (robots admission + politeness rank + budget in one pass) → simulated
  * fetch/validate → partitioned sink + seen delta + deferred + retry +
  * metrics + lineage, committed per epoch with an atomic marker for
  * resume (ST4).
  *
  * Shuffle budget per epoch (the thing that must survive 1000 executors ×
  * 10^10 rows): (1) url_hash window for intra-epoch dedup, whose hash
  * partitioning the exact-confirm anti-join reuses — and the anti-join
  * only sees the bloom-positive sliver because the bloom probe is a
  * broadcast predicate, not a shuffle; (2) one repartition(host)+sort for
  * the fused robots+politeness stage (streamed per-host run-length pass —
  * a Zipf mega-host costs one task's time, never one task's memory);
  * (3) the partitioned write. Everything else is narrow.
  */
object CrawlLoop {

  /** Run all (remaining) epochs; `stopAfter` caps how many epochs run
    * this invocation (kill/resume testing). Resume = next epoch after the
    * last commit marker. */
  def run(spark: SparkSession, cfg: CrawlConfig,
      stopAfter: Int = Int.MaxValue): Seq[EpochMetrics] = {
    val resumeFrom = lastCommittedEpoch(spark, cfg.workDir) + 1
    val until = math.min(cfg.epochs.toLong, resumeFrom.toLong + stopAfter.toLong).toInt
    (resumeFrom until until).map(e => runEpoch(spark, cfg, e))
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

  def runEpoch(spark: SparkSession, cfg: CrawlConfig, epoch: Int): EpochMetrics = {
    import spark.implicits._

    // 1. this epoch's frontier slice + carried-over work
    val slice = FrontierSynth.frontier(spark, cfg.urlsPerEpoch, cfg.numHosts,
      cfg.seed, epoch, epochOffset = epoch * cfg.urlsPerEpoch)
    val newKeyed = FrontierSynth.key(slice, cfg.buckets)
    // NB: unionByName — joins upstream reorder columns (join key first),
    // and Dataset.union is positional
    val carried = readKeyed(spark, s"${cfg.workDir}/deferred/epoch=${epoch - 1}")
      .unionByName(readKeyed(spark, s"${cfg.workDir}/retry/epoch=${epoch - 1}"))
    val candidates = newKeyed.unionByName(carried)
      .persist(StorageLevel.MEMORY_AND_DISK)
    spark.sparkContext.setJobDescription(s"epoch=$epoch candidates")
    val nCandidates = candidates.count()

    // 2. intra-epoch first-occurrence dedup (url_hash window). Duplicates
    // share the canonical URL, so dedup-before-robots is interchangeable
    // with robots-before-dedup for membership/traces; doing it first lets
    // the anti-join reuse the url_hash partitioning.
    val deduped = Politeness.dedupWithinEpoch(candidates)
      .persist(StorageLevel.MEMORY_AND_DISK)
    spark.sparkContext.setJobDescription(s"epoch=$epoch dedup")
    val nDeduped = deduped.count()

    // 3. URL-seen anti-join (success-only store; forceUpdate bypasses).
    // Two-tier: broadcast bloom probe (no shuffle) + exact confirm of the
    // positives; segments stay distributed (cogroup path) only when too
    // big to broadcast.
    val seen = readSeen(spark, cfg.workDir, epoch)
    val unseen = (if (cfg.forceUpdate || seen == null) deduped
      else if (cfg.useBloom) {
        val expectedPerBucket = math.max(64L,
          (epoch.toLong * cfg.urlsPerEpoch) / cfg.buckets)
        val segments = SeenSet.bloomSegments(seen, cfg.buckets,
          expectedPerBucket, cfg.bloomFpp)
        SeenSet.unseenTwoTierBroadcast(deduped, seen, segments)
      } else SeenSet.unseenExact(deduped, seen))
      .persist(StorageLevel.MEMORY_AND_DISK)
    spark.sparkContext.setJobDescription(s"epoch=$epoch seen-filter")
    val nUnseen = unseen.count()

    // 4. fused host stage: robots admission + politeness rank + budget in
    // one repartition(host)+sort+streamed pass
    val rules = Robots.syntheticRules(cfg.numHosts, cfg.seed)
    val scheduled = Politeness.schedule(unseen, rules, cfg.budgetPerHost)
      .persist(StorageLevel.MEMORY_AND_DISK)
    spark.sparkContext.setJobDescription(s"epoch=$epoch host-schedule")
    val schedCounts = scheduled.groupByKey(_._2).count().collect().toMap
    val nDenied = schedCounts.getOrElse(Politeness.Sched.Denied, 0L)
    val nAdmitted = schedCounts.getOrElse(Politeness.Sched.Admitted, 0L)
    val nDeferred = schedCounts.getOrElse(Politeness.Sched.Deferred, 0L)
    val admitted = scheduled.filter(_._2 == Politeness.Sched.Admitted)
      .map { case (k, _, slot) => AdmittedUrl(k.url_canon, k.url_hash,
        k.docid, k.court, k.host, k.host_bucket, k.path, k.sitemap_seq,
        k.entry_seq, k.discovered_epoch, k.lastmod, slot) }
    val deferred = scheduled.filter(_._2 == Politeness.Sched.Deferred).map(_._1)

    // 5. simulated fetch + decode + invariant validation
    val results = Fetch.fetch(admitted, epoch).persist(StorageLevel.MEMORY_AND_DISK)

    // 7. sinks (idempotent per epoch)
    spark.sparkContext.setJobDescription(s"epoch=$epoch payload-write")
    PayloadSink.write(results, cfg.workDir)
    spark.sparkContext.setJobDescription(s"epoch=$epoch lineage-write")
    PayloadSink.writeLineage(PayloadSink.lineage(results, epoch), cfg.workDir, epoch)

    // seen delta = terminal-success rows only (reference guard:
    // status==DOWNLOADED ⇒ skip; CrawlerOrchestrationService.java:114-115)
    spark.sparkContext.setJobDescription(s"epoch=$epoch seen-write")
    results.filter(_.status == Status.Processed)
      .map(r => (r.url_hash, r.host_bucket))
      .toDF("url_hash", "host_bucket")
      .write.mode(SaveMode.Overwrite).parquet(s"${cfg.workDir}/seen/epoch=$epoch")
    spark.sparkContext.setJobDescription(s"epoch=$epoch retry-write")

    // retry queue = transient/corrupt FAILED rows, eligible next epoch.
    // Fetch outcomes are deterministic in (url_hash, epoch), so the retry
    // rows are recomputable from `admitted` without joining back to
    // `results` (no extra shuffle).
    admitted.filter(a => Outcomes.of(a.url_hash, epoch) == Status.Failed)
      .map(_.toKeyed)
      .write.mode(SaveMode.Overwrite).parquet(s"${cfg.workDir}/retry/epoch=$epoch")

    spark.sparkContext.setJobDescription(s"epoch=$epoch deferred-write")
    writeKeyed(deferred, s"${cfg.workDir}/deferred/epoch=$epoch")

    // one pass over results for all outcome metrics
    spark.sparkContext.setJobDescription(s"epoch=$epoch result-metrics")
    val mrow = results.toDF().agg(
      count(when(col("status") === Status.Processed, 1)).as("p"),
      count(when(col("status") === Status.Failed, 1)).as("f"),
      count(when(col("status") === Status.Rejected, 1)).as("r"),
      coalesce(sum(length(col("bytes")).cast("long")), lit(0L)).as("b"),
      countDistinct(col("host")).as("h")).head()
    val statusCounts = Map(
      Status.Processed -> mrow.getLong(0),
      Status.Failed -> mrow.getLong(1),
      Status.Rejected -> mrow.getLong(2))
    val bytesWritten = mrow.getLong(3)
    val nHosts = mrow.getLong(4)
    val m = EpochMetrics(epoch, nCandidates, nDenied,
      n_dup_in_epoch = nCandidates - nDeduped,
      n_seen_skipped = nDeduped - nUnseen,
      n_admitted = nAdmitted,
      n_deferred = nDeferred,
      n_processed = statusCounts.getOrElse(Status.Processed, 0L),
      n_failed = statusCounts.getOrElse(Status.Failed, 0L),
      n_rejected = statusCounts.getOrElse(Status.Rejected, 0L),
      bytes_written = bytesWritten,
      n_hosts = nHosts)
    PayloadSink.writeMetrics(m, cfg.workDir, spark)

    // 8. atomic commit marker — everything above is replayable; the marker
    // flips the epoch to "done" (Iceberg-snapshot stand-in)
    commit(spark, cfg.workDir, m)

    candidates.unpersist(); deduped.unpersist(); unseen.unpersist()
    scheduled.unpersist(); results.unpersist()
    m
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

  /** Union of all committed seen deltas before `epoch`; null if none. */
  def readSeen(spark: SparkSession, workDir: String, epoch: Int)
      : org.apache.spark.sql.DataFrame = {
    val fs = new Path(workDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs = (0 until epoch).map(e => s"$workDir/seen/epoch=$e")
      .filter(d => fs.exists(new Path(d)))
    if (dirs.isEmpty) null else spark.read.parquet(dirs: _*)
  }

  private def readKeyed(spark: SparkSession, dir: String): Dataset[KeyedUrl] = {
    import spark.implicits._
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new Path(dir))) spark.read.parquet(dir).as[KeyedUrl]
    else spark.emptyDataset[KeyedUrl]
  }

  private def writeKeyed(ds: Dataset[KeyedUrl], dir: String): Unit =
    ds.write.mode(SaveMode.Overwrite).parquet(dir)
}

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

/** The epoch fixpoint loop: synth-slice → key → robots admit → intra-epoch
  * dedup → seen anti-join (two-tier bloom + exact confirm) → politeness
  * budget → simulated fetch/validate → partitioned sink + seen delta +
  * deferred + retry + metrics + lineage, committed per epoch with an
  * atomic marker for resume (ST4).
  *
  * Shuffle budget per epoch (the thing that must survive 1000 executors ×
  * 10^10 rows): (1) groupByKey(host) for robots, (2) url_hash window for
  * intra-epoch dedup, (3) host_bucket cogroup for the bloom + url_hash
  * anti-join on the bloom-surviving slice, (4) host window for politeness
  * (fed by the map-side partial top-k, so the mega-host ships ≤
  * budget×partitions rows), (5) the partitioned write. Everything else is
  * narrow.
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
    val nCandidates = candidates.count()

    // 2. robots admission (mapGroups, deny-by-default, broadcast rules)
    val rules = Robots.syntheticRules(cfg.numHosts, cfg.seed)
    val (allowed0, denied) = Robots.admit(candidates, rules)
    val allowed = allowed0.persist(StorageLevel.MEMORY_AND_DISK)
    val nDenied = denied.count()

    // 3. intra-epoch first-occurrence dedup
    val deduped = Politeness.dedupWithinEpoch(allowed)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nDeduped = deduped.count()

    // 4. URL-seen anti-join (success-only store; forceUpdate bypasses)
    val seen = readSeen(spark, cfg.workDir, epoch)
    val unseen = (if (cfg.forceUpdate) deduped
      else if (cfg.useBloom && seen != null) {
        val expectedPerBucket = math.max(64L,
          (epoch.toLong * cfg.urlsPerEpoch) / cfg.buckets)
        val segments = SeenSet.bloomSegments(seen, cfg.buckets,
          expectedPerBucket, cfg.bloomFpp)
        SeenSet.unseenTwoTier(deduped, seen, segments)
      } else if (seen != null) SeenSet.unseenExact(deduped, seen)
      else deduped).persist(StorageLevel.MEMORY_AND_DISK)
    val nUnseen = unseen.count()

    // 5. politeness budget (window-ranked per-host priority queue)
    val (admitted0, deferred) = Politeness.admit(unseen, cfg.budgetPerHost)
    val admitted = admitted0.persist(StorageLevel.MEMORY_AND_DISK)
    val nAdmitted = admitted.count()

    // 6. simulated fetch + decode + invariant validation
    val results = Fetch.fetch(admitted, epoch).persist(StorageLevel.MEMORY_AND_DISK)

    // 7. sinks (idempotent per epoch)
    PayloadSink.write(results, cfg.workDir)
    PayloadSink.writeLineage(PayloadSink.lineage(results, epoch), cfg.workDir, epoch)

    // seen delta = terminal-success rows only (reference guard:
    // status==DOWNLOADED ⇒ skip; CrawlerOrchestrationService.java:114-115)
    results.filter(_.status == Status.Processed)
      .map(r => (r.url_hash, r.host_bucket))
      .toDF("url_hash", "host_bucket")
      .write.mode(SaveMode.Overwrite).parquet(s"${cfg.workDir}/seen/epoch=$epoch")

    // retry queue = transient/corrupt FAILED rows, eligible next epoch
    val failedHashes = results.filter(_.status == Status.Failed)
      .map(_.url_hash).toDF("url_hash")
    admitted.join(failedHashes, Seq("url_hash"), "left_semi")
      .as[AdmittedUrl].map(_.toKeyed)
      .write.mode(SaveMode.Overwrite).parquet(s"${cfg.workDir}/retry/epoch=$epoch")

    writeKeyed(deferred, s"${cfg.workDir}/deferred/epoch=$epoch")

    // one pass over results for all outcome metrics
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
      n_dup_in_epoch = (nCandidates - nDenied) - nDeduped,
      n_seen_skipped = nDeduped - nUnseen,
      n_admitted = nAdmitted,
      n_deferred = nUnseen - nAdmitted,
      n_processed = statusCounts.getOrElse(Status.Processed, 0L),
      n_failed = statusCounts.getOrElse(Status.Failed, 0L),
      n_rejected = statusCounts.getOrElse(Status.Rejected, 0L),
      bytes_written = bytesWritten,
      n_hosts = nHosts)
    PayloadSink.writeMetrics(m, cfg.workDir, spark)

    // 8. atomic commit marker — everything above is replayable; the marker
    // flips the epoch to "done" (Iceberg-snapshot stand-in)
    commit(spark, cfg.workDir, m)

    Seq(candidates, allowed, deduped, unseen, admitted, results)
      .foreach(_.unpersist())
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

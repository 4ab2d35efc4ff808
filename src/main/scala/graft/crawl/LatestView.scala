package graft.crawl

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally maintained latest-row-wins view — the J3 upsert READER
  * made O(epoch-delta) instead of O(store).
  *
  * The payload store is append-only (a forceUpdate re-crawl appends a new
  * `crawl_epoch` row); the reference instead updates the stored row in
  * place (service/CrawlerOrchestrationService.java:120-137). Every reader
  * of "current" rows therefore needs latest-per-url_hash — which as a
  * `Window.partitionBy(url_hash)` over the whole payload table is a full
  * store SHUFFLE PER READ (round-2 c08, the suite's slowest c-query; at
  * 10^10 rows, a non-starter). This module maintains `latest/` — one slim
  * metadata row per live url_hash, partitioned by host_bucket — as part of
  * each epoch, so the upsert reader becomes a plain scan: no window, no
  * shuffle, partition-prunable by bucket.
  *
  * Per-epoch cost: only the buckets the epoch touched are rewritten. Old
  * latest rows superseded by the epoch are dropped with a BROADCAST
  * anti-join on the epoch's url_hash sliver (≤ admitted-per-epoch keys —
  * the same inverted-join discipline as the seen confirm: the store side
  * is scanned, never shuffled), the epoch's slim rows are unioned in, and
  * the result is staged then swapped bucket-dir-by-bucket-dir under a
  * crash-recoverable marker. With an Iceberg runtime this is `MERGE INTO`;
  * the stage+swap is the file-replacement dance of a copy-on-write MERGE,
  * minus the catalog.
  *
  * Idempotent replay: an epoch re-run after a crash anti-joins ITS OWN
  * previously-swapped rows out before re-adding them, so latest converges
  * regardless of where the previous attempt died; [[recover]] finishes a
  * half-done swap from the staged files (the staged write is only swapped
  * after its `_SUCCESS`).
  *
  * The view holds METADATA columns only (no payload bytes, no caption):
  * a consumer needing the full row fetches it from the payload table by
  * (host_bucket, crawl_epoch) — partition-pruned point read.
  */
object LatestView {

  private def latestDir(workDir: String) = s"$workDir/latest"
  private def stagingDir(workDir: String) = s"$workDir/latest_staging"
  private def markerPath(workDir: String) = new Path(s"$workDir/_commits/latest_swap.json")

  private val slimCols = Seq("url_hash", "image_id", "host", "slot", "w", "h",
    "fmt", "phash", "status", "psnr", "reject_reason", "n_bytes")

  /** Merge this epoch's written payload frame into `latest/`.
    * `written` must carry the payload columns plus host_bucket/crawl_epoch;
    * `touchedBuckets` are the bucket ids the epoch wrote. */
  def maintain(spark: SparkSession, workDir: String, epoch: Int,
      written: DataFrame, touchedBuckets: Seq[Int]): Unit = {
    if (touchedBuckets.isEmpty) return
    val fs = new Path(workDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val slim = written.select(
      (slimCols.map(col) :+ col("host_bucket").cast("int").as("host_bucket")
        :+ col("crawl_epoch").cast("int").as("crawl_epoch")): _*)
    val oldDirs = touchedBuckets.map(b => s"${latestDir(workDir)}/host_bucket=$b")
      .filter(d => fs.exists(new Path(d)))
    val merged =
      if (oldDirs.isEmpty) slim
      else {
        val old = spark.read.option("basePath", latestDir(workDir)).parquet(oldDirs: _*)
          .select(slim.columns.map(col): _*)
        // epoch keys broadcast: the sliver is bounded by admitted-per-epoch,
        // the old-latest side streams through a narrow scan — zero exchange
        old.join(broadcast(slim.select(col("url_hash"))), Seq("url_hash"), "left_anti")
          .unionByName(slim)
      }
    val staging = stagingDir(workDir)
    fs.delete(new Path(staging), true)
    merged.write.mode(SaveMode.Overwrite).partitionBy("host_bucket").parquet(staging)
    // marker AFTER the staged write is complete, BEFORE any swap: recovery
    // semantics are "marker present ⇒ staged data is authoritative for the
    // buckets it contains"
    writeMarker(fs, workDir, epoch)
    swapStaged(fs, workDir)
  }

  /** Finish (or discard) a half-done swap — called before reading latest/
    * and at crawl resume, mirroring SeenDeletes.recoverConsolidation. */
  def recover(spark: SparkSession, workDir: String): Unit = {
    val fs = new Path(workDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = markerPath(workDir)
    val staging = new Path(stagingDir(workDir))
    if (fs.exists(marker)) {
      // staged write completed (marker is written only after _SUCCESS):
      // re-drive the swap from whatever staged bucket dirs remain
      swapStaged(fs, workDir)
    } else if (fs.exists(staging)) {
      // crash mid-staging: latest/ untouched and consistent; the epoch has
      // no commit marker so it will be replayed — just drop the debris
      fs.delete(staging, true)
    }
  }

  private def writeMarker(fs: org.apache.hadoop.fs.FileSystem, workDir: String,
      epoch: Int): Unit = {
    fs.mkdirs(new Path(s"$workDir/_commits"))
    val out = fs.create(markerPath(workDir), true)
    out.write(s"""{"epoch":$epoch,"state":"staged"}""".getBytes("UTF-8"))
    out.close()
  }

  private def swapStaged(fs: org.apache.hadoop.fs.FileSystem, workDir: String): Unit = {
    val staging = new Path(stagingDir(workDir))
    val latest = new Path(latestDir(workDir))
    fs.mkdirs(latest)
    if (fs.exists(staging)) {
      fs.listStatus(staging).filter(_.isDirectory)
        .filter(_.getPath.getName.startsWith("host_bucket="))
        .foreach { st =>
          val dst = new Path(latest, st.getPath.getName)
          fs.delete(dst, true)
          fs.rename(st.getPath, dst)
        }
      fs.delete(staging, true)
    }
    fs.delete(markerPath(workDir), false)
  }

  /** The latest-row-wins view as a plain scan (empty frame if the crawl
    * has not produced one yet). */
  def read(spark: SparkSession, workDir: String): DataFrame = {
    val fs = new Path(workDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = latestDir(workDir)
    require(fs.exists(new Path(dir)), s"no latest view at $dir — run the crawl first")
    spark.read.parquet(dir)
  }
}

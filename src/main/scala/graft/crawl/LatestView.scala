package graft.crawl

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally maintained latest-row-wins view — the J3 upsert READER
  * made cheap without taxing the crawl hot path.
  *
  * The payload store is append-only (a forceUpdate re-crawl appends a new
  * `crawl_epoch` row); the reference instead updates the stored row in
  * place (service/CrawlerOrchestrationService.java:120-137). Every reader
  * of "current" rows therefore needs latest-per-url_hash — which as a
  * `Window.partitionBy(url_hash)` over the whole payload table is a full
  * store SHUFFLE PER READ (round-2 c08, the suite's slowest c-query; a
  * non-starter at 10^10 rows).
  *
  * Design (the Iceberg-less MERGE-on-read + compaction):
  *  - The view is a POINTER table: (url_hash, status, host_bucket,
  *    crawl_epoch) per live URL, ~16 B/row — all that latest-row
  *    resolution needs. Full current rows resolve by joining pointers
  *    back to the payload on (host_bucket, crawl_epoch, url_hash), a
  *    partition-PRUNED read (both are payload partition keys).
  *  - Per epoch, the loop APPENDS this epoch's pointers as
  *    `latest_delta/epoch=N` — a plain columnar write, no join, no
  *    rewrite. (An eager per-epoch merge+swap was measured at 20-60% of
  *    total crawl wall depending on pointer width — an O(store) rewrite
  *    per epoch; the delta append is O(epoch).)
  *  - Every `latestCompactEvery` epochs the deltas fold into the resolved
  *    `latest/` dir: tail resolved within itself (max-epoch per key — the
  *    tail is K epochs, bounded), then the resolved store anti-joins the
  *    tail's keys (store SCANNED, never shuffled) and the staged result
  *    swaps in under a crash-recoverable marker.
  *  - [[read]] = resolved scan when no tail exists; otherwise resolved
  *    anti-join broadcast(tail keys) ∪ tail-resolved — zero shuffle of
  *    the store, no Window anywhere, tail work bounded by the cadence.
  *
  * Idempotent replay: a replayed epoch's delta write is a dynamic
  * overwrite of its own dir; compaction merges by key (its own prior
  * output anti-joined out), so every crash point converges; [[recover]]
  * finishes a half-done swap from the staged files.
  */
object LatestView {

  private def latestDir(workDir: String) = s"$workDir/latest"
  private def deltaRoot(workDir: String) = s"$workDir/latest_delta"
  private def stagingDir(workDir: String) = s"$workDir/latest_staging"
  private def markerPath(workDir: String) = new Path(s"$workDir/_commits/latest_swap.json")

  private def fsOf(spark: SparkSession, workDir: String) =
    new Path(workDir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def pointerCols(written: DataFrame): DataFrame =
    written.select(col("url_hash"), col("status"),
      col("host_bucket").cast("int").as("host_bucket"),
      col("crawl_epoch").cast("int").as("crawl_epoch"))

  /** Per-epoch maintenance: append this epoch's pointer delta. O(epoch)
    * work — one slim columnar write, idempotent per epoch dir. */
  def appendDelta(spark: SparkSession, workDir: String, epoch: Int,
      written: DataFrame): Unit =
    pointerCols(written).write.mode(SaveMode.Overwrite)
      .parquet(s"${deltaRoot(workDir)}/epoch=$epoch")

  private def listDeltaDirs(spark: SparkSession, workDir: String): Seq[String] = {
    val fs = fsOf(spark, workDir)
    val root = new Path(deltaRoot(workDir))
    if (!fs.exists(root)) Nil
    else fs.listStatus(root).filter(_.isDirectory)
      .map(_.getPath.toString).filter(_.contains("epoch="))
      // numeric ascending — compaction deletes OLDEST first, so a crash
      // mid-deletion always leaves the NEWEST dirs and the next compact's
      // tail max still equals the resolved value (lexicographic order
      // would delete epoch=10 before epoch=2 and could regress a pointer)
      .sortBy(_.split("epoch=").last.toInt).toSeq
  }

  /** Resolve a pointer frame to one row per url_hash (max crawl_epoch
    * wins — epochs are unique per key). max(struct) keeps the plan
    * Window-free; it only ever runs over the bounded delta tail. */
  private def resolveTail(tail: DataFrame): DataFrame =
    tail.groupBy(col("url_hash"))
      .agg(max(struct(col("crawl_epoch"), col("host_bucket"), col("status"))).as("r"))
      .select(col("url_hash"), col("r.status").as("status"),
        col("r.host_bucket").as("host_bucket"), col("r.crawl_epoch").as("crawl_epoch"))

  /** Fold all outstanding deltas into the resolved `latest/` dir
    * (staged write + marker + bucket-dir swap, then drop the deltas).
    * Amortized: the crawl loop calls it every `latestCompactEvery`
    * epochs; also safe to call on demand before heavy read workloads. */
  def compact(spark: SparkSession, workDir: String): Unit = {
    val deltaDirs = listDeltaDirs(spark, workDir)
    if (deltaDirs.isEmpty) return
    val fs = fsOf(spark, workDir)
    val tail = resolveTail(
      spark.read.option("basePath", deltaRoot(workDir)).parquet(deltaDirs: _*)
        .drop("epoch")) // crawl_epoch rides in the data; epoch= is just the dir key
    val latest = new Path(latestDir(workDir))
    val merged =
      if (!fs.exists(latest)) tail
      else {
        val old = spark.read.parquet(latestDir(workDir)).select(tail.columns.map(col): _*)
        // the resolved store streams through a scan; only the bounded tail
        // shuffles (shuffle-hash: the tail's key set is epochs×admissions —
        // too big to broadcast cheaply, small enough to shuffle)
        old.join(tail.select(col("url_hash")).hint("shuffle_hash"),
            Seq("url_hash"), "left_anti")
          .unionByName(tail)
      }
    val staging = stagingDir(workDir)
    fs.delete(new Path(staging), true)
    merged.repartition(col("host_bucket"))
      .write.mode(SaveMode.Overwrite).partitionBy("host_bucket").parquet(staging)
    // marker AFTER the staged write completes, BEFORE any swap: recovery
    // semantics are "marker present ⇒ staged data is authoritative"
    writeMarker(fs, workDir)
    swapStaged(fs, workDir)
    deltaDirs.foreach(d => fs.delete(new Path(d), true))
  }

  /** Finish (or discard) a half-done swap — called at crawl resume,
    * mirroring SeenDeletes.recoverConsolidation. */
  def recover(spark: SparkSession, workDir: String): Unit = {
    val fs = fsOf(spark, workDir)
    if (fs.exists(markerPath(workDir))) {
      // staged write completed (marker written only after _SUCCESS):
      // re-drive the swap from whatever staged bucket dirs remain; any
      // deltas not yet deleted re-merge idempotently at the next compact
      swapStaged(fs, workDir)
    } else if (fs.exists(new Path(stagingDir(workDir)))) {
      // crash mid-staging: resolved dir untouched, deltas still present —
      // just drop the debris; the next compact redoes the merge
      fs.delete(new Path(stagingDir(workDir)), true)
    }
  }

  private def writeMarker(fs: org.apache.hadoop.fs.FileSystem, workDir: String): Unit = {
    fs.mkdirs(new Path(s"$workDir/_commits"))
    val out = fs.create(markerPath(workDir), true)
    out.write("""{"state":"staged"}""".getBytes("UTF-8"))
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

  /** The latest-row-wins pointer view. Plan shape: resolved scan when the
    * tail is empty; otherwise resolved LEFT ANTI broadcast(tail keys) ∪
    * tail-resolved — the store is scanned, never shuffled, and there is
    * no Window anywhere. */
  def read(spark: SparkSession, workDir: String): DataFrame = {
    val fs = fsOf(spark, workDir)
    val hasResolved = fs.exists(new Path(latestDir(workDir)))
    val deltaDirs = listDeltaDirs(spark, workDir)
    require(hasResolved || deltaDirs.nonEmpty,
      s"no latest view under $workDir — run the crawl first")
    val tailOpt =
      if (deltaDirs.isEmpty) None
      else Some(resolveTail(
        spark.read.option("basePath", deltaRoot(workDir)).parquet(deltaDirs: _*)
          .drop("epoch")))
    (tailOpt, hasResolved) match {
      case (None, _) => spark.read.parquet(latestDir(workDir))
        .select(col("url_hash"), col("status"), col("host_bucket"), col("crawl_epoch"))
      case (Some(tail), false) => tail
      case (Some(tail), true) =>
        val resolved = spark.read.parquet(latestDir(workDir))
          .select(tail.columns.map(col): _*)
        resolved.join(broadcast(tail.select(col("url_hash"))), Seq("url_hash"), "left_anti")
          .unionByName(tail)
    }
  }
}

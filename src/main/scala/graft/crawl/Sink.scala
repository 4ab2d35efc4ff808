package graft.crawl

import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Partitioned payload sink + metrics/lineage tables (SURVEY.md §2.1
  * S6-S9). The reference's court/year/month file tree *is* its partition
  * spec (service/DocumentDownloadService.java:197-207); ours is explicit
  * `(host_bucket, crawl_epoch)` partitioned parquet — the Iceberg layout
  * from BASELINE.json minus the catalog (no Iceberg runtime ships in this
  * container; the write path is identical: partitioned columnar append +
  * an atomic per-epoch commit marker standing in for the snapshot).
  *
  * Idempotent replay: every epoch writes with dynamic partition overwrite,
  * so re-running an epoch after a crash replaces exactly its own
  * partitions (crawl_epoch=e) — the Iceberg-snapshot equivalent that makes
  * resume-from-checkpoint exactly-once (SURVEY.md §2.9 ST4, §7.5.5).
  */
object PayloadSink {

  /** Append this epoch's results under payload/, partitioned
    * (host_bucket, crawl_epoch). Returns (rows, bytes) written. */
  def write(results: Dataset[FetchResult], workDir: String): Unit = {
    val spark = results.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    results.toDF()
      .select(col("image_id"), col("bytes"), col("w"),
        col("h"), col("fmt"), col("caption"), col("phash"), col("url_hash"),
        col("url_canon"), col("host"), col("slot"), col("status"),
        col("psnr"), col("host_bucket"), col("crawl_epoch"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("host_bucket", "crawl_epoch")
      .parquet(s"$workDir/payload")
  }

  /** Per-(epoch, host_bucket) lineage: which partition wrote what. */
  def lineage(results: Dataset[FetchResult], epoch: Int): Dataset[PartitionLineage] = {
    val spark = results.sparkSession
    import spark.implicits._
    results.toDF()
      .groupBy(col("host_bucket"))
      .agg(count(lit(1)).as("n_rows"),
        sum(length(col("bytes")).cast("long")).as("n_bytes"),
        min(col("url_hash")).as("min_url_hash"),
        max(col("url_hash")).as("max_url_hash"))
      .select(lit(epoch).as("epoch"), col("host_bucket"),
        col("n_rows"), col("n_bytes"), col("min_url_hash"), col("max_url_hash"))
      .as[PartitionLineage]
  }

  def writeLineage(l: Dataset[PartitionLineage], workDir: String, epoch: Int): Unit =
    l.write.mode(SaveMode.Overwrite).parquet(s"$workDir/lineage/epoch=$epoch")

  def writeMetrics(m: EpochMetrics, workDir: String, spark: SparkSession): Unit = {
    import spark.implicits._
    Seq(m).toDS().coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$workDir/metrics/epoch=${m.epoch}")
  }
}

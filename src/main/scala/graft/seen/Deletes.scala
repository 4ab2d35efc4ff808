package graft.seen

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** S10 delete pipeline for the URL-seen store (reference:
  * SolrDocumentRepository.deleteById/deleteByQuery,
  * repository/SolrDocumentRepository.java:159-203). A deleted URL must
  * become re-crawlable on the next epoch.
  *
  * Design = merge-on-read with tombstones (the Iceberg MOR delete model,
  * which the north rule's sink implies) + optional compaction:
  *
  *  - [[delete]] appends the deleted url_hashes to an exact tombstone
  *    table and folds them into a persistent delete-capable
  *    [[CuckooFilter]] segment. O(deletes), touches no store partition.
  *  - [[applyTombstones]] is the read-side merge: a broadcast cuckoo
  *    probe marks the (few) possibly-deleted rows, and ONLY those are
  *    anti-joined against the exact tombstone table — the same
  *    two-tier shape as the bloom seen-probe, but with a cuckoo because
  *    blooms cannot delete (SURVEY.md §2.10). Cuckoo negatives skip the
  *    join entirely, so membership stays byte-exact (no false negatives)
  *    while the join sees only the fp-rate sliver.
  *  - [[compact]] rewrites exactly the store partitions that contain
  *    tombstoned keys (partition-level rewrite, others untouched) and
  *    clears the tombstones — the maintenance path that keeps the MOR
  *    read cheap.
  */
object SeenDeletes {

  private def tombDir(workDir: String) = s"$workDir/seen_tombstones"
  private def cuckooPath(workDir: String) = new Path(s"$workDir/seen_tombstones.cuckoo")

  private def fs(spark: SparkSession, workDir: String) =
    new Path(workDir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Tombstone the given url_hashes (column "url_hash"). Idempotent. */
  def delete(spark: SparkSession, workDir: String, hashes: DataFrame): Long = {
    import spark.implicits._
    val hs = hashes.select(col("url_hash").cast("long")).as[Long].collect()
    if (hs.isEmpty) return 0L
    // exact tombstone table (append, dedup on read)
    hs.toSeq.toDF("url_hash")
      .write.mode(SaveMode.Append).parquet(tombDir(workDir))
    // cuckoo segment: load-or-create, insert, atomically replace
    val f = loadCuckoo(spark, workDir)
      .getOrElse(CuckooFilter.create(math.max(1024L, hs.length * 8L)))
    val grown =
      if (hs.forall(f.insert)) f
      else { // table too full: rebuild larger from the exact tombstones
        val all = spark.read.parquet(tombDir(workDir))
          .select(col("url_hash")).as[Long].collect()
        val big = CuckooFilter.create(math.max(4096L, all.length * 8L))
        all.foreach(big.insert)
        big
      }
    writeCuckoo(spark, workDir, grown)
    hs.length.toLong
  }

  /** Merge-on-read: drop tombstoned rows from a seen frame
    * ("url_hash" keyed). Byte-exact (cuckoo prefilter + exact confirm). */
  def applyTombstones(spark: SparkSession, workDir: String, seen: DataFrame): DataFrame = {
    loadCuckoo(spark, workDir) match {
      case None => seen
      case Some(f) =>
        // broadcast the FILTER, not its bytes: the broadcast value is
        // deserialized once per executor and cached, so the probe is pure
        // array reads per row (same pattern as the bloom seen-probe; a
        // bytes broadcast + per-row deserialize rebuilds the whole table
        // for every row probed)
        val bc = spark.sparkContext.broadcast(f)
        val maybeDeleted = udf((h: Long) => bc.value.contains(h))
        val tombs = spark.read.parquet(tombDir(workDir)).select(col("url_hash"))
        val flagged = seen.withColumn("maybe_del__", maybeDeleted(col("url_hash")))
        val kept = flagged.filter(!col("maybe_del__")).drop("maybe_del__")
        val confirmSurvivors = flagged.filter(col("maybe_del__")).drop("maybe_del__")
          .join(broadcast(tombs), Seq("url_hash"), "left_anti")
        kept.unionByName(confirmSurvivors)
    }
  }

  /** Physically rewrite exactly the seen partitions that contain
    * tombstoned keys, then clear the tombstones. `epochDirs` are the
    * per-epoch seen directories ("$workDir/seen/epoch=N"). */
  def compact(spark: SparkSession, workDir: String, epochDirs: Seq[String]): Unit = {
    import spark.implicits._
    val fsys = fs(spark, workDir)
    if (!fsys.exists(new Path(tombDir(workDir)))) return
    val tombs = spark.read.parquet(tombDir(workDir))
      .select(col("url_hash")).distinct()
    val tombSet = tombs.as[Long].collect().toSet
    val bc = spark.sparkContext.broadcast(tombSet)
    val isVictim = udf((h: Long) => bc.value.contains(h))
    epochDirs.filter(d => fsys.exists(new Path(d))).foreach { d =>
      val part = spark.read.parquet(d)
      // partition pruning: rewrite only if this partition holds a victim
      val hit = part.filter(isVictim(col("url_hash"))).limit(1).count() > 0
      if (hit) {
        val tmp = s"$d.compact.tmp"
        part.filter(!isVictim(col("url_hash")))
          .write.mode(SaveMode.Overwrite).parquet(tmp)
        fsys.delete(new Path(d), true)
        fsys.rename(new Path(tmp), new Path(d))
      }
    }
    fsys.delete(new Path(tombDir(workDir)), true)
    fsys.delete(cuckooPath(workDir), false)
  }

  // ---- seen-store consolidation (small-files maintenance) ----------------
  // A long crawl accumulates one seen/epoch=N directory per epoch; at 10^4+
  // epochs the per-epoch file listing and tiny-file reads dominate readSeen.
  // Consolidation merges all epochs-so-far into the highest epoch directory
  // (distinct rows — membership-identical), with a marker-file protocol that
  // makes a crash at ANY step recoverable:
  //   1. write the merged store to seen/.consolidate.tmp
  //   2. atomically create seen/.consolidate.json naming target + sources
  //   3. delete the source directories
  //   4. rename .consolidate.tmp → seen/epoch=<target>
  //   5. delete the marker
  // Recovery (run at loop start): a marker with the tmp still present redoes
  // 3-5; a marker whose tmp is gone redoes only the source deletes + 5.
  // Before the marker exists nothing was deleted; after step 4 the merged
  // data is live — no crash point loses membership.

  private def consolidateTmp(workDir: String) = new Path(s"$workDir/seen/.consolidate.tmp")
  private def consolidateMarker(workDir: String) = new Path(s"$workDir/seen/.consolidate.json")

  /** Merge all existing seen/epoch=e (e < uptoEpoch) into the highest such
    * directory. No-op with <2 directories. Membership-identical (distinct
    * union); tombstones are untouched (they apply at read). */
  def consolidate(spark: SparkSession, workDir: String, uptoEpoch: Int): Unit = {
    val fsys = fs(spark, workDir)
    val dirs = (0 until uptoEpoch).map(e => (e, s"$workDir/seen/epoch=$e"))
      .filter { case (_, d) => fsys.exists(new Path(d)) }
    if (dirs.size < 2) return
    val target = dirs.map(_._1).max
    val merged = spark.read.parquet(dirs.map(_._2): _*)
      .select(col("url_hash"), col("host_bucket")).distinct()
    merged.write.mode(SaveMode.Overwrite).parquet(consolidateTmp(workDir).toString)
    writeMarker(fsys, workDir, target, dirs.map(_._2))
    finishConsolidation(fsys, workDir, target, dirs.map(_._2))
  }

  /** Crash recovery: finish a half-done consolidation if a marker exists.
    * Safe to call unconditionally (no-op without a marker). */
  def recoverConsolidation(spark: SparkSession, workDir: String): Boolean = {
    val fsys = fs(spark, workDir)
    val mk = consolidateMarker(workDir)
    if (!fsys.exists(mk)) return false
    val in = fsys.open(mk)
    val len = fsys.getFileStatus(mk).getLen.toInt
    val buf = new Array[Byte](len); in.readFully(buf); in.close()
    val body = new String(buf, "UTF-8")
    val target = "\"target\":(\\d+)".r.findFirstMatchIn(body).get.group(1).toInt
    val sources = "\"src\":\\[([^\\]]*)\\]".r.findFirstMatchIn(body).get.group(1)
      .split(',').map(_.trim.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty).toSeq
    finishConsolidation(fsys, workDir, target, sources)
    true
  }

  private def writeMarker(fsys: org.apache.hadoop.fs.FileSystem, workDir: String,
      target: Int, sources: Seq[String]): Unit = {
    val tmp = new Path(consolidateMarker(workDir).toString + ".tmp")
    val out = fsys.create(tmp, true)
    out.write((s"""{"target":$target,"src":[""" +
      sources.map(s => "\"" + s + "\"").mkString(",") + "]}").getBytes("UTF-8"))
    out.close()
    fsys.rename(tmp, consolidateMarker(workDir))
  }

  private def finishConsolidation(fsys: org.apache.hadoop.fs.FileSystem,
      workDir: String, target: Int, sources: Seq[String]): Unit = {
    sources.foreach(d => fsys.delete(new Path(d), true))
    val tmp = consolidateTmp(workDir)
    if (fsys.exists(tmp))
      fsys.rename(tmp, new Path(s"$workDir/seen/epoch=$target"))
    fsys.delete(consolidateMarker(workDir), false)
  }

  private def loadCuckoo(spark: SparkSession, workDir: String): Option[CuckooFilter] = {
    val fsys = fs(spark, workDir)
    val p = cuckooPath(workDir)
    if (!fsys.exists(p)) None
    else {
      val in = fsys.open(p)
      val len = fsys.getFileStatus(p).getLen.toInt
      val buf = new Array[Byte](len)
      in.readFully(buf); in.close()
      Some(CuckooFilter.deserialize(buf))
    }
  }

  private def writeCuckoo(spark: SparkSession, workDir: String, f: CuckooFilter): Unit = {
    val fsys = fs(spark, workDir)
    val tmp = new Path(cuckooPath(workDir).toString + ".tmp")
    val out = fsys.create(tmp, true)
    out.write(f.serialize()); out.close()
    val fin = cuckooPath(workDir)
    if (fsys.exists(fin)) fsys.delete(fin, false)
    fsys.rename(tmp, fin)
  }
}

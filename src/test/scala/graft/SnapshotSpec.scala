package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.crawl.{CrawlConfig, CrawlLoop}
import graft.sources.{SnapshotLog, SnapshotPayloadSink, SnapshotTail}

/** S6 snapshot-table semantics (SURVEY.md §1.3 — the reference archives to
  * an Iceberg table whose snapshot is the crawl-date commit unit; no
  * Iceberg runtime ships in this container, so [[SnapshotLog]] reimplements
  * the metadata layer over the same partitioned parquet). */
class SnapshotSpec extends SparkSpec {

  private def tmp() = Files.createTempDirectory("graft-snap").toString

  /** Write rows (id, host_bucket, crawl_epoch) as one partitioned leaf. */
  private def writeEpoch(root: String, bucket: Int, epoch: Int, ids: Seq[Int]): Unit = {
    import spark.implicits._
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    ids.toDF("id")
      .withColumn("host_bucket", lit(bucket))
      .withColumn("crawl_epoch", lit(epoch))
      .repartition(1)
      .write.mode("overwrite")
      .partitionBy("host_bucket", "crawl_epoch")
      .parquet(root)
  }

  private def log(root: String) =
    new SnapshotLog(root, spark.sparkContext.hadoopConfiguration)

  test("commit per epoch: time travel is cumulative; latest == raw read") {
    val root = tmp()
    val l = log(root)
    writeEpoch(root, 0, 0, 1 to 10)
    val s0 = l.commit("append-epoch-0", Seq("host_bucket=0/crawl_epoch=0"))
    writeEpoch(root, 0, 1, 11 to 25)
    val s1 = l.commit("append-epoch-1", Seq("host_bucket=0/crawl_epoch=1"))
    writeEpoch(root, 1, 2, 26 to 30)
    val s2 = l.commit("append-epoch-2", Seq("host_bucket=1/crawl_epoch=2"))

    assert(l.snapshotIds() === Seq(s0, s1, s2))
    // time travel: each snapshot sees exactly the data committed up to it
    assert(l.read(spark, s0).count() === 10)
    assert(l.read(spark, s1).count() === 25)
    assert(l.read(spark, s2).count() === 30)
    // point-in-time content, not just counts
    assert(l.read(spark, s1).agg(sum("id")).head.getLong(0) === (1 to 25).sum.toLong)
    // partition columns survive the manifest read path
    assert(l.read(spark, s2).filter(col("host_bucket") === 1).count() === 5)
    // latest snapshot ≡ the raw-path read (same files, just listed via metadata)
    assert(l.readLatest(spark).count() === spark.read.parquet(root).count())
    // history() is the metadata table: ascending ids, parent chain, byte sums
    val h = l.history(spark).orderBy("snapshot_id").collect()
    assert(h.map(_.getLong(0)).toSeq === Seq(s0, s1, s2))
    assert(h.map(_.getLong(1)).toSeq === Seq(-1L, s0, s1))
    assert(h.map(_.getLong(3)).toSeq.sliding(2).forall(p => p(0) <= p(1)),
      "n_files must be cumulative under pure appends")
  }

  test("replayed epoch supersedes its own partitions (crash-resume idempotence)") {
    val root = tmp()
    val l = log(root)
    writeEpoch(root, 0, 0, 1 to 10)
    l.commit("append-epoch-0", Seq("host_bucket=0/crawl_epoch=0"))
    // crash-replay: the same epoch rewritten (dynamic overwrite) with a
    // different row set, then re-committed with the same leaf dirs
    writeEpoch(root, 0, 0, 1 to 7)
    val s1 = l.commit("append-epoch-0", Seq("host_bucket=0/crawl_epoch=0"))
    // the new head must carry ONLY the replayed files — no stale entries
    assert(l.read(spark, s1).count() === 7)
    assert(l.readLatest(spark).agg(sum("id")).head.getLong(0) === (1 to 7).sum.toLong)
  }

  test("rollback appends a new head with the old file set; history is append-only") {
    val root = tmp()
    val l = log(root)
    writeEpoch(root, 0, 0, 1 to 10)
    val s0 = l.commit("append-epoch-0", Seq("host_bucket=0/crawl_epoch=0"))
    writeEpoch(root, 0, 1, 11 to 20)
    val s1 = l.commit("append-epoch-1", Seq("host_bucket=0/crawl_epoch=1"))
    val s2 = l.rollback(s0)
    assert(s2 > s1, "rollback must append, not rewrite")
    assert(l.readLatest(spark).count() === 10)
    // the rolled-past snapshot is still readable (history kept)
    assert(l.read(spark, s1).count() === 20)
    assert(l.manifest(s2).op === s"rollback-to-$s0")
  }

  test("expire keeps the tail, deletes dead manifests + unreferenced data files") {
    val root = tmp()
    val l = log(root)
    writeEpoch(root, 0, 0, 1 to 10)
    l.commit("append-epoch-0", Seq("host_bucket=0/crawl_epoch=0"))
    // replay epoch 0 smaller: the first commit's files become dead once
    // the first snapshot expires
    writeEpoch(root, 0, 0, 1 to 4)
    val s1 = l.commit("append-epoch-0", Seq("host_bucket=0/crawl_epoch=0"))
    // an orphan from a simulated crashed write (never committed)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val orphan = new org.apache.hadoop.fs.Path(root, "host_bucket=9/crawl_epoch=9/part-orphan.parquet")
    fs.mkdirs(orphan.getParent)
    val out = fs.create(orphan); out.write(1); out.close()

    val (manifestsDeleted, dataDeleted) = l.expire(keepLast = 1)
    assert(manifestsDeleted === 1)
    assert(dataDeleted >= 1, "the orphan (and any dead replayed file) must be reclaimed")
    assert(!fs.exists(orphan))
    assert(l.snapshotIds() === Seq(s1))
    assert(l.readLatest(spark).count() === 4)
  }

  test("concurrent commits race to distinct ids; both file sets land") {
    val root = tmp()
    writeEpoch(root, 0, 0, 1 to 10)
    writeEpoch(root, 1, 1, 11 to 20)
    val l = log(root)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val fa = Future(l.commit("append-epoch-0", Seq("host_bucket=0/crawl_epoch=0")))
    val fb = Future(l.commit("append-epoch-1", Seq("host_bucket=1/crawl_epoch=1")))
    val (a, b) = (Await.result(fa, 30.seconds), Await.result(fb, 30.seconds))
    assert(a !== b, "the atomic claim step must serialize the ids")
    assert(Set(a, b) === Set(0L, 1L))
    // the later commit carried the earlier one's files: union visible
    assert(l.readLatest(spark).count() === 20)
  }

  test("8-way commit stress: distinct ids, no lost manifests, all file sets land") {
    // regression for the TOCTOU the plain exists+rename claim had on a
    // local FS (POSIX rename silently overwrites: two racers could both
    // "win" one id and a manifest vanished — a parallel-suite flake).
    // link(2)-based claims must hand out 8 DISTINCT ids whose head
    // carries every committer's files.
    val root = tmp()
    (0 until 8).foreach(b => writeEpoch(root, b, b, (b * 100 + 1) to (b * 100 + 5)))
    val l = log(root)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val gate = new java.util.concurrent.CountDownLatch(1)
    val fs = (0 until 8).map { b =>
      Future { gate.await(); l.commit(s"append-epoch-$b", Seq(s"host_bucket=$b/crawl_epoch=$b")) }
    }
    gate.countDown()
    val ids = fs.map(Await.result(_, 60.seconds))
    assert(ids.toSet.size === 8, s"ids must be distinct, got $ids")
    assert(ids.toSet === (0L to 7L).toSet)
    // every manifest file readable (no torn/overwritten losers)
    (0L to 7L).foreach(id => l.manifest(id))
    // the head carries all 8 committers' partitions: nothing lost
    assert(l.readLatest(spark).count() === 40)
    assert(l.readLatest(spark).select("host_bucket").distinct().count() === 8)
  }

  test("mixed append+delete race: serialized ids, final state = replay in landed order") {
    import spark.implicits._
    val root = tmp()
    // pre-write the data for 4 appends (ids never overlapping the keys)
    (0 until 4).foreach(b => writeEpoch(root, b, b, (b * 100 + 1) to (b * 100 + 6)))
    val l = log(root)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val gate = new java.util.concurrent.CountDownLatch(1)
    val delKeys = Seq(Seq(2, 103, 205), Seq(104, 301))
    val appends = (0 until 4).map { b =>
      Future { gate.await()
        (s"append:$b", l.commit(s"append-epoch-$b", Seq(s"host_bucket=$b/crawl_epoch=$b"))) }
    }
    val deletes = delKeys.zipWithIndex.map { case (keys, i) =>
      Future { gate.await()
        (s"delete:$i", l.commitDeletes(spark, keys.toDF("id"))) }
    }
    gate.countDown()
    val landed = (appends ++ deletes).map(Await.result(_, 120.seconds))
    // the claim step serialized all six committers onto distinct ids
    assert(landed.map(_._2).toSet === (0L to 5L).toSet)
    (0L to 5L).foreach(id => l.manifest(id)) // no torn manifests
    // replay the six ops IN LANDED-ID ORDER against the model: a delete
    // applies only to rows inserted by earlier-landed appends
    var model = Vector.empty[(Int, Long)] // (id value, insertSeq)
    landed.sortBy(_._2).foreach { case (op, snapId) =>
      if (op.startsWith("append:")) {
        val b = op.stripPrefix("append:").toInt
        model ++= ((b * 100 + 1) to (b * 100 + 6)).map((_, snapId))
      } else {
        val keys = delKeys(op.stripPrefix("delete:").toInt).toSet
        model = model.filterNot { case (v, seq) => keys.contains(v) && seq < snapId }
      }
    }
    val got = l.readLatest(spark).select("id").as[Int].collect().sorted.toSeq
    assert(got === model.map(_._1).sorted,
      s"head must equal the landed-order replay (${landed.sortBy(_._2)})")
  }

  test("uncommitted data files are invisible to snapshot readers") {
    val root = tmp()
    val l = log(root)
    writeEpoch(root, 0, 0, 1 to 10)
    val s0 = l.commit("append-epoch-0", Seq("host_bucket=0/crawl_epoch=0"))
    // a crashed epoch: data written, commit never reached
    writeEpoch(root, 0, 1, 11 to 30)
    assert(l.currentId() === Some(s0))
    assert(l.readLatest(spark).count() === 10,
      "snapshot readers must not see uncommitted files (raw readers do: " +
        spark.read.parquet(root).count())
  }

  test("changes(from, to) is the incremental append scan: read(from) ∪ changes ≡ read(to)") {
    val root = tmp()
    val l = log(root)
    writeEpoch(root, 0, 0, 1 to 10)
    val s0 = l.commit("append-epoch-0", Seq("host_bucket=0/crawl_epoch=0"))
    writeEpoch(root, 0, 1, 11 to 25)
    val s1 = l.commit("append-epoch-1", Seq("host_bucket=0/crawl_epoch=1"))
    writeEpoch(root, 1, 2, 26 to 30)
    val s2 = l.commit("append-epoch-2", Seq("host_bucket=1/crawl_epoch=2"))

    // changelog between adjacent snapshots is exactly that epoch's rows
    assert(l.changes(spark, s0, s1).agg(sum("id")).head.getLong(0)
      === (11 to 25).sum.toLong)
    // spanning two commits: both epochs' appends, nothing from before
    val span = l.changes(spark, s0, s2)
    assert(span.count() === 20)
    assert(span.agg(min("id")).head.getInt(0) === 11)
    // incremental-consumer identity: read(from) ∪ changes(from,to) ≡ read(to)
    val rebuilt = l.read(spark, s0).unionByName(span)
    assert(rebuilt.count() === l.read(spark, s2).count())
    assert(rebuilt.agg(sum("id")).head.getLong(0)
      === l.read(spark, s2).agg(sum("id")).head.getLong(0))
    // degenerate: no new commits -> empty changelog with the table schema
    assert(l.changes(spark, s2, s2).count() === 0)
    assert(l.changes(spark, s2, s2).columns === l.read(spark, s2).columns)
  }

  test("changes() refuses a REPLAYED epoch in the range (op says append, files were replaced)") {
    val root = tmp()
    val l = log(root)
    writeEpoch(root, 0, 0, 1 to 10)
    val s0 = l.commit("append-epoch-0", Seq("host_bucket=0/crawl_epoch=0"))
    // crash-resume replays epoch 0: dynamic overwrite rewrites the leaf
    // under NEW file names and commits another "append-epoch-0" — the op
    // check alone would pass and silently double-deliver the epoch
    writeEpoch(root, 0, 0, 1 to 10)
    val s0b = l.commit("append-epoch-0", Seq("host_bucket=0/crawl_epoch=0"))
    val e = intercept[IllegalStateException] { l.changes(spark, s0, s0b) }
    assert(e.getMessage.contains("replaced"))
    // a consumer that re-bases (full read) still sees exactly one copy
    assert(l.read(spark, s0b).count() === 10)
  }

  test("an empty snapshot with a recorded schema reads back as a typed empty frame") {
    import org.apache.spark.sql.types._
    val root = tmp()
    val l = log(root)
    val st = StructType(Seq(StructField("id", IntegerType),
      StructField("host_bucket", IntegerType),
      StructField("crawl_epoch", IntegerType)))
    // epoch 0 rejected everything: zero data files anywhere under root
    val s0 = l.commit("append-epoch-0", Seq.empty, schema = Some(st))
    val df = l.read(spark, s0)
    assert(df.count() === 0)
    assert(df.schema.fieldNames.toSeq === Seq("id", "host_bucket", "crawl_epoch"))
    // schema-less + file-less stays an ERROR, but a self-describing one
    val l2 = log(tmp())
    val s = l2.commit("append-epoch-0", Seq.empty)
    val e = intercept[IllegalStateException] { l2.read(spark, s) }
    assert(e.getMessage.contains("records no schema"))
  }

  test("SnapshotTail: bootstrap + incremental polls sum to the table; crash before ack replays; rewrite surfaces as re-base") {
    val root = tmp()
    val l = log(root)
    val tail = new SnapshotTail(l, s"$root/_consumer", spark.sparkContext.hadoopConfiguration)
    // empty log: nothing to poll
    assert(tail.poll(spark).isEmpty)

    writeEpoch(root, 0, 0, 1 to 10)
    l.commit("append-epoch-0", Seq("host_bucket=0/crawl_epoch=0"))
    // bootstrap: full table at head
    val (boot, bootId) = tail.poll(spark).get
    assert(boot.count() === 10)
    // crash BEFORE ack: the same delta replays
    assert(tail.poll(spark).get._1.count() === 10)
    tail.ack(bootId)
    assert(tail.poll(spark).isEmpty, "caught up after ack")

    // two appends land; one poll delivers BOTH epochs' rows, nothing old
    writeEpoch(root, 0, 1, 11 to 25)
    l.commit("append-epoch-1", Seq("host_bucket=0/crawl_epoch=1"))
    writeEpoch(root, 1, 2, 26 to 30)
    val s2 = l.commit("append-epoch-2", Seq("host_bucket=1/crawl_epoch=2"))
    val (delta, deltaId) = tail.poll(spark).get
    assert(deltaId === s2)
    assert(delta.count() === 20)
    assert(delta.agg(min("id")).head.getInt(0) === 11)
    tail.ack(deltaId)

    // consumer identity: bootstrap + deltas ≡ the table
    assert(10 + 20 === l.readLatest(spark).count())

    // a rewrite in the un-consumed range surfaces loudly; consumer
    // re-bases (full read + ack head), then resumes incremental.
    // (two files in the epoch-3 leaf so the rewrite has work to do)
    {
      import spark.implicits._
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      (31 to 34).toDF("id")
        .withColumn("host_bucket", lit(0)).withColumn("crawl_epoch", lit(3))
        .repartition(2)
        .write.mode("overwrite").partitionBy("host_bucket", "crawl_epoch")
        .parquet(root)
    }
    l.commit("append-epoch-3", Seq("host_bucket=0/crawl_epoch=3"))
    val rw = l.rewriteSmallFiles(spark, smallBytes = 1 << 20, targetBytes = 1 << 20)
    assert(rw._1 >= 1, "rewrite must have compacted the 2-file epoch-3 leaf")
    intercept[IllegalStateException] { tail.poll(spark).map(_._1.count()) }
    val head = l.currentId().get
    assert(l.read(spark, head).count() === 34)
    tail.ack(head) // re-base
    assert(tail.poll(spark).isEmpty)
    // incremental resumes cleanly past the rewrite
    writeEpoch(root, 1, 4, 35 to 40)
    val s5 = l.commit("append-epoch-4", Seq("host_bucket=1/crawl_epoch=4"))
    val (d2, id2) = tail.poll(spark).get
    assert(id2 === s5 && d2.count() === 6)
  }

  test("equality deletes: merge-on-read hides keys, time travel keeps them, re-inserts survive") {
    import spark.implicits._
    val root = tmp()
    val l = log(root)
    writeEpoch(root, 0, 0, 1 to 10)
    val s0 = l.commit("append-epoch-0", Seq("host_bucket=0/crawl_epoch=0"))

    // DELETE FROM t WHERE id IN (3, 7) — keys stay a distributed frame
    val sDel = l.commitDeletes(spark, Seq(3, 7).toDF("id"))
    assert(l.readLatest(spark).count() === 8)
    assert(l.readLatest(spark).select("id").as[Int].collect().toSet
      === ((1 to 10).toSet -- Set(3, 7)))
    // time travel BEFORE the delete still sees the rows
    assert(l.read(spark, s0).count() === 10)
    // history surfaces the carried delete entry
    val h = l.history(spark).orderBy("snapshot_id").collect()
    assert(h.head.getLong(5) === 0L)
    assert(h.last.getLong(5) >= 1L, "delete snapshot must carry delete entries")
    assert(l.manifest(sDel).op === "delete")

    // sequence-number rule: a RE-INSERT of a deleted key after the
    // delete is NOT hidden (the delete only applies to older files)
    writeEpoch(root, 0, 1, Seq(3, 11))
    l.commit("append-epoch-1", Seq("host_bucket=0/crawl_epoch=1"))
    val afterReinsert = l.readLatest(spark).select("id").as[Int].collect().toSeq
    assert(afterReinsert.count(_ == 3) === 1, "re-inserted key must survive")
    assert(afterReinsert.toSet === Set(1, 2, 4, 5, 6, 8, 9, 10, 3, 11))

    // a second delete hits BOTH old and previously-re-inserted rows
    l.commitDeletes(spark, Seq(5, 3).toDF("id"))
    assert(l.readLatest(spark).select("id").as[Int].collect().toSet
      === Set(1, 2, 4, 6, 8, 9, 10, 11))

    // incremental scans refuse a range containing a delete (non-append)
    intercept[IllegalStateException] { l.changes(spark, s0, l.currentId().get) }
  }

  test("materializeDeletes rewrites affected files and restores a pure-scan head") {
    import spark.implicits._
    val root = tmp()
    val l = log(root)
    writeEpoch(root, 0, 0, 1 to 10)
    writeEpoch(root, 1, 1, 11 to 20)
    l.commit("append-epoch-0", Seq("host_bucket=0/crawl_epoch=0"))
    l.commit("append-epoch-1", Seq("host_bucket=1/crawl_epoch=1"))
    l.commitDeletes(spark, Seq(2, 13, 19).toDF("id"))
    val preMat = l.currentId().get
    val expected = ((1 to 20).toSet -- Set(2, 13, 19))
    assert(l.readLatest(spark).select("id").as[Int].collect().toSet === expected)
    // merge-on-read head has the anti-join in the plan
    assert(l.readLatest(spark).queryExecution.executedPlan.toString
      .contains("LeftAnti"), "pre-materialize read must merge-on-read")

    val (parts, delsDropped) = l.materializeDeletes(spark)
    assert(parts === 2, "both affected leaves rewritten")
    assert(delsDropped >= 1, "the delete commit's entries must be dropped")
    // same rows, but the head is delete-free and the plan a pure scan
    assert(l.readLatest(spark).select("id").as[Int].collect().toSet === expected)
    assert(!l.manifest(l.currentId().get).files.exists(_.isDelete))
    assert(!l.readLatest(spark).queryExecution.executedPlan.toString
      .contains("LeftAnti"), "post-materialize read must be a pure scan")
    assert(l.manifest(l.currentId().get).op === "rewrite-materialize-deletes")

    // time travel: the pre-materialize snapshot still merges-on-read
    assert(l.read(spark, preMat).select("id").as[Int].collect().toSet === expected)
    // and the pre-delete snapshot still sees everything
    assert(l.read(spark, 1L).count() === 20)

    // appends continue cleanly on the materialized head; expire reclaims
    // superseded data AND delete files, and the head still reads right
    writeEpoch(root, 0, 2, 21 to 23)
    l.commit("append-epoch-2", Seq("host_bucket=0/crawl_epoch=2"))
    val (_, reclaimed) = l.expire(keepLast = 1)
    assert(reclaimed > 0, "old data + delete key files must be reclaimed")
    assert(l.readLatest(spark).select("id").as[Int].collect().toSet
      === (expected ++ Set(21, 22, 23)))
  }

  test("schema evolution: add-column backfills null on old files; time travel reads old schema; non-additive refuses") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val root = tmp()
    val l = log(root)
    writeEpoch(root, 0, 0, 1 to 10)
    val s0 = l.commit("append-epoch-0", Seq("host_bucket=0/crawl_epoch=0"))
    // record the v1 schema (as written on disk, incl. partition columns)
    val v1 = spark.read.parquet(root).schema
    l.evolveSchema(v1)
    assert(l.readLatest(spark).schema === v1)

    // ADD COLUMN score double — metadata-only commit
    val v2 = StructType(v1.fields :+ StructField("score", DoubleType, nullable = true))
    val sEvo = l.evolveSchema(v2)
    assert(l.manifest(sEvo).op === "set-schema")
    // head now reads the new schema; old files backfill null
    val afterEvo = l.readLatest(spark)
    assert(afterEvo.schema.fieldNames.contains("score"))
    assert(afterEvo.filter(col("score").isNull).count() === 10)
    // time travel BEFORE the evolution reads the old schema
    assert(!l.read(spark, s0).schema.fieldNames.contains("score"))

    // new data carries the column; subsequent commits inherit the schema
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    (11 to 15).toDF("id").withColumn("score", col("id") * 0.5)
      .withColumn("host_bucket", lit(0)).withColumn("crawl_epoch", lit(1))
      .repartition(1)
      .write.mode("overwrite").partitionBy("host_bucket", "crawl_epoch")
      .parquet(root)
    val s1 = l.commit("append-epoch-1", Seq("host_bucket=0/crawl_epoch=1"))
    val mixed = l.readLatest(spark)
    assert(mixed.count() === 15)
    assert(mixed.filter(col("score").isNotNull).count() === 5)
    assert(mixed.agg(sum("score")).head.getDouble(0) === (11 to 15).map(_ * 0.5).sum)

    // incremental scan passes through the metadata-only commit and reads
    // the delta under the evolved schema
    val delta = l.changes(spark, s0, s1)
    assert(delta.count() === 5 && delta.schema.fieldNames.contains("score"))

    // deletes compose with evolution: keys on the original column
    l.commitDeletes(spark, Seq(12).toDF("id"))
    assert(l.readLatest(spark).count() === 14)

    // non-additive changes refuse loudly
    intercept[IllegalArgumentException] {
      l.evolveSchema(StructType(v2.fields.filterNot(_.name == "id")))
    }
    intercept[IllegalArgumentException] {
      l.evolveSchema(StructType(v2.fields.map(f =>
        if (f.name == "score") f.copy(dataType = StringType) else f)))
    }
  }

  test("rewriteSmallFiles preserves sequence numbers: deletes keep applying to compacted content") {
    import spark.implicits._
    val root = tmp()
    val l = log(root)
    // two small files in one leaf (repartition(2)) committed together
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    (1 to 8).toDF("id")
      .withColumn("host_bucket", lit(0)).withColumn("crawl_epoch", lit(0))
      .repartition(2)
      .write.mode("overwrite").partitionBy("host_bucket", "crawl_epoch")
      .parquet(root)
    l.commit("append-epoch-0", Seq("host_bucket=0/crawl_epoch=0"))
    l.commitDeletes(spark, Seq(4).toDF("id"))
    // re-insert 4 AFTER the delete, then compact the epoch-0 leaf
    writeEpoch(root, 0, 1, Seq(4))
    l.commit("append-epoch-1", Seq("host_bucket=0/crawl_epoch=1"))
    val (nParts, _, _) = l.rewriteSmallFiles(spark, smallBytes = 1 << 20, targetBytes = 1 << 20)
    assert(nParts >= 1, "epoch-0's two small files must compact")
    // the delete still hides old 4 (compacted file kept seq 0) and the
    // re-inserted 4 (seq 2 > delete seq 1) still shows: exactly one 4
    val ids = l.readLatest(spark).select("id").as[Int].collect().toSeq
    assert(ids.count(_ == 4) === 1, s"must keep exactly the re-inserted 4, got $ids")
    assert(ids.toSet === Set(1, 2, 3, 4, 5, 6, 7, 8))
  }

  test("rewriteSmallFiles compacts per partition under a new snapshot; time travel + expire intact") {
    val root = tmp()
    val l = log(root)
    import spark.implicits._
    // 4 tiny files in bucket 0 (written one by one → 4 separate commits'
    // worth of small files in ONE partition), 1 file in bucket 1
    (1 to 4).foreach { k =>
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      ((k * 10) until (k * 10 + 5)).toDF("id")
        .withColumn("host_bucket", lit(0)).withColumn("crawl_epoch", lit(k))
        .repartition(2) // 2 files per write → 8 small files total
        .write.mode("overwrite").partitionBy("host_bucket", "crawl_epoch")
        .parquet(root)
      l.commit(s"append-epoch-$k", Seq(s"host_bucket=0/crawl_epoch=$k"))
    }
    val before = l.manifest(l.currentId().get)
    val filesBefore = before.files.size
    val sumBefore = l.readLatest(spark).agg(sum("id")).head.getLong(0)
    val preRewriteHead = before.id

    val (parts, nOld, nNew) = l.rewriteSmallFiles(spark,
      smallBytes = 1 << 20, targetBytes = 1 << 20)
    assert(parts === 4, "each epoch partition had 2 small files")
    assert(nNew < nOld, s"compaction must shrink the file count ($nOld -> $nNew)")
    // same rows, fewer files, new snapshot
    assert(l.manifest(l.currentId().get).op === "rewrite-small-files")
    assert(l.readLatest(spark).agg(sum("id")).head.getLong(0) === sumBefore)
    assert(l.manifest(l.currentId().get).files.size
      === filesBefore - nOld + nNew)
    // partition columns still resolve through the compacted files
    assert(l.readLatest(spark).filter(col("crawl_epoch") === 2).count() === 5)
    // time travel: the PRE-rewrite snapshot still reads the old files
    assert(l.read(spark, preRewriteHead).agg(sum("id")).head.getLong(0) === sumBefore)
    // incremental reads refuse to span the rewrite (append-only contract)
    intercept[IllegalStateException] {
      l.changes(spark, preRewriteHead - 1, l.currentId().get)
    }
    // expire reclaims the superseded small files; the compacted head reads
    val (_, dataDeleted) = l.expire(keepLast = 1)
    assert(dataDeleted >= nOld, "expire must reclaim the rewritten-away files")
    assert(l.readLatest(spark).agg(sum("id")).head.getLong(0) === sumBefore)
    // idempotence: nothing left to compact
    assert(l.rewriteSmallFiles(spark, 1 << 20, 1 << 20) === ((0, 0, 0)))
  }

  test("SnapshotPayloadSink: one snapshot per crawl epoch; latest ≡ raw payload") {
    val wd = tmp()
    val cfg = CrawlConfig(workDir = wd, totalUrls = 900, epochs = 3,
      numHosts = 12, buckets = 4, budgetPerHost = 40, seed = 7L)
    CrawlLoop.run(spark, cfg, store = new SnapshotPayloadSink(cfg.buckets))
    val l = new SnapshotPayloadSink(cfg.buckets).log(wd, spark)
    val ids = l.snapshotIds()
    assert(ids.size === cfg.epochs, "exactly one snapshot per epoch")
    val raw = spark.read.parquet(s"$wd/payload")
    assert(l.readLatest(spark).count() === raw.count())
    // per-snapshot reads are cumulative in epoch order
    val counts = ids.map(l.read(spark, _).count())
    assert(counts.sliding(2).forall(p => p(0) <= p(1)))
    assert(counts.last === raw.count())
    // snapshot k sees exactly epochs 0..k (the crawl-date commit unit)
    ids.zipWithIndex.foreach { case (id, k) =>
      val maxEpoch = l.read(spark, id).agg(max("crawl_epoch")).head.getInt(0)
      assert(maxEpoch === k)
    }
  }

  test("tail-driven incremental indexer over per-epoch crawl commits equals the full-table index") {
    val wd = tmp()
    val cfg = CrawlConfig(workDir = wd, totalUrls = 900, epochs = 3,
      numHosts = 12, buckets = 4, budgetPerHost = 40, seed = 7L)
    val sink = new SnapshotPayloadSink(cfg.buckets)
    val l = sink.log(wd, spark)
    val tail = new SnapshotTail(l, s"$wd/_indexer",
      spark.sparkContext.hadoopConfiguration)
    // a downstream indexer on the loop's cadence (ST2): one epoch per
    // tick, then one poll — each delta is read from EXACTLY the files
    // that epoch's snapshot appended, never the table
    val index = scala.collection.mutable.Map.empty[(String, String), Long]
      .withDefaultValue(0L)
    var polls = 0
    (0 until cfg.epochs).foreach { _ =>
      CrawlLoop.run(spark, cfg, stopAfter = 1, store = sink)
      tail.poll(spark).foreach { case (delta, headId) =>
        polls += 1
        delta.groupBy(col("fmt"), col("status")).agg(count(lit(1)).as("n"))
          .collect()
          .foreach(r => index((r.getString(0), r.getString(1))) += r.getLong(2))
        tail.ack(headId)
      }
    }
    assert(polls === cfg.epochs, "one delta per epoch commit")
    assert(tail.poll(spark).isEmpty, "caught up after the last epoch")
    // the incrementally-built index ≡ the full-table rollup
    val full = l.readLatest(spark).groupBy(col("fmt"), col("status"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(index.toMap === full,
      "tail-fed incremental index diverged from the full table")
  }

  test("PayloadDeletes: deleteById/deleteByQuery over a real crawl; vacuum purges physically") {
    import graft.sources.PayloadDeletes
    val wd = tmp()
    val cfg = CrawlConfig(workDir = wd, totalUrls = 900, epochs = 2,
      numHosts = 12, buckets = 4, budgetPerHost = 40, seed = 7L)
    CrawlLoop.run(spark, cfg, store = new SnapshotPayloadSink(cfg.buckets))
    val l = new SnapshotPayloadSink(cfg.buckets).log(wd, spark)
    val before = PayloadDeletes.readLatest(spark, wd)
    val total = before.count()
    val preHead = l.currentId().get

    // deleteById: pick 5 stored document ids (ordered — the frame is
    // re-evaluated inside commitDeletes and must pick the same rows)
    val victims = before.select("image_id").distinct()
      .orderBy("image_id").limit(5)
    val victimIds = victims.collect().map(_.getString(0)).toSet
    PayloadDeletes.deleteByIds(spark, wd, victims)
    val afterById = PayloadDeletes.readLatest(spark, wd)
    assert(afterById.filter(col("image_id").isin(victimIds.toSeq: _*)).count() === 0)
    assert(afterById.count() === total -
      before.filter(col("image_id").isin(victimIds.toSeq: _*)).count())
    // time travel to the pre-delete head still sees them
    assert(l.read(spark, preHead).count() === total)

    // deleteByQuery: purge one whole host (takedown shape)
    val host = before.filter(!col("image_id").isin(victimIds.toSeq: _*))
      .select("host").head.getString(0)
    PayloadDeletes.deleteHost(spark, wd, host)
    val afterHost = PayloadDeletes.readLatest(spark, wd)
    assert(afterHost.filter(col("host") === host).count() === 0)
    val expectRows = afterHost.count()
    assert(expectRows < total - victimIds.size + 1)

    // vacuum: materialize + expire — rows identical, files physically gone
    val ((parts, delsDropped), (manifests, reclaimed)) =
      PayloadDeletes.vacuum(spark, wd, keepLast = 1)
    assert(parts > 0 && delsDropped > 0 && manifests > 0 && reclaimed > 0)
    val afterVacuum = PayloadDeletes.readLatest(spark, wd)
    assert(afterVacuum.count() === expectRows)
    assert(afterVacuum.filter(col("host") === host
      || col("image_id").isin(victimIds.toSeq: _*)).count() === 0)
    // head is a pure scan again (no merge-on-read join)
    assert(!afterVacuum.queryExecution.executedPlan.toString.contains("LeftAnti"))
    // the raw parquet path converges after vacuum: purged files reclaimed
    assert(spark.read.parquet(s"$wd/payload").count() === expectRows)
  }
}

package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.SnapshotLog
import scala.collection.mutable
import scala.util.Random

/** Model-based randomized property for the S6 snapshot table: seeded
  * random operation sequences — append / equality delete / bin-pack
  * rewrite / materialize / rollback — applied in lockstep to
  * [[SnapshotLog]] and to an in-memory reference model of rows carrying
  * their insert sequence numbers. After EVERY committed snapshot the
  * engine's head read must equal the model's visible multiset, and at
  * the end every snapshot in the history must time-travel to exactly
  * the row multiset the model recorded when that snapshot was the head.
  * This is the composition coverage the per-feature tests can't give:
  * deletes over rolled-back heads, rewrites between delete and
  * materialize, re-inserts racing compactions, etc. */
class SnapshotModelSpec extends SparkSpec {

  /** A model row remembers the snapshot that inserted it — the engine's
    * sequence-number rule (deletes apply only to strictly-older rows)
    * replicated in two lines of Scala. */
  private case class ModelRow(id: Int, insertSeq: Long)

  private def runSeq(seed: Long, ops: Int): Unit = {
    import spark.implicits._
    val root = Files.createTempDirectory(s"graft-snap-model-$seed").toString
    val l = new SnapshotLog(root, spark.sparkContext.hadoopConfiguration)
    val rnd = new Random(seed)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    var rows = Vector.empty[ModelRow]
    // snapshot id -> the model's full row state when that id was head
    val history = mutable.Map.empty[Long, Vector[ModelRow]]
    var epoch = 0

    def visible: Seq[Int] = rows.map(_.id).sorted
    def engineIds(id: Long): Seq[Int] =
      l.read(spark, id).select("id").as[Int].collect().sorted.toSeq
    def record(): Unit = history(l.currentId().get) = rows

    (0 until ops).foreach { i =>
      rnd.nextInt(10) match {
        case 0 | 1 | 2 | 3 => // append a fresh (bucket, epoch) leaf
          val bucket = rnd.nextInt(3)
          val ids = Seq.fill(1 + rnd.nextInt(6))(1 + rnd.nextInt(60))
          ids.toDF("id").withColumn("host_bucket", lit(bucket))
            .withColumn("crawl_epoch", lit(epoch))
            // sometimes two files, so bin-pack rewrites have fodder
            .repartition(1 + rnd.nextInt(2))
            .write.mode("overwrite").partitionBy("host_bucket", "crawl_epoch")
            .parquet(root)
          val s = l.commit(s"append-$epoch",
            Seq(s"host_bucket=$bucket/crawl_epoch=$epoch"))
          rows ++= ids.map(ModelRow(_, s))
          epoch += 1
          record()
        case 4 | 5 => // equality delete by random keys
          if (l.currentId().isDefined) {
            val keys = Seq.fill(1 + rnd.nextInt(4))(1 + rnd.nextInt(60)).distinct
            val s = l.commitDeletes(spark, keys.toDF("id"))
            rows = rows.filterNot(r => keys.contains(r.id) && r.insertSeq < s)
            record()
          }
        case 6 => // bin-pack rewrite: content-neutral
          if (l.currentId().isDefined) {
            val (parts, _, _) = l.rewriteSmallFiles(spark, 1 << 20, 1 << 20)
            if (parts > 0) record()
          }
        case 7 => // materialize deletes: content-neutral
          if (l.currentId().isDefined) {
            val (p, d) = l.materializeDeletes(spark)
            if (p > 0 || d > 0) record()
          }
        case 8 => // rollback to a random earlier snapshot
          val ids = l.snapshotIds()
          if (ids.size > 1) {
            val target = ids(rnd.nextInt(ids.size))
            l.rollback(target)
            rows = history(target)
            record()
          }
        case 9 => () // idle tick: head invariant still checked below
      }
      l.currentId().foreach { h =>
        assert(engineIds(h) === visible,
          s"seed=$seed op=$i: head read diverged from the model")
      }
    }

    // every snapshot ever headed must time-travel to its recorded state
    history.toSeq.sortBy(_._1).foreach { case (sid, state) =>
      assert(engineIds(sid) === state.map(_.id).sorted,
        s"seed=$seed: time travel to snapshot $sid diverged from the model")
    }
  }

  test("model property: random append/delete/rewrite/materialize/rollback sequences match the reference model") {
    Seq(11L, 42L, 77L).foreach(runSeq(_, 30))
  }
}

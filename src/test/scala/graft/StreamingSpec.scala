package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import graft.streaming.EventStreams

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("streaming windowed counts (AvailableNow) ≡ batch run over the same files") {
    // file stream source needs a directory — stage the events file into one
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${sf("sf0.001")}/events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val streamed = EventStreams.runWindowedOverDirectory(spark, dir, "win_test")
      .select($"win_start", $"event_type", $"n")
      .as[(java.sql.Timestamp, String, Long)].collect().sortBy(t => (t._1.getTime, t._2))
    // append mode emits only windows finalized below the watermark
    // (wm = max_ts − 1h); restrict the batch reference identically
    val maxTs = spark.read.parquet(dir)
      .agg(max($"ts".cast("timestamp"))).head().getTimestamp(0).getTime
    val wm = maxTs - 3600 * 1000L
    val batch = EventStreams.windowedCounts(spark.read.parquet(dir))
      .select($"win_start", $"event_type", $"n")
      .as[(java.sql.Timestamp, String, Long)].collect()
      .filter(t => t._1.getTime + 3600 * 1000L <= wm)
      .sortBy(t => (t._1.getTime, t._2))
    assert(streamed.nonEmpty)
    assert(streamed.toSeq == batch.toSeq)
  }

  test("streaming URL-seen dedup: first occurrence passes, re-presentations suppressed across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val deduped = EventStreams.streamingSeenDedup(
      input.toDS().toDF("url_hash", "url"))
    val q = deduped.writeStream
      .outputMode(OutputMode.Append)
      .format("memory").queryName("seen_dedup_test")
      .start()
    try {
      input.addData((1L, "a"), (2L, "b"), (1L, "a")) // intra-batch dup
      q.processAllAvailable()
      val batch1 = spark.table("seen_dedup_test")
        .select($"url_hash").as[Long].collect().sorted
      assert(batch1.toSeq == Seq(1L, 2L))
      input.addData((1L, "a"), (3L, "c")) // cross-batch re-presentation
      q.processAllAvailable()
      val all = spark.table("seen_dedup_test")
        .select($"url_hash").as[Long].collect().sorted
      assert(all.toSeq == Seq(1L, 2L, 3L), "url 1 must stay suppressed by streaming state")
    } finally q.stop()
  }

  test("gap sessionization stream ≡ batch q55 minus each user's open tail session") {
    // the real events file as an AvailableNow stream: every session CLOSED
    // by a later event must equal the batch rollup; each user's final
    // session stays open in the state store and is correctly NOT emitted
    val dir = java.nio.file.Files.createTempDirectory("graft-sess").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${sf("sf0.001")}/events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
      .select($"event_id", $"ts".cast("timestamp").as("ts"), $"user_id",
        $"event_type", $"value")
      .as[EventStreams.Event]
    val q = EventStreams.gapSessionize(stream).writeStream
      .outputMode(OutputMode.Append)
      .format("memory").queryName("gap_sessions_test")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("gap_sessions_test")
      .select($"user_id", $"session_seq", $"n_events", $"start_us",
        $"end_us", $"duration_us", $"n_purchases")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSet
    def us(t: java.time.LocalDateTime): Long =
      t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + t.getNano / 1000
    val batch = SparkEntry.queries("q55_sessionize")(spark, sf("sf0.001"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        us(r.getAs[java.time.LocalDateTime](3)),
        us(r.getAs[java.time.LocalDateTime](4)), r.getLong(5), r.getLong(6)))
    val lastSeq = batch.groupBy(_._1).map { case (u, ss) => u -> ss.map(_._2).max }
    val expect = batch.filterNot(s => lastSeq(s._1) == s._2).toSet
    assert(streamed == expect)
    assert(streamed.nonEmpty, "fixture must close at least one session")
  }

  test("gap sessionization closes sessions ACROSS micro-batches (state survives the trigger)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.Event]
    val q = EventStreams.gapSessionize(input.toDS(), gapUs = 1000000L).writeStream
      .outputMode(OutputMode.Append)
      .format("memory").queryName("gap_xbatch_test")
      .start()
    try {
      val t0 = 1700000000000L
      input.addData(
        EventStreams.Event(1, new java.sql.Timestamp(t0), 10L, "view", 1.0),
        EventStreams.Event(2, new java.sql.Timestamp(t0 + 500), 10L, "purchase", 2.0))
      q.processAllAvailable()
      assert(spark.table("gap_xbatch_test").count() == 0, "session still open")
      // batch 2: 10 s later — closes the session carried in state
      input.addData(
        EventStreams.Event(3, new java.sql.Timestamp(t0 + 10000), 10L, "view", 3.0))
      q.processAllAvailable()
      val rows = spark.table("gap_xbatch_test")
        .select($"user_id", $"session_seq", $"n_events", $"duration_us", $"n_purchases")
        .as[(Long, Long, Long, Long, Long)].collect()
      assert(rows.toSeq == Seq((10L, 1L, 2L, 500000L, 1L)))
    } finally q.stop()
  }

  test("sessionize with mapGroupsWithState over a rate-limited stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.Event]
    val sessions = EventStreams.sessionize(input.toDS())
    val q = sessions.writeStream
      .outputMode(OutputMode.Update)
      .format("memory").queryName("sessions_test")
      .start()
    try {
      val t0 = new java.sql.Timestamp(1700000000000L)
      input.addData(
        EventStreams.Event(1, t0, 10L, "view", 1.0),
        EventStreams.Event(2, t0, 10L, "click", 2.0),
        EventStreams.Event(3, t0, 20L, "view", 3.0))
      q.processAllAvailable()
      val snap = spark.table("sessions_test")
        .groupBy($"user_id").agg(max($"n_events").as("n"))
        .as[(Long, Long)].collect().toMap
      assert(snap(10L) == 2 && snap(20L) == 1)
      input.addData(EventStreams.Event(4, t0, 10L, "purchase", 4.0))
      q.processAllAvailable()
      val snap2 = spark.table("sessions_test")
        .groupBy($"user_id").agg(max($"n_events").as("n"))
        .as[(Long, Long)].collect().toMap
      assert(snap2(10L) == 3)
    } finally q.stop()
  }

  test("streaming sharded Misra–Gries: MG bound holds per shard across batches; heavy grams survive; tokenizer ≡ batch q56") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val corpus = spark.read.parquet(s"${sf("sf0.001")}/documents.parquet")
      .select($"text").as[String].collect()
    // inject a known heavy trigram so the heavy-hitter branch is exercised
    val texts = corpus ++ Array.fill(300)("zqx wvu tsr")
    val k = 63; val nShards = 4
    val input = MemoryStream[String]
    val q = EventStreams.streamingHeavyHitters(input.toDS(), k, nShards)
      .writeStream.outputMode(OutputMode.Update)
      .format("memory").queryName("mg_test").start()
    try {
      val (h1, h2) = texts.splitAt(texts.length / 2)
      input.addData(h1.toSeq); q.processAllAvailable()
      input.addData(h2.toSeq); q.processAllAvailable()
      val rows = spark.table("mg_test").as[EventStreams.MgCandidates].collect()
      val finalCands: Map[Int, Map[String, Long]] =
        rows.groupBy(_.shard).map { case (s, rs) =>
          val vmax = rs.map(_.version).max
          s -> rs.filter(_.version == vmax).map(r => r.g -> r.mg_count).toMap
        }
      // ground truth per shard with the same tokenizer
      val counts = scala.collection.mutable.HashMap.empty[String, Long]
      texts.foreach(t => EventStreams.trigrams(t)
        .foreach(g => counts(g) = counts.getOrElse(g, 0L) + 1L))
      val byShard = counts.toSeq
        .groupBy { case (g, _) => math.floorMod(g.hashCode, nShards) }
      byShard.foreach { case (s, cs) =>
        val nS = cs.map(_._2).sum
        val err = nS / (k + 1)
        val cand = finalCands.getOrElse(s, Map.empty)
        cs.foreach { case (g, c) =>
          if (c > err)
            assert(cand.contains(g), s"shard $s misses heavy gram '$g' ($c > $err)")
          cand.get(g).foreach { mg =>
            assert(mg <= c && mg >= c - err, s"'$g' mg=$mg true=$c err=$err") }
        }
        // no phantom candidates: every sketch entry is a real shard gram
        val real = cs.map(_._1).toSet
        cand.keys.foreach(g => assert(real.contains(g)))
      }
      // the injected gram is a true heavy hitter and must be a candidate
      assert(counts("zqx wvu tsr") == 300L)
      assert(finalCands.values.exists(_.contains("zqx wvu tsr")))
      // tokenizer equivalence with the batch twin: q56's n_total over the
      // SAME corpus equals the driver-side trigram count sans injection
      val nBatch = graft.SparkEntry.queries("q56_heavy_hitters")(spark, sf("sf0.001"))
        .select($"n_total").as[Long].head()
      val nLocal = corpus.iterator.map(t => EventStreams.trigrams(t).size.toLong).sum
      assert(nBatch == nLocal, s"tokenizer divergence: batch=$nBatch local=$nLocal")
    } finally q.stop()
  }

  test("streaming rate-spike monitor ≡ batch q67 on the same hours split across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import java.sql.Timestamp
    val base = java.time.LocalDateTime.of(2026, 1, 1, 0, 0)
    def hTs(h: Int): Timestamp = Timestamp.valueOf(base.plusHours(h.toLong))
    // engineered hourly counts over a 60-hour grid exercising every branch:
    //  A: constant 2/h (zero-variance windows) with a 60-event spike at h40,
    //     then real-variance z's while the spike sits in the trailing ring
    //  B: n = h%5 — natural zero hours (grid fill) and nonzero variance
    //  C: active only h10..h30 — leading zeros from gridStart, silent tail
    def counts(typ: String, h: Int): Long = typ match {
      case "A" => if (h == 40) 60L else 2L
      case "B" => (h % 5).toLong
      case "C" => if (h >= 10 && h <= 30) 1L + h % 3 else 0L
    }
    val events = for {
      typ <- Seq("A", "B", "C"); h <- 0 until 60
      i <- 0L until counts(typ, h)
    } yield (typ, Timestamp.valueOf(base.plusHours(h.toLong).plusMinutes(i)))
    val tmp = java.nio.file.Files.createTempDirectory("q67stream").toString
    events.toDF("event_type", "ts").write.parquet(s"$tmp/events.parquet")
    val expect = SparkEntry.queries("q67_rate_anomaly")(spark, tmp)
      .as[(String, Timestamp, Long, Option[Long], Boolean)].collect().toSet
    // stream run: nonzero hourly count rows only (gaps are the point),
    // split at h35, plus an n=0 closing tick for C's silent tail
    val rows = for {
      typ <- Seq("A", "B", "C"); h <- 0 until 60
      n = counts(typ, h) if n > 0
    } yield (typ, hTs(h), n)
    val (b1, b2) = rows.partition(_._2.getTime <= hTs(35).getTime)
    val input = MemoryStream[(String, Timestamp, Long)]
    val verdicts = EventStreams.streamingRateAnomaly(input.toDS(), hTs(0))
    val q = verdicts.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("rate_anom_test").start()
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2 :+ (("C", hTs(59), 0L)): _*); q.processAllAvailable()
      val got = spark.table("rate_anom_test")
        .as[(String, Timestamp, Long, Option[Long], Boolean)].collect().toSet
      assert(expect.nonEmpty && got == expect,
        s"stream≠batch: missing=${expect -- got} extra=${got -- expect}")
      // the engineered spike is caught via the zero-variance any-arrival rule
      assert(got.contains(("A", hTs(40), 60L, None, true)))
      // and real-variance z's exist once the spike enters the trailing ring
      assert(got.exists(r => r._1 == "A" && r._4.isDefined))
    } finally q.stop()
  }

  test("streaming CMS ≡ a single-pass build on the same hashes split across micro-batches; never underestimates") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.expressions.CmsAggregator
    implicit val sqlCtx = spark.sqlContext
    val d = 4; val w = 1024
    val rows = spark.read.parquet(s"${sf("sf0.001")}/documents.parquet")
      .select($"source",
        explode(graft.expressions.GraftFunctions.wordNgramHashSeq($"text", 1)).as("h"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val probes = rows.map(_._2).distinct.sorted.take(10).toSeq
    // ground truth: single-pass per-source build + exact counts
    val expect = rows.groupBy(_._1).map { case (src, xs) =>
      val cells = new Array[Long](d * w)
      xs.foreach(x => (0 until d).foreach(r =>
        cells(r * w + CmsAggregator.bucket(x._2, r, w)) += 1))
      (src, probes.map(h =>
        (h, (0 until d).map(r => cells(r * w + CmsAggregator.bucket(h, r, w))).min)).toMap)
    }
    val exact = rows.groupBy(_._1).map { case (src, xs) =>
      (src, xs.groupBy(_._2).view.mapValues(_.length.toLong).toMap)
    }
    val batches = rows.grouped(math.max(1, rows.length / 3 + 1)).toSeq
    val input = MemoryStream[(String, Long)]
    val updates = EventStreams.streamingCmsFreq(input.toDS(), probes, d, w)
    val q = updates.writeStream.outputMode(OutputMode.Update)
      .format("memory").queryName("cms_test").start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      val got = spark.table("cms_test")
        .as[(String, Long, Long, Long)].collect()
        .groupBy(_._1).map { case (s, us) =>
          val v = us.map(_._2).max
          (s, us.filter(_._2 == v).map(r => (r._3, r._4)).toMap)
        }
      assert(got == expect, s"stream≠single-pass: ${got.keySet} vs ${expect.keySet}")
      got.foreach { case (src, ests) => ests.foreach { case (h, e) =>
        assert(e >= exact(src).getOrElse(h, 0L), s"$src/$h underestimated")
      }}
    } finally q.stop()
  }

  test("streaming funnel ≡ batch q82 on the same events fed as time-ordered micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    // RAW stream incl. signup/error rows: the twin's own filter must
    // keep them out of the state store (base parity with batch q82)
    val rows = spark.read.parquet(s"${sf("sf0.001")}/events.parquet")
      .select($"user_id", $"ts", $"event_type")
      .collect()
      .map(r => (r.getLong(0), tsMicros(r.getAs[Any](1)), r.getString(2)))
      .sortBy(r => (r._2, r._3)) // global time order -> per-user in-order
    val b = SparkEntry.queries("q82_funnel")(spark, sf("sf0.001")).collect()(0)
    val expect = (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
    val batches = rows.grouped(math.max(1, rows.length / 3 + 1)).toSeq
    val input = MemoryStream[(Long, Long, String)]
    val updates = EventStreams.streamingFunnel(input.toDS())
    val q = updates.writeStream.outputMode(OutputMode.Update)
      .format("memory").queryName("funnel_test").start()
    try {
      batches.foreach { bt => input.addData(bt: _*); q.processAllAvailable() }
      val fin = spark.table("funnel_test")
        .as[(Long, Int, Long)].collect()
        .groupBy(_._1).map { case (_, us) => us.maxBy(_._3)._2 }.toSeq
      val got = (fin.size.toLong, fin.count(_ >= 1).toLong,
        fin.count(_ >= 2).toLong, fin.count(_ >= 3).toLong)
      assert(got == expect, s"stream≠batch: $got vs $expect")
    } finally q.stop()
    // engineered gating fixture ACROSS batches (the corpus converts
    // fully, so the strict-order guards need their own drive): u2's
    // click precedes its view; u3's purchase shares the click's exact
    // ts; the view/click and the gated tail arrive in separate batches
    val in2 = MemoryStream[(Long, Long, String)]
    val up2 = EventStreams.streamingFunnel(in2.toDS())
    val q2 = up2.writeStream.outputMode(OutputMode.Update)
      .format("memory").queryName("funnel_eng_test").start()
    try {
      in2.addData((1L, 1000000L, "view"), (2L, 1000000L, "click"),
        (3L, 1000000L, "view"), (4L, 1000000L, "error"))
      q2.processAllAvailable()
      in2.addData((1L, 2000000L, "click"), (2L, 2000000L, "view"),
        (3L, 2000000L, "click"), (3L, 2000000L, "purchase"))
      q2.processAllAvailable()
      in2.addData((1L, 3000000L, "purchase"))
      q2.processAllAvailable()
      val st = spark.table("funnel_eng_test").as[(Long, Int, Long)].collect()
        .groupBy(_._1).map { case (u, us) => (u, us.maxBy(_._3)._2) }
      assert(st == Map(1L -> 3, 2L -> 1, 3L -> 2),
        s"gating fixture stages: $st (u4 must be absent, u3's same-ts purchase gated)")
    } finally q2.stop()
  }

  test("streaming KMV distinct ≡ batch q72 on the same hashes split across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val rows = spark.read.parquet(s"${sf("sf0.001")}/documents.parquet")
      .select($"source",
        explode(graft.expressions.GraftFunctions.wordNgramHashes($"text", 1)).as("h"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expect = SparkEntry.queries("q72_kmv_distinct")(spark, sf("sf0.001"))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    val batches = rows.grouped(math.max(1, rows.length / 3 + 1)).toSeq
    val input = MemoryStream[(String, Long)]
    val updates = EventStreams.streamingKmvDistinct(input.toDS())
    val q = updates.writeStream.outputMode(OutputMode.Update)
      .format("memory").queryName("kmv_test").start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      // current value per source = the max-version row (MG convention)
      val got = spark.table("kmv_test")
        .as[(String, Long, Long, Long)].collect()
        .groupBy(_._1).map { case (s, us) =>
          val last = us.maxBy(_._2); (s, (last._3, last._4))
        }
      assert(got == expect, s"stream≠batch: $got vs $expect")
    } finally q.stop()
  }

  test("streaming incremental dedup ≡ batch q63 on the same rows split across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    // engineered ids with REAL bucket assignments (the ReadsideSpec q63
    // fixture), so batch q63 over the whole corpus is the ground truth
    val buckets = spark.range(1, 2001)
      .select($"id", pmod(xxhash64($"id"), lit(100)).as("b"))
      .as[(Long, Long)].collect()
    val histIds = buckets.filter(_._2 < 90).map(_._1).take(2)
    val incIds = buckets.filter(_._2 >= 90).map(_._1).sorted.take(5)
    val histDocs = Seq((histIds(0), "alpha text"), (histIds(1), "beta text"))
    val batch1 = Seq((incIds(0), "alpha text"), (incIds(1), "gamma text"))
    val batch2 = Seq((incIds(2), "gamma text"), // cross-batch dup_incoming
      (incIds(3), "delta text"), (incIds(4), "alpha text"))
    // batch ground truth: q63 over the union written as a documents table
    val tmp = java.nio.file.Files.createTempDirectory("q63stream").toString
    (histDocs ++ batch1 ++ batch2).toDF("doc_id", "text")
      .write.parquet(s"$tmp/documents.parquet")
    val expect = SparkEntry.queries("q63_incremental_dedup")(spark, tmp)
      .as[(Long, String)].collect().toMap
    // streaming run: history fps static, incoming as two micro-batches
    val fp = (df: org.apache.spark.sql.DataFrame) => df.select($"doc_id",
      xxhash64($"text").as("h1__"), md5($"text").as("h2__"))
    val histFps = fp(histDocs.toDF("doc_id", "text")).select($"h1__", $"h2__")
    val input = MemoryStream[(Long, String)]
    val verdicts = EventStreams.streamingIncrementalDedup(
      fp(input.toDS().toDF("doc_id", "text")), histFps)
    val q = verdicts.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("inc_dedup_test").start()
    try {
      input.addData(batch1: _*); q.processAllAvailable()
      input.addData(batch2: _*); q.processAllAvailable()
      val got = spark.table("inc_dedup_test")
        .as[(Long, String)].collect().toMap
      assert(got == expect, s"stream verdicts $got != batch $expect")
      assert(got(incIds(2)) == "dup_incoming",
        "the cross-batch duplicate must be caught by surviving state")
    } finally q.stop()
  }
}

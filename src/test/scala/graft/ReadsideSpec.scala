package graft

import org.apache.spark.sql.functions._

/** Sanity + determinism properties for the read-side query surface.
  * (Value-exactness against DuckDB is the driver's gate; replicated
  * locally by tools/oracle_check.py.) */
class ReadsideSpec extends SparkSpec {
  import spark.implicits._

  private val dir = sf("sf0.001")

  test("every registered query runs and is non-empty at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, dir).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("entry() (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("results are deterministic across repeated runs (no now()/rand())") {
    for (name <- Seq("q07_topk", "q23_quality", "q28_knn_brute", "q27_minhash_lsh")) {
      val a = SparkEntry.queries(name)(spark, dir).collect().map(_.toString).toSeq
      val b = SparkEntry.queries(name)(spark, dir).collect().map(_.toString).toSeq
      assert(a == b, s"$name nondeterministic")
    }
  }

  test("q24 exact dedup: keep_id is the min doc_id and copies sum to row count") {
    val total = spark.read.parquet(s"$dir/documents.parquet").count()
    val ded = SparkEntry.queries("q24_dedup_exact")(spark, dir)
    assert(ded.agg(sum("n_copies")).as[Long].head() == total)
  }

  test("q26 pigeonhole blocking is COMPLETE: equals the brute-force hamming≤3 pair set") {
    val sh = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id",
        graft.expressions.GraftFunctions.simhash64($"text").as("sh"))
      .as[(Long, Long)].collect()
    val brute = (for {
      i <- sh.indices
      j <- (i + 1) until sh.length
      if java.lang.Long.bitCount(sh(i)._2 ^ sh(j)._2) <= 3
    } yield (math.min(sh(i)._1, sh(j)._1), math.max(sh(i)._1, sh(j)._1))).toSet
    val got = SparkEntry.queries("q26_simhash_blocks")(spark, dir)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == brute,
      s"blocking incomplete/unsound: missing=${(brute -- got).take(3)} extra=${(got -- brute).take(3)}")
  }

  test("q42 contamination equals the brute-force n-gram-overlap check") {
    // independent oracle: plain Scala string 4-grams with the same
    // normalization as ExprOps.wordNgramHashes (lowercase, \s+-split,
    // <4 tokens -> whole text as the single gram)
    def grams(text: String): Set[String] = {
      val t = text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
      if (t.length < 4) Set(t.mkString(" "))
      else t.sliding(4).map(_.mkString(" ")).toSet
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val bench = docs.filter(_._1 % 17 == 3).flatMap(d => grams(d._2)).toSet
    val expect = docs.filter(_._1 % 17 != 3)
      .map { case (id, tx) => (id, grams(tx).count(bench.contains).toLong) }
      .filter(_._2 > 0).toMap
    val got = SparkEntry.queries("q42_contamination")(spark, dir)
      .as[(Long, Long)].collect().toMap
    assert(got == expect,
      s"mismatch: missing=${(expect.keySet -- got.keySet).take(3)} " +
        s"extra=${(got.keySet -- expect.keySet).take(3)}")
  }

  test("q43 stratified sample: every stratum represented with ceil(n_g/7) rows") {
    val perSource = spark.read.parquet(s"$dir/documents.parquet")
      .groupBy($"source").count().as[(String, Long)].collect().toMap
    val got = SparkEntry.queries("q43_stratified_sample")(spark, dir)
      .groupBy($"source").count().as[(String, Long)].collect().toMap
    assert(got.keySet == perSource.keySet, "a stratum is missing from the sample")
    perSource.foreach { case (src, n) =>
      val want = (n + 6) / 7 // ceil(n/7): ranks 1, 8, 15, ...
      assert(got(src) == want, s"stratum $src: got ${got(src)}, want $want of $n")
    }
  }

  test("q27 EQUALS a driver-side LSH reimplementation (signatures, bands, exact jaccard)") {
    // full plain-Scala reimplementation of the pipeline: FNV shingle
    // hashing (the shared ExprOps kernel), Spark-exact XXH64 tail paths
    // reimplemented LOCALLY (validated against Spark's xxhash64 on
    // boundary longs), signed-min signatures, 4×4 band collisions,
    // exact set jaccard with the integer threshold — the same math the
    // DuckDB oracle generates as SQL, derived independently here.
    val P1 = 0x9E3779B185EBCA87L; val P2 = 0xC2B2AE3D27D4EB4FL
    val P3 = 0x165667B19E3779F9L; val P4 = 0x85EBCA77C2B2AE63L
    val P5 = 0x27D4EB2F165667C5L
    def fmix(h0: Long): Long = {
      var h = h0
      h ^= h >>> 33; h *= P2; h ^= h >>> 29; h *= P3; h ^= h >>> 32
      h
    }
    def xxhLong(l: Long, seed: Long): Long = {
      var h = seed + P5 + 8
      h ^= java.lang.Long.rotateLeft(l * P2, 31) * P1
      h = java.lang.Long.rotateLeft(h, 27) * P1 + P4
      fmix(h)
    }
    def xxhInt(i: Int, seed: Long): Long = {
      var h = seed + P5 + 4
      h ^= (i & 0xffffffffL) * P1
      h = java.lang.Long.rotateLeft(h, 23) * P2 + P3
      fmix(h)
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    def shingles(t: String): Set[Long] = {
      import org.apache.spark.unsafe.types.UTF8String
      val arr = graft.expressions.ExprOps
        .shingleHashes(UTF8String.fromString(t), 5)
      (0 until arr.numElements()).map(arr.getLong).toSet
    }
    val raw = docs.filter(_._2 != null).map { case (id, t) => id -> shingles(t) }
    val dfc = scala.collection.mutable.Map.empty[Long, Int]
    raw.foreach(_._2.foreach(sg => dfc(sg) = dfc.getOrElse(sg, 0) + 1))
    val n = docs.length
    val stop = dfc.collect { case (sg, d) if d > n / 2 => sg }.toSet
    val sets = raw.map { case (id, ss) => id -> (ss -- stop) }
      .filter(_._2.nonEmpty).sortBy(_._1)
    val sigs = sets.map { case (id, ss) =>
      id -> Array.tabulate(16)(i => ss.iterator.map(h => xxhInt(i, xxhLong(h, 42L))).min)
    }.toMap
    val setMap = sets.toMap
    val brute = (for {
      i <- sets.indices.iterator
      j <- ((i + 1) until sets.length).iterator
      ida = sets(i)._1; idb = sets(j)._1
      if (0 until 4).exists(b =>
        (0 until 4).forall(r => sigs(ida)(b * 4 + r) == sigs(idb)(b * 4 + r)))
      sa = setMap(ida); sb = setMap(idb)
      inter = (sa & sb).size.toLong
      union = sa.size + sb.size - inter
      if 100 * inter >= 35 * union
    } yield ((ida, idb), inter * 10000 / union)).toMap
    val got = SparkEntry.queries("q27_minhash_lsh")(spark, dir)
      .select($"id_a", $"id_b", $"jaccard_x1e4")
      .as[(Long, Long, Long)].collect()
      .map { case (a, b, v) => (a, b) -> v }.toMap
    assert(got == brute,
      s"missing=${(brute.keySet -- got.keySet).take(3)} " +
        s"extra=${(got.keySet -- brute.keySet).take(3)} " +
        s"valueDiff=${brute.collect { case (k, v) if got.get(k).exists(_ != v) => k }.take(3)}")
    assert(brute.nonEmpty, "fixture must contain at least one near-dup pair")
  }

  test("q28 brute-force knn: query vector itself ranks first with cos 1.0") {
    val top = SparkEntry.queries("q28_knn_brute")(spark, dir).collect()
    assert(top.head.getLong(0) == 7L)
    assert(math.abs(top.head.getDouble(1) - 1.0) < 1e-9)
  }

  test("q38 IVF ANN: finds the query vector itself; recall@10 vs exact brute force >= 0.6") {
    val ivf = SparkEntry.queries("q38_ivf_ann")(spark, dir)
      .select("vec_id").as[Long].collect()
    assert(ivf.head == 7L, "own vector must rank first")
    val exact = SparkEntry.queries("q28_knn_brute")(spark, dir)
      .select("vec_id").as[Long].collect().toSet
    assert(ivf.toSet.intersect(exact).size >= 6,
      s"recall too low: ${ivf.toSet.intersect(exact).size}/10")
  }

  test("q38 IVF at honest nprobe=K/8: recall@10 >= 0.8 on a clustered fixture") {
    // real corpora are clustered — that is WHAT MAKES nprobe << K work.
    // Deterministic fixture: 20 well-separated ±1 centers in 16 dims,
    // 2000 points = center + small hash noise; exact top-10 by driver
    // brute force (2000×16 is trivial); the q38 engine probes only K/8
    // of its ~45 inverted lists and must still find >= 8 of 10.
    import graft.expressions.ExprOps
    val dims = 16; val clusters = 20; val nPts = 2000
    def center(c: Int): Array[Float] = Array.tabulate(dims)(j =>
      if ((ExprOps.mix(c.toLong * 31 + j) & 1L) == 0L) 1f else -1f)
    def point(i: Int): Array[Float] = {
      val ce = center(i % clusters)
      Array.tabulate(dims)(j => ce(j) + 0.2f *
        (ExprOps.mix(i.toLong * 127 + j) % 1000L) / 1000f)
    }
    val fixture = (0 until nPts).map(i => (i.toLong, point(i))).toDF("vec_id", "embedding")
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (j <- 0 until dims) { d += a(j) * b(j); na += a(j) * a(j); nb += b(j) * b(j) }
      d / math.sqrt(na * nb)
    }
    val q = point(7)
    val exact = (0 until nPts).map(i => (i.toLong, cos(point(i), q)))
      .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSet
    val got = graft.readside.Queries
      .ivfAnnOver(spark, fixture, 7L, k => math.max(1, k / 8))
      .select("vec_id").as[Long].collect().toSet
    val recall = exact.intersect(got).size
    assert(recall >= 8, s"recall@10 = $recall/10 at nprobe=K/8")
  }

  test("q45 head/tail vocabulary split equals the plain single-join form") {
    // the broadcast-head + shuffle-tail decomposition is pure execution
    // strategy: row-for-row it must equal the naive token→count join.
    val norm = trim(regexp_replace(lower(col("text")), "\\s+", " "))
    val tok = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), explode(split(norm, " ")).as("w"))
      .filter(col("w") =!= "")
    val cnt = tok.groupBy(col("w")).agg(count(lit(1)).as("c"))
    val naive = tok.join(cnt, Seq("w"))
      .crossJoin(cnt.agg(sum(col("c")).as("t")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("bigint").as("n_toks"),
        floor(-avg(log(col("c") / col("t"))) * 10000 + 0.5)
          .cast("bigint").as("xent_e4"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val split45 = SparkEntry.queries("q45_unigram_xent")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(split45 == naive)
  }

  test("q52 DSIR weights equal a driver-side bag-of-features reimplementation") {
    // independent local reimplementation straight from the published
    // formula (string features, no hashing, no Zipf split): add-1
    // smoothed target/raw LMs over uni+bigram bags, avg log ratio.
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    def grams(text: String): Seq[String] = {
      val t = text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSeq
      t ++ t.zip(t.drop(1)).map { case (a, b) => s"$a $b" }
    }
    val bags = docs.map { case (id, tx) => (id, id % 17 == 3, grams(tx)) }
    val ct = new scala.collection.mutable.HashMap[String, Long]()
    val cr = new scala.collection.mutable.HashMap[String, Long]()
    bags.foreach { case (_, tgt, gs) =>
      val m = if (tgt) ct else cr
      gs.foreach(g => m.update(g, m.getOrElse(g, 0L) + 1L))
    }
    val vocab = (ct.keySet ++ cr.keySet)
    val (tT, tR, v) = (ct.values.sum.toDouble, cr.values.sum.toDouble,
      vocab.size.toDouble)
    val expect = bags.filterNot(_._2).filter(_._3.nonEmpty).map { case (id, _, gs) =>
      val lamSum = gs.map { g =>
        math.log((ct.getOrElse(g, 0L) + 1) / (tT + v)) -
          math.log((cr.getOrElse(g, 0L) + 1) / (tR + v))
      }.sum
      (id, gs.size.toLong,
        math.floor(lamSum / gs.size * 10000 + 0.5).toLong)
    }.toSet
    val got = SparkEntry.queries("q52_dsir_selection")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect)
  }

  test("q53 host-rank equals a driver-side fixed-point PageRank; mass is conserved") {
    // independent local reimplementation: same edge derivation, same
    // ×10¹² fixed-point power iteration with per-edge floor division
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select($"user_id", $"event_id").as[(Long, Long)].collect()
    val edges = ev.map { case (u, e) => (u % 101, (e * 31 + 7) % 101) }
      .filter { case (s0, d0) => s0 != d0 }
      .groupBy(identity).map { case ((s0, d0), xs) => (s0, d0, xs.length.toLong) }
      .toSeq
    val wsrc = edges.groupBy(_._1).map { case (s0, es) => (s0, es.map(_._3).sum) }
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.length.toLong
    val total = 1000000000000L
    val base = total * 15L / (100L * n)
    var rank = nodes.map(_ -> total / n).toMap
    for (_ <- 1 to 10) {
      val contrib = new scala.collection.mutable.HashMap[Long, Long]()
      edges.foreach { case (s0, d0, w) =>
        val t = rank(s0) * 85L / 100L * w / wsrc(s0)
        contrib.update(d0, contrib.getOrElse(d0, 0L) + t)
      }
      val dmass = nodes.filterNot(wsrc.contains).map(rank(_) * 85L / 100L).sum
      val spread = dmass / n
      rank = nodes.map(nd => nd -> (base + spread + contrib.getOrElse(nd, 0L))).toMap
    }
    val expect = nodes.map(nd =>
      (nd, wsrc.getOrElse(nd, 0L), rank(nd))).toSet
    val got = SparkEntry.queries("q53_host_rank")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect)
    // rank mass stays within the floor-loss bound: each of the 10 rounds
    // loses < (#edges + #nodes + 2) units to truncation, never gains
    val mass = rank.values.sum
    assert(mass <= total && mass >= total - 10L * (edges.size + n + 2) * 100L)
  }

  test("q54 as-of join equals the naive range-join + rank reimplementation") {
    // independent path: real range join (theta) + row_number, the shape
    // the engine deliberately avoids — must produce identical rows,
    // including purchases with NO exposure at-or-before them (null row)
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val probes = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id".as("uid"), $"ts")
    val builds = ev.filter($"event_type".isin("click", "view"))
      .select($"event_id", $"event_type", $"user_id".as("uid"), $"ts")
    val ranked = probes.alias("p").join(builds.alias("b"),
        col("b.uid") === col("p.uid") && col("b.ts") <= col("p.ts"))
      .select(col("p.purchase_id"), col("b.event_id"), col("b.event_type"),
        col("b.ts"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"purchase_id")
          .orderBy($"ts".desc, $"event_id".desc)))
      .filter($"rn" === 1)
      .select($"purchase_id", $"event_id".as("expo_event_id"),
        $"event_type".as("expo_type"), $"ts".as("expo_ts"))
    val naive = probes
      .select($"purchase_id", $"uid", $"ts".as("purchase_ts"))
      .join(ranked, Seq("purchase_id"), "left")
    val got = SparkEntry.queries("q54_asof_join")(spark, dir)
      .collect().map(_.toSeq).toSet
    val expect = naive.collect().map(_.toSeq).toSet
    assert(got == expect)
    // both branches are actually exercised: matched probes exist AND the
    // row count is exactly the probe count (left semantics, no fan-out)
    assert(got.size.toLong == probes.count())
    assert(got.exists(_(3) != null))
  }

  test("q55 sessionization equals a driver-side gap-split reimplementation") {
    val gapUs = 86400000000L
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select($"user_id", $"event_id", $"event_type", $"ts")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getAs[java.time.LocalDateTime](3)))
    def micros(t: java.time.LocalDateTime): Long =
      t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + t.getNano / 1000
    val expect = ev.groupBy(_._1).flatMap { case (uid, rows) =>
      val ordered = rows.sortBy(r => (micros(r._4), r._2))
      var seq = 0L
      var prevUs = Long.MinValue
      val tagged = ordered.map { r =>
        val us = micros(r._4)
        if (prevUs == Long.MinValue || us - prevUs > gapUs) seq += 1
        prevUs = us
        (seq, r, us)
      }
      tagged.groupBy(_._1).map { case (sseq, srs) =>
        val uss = srs.map(_._3)
        (uid, sseq, srs.length.toLong,
          srs.map(_._2._4).min, srs.map(_._2._4).max,
          uss.max - uss.min,
          srs.count(_._2._3 == "purchase").toLong)
      }
    }.toSet
    val got = SparkEntry.queries("q55_sessionize")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getAs[java.time.LocalDateTime](3), r.getAs[java.time.LocalDateTime](4),
        r.getLong(5), r.getLong(6)))
      .toSet
    assert(got == expect)
    // sessions actually merge events (not one session per event) and
    // split (not one session per user) at this threshold on this data
    assert(got.size > ev.map(_._1).distinct.length)
    assert(got.size < ev.length)
  }

  test("q56 heavy hitters equals the brute-force groupBy at phi=4096 and under forced eviction (phi=8)") {
    // brute force: the full trigram hash-agg + threshold, no sketch
    def brute(phi: Int): Set[(String, Long, Long)] = {
      val norm = trim(regexp_replace(lower(col("text")), "\\s+", " "))
      val toks = filter(split(norm, " "), x => x =!= "")
      val nTri = greatest(size(col("t")) - 2, lit(0))
      val tri = zip_with(
        slice(col("t"), lit(1), nTri),
        zip_with(slice(col("t"), lit(2), nTri), slice(col("t"), lit(3), nTri),
          (a, b) => concat(a, lit(" "), b)),
        (a, b) => concat(a, lit(" "), b))
      val g = spark.read.parquet(s"$dir/documents.parquet")
        .select(toks.as("t")).select(explode(tri).as("g"))
      val n = g.count()
      g.groupBy(col("g")).agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") * phi > n)
        .collect().map(r => (r.getString(0), r.getLong(1), n)).toSet
    }
    val gated = SparkEntry.queries("q56_heavy_hitters")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(gated == brute(4096))
    // phi=8 → k=7 counters against thousands of distinct trigrams per
    // partition: the MG decrement-all eviction runs constantly, yet the
    // merged candidate set must stay complete and the confirm pass exact
    val evicted = graft.readside.Queries.heavyHitters(spark, dir, 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(evicted == brute(8))
  }

  test("q56 above the broadcast cap: shuffle-confirm fallback returns the identical result") {
    val viaBroadcast = SparkEntry.queries("q56_heavy_hitters")(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    spark.conf.set("graft.hh.broadcastCap", "1") // force the fallback
    try {
      val viaShuffle = SparkEntry.queries("q56_heavy_hitters")(spark, dir)
        .collect().map(_.toString).sorted.toSeq
      assert(viaShuffle == viaBroadcast)
    } finally spark.conf.unset("graft.hh.broadcastCap")
  }

  test("q57 group quantiles equal a driver-side sorted-rank reimplementation") {
    val rows = spark.read.parquet(s"$dir/documents.parquet")
      .select($"source", $"doc_id", $"n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = rows.groupBy(_._1).map { case (src, rs) =>
      val sorted = rs.sortBy(r => (r._3, r._2)).map(_._3)
      val n = sorted.length.toLong
      def at(num: Long, den: Long): Long =
        sorted(((num * n + den - 1) / den - 1).toInt) // rank is 1-based
      (src, n, sorted.min, at(1, 2), at(9, 10), at(99, 100), sorted.max)
    }.toSet
    val got = SparkEntry.queries("q57_group_quantiles")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(got == expect)
  }

  test("q58 bottom-k sample: selection is the global bottom-64 and is subset-consistent") {
    val all = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", xxhash64($"doc_id").as("h"))
      .collect().map(r => (r.getLong(1), r.getLong(0)))
    val expect = all.sorted.take(64).map { case (h, id) => (id, h) }.toSet
    val got = SparkEntry.queries("q58_bottomk_sample")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expect)
    // consistency (the property rand()/TABLESAMPLE lacks): the sample of
    // any SUBSET contains every full-sample row that subset retains
    val sub = spark.read.parquet(s"$dir/documents.parquet")
      .filter($"doc_id" % 2 === 0)
      .select($"doc_id", xxhash64($"doc_id").as("h64"))
      .orderBy($"h64", $"doc_id").limit(64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val kept = got.filter(_._1 % 2 == 0)
    assert(kept.subsetOf(sub), "bottom-k must be consistent under subsetting")
  }

  test("q59 holdout split: covers every doc, ~90/5/5, and is stable under corpus subsetting") {
    val got = SparkEntry.queries("q59_holdout_split")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val total = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(got.length.toLong == total)
    got.foreach { case (_, b, s) =>
      val expect = if (b < 90) "train" else if (b < 95) "valid" else "test"
      assert(s == expect && b >= 0 && b < 100)
    }
    val frac = got.count(_._3 == "train").toDouble / got.length
    assert(frac > 0.80 && frac < 0.97, s"train fraction $frac implausible for 90%")
    // subset stability: the same doc gets the same split when the corpus
    // shrinks (the property a rand()-based split lacks)
    val sub = spark.read.parquet(s"$dir/documents.parquet")
      .filter($"doc_id" % 3 === 0)
      .select($"doc_id", pmod(xxhash64($"doc_id"), lit(100)).as("bucket"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    got.filter(_._1 % 3 == 0).foreach { case (id, b, _) =>
      assert(sub(id) == b, s"doc $id migrated buckets under subsetting")
    }
  }

  test("q56 confirm pass broadcasts the candidate set (never shuffles the corpus stream to the join)") {
    val plan = SparkEntry.queries("q56_heavy_hitters")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast confirm join:\n$plan")
  }

  test("q46 inline-tf BM25 equals an exploded-token-stream reimplementation") {
    val terms = Seq("spark", "window", "vector")
    val norm = trim(regexp_replace(lower(col("text")), "\\s+", " "))
    val tok = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), explode(split(norm, " ")).as("w"))
      .filter(col("w") =!= "")
    val doclen = tok.groupBy(col("doc_id")).agg(count(lit(1)).cast("double").as("dl"))
    val glob = doclen.agg(count(lit(1)).cast("double").as("n"), avg(col("dl")).as("avgdl"))
    val tf = tok.filter(col("w").isin(terms: _*))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).cast("double").as("f"))
    val df_ = tf.groupBy(col("w")).agg(count(lit(1)).cast("double").as("df"))
    val naive = tf.join(doclen, Seq("doc_id")).join(broadcast(df_), Seq("w"))
      .crossJoin(broadcast(glob))
      .withColumn("contrib",
        log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1) * (col("f") * 2.2) /
          (col("f") + lit(1.2) * (lit(1) - 0.75 + lit(0.75) * col("dl") / col("avgdl"))))
      .groupBy(col("doc_id"))
      .agg(floor(sum(col("contrib")) * 10000 + 0.5).cast("bigint").as("bm25_e4"))
      .orderBy(col("bm25_e4").desc, col("doc_id")).limit(20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val inline = SparkEntry.queries("q46_bm25_search")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(inline == naive)
  }

  test("q47 two-phase bucketed prefix sum equals the single-window naive form") {
    import org.apache.spark.sql.expressions.{Window => W}
    val norm = trim(regexp_replace(lower(col("text")), "\\s+", " "))
    val naive = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        size(array_remove(split(norm, " "), "")).cast("bigint").as("n_tok"))
      .filter(col("n_tok") > 0)
      .withColumn("start_tok", coalesce(sum(col("n_tok")).over(
        W.orderBy(col("doc_id")).rowsBetween(W.unboundedPreceding, -1)), lit(0L)))
      .select(col("doc_id"), col("n_tok"), col("start_tok"),
        expr("start_tok DIV 512").as("first_seq"),
        expr("(start_tok + n_tok - 1) DIV 512").as("last_seq"))
      .withColumn("n_seqs", col("last_seq") - col("first_seq") + 1)
      .collect().map(_.toString).toSet
    val twoPhase = SparkEntry.queries("q47_sequence_packing")(spark, dir)
      .collect().map(_.toString).toSet
    assert(twoPhase == naive)
    // bucket-count invariance: the public entry sizes buckets from the
    // session's parallelism, so a different Verify/driver/cluster core
    // count must not change a single row (prefix sums are associative)
    for (nb <- Seq(1L, 3L, 1000L)) {
      val alt = graft.readside.Queries.q47WithBuckets(spark, dir, nb)
        .collect().map(_.toString).toSet
      assert(alt == naive, s"nb=$nb diverged")
    }
  }

  test("q48 chunk dedup equals a driver-side brute-force reimplementation") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
    val seen = scala.collection.mutable.Set[String]()
    val expected = docs.flatMap { case (id, text) =>
      val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      if (toks.isEmpty) None else {
        val chunks = toks.grouped(16).map(_.mkString(" ")).toVector
        val kept = chunks.filter(c => seen.add(c))
        Some((id, chunks.size.toLong, kept.size.toLong, kept.mkString(" ")))
      }
    }.toSet
    val got = SparkEntry.queries("q48_chunk_dedup")(spark, dir)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(got == expected)
  }

  test("q49 temperature mix: integer-exact quotas; per-source selected = min(quota, n_g)") {
    val counts = spark.read.parquet(s"$dir/documents.parquet")
      .groupBy("source").count().as[(String, Long)].collect().toMap
    val wg = counts.map { case (src, n) =>
      src -> math.floor(math.sqrt(n.toDouble)).toLong }
    val wsum = wg.values.sum
    val quota = wg.map { case (src, w) => src -> (100L * w) / wsum }
    val out = SparkEntry.queries("q49_temperature_mix")(spark, dir).collect()
    val bySource = out.groupBy(_.getString(1))
    for ((src, n) <- counts) {
      val sel = bySource.get(src).map(_.length.toLong).getOrElse(0L)
      assert(sel == math.min(quota(src), n), s"source=$src")
      bySource.getOrElse(src, Array()).foreach { r =>
        assert(r.getLong(3) == quota(src), s"quota mismatch for $src")
        assert(r.getLong(2) <= quota(src), s"rank past quota for $src")
      }
    }
  }

  test("q50 equals a driver-side reimplementation of the full assembly pipeline") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "source", "text").as[(Long, String, String)]
      .collect().sortBy(_._1)
    def toks(t: String): Array[String] =
      t.toLowerCase.split("\\s+").filter(_.nonEmpty)
    // stage A: length floor + repetition gate (top-bigram rule)
    val base = docs.flatMap { case (id, src, text) =>
      val tk = toks(text)
      if (tk.length < 16) None
      else {
        val maxbg = tk.sliding(2).map(_.mkString(" ")).toSeq
          .groupBy(identity).values.map(_.size).max
        if (maxbg * 10 < tk.length) Some((id, src, text, tk.length.toLong))
        else None
      }
    }
    // stage B: exact dedup on the raw text, first occurrence wins
    val seen = scala.collection.mutable.Set[String]()
    val surv = base.filter { case (_, _, text, _) => seen.add(text) }
      .map { case (id, src, _, n) => (id, src, n) }
    // stage C: temperature quotas + Lehmer-scramble selection
    val wg = surv.groupBy(_._2).map { case (s2, xs) =>
      s2 -> math.floor(math.sqrt(xs.length.toDouble)).toLong }
    val wsum = wg.values.sum
    val quota = wg.map { case (s2, w) => s2 -> (200L * w) / wsum }
    val sel = surv.groupBy(_._2).toSeq.flatMap { case (s2, xs) =>
      xs.sortBy(x => ((x._1 * 48271) % 65537, x._1)).take(quota(s2).toInt)
    }.sortBy(_._1)
    // stage D: exclusive prefix sum + 256-token sequence cuts
    var cum = 0L
    val expected = sel.map { case (id, src, n) =>
      val start = cum; cum += n
      (id, src, n, start, start / 256, (start + n - 1) / 256)
    }.toSet
    val got = SparkEntry.queries("q50_training_assembly")(spark, dir)
      .as[(Long, String, Long, Long, Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("q41 LSH edge feed: exact precision, pinned recall vs q29, labels ≡ union-find") {
    import graft.readside.Queries
    // precision is exact by construction (every candidate is confirmed by
    // exact cosine ≥ 0.4): confirmed LSH edges must be a subset of q29
    val edges = Queries.lshNearDupEdges(spark, dir)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val exact = SparkEntry.queries("q29_cosine_near_dup")(spark, dir)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(edges.subsetOf(exact), "LSH-confirmed edge outside the exact ≥0.4 set")
    // recall is DETERMINISTIC for fixed seeds on a fixed fixture — pin the
    // measured floor (0.954 on this fixture; near-random vectors at the
    // weak 0.4 threshold are LSH's worst case, see lshNearDupEdges docs)
    val recall = if (exact.isEmpty) 1.0 else edges.size.toDouble / exact.size
    assert(recall >= 0.9, f"LSH edge recall $recall%.3f under the pinned floor")
    // cluster labels over the LSH edges ≡ driver-side union-find over the
    // SAME edges (engine exactness, independent of edge-feed recall)
    val got = SparkEntry.queries("q41_dedup_clusters")(spark, dir)
      .as[(Long, Long, Long)].collect().toSet
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    val comps = edges.toSeq.flatMap(t => Seq(t._1, t._2)).distinct.groupBy(find)
    val expect = comps.toSeq.flatMap { case (_, ns) =>
      val rep = ns.min
      ns.map(n => (n, rep, ns.length.toLong))
    }.toSet
    assert(got == expect, s"got=${got.size} expect=${expect.size}")
    assert(got.nonEmpty)
  }

  test("q30 SRP-LSH ANN candidates are a subset of exact near-dup pairs at lower threshold") {
    val srp = SparkEntry.queries("q30_srp_ann")(spark, dir)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val exact = SparkEntry.queries("q29_cosine_near_dup")(spark, dir)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // pairs above 0.4 exact-cosine that SRP finds must be genuine
    assert(srp.intersect(exact).subsetOf(exact))
  }

  test("q51 SemDeDup equals a driver-side reimplementation; keep-set invariants hold") {
    import graft.readside.Queries
    import graft.functions.SimilarityFunctions
    val got = SparkEntry.queries("q51_semdedup")(spark, dir)
      .select($"vec_id", $"cid", $"group_rep", $"group_size", $"keep")
      .as[(Long, Long, Long, Long, Boolean)].collect().toSet

    // driver-side reimplementation: same centroid pick (engine helper for
    // the hash ranking only), then independent assignment + pairs +
    // union-find entirely in local Scala
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    val n = emb.length
    val k = math.max(4, math.min(4096, math.round(math.sqrt(n.toDouble)).toInt))
    val ranked = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id", org.apache.spark.sql.functions.xxhash64($"vec_id").as("r"))
      .as[(Long, Long)].collect().sortBy { case (id, r) => (r, id) }
      .take(k).map(_._1).toSet
    val cents = emb.filter(t => ranked.contains(t._1)).sortBy(_._1)
    def assignOf(v: Array[Float]): Long = {
      var best = -2.0; var bestC = Long.MaxValue
      cents.foreach { case (cid, cv) =>
        val c = SimilarityFunctions.cosineLocal(v, cv)
        if (c > best || (c == best && cid < bestC)) { best = c; bestC = cid }
      }
      bestC
    }
    val assign = emb.map { case (id, v) => id -> assignOf(v) }.toMap
    val byId = emb.toMap
    val pairs = for {
      (a, va) <- emb; (b, vb) <- emb
      if a < b && assign(a) == assign(b) &&
        SimilarityFunctions.cosineLocal(va, vb) >= 0.4
    } yield (a, b)
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    val members = pairs.flatMap(t => Seq(t._1, t._2)).distinct.groupBy(find)
    val repOf: Map[Long, (Long, Long)] = members.toSeq.flatMap { case (_, ns) =>
      val rep = ns.min; ns.toSeq.map(_ -> (rep, ns.length.toLong))
    }.toMap
    val expect = emb.map { case (id, _) =>
      val (rep, sz) = repOf.getOrElse(id, (id, 1L))
      (id, assign(id), rep, sz, rep == id)
    }.toSet
    assert(got === expect, s"got=${got.size} expect=${expect.size}")

    // invariants: exactly one keep per group, the keeper is the min id,
    // groups never span semantic clusters
    val byGroup = got.groupBy(_._3)
    byGroup.foreach { case (rep, rows) =>
      assert(rows.count(_._5) === 1, s"group $rep must keep exactly one")
      assert(rows.filter(_._5).head._1 === rows.map(_._1).min)
    }
    assert(got.exists(!_._5), "fixture must contain at least one dropped near-dup")
    // every group is within ONE semantic cluster (SemDeDup's defining
    // property: pairs are only generated within clusters)
    byGroup.filter(_._2.size > 1).foreach { case (rep, rows) =>
      assert(rows.map(_._2).toSet.size === 1, s"group $rep spans clusters")
    }
  }

  test("connectedComponents: count-gated union-find ≡ distributed loop (long + string keys)") {
    import graft.readside.Queries
    // long keys over a real edge feed (q41's LSH edges)
    val edges = Queries.lshNearDupEdges(spark, dir).select($"id_a", $"id_b")
    val gated = Queries.connectedComponents(spark, edges)
      .as[(Long, Long, Long)].collect().toSet
    val looped = Queries.connectedComponents(spark, edges, driverGate = 0L)
      .as[(Long, Long, Long)].collect().toSet
    assert(gated === looped)
    assert(gated.nonEmpty)
    // string keys (the c15 shape) with a chain whose min is NOT an endpoint
    val sp = Seq(("b", "a"), ("c", "b"), ("x", "y"), ("zz", "x"))
      .toDF("id_a", "id_b")
    val g2 = Queries.connectedComponents(spark, sp)
      .as[(String, String, Long)].collect().toSet
    val l2 = Queries.connectedComponents(spark, sp, driverGate = 0L)
      .as[(String, String, Long)].collect().toSet
    assert(g2 === l2)
    assert(g2 === Set(("a", "a", 3L), ("b", "a", 3L), ("c", "a", 3L),
      ("x", "x", 3L), ("y", "x", 3L), ("zz", "x", 3L)))
  }

  test("q60 containment: prefix-filtered result ≡ all-pairs brute force; subsumption asymmetry holds") {
    val got = SparkEntry.queries("q60_containment_dedup")(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    // brute force over the SAME gram sets (the native expr), driver-side
    val gsets = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id",
        graft.expressions.GraftFunctions.wordNgramHashes($"text", 3).as("g"))
      .as[(Long, Array[Long])].collect()
      .map { case (id, g) => (id, g.toSet) }
    val expect = (for {
      (a, ga) <- gsets if ga.size >= 8
      (b, gb) <- gsets if a != b
      common = ga.intersect(gb).size.toLong
      if common * 10 >= ga.size.toLong * 9
    } yield (a, b, ga.size.toLong, common, common * 10000L / ga.size)).toSet
    assert(got === expect, s"got=${got.size} expect=${expect.size}")
    assert(got.nonEmpty)
    // asymmetry: at least one contained->container pair must NOT hold in
    // reverse (otherwise the operator adds nothing over symmetric Jaccard)
    // — guaranteed here only if the fixture has a strict-subset pair; check
    // softly via containment values below 10000
    assert(got.exists(_._5 <= 10000L))
  }

  test("q61 novelty drift: slices partition the corpus; slice 0 is all-new; counts match brute force") {
    val got = SparkEntry.queries("q61_novelty_drift")(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got.nonEmpty && got.head._1 == 0L)
    assert(got.head._2 == got.head._3, "slice 0 must be 100% novel")
    assert(got.head._4 == 10000L)
    // brute force with the same gram expr
    val rows = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id",
        graft.expressions.GraftFunctions.wordNgramHashes($"text", 3).as("g"))
      .as[(Long, Array[Long])].collect()
    val width = rows.map(_._1).max / 8 + 1
    val bySlice = rows.groupBy(r => r._1 / width)
      .view.mapValues(_.flatMap(_._2).toSet).toMap
    val first = scala.collection.mutable.Map[Long, Long]()
    bySlice.toSeq.sortBy(_._1).foreach { case (sl, gs) =>
      gs.foreach(g => if (!first.contains(g)) first(g) = sl)
    }
    val expect = bySlice.toSeq.sortBy(_._1).map { case (sl, gs) =>
      val nNew = gs.count(g => first(g) == sl).toLong
      (sl, gs.size.toLong, nNew, nNew * 10000L / gs.size)
    }
    assert(got === expect)
  }

  test("q53 host-rank: gated broadcast iteration ≡ distributed shuffle loop, bit-for-bit") {
    val fast = SparkEntry.queries("q53_host_rank")(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq
    val loop = graft.readside.Queries.hostRankOver(spark, dir, 0L)
      .as[(Long, Long, Long)].collect().toSeq
    assert(fast === loop)
    assert(fast.nonEmpty)
  }

  test("q62 shard shuffle: a permutation (dense 1..n per shard), matches a driver sort, salt changes order") {
    val got = SparkEntry.queries("q62_shard_shuffle")(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq
    val total = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(got.length.toLong == total)
    assert(got.map(_._1).distinct.length == got.length) // each doc exactly once
    // positions are dense 1..count(shard) per shard
    got.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted == (1L to rows.length.toLong))
    }
    // matches a driver-side reimplementation over Spark's own hash values
    val hashed = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", xxhash64($"doc_id", lit(7L)).as("h"))
      .as[(Long, Long)].collect()
    val expect = hashed.map { case (id, h) => (id, java.lang.Math.floorMod(h, 16L), h) }
      .groupBy(_._2).iterator.flatMap { case (_, rows) =>
        rows.sortBy(r => (r._3, r._1)).zipWithIndex
          .map { case ((id, s, _), i) => (id, s, i + 1L) }
      }.toSet
    assert(got.toSet == expect)
    // a different salt is an independent permutation, same shape
    val other = graft.readside.Queries.shardShuffle(spark, dir, salt = 8L, nShards = 16)
      .as[(Long, Long, Long)].collect().toSeq
    assert(other.map(_._1).sorted == got.map(_._1).sorted)
    assert(other.toSet != got.toSet, "salt change must permute the order")
  }

  test("q63 incremental dedup: verdicts match a driver reimplementation; gated ≡ shuffle path") {
    val got = SparkEntry.queries("q63_incremental_dedup")(spark, dir)
      .as[(Long, String)].collect().toSeq
    // driver reimplementation over raw text + Spark's own bucket hash
    val rows = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"text", pmod(xxhash64($"doc_id"), lit(100)).as("b"))
      .as[(Long, String, Long)].collect()
    val histTexts = rows.filter(_._3 < 90).map(_._2).toSet
    val inc = rows.filter(_._3 >= 90)
    val firstId = inc.groupBy(_._2).map { case (t, rs) => (t, rs.map(_._1).min) }
    val expect = inc.map { case (id, t, _) =>
      val v = if (histTexts.contains(t)) "dup_history"
              else if (id > firstId(t)) "dup_incoming"
              else "novel"
      (id, v)
    }.sortBy(_._1).toSeq
    assert(got == expect)
    assert(got.exists(_._2 == "novel"), "fixture should contain novel docs")
    // the count-gated broadcast path and the shuffle fallback agree
    spark.conf.set("graft.incdedup.broadcastCap", "0") // force the fallback
    try {
      val viaShuffle = SparkEntry.queries("q63_incremental_dedup")(spark, dir)
        .as[(Long, String)].collect().toSeq
      assert(viaShuffle == got)
    } finally spark.conf.unset("graft.incdedup.broadcastCap")
  }

  test("q64 PII scrub: counts match a regex reimplementation; nothing matchable survives redaction") {
    val emailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}".r
    val phonePat = "\\+[0-9]{1,3}[ 0-9]{6,14}".r
    val ipPat = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b".r
    val got = SparkEntry.queries("q64_pii_scrub")(spark, dir)
      .as[(Long, Long, Long, Long, String)].collect()
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    assert(got.length == texts.size)
    got.foreach { case (id, ne, np, ni, red) =>
      val body = s"contact user$id@example.com or +49 30 ${"%07d".format(id)} " +
        s"office 10.0.${id % 256}.${id * 7 % 256} note: ${texts(id).take(80)}"
      assert(ne == emailPat.findAllIn(body).length && ne >= 1)
      assert(np == phonePat.findAllIn(body).length && np >= 1)
      assert(ni == ipPat.findAllIn(body).length && ni >= 1)
      // the redaction is complete: no pattern still matches the output
      // (placeholders themselves contain no pattern-matchable characters)
      assert(red.contains("[EMAIL]") && red.contains("[PHONE]") && red.contains("[IP]"))
      assert(emailPat.findFirstIn(red).isEmpty, s"email survived in: $red")
      assert(phonePat.findFirstIn(red).isEmpty, s"phone survived in: $red")
      assert(ipPat.findFirstIn(red).isEmpty, s"ip survived in: $red")
    }
  }

  test("q65 substring-dup spans equal a driver-side reimplementation; an engineered copy is caught") {
    // independent oracle: plain-Scala positional 8-grams (same
    // normalization contract as q42's grams), corpus-wide occurrence
    // counts, then the same gap≤L island fold the engine runs
    val L = 8
    def spans(occ: Seq[(Long, Long, String)], nTok: Map[Long, Long]): Map[Long, (Long, Long, Long, Long)] = {
      val dup = occ.groupBy(_._3).filter(_._2.length >= 2).keySet
      val byDoc = occ.filter(o => dup(o._3)).groupBy(_._1)
      nTok.map { case (id, n) =>
        val ps = byDoc.getOrElse(id, Nil).map(_._2).sorted
        var prev = -2L * L; var cov = 0L; var nsp = 0L
        ps.foreach { p =>
          if (p - prev <= L) cov += p - prev else { cov += L; nsp += 1 }
          prev = p
        }
        id -> ((n, cov, nsp, if (n == 0) 0L else cov * 10000 / n))
      }
    }
    def occOf(docs: Seq[(Long, String)]): Seq[(Long, Long, String)] = docs.flatMap { case (id, tx) =>
      val t = if (tx == null) Array.empty[String]
              else tx.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
      if (t.length < L) Nil
      else t.sliding(L).zipWithIndex.map { case (w, i) => (id, i.toLong, w.mkString(" ")) }.toSeq
    }
    def nTokOf(docs: Seq[(Long, String)]): Map[Long, Long] = docs.map { case (id, tx) =>
      val t0 = if (tx == null) "" else tx.trim
      id -> (if (t0.isEmpty) 0L else t0.split("\\s+").length.toLong)
    }.toMap
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val expect = spans(occOf(docs), nTokOf(docs))
    val got = SparkEntry.queries("q65_substr_dup_spans")(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got == expect,
      s"mismatch on ${(expect.keySet.filter(k => got.get(k) != expect.get(k))).take(3)}")
    // engineered sensitivity: a doc that quotes an 11-token run from
    // another doc must show one span covering exactly 11 tokens (the
    // merged maximal span of its 4 overlapping duplicated windows)
    val quoted = "the court finds the appeal admissible and in part well founded"
    // doc 3 is ONLY tabs/newlines (no 0x20): ADVICE r05's latent case —
    // Spark's trim strips only spaces, so the old raw-trim blank test let
    // it through with n_tokens = 1 while this reimplementation
    // (String.trim) and the oracle yield 0; the collapse-then-trim fix
    // makes the engine agree
    val eng = Seq(
      (1L, s"preamble words here $quoted and some closing remarks follow now"),
      (2L, s"totally different opening statement mentions that $quoted before ending otherwise"),
      (3L, "\t\n\t\n"))
    val tmp = java.nio.file.Files.createTempDirectory("q65eng").toString
    eng.toDF("doc_id", "text").write.parquet(s"$tmp/documents.parquet")
    val e = SparkEntry.queries("q65_substr_dup_spans")(spark, tmp)
      .as[(Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(e(1L)._4 == 1L && e(1L)._3 == 11L, s"doc1: ${e(1L)}")
    assert(e(2L)._4 == 1L && e(2L)._3 == 11L, s"doc2: ${e(2L)}")
    assert(e(3L)._2 == 0L, s"tabs-only doc must have n_tokens = 0: ${e(3L)}")
    assert(spans(occOf(eng), nTokOf(eng)) ==
      e.map { case (k, r) => k -> ((r._2, r._3, r._4, r._5)) })
  }

  test("q66 PMI bigrams equal a driver-side reimplementation (same double composition)") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select($"text").as[String].collect()
    val tokss = docs.map(tx => if (tx == null) Array.empty[String]
      else tx.toLowerCase.trim.split("\\s+").filter(_.nonEmpty))
    val pairCnt = scala.collection.mutable.Map.empty[(String, String), Long]
    val uniCnt = scala.collection.mutable.Map.empty[String, Long]
    tokss.foreach { t =>
      t.foreach(w => uniCnt(w) = uniCnt.getOrElse(w, 0L) + 1)
      if (t.length >= 2) t.sliding(2).foreach { p =>
        val k = (p(0), p(1)); pairCnt(k) = pairCnt.getOrElse(k, 0L) + 1
      }
    }
    val nTok = uniCnt.values.sum
    val nBig = pairCnt.values.sum
    val expect = pairCnt.toSeq.filter(_._2 >= 5).map { case ((a, b), nab) =>
      val pmi = math.log(
        (nab.toDouble * nTok.toDouble * nTok.toDouble) /
          (nBig.toDouble * uniCnt(a).toDouble * uniCnt(b).toDouble))
      (a, b, nab, math.floor(pmi * 10000 + 0.5).toLong)
    }.sortBy { case (a, b, _, p) => (-p, a, b) }.take(100)
    val got = SparkEntry.queries("q66_pmi_bigrams")(spark, dir)
      .as[(String, String, Long, Long)].collect().toSeq
    assert(got == expect,
      s"first diff: ${got.zip(expect).find { case (g, e) => g != e }}")
    assert(expect.nonEmpty, "fixture produced no supported bigrams — test is vacuous")
  }

  test("q67 rate anomaly equals a driver reimplementation; an engineered burst is flagged") {
    val H = 3600L * 1000
    // epoch-millis hour truncation ≡ UTC date_trunc (session TZ is UTC);
    // never parse timestamp strings — TZ-free by construction
    def reimpl(evs: Seq[(String, Long)]): Seq[(String, Long, Long, Option[Long], Boolean)] = {
      val h0 = evs.map(_._2).min; val h1 = evs.map(_._2).max
      val cnt = evs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      evs.map(_._1).distinct.sorted.flatMap { tpe =>
        val hours = (h0 to h1 by H).toArray
        val ns = hours.map(h => cnt.getOrElse((tpe, h), 0L))
        hours.indices.drop(24).map { i =>
          val win = ns.slice(i - 24, i)
          val w = 24L; val s = win.sum; val q = win.map(x => x * x).sum
          val num = ns(i).toDouble * w.toDouble - s.toDouble
          val den2 = w.toDouble * q.toDouble - s.toDouble * s.toDouble
          val z = if (den2 <= 0) None
                  else Some(math.floor(num / math.sqrt(den2) * 10000 + 0.5).toLong)
          val spike = if (den2 <= 0) num > 0 else num / math.sqrt(den2) >= 3.0
          (tpe, hours(i), ns(i), z, spike)
        }
      }
    }
    def run(d: String): Seq[(String, Long, Long, Option[Long], Boolean)] =
      SparkEntry.queries("q67_rate_anomaly")(spark, d)
        .as[(String, java.sql.Timestamp, Long, Option[Long], Boolean)].collect()
        .map(r => (r._1, r._2.getTime, r._3, r._4, r._5)).toSeq
    val evs = spark.read.parquet(s"$dir/events.parquet")
      .select($"event_type", $"ts").as[(String, java.sql.Timestamp)].collect()
      .map { case (t, ts) => (t, ts.getTime / H * H) }.toSeq
    assert(run(dir) == reimpl(evs), "sf fixture mismatch vs reimplementation")
    // engineered: 24h of exact-variance-1 background (1/3 alternating),
    // then a 20-event burst at hour 28 → z = (20·24−48)/√576 = 18
    val base = 1704067200000L // 2024-01-01T00:00:00Z, an exact hour
    val eng = (0 to 29).flatMap { h =>
      val n = if (h == 28) 20 else if (h % 2 == 0) 1 else 3
      (0 until n).map(i => (h.toLong * 60 + i, new java.sql.Timestamp(base + h * H + i * 60000L), "x"))
    }
    val tmp = java.nio.file.Files.createTempDirectory("q67eng").toString
    eng.toDF("event_id", "ts", "event_type").write.parquet(s"$tmp/events.parquet")
    val got = run(tmp)
    assert(got.length == 6 && got == reimpl(eng.map(e => ("x", e._2.getTime / H * H))))
    val burst = got.find(_._2 == base + 28 * H).get
    assert(burst._4.contains(180000L) && burst._5, s"burst row: $burst")
    assert(got.count(_._5) == 1, "only the burst hour may be flagged")
  }

  test("q63 incremental dedup: every verdict class fires on an engineered cross-bucket corpus") {
    // the sf fixture has few cross-bucket duplicates, so engineer a corpus
    // that exercises all three branches: pick real bucket assignments from
    // Spark's own hash, then place duplicate texts across the split
    val buckets = spark.range(1, 2001)
      .select($"id", pmod(xxhash64($"id"), lit(100)).as("b"))
      .as[(Long, Long)].collect()
    val histIds = buckets.filter(_._2 < 90).map(_._1).take(2)
    val incIds = buckets.filter(_._2 >= 90).map(_._1).sorted.take(4)
    assert(histIds.length == 2 && incIds.length == 4)
    val docs = Seq(
      (histIds(0), "alpha text"), (histIds(1), "beta text"),
      (incIds(0), "alpha text"), // dup_history
      (incIds(1), "gamma text"), // novel (first copy)
      (incIds(2), "gamma text"), // dup_incoming (later copy)
      (incIds(3), "delta text")) // novel
    val tmp = java.nio.file.Files.createTempDirectory("q63eng").toString
    docs.toDF("doc_id", "text").write.parquet(s"$tmp/documents.parquet")
    val got = SparkEntry.queries("q63_incremental_dedup")(spark, tmp)
      .as[(Long, String)].collect().toMap
    assert(got == Map(
      incIds(0) -> "dup_history", incIds(1) -> "novel",
      incIds(2) -> "dup_incoming", incIds(3) -> "novel"))
  }

  test("q69 FIM split: segments reassemble the normalized text; cuts are in range and subset-stable") {
    val got = SparkEntry.queries("q69_fim_split")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    val norm = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", coalesce(trim(regexp_replace($"text", "\\s+", " ")), lit("")).as("nt"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got.length == norm.size)
    val Psm = "(?s)<PRE>(.*)<SUF>(.*)<MID>(.*)".r
    got.foreach { case (id, n, lo, hi, fim) =>
      assert(0 <= lo && lo <= hi && hi <= n, s"doc $id cuts out of range: $lo $hi $n")
      val Psm(pre, suf, mid) = fim
      // losslessness: prefix ++ middle ++ suffix is the original token stream
      val back = Seq(pre, mid, suf).filter(_.nonEmpty).mkString(" ")
      assert(back == norm(id), s"doc $id does not reassemble")
      val tok = (s: String) => if (s.isEmpty) 0 else s.split(" ", -1).length
      assert(tok(pre) == lo && tok(mid) == hi - lo && tok(suf) == n - hi,
        s"doc $id segment sizes ${tok(pre)}/${tok(mid)}/${tok(suf)} != $lo/${hi - lo}/${n - hi}")
    }
    // engineered edge docs: empty, whitespace-only, null, one token
    val docs = Seq((1L, "  "), (2L, "solo"), (3L, null), (4L, "a  b\tc\nd"))
    val tmp = java.nio.file.Files.createTempDirectory("q69eng").toString
    docs.toDF("doc_id", "text").write.parquet(s"$tmp/documents.parquet")
    val e = SparkEntry.queries("q69_fim_split")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(4))).toList
    assert(e.map(_._2) == List(0L, 1L, 0L, 4L), s"edge token counts: $e")
    assert(e.filter(x => x._1 == 1 || x._1 == 3).forall(_._3 == "<PRE><SUF><MID>"))
  }

  test("q75 vocab growth: equals a driver reimplementation; hapax <= types <= tokens; ratios bounded") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select($"source", coalesce(trim(regexp_replace(lower($"text"), "\\s+", " ")), lit("")).as("nt"))
      .filter($"source".isNotNull)
      .collect().map(r => (r.getString(0), r.getString(1)))
    val tf = docs.flatMap { case (s, t) =>
      if (t.isEmpty) Nil else t.split(" ").toSeq.map(tok => (s, tok))
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val expect = tf.toSeq.groupBy(_._1._1).map { case (src, xs) =>
      val nTok = xs.map(_._2).sum
      val nTyp = xs.length.toLong
      val nHap = xs.count(_._2 == 1L).toLong
      (src, nTok, nTyp, nHap, nTyp * 10000 / nTok, nHap * 10000 / nTyp)
    }.toSet
    val got = SparkEntry.queries("q75_vocab_growth")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSet == expect,
      s"missing=${(expect -- got.toSet).take(2)} extra=${(got.toSet -- expect).take(2)}")
    got.foreach { case (src, nTok, nTyp, nHap, ttr, hap) =>
      assert(nHap <= nTyp && nTyp <= nTok, s"$src ordering violated")
      assert(ttr >= 1 && ttr <= 10000 && hap >= 0 && hap <= 10000, s"$src ratios out of range")
    }
  }

  test("q76 bigram LM: equals a driver reimplementation; probability sums bounded; lexicographic tie-break") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(coalesce(trim(regexp_replace(lower($"text"), "\\s+", " ")), lit("")).as("nt"))
      .collect().map(_.getString(0))
    val bg = docs.flatMap { t =>
      val toks = if (t.isEmpty) Array.empty[String] else t.split(" ")
      if (toks.length < 2) Nil else toks.sliding(2).map(p => (p(0), p(1))).toSeq
    }
    val c12 = bg.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val c1 = c12.toSeq.groupBy(_._1._1).view.mapValues(_.map(_._2).sum).toMap
    val expect = c12.toSeq.groupBy(_._1._1).collect {
      case (w1, xs) if c1(w1) >= 5 =>
        val (key, n) = xs.minBy { case ((_, w2), n) => (-n, w2) }
        (w1, key._2, c1(w1), n, n * 10000 / c1(w1))
    }.toSet
    val got = SparkEntry.queries("q76_bigram_lm")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got == expect,
      s"missing=${(expect -- got).take(2)} extra=${(got -- expect).take(2)}")
    // the argmax follower's share can never be below 1/|vocab following w1|
    got.foreach { case (w1, _, c1v, c12v, p) =>
      assert(c12v <= c1v && p == c12v * 10000 / c1v, s"$w1 inconsistent counts")
    }
    // engineered tie: "x a x b" twice + filler so c1(x) >= 5 -> follower 'a'
    val tmp = java.nio.file.Files.createTempDirectory("q76eng").toString
    Seq((1L, "x a x b x a x b x c"), (2L, null.asInstanceOf[String]), (3L, "solo"))
      .toDF("doc_id", "text").write.parquet(s"$tmp/documents.parquet")
    val e = SparkEntry.queries("q76_bigram_lm")(spark, tmp)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(4))).toList
    assert(e.contains(("x", "a", 4000L)), s"tie-break/probability wrong: $e")
  }

  test("q77 CMS: equals a driver reimplementation; never underestimates; merge is order-free and elementwise") {
    import graft.expressions.{CmsAggregator, CmsBuf, ExprOps, GraftFunctions}
    val d = 4; val w = 1024
    // the engine's exact occurrence stream
    val hs = spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(GraftFunctions.wordNgramHashSeq($"text", 1)).as("h"))
      .collect().map(_.getLong(0))
    val cells = new Array[Long](d * w)
    hs.foreach(h => (0 until d).foreach(r =>
      cells(r * w + CmsAggregator.bucket(h, r, w)) += 1))
    def est(h: Long): Long =
      (0 until d).map(r => cells(r * w + CmsAggregator.bucket(h, r, w))).min
    val hcnt = hs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    def fnv(tok: String): Long = {
      val b = tok.getBytes("UTF-8"); ExprOps.fnv64(b, 0, b.length)
    }
    val got = SparkEntry.queries("q77_cms_freq")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    got.foreach { case (tok, exact, e) =>
      val h = fnv(tok)
      assert(exact == hcnt(h), s"$tok exact_n")
      assert(e == est(h), s"$tok est_n: engine $e driver ${est(h)}")
      assert(e >= exact, s"$tok CMS underestimated: $e < $exact")
    }
    // the aggregator's own bucket chain must equal the declarative probe
    // expression (Column xxhash64(h, r) + pmod) the query reads with
    val sampleHs = hs.distinct.take(16)
    val viaCol = spark.range(1).select(
      sampleHs.flatMap(h => (0 until d).map(r =>
        pmod(xxhash64(lit(h), lit(r.toLong)), lit(w.toLong)))): _*)
      .head().toSeq.map(_.asInstanceOf[Long])
    val viaAgg = sampleHs.flatMap(h => (0 until d).map(r =>
      CmsAggregator.bucket(h, r, w).toLong))
    assert(viaCol == viaAgg.toSeq, "aggregator hash chain != Column xxhash64 chain")
    // merge algebra: splitting the stream arbitrarily never changes cells
    val agg = new CmsAggregator(d, w)
    def fold(xs: Seq[Long]): CmsBuf = xs.foldLeft(agg.zero)(agg.reduce)
    val (l, r) = hs.splitAt(hs.length / 3)
    val ab = agg.merge(fold(l.toSeq), fold(r.toSeq))
    val ba = agg.merge(fold(r.toSeq), fold(l.toSeq))
    assert(ab.cells.toSeq == ba.cells.toSeq, "merge not commutative")
    assert(ab.cells.toSeq == cells.toSeq, "merged partials != single-pass build")
    assert(ab.cells.sum == hs.length.toLong * d, "mass conservation per row")
  }

  test("q78 postings similarity: equals a driver reimplementation; bounded cosine; df-cut really cuts") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", coalesce(trim(regexp_replace(lower($"text"), "\\s+", " ")), lit("")).as("nt"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val nDocs = docs.length.toDouble
    val tf = docs.flatMap { case (id, t) =>
      if (t.isEmpty) Nil else t.split(" ").toSeq.map(tok => ((id, tok), 1L))
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val df = tf.keys.toSeq.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val posts = tf.toSeq.collect { case ((id, term), f) if df(term) <= 64 =>
      (term, id, f * math.floor(math.log(nDocs / df(term).toDouble) * 10000 + 0.5).toLong)
    }
    assert(df.values.exists(_ > 64), "fixture must exercise the df-cut")
    val norms = posts.groupBy(_._2).view.mapValues(_.map(w => w._3 * w._3).sum).toMap
    val dots = posts.groupBy(_._1).values.flatMap { ps =>
      for (a <- ps; b <- ps if a._2 < b._2) yield ((a._2, b._2), a._3 * b._3)
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val scored = dots.toSeq
      .filter { case ((d1, d2), _) => norms(d1) > 0 && norms(d2) > 0 }
      .map { case ((d1, d2), dot) =>
        (d1, d2, math.floor(dot.toDouble /
          math.sqrt(norms(d1).toDouble * norms(d2).toDouble) * 10000 + 0.5).toLong)
      }
    val expect = scored.sortBy(x => (-x._3, x._1, x._2)).take(100).toSet
    val got = SparkEntry.queries("q78_postings_sim")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == math.min(100, scored.length))
    assert(got.toSet == expect,
      s"missing=${(expect -- got.toSet).take(2)} extra=${(got.toSet -- expect).take(2)}")
    got.foreach { case (d1, d2, c) =>
      assert(d1 < d2, "pair orientation")
      assert(c >= 0 && c <= 10000, s"cosine out of range: $c")
    }
  }

  test("q79 k-means: equals a driver Lloyd reimplementation; final assignment is argmin-optimal; deterministic") {
    val k = 8
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id", $"embedding", xxhash64($"vec_id").as("hs"))
      .collect().map(r => (r.getLong(0),
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1000000).toLong).toArray,
        r.getLong(2)))
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    var cents = vecs.sortBy(v => (v._3, v._1)).take(k)
      .map(v => (v._1, v._2)).toSeq
    def assign() = vecs.map(v =>
      (v._1, v._2, cents.map(c => (d2(v._2, c._2), c._1)).min._2))
    for (_ <- 0 until 2) {
      val byC = assign().groupBy(_._3)
      cents = cents.map { case (cid, c0) =>
        byC.get(cid) match {
          case Some(ms) =>
            val n = ms.length.toLong
            val s = c0.indices.map(i => ms.map(_._2(i)).sum).toArray
            (cid, s.map(v => (v - (((v % n) + n) % n)) / n))
          case None => (cid, c0)
        }
      }
    }
    val expect = assign().map(v => (v._1, v._3)).toSet
    val got = SparkEntry.queries("q79_kmeans")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSet == expect,
      s"missing=${(expect -- got.toSet).take(3)} extra=${(got.toSet -- expect).take(3)}")
    // argmin optimality against the FINAL centroids (not just label equality)
    val cm = cents.toMap
    got.foreach { case (id, cid) =>
      val q = vecs.find(_._1 == id).get._2
      val best = cents.map(c => (d2(q, c._2), c._1)).min
      assert((d2(q, cm(cid)), cid) == best, s"vec $id not assigned to its nearest centroid")
    }
    assert(got.map(_._2).distinct.length <= k)
    val again = SparkEntry.queries("q79_kmeans")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == again.toSeq, "nondeterministic across runs")
  }

  test("q80 shared passages: equals a driver reimplementation; symmetric-free orientation; short docs excluded") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select($"source", coalesce(trim(regexp_replace(lower($"text"), "\\s+", " ")), lit("")).as("nt"))
      .filter($"source".isNotNull)
      .collect().map(r => (r.getString(0), r.getString(1)))
    val grams = docs.flatMap { case (s, t) =>
      val toks = if (t.isEmpty) Array.empty[String] else t.split(" ")
      if (toks.length < 8) Nil
      else toks.sliding(8).map(g => (s, g.mkString(" "))).toSeq
    }.distinct
    val bySrcs = grams.groupBy(_._2).view.mapValues(_.map(_._1).distinct.sorted).toMap
    val expect = bySrcs.values.filter(_.length >= 2).flatMap { srcs =>
      for (i <- srcs.indices; j <- (i + 1) until srcs.length) yield (srcs(i), srcs(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
      .map { case ((a, b), n) => (a, b, n) }.toSet
    val got = SparkEntry.queries("q80_shared_passages")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.nonEmpty)
    assert(got.toSet == expect,
      s"missing=${(expect -- got.toSet).take(3)} extra=${(got.toSet -- expect).take(3)}")
    got.foreach { case (a, b, n) => assert(a < b && n >= 1, s"orientation/count: ($a,$b,$n)") }
    // engineered fixture AGAINST THE ENGINE: a 7-token doc shares its
    // text prefix with two 8-token docs but must contribute no grams
    // (wordNgramHashSeq's empty-below-n contract), so only the s1/s2
    // pair — via the full 8-gram both long docs share — may surface
    val tmp = java.nio.file.Files.createTempDirectory("q80eng").toString
    Seq((1L, "a b c d e f g h", "s1"), (2L, "a b c d e f g h", "s2"),
      (3L, "a b c d e f g", "s3"), (4L, null.asInstanceOf[String], "s4"))
      .toDF("doc_id", "text", "source").write.parquet(s"$tmp/documents.parquet")
    val e = SparkEntry.queries("q80_shared_passages")(spark, tmp)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toList
    assert(e == List(("s1", "s2", 1L)),
      s"short doc must not contribute grams; expected only (s1,s2,1): $e")
  }

  test("q81 cohort retention: equals a driver reimplementation; offset-0 is always 10000; counts bounded by cohort") {
    val rows = spark.read.parquet(s"$dir/events.parquet")
      .select($"user_id", to_date($"ts").as("d"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate))
      .distinct
    val firstDay = rows.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val cohortSize = firstDay.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expect = rows.groupBy { case (u, d) =>
      (firstDay(u), java.time.temporal.ChronoUnit.DAYS.between(firstDay(u), d))
    }.map { case ((d0, off), xs) =>
      val n = xs.size.toLong
      (d0, off, cohortSize(d0), n, n * 10000 / cohortSize(d0))
    }.toSet
    val got = SparkEntry.queries("q81_cohort_retention")(spark, dir)
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.nonEmpty)
    assert(got.toSet == expect,
      s"missing=${(expect -- got.toSet).take(3)} extra=${(got.toSet -- expect).take(3)}")
    got.foreach { case (d0, off, size, n, ret) =>
      assert(off >= 0 && n >= 1 && n <= size, s"bounds: ($d0,$off,$size,$n)")
      if (off == 0) assert(n == size && ret == 10000L,
        s"cohort $d0 must be fully active at offset 0")
    }
  }

  test("q82 funnel: equals a driver fold; monotone stage counts; strict-order fixture gates same-ts and out-of-order events") {
    val rows = spark.read.parquet(s"$dir/events.parquet")
      .filter($"event_type".isin("view", "click", "purchase"))
      .select($"user_id", $"ts", $"event_type")
      .collect()
      .map(r => (r.getLong(0), tsMicros(r.getAs[Any](1)), r.getString(2)))
    val byUser = rows.groupBy(_._1).view.mapValues(_.map(x => (x._2, x._3))
      .sortBy(identity)).toMap
    var (nv, nc, np) = (0L, 0L, 0L)
    byUser.values.foreach { evs =>
      var t1, t2, t3 = Option.empty[Long]
      evs.foreach { case (ts, et) =>
        if (t1.isEmpty && et == "view") t1 = Some(ts)
        else if (t2.isEmpty && t1.exists(ts > _) && et == "click") t2 = Some(ts)
        else if (t3.isEmpty && t2.exists(ts > _) && et == "purchase") t3 = Some(ts)
      }
      if (t1.isDefined) nv += 1
      if (t2.isDefined) nc += 1
      if (t3.isDefined) np += 1
    }
    val nb = byUser.size.toLong
    val got = SparkEntry.queries("q82_funnel")(spark, dir).collect()(0)
    val g = (0 to 6).map(got.getLong)
    assert(g(0) == nb && g(1) == nv && g(2) == nc && g(3) == np,
      s"fold mismatch: engine=${g.take(4)} driver=($nb,$nv,$nc,$np)")
    assert(g(0) >= g(1) && g(1) >= g(2) && g(2) >= g(3), "funnel must be monotone")
    // every conversion column checked against the driver, INCLUDING the
    // 0-divide guard path (an empty prior stage must yield exactly 0)
    assert(g(4) == (if (nb == 0) 0L else nv * 10000 / nb), "conv1")
    assert(g(5) == (if (nv == 0) 0L else nc * 10000 / nv), "conv2")
    assert(g(6) == (if (nc == 0) 0L else np * 10000 / nc), "conv3")
    // engineered ordering fixture: u1 converts fully; u2's click PRECEDES
    // its view (no conversion); u3's purchase shares the click's exact ts
    // (strict > gates it); u4 has only an error event (not in the base)
    def ts(sec: Int) = java.sql.Timestamp.valueOf(s"2024-01-01 00:00:0$sec")
    val tmp = java.nio.file.Files.createTempDirectory("q82eng").toString
    Seq((1L, ts(1), "view"), (1L, ts(2), "click"), (1L, ts(3), "purchase"),
      (2L, ts(1), "click"), (2L, ts(2), "view"),
      (3L, ts(1), "view"), (3L, ts(2), "click"), (3L, ts(2), "purchase"),
      (4L, ts(1), "error"))
      .toDF("user_id", "ts", "event_type").write.parquet(s"$tmp/events.parquet")
    val e = SparkEntry.queries("q82_funnel")(spark, tmp).collect()(0)
    val eg = (0 to 6).map(e.getLong)
    assert(eg == Seq(3L, 3L, 2L, 1L, 10000L, 6666L, 5000L),
      s"ordering fixture: $eg")
  }

  test("q79 k-means: empty-cluster carry-forward — a duplicated seed keeps its centroid and the run stays argmin-exact") {
    // seeds are the bottom-8 ids by xxhash64; duplicate the vector of the
    // TWO lowest-ranked seeds: every point ties between the copies and
    // the tie-break sends it to the smaller cid, so the higher-cid copy
    // gets ZERO members in round 1 and must carry its centroid forward
    val n = 12
    val ranked = spark.range(1, n + 1L)
      .select($"id", xxhash64($"id").as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(x => (x._2, x._1)).map(_._1)
    val seeds = ranked.take(8)
    val base = (1 to n).map { i =>
      (i.toLong, Array.tabulate(8)(d => if (d == i % 4) 1.0f else 0.01f * i))
    }.toMap
    val dup = base + (seeds(1) -> base(seeds(0))) // seeds(1) clones seeds(0)
    val tmp = java.nio.file.Files.createTempDirectory("q79empty").toString
    dup.toSeq.map { case (id, v) => (id, v.toSeq) }
      .toDF("vec_id", "embedding").write.parquet(s"$tmp/embeddings.parquet")
    // driver Lloyd on the integer grid (the q79 contract)
    val q = dup.view.mapValues(_.map(x => math.floor(x.toDouble * 1000000).toLong)).toMap
    def d2(a: Seq[Long], b: Seq[Long]): Long =
      a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    var cents: Seq[(Long, Seq[Long])] = seeds.map(id => (id, q(id).toSeq))
    def assign() = q.toSeq.map { case (id, v) =>
      (id, cents.map(c => (d2(v, c._2), c._1)).min._2)
    }
    var sawEmpty = false
    for (_ <- 0 until 2) {
      val byC = assign().groupBy(_._2)
      sawEmpty ||= cents.exists(c => !byC.contains(c._1))
      cents = cents.map { case (cid, c0) =>
        byC.get(cid) match {
          case Some(ms) =>
            val m = ms.length.toLong
            (cid, c0.indices.map { i =>
              val sv = ms.map(x => q(x._1)(i)).sum
              (sv - (((sv % m) + m) % m)) / m
            })
          case None => (cid, c0)
        }
      }
    }
    assert(sawEmpty, "fixture must actually empty a cluster (else it tests nothing)")
    val expect = assign().map(v => (v._1, v._2)).toSet
    val got = SparkEntry.queries("q79_kmeans")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expect,
      s"carry-forward mismatch: missing=${(expect -- got).take(3)} extra=${(got -- expect).take(3)}")
    // (the emptied copy is the LARGER vec_id of the two clones — ties
    // break cid-asc — and its carried centroid may legitimately win
    // members back in round 2 once the survivor's centroid moves; the
    // equality above covers both behaviors)
  }

  test("q83 triangles: equals a brute-force count over the q29 edges; handshake identity; coefficient bounds") {
    val edges = SparkEntry.queries("q29_cosine_near_dup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edges.nonEmpty, "fixture needs edges")
    val adj = (edges.map(e => (e._1, e._2)) ++ edges.map(e => (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val verts = adj.keySet.toSeq.sorted
    // brute force: every unordered triple with all three edges present
    val triOf = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for {
      a <- verts; b <- adj(a) if b > a; c <- adj(b) if c > b
      if edges.contains((a, c))
    } { triOf(a) += 1; triOf(b) += 1; triOf(c) += 1 }
    val expect = verts.map { v =>
      val d = adj(v).size.toLong
      (v, d, triOf(v), if (d < 2) 0L else triOf(v) * 2 * 10000 / (d * (d - 1)))
    }.toSet
    val got = SparkEntry.queries("q83_triangle_stats")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSet == expect,
      s"missing=${(expect -- got.toSet).take(3)} extra=${(got.toSet -- expect).take(3)}")
    // each triangle contributes to exactly 3 vertices (handshake identity)
    assert(got.map(_._3).sum % 3 == 0)
    got.foreach { case (v, d, t, cc) =>
      assert(cc >= 0 && cc <= 10000, s"vertex $v coefficient out of range")
      assert(t <= d * (d - 1) / 2, s"vertex $v more triangles than wedges")
    }
  }

  test("q71 sample quantiles: equals a driver reimplementation; sample merges across shards; estimates are sane") {
    val rows = spark.read.parquet(s"$dir/documents.parquet")
      .select($"source", $"doc_id", $"n_chars", xxhash64($"doc_id").as("h"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    def sample(xs: Seq[(String, Long, Long, Long)]) =
      xs.groupBy(_._1).view.mapValues(
        _.sortBy(x => (x._4, x._2)).take(32)).toMap
    def quant(samp: Seq[(String, Long, Long, Long)]) = {
      val ord = samp.sortBy(x => (x._3, x._2)).map(_._3)
      val m = ord.length.toLong
      (m, ord(((m + 1) / 2 - 1).toInt), ord(((9 * m + 9) / 10 - 1).toInt))
    }
    val expect = sample(rows.toSeq).map { case (src, ss) =>
      val (m, p50, p90) = quant(ss); (src, m, p50, p90)
    }.toSet
    val got = SparkEntry.queries("q71_sample_quantiles")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expect, s"missing=${(expect -- got).take(2)} extra=${(got -- expect).take(2)}")
    // shard-mergeability: bottom-32 of a union ≡ bottom-32 over the
    // per-shard bottom-32s (so per-executor samples pre-trim)
    val (ev, od) = rows.partition(_._2 % 2 == 0)
    val merged = sample((sample(ev.toSeq).values.flatten ++
      sample(od.toSeq).values.flatten).toSeq)
    assert(merged == sample(rows.toSeq), "per-source sample must be shard-mergeable")
    // accuracy sanity: the p50 estimate sits in the middle half of its group
    val bySrc = rows.groupBy(_._1)
    got.foreach { case (src, _, p50, _) =>
      val vals = bySrc(src).map(_._3).sorted
      val below = vals.count(_ < p50).toDouble / vals.length
      assert(below > 0.2 && below < 0.8, s"$src p50_est=$p50 rank frac $below")
    }
  }

  test("q74 inverted index: postings agree with the native term-freq kernel; tf sums to doc length; df counts postings") {
    val got = SparkEntry.queries("q74_inverted_index")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    // cross-validation: for q46's fixed terms, the relational postings
    // must equal the native one-pass TermFreqsExpr kernel per document
    val terms = Seq("spark", "window", "vector")
    val native = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id",
        graft.expressions.GraftFunctions.termFreqs($"text", terms).as("tf"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
    val postings = got.groupBy(_._1).view
      .mapValues(_.map(p => (p._2, p._3)).toMap).toMap
    native.foreach { case (id, arr) =>
      terms.zipWithIndex.foreach { case (t, i) =>
        val fromIndex = postings.getOrElse(t, Map.empty).getOrElse(id, 0L)
        assert(fromIndex == arr(i + 1),
          s"doc $id term $t: postings=$fromIndex native=${arr(i + 1)}")
      }
      // completeness: per-doc tf sums to the kernel's token count
      val dl = got.filter(_._2 == id).map(_._3).sum
      assert(dl == arr(0), s"doc $id: postings tf sum $dl != token count ${arr(0)}")
    }
    // df on every posting = the term's posting count
    got.groupBy(_._1).foreach { case (t, ps) =>
      assert(ps.forall(_._4 == ps.length.toLong), s"term $t df mismatch")
    }
  }

  test("q73 tf-idf terms: equals a driver reimplementation; shared terms score 0; unique terms rank top") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select($"source", coalesce(trim(regexp_replace(lower($"text"), "\\s+", " ")), lit("")).as("nt"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val nSrc = docs.map(_._1).distinct.length.toDouble
    val tf = docs.flatMap { case (s, t) =>
      if (t.isEmpty) Nil else t.split(" ").toSeq.map(tok => (s, tok))
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val df = tf.keys.toSeq.groupBy(_._2).view.mapValues(_.map(_._1).distinct.size.toLong).toMap
    val scored = tf.toSeq.map { case ((s, tok), f) =>
      val sc = math.floor(math.log(nSrc / df(tok).toDouble) * f.toDouble * 10000 + 0.5).toLong
      (s, tok, f, df(tok), sc)
    }
    val expect = scored.groupBy(_._1).flatMap { case (_, xs) =>
      xs.sortBy(x => (-x._5, x._2)).take(10)
    }.toSet
    val got = SparkEntry.queries("q73_tfidf_terms")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSet == expect,
      s"missing=${(expect -- got.toSet).take(2)} extra=${(got.toSet -- expect).take(2)}")
    // a term present in every source must score exactly 0 (ln 1)
    scored.filter(x => x._4 == nSrc.toLong).foreach(x => assert(x._5 == 0L, s"shared term scored: $x"))
    // ranking boundary: every returned score >= the source's 11th-best
    // (the cut really is a top-10 by score, not some other ordering)
    val bySrcScores = scored.groupBy(_._1).view.mapValues(_.map(_._5).sorted(Ordering[Long].reverse)).toMap
    got.foreach { case (src, _, _, _, sc) =>
      val all = bySrcScores(src)
      if (all.length > 10) assert(sc >= all(10), s"$src returned score $sc below the 11th-best ${all(10)}")
    }
  }

  test("q72 KMV distinct: sketch equals a relational reimplementation; accurate; exact below k; merge-order-free") {
    import graft.expressions.{KmvAggregator, GraftFunctions}
    val hs = spark.read.parquet(s"$dir/documents.parquet")
      .select($"source", explode(GraftFunctions.wordNgramHashes($"text", 1)).as("h"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // relational reimplementation: distinct, unsigned sort, bottom-256
    def est(xs: Seq[Long]): (Long, Long) = {
      val d = xs.distinct.map(_ ^ Long.MinValue).sorted.take(256)
      val n = d.length.toLong
      val e = if (n < 256) n
        else ((BigInt(255) << 64) /
          (BigInt(d.last ^ Long.MinValue) & ((BigInt(1) << 64) - 1))).toLong
      (n, e)
    }
    val expect = hs.groupBy(_._1).map { case (s, xs) =>
      val (n, e) = est(xs.map(_._2).toSeq); (s, n, e)
    }.toSet
    val got = SparkEntry.queries("q72_kmv_distinct")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect, s"missing=${(expect -- got).take(2)} extra=${(got -- expect).take(2)}")
    // accuracy: KMV with k=256 has σ ≈ 6%; assert a loose ±25% band on
    // full sketches, exactness below k
    val exact = hs.groupBy(_._1).view.mapValues(_.map(_._2).distinct.size.toLong).toMap
    got.foreach { case (s, n, e) =>
      if (n < 256) assert(e == exact(s), s"$s below-k estimate must be exact")
      else assert(math.abs(e - exact(s)).toDouble / exact(s) < 0.25,
        s"$s est=$e exact=${exact(s)}")
    }
    // merge is order- and partitioning-free: fold the same multiset two ways
    val agg = new KmvAggregator(16)
    val vals = hs.map(_._2).take(500)
    val one = vals.foldLeft(agg.zero)(agg.reduce)
    val (l, r) = vals.splitAt(137)
    val two = agg.merge(r.reverse.foldLeft(agg.zero)(agg.reduce),
      l.foldLeft(agg.zero)(agg.reduce))
    assert(agg.finish(one).toSeq == agg.finish(two).toSeq)
  }

  test("q70 best passage: per-row fold equals an exploded window-count path; engineered tie breaks early") {
    // third shape (vs engine fold and DuckDB window-SQL): Spark explode +
    // range window + argmax
    val norm = trim(regexp_replace(lower($"text"), "\\s+", " "))
    val toksD = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id",
        when($"text".isNull || norm === "", array().cast("array<string>"))
          .otherwise(split(norm, " ")).as("t"))
    val hits = toksD.select($"doc_id", posexplode($"t").as(Seq("pos", "tok")))
      .filter($"tok".isin("spark", "window", "vector"))
      .select($"doc_id", $"pos".cast("long").as("pos"))
    import org.apache.spark.sql.expressions.Window
    val fr = Window.partitionBy($"doc_id").orderBy($"pos")
      .rangeBetween(Window.currentRow, 31)
    val expect = hits.withColumn("nh", count(lit(1)).over(fr))
      .withColumn("rn", row_number().over(
        Window.partitionBy($"doc_id").orderBy($"nh".desc, $"pos")))
      .filter($"rn" === 1)
      .join(toksD, Seq("doc_id"))
      .select($"doc_id", $"nh", $"pos",
        array_join(slice($"t", ($"pos" + 1).cast("int"),
          least(lit(32L), size($"t") - $"pos").cast("int")), " "))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(expect.nonEmpty, "fixture must contain query terms")
    val got = SparkEntry.queries("q70_best_passage")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(got == expect,
      s"fold≠window: missing=${(expect -- got).take(2)} extra=${(got -- expect).take(2)}")
    // engineered: two windows hold 2 hits each — the EARLIER anchor wins;
    // a denser 3-hit window later must beat both
    val doc = (Seq("spark", "window") ++ Seq.fill(30)("x") ++
      Seq("spark", "window") ++ Seq.fill(40)("y") ++
      Seq("spark", "vector", "window")).mkString(" ")
    val tieDoc = (Seq("spark", "window") ++ Seq.fill(30)("x") ++
      Seq("spark", "window")).mkString(" ")
    val tmp = java.nio.file.Files.createTempDirectory("q70eng").toString
    Seq((1L, doc), (2L, tieDoc)).toDF("doc_id", "text")
      .write.parquet(s"$tmp/documents.parquet")
    val e = SparkEntry.queries("q70_best_passage")(spark, tmp)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(e(1L) == ((3L, 74L, "spark vector window")),
      s"engineered best window wrong: ${e(1L)}")
    // doc 2: anchors 0/1/32 all hold 2 hits — the earliest must win
    assert(e(2L)._1 == 2L && e(2L)._2 == 0L,
      s"tie must break to the earliest anchor: ${e(2L)}")
  }

  test("q68 weighted sample: keys equal an exploded-replica path; weight raises inclusion; shard-mergeable") {
    // independent path: explode the replicas as ROWS and take the min —
    // must equal the engine's per-row aggregate() fold
    val keys = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id",
        least(lit(8L), lit(1L) +
          floor(coalesce(octet_length($"text"), lit(0)) / 512)).as("wt"))
      .withColumn("r", explode(sequence(lit(0L), $"wt" - 1)))
      .groupBy($"doc_id", $"wt")
      .agg(min(xxhash64($"doc_id", $"r")).as("key64"))
      .collect().map(r => (r.getLong(2), r.getLong(0), r.getLong(1)))
    val expect = keys.sorted.take(64).map { case (k, id, w) => (id, w, k) }
    val got = SparkEntry.queries("q68_weighted_sample")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == expect.toSeq)
    // the replica trick's point: key ≤ the doc's unit (r=0) draw, so a
    // doc can only move INTO the sample as its weight grows
    val unit = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", xxhash64($"doc_id", lit(0L)).as("u"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    keys.foreach { case (k, id, w) =>
      assert(w >= 1 && w <= 8 && k <= unit(id),
        s"doc $id: weighted key $k above its unit draw ${unit(id)}")
    }
    // distributed merge: bottom-64 of the union ≡ bottom-64 over the
    // per-shard bottom-64s (the property that lets shards pre-trim)
    val (even, odd) = keys.partition(_._2 % 2 == 0)
    val merged = (even.sorted.take(64) ++ odd.sorted.take(64)).sorted.take(64)
    assert(merged.toSeq == keys.sorted.take(64).toSeq,
      "bottom-k must be mergeable from per-shard bottom-ks")
  }
}

package graft

import org.apache.spark.sql.{AnalysisException, SparkSession}
import org.apache.spark.sql.functions._
import graft.expressions.GraftFunctions

/** SQL surface (GraftExtensions): every native expression callable from
  * `spark.sql(...)` must return exactly what the Column API returns, via
  * both registration paths (runtime `register(spark)` and the
  * `spark.sql.extensions` session-build path). */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = {
    GraftExtensions.register(spark)
    val d = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(col("doc_id"), col("text")).limit(200)
    d.createOrReplaceTempView("ext_docs")
    d
  }

  private lazy val embs = {
    GraftExtensions.register(spark)
    val e = spark.read.parquet(s"${sf()}/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).limit(100)
    e.createOrReplaceTempView("ext_embs")
    e
  }

  test("SQL ≡ Column API: simhash64, rolling_fingerprint, shingle/ngram hashes") {
    val api = docs.select(col("doc_id"),
        GraftFunctions.simhash64(col("text")).as("sh"),
        GraftFunctions.rollingFingerprint(col("text"), 16).as("fp"),
        GraftFunctions.shingleHashes(col("text"), 5).as("shg"),
        GraftFunctions.wordNgramHashes(col("text"), 3).as("ng"),
        GraftFunctions.ngramMaxCount(col("text"), 2).as("mbc"))
      .orderBy("doc_id").collect()
    val sql = spark.sql(
      """SELECT doc_id,
        |       graft_simhash64(text)               AS sh,
        |       graft_rolling_fingerprint(text, 16) AS fp,
        |       graft_shingle_hashes64(text, 5)     AS shg,
        |       graft_word_ngram_hashes64(text, 3)  AS ng,
        |       graft_ngram_max_count(text, 2)      AS mbc
        |FROM ext_docs ORDER BY doc_id""".stripMargin).collect()
    assert(api.length == sql.length && api.length > 0)
    api.zip(sql).foreach { case (a, b) => assert(a == b) }
  }

  test("int_l2_argmin native ≡ declarative HOF argmin (incl. distance ties)") {
    // the declarative form IntL2ArgMinExpr replaced (q79's old assignment):
    // array_min over struct(Σ(q−c)², cid) — min distance, tie → min cid
    val rnd = new scala.util.Random(7)
    val dim = 16
    val cents: Seq[(Long, Seq[Long])] = (0 until 8).map { j =>
      (10L + j, Seq.fill(dim)(rnd.nextInt(2000000).toLong - 1000000))
    }
    // rows: random vectors PLUS exact copies of centroids 3 and 5 shifted
    // to collide (tie case: two candidates at identical distance)
    val tieCents = cents.updated(5, (15L, cents(3)._2)) // cid 13 and 15 same vector
    val rows = (0 until 300).map(i =>
      (i.toLong, Seq.fill(dim)(rnd.nextInt(2000000).toLong - 1000000))) ++
      tieCents.map { case (cid, v) => (100 + cid, v) }
    val df = rows.toDF("id", "q")
    for (cs <- Seq(cents, tieCents)) {
      val cands = array(cs.map { case (cid, c) =>
        struct(lit(cid).as("cid"), array(c.map(lit(_)): _*).as("v"))
      }: _*)
      val scored = transform(cands, c => struct(
        aggregate(zip_with(col("q"), c.getField("v"),
          (a, b) => (a - b) * (a - b)), lit(0L), (acc, x) => acc + x).as("d"),
        c.getField("cid").as("cid")))
      val both = df
        .withColumn("hof", array_min(scored).getField("cid"))
        .withColumn("nat", GraftFunctions.intL2ArgMin(col("q"), cs))
        .collect()
      both.foreach(r => assert(r.getLong(2) == r.getLong(3),
        s"id=${r.getLong(0)}: hof=${r.getLong(2)} native=${r.getLong(3)}"))
    }
  }

  test("word_ngrams native ≡ declarative regex/split/zip_with chain (n=1..3, both cases)") {
    // the declarative form WordNgramsExpr replaced on the corpus-scan hot
    // path (q47/q48/q50/q52/q56/q66/q69/q70/q73–q78): lower → collapse
    // \s+ runs → trim → split → drop empties → zip_with/slice n-gram
    // build. Hostile rows exercise every boundary the byte-level kernel
    // must reproduce: whitespace-only (tabs/VT/FF — NOT stripped by
    // Spark's 0x20-only trim, the q65 ADVICE class), empty, null,
    // multi-byte lowering (ß, dotted İ, final sigma), NBSP (U+00A0 is
    // NOT Java-regex \s — must stay inside a token), leading/trailing
    // runs, and a real-corpus slice.
    val hostile = Seq[(Long, String)](
      (1L, "Hello  World\tfoo\nBar"),
      (2L, "\t\n\r "),
      (3L, ""),
      (4L, null),
      (5L, "ÄÖÜ Straße İstanbul ΣΙΓΜΑΣ"),
      (6L, "one"),
      (7L, "  lead and trail  "),
      (8L, "a b c"))
    val df = hostile.toDF("doc_id", "text").unionByName(
      docs.limit(60).select((col("doc_id") + 1000).as("doc_id"), col("text")))
    for (n <- Seq(1, 2, 3); lc <- Seq(true, false)) {
      val base = if (lc) lower(col("text")) else col("text")
      val norm = trim(regexp_replace(base, "\\s+", " "))
      val toks = filter(split(norm, " "), x => x =!= "")
      val nG = greatest(size(col("t")) - (n - 1), lit(0))
      val gram = n match {
        case 1 => col("t")
        case 2 => zip_with(slice(col("t"), lit(1), nG), slice(col("t"), lit(2), nG),
          (a, b) => concat(a, lit(" "), b))
        case _ => zip_with(slice(col("t"), lit(1), nG),
          zip_with(slice(col("t"), lit(2), nG), slice(col("t"), lit(3), nG),
            (a, b) => concat(a, lit(" "), b)),
          (a, b) => concat(a, lit(" "), b))
      }
      val rows = df.select(col("doc_id"), toks.as("t"),
          GraftFunctions.wordNgrams(col("text"), n, lc).as("nat"))
        .select(col("doc_id"), gram.as("decl"), col("nat"))
        .collect()
      assert(rows.length == hostile.length + 60)
      rows.foreach { r =>
        val decl = if (r.isNullAt(1)) null else r.getSeq[String](1)
        val nat = if (r.isNullAt(2)) null else r.getSeq[String](2)
        assert(decl == nat,
          s"doc_id=${r.get(0)} n=$n lowercase=$lc: decl=$decl native=$nat")
      }
    }
  }

  test("SQL ≡ Column API: word_ngrams (incl. lowercase arg)") {
    val api = docs.select(col("doc_id"),
        GraftFunctions.wordNgrams(col("text"), 2).as("g2"),
        GraftFunctions.wordNgrams(col("text"), 1, lowercase = false).as("g1r"))
      .orderBy("doc_id").collect()
    val sql = spark.sql(
      """SELECT doc_id,
        |       graft_word_ngrams(text, 2)        AS g2,
        |       graft_word_ngrams(text, 1, false) AS g1r
        |FROM ext_docs ORDER BY doc_id""".stripMargin).collect()
    assert(api.length == sql.length && api.length > 0)
    api.zip(sql).foreach { case (a, b) => assert(a == b) }
  }

  test("SQL ≡ Column API: text_stats (fixed stopword inventories)") {
    import graft.functions.TextFunctions
    val api = docs.select(col("doc_id"),
        GraftFunctions.textStats(col("text"), TextFunctions.EnStop,
          TextFunctions.DeStop, TextFunctions.FrStop).as("st"))
      .orderBy("doc_id").collect()
    val sql = spark.sql(
      """SELECT doc_id, graft_text_stats(text) AS st
        |FROM ext_docs ORDER BY doc_id""".stripMargin).collect()
    assert(api.length == sql.length && api.length > 0)
    api.zip(sql).foreach { case (a, b) => assert(a == b) }
  }

  test("SQL ≡ Column API: term_freqs (variadic string-literal terms)") {
    val api = docs.select(col("doc_id"),
        GraftFunctions.termFreqs(col("text"), Seq("spark", "window")).as("tf"))
      .orderBy("doc_id").collect()
    val sql = spark.sql(
      """SELECT doc_id, graft_term_freqs(text, 'spark', 'window') AS tf
        |FROM ext_docs ORDER BY doc_id""".stripMargin).collect()
    assert(api.length == sql.length && api.length > 0)
    api.zip(sql).foreach { case (a, b) => assert(a == b) }
  }

  test("SQL ≡ Column API: cosine_sim and srp_bucket over real embeddings") {
    val api = embs.as("a").join(embs.as("b"), $"a.vec_id" < $"b.vec_id")
      .select($"a.vec_id", $"b.vec_id",
        GraftFunctions.cosineSim($"a.embedding", $"b.embedding").as("cos"))
      .orderBy($"a.vec_id", $"b.vec_id").limit(50).collect()
    val sql = spark.sql(
      """SELECT a.vec_id, b.vec_id,
        |       graft_cosine_sim(a.embedding, b.embedding) AS cos
        |FROM ext_embs a JOIN ext_embs b ON a.vec_id < b.vec_id
        |ORDER BY a.vec_id, b.vec_id LIMIT 50""".stripMargin).collect()
    api.zip(sql).foreach { case (a, b) => assert(a == b) }

    val apiB = embs.select(
        GraftFunctions.srpBucket(col("embedding"), 10, 7L).as("bkt"))
      .collect().map(_.getLong(0))
    val sqlB = spark.sql(
      "SELECT graft_srp_bucket(embedding, 10, 7) AS bkt FROM ext_embs")
      .collect().map(_.getLong(0))
    assert(apiB.toSeq == sqlB.toSeq)
  }

  test("defaulted optional args match the Column API defaults") {
    val api = docs.select(
        GraftFunctions.rollingFingerprint(col("text")).as("fp"),
        GraftFunctions.shingleHashes(col("text")).as("shg"))
      .collect()
    val sql = spark.sql(
      """SELECT graft_rolling_fingerprint(text) AS fp,
        |       graft_shingle_hashes64(text)    AS shg
        |FROM ext_docs""".stripMargin).collect()
    api.zip(sql).foreach { case (a, b) => assert(a == b) }
  }

  test("non-literal width argument is rejected at analysis time") {
    docs // force registration + view
    val e = intercept[Exception] {
      spark.sql("SELECT graft_shingle_hashes64(text, doc_id) FROM ext_docs")
        .collect()
    }
    assert(e.isInstanceOf[AnalysisException] ||
      e.getMessage.contains("integer literal"))
  }

  test("session-build injection path (what spark.sql.extensions triggers)") {
    // `spark.sql.extensions` is a STATIC conf read at SparkContext creation,
    // so it can't be exercised against the suite's shared context; the
    // builder's withExtensions hook runs the identical injection code path
    // (SparkSession.Builder.getOrCreate → applyExtensions → injectFunction).
    val prevActive = SparkSession.getActiveSession
    val prevDefault = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      val got = s2.sql("SELECT graft_simhash64('alpha beta gamma') AS h")
        .head().getLong(0)
      val want = graft.expressions.ExprOps.simhash64(
        org.apache.spark.unsafe.types.UTF8String.fromString("alpha beta gamma"))
      assert(got == want)
    } finally {
      prevActive.foreach(SparkSession.setActiveSession)
      prevDefault.foreach(SparkSession.setDefaultSession)
    }
  }
}

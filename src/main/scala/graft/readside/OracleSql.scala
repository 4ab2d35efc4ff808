package graft.readside

/** Generator for q27's DuckDB oracle: replicates the engine's MinHash+LSH
  * pipeline BIT-FOR-BIT in staged integer SQL, so the LSH mechanics
  * themselves are value-gated, not just the jaccard arithmetic.
  *
  * What it reproduces:
  *  - FNV-1a 64-bit over the ≤5 chars of each shingle (ExprOps.fnv64 —
  *    the corpus is all-ASCII, so char codes ≡ UTF-8 bytes), including
  *    shingleHashes' 0→1 adjust on full shingles;
  *  - Spark's `xxhash64(shingleHash, lit(seed))` = XXH64 8-byte tail on
  *    the long with seed 42, then XXH64 4-byte tail on the int literal
  *    seeded by that (validated bit-exact against Spark 4.1.2 on
  *    positive/negative/boundary longs);
  *  - signed-long min for the signature components, band equality by
  *    direct component comparison (band-KEY equality ⟺ component
  *    equality modulo nil 64-bit concat collisions).
  *
  * All arithmetic runs in HUGEINT over [0, 2^64): x·y mod 2^64 via 32-bit
  * limb split (each partial < 2^65 fits HUGEINT), rotl via the
  * disjoint-bits shift sum, xor through UBIGINT. Each step is one chained
  * CTE column, so expression size stays constant per step.
  */
private object LshOracleSql {
  import XxhSqlOps.{mul64, xor64, rotl, addc, shr, M64, M64s, P1, P2, P3, P4, P5}

  private val FnvOffset = BigInt("CBF29CE484222325", 16)
  private val FnvPrime = BigInt("100000001B3", 16)

  // local chain variant: returns the CTE list unjoined (this generator
  // interleaves its own CTEs between chains)
  private def chain(base: String, baseCols: Seq[String],
      stages: Seq[(String, String)], prefix: String): (Seq[String], String) = {
    var prev = base
    val cols = scala.collection.mutable.ArrayBuffer(baseCols: _*)
    val ctes = stages.zipWithIndex.map { case ((name, expr), i) =>
      val cte = s"$prefix$i"
      val out = s"$cte AS (SELECT ${cols.mkString(", ")}, $expr AS $name FROM $prev)"
      prev = cte; cols += name
      out
    }
    (ctes, prev)
  }

  val sql: String = {
    // FNV-1a over the shingle chars, each position conditional on length
    // (the m<5 whole-string branch hashes 0..4 chars, no 0→1 adjust)
    val fnvStages =
      Seq("h0" -> s"CAST($FnvOffset AS HUGEINT)") ++
      (1 to 5).map { j =>
        val step = mul64(xor64(s"h${j - 1}", s"ascii(substr(sg,$j,1))"), FnvPrime)
        s"h$j" -> s"CASE WHEN length(sg) >= $j THEN $step ELSE h${j - 1} END"
      } ++
      Seq("h" -> "CASE WHEN fullsh AND h5 = 0 THEN 1::HUGEINT ELSE h5 END")
    // hashLong(h, seed=42): XXH64 8-byte tail + avalanche
    val hlBase = (BigInt(42) + P5 + 8) % M64
    val hlStages = Seq(
      "t1" -> mul64("h", P2),
      "t2" -> rotl("t1", 31),
      "t3" -> mul64("t2", P1),
      "t4" -> xor64(hlBase.toString, "t3"),
      "t5" -> rotl("t4", 27),
      "t6" -> addc(mul64("t5", P1), P4),
      "u1" -> xor64("t6", shr("t6", 33)),
      "u2" -> mul64("u1", P2),
      "u3" -> xor64("u2", shr("u2", 29)),
      "u4" -> mul64("u3", P3),
      "hl" -> xor64("u4", shr("u4", 32)))
    // hashInt(seed_i, hl): XXH64 4-byte tail + avalanche; seed_i·P1 is a
    // per-seed constant carried on the 16-row seeds table
    val hiStages = Seq(
      "g0" -> addc("hl", P5 + 4),
      "g1" -> xor64("g0", "seedp1"),
      "g2" -> rotl("g1", 23),
      "g3" -> addc(mul64("g2", P2), P3),
      "v1" -> xor64("g3", shr("g3", 33)),
      "v2" -> mul64("v1", P2),
      "v3" -> xor64("v2", shr("v2", 29)),
      "v4" -> mul64("v3", P3),
      "xli" -> xor64("v4", shr("v4", 32)))
    val (fnvCtes, fnvLast) = chain("f", Seq("doc_id", "sg", "fullsh"), fnvStages, "fn")
    val (hlCtes, hlLast) = chain(fnvLast, Seq("doc_id", "sg", "fullsh", "h"), hlStages, "hls")
    val (hiCtes, hiLast) = chain("seeded", Seq("doc_id", "seed", "hl", "seedp1"), hiStages, "his")
    val seedVals = (0 until 16)
      .map(i => s"($i, ${(BigInt(i) * P1) % M64}::HUGEINT)").mkString(", ")
    s"""
      WITH norm AS (
        SELECT doc_id, regexp_replace(lower(text), '\\s+', ' ', 'g') AS s
        FROM documents WHERE text IS NOT NULL),
      n AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents),
      sh AS (
        SELECT doc_id,
               unnest(CASE WHEN length(s) < 5 THEN [s]
                      ELSE list_distinct(list_transform(range(1, length(s) - 3),
                             i -> substr(s, CAST(i AS INT), 5))) END) AS sg,
               length(s) >= 5 AS fullsh
        FROM norm),
      stop AS (SELECT sg FROM sh CROSS JOIN n GROUP BY sg, nd HAVING count(*) > nd // 2),
      f AS (SELECT doc_id, sg, fullsh FROM sh WHERE sg NOT IN (SELECT sg FROM stop)),
      sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM f GROUP BY doc_id),
      ${fnvCtes.mkString(",\n      ")},
      ${hlCtes.mkString(",\n      ")},
      seeds(seed, seedp1) AS (VALUES $seedVals),
      seeded AS (SELECT doc_id, seed, hl, seedp1 FROM $hlLast CROSS JOIN seeds),
      ${hiCtes.mkString(",\n      ")},
      sig AS (
        SELECT doc_id, seed,
               min(CASE WHEN xli >= 9223372036854775808::HUGEINT
                        THEN CAST(xli - $M64s AS BIGINT)
                        ELSE CAST(xli AS BIGINT) END) AS mh
        FROM $hiLast GROUP BY doc_id, seed),
      cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sig a JOIN sig b ON a.seed = b.seed AND a.mh = b.mh AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id, a.seed // 4
        HAVING count(*) = 4),
      inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS i
        FROM f a JOIN f b ON a.sg = b.sg AND a.doc_id < b.doc_id
        JOIN cand c ON c.id_a = a.doc_id AND c.id_b = b.doc_id
        GROUP BY 1, 2)
      SELECT id_a, id_b,
             CAST((i * 10000) // (sa.sz + sb.sz - i) AS BIGINT) AS jaccard_x1e4
      FROM inter
      JOIN sz sa ON sa.doc_id = id_a
      JOIN sz sb ON sb.doc_id = id_b
      WHERE 100 * i >= 35 * (sa.sz + sb.sz - i)
      ORDER BY id_a, id_b"""
  }
}

/** DuckDB oracle SQL for each SQL-expressible entry in [[Queries]].
  * Mirrors the Spark expression trees exactly (same aliases, same float
  * discipline, same total ORDER BY) so the driver's sorted-column value
  * hash matches. Queries without an entry here (the crawl pipeline's
  * c-entries and the bloom-layout-dependent q36) get the driver's
  * rows-only check and are instead verified by ScalaTest properties.
  */
object OracleSql {

  val sql: Map[String, String] = Map(
    // money/quantity sums integer-scaled to BIGINT (units / cents / x1e4):
    // exact on <=2-decimal sources and immune to decimal-precision-widening
    // type mismatches between the engines
    "q01_pricing_summary" -> """
      SELECT l_returnflag, l_linestatus,
             CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_price_cents,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
                 CAST(round((1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_price_x1e4,
             count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-01'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""",

    "q02_filter_project" -> """
      SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
        AND l_quantity >= 45
      ORDER BY l_orderkey, l_linenumber""",

    "q03_join_agg" -> """
      SELECT c_mktsegment, count(*) AS n_orders,
             sum(CAST(o_totalprice AS DECIMAL(18,2))) AS total_price
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment""",

    "q04_part_join" -> """
      SELECT p_brand, count(*) AS n_items,
             CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand
      ORDER BY p_brand""",

    "q05_region_rollup" -> """
      SELECT r_name, n_name, count(*) AS n_customers
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name
      ORDER BY r_name, n_name""",

    "q06_conditional_agg" -> """
      SELECT o_orderpriority,
             count(*) AS n_total,
             count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_finished,
             count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_open,
             count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_pending
      FROM orders
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""",

    "q07_topk" -> """
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 10""",

    "q08_window_rank" -> """
      SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(row_number() OVER (PARTITION BY o_custkey
                 ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
        FROM orders) t
      WHERE rn <= 3
      ORDER BY o_custkey, rn""",

    "q09_semi_join" -> """
      SELECT c_custkey, c_name FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      ORDER BY c_custkey""",

    "q10_anti_join" -> """
      SELECT c_custkey, c_nationkey FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
      ORDER BY c_custkey""",

    "q11_distinct" -> """
      SELECT DISTINCT l_returnflag, l_linestatus
      FROM lineitem
      ORDER BY l_returnflag, l_linestatus""",

    "q12_set_ops" -> """
      WITH u AS (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'),
           f AS (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
      SELECT * FROM (
        SELECT 'intersect' AS op, count(*) AS n FROM (SELECT * FROM u INTERSECT SELECT * FROM f) x
        UNION ALL
        SELECT 'except' AS op, count(*) AS n FROM (SELECT * FROM u EXCEPT SELECT * FROM f) y
        UNION ALL
        SELECT 'union' AS op, count(*) AS n
        FROM (SELECT DISTINCT * FROM (SELECT * FROM u UNION ALL SELECT * FROM f) z0) z
      ) r ORDER BY op""",

    "q13_date_series" -> """
      WITH days AS (
        SELECT CAST(unnest(generate_series(TIMESTAMP '1995-01-01',
               TIMESTAMP '1995-03-31', INTERVAL 1 DAY)) AS DATE) AS d)
      SELECT CAST(month(d) AS BIGINT) AS mth, count(*) AS n_days,
             min(d) AS first_day, max(d) AS last_day
      FROM days GROUP BY 1 ORDER BY mth""",

    "q14_events_hourly" -> """
      SELECT date_trunc('hour', ts) AS h, event_type,
             count(*) AS n, min(value) AS min_v, max(value) AS max_v
      FROM events
      GROUP BY 1, 2
      HAVING date_trunc('hour', ts) < TIMESTAMP '2024-01-03 00:00:00'
      ORDER BY h, event_type""",

    "q15_retry_selection" -> """
      SELECT event_id, user_id, ts FROM events
      WHERE event_type = 'error' AND ts < TIMESTAMP '2024-01-15 00:00:00'
      ORDER BY event_id""",

    "q16_pagination" -> """
      SELECT o_orderkey, o_orderdate, o_totalprice
      FROM orders
      ORDER BY o_orderdate DESC, o_orderkey
      LIMIT 20 OFFSET 40""",

    "q17_search" -> """
      SELECT doc_id, source, n_chars FROM documents
      WHERE (text LIKE '%spark%' OR text LIKE '%join%') AND lang = 'en'
      ORDER BY n_chars DESC, doc_id
      LIMIT 20""",

    "q18_source_facet" -> """
      SELECT source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
      FROM documents
      GROUP BY source
      ORDER BY source""",

    "q19_ecli_validate" -> """
      WITH c AS (
        SELECT doc_id,
               'ECLI:' || CASE WHEN ((doc_id % 5) + 5) % 5 = 0 THEN 'XX' ELSE 'DE' END ||
               ':BGH:' || CAST(1990 + ((doc_id % 40) + 40) % 40 AS VARCHAR) || ':' ||
               CAST(doc_id AS VARCHAR) AS ecli
        FROM documents)
      SELECT doc_id, ecli,
             (regexp_matches(ecli, '^ECLI:[A-Z]{2}:[A-Z][A-Z0-9]{0,6}:[0-9]{4}:[A-Z0-9.]{1,25}$')
              AND split_part(ecli, ':', 2) IN
                ('AT','BE','BG','HR','CY','CZ','DK','EE','FI','FR','DE','GR',
                 'HU','IE','IT','LV','LT','LU','MT','NL','PL','PT','RO','SK',
                 'SI','ES','SE','EL','UK','EU')
              AND CAST(split_part(ecli, ':', 4) AS INT) BETWEEN 1900 AND 2027) AS is_valid
      FROM c
      ORDER BY doc_id""",

    "q20_url_canon" -> """
      WITH raw0 AS (
        SELECT event_id,
               printf('https://h%d.example.org/?docid=%s%07d&p=1',
                      ((user_id % 20) + 20) % 20,
                      (['KARE','KORE','KSRE','WBRE','JURE'])[CAST(((event_id % 5) + 5) % 5 AS INT) + 1],
                      ((event_id % 500) + 500) % 500) AS raw
        FROM events),
      noisy AS (
        SELECT event_id,
               CASE WHEN ((event_id % 7) + 7) % 7 = 0 THEN regexp_replace(raw, '&', ' &' || chr(9), 'g')
                    ELSE raw END AS raw
        FROM raw0),
      canon AS (
        SELECT regexp_replace(raw, '\s+', '', 'g') AS url_canon FROM noisy),
      courts AS (
        SELECT url_canon, regexp_extract(url_canon, 'docid=([A-Z0-9]+)', 1) AS docid
        FROM canon)
      SELECT CASE WHEN docid LIKE 'KARE%' THEN 'BAG'
                  WHEN docid LIKE 'KORE%' THEN 'BGH'
                  WHEN docid LIKE 'KSRE%' THEN 'BSG'
                  WHEN docid LIKE 'WBRE%' THEN 'BVerwG'
                  ELSE 'UNKNOWN' END AS court,
             count(*) AS n_urls,
             count(DISTINCT url_canon) AS n_distinct
      FROM courts
      GROUP BY 1
      ORDER BY court""",

    "q21_token_stats" -> """
      WITH toks AS (
        SELECT lang,
               CASE WHEN len(trim(text)) = 0 THEN 0
                    ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS toks,
               len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS bpe
        FROM documents)
      SELECT lang, count(*) AS n_docs,
             CAST(sum(toks) AS BIGINT) AS sum_toks,
             CAST(sum(bpe) AS BIGINT) AS sum_bpe
      FROM toks GROUP BY lang ORDER BY lang""",

    "q22_langid" -> """
      WITH scored AS (
        SELECT text IS NULL AS is_null,
               len(regexp_extract_all(lower(text), '\b(the|and|of|to|is|in|that|with|for|was)\b')) AS en,
               len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist|nicht|von|mit|für|den)\b')) AS de,
               len(regexp_extract_all(lower(text), '\b(le|la|les|et|est|dans|pour|que|une|des)\b')) AS fr
        FROM documents)
      SELECT CASE WHEN is_null THEN 'unknown'
                  WHEN en = 0 AND de = 0 AND fr = 0 THEN 'unknown'
                  WHEN en >= de AND en >= fr THEN 'en'
                  WHEN de >= fr THEN 'de'
                  ELSE 'fr' END AS pred_lang,
             count(*) AS n
      FROM scored GROUP BY 1 ORDER BY pred_lang""",

    "q23_quality" -> """
      WITH f AS (
        SELECT doc_id,
               CAST(length(text) AS DOUBLE) AS len,
               CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) AS alpha,
               CAST(length(regexp_replace(text, '[^.,;:!?|#@*]', '', 'g')) AS DOUBLE) AS punct,
               CAST(CASE WHEN len(trim(text)) = 0 THEN 0
                    ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS DOUBLE) AS toks,
               CAST(len(regexp_extract_all(lower(text), '\b(the|and|of|to|is|in|that|with|for|was)\b')) +
                    len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist|nicht|von|mit|für|den)\b')) +
                    len(regexp_extract_all(lower(text), '\b(le|la|les|et|est|dans|pour|que|une|des)\b')) AS DOUBLE) AS stops
        FROM documents)
      SELECT doc_id,
             CAST(floor(((CASE WHEN len = 0 THEN 0.0 ELSE alpha / len * 0.35 END)
                 + (CASE WHEN len = 0 THEN 0.0
                         ELSE (1.0 - least(punct * 10.0 / len, 1.0)) * 0.15 END)
                 + (CASE WHEN toks = 0 THEN 0.0
                         ELSE least(stops * 4.0 / toks, 1.0) * 0.3 END)
                 + (CASE WHEN len >= 200 AND len <= 20000 THEN 0.2
                         WHEN len >= 50 THEN 0.1 ELSE 0.0 END)) * 10000.0 + 0.5)
               AS BIGINT) AS quality_x1e4
      FROM f ORDER BY doc_id""",

    "q24_dedup_exact" -> """
      SELECT min(doc_id) AS keep_id, count(*) AS n_copies
      FROM documents
      GROUP BY text
      ORDER BY keep_id""",

    "q25_json_props" -> """
      WITH k AS (SELECT CAST(props->>'k' AS BIGINT) AS k FROM events)
      SELECT ((k % 10) + 10) % 10 AS k_bucket, count(*) AS n,
             CAST(sum(k) AS BIGINT) AS sum_k
      FROM k GROUP BY 1 ORDER BY k_bucket""",

    "q32_sort_param" -> """
      SELECT o_orderkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 15""",

    "q33_strided_sample" -> """
      WITH days AS (
        SELECT CAST(unnest(generate_series(TIMESTAMP '1995-01-01',
               TIMESTAMP '1995-12-31', INTERVAL 1 DAY)) AS DATE) AS d)
      SELECT d, CAST(datediff('day', DATE '1995-01-01', d) AS BIGINT) AS i
      FROM days
      WHERE datediff('day', DATE '1995-01-01', d) % 7 = 0
      ORDER BY d""",

    "q34_fulltext_assembly" -> """
      WITH assembled AS (
        SELECT doc_id,
               trim(regexp_replace(regexp_replace(
                 concat_ws(' | ', source, lang,
                   CASE WHEN length(text) > 10 THEN text ELSE '' END),
                 '\s+', ' ', 'g'), '\|', '/', 'g')) AS full_text
        FROM documents)
      SELECT doc_id, full_text, CAST(length(full_text) AS BIGINT) AS ft_len
      FROM assembled ORDER BY doc_id""",

    "q35_ecli_extract" -> """
      WITH bodies AS (
        SELECT doc_id,
               printf('ruling ECLI:DE:BGH:2023:%d cites ecli:de:bag:2021:%d and ECLI:XX:BGH:2023:%d dup ECLI:DE:BGH:2023:%d',
                      doc_id, doc_id, doc_id, doc_id) AS body
        FROM documents),
      extracted AS (
        SELECT doc_id,
               list_sort(list_distinct(list_filter(
                 list_transform(
                   regexp_extract_all(upper(body),
                     '(ECLI:)?[A-Z]{2}:[A-Z][A-Z0-9]{0,6}:[0-9]{4}:[A-Z0-9.]{1,25}'),
                   x -> CASE WHEN starts_with(x, 'ECLI:') OR starts_with(x, 'EU:')
                             THEN x ELSE 'ECLI:' || x END),
                 x -> regexp_matches(x, '^ECLI:[A-Z]{2}:[A-Z][A-Z0-9]{0,6}:[0-9]{4}:[A-Z0-9.]{1,25}$')
                      AND split_part(x, ':', 2) IN
                        ('AT','BE','BG','HR','CY','CZ','DK','EE','FI','FR','DE','GR',
                         'HU','IE','IT','LV','LT','LU','MT','NL','PL','PT','RO','SK',
                         'SI','ES','SE','EL','UK','EU')
                      AND CAST(split_part(x, ':', 4) AS INT) BETWEEN 1900 AND 2027))) AS eclis
        FROM bodies)
      SELECT doc_id, CAST(len(eclis) AS BIGINT) AS n_eclis,
             array_to_string(eclis, ',') AS eclis_csv
      FROM extracted ORDER BY doc_id""",

    "q39_ngram_jaccard" -> """
      WITH toks AS (
        SELECT doc_id,
               regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
        FROM documents WHERE doc_id < 40),
      grams AS (
        SELECT doc_id,
               CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                    ELSE list_distinct(list_transform(range(1, len(t) - 1),
                           i -> array_to_string(t[i:i+2], ' '))) END AS ngs
        FROM toks),
      sizes AS (SELECT doc_id, len(ngs) AS sz FROM grams),
      g AS (SELECT doc_id, unnest(ngs) AS ng FROM grams),
      inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
        FROM g a JOIN g b ON a.ng = b.ng AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
      SELECT id_a, id_b, CAST(n_inter AS BIGINT) AS n_inter,
             CAST(sa.sz + sb.sz - n_inter AS BIGINT) AS n_union
      FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE n_inter >= 2
      ORDER BY id_a, id_b""",

    "q40_curation_pipeline" -> """
      WITH feat AS (
        SELECT doc_id, text,
               CAST(length(text) AS DOUBLE) AS len,
               CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) AS alpha,
               CAST(length(regexp_replace(text, '[^.,;:!?|#@*]', '', 'g')) AS DOUBLE) AS punct,
               CAST(CASE WHEN len(trim(text)) = 0 THEN 0
                    ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS DOUBLE) AS toks,
               len(regexp_extract_all(lower(text), '\b(the|and|of|to|is|in|that|with|for|was)\b')) AS en,
               len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist|nicht|von|mit|für|den)\b')) AS de,
               len(regexp_extract_all(lower(text), '\b(le|la|les|et|est|dans|pour|que|une|des)\b')) AS fr
        FROM documents),
      scored AS (
        SELECT doc_id, text,
               CAST(toks AS BIGINT) AS n_tokens,
               CASE WHEN text IS NULL THEN 'unknown'
                    WHEN en = 0 AND de = 0 AND fr = 0 THEN 'unknown'
                    WHEN en >= de AND en >= fr THEN 'en'
                    WHEN de >= fr THEN 'de' ELSE 'fr' END AS pred_lang,
               CAST(floor(((CASE WHEN len = 0 THEN 0.0 ELSE alpha / len * 0.35 END)
                   + (CASE WHEN len = 0 THEN 0.0
                           ELSE (1.0 - least(punct * 10.0 / len, 1.0)) * 0.15 END)
                   + (CASE WHEN toks = 0 THEN 0.0
                           ELSE least(CAST(en + de + fr AS DOUBLE) * 4.0 / toks, 1.0) * 0.3 END)
                   + (CASE WHEN len >= 200 AND len <= 20000 THEN 0.2
                           WHEN len >= 50 THEN 0.1 ELSE 0.0 END)) * 10000.0 + 0.5)
                 AS BIGINT) AS quality_x1e4
        FROM feat),
      deduped AS (
        SELECT min(doc_id) AS doc_id,
               min(quality_x1e4) AS quality_x1e4,
               min(n_tokens) AS n_tokens,
               CAST(count(*) AS BIGINT) AS n_copies
        FROM scored
        WHERE pred_lang = 'en' AND quality_x1e4 >= 5000
        GROUP BY text)
      SELECT doc_id, quality_x1e4, n_tokens, n_copies
      FROM deduped
      WHERE ((doc_id % 5) + 5) % 5 = 0
      ORDER BY doc_id""",

    // independently derives the expected extraction from the STORED
    // columns (text excerpt + length) — the oracle cannot shortcut the
    // values from doc_id arithmetic
    "q37_metadata_map" -> """
      SELECT doc_id,
             source AS src,
             lang AS lng,
             CAST(2 AS BIGINT) AS n_extras,
             'Auszug=' ||
               regexp_replace(substr(coalesce(text, ''), 1, 24), '[\n\r:,=]', ' ', 'g') ||
               ',Zeichen=' || CAST(n_chars AS VARCHAR) AS extras_csv
      FROM documents ORDER BY doc_id""",

    "q28_knn_brute" -> """
      WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 7),
      s AS (
        SELECT e.vec_id,
               list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv) /
               (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))) *
                sqrt(list_dot_product(q.qv, q.qv))) AS cos_raw
        FROM embeddings e CROSS JOIN q)
      SELECT vec_id, round(cos_raw, 6) AS cos
      FROM s ORDER BY cos_raw DESC, vec_id LIMIT 10""",

    "q29_cosine_near_dup" -> """
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             round(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) /
               (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[]))) *
                sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))), 6) AS cos
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      WHERE list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) /
            (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[]))) *
             sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))) >= 0.4
      ORDER BY id_a, id_b""",

    // LSH-edge connected components: the oracle replicates the engine's
    // ENTIRE default path — multi-table SRP candidates, exact cosine
    // confirm, then the transitive closure (rep = min reachable id, the
    // min-label fixpoint) — so the sub-quadratic edge feed itself is
    // value-gated, not just the clustering (see [[SrpOracleSql]]).
    "q41_dedup_clusters" -> SrpOracleSql.q41Sql,

    // decontamination: string word-4-grams on the oracle side vs hashed
    // grams on the Spark side (same pairing as q39 — counts agree absent
    // 64-bit hash collisions). Normalization mirrors ExprOps
    // .wordNgramHashes: lowercase, collapse \s+ runs, trim; <4 tokens →
    // the whole text is the single gram.
    "q42_contamination" -> """
      WITH toks AS (
        SELECT doc_id,
               regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
        FROM documents),
      grams AS (
        SELECT doc_id,
               CASE WHEN len(t) < 4 THEN [array_to_string(t, ' ')]
                    ELSE list_distinct(list_transform(range(1, len(t) - 2),
                           i -> array_to_string(t[i:i+3], ' '))) END AS ngs
        FROM toks),
      g AS (SELECT doc_id, unnest(ngs) AS ng FROM grams),
      bench AS (SELECT DISTINCT ng FROM g WHERE doc_id % 17 = 3)
      SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_hits
      FROM g JOIN bench USING (ng)
      WHERE g.doc_id % 17 <> 3
      GROUP BY g.doc_id
      ORDER BY g.doc_id""",

    // MinHash+LSH near-dup pairs: the oracle replicates the engine's LSH
    // pipeline bit-for-bit (see [[LshOracleSql]]) — FNV-1a string
    // shingles, Spark-exact xxhash64 signatures, band-component
    // collisions, then the relational exact-jaccard confirm with the
    // all-integer threshold and ×10⁴ value.
    "q27_minhash_lsh" -> LshOracleSql.sql,

    // SimHash pigeonhole blocking: the oracle replicates simhash64
    // bit-for-bit (FNV-1a token hashes as HUGEINT left folds, bit votes,
    // sign pack) plus the 4×16-bit band split — see [[SimhashOracleSql]].
    "q26_simhash_blocks" -> SimhashOracleSql.q26Sql,

    // SRP-LSH: hyperplanes re-derived from the engine's mix() hash in
    // staged integer SQL, projections as deterministic left folds, bit
    // width integer-exact — see [[SrpOracleSql]].
    "q30_srp_ann" -> SrpOracleSql.q30Sql,

    // rolling-hash winnowing fingerprint: Rabin-Karp fold + murmur
    // finalizer replicated mod 2^64 in staged HUGEINT SQL, unsigned
    // per-doc min — see [[FingerprintOracleSql]].
    "q31_fingerprint" -> FingerprintOracleSql.sql,

    "q43_stratified_sample" -> """
      WITH r AS (
        SELECT doc_id, source,
               CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id) AS BIGINT) AS rn
        FROM documents)
      SELECT doc_id, source, rn FROM r
      WHERE (rn - 1) % 7 = 0
      ORDER BY doc_id""",

    // repetition: relational string-bigram occurrence counts vs the
    // Spark-side native counting expression (same tokenization contract
    // as q42's grams; <2 tokens → whole text is one gram, count 1)
    "q44_repetition_stats" -> """
      WITH toks AS (
        SELECT doc_id,
               regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
        FROM documents),
      big AS (
        SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
               CASE WHEN len(t) < 2 THEN [array_to_string(t, ' ')]
                    ELSE list_transform(range(1, len(t)),
                           i -> array_to_string(t[i:i+1], ' ')) END AS bgs
        FROM toks),
      g AS (SELECT doc_id, n_tokens, unnest(bgs) AS bg FROM big),
      cnts AS (
        SELECT doc_id, n_tokens, bg, count(*) AS c
        FROM g GROUP BY doc_id, n_tokens, bg)
      SELECT doc_id, n_tokens, CAST(max(c) AS BIGINT) AS max_bigram_n,
             (max(c) * 10 >= n_tokens) AS repetitive
      FROM cnts
      GROUP BY doc_id, n_tokens
      ORDER BY doc_id""",

    // unigram cross-entropy quality score: same tokenization as q44;
    // c/t divides BIGINT by BIGINT → DOUBLE in both engines; ×10⁴ with
    // explicit half-up floor (q23 convention). The Spark side's
    // broadcast-head/shuffle-tail vocabulary join is a pure execution
    // strategy — row-for-row it is the plain token→count join below.
    "q45_unigram_xent" -> """
      WITH toks AS (
        SELECT doc_id,
               unnest(regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS w
        FROM documents),
      tok AS (SELECT doc_id, w FROM toks WHERE w <> ''),
      cnt AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
      tot AS (SELECT sum(c) AS t FROM cnt)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_toks,
             CAST(floor(-avg(ln(c / t)) * 10000 + 0.5) AS BIGINT) AS xent_e4
      FROM tok JOIN cnt USING (w) CROSS JOIN tot
      GROUP BY doc_id
      ORDER BY doc_id""",

    // BM25 over the fixed 3-term query; same tokenization as q44/q45.
    // Term frequency = len(arr) − len(arr without the term), mirroring
    // the Spark side's array_remove counting; contributions summed in
    // the same written order; ORDER BY + LIMIT cut on the ×10⁴ INTEGER
    // with doc_id tiebreak so the boundary never compares doubles.
    "q46_bm25_search" -> """
      WITH d AS (
        SELECT doc_id,
               regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
        FROM documents),
      p AS (
        SELECT doc_id,
               CAST(len(list_filter(t, x -> x <> '')) AS DOUBLE) AS dl,
               CAST(len(t) - len(list_filter(t, x -> x <> 'spark')) AS DOUBLE) AS f0,
               CAST(len(t) - len(list_filter(t, x -> x <> 'window')) AS DOUBLE) AS f1,
               CAST(len(t) - len(list_filter(t, x -> x <> 'vector')) AS DOUBLE) AS f2
        FROM d),
      g AS (
        SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl,
               CAST(count(*) FILTER (WHERE f0 > 0) AS DOUBLE) AS df0,
               CAST(count(*) FILTER (WHERE f1 > 0) AS DOUBLE) AS df1,
               CAST(count(*) FILTER (WHERE f2 > 0) AS DOUBLE) AS df2
        FROM p)
      SELECT doc_id, CAST(floor((
               ln((n - df0 + 0.5) / (df0 + 0.5) + 1) * (f0 * 2.2) / (f0 + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
             + ln((n - df1 + 0.5) / (df1 + 0.5) + 1) * (f1 * 2.2) / (f1 + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
             + ln((n - df2 + 0.5) / (df2 + 0.5) + 1) * (f2 * 2.2) / (f2 + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
             ) * 10000 + 0.5) AS BIGINT) AS bm25_e4
      FROM p CROSS JOIN g
      WHERE f0 + f1 + f2 > 0
      ORDER BY bm25_e4 DESC, doc_id
      LIMIT 20""",

    // Sequence packing: exclusive running token offset in doc_id order
    // (plain global window here; the Spark side's two-phase bucketed
    // prefix sum must equal it), integer-divided into 512-token cuts.
    "q47_sequence_packing" -> """
      WITH d AS (
        SELECT doc_id,
               CAST(len(list_filter(regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '), x -> x <> '')) AS BIGINT) AS n_tok
        FROM documents),
      p AS (
        SELECT doc_id, n_tok,
               CAST(coalesce(sum(n_tok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_tok
        FROM d WHERE n_tok > 0)
      SELECT doc_id, n_tok, start_tok,
             start_tok // 512 AS first_seq,
             (start_tok + n_tok - 1) // 512 AS last_seq,
             (start_tok + n_tok - 1) // 512 - start_tok // 512 + 1 AS n_seqs
      FROM p ORDER BY doc_id""",

    // Chunk-level dedup: groups by the chunk STRING (the Spark side keys
    // the same decision on the 192-bit fingerprint); first occurrence =
    // lowest (doc_id, chunk_id); reassembly in chunk order.
    "q48_chunk_dedup" -> """
      WITH d AS (
        SELECT doc_id, list_filter(regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '), x -> x <> '') AS toks
        FROM documents),
      c0 AS (
        SELECT doc_id, toks, unnest(range(CAST(ceil(len(toks) / 16.0) AS BIGINT))) AS chunk_id
        FROM d WHERE len(toks) > 0),
      c AS (
        SELECT doc_id, chunk_id, array_to_string(list_slice(toks, chunk_id * 16 + 1, chunk_id * 16 + 16), ' ') AS chunk
        FROM c0),
      k AS (
        SELECT doc_id, chunk_id, chunk,
               row_number() OVER (PARTITION BY chunk ORDER BY doc_id, chunk_id) AS rn
        FROM c)
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_chunks,
             CAST(count(*) FILTER (WHERE rn = 1) AS BIGINT) AS n_kept,
             coalesce(string_agg(CASE WHEN rn = 1 THEN chunk END, ' ' ORDER BY chunk_id), '') AS dedup_text
      FROM k GROUP BY doc_id ORDER BY doc_id""",

    // Temperature mix: integer-exact quotas (floor(sqrt) weights, integer
    // division), Lehmer-scramble pick order — no double sum anywhere.
    "q49_temperature_mix" -> """
      WITH counts AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_g,
               CAST(floor(sqrt(CAST(count(*) AS DOUBLE))) AS BIGINT) AS w_g
        FROM documents GROUP BY source),
      tot AS (SELECT CAST(sum(w_g) AS BIGINT) AS w_sum FROM counts),
      q AS (SELECT source, n_g, (100 * w_g) // w_sum AS quota
            FROM counts CROSS JOIN tot),
      r AS (
        SELECT doc_id, source,
               CAST(row_number() OVER (PARTITION BY source ORDER BY (doc_id * 48271) % 65537, doc_id) AS BIGINT) AS rn
        FROM documents)
      SELECT doc_id, source, rn, quota
      FROM r JOIN q USING (source)
      WHERE rn <= quota
      ORDER BY doc_id""",

    // End-to-end training-run assembly: repetition gate (relational
    // bigram max — the Spark side's native expression), length floor,
    // exact dedup on the text (Spark: 192-bit fingerprint), temperature
    // quotas, exclusive-prefix-sum packing. Every stage integer-exact.
    "q50_training_assembly" -> """
      WITH d AS (
        SELECT doc_id, source, text,
               list_filter(regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '), x -> x <> '') AS t
        FROM documents),
      base AS (
        SELECT doc_id, source, text, CAST(len(t) AS BIGINT) AS n_tok, t
        FROM d WHERE len(t) >= 16),
      g AS (
        SELECT doc_id, unnest(list_transform(range(1, len(t)),
                 i -> array_to_string(t[i:i+1], ' '))) AS bg
        FROM base),
      mb AS (
        SELECT doc_id, MAX(c) AS maxbg
        FROM (SELECT doc_id, bg, count(*) AS c FROM g GROUP BY 1, 2)
        GROUP BY doc_id),
      kept AS (
        SELECT b.doc_id, b.source, b.text, b.n_tok
        FROM base b JOIN mb USING (doc_id) WHERE maxbg * 10 < n_tok),
      ded AS (
        SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rnd
        FROM kept),
      surv AS (SELECT doc_id, source, n_tok FROM ded WHERE rnd = 1),
      counts AS (
        SELECT source, CAST(floor(sqrt(CAST(count(*) AS DOUBLE))) AS BIGINT) AS w_g
        FROM surv GROUP BY source),
      tot AS (SELECT CAST(sum(w_g) AS BIGINT) AS w_sum FROM counts),
      q AS (SELECT source, (200 * w_g) // w_sum AS quota
            FROM counts CROSS JOIN tot),
      r AS (
        SELECT surv.*,
               CAST(row_number() OVER (PARTITION BY source ORDER BY (doc_id * 48271) % 65537, doc_id) AS BIGINT) AS rn
        FROM surv),
      sel AS (
        SELECT r.doc_id, r.source, r.n_tok
        FROM r JOIN q USING (source) WHERE rn <= quota),
      p AS (
        SELECT *, CAST(coalesce(sum(n_tok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_tok
        FROM sel)
      SELECT doc_id, source, n_tok, start_tok,
             start_tok // 256 AS first_seq,
             (start_tok + n_tok - 1) // 256 AS last_seq
      FROM p ORDER BY doc_id""",

    // SemDeDup: the whole pipeline replicated — Spark-exact xxhash64
    // centroid pick, double-cosine argmax assignment, within-cluster
    // pairs, recursive-CTE components (see [[SemOracleSql]])
    "q51_semdedup" -> SemOracleSql.q51Sql,

    // DSIR importance weights: string uni+bigram features on the oracle
    // side vs xxhash64'd features on the Spark side (the q39/q42
    // hash≡string pairing), identical add-1 smoothing and ln ratio;
    // BIGINT/BIGINT divides to DOUBLE in both engines; ×10⁴ floor
    // half-up (q45 convention). The Spark side's Zipf head/tail split is
    // a pure execution strategy — row-for-row it is this plain join.
    "q52_dsir_selection" -> """
      WITH toksarr AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '), x -> x <> '') AS t
        FROM documents),
      g AS (
        SELECT doc_id, doc_id % 17 = 3 AS tgt, unnest(t) AS g FROM toksarr
        UNION ALL
        SELECT doc_id, doc_id % 17 = 3 AS tgt,
               unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS g
        FROM toksarr),
      cnt AS (
        SELECT g,
               CAST(sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS ct,
               CAST(sum(CASE WHEN tgt THEN 0 ELSE 1 END) AS BIGINT) AS cr
        FROM g GROUP BY g),
      tot AS (
        SELECT CAST(sum(ct) AS BIGINT) AS t_, CAST(sum(cr) AS BIGINT) AS r_,
               count(*) AS v_
        FROM cnt)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_feats,
             CAST(floor(avg(ln((ct + 1) / (t_ + v_)) - ln((cr + 1) / (r_ + v_))) * 10000 + 0.5) AS BIGINT) AS dsir_e4
      FROM g JOIN cnt USING (g) CROSS JOIN tot
      WHERE NOT tgt
      GROUP BY doc_id
      ORDER BY doc_id""",

    // Host-rank: the same fixed-point integer PageRank, 10 iterations
    // unrolled as generated chained CTEs (see [[RankOracleSql]]) — every
    // division integer, every association pinned, so the match is
    // bit-exact with no float tolerance.
    "q53_host_rank" -> RankOracleSql.q53Sql,

    // As-of join: the oracle is the NAIVE ranked range join (exact and
    // affordable at oracle scale); the engine's union+carry-forward window
    // must agree row-for-row, nulls included (orders with no event at or
    // before their date).
    "q54_asof_join" -> """
      WITH probes AS (
        SELECT event_id AS purchase_id, user_id AS uid, ts
        FROM events WHERE event_type = 'purchase'),
      builds AS (
        SELECT event_id, event_type, user_id AS uid, ts
        FROM events WHERE event_type IN ('click', 'view')),
      ranked AS (
        SELECT p.purchase_id, b.event_id, b.event_type, b.ts,
               row_number() OVER (PARTITION BY p.purchase_id
                 ORDER BY b.ts DESC, b.event_id DESC) AS rn
        FROM probes p JOIN builds b ON b.uid = p.uid AND b.ts <= p.ts),
      best AS (
        SELECT purchase_id, event_id, event_type, ts FROM ranked WHERE rn = 1)
      SELECT p.purchase_id, p.uid, p.ts AS purchase_ts,
             b.event_id AS expo_event_id,
             b.event_type AS expo_type,
             b.ts AS expo_ts
      FROM probes p LEFT JOIN best b ON p.purchase_id = b.purchase_id
      ORDER BY p.purchase_id""",

    // Sessionization: same exact-µs gap predicate (epoch_us ≡ Spark's
    // unix_micros), same strict-> break, same (ts, event_id) in-session
    // order — every output column integer or timestamp, no float.
    "q55_sessionize" -> """
      WITH e AS (
        SELECT user_id AS uid, event_id, event_type, ts, epoch_us(ts) AS us
        FROM events),
      g AS (
        SELECT *,
               CASE WHEN lag(us) OVER w IS NULL
                      OR us - lag(us) OVER w > 86400000000 THEN 1 ELSE 0 END
                 AS is_new
        FROM e WINDOW w AS (PARTITION BY uid ORDER BY ts, event_id)),
      s AS (
        SELECT *, CAST(sum(is_new) OVER (PARTITION BY uid ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        FROM g)
      SELECT uid, session_seq,
             CAST(count(*) AS BIGINT) AS n_events,
             min(ts) AS start_ts,
             max(ts) AS end_ts,
             CAST(max(us) - min(us) AS BIGINT) AS duration_us,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_purchases
      FROM s GROUP BY uid, session_seq
      ORDER BY uid, session_seq""",

    // Heavy hitters: the engine's two-pass Misra–Gries result is EXACT
    // (the sketch only prunes candidates), so the oracle is the plain
    // relational form — same tokenization as q52, integer threshold
    // (cnt·4096 > N, no division).
    "q56_heavy_hitters" -> """
      WITH toksarr AS (
        SELECT list_filter(regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '), x -> x <> '') AS t
        FROM documents),
      g AS (
        SELECT unnest(list_transform(range(1, len(t) - 1),
                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g
        FROM toksarr),
      tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM g)
      SELECT g AS gram, CAST(count(*) AS BIGINT) AS cnt, n_total
      FROM g CROSS JOIN tot
      GROUP BY g, n_total
      HAVING count(*) * 4096 > n_total
      ORDER BY cnt DESC, gram""",

    // Exact per-group disc quantiles: rank ⌈q·n⌉ computed in integer
    // space on both engines ((num·n + den − 1) div den), so the match is
    // value-exact with no interpolation.
    "q57_group_quantiles" -> """
      WITH d AS (
        SELECT source, n_chars,
               row_number() OVER (PARTITION BY source
                 ORDER BY n_chars, doc_id) AS rn,
               count(*) OVER (PARTITION BY source) AS n
        FROM documents)
      SELECT source, CAST(n AS BIGINT) AS n_docs,
             min(n_chars) AS min_chars,
             max(CASE WHEN rn = (n + 1) // 2 THEN n_chars END) AS p50,
             max(CASE WHEN rn = (9 * n + 9) // 10 THEN n_chars END) AS p90,
             max(CASE WHEN rn = (99 * n + 99) // 100 THEN n_chars END) AS p99,
             max(n_chars) AS max_chars
      FROM d
      GROUP BY source, n
      ORDER BY source""",

    // Bottom-k consistent sample: Spark-exact xxhash64(long) replicated in
    // DuckDB (generated stage chain, see SemOracleSql).
    "q58_bottomk_sample" -> SemOracleSql.q58Sql,

    // Deterministic holdout split: same generated xxhash64 chain +
    // Spark-pmod bucketing.
    "q59_holdout_split" -> SemOracleSql.q59Sql,

    // Weighted bottom-k sample: replica-min priority keys over the same
    // generated xxhash64 chain.
    "q68_weighted_sample" -> SemOracleSql.q68Sql,

    // FIM split: hash-derived deterministic cut points + sentinel
    // reassembly, exact string equality.
    "q69_fim_split" -> SemOracleSql.q69Sql,

    // Sample quantiles: per-source bottom-32 consistent sample + q57's
    // nearest-rank picks, all integers.
    "q71_sample_quantiles" -> SemOracleSql.q71Sql,

    // KMV distinct-count sketch: FNV-1a rebuilt via list_reduce, unsigned
    // rank, integer estimate.
    "q72_kmv_distinct" -> SemOracleSql.q72Sql,

    // containment dedup: the oracle is the exhaustive quadratic form —
    // every doc pair's shared-trigram count over gram STRINGS (the
    // engine's PPJoin prefix filter is a complete candidate generator, so
    // the exact-confirmed output must equal the all-pairs computation)
    "q60_containment_dedup" -> """
      WITH toks AS (
        SELECT doc_id,
               regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
        FROM documents),
      grams AS (
        SELECT doc_id,
               CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                    ELSE list_distinct(list_transform(range(1, len(t) - 1),
                           i -> array_to_string(t[i:i+2], ' '))) END AS ngs
        FROM toks),
      g AS (SELECT doc_id, unnest(ngs) AS ng FROM grams),
      sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_a FROM g GROUP BY doc_id),
      common AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS n_common
        FROM g a JOIN g b USING (ng)
        WHERE a.doc_id <> b.doc_id
        GROUP BY 1, 2)
      SELECT c.id_a, c.id_b, s.n_a, c.n_common,
             c.n_common * 10000 // s.n_a AS containment_x1e4
      FROM common c JOIN sz s ON s.doc_id = c.id_a
      WHERE s.n_a >= 8 AND c.n_common * 10 >= s.n_a * 9
      ORDER BY c.id_a, c.id_b""",

    "q61_novelty_drift" -> """
      WITH w AS (SELECT max(doc_id) // 8 + 1 AS width FROM documents),
      toks AS (
        SELECT doc_id // (SELECT width FROM w) AS slice,
               regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
        FROM documents),
      grams AS (
        SELECT slice,
               CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                    ELSE list_distinct(list_transform(range(1, len(t) - 1),
                           i -> array_to_string(t[i:i+2], ' '))) END AS ngs
        FROM toks),
      g AS (SELECT DISTINCT slice, unnest(ngs) AS ng FROM grams),
      fe AS (SELECT ng, min(slice) AS first_slice FROM g GROUP BY ng)
      SELECT g.slice, CAST(count(*) AS BIGINT) AS n_grams,
             CAST(sum(CASE WHEN fe.first_slice = g.slice THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
             CAST(sum(CASE WHEN fe.first_slice = g.slice THEN 1 ELSE 0 END) AS BIGINT) * 10000
               // CAST(count(*) AS BIGINT) AS novelty_x1e4
      FROM g JOIN fe USING (ng)
      GROUP BY g.slice
      ORDER BY g.slice""",

    // Salted deterministic global shuffle: generated two-argument xxhash64
    // chain (value 2 seeded by hash 1) — see [[ShuffleOracleSql]].
    "q62_shard_shuffle" -> ShuffleOracleSql.q62Sql,

    // Incremental dedup vs the history slice: q59 bucket chain + verdict
    // over raw text (the engine's fingerprint grouping) — see
    // [[ShuffleOracleSql]].
    "q63_incremental_dedup" -> ShuffleOracleSql.q63Sql,

    // IVF ANN: the q51 quantizer CTEs (hash-ranked centroids + argmax
    // assignment) + nprobe = max(2, k/2) probe lists + q28's exact-rerank
    // output contract — see [[SemOracleSql.q38Sql]].
    "q38_ivf_ann" -> SemOracleSql.q38Sql,

    // PII redaction: identical RE2-safe patterns on both engines (that
    // cross-dialect agreement is part of q64's contract); printf('%07d')
    // replicates Spark's format_string at ANY id width (lpad would
    // truncate ids >= 10^7), and coalesce(text, '') pins the null case
    // both sides.
    "q64_pii_scrub" -> """
      WITH b AS (
        SELECT doc_id,
               'contact user' || CAST(doc_id AS VARCHAR) ||
               '@example.com or +49 30 ' ||
               printf('%07d', doc_id) ||
               ' office 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.' ||
               CAST((doc_id * 7) % 256 AS VARCHAR) ||
               ' note: ' || substr(coalesce(text, ''), 1, 80) AS body
        FROM documents)
      SELECT doc_id,
             CAST(len(regexp_extract_all(body, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
             CAST(len(regexp_extract_all(body, '\+[0-9]{1,3}[ 0-9]{6,14}')) AS BIGINT) AS n_phones,
             CAST(len(regexp_extract_all(body, '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b')) AS BIGINT) AS n_ips,
             regexp_replace(regexp_replace(regexp_replace(body,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
               '\+[0-9]{1,3}[ 0-9]{6,14}', '[PHONE]', 'g'),
               '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b', '[IP]', 'g') AS redacted
      FROM b ORDER BY doc_id""",

    // substring-duplication spans (ExactSubstr-for-fixed-L): string word
    // 8-grams WITH positions on the oracle side vs positional FNV hashes
    // on the Spark side (the q39/q42 hash≡string pairing — counts agree
    // absent 64-bit collisions); the island merge is the same fold the
    // engine runs (gap ≤ L chains, L per chain start, gap otherwise),
    // expressed as a lag() gaps-and-islands window. n_tokens keeps q21's
    // non-lowercased count contract; parallel unnest zips (pos, gram).
    "q65_substr_dup_spans" -> """
      WITH toks AS (
        SELECT doc_id,
               regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t,
               CASE WHEN text IS NULL OR trim(regexp_replace(text, '\s+', ' ', 'g')) = '' THEN 0
                    ELSE len(regexp_split_to_array(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ')) END AS n_tokens
        FROM documents),
      g AS (
        SELECT doc_id,
               unnest(range(1, len(t) - 6)) - 1 AS pos,
               unnest(list_transform(range(1, len(t) - 6),
                 i -> array_to_string(t[i:i+7], ' '))) AS ng
        FROM toks WHERE len(t) >= 8),
      dup AS (SELECT ng FROM g GROUP BY ng HAVING count(*) >= 2),
      inc AS (
        SELECT doc_id,
               pos - lag(pos, 1, CAST(-16 AS BIGINT))
                 OVER (PARTITION BY doc_id ORDER BY pos) AS gap
        FROM g JOIN dup USING (ng)),
      agg AS (
        SELECT doc_id,
               CAST(sum(CASE WHEN gap <= 8 THEN gap ELSE 8 END) AS BIGINT) AS dup_tokens,
               CAST(sum(CASE WHEN gap <= 8 THEN 0 ELSE 1 END) AS BIGINT) AS n_spans
        FROM inc GROUP BY doc_id)
      SELECT k.doc_id, CAST(k.n_tokens AS BIGINT) AS n_tokens,
             coalesce(a.dup_tokens, CAST(0 AS BIGINT)) AS dup_tokens,
             coalesce(a.n_spans, CAST(0 AS BIGINT)) AS n_spans,
             CAST(CASE WHEN k.n_tokens = 0 THEN 0
                  ELSE coalesce(a.dup_tokens, 0) * 10000 // k.n_tokens END AS BIGINT) AS dup_frac_x1e4
      FROM toks k LEFT JOIN agg a USING (doc_id)
      ORDER BY k.doc_id""",

    // PMI bigram collocations: adjacent pairs via zipped parallel unnest
    // of the two shifted slices; the PMI double is composed in the SAME
    // parenthesization as the Spark side ((n_ab·N·N) / (B·c_a·c_b)) so
    // IEEE rounding agrees bit-for-bit, and the ×10⁴ half-up floor (q23
    // convention) absorbs ULP noise. ORDER BY is total (pairs unique) so
    // the LIMIT boundary is deterministic; lowercase-ASCII tokens keep
    // string order collation-free.
    "q66_pmi_bigrams" -> """
      WITH toks AS (
        SELECT list_filter(regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
                           x -> x <> '') AS t
        FROM documents),
      pairs AS (
        SELECT unnest(t[1:len(t)-1]) AS a, unnest(t[2:len(t)]) AS b
        FROM toks WHERE len(t) >= 2),
      pc AS (SELECT a, b, CAST(count(*) AS BIGINT) AS n_ab FROM pairs GROUP BY a, b),
      uc AS (SELECT unnest(t) AS w FROM toks),
      cnt AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM uc GROUP BY w),
      nt AS (SELECT CAST(sum(c) AS BIGINT) AS n_tok FROM cnt),
      nb AS (SELECT CAST(sum(n_ab) AS BIGINT) AS n_big FROM pc)
      SELECT a, b, n_ab,
             CAST(floor(ln(
               (CAST(n_ab AS DOUBLE) * CAST(n_tok AS DOUBLE) * CAST(n_tok AS DOUBLE)) /
               (CAST(n_big AS DOUBLE) * CAST(ca.c AS DOUBLE) * CAST(cb.c AS DOUBLE))
             ) * 10000 + 0.5) AS BIGINT) AS pmi_x1e4
      FROM pc JOIN cnt ca ON pc.a = ca.w JOIN cnt cb ON pc.b = cb.w
      CROSS JOIN nt CROSS JOIN nb
      WHERE n_ab >= 5
      ORDER BY pmi_x1e4 DESC, a, b LIMIT 100""",

    // rate-spike anomaly: dense hourly grid per type (generate_series),
    // trailing-24-full-hours window stats as exact integers, z composed
    // in the Spark side's exact parenthesization — ×, −, /, sqrt are all
    // correctly-rounded IEEE ops, so the double (and its half-up ×10⁴
    // floor) is bit-identical; zero-variance windows → NULL z with the
    // any-arrival spike rule.
    "q67_rate_anomaly" -> """
      WITH ev AS (SELECT event_type, date_trunc('hour', ts) AS h FROM events),
      cnt AS (SELECT event_type, h, CAST(count(*) AS BIGINT) AS n
              FROM ev GROUP BY event_type, h),
      b AS (SELECT min(h) AS h0, max(h) AS h1 FROM ev),
      grid AS (
        SELECT t.event_type, unnest(generate_series(b.h0, b.h1, INTERVAL 1 HOUR)) AS h
        FROM (SELECT DISTINCT event_type FROM cnt) t CROSS JOIN b),
      dense AS (
        SELECT g.event_type, g.h, coalesce(c.n, 0) AS n
        FROM grid g LEFT JOIN cnt c ON g.event_type = c.event_type AND g.h = c.h),
      win AS (
        SELECT event_type, h, CAST(n AS BIGINT) AS n,
               count(*) OVER fr AS w, sum(n) OVER fr AS s, sum(n * n) OVER fr AS q
        FROM dense
        WINDOW fr AS (PARTITION BY event_type ORDER BY h
                      ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)),
      z AS (
        SELECT event_type, h, n,
               CAST(n AS DOUBLE) * CAST(w AS DOUBLE) - CAST(s AS DOUBLE) AS num,
               CAST(w AS DOUBLE) * CAST(q AS DOUBLE) -
                 CAST(s AS DOUBLE) * CAST(s AS DOUBLE) AS den2
        FROM win WHERE w = 24)
      SELECT event_type, h, n,
             CASE WHEN den2 <= 0 THEN NULL
                  ELSE CAST(floor(num / sqrt(den2) * 10000 + 0.5) AS BIGINT) END AS z_x1e4,
             CASE WHEN den2 <= 0 THEN num > 0
                  ELSE num / sqrt(den2) >= 3.0 END AS is_spike
      FROM z ORDER BY event_type, h""",

    // best-passage snippet: the NAIVE formulation on purpose (explode
    // positions, RANGE-window hit count per anchor, argmax, join text
    // back) — an independent shape from the engine's per-row fold;
    // integer hit counts and exact snippet strings.
    "q70_best_passage" -> """
      WITH toks AS (
        SELECT doc_id,
               CASE WHEN text IS NULL
                         OR trim(regexp_replace(lower(text), '\s+', ' ', 'g')) = ''
                    THEN CAST([] AS VARCHAR[])
                    ELSE regexp_split_to_array(
                           trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')
               END AS t
        FROM documents),
      g AS (
        SELECT doc_id,
               unnest(range(1, len(t) + 1)) - 1 AS pos,
               unnest(t) AS tok
        FROM toks WHERE len(t) >= 1),
      hits AS (SELECT doc_id, pos FROM g
               WHERE tok IN ('spark', 'window', 'vector')),
      w AS (
        SELECT doc_id, pos,
               count(*) OVER (PARTITION BY doc_id ORDER BY pos
                              RANGE BETWEEN CURRENT ROW AND 31 FOLLOWING) AS nh
        FROM hits),
      best AS (
        SELECT doc_id, pos, nh,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY nh DESC, pos) AS rn
        FROM w)
      SELECT b.doc_id, CAST(b.nh AS BIGINT) AS n_hits,
             CAST(b.pos AS BIGINT) AS start,
             coalesce(array_to_string(
               t[b.pos + 1 : least(b.pos + 32, len(t))], ' '), '') AS snippet
      FROM best b JOIN toks USING (doc_id)
      WHERE rn = 1
      ORDER BY b.doc_id""",

    // characteristic terms: tf·ln(N/df) in the one shared
    // parenthesization (ln's input domain is the ≤N distinct ratios
    // N/df, enumeration-checkable), row_number top-10 per source.
    "q73_tfidf_terms" -> """
      WITH toks AS (
        SELECT source,
               CASE WHEN text IS NULL
                         OR trim(regexp_replace(lower(text), '\s+', ' ', 'g')) = ''
                    THEN CAST([] AS VARCHAR[])
                    ELSE regexp_split_to_array(
                           trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')
               END AS t
        FROM documents WHERE source IS NOT NULL),
      g AS (SELECT source, unnest(t) AS tok FROM toks),
      tf AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS tf
             FROM g GROUP BY source, tok),
      n AS (SELECT CAST(count(DISTINCT source) AS DOUBLE) AS n_src
            FROM documents),
      w AS (SELECT source, tok, tf,
                   CAST(count(*) OVER (PARTITION BY tok) AS BIGINT) AS df
            FROM tf),
      sc AS (SELECT source, tok, tf, df,
                    CAST(floor(ln(n_src / CAST(df AS DOUBLE)) *
                               CAST(tf AS DOUBLE) * 10000 + 0.5)
                         AS BIGINT) AS score_x1e4
             FROM w CROSS JOIN n),
      r AS (SELECT source, tok, tf, df, score_x1e4,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY score_x1e4 DESC, tok) AS rn
            FROM sc)
      SELECT source, tok, tf, df, score_x1e4
      FROM r WHERE rn <= 10
      ORDER BY source, score_x1e4 DESC, tok""",

    // inverted-index build: per-(term, doc) tf + per-term df, posting
    // grain, plain relational form.
    "q74_inverted_index" -> """
      WITH toks AS (
        SELECT doc_id,
               CASE WHEN text IS NULL
                         OR trim(regexp_replace(lower(text), '\s+', ' ', 'g')) = ''
                    THEN CAST([] AS VARCHAR[])
                    ELSE regexp_split_to_array(
                           trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')
               END AS t
        FROM documents),
      g AS (SELECT doc_id, unnest(t) AS term FROM toks),
      tf AS (SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
             FROM g GROUP BY term, doc_id)
      SELECT term, doc_id, tf,
             CAST(count(*) OVER (PARTITION BY term) AS BIGINT) AS df
      FROM tf
      ORDER BY term, doc_id""",

    // vocabulary growth: Heaps-law data card per source — tokens, types,
    // hapax, and the two ratios in exact integer ×10⁴ (BIGINT //).
    "q75_vocab_growth" -> """
      WITH toks AS (
        SELECT source,
               CASE WHEN text IS NULL
                         OR trim(regexp_replace(lower(text), '\s+', ' ', 'g')) = ''
                    THEN CAST([] AS VARCHAR[])
                    ELSE regexp_split_to_array(
                           trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')
               END AS t
        FROM documents WHERE source IS NOT NULL),
      g AS (SELECT source, unnest(t) AS tok FROM toks),
      tf AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS cnt
             FROM g GROUP BY source, tok)
      SELECT source,
             CAST(sum(cnt) AS BIGINT) AS n_tokens,
             CAST(count(*) AS BIGINT) AS n_types,
             CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
             CAST(count(*) * 10000 // sum(cnt) AS BIGINT) AS ttr_x1e4,
             CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) * 10000 // count(*)
                  AS BIGINT) AS hapax_x1e4
      FROM tf GROUP BY source ORDER BY source""",

    // bigram LM: per head token (>= 5 occurrences as a head) the argmax
    // follower and its exact-integer ×10⁴ conditional probability.
    "q76_bigram_lm" -> """
      WITH toks AS (
        SELECT CASE WHEN text IS NULL
                         OR trim(regexp_replace(lower(text), '\s+', ' ', 'g')) = ''
                    THEN CAST([] AS VARCHAR[])
                    ELSE regexp_split_to_array(
                           trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')
               END AS t
        FROM documents),
      filt AS (SELECT t FROM toks WHERE len(t) >= 2),
      idx AS (SELECT t, unnest(range(1, len(t))) AS i FROM filt),
      bg AS (SELECT t[i] AS w1, t[i + 1] AS w2 FROM idx),
      c AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
            FROM bg GROUP BY w1, w2),
      h AS (SELECT w1, w2, c12,
                   CAST(sum(c12) OVER (PARTITION BY w1) AS BIGINT) AS c1
            FROM c),
      r AS (SELECT w1, w2, c1, c12,
                   row_number() OVER (PARTITION BY w1
                                      ORDER BY c12 DESC, w2) AS rn
            FROM h WHERE c1 >= 5)
      SELECT w1, w2, c1, c12,
             CAST(c12 * 10000 // c1 AS BIGINT) AS p_x1e4
      FROM r WHERE rn = 1
      ORDER BY w1""",

    // count-min sketch: content rebuilt relationally at vocabulary grain
    // (FNV token hash + the validated 2-arg xxhash64 row chain), probe
    // estimates = min over the d cells; exact side grouped by hash.
    "q77_cms_freq" -> SketchOracleSql.q77Sql,

    // postings similarity: df-cut tf-idf cosine over the inverted index —
    // integer weights/dots/norms, ONE shared double parenthesization for
    // the cosine, top-100 with a total tiebreak.
    "q78_postings_sim" -> """
      WITH toks AS (
        SELECT doc_id,
               CASE WHEN text IS NULL
                         OR trim(regexp_replace(lower(text), '\s+', ' ', 'g')) = ''
                    THEN CAST([] AS VARCHAR[])
                    ELSE regexp_split_to_array(
                           trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')
               END AS t
        FROM documents),
      g AS (SELECT doc_id, unnest(t) AS term FROM toks),
      tf AS (SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
             FROM g GROUP BY term, doc_id),
      n AS (SELECT CAST(count(*) AS DOUBLE) AS nd FROM documents),
      dfr AS (SELECT term, doc_id, tf,
                     CAST(count(*) OVER (PARTITION BY term) AS BIGINT) AS df
              FROM tf),
      posts AS (
        SELECT term, doc_id,
               tf * CAST(floor(ln(nd / CAST(df AS DOUBLE)) * 10000 + 0.5)
                         AS BIGINT) AS w
        FROM dfr CROSS JOIN n
        WHERE df <= 64),
      norms AS (SELECT doc_id, CAST(sum(w * w) AS BIGINT) AS n2
                FROM posts GROUP BY doc_id
                HAVING sum(w * w) > 0),
      pairs AS (
        SELECT a.doc_id AS d1, b.doc_id AS d2,
               CAST(sum(a.w * b.w) AS BIGINT) AS dot
        FROM posts a JOIN posts b
          ON a.term = b.term AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id)
      SELECT p.d1, p.d2,
             CAST(floor(CAST(p.dot AS DOUBLE) /
                        sqrt(CAST(x.n2 AS DOUBLE) * CAST(y.n2 AS DOUBLE)) *
                        10000 + 0.5) AS BIGINT) AS cos_x1e4
      FROM pairs p
      JOIN norms x ON x.doc_id = p.d1
      JOIN norms y ON y.doc_id = p.d2
      ORDER BY cos_x1e4 DESC, d1, d2
      LIMIT 100""",

    // integer-grid Lloyd k-means: seeds, both rounds, and the final
    // assignment replicated exactly (generated staged SQL).
    "q79_kmeans" -> SemOracleSql.q79Sql,

    // cross-source shared-passage matrix: the verdict stated over gram
    // STRINGS (the grouping the engine's 64-bit gram hash induces —
    // q24/q65's exactness argument), pairs src_a < src_b per gram.
    "q80_shared_passages" -> """
      WITH toks AS (
        SELECT source,
               CASE WHEN text IS NULL
                         OR trim(regexp_replace(lower(text), '\s+', ' ', 'g')) = ''
                    THEN CAST([] AS VARCHAR[])
                    ELSE regexp_split_to_array(
                           trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')
               END AS t
        FROM documents WHERE source IS NOT NULL),
      idx AS (SELECT source, t, unnest(range(1, len(t) - 6)) AS i
              FROM toks WHERE len(t) >= 8),
      grams AS (SELECT DISTINCT source,
                       array_to_string(t[i:i + 7], ' ') AS g
                FROM idx),
      bysrc AS (SELECT g, list_sort(list_distinct(list(source))) AS srcs
                FROM grams GROUP BY g),
      g2 AS (SELECT srcs FROM bysrc WHERE len(srcs) >= 2),
      px AS (SELECT srcs, unnest(range(1, len(srcs) + 1)) AS i FROM g2),
      py AS (SELECT srcs[i] AS src_a, unnest(srcs[i + 1:]) AS src_b FROM px)
      SELECT src_a, src_b, CAST(count(*) AS BIGINT) AS n_shared_grams
      FROM py GROUP BY src_a, src_b
      ORDER BY src_a, src_b""",

    // cohort retention: first-seen-day cohorts, per-offset active counts,
    // exact integer retention fraction (UTC day boundaries both engines).
    "q81_cohort_retention" -> """
      WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
      f AS (SELECT user_id, min(d) AS d0 FROM ud GROUP BY user_id),
      c AS (SELECT d0, CAST(count(*) AS BIGINT) AS cohort_size
            FROM f GROUP BY d0),
      a AS (SELECT f.d0, CAST(ud.d - f.d0 AS BIGINT) AS offset_d,
                   CAST(count(*) AS BIGINT) AS n_active
            FROM ud JOIN f USING (user_id)
            GROUP BY f.d0, ud.d - f.d0)
      SELECT a.d0 AS cohort_day, a.offset_d, c.cohort_size, a.n_active,
             CAST(a.n_active * 10000 // c.cohort_size AS BIGINT)
               AS retained_x1e4
      FROM a JOIN c ON c.d0 = a.d0
      ORDER BY cohort_day, offset_d""",

    // sequential funnel: the naive 3-scan relational form (min view,
    // min click strictly after it, min purchase strictly after that) —
    // the engine's one-pass ordered fold must agree exactly.
    "q82_funnel" -> """
      WITH e AS (SELECT user_id, ts, event_type FROM events
                 WHERE event_type IN ('view', 'click', 'purchase')),
      base AS (SELECT DISTINCT user_id FROM e),
      v AS (SELECT user_id, min(ts) AS t1 FROM e
            WHERE event_type = 'view' GROUP BY user_id),
      c AS (SELECT e.user_id, min(e.ts) AS t2
            FROM e JOIN v USING (user_id)
            WHERE e.event_type = 'click' AND e.ts > v.t1
            GROUP BY e.user_id),
      p AS (SELECT e.user_id, min(e.ts) AS t3
            FROM e JOIN c USING (user_id)
            WHERE e.event_type = 'purchase' AND e.ts > c.t2
            GROUP BY e.user_id),
      n AS (SELECT CAST((SELECT count(*) FROM base) AS BIGINT) AS n_base,
                   CAST((SELECT count(*) FROM v) AS BIGINT) AS n_view,
                   CAST((SELECT count(*) FROM c) AS BIGINT) AS n_click,
                   CAST((SELECT count(*) FROM p) AS BIGINT) AS n_purchase)
      SELECT n_base, n_view, n_click, n_purchase,
             CAST(CASE WHEN n_base = 0 THEN 0
                       ELSE n_view * 10000 // n_base END AS BIGINT)
               AS conv1_x1e4,
             CAST(CASE WHEN n_view = 0 THEN 0
                       ELSE n_click * 10000 // n_view END AS BIGINT)
               AS conv2_x1e4,
             CAST(CASE WHEN n_click = 0 THEN 0
                       ELSE n_purchase * 10000 // n_click END AS BIGINT)
               AS conv3_x1e4
      FROM n""",

    // triangle stats: the q29 cosine edges, degree-ordered orientation,
    // wedge join + closure probe, per-vertex counts — all replicated
    // relationally (the edge membership is q29's value-gated predicate).
    "q83_triangle_stats" -> """
      WITH ed AS (
        SELECT a.vec_id AS u, b.vec_id AS v
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) /
              (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[]))) *
               sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))) >= 0.4),
      deg AS (SELECT x, CAST(count(*) AS BIGINT) AS deg
              FROM (SELECT u AS x FROM ed UNION ALL SELECT v AS x FROM ed)
              GROUP BY x),
      wd AS (SELECT ed.u, ed.v, du.deg AS du, dv.deg AS dv
             FROM ed
             JOIN deg du ON du.x = ed.u
             JOIN deg dv ON dv.x = ed.v),
      o AS (SELECT CASE WHEN du < dv OR (du = dv AND u < v)
                        THEN u ELSE v END AS p,
                   CASE WHEN du < dv OR (du = dv AND u < v)
                        THEN v ELSE u END AS q
            FROM wd),
      tri AS (SELECT e1.p AS a, e1.q AS b, e2.q AS c
              FROM o e1
              JOIN o e2 ON e1.p = e2.p AND e1.q < e2.q
              JOIN ed e3 ON e3.u = least(e1.q, e2.q)
                        AND e3.v = greatest(e1.q, e2.q)),
      tv AS (SELECT x, CAST(count(*) AS BIGINT) AS n_tri
             FROM (SELECT a AS x FROM tri UNION ALL
                   SELECT b AS x FROM tri UNION ALL
                   SELECT c AS x FROM tri)
             GROUP BY x)
      SELECT deg.x AS vec_id, deg.deg,
             CAST(coalesce(tv.n_tri, 0) AS BIGINT) AS n_tri,
             CAST(CASE WHEN deg.deg < 2 THEN 0
                       ELSE coalesce(tv.n_tri, 0) * 2 * 10000 //
                            (deg.deg * (deg.deg - 1)) END AS BIGINT)
               AS clustering_x1e4
      FROM deg LEFT JOIN tv ON tv.x = deg.x
      ORDER BY vec_id"""
  )
}

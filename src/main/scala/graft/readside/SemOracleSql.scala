package graft.readside

/** Generator for q51's DuckDB oracle: replicates the SemDeDup pipeline
  * END-TO-END — deterministic centroid pick, coarse assignment, within-
  * cluster near-dup components — so the semantic-clustering mechanics are
  * value-gated, not just the final projection.
  *
  * Exactness arguments:
  *  - the centroid sample is the engine's `orderBy(xxhash64(vec_id),
  *    vec_id).limit(k)`: Spark's `xxhash64` on a LongType column is XXH64's
  *    8-byte tail with seed 42, replicated here in HUGEINT with the same
  *    32-bit-limb multiply trick as the q27 oracle (`LshOracleSql`,
  *    validated bit-exact against Spark 4.1.2), then compared as SIGNED
  *    64-bit like Spark's sort;
  *  - k = max(4, min(4096, round(√n))) is computed as
  *    `floor(sqrt(n)+0.5)` — exactly `java.lang.Math.round`'s
  *    half-up, immune to DuckDB's banker's rounding;
  *  - assignment replicates the engine's argmax loop `c > best || (c ==
  *    best && cid < bestC)` as `row_number() OVER (... ORDER BY cos DESC,
  *    cid ASC) = 1`, with the cosine written in the engine's exact form
  *    `dot / sqrt(na·nb)` (ExprOps.cosineF / cosineLocal — one sqrt of
  *    the product, not a product of sqrts) over DOUBLE[] casts, the
  *    formulation already hash-gated by q29/q30/q41 on this table;
  *  - components are the q41 oracle's recursive transitive closure
  *    (rep = min reachable id ≡ the engine's min-label fixpoint).
  */
private object SemOracleSql {
  import XxhSqlOps.{chain, M64s}

  private def cosine(a: String, b: String): String =
    s"""(list_dot_product($a, $b) /
          sqrt(list_dot_product($a, $a) * list_dot_product($b, $b)))"""

  // Spark xxhash64(long, seed=42) over input column "h" → output column
  // "hl": the shared validated stage list, seed fixed at the constant 42.
  private def hashLongStages: Seq[(String, String)] =
    XxhSqlOps.hashLongStages("h", "42", "hl", "")

  /** XXH64 of one 8-byte value in column `in` with the seed given as an
    * SQL expression (a column for the chained second value of Spark's
    * multi-argument xxhash64) — the shared XxhSqlOps machinery. */
  private def seededStages(in: String, seedExpr: String, out: String,
      tag: String): Seq[(String, String)] =
    XxhSqlOps.hashLongStages(in, seedExpr, out, tag)

  /** q58's oracle: the SAME Spark-exact xxhash64(long) chain over doc_id,
    * signed compare, bottom-64 — the standalone gate for the consistent-
    * sample primitive q51's centroid pick already uses. */
  val q58Sql: String = {
    val (hlCtes, hlLast) = chain("ids", Seq("doc_id", "h"), hashLongStages, "sx")
    s"""
      WITH ids AS (SELECT doc_id, CAST(doc_id AS HUGEINT) AS h FROM documents),
      $hlCtes,
      hsigned AS (
        SELECT doc_id,
               hl - CASE WHEN hl >= ${BigInt(1) << 63} THEN $M64s
                         ELSE 0::HUGEINT END AS hs
        FROM $hlLast)
      SELECT doc_id, CAST(hs AS BIGINT) AS h64
      FROM hsigned
      ORDER BY hs, doc_id
      LIMIT 64"""
  }

  /** q59's oracle: same xxhash64 chain, Spark-pmod bucket (((hs % 100) +
    * 100) % 100 ≡ Spark's pmod on the signed value), CASE split label. */
  val q59Sql: String = {
    val (hlCtes, hlLast) = chain("ids", Seq("doc_id", "h"), hashLongStages, "sx")
    s"""
      WITH ids AS (SELECT doc_id, CAST(doc_id AS HUGEINT) AS h FROM documents),
      $hlCtes,
      hsigned AS (
        SELECT doc_id,
               hl - CASE WHEN hl >= ${BigInt(1) << 63} THEN $M64s
                         ELSE 0::HUGEINT END AS hs
        FROM $hlLast)
      SELECT doc_id,
             CAST(((hs % 100) + 100) % 100 AS BIGINT) AS bucket,
             CASE WHEN ((hs % 100) + 100) % 100 < 90 THEN 'train'
                  WHEN ((hs % 100) + 100) % 100 < 95 THEN 'valid'
                  ELSE 'test' END AS split
      FROM hsigned
      ORDER BY doc_id"""
  }

  /** q68's oracle: weight = least(8, 1 + bytes//512), per-replica
    * Spark-exact TWO-argument xxhash64(doc_id, r) — XXH64(r, seed =
    * XXH64(doc_id, 42)), the q62 seeded-chain form, so no arithmetic on
    * ids that could overflow or collide — signed min per doc, bottom-64
    * by (key, doc_id). DuckDB's `strlen` is bytes (Spark's
    * octet_length); `//` is floor division on BIGINT. */
  val q68Sql: String = {
    val (c1, last1) = chain("ids", Seq("doc_id", "wt", "h", "h2"),
      seededStages("h", "42", "hl", "a"), "sx")
    val (c2, last2) = chain(last1, Seq("doc_id", "wt", "h2", "hl"),
      seededStages("h2", "hl", "hl2", "b"), "sy")
    s"""
      WITH w AS (
        SELECT doc_id,
               least(8, 1 + coalesce(strlen(text), 0) // 512) AS wt
        FROM documents),
      reps AS (SELECT doc_id, wt, unnest(range(0, wt)) AS r FROM w),
      ids AS (SELECT doc_id, wt, CAST(doc_id AS HUGEINT) AS h,
                     CAST(r AS HUGEINT) AS h2
              FROM reps),
      $c1,
      $c2,
      hsigned AS (
        SELECT doc_id, wt,
               hl2 - CASE WHEN hl2 >= ${BigInt(1) << 63} THEN $M64s
                          ELSE 0::HUGEINT END AS hs
        FROM $last2)
      SELECT doc_id, CAST(wt AS BIGINT) AS wt, CAST(min(hs) AS BIGINT) AS key64
      FROM hsigned
      GROUP BY doc_id, wt
      ORDER BY min(hs), doc_id
      LIMIT 64"""
  }

  /** q69's oracle: same tokenization as the q65/q66 oracles (collapse
    * \s+ → single space, trim, split), two Spark-exact TWO-argument
    * xxhash64(doc_id, k) cuts via the q62 seeded chain (no id
    * arithmetic; unnested to rows, pivoted back), Spark's pmod as
    * ((hs % m) + m) % m, DuckDB 1-based inclusive list slices ≡
    * Spark's slice(start, length) for these bounds, and the identical
    * sentinel concat. */
  val q69Sql: String = {
    val (c1, last1) = chain("ids", Seq("doc_id", "k", "h", "h2"),
      seededStages("h", "42", "hl", "a"), "sx")
    val (c2, last2) = chain(last1, Seq("doc_id", "k", "h2", "hl"),
      seededStages("h2", "hl", "hl2", "b"), "sy")
    s"""
      WITH toks AS (
        SELECT doc_id,
               CASE WHEN text IS NULL
                         OR trim(regexp_replace(text, '\\s+', ' ', 'g')) = ''
                    THEN CAST([] AS VARCHAR[])
                    ELSE regexp_split_to_array(
                           trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')
               END AS t
        FROM documents),
      nn AS (SELECT doc_id, t, len(t) AS n FROM toks),
      reps AS (SELECT doc_id, unnest([0, 1]) AS k FROM nn),
      ids AS (SELECT doc_id, k, CAST(doc_id AS HUGEINT) AS h,
                     CAST(k AS HUGEINT) AS h2
              FROM reps),
      $c1,
      $c2,
      hsigned AS (
        SELECT doc_id, k,
               hl2 - CASE WHEN hl2 >= ${BigInt(1) << 63} THEN $M64s
                          ELSE 0::HUGEINT END AS hs
        FROM $last2),
      cuts AS (
        SELECT doc_id,
               max(CASE WHEN k = 0 THEN hs END) AS h0,
               max(CASE WHEN k = 1 THEN hs END) AS h1
        FROM hsigned GROUP BY doc_id),
      ab AS (
        SELECT nn.doc_id, nn.t, nn.n,
               CAST(((h0 % (n + 1)) + (n + 1)) % (n + 1) AS BIGINT) AS a,
               CAST(((h1 % (n + 1)) + (n + 1)) % (n + 1) AS BIGINT) AS b
        FROM nn JOIN cuts USING (doc_id)),
      lh AS (
        SELECT doc_id, t, n, least(a, b) AS lo, greatest(a, b) AS hi
        FROM ab)
      SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
             lo, hi,
             '<PRE>' || coalesce(array_to_string(t[1:lo], ' '), '') ||
             '<SUF>' || coalesce(array_to_string(t[hi+1:n], ' '), '') ||
             '<MID>' || coalesce(array_to_string(t[lo+1:hi], ' '), '') AS fim_text
      FROM lh ORDER BY doc_id"""
  }

  /** q71's oracle: same xxhash64 chain over doc_id, per-source signed
    * hash rank, bottom-32 cutoff, then q57's exact nearest-rank picks
    * over the sample — all integer arithmetic. */
  val q71Sql: String = {
    val (hlCtes, hlLast) = chain("ids", Seq("doc_id", "source", "n_chars", "h"),
      hashLongStages, "sx")
    s"""
      WITH ids AS (
        SELECT doc_id, source, n_chars, CAST(doc_id AS HUGEINT) AS h
        FROM documents),
      $hlCtes,
      hsigned AS (
        SELECT doc_id, source, n_chars,
               hl - CASE WHEN hl >= ${BigInt(1) << 63} THEN $M64s
                         ELSE 0::HUGEINT END AS hs
        FROM $hlLast),
      ranked AS (
        SELECT source, doc_id, n_chars,
               row_number() OVER (PARTITION BY source ORDER BY hs, doc_id) AS rh
        FROM hsigned),
      samp AS (SELECT source, doc_id, n_chars FROM ranked WHERE rh <= 32),
      ord AS (
        SELECT source, n_chars,
               row_number() OVER (PARTITION BY source
                                  ORDER BY n_chars, doc_id) AS rn,
               count(*) OVER (PARTITION BY source) AS m
        FROM samp)
      SELECT source, CAST(m AS BIGINT) AS m_sample,
             max(CASE WHEN rn = (m + 1) // 2 THEN n_chars END) AS p50_est,
             max(CASE WHEN rn = (9 * m + 9) // 10 THEN n_chars END) AS p90_est
      FROM ord
      GROUP BY source, m
      ORDER BY source"""
  }

  /** q72's oracle: the KMV estimate rebuilt relationally — per-token
    * FNV-1a folded over the token's CHARACTERS with list_reduce —
    * range/substr/ord all at character granularity, so the fold is
    * well-defined for any input and ≡ the engine's byte fold
    * (ExprOps.fnv64 over UTF-8) exactly on ASCII corpora (the engine's
    * blank-doc single
    * empty-gram case is the [''] token whose fold is the FNV offset
    * basis), DISTINCT per source, unsigned rank, the 256 smallest, and
    * the all-integer HUGEINT estimate — no doubles anywhere. */
  val q72Sql: String = {
    val fnvOffset = BigInt("CBF29CE484222325", 16)
    val fnvPrime = BigInt("100000001B3", 16)
    val fold = XxhSqlOps.mul64(XxhSqlOps.xor64("h", "b"), fnvPrime)
    val num = BigInt(255) * (BigInt(1) << 64)
    s"""
      WITH toks AS (
        SELECT source,
               CASE WHEN trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) = ''
                    THEN ['']
                    ELSE regexp_split_to_array(
                           trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')
               END AS t
        FROM documents WHERE text IS NOT NULL),
      tok AS (SELECT source, unnest(list_distinct(t)) AS s FROM toks),
      hashed AS (
        SELECT source,
               list_reduce(
                 list_prepend(CAST($fnvOffset AS HUGEINT),
                   list_transform(range(1, length(s) + 1),
                     i -> CAST(ord(substr(s, i, 1)) AS HUGEINT))),
                 (h, b) -> $fold) AS h
        FROM tok),
      d AS (SELECT DISTINCT source, h FROM hashed),
      r AS (SELECT source, h,
                   row_number() OVER (PARTITION BY source ORDER BY h) AS rk
            FROM d),
      agg AS (SELECT source, count(*) AS n_sketch, max(h) AS kth
              FROM r WHERE rk <= 256 GROUP BY source)
      SELECT source, CAST(n_sketch AS BIGINT) AS n_sketch,
             CAST(CASE WHEN n_sketch < 256 THEN n_sketch
                       ELSE $num::HUGEINT // kth END AS BIGINT) AS est_distinct
      FROM agg ORDER BY source"""
  }

  /** Shared CTE prefix (q51 + q38): embeddings as DOUBLE[], k = the
    * engine's max(4, min(4096, round(√n))), the hash-ranked centroid pick,
    * and the argmax-cosine coarse assignment — exactly
    * `Queries.coarseQuantize`. */
  private def quantizerCtes: String = {
    val (hlCtes, hlLast) = chain("ids", Seq("vec_id", "h"), hashLongStages, "sx")
    s"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      n AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM e),
      kk AS (SELECT greatest(CAST(4 AS BIGINT), least(CAST(4096 AS BIGINT),
               CAST(floor(sqrt(CAST(nd AS DOUBLE)) + 0.5) AS BIGINT))) AS k
             FROM n),
      ids AS (SELECT vec_id, CAST(vec_id AS HUGEINT) AS h FROM e),
      $hlCtes,
      hsigned AS (
        SELECT vec_id,
               hl - CASE WHEN hl >= ${BigInt(1) << 63} THEN $M64s
                         ELSE 0::HUGEINT END AS hs
        FROM $hlLast),
      cent AS (
        SELECT r.vec_id AS cid, e.v AS cv
        FROM (SELECT vec_id,
                     row_number() OVER (ORDER BY hs, vec_id) AS rn
              FROM hsigned) r
        JOIN e ON e.vec_id = r.vec_id
        WHERE r.rn <= (SELECT k FROM kk)),
      assign AS (
        SELECT vec_id, cid FROM (
          SELECT x.vec_id, c.cid,
                 row_number() OVER (PARTITION BY x.vec_id
                   ORDER BY ${cosine("x.v", "c.cv")} DESC, c.cid ASC) AS rn
          FROM e x CROSS JOIN cent c)
        WHERE rn = 1)"""
  }

  /** q38's oracle: the same quantizer, then the IVF probe — the
    * nprobe = max(2, k/2) centroids nearest the query (cos DESC, cid
    * tiebreak, the engine's `sortBy((-c, cid))`), exact cosine rerank of
    * only their lists, top-10 (q28's output contract, list-restricted). */
  val q38Sql: String = {
    s"""
      WITH
      $quantizerCtes,
      q AS (SELECT v AS qv FROM e WHERE vec_id = 7),
      probe AS (
        SELECT cid FROM (
          SELECT c.cid,
                 row_number() OVER (ORDER BY ${cosine("c.cv", "q.qv")} DESC,
                   c.cid ASC) AS rn
          FROM cent c CROSS JOIN q)
        WHERE rn <= (SELECT greatest(CAST(2 AS BIGINT), k // 2) FROM kk)),
      scored AS (
        SELECT a.vec_id, ${cosine("e2.v", "q.qv")} AS cos_raw
        FROM assign a
        JOIN probe p ON p.cid = a.cid
        JOIN e e2 ON e2.vec_id = a.vec_id
        CROSS JOIN q)
      SELECT vec_id, round(cos_raw, 6) AS cos
      FROM scored ORDER BY cos_raw DESC, vec_id LIMIT 10"""
  }

  val q51Sql: String = {
    s"""
      WITH RECURSIVE
      $quantizerCtes,
      pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM assign a JOIN assign b
          ON a.cid = b.cid AND a.vec_id < b.vec_id
        JOIN e ea ON ea.vec_id = a.vec_id
        JOIN e eb ON eb.vec_id = b.vec_id
        WHERE ${cosine("ea.v", "eb.v")} >= 0.4),
      edges AS (
        SELECT id_a, id_b FROM pairs UNION SELECT id_b, id_a FROM pairs
      ), reach(a, b) AS (
        SELECT id_a, id_a FROM edges
        UNION
        SELECT r.a, e2.id_b FROM reach r JOIN edges e2 ON r.b = e2.id_a
      ), labels AS (
        SELECT a AS vec_id, min(b) AS rep FROM reach GROUP BY a
      ), sizes AS (
        SELECT rep, count(*) AS cluster_size FROM labels GROUP BY rep
      )
      SELECT x.vec_id, x.cid,
             coalesce(l.rep, x.vec_id) AS group_rep,
             coalesce(s.cluster_size, CAST(1 AS BIGINT)) AS group_size,
             (coalesce(l.rep, x.vec_id) = x.vec_id) AS keep
      FROM assign x
      LEFT JOIN labels l ON l.vec_id = x.vec_id
      LEFT JOIN sizes s ON s.rep = l.rep
      ORDER BY x.vec_id"""
  }

  /** q79's oracle: integer-grid Lloyd replicated round by round —
    * floor(x·10⁶) BIGINT coordinates, the same hash-ranked bottom-8 seed
    * pick, exact integer squared distances (list_reduce with a BIGINT
    * accumulator — list_aggregate 'sum' returns DOUBLE and is avoided),
    * argmin as row_number (dist, cid), centroid update = per-coordinate
    * BIGINT sums floored onto the grid with the sign-safe
    * `(v − pmod) // n`, empty clusters carried forward by LEFT JOIN +
    * coalesce. Two rounds, then the final assignment. */
  val q79Sql: String = {
    val (hlCtes, hlLast) = chain("ids", Seq("vec_id", "h"), hashLongStages, "sx")
    val dist =
      """list_reduce(
           list_prepend(CAST(0 AS BIGINT),
             list_transform(range(1, len(x.q) + 1),
               i -> (x.q[i] - c.c[i]) * (x.q[i] - c.c[i]))),
           (acc, dd) -> acc + dd)"""
    def round(i: Int): String = s"""
      a$i AS (
        SELECT vec_id, q, cid FROM (
          SELECT x.vec_id, x.q, c.cid,
                 row_number() OVER (PARTITION BY x.vec_id
                                    ORDER BY $dist, c.cid) AS rn
          FROM e x CROSS JOIN cent$i c)
        WHERE rn = 1),
      u$i AS (
        SELECT cid, i, CAST(sum(v) AS BIGINT) AS sv,
               CAST(count(*) AS BIGINT) AS n
        FROM (SELECT cid, unnest(q) AS v,
                     unnest(range(1, len(q) + 1)) AS i
              FROM a$i)
        GROUP BY cid, i),
      s$i AS (SELECT cid, list(sv ORDER BY i) AS s, max(n) AS n
              FROM u$i GROUP BY cid),
      cent${i + 1} AS (
        SELECT p.cid,
               coalesce(list_transform(s.s,
                 v -> (v - ((v % s.n) + s.n) % s.n) // s.n), p.c) AS c
        FROM cent$i p LEFT JOIN s$i s ON s.cid = p.cid)"""
    s"""
      WITH e AS (
        SELECT vec_id,
               list_transform(CAST(embedding AS DOUBLE[]),
                 x -> CAST(floor(x * 1000000) AS BIGINT)) AS q
        FROM embeddings),
      ids AS (SELECT vec_id, CAST(vec_id AS HUGEINT) AS h FROM e),
      $hlCtes,
      hsigned AS (
        SELECT vec_id,
               hl - CASE WHEN hl >= ${BigInt(1) << 63} THEN $M64s
                         ELSE 0::HUGEINT END AS hs
        FROM $hlLast),
      cent0 AS (
        SELECT r.vec_id AS cid, e.q AS c
        FROM (SELECT vec_id, row_number() OVER (ORDER BY hs, vec_id) AS rn
              FROM hsigned) r
        JOIN e ON e.vec_id = r.vec_id
        WHERE r.rn <= 8),
      ${round(0)},
      ${round(1)},
      a2 AS (
        SELECT vec_id, cid FROM (
          SELECT x.vec_id, c.cid,
                 row_number() OVER (PARTITION BY x.vec_id
                                    ORDER BY $dist, c.cid) AS rn
          FROM e x CROSS JOIN cent2 c)
        WHERE rn = 1)
      SELECT vec_id, cid FROM a2 ORDER BY vec_id"""
  }
}

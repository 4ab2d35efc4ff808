package graft.readside

/** Generators for the SRP-LSH (q30, q41) and SimHash (q26) DuckDB oracles:
  * the LSH/blocking MECHANICS are replicated bit-for-bit in SQL — same
  * hyperplanes, same bucket keys, same band splits — so the blocking is
  * value-gated, not just the downstream arithmetic (the q27 minhash oracle
  * discipline, `LshOracleSql`).
  *
  * Exactness arguments:
  *  - the hyperplane values u(t,b,i) derive from the engine's `mix` hash
  *    (ExprOps.mix, the murmur3 finalizer) computed here in HUGEINT over
  *    [0, 2^64) with the same 32-bit-limb multiply trick as LshOracleSql,
  *    then `remainderUnsigned(·, 1000003)/1000003.0 - 0.5` in double — the
  *    identical IEEE ops in the identical order;
  *  - projections fold left over ascending dimension exactly like the
  *    engine loop: `list_reduce(list_transform(...), (a,x) -> a+x)` is a
  *    deterministic left fold and `0.0 + x1 = x1`, so the sum association
  *    matches ExprOps.srpBucket's accumulator bit for bit;
  *  - the SRP bit width is an INTEGER computation on both sides
  *    (Queries.srpBitsFor ⇔ the `nb` CTE): no float log2 that could ceil
  *    differently at powers of two;
  *  - the cosine confirm reuses the q29 oracle's formulation, already
  *    hash-gated at the same 0.4 threshold on the same table.
  */
private object SrpOracleSql {
  import XxhSqlOps.{mul64, xor64, shr, M64s}

  // murmur3 finalizer constants (ExprOps.mix)
  private val Pa = BigInt("FF51AFD7ED558CCD", 16)
  private val Pb = BigInt("C4CEB9FE1A85EC53", 16)

  /** CTE block computing hyperplane lists `ul(t, b)` (64 doubles ordered by
    * dimension) for `tables` tables, bits 0 until `maxBits`, table t seeded
    * by `seedSql` (an integer SQL expression in `t`). */
  private def hyperplaneCtes(tables: Int, maxBits: Int, seedSql: String): String = {
    val x0 = xor64(xor64(s"CAST(($seedSql) AS HUGEINT)", "CAST(b * 4294967296 AS HUGEINT)"), "CAST(i AS HUGEINT)")
    val x1 = xor64("x0", shr("x0", 33))
    val x2 = mul64("x1", Pa)
    val x3 = xor64("x2", shr("x2", 33))
    val x4 = mul64("x3", Pb)
    val x5 = xor64("x4", shr("x4", 33))
    s"""
      grid AS (
        SELECT CAST(r1.range AS INT) AS t, CAST(r2.range AS INT) AS b,
               CAST(r3.range AS INT) AS i
        FROM range($tables) r1, range($maxBits) r2, range(64) r3),
      hx0 AS (SELECT t, b, i, $x0 AS x0 FROM grid),
      hx1 AS (SELECT t, b, i, $x1 AS x1 FROM hx0),
      hx2 AS (SELECT t, b, i, $x2 AS x2 FROM hx1),
      hx3 AS (SELECT t, b, i, $x3 AS x3 FROM hx2),
      hx4 AS (SELECT t, b, i, $x4 AS x4 FROM hx3),
      hx5 AS (SELECT t, b, i, $x5 AS x5 FROM hx4),
      hu AS (SELECT t, b, i,
               CAST(x5 % 1000003 AS DOUBLE) / 1000003.0 - 0.5 AS u
             FROM hx5),
      ulists AS (SELECT t, b, list(u ORDER BY i) AS ul FROM hu GROUP BY t, b)"""
  }

  /** Shared CTE block: embeddings as double lists, integer-exact bit
    * width, per-(vec, table) bucket keys. */
  private def bucketCtes(tables: Int, maxBits: Int, seedSql: String): String = s"""
      e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      mrow AS (
        SELECT greatest(CAST(1 AS BIGINT), (count(*) + 31) // 32) AS m FROM e),
      nb AS (
        SELECT coalesce(
          (SELECT CAST(min(rb.range) AS INT) FROM range(4, 25) rb, mrow
           WHERE (CAST(1 AS BIGINT) << CAST(rb.range AS INT)) >= mrow.m), 24) AS nbits),
      ${hyperplaneCtes(tables, maxBits, seedSql).trim},
      proj AS (
        SELECT e.vec_id, u.t, u.b,
               list_reduce(
                 list_transform(range(1, CAST(len(e.v) + 1 AS BIGINT)),
                   j -> e.v[j] * u.ul[j]),
                 (a, x) -> a + x) AS p
        FROM e CROSS JOIN ulists u CROSS JOIN nb WHERE u.b < nb.nbits),
      buckets AS (
        SELECT vec_id, t,
               sum(CASE WHEN p > 0 THEN (CAST(1 AS BIGINT) << CAST(b AS INT))
                        ELSE 0 END) AS bucket
        FROM proj GROUP BY vec_id, t)"""

  private val cosine: (String, String) => String = (a, b) =>
    s"""list_dot_product($a.v, $b.v) /
            (sqrt(list_dot_product($a.v, $a.v)) * sqrt(list_dot_product($b.v, $b.v)))"""

  /** q30: single-table SRP buckets (engine default seed 42), exact cosine
    * re-rank within bucket at ≥ 0.3. */
  val q30Sql: String = s"""
      WITH ${bucketCtes(tables = 1, maxBits = 24, seedSql = "42").trim},
      cand AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM buckets a JOIN buckets b
          ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id)
      SELECT c.id_a, c.id_b, round(${cosine("ea", "eb")}, 6) AS cos
      FROM cand c JOIN e ea ON ea.vec_id = c.id_a JOIN e eb ON eb.vec_id = c.id_b
      WHERE ${cosine("ea", "eb")} >= 0.3
      ORDER BY id_a, id_b"""

  /** q41: 16-table OR-amplified SRP candidates (table t seeded 1000+t),
    * exact cosine confirm ≥ 0.4, then connected components as a recursive
    * transitive closure (rep = min reachable id — the engine's min-label
    * fixpoint). */
  val q41Sql: String = s"""
      WITH RECURSIVE ${bucketCtes(tables = 16, maxBits = 24, seedSql = "1000 + t").trim},
      cand AS (
        SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        FROM buckets a JOIN buckets b
          ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
      pairs AS (
        SELECT c.id_a, c.id_b
        FROM cand c JOIN e ea ON ea.vec_id = c.id_a JOIN e eb ON eb.vec_id = c.id_b
        WHERE ${cosine("ea", "eb")} >= 0.4),
      edges AS (
        SELECT id_a, id_b FROM pairs UNION SELECT id_b, id_a FROM pairs
      ), reach(a, b) AS (
        SELECT id_a, id_a FROM edges
        UNION
        SELECT r.a, e2.id_b FROM reach r JOIN edges e2 ON r.b = e2.id_a
      ), labels AS (
        SELECT a AS vec_id, min(b) AS cluster_rep FROM reach GROUP BY a
      )
      SELECT l.vec_id, l.cluster_rep, s.cluster_size
      FROM labels l
      JOIN (SELECT cluster_rep, count(*) AS cluster_size
            FROM labels GROUP BY cluster_rep) s USING (cluster_rep)
      ORDER BY l.vec_id"""
}

/** q26's DuckDB oracle: SimHash64 replicated bit-for-bit — whitespace
  * tokenization (the engine splits on ASCII ' ', \t, \n, \r, \f, ),
  * FNV-1a 64 over every token OCCURRENCE (duplicates vote again), per-bit
  * +1/-1 votes, sign → bit, blank text → 0 — then the engine's pigeonhole
  * 4×16-bit band split and hamming ≤ 3 filter. Unbounded-length FNV runs
  * as a deterministic `list_reduce` left fold in HUGEINT (the q27 oracle's
  * arithmetic, freed from its fixed-width stage chain). */
private object SimhashOracleSql {
  import XxhSqlOps.{mul64, xor64}

  private val FnvOffset = BigInt("CBF29CE484222325", 16)
  private val FnvPrime = BigInt("100000001B3", 16)

  val q26Sql: String = {
    // FNV-1a fold over the token's chars (ASCII corpus: char code = byte)
    val fnvStep = mul64(xor64("acc", "ascii(substr(tok, CAST(j AS INT), 1))"), FnvPrime)
    s"""
      WITH toks AS (
        SELECT doc_id, unnest(list_filter(
                 string_split_regex(text, '[ \\t\\n\\r\\f\\x0B]+'),
                 x -> length(x) > 0)) AS tok
        FROM documents WHERE text IS NOT NULL),
      th AS (
        -- left fold seeded by prepending the FNV offset basis: list_reduce
        -- with no init uses the first element as the accumulator, so the
        -- lambda fires exactly once per character position j = 1..len
        SELECT doc_id,
               list_reduce(
                 list_prepend(CAST($FnvOffset AS HUGEINT),
                   list_transform(range(1, CAST(length(tok) + 1 AS BIGINT)),
                     j -> CAST(j AS HUGEINT))),
                 (acc, j) -> $fnvStep) AS h
        FROM toks),
      -- powers of two as HUGEINT via double pow: 2^b is exactly
      -- representable in double for every b ≤ 63, so the cast is exact
      votes AS (
        SELECT doc_id, CAST(rb.range AS INT) AS b,
               sum(CASE WHEN (h // CAST(power(2, rb.range) AS HUGEINT)) % 2 = 1
                        THEN 1 ELSE -1 END) AS v
        FROM th, range(64) rb GROUP BY doc_id, b),
      sh AS (
        SELECT doc_id,
               sum(CASE WHEN v > 0 THEN CAST(power(2, b) AS HUGEINT)
                        ELSE CAST(0 AS HUGEINT) END) AS hu
        FROM votes GROUP BY doc_id),
      shall AS (
        -- docs with no tokens (blank text) hash to 0, like the engine
        SELECT d.doc_id, coalesce(s.hu, CAST(0 AS HUGEINT)) AS hu
        FROM documents d LEFT JOIN sh s ON d.doc_id = s.doc_id
        WHERE d.text IS NOT NULL),
      chunks AS (
        SELECT doc_id, hu, CAST(rc.range AS INT) AS chunk_i,
               CAST((hu // CAST(power(2, rc.range * 16) AS HUGEINT)) % 65536 AS BIGINT) AS chunk_v
        FROM shall, range(4) rc)
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(bit_count(xor(CAST(a.hu AS UBIGINT), CAST(b.hu AS UBIGINT))) AS INT) AS hamming
      FROM chunks a JOIN chunks b
        ON a.chunk_i = b.chunk_i AND a.chunk_v = b.chunk_v AND a.doc_id < b.doc_id
      WHERE bit_count(xor(CAST(a.hu AS UBIGINT), CAST(b.hu AS UBIGINT))) <= 3
      ORDER BY id_a, id_b"""
  }
}

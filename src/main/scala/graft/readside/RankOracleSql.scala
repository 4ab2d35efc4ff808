package graft.readside

/** Generator for q53's DuckDB oracle: the SAME fixed-point weighted
  * PageRank, K=10 iterations unrolled as chained CTEs (DuckDB's recursive
  * CTEs disallow aggregates in the recursive term, so power iteration is
  * generated, not recursed — the [[LshOracleSql]] precedent).
  *
  * Exactness argument: every quantity is BIGINT and every division is
  * integer (`//` here, `div` in Spark — both truncate, and all operands
  * are non-negative so truncation ≡ floor on both engines); the per-edge
  * term pins the association `((rank*85) // 100) * w // wsrc` exactly as
  * the Spark side does, so the two engines agree bit-for-bit with no
  * float tolerance anywhere. DuckDB sums of BIGINT widen to HUGEINT, so
  * every aggregate is re-CAST to BIGINT before further arithmetic. Every
  * CTE is `MATERIALIZED`: each round references the previous one twice
  * (contribution join + dangling anti-join), so un-hinted inlining is
  * 2^K copies of the whole chain — measured as a hang at K=10; the
  * hinted plan runs in <1 s.
  */
private object RankOracleSql {
  private val Total = 1000000000000L
  private val Iters = 10

  def q53Sql: String = {
    val header = s"""
      WITH e0 AS MATERIALIZED (
        SELECT user_id % 101 AS src, (event_id * 31 + 7) % 101 AS dst
        FROM events
        WHERE user_id % 101 <> (event_id * 31 + 7) % 101),
      edges AS MATERIALIZED (
        SELECT src, dst, CAST(count(*) AS BIGINT) AS w FROM e0 GROUP BY src, dst),
      outw AS MATERIALIZED (
        SELECT src, CAST(sum(w) AS BIGINT) AS wsrc FROM edges GROUP BY src),
      ew AS MATERIALIZED (
        SELECT e.src, e.dst, e.w, o.wsrc FROM edges e JOIN outw o USING (src)),
      nodes AS MATERIALIZED (
        SELECT src AS node FROM edges UNION SELECT dst FROM edges),
      nn AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
      r0 AS MATERIALIZED (
        SELECT node, $Total // (SELECT n FROM nn) AS rank FROM nodes)"""
    val rounds = (1 to Iters).map { k =>
      val p = k - 1
      s""",
      c$k AS MATERIALIZED (
        SELECT e.dst AS node,
               CAST(sum(((r.rank * 85) // 100) * e.w // e.wsrc) AS BIGINT) AS contrib
        FROM ew e JOIN r$p r ON e.src = r.node GROUP BY e.dst),
      d$k AS MATERIALIZED (
        SELECT COALESCE(CAST(sum((r.rank * 85) // 100) AS BIGINT), 0) AS dmass
        FROM r$p r LEFT JOIN outw o ON r.node = o.src WHERE o.src IS NULL),
      r$k AS MATERIALIZED (
        SELECT n.node,
               (SELECT ${Total * 15L} // (100 * n) FROM nn)
                 + (SELECT dmass // (SELECT n FROM nn) FROM d$k)
                 + COALESCE(c.contrib, 0) AS rank
        FROM nodes n LEFT JOIN c$k c USING (node))"""
    }.mkString
    val footer = s"""
      SELECT n.node AS host_bucket,
             COALESCE(o.wsrc, 0) AS w_out,
             r.rank AS rank_e12
      FROM r$Iters r JOIN nodes n USING (node)
      LEFT JOIN outw o ON n.node = o.src
      ORDER BY rank_e12 DESC, host_bucket"""
    header + rounds + footer
  }
}

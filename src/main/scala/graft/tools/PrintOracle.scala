package graft.tools

/** Dev tool: dump `SparkEntry.oracleSql` entries to files for direct
  * DuckDB iteration (`PrintOracle q41_dedup_clusters ...` writes
  * /tmp/oracle_<name>.sql per argument; no args = all). */
object PrintOracle {
  def main(args: Array[String]): Unit = {
    val m = graft.SparkEntry.oracleSql
    val names = if (args.nonEmpty) args.toSeq else m.keys.toSeq.sorted
    names.foreach { n =>
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"/tmp/oracle_$n.sql"), m(n))
      println(s"wrote /tmp/oracle_$n.sql (${m(n).length} chars)")
    }
  }
}

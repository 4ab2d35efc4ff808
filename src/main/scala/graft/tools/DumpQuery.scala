package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: dump ONE SparkEntry query's result to parquet for a
  * targeted DuckDB comparison (the full gate is graft.Verify +
  * tools/oracle_check.py). Usage:
  * `sbt "runMain graft.tools.DumpQuery q27_minhash_lsh /root/testdata/sf0.01 /tmp/out"`. */
object DumpQuery {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, outDir) = args
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.queries(name)(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    spark.stop()
  }
}

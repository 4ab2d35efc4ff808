package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM-wide session). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // no per-file chmod forks / .crc siblings (graft.fs.FastLocalFileSystem)
      .config("spark.hadoop.fs.file.impl",
        classOf[graft.fs.FastLocalFileSystem].getName)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  def sf(dir: String = "sf0.001"): String = s"/root/testdata/$dir"

  /** Row timestamp value → epoch micros, whatever object Spark hands
    * back (NTZ parquet columns surface as LocalDateTime under the
    * java8 API; TZ columns as Instant; fixtures built from
    * java.sql.Timestamp as Timestamp). NTZ values are read as UTC —
    * the session timezone every graft entry point pins. */
  def tsMicros(v: Any): Long = {
    val ins = v match {
      case l: java.time.LocalDateTime => l.toInstant(java.time.ZoneOffset.UTC)
      case t: java.sql.Timestamp => t.toInstant
      case i: java.time.Instant => i
    }
    ins.getEpochSecond * 1000000L + ins.getNano / 1000
  }
}

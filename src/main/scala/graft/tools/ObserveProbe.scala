package graft.tools

import org.apache.spark.sql.{Observation, SparkSession, functions => F}

/** Scratch experiment runner: verifies whether `Dataset.observe` metrics
  * placed BELOW a `.persist()` boundary surface in the QueryExecution of a
  * downstream action (i.e. whether CollectMetricsExec is found through
  * InMemoryTableScanExec). Decides the shape of the epoch loop's fused
  * metrics (see CrawlLoop). Not part of the engine surface.
  */
object ObserveProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "8")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val obs = Observation("probe")
    val obs2 = Observation("probe2")
    val inner = spark.range(1000).toDF("id")
      .observe(obs, F.count(F.lit(1)).as("n"), F.sum(F.col("id")).as("s"))
      .persist()
    val outer = inner.filter(F.col("id") % 2 === 0)
      .repartition(4, F.col("id"))
      .observe(obs2, F.count(F.lit(1)).as("n2"))
      .persist()
    // action: a THIRD plan reading through both cache levels
    val cnt = outer.groupBy((F.col("id") % 10).as("k")).count().collect().length
    println("downstream rows: " + cnt)
    import scala.concurrent.Await
    import scala.concurrent.duration._
    println("OBSERVED inner: " +
      scala.util.Try(Await.result(obs.future, 5.seconds)))
    println("OBSERVED outer: " +
      scala.util.Try(Await.result(obs2.future, 5.seconds)))
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** Scheduler-health probe: times N trivial one-partition jobs and a few
  * 32-partition shuffles — separates "the machine is slow" from "per-job
  * dispatch latency is inflated" (multi-epoch state queries run hundreds
  * of tiny jobs; scan-heavy queries don't — an inflated per-job constant
  * hits the former multiplicatively). */
object JobLatencyProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(100).count() // warm
    var t0 = System.nanoTime()
    (1 to 100).foreach(_ => spark.range(1).count())
    println(f"[joblat] 100 one-task jobs: ${(System.nanoTime()-t0)/1e6}%.0f ms total")
    t0 = System.nanoTime()
    (1 to 10).foreach(_ => spark.range(100000).repartition(32).groupBy().count().collect())
    println(f"[joblat] 10 shuffle jobs: ${(System.nanoTime()-t0)/1e6}%.0f ms total")
    t0 = System.nanoTime()
    (1 to 5).foreach { i =>
      val d = TempDirs.createFast(s"joblat$i")
      spark.range(10000).write.mode("overwrite").parquet(s"$d/p")
      spark.read.parquet(s"$d/p").count()
      TempDirs.deleteRecursively(d)
    }
    println(f"[joblat] 5 parquet write+read cycles: ${(System.nanoTime()-t0)/1e6}%.0f ms total")
    spark.stop()
  }
}

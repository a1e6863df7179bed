package graft.tools

import org.apache.spark.sql.SparkSession

object JobLatencyProbe2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(100).count()
    val ts = (1 to 30).map { _ =>
      val t0 = System.nanoTime()
      spark.range(1).count()
      (System.nanoTime() - t0) / 1e6
    }
    println("[joblat2] per-job ms: " + ts.map(t => f"$t%.0f").mkString(" "))
    // and a raw RDD job, no SQL layer
    val ts2 = (1 to 30).map { _ =>
      val t0 = System.nanoTime()
      spark.sparkContext.parallelize(Seq(1), 1).count()
      (System.nanoTime() - t0) / 1e6
    }
    println("[joblat2] raw-rdd ms: " + ts2.map(t => f"$t%.0f").mkString(" "))
    spark.stop()
  }
}

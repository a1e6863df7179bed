package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch diagnostics main (not part of the library surface). */
object Debug {
  def main(args: Array[String]): Unit = {
    // simulate the driver's smoke check: default-ish session, entry(), rows>0
    val spark = SparkSession.builder().master("local[4]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rows = graft.SparkEntry.entry(spark).count()
    println(s"[smoke] entry rows: $rows")
    assert(rows > 0)
    spark.stop()
  }
}

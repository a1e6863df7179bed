package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostics main (not part of the library surface). */
object Debug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    val events = graft.Tables.events(spark, sf).select(
      col("user_id").cast("long").as("key"), col("ts").as("t"),
      col("event_id").cast("long").as("id"))
    val orders = graft.Tables.orders(spark, sf).select(
      col("o_custkey").cast("long").as("key"), col("o_orderdate").as("t"),
      col("o_orderkey").cast("long").as("id"))
    val df = graft.plans.AsOf.join(spark, events, orders)
    df.count()
    println("[plan] ===")
    println(df.queryExecution.executedPlan.toString.linesIterator.take(25).mkString("\n"))
    spark.stop()
  }
}

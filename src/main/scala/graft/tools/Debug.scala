package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch diagnostics main (not part of the library surface). */
object Debug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
    df.count()
    val qe = df.queryExecution  // stale; need the count's qe — use listener
    val c = MetricsCollector.attach(spark)
    val df2 = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
    df2.count()
    Thread.sleep(2000)
    // also dump the executed plan of a fresh count
    val cqe = df2.groupBy().count().queryExecution
    cqe.executedPlan.execute()
    println("[debug] collected: " + c.all)
    val plan = cqe.executedPlan
    plan.foreach { n =>
      println(s"[debug] node=${n.nodeName} leaf=${n.children.isEmpty} metrics=${n.metrics.map{case(k,m)=>s"$k=${m.value}"}.mkString(",").take(120)}")
    }
    spark.stop()
  }
}

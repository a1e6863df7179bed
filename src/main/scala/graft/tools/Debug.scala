package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch diagnostics main (not part of the library surface). */
object Debug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val p2 = graft.SparkEntry.queries("q2_filter_project")(spark, dir).queryExecution.executedPlan.toString
    println("[audit] q2 ReadSchema line: " + p2.linesIterator.filter(_.contains("ReadSchema")).mkString(" | ").take(300))
    val pb = graft.SparkEntry.queries("sim_topk_brute")(spark, dir).queryExecution.executedPlan.toString
    println("[audit] brute cos line: " + pb.linesIterator.filter(_.toLowerCase.contains("cosine")).take(1).mkString.take(200))
    val p3 = graft.SparkEntry.queries("q3_join_segment")(spark, dir).queryExecution.executedPlan.toString
    println("[audit] q3 joins: " + p3.linesIterator.filter(_.contains("Join")).map(_.trim.take(80)).mkString("\n[audit]   "))
    spark.stop()
  }
}

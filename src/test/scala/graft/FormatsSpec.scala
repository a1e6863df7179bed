package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Source/sink format coverage beyond parquet: csv, json lines, orc —
  * round-trips preserving schema and values (the K1/K2 writer surface over
  * every built-in format; .jdbc is the same writer API against a DB). */
class FormatsSpec extends SparkSpec {

  private lazy val df = Tables.nation(spark, sf)

  test("csv round-trip with header and explicit schema") {
    val dir = Files.createTempDirectory("graft-fmt").toString
    df.write.mode("overwrite").option("header", "true").csv(s"$dir/n")
    val back = spark.read.option("header", "true")
      .schema(df.schema).csv(s"$dir/n")
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      df.orderBy("n_nationkey").collect().toSeq)
  }

  test("json-lines round-trip") {
    val dir = Files.createTempDirectory("graft-fmt").toString
    df.write.mode("overwrite").json(s"$dir/n")
    val back = spark.read.schema(df.schema).json(s"$dir/n")
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      df.orderBy("n_nationkey").collect().toSeq)
  }

  test("orc round-trip") {
    val dir = Files.createTempDirectory("graft-fmt").toString
    df.write.mode("overwrite").orc(s"$dir/n")
    val back = spark.read.orc(s"$dir/n")
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      df.orderBy("n_nationkey").collect().toSeq)
  }

  test("partitioned parquet write prunes partitions on read") {
    val dir = Files.createTempDirectory("graft-fmt").toString
    Tables.customer(spark, sf).write.mode("overwrite")
      .partitionBy("c_mktsegment").parquet(s"$dir/c")
    val one = spark.read.parquet(s"$dir/c")
      .filter(col("c_mktsegment") === "BUILDING")
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(c_mktsegment") ||
      plan.contains("PartitionFilters: [(c_mktsegment"))
    assert(one.count() ==
      Tables.customer(spark, sf).filter(col("c_mktsegment") === "BUILDING").count())
  }
}

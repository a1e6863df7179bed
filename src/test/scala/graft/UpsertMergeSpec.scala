package graft

import org.apache.spark.sql.functions._

import graft.ops.Relational2

/** Semantic invariants of the CDC merge (q67) on the real sf0.001 fixture —
  * the bitwise result is DuckDB-gated; these assert the per-branch
  * arbitration rules hold, independently recomputed from the raw tables. */
class UpsertMergeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private lazy val merged = Relational2.q67UpsertMerge(spark, dir).cache()

  private lazy val latest = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k").orderBy(col("ts").desc, col("event_id").desc)
    val maxc = Tables.customer(spark, dir).agg(max(col("c_custkey"))).head.getLong(0)
    val maxu = Tables.events(spark, dir).agg(max(col("user_id"))).head.getLong(0)
    val off = maxc - maxu / 2
    Tables.events(spark, dir)
      .select((col("user_id") + off).as("k"), col("ts"), col("event_id"),
        col("event_type"), col("value"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .cache()
  }

  test("deleted keys are absent, and only they are absent among change keys") {
    val deleted = latest.filter(col("event_type") === "error")
      .select(col("k")).collect().map(_.getLong(0)).toSet
    assert(deleted.nonEmpty)
    val outKeys = merged.select(col("custkey")).collect().map(_.getLong(0)).toSet
    assert(deleted.intersect(outKeys).isEmpty)
    val changeKeys = latest.select(col("k")).collect().map(_.getLong(0)).toSet
    assert((changeKeys -- deleted).subsetOf(outKeys))
  }

  test("every branch is populated and rows carry the right op") {
    val ops = merged.groupBy("op").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ops.keySet == Set("insert", "update", "keep"))
    assert(ops.values.forall(_ > 0))
    val custKeys = Tables.customer(spark, dir)
      .select(col("c_custkey")).collect().map(_.getLong(0)).toSet
    val byOp = merged.collect()
      .map(r => (r.getLong(0), r.getString(3))).groupBy(_._2)
    byOp("insert").foreach { case (k, _) => assert(!custKeys.contains(k)) }
    byOp("update").foreach { case (k, _) => assert(custKeys.contains(k)) }
    byOp("keep").foreach { case (k, _) => assert(custKeys.contains(k)) }
  }

  test("updated and inserted balances equal the latest change value, latest-wins") {
    val want = latest.filter(col("event_type") =!= "error")
      .select(col("k"), col("value")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val got = merged.filter(col("op") =!= "keep")
      .select(col("custkey"), col("acctbal")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == want)
  }

  test("kept rows pass the base balance through untouched") {
    val changeKeys = latest.select(col("k")).collect().map(_.getLong(0)).toSet
    val base = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_acctbal")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    merged.filter(col("op") === "keep").collect().foreach { r =>
      val k = r.getLong(0)
      assert(!changeKeys.contains(k))
      assert(r.getDouble(2) == base(k))
    }
  }
}

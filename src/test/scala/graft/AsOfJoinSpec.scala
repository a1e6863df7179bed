package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.plans.AsOf

/** Native as-of join: semantics + plan shape. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  test("as-of semantics: latest ref at-or-before, ties to max id, null if none") {
    val events = Seq(
      (1L, ts(10), 100L), // after refs at 5 and 10 → matches t=10
      (1L, ts(7), 101L),  // between → matches t=5
      (1L, ts(1), 102L),  // before any ref → null
      (2L, ts(30), 103L), // key with no refs → null
    ).toDF("key", "t", "id")
    val refs = Seq(
      (1L, ts(5), 7L),
      (1L, ts(10), 8L),
      (1L, ts(10), 9L), // tie at t=10 → max id 9 wins
    ).toDF("key", "t", "id")
    val out = AsOf.join(spark, events, refs)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(out == Map(100L -> Some(9L), 101L -> Some(7L),
      102L -> None, 103L -> None))
  }

  test("physical plan: AsOfJoinExec with one exchange + sort per side") {
    val events = Tables.events(spark, sf).select(
      col("user_id").cast("long").as("key"), col("ts").as("t"),
      col("event_id").cast("long").as("id"))
    val orders = Tables.orders(spark, sf).select(
      col("o_custkey").cast("long").as("key"), col("o_orderdate").as("t"),
      col("o_orderkey").cast("long").as("id"))
    val df = AsOf.join(spark, events, orders)
    df.count() // force execution (semantics covered above)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin")) // nodeName strips the Exec suffix
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 2)
    assert(plan.split("\n").count(_.trim.startsWith("+- Sort")) >= 2 ||
      plan.contains("Sort ["))
  }

  test("native operator equals the composed window formulation") {
    val native = graft.ops.Temporal.q38AsofNative(spark, sf)
      .collect().map(_.toSeq).toSeq
    val composed = graft.ops.Temporal.q34AsofJoin(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(native == composed)
  }
}

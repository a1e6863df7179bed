package graft

import org.apache.spark.sql.functions._

import graft.ops.Scale

/** Skew salting and bucketed co-located joins. */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("salted join returns exactly the plain join's rows") {
    // skewed left: one hot key with many rows
    val left = ((1 to 500).map(i => (1L, s"hot$i")) ++
      (1 to 50).map(i => (i.toLong % 7 + 2, s"cold$i")))
      .toDF("k", "payload")
    val right = (1L to 10L).map(i => (i, s"dim$i")).toDF("k", "name")
    val plain = left.join(right, Seq("k")).collect()
      .map(_.toSeq).sortBy(_.toString)
    val salted = Scale.saltedJoin(left, right, "k", saltFactor = 8).collect()
      .map(_.toSeq).sortBy(_.toString)
    assert(salted.length == plain.length)
    assert(salted.toSeq == plain.toSeq)
  }

  test("salted join spreads the hot key across salt partitions") {
    val left = (1 to 1000).map(i => (1L, s"v$i")).toDF("k", "payload")
    val salts = left.withColumn("_salt",
      pmod(xxhash64(struct(left.columns.map(col): _*)), lit(8)).cast("int"))
      .select("_salt").distinct().count()
    assert(salts > 4) // the single hot key occupies most of the 8 sub-keys
  }

  test("bucketed join plans with no shuffle exchange on either side") {
    spark.sql("DROP TABLE IF EXISTS graft_bli")
    spark.sql("DROP TABLE IF EXISTS graft_bo")
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("k"), col("l_quantity"))
    val o = Tables.orders(spark, sf)
      .select(col("o_orderkey").as("k"), col("o_totalprice"))
    // the test tables are broadcast-sized; pin the SMJ path so the plan
    // demonstrates what a fact-fact join does at real scale
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Scale.bucketedJoin(spark, li, o, "k", buckets = 8,
        "graft_bli", "graft_bo")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
      // and the join is still correct
      val expected = li.join(o, "k").count()
      assert(joined.count() == expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}

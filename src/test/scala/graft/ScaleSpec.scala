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

  test("detectHotKeys finds exactly the keys above the row threshold") {
    val left = ((1 to 500).map(i => (1L, s"hot$i")) ++
      (1 to 50).map(i => (i.toLong % 10 + 2, s"cold$i")))
      .toDF("k", "payload")
    val hot = ops.Scale.detectHotKeys(left, "k", hotRowThreshold = 100L)
      .as[Long].collect().toSeq
    assert(hot == Seq(1L))
  }

  test("targeted salting matches the plain join and replicates ONLY hot keys") {
    import org.apache.spark.sql.execution.{GenerateExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val left = ((1 to 500).map(i => (1L, s"hot$i")) ++
      (2 to 51).map(i => (i.toLong, s"cold$i")))
      .toDF("k", "payload")
    // 60 dimension rows, 9 of them unmatched on the left
    val right = (1L to 60L).map(i => (i, s"dim$i")).toDF("k", "name")
    val out = Scale.targetedSaltedJoin(left, right, "k",
      saltFactor = 8, hotRowThreshold = 100L)
    val plain = left.join(right, Seq("k")).collect()
      .map(_.toSeq).sortBy(_.toString)
    val got = out.collect().map(_.toSeq).sortBy(_.toString)
    assert(got.toSeq == plain.toSeq)
    // only the hot key pays replication: the salt explode emitted
    // |right_hot| * saltFactor = 1 * 8 rows — the blanket form would have
    // emitted 60 * 8 = 480. Read the Generate node's metric post-execution.
    def generates(p: SparkPlan): Seq[GenerateExec] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec        => Seq(q.plan)
        case o                        => o.children
      }
      (p match { case g: GenerateExec => Seq(g); case _ => Nil }) ++
        kids.flatMap(generates)
    }
    val gens = generates(out.queryExecution.executedPlan)
    assert(gens.nonEmpty, "expected the salt-replication Generate node")
    val replicated = gens.map(_.metrics("numOutputRows").value).sum
    assert(replicated == 8L,
      s"expected 8 replicated right rows (1 hot key x 8 salts), got $replicated")
  }

  test("targeted salting preserves left-outer null extension across the split") {
    // left keys 1 (hot) .. 5, right covers only 1..3 — unmatched left rows
    // must extend with nulls exactly once whichever branch they route to
    val left = ((1 to 200).map(i => (1L, s"hot$i")) ++
      (2 to 5).map(i => (i.toLong, s"cold$i"))).toDF("k", "payload")
    val right = (1L to 3L).map(i => (i, s"dim$i")).toDF("k", "name")
    val out = Scale.targetedSaltedJoin(left, right, "k",
      saltFactor = 4, hotRowThreshold = 50L, joinType = "left_outer")
    val plain = left.join(right, Seq("k"), "left_outer").collect()
      .map(_.toSeq).sortBy(_.toString)
    val got = out.collect().map(_.toSeq).sortBy(_.toString)
    assert(got.toSeq == plain.toSeq)
  }

  test("salt-unsafe join types are rejected, not silently wrong") {
    val df = Seq((1L, "a")).toDF("k", "v")
    intercept[IllegalArgumentException] {
      Scale.saltedJoin(df, df, "k", 4, joinType = "right_outer")
    }
    intercept[IllegalArgumentException] {
      Scale.targetedSaltedJoin(df, df, "k", 4, 10L, joinType = "full_outer")
    }
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

  test("q94 gate query: no Exchange anywhere below the bucketed SortMergeJoin") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = Scale.q94BucketedJoin(spark, sf)
      df.collect()
      def nodes(p: SparkPlan): Seq[SparkPlan] = {
        val kids = p match {
          case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case q: QueryStageExec        => Seq(q.plan)
          case o                        => o.children
        }
        p +: kids.flatMap(nodes)
      }
      val smjs = nodes(df.queryExecution.executedPlan)
        .collect { case j: SortMergeJoinExec => j }
      assert(smjs.nonEmpty, "expected the bucketed SortMergeJoin")
      val shuffles = smjs.flatMap(nodes)
        .collect { case e: ShuffleExchangeLike => e }
      assert(shuffles.isEmpty,
        s"bucketed join sides must read pre-partitioned, found: $shuffles")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}

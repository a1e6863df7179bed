package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Scale-management utilities: skew-salted joins and bucketed co-located
  * joins — the two standard answers to "this shuffle is the bottleneck at
  * 100 TB" that AQE alone doesn't cover.
  */
object Scale {

  /** Skew-salted equi-join of a large, skewed left side against a smaller
    * right side.
    *
    * The hot key's rows all land on one reducer in a plain shuffle join;
    * salting splits each left key into `saltFactor` sub-keys (deterministic
    * per-row salt from a row hash — no RNG, so the plan is reproducible and
    * retry-safe) and replicates each right row to all sub-keys. Shuffle
    * skew drops by ~saltFactor at the cost of saltFactor× the (smaller)
    * right side — the classic trade. AQE's skew-join handles sort-merge
    * cases adaptively; explicit salting also covers hash joins and fixed
    * partitioning, and composes with bucketing.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0)
    val salted = left.withColumn("_salt",
      pmod(xxhash64(struct(left.columns.toIndexedSeq.map(col): _*)), lit(saltFactor)).cast("int"))
    val replicated = right.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFactor - 1)).cast("array<int>")))
    salted.join(replicated, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** Write both sides bucketed+sorted by the join key, then join the
    * bucketed tables: Spark plans a SortMergeJoin with NO Exchange on
    * either side — the co-located join. At 100 TB this converts the
    * biggest recurring fact-fact shuffle into a one-time layout cost that
    * every subsequent join amortizes. Returns the joined plan; callers
    * assert on `.queryExecution` (see ScaleSpec). */
  def bucketedJoin(spark: SparkSession, left: DataFrame, right: DataFrame,
                   key: String, buckets: Int,
                   leftName: String, rightName: String): DataFrame = {
    left.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key).saveAsTable(leftName)
    right.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key).saveAsTable(rightName)
    spark.table(leftName).join(spark.table(rightName), key)
  }

  /** The salted join through the HASH GATE: fact (lineitem) salted-joined
    * to its dimension (orders) on the order key, then aggregated — the
    * oracle computes the PLAIN join, so the gate proves salting is
    * result-transparent (exact same rows, exact decimal revenue) while
    * ScaleSpec separately proves the skew actually spreads. This is the
    * skew-mitigation pattern a 100 TB fact join reaches for when one hot
    * key would otherwise pin a reducer. */
  def q86SaltedJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = graft.Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    val ord = graft.Tables.orders(spark, dir)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    saltedJoin(li, ord, "l_orderkey", saltFactor = 8)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_extendedprice").cast(DecimalType(12, 2)) *
          (lit(1.0) - col("l_discount")).cast(DecimalType(4, 2)))
          .cast("double").as("revenue"))
      .orderBy(col("o_orderpriority"))
  }

  val q86Sql: String =
    """SELECT o_orderpriority, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
      |    * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q86_salted_join" -> (q86SaltedJoin _),
  )

  val oracles: Map[String, String] = Map(
    "q86_salted_join" -> q86Sql,
  )
}

package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Product-analytics operators over the event stream — funnel conversion,
  * cohort retention, and Bloom-prefiltered semi joins. These are the
  * aggregation shapes every events warehouse runs daily; each is one or
  * two hash-partition shuffles keyed on `user_id` (the natural analytics
  * partition axis), so the plans hold at any event volume.
  */
object Analytics {

  /** Funnel conversion: per user, the earliest VIEW, then the earliest
    * click STRICTLY AFTER that view, then the earliest purchase strictly
    * after that click — true sequential matching, not the min-time
    * approximation (which misclassifies a user who clicks both before
    * and after their first view). Three window passes over the same
    * `user_id` hash partitioning — each step's anchor time is a plain
    * column by the time the next window consumes it — so the whole
    * funnel is still ONE shuffle, no joins, no per-step scans. */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    val perUser = Tables.events(spark, dir)
      .withColumn("t_view",
        min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("t_click",
        min(when(col("event_type") === "click" && col("ts") > col("t_view"),
          col("ts"))).over(w))
      .withColumn("t_buy",
        min(when(col("event_type") === "purchase" && col("ts") > col("t_click"),
          col("ts"))).over(w))
      .groupBy(col("user_id"))
      .agg(max(col("t_view")).as("t_view"), max(col("t_click")).as("t_click"),
        max(col("t_buy")).as("t_buy"))
    perUser.agg(
      count(col("t_view")).as("n_view"),
      count(col("t_click")).as("n_view_click"),
      count(col("t_buy")).as("n_view_click_buy"))
  }

  val funnelSql: String =
    """SELECT COUNT(t_view) AS n_view,
      |  COUNT(t_click) AS n_view_click,
      |  COUNT(t_buy) AS n_view_click_buy
      |FROM (
      |  SELECT user_id, MAX(t_view) AS t_view, MAX(t_click) AS t_click,
      |    MAX(t_buy) AS t_buy
      |  FROM (
      |    SELECT user_id, t_view, t_click,
      |      MIN(CASE WHEN event_type = 'purchase' AND ts > t_click THEN ts END)
      |        OVER (PARTITION BY user_id) AS t_buy
      |    FROM (
      |      SELECT user_id, event_type, ts, t_view,
      |        MIN(CASE WHEN event_type = 'click' AND ts > t_view THEN ts END)
      |          OVER (PARTITION BY user_id) AS t_click
      |      FROM (
      |        SELECT user_id, event_type, ts,
      |          MIN(CASE WHEN event_type = 'view' THEN ts END)
      |            OVER (PARTITION BY user_id) AS t_view
      |        FROM events)))
      |  GROUP BY user_id)""".stripMargin

  /** Cohort retention: users are cohorted by the DAY of their first event;
    * each (cohort day, day offset) cell counts the distinct users of that
    * cohort active `offset` days later — the retention triangle. The
    * per-user first day is a WINDOW MIN over the user_id partitioning, not
    * a groupBy+self-join — the events table crosses the wire once, not
    * twice (r7: this halved the events shuffle volume and settled the
    * r6 drift). Distinct-user counts stay exact because (cohort, offset,
    * user) is deduped by the aggregation key, never by a global distinct. */
  def cohort(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"),
        to_date(min(col("ts")).over(w)).as("cohort_day"))
      .groupBy(col("cohort_day"), datediff(col("day"), col("cohort_day")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  val cohortSql: String =
    """SELECT cohort_day, CAST(date_diff('day', cohort_day, day) AS INT) AS day_offset,
      |  COUNT(DISTINCT user_id) AS n_users
      |FROM (SELECT user_id, CAST(ts AS DATE) AS day FROM events) e
      |JOIN (SELECT user_id, CAST(MIN(ts) AS DATE) AS cohort_day
      |      FROM events GROUP BY user_id) f USING (user_id)
      |GROUP BY cohort_day, day_offset
      |ORDER BY cohort_day, day_offset""".stripMargin

  /** Bloom-prefiltered semi join — the runtime-filter pattern for the
    * "big fact ⋈ selective dimension" shape: build a Bloom filter over
    * the dimension keys (distributed aggregate via Spark's public sketch
    * API), broadcast it, and drop non-matching fact rows BEFORE the
    * shuffle; the exact semi join then runs on the survivors. At 100 TB
    * the win is shuffle volume: the fact side sheds (1−selectivity) of
    * its rows for the cost of a scan-side bitmap test, and the false
    * positives (≤1%) are caught by the exact join. The result is
    * identical to the plain semi join — which is exactly what the oracle
    * checks. */
  def bloomSemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val urgent = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val bf = urgent.stat.bloomFilter("o_orderkey", 100000L, 0.01)
    val bfB = spark.sparkContext.broadcast(bf)
    val mightContain = udf((k: Long) => bfB.value.mightContain(k))
    Tables.lineitem(spark, dir)
      .filter(mightContain(col("l_orderkey")))     // cheap pre-shuffle prune
      .join(urgent, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("sum_qty"))
      .orderBy(col("l_returnflag"))
  }

  val bloomSemiJoinSql: String =
    """SELECT l_returnflag, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |WHERE l_orderkey IN (SELECT o_orderkey FROM orders
      |                     WHERE o_orderpriority = '1-URGENT')
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** Incremental aggregate maintenance (materialized-view refresh): the
    * standing per-flag totals are NOT recomputed from scratch when a new
    * batch lands — the base partials (sum, count) merge with the delta
    * partials by addition, and only ratios (avg) are re-derived from the
    * merged state. This is the partial-aggregate algebra Spark's own
    * map-side combine uses, surfaced as an operator: at 100 TB the
    * refresh touches the delta + a k-row state table, not the fact
    * history. The oracle recomputes from the full table — equality IS
    * the correctness claim (merge(partials) == recompute(whole)).
    * The batch boundary derives from the data (orderkey mod 10) so both
    * sides are non-empty at every scale factor. */
  def incrementalAgg(spark: SparkSession, dir: String): DataFrame = {
    def partial(df: DataFrame): DataFrame = df
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("sum_qty"))
    val li = Tables.lineitem(spark, dir)
    val base = partial(li.filter(col("l_orderkey") % 10 =!= 0))
    val delta = partial(li.filter(col("l_orderkey") % 10 === 0))
    base.unionByName(delta)
      .groupBy(col("l_returnflag"))
      .agg(sum(col("n")).as("n"),
        sum(col("sum_qty").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("sum_qty"))
      .withColumn("avg_qty", col("sum_qty") / col("n"))
      .orderBy(col("l_returnflag"))
  }

  val incrementalAggSql: String =
    """SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** Count-Min heavy hitters over the token stream: one distributed CMS
    * build (O(d·w) state per task, merged by addition), then the exact
    * top-10 tokens with their sketch estimates beside the true counts.
    * Rows-only in the gate (the sketch is hash-family-specific, like
    * minhash/simhash); the spec pins the CMS guarantees — every estimate
    * ≥ its true count, within εN, and two half-corpus sketches merged
    * equal the one-pass sketch EXACTLY (merge is vector addition). */
  def cmsHeavyHitters(spark: SparkSession, dir: String,
                      d: Int = 4, w: Int = 512): DataFrame = {
    import org.apache.spark.sql.Encoders
    val toks = Tables.documents(spark, dir)
      .select(explode(filter(split(col("text"), " "), t => t =!= lit(""))).as("token"))
    val cms = udaf(new graft.functions.CountMinAggregator(d, w), Encoders.STRING)
    // one-row scalar aggregate — driver-side by design (KMeans k-row precedent)
    val sk = toks.agg(cms(col("token")).as("sk"))
      .collect().head.getSeq[Long](0).toArray
    val est = udf((s: String) => graft.functions.CountMin.estimate(sk, d, w, s))
    toks.groupBy(col("token")).agg(count(lit(1)).as("exact_n"))
      .orderBy(col("exact_n").desc, col("token")).limit(10)
      .withColumn("est_n", est(col("token")))
      .orderBy(col("exact_n").desc, col("token"))
  }

  /** Data profiling — the one-pass table health report (row counts,
    * null fractions, distinct cardinalities, ranges) every ingest job
    * emits before anything downstream trusts the batch. All stats ride a
    * single aggregation (count/countDistinct/min/max are algebraic or
    * two-phase), so profiling costs one scan at any scale; outputs stay
    * in their native types (no number→string casts, which render
    * differently across engines). */
  def profile(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).agg(
      count(lit(1)).as("n_rows"),
      countDistinct(col("user_id")).as("n_users"),
      countDistinct(col("event_type")).as("n_types"),
      sum(col("value").isNull.cast("long")).as("null_values"),
      sum((col("props") === "{}").cast("long")).as("empty_props"),
      min(unix_micros(col("ts"))).as("ts_min_us"),
      max(unix_micros(col("ts"))).as("ts_max_us"),
      min(col("value")).as("value_min"),
      max(col("value")).as("value_max"),
      min(col("event_type")).as("type_first"),
      max(col("event_type")).as("type_last"))

  val profileSql: String =
    """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
      |  CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
      |  CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_values,
      |  CAST(SUM(CASE WHEN props = '{}' THEN 1 ELSE 0 END) AS BIGINT) AS empty_props,
      |  epoch_us(MIN(ts)) AS ts_min_us,
      |  epoch_us(MAX(ts)) AS ts_max_us,
      |  MIN(value) AS value_min,
      |  MAX(value) AS value_max,
      |  MIN(event_type) AS type_first,
      |  MAX(event_type) AS type_last
      |FROM events""".stripMargin

  /** Approximate quantiles per group (Spark's GK-based percentile_approx
    * beside the exact percentile for the same cuts). The sketch is
    * MERGEABLE state: partial summaries combine across partitions — and
    * could be persisted and re-merged across days — so at 100 TB the
    * quantile costs one narrow pass where the exact percentile must
    * shuffle-sort each group. DuckDB's approx sketch is a different
    * implementation, so this is rows-only by the §5.5 contract; the
    * error bound vs exact is asserted in AnalyticsSpec (both columns
    * ride in the output precisely so the spec and a human can see the
    * sketch's error directly). */
  def q88ApproxQuantile(spark: SparkSession, dir: String): DataFrame = {
    val cuts = array(lit(0.5), lit(0.95), lit(0.99))
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(percentile_approx(col("value"), cuts, lit(10000)).as("approx"),
        expr("percentile(value, array(0.5D, 0.95D, 0.99D))").as("exact"))
      .select(col("event_type"),
        element_at(col("approx"), 1).as("p50_approx"),
        element_at(col("exact"), 1).as("p50_exact"),
        element_at(col("approx"), 2).as("p95_approx"),
        element_at(col("exact"), 2).as("p95_exact"),
        element_at(col("approx"), 3).as("p99_approx"),
        element_at(col("exact"), 3).as("p99_exact"))
      .orderBy(col("event_type"))
  }

  // ---------------------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q81_profile"         -> (profile _),
    "q79_cms_topk"        -> ((s: SparkSession, d: String) => cmsHeavyHitters(s, d)),
    "q74_bloom_semi_join" -> (bloomSemiJoin _),
    "q75_funnel"          -> (funnel _),
    "q76_cohort"          -> (cohort _),
    "q78_incr_agg"        -> (incrementalAgg _),
    "q88_approx_quantile" -> (q88ApproxQuantile _),
  )

  val oracles: Map[String, String] = Map(
    "q81_profile"         -> profileSql,
    "q74_bloom_semi_join" -> bloomSemiJoinSql,
    "q75_funnel"          -> funnelSql,
    "q76_cohort"          -> cohortSql,
    "q78_incr_agg"        -> incrementalAggSql,
  )
}

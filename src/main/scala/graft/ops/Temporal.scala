package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Temporal join operators (as-of, range) and distribution aggregates.
  *
  * As-of join follows the SURVEY §7.2 preference order: it is EXPRESSIBLE
  * by composition (tagged union + running last-value window), so no custom
  * SparkStrategy is needed — the composed plan is one shuffle on the join
  * key and one sort, exactly what a dedicated as-of physical operator
  * would do. */
object Temporal {

  /** As-of join: for every event, the most recent order of the same
    * customer at-or-before the event time (ties on order time broken by
    * max orderkey).
    *
    * Composition: tag both sides, union on (key, time), sort each key
    * partition by (time, orders-before-events, orderkey), take the running
    * `last(orderkey, ignoreNulls)`; event rows then carry the latest
    * preceding order. One shuffle (the key), one sort — the canonical
    * as-of dataflow. */
  def q34AsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir).select(
      col("o_custkey").as("key"), col("o_orderdate").as("t"),
      col("o_orderkey").as("orderkey"), lit(1).as("is_order"),
      lit(null).cast("long").as("event_id"))
    val events = Tables.events(spark, dir).select(
      col("user_id").as("key"), col("ts").as("t"),
      lit(null).cast("long").as("orderkey"), lit(0).as("is_order"),
      col("event_id"))
    // at equal t, order rows sort before event rows (is_order desc) so an
    // order at exactly the event time matches; among equal-t orders the
    // largest orderkey sorts last and wins the running last()
    val w = Window.partitionBy(col("key"))
      .orderBy(col("t"), col("is_order").desc, col("orderkey").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders.unionByName(events)
      .withColumn("asof_orderkey", last(col("orderkey"), ignoreNulls = true).over(w))
      .filter(col("is_order") === 0)
      .select(col("event_id"), col("key").as("user_id"), col("asof_orderkey"))
      .orderBy(col("event_id"))
  }

  val q34Sql: String =
    """SELECT e.event_id, e.user_id,
      |  (SELECT MAX(o.o_orderkey) FROM orders o
      |   WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
      |     AND o.o_orderdate = (SELECT MAX(o2.o_orderdate) FROM orders o2
      |                          WHERE o2.o_custkey = e.user_id
      |                            AND o2.o_orderdate <= e.ts)) AS asof_orderkey
      |FROM events e
      |ORDER BY e.event_id""".stripMargin

  /** Range (interval) join: purchases within 15 minutes after each click
    * by the same user. The equi-key (user_id) makes this a hash join +
    * residual range filter — never a cross product. (The original
    * orders-to-events formulation was vacuously empty: orders span
    * 1995–2001 and events are all Jan-2024, so the time domains never
    * overlap; events-to-events overlaps itself by construction — 15
    * click/purchase pairs at sf0.01.)
    *
    * Oracle parity: the ns-precision fixture timestamps are compared at
    * epoch-µs on the DuckDB side because Spark truncates ns → µs on read;
    * comparing raw ns timestamps could flip a boundary pair. */
  def q35RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
    clicks.join(purchases,
        col("user_id") === col("p_user") &&
          col("p_ts") >= col("click_ts") &&
          col("p_ts") < col("click_ts") + expr("INTERVAL 15 MINUTES"))
      .groupBy(col("click_id"))
      .agg(count(lit(1)).as("n_purchases_15m"))
      .orderBy(col("click_id"))
  }

  val q35Sql: String =
    """SELECT a.event_id AS click_id, COUNT(*) AS n_purchases_15m
      |FROM events a JOIN events b
      |  ON a.user_id = b.user_id
      | AND a.event_type = 'click' AND b.event_type = 'purchase'
      | AND epoch_us(b.ts) >= epoch_us(a.ts)
      | AND epoch_us(b.ts) < epoch_us(a.ts) + 900000000
      |GROUP BY a.event_id
      |ORDER BY click_id""".stripMargin

  /** Exact percentiles (linear interpolation — same definition as DuckDB
    * quantile_cont) per group. */
  def q36Percentile(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.5)").as("p50_qty"),
        expr("percentile(l_quantity, 0.9)").as("p90_qty"),
        expr("percentile(l_extendedprice, 0.25)").as("p25_price"))
      .orderBy(col("l_returnflag"))

  val q36Sql: String =
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.5) AS p50_qty,
      |  quantile_cont(l_quantity, 0.9) AS p90_qty,
      |  quantile_cont(l_extendedprice, 0.25) AS p25_price
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** Approximate sketches (HLL++ distinct, quantile sketch) — the
    * constant-memory versions of q17/q36 for 100 TB cardinalities.
    * Sketch internals are engine-specific → rows-only check; the exact
    * twin `q37_exact` below is the oracled bound for these numbers. */
  def q37ApproxSketches(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey")).as("approx_parts"),
        expr("approx_percentile(l_quantity, 0.5, 1000)").as("approx_p50"))
      .orderBy(col("l_returnflag"))

  /** The exact twin of q37's sketches — COUNT(DISTINCT) + interpolated
    * median per group, fully SQL-expressible, hash-checked. Reading the
    * two side by side bounds the sketch error at any SF. */
  def q37Exact(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("exact_parts"),
        expr("percentile(l_quantity, 0.5)").as("exact_p50"))
      .orderBy(col("l_returnflag"))

  val q37ExactSql: String =
    """SELECT l_returnflag,
      |  COUNT(DISTINCT l_partkey) AS exact_parts,
      |  quantile_cont(l_quantity, 0.5) AS exact_p50
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** The same as-of join through the NATIVE custom operator
    * (graft.plans.AsOfJoin: LogicalPlan + SparkStrategy + streaming-merge
    * BinaryExecNode) — one exchange + sort per side, O(1) merge state.
    * Shares q34's oracle: both formulations must hash-match DuckDB. */
  def q38AsofNative(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(spark, dir).select(
      col("user_id").cast("long").as("key"), col("ts").as("t"),
      col("event_id").cast("long").as("id"))
    val orders = Tables.orders(spark, dir).select(
      col("o_custkey").cast("long").as("key"), col("o_orderdate").as("t"),
      col("o_orderkey").cast("long").as("id"))
    graft.plans.AsOf.join(spark, events, orders)
      .select(col("left_id").as("event_id"), col("key").as("user_id"),
        col("asof_right_id").as("asof_orderkey"))
      .orderBy(col("event_id"))
  }

  /** [[q37ApproxSketches]]'s DECISION layer through the HASH GATE (the
    * q88/q62 pattern): sketch values are engine-specific, their
    * published accuracy claims are booleans the gate checks. Per
    * l_returnflag: `cd_ok` — approx_count_distinct (HLL++, default rsd
    * 5 %) within 15 % (3σ) of the exact count; `p50_ok` — the
    * approx_percentile(0.5, accuracy=1000) element's rank interval
    * [#(v < a)/n, #(v ≤ a)/n] intersects 0.5 ± 2/1000 (l_quantity is
    * heavily tied, so the interval is wide — the rank form is the only
    * sound check). Deterministic at the fixture; oracle synthesizes
    * TRUE and cross-checks `exact_parts`/`n`. */
  def q37Bound(spark: SparkSession, dir: String): DataFrame = {
    val ap = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey")).as("acd"),
        expr("approx_percentile(l_quantity, 0.5, 1000)").as("a50"))
    val eps = 2.0 / 1000
    Tables.lineitem(spark, dir)
      .join(broadcast(ap), Seq("l_returnflag"))
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("exact_parts"),
        count(col("l_quantity")).as("n"),
        first(col("acd")).as("acd"),
        sum(when(col("l_quantity") < col("a50"), 1L).otherwise(0L))
          .as("lt50"),
        sum(when(col("l_quantity") <= col("a50"), 1L).otherwise(0L))
          .as("le50"))
      .select(col("l_returnflag"), col("exact_parts"), col("n"),
        (abs(col("acd").cast("double") /
          col("exact_parts").cast("double") - 1.0) <= 0.15).as("cd_ok"),
        (col("lt50") / col("n") <= 0.5 + eps &&
          col("le50") / col("n") >= 0.5 - eps).as("p50_ok"))
      .orderBy(col("l_returnflag"))
  }

  val q37BoundSql: String =
    """SELECT l_returnflag,
      |  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
      |  CAST(COUNT(l_quantity) AS BIGINT) AS n,
      |  TRUE AS cd_ok, TRUE AS p50_ok
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q34_asof_join"   -> (q34AsofJoin _),
    "q35_range_join"  -> (q35RangeJoin _),
    "q36_percentile"  -> (q36Percentile _),
    "q37_approx"      -> (q37ApproxSketches _),
    "q37_exact"       -> (q37Exact _),
    "q37_bound"       -> (q37Bound _),
    "q38_asof_native" -> (q38AsofNative _),
  )

  val oracles: Map[String, String] = Map(
    "q34_asof_join"   -> q34Sql,
    "q35_range_join"  -> q35Sql,
    "q36_percentile"  -> q36Sql,
    "q37_exact"       -> q37ExactSql,
    "q37_bound"       -> q37BoundSql,
    "q38_asof_native" -> q34Sql,
  )
}

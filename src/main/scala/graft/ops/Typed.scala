package graft.ops

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.Tables

/** Typed Dataset[T] surface (SURVEY §1: DataFrame is the primary
  * abstraction because the reference's schema is runtime-discovered;
  * typed helpers exist where compile-time field checks pay for
  * themselves — ETL transforms whose row shape is fixed by the caller).
  *
  * Everything here compiles against the case-class schema: a renamed
  * column in a query is a compile error, not a runtime AnalysisException.
  */
object Typed {

  case class LineItem(l_orderkey: Long, l_partkey: Long, l_suppkey: Long,
                      l_linenumber: Int, l_quantity: Double,
                      l_extendedprice: Double, l_discount: Double,
                      l_tax: Double, l_returnflag: String,
                      l_linestatus: String,
                      l_shipdate: java.sql.Timestamp)

  case class FlagStats(flag: String, n: Long, totalQty: Double,
                       maxPrice: Double)

  def lineitems(spark: SparkSession, dir: String): Dataset[LineItem] = {
    import spark.implicits._
    Tables.lineitem(spark, dir).as[LineItem]
  }

  /** Typed filter + map + groupByKey + typed Aggregator — the Dataset
    * mirror of q1's dataflow with compile-time field access. */
  def flagStats(spark: SparkSession, dir: String): Dataset[FlagStats] = {
    import spark.implicits._
    val qtySum = new Aggregator[LineItem, (Double, Double, Long), (Double, Double, Long)] {
      def zero = (0.0, Double.MinValue, 0L)
      def reduce(b: (Double, Double, Long), a: LineItem) =
        (b._1 + a.l_quantity, math.max(b._2, a.l_extendedprice), b._3 + 1)
      def merge(x: (Double, Double, Long), y: (Double, Double, Long)) =
        (x._1 + y._1, math.max(x._2, y._2), x._3 + y._3)
      def finish(r: (Double, Double, Long)) = r
      def bufferEncoder = implicitly[org.apache.spark.sql.Encoder[(Double, Double, Long)]]
      def outputEncoder = implicitly[org.apache.spark.sql.Encoder[(Double, Double, Long)]]
    }
    lineitems(spark, dir)
      .filter(_.l_quantity > 0)
      .groupByKey(_.l_returnflag)
      .agg(qtySum.toColumn)
      .map { case (flag, (qty, maxPrice, n)) =>
        FlagStats(flag, n, math.rint(qty * 100) / 100, maxPrice)
      }
  }

  /** Typed COGROUP through the hash gate: customers and their orders
    * grouped by key, reconciled in one function that sees BOTH sides'
    * iterators — the typed API for per-key merge logic too imperative
    * for a join (mismatch classification, per-key validation). Plans as
    * one shuffle per side on the key, identical to the equivalent outer
    * join. Monetary values reduce as exact CENTS (round(v·100) longs):
    * a Scala fold over doubles would be iteration-order-dependent, but
    * integer sums commute — so the imperative per-key function is still
    * bitwise-reproducible by the oracle's LEFT JOIN aggregate. Orders
    * referencing no customer are dropped (inner-on-left semantics),
    * mirrored by the oracle's join direction. */
  def q89Cogroup(spark: SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_acctbal"))
      .as[(Long, Double)]
    val orders = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_totalprice"))
      .as[(Long, Double)]
    cust.groupByKey(_._1).cogroup(orders.groupByKey(_._1)) { (k, cs, os) =>
      val bal = cs.map(_._2).toArray
      if (bal.isEmpty) Iterator.empty // order rows with no customer row
      else {
        var n = 0L
        var cents = 0L
        os.foreach { o => n += 1; cents += math.round(o._2 * 100) }
        Iterator((k, math.round(bal.head * 100), n, cents))
      }
    }
      .toDF("custkey", "acctbal_cents", "n_orders", "sum_price_cents")
      .orderBy(col("custkey"))
  }

  val q89Sql: String =
    """SELECT c_custkey AS custkey,
      |  CAST(ROUND(c_acctbal * 100) AS BIGINT) AS acctbal_cents,
      |  COUNT(o_custkey) AS n_orders,
      |  COALESCE(CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT),
      |           0) AS sum_price_cents
      |FROM customer LEFT JOIN orders ON o_custkey = c_custkey
      |GROUP BY c_custkey, c_acctbal
      |ORDER BY custkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] = Map(
    "q89_cogroup" -> (q89Cogroup _),
  )

  val oracles: Map[String, String] = Map(
    "q89_cogroup" -> q89Sql,
  )
}

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
}

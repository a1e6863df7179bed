package graft

import graft.ops.Typed

class TypedSpec extends SparkSpec {
  import spark.implicits._

  test("typed Dataset pipeline matches the untyped aggregation") {
    val typed = Typed.flagStats(spark, sf)
      .collect().map(s => s.flag -> (s.n, s.totalQty)).toMap
    val untyped = Tables.lineitem(spark, sf)
      .filter($"l_quantity" > 0)
      .groupBy($"l_returnflag")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum($"l_quantity").as("q"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), math.rint(r.getDouble(2) * 100) / 100)).toMap
    assert(typed.keySet == untyped.keySet)
    typed.foreach { case (flag, (n, qty)) =>
      assert(untyped(flag)._1 == n)
      assert(math.abs(untyped(flag)._2 - qty) < 1e-6)
    }
  }

  test("typed rows round-trip through the encoder") {
    val first = Typed.lineitems(spark, sf).head()
    assert(first.l_orderkey >= 0 && first.l_quantity > 0)
    assert(Set("A", "N", "R").contains(first.l_returnflag))
  }
}

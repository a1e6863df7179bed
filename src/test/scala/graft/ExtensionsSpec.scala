package graft

import org.apache.spark.sql.catalyst.expressions.{If, Literal}
import org.apache.spark.sql.functions._

import graft.functions.CosineSimilarity.cosine_sim
import graft.functions.{Scored, TopKAggregator}

/** Native expression, SQL registration, optimizer rule, and the typed
  * top-k Aggregator. */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("cosine_sim native expression computes exact cosine (codegen path)") {
    val df = Seq((Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
      (Array(1.0f, 0.0f), Array(2.0f, 0.0f)),
      (Array(3.0f, 4.0f), Array(3.0f, 4.0f))).toDF("a", "b")
    val got = df.select(cosine_sim(col("a"), col("b"))).as[Double].collect()
    assert(got(0) == 0.0 && got(1) == 1.0)
    assert(math.abs(got(2) - 1.0) < 1e-15)
  }

  test("cosine_sim null propagation") {
    val df = Seq((Some(Array(1.0f, 2.0f)), None: Option[Array[Float]]))
      .toDF("a", "b")
    assert(df.select(cosine_sim(col("a"), col("b"))).collect().head.isNullAt(0))
  }

  test("GraftExtensions.register exposes cosine_sim to SQL") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c")
      .as[Double].collect().head
    assert(r == 1.0)
  }

  test("SelfCosineRule rewrites cosine_sim(x, x) to a null-safe literal") {
    val df = Seq(Tuple1(Array(1.0f, 2.0f))).toDF("e")
    val plan = df.select(cosine_sim(col("e"), col("e")).as("c"))
      .queryExecution.analyzed
    val rewritten = SelfCosineRule(plan)
    val exprs = rewritten.expressions.flatMap(_.collect {
      case i: If => i
      case l @ Literal(1.0, _) => l
    })
    assert(exprs.nonEmpty, s"rule did not fire: $rewritten")
    // and the rewrite is value-correct
    assert(spark.sessionState.executePlan(rewritten) // fires through execution
      .executedPlan != null)
  }

  test("TopKAggregator keeps k best with deterministic tie-break") {
    val agg = new TopKAggregator(3)
    val items = Seq(Scored(1, 0.5), Scored(2, 0.9), Scored(3, 0.9),
      Scored(4, 0.1), Scored(5, 0.7))
    val out = items.foldLeft(agg.zero)(agg.reduce)
    assert(out == Seq(Scored(2, 0.9), Scored(3, 0.9), Scored(5, 0.7)))
    // merge of partial buffers gives the same answer as one pass
    val (l, r) = items.splitAt(2)
    val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce),
      r.foldLeft(agg.zero)(agg.reduce))
    assert(merged == out)
  }

  test("aggregator top-k query matches the window-based brute force") {
    val brute = graft.ops.Similarity.bruteForceTopK(spark, sf).collect().toSeq
    val viaAgg = graft.ops.Similarity.aggTopK(spark, sf).collect().toSeq
    assert(viaAgg.map(_.toSeq) == brute.map(_.toSeq))
  }
}

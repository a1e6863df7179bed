package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, If, IsNull, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

import graft.functions.CosineSimilarity

/** SparkSessionExtensions entry point: registers graft's native functions
  * for the SQL surface and installs the optimizer rules.
  *
  * Enable with `spark.sql.extensions=graft.GraftExtensions` (config-time),
  * or call `GraftExtensions.register(spark)` on a live session. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.cosineSimFunction)
    ext.injectOptimizerRule(_ => SelfCosineRule)
  }
}

object GraftExtensions {
  val cosineSimFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cosine_sim"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2, s"cosine_sim takes 2 arguments, got ${exprs.length}")
      CosineSimilarity(exprs.head, exprs(1))
    })

  /** Runtime registration on an existing session (no config needed). */
  def register(spark: SparkSession): Unit =
    org.apache.spark.sql.graft.GraftShim.registerFunction(
      spark, cosineSimFunction._1, cosineSimFunction._2, cosineSimFunction._3)
}

/** Strength reduction: `cosine_sim(x, x)` → `SelfCosine(x)` — one norm²
  * fold instead of three accumulators, BIT-IDENTICAL results (a rewrite to
  * literal 1.0 would be wrong twice over: zero/empty vectors yield NaN via
  * 0/0, and even non-zero vectors yield s/(sqrt(s)·sqrt(s)) which is ≤1 ulp
  * away from 1.0, not exactly 1.0). The rule fires only on deterministic,
  * semantically-equal children, so it can never change query results. */
object SelfCosineRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case CosineSimilarity(a, b) if a.deterministic && a.semanticEquals(b) =>
        graft.functions.SelfCosine(a)
    }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.GraftShim
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Java `String.hashCode` as a native codegen'd expression.
  *
  * The JLS pins this hash (`s[0]*31^(n-1) + s[1]*31^(n-2) + … + s[n-1]`
  * over UTF-16 code units, 32-bit wraparound), which makes it the repo's
  * cross-engine twin hash: the ETL enrichment reproduces it in DuckDB as
  * a `list_reduce` (`EtlPipeline`), and the CDC secondary index routes
  * postings with it ([[graft.ops.CdcUpsert.indexBucketOf]]). This
  * expression is the SPARK side of that twin — routing a posting frame
  * through it is plan-size O(1) where the former distinct-value
  * `when`-chain was O(|domain|) and needed a driver collect to build
  * (ADVICE r10): with it, a 10k-distinct-value index attribute routes
  * with the same two-instruction plan as a 3-value one. */
case class JavaStringHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"java_string_hash expects string, got $other")
  }

  override def nullSafeEval(s: Any): Any =
    java.lang.Integer.valueOf(s.asInstanceOf[UTF8String].toString.hashCode)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $s.toString().hashCode();")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object JavaStringHash {
  /** Column-API entry point: `java_string_hash($"v")`. */
  def java_string_hash(v: Column): Column =
    GraftShim.column(JavaStringHash(GraftShim.expression(v)))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.GraftShim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native codegen'd random-hyperplane LSH signature (Charikar STOC 2002)
  * over a float/double array column.
  *
  * Why an Expression and not the UDF it replaces: the UDF pays a per-row
  * encoder conversion (ArrayData → boxed Array[Float]) before the kernel
  * even runs, and breaks the WholeStageCodegen span of the scan it sits
  * on. `doGenCode` emits a single static call into the cached-plane
  * kernel, which reads the ArrayData in place — the signature stage of
  * every LSH query is a full corpus scan, so this is the hot path at
  * 100 TB (SURVEY §7.2 extension tier b).
  *
  * `table`/`bits` are plan-time constants (they parameterize the plane
  * matrix, which is cached per executor JVM by VectorKernels.planes);
  * the element-type dispatch is resolved once at analysis time. */
case class LshSignature(child: Expression, table: Int, bits: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_sig expects array<float> or array<double>, got $other")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any): Any =
    java.lang.Long.valueOf(VectorKernels.lshSigArrayData(
      a.asInstanceOf[ArrayData], table, bits, isFloat))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.VectorKernels.lshSigArrayData($a, $table, $bits, $isFloat);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshSignature {
  /** Column-API entry point: `lsh_sig($"embedding", table, bits)`. */
  def lsh_sig(v: Column, table: Int, bits: Int): Column =
    GraftShim.column(LshSignature(GraftShim.expression(v), table, bits))
}

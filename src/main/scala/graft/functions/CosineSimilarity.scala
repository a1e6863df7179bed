package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.GraftShim
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType, NumericType}

/** Native codegen'd cosine similarity over two numeric arrays.
  *
  * Why a Catalyst Expression and not a HOF chain or UDF: the
  * `aggregate`/`zip_with` lambda formulation is CodegenFallback
  * (interpreted, boxed per element), and a Scala UDF pays
  * serialization/encoder overhead per row. `doGenCode` emits a tight
  * primitive loop inside WholeStageCodegen — the preferred extension tier
  * for scalar functions (SURVEY §7.2).
  *
  * Semantics: dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b))) with all three
  * accumulators folded left in index order, each element widened to
  * double first — the exact IEEE754 operation sequence of the generated
  * oracle SQL, so results are bit-identical to DuckDB's chain expression.
  * Null if either array is null; arrays must have equal length (query
  * plans guarantee this; mismatch raises at runtime). */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(l: NumericType, _), ArrayType(r: NumericType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cosine_sim expects two numeric arrays, got ${left.dataType} / ${right.dataType}")
    }
  }

  private def elemType(e: Expression): NumericType =
    e.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[NumericType]

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = xs.numElements()
    require(ys.numElements() == n,
      s"cosine_sim: length mismatch $n vs ${ys.numElements()}")
    val lt = elemType(left)
    val rt = elemType(right)
    def get(arr: ArrayData, t: NumericType, i: Int): Double = t match {
      case FloatType  => arr.getFloat(i).toDouble
      case DoubleType => arr.getDouble(i)
      case _          => arr.getLong(i).toDouble
    }
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = get(xs, lt, i)
      val y = get(ys, rt, i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(arr: String, t: NumericType, i: String): String = t match {
      case FloatType  => s"(double) $arr.getFloat($i)"
      case DoubleType => s"$arr.getDouble($i)"
      case _          => s"(double) $arr.getLong($i)"
    }
    val lt = elemType(left)
    val rt = elemType(right)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |final int $n = $a.numElements();
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $x = ${getter(a, lt, i)};
         |  final double $y = ${getter(b, rt, i)};
         |  $dot += $x * $y;
         |  $na += $x * $x;
         |  $nb += $y * $y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** Column-API entry point: `cosine_sim($"a", $"b")`. */
  def cosine_sim(a: Column, b: Column): Column =
    GraftShim.column(CosineSimilarity(GraftShim.expression(a), GraftShim.expression(b)))
}

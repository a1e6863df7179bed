package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.GraftShim
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, ByteType, DataType, DoubleType, FloatType, IntegerType, LongType, NumericType, ShortType}

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

  // Fixed-width primitive element types only: each has an exact ArrayData
  // getter below. DecimalType is NumericType but has no primitive getter
  // (and a lossy double widening would be silent), so it is rejected here
  // at analysis time rather than corrupting reads at runtime.
  private def supported(t: DataType): Boolean = t match {
    case FloatType | DoubleType | LongType | IntegerType | ShortType | ByteType => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(l, _), ArrayType(r, _)) if supported(l) && supported(r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cosine_sim expects two arrays of float/double/long/int/short/byte, got ${left.dataType} / ${right.dataType}")
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
    // each type uses its own width-correct getter — getLong over an int
    // array would read with an 8-byte stride (garbage/OOB on UnsafeArrayData)
    def get(arr: ArrayData, t: NumericType, i: Int): Double = t match {
      case FloatType   => arr.getFloat(i).toDouble
      case DoubleType  => arr.getDouble(i)
      case LongType    => arr.getLong(i).toDouble
      case IntegerType => arr.getInt(i).toDouble
      case ShortType   => arr.getShort(i).toDouble
      case _           => arr.getByte(i).toDouble
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
      case FloatType   => s"(double) $arr.getFloat($i)"
      case DoubleType  => s"$arr.getDouble($i)"
      case LongType    => s"(double) $arr.getLong($i)"
      case IntegerType => s"(double) $arr.getInt($i)"
      case ShortType   => s"(double) $arr.getShort($i)"
      case _           => s"(double) $arr.getByte($i)"
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

/** `cosine_sim(x, x)` strength-reduced: one norm² fold `s` instead of
  * three, result `s / (sqrt(s) * sqrt(s))` — the EXACT operation sequence
  * the binary expression performs when both sides are the same attribute
  * (dot == na == nb == s), so results are bit-identical, including the
  * NaN for zero/empty vectors (0/0) and the ≤1-ulp-off-1.0 values where
  * sqrt(s)² ≠ s. A plain rewrite to literal 1.0 would change both. */
case class SelfCosine(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    CosineSimilarity(child, child).checkInputDataTypes()

  private def elemType: NumericType =
    child.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[NumericType]

  override def nullSafeEval(a: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val t = elemType
    def get(i: Int): Double = t match {
      case FloatType   => xs.getFloat(i).toDouble
      case DoubleType  => xs.getDouble(i)
      case LongType    => xs.getLong(i).toDouble
      case IntegerType => xs.getInt(i).toDouble
      case ShortType   => xs.getShort(i).toDouble
      case _           => xs.getByte(i).toDouble
    }
    var s = 0.0
    var i = 0
    val n = xs.numElements()
    while (i < n) { val x = get(i); s += x * x; i += 1 }
    java.lang.Double.valueOf(s / (math.sqrt(s) * math.sqrt(s)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getter: String => String = { i =>
      elemType match {
        case FloatType   => s"(double) ARR.getFloat($i)"
        case DoubleType  => s"ARR.getDouble($i)"
        case LongType    => s"(double) ARR.getLong($i)"
        case IntegerType => s"(double) ARR.getInt($i)"
        case ShortType   => s"(double) ARR.getShort($i)"
        case _           => s"(double) ARR.getByte($i)"
      }
    }
    nullSafeCodeGen(ctx, ev, { a =>
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val x = ctx.freshName("x")
      s"""
         |final int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $x = ${getter(i).replace("ARR", a)};
         |  $s += $x * $x;
         |}
         |${ev.value} = $s / (java.lang.Math.sqrt($s) * java.lang.Math.sqrt($s));
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

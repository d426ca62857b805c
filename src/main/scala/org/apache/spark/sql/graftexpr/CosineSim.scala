// Lives in an org.apache.spark.sql subpackage on purpose: ExpectsInputTypes /
// AbstractDataType / ExpressionUtils are private[sql], and this is the
// conventional integration point for third-party Catalyst expression
// libraries (public API pattern, e.g. spark connectors / sedona / frameless).
package org.apache.spark.sql.graftexpr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: cosine similarity of two float vectors,
  * computed in one pass in double precision with whole-stage codegen
  * (builder prompt preference ladder: a codegen'd `Expression` beats a Scala
  * UDF beats anything else for the ANN hot path).
  *
  * vs. the composable `zip_with + aggregate` formulation this needs no
  * intermediate array allocation and no higher-order-function lambda
  * dispatch per element — one fused loop over the two UnsafeArrayData
  * buffers per row (the 100 TB path: cosine against a broadcast query set
  * runs once per corpus row per query).
  *
  * Semantics: dot(a,b)/(|a|·|b|); length mismatch uses the common prefix;
  * zero-norm input yields NaN (same as the SQL-built formulation).
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    dot / math.sqrt(nx * ny)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $a.getFloat($i);
         |  double $yi = (double) $b.getFloat($i);
         |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |}
         |${ev.value} = $dot / java.lang.Math.sqrt($nx * $ny);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  /** Column-API surface: `cosine_sim($"a", $"b")`. */
  def apply(a: Column, b: Column): Column =
    ExpressionUtils.column(
      CosineSim(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}

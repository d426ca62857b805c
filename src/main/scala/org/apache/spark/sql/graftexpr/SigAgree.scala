// Same org.apache.spark.sql subpackage rationale as CosineSim.scala:
// ExpectsInputTypes / ExpressionUtils are private[sql].
package org.apache.spark.sql.graftexpr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expression: fraction of agreeing positions of two MinHash
  * signatures (array<long>) — the standard signature-level Jaccard estimate
  * (Broder 1997, public). Replaces the array-arg Scala UDF in the dedup
  * candidate path: array-typed UDF args pay a per-row catalyst→Scala
  * conversion (measured 6× a stage's cost elsewhere in this repo); this is
  * one fused loop over the two UnsafeArrayData buffers with whole-stage
  * codegen.
  *
  * Semantics match graft.functions.TextAnalysis.estJaccard for equal-length
  * inputs: agree / left.length (NaN when left is empty). Length mismatch
  * compares the common prefix.
  */
case class SigAgree(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sig_agree"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var agree = 0
    var i = 0
    while (i < n) {
      if (x.getLong(i) == y.getLong(i)) agree += 1
      i += 1
    }
    agree.toDouble / x.numElements()
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val agree = ctx.freshName("agree")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $agree = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getLong($i) == $b.getLong($i)) $agree++;
         |}
         |${ev.value} = (double) $agree / (double) $a.numElements();
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SigAgree =
    copy(left = newLeft, right = newRight)
}

object SigAgree {
  /** Column-API surface: `sig_agree($"sig_a", $"sig_b")`. */
  def apply(a: Column, b: Column): Column =
    ExpressionUtils.column(
      SigAgree(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}

// Same org.apache.spark.sql subpackage rationale as CosineSim.scala:
// ExpectsInputTypes / ExpressionUtils are private[sql].
package org.apache.spark.sql.graftexpr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, FloatType, IntegerType}

/** Native Catalyst expression: sign-random-projection LSH signatures
  * (Charikar, STOC 2002 — public) for `nTables` tables of `nBits` planes
  * each, over a float embedding column. One fused loop per row with
  * whole-stage codegen — replaces a Seq[Float]-arg Scala UDF that paid a
  * per-row catalyst→Scala conversion plus boxing on the ANN index hot path
  * (the corpus-side signature pass dominates `lshTopK`).
  *
  * `planes` is the flattened hyperplane matrix laid out as
  * [(table*nBits + bit)*dim + d]; semantics match the previous UDF exactly:
  * dot over the common prefix of (embedding, plane), `sig |= 1<<bit` when
  * dot >= 0.
  */
case class LshSignatures(child: Expression, planes: Array[Double],
    nBits: Int, nTables: Int, dim: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(planes.length == nBits * nTables * dim,
    s"planes length ${planes.length} != $nBits*$nTables*$dim")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lsh_signatures"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), dim)
    val sigs = new Array[Int](nTables)
    var t = 0
    while (t < nTables) {
      var sig = 0
      var b = 0
      while (b < nBits) {
        val off = (t * nBits + b) * dim
        var dot = 0.0
        var d = 0
        while (d < n) { dot += x.getFloat(d) * planes(off + d); d += 1 }
        if (dot >= 0) sig |= (1 << b)
        b += 1
      }
      sigs(t) = sig
      t += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sigs)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val planesRef = ctx.addReferenceObj("planes", planes, "double[]")
      val n = ctx.freshName("n")
      val sigs = ctx.freshName("sigs")
      val t = ctx.freshName("t")
      val b = ctx.freshName("b")
      val d = ctx.freshName("d")
      val off = ctx.freshName("off")
      val dot = ctx.freshName("dot")
      val sig = ctx.freshName("sig")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $dim);
         |int[] $sigs = new int[$nTables];
         |for (int $t = 0; $t < $nTables; $t++) {
         |  int $sig = 0;
         |  for (int $b = 0; $b < $nBits; $b++) {
         |    int $off = ($t * $nBits + $b) * $dim;
         |    double $dot = 0.0;
         |    for (int $d = 0; $d < $n; $d++) {
         |      $dot += (double) $a.getFloat($d) * $planesRef[$off + $d];
         |    }
         |    if ($dot >= 0) $sig |= (1 << $b);
         |  }
         |  $sigs[$t] = $sig;
         |}
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($sigs);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LshSignatures =
    copy(child = newChild)
}

object LshSignatures {
  /** Column-API surface: `lsh_signatures($"embedding", planes, bits, tables, dim)`. */
  def apply(c: Column, planes: Array[Double], nBits: Int, nTables: Int,
      dim: Int): Column =
    ExpressionUtils.column(
      LshSignatures(ExpressionUtils.expression(c), planes, nBits, nTables, dim))
}

// Same org.apache.spark.sql subpackage rationale as CosineSim.scala:
// ExpectsInputTypes / ExpressionUtils are private[sql].
package org.apache.spark.sql.graftexpr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, FloatType, IntegerType}

/** Native Catalyst expression: IVF coarse-quantizer assignment — the index
  * of the centroid with the largest dot product against a float embedding.
  * One fused loop per row inside whole-stage codegen; replaces a
  * Seq[Float]-arg Scala UDF on the corpus-wide IVF paths (Lloyd iterations
  * scan the corpus once per iteration; the index build scans it again), the
  * per-row catalyst→Scala conversion the repo measured at 6× a stage's cost.
  *
  * `cents` is the flattened centroid matrix laid out as [c*dim + d];
  * semantics match Similarity.nearestCentroid exactly: dot over the common
  * prefix of (embedding, centroid), ties broken toward the lower index.
  */
case class NearestCentroid(child: Expression, cents: Array[Double],
    nList: Int, dim: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(cents.length == nList * dim,
    s"cents length ${cents.length} != $nList*$dim")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nearest_centroid"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), dim)
    var best = 0
    var bestDot = Double.NegativeInfinity
    var c = 0
    while (c < nList) {
      var dot = 0.0
      var d = 0
      while (d < n) { dot += x.getFloat(d) * cents(c * dim + d); d += 1 }
      if (dot > bestDot) { bestDot = dot; best = c }
      c += 1
    }
    best
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val centsRef = ctx.addReferenceObj("cents", cents, "double[]")
      val n = ctx.freshName("n")
      val best = ctx.freshName("best")
      val bestDot = ctx.freshName("bestDot")
      val c = ctx.freshName("c")
      val d = ctx.freshName("d")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $dim);
         |int $best = 0;
         |double $bestDot = Double.NEGATIVE_INFINITY;
         |for (int $c = 0; $c < $nList; $c++) {
         |  double $dot = 0.0;
         |  for (int $d = 0; $d < $n; $d++) {
         |    $dot += (double) $a.getFloat($d) * $centsRef[$c * $dim + $d];
         |  }
         |  if ($dot > $bestDot) { $bestDot = $dot; $best = $c; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

object NearestCentroid {
  /** Column-API surface: `nearest_centroid($"embedding", cents, nList, dim)`. */
  def apply(c: Column, cents: Array[Double], nList: Int, dim: Int): Column =
    ExpressionUtils.column(
      NearestCentroid(ExpressionUtils.expression(c), cents, nList, dim))
}

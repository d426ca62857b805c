package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class SigAgreeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def sig(seed: Long): Array[Long] =
    TextAnalysis.minHashSignature(Array.tabulate(40)(i =>
      graft.core.Hashes.mix(seed, i.toLong)))

  test("matches TextAnalysis.estJaccard on generated signatures") {
    val rows = (0 until 20).map { i =>
      // share some shingle hashes between neighbors so agreement varies
      val a = sig(i.toLong)
      val b = if (i % 3 == 0) a.clone() else sig(i.toLong + 1)
      (a, b, TextAnalysis.estJaccard(a, b))
    }
    val got = rows.toDF("a", "b", "expected")
      .select(org.apache.spark.sql.graftexpr.SigAgree($"a", $"b").as("got"),
        $"expected")
      .as[(Double, Double)].collect()
    got.foreach { case (g, e) => assert(g === e) }
  }

  test("interpreted eval agrees with the codegen'd DF path; nulls yield null") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val a = Array(1L, 2L, 3L, 4L)
    val b = Array(1L, 9L, 3L, 7L)
    val interpreted = org.apache.spark.sql.graftexpr.SigAgree(
      Literal.create(a, ArrayType(LongType)),
      Literal.create(b, ArrayType(LongType))).eval(null).asInstanceOf[Double]
    val viaDf = Seq((a, b)).toDF("a", "b")
      .select(org.apache.spark.sql.graftexpr.SigAgree($"a", $"b"))
      .as[Double].head()
    assert(interpreted === 0.5)
    assert(viaDf === 0.5)

    val df = Seq((Some(Array(1L)), Option.empty[Array[Long]])).toDF("a", "b")
    assert(df.select(org.apache.spark.sql.graftexpr.SigAgree($"a", $"b"))
      .collect().head.isNullAt(0))
  }

  test("participates in whole-stage codegen") {
    val df = Seq((Array(1L, 2L), Array(1L, 3L))).toDF("a", "b")
    val plan = df.select(org.apache.spark.sql.graftexpr.SigAgree($"a", $"b"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("sig_agree"), plan)
  }

  test("minHashPairs results are unchanged vs a UDF formulation") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val viaExpr = graft.operators.Dedup.minHashPairs(docs, threshold = 0.5)
      .select("doc_a", "doc_b", "est_jaccard")
      .as[(Long, Long, Double)].collect().toSet
    val estJacUdf = udf((x: Seq[Long], y: Seq[Long]) =>
      TextAnalysis.estJaccard(x.toArray, y.toArray))
    val idx = graft.operators.Dedup.minHashIndex(docs)
    val exploded = idx.select($"doc_id", $"sig",
      posexplode($"bands").as(Seq("band", "band_key")))
    val a = exploded.select($"band", $"band_key",
      $"doc_id".as("doc_a"), $"sig".as("sig_a"))
    val b = exploded.select($"band", $"band_key",
      $"doc_id".as("doc_b"), $"sig".as("sig_b"))
    val viaUdf = a.join(b, Seq("band", "band_key"))
      .filter($"doc_a" < $"doc_b")
      .select($"doc_a", $"doc_b", estJacUdf($"sig_a", $"sig_b").as("est_jaccard"))
      .distinct().filter($"est_jaccard" >= 0.5)
      .as[(Long, Long, Double)].collect().toSet
    // the UDF formulation has no bucket cap; at sf0.001 no bucket exceeds the
    // cap so the sets must be identical
    assert(viaExpr === viaUdf)
  }
}

package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.operators.Similarity

class CosineSimSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("matches the zip_with+aggregate reference formulation on real data") {
    val pairs = emb.select($"vec_id", $"embedding".as("a"))
      .crossJoin(broadcast(emb.filter($"vec_id" < 3)
        .select($"vec_id".as("qid"), $"embedding".as("b"))))
    val rows = pairs.select(
      Similarity.cosine($"a", $"b").as("fast"),
      Similarity.cosineSql($"a", $"b").as("ref"))
      .as[(Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (fast, ref) =>
      assert(math.abs(fast - ref) < 1e-12, s"$fast vs $ref")
    }
  }

  test("matches a driver-side computation and handles identity/orthogonal") {
    val df = Seq(
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f), 1.0),
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f), 0.0),
      (Array(1.0f, 2.0f, 3.0f), Array(-1.0f, -2.0f, -3.0f), -1.0))
      .toDF("a", "b", "expected")
    df.select(Similarity.cosine($"a", $"b").as("got"), $"expected")
      .as[(Double, Double)].collect()
      .foreach { case (got, exp) => assert(math.abs(got - exp) < 1e-12) }
  }

  test("null inputs yield null; interpreted eval agrees with codegen") {
    val df = Seq((Some(Array(1.0f)), Option.empty[Array[Float]]))
      .toDF("a", "b")
    assert(df.select(Similarity.cosine($"a", $"b")).collect().head.isNullAt(0))

    // force the interpreted path and compare against the codegen'd DF path
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val la = Literal.create(Array(0.5f, -1.5f, 2.0f), ArrayType(FloatType))
    val lb = Literal.create(Array(1.0f, 0.25f, -0.75f), ArrayType(FloatType))
    val interpreted = org.apache.spark.sql.graftexpr.CosineSim(la, lb)
      .eval(null).asInstanceOf[Double]
    val viaDf = Seq((Array(0.5f, -1.5f, 2.0f), Array(1.0f, 0.25f, -0.75f)))
      .toDF("a", "b").select(Similarity.cosine($"a", $"b"))
      .as[Double].head()
    assert(interpreted === viaDf)
  }

  test("participates in whole-stage codegen") {
    val plan = emb.select(Similarity.cosine($"embedding", $"embedding"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), plan)
    assert(plan.contains("cosine_sim"), plan)
  }
}

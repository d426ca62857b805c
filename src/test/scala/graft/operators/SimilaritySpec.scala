package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"
  lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet").persist()
  lazy val queries = emb.filter($"vec_id" < 5)

  test("brute-force top-k matches a driver-side recomputation") {
    val got = Similarity.bruteForceTopK(emb, queries, k = 5)
      .select($"query_id", $"neighbor_id", $"cosine", $"rank")
      .as[(Long, Long, Double, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._4).map(_._2).toSeq).toMap

    val all = emb.select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      dot / (na * nb)
    }
    val qs = all.filter(_._1 < 5)
    qs.foreach { case (qid, qv) =>
      val expected = all.filter(_._1 != qid)
        .map { case (id, v) => (id, cos(qv, v)) }
        .sortBy { case (id, c) => (-c, id) }.take(5).map(_._1).toSeq
      assert(got(qid) === expected, s"query $qid")
    }
  }

  test("top-k excludes self and ranks are dense 1..k") {
    val r = Similarity.bruteForceTopK(emb, queries, k = 5)
    assert(r.filter($"query_id" === $"neighbor_id").count() === 0)
    val ranks = r.groupBy($"query_id").agg(collect_list($"rank").as("rk"))
      .select($"rk").as[Seq[Int]].collect()
    ranks.foreach(rk => assert(rk.sorted === (1 to 5)))
  }

  test("LSH ANN: valid results with nonzero recall against brute force") {
    val brute = Similarity.bruteForceTopK(emb, queries, k = 5)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshTopK(emb, queries, k = 5)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    assert(lsh.nonEmpty)
    // LSH neighbors must be genuine vectors, self excluded
    assert(lsh.forall { case (q, n) => q != n })
    val recall = brute.intersect(lsh).size.toDouble / brute.size
    assert(recall > 0.1, s"recall $recall") // 12-bit multi-probe on random 64-d data
  }

  test("hyperplanes are deterministic") {
    val a = Similarity.hyperplanes(4, 8)
    val b = Similarity.hyperplanes(4, 8)
    assert(a.flatten.toSeq === b.flatten.toSeq)
  }
}

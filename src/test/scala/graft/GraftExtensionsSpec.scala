package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The spark.sql.extensions route: a session built with
  * `spark.sql.extensions=graft.GraftExtensions` (as spark-submit would) has
  * the codegen expressions available with NO library call. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("session built with graft.GraftExtensions resolves the codegen functions") {
    val orig = SparkTestSession.spark // ensures the shared SparkContext exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // spark.sql.extensions is a STATIC conf read from the SparkContext at
    // session build — with the shared test context already running, the
    // builder API route (same class, same injection) is the testable path;
    // on a cluster the --conf form applies at spark-submit
    val s = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val cos = s.sql(
        "SELECT cosine_sim(array(float(1.0), float(0.0)), " +
          "array(float(1.0), float(0.0))) AS c")
        .collect().head.getDouble(0)
      assert(math.abs(cos - 1.0) < 1e-12)
      val agree = s.sql(
        "SELECT sig_agree(array(1L,2L,3L,4L), array(1L,9L,3L,4L)) AS a")
        .collect().head.getDouble(0)
      assert(math.abs(agree - 0.75) < 1e-12)
      assert(s.sql("SELECT size(lsh_sigs(array_repeat(0.5F, 64))) AS n")
        .collect().head.getInt(0) === 8)
    } finally {
      SparkSession.setDefaultSession(orig)
      SparkSession.setActiveSession(orig)
    }
  }
}

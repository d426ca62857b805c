package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.core.{Hashes, SyntheticWeb, TextExtract, UrlCanon}

class UdfRegistrySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  lazy val names = UdfRegistry.register(spark)

  test("the whole engine is reachable from spark.sql") {
    names // force registration
    val u = SyntheticWeb.seeds(1).head
    val row = spark.sql(
      s"""SELECT canonicalize_url('http://A.example:80/a/b', '../c#frag') AS canon,
         |  url_host('$u') AS host, url_path('$u') AS path,
         |  url_hash64('$u') AS h,
         |  extract_text(synthetic_html('$u')) AS text,
         |  size(extract_links(synthetic_html('$u'), '$u')) AS n_links,
         |  robots_allowed('User-agent: *\nDisallow: /private\n', 'graft', '/private/x') AS allowed,
         |  lang_id('the cat sat on the mat and it is that for a day') AS lang,
         |  token_count('a b c') AS toks,
         |  simhash64('hello world') AS sh
         |""".stripMargin).head()
    assert(row.getAs[String]("canon") === UrlCanon.canonicalize(
      "http://A.example:80/a/b", "../c#frag").get)
    assert(row.getAs[String]("host") === UrlCanon.hostOf(u))
    assert(row.getAs[Long]("h") === Hashes.xxh64(u))
    assert(row.getAs[String]("text") === TextExtract.extract(SyntheticWeb.htmlFor(u)))
    assert(row.getAs[Int]("n_links") > 0)
    assert(!row.getAs[Boolean]("allowed"))
    assert(row.getAs[String]("lang") === "en")
    assert(row.getAs[Int]("toks") === 3)
  }

  test("xxhash64 parity: url_hash64 UDF == built-in xxhash64 column") {
    names
    val rows = spark.sql(
      "SELECT url_hash64(text) AS a, xxhash64(text) AS b FROM parquet.`/root/testdata/sf0.001/documents.parquet`")
      .as[(Long, Long)].collect()
    rows.foreach { case (a, b) => assert(a === b) }
  }

  test("cosine_sim is callable from SQL as the codegen expression") {
    names
    val v = spark.sql(
      "SELECT cosine_sim(array(cast(1.0 as float), cast(0.0 as float)), array(cast(1.0 as float), cast(0.0 as float))) AS c")
      .as[Double].head()
    assert(math.abs(v - 1.0) < 1e-12)
  }

  test("sig_agree, lsh_sigs and text_profile are callable from SQL") {
    names
    val agree = spark.sql(
      "SELECT sig_agree(array(1L, 2L, 3L, 4L), array(1L, 9L, 3L, 7L)) AS a")
      .as[Double].head()
    assert(agree === 0.5)
    val sigs = spark.sql(
      "SELECT lsh_sigs(array(cast(0.5 as float), cast(-1.5 as float))) AS s")
      .as[Seq[Int]].head()
    assert(sigs.length === 8)
    val prof = spark.sql("SELECT text_profile('the quick brown fox') AS p")
      .select("p.lang_pred", "p.n_tokens").as[(String, Int)].head()
    assert(prof === ("en", 4))
  }
}

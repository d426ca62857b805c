package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.core.{Hashes, SyntheticWeb}
import graft.operators.CrawlRound
import graft.plans.Model.{FrontierEntry, PageRow}

class StreamingCrawlSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def mkPages(n: Int, seed: Long): Seq[PageRow] =
    (0 until n).map { i =>
      val u = SyntheticWeb.urlFor(Hashes.mix(seed, i.toLong))
      val html = SyntheticWeb.htmlFor(u)
      PageRow(u, new java.sql.Timestamp(1704067200000L + i * 60000L),
        html.getBytes("UTF-8"), graft.core.TextExtract.extract(html), "en")
    }

  test("windowed metrics over a page-arrival stream match the batch computation") {
    val dir = Files.createTempDirectory("stream-pages").toString
    val ckpt = Files.createTempDirectory("stream-ckpt").toString
    // two micro-batch file drops
    spark.createDataset(mkPages(40, 1L)).write.parquet(s"$dir/batch0")
    val all = spark.read.parquet(s"$dir/batch0")
    // stream over the same files
    val stream = StreamingCrawl.pageStream(spark, s"$dir/batch0")
    val q = StreamingCrawl.windowedMetrics(stream).writeStream
      .outputMode("append")
      .format("memory").queryName("win_metrics")
      .option("checkpointLocation", ckpt)
      .start()
    q.processAllAvailable()
    // append mode only emits closed windows; drop a later batch to advance
    // the watermark past the first windows
    spark.createDataset(mkPages(5, 99L).map(p =>
      p.copy(warc_ts = new java.sql.Timestamp(1704067200000L + 48L * 3600000L))))
      .write.mode("append").parquet(s"$dir/batch0")
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("win_metrics")
      .select($"window_start", $"lang", $"n_pages", $"text_chars")
    val expected = all
      .groupBy(window($"warc_ts", "1 hour"), $"lang")
      .agg(count(lit(1)).as("n_pages"), sum(length($"text")).as("text_chars"))
      .select($"window.start".as("window_start"), $"lang", $"n_pages", $"text_chars")
    // every closed window the stream emitted must match the batch value
    val mismatch = streamed.join(expected,
      Seq("window_start", "lang", "n_pages", "text_chars"), "left_anti")
    assert(streamed.count() > 0)
    assert(mismatch.count() === 0)
  }

  test("stateful politeness gate enforces a per-host budget across micro-batches") {
    val dir = Files.createTempDirectory("stream-frontier").toString
    val ckpt = Files.createTempDirectory("stream-fckpt").toString
    def entries(seed: Long, n: Int): Seq[FrontierEntry] =
      (0 until n).map(i => CrawlRound.entryFor(
        SyntheticWeb.urlFor(Hashes.mix(seed, i.toLong)), 5, 0L, 0))
    spark.createDataset(entries(2L, 300)).write.parquet(s"$dir/b0")

    val stream = spark.readStream
      .schema(spark.createDataset(entries(2L, 1)).schema)
      .parquet(s"$dir/b0").as[FrontierEntry]
    val q = StreamingCrawl.politenessGate(stream, budget = 3).writeStream
      .outputMode("append").format("memory").queryName("gate")
      .option("checkpointLocation", ckpt).start()
    q.processAllAvailable()
    // second micro-batch: same hosts again — state must keep capping
    spark.createDataset(entries(3L, 300)).write.mode("append").parquet(s"$dir/b0")
    q.processAllAvailable()
    q.stop()

    val out = spark.table("gate")
    val perHost = out.groupBy($"host").count()
    assert(perHost.filter($"count" > 3).count() === 0)
    assert(out.groupBy($"host").agg(max($"emitted_rank").as("m"))
      .filter($"m" > 3).count() === 0)
    assert(out.count() > 0)
  }

  test("per-window politeness gate re-grants the budget across window boundaries") {
    def entries(seed: Long, n: Int): Seq[FrontierEntry] =
      (0 until n).map(i => CrawlRound.entryFor(
        SyntheticWeb.urlFor(Hashes.mix(seed, i.toLong)), 5, 0L, 0))

    // 1) effectively-whole-stream window (1 year — a 1h window could
    // straddle a wall-clock hour boundary mid-test): a second batch of the
    // same hosts stays capped — identical to the never-re-grant gate
    val dirA = Files.createTempDirectory("stream-wgate-a").toString
    val ckptA = Files.createTempDirectory("stream-wgate-a-ckpt").toString
    spark.createDataset(entries(11L, 300)).write.parquet(s"$dirA/b0")
    val streamA = spark.readStream
      .schema(spark.createDataset(entries(11L, 1)).schema)
      .parquet(s"$dirA/b0").as[FrontierEntry]
    val qA = StreamingCrawl.politenessGatePerWindow(streamA, budget = 3,
        windowMs = 365L * 24 * 3600 * 1000).writeStream
      .outputMode("append").format("memory").queryName("wgate_a")
      .option("checkpointLocation", ckptA).start()
    qA.processAllAvailable()
    spark.createDataset(entries(12L, 300)).write.mode("append").parquet(s"$dirA/b0")
    qA.processAllAvailable()
    qA.stop()
    val outA = spark.table("wgate_a")
    assert(outA.count() > 0)
    assert(outA.groupBy($"host").count().filter($"count" > 3).count() === 0)

    // 2) 1 ms windows with a pause between batches: every micro-batch lands
    // in a fresh window, so the SAME hosts get a fresh budget each time
    val dirB = Files.createTempDirectory("stream-wgate-b").toString
    val ckptB = Files.createTempDirectory("stream-wgate-b-ckpt").toString
    val fixed = entries(21L, 40) // one fixed set of urls/hosts, replayed
    spark.createDataset(fixed).write.parquet(s"$dirB/b0")
    val streamB = spark.readStream
      .schema(spark.createDataset(fixed.take(1)).schema)
      .parquet(s"$dirB/b0").as[FrontierEntry]
    val qB = StreamingCrawl.politenessGatePerWindow(streamB, budget = 3,
        windowMs = 1L).writeStream
      .outputMode("append").format("memory").queryName("wgate_b")
      .option("checkpointLocation", ckptB).start()
    qB.processAllAvailable()
    val afterFirst = spark.table("wgate_b").count()
    Thread.sleep(50) // guarantee the 1 ms window boundary is crossed
    spark.createDataset(fixed).write.mode("append").parquet(s"$dirB/b0")
    qB.processAllAvailable()
    qB.stop()
    val outB = spark.table("wgate_b")
    // the replayed batch emitted again (fresh window) — strictly more rows,
    // and per (host, emitted_rank) each rank now appears twice
    assert(afterFirst > 0)
    assert(outB.count() === afterFirst * 2, "second window did not re-grant")
    assert(outB.groupBy($"host").agg(max($"emitted_rank").as("m"))
      .filter($"m" > 3).count() === 0)
  }

  test("streaming url dedup drops re-discovered urls across micro-batches") {
    val dir = Files.createTempDirectory("stream-dedup").toString
    val ckpt = Files.createTempDirectory("stream-dckpt").toString
    val first = mkPages(30, 7L)
    spark.createDataset(first).write.parquet(s"$dir/b0")
    val stream = StreamingCrawl.pageStream(spark, s"$dir/b0")
    val q = StreamingCrawl.dedupUrls(stream)
      .select($"url").writeStream
      .outputMode("append").format("memory").queryName("dedup_urls")
      .option("checkpointLocation", ckpt).start()
    q.processAllAvailable()
    // second drop: 10 replayed urls + 15 genuinely new ones
    spark.createDataset(first.take(10) ++ mkPages(15, 8L))
      .write.mode("append").parquet(s"$dir/b0")
    q.processAllAvailable()
    q.stop()
    val urls = spark.table("dedup_urls").as[String].collect()
    assert(urls.length === urls.distinct.length, "a duplicate url was emitted")
    assert(urls.toSet === (first ++ mkPages(15, 8L)).map(_.url).toSet)
  }
}

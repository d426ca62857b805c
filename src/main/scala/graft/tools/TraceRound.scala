package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.{CrawlRound, FrontierGen}
import graft.plans.Model.CrawlConfig
import graft.sources.SnapshotStore

/** Dev harness: one bench-sized crawl round with SPARK_GRAFT_TRACE stage
  * timings. `runMain graft.tools.TraceRound <cpus> <nUrls>`. */
object TraceRound {
  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.getOrElse("32").toInt
    val n = args.lift(1).getOrElse("300000").toLong
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .appName("trace").config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", "/dev/shm/graft-trace/spark-local")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = s"/dev/shm/graft-trace/store-$cpus-$n"
    def rm(p: java.nio.file.Path): Unit = {
      if (java.nio.file.Files.isDirectory(p)) {
        val st = java.nio.file.Files.list(p)
        try st.forEach(rm) finally st.close()
      }
      java.nio.file.Files.deleteIfExists(p)
    }
    rm(java.nio.file.Paths.get(dir))
    val store = new SnapshotStore(spark, dir)
    val cfg = CrawlConfig(hostBudget = 1000, roundCap = Int.MaxValue,
      bloomExpectedItems = 1L << 22,
      // 3rd arg "deltas": log-structured frontier (compaction far away, so
      // both traced rounds write churn only — the 10^10-row shape)
      frontierDeltas = args.lift(2).contains("deltas"),
      compactFrontierEvery = 64)
    val tg0 = System.nanoTime()
    FrontierGen.init(spark, store, n, cfg)
    System.err.println(f"[trace] frontier-gen: ${(System.nanoTime() - tg0) / 1e9}%.2fs")
    val tw = System.nanoTime()
    CrawlRound.run(spark, store, 0, cfg) // warm-up
    System.err.println(f"[trace] warmup-round0: ${(System.nanoTime() - tw) / 1e9}%.2fs")
    val t0 = System.nanoTime()
    val m = CrawlRound.run(spark, store, 1, cfg).metrics
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"cpus=$cpus n=$n fetched=${m.fetched} new=${m.new_urls} " +
      f"sec=$secs%.2f thpt=${(m.fetched + m.new_urls) / secs}%.1f")
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.{CrawlRound, FrontierGen}
import graft.plans.Model.CrawlConfig
import graft.sources.SnapshotStore

/** Steady-state frontier-layout benchmark: FULL (range-rewrite the whole
  * frontier every round) vs DELTAS (log-structured churn-only writes with
  * merge-on-read).
  *
  * The growth-phase bench showed no delta win because while a crawl expands,
  * churn ≈ frontier size. This harness measures the layout at its DESIGN
  * POINT instead: a large frontier whose next_fetch_ts is hash-spread over
  * `spread` future rounds (FrontierGen spreadRounds), so each round dequeues
  * only ~n/spread URLs — churn ≪ frontier, the steady-state of a mature
  * crawl. Both layouts run the IDENTICAL round sequence on identical stores;
  * per-round walls and the final round metrics are printed as one JSON line
  * per layout.
  *
  * `roundCap` is the steady-state knob: uncapped, every fetch spawns ~8 new
  * due-next-round URLs and the crawl re-enters its growth phase (churn ≈
  * frontier — measured; the delta layout loses there, as BENCH.md already
  * records). Capped, churn per round = deferred + removals + new ≈
  * n/spread + 9·cap, a small fraction of the frontier — the mature-crawl
  * shape the layout exists for.
  *
  * Usage: runMain graft.tools.DeltaBench [cpus] [nUrls] [spread] [rounds]
  * [cap] [churnRatio] (defaults 16, 2000000, 40, 3, 10000, 0). With
  * churnRatio > 0 a THIRD arm runs the churn-driven compaction cadence
  * (CrawlConfig.compactFrontierChurnRatio) interleaved with the other two —
  * same input, same rounds, compaction timing decided by accumulated churn
  * instead of the fixed every-4 cadence.
  */
object DeltaBench {

  private def rm(p: java.nio.file.Path): Unit = {
    if (java.nio.file.Files.isDirectory(p)) {
      val st = java.nio.file.Files.list(p)
      try st.forEach(rm) finally st.close()
    }
    java.nio.file.Files.deleteIfExists(p)
  }

  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.getOrElse("16").toInt
    val n = args.lift(1).getOrElse("2000000").toLong
    val spread = args.lift(2).getOrElse("40").toInt
    val rounds = args.lift(3).getOrElse("3").toInt
    val cap = args.lift(4).getOrElse("10000").toInt
    val churnRatio = args.lift(5).getOrElse("0").toDouble
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .appName("delta-bench")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", "/dev/shm/graft-deltabench/spark-local")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // The two layouts run INTERLEAVED round-by-round (full k, then delta k)
    // so each comparison pair shares a host window — this box's scheduler
    // swings 2x minute-to-minute, and sequential whole-layout loops would
    // time different windows (measured: the same layout's walls moved 1.5x
    // between two back-to-back invocations).
    def mkStore(layout: String): (SnapshotStore, CrawlConfig) = {
      val dir = s"/dev/shm/graft-deltabench/store-$layout"
      rm(java.nio.file.Paths.get(dir))
      val cfg = CrawlConfig(hostBudget = 1000, roundCap = cap,
        bloomExpectedItems = 1L << 23,
        frontierDeltas = layout != "full",
        // compaction INSIDE the measured window: the delta layout's honest
        // cost is the amortized cycle (churn-only rounds + the periodic full
        // rewrite), not an ever-growing delta chain. The churn arm disables
        // the fixed cadence (huge modulus) so only the ratio decides.
        compactFrontierEvery = if (layout == "churn") Int.MaxValue else 4,
        compactFrontierChurnRatio = if (layout == "churn") churnRatio else 0.0)
      val store = new SnapshotStore(spark, dir)
      FrontierGen.init(spark, store, n, cfg, spreadRounds = spread)
      CrawlRound.run(spark, store, 0, cfg) // warm-up (codegen etc.), untimed
      (store, cfg)
    }
    val layoutNames =
      Seq("full", "deltas") ++ (if (churnRatio > 0) Seq("churn") else Nil)
    val layouts = layoutNames.map(l => l -> mkStore(l)).toMap
    val walls = scala.collection.mutable.Map.empty[String,
      Vector[(Double, graft.plans.Model.RoundMetrics)]].withDefaultValue(Vector.empty)
    for (k <- 1 to rounds; layout <- layoutNames) {
      val (store, cfg) = layouts(layout)
      val t0 = System.nanoTime()
      val m = CrawlRound.run(spark, store, k, cfg).metrics
      walls(layout) = walls(layout) :+ ((System.nanoTime() - t0) / 1e9, m)
    }
    for (layout <- layoutNames) {
      val ws = walls(layout)
      val lastM = ws.last._2
      val wallsJson = ws.map(w => f"${w._1}%.2f").mkString("[", ",", "]")
      val dues = ws.map(_._2.due).mkString("[", ",", "]")
      val news = ws.map(_._2.new_urls).mkString("[", ",", "]")
      // which snapshots carry a full frontier (compaction rounds) — the
      // cadence under comparison, read straight off the store
      val compacted = (1 to (rounds + 1))
        .filter(i => layouts(layout)._1.hasFullFrontier(i))
        .mkString("[", ",", "]")
      println(
        f"""{"layout":"$layout","cpus":$cpus,"n_urls":$n,"spread":$spread,""" +
        f""""churn_ratio":$churnRatio,"round_walls_sec":$wallsJson,""" +
        f""""total_sec":${ws.map(_._1).sum}%.2f,""" +
        f""""round_due":$dues,"round_new":$news,""" +
        f""""full_frontier_snapshots":$compacted,""" +
        f""""final_frontier_size":${lastM.frontier_size},""" +
        f""""final_seen_size":${lastM.seen_size}}""")
    }
    spark.stop()
    rm(java.nio.file.Paths.get("/dev/shm/graft-deltabench"))
  }
}

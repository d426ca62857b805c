package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.{CrawlRound, FrontierGen}
import graft.plans.Model.CrawlConfig
import graft.sources.SnapshotStore

/** Same-session A/B of CrawlConfig.fetchWaves: prepare ONE store (frontier
  * gen + round 0), then repeatedly time round 1 alternating the wave factor
  * — adjacent timings share the host window, so a real 5–10% effect is
  * separable from this box's 2x scheduler swings in a way two separate
  * bench runs never are. Round 1 always reads the same snapshot 1; output
  * is byte-identical at any wave factor.
  *
  * Usage: runMain graft.tools.WaveAB [cpus] [nUrls] [reps] [wavesA] [wavesB]
  * (defaults 16, 60000, 3, 1, 3)
  */
object WaveAB {
  private def rm(p: java.nio.file.Path): Unit = {
    if (java.nio.file.Files.isDirectory(p)) {
      val st = java.nio.file.Files.list(p)
      try st.forEach(rm) finally st.close()
    }
    java.nio.file.Files.deleteIfExists(p)
  }

  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.getOrElse("16").toInt
    val n = args.lift(1).getOrElse("60000").toLong
    val reps = args.lift(2).getOrElse("3").toInt
    val wA = args.lift(3).getOrElse("1").toInt
    val wB = args.lift(4).getOrElse("3").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .appName("wave-ab")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", "/dev/shm/graft-waveab/spark-local")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/dev/shm/graft-waveab/store"
    rm(java.nio.file.Paths.get(dir))
    val store = new SnapshotStore(spark, dir)
    def cfg(w: Int) = CrawlConfig(hostBudget = 1000, roundCap = Int.MaxValue,
      bloomExpectedItems = 1L << 23, fetchWaves = w)
    FrontierGen.init(spark, store, n, cfg(wA))
    CrawlRound.run(spark, store, 0, cfg(wA)) // prep + warm-up
    val walls = for (r <- 1 to reps; w <- Seq(wA, wB)) yield {
      val t0 = System.nanoTime()
      CrawlRound.run(spark, store, 1, cfg(w))
      val s = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[waveab] rep $r waves $w: $s%.2f s")
      (w, s)
    }
    val byW = walls.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    def med(xs: Seq[Double]) = xs((xs.size - 1) / 2)
    println(f"""{"cpus":$cpus,"n":$n,"reps":$reps,""" +
      f""""waves_$wA":${byW(wA).map(x => f"$x%.2f").mkString("[", ",", "]")},""" +
      f""""waves_$wB":${byW(wB).map(x => f"$x%.2f").mkString("[", ",", "]")},""" +
      f""""median_$wA":${med(byW(wA))}%.2f,"median_$wB":${med(byW(wB))}%.2f}""")
    spark.stop()
    rm(java.nio.file.Paths.get("/dev/shm/graft-waveab"))
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.{CrawlRound, FrontierGen}
import graft.plans.Model.CrawlConfig
import graft.sources.SnapshotStore

/** Same-session A/B of the J1 seen-join forms (CrawlConfig.seenJoin):
  * `runMain graft.tools.SeenJoinAB [cpus] [nUrls] [reps]`.
  *
  * Methodology (the LshAB/WaveAB house rule): this host's starvation swings
  * invert any two-run comparison, so the forms alternate REP BY REP in one
  * session — adjacent reps share a host window and the noise cancels in the
  * per-pair deltas. Each rep re-runs the IDENTICAL round 1 on the identical
  * snapshot-1 input: snapshot 2 is dropped and HEAD reset between reps (the
  * crawl is deterministic, so every rep times the same job; outputs were
  * equivalence-tested in CrawlSpec, this tool only times them). */
object SeenJoinAB {
  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.getOrElse("16").toInt
    val n = args.lift(1).getOrElse("60000").toLong
    val reps = args.lift(2).getOrElse("3").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .appName("seenjoin-ab").config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", "/dev/shm/graft-sjab/spark-local")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.sql.adaptive.enabled", "false") // match Bench
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = s"/dev/shm/graft-sjab/store-$cpus-$n"
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
      bloomExpectedItems = 1L << 22)
    FrontierGen.init(spark, store, n, cfg)
    CrawlRound.run(spark, store, 0, cfg) // prep + warm (untimed)

    def resetToSnapshot1(): Unit = {
      rm(java.nio.file.Paths.get(dir, "snapshot-2"))
      rm(java.nio.file.Paths.get(dir, ".tmp-2"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(dir, "HEAD"), "1")
    }

    val walls = scala.collection.mutable.Map(
      "scan" -> Vector.empty[Double], "shuffle" -> Vector.empty[Double])
    (1 to reps).foreach { rep =>
      // alternate starting form per rep so neither form owns "first in pair"
      val order = if (rep % 2 == 1) Seq("scan", "shuffle") else Seq("shuffle", "scan")
      order.foreach { form =>
        resetToSnapshot1()
        val t0 = System.nanoTime()
        val m = CrawlRound.run(spark, store, 1, cfg.copy(seenJoin = form)).metrics
        val s = (System.nanoTime() - t0) / 1e9
        walls(form) = walls(form) :+ s
        System.err.println(f"[sjab] rep $rep $form%-8s wall $s%.2f s " +
          f"(fetched=${m.fetched} new=${m.new_urls})")
      }
    }
    def med(xs: Vector[Double]): Double = xs.sorted.apply((xs.size - 1) / 2)
    val fmt = (xs: Vector[Double]) => xs.map(x => f"$x%.2f").mkString("[", ",", "]")
    println(f"""{"metric":"seenjoin_ab","cpus":$cpus,"n":$n,""" +
      f""""scan_walls":${fmt(walls("scan"))},"shuffle_walls":${fmt(walls("shuffle"))},""" +
      f""""scan_median":${med(walls("scan"))}%.2f,"shuffle_median":${med(walls("shuffle"))}%.2f}""")
    spark.stop()
    rm(java.nio.file.Paths.get("/dev/shm/graft-sjab"))
  }
}

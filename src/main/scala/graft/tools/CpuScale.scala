package graft.tools

import java.util.concurrent.atomic.AtomicLong

import graft.core.{Hashes, LinkExtract, SyntheticWeb, TextExtract}

/** Dev harness: raw thread-scaling of the fetch+parse workload, no Spark.
  * `runMain graft.tools.CpuScale <threads> <nUrls>` */
object CpuScale {
  def main(args: Array[String]): Unit = {
    val threads = args.headOption.getOrElse("32").toInt
    val n = args.lift(1).getOrElse("100000").toInt
    val urls = (0 until n).map(i => SyntheticWeb.urlFor(Hashes.mix(5L, i.toLong))).toArray
    val idx = new AtomicLong(0)
    val sink = new AtomicLong(0)
    val t0 = System.nanoTime()
    val ts = (0 until threads).map { _ =>
      new Thread(() => {
        var i = idx.getAndIncrement()
        while (i < n) {
          val u = urls(i.toInt)
          val f = SyntheticWeb.fetch(u)
          if (f.status == 200) {
            val text = TextExtract.extract(f.html)
            val links = LinkExtract.extract(f.html, u)
            sink.addAndGet(text.length + links.size)
          }
          i = idx.getAndIncrement()
        }
      })
    }
    ts.foreach(_.start()); ts.foreach(_.join())
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"threads=$threads n=$n sec=$sec%.2f pages_per_sec=${n / sec}%.0f sink=${sink.get()}")
  }
}

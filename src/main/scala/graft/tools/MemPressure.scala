package graft.tools

import graft.core.{Hashes, LinkExtract, SyntheticWeb, TextExtract}

/** Reproduces the host-memory-reclaim pathology that masqueraded as scheduler
  * starvation (BENCH.md "ROOT CAUSE FOUND"): on a shared microVM whose host
  * reclaims guest pages, growing this JVM's RSS by gigabytes collapses
  * subsequent pure-CPU throughput by ~13× while the pages fault back
  * host-side. Run WITHOUT the build's pre-touch to reproduce
  * (SPARK_GRAFT_JAVA_OPTS="-Xms1g -XX:-AlwaysPreTouch" overrides come last),
  * and with the default pre-touched heap to verify the fix (the ballast
  * then lands in already-resident pages and throughput holds).
  *
  *   sbt "runMain graft.tools.MemPressure [threads] [pages] [ballastGB]"
  *
  * Prints pages/s before the ballast, right after allocating+touching it,
  * and after a second touch pass (host residency restored).
  */
object MemPressure {
  private def kernel(threads: Int, n: Int): Double = {
    val urls = (0 until n).map(i => SyntheticWeb.urlFor(Hashes.mix(5L, i.toLong))).toArray
    val idx = new java.util.concurrent.atomic.AtomicInteger(0)
    val t0 = System.nanoTime()
    val ts = (0 until threads).map(_ => new Thread(() => {
      var i = idx.getAndIncrement()
      while (i < urls.length) {
        val f = SyntheticWeb.fetch(urls(i))
        if (f.status == 200) {
          TextExtract.extract(f.html)
          LinkExtract.extract(f.html, urls(i))
        }
        i = idx.getAndIncrement()
      }
    }))
    ts.foreach(_.start()); ts.foreach(_.join())
    n / ((System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val threads = args.headOption.getOrElse("16").toInt
    val n = args.lift(1).getOrElse("40000").toInt
    val gb = args.lift(2).getOrElse("15").toInt
    kernel(threads, n / 2) // JIT warm-up, untimed
    println(f"before-ballast: ${kernel(threads, n)}%.0f pages/s")
    val chunks = new Array[Array[Byte]](gb * 10)
    var c = 0
    while (c < chunks.length) {
      chunks(c) = new Array[Byte](100 * 1024 * 1024)
      var i = 0
      while (i < chunks(c).length) { chunks(c)(i) = (i & 0x7f).toByte; i += 4096 }
      c += 1
    }
    println(s"ballast allocated+touched: $gb GB")
    println(f"after-ballast:  ${kernel(threads, n)}%.0f pages/s")
    var sink = 0L
    chunks.foreach { ch =>
      var i = 0
      while (i < ch.length) { sink += ch(i); i += 4096 }
    }
    println(f"after-retouch:  ${kernel(threads, n)}%.0f pages/s (sink=$sink%d)")
  }
}

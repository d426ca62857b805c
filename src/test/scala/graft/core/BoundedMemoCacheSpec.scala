package graft.core

import org.scalatest.funsuite.AnyFunSuite

class BoundedMemoCacheSpec extends AnyFunSuite {

  test("size stays bounded by cap across many distinct keys") {
    val c = new BoundedMemoCache[String, java.lang.Long](cap = 100)
    (0 until 1000).foreach(i => c.getOrCompute(s"k$i")(_ => Long.box(i.toLong)))
    assert(c.size <= 100, s"cache grew past cap: ${c.size}")
    assert(c.size > 50, s"eviction removed far more than one segment: ${c.size}")
  }

  test("values stay correct across eviction (pure-function contract)") {
    val computes = new java.util.concurrent.atomic.AtomicInteger(0)
    def f(k: String): java.lang.Long = { computes.incrementAndGet(); Long.box(k.drop(1).toLong * 7) }
    val c = new BoundedMemoCache[String, java.lang.Long](cap = 64)
    // overflow several times, re-reading every key each sweep
    (0 until 3).foreach { _ =>
      (0 until 500).foreach { i =>
        assert(c.getOrCompute(s"k$i")(f) == i.toLong * 7)
      }
    }
    // eviction forces recomputes but never wrong values
    assert(computes.get() >= 500)
    // the just-inserted key is a guaranteed hit (no miss ran since)
    val n = computes.get()
    assert(c.getOrCompute("k499")(f) == 499L * 7)
    assert(computes.get() == n)
  }

  test("warm hits do not evict") {
    val c = new BoundedMemoCache[String, java.lang.Long](cap = 10)
    (0 until 10).foreach(i => c.getOrCompute(s"k$i")(_ => Long.box(i.toLong)))
    val before = c.size
    (0 until 100).foreach(_ => c.getOrCompute("k3")(_ => fail("hit recomputed")))
    assert(c.size == before)
  }

  test("concurrent misses never return a wrong value and stay near cap") {
    val c = new BoundedMemoCache[String, java.lang.Long](cap = 256)
    val errs = new java.util.concurrent.atomic.AtomicInteger(0)
    val ts = (0 until 8).map(t => new Thread(() => {
      (0 until 2000).foreach { i =>
        val k = (i * 31 + t) % 1000
        if (c.getOrCompute(s"k$k")(_ => Long.box(k.toLong)) != k.toLong)
          errs.incrementAndGet()
      }
    }))
    ts.foreach(_.start()); ts.foreach(_.join())
    assert(errs.get() == 0)
    // racing misses may momentarily overshoot by #threads; never unbounded
    assert(c.size <= 256 + 8, s"unbounded growth under concurrency: ${c.size}")
  }
}

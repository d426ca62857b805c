package graft.core

/** Bounded executor-side memo cache for pure functions (value is a function
  * of the key only — eviction can never cause divergence, only a recompute).
  *
  * Eviction policy: when a MISS finds the map at capacity, an arbitrary
  * segment (~1/evictDenom of entries) is removed instead of clearing the
  * whole map. The previous wholesale `clear()` meant a long-lived executor
  * crawling more than `cap` distinct hosts paid a thundering-herd re-parse
  * of EVERY in-flight host right after each clear; segment eviction keeps
  * (1 - 1/evictDenom) of the working set warm across the boundary.
  *
  * Concurrency: reads are lock-free ConcurrentHashMap gets; the size probe
  * runs only on the miss path (never per-hit), so a warm cache costs one
  * volatile read per lookup. Racing misses may each evict a segment —
  * over-eviction is benign (recompute), under-capacity is restored on the
  * next miss.
  */
final class BoundedMemoCache[K, V <: AnyRef](cap: Int, evictDenom: Int = 8) {
  require(cap > 0 && evictDenom > 1, s"bad cache shape: cap=$cap denom=$evictDenom")

  private val m = new java.util.concurrent.ConcurrentHashMap[K, V]()

  def getOrCompute(k: K)(f: K => V): V = {
    val hit = m.get(k)
    if (hit != null) hit
    else {
      if (m.size() >= cap) evictSegment()
      m.computeIfAbsent(k, key => f(key))
    }
  }

  private def evictSegment(): Unit = {
    val target = math.max(cap / evictDenom, 1)
    val it = m.keySet().iterator()
    var n = 0
    while (it.hasNext && n < target) { it.next(); it.remove(); n += 1 }
  }

  def size: Int = m.size()
}

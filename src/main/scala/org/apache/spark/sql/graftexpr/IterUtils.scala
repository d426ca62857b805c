package org.apache.spark.sql.graftexpr

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.LogicalRDD

/** Iterative-algorithm storage hygiene. An EAGER `localCheckpoint(true)`
  * leaves its materialized RDD cached in the block manager; a loop that
  * checkpoints every iteration (PageRank, label propagation) otherwise
  * accumulates one full cached copy PER ITERATION until driver GC notices —
  * at the corpus scale this engine targets that evicts the caches that
  * matter or OOMs executors. `Dataset.unpersist()` cannot free it (the
  * block belongs to the plan's internal RDD, not the cache manager), hence
  * this `private[sql]`-reaching helper (same pattern as the rest of
  * graftexpr).
  *
  * Only call on a checkpointed Dataset that is fully superseded — a
  * local-checkpointed RDD is unrecoverable once unpersisted. */
object IterUtils {
  def unpersistCheckpoint(ds: Dataset[_]): Unit =
    ds.queryExecution.analyzed match {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}

// Same org.apache.spark.sql subpackage rationale as CosineSim.scala.
package org.apache.spark.sql.graftexpr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.classic.ExpressionUtils

/** Column surface over Spark's internal `BloomFilterAggregate` (the engine
  * behind `df.stat.bloomFilter` and runtime filtering): builds a bloom filter
  * over a long column PER GROUP — which `stat.bloomFilter` cannot do — and
  * returns the serialized bytes (`BloomFilter.readFrom`-compatible). Used by
  * the sharded URL-seen filter: one bloom per `pmod(url_hash, nShards)`
  * group in a single distributed aggregation. */
object BloomAgg {

  /** `bloom_agg($"url_hash", expectedItems, numBits)` — fix numBits across
    * builds of the same shard so `BloomFilter.mergeInPlace` accepts them. */
  def apply(c: Column, expectedItems: Long, numBits: Long): Column =
    ExpressionUtils.column(
      new BloomFilterAggregate(ExpressionUtils.expression(c),
        Literal(expectedItems), Literal(numBits)).toAggregateExpression())
}

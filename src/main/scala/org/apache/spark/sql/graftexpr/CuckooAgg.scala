// Same org.apache.spark.sql subpackage rationale as CosineSim.scala:
// TypedImperativeAggregate / ExpressionUtils are private[sql].
package org.apache.spark.sql.graftexpr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, DataType, LongType}

import graft.functions.CuckooFilter

/** Custom UDAF surface (SURVEY.md §2.10): builds a cuckoo filter over a long
  * key column — the deletable alternative to `df.stat.bloomFilter` for the
  * URL-seen accelerator (north star: "Bloom/cuckoo"). Mutable buffer +
  * partial/merge/final like the built-in BloomFilterAggregate; the result is
  * the serialized filter (binary), deserialized driver-side and broadcast.
  */
case class CuckooAgg(
    child: Expression,
    expectedItems: Long,
    exactBuckets: Int = 0,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CuckooFilter] with ExpectsInputTypes
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "cuckoo_agg"

  // exactBuckets > 0 pins the filter shape (a delta that will be merged into
  // an existing filter must match its numBuckets exactly)
  override def createAggregationBuffer(): CuckooFilter =
    if (exactBuckets > 0) CuckooFilter.createWithBuckets(exactBuckets)
    else CuckooFilter.create(expectedItems)

  override def update(buffer: CuckooFilter, input: InternalRow): CuckooFilter = {
    val v = child.eval(input)
    if (v != null) buffer.put(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: CuckooFilter, other: CuckooFilter): CuckooFilter = {
    buffer.mergeInPlace(other)
    buffer
  }

  override def eval(buffer: CuckooFilter): Any = buffer.serialized

  override def serialize(buffer: CuckooFilter): Array[Byte] = buffer.serialized
  override def deserialize(bytes: Array[Byte]): CuckooFilter =
    CuckooFilter.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CuckooAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CuckooAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CuckooAgg =
    copy(child = newChild)
}

object CuckooAgg {
  /** Column-API surface: `cuckoo_agg($"url_hash", expectedItems)`. */
  def apply(c: Column, expectedItems: Long): Column =
    ExpressionUtils.column(
      CuckooAgg(ExpressionUtils.expression(c), expectedItems)
        .toAggregateExpression())

  /** Shape-pinned variant for deltas merged into an existing filter. */
  def apply(c: Column, expectedItems: Long, exactBuckets: Int): Column =
    ExpressionUtils.column(
      CuckooAgg(ExpressionUtils.expression(c), expectedItems, exactBuckets)
        .toAggregateExpression())
}

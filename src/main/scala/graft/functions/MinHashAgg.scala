package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature as a native TypedImperativeAggregate.
  *
  * Input: one 64-bit shingle hash per row (e.g. `xxhash64(shingle)`).
  * Buffer: k running minima, one per permutation; permutation i of a
  * shingle hash h is `XXH64.hashLong(h ^ MIX(i), 42)` — exactly the value
  * `xxhash64(h ^ MIX(i))` produces in SQL (Spark's xxhash64 seed is 42),
  * so signatures are bit-identical to the previous k-column
  * `min(xxhash64(...))` formulation while doing one buffer update per row
  * instead of k separate aggregate buffers. Mins are commutative →
  * partial-agg/merge order cannot change the result.
  */
case class MinHashAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < k) {
        val m = XXH64.hashLong(h ^ MinHashAgg.Mix(i), 42L)
        if (m < buf(i)) buf(i) = m
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) {
      if (b(i) < a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(k * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashAgg =
    copy(child = newChildren.head)
}

object MinHashAgg {
  /** XOR constants deriving the permutation family from one shingle hash. */
  val Mix: Array[Long] = Array(
    0x9E3779B97F4A7C15L, 0xC2B2AE3D27D4EB4FL, 0x165667B19E3779F9L,
    0x27D4EB2F165667C5L, 0x85EBCA77C2B2AE63L, 0xFF51AFD7ED558CCDL,
    0xC4CEB9FE1A85EC53L, 0x2545F4914F6CDD1DL, 0x5851F42D4C957F2DL,
    0x14057B7EF767814FL, 0xB5297A4D3A2D851BL, 0x68E31DA4C9F0E857L,
    0x7FEB352D7FEB352DL, 0x846CA68B846CA68BL, 0x9E3779B97F4A7C55L,
    0xD6E8FEB86659FD93L)

  /** Aggregate Column: k-element MinHash signature of a group of hashes. */
  def minhash_signature(shingleHash: Column, k: Int = 16): Column = {
    require(k <= Mix.length, s"k <= ${Mix.length}")
    Bridge.column(MinHashAgg(Bridge.expression(shingleHash), k).toAggregateExpression())
  }
}

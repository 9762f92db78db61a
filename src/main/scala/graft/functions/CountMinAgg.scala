package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Count-min sketch as a native TypedImperativeAggregate — the mergeable
  * frequency-estimation primitive behind heavy-hitter detection.
  *
  * Input: one 64-bit item hash per row (e.g. `xxhash64(token)`). Buffer:
  * a depth×width counter matrix; row r of item hash h increments cell
  * `pmod(XXH64.hashLong(h ^ Mix(r), 42), width)` (the same derived-hash
  * family [[MinHashAgg]] uses). Merge is CELL-WISE ADDITION — commutative
  * and associative, so the sketch (and every estimate read from it) is
  * bit-identical regardless of partial-aggregation or merge order. That
  * order-independence is what makes this safe as a declared deterministic
  * query where eviction-based summaries (space-saving / Misra-Gries)
  * would be merge-order-sensitive at the margins.
  *
  * Eval returns, for each pre-declared probe hash, the classic CMS point
  * estimate `min over rows r of cell(r, idx(probe, r))`. Guarantees
  * (property-tested): estimate ≥ true count always (counters only
  * over-count); over-count per row is bounded by the colliding mass,
  * ~n/width in expectation, and the min over `depth` independent rows
  * drives the slack to n/width with probability 1 - (1/2)^depth.
  *
  * 100 TB story: the sketch is O(depth×width) — constant in data size —
  * and one `merge` per partial buffer; estimating corpus-wide token
  * frequencies costs one pass + a few KB of state per executor, where the
  * exact groupBy carries the full vocabulary through a shuffle.
  */
case class CountMinAgg(
    child: Expression,
    probes: Seq[Long],
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(depth > 0 && depth <= MinHashAgg.Mix.length, s"depth in [1, ${MinHashAgg.Mix.length}]")
  require(width > 0, "width must be positive")
  require(probes.nonEmpty, "declare at least one probe hash")

  private def cellOf(h: Long, r: Int): Int = {
    val m = XXH64.hashLong(h ^ MinHashAgg.Mix(r), 42L) % width
    (if (m < 0) m + width else m).toInt
  }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var r = 0
      while (r < depth) {
        buf(r * width + cellOf(h, r)) += 1L
        r += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) {
      a(i) += b(i)
      i += 1
    }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    val ests = probes.map { h =>
      var best = Long.MaxValue
      var r = 0
      while (r < depth) {
        val c = buf(r * width + cellOf(h, r))
        if (c < best) best = c
        r += 1
      }
      best
    }
    new GenericArrayData(ests.toArray)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(depth * width)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinAgg =
    copy(child = newChildren.head)
}

object CountMinAgg {
  /** Aggregate Column: CMS point estimates (array, one per probe hash) of
    * how often each probe occurred among the `itemHash` values. Probe
    * hashes must come from the same hash the rows carry — canonically
    * `xxhash64(item)`, whose long-input form equals
    * `XXH64.hashLong(v, 42)` used internally. */
  def cms_estimates(itemHash: Column, probes: Seq[Long],
      depth: Int = 4, width: Int = 1024): Column =
    Bridge.column(
      CountMinAgg(Bridge.expression(itemHash), probes, depth, width).toAggregateExpression())
}

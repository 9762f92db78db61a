package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

import java.math.BigInteger

/** Exact integer Gram-matrix (X^T·X) aggregate — the outer-product
  * accumulator behind `qagg_gram`, replacing the d(d+1)/2-struct
  * per-row explode whose materialized pair stream (2.08 G rows at sf1)
  * was pure overhead: the actual arithmetic is ~0.1 CPU-seconds.
  *
  * Input: one quantized vector (array<bigint>, fixed dimension `d`) per
  * row. Buffer: `d` component sums + d(d+1)/2 upper-triangle product
  * sums, all primitive `Long` cells with an EXACT overflow spill — a
  * cell crossing ±2^62 folds into a lazily-allocated BigInteger side
  * cell and restarts near zero, so results are exact at ANY row count
  * (unlike a bare Long accumulator, which would silently cap the
  * operator at ~2^22 rows per 2^40-sized product; the DECIMAL(38,0)
  * semantics of the exploded formulation are preserved bit-for-bit).
  * Components are required to be |q| < 2^30 so a single product fits a
  * Long with room for the spill threshold — violations raise, never
  * wrap (the overflow-is-an-error rule, D-series).
  *
  * Merge is cell-wise exact addition (commutative/associative →
  * partial-aggregation and merge order cannot change the result, D8).
  * Eval emits the d(d+1)/2 rows (i, j, n, Σq_i·q_j, Σq_i, Σq_j) with
  * the sums as DECIMAL(38,0) — the exact values the groupBy(i,j)
  * formulation produced, ready for the same ncov arithmetic.
  *
  * 100 TB story: per-partition state is ~(d²/2 + d) longs (≈17 KB at
  * d=64) regardless of row count, one merge per partial — where the
  * explode carried d²/2 rows per INPUT ROW into the shuffle. */
case class GramAgg(
    child: Expression,
    d: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[GramAgg.Buf] {

  require(d > 0 && d <= 4096, s"dimension must be in [1, 4096], got $d")

  private val np = d * (d + 1) / 2

  override def createAggregationBuffer(): GramAgg.Buf = new GramAgg.Buf(d + np)

  override def update(buf: GramAgg.Buf, input: InternalRow): GramAgg.Buf = {
    val v = child.eval(input)
    if (v != null) {
      val q = v.asInstanceOf[ArrayData]
      require(q.numElements() == d,
        s"GramAgg(d=$d) fed a ${q.numElements()}-element vector")
      buf.n += 1L
      var i = 0
      var k = d
      while (i < d) {
        val qi = q.getLong(i)
        require(qi > -GramAgg.MaxComponent && qi < GramAgg.MaxComponent,
          s"quantized component $qi exceeds |2^30| — would overflow a product")
        buf.add(i, qi)
        var j = i
        while (j < d) {
          buf.add(k, qi * q.getLong(j))
          k += 1
          j += 1
        }
        i += 1
      }
    }
    buf
  }

  override def merge(a: GramAgg.Buf, b: GramAgg.Buf): GramAgg.Buf = {
    a.n += b.n
    var k = 0
    while (k < a.cells.length) {
      val bv = b.cells(k)
      // add() assumes |v| < 2^60 (single-product bound); a sibling CELL
      // can be near ±2^62, which would wrap the Long before the spill
      // check — fold large incoming cells straight into the big twin
      if (bv > GramAgg.MergeDirect || bv < -GramAgg.MergeDirect)
        a.addBig(k, java.math.BigInteger.valueOf(bv))
      else a.add(k, bv)
      if (b.big != null && b.big(k) != null) a.addBig(k, b.big(k))
      k += 1
    }
    a
  }

  override def eval(buf: GramAgg.Buf): Any = {
    if (buf.n == 0L) return new GenericArrayData(Array.empty[Any])
    def dec(idx: Int): Decimal = {
      var v = BigInteger.valueOf(buf.cells(idx))
      if (buf.big != null && buf.big(idx) != null) v = v.add(buf.big(idx))
      Decimal(BigDecimal(new java.math.BigDecimal(v)), 38, 0)
    }
    val out = new Array[Any](np)
    var i = 0
    var k = 0
    while (i < d) {
      var j = i
      while (j < d) {
        out(k) = InternalRow(i, j, buf.n, dec(d + k), dec(i), dec(j))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: GramAgg.Buf): Array[Byte] = {
    val bigs = if (buf.big == null) Seq.empty[(Int, Array[Byte])]
      else buf.big.iterator.zipWithIndex.collect {
        case (b, i) if b != null => (i, b.toByteArray)
      }.toSeq
    val size = 8 + 4 + buf.cells.length * 8 + 4 + bigs.map(8 + _._2.length).sum
    val bb = java.nio.ByteBuffer.allocate(size)
    bb.putLong(buf.n)
    bb.putInt(buf.cells.length)
    buf.cells.foreach(bb.putLong)
    bb.putInt(bigs.size)
    bigs.foreach { case (i, bytes) =>
      bb.putInt(i); bb.putInt(bytes.length); bb.put(bytes)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): GramAgg.Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getLong
    val len = bb.getInt
    val buf = new GramAgg.Buf(len)
    buf.n = n
    var k = 0
    while (k < len) { buf.cells(k) = bb.getLong; k += 1 }
    val nBig = bb.getInt
    var b = 0
    while (b < nBig) {
      val idx = bb.getInt
      val blen = bb.getInt
      val arr = new Array[Byte](blen)
      bb.get(arr)
      buf.addBig(idx, new BigInteger(arr))
      b += 1
    }
    buf
  }

  override def dataType: DataType = GramAgg.OutType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def withNewMutableAggBufferOffset(newOffset: Int): GramAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GramAgg =
    copy(child = newChildren.head)
}

object GramAgg {
  /** |q| bound keeping any single product < 2^60 (spillable headroom). */
  val MaxComponent: Long = 1L << 30

  /** Spill threshold: past ±2^62 a cell folds into its BigInteger twin;
    * since every single add is < 2^60 the Long can never wrap first. */
  private val Spill = 1L << 62

  /** Merge-side bound for direct Long addition (2^62 + 2^60 < 2^63). */
  private[functions] val MergeDirect: Long = 1L << 60

  final class Buf(len: Int) {
    var n: Long = 0L
    val cells = new Array[Long](len)
    var big: Array[BigInteger] = null

    def add(idx: Int, v: Long): Unit = {
      val s = cells(idx) + v
      if (s > Spill || s < -Spill) {
        addBig(idx, BigInteger.valueOf(cells(idx)))
        cells(idx) = v
      } else cells(idx) = s
    }

    def addBig(idx: Int, v: BigInteger): Unit = {
      if (big == null) big = new Array[BigInteger](cells.length)
      big(idx) = if (big(idx) == null) v else big(idx).add(v)
    }
  }

  private val OutType: DataType = ArrayType(StructType(Seq(
    StructField("i", IntegerType, nullable = false),
    StructField("j", IntegerType, nullable = false),
    StructField("n", LongType, nullable = false),
    StructField("sab", DecimalType(38, 0), nullable = false),
    StructField("sa", DecimalType(38, 0), nullable = false),
    StructField("sb", DecimalType(38, 0), nullable = false))), containsNull = false)

  /** Aggregate Column: exact Gram rows over a quantized array<bigint>
    * column of fixed dimension `d`. */
  def gram(q: Column, d: Int): Column =
    Bridge.column(GramAgg(Bridge.expression(q), d).toAggregateExpression())
}

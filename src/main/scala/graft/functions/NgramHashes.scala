package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform

/** Native Catalyst expression producing the xxhash64 of every word
  * n-gram of a tokenized document in ONE pass — the hot inner loop of
  * the gram-based dedup/decontamination family (SURVEY §2.2.I).
  *
  * Output values are BIT-IDENTICAL to the SQL shape it replaces,
  *   `transform(sequence(1, size(w)-(n-1)), i -> xxhash64(array_join(slice(w, i, n), ' ')))`
  * because the joined text of gram i is a contiguous byte slice of the
  * single-space join of the WHOLE word array: the row's words are laid
  * out once into a byte buffer (`w0 ' ' w1 ' ' …`), and each gram hash
  * is `XXH64` over the slice `[start(i), end(i+n-1))` with Spark's
  * default seed 42 — no per-gram string, array, or lambda-dispatch
  * allocation (measured: the interpreted `transform` shape spends its
  * time in exactly those). Cross-engine parity is untouched: every
  * consumer already compares COUNTS of equal hashes against a
  * string-gram oracle, and equality classes are unchanged because the
  * values themselves are unchanged.
  *
  * Rows with fewer than n words produce an empty array (callers filter
  * `size(w) >= n` anyway). Null ELEMENTS are rejected at runtime with a
  * descriptive error: `split` (every call site) never yields them, and
  * the SQL shape's null behavior (array_join silently skips nulls) is a
  * footgun this expression deliberately refuses to replicate — a null
  * word reaching a gram pipeline is a bug upstream, not data.
  */
case class NgramHashes(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, s"gram size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ngram_hashes requires array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    NgramHashUtil.compute(input.asInstanceOf[ArrayData], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.NgramHashUtil.compute($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): NgramHashes =
    copy(child = newChild)
}

object NgramHashUtil {
  /** One row: lay the single-space join of all words into a byte buffer,
    * then hash each gram's contiguous slice. One buffer allocation per
    * row; zero allocations per gram beyond the output long array. */
  def compute(words: ArrayData, n: Int): ArrayData = {
    val m = words.numElements()
    if (m < n) return ArrayData.toArrayData(Array.emptyLongArray)
    // offsets(i) = byte position where word i starts in the join;
    // word i ends at offsets(i) + len(i); the separator is 1 byte.
    val offsets = new Array[Int](m + 1)
    var total = 0
    var i = 0
    val strs = new Array[org.apache.spark.unsafe.types.UTF8String](m)
    while (i < m) {
      val s = words.getUTF8String(i)
      // typed runtime error (round-9 advice item): surfaces as a
      // SparkException execution failure, not a bare
      // IllegalArgumentException from a library-internal require
      if (s == null) {
        throw new org.apache.spark.SparkException(
          "ngram_hashes: null word element (upstream bug — split never yields nulls)")
      }
      strs(i) = s
      offsets(i) = total + i // i separator bytes precede word i
      total += s.numBytes()
      i += 1
    }
    offsets(m) = total + m // one past a virtual trailing separator
    val buf = new Array[Byte](total + m) // m-1 separators + 1 slack byte
    i = 0
    while (i < m) {
      val s = strs(i)
      s.writeToMemory(buf, Platform.BYTE_ARRAY_OFFSET + offsets(i))
      val end = offsets(i) + s.numBytes()
      if (i < m - 1) buf(end) = ' '
      i += 1
    }
    val out = new Array[Long](m - n + 1)
    i = 0
    while (i <= m - n) {
      val start = offsets(i)
      val len = offsets(i + n) - 1 - start // drop the trailing separator
      out(i) = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET + start, len, 42L)
      i += 1
    }
    ArrayData.toArrayData(out)
  }

  /** One row of [[NgramHashChain]]: hash each word once straight off its
    * UTF8String memory (zero copies), then fold each gram's word hashes
    * with Spark's XxHash64 long-chain from seed 42. */
  def computeChain(words: ArrayData, n: Int): ArrayData = {
    val m = words.numElements()
    if (m < n) return ArrayData.toArrayData(Array.emptyLongArray)
    val wh = new Array[Long](m)
    var i = 0
    while (i < m) {
      val s = words.getUTF8String(i)
      if (s == null) {
        throw new org.apache.spark.SparkException(
          "ngram_hash_chain: null word element (upstream bug — split never yields nulls)")
      }
      wh(i) = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
      i += 1
    }
    val out = new Array[Long](m - n + 1)
    i = 0
    while (i <= m - n) {
      var acc = 42L
      var k = 0
      while (k < n) {
        acc = XXH64.hashLong(wh(i + k), acc)
        k += 1
      }
      out(i) = acc
      i += 1
    }
    ArrayData.toArrayData(out)
  }
}

/** Companion of [[NgramHashes]] for the WORD-HASH-CHAIN gram space:
  * gram hash = xxhash64(xxhash64(w_i), …, xxhash64(w_{i+n-1})) — i.e.
  * Spark's multi-argument `xxhash64` over the per-word hashes, the space
  * [[graft.api.Graft.shingleHashes]] established (its n = 2 shape was
  * `xxhash64(element_at(wh, i), element_at(wh, i+1))` over
  * `wh = transform(words, xxhash64)`). Values are bit-identical to that
  * shape: Spark's XxHash64 folds children as
  * `acc = hashLong(child, acc)` from seed 42, and per-word hashes are
  * `hashUnsafeBytes(bytes, 42)` — here each word is hashed ONCE with no
  * copies (straight off the UTF8String's base memory) and each gram is
  * n−1 long-chain steps, vs the interpreted per-index lambda dispatch
  * it replaces. */
case class NgramHashChain(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, s"gram size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ngram_hash_chain requires array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    NgramHashUtil.computeChain(input.asInstanceOf[ArrayData], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.NgramHashUtil.computeChain($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): NgramHashChain =
    copy(child = newChild)
}

object NgramFunctions {
  /** Column-API entry point for [[NgramHashes]]. */
  def ngram_hashes(words: Column, n: Int): Column =
    Bridge.column(NgramHashes(Bridge.expression(words), n))

  /** Column-API entry point for [[NgramHashChain]]. */
  def ngram_hash_chain(words: Column, n: Int): Column =
    Bridge.column(NgramHashChain(Bridge.expression(words), n))
}

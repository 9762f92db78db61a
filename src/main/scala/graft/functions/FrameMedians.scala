package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Rolling-frame median (and optionally the median absolute deviation of
  * the SAME frame) of a scale-4-integer array in one row-local native
  * pass — the codegen'd form of
  * `element_at(sort_array(fr), (size(fr)+1)/2)` plus
  * `element_at(sort_array(transform(fr, x -> abs(x - med))), …)`.
  *
  * Returns `struct<med_i: bigint, mad_i: bigint>`; `mad_i` is 0 when the
  * expression is constructed with `withMad = false` (rolling median only
  * — the deviation pass is skipped, not just discarded).
  *
  * Why it exists (round 12, qwin_median / qwin_hampel): the sliding
  * 10-row frames ride `collect_list` windows, and the per-row summary
  * then paid a BOXED `sort_array` per median plus an INTERPRETED
  * higher-order `transform` lambda for the deviations — the same
  * interpreted-lambda cost class qllm_novelty's scaladoc rejects (its
  * measured 5× at sf1). One primitive-long sort per frame (plus one for
  * the deviations when asked) replaces all of it inside whole-stage
  * codegen. Both medians are the 1-based ⌈n/2⌉-th smallest — bit-equal
  * to the sort_array shape and to the DuckDB
  * `list_sort(fr)[(len(fr)+1)//2]` oracle idiom (PropertySpec pins the
  * equivalence against the expression forms it replaces).
  */
case class FrameMedians(child: Expression, withMad: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = FrameMediansUtil.schema

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"frame_medians requires array<bigint>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    FrameMediansUtil.compute(input.asInstanceOf[ArrayData], withMad)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.FrameMediansUtil.compute($a, $withMad);")

  override protected def withNewChildInternal(newChild: Expression): FrameMedians =
    copy(child = newChild)
}

object FrameMediansUtil {
  val schema: StructType = StructType(Seq(
    StructField("med_i", LongType, nullable = false),
    StructField("mad_i", LongType, nullable = false)))

  /** One frame: sort a primitive copy, pick the ⌈n/2⌉-th smallest; when
    * `withMad`, overwrite the copy in place with |x − med| and sort
    * again. Frames are window-bounded (≤ the frame length), so both
    * sorts are O(frame·log frame) on a scratch array that never leaves
    * the row. An EMPTY frame is an upstream bug — the collect_list
    * window always contains at least the current row — and fails loudly
    * rather than inventing a median. */
  def compute(frame: ArrayData, withMad: Boolean): InternalRow = {
    val m = frame.numElements()
    require(m > 0, "frame_medians: empty frame")
    val a = frame.toLongArray()
    java.util.Arrays.sort(a)
    val med = a((m - 1) / 2)
    var mad = 0L
    if (withMad) {
      var i = 0
      while (i < m) { a(i) = math.abs(a(i) - med); i += 1 }
      java.util.Arrays.sort(a)
      mad = a((m - 1) / 2)
    }
    new GenericInternalRow(Array[Any](med, mad))
  }

  /** Column-API entry point. */
  def frame_medians(frame: Column, withMad: Boolean): Column =
    Bridge.column(FrameMedians(Bridge.expression(frame), withMad))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Row-local 64-bit SimHash of a token array — the per-DOC form of
  * [[SimHashAgg]].
  *
  * A document's SimHash depends only on its own tokens, so computing it
  * through `explode → shuffle → aggregate` pays a corpus-of-tokens
  * exchange (75 M rows at sf30) plus a doc-count hash aggregate for what
  * is a pure per-row function. This expression runs the whole vote loop
  * inside the scan projection: per token, `xxhash64(token)` (the exact
  * Spark hash — [[XXH64.hashUTF8String]] at seed 42, so fingerprints are
  * bit-identical to the `xxhash64(col)` + [[SimHashAgg]] pipeline it
  * replaces; PropertySpec pins the equality on random token lists), then
  * ±1 votes per bit, fingerprint bit i set iff vote i > 0.
  *
  * Null array → null. Null ELEMENTS are skipped — the same behavior as
  * the aggregate, whose update ignores null input rows. An empty array
  * votes nothing and yields fingerprint 0L; callers that previously lost
  * empty-token docs to `explode` dropping them should filter upstream if
  * they want that semantics (the simhash query's `split` always yields
  * at least one element, so the doc sets agree).
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t =>
        TypeCheckResult.TypeCheckFailure(
          s"simhash64 requires an array<string> argument, got ${t.catalogString}")
    }

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        // seed 42L = Spark's xxhash64() default, pinned so fingerprints
        // match the xxhash64(col) + SimHashAgg pipeline bit-for-bit
        val h = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUTF8String(arr.getUTF8String(i), 42L)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) fp |= (1L << j)
      j += 1
    }
    fp
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val n = ctx.freshName("n")
      val votes = ctx.freshName("votes")
      val h = ctx.freshName("h")
      val fp = ctx.freshName("fp")
      val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
      s"""
         |int $n = $a.numElements();
         |int[] $votes = new int[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    long $h = $xxh.hashUTF8String($a.getUTF8String($i), 42L);
         |    for (int $j = 0; $j < 64; $j++) {
         |      if ((($h >>> $j) & 1L) == 1L) $votes[$j]++; else $votes[$j]--;
         |    }
         |  }
         |}
         |long $fp = 0L;
         |for (int $k = 0; $k < 64; $k++) {
         |  if ($votes[$k] > 0) $fp |= (1L << $k);
         |}
         |${ev.value} = $fp;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** Column-API entry point: row-local SimHash of an array of tokens. */
  def simhash64(tokens: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(tokens)))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Native Catalyst expression for cosine similarity over float32 vectors,
  * with whole-stage codegen (SURVEY §4's optional perf lever).
  *
  * Replaces the interpreted `aggregate(zip_with(...))` fold in the hot
  * similarity queries. CRITICAL determinism property: the loop accumulates
  * dot/norm terms in ascending index order — the exact operation sequence
  * of the old Spark fold AND of the DuckDB oracle's `list_reduce`, so the
  * produced doubles are bit-identical to both and the oracle gate is
  * unaffected (D12, strengthened).
  *
  * Interpreted and codegen paths are kept in lockstep; both mirror
  *   dot += a[i]*b[i]; na += a[i]^2; nb += b[i]^2
  * then dot / (sqrt(na) * sqrt(nb)).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  /** Analysis-time input validation: this expression is registered in the
    * SQL FunctionRegistry, so arbitrary user types reach it. Without this
    * check, array<double> inputs would be read via ArrayData.getFloat —
    * silently-garbage misaligned reads on UnsafeArrayData. Both float and
    * double element types are accepted (each read with the right accessor);
    * anything else fails analysis. */
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          "cosine_similarity requires two array<float> or two array<double> " +
            s"arguments, got ${l.catalogString} and ${r.catalogString}")
    }

  private def isFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val fl = isFloat
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = if (fl) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (fl) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi
      na += xi * xi
      nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val get = if (isFloat) "getFloat" else "getDouble"
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $a.$get($i);
         |  double $yi = (double) $b.$get($i);
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Column-API entry point for [[CosineSimilarity]]. */
  def cosine_similarity(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarity(Bridge.expression(a), Bridge.expression(b)))
}

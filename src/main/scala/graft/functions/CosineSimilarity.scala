package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
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

/** Dot product over float32/float64 vectors — the per-PAIR third of
  * [[CosineSimilarity]], split out so pair-quadratic scorers (srp_lsh's
  * 13.8 B within-bucket pairs at sf30) stop recomputing both operands'
  * norms once per pair. Accumulates in ascending index order — the same
  * operation sequence as the dot term of the fused loop, so
  * `dot_product(a,b) / (vector_norm(a) * vector_norm(b))` is
  * bit-identical to `cosine_similarity(a,b)` and to the DuckDB oracle's
  * unrolled sum (PropertySpec pins this on every fixture pair).
  *
  * PRECONDITION (round-12 advice): the recomposition identity holds for
  * EQUAL-dimension vectors only. On mismatched lengths the fused loop
  * truncates all three terms (dot, na, nb) to min(len(a), len(b)), while
  * this dot truncates but [[VectorNorm]] sums its FULL array — so the
  * recomposed value differs. All srp/pq call sites feed one embedding
  * table whose vectors share a single dimension; PropertySpec pins both
  * the equal-length identity and the documented mismatched-length
  * semantics (truncated dot, full norm).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          "dot_product requires two array<float> or two array<double> " +
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
    var i = 0
    while (i < n) {
      val xi = if (fl) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (fl) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi
      i += 1
    }
    dot
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val get = if (isFloat) "getFloat" else "getDouble"
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += (double) $a.$get($i) * (double) $b.$get($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** L2 norm (sqrt of the ascending-order sum of squares) of a
  * float32/float64 vector — the per-VECTOR two-thirds of
  * [[CosineSimilarity]], computed once per row at corpus scale instead
  * of once per candidate pair at pair scale. The accumulation order and
  * the final `sqrt` match the fused loop's `na`/`nb` terms exactly, so
  * the recomposed cosine is bit-identical (see [[DotProduct]] — equal
  * dimensions required: this norm always sums its FULL array, whereas
  * the fused loop truncates to the shorter operand).
  */
case class VectorNorm(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case t =>
        TypeCheckResult.TypeCheckFailure(
          "vector_norm requires an array<float> or array<double> " +
            s"argument, got ${t.catalogString}")
    }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val fl = isFloat
    val n = x.numElements()
    var na = 0.0
    var i = 0
    while (i < n) {
      val xi = if (fl) x.getFloat(i).toDouble else x.getDouble(i)
      na += xi * xi
      i += 1
    }
    math.sqrt(na)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val get = if (isFloat) "getFloat" else "getDouble"
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val na = ctx.freshName("na")
      val xi = ctx.freshName("xi")
      s"""
         |int $n = $a.numElements();
         |double $na = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $a.$get($i);
         |  $na += $xi * $xi;
         |}
         |${ev.value} = java.lang.Math.sqrt($na);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VectorNorm =
    copy(child = newChild)
}

object VectorFunctions {
  /** Column-API entry point for [[CosineSimilarity]]. */
  def cosine_similarity(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarity(Bridge.expression(a), Bridge.expression(b)))

  /** Column-API entry point for [[DotProduct]]. */
  def dot_product(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  /** Column-API entry point for [[VectorNorm]]. */
  def vector_norm(a: Column): Column =
    Bridge.column(VectorNorm(Bridge.expression(a)))
}

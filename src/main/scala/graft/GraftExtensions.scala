package graft

import graft.functions.CosineSimilarity
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Spark extension entry point: registers graft's native functions into the
  * session's FunctionRegistry so plain SQL text can call them.
  *
  * Usage (any of):
  *   - spark.sql config: `spark.sql.extensions=graft.GraftExtensions`
  *   - builder: `.withExtensions(new GraftExtensions)`
  *   - an existing session: `GraftExtensions.register(spark)`
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.cosineSimilarityDescriptor)
    // whole-operator extension: the native as-of join planner rule
    ext.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
    // optimizer extension: naive integer band joins → binned equi-joins
    ext.injectOptimizerRule(_ => graft.plans.BandJoinRewrite)
  }
}

object GraftExtensions {

  private def build(args: Seq[Expression]): Expression = {
    require(args.length == 2, "cosine_similarity takes exactly 2 arguments")
    CosineSimilarity(args(0), args(1))
  }

  private[graft] val cosineSimilarityDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cosine_similarity"),
    new ExpressionInfo(
      classOf[CosineSimilarity].getCanonicalName,
      null,
      "cosine_similarity",
      "cosine_similarity(a, b) - cosine similarity of two float vectors (codegen'd)",
      ""),
    build)

  /** Register on an already-built session (idempotent). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_similarity", build, "scala_udf")
}

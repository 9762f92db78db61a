package graft

import graft.etl.Tables
import org.apache.spark.sql.functions._

/** GraftExtensions: the native cosine function is callable from SQL text
  * and agrees exactly with the Column-API entry point.
  */
class ExtensionsSpec extends SparkFixture {

  test("cosine_similarity registered for SQL text matches the Column API") {
    GraftExtensions.register(spark)
    val v = Tables.view(spark, sfTiny, "embeddings")
    val sqlTop = spark.sql(
      s"""WITH q AS (SELECT embedding AS q_emb FROM $v WHERE vec_id = 0)
         |SELECT e.vec_id, cosine_similarity(e.embedding, q.q_emb) AS sim
         |FROM $v e, q WHERE e.vec_id <> 0
         |ORDER BY sim DESC, vec_id LIMIT 5""".stripMargin)
      .collect().map(_.toString).toSeq
    val e = Tables.embeddings(spark, sfTiny)
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
    val apiTop = e.crossJoin(broadcast(q)).filter(col("vec_id") =!= 0)
      .select(col("vec_id"),
        graft.functions.VectorFunctions.cosine_similarity(col("embedding"), col("q_emb")).as("sim"))
      .orderBy(desc("sim"), asc("vec_id")).limit(5)
      .collect().map(_.toString).toSeq
    assert(sqlTop == apiTop)
  }
}

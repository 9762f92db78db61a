package graft.etl.ops

import graft.etl.{QueryDef, Tables}
import graft.etl.Dets._
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Encoder, Encoders}

/** §2.K user-defined function surface: scalar UDF, typed Aggregator UDAF,
  * flatMap-generator UDTF shape.
  *
  * UDFs are deliberately the *only* place this engine leaves codegen'd
  * built-ins — each query's oracle re-expresses the logic in plain SQL, so
  * the gate also proves the UDF semantics. At 100 TB a scalar JVM UDF
  * stays executor-local (no shuffle cost), but loses WholeStageCodegen —
  * the Scaladoc on each notes the built-in it would be replaced by.
  */
object UdfOps {

  /** lower + collapse internal whitespace + trim — the genre's canonical
    * per-row cleansing function. Equivalent built-in chain:
    * trim(regexp_replace(lower(s), "\\s+", " ")). */
  private val normalizeText: String => String =
    s => if (s == null) null else s.toLowerCase.replaceAll("\\s+", " ").trim

  private val qudfScalar = QueryDef(
    "qudf_scalar",
    build = (spark, sfDir) => {
      val normUdf = udf(normalizeText)
      Tables.documents(spark, sfDir)
        .select(col("doc_id"), length(normUdf(col("text"))).cast(LongType).as("norm_len"))
        .withColumn("bucket", expr("CAST(norm_len div 50 AS INT)"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_docs"), sum(col("norm_len")).cast(LongType).as("sum_len"))
        .orderBy(col("bucket"))
    },
    oracle = Some(
      "WITH d AS (SELECT length(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS norm_len " +
        "FROM documents) " +
        "SELECT CAST(norm_len // 50 AS INTEGER) AS bucket, count(*) AS n_docs, " +
        "CAST(sum(norm_len) AS BIGINT) AS sum_len " +
        "FROM d GROUP BY bucket ORDER BY bucket"))

  /** Typed Aggregator: exact decimal sum of squares (BigDecimal buffer —
    * order-independent, mergeable; the UDAF analogue of rule D2). */
  private object SumSquares
      extends Aggregator[Double, java.math.BigDecimal, java.math.BigDecimal] {
    // BigDecimal.decimal(v) uses the shortest double repr (valueOf), so the
    // ≤2-decimal fixture doubles quantize exactly.
    private def q(v: Double): java.math.BigDecimal =
      BigDecimal.decimal(v).setScale(4).bigDecimal
    def zero: java.math.BigDecimal = java.math.BigDecimal.ZERO.setScale(8)
    def reduce(b: java.math.BigDecimal, a: Double): java.math.BigDecimal =
      b.add(q(a).multiply(q(a)))
    def merge(b1: java.math.BigDecimal, b2: java.math.BigDecimal): java.math.BigDecimal =
      b1.add(b2)
    def finish(r: java.math.BigDecimal): java.math.BigDecimal = r
    def bufferEncoder: Encoder[java.math.BigDecimal] = Encoders.DECIMAL
    def outputEncoder: Encoder[java.math.BigDecimal] = Encoders.DECIMAL
  }

  private val qudafTyped = QueryDef(
    "qudaf_typed",
    build = (spark, sfDir) => {
      val ssq = udaf(SumSquares)
      Tables.lineitem(spark, sfDir)
        .groupBy(col("l_returnflag"))
        .agg(decStr(ssq(col("l_quantity")).cast(DecimalType(38, 8))).as("sum_sq_qty"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    },
    oracle = Some(
      "SELECT l_returnflag, " +
        "CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,4)) * CAST(l_quantity AS DECIMAL(12,4))) AS DECIMAL(38,8)) AS STRING) AS sum_sq_qty, " +
        "count(*) AS n " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"))

  /** Generator/UDTF shape: per-document word bigrams via typed flatMap
    * (Dataset API — partition-parallel, no driver collection), top-20. */
  private val qudtfBigrams = QueryDef(
    "qudtf_bigrams",
    build = (spark, sfDir) => {
      val sp = spark
      import sp.implicits._
      Tables.documents(spark, sfDir)
        .select(col("text")).as[String]
        .flatMap(t => t.split(" ").sliding(2).collect { case Array(a, b) => s"$a $b" })
        .toDF("bigram")
        .groupBy(col("bigram"))
        .agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), asc("bigram"))
        .limit(20)
    },
    oracle = Some(
      "WITH toks AS (SELECT doc_id, unnest(str_split(text, ' ')) AS word, " +
        "generate_subscripts(str_split(text, ' '), 1) AS pos FROM documents), " +
        "bg AS (SELECT concat(a.word, ' ', b.word) AS bigram " +
        "FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1) " +
        "SELECT bigram, count(*) AS n FROM bg GROUP BY bigram " +
        "ORDER BY n DESC, bigram ASC LIMIT 20"))

  def defs: Seq[QueryDef] = Seq(qudfScalar, qudafTyped, qudtfBigrams)
}

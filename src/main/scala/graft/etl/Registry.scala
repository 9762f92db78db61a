package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.types.DecimalType

/** One declared query: the Spark builder plus (optionally) the equivalent
  * DuckDB oracle SQL. Single source of truth behind `graft.SparkEntry`
  * (SURVEY.md §7.1). Keys follow SURVEY.md §2.2 exactly.
  */
final case class QueryDef(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Registry {

  /** Ordered inventory; order only affects harness iteration, not results. */
  lazy val all: Seq[QueryDef] =
    ops.ScanOps.defs ++
      ops.JoinOps.defs ++
      ops.AggOps.defs ++
      ops.WindowOps.defs ++
      ops.SetOps.defs ++
      ops.ScalarOps.defs ++
      ops.GraphOps.defs ++
      ops.LlmOps.defs ++
      ops.StreamOps.defs ++
      ops.UdfOps.defs ++
      graft.multimodal.Multimodal.defs

  lazy val byName: Map[String, QueryDef] = all.map(q => q.name -> q).toMap

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.build).toMap

  lazy val oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}

/** Determinism helpers implementing SURVEY.md §2.1 rules D1–D14.
  *
  * DECIMAL(12,4) is the canonical pre-aggregation cast for the fixture
  * money/measure doubles: all carry ≤ 2 decimal digits (verified in
  * FIXTURES.md), so the cast is exact, and 12-4=8 integer digits cover
  * every domain. Narrow enough that a three-factor product stays within
  * DECIMAL(38,12) exactly in both Spark and DuckDB — no overflow, no
  * rounding, ever.
  */
object Dets {
  import org.apache.spark.sql.functions._

  def dec(c: Column, p: Int, s: Int): Column = c.cast(DecimalType(p, s))

  /** D15: decimal result columns are emitted as fixed-scale STRINGS on both
    * engines. The harness compares results through pandas, where Spark
    * parquet decimals surface as `Decimal` objects but DuckDB decimals
    * convert to float64 — guaranteed hash mismatch even when the values are
    * identical (observed: every round-1 `hash_match: false` had a decimal
    * output column; CORRECTNESS_r01.json). decimal→string is exact and
    * renders identically in both engines (full scale digits, verified:
    * `1.5000`, `56120969.633652854400`) — EXCEPT that Spark's cast goes
    * through `BigDecimal.toString`, which switches to scientific notation
    * for any nonzero value with adjusted exponent < -6 — i.e. everything
    * below 1e-6 in magnitude, exactly the band the guard below rejects —
    * while DuckDB always renders plain digits. No gate measure can get
    * there (sums of ≥0.01
    * money values), so that band fails fast via `raise_error` instead of
    * latently hash-mismatching. */
  def decStr(c: Column): Column = {
    import org.apache.spark.sql.types.StringType
    when(c.isNull || c === 0 || abs(c) >= 0.000001, c.cast(StringType))
      .otherwise(raise_error(concat(
        lit("decStr: |value| < 1e-6 renders scientifically in Spark but plainly in DuckDB: "),
        c.cast(StringType))))
  }

  /** D2: exact decimal before any aggregation of a double measure. */
  def d124(c: Column): Column = dec(c, 12, 4)

  /** The fixed-shape OLS/Pearson closer over six exact moment sums
    * (n, Σx, Σy, Σxy, Σx², Σy²), already cast to double: returns
    * (slope, intercept, r2, corr). The OPERAND ORDER of these trees is
    * the cross-engine bit-exactness contract shared by qagg_corr,
    * qagg_linreg and qllm_zipf (their oracles spell the identical
    * trees) — one definition so a reshaping cannot reach only some of
    * them. */
  def olsClose(n: Column, sx: Column, sy: Column, sxy: Column,
      sxx: Column, syy: Column): (Column, Column, Column, Column) = {
    import org.apache.spark.sql.types.DoubleType
    val nD = n.cast(DoubleType)
    val cov = nD * sxy - sx * sy
    val varX = nD * sxx - sx * sx
    val varY = nD * syy - sy * sy
    (cov / varX,
      (sy - (cov / varX) * sx) / nD,
      cov * cov / (varX * varY),
      cov / (sqrt(varX) * sqrt(varY)))
  }

  def one124: Column = lit(1).cast(DecimalType(12, 4))
}

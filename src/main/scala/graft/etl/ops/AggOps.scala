package graft.etl.ops

import graft.etl.{QueryDef, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** §2.D aggregations. Determinism per SURVEY §2.1:
  *   - D2: doubles cast to exact DECIMAL(12,4) before any sum.
  *   - D3: averages emitted as DOUBLE via CAST(sum AS DOUBLE)/CAST(n AS
  *     DOUBLE) on BOTH engines — DuckDB decimal/bigint division returns
  *     DOUBLE natively (verified), and the scale-4 sums here stay < 2^53
  *     so decimal→double conversion is exact in both engines.
  *   - D4: decimal sums pinned to an explicit output type wide enough that
  *     the pin is a non-narrowing (exact) cast on both engines.
  */
object AggOps {
  import graft.etl.Dets._

  private val qaggPricing = QueryDef(
    "qagg_pricing",
    build = (spark, sfDir) => {
      val li = Tables.lineitem(spark, sfDir)
      val q = d124(col("l_quantity"))
      val price = d124(col("l_extendedprice"))
      val disc = d124(col("l_discount"))
      val tax = d124(col("l_tax"))
      val n = count(lit(1))
      li.filter(col("l_shipdate") <= lit("2001-09-01").cast(TimestampType))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(q).cast(DecimalType(38, 4)).as("sum_qty"),
          sum(price).cast(DecimalType(38, 4)).as("sum_base_price"),
          sum(price * (one124 - disc)).cast(DecimalType(38, 8)).as("sum_disc_price"),
          sum(price * (one124 - disc) * (one124 + tax)).cast(DecimalType(38, 12)).as("sum_charge"),
          (sum(q).cast(DoubleType) / n.cast(DoubleType)).as("avg_qty"),
          (sum(price).cast(DoubleType) / n.cast(DoubleType)).as("avg_price"),
          (sum(disc).cast(DoubleType) / n.cast(DoubleType)).as("avg_disc"),
          n.as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    oracle = Some(
      "SELECT l_returnflag, l_linestatus, " +
        "CAST(sum(CAST(l_quantity AS DECIMAL(12,4))) AS DECIMAL(38,4)) AS sum_qty, " +
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(12,4))) AS DECIMAL(38,4)) AS sum_base_price, " +
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)))) AS DECIMAL(38,8)) AS sum_disc_price, " +
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4))) * (CAST(1 AS DECIMAL(12,4)) + CAST(l_tax AS DECIMAL(12,4)))) AS DECIMAL(38,12)) AS sum_charge, " +
        "CAST(sum(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_qty, " +
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(12,4))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_price, " +
        "CAST(sum(CAST(l_discount AS DECIMAL(12,4))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_disc, " +
        "count(*) AS count_order " +
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00' " +
        "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"))

  def defs: Seq[QueryDef] = Seq(qaggPricing)
}

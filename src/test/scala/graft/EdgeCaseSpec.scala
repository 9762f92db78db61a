package graft

import graft.api.Graft
import graft.functions.VectorFunctions.cosine_similarity
import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY §5.2 edge cases on tiny hand-built DataFrames: empty inputs,
  * all-null columns, single-row windows, empty join sides — the organic
  * fixtures contain none of these (FIXTURES.md quirk 5).
  */
class EdgeCaseSpec extends SparkFixture {

  private def df(rows: Seq[Row], schema: StructType) =
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)

  private val kv = StructType(Seq(
    StructField("k", IntegerType), StructField("v", IntegerType, nullable = true)))

  test("aggregation over an empty input produces zero rows (not a null row)") {
    val empty = df(Nil, kv)
    assert(empty.groupBy(col("k")).agg(sum(col("v"))).count() == 0)
    // but a global aggregate over empty input is one row with null sum / 0 count
    val g = empty.agg(sum(col("v")).as("s"), count(lit(1)).as("n")).collect()(0)
    assert(g.isNullAt(0) && g.getLong(1) == 0)
  }

  test("all-null measure column: sum is null, count(col) is 0, count(*) is n") {
    val d = df(Seq(Row(1, null), Row(1, null)), kv)
    val r = d.groupBy(col("k"))
      .agg(sum(col("v")).as("s"), count(col("v")).as("cv"), count(lit(1)).as("n"))
      .collect()(0)
    assert(r.isNullAt(1) && r.getLong(2) == 0 && r.getLong(3) == 2)
  }

  test("single-row window: lag/lead null, rank 1, running sum = value") {
    val d = df(Seq(Row(1, 42)), kv)
    val w = Window.partitionBy(col("k")).orderBy(col("v"))
    val r = d.select(
      lag(col("v"), 1).over(w).as("lg"),
      lead(col("v"), 1).over(w).as("ld"),
      rank().over(w).as("rk"),
      sum(col("v")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("run"))
      .collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1) && r.getInt(2) == 1 && r.getLong(3) == 42)
  }

  test("joins against an empty side: left keeps rows, inner/semi drop all, anti keeps all") {
    val d = df(Seq(Row(1, 10), Row(2, 20)), kv)
    val empty = df(Nil, kv).select(col("k").as("k2"), col("v").as("v2"))
    assert(d.join(empty, col("k") === col("k2"), "inner").count() == 0)
    assert(d.join(empty, col("k") === col("k2"), "left").count() == 2)
    assert(d.join(empty, col("k") === col("k2"), "left_semi").count() == 0)
    assert(d.join(empty, col("k") === col("k2"), "left_anti").count() == 2)
    val leftRow = d.join(empty, col("k") === col("k2"), "left").orderBy("k").collect()(0)
    assert(leftRow.isNullAt(leftRow.fieldIndex("v2")))
  }

  test("api: dedupExact and asofJoin on empty inputs return empty, not errors") {
    val empty = df(Nil, kv)
    assert(Graft.dedupExact(empty, col("k"), col("v")).count() == 0)
    val emptyTs = spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
      StructType(Seq(StructField("k", LongType), StructField("t", LongType))))
    val some = df(Seq(Row(1, 5)), kv).select(col("k").cast(LongType).as("k"), col("v").cast(LongType).as("t"))
    assert(Graft.asofJoin(emptyTs, some, "k", "t").count() == 0) // no left events
    assert(Graft.asofJoin(some, emptyTs, "k", "t").count() == 0) // no right events
    // the custom merge-scan exec handles the same degenerate shapes
    assert(graft.plans.AsofJoinNative(spark, emptyTs, some, "k", "t").count() == 0)
    assert(graft.plans.AsofJoinNative(spark, some, emptyTs, "k", "t").count() == 0)
  }

  test("native as-of join drops null keys/timestamps like the window emulation") {
    val ts = StructType(Seq(
      StructField("k", LongType, nullable = true),
      StructField("t", LongType, nullable = true)))
    // null key and null ts rows on BOTH sides; a null-key left row must not
    // alias to key 0 (UnsafeRow reads a null slot as 0)
    val left = df(Seq(Row(0L, 5L), Row(null, 1L), Row(7L, null), Row(7L, 3L)), ts)
    val right = df(Seq(Row(0L, 9L), Row(null, 9L), Row(7L, null), Row(7L, 8L)), ts)
    val native = graft.plans.AsofJoinNative(spark, left, right, "k", "t")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val emulated = Graft.asofJoin(left, right, "k", "t")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(native == emulated, s"native $native vs emulated $emulated")
    assert(native == Seq((0L, 9L, 5L), (7L, 8L, 3L)))
  }

  test("dedupClusters on an empty pair set returns empty, not an NPE") {
    val sp = spark
    import sp.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(Graft.dedupClusters(empty, "a", "b").count() == 0)
  }

  test("globalRanks fails fast on a null order value instead of mis-ranking it") {
    val withNull = df(Seq(Row(1, 5), Row(2, 9), Row(3, null)), kv)
    val ex = intercept[Exception] {
      Graft.globalRanks(withNull, col("v"), Seq(col("k")), buckets = 4).collect()
    }
    assert(ex.getMessage.contains("non-null") ||
      Option(ex.getCause).exists(_.getMessage.contains("non-null")), ex.getMessage)
  }

  test("cosine of a zero vector is NaN (documented, not a crash); empty arrays too") {
    val sp = spark
    import sp.implicits._
    val d = Seq((Array(0.0f, 0.0f), Array(1.0f, 2.0f)), (Array.empty[Float], Array.empty[Float]))
      .toDF("a", "b")
    val sims = d.select(cosine_similarity(col("a"), col("b")).as("s")).collect()
    assert(sims.forall(r => r.getDouble(0).isNaN))
  }

  test("unionByName aligns columns by name, not position") {
    val a = df(Seq(Row(1, 10)), kv)
    val b = a.select(col("v"), col("k")) // swapped order
    val u = a.unionByName(b).collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(u == Set((1, 10)))
  }

  test("decimal cast of the fixture doubles is exact (no rounding drift)") {
    val sp = spark
    import sp.implicits._
    // 2-decimal doubles (the fixture domain) quantize exactly at scale 4
    val d = Seq(0.05, 123.45, -994.28, 0.1).toDF("x")
    val back = d.select(col("x").cast(DecimalType(12, 4)).cast(DoubleType).as("y"))
      .collect().map(_.getDouble(0))
    assert(back.toSeq == Seq(0.05, 123.45, -994.28, 0.1))
  }
}

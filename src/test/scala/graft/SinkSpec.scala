package graft

import graft.etl.Tables
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** SURVEY §2.2.A sink coverage: csv / json / partitioned-parquet writers
  * round-trip (the reference genre's load step). Parquet write of every
  * query is already exercised by graft.Verify.
  */
class SinkSpec extends SparkFixture {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("csv round-trip preserves rows and values") {
    val out = tmp("graft_csv")
    val df = Tables.nation(spark, sfTiny)
    df.write.mode("overwrite").option("header", "true").csv(out)
    val back = spark.read.option("header", "true").schema(Tables.nationSchema).csv(out)
    assert(back.count() == 25)
    assert(back.orderBy("n_nationkey").collect().map(_.toString).toSeq ==
      df.orderBy("n_nationkey").collect().map(_.toString).toSeq)
  }

  test("json round-trip preserves rows and values") {
    val out = tmp("graft_json")
    val df = Tables.region(spark, sfTiny)
    df.write.mode("overwrite").json(out)
    val back = spark.read.schema(Tables.regionSchema).json(out)
    assert(back.orderBy("r_regionkey").collect().map(_.toString).toSeq ==
      df.orderBy("r_regionkey").collect().map(_.toString).toSeq)
  }

  test("orc round-trip preserves rows and values") {
    val out = tmp("graft_orc")
    val df = Tables.supplier(spark, sfTiny)
    df.write.mode("overwrite").orc(out)
    val back = spark.read.schema(Tables.supplierSchema).orc(out)
    assert(back.orderBy("s_suppkey").collect().map(_.toString).toSeq ==
      df.orderBy("s_suppkey").collect().map(_.toString).toSeq)
  }

  test("partitioned parquet write creates lang= directories and prunes on read") {
    val out = tmp("graft_part")
    Tables.documents(spark, sfTiny)
      .write.mode("overwrite").partitionBy("lang").parquet(out)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(dirs.exists(_.startsWith("lang=")), dirs)
    val en = spark.read.parquet(out).filter(col("lang") === "en")
    // partition pruning: the physical scan should touch only the en partition
    val scanned = en.queryExecution.executedPlan.collectLeaves().head.toString
    assert(en.count() > 0)
    assert(scanned.contains("lang"), scanned.take(200))
    val exact = Tables.documents(spark, sfTiny).filter(col("lang") === "en").count()
    assert(en.count() == exact)
  }
}

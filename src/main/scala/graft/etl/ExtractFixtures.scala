package graft.etl

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Path, Paths}

/** Extract-side fixtures for the declared csv / json / partitioned-layout
  * queries (SURVEY §2.A — the genre's extract and load steps). Each fixture
  * is DERIVED deterministically from the canonical parquet tables, so the
  * DuckDB oracles stay on the parquet tables and the round trip itself —
  * text serialization, schema-declared re-read, PERMISSIVE corrupt-record
  * isolation, partition-directory layout — is the thing under test.
  *
  * The csv/json fixtures also carry exactly [[CorruptLines]] deliberately
  * unparseable lines (one structurally broken, one type-broken), so the
  * corrupt-record bucket the queries must report is a known constant the
  * oracle can state.
  *
  * Write-once per (JVM, sfDir): a marker file skips re-writing when an
  * earlier build (this process or a previous one) already produced the
  * fixture — repeated query builds in tests/bench must not race a reader
  * against an overwrite. The tmp layout is versioned (`_v1`) so a future
  * change to fixture CONTENT must bump the version rather than silently
  * reuse stale files.
  */
object ExtractFixtures {

  /** Number of corrupt lines appended to each text fixture. */
  val CorruptLines = 2

  private val ready = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def root(sfDir: String): Path =
    Paths.get(System.getProperty("java.io.tmpdir"),
      s"graft_extract_v2_${math.abs(sfDir.hashCode)}")

  private def ensure(dir: Path)(write: => Unit): String = {
    ready.computeIfAbsent(dir.toString, { _ =>
      val marker = dir.resolve("_GRAFT_FIXTURE_OK")
      if (!Files.exists(marker)) {
        write
        Files.write(marker, Array.emptyByteArray)
      }
      dir.toString
    })
  }

  /** customer as header-less CSV plus two corrupt lines. Spark's CSV
    * writer emits shortest-round-trip doubles, so the re-read values are
    * bit-identical to the parquet originals.
    *
    * Both corrupt lines carry unparseable values in the columns the
    * declared query actually REFERENCES (c_nationkey int, c_acctbal
    * double): under CSV column pruning (on by default) the parser only
    * parses referenced columns, so a structurally short row whose
    * referenced fields are merely *absent* reads as nulls without tripping
    * the corrupt-record column — only a parse failure in a parsed column
    * flags the row (observed against Spark 4.1.2; this is why neither
    * fixture line is a token-count-short row). */
  def customerCsv(spark: SparkSession, sfDir: String): String = {
    val dir = root(sfDir).resolve("customer_csv")
    ensure(dir) {
      Tables.customer(spark, sfDir)
        .write.mode("overwrite").option("header", "false").csv(dir.toString)
      Files.write(dir.resolve("zz_corrupt.csv"),
        "THIS,IS,NOT,A,CSVROW\n99999,Customer#bad,xx,9.9.9,BUILDING\n".getBytes("UTF-8"))
    }
  }

  /** documents as JSON lines plus two corrupt lines (truncated object /
    * non-JSON). Text with newlines/quotes rides on JSON escaping. */
  def documentsJson(spark: SparkSession, sfDir: String): String = {
    val dir = root(sfDir).resolve("documents_json")
    ensure(dir) {
      Tables.documents(spark, sfDir)
        .write.mode("overwrite").json(dir.toString)
      Files.write(dir.resolve("zz_corrupt.json"),
        "{\"doc_id\": \"truncated\nnot json at all\n".getBytes("UTF-8"))
    }
  }

  /** orders written `partitionBy(o_year)` — the genre's load-step layout.
    * Reading it back with a year filter must prune at the DIRECTORY level
    * (PartitionFilters, no data files of other years opened) — the
    * strongest 100 TB lever a warehouse layout has. */
  def ordersByYear(spark: SparkSession, sfDir: String): String = {
    val dir = root(sfDir).resolve("orders_by_year")
    ensure(dir) {
      Tables.orders(spark, sfDir)
        .withColumn("o_year", year(col("o_orderdate")))
        .write.mode("overwrite").partitionBy("o_year").parquet(dir.toString)
    }
  }
}

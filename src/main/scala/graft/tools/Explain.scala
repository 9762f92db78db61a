package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-inspection scratch tool: prints `explain("formatted")` for the
  * named registry queries against a fixture dir. Diagnostic only — not
  * part of the bench/verify surface.
  *
  * Usage: runMain graft.tools.Explain <sfDir> <query...>
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.buffer.pageSize", "16m")
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      println(s"===== $name =====")
      graft.etl.Registry.byName(name).build(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}

ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "data_pipeline_etlspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// Plan-pinning suites (PlanSpec, ExtensionsSpec) toggle session-global
// SQL confs (spark.sql.adaptive.enabled) around assertions on the shared
// SparkSession; parallel suite execution inside the forked JVM would let
// concurrent tests observe AQE off. Pin the (default) sequential mode so
// a future build tweak can't silently break that invariant.
Test / testForkedParallel := false
run / fork := true
// Pass forked run output through VERBATIM (no "[info] " line prefix):
// the bench/verify harness tail-parses the JSON status line from run
// output, and sbt's default logger prefix makes every line unparseable
// as JSON (observed: BENCH_r02.json "parsed": null with the complete
// JSON line sitting right there in the tail).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // Tests/fixtures build java.sql.Timestamps from local-zone APIs in places;
  // pin the JVM zone so results don't depend on the host's /etc/localtime.
  "-Duser.timezone=UTC",
  // Harness-only logging config. Deliberately NOT in src/main/resources:
  // a log4j2.properties packaged into the library jar would override any
  // downstream application's own logging configuration.
  s"-Dlog4j2.configurationFile=file:${baseDirectory.value}/conf/log4j2.properties",
  // 16g default: the single-JVM bench/verify suites run 175 queries with
  // iterative operators that localCheckpoint per round; 8g left late-
  // alphabet queries paying eviction/GC for earlier queries' blocks even
  // with per-query unpersist (the working set is legitimately larger now).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)

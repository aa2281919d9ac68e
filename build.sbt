ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "bigdatacovid19realtimespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Forked `run` output must reach stdout verbatim (no "[info] " logger
// prefix) so the bench's single JSON line stays machine-parseable.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Suppress sbt's "[success] Total time: ..." trailer: the bench driver
// parses the LAST stdout line as JSON, and the trailer lands after the
// bench's JSON line, breaking the parse (BENCH_r14..r16 "parsed": null).
Global / showSuccess := false
Global / excludeLintKeys += showSuccess // consumed by the logger, not a task
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // The bench/verify session compiles thousands of whole-stage-codegen
  // fragments (95 queries x 5 suite passes, all pinned live by the sized
  // codegen cache); JDK 17's default 240 MB reserved code cache fills
  // mid-run, the JIT silently disables, and whichever queries execute
  // next run interpreted 20-75x slower (observed as random per-run
  // outliers: q11 17s / q86 22s on different runs, same binary). 1 GB
  // keeps the JIT alive for the whole session.
  "-XX:ReservedCodeCacheSize=1g",
) ++ sys.env.get("GRAFT_JVM_LOG").map(f =>
  s"-Xlog:gc*,safepoint=info,codecache=info:file=$f:time,uptime").toSeq

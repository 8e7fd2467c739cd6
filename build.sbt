ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "findingsimilarhighdimensionalitemsforbigdatasetsspark"
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
// Pass the forked process's stdout through undecorated: the bench/verify
// drivers parse machine-readable JSON lines from stdout, and sbt's default
// LoggedOutput wraps every line in "[info] " which breaks that.
run / outputStrategy := Some(StdoutOutput)
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
)
// Heap is SCOPED: the big default belongs to the run entrypoints only.
// Bench caches 1M-doc and 4M-vector indexes concurrently with 32 executor
// threads' shuffle memory — under 8g the old gen fills as the run
// progresses and every later probe degrades (BENCH_r06 samples grew
// 2.8s -> 41s on an unchanged plan); the bench box has 128 GiB. Tests
// never build the million-row fixtures, so they keep a portable default
// that starts on an 8-16 GiB laptop. Both are SPARK_DRIVER_MEM-overridable.
run / javaOptions += s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}"
Test / javaOptions += s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "6g")}"

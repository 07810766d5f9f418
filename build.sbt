ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "librarydatawarehouseandbusinessanalyticssystemspark"
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
// The driver tail-parses Bench's final stdout line as one JSON object.
// sbt's default forked-output strategy routes the child's stdout through
// the logger ("[info] " prefix on every line) and the command loop appends
// a "[success] Total time: …" banner after it — both defeat the parse
// (BENCH_r*.json.parsed was null through round 8). Forked output therefore
// passes through verbatim and the success banner is disabled, so the bare
// JSON line is the last thing on stdout.
outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
// showSuccess is consumed by sbt's command loop, not a task — exclude it
// from the unused-key lint so the warning doesn't pollute driver logs
Global / excludeLintKeys += showSuccess
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // A 240-query sweep JIT-compiles ~170 MB of generated code (measured
  // r14: both 116 MB code heaps ~72% full after ONE sweep pass with
  // full_count still 0) — the JDK 17 default 240 MB reserve would hit
  // code-cache flushing midway through the second pass, and methods
  // deoptimized by the flush re-run interpreted inside later queries'
  // measured windows. Reserved ≠ committed: the larger reserve costs
  // address space only.
  "-XX:ReservedCodeCacheSize=512m",
)

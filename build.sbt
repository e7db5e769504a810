ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "mhw3ddetectionspark"
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
// Plan-shape specs read full explain strings; the bench/verify JVMs cap
// plan rendering (see GraftSession) for driver-CPU reasons that don't
// apply to a test run.
Test / envVars += "SPARK_GRAFT_MAX_PLAN_STR" -> "2147483632"
// Pass forked-JVM stdout through unprefixed: the bench/verify harness
// parses the single JSON line Bench prints, and sbt's default logger
// would wrap it as "[info] {...}".
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // ~200 distinct whole-stage-codegen'd plans overflow the default
  // 240 MB JIT code cache; once full HotSpot silently stops compiling
  // and the whole suite runs interpreted (uniform 5-30x slowdown late
  // in a run). Size it for the full query inventory.
  "-XX:ReservedCodeCacheSize=2g",
  "-XX:+UseCodeCacheFlushing",
  // Bench calls System.gc() in its settle windows (between timed
  // sweeps) so accumulated garbage + ContextCleaner churn happen
  // concurrently there instead of inside a timed query
  "-XX:+ExplicitGCInvokesConcurrent",
  // ~200 codegen'd plans enqueue thousands of C2 jobs at warmup; more
  // compiler threads drain the queue while the (untimed) warmup runs
  // instead of bleeding tier-1 episodes into the timed passes
  "-XX:CICompilerCount=12",
) ++ sys.env.get("SPARK_GRAFT_GC_LOG").map(f => s"-Xlog:gc*:file=$f:time,uptime").toSeq

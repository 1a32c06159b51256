ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "mrsboraetlspark"
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
// The driver scrapes the LAST stdout line of `sbt runMain` as JSON. Two
// pieces of sbt log decoration were defeating that for five rounds:
// (1) the forked JVM's stdout was routed through sbt's logger, arriving
//     as "[info] {...}" — StdoutOutput passes it through bare;
// (2) sbt appends "[success] Total time: ..." as the true final line —
//     showSuccess := false drops it.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
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
  // Throughput GC for batch analytics (r16, guide §1.2 per-task work):
  // G1's concurrent marking/region machinery taxes 32 concurrent
  // codegen'd tasks on an allocation-heavy sweep — measured best-of-3 on
  // an 11-query subset at sf0.1: G1/8g 59.9 s -> ParallelGC/8g 47.5 s
  // (-21%), ParallelGC/16g 44.8 s. Same rationale as setting
  // spark.executor.defaultJavaOptions=-XX:+UseParallelGC on a batch
  // cluster; latency-sensitive deployments override via SPARK_GRAFT_GC.
  s"-XX:+Use${sys.env.getOrElse("SPARK_GRAFT_GC", "Parallel")}GC",
)

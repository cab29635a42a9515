ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "cs425_distributed_systems_mp4_mapreducespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// Suites share one SparkSession and several temporarily mutate session
// confs (AQE, codegen factory, shuffle partitions) — run serially.
Test / parallelExecution := false
run / fork := true
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
  // 24g + ParallelGC: the full-contract Bench churns ~138 queries ×
  // 3 reps of persist/unpersist cycles through one JVM; at 8g/G1 the
  // GC tax inflated the sf0.1 total ~13% (54.6 → 48.1 s measured).
  // Throughput GC fits a batch bench; the box has 128 GiB.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // pre-sized young-gen-heavy heap: with the default tiny -Xms the
  // 441-execution bench spends its first minutes growing the heap
  // through adaptive-sizing GCs
  s"-Xms${sys.env.getOrElse("SPARK_GRAFT_XMS", "12g")}",
  "-XX:+UseParallelGC",
)

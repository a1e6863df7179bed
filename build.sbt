ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "etlprojectspark"
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
// The bench/verify contract is ONE machine-parsable JSON line on stdout.
// sbt's default forked-output strategy prefixes every program line with
// "[info] " and appends its own "[success] Total time: …" epilogue —
// every round's harness-captured stdout tail shows the metric line as
// `[info] {"metric":…}` followed by the epilogue, which is why no round's
// artifact ever parsed. Pass the forked JVM's stdout through verbatim and
// drop the epilogue so the LAST line of a successful run IS the JSON.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
ThisBuild / showSuccess := false
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
  // A 276-query suite generates thousands of whole-stage-codegen classes;
  // the JDK default 240 MB code cache silently stops JIT compilation when
  // full (no warning unless -XX:+PrintCodeCache) and everything after
  // runs interpreted. Standard Spark-driver sizing for many-query JVMs.
  "-XX:ReservedCodeCacheSize=512m",
  "-XX:+UseCodeCacheFlushing",
)
// Kernel preconditions (e.g. jaccardDistinct's distinct-input contract)
// are verified per call in the test JVM only — the bench/verify hot path
// compiles the checks out.
Test / javaOptions += "-Dgraft.debug.checks=true"

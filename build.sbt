ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "airbnblistingsdatapipelinesspark"
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
// Forked run output goes straight to this process's stdout, NOT through
// sbt's logger: the logger prefixes every line with "[info] ", which has
// made the bench JSON line unparseable to line-oriented consumers for
// three rounds (BENCH_r0{2,3,4}.json all show `parsed: null` with the
// JSON intact but prefixed in the captured tail).
outputStrategy := Some(StdoutOutput)
// ...and drop the trailing "[success] Total time" line for the same
// reason: it trails the JSON, so a last-line parse always sees it first.
Global / showSuccess := false
// showSuccess is consumed by sbt's command engine, not by another
// setting, so the unused-key lint misfires on it.
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
  // The 30-query suite generates enough whole-stage-codegen classes to
  // overflow the default 240MB JIT code cache; once full the compiler
  // silently disables and everything runs interpreted (observed 12x
  // suite slowdown with arbitrary queries going 50x). Size it so the
  // JIT never stops.
  "-XX:ReservedCodeCacheSize=1g",
)

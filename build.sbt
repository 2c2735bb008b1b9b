ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "sentimentanalysisdataengineeringspark"
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
// Forked run output goes through sbt's logger by default, prefixing every
// program line with "[info] " — which breaks downstream parsers expecting
// Bench/Verify's final stdout line to be raw JSON. Pass it through as-is,
// and drop the trailing "[success] Total time ..." line for the same
// reason (the JSON summary must be the LAST stdout line).
outputStrategy := Some(StdoutOutput)
showSuccess := false
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
  // whole-stage codegen emits fresh classes per query; a full registry
  // run (133 queries x 3 passes) saturates the 240m JDK-17 default and
  // silently disables the JIT for late-alphabet queries — q32/q33 ran
  // ~40% slower in-pool than isolated until this was raised
  "-XX:ReservedCodeCacheSize=512m",
)

ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "mydumperspark"
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
// Pass the forked JVM's stdout through RAW (no "[info] " sbt-logger
// prefix): the bench/verify driver parses the one JSON line Bench
// prints, and a prefixed line fails its json parse (round-1 lesson).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Suppress the trailing "[success] Total time: ..." line: the driver
// keeps only the last 2000 chars of stdout and parses the bench JSON
// line out of that tail — a trailer after the JSON line eats tail
// budget (rounds 1-2 both ended with parsed:null).
Global / showSuccess := false
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
  // The bench runs ~100 distinct query shapes through whole-stage
  // codegen in ONE JVM: an 8g heap + default 240m code cache caused
  // GC/JIT thrash that inflated late-alphabet queries 3-9x in round 3
  // (unchanged plans). The box has 128 GiB; give the forked JVM room.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  "-XX:ReservedCodeCacheSize=512m",
  "-XX:+UseG1GC",
)

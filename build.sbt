ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "minisparkspark"
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
// forward stdin to the forked JVM (graft.Shell is an interactive REPL)
run / connectInput := true
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
  // The bench sweep runs ~100 distinct whole-stage-codegen'd queries in
  // one JVM; the default 240 MB code cache fills late in the sweep and
  // C2 compilation of late-arriving paths (the MERGE apply is probe
  // ~90) degrades to flush-and-throttle — measured as a uniform ~2x
  // inflation of every merge-trace step vs the same code in a fresh
  // JVM. Bench records code-cache occupancy in the env fingerprint.
  "-XX:ReservedCodeCacheSize=512m",
)

// Forked-JVM stdout passes through UNDECORATED: the bench/verify contract
// is one bare JSON line on stdout, and sbt's default LoggedOutput prefixes
// every line with "[info] ", which breaks machine parsing of the output
// (BENCH "parsed": null two rounds running). Unscoped so run/runMain/test
// all inherit it.
outputStrategy := Some(OutputStrategy.StdoutOutput)

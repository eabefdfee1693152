ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "flinkstreamingkmeansspark"
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
// Emit the forked process's stdout/stderr VERBATIM. sbt's default
// LoggedOutput prefixes every forked stdout line with "[info] " (and
// stderr with "[error] "), which defeats any line-anchored parse of
// the bench's metrics JSON — the round driver recorded "parsed": null
// every single round (r01–r21) because the contract line never
// started at column 0. StdoutOutput passes lines through untouched.
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // r21 note: -XX:+UseTransparentHugePages was trialed against the
  // ~1 s young GCs measured on this host's 4 KiB-page heap, but after
  // the allocation fix (sorted-merge jaccard) three on/off A/Bs showed
  // no win (one read slightly negative), so it is NOT enabled —
  // OPTIMIZATION_r21.md item 11 has the numbers
)

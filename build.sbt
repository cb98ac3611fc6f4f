ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "mini_sql_enginespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// Suites share one SparkSession (SparkTestBase) and some tests toggle
// session confs (e.g. SinksSpec disables auto-broadcast around its
// bucketed-join assertion); running suites concurrently lets that toggle
// race another suite's plan-shape assertions — observed as an
// intermittent CartesianProduct "failure" in PlanAuditSpec. Suites run
// sequentially; parallelism lives inside Spark's local[4], not sbt.
Test / parallelExecution := false
// Scaladoc is part of the build check: the README sells the facade by
// its scaladoc, so doc rot (a @link to a renamed member, a malformed
// tag) must fail `sbt test`, not a future reader.
Test / test := (Test / test).dependsOn(Compile / doc).value
run / fork := true
// The bench driver parses the LAST stdout line as JSON. Two sbt behaviors
// break that: forked-run output is prefixed "[info] ", and sbt appends a
// "[success] Total time: …" line after the run. StdoutOutput passes the
// forked JVM's stdout through unprefixed; showSuccess drops the trailer —
// together they make Bench's JSON the literal last line.
outputStrategy := Some(StdoutOutput) // unscoped: covers run AND runMain
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
)

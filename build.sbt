ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "tickdbspark"
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
// sf0.1-scale invariance pins (SlowScaleSpec) are excluded from the
// default `sbt test` lap; run them with
//   GRAFT_SLOW=1 sbt "testOnly graft.SlowScaleSpec"
// (the env var lifts the tag exclusion — sbt applies testOptions to
// testOnly as well, so a plain "-n Slow" would be cancelled by "-l")
Test / testOptions ++= (
  if (sys.env.contains("GRAFT_SLOW")) Seq.empty
  else Seq(Tests.Argument(TestFrameworks.ScalaTest, "-l", "Slow")))
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
  // pin the JVM zone too: java.sql.Timestamp.valueOf literals parse in
  // the JVM default zone, and only both pins together make wall-clock
  // literals mean UTC everywhere
  "-Duser.timezone=UTC",
  // 24g measured as the GC sweet spot for the 32-thread bench JVM on
  // this 128 GiB box: the 15 most expensive queries' min-lap total is
  // 65.1 s at 8g, 46.0 s at 24g, 48.4 s at 48g (BASELINE.md round-10
  // variance section) — the 8g default both slowed the official lap
  // ~30% and injected most of its 4-10x per-query swings
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)

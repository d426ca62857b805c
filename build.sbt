ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "new_crawlerspark"
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
// pass the forked process's stdout through verbatim — the bench JSON line
// must reach the caller without sbt's [info] log decoration
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
  // local[N] is a single JVM doing the work of a whole cluster: cached
  // fetch results + shuffle buffers need real heap or GC serializes the
  // executor threads (measured: 32-thread fetch stage degraded to 8-thread
  // speed at 8g; 80g triggered giant-heap G1 pauses — 32g is the sweet spot
  // for this 125g box).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  // Pre-touch the whole heap at JVM start (Xms=Xmx + AlwaysPreTouch): on
  // this shared microVM the HOST reclaims guest pages under its own memory
  // pressure, and a fast RSS-growth burst (exactly what a crawl round's
  // caches do) then faults pages back host-side at a measured 13×
  // throughput collapse of pure-CPU work in the same JVM (Ballast
  // experiment, BENCH.md: 16,111 → 1,178 pages/s after touching 15 GB;
  // with a pre-touched heap the same allocation runs at full speed).
  // Pre-touching moves that fault storm to JVM startup — untimed — and
  // keeps the timed rounds allocation-stable.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  "-XX:+AlwaysPreTouch",
) ++ sys.env.get("SPARK_GRAFT_JAVA_OPTS").toSeq.flatMap(_.split(" ").toSeq)

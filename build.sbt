ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "blackroadfeaturestorespark"
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
// Forked `run` output passes through UNPREFIXED: the bench/verify
// drivers parse the final JSON line from captured output, and sbt's
// default LoggedOutput strategy prepends "[info] " to every child
// stdout line, which breaks line-wise json parsing.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
// Heap is CAPPED at 16 GiB regardless of SPARK_DRIVER_MEM: measured at
// sf0.1 (r3), a ~90 GiB lazily-committed heap makes G1 cycle through
// fresh never-touched regions, so allocation-heavy stages (windows,
// shuffles) continuously fault+zero new pages — tens of seconds of
// kernel time per query (q_asof_join 29.5s process-CPU at 96g vs 10.0s
// at 16g, same query same data). Right-sizing the heap lets G1 reuse
// warm regions. 16 GiB comfortably fits sf1-scale local benches.
val benchHeap: String = {
  val req = sys.env.getOrElse("SPARK_DRIVER_MEM", "8g").trim.toLowerCase
  val mb = if (req.endsWith("g")) req.dropRight(1).toLong * 1024
    else if (req.endsWith("m")) req.dropRight(1).toLong
    else req.toLong
  if (mb > 16384) "16g" else req
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx$benchHeap",
  // Kill the kernel zero-fill noise AT THE SOURCE (r4's dominant
  // contamination: queries measured with sys-time ≫ user-time while the
  // JVM faulted in fresh heap pages). Xms=Xmx + AlwaysPreTouch commits
  // and zeroes the whole heap ONCE at JVM startup — before the first
  // query timer starts — so no query ever pays first-touch faults; THP
  // (madvise mode, available here) backs the heap with 2 MiB pages,
  // ~512× fewer faults for what remains.
  s"-Xms$benchHeap",
  "-XX:+AlwaysPreTouch",
  "-XX:+UseTransparentHugePages",
  // Dozens of queries × whole-stage-codegen classes exhaust the default
  // 240 MB JIT code cache mid-run; once full, compilation stops and
  // CPU-bound stages (decimal aggs, windows) run interpreted at 10-30×
  // cost. Observed: q1_agg 61 s late in a 39-query run vs 10 s in
  // isolation. A 1 GiB cache keeps the JIT on for the whole suite.
  "-XX:ReservedCodeCacheSize=1g",
)

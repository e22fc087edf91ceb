ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "datapipeline4onlineretailspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// Spark suites share one SparkSession; run them serially to keep
// streaming-query + listener tests deterministic.
Test / parallelExecution := false
run / fork := true
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
// Heap for forked run/test JVMs: local[N] runs all execution in one JVM,
// and GC pressure under 32 concurrent task threads showed up as
// multi-second per-query stalls at 8g on the 128 GiB bench box — but a
// hardcoded 32g fails to start (or invites the OOM-killer) on smaller
// machines, so the default is derived from physical RAM (quarter of it,
// clamped to [2g, 32g]). SPARK_DRIVER_MEM always wins.
val driverHeap: String = sys.env.getOrElse("SPARK_DRIVER_MEM", {
  val memTotalGb: Long =
    try scala.io.Source.fromFile("/proc/meminfo").getLines()
      .find(_.startsWith("MemTotal"))
      .map(_.filter(_.isDigit).toLong / (1024L * 1024L)).getOrElse(8L)
    catch { case _: Throwable => 8L } // non-Linux: conservative
  s"${(memTotalGb / 4).max(2L).min(32L)}g"
})
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx$driverHeap",
)

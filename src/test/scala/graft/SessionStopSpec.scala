package graft

import org.scalatest.funsuite.AnyFunSuite

/** Session-cache lifetime across a SparkContext stop — runs
  * [[graft.tools.SessionStopProbe]] in a forked JVM (stopping a context
  * would kill every sibling suite's shared session, so the cycle cannot
  * run in-process). The probe fills caches, stops the session, asserts
  * the SessionScoped registry evicted everything, then proves a second
  * context in the same JVM starts clean and rebuilds.
  */
class SessionStopSpec extends AnyFunSuite {

  test("stopping a session evicts its cache entries; a fresh context starts clean") {
    val javaBin = java.nio.file.Paths.get(
      System.getProperty("java.home"), "bin", "java").toString
    val cp = System.getProperty("java.class.path")
    // re-use this (forked test) JVM's --add-opens flags — Spark on JDK17+
    // fails to boot without them
    import scala.jdk.CollectionConverters._
    val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala
      .filter(a => a == "--add-opens" || a.endsWith("=ALL-UNNAMED"))
    val cmd = Seq(javaBin) ++ jvmArgs ++
      Seq("-Xmx4g", "-cp", cp, "graft.tools.SessionStopProbe", "/root/testdata/sf0.001")
    val out = new StringBuilder
    val proc = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    val reader = new java.io.BufferedReader(
      new java.io.InputStreamReader(proc.getInputStream))
    var line = reader.readLine()
    while (line != null) { out.append(line).append('\n'); line = reader.readLine() }
    val rc = proc.waitFor()
    assert(rc == 0 && out.toString.contains("[session-stop-probe] OK"),
      s"probe failed (rc=$rc):\n${out.toString.linesIterator.toSeq.takeRight(25).mkString("\n")}")
  }
}

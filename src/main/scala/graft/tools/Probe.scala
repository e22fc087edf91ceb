package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic main (not part of the library surface).
  *
  *   runMain graft.tools.Probe                 — entry smoke + per-query timings (sf0.1)
  *   runMain graft.tools.Probe <sfDir>         — same on another SF
  *   runMain graft.tools.Probe <sfDir> <query> — time one query 3× (first-run
  *                                               vs steady-state split) and
  *                                               print its formatted plan skeleton
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    // warmup so first measurement isn't session startup
    spark.range(100000).selectExpr("md5(cast(id as string)) h").groupBy("h").count().count()

    // time a noop WRITE, not count() — a bare count lets Catalyst prune
    // projection work, so count-timings understate projection-heavy
    // queries (same fix as Bench). `df` is BY-NAME so frame construction is
    // timed too: eager queries (localCheckpoint rounds in q54/q19) do most
    // of their work before any action, and Bench times construction.
    def time(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[probe] $label time=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }

    args.drop(1).headOption match {
      case Some(q) =>
        val fn = graft.SparkEntry.queries(q)
        for (run <- 1 to 3) time(s"$q run$run")(fn(spark, dir))
        println(fn(spark, dir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode).linesIterator
          .takeWhile(_.nonEmpty).mkString("\n"))
      case None =>
        println(s"[probe] entry rows=${graft.SparkEntry.entry(spark).count()}")
        graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
          time(name)(fn(spark, dir))
        }
    }
    spark.stop()
  }
}

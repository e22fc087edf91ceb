package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic main (not part of the library surface).
  *
  *   runMain graft.tools.PlanDump <outDir> <suffix> <query1,query2,...> [sfDir] [--executed]
  *
  * Writes the FULL `.explain("formatted")` output of each named driver
  * query to `<outDir>/<query>_<suffix>.txt` — the optimization rounds'
  * plan-evidence files (plans/rN/<q>_{before,after}.txt). Runs
  * under the same session shape as Bench (local[16] default, 16 shuffle
  * partitions, 64m broadcast threshold) so the captured plan is the
  * plan the bench executes, not a different-config cousin. Queries that
  * do eager work at construction (localCheckpoint loops) execute that
  * work here; the dump is the final frame's plan either way.
  *
  * With `--executed` (r19, VERDICT r18 item 1): each query is first
  * driven to completion through its own QueryExecution
  * (`toRdd.foreach`, which finalizes every AdaptiveSparkPlan), and the
  * dump is the FINAL adaptive plan (`isFinalPlan=true`) — the plan AQE
  * actually ran, with runtime join-strategy conversions and
  * AQEShuffleRead coalescing visible. The pre-execution dumps r18
  * committed are initial plans and cannot verify broadcast claims on
  * InMemoryRelation-fed joins; these can.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <suffix> <q1,q2,...> [sfDir] [--executed]")
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val executed = args.contains("--executed")
    val dir = args.drop(3).filterNot(_.startsWith("--")).headOption
      .getOrElse("/root/testdata/sf0.1")
    val threads = math.min(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt,
      sys.env.getOrElse("SPARK_GRAFT_BENCH_MAX_THREADS", "16").toInt)
    val spark = SparkSession.builder().master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(outDir)
    names.foreach { q =>
      val fn = graft.SparkEntry.queries.getOrElse(q,
        sys.error(s"unknown query $q"))
      val qe = fn(spark, dir).queryExecution
      if (executed) {
        // Execute THIS QueryExecution (a noop write would plan a separate
        // write command and leave this one's AdaptiveSparkPlan unfinalized).
        spark.sparkContext.setJobDescription(s"plandump:$q")
        qe.toRdd.foreach(_ => ())
      }
      val txt = qe.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(outDir.resolve(s"${q}_$suffix.txt"), txt)
      println(s"[plandump] wrote ${q}_$suffix.txt (${txt.length} chars)" +
        (if (executed) s" isFinalPlan=${txt.contains("isFinalPlan=true")}" else ""))
    }
    spark.stop()
  }
}

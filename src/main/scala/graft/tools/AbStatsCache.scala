package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic main: the repeat-call delta the guardedStats memo buys
  * (VERDICT r15 advisory #1: the probe — one hash aggregate over the
  * group column — re-ran on EVERY auto-dial invocation on the same
  * input; at sf10 it was ~13s of a 41s query).
  *
  * Method: q53's shape (rankFunctionsAuto over lineitem's return-flag
  * groups) executed `runs` times to a noop sink with the memo ON, then
  * `runs` more with the memo OFF (`spark.graft.shape.statsCache=false`)
  * — same session, same persisted-ish input path, probe-invocation
  * counts printed per call so the cache hit is visible in kind, not
  * just in seconds. With the memo, call 1 probes once and every later
  * call probes zero times; without it, every call probes.
  *
  *   runMain graft.tools.AbStatsCache <sfDir> [runs]
  */
object AbStatsCache {
  def main(args: Array[String]): Unit = {
    import graft.ops.ShapeDispatch
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.drop(1).headOption.map(_.toInt).getOrElse(3)
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
    spark.range(100000).selectExpr("md5(cast(id as string)) h").groupBy("h").count().count()

    val li = graft.io.Tables.table(spark, dir, "lineitem")
      .select("l_returnflag", "l_orderkey", "l_linenumber", "l_quantity")

    def call(label: String, run: Int): Unit = {
      val p0 = ShapeDispatch.probeInvocations.get()
      val t0 = System.nanoTime()
      ShapeDispatch.rankFunctionsAuto(li, Seq("l_returnflag"),
          Seq("l_quantity"), Seq("l_orderkey", "l_linenumber"))
        .write.format("noop").mode("overwrite").save()
      graft.dedup.Checkpoints.releaseOutputs()
      val dt = (System.nanoTime() - t0) / 1e9
      val probes = ShapeDispatch.probeInvocations.get() - p0
      println(f"[ab:statscache] dir=$dir mode=$label run=$run " +
        f"time=$dt%.2fs probes=$probes")
    }

    println(s"[ab:statscache] dir=$dir threads=$threads runs=$runs")
    for (run <- 1 to runs) call("memo_on", run)
    spark.conf.set(ShapeDispatch.StatsCacheKey, "false")
    for (run <- 1 to runs) call("memo_off", run)
    spark.stop()
  }
}

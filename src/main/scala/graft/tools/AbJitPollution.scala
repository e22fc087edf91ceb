package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Diagnostic main: is any PRODUCTION query susceptible to the JIT
  * profile pollution AB_MULTIPCT_FUSION_HEAVY measured (r17: 28× CPU
  * blowups on IDENTICAL plans when interpreted/codegen-fallback HOF
  * paths ran earlier in the same JVM — the shared interpreter call
  * sites, `Expression.eval` dispatch above all, go megamorphic and the
  * JIT deoptimizes every later user of those sites)?
  *
  * The candidate the r17 VERDICT names is q50 (to_json/from_json — both
  * ride CodegenFallback, so their hot loop IS `Expression.eval`). The
  * control is q07 (join+agg, whole-stage codegen end to end — its hot
  * loop never enters the interpreter, so a clean/polluted delta there
  * would be general load, not profile pollution).
  *
  *   runMain graft.tools.AbJitPollution <clean|polluted> [sfDir] [runs]
  *
  * One JVM per mode (the pollution is a JVM-lifetime property — that is
  * the finding); the driver script runs both and diffs. `polluted`
  * first runs a deliberate pollutant: aggregate/transform/filter HOFs
  * and from_json over VARIED element types, the same interpreter
  * entry points q50's fallback expressions evaluate through, with
  * enough volume to shape the JIT profile before the timed cells.
  * Metric: min wall + min executorCpuTime over runs (min-estimator —
  * host stalls inflate, never deflate).
  */
object AbJitPollution {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("clean")
    require(mode == "clean" || mode == "polluted", s"mode clean|polluted, got $mode")
    val dir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.drop(2).headOption.map(_.toInt).getOrElse(3)
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

    val cpuNanos = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        cpuNanos.addAndGet(sc.stageInfo.taskMetrics.executorCpuTime)
    })

    if (mode == "polluted") {
      // The pollutant: every major interpreted entry point, each over
      // several distinct runtime types (monomorphic profiles survive; it
      // is the VARIETY that megamorphizes the shared call sites).
      val t0 = System.nanoTime()
      val n = 2000000L
      val base = spark.range(n).select(col("id"),
        sequence(lit(1), (col("id") % 8 + 2).cast("int")).as("xs"))
      def drain(df: DataFrame): Unit =
        df.write.format("noop").mode("overwrite").save()
      // aggregate HOF, long / double / string accumulators
      drain(base.select(expr("aggregate(xs, 0L, (a, x) -> a + x)").as("v")))
      drain(base.select(expr("aggregate(xs, 0.0d, (a, x) -> a + x * 0.5)").as("v")))
      drain(base.limit(200000).select(
        expr("aggregate(xs, '', (a, x) -> concat(a, sha2(cast(x as string), 256)))").as("v")))
      // transform / filter / zip_with over varied element types
      drain(base.select(expr("transform(xs, x -> x * 2)").as("v")))
      drain(base.select(expr("transform(xs, x -> named_struct('a', x, 'b', cast(x as string)))").as("v")))
      drain(base.select(expr("filter(xs, x -> x % 2 = 0)").as("v")))
      drain(base.select(expr("zip_with(xs, xs, (a, b) -> a + b)").as("v")))
      // from_json over schemas DIFFERENT from q50's (same fallback class)
      drain(spark.range(500000).select(
        expr("from_json(concat('{\"k\":', id, ',\"arr\":[1,2]}'), 'k long, arr array<int>')").as("v")))
      println(f"[ab:jit] pollutant done in ${(System.nanoTime() - t0) / 1e9}%.1fs")
    }

    def cell(name: String): Unit = {
      val q = graft.SparkEntry.queries(name)
      var minT = Double.MaxValue; var minC = Double.MaxValue
      for (run <- 1 to runs) {
        val c0 = cpuNanos.get()
        val t0 = System.nanoTime()
        q(spark, dir).write.format("noop").mode("overwrite").save()
        graft.dedup.Checkpoints.releaseOutputs()
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300)
        val dc = (cpuNanos.get() - c0) / 1e9
        minT = math.min(minT, dt); minC = math.min(minC, dc)
        println(f"[ab:jit] mode=$mode q=$name run=$run time=$dt%.2fs cpuSec=$dc%.1f")
      }
      println(f"[ab:jit] mode=$mode q=$name MIN time=$minT%.2fs cpuSec=$minC%.1f")
    }
    cell("q50_json_roundtrip") // the CodegenFallback-hot candidate
    cell("q07_report_customer") // whole-stage-codegen control
    spark.stop()
  }
}

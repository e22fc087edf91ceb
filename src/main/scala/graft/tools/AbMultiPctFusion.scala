package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Diagnostic main: A/B the r16 MULTI-COLUMN ranked-percentile fusion
  * (r15 VERDICT advisory #3) on the q166 shape, same session and data —
  *
  *   joined — the r15 ranged branch: one full
  *     [[graft.ops.CoreOps.rankedPercentiles]] pass PER value column
  *     (each with its own range exchange + bookkeeping + broadcast
  *     lookups), inner-joined on the group keys;
  *   fused — [[graft.ops.ShapeDispatch.rankedPercentilesFused]]: the
  *     value columns melted to (group, spec, value) long form and
  *     ranked in ONE pass keyed by (group, spec) — one exchange shared
  *     by every column;
  *   single — ONE column through rankedPercentiles, the unit the
  *     advisory prices against ("two-column cost dropping toward 1× of
  *     single-column").
  *
  *   runMain graft.tools.AbMultiPctFusion <sfDir> [runs]
  *
  * Run 1 pays codegen + cache fill — trust the later runs. Value
  * equality is Round16Spec + the frozen q166 oracle hash; this main
  * measures the exchange-count trade at each scale.
  */
object AbMultiPctFusion {
  def main(args: Array[String]): Unit = {
    import graft.ops.ShapeDispatch
    import graft.ops.ShapeDispatch.PercentileSpec
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

    // optional third arg `derived`: feed both forms an input whose
    // lineage carries real per-row compute (md5-derived values). The
    // JOINED form re-evaluates that WHOLE upstream once per value
    // column (sampler + shuffle per rankedPercentiles pass); the fused
    // melt evaluates it once — the general-case cost the fusion deletes
    // (a raw-table input makes each pass a cheap pruned scan, so the
    // per-pass upstream is ~free and the comparison is pure exchange
    // mechanics — the r14 AB_q166_fusion receipt's same split).
    val derived = args.drop(2).headOption.contains("derived")
    // `heavy[=N]` (r16 VERDICT advisory #2): the win case the fused
    // form's scaladoc promises — a SHARED upstream genuinely expensive
    // per evaluation. Both value columns derive from ONE iterated-sha2
    // chain (N rounds; bare `heavy` defaults to 150) over the row keys:
    // the per-column
    // joined form evaluates that chain once per rankedPercentiles pass
    // (2× total), the fused melt once (its single projection computes
    // both columns; subexpression elimination shares the chain). The
    // receipt metric is executorCpuTime — wall-clock-noise-resistant.
    val heavyIters = args.find(_.startsWith("heavy"))
      .map(a => a.split("=").drop(1).headOption.map(_.toInt).getOrElse(150))
    val liRaw0 = graft.io.Tables.table(spark, dir, "lineitem")
      .select("l_returnflag", "l_orderkey", "l_linenumber",
        "l_quantity", "l_extendedprice")
    // the heavy chain must PARALLELIZE or the cell measures one task's
    // sha2 throughput (sf0.1 lineitem is a single parquet split):
    // spread the rows before the derivation so every pass's chain work
    // rides all cores — the repartition exchange is part of the shared
    // upstream both forms re-evaluate, which is exactly the premise
    val liRaw = heavyIters match {
      case Some(_) => liRaw0.repartition(threads)
      case None    => liRaw0
    }
    val li = heavyIters match {
      case Some(iters) =>
        // iteration via the aggregate HOF, not expression nesting — a
        // fold of N sha2 calls is an N-deep Catalyst tree and overflows
        // the analyzer stack at N~600; the HOF keeps depth O(1) and
        // runs the N rounds per row at execution time
        val chain = aggregate(
          sequence(lit(1), lit(iters)),
          concat_ws("|", col("l_orderkey"), col("l_linenumber")),
          (acc, _) => sha2(acc, 256))
        val base = conv(substring(chain, 1, 12), 16, 10).cast("long")
        liRaw.select(col("l_returnflag"),
          (base % 1009L).cast("double").as("l_quantity"),
          ((base * 31L) % 100003L).cast("double").as("l_extendedprice"))
      case None =>
      (if (!derived) liRaw
       else liRaw
         .withColumn("l_quantity",
           col("l_quantity") +
             (conv(substring(md5(concat_ws("|",
               col("l_orderkey"), col("l_linenumber"), col("l_quantity"))), 1, 6),
               16, 10).cast("long") % 7).cast("double"))
         .withColumn("l_extendedprice",
           col("l_extendedprice") +
             (conv(substring(md5(concat_ws("|",
               col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))), 1, 6),
               16, 10).cast("long") % 11).cast("double")))
        .select("l_returnflag", "l_quantity", "l_extendedprice")
    }
    val specs = Seq(
      PercentileSpec("l_quantity", Seq(0.5, 0.9), Seq("p50raw", "p90raw")),
      PercentileSpec("l_extendedprice", Seq(0.99), Seq("p99raw")))

    def joined(): DataFrame =
      specs.map(sp => graft.ops.CoreOps.rankedPercentiles(li,
          Seq("l_returnflag"), sp.valueCol, sp.ps, sp.outCols))
        .reduce((a, b) => a.join(b, Seq("l_returnflag")))
    def fused(): DataFrame =
      ShapeDispatch.rankedPercentilesFused(li, Seq("l_returnflag"), specs)
    def single(): DataFrame =
      graft.ops.CoreOps.rankedPercentiles(li, Seq("l_returnflag"),
        "l_quantity", Seq(0.5, 0.9), Seq("p50raw", "p90raw"))

    // jobs + shuffle volume per form: the STRUCTURAL receipt (immune to
    // the box's rotating straggler — identical every run by construction)
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val shuffleWrite = new java.util.concurrent.atomic.AtomicLong
    val inputRead = new java.util.concurrent.atomic.AtomicLong
    val cpuNanos = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        shuffleWrite.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        inputRead.addAndGet(sc.stageInfo.taskMetrics.inputMetrics.bytesRead)
        cpuNanos.addAndGet(sc.stageInfo.taskMetrics.executorCpuTime)
      }
    })
    def time(label: String, run: Int)(df: => DataFrame): Unit = {
      val j0 = jobs.get(); val s0 = shuffleWrite.get(); val r0 = inputRead.get()
      val c0 = cpuNanos.get()
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      graft.dedup.Checkpoints.releaseOutputs()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let the async listener bus drain
      println(f"[ab:multipct] dir=$dir form=$label run=$run time=$dt%.2fs " +
        f"jobs=${jobs.get() - j0} shuffleMB=${(shuffleWrite.get() - s0) / 1e6}%.0f " +
        f"readMB=${(inputRead.get() - r0) / 1e6}%.0f " +
        f"cpuSec=${(cpuNanos.get() - c0) / 1e9}%.1f")
    }
    println(s"[ab:multipct] dir=$dir threads=$threads runs=$runs " +
      "(q166 shape: 2 value cols, 3 percentiles)")
    // `only=single|joined|fused`: run ONE form in this JVM — the heavy
    // cells showed cross-form JIT profile pollution (an identical
    // single-column plan cost 42 CPU-sec cold and 958 after the fused
    // form's interpreted paths ran in the same JVM), so fair heavy
    // comparisons need one JVM per form
    val only = args.find(_.startsWith("only=")).map(_.stripPrefix("only="))
    for (run <- 1 to runs) {
      if (only.forall(_ == "single")) time("single_1col", run)(single())
      if (only.forall(_ == "joined")) time("joined_2col", run)(joined())
      if (only.forall(_ == "fused")) time("fused_2col", run)(fused())
    }
    // ---- phase split (diagnostic): where does each form spend? ----------
    // phase A = the ranked pass alone (groupedRowNumberAndTotals through
    // its checkpoint, counted); phase B = the full query (A + attach+agg).
    if (args.contains("phases")) {
      def melt(): DataFrame = {
        val meltArr = array(specs.zipWithIndex.map { case (sp, i) =>
          struct(lit(i).as("__spec"),
            col(sp.valueCol).cast("double").as("__v")) }: _*)
        li.select(Seq(col("l_returnflag"), explode(meltArr).as("__e")): _*)
          .select(col("l_returnflag"), col("__e.__spec").as("__spec"),
            col("__e.__v").as("__v"))
          .filter(col("__v").isNotNull)
      }
      for (run <- 1 to runs) {
        var t0 = System.nanoTime()
        val (rankedF, _) = graft.ops.CoreOps.groupedRowNumberAndTotals(
          melt(), Seq("l_returnflag", "__spec"), Seq("__v"),
          rankCol = "__rk", nCol = "__n")
        val nF = rankedF.count()
        println(f"[ab:multipct] form=fused_phaseA_rank run=$run " +
          f"time=${(System.nanoTime() - t0) / 1e9}%.2fs rows=$nF")
        graft.dedup.Checkpoints.releaseOutputs()
        t0 = System.nanoTime()
        var nJ = 0L
        for (sp <- specs) {
          val slim = li.select(col("l_returnflag"),
              col(sp.valueCol).cast("double").as("__v"))
            .filter(col("__v").isNotNull)
          val (rk, _) = graft.ops.CoreOps.groupedRowNumberAndTotals(
            slim, Seq("l_returnflag"), Seq("__v"),
            rankCol = "__rk", nCol = "__n")
          nJ += rk.count()
        }
        println(f"[ab:multipct] form=joined_phaseA_rank run=$run " +
          f"time=${(System.nanoTime() - t0) / 1e9}%.2fs rows=$nJ")
        graft.dedup.Checkpoints.releaseOutputs()
      }
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Diagnostic main: receipt the top-k dial's 2M rows-per-group cutover
  * AT AND BEYOND the boundary (VERDICT r15 advisory #2: at sf10 the
  * q137 frame lands exactly ON the cutover, stays windowed, and the
  * forced heap is 1.8× faster — the conservative default was an
  * argument, not a measurement; this makes it a measurement).
  *
  * Grid: synthetic frames with G groups of exactly N rows each, N ∈
  * 1M, 2M, 4M, 8M (0.5×, 1×, 2×, 4× the cutover), k=10, a payload
  * column so rows have realistic width. Both shapes run through
  * [[graft.ops.ShapeDispatch.topKPerGroupAuto]] with force, on a
  * persisted input (generation excluded), noop sink, `runs` runs per
  * cell — trust medians, run 1 pays codegen.
  *
  *   runMain graft.tools.AbTopkBoundary [groups] [k] [runs] [rowsPerGroupCsv]
  *
  * The optional 4th arg restricts the rows-per-group sweep (default
  * 1M,2M,4M,8M) — the r17 k-sweep receipt runs k ∈ {10, 100, 1000} at
  * "1000000,2000000" to bound the window form's group-sized sorts.
  */
object AbTopkBoundary {
  def main(args: Array[String]): Unit = {
    import graft.ops.ShapeDispatch
    val groups = args.headOption.map(_.toInt).getOrElse(4)
    val k = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val runs = args.drop(2).headOption.map(_.toInt).getOrElse(3)
    val rowsSweep = args.drop(3).headOption
      .map(_.split(",").toSeq.map(_.trim.toLong))
      .getOrElse(Seq(1000000L, 2000000L, 4000000L, 8000000L))
    val threads = math.min(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt,
      sys.env.getOrElse("SPARK_GRAFT_BENCH_MAX_THREADS", "16").toInt)
    val spark = SparkSession.builder().master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(100000).selectExpr("md5(cast(id as string)) h").groupBy("h").count().count()

    def fixture(rowsPerGroup: Long): DataFrame =
      spark.range(groups * rowsPerGroup).select(
        (col("id") % groups).cast("int").as("g"),
        col("id"),
        xxhash64(col("id")).as("v"),
        md5(col("id").cast("string")).as("payload"))

    // r18 (VERDICT item 5): the heap fix made large k cheap in CPU; the
    // remaining bound is groups×k aggregation STATE. Receipt the memory
    // behavior (spill or bounded) per cell, not just wall time. Spill
    // totals are sums over tasks; peakExecMemMB is also a per-stage sum
    // of task peaks — an upper bound on simultaneous demand, honest as
    // a "did the hash aggregate stay in budget" signal.
    val memSpill = new java.util.concurrent.atomic.AtomicLong
    val diskSpill = new java.util.concurrent.atomic.AtomicLong
    val peakExec = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        memSpill.addAndGet(sc.stageInfo.taskMetrics.memoryBytesSpilled)
        diskSpill.addAndGet(sc.stageInfo.taskMetrics.diskBytesSpilled)
        peakExec.addAndGet(sc.stageInfo.taskMetrics.peakExecutionMemory)
      }
    })
    def time(df: => DataFrame): (Double, Long, Long, Long) = {
      val m0 = memSpill.get(); val d0 = diskSpill.get(); val p0 = peakExec.get()
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      graft.dedup.Checkpoints.releaseOutputs()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let the async listener bus drain
      (dt, memSpill.get() - m0, diskSpill.get() - d0, peakExec.get() - p0)
    }

    println(s"[ab:topk] groups=$groups k=$k runs=$runs threads=$threads " +
      s"cutover=${ShapeDispatch.DefaultTopKRowsPerGroupCutover}")
    for (n <- rowsSweep) {
      val in = fixture(n).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      in.count()
      for (run <- 1 to runs; (label, shape) <- Seq(
          "window" -> ShapeDispatch.WindowShape,
          "heap" -> ShapeDispatch.RangedShape)) {
        val (t, ms, ds, pe) = time(ShapeDispatch.topKPerGroupAuto(in, Seq("g"),
          Seq("v", "id"), k, force = Some(shape)))
        println(f"[ab:topk] rowsPerGroup=$n form=$label run=$run time=$t%.2fs " +
          f"memSpillMB=${ms / 1e6}%.0f diskSpillMB=${ds / 1e6}%.0f " +
          f"peakExecMemMB=${pe / 1e6}%.0f")
      }
      in.unpersist()
    }
    spark.stop()
  }
}

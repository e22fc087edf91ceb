package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic main: receipt the exact set-similarity join's pair-space
  * ladder AT the first fixture where the estimate crosses the warn line
  * (r17 VERDICT item 2: the sf10 estimate sits 0.5% UNDER the 100 GB
  * default — the very next scale step warns, and the receipt should
  * pre-decide which side of the ladder the fixture rides instead of
  * the first warn surprising a gate log).
  *
  *   runMain graft.tools.AbSsJoinLadder <docsDir> [rowsPerBand]
  *
  * Four cells, all cheap by construction (nothing here materializes the
  * pair space — that is the point of the ladder):
  *  1. the dial: prefix structures + [[graft.dedup.Dedup.planVerify]]'s
  *     estimate vs the warn default — names the ladder side;
  *  2. hard-cap fail-fast: maxPairShuffleBytes set at the warn level →
  *     the exact path must THROW before materializing anything, naming
  *     the escape options (the message is the receipt);
  *  3. opt-in escape: lshEscapeBytes set at the warn level → the auto
  *     ladder takes the LSH shape and COMPLETES; wall time + verified
  *     pair count printed. Recall is the banding curve 1−(1−s^r)^b at
  *     threshold s (precision stays 1 — verification is the same
  *     integer arithmetic; the r16 AbSsJoinEscape cell measured the
  *     curve against exact ground truth at sf0.1);
  *  4. exact-with-warn (the no-conf default): the warn fires in the log
  *     but the plan still builds — receipt that the default is
  *     exact-with-warn, not a behavior change. The verified frame is
  *     NOT executed here (at a pair-bound fixture that run is priced in
  *     the estimate itself); construction + warn is the cell.
  */
object AbSsJoinLadder {
  def main(args: Array[String]): Unit = {
    import graft.dedup.Dedup
    val dir = args.headOption.getOrElse("/root/repo/testdata-sf20")
    val r = args.drop(1).headOption.map(_.toInt).getOrElse(2)
    val threads = math.min(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt,
      sys.env.getOrElse("SPARK_GRAFT_BENCH_MAX_THREADS", "16").toInt)
    val spark = SparkSession.builder().master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(100000).selectExpr("md5(cast(id as string)) h").groupBy("h").count().count()
    val docs = graft.io.Tables.table(spark, dir, "documents")
    val warn = Dedup.DefaultPairShuffleWarnBytes

    // ---- cell 1: the dial --------------------------------------------------
    val (_, stoks, prefix, blocks) = Dedup.prefixCandidates(
      docs, "doc_id", "text", 1, 2, shingleN = 3,
      suffixFilter = false, suffixDepth = 1)
    val vp = Dedup.planVerify(stoks, prefix, None)
    graft.dedup.Checkpoints.release(blocks)
    val side = if (vp.estShuffle > warn) "PAIR-BOUND (above warn)" else "below warn"
    println(f"[ab:ssladder] dir=$dir docs=${docs.count()} " +
      f"estPairs=${vp.estPairs}%.4g avgTokensPerDoc=${vp.avgSz}%.1f " +
      f"broadcastShape=${vp.takeBroadcast} estShuffleBytes=${vp.estShuffle}%.4g " +
      s"warnDefault=$warn side=$side")

    // ---- cell 2: hard cap fails fast, before any materialization -----------
    spark.conf.set(Dedup.MaxPairShuffleBytesKey, warn.toString)
    val t2 = System.nanoTime()
    try {
      Dedup.ssJoinPairsAuto(docs, "doc_id", "text", 1, 2, shingleN = 3,
        force = Some(Dedup.ExactSsJoin))
      println("[ab:ssladder] hardcap: NO THROW — ladder broken (est under cap?)")
    } catch {
      case e: IllegalStateException =>
        println(f"[ab:ssladder] hardcap: threw in ${(System.nanoTime() - t2) / 1e9}%.1fs " +
          s"(fail-fast, nothing materialized). Message: ${e.getMessage.takeWhile(_ != '\n')}")
    }
    spark.conf.unset(Dedup.MaxPairShuffleBytesKey)

    // ---- cell 3: opt-in LSH escape completes -------------------------------
    spark.conf.set(Dedup.SsJoinLshEscapeBytesKey, warn.toString)
    val b = 32 / r
    val sThr = 0.5 // thrNum/thrDen
    val recallAtThr = 1.0 - math.pow(1.0 - math.pow(sThr, r), b)
    for (run <- 1 to 2) { // run1 pays codegen; trust run2
      val t3 = System.nanoTime()
      val pairs = Dedup.ssJoinPairsAuto(docs, "doc_id", "text", 1, 2,
        shingleN = 3, lshRowsPerBand = r).count()
      graft.dedup.Checkpoints.releaseOutputs()
      println(f"[ab:ssladder] escape(lsh r=$r b=$b) run=$run " +
        f"time=${(System.nanoTime() - t3) / 1e9}%.1fs verifiedPairs=$pairs " +
        f"bandingRecallAtThreshold(s=$sThr)=$recallAtThr%.4f precision=1 (contract)")
    }
    spark.conf.unset(Dedup.SsJoinLshEscapeBytesKey)

    // ---- cell 4: the no-conf default is exact-with-warn --------------------
    val t4 = System.nanoTime()
    Dedup.ssJoinPairsAuto(docs, "doc_id", "text", 1, 2, shingleN = 3)
    println(f"[ab:ssladder] default(no conf): exact plan BUILT in " +
      f"${(System.nanoTime() - t4) / 1e9}%.1fs — the WARN line above this is " +
      "the ladder's voice; execution would shuffle the estimated bytes (not run here)")
    graft.dedup.Checkpoints.releaseOutputs()
    spark.stop()
  }
}

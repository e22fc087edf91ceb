package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic main: measure [[graft.dedup.Dedup.ssJoinPairsAuto]]'s two
  * shapes against each other on the SAME session and corpus — wall time
  * AND the exact recall the LSH escape trades for it (computable here
  * because the exact join IS the ground truth: recall =
  * |lsh ∩ exact| / |exact| = (|lsh| − |lsh \ exact|) / |exact|, and
  * precision 1 is ENFORCED — a non-empty lsh \ exact (values included)
  * is a contract violation and the tool throws).
  *
  *   runMain graft.tools.AbSsJoinEscape <sfDir> [table] [rList]
  *
  * rList: comma list of rowsPerBand settings for the escape shape
  * (default "4,2,1" — the recall dial: b = 32/r bands at the native
  * minhash_sig ceiling k=32). Each shape runs twice; trust run2 (run1
  * pays codegen + the session caches).
  */
object AbSsJoinEscape {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val table = args.drop(1).headOption.getOrElse("documents")
    val rList = args.drop(2).headOption
      .map(_.split(",").toSeq.map(_.toInt)).getOrElse(Seq(4, 2, 1))
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
    val docs = graft.io.Tables.table(spark, dir, table)

    def timed(label: String)(build: => org.apache.spark.sql.DataFrame)
        : org.apache.spark.sql.DataFrame = {
      var out: org.apache.spark.sql.DataFrame = null
      for (run <- 1 to 2) {
        val t0 = System.nanoTime()
        out = build // prefix/LSH outputs are EAGER (output checkpoint)
        val n = out.count()
        println(f"[ab:ssjoin] dir=$dir table=$table form=$label run=$run " +
          f"time=${(System.nanoTime() - t0) / 1e9}%.2fs pairs=$n")
      }
      out
    }

    val exact = timed("exact") {
      graft.dedup.Dedup.ssJoinPairsAuto(docs, "doc_id", "text", 1, 2, shingleN = 3)
    }
    val nExact = exact.count()
    for (r <- rList) {
      val lsh = timed(s"lsh_r$r") {
        graft.dedup.Dedup.ssJoinPairsAuto(docs, "doc_id", "text", 1, 2,
          shingleN = 3, force = Some(graft.dedup.Dedup.LshSsJoin),
          lshRowsPerBand = r)
      }
      val nLsh = lsh.count()
      val falsePos = lsh.exceptAll(exact).count()
      // recall counts TRUE positives only — |lsh|/|exact| would overstate
      // whenever falsePos > 0 (r15 ADVICE)
      val truePos = nLsh - falsePos
      println(f"[ab:ssjoin] dir=$dir table=$table form=lsh_r$r VERDICT " +
        f"recall=${if (nExact == 0) 1.0 else truePos.toDouble / nExact}%.4f " +
        s"($truePos of $nExact exact pairs) falsePositives=$falsePos " +
        s"bands=${32 / r}")
      require(falsePos == 0L,
        s"precision-1 contract violated: $falsePos pairs in lsh \\ exact — " +
          "both shapes verify with the same integer predicate; this is a bug")
    }
    spark.stop()
  }
}

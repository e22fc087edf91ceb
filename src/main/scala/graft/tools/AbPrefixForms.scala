package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic main: A/B [[graft.dedup.Dedup.prefixFilterPairs]]'s suffix
  * filter (off / depth 1 / depth 2) on the SAME session and data — the
  * r9 density dial ("setup cost dominates below ~3% candidate density;
  * on when the corpus saturates") measured where it matters: the
  * fixed-vocab corpus at sf1/sf4, where the r14 scale grid caught q142
  * growing 24× on 4× data with the filter OFF.
  *
  *   runMain graft.tools.AbPrefixForms <sfDir> [runs] [forms]
  *
  * forms: comma list from {off, d1, d2} (default all three).
  * All three forms verify the same lossless contract — identical output
  * pairs (Round9Spec) — so only wall time differs.
  */
object AbPrefixForms {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.drop(1).headOption.map(_.toInt).getOrElse(2)
    val forms = args.drop(2).headOption
      .map(_.split(",").toSeq).getOrElse(Seq("off", "d1", "d2"))
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
    def pairs(suffix: Boolean, depth: Int) =
      graft.dedup.Dedup.prefixFilterPairs(
        graft.io.Tables.table(spark, dir, "documents"), "doc_id", "text",
        1, 2, shingleN = 3, suffixFilter = suffix, suffixDepth = depth)
    def time(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = df.count()
      graft.dedup.Checkpoints.releaseOutputs()
      println(f"[ab] $label time=${(System.nanoTime() - t0) / 1e9}%.2fs pairs=$n")
    }
    println(s"[ab] sfDir=$dir threads=$threads forms=$forms")
    for (r <- 1 to runs; f <- forms) f match {
      case "off" => time(s"suffix-off run$r")(pairs(suffix = false, 1))
      case "d1"  => time(s"suffix-d1  run$r")(pairs(suffix = true, 1))
      case "d2"  => time(s"suffix-d2  run$r")(pairs(suffix = true, 2))
      case other => println(s"[ab] unknown form $other")
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Diagnostic main (not part of the library surface): A/B
  * [[graft.ops.CoreOps.rankedPercentiles]]' round-14 group-totals FUSION
  * on the q166 query shape, same session and data —
  *
  *   unfused — the r13 form: ranks via groupedRowNumber, group totals
  *     via a SECOND full scan of the input (column-pruned, but still a
  *     complete data pass per rankedPercentiles call);
  *   fused — groupedRowNumberAndTotals: totals folded into the ranked
  *     pass' per-(partition, group) bookkeeping aggregate, which is
  *     checkpoint-materialized (≤ |partitions|+|groups| rows) so the
  *     offsets window and the totals read it for free.
  *
  *   runMain graft.tools.AbPercentileFusion <sfDir> [runs]
  *
  * Run 1 pays codegen + cache fill — trust the later runs. Value
  * equality of the two forms is Round12Spec + the frozen q166 oracle
  * hash; this main measures the pass-count trade at each scale.
  */
object AbPercentileFusion {
  def main(args: Array[String]): Unit = {
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

    // the r13 (pre-fusion) rankedPercentiles, replicated verbatim:
    // groupedRowNumber for ranks + a separate slim re-scan for totals
    def unfusedRankedPercentiles(df: DataFrame, groupCols: Seq[String],
                                 valueCol: String, ps: Seq[Double],
                                 outCols: Seq[String]): DataFrame = {
      val slim = df
        .select((groupCols.map(col) :+ col(valueCol).cast("double").as("__v")): _*)
        .filter(col("__v").isNotNull)
      val ranked = graft.ops.CoreOps.groupedRowNumber(slim, groupCols,
        Seq("__v"), rankCol = "__rk")
      val totals = slim.groupBy(groupCols.map(col): _*).agg(count(lit(1)).as("__n"))
      val targets = totals
        .select(groupCols.map(col) :+ col("__n") :+ explode(array(
          ps.zip(outCols).map { case (p, o) =>
            struct(lit(p).as("__p"), lit(o).as("__out")) }: _*)).as("__e"): _*)
        .select(groupCols.map(col) :+ col("__n") :+
          col("__e.__p").as("__p") :+ col("__e.__out").as("__out"): _*)
        .withColumn("__pos", (col("__n") - lit(1L)) * col("__p"))
        .withColumn("__lo", floor(col("__pos")).cast("long"))
        .withColumn("__hi", ceil(col("__pos")).cast("long"))
      def attach(t: DataFrame, rank0: String, as: String): DataFrame = {
        val r = ranked.select(
          groupCols.map(c => col(c).as(s"__r_$c")) :+
            col("__rk").as("__r_rk") :+ col("__v").as(as): _*)
        val cond = groupCols.map(c => t(c) <=> r(s"__r_$c"))
          .foldLeft(t(rank0) + lit(1L) === r("__r_rk"))(_ && _)
        r.join(broadcast(t), cond)
          .drop("__r_rk")
          .drop(groupCols.map(c => s"__r_$c"): _*)
      }
      val both = attach(attach(targets, "__lo", "__loVal"), "__hi", "__hiVal")
      val interp = when(col("__lo") === col("__hi"), col("__loVal"))
        .otherwise((col("__hi") - col("__pos")) * col("__loVal") +
                   (col("__pos") - col("__lo")) * col("__hiVal"))
      val vals = both.withColumn("__val", interp)
      vals.groupBy(groupCols.map(col): _*)
        .agg(
          max(when(col("__out") === outCols.head, col("__val"))).as(outCols.head),
          outCols.tail.map(o =>
            max(when(col("__out") === o, col("__val"))).as(o)): _*)
    }

    // optional third arg `derived`: feed both forms an input whose
    // lineage carries real per-row compute (an md5-derived value) — the
    // unfused totals re-evaluate that WHOLE lineage on their second
    // pass, which is the general-case cost the fusion deletes (q166's
    // raw-table input makes the second pass a cheap pruned scan; a
    // rankedPercentiles over any DERIVED frame pays the full upstream)
    val derived = args.drop(2).headOption.contains("derived")
    def input(): DataFrame = {
      val li = graft.io.Tables.table(spark, dir, "lineitem")
      if (!derived) li
      else li.withColumn("l_quantity",
        col("l_quantity") +
          (conv(substring(md5(concat_ws("|",
            col("l_orderkey"), col("l_linenumber"), col("l_quantity"))), 1, 6),
            16, 10).cast("long") % 7).cast("double"))
    }

    // the q166 query shape over each form
    def unfusedQuery(): DataFrame = {
      val li = input()
      val q = unfusedRankedPercentiles(li, Seq("l_returnflag"),
        "l_quantity", Seq(0.5, 0.9), Seq("p50raw", "p90raw"))
      val p = unfusedRankedPercentiles(li, Seq("l_returnflag"),
        "l_extendedprice", Seq(0.99), Seq("p99raw"))
      q.join(p, Seq("l_returnflag"))
        .select(col("l_returnflag"),
          graft.ops.CoreOps.roundPortable(col("p50raw"), 4).as("p50"),
          graft.ops.CoreOps.roundPortable(col("p90raw"), 4).as("p90"),
          graft.ops.CoreOps.roundPortable(col("p99raw"), 4).as("price_p99"))
        .orderBy("l_returnflag")
    }
    def time(label: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      graft.dedup.Checkpoints.releaseOutputs()
      println(f"[ab] $label time=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    def fusedQuery(): DataFrame = {
      val li = input()
      val q = graft.ops.CoreOps.rankedPercentiles(li, Seq("l_returnflag"),
        "l_quantity", Seq(0.5, 0.9), Seq("p50raw", "p90raw"))
      val p = graft.ops.CoreOps.rankedPercentiles(li, Seq("l_returnflag"),
        "l_extendedprice", Seq(0.99), Seq("p99raw"))
      q.join(p, Seq("l_returnflag"))
        .select(col("l_returnflag"),
          graft.ops.CoreOps.roundPortable(col("p50raw"), 4).as("p50"),
          graft.ops.CoreOps.roundPortable(col("p90raw"), 4).as("p90"),
          graft.ops.CoreOps.roundPortable(col("p99raw"), 4).as("price_p99"))
        .orderBy("l_returnflag")
    }
    println(s"[ab] sfDir=$dir threads=$threads derived=$derived")
    for (r <- 1 to runs) {
      time(s"unfused run$r")(unfusedQuery())
      time(s"fused   run$r")(fusedQuery())
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Diagnostic main (not part of the library surface): A/B the q53 rank
  * family's two shapes on the SAME session and data —
  *
  *   window — the retired `Window.partitionBy(l_returnflag)` form: one
  *     hash exchange into |groups| partitions, each group through ONE
  *     task's sort (the r12 verdict's weak flag; grows superlinearly
  *     once a group outruns a task);
  *   ranged — [[graft.ops.CoreOps.groupedRankFunctions]]: range
  *     partition + one-pass local stats + boundary bookkeeping
  *     (flat per-task work at any group size, pays a checkpoint).
  *
  *   runMain graft.tools.AbRankForms <sfDir> [runs]
  *
  * Run 1 pays codegen + cache fill — trust the later runs. Equality of
  * the two forms is Round13Spec's job; this main measures the trade the
  * bench gate flags (q53 sf0.1 regression = the deliberate price of the
  * scale shape; the win is the growth CURVE, see SCALE.md).
  */
object AbRankForms {
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

    def windowForm() = {
      val w = Window.partitionBy("l_returnflag")
        .orderBy(asc("l_quantity"), asc("l_orderkey"), asc("l_linenumber"))
      graft.io.Tables.table(spark, dir, "lineitem")
        .select(
          col("l_returnflag"), col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          percent_rank().over(w).as("prnk"),
          cume_dist().over(w).as("cdist"),
          ntile(4).over(w).as("quartile"))
    }
    def time(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      graft.dedup.Checkpoints.releaseOutputs()
      println(f"[ab] $label time=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    println(s"[ab] sfDir=$dir threads=$threads")
    for (r <- 1 to runs) {
      time(s"window run$r")(windowForm())
      time(s"ranged run$r")(graft.queries.QueryCatalog.rankFunctions(spark, dir))
    }
    spark.stop()
  }
}

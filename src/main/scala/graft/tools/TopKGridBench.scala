package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.TopKRewrite

/** Measurement harness for the [[graft.plans.TopKRewrite]] enable
  * decision (VERDICT r8 item 2): WindowExec vs TopKPerGroupExec across a
  * (group count × k) grid at fixed total rows, so the heuristic in
  * SCALE.md is a measured number, not a guess.
  *
  * Method: synthetic (g, id, v) from spark.range (no IO), noop-sink
  * writes, 3 runs per cell per side, min taken (first run pays codegen
  * for BOTH sides equally). Row counts cross-checked per cell.
  *
  * Run: `sbt 'runMain graft.tools.TopKGridBench [totalRows]'`
  */
object TopKGridBench {

  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val total = if (args.nonEmpty) args(0).toLong else 8000000L
    val spark = SparkSession.builder()
      .master("local[16]")
      .appName("topk-grid")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    TopKRewrite.install(spark)

    def fixture(nGroups: Long): DataFrame =
      spark.range(total).select(
        (col("id") % nGroups).as("g"),
        col("id"),
        pmod(hash(col("id")), lit(1000000)).as("v"))

    def query(df: DataFrame, k: Int): DataFrame = df
      .withColumn("rank", row_number().over(
        Window.partitionBy("g").orderBy(desc("v"), asc("id"))))
      .filter(col("rank") <= k)

    val groupsGrid = if (sys.env.contains("TOPK_BIG")) Seq(4L, 64L) else Seq(16L, 1024L, 65536L, 1048576L)
    val kGrid      = Seq(1, 10, 100)

    // cells print per-cell as progress (comment lines) and the final JSON
    // line assembles them with mkString — a per-cell trailing comma made
    // the raw output invalid JSON (the committed r9 grid was hand-cleaned)
    val cells = for (ng <- groupsGrid; k <- kGrid) yield {
      val df = fixture(ng)
      def run(flag: Boolean): Double = {
        spark.conf.set(TopKRewrite.FlagKey, flag.toString)
        try (1 to 3).map(_ => time(
          query(df, k).write.format("noop").mode("overwrite").save())).min
        finally spark.conf.unset(TopKRewrite.FlagKey)
      }
      // sanity: identical row counts both ways
      spark.conf.set(TopKRewrite.FlagKey, "true")
      val cHeap = query(df, k).count()
      spark.conf.set(TopKRewrite.FlagKey, "false")
      val cWin = query(df, k).count()
      require(cHeap == cWin, s"count mismatch ng=$ng k=$k: $cHeap vs $cWin")
      val tWin  = run(flag = false)
      val tHeap = run(flag = true)
      val cell = f"""{"groups":$ng,"rows_per_group":${total / ng},"k":$k,"window_sec":$tWin%.3f,"heap_sec":$tHeap%.3f,"speedup":${tWin / tHeap}%.2f}"""
      println(s"# $cell")
      cell
    }
    println(s"""{"bench":"topk-grid","total_rows":$total,"cells":[${cells.mkString(",")}],"done":${cells.size}}""")
    spark.stop()
  }
}

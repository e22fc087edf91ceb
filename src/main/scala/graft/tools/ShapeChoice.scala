package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic main: print [[graft.ops.ShapeDispatch]]'s probe statistics
  * and resulting shape choice for the q53 ranking dial at each given SF
  * directory — the on-the-record receipt that the dispatcher picks the
  * window shape at gate SFs and crosses to the ranged shape where the
  * committed q53 A/B measured the crossover (~2M rows/group, sf1).
  *
  *   runMain graft.tools.ShapeChoice <sfDir> [<sfDir> ...]
  */
object ShapeChoice {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- dirs) {
      val li = graft.io.Tables.table(spark, dir, "lineitem")
        .select("l_returnflag", "l_quantity")
      val st = graft.ops.ShapeDispatch.probeStats(li, Seq("l_returnflag"))
      val shape = graft.ops.ShapeDispatch.decideByRows(st,
        graft.ops.ShapeDispatch.DefaultRowsPerGroupCutover)
      println(s"[shape] dir=$dir rows=${st.rows} groups=${st.groups} " +
        s"maxRowsPerGroup=${st.maxRowsPerGroup} " +
        s"cutover=${graft.ops.ShapeDispatch.DefaultRowsPerGroupCutover} " +
        s"choice=$shape")
    }
    spark.stop()
  }
}

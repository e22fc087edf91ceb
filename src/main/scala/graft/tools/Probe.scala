package graft.tools
import org.apache.spark.sql.SparkSession
/** Scratch probe main for environment checks (not part of the library). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    for (q <- Seq("q01_scan_filter_project", "q06_fct_line_value", "q07_report_customer", "q09_report_year")) {
      println(s"===== $q =====")
      println(graft.SparkEntry.queries(q)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode).linesIterator
        .filter(l => l.contains("Scan parquet") || l.contains("PushedFilters") || l.contains("ReadSchema") ||
                     l.contains("Join") || l.contains("Exchange") || l.contains("TakeOrdered") ||
                     l.contains("HashAggregate") || l.contains("(") && l.length < 80)
        .take(40).mkString("\n"))
    }
    spark.stop()
  }
}

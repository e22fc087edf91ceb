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
    spark.range(100000).selectExpr("md5(cast(id as string)) h").groupBy("h").count().count()
    for (q <- Seq("q09_report_year", "q07_report_customer"); run <- 1 to 3) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, dir).count()
      println(f"[probe] $q run$run time=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    println(s"[probe] entry rows=${graft.SparkEntry.entry(spark).count()}")
    spark.stop()
  }
}

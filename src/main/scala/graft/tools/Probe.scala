package graft.tools
import org.apache.spark.sql.SparkSession
/** Scratch probe main for environment checks (not part of the library). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = graft.SparkEntry.entry(spark)
    println(s"[probe] entry rows=${e.count()}")
    e.show(5, false)
    spark.stop()
  }
}

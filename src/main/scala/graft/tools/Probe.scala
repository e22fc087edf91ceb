package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
/** Scratch probe main for environment checks (not part of the library). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir  = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n  = f
      println(f"[probe] $name rows=$n%d time=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    time("sig_only") {
      docs.select(col("doc_id"), concat_ws("|", Dedup.minhashSignature(col("text"), 3, 16)).as("s")).count()
    }
    val bands = Dedup.lshBands(docs, "doc_id", "text")
    time("lsh_bands")(bands.count())
    val buckets = bands.groupBy("band", "band_key")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
    time("buckets")(buckets.count())
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    time("buckets_nocodegen")(buckets.count())
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    time("buckets_interp")(buckets.count())
    spark.stop()
  }
}

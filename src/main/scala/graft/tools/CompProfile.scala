package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-level components diagnostics (scratch main): edge counts and
  * wall time per pointer-jumping round at a given SF.
  */
object CompProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    spark.range(100000).selectExpr("md5(cast(id as string)) h").groupBy("h").count().count()

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val cands = graft.dedup.Dedup.minhashCandidatePairs(docs, "doc_id", "text")
    println(s"[cp] cands=${cands.count()}")
    val pairs = graft.dedup.Dedup.nearDupPairsFrom(cands, docs, "doc_id", "text", 3, 0.8)
    println(s"[cp] verified=${pairs.count()}")
    val t0 = System.nanoTime()
    val comp = graft.dedup.Components.connectedComponents(
      pairs, "doc_a", "doc_b", docs.select("doc_id"), "doc_id")
    comp.write.format("noop").mode("overwrite").save()
    println(f"[cp] components total ${(System.nanoTime() - t0) / 1e9}%.2fs")
    spark.stop()
  }
}

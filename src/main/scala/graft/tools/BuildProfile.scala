package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-level timing of the q100/q106 shared-build pipelines (diagnostic
  * main, not part of the library surface): isolates tokenize, token-hash,
  * gram explode, signature, banding, verification and components so
  * optimization effort lands on the measured stage, not the guessed one.
  */
object BuildProfile {
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

    def time(label: String, reps: Int = 2)(df: => DataFrame): Unit =
      (1 to reps).foreach { r =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"[bp] $label r$r ${(System.nanoTime() - t0) / 1e9}%.2fs")
      }

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    import graft.text.TextOps
    import graft.dedup.Dedup

    time("scan_text")(docs.select(col("doc_id"), length(col("text")).as("l")))
    time("tokenize")(docs.select(col("doc_id"),
      size(TextOps.tokens(lower(col("text")))).as("n")))
    time("token_hashes")(docs.select(col("doc_id"),
      transform(TextOps.tokens(lower(col("text"))), t => xxhash64(t)).as("th")))
    time("gram8_array")(docs.select(col("doc_id"),
      Dedup.shingleHashes(col("text"), 8).as("g")))
    time("gram8_distinct_explode")(docs.select(col("doc_id"),
      explode(Dedup.shingleHashSet(col("text"), 8)).as("gh")))
    time("gram3_set")(docs.select(col("doc_id"),
      Dedup.shingleHashSet(col("text"), 3).as("g")))
    time("shingle3_strings")(docs.select(col("doc_id"),
      Dedup.shingleSet(col("text"), 3).as("g")))
    time("minhash_sig")(docs.select(col("doc_id"),
      Dedup.minhashSignature(col("text"), 3, 16).as("sig")))
    time("cand_pairs_full")(Dedup.minhashCandidatePairs(docs, "doc_id", "text"))
    val cands = Dedup.minhashCandidatePairs(docs, "doc_id", "text")
    time("verify_from_cands")(
      Dedup.nearDupPairsFrom(cands, docs, "doc_id", "text", 3, 0.8))
    val pairs = Dedup.nearDupPairsFrom(cands, docs, "doc_id", "text", 3, 0.8)
    time("components")(graft.dedup.Components.connectedComponents(
      pairs, "doc_a", "doc_b", docs.select("doc_id"), "doc_id"))
    spark.stop()
  }
}

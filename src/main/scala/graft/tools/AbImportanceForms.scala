package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Diagnostic main (not part of the library surface): A/B the q168
  * importance-selection intermediate on the SAME session and data —
  *
  *   checkpoint — the shipped shape: ONE bigram explode reduced to the
  *     (doc, bucket, n) grain and output-checkpointed; both the global
  *     bucket counts and the per-doc scores read the materialized grain
  *     (cost: writing ~grain-sized blocks to local disk);
  *   recompute — no checkpoint: the grain frame is computed lazily and
  *     its two consumers each re-run the scan + tokenize + md5 + explode
  *     + partial aggregation (cost: the corpus pass twice).
  *
  *   runMain graft.tools.AbImportanceForms <sfDir> [runs]
  *
  * Run 1 pays codegen + cache fill — trust the later runs. Value
  * equality of the two forms is definitional (same plan modulo the
  * barrier); this main measures which side of the ROUND_LOG r13
  * candidate-2 trade wins per scale.
  */
object AbImportanceForms {
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

    val B = 1024
    val target = "src0"
    def grains(): DataFrame = graft.io.Tables.table(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        explode(graft.dedup.Dedup.shingles(col("text"), 2)).as("g"))
      .select(col("doc_id"), col("source"),
        (conv(substring(md5(col("g")), 1, 8), 16, 10).cast("long") % B).as("b"))
      .groupBy("doc_id", "source", "b").agg(count(lit(1)).as("n"))
    def score(docBucket: DataFrame): DataFrame = {
      val bc = docBucket.groupBy("b").agg(
        sum(when(col("source") === target, col("n")).otherwise(0L)).as("tc"),
        sum(when(col("source") =!= target, col("n")).otherwise(0L)).as("rc"))
      val tot = bc.agg(sum(col("tc")).as("T"), sum(col("rc")).as("R"))
      val lean = bc.crossJoin(broadcast(tot))
        .select(col("b"),
          ((col("tc") + 1).cast("decimal(19,0)") * (col("R") + B).cast("decimal(19,0)") >
           (col("rc") + 1).cast("decimal(19,0)") * (col("T") + B).cast("decimal(19,0)")).as("leans"))
      docBucket.filter(col("source") =!= target)
        .join(broadcast(lean), Seq("b"))
        .groupBy("doc_id", "source")
        .agg(sum(col("n")).as("n_grams"),
          sum(when(col("leans"), col("n")).otherwise(0L)).as("n_leaning"))
    }
    def time(label: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[ab168] $label time=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    for (r <- 1 to runs) {
      time(s"checkpoint run$r")(score(graft.dedup.Checkpoints.output(grains())))
      graft.dedup.Checkpoints.releaseOutputs()
      time(s"recompute  run$r")(score(grains()))
    }
    spark.stop()
  }
}

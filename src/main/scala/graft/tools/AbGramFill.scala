package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic main: the shared shingle-gram session cache
  * (QueryCatalog.splitGramArrays — the q100 bench line) materializes
  * one row per doc with a distinct-gram-hash ARRAY. Is the columnar
  * InMemoryRelation (persist) the right store for array rows, or is a
  * row-store localCheckpoint cheaper to FILL at equal read speed?
  *
  *   runMain graft.tools.AbGramFill <persist|ckpt> [sfDir] [runs]
  *
  * One JVM per mode (JIT isolation). Metric: min fill / min of two
  * consumer reads (one explode+groupBy like q44/q96, one projection
  * like q100's candidate index).
  */
object AbGramFill {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("persist")
    require(mode == "persist" || mode == "ckpt", s"mode persist|ckpt, got $mode")
    val dir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.drop(2).headOption.map(_.toInt).getOrElse(4)
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

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    var minFill, minExplode, minProj = Double.MaxValue
    for (_ <- 1 to runs) {
      val base = graft.io.Tables.table(spark, dir, "documents")
        .select(col("doc_id"), col("source"),
          graft.dedup.Dedup.shingleHashSet(col("text"), 8).as("ghs"),
          graft.text.TextOps.tokenCount(col("text")).as("n_toks"))
      val cached =
        if (mode == "persist")
          base.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        else base.localCheckpoint(eager = false)
      val f = timed(cached.write.format("noop").mode("overwrite").save())
      val e = timed(cached.select(col("source"), explode(col("ghs")).as("gh"))
        .distinct().groupBy("source").agg(count(lit(1)))
        .write.format("noop").mode("overwrite").save())
      val p = timed(cached
        .filter(col("n_toks") >= 8 && col("n_toks") <= 64)
        .select(col("doc_id"), col("n_toks"), array_min(col("ghs")).as("gh"))
        .write.format("noop").mode("overwrite").save())
      if (mode == "persist") cached.unpersist(blocking = true)
      minFill = minFill.min(f); minExplode = minExplode.min(e); minProj = minProj.min(p)
      println(f"[abgram] $mode run: fill=$f%.2f explode=$e%.2f proj=$p%.2f")
    }
    println(f"[abgram] $mode MIN: fill=$minFill%.2f explode=$minExplode%.2f proj=$minProj%.2f")
    spark.stop()
  }
}

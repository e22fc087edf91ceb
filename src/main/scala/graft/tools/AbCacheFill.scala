package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic main: is the star-fill cost (q05/q06 bench lines) the
  * frame's compute or the InMemoryRelation BUILD — and how much of the
  * build is the columnar cache's compression codecs?
  *
  *   runMain graft.tools.AbCacheFill <compressed|plain> [sfDir] [runs]
  *
  * One JVM per mode (JIT profile isolation — the r17 lesson); each run
  * builds the fact fresh (new session caches are NOT used: the frame is
  * rebuilt from source each run, persisted, materialized via noop,
  * unpersisted). Metric: min over runs of (nocache build, persist fill,
  * cached re-read).
  */
object AbCacheFill {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("compressed")
    require(mode == "compressed" || mode == "plain", s"mode compressed|plain, got $mode")
    val dir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.drop(2).headOption.map(_.toInt).getOrElse(3)
    val threads = math.min(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt,
      sys.env.getOrElse("SPARK_GRAFT_BENCH_MAX_THREADS", "16").toInt)
    val spark = SparkSession.builder().master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.inMemoryColumnarStorage.compressed",
        (mode == "compressed").toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(100000).selectExpr("md5(cast(id as string)) h").groupBy("h").count().count()

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    var minBuild, minFill, minRead = Double.MaxValue
    for (_ <- 1 to runs) {
      val fresh = graft.model.Star.fctLineValue(spark, dir)
      val b = timed(fresh.write.format("noop").mode("overwrite").save())
      val p = graft.model.Star.fctLineValue(spark, dir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val f = timed(p.write.format("noop").mode("overwrite").save())
      val r = timed(p.write.format("noop").mode("overwrite").save())
      p.unpersist(blocking = true)
      minBuild = minBuild.min(b); minFill = minFill.min(f); minRead = minRead.min(r)
      println(f"[abcache] $mode run: build=$b%.2f fill=$f%.2f read=$r%.2f")
    }
    println(f"[abcache] $mode MIN: build=$minBuild%.2f fill=$minFill%.2f read=$minRead%.2f")
    spark.stop()
  }
}

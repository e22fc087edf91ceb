package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic main: the q165 dpp-fact write's small-file fan-out.
  * Without clustering, every input task writes one file per ym value it
  * holds (~tasks × months files); with a REBALANCE(ym) hint before the
  * partitioned write, AQE clusters rows by ym into advisory-sized
  * partitions, so each ym directory receives ~bytes/advisory files
  * (guide §6: aim for few, large files). Times both and counts files.
  *
  *   runMain graft.tools.AbPartitionedWrite [sfDir] [runs]
  */
object AbPartitionedWrite {
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

    val star = graft.model.Star.build(spark, dir)
    val fct = star.fct
      .join(star.dimDatetime.select("date_key", "year", "month"), Seq("date_key"))
      .withColumn("ym", (col("year") * 100 + col("month")).cast("int"))
      .drop("year", "month")
    fct.write.format("noop").mode("overwrite").save() // fill caches outside timing

    def countFiles(p: java.io.File): Int =
      if (p.isDirectory) p.listFiles.map(countFiles).sum
      else if (p.getName.endsWith(".parquet")) 1 else 0
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val base = java.nio.file.Files.createTempDirectory("abpw").toFile
    for (mode <- Seq("flat", "rebalance"); r <- 1 to runs) {
      val out = new java.io.File(base, s"$mode$r").getAbsolutePath
      val in = if (mode == "flat") fct else fct.hint("REBALANCE", col("ym"))
      val t = timed(graft.io.Tables.overwritePartitioned(in, out, Seq("ym")))
      println(f"[abpw] $mode run$r: write=$t%.2fs files=${countFiles(new java.io.File(out))}")
    }
    def deleteRec(p: java.io.File): Unit = {
      if (p.isDirectory) p.listFiles.foreach(deleteRec); p.delete(); ()
    }
    deleteRec(base)
    spark.stop()
  }
}

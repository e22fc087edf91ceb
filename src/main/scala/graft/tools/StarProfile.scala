package graft.tools

import org.apache.spark.sql.SparkSession

/** Stage-level timing of the star cache fill (scratch main): which frame
  * materialization carries the q02/q06 bench lines.
  */
object StarProfile {
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

    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[sp] $label ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    // unpersisted compute-only baselines (r18): how much of each fill is
    // the frame's own compute vs the InMemoryRelation build
    time("dimInvoice nocache")(graft.model.Star.dimInvoice(spark, dir)
      .write.format("noop").mode("overwrite").save())
    time("fct nocache")(graft.model.Star.fctLineValue(spark, dir)
      .write.format("noop").mode("overwrite").save())
    val star = graft.model.Star.build(spark, dir)
    time("dimCustomer fill")(star.dimCustomer.write.format("noop").mode("overwrite").save())
    time("dimDatetime fill")(star.dimDatetime.write.format("noop").mode("overwrite").save())
    time("dimProduct fill")(star.dimProduct.write.format("noop").mode("overwrite").save())
    time("dimInvoice fill")(star.dimInvoice.write.format("noop").mode("overwrite").save())
    time("fct fill")(star.fct.write.format("noop").mode("overwrite").save())
    time("fct reread")(star.fct.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.functions.HeavyHitters.heavy_hitters

/** The Misra-Gries contract: est ≤ true and est ≥ true − n/(k+1) after
  * any updates + merges; k ≥ |domain| degenerates to exact counting; a
  * true heavy hitter (count > n/(k+1)) always survives. Each property is
  * checked across different partitionings — merge order must not break
  * the bounds (the values MAY differ; the bounds may not).
  */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def sketch(items: Seq[String], k: Int, parts: Int): (Map[String, Long], Long) = {
    val df = items.toDF("item").repartition(parts)
    val row = df.agg(heavy_hitters(col("item"), k).as("hh"), count(lit(1)).as("n")).head()
    (row.getMap[String, Long](0).toMap, row.getLong(1))
  }

  test("k >= |domain| degenerates to exact counts under any partitioning") {
    val items = Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(7)("c")
    for (parts <- Seq(1, 3, 8)) {
      val (m, n) = sketch(scala.util.Random.shuffle(items), k = 8, parts)
      assert(n == 87)
      assert(m == Map("a" -> 50L, "b" -> 30L, "c" -> 7L), s"parts=$parts: $m")
    }
  }

  test("MG bounds hold under eviction pressure, for every partitioning") {
    // 40 distinct items, k=5: heavy eviction; bounds must still hold
    val rnd = new scala.util.Random(7)
    val items = (0 until 2000).map(_ => s"it${rnd.nextInt(40)}")
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (parts <- Seq(1, 4, 16)) {
      val (m, n) = sketch(items, k = 5, parts)
      assert(n == 2000 && m.size <= 5, s"parts=$parts: ${m.size} counters")
      val slack = n / 6 // n/(k+1)
      exact.foreach { case (it, c) =>
        val est = m.getOrElse(it, 0L)
        assert(est <= c, s"parts=$parts $it: overestimate $est > $c")
        assert(est >= c - slack, s"parts=$parts $it: $est below $c - $slack")
      }
    }
  }

  test("a true heavy hitter (count > n/(k+1)) always survives the sketch") {
    val rnd = new scala.util.Random(11)
    // one item at ~40% of the stream, the rest spread over 100 others
    val items = scala.util.Random.shuffle(
      Seq.fill(800)("whale") ++ (0 until 1200).map(_ => s"fish${rnd.nextInt(100)}"))
    for (parts <- Seq(1, 4, 16)) {
      val (m, n) = sketch(items, k = 4, parts)
      assert(m.contains("whale"), s"parts=$parts: heavy hitter evicted: $m")
      assert(m("whale") <= 800L && m("whale") >= 800L - n / 5)
    }
  }

  test("SQL registration: heavy_hitters works from spark.sql") {
    graft.functions.GraftFunctions.register(spark)
    Seq("x", "x", "y").toDF("v").createOrReplaceTempView("hh_probe")
    val m = spark.sql("SELECT heavy_hitters(v, 4) AS hh FROM hh_probe")
      .head().getMap[String, Long](0).toMap
    assert(m == Map("x" -> 2L, "y" -> 1L))
  }

  test("empty input yields an empty map, not null") {
    val (m, n) = sketch(Seq.empty, k = 4, parts = 1)
    assert(m.isEmpty && n == 0)
  }

  test("streaming: the sketch aggregates across micro-batches (Complete mode)") {
    // mergeable state is what makes the same aggregate valid under
    // incremental execution: each batch updates the stored summary
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[String]
    val q = source.toDF().toDF("item")
      .agg(heavy_hitters(col("item"), 4).as("hh"))
      .writeStream.format("memory").queryName("hh_stream_test")
      .outputMode(OutputMode.Complete()).start()
    try {
      source.addData(Seq.fill(30)("whale") ++ Seq.tabulate(10)(i => s"f$i"): _*)
      q.processAllAvailable()
      source.addData(Seq.fill(20)("whale") ++ Seq.tabulate(10)(i => s"g$i"): _*)
      q.processAllAvailable()
      val m = spark.sql("SELECT hh FROM hh_stream_test")
        .head().getMap[String, Long](0).toMap
      assert(m.contains("whale"), s"heavy hitter lost across batches: $m")
      // 50 true arrivals; n=70, k=4 => est >= 50 - 70/5 = 36
      assert(m("whale") <= 50L && m("whale") >= 36L, s"count ${m("whale")} out of bounds")
    } finally q.stop()
  }
}

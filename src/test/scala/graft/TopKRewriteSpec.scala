package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.plans.TopKRewrite

/** The opt-in window-top-k planner strategy: under the flag, the
  * Filter(rank <= k, Window(row_number)) shape must plan as the
  * bounded-heap [[graft.plans.TopKPerGroupExec]] and return exactly the
  * window form's rows (the ordering below is total, so row_number is
  * deterministic and the comparison is exact).
  */
class TopKRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = {
    val rng = new scala.util.Random(5)
    (1L to 5000L).map(i => (s"g${i % 7}", i, rng.nextInt(1000))).toDF("g", "id", "v")
  }

  private def topk(k: Int) = fixture
    .withColumn("rank", row_number().over(
      Window.partitionBy("g").orderBy(desc("v"), asc("id"))))
    .filter(col("rank") <= k)

  test("flag on: plans TopKPerGroupExec, rows equal the window form exactly") {
    TopKRewrite.install(spark)
    spark.conf.set(TopKRewrite.FlagKey, "true")
    try {
      val q = topk(3)
      q.write.format("noop").mode("overwrite").save()
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerGroup"),
        s"flag must swap WindowExec for the bounded heap:\n${plan.take(1500)}")
      assert(!plan.contains("Window ["),
        s"no WindowExec may survive the rewrite:\n${plan.take(1500)}")
      val got = q.as[(String, Long, Int, Int)].collect().toSet
      spark.conf.set(TopKRewrite.FlagKey, "false")
      val expect = topk(3).as[(String, Long, Int, Int)].collect().toSet
      assert(got == expect, s"rewrite changed results:\n got=${got.toSeq.sortBy(x => (x._1, x._4)).take(6)}\n exp=${expect.toSeq.sortBy(x => (x._1, x._4)).take(6)}")
      assert(got.groupBy(_._1).forall(_._2.size == 3), "3 per group")
    } finally spark.conf.unset(TopKRewrite.FlagKey)
  }

  test("flag off: plan keeps the ordinary window; rank = 1 form also rewrites when on") {
    val q = topk(2)
    q.write.format("noop").mode("overwrite").save()
    assert(!q.queryExecution.executedPlan.toString.contains("TopKPerGroup"),
      "strategy must be inert without the flag")

    TopKRewrite.install(spark)
    spark.conf.set(TopKRewrite.FlagKey, "true")
    try {
      val one = fixture
        .withColumn("rank", row_number().over(
          Window.partitionBy("g").orderBy(desc("v"), asc("id"))))
        .filter(col("rank") === 1)
      one.write.format("noop").mode("overwrite").save()
      assert(one.queryExecution.executedPlan.toString.contains("TopKPerGroup"),
        "rank = 1 (argmax per group) must also rewrite")
      assert(one.count() == 7)
    } finally spark.conf.unset(TopKRewrite.FlagKey)
  }
}

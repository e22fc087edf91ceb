package graft

import org.apache.spark.sql.functions._
import graft.plans.SketchDistinct

class SketchDistinctSpec extends SparkSpec {
  import spark.implicits._

  private def distinctCount(): (Long, String) = {
    val df = (1L to 10000L).map(i => i % 1337).toDF("v")
      .agg(count_distinct(col("v")).as("n"))
    (df.head().getLong(0), df.queryExecution.optimizedPlan.toString)
  }

  test("flag off: exact count distinct untouched") {
    SketchDistinct.install(spark)
    spark.conf.set(SketchDistinct.FlagKey, "false")
    val (n, plan) = distinctCount()
    assert(n == 1337L)
    assert(!plan.contains("approx_count_distinct"), plan.take(500))
  }

  test("flag on: count distinct rewrites to an HLL sketch within its error bound") {
    SketchDistinct.install(spark)
    spark.conf.set(SketchDistinct.FlagKey, "true")
    try {
      val (n, plan) = distinctCount()
      assert(plan.contains("approx_count_distinct"), plan.take(500))
      // HLL++ at rsd=0.05: generous 3-sigma acceptance band
      assert(math.abs(n - 1337L) <= 1337 * 0.15, s"approx=$n")
    } finally spark.conf.set(SketchDistinct.FlagKey, "false")
  }

  test("oracle queries are unaffected while the flag is off (default)") {
    SketchDistinct.install(spark)
    val plan = graft.report.Reports.yearInvoicesFrom(
      graft.model.Star.fctLineValue(spark, sf),
      graft.model.Star.dimDatetime(spark, sf)).queryExecution.optimizedPlan.toString
    assert(!plan.contains("approx_count_distinct"))
  }
}

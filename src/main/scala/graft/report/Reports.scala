package graft.report

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.CoreOps._
import graft.io.Tables.table
import graft.model.Star

/** Report-layer aggregations, one per reference report model
  * (include/dbt/models/report/ SQL files), on the star schema from [[Star]].
  *
  * All three are group-aggregate plans: partial (map-side) aggregation
  * before the shuffle, then TakeOrderedAndProject for the top-K reports —
  * the 100 TB-safe shape (shuffled bytes = |groups|, not |fact|).
  */
object Reports {

  /** report_customer_invoices (reference:
    * include/dbt/models/report/report_customer_invoices.sql:1-11): revenue +
    * line counts per country, top 10 by revenue. A2 deliberately counts
    * invoice *lines* (COUNT(invoice_key), non-null values) while
    * report_year counts distinct invoices — keep both exactly (SURVEY.md §7
    * "count vs countDistinct trap"). Tie-broken by nation for determinism.
    */
  def customerInvoices(spark: SparkSession, sfDir: String): DataFrame = {
    val star = Star.build(spark, sfDir)
    val fct  = star.fct
    val dimI = star.dimInvoice.select("invoice_key", "customer_key")
    val dimC = star.dimCustomer.select("customer_key", "nation", "region")
    // Pre-join the two dim-sized sides first (J4): the fact then takes ONE
    // join against the combined invoice→country map instead of two
    // fact-sized shuffles; AQE broadcasts the map when it's small.
    val invCountry = dimI.join(dimC, Seq("customer_key"), "inner")
      .select("invoice_key", "nation", "region")
    val joined = fct
      .join(invCountry, Seq("invoice_key"), "inner") // J4 (report_customer_invoices.sql:6-8)
    val agg = joined
      .groupBy("nation", "region") // A2
      .agg(
        count(col("invoice_key")).as("total_invoices"), // A2: lines, not distinct invoices
        sumMoney(col("total_price")).as("total_revenue") // A3
      )
    topK(agg, 10, desc("total_revenue"), asc("nation")) // A7 (sql:10-11)
  }

  /** report_product_invoices (reference:
    * include/dbt/models/report/report_product_invoices.sql:1-10): top 10
    * products by quantity sold. 3-key group (A6), SUM(quantity) (A4),
    * top-K (A7) tie-broken by product_key.
    */
  def productInvoices(spark: SparkSession, sfDir: String): DataFrame = {
    val star = Star.build(spark, sfDir)
    val fct  = star.fct
    val dimP = star.dimProduct.select("product_key", "stock_code", "description")
    val agg = fct
      .join(dimP, Seq("product_key"), "inner") // J5 (sql:6-7)
      .groupBy("product_key", "stock_code", "description") // A6 (sql:8)
      .agg(sumMoney(col("quantity")).as("total_quantity_sold")) // A4 (sql:5)
    topK(agg, 10, desc("total_quantity_sold"), asc("product_key")) // A7 (sql:9-10)
  }

  /** report_year_invoices (reference:
    * include/dbt/models/report/report_year_invoices.sql:1-9): invoices +
    * revenue per (year, month). COUNT(DISTINCT invoice_key) must stay EXACT
    * (A5 — approx_count_distinct is not equivalent); Spark plans it as a
    * two-phase expand/agg. Ordered by year, month (A8 — presentation sort,
    * no limit).
    */
  def yearInvoices(spark: SparkSession, sfDir: String): DataFrame = {
    val star = Star.build(spark, sfDir)
    yearInvoicesFrom(star.fct, star.dimDatetime)
  }

  /** Same report over a prebuilt (possibly cached) fact — lets callers that
    * also consume the fact elsewhere (e.g. the checks suite) share one
    * materialization instead of rebuilding the star per consumer. */
  def yearInvoicesFrom(fct: DataFrame, dimDatetime: DataFrame): DataFrame = {
    val dimDt = dimDatetime.select("date_key", "year", "month")
    // no forced broadcast: the calendar dim is only bounded at day
    // granularity — AQE broadcasts it when its runtime size allows
    fct
      .join(dimDt, Seq("date_key"), "inner") // J6 (sql:6-7)
      .groupBy("year", "month")
      .agg(
        countDistinct(col("invoice_key")).as("num_invoices"), // A5 (sql:4)
        sumMoney(col("total_price")).as("total_revenue") // A3 (sql:5)
      )
      .orderBy(asc("year"), asc("month")) // A8 (sql:9)
  }

  /** events rollup — same A2/A3/A5 operator family on the events table
    * (exercises them against a second schema + timestamp grouping).
    */
  def eventsByType(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "events")
      .groupBy("event_type")
      .agg(
        count(col("event_id")).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sumMoney(col("value")).as("total_value")
      )
      .orderBy(asc("event_type"))
}

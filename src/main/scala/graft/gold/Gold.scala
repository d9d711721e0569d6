package graft.gold

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.model.Clock
import graft.silver.Silver

/** Gold layer — analytics marts mirroring the models under
  * `/root/reference/models/gold/`.
  *
  * Scale notes (SURVEY.md §4.2):
  *  - All aggregations are partial+final hash aggs; the multi-count-distinct
  *    blocks expand via Catalyst's RewriteDistinctAggregates.
  *  - The unpartitioned windows (cumulative/MA/lag in order_metrics and
  *    revenue_analysis, W1–W12) run over *post-aggregation* rows whose
  *    cardinality is the number of days/months — a few thousand rows even at
  *    100 TB of input — so the single-partition WindowExec is not a
  *    bottleneck by construction.
  *  - customer_summary's three-way join is keyed on customer_key; the two
  *    aggregate sides arrive hash-partitioned on that key, so AQE reuses the
  *    exchange and no extra shuffle is introduced.
  */
object Gold {

  private def nullif0(c: Column): Column = when(c === 0, lit(null)).otherwise(c)

  /** Exact-cents money aggregation. Amounts are 2-decimal; summing them as
    * doubles picks up partition-order noise that can straddle a half-cent
    * rounding boundary and differ between engines. Summing
    * `cast(round(x*100) as bigint)` is exact (orders of magnitude below
    * 2^63), and `/100.0` then yields the same double in every engine and
    * every partitioning — the oracle SQL mirrors this cent-for-cent. */
  private def cents(c: Column): Column = round(c * 100).cast("long")
  /** sum(x)/avg(x) with exact-cents accumulation; null-skipping semantics
    * identical to the plain aggregates they replace. */
  private def sumMoney(c: Column): Column = sum(cents(c)) / 100.0
  private def sumMoneyElse0(cond: Column, c: Column): Column =
    sum(when(cond, cents(c)).otherwise(0L)) / 100.0
  private def avgMoney(c: Column): Column = sum(cents(c)) / 100.0 / count(c)

  /** `models/gold/gold_customer_summary.sql` (A1, A2 incl. deterministic
    * mode, J3, J4, C7, C14, RFM scores).
    *
    * `mode(payment_method)` tie-break: Snowflake/Spark/DuckDB `mode` are all
    * nondeterministic among ties (SURVEY.md §7.4.2), so the engine uses
    * max-by-(count, value) — the mode, with ties broken toward the
    * lexicographically larger method — mirrored exactly in the oracle SQL.
    */
  def customerSummary(spark: SparkSession, dir: String): DataFrame =
    customerSummaryFrom(Silver.customers(spark, dir),
      Silver.orders(spark, dir), Silver.payments(spark, dir))

  def customerSummaryFrom(customers: DataFrame, orders: DataFrame,
      payments: DataFrame): DataFrame = {

    val customerOrders = orders.groupBy("customer_key").agg(
      countDistinct(col("order_key")).as("total_orders"),
      countDistinct(when(col("is_completed"), col("order_key"))).as("completed_orders"),
      countDistinct(when(col("is_cancelled"), col("order_key"))).as("cancelled_orders"),
      countDistinct(when(col("is_pending"), col("order_key"))).as("pending_orders"),
      min(col("order_date")).as("first_order_date"),
      max(col("order_date")).as("last_order_date"),
      datediff(max(col("order_date")), min(col("order_date"))).as("customer_lifetime_days"),
      sumMoneyElse0(col("is_completed"), col("order_amount")).as("total_revenue"),
      avgMoney(when(col("is_completed"), col("order_amount"))).as("avg_order_value"),
      max(col("order_amount")).as("max_order_value"),
      min(when(col("is_completed"), col("order_amount"))).as("min_order_value"),
      countDistinct(col("order_year_month")).as("active_months"))

    // Single two-level aggregation instead of (per-customer agg) ⋈ (mode
    // agg): payment_key is unique per row and a row has exactly one
    // method, so global distinct counts equal the sums of per-method
    // distinct counts — one pass over the joined subtree instead of two.
    val successJoined = payments.filter(col("is_successful_payment"))
      .join(orders.select("order_key", "customer_key"), Seq("order_key"))
    val perMethod = successJoined
      .groupBy("customer_key", "payment_method")
      .agg(
        countDistinct(col("payment_key")).as("pm_payments"),
        count(lit(1)).as("pm_rows"),
        sumMoney(col("payment_amount")).as("pm_paid"))
    val customerPayments = perMethod.groupBy("customer_key").agg(
      sum(col("pm_payments")).as("total_payments"),
      count(lit(1)).as("unique_payment_methods"),
      (sum(cents(col("pm_paid"))) / 100.0).as("total_paid"),
      max(struct(col("pm_rows"), col("payment_method")))
        .getField("payment_method").as("preferred_payment_method"))

    val daysSince = datediff(Clock.today, col("last_order_date"))
    customers
      .join(customerOrders, Seq("customer_key"), "left")
      .join(customerPayments, Seq("customer_key"), "left")
      .select(
        col("customer_key"),
        col("customer_id"),
        col("full_name"),
        col("first_name"),
        col("last_name"),
        col("email"),
        col("created_at").as("customer_since"),
        coalesce(col("total_orders"), lit(0)).as("total_orders"),
        coalesce(col("completed_orders"), lit(0)).as("completed_orders"),
        coalesce(col("cancelled_orders"), lit(0)).as("cancelled_orders"),
        coalesce(col("pending_orders"), lit(0)).as("pending_orders"),
        coalesce(col("total_revenue"), lit(0)).as("lifetime_value"),
        coalesce(col("avg_order_value"), lit(0)).as("avg_order_value"),
        coalesce(col("max_order_value"), lit(0)).as("max_order_value"),
        coalesce(col("min_order_value"), lit(0)).as("min_order_value"),
        coalesce(col("total_payments"), lit(0)).as("total_payments"),
        coalesce(col("unique_payment_methods"), lit(0)).as("unique_payment_methods"),
        coalesce(col("total_paid"), lit(0)).as("total_paid_amount"),
        col("preferred_payment_method"),
        col("first_order_date"),
        col("last_order_date"),
        coalesce(col("customer_lifetime_days"), lit(0)).as("customer_lifetime_days"),
        coalesce(col("active_months"), lit(0)).as("active_months"),
        daysSince.as("days_since_last_order"),
        when(coalesce(col("total_revenue"), lit(0)) >= 500, "High Value")
          .when(coalesce(col("total_revenue"), lit(0)) >= 200, "Medium Value")
          .when(coalesce(col("total_revenue"), lit(0)) > 0, "Low Value")
          .otherwise("No Revenue").as("customer_segment"),
        when(col("last_order_date").isNull, "Never Ordered")
          .when(daysSince <= 30, "Active")
          .when(daysSince <= 90, "At Risk")
          .when(daysSince <= 180, "Inactive")
          .otherwise("Churned").as("customer_status"),
        when(daysSince <= 30, 3).when(daysSince <= 90, 2).otherwise(1)
          .as("recency_score"),
        when(coalesce(col("total_orders"), lit(0)) >= 5, 3)
          .when(coalesce(col("total_orders"), lit(0)) >= 2, 2)
          .otherwise(1).as("frequency_score"),
        when(coalesce(col("total_revenue"), lit(0)) >= 500, 3)
          .when(coalesce(col("total_revenue"), lit(0)) >= 200, 2)
          .otherwise(1).as("monetary_score"),
        Clock.now.as("_updated_at"))
  }

  /** `models/gold/gold_order_metrics.sql` (A3 + windows W1–W8 + O1). */
  def orderMetrics(spark: SparkSession, dir: String): DataFrame =
    orderMetricsFrom(Silver.orders(spark, dir))

  def orderMetricsFrom(orders: DataFrame): DataFrame = {
    val groupCols = Seq("order_date", "order_year", "order_month", "order_day",
      "order_quarter", "order_year_month", "order_year_quarter", "order_day_name")
    val daily = orders
      .groupBy(groupCols.map(col): _*)
      .agg(
        countDistinct(col("order_key")).as("total_orders"),
        countDistinct(when(col("is_completed"), col("order_key"))).as("completed_orders"),
        countDistinct(when(col("is_cancelled"), col("order_key"))).as("cancelled_orders"),
        countDistinct(when(col("is_pending"), col("order_key"))).as("pending_orders"),
        countDistinct(col("customer_key")).as("unique_customers"),
        sumMoneyElse0(col("is_completed"), col("order_amount")).as("total_revenue"),
        avgMoney(when(col("is_completed"), col("order_amount"))).as("avg_order_value"),
        max(col("order_amount")).as("max_order_value"),
        min(when(col("is_completed"), col("order_amount"))).as("min_order_value"),
        sumMoney(col("order_amount")).as("potential_revenue"),
        sumMoneyElse0(col("is_cancelled"), col("order_amount")).as("lost_revenue"))
      .withColumn("completion_rate",
        round(col("completed_orders") * 100.0 / nullif0(col("total_orders")), 2))
      .withColumn("cancellation_rate",
        round(col("cancelled_orders") * 100.0 / nullif0(col("total_orders")), 2))
      .withColumn("orders_per_customer",
        round(col("total_orders") * 1.0 / nullif0(col("unique_customers")), 2))

    // Global windows over per-day rows: cardinality = #days, so the
    // single-partition WindowExec is fine at any input scale (SURVEY §2.6).
    val w = Window.orderBy("order_date")
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ma7 = w.rowsBetween(-6, 0) // 7-ROW (not 7-day) MA — faithful quirk W3.
    def growthPct(k: Int): Column = round(
      (col("total_revenue") - lag(col("total_revenue"), k).over(w)) * 100.0 /
        nullif0(lag(col("total_revenue"), k).over(w)), 2)
    daily
      .withColumn("cumulative_revenue", (sum(cents(col("total_revenue"))).over(cum) / 100.0))
      .withColumn("cumulative_orders", sum(col("total_orders")).over(cum))
      .withColumn("revenue_7day_ma", (sum(cents(col("total_revenue"))).over(ma7) / 100.0 / count(col("total_revenue")).over(ma7)))
      .withColumn("orders_7day_ma", avg(col("total_orders")).over(ma7))
      .withColumn("prior_day_revenue", lag(col("total_revenue"), 1).over(w))
      .withColumn("week_ago_revenue", lag(col("total_revenue"), 7).over(w))
      .withColumn("revenue_growth_vs_prior_day_pct", growthPct(1))
      .withColumn("revenue_growth_vs_week_ago_pct", growthPct(7))
      .withColumn("_updated_at", Clock.now)
      .orderBy(col("order_date").desc)
  }

  /** `models/gold/gold_revenue_analysis.sql` (F3/F4, A4–A6 manual pivot,
    * J5/J6, windows W9–W13, O2). */
  def revenueAnalysis(spark: SparkSession, dir: String): DataFrame =
    revenueAnalysisFrom(Silver.orders(spark, dir), Silver.payments(spark, dir))

  def revenueAnalysisFrom(silverOrders: DataFrame, silverPayments: DataFrame): DataFrame = {
    val orders = silverOrders.filter(col("is_completed"))
    val payments = silverPayments.filter(col("is_successful_payment"))

    val monthlyOrders = orders
      .groupBy("order_year", "order_month", "order_year_month",
        "order_quarter", "order_year_quarter")
      .agg(
        countDistinct(col("order_key")).as("total_orders"),
        countDistinct(col("customer_key")).as("unique_customers"),
        sumMoney(col("order_amount")).as("total_revenue"),
        avgMoney(col("order_amount")).as("avg_order_value"),
        max(col("order_amount")).as("max_order_value"),
        min(col("order_amount")).as("min_order_value"))
      .withColumn("orders_per_customer",
        round(col("total_orders") * 1.0 / nullif0(col("unique_customers")), 2))

    val monthlyPaymentMethods = payments
      .join(orders.select("order_key", "order_date"), Seq("order_key"))
      .groupBy(date_format(col("order_date"), "yyyy-MM").as("order_year_month"),
        col("payment_method"))
      .agg(
        countDistinct(col("payment_key")).as("payment_count"),
        sumMoney(col("payment_amount")).as("payment_amount"))

    // Manual pivot exactly as written — digital_wallet deliberately has no
    // output column (faithful quirk, SURVEY.md §7.4.5).
    def methodRevenue(m: String): Column =
      sumMoneyElse0(col("payment_method") === m, col("payment_amount"))
    val paymentPivot = monthlyPaymentMethods.groupBy("order_year_month").agg(
      methodRevenue("credit_card").as("credit_card_revenue"),
      methodRevenue("bank_transfer").as("bank_transfer_revenue"),
      methodRevenue("paypal").as("paypal_revenue"),
      methodRevenue("cash").as("cash_revenue"),
      methodRevenue("other").as("other_revenue"))

    // 'YYYY-MM' strings sort correctly; months-per-year cardinality keeps
    // the global window trivially small (W9–W12).
    val wm = Window.orderBy("order_year_month")
    val ytd = Window.partitionBy("order_year").orderBy("order_month")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def growth(c: String, k: Int): Column = round(
      (col(c) - lag(col(c), k).over(wm)) * 100.0 /
        nullif0(lag(col(c), k).over(wm)), 2)
    monthlyOrders
      .withColumn("prev_month_revenue", lag(col("total_revenue"), 1).over(wm))
      .withColumn("year_ago_revenue", lag(col("total_revenue"), 12).over(wm))
      .withColumn("prev_month_orders", lag(col("total_orders"), 1).over(wm))
      .withColumn("revenue_growth_mom_pct", growth("total_revenue", 1))
      .withColumn("orders_growth_mom_pct", growth("total_orders", 1))
      .withColumn("revenue_growth_yoy_pct", growth("total_revenue", 12))
      .withColumn("ytd_revenue", (sum(cents(col("total_revenue"))).over(ytd) / 100.0))
      .withColumn("ytd_orders", sum(col("total_orders")).over(ytd))
      .join(paymentPivot, Seq("order_year_month"), "left")
      .withColumn("_updated_at", Clock.now)
      .orderBy(col("order_year_month").desc)
  }
}

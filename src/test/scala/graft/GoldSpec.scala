package graft

import java.sql.Date
import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.silver.Silver
import graft.gold.Gold

/** Window-frame and segmentation edges (FIXTURES.md §D) through the real
  * gold builders. */
class GoldSpec extends SparkSpec {
  import spark.implicits._

  private val ts = Timestamp.valueOf("2001-08-01 00:00:00")

  private def silverOrdersFor(rows: Seq[(Long, Date, String, Double)]): DataFrame = {
    val customers = Silver.customersFrom(
      Seq((1L, "a", "b", "a.b@example.com")).toDF("customer_id", "first_name", "last_name", "email")
        .withColumn("created_at", lit(ts)).withColumn("_loaded_at", lit(ts))
        .withColumn("_source_model", lit("bronze_customers")))
    val bronzeOrders = rows.map { case (id, d, st, amt) => (id, 1L, d, st, amt) }
      .toDF("order_id", "customer_id", "order_date", "order_status", "order_amount")
      .withColumn("_loaded_at", lit(ts)).withColumn("_source_model", lit("bronze_orders"))
    Silver.ordersFrom(bronzeOrders, customers)
  }

  test("order_metrics: cumulative and 7-row MA frames over an 8-day run") {
    val days = (1 to 8).map(i => (i.toLong, Date.valueOf(f"2001-07-$i%02d"), "completed", 100.0))
    val out = Gold.orderMetricsFrom(silverOrdersFor(days))
      .select("order_date", "total_revenue", "cumulative_revenue", "revenue_7day_ma",
        "prior_day_revenue", "week_ago_revenue")
      .as[(Date, Double, Double, Double, Option[Double], Option[Double])]
      .collect().sortBy(_._1.toString)
    assert(out.map(_._3).toSeq == (1 to 8).map(_ * 100.0)) // cumulative
    // 7-ROW MA: day 8's frame covers days 2..8 only
    assert(out.last._4 == 100.0)
    assert(out.head._5.isEmpty && out.last._5.contains(100.0)) // lag(1)
    assert(out(6)._6.isEmpty && out(7)._6.contains(100.0))     // lag(7)
  }

  test("order_metrics: completion/cancellation rates and null avg when no completes") {
    val d = Date.valueOf("2001-07-01")
    val out = Gold.orderMetricsFrom(silverOrdersFor(Seq(
      (1L, d, "completed", 100.0), (2L, d, "cancelled", 50.0),
      (3L, d, "pending", 25.0), (4L, d, "cancelled", 30.0),
      (5L, Date.valueOf("2001-07-02"), "pending", 10.0))))
    val r1 = out.filter($"order_date" === lit(d))
      .select("total_orders", "completed_orders", "completion_rate", "cancellation_rate",
        "total_revenue", "lost_revenue", "avg_order_value")
      .as[(Long, Long, Double, Double, Double, Double, Option[Double])].head()
    assert(r1 == ((4L, 1L, 25.0, 50.0, 100.0, 80.0, Some(100.0))))
    val r2 = out.filter($"order_date" =!= lit(d))
      .select("avg_order_value").as[Option[Double]].head()
    assert(r2.isEmpty) // no completed orders that day
  }

  test("customer_summary: segments, recency buckets and deterministic mode") {
    // Clock.today is pinned at 2001-08-15; last orders at 10/60/120/400 days back.
    def dsb(n: Int) = Date.valueOf(java.time.LocalDate.parse("2001-08-15").minusDays(n))
    val customers = Silver.customersFrom(
      (1L to 5L).map(i => (i, s"c$i", "x", s"c$i.x@example.com"))
        .toDF("customer_id", "first_name", "last_name", "email")
        .withColumn("created_at", lit(ts)).withColumn("_loaded_at", lit(ts))
        .withColumn("_source_model", lit("bronze_customers")))
    val orders = Silver.ordersFrom(
      Seq(
        (1L, 1L, dsb(10), "completed", 600.0),   // Active / High Value
        (2L, 2L, dsb(60), "completed", 250.0),   // At Risk / Medium Value
        (3L, 3L, dsb(120), "completed", 100.0),  // Inactive / Low Value
        (4L, 4L, dsb(400), "cancelled", 100.0))  // Churned / No Revenue
        .toDF("order_id", "customer_id", "order_date", "order_status", "order_amount")
        .withColumn("_loaded_at", lit(ts)).withColumn("_source_model", lit("bronze_orders")),
      customers)
    val payments = Silver.paymentsFrom(
      Seq((1L, 1L, "visa", 600.0), (2L, 1L, "paypal", 600.0), (3L, 1L, "PP", 600.0))
        .toDF("payment_id", "order_id", "payment_method", "payment_amount")
        .withColumn("payment_date", lit(ts)).withColumn("_loaded_at", lit(ts))
        .withColumn("_source_model", lit("bronze_payments")),
      orders)
    val out = Gold.customerSummaryFrom(customers, orders, payments)
      .select("customer_id", "customer_segment", "customer_status", "recency_score",
        "preferred_payment_method")
      .as[(Long, String, String, Int, Option[String])].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, "High Value", "Active", 3, Some("paypal")), // 2×paypal beats 1×credit_card
      (2L, "Medium Value", "At Risk", 2, None),
      (3L, "Low Value", "Inactive", 1, None),
      (4L, "No Revenue", "Churned", 1, None),
      (5L, "No Revenue", "Never Ordered", 1, None)))
  }
}

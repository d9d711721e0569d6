package graft

import java.sql.{Date, Timestamp}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.silver.Silver

/** Edge-case fixtures from FIXTURES.md §D, driven through the real silver
  * builders over hand-written bronze-shaped rows. */
class SilverSpec extends SparkSpec {
  import spark.implicits._

  private val ts = Timestamp.valueOf("2001-08-01 00:00:00")

  private def bronzeCustomers(rows: Seq[(Long, String, String, String)]): DataFrame =
    rows.toDF("customer_id", "first_name", "last_name", "email")
      .withColumn("created_at", lit(ts))
      .withColumn("_loaded_at", lit(ts))
      .withColumn("_source_model", lit("bronze_customers"))

  test("silver_customers drops null/shape-invalid emails, cleans the rest") {
    val out = Silver.customersFrom(bronzeCustomers(Seq(
      (1L, "  aLiCe  ", "SMITH", " Alice.SMITH@Example.Com "),
      (2L, "bob", "jones", null),             // null email -> dropped
      (3L, "carol", "day", "no-at-sign.com"), // fails %@%.% -> dropped
      (4L, null, "x", "x@y.z"))))             // null first_name -> dropped
    val rows = out.select("customer_id", "first_name", "last_name", "full_name", "email")
      .as[(Long, String, String, String, String)].collect()
    assert(rows.toSeq == Seq((1L, "Alice", "Smith", "Alice Smith", "alice.smith@example.com")))
    assert(out.select("_has_data_quality_issues").as[Int].head() == 0)
  }

  private def bronzeOrders(rows: Seq[(Long, Long, Date, String, Double)]): DataFrame =
    rows.toDF("order_id", "customer_id", "order_date", "order_status", "order_amount")
      .withColumn("_loaded_at", lit(ts))
      .withColumn("_source_model", lit("bronze_orders"))

  private val oneCustomer = Silver.customersFrom(
    bronzeCustomers(Seq((1L, "a", "b", "a.b@example.com"))))

  test("silver_orders normalizes every status synonym group and flags") {
    val d = Date.valueOf("2001-07-01")
    val out = Silver.ordersFrom(bronzeOrders(Seq(
      (1L, 1L, d, "DELIVERED", 10.0),
      (2L, 1L, d, "in_progress", 10.0),
      (3L, 1L, d, "Returned", 10.0),
      (4L, 1L, d, "mystery", 10.0),
      (5L, 1L, d, "completed", -4.0),  // dropped: amount <= 0
      (6L, 1L, null, "completed", 10.0))), // dropped: null date
      oneCustomer)
    val m = out.select("order_id", "order_status", "is_completed", "is_cancelled", "is_pending")
      .as[(Long, String, Boolean, Boolean, Boolean)].collect().sortBy(_._1)
    assert(m.toSeq == Seq(
      (1L, "completed", true, false, false),
      (2L, "pending", false, false, true),
      (3L, "cancelled", false, true, false),
      (4L, "unknown", false, false, false)))
  }

  test("silver_orders derives date parts incl. quarter string and 3-letter day") {
    val out = Silver.ordersFrom(bronzeOrders(Seq(
      (1L, 1L, Date.valueOf("2001-08-01"), "completed", 10.0))), oneCustomer)
    val r = out.select("order_year", "order_month", "order_day", "order_quarter",
      "order_day_name", "order_year_month", "order_year_quarter")
      .as[(Int, Int, Int, Int, String, String, String)].head()
    assert(r == ((2001, 8, 1, 3, "Wed", "2001-08", "2001-3")))
  }

  private def bronzePayments(rows: Seq[(Long, Long, String, Double)]): DataFrame =
    rows.toDF("payment_id", "order_id", "payment_method", "payment_amount")
      .withColumn("payment_date", lit(ts))
      .withColumn("_loaded_at", lit(ts))
      .withColumn("_source_model", lit("bronze_payments"))

  test("silver_payments maps methods, buckets sizes at exact boundaries") {
    val orders = Silver.ordersFrom(bronzeOrders(
      (1L to 8L).map(i => (i, 1L, Date.valueOf("2001-07-01"), "completed", 10.0))),
      oneCustomer)
    val out = Silver.paymentsFrom(bronzePayments(Seq(
      (1L, 1L, "VISA", 49.99), (2L, 2L, "wire", 50.0),
      (3L, 3L, "PP", 199.99), (4L, 4L, "Cash On Delivery", 200.0),
      (5L, 5L, "apple_pay", 499.99), (6L, 6L, "crypto", 500.0),
      (7L, 7L, "credit card", 0.0), (8L, 8L, "cc", -1.0))), orders)
    val m = out.select("payment_id", "payment_method", "payment_size_category",
      "is_successful_payment", "is_failed_payment", "_has_data_quality_issues")
      .as[(Long, String, String, Boolean, Boolean, Int)].collect().sortBy(_._1)
    assert(m.toSeq == Seq(
      (1L, "credit_card", "small", true, false, 0),
      (2L, "bank_transfer", "medium", true, false, 0),
      (3L, "paypal", "medium", true, false, 0),
      (4L, "cash", "large", true, false, 0),
      (5L, "digital_wallet", "large", true, false, 0),
      (6L, "other", "very_large", true, false, 0),
      (7L, "credit_card", "small", false, true, 1),
      (8L, "credit_card", "small", false, true, 1)))
  }
}

package graft.silver

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.bronze.Bronze
import graft.model.{Clock, SurrogateKey}

/** Silver layer — cleaned/conformed models mirroring
  * the models under `/root/reference/models/silver/` (SURVEY.md §2).
  *
  * Scale notes: the two joins (orders⋈customers, payments⋈orders;
  * SURVEY.md §2.4 J1/J2) are single-key equi-joins. At testdata scale
  * Catalyst broadcast-hash-joins the dimension side automatically; at
  * 100 TB the same code AQE-plans to a shuffled hash join with skew
  * handling — no hints are baked in so the optimizer stays free to choose.
  */
object Silver {

  /** Raw status synonym groups of `silver_orders.sql:42-49`. */
  val CompletedSynonyms = Seq("completed", "complete", "success", "delivered")
  val PendingSynonyms = Seq("pending", "processing", "in_progress")
  val CancelledSynonyms = Seq("cancelled", "canceled", "failed", "returned")

  /** Raw payment-method synonym groups of `silver_payments.sql:38-49`. */
  val MethodSynonyms: Seq[(String, Seq[String])] = Seq(
    "credit_card" -> Seq("credit_card", "credit card", "cc", "visa", "mastercard", "amex"),
    "bank_transfer" -> Seq("bank_transfer", "bank transfer", "wire", "ach", "direct_debit"),
    "paypal" -> Seq("paypal", "pp"),
    "cash" -> Seq("cash", "cash on delivery", "cod"),
    "digital_wallet" -> Seq("apple_pay", "google_pay", "digital_wallet"))

  private def inGroup(raw: Column, vals: Seq[String]): Column =
    lower(raw).isin(vals: _*)

  /** `models/silver/silver_customers.sql:20-66`. */
  def customers(spark: SparkSession, dir: String): DataFrame =
    customersFrom(Bronze.customers(spark, dir))

  def customersFrom(bronzeCustomers: DataFrame): DataFrame = {
    val b = bronzeCustomers
    b.filter(
        col("email").isNotNull && col("first_name").isNotNull &&
        col("last_name").isNotNull && col("email").like("%@%.%"))
      .select(
        SurrogateKey.of(col("customer_id")).as("customer_key"),
        col("customer_id"),
        initcap(trim(col("first_name"))).as("first_name"),
        initcap(trim(col("last_name"))).as("last_name"),
        concat(initcap(trim(col("first_name"))), lit(" "),
          initcap(trim(col("last_name")))).as("full_name"),
        lower(trim(col("email"))).as("email"),
        col("created_at"),
        col("_loaded_at"),
        Clock.now.as("_updated_at"),
        // Quality flag computed on the pre-clean columns, after the WHERE —
        // faithfully near-vacuous for customers (SURVEY.md §2.3 note on F1).
        when(col("first_name").isNull, 1)
          .when(col("last_name").isNull, 1)
          .when(col("email").isNull, 1)
          .when(!col("email").like("%@%.%"), 1)
          .otherwise(0).as("_has_data_quality_issues"))
  }

  /** `models/silver/silver_orders.sql:20-103` (J1 + C6 + C10–C13 + F2). */
  def orders(spark: SparkSession, dir: String): DataFrame =
    ordersFrom(Bronze.orders(spark, dir), customers(spark, dir))

  def ordersFrom(bronzeOrders: DataFrame, silverCustomers: DataFrame): DataFrame = {
    val o = bronzeOrders.as("o")
    val c = silverCustomers
      .select("customer_key", "customer_id").as("c")
    o.join(c, col("o.customer_id") === col("c.customer_id"), "inner")
      .filter(col("o.order_amount") > 0 && col("o.order_date").isNotNull)
      .select(
        SurrogateKey.of(col("o.order_id")).as("order_key"),
        col("c.customer_key"),
        col("o.order_id"),
        col("o.customer_id"),
        col("o.order_date"),
        when(inGroup(col("o.order_status"), CompletedSynonyms), "completed")
          .when(inGroup(col("o.order_status"), PendingSynonyms), "pending")
          .when(inGroup(col("o.order_status"), CancelledSynonyms), "cancelled")
          .otherwise("unknown").as("order_status"),
        when(inGroup(col("o.order_status"), CompletedSynonyms), true)
          .otherwise(false).as("is_completed"),
        when(inGroup(col("o.order_status"), CancelledSynonyms), true)
          .otherwise(false).as("is_cancelled"),
        when(inGroup(col("o.order_status"), PendingSynonyms), true)
          .otherwise(false).as("is_pending"),
        col("o.order_amount"),
        year(col("o.order_date")).as("order_year"),
        month(col("o.order_date")).as("order_month"),
        dayofmonth(col("o.order_date")).as("order_day"),
        quarter(col("o.order_date")).as("order_quarter"),
        // Snowflake dayname() = 3-letter; Spark pattern 'EEE' (C11).
        date_format(col("o.order_date"), "EEE").as("order_day_name"),
        // 'yyyy' (not week-year 'YYYY') — C12 trap.
        date_format(col("o.order_date"), "yyyy-MM").as("order_year_month"),
        // Snowflake to_char(d,'YYYY-Q') has no single Spark pattern (C13).
        concat(year(col("o.order_date")).cast("string"), lit("-"),
          quarter(col("o.order_date")).cast("string")).as("order_year_quarter"),
        col("o._loaded_at"),
        Clock.now.as("_updated_at"),
        when(col("o.order_amount") <= 0, 1)
          .when(col("o.order_date").isNull, 1)
          .when(col("c.customer_key").isNull, 1)
          .otherwise(0).as("_has_data_quality_issues"))
  }

  /** `models/silver/silver_payments.sql:20-93` (J2 + method map + buckets).
    * Note: no WHERE beyond the inner join — bad amounts/dates are kept and
    * only flagged (SURVEY.md §2.3). */
  def payments(spark: SparkSession, dir: String): DataFrame =
    paymentsFrom(Bronze.payments(spark, dir), orders(spark, dir))

  def paymentsFrom(bronzePayments: DataFrame, silverOrders: DataFrame): DataFrame = {
    val p = bronzePayments.as("p")
    val o = silverOrders.select("order_key", "order_id").as("so")
    val methodCol = MethodSynonyms.foldLeft(null: Column) {
      case (acc, (canon, syns)) =>
        val cond = inGroup(col("p.payment_method"), syns)
        if (acc == null) when(cond, canon) else acc.when(cond, canon)
    }.otherwise("other")
    p.join(o, col("p.order_id") === col("so.order_id"), "inner")
      .select(
        SurrogateKey.of(col("p.payment_id")).as("payment_key"),
        col("so.order_key"),
        col("p.payment_id"),
        col("p.order_id"),
        methodCol.as("payment_method"),
        col("p.payment_amount"),
        col("p.payment_date"),
        when(col("p.payment_amount") > 0, true).otherwise(false)
          .as("is_successful_payment"),
        when(col("p.payment_amount") <= 0, true).otherwise(false)
          .as("is_failed_payment"),
        when(col("p.payment_amount") < 50, "small")
          .when(col("p.payment_amount") < 200, "medium")
          .when(col("p.payment_amount") < 500, "large")
          .otherwise("very_large").as("payment_size_category"),
        col("p._loaded_at"),
        Clock.now.as("_updated_at"),
        when(col("p.payment_amount") <= 0, 1)
          .when(col("p.payment_date").isNull, 1)
          .when(col("so.order_key").isNull, 1)
          .otherwise(0).as("_has_data_quality_issues"))
  }
}

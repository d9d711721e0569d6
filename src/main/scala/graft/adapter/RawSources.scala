package graft.adapter

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Clock

/** Adapter: driver testdata (TPC-H-ish, TESTDATA.md) → the reference's raw
  * source schema (`/root/reference/models/bronze/bronze.yml:16-70`), SURVEY.md
  * §7.3 / FIXTURES.md §C.
  *
  * Every mapping is deterministic and pure-SQL-expressible so the DuckDB
  * oracle (graft.oracle.OracleSql) can rebuild bit-identical inputs from the
  * same parquet files. Key-modulus fan-outs deliberately exercise every CASE
  * branch and filter of the silver layer:
  *
  *  - customers: name split from `c_name` ("Customer#000000042"), with
  *    whitespace/case noise so `initcap(trim(...))`/`lower(trim(...))` do
  *    real work; `c_custkey % 53 == 0` → '@'-less email (dropped by the
  *    silver email-shape filter), `% 59 == 0` → NULL email (dropped).
  *  - orders: o_orderstatus F/O/P fanned across the raw status synonym
  *    groups of `silver_orders.sql:42-49`; `% 113` → unknown status,
  *    `% 101` → negative amount (dropped by silver), `% 103` → NULL
  *    order_date (dropped).
  *  - payments: no payments table exists in the testdata, so exactly one
  *    payment per order, methods fanned across the synonym groups of
  *    `silver_payments.sql:38-49` (groups via `% 6`, synonym via `% 7`,
  *    co-prime so all combinations occur); `% 89` → negative amount
  *    (kept — payments has no amount filter — exercising
  *    is_failed_payment and _has_data_quality_issues), `% 97` → NULL
  *    payment_date (quality flag).
  *
  * Scale note: these are narrow, shuffle-free projections over the parquet
  * scan; at 100 TB they stay embarrassingly parallel and fully
  * codegen-compiled (verified: whole-stage codegen, no exchange).
  */
object RawSources {

  /** Read one driver testdata table; timestamps normalized to NTZ so the
    * engine is insensitive to the parquet reader's TZ inference. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    graft.sources.ParquetStats.read(spark, s"$dir/$name.parquet")

  private def ntz(c: Column): Column = c.cast("timestamp_ntz")

  /** raw_customers(id, first_name, last_name, email, created_at). */
  def rawCustomers(spark: SparkSession, dir: String): DataFrame = {
    val c = table(spark, dir, "customer")
    val key = col("c_custkey")
    c.select(
      key.as("id"),
      concat(lit(" "), upper(substring_index(col("c_name"), "#", 1)), lit(" "))
        .as("first_name"),
      substring_index(col("c_name"), "#", -1).as("last_name"),
      when(key % 53 === 0, concat(lit("invalid-email-"), key.cast("string")))
        .when(key % 59 === 0, lit(null).cast("string"))
        .otherwise(concat(
          lit("CUSTOMER."), substring_index(col("c_name"), "#", -1),
          lit("@Example.Com")))
        .as("email"),
      date_add(to_date(lit("1994-01-01")), key.cast("int"))
        .cast("timestamp_ntz").as("created_at"))
  }

  /** raw_orders(id, user_id, order_date, status, amount, _loaded_at). */
  def rawOrders(spark: SparkSession, dir: String): DataFrame = {
    val o = table(spark, dir, "orders")
    val key = col("o_orderkey")
    val completedSyn = when(key % 4 === 0, "Completed")
      .when(key % 4 === 1, "COMPLETE")
      .when(key % 4 === 2, "success")
      .otherwise("Delivered")
    val pendingSyn = when(key % 3 === 0, "Pending")
      .when(key % 3 === 1, "PROCESSING")
      .otherwise("in_progress")
    val cancelledSyn = when(key % 4 === 0, "Cancelled")
      .when(key % 4 === 1, "canceled")
      .when(key % 4 === 2, "FAILED")
      .otherwise("returned")
    o.select(
      key.as("id"),
      col("o_custkey").as("user_id"),
      when(key % 103 === 0, lit(null).cast("date"))
        .otherwise(ntz(col("o_orderdate")).cast("date")).as("order_date"),
      when(key % 113 === 0, "mystery")
        .when(col("o_orderstatus") === "F", completedSyn)
        .when(col("o_orderstatus") === "O", pendingSyn)
        .otherwise(cancelledSyn)
        .as("status"),
      when(key % 101 === 0, lit(0.0) - col("o_totalprice"))
        .otherwise(col("o_totalprice")).as("amount"),
      Clock.ordersLoadedAt.as("_loaded_at"))
  }

  /** raw_payments(id, order_id, payment_method, amount, payment_date) —
    * synthesized one-per-order (FIXTURES.md §C). */
  def rawPayments(spark: SparkSession, dir: String): DataFrame = {
    val o = table(spark, dir, "orders")
    val key = col("o_orderkey")
    val syn = key % 7
    def pick(vals: Seq[String]): Column =
      vals.init.zipWithIndex.foldLeft(null: Column) { case (acc, (v, i)) =>
        val cond = (syn % vals.size) === i
        if (acc == null) when(cond, v) else acc.when(cond, v)
      }.otherwise(vals.last)
    val method = when(key % 6 === 0,
        pick(Seq("credit_card", "Credit Card", "CC", "VISA", "MasterCard", "AMEX")))
      .when(key % 6 === 1,
        pick(Seq("bank_transfer", "Bank Transfer", "WIRE", "ach", "direct_debit")))
      .when(key % 6 === 2, pick(Seq("PayPal", "PP")))
      .when(key % 6 === 3, pick(Seq("cash", "Cash On Delivery", "COD")))
      .when(key % 6 === 4, pick(Seq("apple_pay", "google_pay", "digital_wallet")))
      .otherwise(pick(Seq("crypto", "check", "gift_card")))
    o.select(
      key.as("id"),
      key.as("order_id"),
      method.as("payment_method"),
      when(key % 89 === 0, lit(0.0) - col("o_totalprice"))
        .otherwise(col("o_totalprice")).as("amount"),
      when(key % 97 === 0, lit(null).cast("timestamp_ntz"))
        .otherwise(ntz(col("o_orderdate"))).as("payment_date"))
  }
}

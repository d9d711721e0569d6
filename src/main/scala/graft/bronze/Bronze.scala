package graft.bronze

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.adapter.RawSources
import graft.model.Clock

/** Bronze layer — rename-projections plus audit columns, mirroring
  * the models under `/root/reference/models/bronze/` (SURVEY.md §2.2 P1–P5, §1.6).
  *
  * Materialized as views in the reference (`dbt_project.yml:19`); here each
  * is a lazy DataFrame the registry exposes as a temp view. These are
  * pure narrow projections — no shuffle, fully fused into downstream plans
  * by Catalyst.
  */
object Bronze {

  /** `models/bronze/bronze_customers.sql:21-40`. */
  def customers(spark: SparkSession, dir: String): DataFrame =
    RawSources.rawCustomers(spark, dir).select(
      col("id").as("customer_id"),
      col("first_name"),
      col("last_name"),
      col("email"),
      col("created_at"),
      Clock.now.as("_loaded_at"),
      lit("bronze_customers").as("_source_model"))

  /** `models/bronze/bronze_orders.sql:21-42` — note the upstream
    * `_loaded_at` is preserved, not restamped (intentional asymmetry,
    * SURVEY.md §1.6). */
  def orders(spark: SparkSession, dir: String): DataFrame =
    RawSources.rawOrders(spark, dir).select(
      col("id").as("order_id"),
      col("user_id").as("customer_id"),
      col("order_date"),
      col("status").as("order_status"),
      col("amount").as("order_amount"),
      col("_loaded_at"),
      lit("bronze_orders").as("_source_model"))

  /** `models/bronze/bronze_payments.sql:22-43`. */
  def payments(spark: SparkSession, dir: String): DataFrame =
    RawSources.rawPayments(spark, dir).select(
      col("id").as("payment_id"),
      col("order_id"),
      col("payment_method"),
      col("amount").as("payment_amount"),
      col("payment_date"),
      Clock.now.as("_loaded_at"),
      lit("bronze_payments").as("_source_model"))
}

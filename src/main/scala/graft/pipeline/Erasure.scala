package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.bronze.Bronze
import graft.gold.Gold
import graft.silver.Silver

/** Warehouse-wide user erasure — the right-to-be-forgotten run: given a
  * set of customers, remove them from the warehouse EVERYWHERE and rebuild
  * the marts, the batch-warehouse complement of the index/store deletion
  * lifecycle (`ops/IncrementalDedup.delete`, `ops/IvfIndex.deleteVectors`).
  *
  * The discipline: erase at the EARLIEST layer (bronze customers) and let
  * the medallion's own join topology propagate — silver orders inner-join
  * customers, silver payments inner-join orders, gold aggregates silver —
  * so one filter removes the user's orders, payments, and every derived
  * aggregate with zero per-table bookkeeping, and CANNOT miss a table that
  * joins through the customer (a per-table delete list can). The rebuilt
  * summary is oracle-checked equal to a from-scratch build on the erased
  * sources ([[graft.oracle.OracleSql.customerSummaryErased]]) — erasure ≡
  * never-having-loaded, the same contract `dedup_store_delete` pins for
  * the fingerprint store.
  *
  * At 100 TB the filter is a pushed-down predicate on the customer scan
  * (broadcast erasure list in production, a modulus here so the oracle is
  * SQL-expressible); nothing else changes shape vs the normal build. */
object Erasure {

  /** Deterministic erasure set: every [[ErasureMod]]th customer id. */
  val ErasureMod = 41

  def customerSummaryErased(spark: SparkSession, dir: String): DataFrame = {
    val bCust = Bronze.customers(spark, dir)
      .filter(col("customer_id") % ErasureMod =!= 0)
    val sCust = Silver.customersFrom(bCust)
    val sOrd = Silver.ordersFrom(Bronze.orders(spark, dir), sCust)
    val sPay = Silver.paymentsFrom(Bronze.payments(spark, dir), sOrd)
    Gold.customerSummaryFrom(sCust, sOrd, sPay)
  }

  /** The same never-loaded rebuild for an ARBITRARY erasure set (a
    * `customer_id` column) — the [[Forget]] entry point: the takedown
    * list is takedown-sized, so it broadcasts into an anti-join on the
    * bronze customer scan; everything downstream is the unchanged
    * medallion build. */
  def customerSummaryErasedFrom(spark: SparkSession, dir: String,
      erasedCustomerIds: DataFrame): DataFrame = {
    val bCust = Bronze.customers(spark, dir)
      .join(broadcast(erasedCustomerIds.select("customer_id")),
        Seq("customer_id"), "left_anti")
    val sCust = Silver.customersFrom(bCust)
    val sOrd = Silver.ordersFrom(Bronze.orders(spark, dir), sCust)
    val sPay = Silver.paymentsFrom(Bronze.payments(spark, dir), sOrd)
    Gold.customerSummaryFrom(sCust, sOrd, sPay)
  }
}

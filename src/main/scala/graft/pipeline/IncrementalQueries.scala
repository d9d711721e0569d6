package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.bronze.Bronze
import graft.oracle.OracleSql

/** Driver-checked batch replays of the incremental/snapshot
  * materializations ([[Incremental]]): each splits the bronze feed into a
  * deterministic "already loaded" / "arriving batch" pair, runs the real
  * merge / SCD2 transform, and is verified against a DuckDB oracle that
  * performs the same split and upsert in pure SQL — closing the gap where
  * these surfaces were covered by ScalaTest only.
  *
  * Scale notes are [[Incremental]]'s: merge is one left-anti equi-join
  * (broadcast when the batch is small), SCD2 shuffles once on the key.
  */
object IncrementalQueries {

  val CutoffDate = "2000-01-01"
  /** Restated-order key modulus: old orders with order_id % 97 == 0
    * re-arrive in the incoming batch with a corrected status. */
  val RestateMod = 97

  /** dbt `incremental` with `unique_key`, replayed as a batch: target =
    * orders before the cutoff, incoming = orders from the cutoff on plus
    * restatements of old orders (status corrected to 'returned'); the
    * merge must keep exactly one row per order_id, preferring incoming. */
  def incrementalMerge(spark: SparkSession, dir: String): DataFrame = {
    val bronze = Bronze.orders(spark, dir)
    val cutoff = to_date(lit(CutoffDate))
    val target = bronze.filter(col("order_date") < cutoff)
    val corrections = target.filter(col("order_id") % RestateMod === 0)
      .withColumn("order_status", lit("returned"))
    val incoming = bronze.filter(col("order_date") >= cutoff)
      .unionByName(corrections)
    Incremental.merge(target, incoming, "order_id")
  }

  def incrementalMergeOracle: String =
    s"""${OracleSql.prelude},
    target AS (
      SELECT * FROM bronze_orders WHERE order_date < DATE '$CutoffDate'),
    corrections AS (
      SELECT * REPLACE ('returned' AS order_status)
      FROM target WHERE order_id % $RestateMod = 0),
    incoming AS (
      SELECT * FROM bronze_orders WHERE order_date >= DATE '$CutoffDate'
      UNION ALL SELECT * FROM corrections),
    merged AS (
      SELECT * FROM target t
      WHERE NOT EXISTS (SELECT 1 FROM incoming i WHERE i.order_id = t.order_id)
      UNION ALL SELECT * FROM incoming)
    SELECT * FROM merged"""

  /** dbt `incremental` with no unique key (insert-only), replayed as a
    * batch: target = orders before the cutoff; the incoming batch is the
    * WHOLE feed (the common at-least-once redelivery shape) — the
    * high-water-mark filter must keep exactly the rows strictly newer
    * than max(order_date) in the target. */
  def incrementalAppend(spark: SparkSession, dir: String): DataFrame = {
    val bronze = Bronze.orders(spark, dir)
    val cutoff = to_date(lit(CutoffDate))
    // null order_dates excluded from the target so the high-water mark is
    // well-defined; they also fail the > hwm filter on the incoming side,
    // mirroring the oracle's NULL comparison semantics
    val target = bronze.filter(col("order_date") < cutoff)
    Incremental.append(target, bronze, "order_date")
  }

  def incrementalAppendOracle: String =
    s"""${OracleSql.prelude},
    target AS (
      SELECT * FROM bronze_orders WHERE order_date < DATE '$CutoffDate'),
    appended AS (
      SELECT * FROM target
      UNION ALL
      SELECT * FROM bronze_orders
      WHERE order_date > (SELECT max(order_date) FROM target))
    SELECT * FROM appended"""

  val Scd2T0 = "2001-08-14 00:00:00"
  val Scd2T1 = "2001-08-15 00:00:00"
  /** Day-1 email mutation modulus and day-0 late-arrival modulus. */
  val Scd2ChangeMod = 11
  val Scd2NewKeyMod = 17

  /** dbt snapshot (`check` strategy) replayed as a batch: day 0 =
    * customers except every [[Scd2NewKeyMod]]th key (those "appear" on
    * day 1), day 1 = all customers with every [[Scd2ChangeMod]]th email
    * rewritten. One [[Incremental.Scd2.advance]] must close the changed
    * versions, open new ones, and keep the rest current. */
  def scd2Snapshot(spark: SparkSession, dir: String): DataFrame = {
    val cust = Bronze.customers(spark, dir).select("customer_id", "email")
    val day0 = cust.filter(col("customer_id") % Scd2NewKeyMod =!= 0)
    val day1 = cust.withColumn("email",
      when(col("customer_id") % Scd2ChangeMod === 0,
        concat(lit("updated_"), col("email"))).otherwise(col("email")))
    val snap0 = Incremental.Scd2.init(day0, expr(s"TIMESTAMP_NTZ '$Scd2T0'"))
    Incremental.Scd2.advance(snap0, day1, "customer_id", Seq("email"),
      expr(s"TIMESTAMP_NTZ '$Scd2T1'"))
  }

  def scd2SnapshotOracle: String =
    s"""${OracleSql.prelude},
    cust AS (SELECT customer_id, email FROM bronze_customers),
    day0 AS (SELECT * FROM cust WHERE customer_id % $Scd2NewKeyMod != 0),
    day1 AS (
      SELECT customer_id,
        CASE WHEN customer_id % $Scd2ChangeMod = 0
             THEN 'updated_' || email ELSE email END AS email
      FROM cust),
    changed AS (
      SELECT d1.customer_id
      FROM day1 d1 LEFT JOIN day0 d0 USING (customer_id)
      WHERE d0.customer_id IS NULL
         OR coalesce(d1.email, '') != coalesce(d0.email, '')),
    opened AS (
      SELECT customer_id, email,
        TIMESTAMP '$Scd2T1' AS _valid_from,
        CAST(NULL AS TIMESTAMP) AS _valid_to, TRUE AS _is_current
      FROM day1 WHERE customer_id IN (SELECT customer_id FROM changed)),
    closed AS (
      SELECT customer_id, email,
        TIMESTAMP '$Scd2T0' AS _valid_from,
        TIMESTAMP '$Scd2T1' AS _valid_to, FALSE AS _is_current
      FROM day0 WHERE customer_id IN (SELECT customer_id FROM changed)),
    still AS (
      SELECT customer_id, email,
        TIMESTAMP '$Scd2T0' AS _valid_from,
        CAST(NULL AS TIMESTAMP) AS _valid_to, TRUE AS _is_current
      FROM day0 WHERE customer_id NOT IN (SELECT customer_id FROM changed))
    SELECT * FROM opened
    UNION ALL SELECT * FROM closed
    UNION ALL SELECT * FROM still"""
}

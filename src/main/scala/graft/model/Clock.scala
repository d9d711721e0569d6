package graft.model

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr

/** Injectable, pinned clock (SURVEY.md §7.4.1).
  *
  * The reference calls `current_timestamp()` / `current_date()` in model
  * outputs (e.g. `/root/reference/models/bronze/bronze_customers.sql:36`,
  * `models/gold/gold_customer_summary.sql:72-90`). For a deterministic
  * DuckDB-oracle comparison both engines must see the same instant, so the
  * engine's clock is pinned here and mirrored as literals in the oracle SQL
  * (graft.oracle.OracleSql). 2001-08-15 sits two weeks after the newest
  * order in the testdata (max o_orderdate = 2001-08-01), which spreads the
  * recency buckets Active/At Risk/Inactive/Churned
  * (`gold_customer_summary.sql:79-90`) across real values.
  *
  * All timestamps are TIMESTAMP_NTZ: the testdata parquet carries naive
  * (isAdjustedToUTC=false) timestamps and DuckDB's TIMESTAMP is naive, so
  * NTZ end-to-end removes any session-timezone sensitivity from the
  * comparison.
  */
object Clock {
  /** Pinned `current_date()`. */
  val todayLit = "2001-08-15"
  /** Pinned `current_timestamp()`. */
  val nowLit = "2001-08-15 00:00:00"
  /** Upstream `_loaded_at` preserved by bronze_orders — the reference
    * intentionally does NOT stamp orders at ingest
    * (`models/bronze/bronze_orders.sql:38`), so this predates [[nowLit]]. */
  val ordersLoadedAtLit = "2001-08-10 00:00:00"

  def today: Column = expr(s"DATE '$todayLit'")
  def now: Column = expr(s"TIMESTAMP_NTZ '$nowLit'")
  def ordersLoadedAt: Column = expr(s"TIMESTAMP_NTZ '$ordersLoadedAtLit'")
}

package graft.oracle

import graft.model.Clock

/** DuckDB-dialect oracle SQL — the semantic mirror of the Spark engine,
  * executed by the driver over the same parquet tables (BASELINE.md).
  *
  * Every CTE here reimplements, in ANSI/DuckDB SQL, the exact expression the
  * corresponding Spark model (graft.bronze/silver/gold) computes; the pinned
  * clock literals come from [[graft.model.Clock]]. Dialect notes:
  *  - DuckDB has no `initcap`; names are single-token so
  *    `upper(substr(x,1,1))||lower(substr(x,2))` is equivalent.
  *  - `extract(...)` returns BIGINT in DuckDB vs INT in Spark — cast inline.
  *  - deterministic mode = max of (zero-padded count || '|' || value),
  *    equivalent to Spark's `max(struct(cnt, value))` (Gold.customerSummary).
  */
object OracleSql {

  private val now = s"TIMESTAMP '${Clock.nowLit}'"
  private val today = s"DATE '${Clock.todayLit}'"
  private val ordersLoaded = s"TIMESTAMP '${Clock.ordersLoadedAtLit}'"

  // ---- adapter: testdata -> raw schema (mirrors graft.adapter.RawSources)

  private val rawCustomers = s"""raw_customers AS (
    SELECT c_custkey AS id,
      ' ' || upper(split_part(c_name, '#', 1)) || ' ' AS first_name,
      split_part(c_name, '#', 2) AS last_name,
      CASE WHEN c_custkey % 53 = 0 THEN 'invalid-email-' || CAST(c_custkey AS VARCHAR)
           WHEN c_custkey % 59 = 0 THEN NULL
           ELSE 'CUSTOMER.' || split_part(c_name, '#', 2) || '@Example.Com' END AS email,
      CAST(DATE '1994-01-01' + CAST(c_custkey AS INTEGER) * INTERVAL 1 DAY AS TIMESTAMP) AS created_at
    FROM customer)"""

  private val rawOrders = s"""raw_orders AS (
    SELECT o_orderkey AS id, o_custkey AS user_id,
      CASE WHEN o_orderkey % 103 = 0 THEN NULL ELSE CAST(o_orderdate AS DATE) END AS order_date,
      CASE WHEN o_orderkey % 113 = 0 THEN 'mystery'
           WHEN o_orderstatus = 'F' THEN
             CASE o_orderkey % 4 WHEN 0 THEN 'Completed' WHEN 1 THEN 'COMPLETE'
                                 WHEN 2 THEN 'success' ELSE 'Delivered' END
           WHEN o_orderstatus = 'O' THEN
             CASE o_orderkey % 3 WHEN 0 THEN 'Pending' WHEN 1 THEN 'PROCESSING'
                                 ELSE 'in_progress' END
           ELSE
             CASE o_orderkey % 4 WHEN 0 THEN 'Cancelled' WHEN 1 THEN 'canceled'
                                 WHEN 2 THEN 'FAILED' ELSE 'returned' END
      END AS status,
      CASE WHEN o_orderkey % 101 = 0 THEN 0.0 - o_totalprice ELSE o_totalprice END AS amount,
      $ordersLoaded AS _loaded_at
    FROM orders)"""

  private val rawPayments = s"""raw_payments AS (
    SELECT o_orderkey AS id, o_orderkey AS order_id,
      CASE o_orderkey % 6
        WHEN 0 THEN CASE (o_orderkey % 7) % 6 WHEN 0 THEN 'credit_card' WHEN 1 THEN 'Credit Card'
          WHEN 2 THEN 'CC' WHEN 3 THEN 'VISA' WHEN 4 THEN 'MasterCard' ELSE 'AMEX' END
        WHEN 1 THEN CASE (o_orderkey % 7) % 5 WHEN 0 THEN 'bank_transfer' WHEN 1 THEN 'Bank Transfer'
          WHEN 2 THEN 'WIRE' WHEN 3 THEN 'ach' ELSE 'direct_debit' END
        WHEN 2 THEN CASE (o_orderkey % 7) % 2 WHEN 0 THEN 'PayPal' ELSE 'PP' END
        WHEN 3 THEN CASE (o_orderkey % 7) % 3 WHEN 0 THEN 'cash' WHEN 1 THEN 'Cash On Delivery' ELSE 'COD' END
        WHEN 4 THEN CASE (o_orderkey % 7) % 3 WHEN 0 THEN 'apple_pay' WHEN 1 THEN 'google_pay' ELSE 'digital_wallet' END
        ELSE CASE (o_orderkey % 7) % 3 WHEN 0 THEN 'crypto' WHEN 1 THEN 'check' ELSE 'gift_card' END
      END AS payment_method,
      CASE WHEN o_orderkey % 89 = 0 THEN 0.0 - o_totalprice ELSE o_totalprice END AS amount,
      CASE WHEN o_orderkey % 97 = 0 THEN NULL ELSE CAST(o_orderdate AS TIMESTAMP) END AS payment_date
    FROM orders)"""

  // ---- bronze (mirrors graft.bronze.Bronze)

  private def bronzeCustomersCteWhere(where: String) = s"""bronze_customers AS (
    SELECT id AS customer_id, first_name, last_name, email, created_at,
      $now AS _loaded_at, 'bronze_customers' AS _source_model
    FROM raw_customers$where)"""

  private val bronzeCustomersCte = bronzeCustomersCteWhere("")

  private val bronzeOrdersCte = s"""bronze_orders AS (
    SELECT id AS order_id, user_id AS customer_id, order_date,
      status AS order_status, amount AS order_amount,
      _loaded_at, 'bronze_orders' AS _source_model
    FROM raw_orders)"""

  private val bronzePaymentsCte = s"""bronze_payments AS (
    SELECT id AS payment_id, order_id, payment_method, amount AS payment_amount,
      payment_date, $now AS _loaded_at, 'bronze_payments' AS _source_model
    FROM raw_payments)"""

  // ---- silver (mirrors graft.silver.Silver)

  private def initcap1(x: String) =
    s"upper(substr(trim($x), 1, 1)) || lower(substr(trim($x), 2))"
  private def sk(x: String) =
    s"md5(coalesce(CAST($x AS VARCHAR), '_dbt_utils_surrogate_key_null_'))"

  private val silverCustomersCte = s"""silver_customers AS (
    SELECT ${sk("customer_id")} AS customer_key, customer_id,
      ${initcap1("first_name")} AS first_name,
      ${initcap1("last_name")} AS last_name,
      ${initcap1("first_name")} || ' ' || ${initcap1("last_name")} AS full_name,
      lower(trim(email)) AS email,
      created_at, _loaded_at, $now AS _updated_at,
      CASE WHEN first_name IS NULL THEN 1 WHEN last_name IS NULL THEN 1
           WHEN email IS NULL THEN 1 WHEN email NOT LIKE '%@%.%' THEN 1
           ELSE 0 END AS _has_data_quality_issues
    FROM bronze_customers
    WHERE email IS NOT NULL AND first_name IS NOT NULL
      AND last_name IS NOT NULL AND email LIKE '%@%.%')"""

  private val statusCase = """CASE
      WHEN lower(o.order_status) IN ('completed','complete','success','delivered') THEN 'completed'
      WHEN lower(o.order_status) IN ('pending','processing','in_progress') THEN 'pending'
      WHEN lower(o.order_status) IN ('cancelled','canceled','failed','returned') THEN 'cancelled'
      ELSE 'unknown' END"""

  private val silverOrdersCte = s"""silver_orders AS (
    SELECT ${sk("o.order_id")} AS order_key, c.customer_key,
      o.order_id, o.customer_id, o.order_date,
      $statusCase AS order_status,
      lower(o.order_status) IN ('completed','complete','success','delivered') AS is_completed,
      lower(o.order_status) IN ('cancelled','canceled','failed','returned') AS is_cancelled,
      lower(o.order_status) IN ('pending','processing','in_progress') AS is_pending,
      o.order_amount,
      CAST(extract(year FROM o.order_date) AS INTEGER) AS order_year,
      CAST(extract(month FROM o.order_date) AS INTEGER) AS order_month,
      CAST(extract(day FROM o.order_date) AS INTEGER) AS order_day,
      CAST(extract(quarter FROM o.order_date) AS INTEGER) AS order_quarter,
      substr(dayname(o.order_date), 1, 3) AS order_day_name,
      strftime(o.order_date, '%Y-%m') AS order_year_month,
      CAST(extract(year FROM o.order_date) AS VARCHAR) || '-' ||
        CAST(extract(quarter FROM o.order_date) AS VARCHAR) AS order_year_quarter,
      o._loaded_at, $now AS _updated_at,
      CASE WHEN o.order_amount <= 0 THEN 1 WHEN o.order_date IS NULL THEN 1
           WHEN c.customer_key IS NULL THEN 1 ELSE 0 END AS _has_data_quality_issues
    FROM bronze_orders o
    JOIN silver_customers c ON o.customer_id = c.customer_id
    WHERE o.order_amount > 0 AND o.order_date IS NOT NULL)"""

  private val methodCase = """CASE
      WHEN lower(p.payment_method) IN ('credit_card','credit card','cc','visa','mastercard','amex') THEN 'credit_card'
      WHEN lower(p.payment_method) IN ('bank_transfer','bank transfer','wire','ach','direct_debit') THEN 'bank_transfer'
      WHEN lower(p.payment_method) IN ('paypal','pp') THEN 'paypal'
      WHEN lower(p.payment_method) IN ('cash','cash on delivery','cod') THEN 'cash'
      WHEN lower(p.payment_method) IN ('apple_pay','google_pay','digital_wallet') THEN 'digital_wallet'
      ELSE 'other' END"""

  private val silverPaymentsCte = s"""silver_payments AS (
    SELECT ${sk("p.payment_id")} AS payment_key, so.order_key,
      p.payment_id, p.order_id,
      $methodCase AS payment_method,
      p.payment_amount, p.payment_date,
      p.payment_amount > 0 AS is_successful_payment,
      p.payment_amount <= 0 AS is_failed_payment,
      CASE WHEN p.payment_amount < 50 THEN 'small'
           WHEN p.payment_amount < 200 THEN 'medium'
           WHEN p.payment_amount < 500 THEN 'large'
           ELSE 'very_large' END AS payment_size_category,
      p._loaded_at, $now AS _updated_at,
      CASE WHEN p.payment_amount <= 0 THEN 1 WHEN p.payment_date IS NULL THEN 1
           WHEN so.order_key IS NULL THEN 1 ELSE 0 END AS _has_data_quality_issues
    FROM bronze_payments p
    JOIN silver_orders so ON p.order_id = so.order_id)"""

  /** Shared adapter+bronze+silver CTE chain (DuckDB prunes unused CTEs). */
  val prelude: String = Seq(
    rawCustomers, rawOrders, rawPayments,
    bronzeCustomersCte, bronzeOrdersCte, bronzePaymentsCte,
    silverCustomersCte, silverOrdersCte, silverPaymentsCte
  ).mkString("WITH ", ",\n", "")

  /** [[prelude]] with the user-erasure predicate applied at the EARLIEST
    * layer (bronze customers); every downstream inner join propagates the
    * erasure — the oracle twin of [[graft.pipeline.Erasure]]. */
  def preludeErased(mod: Int): String = Seq(
    rawCustomers, rawOrders, rawPayments,
    bronzeCustomersCteWhere(s" WHERE id % $mod != 0"),
    bronzeOrdersCte, bronzePaymentsCte,
    silverCustomersCte, silverOrdersCte, silverPaymentsCte
  ).mkString("WITH ", ",\n", "")

  def customerSummaryErased(mod: Int): String =
    s"${preludeErased(mod)},\n$customerSummaryCtes\n$customerSummarySelect"

  def bronzeCustomers: String = s"$prelude SELECT * FROM bronze_customers"
  def bronzeOrders: String = s"$prelude SELECT * FROM bronze_orders"
  def bronzePayments: String = s"$prelude SELECT * FROM bronze_payments"
  def silverCustomers: String = s"$prelude SELECT * FROM silver_customers"
  def silverOrders: String = s"$prelude SELECT * FROM silver_orders"
  def silverPayments: String = s"$prelude SELECT * FROM silver_payments"

  // ---- gold (mirrors graft.gold.Gold)

  val customerSummaryCtes: String = s"""customer_orders AS (
    SELECT customer_key,
      count(DISTINCT order_key) AS total_orders,
      count(DISTINCT CASE WHEN is_completed THEN order_key END) AS completed_orders,
      count(DISTINCT CASE WHEN is_cancelled THEN order_key END) AS cancelled_orders,
      count(DISTINCT CASE WHEN is_pending THEN order_key END) AS pending_orders,
      min(order_date) AS first_order_date,
      max(order_date) AS last_order_date,
      date_diff('day', min(order_date), max(order_date)) AS customer_lifetime_days,
      sum(CASE WHEN is_completed THEN CAST(round(order_amount * 100) AS BIGINT) ELSE 0 END) / 100.0 AS total_revenue,
      sum(CASE WHEN is_completed THEN CAST(round(order_amount * 100) AS BIGINT) END) / 100.0
        / count(CASE WHEN is_completed THEN order_amount END) AS avg_order_value,
      max(order_amount) AS max_order_value,
      min(CASE WHEN is_completed THEN order_amount END) AS min_order_value,
      count(DISTINCT order_year_month) AS active_months
    FROM silver_orders GROUP BY 1),
  success_joined AS (
    SELECT o.customer_key, p.payment_key, p.payment_method, p.payment_amount
    FROM silver_payments p JOIN silver_orders o ON p.order_key = o.order_key
    WHERE p.is_successful_payment),
  cp_agg AS (
    SELECT customer_key,
      count(DISTINCT payment_key) AS total_payments,
      count(DISTINCT payment_method) AS unique_payment_methods,
      sum(CAST(round(payment_amount * 100) AS BIGINT)) / 100.0 AS total_paid
    FROM success_joined GROUP BY 1),
  cp_counts AS (
    SELECT customer_key, payment_method, count(*) AS cnt
    FROM success_joined GROUP BY 1, 2),
  cp_pref AS (
    SELECT customer_key,
      split_part(max(lpad(CAST(cnt AS VARCHAR), 10, '0') || '|' || payment_method), '|', 2)
        AS preferred_payment_method
    FROM cp_counts GROUP BY 1),
  customer_payments AS (
    SELECT a.*, f.preferred_payment_method
    FROM cp_agg a JOIN cp_pref f USING (customer_key))"""

  val customerSummarySelect: String = s"""SELECT
    c.customer_key, c.customer_id, c.full_name, c.first_name, c.last_name, c.email,
    c.created_at AS customer_since,
    coalesce(co.total_orders, 0) AS total_orders,
    coalesce(co.completed_orders, 0) AS completed_orders,
    coalesce(co.cancelled_orders, 0) AS cancelled_orders,
    coalesce(co.pending_orders, 0) AS pending_orders,
    coalesce(co.total_revenue, 0) AS lifetime_value,
    coalesce(co.avg_order_value, 0) AS avg_order_value,
    coalesce(co.max_order_value, 0) AS max_order_value,
    coalesce(co.min_order_value, 0) AS min_order_value,
    coalesce(cp.total_payments, 0) AS total_payments,
    coalesce(cp.unique_payment_methods, 0) AS unique_payment_methods,
    coalesce(cp.total_paid, 0) AS total_paid_amount,
    cp.preferred_payment_method,
    co.first_order_date, co.last_order_date,
    coalesce(co.customer_lifetime_days, 0) AS customer_lifetime_days,
    coalesce(co.active_months, 0) AS active_months,
    date_diff('day', co.last_order_date, $today) AS days_since_last_order,
    CASE WHEN coalesce(co.total_revenue, 0) >= 500 THEN 'High Value'
         WHEN coalesce(co.total_revenue, 0) >= 200 THEN 'Medium Value'
         WHEN coalesce(co.total_revenue, 0) > 0 THEN 'Low Value'
         ELSE 'No Revenue' END AS customer_segment,
    CASE WHEN co.last_order_date IS NULL THEN 'Never Ordered'
         WHEN date_diff('day', co.last_order_date, $today) <= 30 THEN 'Active'
         WHEN date_diff('day', co.last_order_date, $today) <= 90 THEN 'At Risk'
         WHEN date_diff('day', co.last_order_date, $today) <= 180 THEN 'Inactive'
         ELSE 'Churned' END AS customer_status,
    CASE WHEN date_diff('day', co.last_order_date, $today) <= 30 THEN 3
         WHEN date_diff('day', co.last_order_date, $today) <= 90 THEN 2
         ELSE 1 END AS recency_score,
    CASE WHEN coalesce(co.total_orders, 0) >= 5 THEN 3
         WHEN coalesce(co.total_orders, 0) >= 2 THEN 2
         ELSE 1 END AS frequency_score,
    CASE WHEN coalesce(co.total_revenue, 0) >= 500 THEN 3
         WHEN coalesce(co.total_revenue, 0) >= 200 THEN 2
         ELSE 1 END AS monetary_score,
    $now AS _updated_at
  FROM silver_customers c
  LEFT JOIN customer_orders co ON c.customer_key = co.customer_key
  LEFT JOIN customer_payments cp ON c.customer_key = cp.customer_key"""

  def customerSummary: String =
    s"$prelude,\n$customerSummaryCtes\n$customerSummarySelect"

  val orderMetricsCtes: String = s"""daily0 AS (
    SELECT order_date, order_year, order_month, order_day, order_quarter,
      order_year_month, order_year_quarter, order_day_name,
      count(DISTINCT order_key) AS total_orders,
      count(DISTINCT CASE WHEN is_completed THEN order_key END) AS completed_orders,
      count(DISTINCT CASE WHEN is_cancelled THEN order_key END) AS cancelled_orders,
      count(DISTINCT CASE WHEN is_pending THEN order_key END) AS pending_orders,
      count(DISTINCT customer_key) AS unique_customers,
      sum(CASE WHEN is_completed THEN CAST(round(order_amount * 100) AS BIGINT) ELSE 0 END) / 100.0 AS total_revenue,
      sum(CASE WHEN is_completed THEN CAST(round(order_amount * 100) AS BIGINT) END) / 100.0
        / count(CASE WHEN is_completed THEN order_amount END) AS avg_order_value,
      max(order_amount) AS max_order_value,
      min(CASE WHEN is_completed THEN order_amount END) AS min_order_value,
      sum(CAST(round(order_amount * 100) AS BIGINT)) / 100.0 AS potential_revenue,
      sum(CASE WHEN is_cancelled THEN CAST(round(order_amount * 100) AS BIGINT) ELSE 0 END) / 100.0 AS lost_revenue
    FROM silver_orders
    GROUP BY 1, 2, 3, 4, 5, 6, 7, 8),
  daily AS (
    SELECT *,
      round(completed_orders * 100.0 / nullif(total_orders, 0), 2) AS completion_rate,
      round(cancelled_orders * 100.0 / nullif(total_orders, 0), 2) AS cancellation_rate,
      round(total_orders * 1.0 / nullif(unique_customers, 0), 2) AS orders_per_customer
    FROM daily0)"""

  val orderMetricsSelect: String = s"""SELECT *,
    sum(CAST(round(total_revenue * 100) AS BIGINT)) OVER (ORDER BY order_date
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0 AS cumulative_revenue,
    sum(total_orders) OVER (ORDER BY order_date
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumulative_orders,
    sum(CAST(round(total_revenue * 100) AS BIGINT)) OVER (ORDER BY order_date
      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) / 100.0
      / count(total_revenue) OVER (ORDER BY order_date
      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS revenue_7day_ma,
    avg(total_orders) OVER (ORDER BY order_date
      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS orders_7day_ma,
    lag(total_revenue, 1) OVER (ORDER BY order_date) AS prior_day_revenue,
    lag(total_revenue, 7) OVER (ORDER BY order_date) AS week_ago_revenue,
    round((total_revenue - lag(total_revenue, 1) OVER (ORDER BY order_date)) * 100.0 /
      nullif(lag(total_revenue, 1) OVER (ORDER BY order_date), 0), 2)
      AS revenue_growth_vs_prior_day_pct,
    round((total_revenue - lag(total_revenue, 7) OVER (ORDER BY order_date)) * 100.0 /
      nullif(lag(total_revenue, 7) OVER (ORDER BY order_date), 0), 2)
      AS revenue_growth_vs_week_ago_pct,
    $now AS _updated_at
  FROM daily"""

  def orderMetrics: String =
    s"$prelude,\n$orderMetricsCtes\n$orderMetricsSelect"

  val revenueAnalysisCtes: String = s"""orders_c AS (SELECT * FROM silver_orders WHERE is_completed),
  payments_s AS (SELECT * FROM silver_payments WHERE is_successful_payment),
  monthly0 AS (
    SELECT order_year, order_month, order_year_month, order_quarter, order_year_quarter,
      count(DISTINCT order_key) AS total_orders,
      count(DISTINCT customer_key) AS unique_customers,
      sum(CAST(round(order_amount * 100) AS BIGINT)) / 100.0 AS total_revenue,
      sum(CAST(round(order_amount * 100) AS BIGINT)) / 100.0 / count(order_amount) AS avg_order_value,
      max(order_amount) AS max_order_value,
      min(order_amount) AS min_order_value
    FROM orders_c GROUP BY 1, 2, 3, 4, 5),
  monthly_orders AS (
    SELECT *, round(total_orders * 1.0 / nullif(unique_customers, 0), 2) AS orders_per_customer
    FROM monthly0),
  monthly_payment_methods AS (
    SELECT strftime(o.order_date, '%Y-%m') AS order_year_month, p.payment_method,
      count(DISTINCT p.payment_key) AS payment_count,
      sum(CAST(round(p.payment_amount * 100) AS BIGINT)) / 100.0 AS payment_amount
    FROM payments_s p JOIN orders_c o ON p.order_key = o.order_key
    GROUP BY 1, 2),
  payment_pivot AS (
    SELECT order_year_month,
      sum(CASE WHEN payment_method = 'credit_card' THEN CAST(round(payment_amount * 100) AS BIGINT) ELSE 0 END) / 100.0 AS credit_card_revenue,
      sum(CASE WHEN payment_method = 'bank_transfer' THEN CAST(round(payment_amount * 100) AS BIGINT) ELSE 0 END) / 100.0 AS bank_transfer_revenue,
      sum(CASE WHEN payment_method = 'paypal' THEN CAST(round(payment_amount * 100) AS BIGINT) ELSE 0 END) / 100.0 AS paypal_revenue,
      sum(CASE WHEN payment_method = 'cash' THEN CAST(round(payment_amount * 100) AS BIGINT) ELSE 0 END) / 100.0 AS cash_revenue,
      sum(CASE WHEN payment_method = 'other' THEN CAST(round(payment_amount * 100) AS BIGINT) ELSE 0 END) / 100.0 AS other_revenue
    FROM monthly_payment_methods GROUP BY 1),
  enriched AS (
    SELECT mo.*,
      lag(mo.total_revenue, 1) OVER (ORDER BY mo.order_year_month) AS prev_month_revenue,
      lag(mo.total_revenue, 12) OVER (ORDER BY mo.order_year_month) AS year_ago_revenue,
      lag(mo.total_orders, 1) OVER (ORDER BY mo.order_year_month) AS prev_month_orders,
      round((mo.total_revenue - lag(mo.total_revenue, 1) OVER (ORDER BY mo.order_year_month)) * 100.0 /
        nullif(lag(mo.total_revenue, 1) OVER (ORDER BY mo.order_year_month), 0), 2) AS revenue_growth_mom_pct,
      round((mo.total_orders - lag(mo.total_orders, 1) OVER (ORDER BY mo.order_year_month)) * 100.0 /
        nullif(lag(mo.total_orders, 1) OVER (ORDER BY mo.order_year_month), 0), 2) AS orders_growth_mom_pct,
      round((mo.total_revenue - lag(mo.total_revenue, 12) OVER (ORDER BY mo.order_year_month)) * 100.0 /
        nullif(lag(mo.total_revenue, 12) OVER (ORDER BY mo.order_year_month), 0), 2) AS revenue_growth_yoy_pct,
      sum(CAST(round(mo.total_revenue * 100) AS BIGINT)) OVER (PARTITION BY mo.order_year ORDER BY mo.order_month
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0 AS ytd_revenue,
      sum(mo.total_orders) OVER (PARTITION BY mo.order_year ORDER BY mo.order_month
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ytd_orders
    FROM monthly_orders mo)"""

  val revenueAnalysisSelect: String = s"""SELECT e.*, pp.credit_card_revenue, pp.bank_transfer_revenue, pp.paypal_revenue,
    pp.cash_revenue, pp.other_revenue, $now AS _updated_at
  FROM enriched e
  LEFT JOIN payment_pivot pp ON e.order_year_month = pp.order_year_month"""

  def revenueAnalysis: String =
    s"$prelude,\n$revenueAnalysisCtes\n$revenueAnalysisSelect"
}

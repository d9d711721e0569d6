{{ config(materialized='table', tags=['daily', 'customers', 'summary']) }}

-- Gold customer summary: per-customer order aggregates (A1), payment
-- aggregates with the deterministic mode (A2 — max-by (count, value),
-- ties toward the lexicographically larger method), the 3-way join
-- (J3/J4), recency/RFM scoring. Money sums accumulate exact cents
-- (cast(round(x * 100) as bigint)) and divide back by 100.0D — the
-- engine-wide float-parity discipline; 'D' suffixes keep Spark SQL's
-- decimal-literal parsing from changing the double arithmetic of the
-- code twin graft.gold.Gold.customerSummaryFrom
-- (reference: models/gold/gold_customer_summary.sql).

with customer_orders as (
    select
        customer_key,
        count(distinct order_key) as total_orders,
        count(distinct case when is_completed then order_key end) as completed_orders,
        count(distinct case when is_cancelled then order_key end) as cancelled_orders,
        count(distinct case when is_pending then order_key end) as pending_orders,
        min(order_date) as first_order_date,
        max(order_date) as last_order_date,
        datediff(max(order_date), min(order_date)) as customer_lifetime_days,
        sum(case when is_completed
            then cast(round(order_amount * 100) as bigint) else 0L end) / 100.0D
            as total_revenue,
        sum(cast(round((case when is_completed then order_amount end) * 100) as bigint))
            / 100.0D / count(case when is_completed then order_amount end)
            as avg_order_value,
        max(order_amount) as max_order_value,
        min(case when is_completed then order_amount end) as min_order_value,
        count(distinct order_year_month) as active_months
    from {{ ref('silver_orders') }}
    group by customer_key
),

-- one two-level aggregation instead of (per-customer agg) x (mode agg):
-- payment_key is unique per row and each row has one method, so global
-- distincts equal sums of per-method distincts
per_method as (
    select
        o.customer_key,
        p.payment_method,
        count(distinct p.payment_key) as pm_payments,
        count(1) as pm_rows,
        sum(cast(round(p.payment_amount * 100) as bigint)) / 100.0D as pm_paid
    from {{ ref('silver_payments') }} p
    join {{ ref('silver_orders') }} o on p.order_key = o.order_key
    where p.is_successful_payment
    group by o.customer_key, p.payment_method
),

customer_payments as (
    select
        customer_key,
        sum(pm_payments) as total_payments,
        count(1) as unique_payment_methods,
        sum(cast(round(pm_paid * 100) as bigint)) / 100.0D as total_paid,
        max(struct(pm_rows, payment_method)).payment_method
            as preferred_payment_method
    from per_method
    group by customer_key
)

select
    c.customer_key,
    c.customer_id,
    c.full_name,
    c.first_name,
    c.last_name,
    c.email,
    c.created_at as customer_since,
    coalesce(co.total_orders, 0) as total_orders,
    coalesce(co.completed_orders, 0) as completed_orders,
    coalesce(co.cancelled_orders, 0) as cancelled_orders,
    coalesce(co.pending_orders, 0) as pending_orders,
    coalesce(co.total_revenue, 0) as lifetime_value,
    coalesce(co.avg_order_value, 0) as avg_order_value,
    coalesce(co.max_order_value, 0) as max_order_value,
    coalesce(co.min_order_value, 0) as min_order_value,
    coalesce(cp.total_payments, 0) as total_payments,
    coalesce(cp.unique_payment_methods, 0) as unique_payment_methods,
    coalesce(cp.total_paid, 0) as total_paid_amount,
    cp.preferred_payment_method,
    co.first_order_date,
    co.last_order_date,
    coalesce(co.customer_lifetime_days, 0) as customer_lifetime_days,
    coalesce(co.active_months, 0) as active_months,
    datediff(current_date(), co.last_order_date) as days_since_last_order,
    case
        when coalesce(co.total_revenue, 0) >= 500 then 'High Value'
        when coalesce(co.total_revenue, 0) >= 200 then 'Medium Value'
        when coalesce(co.total_revenue, 0) > 0 then 'Low Value'
        else 'No Revenue'
    end as customer_segment,
    case
        when co.last_order_date is null then 'Never Ordered'
        when datediff(current_date(), co.last_order_date) <= 30 then 'Active'
        when datediff(current_date(), co.last_order_date) <= 90 then 'At Risk'
        when datediff(current_date(), co.last_order_date) <= 180 then 'Inactive'
        else 'Churned'
    end as customer_status,
    case
        when datediff(current_date(), co.last_order_date) <= 30 then 3
        when datediff(current_date(), co.last_order_date) <= 90 then 2
        else 1
    end as recency_score,
    case
        when coalesce(co.total_orders, 0) >= 5 then 3
        when coalesce(co.total_orders, 0) >= 2 then 2
        else 1
    end as frequency_score,
    case
        when coalesce(co.total_revenue, 0) >= 500 then 3
        when coalesce(co.total_revenue, 0) >= 200 then 2
        else 1
    end as monetary_score,
    current_timestamp() as _updated_at
from {{ ref('silver_customers') }} c
left join customer_orders co on c.customer_key = co.customer_key
left join customer_payments cp on c.customer_key = cp.customer_key

{{ config(materialized='table', tags=['daily', 'orders', 'metrics']) }}

-- Gold order metrics: the daily 8-column grouping (A3), ratio columns,
-- and the global windows — cumulative sums, the 7-ROW (not 7-day)
-- moving average (faithful quirk W3), lag/growth-% (W1-W8), final
-- ordering (O1). Global windows run over per-day rows (cardinality =
-- #days), so the single-partition WindowExec is fine at any input
-- scale. Exact-cents money sums; 'D'-suffixed double literals. SQL twin
-- of graft.gold.Gold.orderMetricsFrom
-- (reference: models/gold/gold_order_metrics.sql).

with daily as (
    select
        order_date,
        order_year,
        order_month,
        order_day,
        order_quarter,
        order_year_month,
        order_year_quarter,
        order_day_name,
        count(distinct order_key) as total_orders,
        count(distinct case when is_completed then order_key end) as completed_orders,
        count(distinct case when is_cancelled then order_key end) as cancelled_orders,
        count(distinct case when is_pending then order_key end) as pending_orders,
        count(distinct customer_key) as unique_customers,
        sum(case when is_completed
            then cast(round(order_amount * 100) as bigint) else 0L end) / 100.0D
            as total_revenue,
        sum(cast(round((case when is_completed then order_amount end) * 100) as bigint))
            / 100.0D / count(case when is_completed then order_amount end)
            as avg_order_value,
        max(order_amount) as max_order_value,
        min(case when is_completed then order_amount end) as min_order_value,
        sum(cast(round(order_amount * 100) as bigint)) / 100.0D as potential_revenue,
        sum(case when is_cancelled
            then cast(round(order_amount * 100) as bigint) else 0L end) / 100.0D
            as lost_revenue
    from {{ ref('silver_orders') }}
    group by order_date, order_year, order_month, order_day, order_quarter,
             order_year_month, order_year_quarter, order_day_name
),

rated as (
    select
        *,
        round(completed_orders * 100.0D / nullif(total_orders, 0), 2) as completion_rate,
        round(cancelled_orders * 100.0D / nullif(total_orders, 0), 2) as cancellation_rate,
        round(total_orders * 1.0D / nullif(unique_customers, 0), 2) as orders_per_customer
    from daily
)

select
    *,
    sum(cast(round(total_revenue * 100) as bigint)) over (
        order by order_date rows between unbounded preceding and current row
    ) / 100.0D as cumulative_revenue,
    sum(total_orders) over (
        order by order_date rows between unbounded preceding and current row
    ) as cumulative_orders,
    sum(cast(round(total_revenue * 100) as bigint)) over (
        order by order_date rows between 6 preceding and current row
    ) / 100.0D / count(total_revenue) over (
        order by order_date rows between 6 preceding and current row
    ) as revenue_7day_ma,
    avg(total_orders) over (
        order by order_date rows between 6 preceding and current row
    ) as orders_7day_ma,
    lag(total_revenue, 1) over (order by order_date) as prior_day_revenue,
    lag(total_revenue, 7) over (order by order_date) as week_ago_revenue,
    round((total_revenue - lag(total_revenue, 1) over (order by order_date)) * 100.0D
        / nullif(lag(total_revenue, 1) over (order by order_date), 0), 2)
        as revenue_growth_vs_prior_day_pct,
    round((total_revenue - lag(total_revenue, 7) over (order by order_date)) * 100.0D
        / nullif(lag(total_revenue, 7) over (order by order_date), 0), 2)
        as revenue_growth_vs_week_ago_pct,
    current_timestamp() as _updated_at
from rated
order by order_date desc

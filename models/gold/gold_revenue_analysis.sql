{{ config(materialized='table', tags=['daily', 'revenue', 'finance']) }}

-- Gold revenue analysis: monthly aggregates over completed orders
-- (F3/F4, A4-A5), the manual CASE pivot over successful payments — with
-- digital_wallet deliberately absent from the output columns (faithful
-- quirk, SURVEY.md §7.4.5) — MoM/YoY lag windows (W9-W12), YTD
-- partitioned running sums (W13), final ordering (O2). Exact-cents
-- money sums; 'D'-suffixed double literals. SQL twin of
-- graft.gold.Gold.revenueAnalysisFrom
-- (reference: models/gold/gold_revenue_analysis.sql).

with orders as (
    select * from {{ ref('silver_orders') }} where is_completed
),

payments as (
    select * from {{ ref('silver_payments') }} where is_successful_payment
),

monthly_orders as (
    select
        order_year,
        order_month,
        order_year_month,
        order_quarter,
        order_year_quarter,
        count(distinct order_key) as total_orders,
        count(distinct customer_key) as unique_customers,
        sum(cast(round(order_amount * 100) as bigint)) / 100.0D as total_revenue,
        sum(cast(round(order_amount * 100) as bigint)) / 100.0D
            / count(order_amount) as avg_order_value,
        max(order_amount) as max_order_value,
        min(order_amount) as min_order_value
    from orders
    group by order_year, order_month, order_year_month,
             order_quarter, order_year_quarter
),

monthly_payment_methods as (
    select
        date_format(o.order_date, 'yyyy-MM') as order_year_month,
        p.payment_method,
        count(distinct p.payment_key) as payment_count,
        sum(cast(round(p.payment_amount * 100) as bigint)) / 100.0D as payment_amount
    from payments p
    join orders o on p.order_key = o.order_key
    group by date_format(o.order_date, 'yyyy-MM'), p.payment_method
),

payment_pivot as (
    select
        order_year_month,
        sum(case when payment_method = 'credit_card'
            then cast(round(payment_amount * 100) as bigint) else 0L end) / 100.0D
            as credit_card_revenue,
        sum(case when payment_method = 'bank_transfer'
            then cast(round(payment_amount * 100) as bigint) else 0L end) / 100.0D
            as bank_transfer_revenue,
        sum(case when payment_method = 'paypal'
            then cast(round(payment_amount * 100) as bigint) else 0L end) / 100.0D
            as paypal_revenue,
        sum(case when payment_method = 'cash'
            then cast(round(payment_amount * 100) as bigint) else 0L end) / 100.0D
            as cash_revenue,
        sum(case when payment_method = 'other'
            then cast(round(payment_amount * 100) as bigint) else 0L end) / 100.0D
            as other_revenue
    from monthly_payment_methods
    group by order_year_month
),

windowed as (
    select
        *,
        round(total_orders * 1.0D / nullif(unique_customers, 0), 2)
            as orders_per_customer,
        lag(total_revenue, 1) over (order by order_year_month) as prev_month_revenue,
        lag(total_revenue, 12) over (order by order_year_month) as year_ago_revenue,
        lag(total_orders, 1) over (order by order_year_month) as prev_month_orders,
        round((total_revenue - lag(total_revenue, 1) over (order by order_year_month))
            * 100.0D / nullif(lag(total_revenue, 1) over (order by order_year_month), 0), 2)
            as revenue_growth_mom_pct,
        round((total_orders - lag(total_orders, 1) over (order by order_year_month))
            * 100.0D / nullif(lag(total_orders, 1) over (order by order_year_month), 0), 2)
            as orders_growth_mom_pct,
        round((total_revenue - lag(total_revenue, 12) over (order by order_year_month))
            * 100.0D / nullif(lag(total_revenue, 12) over (order by order_year_month), 0), 2)
            as revenue_growth_yoy_pct,
        sum(cast(round(total_revenue * 100) as bigint)) over (
            partition by order_year order by order_month
            rows between unbounded preceding and current row
        ) / 100.0D as ytd_revenue,
        sum(total_orders) over (
            partition by order_year order by order_month
            rows between unbounded preceding and current row
        ) as ytd_orders
    from monthly_orders
)

select
    w.order_year_month,
    w.order_year,
    w.order_month,
    w.order_quarter,
    w.order_year_quarter,
    w.total_orders,
    w.unique_customers,
    w.total_revenue,
    w.avg_order_value,
    w.max_order_value,
    w.min_order_value,
    w.orders_per_customer,
    w.prev_month_revenue,
    w.year_ago_revenue,
    w.prev_month_orders,
    w.revenue_growth_mom_pct,
    w.orders_growth_mom_pct,
    w.revenue_growth_yoy_pct,
    w.ytd_revenue,
    w.ytd_orders,
    p.credit_card_revenue,
    p.bank_transfer_revenue,
    p.paypal_revenue,
    p.cash_revenue,
    p.other_revenue,
    current_timestamp() as _updated_at
from windowed w
left join payment_pivot p on w.order_year_month = p.order_year_month
order by w.order_year_month desc

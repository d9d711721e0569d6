{{ config(materialized='table', tags=['daily', 'orders']) }}

-- Silver orders: inner join to silver customers (J1), status-synonym
-- normalization (C6), boolean flags, date parts (C10-C13), the
-- amount/date validity filter (F2), and the quality flag. SQL-authored
-- twin of graft.silver.Silver.ordersFrom
-- (reference: models/silver/silver_orders.sql:20-103).

with o as (
    select * from {{ ref('bronze_orders') }}
),

c as (
    select customer_key, customer_id from {{ ref('silver_customers') }}
)

select
    {{ dbt_utils.generate_surrogate_key(['o.order_id']) }} as order_key,
    c.customer_key,
    o.order_id,
    o.customer_id,
    o.order_date,
    case
        when lower(o.order_status) in ('completed', 'complete', 'success', 'delivered')
            then 'completed'
        when lower(o.order_status) in ('pending', 'processing', 'in_progress')
            then 'pending'
        when lower(o.order_status) in ('cancelled', 'canceled', 'failed', 'returned')
            then 'cancelled'
        else 'unknown'
    end as order_status,
    case when lower(o.order_status) in ('completed', 'complete', 'success', 'delivered')
        then true else false end as is_completed,
    case when lower(o.order_status) in ('cancelled', 'canceled', 'failed', 'returned')
        then true else false end as is_cancelled,
    case when lower(o.order_status) in ('pending', 'processing', 'in_progress')
        then true else false end as is_pending,
    o.order_amount,
    year(o.order_date) as order_year,
    month(o.order_date) as order_month,
    day(o.order_date) as order_day,
    quarter(o.order_date) as order_quarter,
    -- Snowflake dayname() is 3-letter; Spark pattern 'EEE' (C11); 'yyyy'
    -- not week-year 'YYYY' (C12); 'YYYY-Q' has no single pattern (C13)
    date_format(o.order_date, 'EEE') as order_day_name,
    date_format(o.order_date, 'yyyy-MM') as order_year_month,
    concat(cast(year(o.order_date) as string), '-',
           cast(quarter(o.order_date) as string)) as order_year_quarter,
    o._loaded_at,
    current_timestamp() as _updated_at,
    case
        when o.order_amount <= 0 then 1
        when o.order_date is null then 1
        when c.customer_key is null then 1
        else 0
    end as _has_data_quality_issues
from o
join c on o.customer_id = c.customer_id
where o.order_amount > 0
  and o.order_date is not null

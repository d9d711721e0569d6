{{ config(materialized='table', tags=['daily', 'payments']) }}

-- Silver payments: inner join to silver orders (J2), payment-method
-- synonym normalization, success/failure flags, size buckets, quality
-- flag — no WHERE beyond the join: bad amounts/dates are kept and only
-- flagged (SURVEY.md §2.3). SQL-authored twin of
-- graft.silver.Silver.paymentsFrom
-- (reference: models/silver/silver_payments.sql:20-93).

with p as (
    select * from {{ ref('bronze_payments') }}
),

o as (
    select order_key, order_id from {{ ref('silver_orders') }}
)

select
    {{ dbt_utils.generate_surrogate_key(['p.payment_id']) }} as payment_key,
    o.order_key,
    p.payment_id,
    p.order_id,
    case
        when lower(p.payment_method) in
            ('credit_card', 'credit card', 'cc', 'visa', 'mastercard', 'amex')
            then 'credit_card'
        when lower(p.payment_method) in
            ('bank_transfer', 'bank transfer', 'wire', 'ach', 'direct_debit')
            then 'bank_transfer'
        when lower(p.payment_method) in ('paypal', 'pp') then 'paypal'
        when lower(p.payment_method) in ('cash', 'cash on delivery', 'cod')
            then 'cash'
        when lower(p.payment_method) in ('apple_pay', 'google_pay', 'digital_wallet')
            then 'digital_wallet'
        else 'other'
    end as payment_method,
    p.payment_amount,
    p.payment_date,
    case when p.payment_amount > 0 then true else false end as is_successful_payment,
    case when p.payment_amount <= 0 then true else false end as is_failed_payment,
    case
        when p.payment_amount < 50 then 'small'
        when p.payment_amount < 200 then 'medium'
        when p.payment_amount < 500 then 'large'
        else 'very_large'
    end as payment_size_category,
    p._loaded_at,
    current_timestamp() as _updated_at,
    case
        when p.payment_amount <= 0 then 1
        when p.payment_date is null then 1
        when o.order_key is null then 1
        else 0
    end as _has_data_quality_issues
from p
join o on p.order_id = o.order_id

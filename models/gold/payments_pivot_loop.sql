-- Engine-surface demo model (no reference twin): the dbt
-- loop-generated-columns idiom — a payment-method pivot whose CASE
-- columns come from a Jinja for-loop over a set-bound list instead of
-- being written out by hand. RegistrySpec pins the materialized table
-- bit-equal to the code-authored ops/Analytics.paymentMethodPivot
-- (Spark's native .pivot over the same method list), so the rendered
-- loop and the native relational pivot are provably the same query.
{{ config(materialized='table') }}

{%- set methods = ['credit_card', 'bank_transfer', 'paypal', 'cash', 'digital_wallet', 'other'] %}

SELECT
    o.order_year_month,
    {%- for m in methods %}
    coalesce(sum(CAST(round(CASE WHEN p.payment_method = '{{ m }}'
        THEN p.payment_amount END * 100) AS BIGINT)) / CAST(100.0 AS DOUBLE),
      CAST(0.0 AS DOUBLE))
      AS {{ m }}{% if not loop.last %},{% endif %}
    {%- endfor %}
FROM {{ ref('silver_payments') }} p
JOIN {{ ref('silver_orders') }} o ON p.order_key = o.order_key
WHERE p.is_successful_payment
GROUP BY o.order_year_month

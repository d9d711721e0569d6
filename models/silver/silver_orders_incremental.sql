-- Engine-surface demo model (no reference twin: the reference project
-- declares only view/table models — its dbt_project.yml materialization
-- surface — so this file exercises the materialization dbt users lean
-- on most). An incremental merge model gated by an is_incremental()
-- block with a high-water-mark subquery against the target itself:
-- redelivered old rows are cut, rows newer than the target's
-- max(order_date) and restatements (status 'restated' — a value outside
-- the feed's natural domain) flow into the merge. RegistrySpec replays
-- it over a split feed and pins the materialized table bit-equal to the
-- code-authored pipeline/Incremental.merge transform.
{{ config(materialized='incremental', unique_key='order_id') }}

SELECT
    order_id,
    customer_id,
    order_date,
    order_status,
    order_amount
FROM {{ ref('bronze_orders') }}
{% if is_incremental() %}
WHERE order_date > (SELECT max(order_date) FROM {{ this }})
   OR order_status = 'restated'
{% endif %}

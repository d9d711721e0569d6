-- Engine-surface demo model (no reference twin: the reference project
-- declares only view/table models). dbt's insert_overwrite incremental
-- strategy: the table is partitioned by order month, and a run replaces
-- exactly the months its batch recomputes — rows absent from the
-- recompute VANISH from those months (here: cancelled orders dropped by
-- the re-run), while every other month is untouched on disk
-- (TableSink.overwritePartitions writes only the batch's partition
-- directories). RegistrySpec replays a split feed and pins the
-- materialized table bit-equal to the code-authored
-- pipeline/Incremental.insertOverwrite transform.
{{ config(materialized='incremental', incremental_strategy='insert_overwrite',
          partition_by='order_month') }}

SELECT
    order_id,
    customer_id,
    order_date,
    order_status,
    order_amount,
    substr(cast(order_date as string), 1, 7) AS order_month
FROM {{ ref('bronze_orders') }}
{% if is_incremental() %}
WHERE order_date >= DATE '2001-06-01'
  AND order_status <> 'cancelled'
{% endif %}

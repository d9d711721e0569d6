-- Engine-surface demo model (no reference twin): dbt 1.9's microbatch
-- incremental strategy. The daily order rollup is processed in monthly
-- event-time periods: each run recomputes the months from
-- max(period) - lookback on and replaces exactly those months'
-- partitions (the engine stamps the period into the _batch DATE column
-- and partitions by it), so late-arriving orders inside the lookback
-- window land on refresh while older restatements wait for a backfill
-- of their period — dbt's contract for the strategy. begin bounds the
-- processed history like dbt's required begin config.
{{ config(materialized='incremental', incremental_strategy='microbatch',
          event_time='order_date', batch_size='month', lookback=1,
          begin='1995-01-01') }}

SELECT
    order_date,
    count(*) AS n_orders,
    sum(cast(round(order_amount * 100) as bigint)) / 100.0 AS order_total
FROM {{ ref('bronze_orders') }}
WHERE order_date IS NOT NULL
GROUP BY order_date

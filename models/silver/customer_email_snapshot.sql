-- Engine-surface demo model (no reference twin: the reference keeps an
-- empty snapshots/ directory — the declared intent this file
-- completes). A dbt check-strategy snapshot over the customer email:
-- each run closes changed versions at the run instant and opens new
-- ones (SCD2). RegistrySpec replays a two-day feed through two
-- Registry.run calls and pins the result bit-equal to the
-- code-authored pipeline/Incremental.Scd2 twin
-- (IncrementalQueries.scd2Snapshot).
{{ config(materialized='snapshot', unique_key='customer_id', strategy='check', check_cols=['email']) }}

SELECT
    customer_id,
    email
FROM {{ ref('bronze_customers') }}

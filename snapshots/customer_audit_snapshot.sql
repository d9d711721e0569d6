-- dbt snapshot-block authoring: the reference keeps an empty snapshots/
-- directory (/root/reference/snapshots/); this file completes the
-- declared intent in dbt's native form — a snapshot block wrapping the
-- select, timestamp strategy keyed on the source's own audit column,
-- with hard-delete invalidation. RegistrySpec replays a two-day feed
-- (changes, a ghost change, deletions) through two Registry.run calls
-- and pins the table bit-equal to the code-authored
-- Scd2.advanceTimestamp + invalidateHardDeletes twin.
{% snapshot customer_audit_snapshot %}
{{ config(unique_key='customer_id', strategy='timestamp',
          updated_at='updated_at', invalidate_hard_deletes=true) }}

SELECT
    customer_id,
    email,
    created_at AS updated_at
FROM {{ ref('bronze_customers') }}
{% endsnapshot %}

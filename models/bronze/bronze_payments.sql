{{ config(materialized='view', tags=['daily', 'payments']) }}

-- Bronze payments: rename-projection plus ingest audit columns.
-- SQL-authored twin of graft.bronze.Bronze.payments
-- (reference: models/bronze/bronze_payments.sql:22-43).

select
    id as payment_id,
    order_id,
    payment_method,
    amount as payment_amount,
    payment_date,
    current_timestamp() as _loaded_at,
    'bronze_payments' as _source_model
from {{ source('raw_ecommerce', 'raw_payments') }}

{{ config(materialized='view', tags=['daily', 'orders']) }}

-- Bronze orders: rename-projection preserving the upstream _loaded_at
-- (the reference deliberately does NOT restamp orders at ingest —
-- models/bronze/bronze_orders.sql:38, SURVEY.md §1.6). SQL-authored twin
-- of graft.bronze.Bronze.orders.

select
    id as order_id,
    user_id as customer_id,
    order_date,
    status as order_status,
    amount as order_amount,
    _loaded_at,
    'bronze_orders' as _source_model
from {{ source('raw_ecommerce', 'raw_orders') }}

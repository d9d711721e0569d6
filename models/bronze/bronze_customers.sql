{{ config(materialized='view', tags=['daily', 'customers']) }}

-- Bronze customers: rename-projection over the raw feed plus ingest
-- audit columns. SQL-authored twin of graft.bronze.Bronze.customers
-- (reference: models/bronze/bronze_customers.sql:21-40).

select
    id as customer_id,
    first_name,
    last_name,
    email,
    created_at,
    current_timestamp() as _loaded_at,
    'bronze_customers' as _source_model
from {{ source('raw_ecommerce', 'raw_customers') }}

{{ config(materialized='table', tags=['daily', 'customers']) }}

-- Silver customers: validity + email-shape filter, name/email cleanup,
-- surrogate key, quality flag computed on the pre-clean columns AFTER
-- the WHERE (faithfully near-vacuous — SURVEY.md §2.3 F1). SQL-authored
-- twin of graft.silver.Silver.customersFrom
-- (reference: models/silver/silver_customers.sql:20-66).

with b as (
    select * from {{ ref('bronze_customers') }}
    where email is not null
      and first_name is not null
      and last_name is not null
      and email like '%@%.%'
)

select
    {{ dbt_utils.generate_surrogate_key(['customer_id']) }} as customer_key,
    customer_id,
    initcap(trim(first_name)) as first_name,
    initcap(trim(last_name)) as last_name,
    concat(initcap(trim(first_name)), ' ', initcap(trim(last_name))) as full_name,
    lower(trim(email)) as email,
    created_at,
    _loaded_at,
    current_timestamp() as _updated_at,
    case
        when first_name is null then 1
        when last_name is null then 1
        when email is null then 1
        when email not like '%@%.%' then 1
        else 0
    end as _has_data_quality_issues
from b

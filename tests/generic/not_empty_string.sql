-- Custom generic test in the LEGACY macro spelling (a plain macro with
-- the test_ name prefix): dbt accepts both; the loader resolves YAML
-- `- not_empty_string` to the macro test_not_empty_string regardless of
-- which form defined it.
{% macro test_not_empty_string(model, column_name) %}
select *
from {{ model }}
where {{ column_name }} is not null and trim({{ column_name }}) = ''
{% endmacro %}

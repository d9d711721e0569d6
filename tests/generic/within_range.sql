-- Custom GENERIC test in dbt's modern block form: a "test"/"endtest"
-- block desugars to a macro named test_within_range (exactly as dbt
-- compiles it) and is referenced from schema YAML as
--   data_tests:
--     - within_range: {min_value: 0, max_value: N}
-- The body SELECTs VIOLATING rows; the engine counts them into
-- dq_summary / dq_statuses beside the four built-in generic tests.
{% test within_range(model, column_name, min_value, max_value) %}
select *
from {{ model }}
where {{ column_name }} is not null
  and ({{ column_name }} < {{ min_value }} or {{ column_name }} > {{ max_value }})
{% endtest %}

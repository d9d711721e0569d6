-- MODEL-LEVEL custom generic test: declared under the model's own
-- data_tests (no column), so the macro receives only `model` + kwargs —
-- dbt's calling convention for entity-scoped tests. Violating-rows
-- form: emits one row when the table is smaller than n, else none.
{% test at_least_n_rows(model, n) %}
select c as n_rows
from (select count(*) as c from {{ model }})
where c < {{ n }}
{% endtest %}

-- Re-expression of the reference project's
-- macros/generate_database_name.sql (MIT-licensed): a custom database
-- name routes through trim | upper, otherwise the target default
-- applies. Loaded by graft.pipeline.Macros; Registry.databaseName
-- resolves database routing through THIS file (RegistrySpec also loads
-- the reference's own file as-is and pins identical behavior).
{% macro generate_database_name(custom_database_name=none, node=none) -%}
    {%- set default_database = target.database -%}
    {%- if custom_database_name is none -%}
        {{ default_database }}
    {%- else -%}
        {{ custom_database_name | trim | upper }}
    {%- endif -%}
{%- endmacro %}

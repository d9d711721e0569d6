package graft

import java.io.File
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Macros, Registry, SqlModels}

/** Macro-file loading: database routing must come from the loaded
  * `macros/generate_database_name.sql` (with the reference project's own
  * file as the behavioral fixture, loaded as-is), and user macros must
  * expand at SQL-model call sites. Driver-side string work only — no
  * SparkSession. */
class MacrosSpec extends AnyFunSuite {

  test("Registry.databaseName routes through the checked-in macro file") {
    assert(Macros.default.contains("generate_database_name"),
      "macros/generate_database_name.sql must load into the default library")
    assert(Registry.databaseName(Some("silver"), "analytics") == "SILVER")
    assert(Registry.databaseName(Some("  spaced  "), "analytics") == "SPACED")
    assert(Registry.databaseName(None, "analytics") == "analytics")
  }

  test("the reference's own macro file loads as-is and routes identically") {
    val ref = new File("/root/reference/macros/generate_database_name.sql")
    assume(ref.isFile, "reference checkout not present")
    val lib = Macros.load(Seq(ref))
    def route(custom: Option[String], dflt: String) =
      lib.call("generate_database_name", Seq(custom.orNull),
        Map("target" -> Map("database" -> dflt))).trim
    assert(route(Some("silver"), "analytics") == "SILVER")
    assert(route(Some("  spaced  "), "analytics") == "SPACED")
    assert(route(None, "analytics") == "analytics")
    // and the checked-in file is behaviorally identical to it
    assert(route(Some("x"), "d") == Registry.databaseName(Some("x"), "d"))
    assert(route(None, "d") == Registry.databaseName(None, "d"))
  }

  test("user macros expand at SQL-model call sites; a ref() inside a " +
      "macro body becomes a DAG edge") {
    val lib = Macros.load(Seq.empty) // start empty, then parse inline
    assert(!lib.contains("cents"))
    val parsed = new Macros.Library(Macros.parse(
      """{% macro cents(c) -%}CAST(round({{ c }} * 100) AS BIGINT){%- endmacro %}
        |{% macro order_src() -%}{{ ref('bronze_orders') }}{%- endmacro %}
        |""".stripMargin).map(d => d.name -> d).toMap)
    val r = SqlModels.render("m", "silver",
      """SELECT order_id, {{ cents('order_amount') }} AS amount_cents
        |FROM {{ order_src() }}""".stripMargin, parsed)
    assert(r.sql ==
      "SELECT order_id, CAST(round(order_amount * 100) AS BIGINT) AS amount_cents\nFROM bronze_orders")
    assert(r.deps == Seq("bronze_orders"),
      "the ref() spliced by the macro body must register as a dependency")
  }

  test("target-conditional model SQL renders by the active profile") {
    def rendered = SqlModels.render("env_split", "silver",
      """SELECT * FROM {{ ref('m') }}
        |{% if target.name == 'dev' %}LIMIT 100{% endif %}""".stripMargin).sql
    assert(rendered.endsWith("LIMIT 100"),
      "the default profile is dev — the dev arm must render")
    System.setProperty("graft.target.name", "prod")
    try assert(!rendered.contains("LIMIT 100"),
      "-Dgraft.target.name=prod must drop the dev-only arm")
    finally System.clearProperty("graft.target.name")
  }

  test("outside-the-subset constructs fail loudly, not silently") {
    val lib = new Macros.Library(Macros.parse(
      "{% macro bad() %}{% while true %}x{% endwhile %}{% endmacro %}")
      .map(d => d.name -> d).toMap)
    intercept[IllegalArgumentException](lib.call("bad", Seq.empty))
    val lib2 = new Macros.Library(Macros.parse(
      "{% macro f(v) %}{{ v | sha256 }}{% endmacro %}")
      .map(d => d.name -> d).toMap)
    intercept[IllegalArgumentException](lib2.call("f", Seq("x")))
    // an unbound for-loop iterable is an error, not an empty render
    val lib3 = new Macros.Library(Macros.parse(
      "{% macro g() %}{% for x in nowhere %}{{ x }}{% endfor %}{% endmacro %}")
      .map(d => d.name -> d).toMap)
    intercept[IllegalArgumentException](lib3.call("g", Seq.empty))
  }

  test("for-loops: loop.first/last/index, set lists, nesting, elif") {
    val lib = new Macros.Library(Macros.parse(
      """{% macro in_list(col) -%}
        |{%- set vals = ['a', 'b', 'c'] -%}
        |{{ col }} IN ({% for v in vals %}'{{ v }}'{% if not loop.last %}, {% endif %}{% endfor %})
        |{%- endmacro %}
        |{% macro grade(n) -%}
        |{%- if n == 1 -%}one{%- elif n == 2 -%}two{%- else -%}many{%- endif -%}
        |{%- endmacro %}
        |{% macro idx() -%}
        |{% for v in ['x', 'y'] %}{{ loop.index }}:{{ v }};{% endfor %}
        |{%- endmacro %}""".stripMargin).map(d => d.name -> d).toMap)
    assert(lib.call("in_list", Seq("m")).trim == "m IN ('a', 'b', 'c')")
    assert(lib.call("grade", Seq(1)).trim == "one")
    assert(lib.call("grade", Seq(2)).trim == "two")
    assert(lib.call("grade", Seq(9)).trim == "many")
    assert(lib.call("idx", Seq.empty).trim == "1:x;2:y;")
  }

  test("call-site args: kwargs bind by name, quoted commas stay one arg, " +
      "bare identifiers fail loudly instead of splicing their name") {
    val lib = new Macros.Library(Macros.parse(
      "{% macro pair(a, b='dflt') %}[{{ a }}|{{ b }}]{% endmacro %}")
      .map(d => d.name -> d).toMap)
    assert(lib.expandIn("{{ pair('x') }}") == "[x|dflt]")
    assert(lib.expandIn("{{ pair('x', b='y') }}") == "[x|y]")
    assert(lib.expandIn("{{ pair(b='y', a='x') }}") == "[x|y]")
    // a comma inside a quoted arg belongs to the value
    assert(lib.expandIn("{{ pair('x, still x') }}") == "[x, still x|dflt]")
    // a bare identifier is an unbound variable at expansion time — the
    // silent wrong-SQL mode this guards was {{ pair(c) }} in a for-loop
    // splicing the literal name 'c'
    val e = intercept[IllegalArgumentException](lib.expandIn("{{ pair(c) }}"))
    assert(e.getMessage.contains("not a literal"))
    intercept[IllegalArgumentException](
      lib.expandIn("{{ pair(b='y', nope='z') }}"))
    intercept[IllegalArgumentException](
      lib.expandIn("{{ pair('x', a='clash') }}"))
  }

  test("Jinja truthiness: 0 and empty lists are falsy — the " +
      "loop.index0 comma-separator idiom renders correctly") {
    val lib = new Macros.Library(Macros.parse(
      """{% macro csv() -%}
        |{%- for c in ['a', 'b', 'c'] %}{% if loop.index0 %}, {% endif %}{{ c }}{%- endfor -%}
        |{%- endmacro %}""".stripMargin).map(d => d.name -> d).toMap)
    assert(lib.call("csv", Seq.empty).trim == "a, b, c",
      "index0 = 0 on the first iteration must be falsy (no leading comma)")
  }

  test("is_incremental(): bound per render phase, nests with other " +
      "blocks, errors outside a model render") {
    val sql =
      """{{ config(materialized='incremental', unique_key='order_id') }}
        |SELECT order_id FROM {{ ref('bronze_orders') }}
        |{% if is_incremental() %}
        |WHERE order_id > (SELECT max(order_id) FROM {{ this }})
        |{% if target.name == 'prod' %} AND strict = 1{% else %} AND lax = 1{% endif %}
        |{% endif %}""".stripMargin
    val r = SqlModels.render("nested_inc", "silver", sql,
      macroLib = new Macros.Library(Map.empty))
    // first-run variant: the whole outer block (inner included) drops
    assert(!r.sql.contains("WHERE") && !r.sql.contains("lax"))
    // incremental variant keeps the block and resolves the INNER if
    // (target defaults to dev → the else arm)
    val inc = r.sqlIncremental.get
    assert(inc.contains("max(order_id)") && inc.contains("lax = 1") &&
      !inc.contains("strict"))
    // outside a model render there is no phase to bind — loud error
    val lib = new Macros.Library(Macros.parse(
      "{% macro m() %}{% if is_incremental() %}x{% endif %}{% endmacro %}")
      .map(d => d.name -> d).toMap)
    intercept[IllegalArgumentException](lib.call("m", Seq.empty))
  }

  test("config keys inside quoted hook strings are NOT the model's " +
      "config; bare {{ target.name }} renders without any {% block") {
    val r = SqlModels.render("hooky", "silver",
      """{{ config(materialized='table', post_hook="UPDATE audit SET enabled=false WHERE alias='x'") }}
        |SELECT '{{ target.name }}' AS env, 1 AS n""".stripMargin,
      macroLib = new Macros.Library(Map.empty))
    assert(r.enabled, "enabled=false inside a hook string is hook text")
    assert(r.alias.isEmpty, "alias='x' inside a hook string is hook text")
    assert(r.postHooks == Seq("UPDATE audit SET enabled=false WHERE alias='x'"))
    assert(r.sql.contains("'dev' AS env"),
      s"bare {{ target.name }} interpolation must render: ${r.sql}")
  }

  test("a ref() in a Jinja-pruned branch is not a DAG edge") {
    val r = SqlModels.render("pruned", "gold",
      """{{ config(materialized='view') }}
        |{% if target.name == 'prod' %}SELECT * FROM {{ ref('prod_only') }}
        |{% else %}SELECT * FROM {{ ref('bronze_orders') }}{% endif %}""".stripMargin,
      macroLib = new Macros.Library(Map.empty))
    assert(r.deps == Seq("bronze_orders"),
      s"dev render must not depend on the pruned prod-only ref: ${r.deps}")
  }

  test("enabled=false exempts a model from compilation entirely; " +
      "duplicate relations fail the load") {
    import java.nio.file.Files
    val root = Files.createTempDirectory("graft_models").toFile
    val silver = new File(root, "silver"); silver.mkdirs()
    def write(name: String, text: String): Unit =
      Files.write(new File(silver, name).toPath,
        text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // a disabled model with an invalid body (unknown source) must not
    // abort the load — dbt's escape hatch for not-yet-valid models
    write("broken_but_off.sql",
      "{{ config(materialized='view', enabled=false) }}\n" +
        "SELECT * FROM {{ source('new_system', 'tbl') }}")
    write("ok.sql",
      "{{ config(materialized='view') }}\nSELECT 1 AS x")
    val loaded = SqlModels.load(root, macroLib = new Macros.Library(Map.empty))
    assert(loaded.map(_.name) == Seq("ok"))
    // two models materializing the same relation (alias collision) fail
    write("ok2.sql",
      "{{ config(materialized='view', alias='ok') }}\nSELECT 2 AS x")
    val e = intercept[IllegalArgumentException](
      SqlModels.load(root, macroLib = new Macros.Library(Map.empty)))
    assert(e.getMessage.contains("same relation"))
  }
}

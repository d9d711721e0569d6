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
}

package graft

import java.io.File
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Macros, ProjectYaml, Registry, SqlModels}

/** dbt_project.yml loading: per-layer materialization/tag defaults and
  * `var()` resolution — with the reference project's own file as the
  * as-is fixture. Driver-side parsing only. */
class ProjectYamlSpec extends AnyFunSuite {

  private val expectedLayers = Map(
    "bronze" -> ProjectYaml.LayerDefaults(Some("view"), Some("bronze"), Seq("bronze")),
    "silver" -> ProjectYaml.LayerDefaults(Some("table"), Some("silver"), Seq("silver")),
    "gold" -> ProjectYaml.LayerDefaults(Some("table"), Some("gold"), Seq("gold")))

  test("the reference's own dbt_project.yml loads as-is") {
    val ref = new File("/root/reference/dbt_project.yml")
    assume(ref.isFile, "reference checkout not present")
    val p = ProjectYaml.load(ref)
    assert(p.name == "ecommerce_analytics")
    assert(p.layers == expectedLayers)
  }

  test("the checked-in project file declares the same layer defaults") {
    val p = ProjectYaml.load(new File("dbt_project.yml"))
    assert(p.name == "ecommerce_analytics")
    assert(p.layers == expectedLayers)
    // and it is what the engine loads by default
    assert(ProjectYaml.default.layers == expectedLayers)
  }

  test("a config-less model file materializes by its layer default " +
      "(model-file config wins when present)") {
    val lib = Macros.load(Seq.empty)
    val p = ProjectYaml.load(new File("dbt_project.yml"))
    val bare = SqlModels.render("m", "silver",
      "SELECT 1 AS x FROM {{ ref('bronze_orders') }}", lib, p)
    assert(bare.materialization == Registry.Table,
      "silver's +materialized: table default must apply")
    assert(bare.tags == Seq("silver"))
    val explicit = SqlModels.render("m", "silver",
      "{{ config(materialized='view', tags=['x']) }}\n" +
        "SELECT 1 AS x FROM {{ ref('bronze_orders') }}", lib, p)
    assert(explicit.materialization == Registry.View,
      "the model file's own config must win over the project default")
    assert(explicit.tags == Seq("silver", "x"),
      "project layer tags merge with model tags, dbt's additive +tags")
  }

  test("var() renders from project vars, falls back to the call-site " +
      "default, and fails loudly when neither exists") {
    val lib = Macros.load(Seq.empty)
    val p = ProjectYaml.parse(
      """name: t
        |vars:
        |  cutoff: '2001-01-01'
        |""".stripMargin)
    val r = SqlModels.render("m", "silver",
      "SELECT * FROM {{ ref('bronze_orders') }} " +
        "WHERE order_date >= DATE '{{ var('cutoff') }}' " +
        "AND order_status != '{{ var('missing', 'unknown') }}'", lib, p)
    assert(r.sql.contains("DATE '2001-01-01'"))
    assert(r.sql.contains("!= 'unknown'"))
    intercept[IllegalArgumentException](SqlModels.render("m", "silver",
      "SELECT '{{ var('nope') }}' AS x FROM {{ ref('bronze_orders') }}",
      lib, p))
  }

  test("unquoted YAML date vars render ISO; list/map vars fail loudly") {
    val p = ProjectYaml.parse(
      """name: t
        |vars:
        |  cutoff: 2021-06-01
        |  n: 7
        |""".stripMargin)
    assert(p.vars("cutoff") == "2021-06-01",
      "SnakeYAML's java.util.Date must render as dbt's ISO form, " +
        "not 'Tue Jun 01 ...'")
    assert(p.vars("n") == "7")
    intercept[IllegalArgumentException](ProjectYaml.parse(
      "name: t\nvars:\n  bad: [1, 2]\n"))
  }

  test("project-wide '+' defaults apply to layers without their own " +
      "block (dbt's models: <project>: +materialized)") {
    val p = ProjectYaml.parse(
      """name: t
        |models:
        |  t:
        |    +materialized: table
        |    +tags: ['all']
        |    silver:
        |      +materialized: view
        |""".stripMargin)
    assert(p.layer("gold").materialized.contains("table"),
      "a layer without its own block takes the project-wide default")
    assert(p.layer("gold").tags == Seq("all"))
    assert(p.layer("silver").materialized.contains("view"),
      "a layer's own block wins over the project-wide default")
    assert(p.layer("silver").tags == Seq("all"))
  }
}

package graft

import java.io.File
import org.scalatest.funsuite.AnyFunSuite

import graft.quality.{DataQuality, SchemaYaml}
import graft.quality.DataQuality.TableChecks

/** The YAML schema-test loader: the checked-in YAML files
  * must reproduce the round-8 hand-ported inventory check for check
  * (so `dq_summary`/`dq_failures` hashes cannot move), and the
  * REFERENCE project's own YAML files must load as-is to the same
  * inventory — the drop-in proof. No SparkSession needed: loading is
  * pure driver-side parsing. */
class SchemaYamlSpec extends AnyFunSuite {

  /** The pre-loader hand-ported inventory (bronze.yml:16-96, silver.yml,
    * gold.yml line-for-line) — now the EXPECTATION the loader must hit. */
  private val expectedInventory: Seq[TableChecks] = Seq(
    TableChecks("raw_customers", Seq("id", "email"),
      Seq("id", "first_name", "last_name"), Map.empty),
    TableChecks("raw_orders", Seq("id"), Seq("id", "user_id", "amount"), Map.empty),
    TableChecks("raw_payments", Seq("id"), Seq("id", "order_id", "amount"), Map.empty),
    TableChecks("bronze_customers", Seq("customer_id"), Seq("customer_id"), Map.empty),
    TableChecks("bronze_orders", Seq("order_id"), Seq("order_id"), Map.empty),
    TableChecks("bronze_payments", Seq("payment_id"), Seq("payment_id"), Map.empty),
    TableChecks("silver_customers", Seq("customer_key", "customer_id", "email"),
      Seq("customer_key", "customer_id", "email", "full_name", "first_name", "last_name"),
      Map.empty),
    TableChecks("silver_orders", Seq("order_key"),
      Seq("order_key", "customer_key", "order_amount"),
      Map("order_status" -> Seq("completed", "pending", "cancelled", "unknown"))),
    TableChecks("silver_payments", Seq("payment_key"),
      Seq("payment_key", "order_key"),
      Map("payment_method" -> Seq("credit_card", "bank_transfer", "paypal", "cash", "other"))),
    TableChecks("gold_customer_summary", Seq("customer_key"), Seq("customer_key"), Map.empty),
    TableChecks("gold_order_metrics", Seq.empty, Seq("order_date"), Map.empty),
    TableChecks("gold_revenue_analysis", Seq("order_year_month"), Seq("order_year_month"), Map.empty))

  private val expectedRelationships = Seq(
    ("raw_orders.user_id.relationships", "raw_orders", "user_id", "raw_customers", "id"),
    ("silver_orders.customer_key.relationships", "silver_orders", "customer_key",
      "silver_customers", "customer_key"),
    ("silver_payments.order_key.relationships", "silver_payments", "order_key",
      "silver_orders", "order_key"))

  test("checked-in model YAML files reproduce the hand-ported 47-check inventory") {
    val loaded = SchemaYaml.loadDir(new File("models"))
    assert(loaded.inventory == expectedInventory)
    assert(loaded.relationships == expectedRelationships)
    assert(loaded.freshnessWarnHours.contains(24))
    assert(loaded.freshnessErrorHours.contains(48))
    // 42 generic + 3 relationships (+ 2 singular tests that stay
    // code-side in DataQuality.summary) = the 47-row dq_summary
    val generic = loaded.inventory.map(tc =>
      tc.uniques.size + tc.notNulls.size + tc.accepted.size).sum
    assert(generic == 42)
    assert(generic + loaded.relationships.size + 2 == 47)
  }

  test("DataQuality serves the YAML-loaded inventory and thresholds") {
    assert(DataQuality.inventory == expectedInventory)
    assert(DataQuality.relationshipChecks == expectedRelationships)
    assert(DataQuality.freshnessWarnHours == 24)
    assert(DataQuality.freshnessErrorHours == 48)
  }

  test("the reference project's own YAML files load as-is to the same inventory") {
    val refRoot = new File("/root/reference/models")
    assume(refRoot.isDirectory, "reference checkout not present")
    val loaded = SchemaYaml.loadDir(refRoot)
    assert(loaded.inventory == expectedInventory)
    assert(loaded.relationships == expectedRelationships)
    assert(loaded.freshnessWarnHours.contains(24))
    assert(loaded.freshnessErrorHours.contains(48))
  }

  test("per-test config: severity and thresholds parse on every test form") {
    val loaded = SchemaYaml.parse(Seq(
      """models:
        |  - name: t
        |    columns:
        |      - name: a
        |        tests:
        |          - unique:
        |              config:
        |                severity: warn
        |          - not_null:
        |              config:
        |                error_if: '> 100'
        |                warn_if: '> 5'
        |      - name: b
        |        tests:
        |          - accepted_values:
        |              values: ['x', 'y']
        |              config:
        |                severity: warn
        |                warn_if: '>= 3'
        |          - relationships:
        |              to: ref('p')
        |              field: id
        |              config:
        |                error_if: '> 0'
        |""".stripMargin))
    // map-form unique/not_null still register as checks
    assert(loaded.inventory ==
      Seq(DataQuality.TableChecks("t", Seq("a"), Seq("a"),
        Map("b" -> Seq("x", "y")))))
    assert(loaded.relationships.map(_._1) == Seq("t.b.relationships"))
    assert(loaded.configs == Map(
      "t.a.unique" -> SchemaYaml.TestConfig("warn", "!= 0", "!= 0"),
      "t.a.not_null" -> SchemaYaml.TestConfig("error", "> 5", "> 100"),
      "t.b.accepted_values" -> SchemaYaml.TestConfig("warn", ">= 3", "!= 0"),
      "t.b.relationships" -> SchemaYaml.TestConfig("error", "!= 0", "> 0")))
  }

  test("an explicitly-default config is not recorded; bad configs are rejected") {
    val dflt = SchemaYaml.parse(Seq(
      """models:
        |  - name: t
        |    columns:
        |      - name: a
        |        tests:
        |          - unique:
        |              config:
        |                severity: error
        |""".stripMargin))
    assert(dflt.configs.isEmpty, "explicit dbt defaults == no config")
    intercept[IllegalArgumentException](SchemaYaml.parse(Seq(
      """models:
        |  - name: t
        |    columns:
        |      - name: a
        |        tests:
        |          - unique:
        |              config:
        |                warn_if: 'DROP TABLE x'
        |""".stripMargin)))
    intercept[IllegalArgumentException](SchemaYaml.parse(Seq(
      """models:
        |  - name: t
        |    columns:
        |      - name: a
        |        tests:
        |          - unique:
        |              config:
        |                severity: fatal
        |""".stripMargin)))
  }

  test("the checked-in silver.yml downgrades the digital_wallet quirk to warn") {
    assert(DataQuality.testConfigs ==
      Map("silver_payments.payment_method.accepted_values" ->
        SchemaYaml.TestConfig("warn", "> 10", "!= 0")),
      "exactly one non-default config: the faithful-quirk check")
  }

  test("loader rejects what it cannot faithfully evaluate") {
    // an unknown identifier is now a CUSTOM test (resolved against the
    // macro library at evaluation time), but a non-identifier still
    // fails at parse
    intercept[IllegalArgumentException](SchemaYaml.parse(Seq(
      """models:
        |  - name: t
        |    columns:
        |      - name: c
        |        tests:
        |          - 'exotic test!'
        |""".stripMargin)))
    intercept[IllegalArgumentException](SchemaYaml.parse(Seq(
      """models:
        |  - name: t
        |    columns:
        |      - name: c
        |        tests:
        |          - relationships:
        |              to: just_a_name
        |              field: id
        |""".stripMargin)))
  }

  test("dbt >= 1.8 data_tests: key loads; description-only entities " +
      "contribute no inventory row") {
    val loaded = SchemaYaml.parse(Seq(
      """models:
        |  - name: m1
        |    columns:
        |      - name: a
        |        data_tests:
        |          - unique
        |          - not_null
        |  - name: docs_only
        |    description: nothing declared
        |    columns:
        |      - name: b
        |        description: just documentation
        |""".stripMargin))
    assert(loaded.inventory.map(_.table) == Seq("m1"),
      "a description-only model must not become an empty TableChecks " +
        "row (it would crash the summary's checks.head)")
    assert(loaded.inventory.head.uniques == Seq("a"))
    assert(loaded.inventory.head.notNulls == Seq("a"))
  }

  test("classic source-level freshness form loads; conflicting " +
      "per-source thresholds fail loudly") {
    val classic = SchemaYaml.parse(Seq(
      """sources:
        |  - name: s1
        |    freshness:
        |      warn_after: {count: 6, period: hour}
        |      error_after: {count: 1, period: day}
        |    tables:
        |      - name: t1
        |        columns:
        |          - name: id
        |            tests: [unique]
        |""".stripMargin))
    assert(classic.freshnessWarnHours.contains(6))
    assert(classic.freshnessErrorHours.contains(24))
    assert(classic.freshnessBySource("s1") == ((Some(6), Some(24))))
    val e = intercept[IllegalArgumentException](SchemaYaml.parse(Seq(
      """sources:
        |  - name: s1
        |    freshness:
        |      warn_after: {count: 6, period: hour}
        |  - name: s2
        |    freshness:
        |      warn_after: {count: 2, period: hour}
        |""".stripMargin)))
    assert(e.getMessage.contains("freshness"))
  }

  test("custom generic tests: bare and keyword-arg forms parse with the " +
      "declaring relation; model entities get ref(), source tables get " +
      "source(); config blocks record beside them") {
    val loaded = SchemaYaml.parse(Seq(
      """version: 2
        |sources:
        |  - name: ecommerce
        |    tables:
        |      - name: raw_t
        |        columns:
        |          - name: amt
        |            data_tests:
        |              - my_src_test
        |models:
        |  - name: m1
        |    columns:
        |      - name: v
        |        tests:
        |          - within_range:
        |              min_value: 0
        |              max_value: 10
        |              config:
        |                severity: warn
        |          - not_empty_string
        |""".stripMargin))
    val byName = loaded.customTests.map(ct => ct.checkName -> ct).toMap
    assert(byName.keySet == Set("raw_t.amt.my_src_test",
      "m1.v.within_range", "m1.v.not_empty_string"))
    assert(byName("raw_t.amt.my_src_test").relation ==
      "source('ecommerce', 'raw_t')")
    val wr = byName("m1.v.within_range")
    assert(wr.relation == "ref('m1')")
    assert(wr.args == Map("min_value" -> 0, "max_value" -> 10))
    assert(loaded.configs("m1.v.within_range").severity == "warn")
    assert(byName("m1.v.not_empty_string").args.isEmpty)
    // non-identifier test names still fail loudly at parse
    val bad = intercept[IllegalArgumentException](SchemaYaml.parse(Seq(
      """models:
        |  - name: m1
        |    columns:
        |      - name: v
        |        tests: ['no spaces allowed']
        |""".stripMargin)))
    assert(bad.getMessage.contains("identifier"))
  }

  test("model-level data_tests: entity-scoped custom tests parse with " +
      "empty column and table.test naming; built-ins there are rejected") {
    val loaded = SchemaYaml.parse(Seq(
      """models:
        |  - name: m1
        |    data_tests:
        |      - at_least_n_rows:
        |          n: 5
        |    columns:
        |      - name: v
        |        tests: [unique]
        |""".stripMargin))
    val ct = loaded.customTests.find(_.test == "at_least_n_rows").get
    assert(ct.column.isEmpty && ct.checkName == "m1.at_least_n_rows")
    assert(ct.args == Map("n" -> 5))
    assert(loaded.inventory.head.uniques == Seq("v"),
      "column tests still load beside model-level ones")
    val e = intercept[IllegalArgumentException](SchemaYaml.parse(Seq(
      """models:
        |  - name: m1
        |    data_tests: [unique]
        |""".stripMargin)))
    assert(e.getMessage.contains("column-scoped"))
    // the checked-in model-level test renders with model + kwargs only
    val sql = graft.quality.DataQuality.customTestSql.toMap
      .apply("silver_payments.at_least_n_rows")
    assert(sql.contains("{{ ref('silver_payments') }}") &&
      sql.contains("c < 1") && !sql.contains("column_name"))
  }

  test("custom generic tests render through the macro library into the " +
      "violating-rows SQL dq_summary evaluates (both dbt spellings)") {
    // the checked-in tests/generic/ definitions + silver.yml attachment
    val sqls = graft.quality.DataQuality.customTestSql.toMap
    val wr = sqls("silver_payments.payment_amount.within_range")
    assert(wr.contains("{{ ref('silver_payments') }}"))
    assert(wr.contains("payment_amount < 0") &&
      wr.contains("payment_amount > 1000000"))
    val ne = sqls("silver_payments.payment_method.not_empty_string")
    assert(ne.contains("trim(payment_method) = ''"))
    // oracle twin: bare relation names for the DuckDB prelude CTEs
    assert(graft.quality.SingularTests.resolveBareNames(wr)
      .contains("from silver_payments"))
  }
}

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

  test("loader rejects what it cannot faithfully evaluate") {
    intercept[IllegalArgumentException](SchemaYaml.parse(Seq(
      """models:
        |  - name: t
        |    columns:
        |      - name: c
        |        tests:
        |          - exotic_test
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
}

package graft.quality

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.adapter.RawSources
import graft.oracle.OracleSql

/** The reference's full declared test inventory (SURVEY.md §2.12: every
  * `unique` / `not_null` / `relationships` / `accepted_values` in
  * bronze.yml/silver.yml/gold.yml, plus the two reconstructed singular
  * tests) evaluated in one driver-checkable query: one row per check,
  * `(check_name, violations)`.
  *
  * Both the Spark build and the DuckDB oracle SQL are generated from the
  * single [[inventory]] spec — itself loaded from the checked-in
  * `models/<layer>/<layer>.yml` files ([[SchemaYaml]]) — so the check
  * list cannot drift, and a dbt project's schema.yml drops in as-is.
  *
  * Faithful quirk retained: `silver_payments.payment_method.accepted_values`
  * omits 'digital_wallet' even though the method normalizer produces it
  * (`/root/reference/models/silver/silver.yml:78-79` vs
  * `silver_payments.sql:48`), so that check reports real violations.
  */
object DataQuality {

  final case class TableChecks(
    table: String,
    uniques: Seq[String],
    notNulls: Seq[String],
    accepted: Map[String, Seq[String]])

  /** The loaded schema-YAML declarations — the checked-in
    * `models/<layer>/<layer>.yml` files (re-expressions of the
    * reference's bronze.yml:16-96 / silver.yml / gold.yml), parsed once
    * per JVM by [[SchemaYaml]]. The YAML IS the source of truth: edit a
    * test there and the summary, its oracle, and the freshness
    * thresholds all follow — no hand-ported Scala list to drift
    * (SchemaYamlSpec pins the loaded inventory against the reference
    * project's own YAML files, loaded as-is). */
  private lazy val loaded: SchemaYaml.Loaded =
    SchemaYaml.loadDir(new java.io.File(
      sys.props.getOrElse("graft.models.root", "models")))

  lazy val inventory: Seq[TableChecks] = loaded.inventory

  /** (check_name, child table, fk, parent table, pk). */
  lazy val relationshipChecks: Seq[(String, String, String, String, String)] =
    loaded.relationships

  /** Non-default per-test `config:` blocks from the YAML (dbt severity /
    * warn_if / error_if), keyed by full check name. */
  lazy val testConfigs: Map[String, SchemaYaml.TestConfig] = loaded.configs

  /** Custom (macro-defined) generic tests from the YAML, each resolved
    * against the macro library (`macros/` + `tests/generic/`) and
    * rendered ONCE into the violating-rows SQL both engines evaluate:
    * dbt's `{% test name(model, column_name, …) %}` convention, with
    * `model` bound to the declaring relation's `{{ ref(…) }}` /
    * `{{ source(…) }}` form so the SAME downstream resolution as
    * singular tests applies (Spark temp views over the lazy model
    * chain; bare CTE names in the DuckDB oracle). A name with no
    * `test_<name>` macro fails HERE, loudly — the YAML parser stays
    * resolution-free, matching dbt's parse-then-compile split. */
  lazy val customTestSql: Seq[(String, String)] =
    loaded.customTests.map { ct =>
      val lib = graft.pipeline.Macros.default
      val macroName = s"test_${ct.test}"
      require(lib.contains(macroName),
        s"${ct.checkName}: no macro '$macroName' in macros/ or " +
          "tests/generic/ — custom generic tests must be defined as " +
          "{% test " + ct.test + "(model, column_name, ...) %} or " +
          s"{% macro $macroName(...) %}")
      // model-level tests (empty column) bind only `model` + kwargs —
      // the dbt calling convention for entity-scoped generic tests
      val base = Map[String, Any]("model" -> s"{{ ${ct.relation} }}")
      val named =
        (if (ct.column.isEmpty) base else base + ("column_name" -> ct.column)) ++
          ct.args.map { case (k, v) => k -> (v: Any) }
      ct.checkName -> lib.call(macroName, Seq.empty, Map.empty, named)
    }

  /** dbt's parse-then-compile gate, forced by [[graft.pipeline.Registry.run]]
    * on every run set: every YAML-declared custom test name must resolve
    * to a `test_<name>` macro — dbt surfaces "no matching test macro" at
    * compile on EVERY invocation, so a mistyped built-in ('uniqe', which
    * parses as a CustomTest) must fail loudly on runs that never evaluate
    * a dq check, not lie dormant until [[customTestSql]] is forced. A
    * working directory with no layer YAML (the engine jar running outside
    * a project checkout) has nothing to validate and skips. */
  def validateTestNames(): Unit = {
    val root = new java.io.File(
      sys.props.getOrElse("graft.models.root", "models"))
    val hasYaml = Option(root.listFiles()).getOrElse(Array.empty).exists(d =>
      d.isDirectory && Option(d.listFiles()).getOrElse(Array.empty)
        .exists(f => f.getName.endsWith(".yml") || f.getName.endsWith(".yaml")))
    if (hasYaml) customTestSql.foreach(_ => ())
  }

  /** Source freshness thresholds from the YAML `config.freshness` block
    * (bronze.yml: warn 24h / error 48h), with dbt-default-free fallbacks
    * only if a project declares none. */
  lazy val freshnessWarnHours: Int = loaded.freshnessWarnHours.getOrElse(24)
  lazy val freshnessErrorHours: Int = loaded.freshnessErrorHours.getOrElse(48)

  /** One row per declared test, evaluated over the lazy model chains in
    * one 17-branch union job (single-pass conditional agg per table;
    * Catalyst prunes each branch down to the 1–3 checked columns).
    *
    * Production note: at warehouse scale `dbt test` semantics run these
    * same [[Checks]] against the *materialized* Registry outputs — compact
    * parquet scans instead of re-derived chains. At bench scale the write
    * barrier costs more than the recompute (measured: 12 s materialize vs
    * 6 s lazy end-to-end), so the driver-checked query stays lazy; the
    * materialized path is exercised by RegistrySpec. */
  def summary(spark: SparkSession, dir: String): DataFrame = {
    import Checks._
    val dfs: Map[String, DataFrame] = {
      val sc = graft.silver.Silver.customers(spark, dir)
      val so = graft.silver.Silver.orders(spark, dir)
      val sp = graft.silver.Silver.payments(spark, dir)
      Map(
        "raw_customers" -> RawSources.rawCustomers(spark, dir),
        "raw_orders" -> RawSources.rawOrders(spark, dir),
        "raw_payments" -> RawSources.rawPayments(spark, dir),
        "bronze_customers" -> graft.bronze.Bronze.customers(spark, dir),
        "bronze_orders" -> graft.bronze.Bronze.orders(spark, dir),
        "bronze_payments" -> graft.bronze.Bronze.payments(spark, dir),
        "silver_customers" -> sc,
        "silver_orders" -> so,
        "silver_payments" -> sp,
        "gold_customer_summary" -> graft.gold.Gold.customerSummary(spark, dir),
        "gold_order_metrics" -> graft.gold.Gold.orderMetrics(spark, dir),
        "gold_revenue_analysis" -> graft.gold.Gold.revenueAnalysis(spark, dir))
    }

    // Singular-test reconstructions folded into the same single-pass agg as
    // the table's generic checks, so their (large) model subtree appears in
    // the union plan exactly once (/root/reference/tests/, SURVEY.md §2.12).
    val extraChecks: Map[String, Seq[(String, Column)]] = Map(
      "silver_customers" -> Seq("tests.assert_customer_email_format" ->
        sum(when(!col("email").like("%@%.%"), 1L).otherwise(0L))),
      "gold_customer_summary" -> Seq("tests.assert_positive_revenue" ->
        sum(when(col("lifetime_value") < 0, 1L).otherwise(0L))))

    def tableRows(tc: TableChecks): DataFrame = {
      val checks: Seq[Column] =
        tc.uniques.map(uniqueViolations) ++
        tc.notNulls.map(notNullViolations) ++
        tc.accepted.map { case (c, vals) => acceptedValuesViolations(c, vals) }.toSeq ++
        extraChecks.getOrElse(tc.table, Seq.empty).map { case (n, c) => c.as(n) }
      val agged = dfs(tc.table).agg(checks.head, checks.tail: _*)
      val entries = agged.schema.fieldNames.toSeq.flatMap { n =>
        val name = if (n.startsWith("tests.")) n else s"${tc.table}.$n"
        Seq(lit(name), col(s"`$n`").cast("long"))
      }
      agged.select(explode(map(entries: _*)).as(Seq("check_name", "violations")))
    }

    def relRows(name: String, child: String, fk: String, parent: String, pk: String) =
      relationships(dfs(child), fk, dfs(parent), pk)
        .agg(count(lit(1)).as("violations"))
        .select(lit(name).as("check_name"), col("violations"))

    // custom generic tests: arbitrary rendered SELECTs of violating rows,
    // so each is its own counted branch (it cannot fold into a table's
    // single-pass conditional agg), evaluated through the same lazy-chain
    // resolution as singular tests
    def customRows(name: String, sql: String): DataFrame =
      SingularTests.violations(spark, dir, name, sql)
        .agg(count(lit(1)).as("violations"))
        .select(lit(name).as("check_name"), col("violations"))

    val parts =
      inventory.map(tableRows) ++
      relationshipChecks.map { case (n, c, fk, p, pk) => relRows(n, c, fk, p, pk) } ++
      customTestSql.map { case (n, sql) => customRows(n, sql) }
    parts.reduce(_ unionByName _)
  }

  /** `dbt test` RESULT statuses — [[summary]] plus each check's verdict
    * under its YAML `config:` (severity / warn_if / error_if;
    * dbt defaults: severity error, both conditions `!= 0`). A
    * severity-error check errors when `violations error_if` holds, else
    * warns when `warn_if` holds; a severity-warn check can only warn.
    * The checked-in silver.yml downgrades the KNOWN-violating
    * `payment_method.accepted_values` quirk (digital_wallet is produced
    * but not accepted — the faithful reference bug) to severity warn
    * with a warn_if threshold, so both the override and the default
    * paths carry live traffic. Conditions are driver-side constants
    * spliced identically into both engines' CASE logic — the same
    * generated-from-one-spec discipline as [[oracle]]. */
  def statuses(spark: SparkSession, dir: String): DataFrame = {
    def statusExpr(cfg: SchemaYaml.TestConfig): Column = cfg.severity match {
      case "warn" =>
        when(expr(s"violations ${cfg.warnIf}"), "warn").otherwise("pass")
      case _ =>
        when(expr(s"violations ${cfg.errorIf}"), "error")
          .when(expr(s"violations ${cfg.warnIf}"), "warn")
          .otherwise("pass")
    }
    val status = testConfigs.toSeq.sortBy(_._1).foldLeft(
      statusExpr(SchemaYaml.TestConfig.default)) {
      case (acc, (name, cfg)) =>
        when(col("check_name") === name, statusExpr(cfg)).otherwise(acc)
    }
    summary(spark, dir).withColumn("status", status)
  }

  /** DuckDB mirror of [[statuses]], wrapping [[oracle]]. */
  def statusesOracle: String = {
    def caseSql(cfg: SchemaYaml.TestConfig): String = cfg.severity match {
      case "warn" =>
        s"CASE WHEN violations ${cfg.warnIf} THEN 'warn' ELSE 'pass' END"
      case _ =>
        s"CASE WHEN violations ${cfg.errorIf} THEN 'error' " +
          s"WHEN violations ${cfg.warnIf} THEN 'warn' ELSE 'pass' END"
    }
    val overrides = testConfigs.toSeq.sortBy(_._1).map { case (n, cfg) =>
      s"WHEN check_name = '$n' THEN ${caseSql(cfg)}"
    }.mkString("\n      ")
    val statusCase =
      if (testConfigs.isEmpty) caseSql(SchemaYaml.TestConfig.default)
      else s"""CASE $overrides
      ELSE ${caseSql(SchemaYaml.TestConfig.default)} END"""
    s"""SELECT check_name, violations, $statusCase AS status
    FROM ($oracle) dq"""
  }

  /** DuckDB mirror, generated from the same [[inventory]]. */
  def oracle: String = {
    val perTable = inventory.flatMap { tc =>
      tc.uniques.map(c =>
        s"SELECT '${tc.table}.$c.unique' AS check_name, count($c) - count(DISTINCT $c) AS violations FROM ${tc.table}") ++
      tc.notNulls.map(c =>
        s"SELECT '${tc.table}.$c.not_null', sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) FROM ${tc.table}") ++
      tc.accepted.map { case (c, vals) =>
        val list = vals.map(v => s"'$v'").mkString(", ")
        s"SELECT '${tc.table}.$c.accepted_values', sum(CASE WHEN $c IS NOT NULL AND $c NOT IN ($list) THEN 1 ELSE 0 END) FROM ${tc.table}"
      }
    }
    val rels = relationshipChecks.map { case (name, child, fk, parent, pk) =>
      s"""SELECT '$name', count(*) FROM $child c
          WHERE c.$fk IS NOT NULL
            AND NOT EXISTS (SELECT 1 FROM $parent p WHERE p.$pk = c.$fk)"""
    }
    val singular = Seq(
      "SELECT 'tests.assert_customer_email_format', count(*) FROM silver_customers WHERE NOT (email LIKE '%@%.%')",
      "SELECT 'tests.assert_positive_revenue', count(*) FROM gold_customer_summary WHERE lifetime_value < 0")
    val custom = customTestSql.map { case (name, sql) =>
      s"SELECT '$name', count(*) FROM (${SingularTests.resolveBareNames(sql)}) _ct"
    }
    val unions = (perTable ++ rels ++ singular ++ custom).mkString("\n  UNION ALL ")
    s"""${OracleSql.prelude},
  ${OracleSql.customerSummaryCtes},
  gold_customer_summary AS (${OracleSql.customerSummarySelect}),
  ${OracleSql.orderMetricsCtes},
  gold_order_metrics AS (${OracleSql.orderMetricsSelect}),
  ${OracleSql.revenueAnalysisCtes},
  gold_revenue_analysis AS (${OracleSql.revenueAnalysisSelect})
  $unions"""
  }
}

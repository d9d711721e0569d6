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

  // ---- footer fast-path (see [[FooterStats]]) ----

  /** Footer-provable shapes recognized in a RENDERED custom-test SQL.
    * Recognition is by the SQL the macro actually rendered — not the test
    * NAME — so a user who redefines `within_range` to different semantics
    * automatically loses the fast path (regex miss → scan fallback)
    * instead of getting a wrong metadata answer. */
  private[quality] sealed trait FooterKind
  private[quality] final case class RangeKind(col: String, lo: BigDecimal,
    hi: BigDecimal) extends FooterKind
  private[quality] final case class NotEmptyKind(col: String) extends FooterKind
  private[quality] final case class RowFloorKind(n: Long) extends FooterKind

  private val RangeSql =
    ("""(?is)\s*select\s+\*\s+from\s+.*?\s+where\s+(\w+)\s+is\s+not\s+null""" +
      """\s+and\s+\(\s*\1\s*<\s*(-?[\d.]+)\s+or\s+\1\s*>\s*(-?[\d.]+)\s*\)\s*""").r
  private val NotEmptySql =
    ("""(?is)\s*select\s+\*\s+from\s+.*?\s+where\s+(\w+)\s+is\s+not\s+null""" +
      """\s+and\s+trim\(\s*\1\s*\)\s*=\s*''\s*""").r
  private val RowFloorSql =
    ("""(?is)\s*select\s+c\s+as\s+n_rows\s+from\s+\(\s*select\s+count\(\*\)""" +
      """\s+as\s+c\s+from\s+.*?\)\s*where\s+c\s*<\s*(\d+)\s*""").r

  private[quality] def footerKindOf(sql: String): Option[FooterKind] = sql match {
    case RangeSql(col, lo, hi) =>
      Some(RangeKind(col, BigDecimal(lo), BigDecimal(hi)))
    case NotEmptySql(col) => Some(NotEmptyKind(col))
    case RowFloorSql(n) => Some(RowFloorKind(n.toLong))
    case _ => None
  }

  /** One row per declared test, one UNDERLYING EVALUATION per table.
    *
    * Each table's generic checks are a single-pass conditional agg
    * (Catalyst prunes the branch to the 1–3 checked columns), and —
    * load-bearing at 100× — the silver model chains are MATERIALIZED
    * once before the union fans out: without that, every union branch
    * (per-table aggs, relationship joins reading child AND parent,
    * singular + custom tests) re-derives its table's whole upstream
    * chain, making the dq rows check-count × chain-linear — the measured
    * 100× bench tail. This is exactly dbt's own semantics (`dbt test`
    * runs against MATERIALIZED relations, one build + N cheap test
    * scans), expressed in-query. The materialization is served by the
    * build-once fingerprint-keyed [[SilverStage]] (one trio build per
    * corpus, shared by all three dq rows and across processes);
    * `spark.graft.dq.silverstage=false` falls back to per-call
    * [[graft.model.Stage.pinColumnar]] pins. Raw/bronze "tables" stay
    * unpinned — they are direct pruned parquet scans with map-only
    * renames, cheaper to re-scan than to copy. Either way the oracle
    * sees identical rows (the stage freezes values, not semantics). */
  def summary(spark: SparkSession, dir: String): DataFrame =
    summaryWithFooterAnswers(spark, dir)._1

  /** [[summary]] plus the checks the footer fast path answered (name →
    * violation count) — the observability a test or an operator wants
    * rides the RETURN VALUE, scoped to this call, instead of a mutable
    * JVM-wide seam two concurrent sessions would cross-contaminate. */
  def summaryWithFooterAnswers(spark: SparkSession,
      dir: String): (DataFrame, Map[String, Long]) = {
    import Checks._
    val dfs: Map[String, DataFrame] = {
      // COLUMNAR pin: ~a dozen narrow branches read each pinned silver
      // table, and a row-oriented localCheckpoint block deserializes
      // full-width rows per branch — measured 2× worse than no pin at
      // all at 100× (dq_summary 71→155 s); the parquet stage keeps the
      // one-evaluation semantics AND per-branch column pruning
      val pin = graft.model.Stage.pinColumnar _
      val goldPin: DataFrame => DataFrame =
        if (spark.conf.getOption("spark.graft.dq.pingold").contains("true"))
          pin
        else identity
      // the silver trio is the dominant dq cost, and three dq rows per
      // suite each used to re-derive + re-pin it: serve it from the
      // build-once fingerprint-keyed stage instead ([[SilverStage]] —
      // same bottom-up one-evaluation structure, built once per corpus);
      // spark.graft.dq.silverstage=false restores the per-call pins
      val staged: Map[String, DataFrame] =
        if (SilverStage.enabled(spark)) SilverStage.tables(spark, dir)
        else Map.empty
      val (sc, so, sp) =
        if (staged.nonEmpty) {
          (staged("silver_customers"), staged("silver_orders"),
            staged("silver_payments"))
        } else {
          // per-call pins, bottom-up THROUGH the From-composition: each
          // layer's one evaluation reads the pinned layer below
          val sc0 = pin(graft.silver.Silver.customersFrom(
            graft.bronze.Bronze.customers(spark, dir)))
          val so0 = pin(graft.silver.Silver.ordersFrom(
            graft.bronze.Bronze.orders(spark, dir), sc0))
          val sp0 = pin(graft.silver.Silver.paymentsFrom(
            graft.bronze.Bronze.payments(spark, dir), so0))
          (sc0, so0, sp0)
        }
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
        // gold: served from the build-once stage when goldstage is on
        // (SilverStage — gold is dim-sized at rest but fact-sized to
        // derive, so the lazy form re-paid the derivation inside every
        // dq row); otherwise LAZY over the pinned/staged silvers (each
        // gold table is read by only 1–2 branches — the pre-round-14
        // adjudication against PER-CALL pins, kept as the fallback and
        // A/B lever). spark.graft.dq.pingold=true pins the lazy form.
        "gold_customer_summary" -> staged.getOrElse("gold_customer_summary",
          goldPin(graft.gold.Gold.customerSummaryFrom(sc, so, sp))),
        "gold_order_metrics" -> staged.getOrElse("gold_order_metrics",
          goldPin(graft.gold.Gold.orderMetricsFrom(so))),
        "gold_revenue_analysis" -> staged.getOrElse("gold_revenue_analysis",
          goldPin(graft.gold.Gold.revenueAnalysisFrom(so, sp))))
    }

    // ---- footer fast-path: answer eligible checks from the parquet
    // footers the pins/sources already wrote ([[FooterStats]]) — a
    // not_null count IS the summed null-count statistic, a range-style
    // custom check is provably zero when every row group's min/max sits
    // inside the bounds, a row-floor check reads only row counts. One
    // footer pass per distinct root path (raw and bronze share files);
    // anything unprovable (derived column, missing stats, min/max outside
    // the bounds, non-parquet frame) stays on the scan path below, whose
    // semantics remain the oracle's. Answers are EXACT, so the emitted
    // rows hash identically either way. ----
    // kill switch (spark.graft.dq.footer=false): forces every check onto
    // the scan path — the operational escape hatch for a store whose
    // footer statistics are distrusted, and the spec's A/B lever proving
    // both paths emit identical rows
    val footerEnabled =
      spark.conf.getOption("spark.graft.dq.footer").forall(_ != "false")
    val customKinds: Seq[(String, String, FooterKind)] =
      if (!footerEnabled) Seq.empty
      else customTestSql.flatMap { case (name, sql) =>
        loaded.customTests.find(_.checkName == name).flatMap(ct =>
          footerKindOf(sql).map(k => (name, ct.table, k)))
      }
    val wantedCols: Map[String, Set[String]] =
      ((if (footerEnabled) inventory else Seq.empty)
        .map(tc => tc.table -> tc.notNulls.toSet) ++
        customKinds.map {
          case (_, t, RangeKind(c, _, _)) => t -> Set(c)
          case (_, t, NotEmptyKind(c)) => t -> Set(c)
          case (_, t, RowFloorKind(_)) => t -> Set.empty[String]
        }).groupMapReduce(_._1)(_._2)(_ ++ _)
    val originByTable: Map[String, (String, Map[String, String])] =
      wantedCols.keys.flatMap(t =>
        dfs.get(t).flatMap(FooterStats.origin).map(t -> _)).toMap
    val statsByRoot: Map[String, FooterStats.TableStats] =
      originByTable.toSeq
        .map { case (t, (root, byName)) =>
          root -> wantedCols(t).flatMap(byName.get) }
        .groupMapReduce(_._1)(_._2)(_ ++ _)
        .map { case (root, cols) => root -> FooterStats.read(spark, root, cols) }
    def colStats(table: String, c: String): Option[FooterStats.ColStats] =
      originByTable.get(table).flatMap { case (root, byName) =>
        byName.get(c).flatMap(statsByRoot(root).cols.get) }
    def rowCountOf(table: String): Option[Long] =
      originByTable.get(table).map { case (root, _) => statsByRoot(root).rowCount }
    val footerAnswers: Map[String, Long] =
      (inventory.flatMap { tc =>
        tc.notNulls.flatMap(c => colStats(tc.table, c).flatMap(_.nullCount)
          .map(s"${tc.table}.$c.not_null" -> _))
      } ++ customKinds.flatMap {
        case (name, t, RangeKind(c, lo, hi)) =>
          colStats(t, c).collect {
            case s if s.allNull => name -> 0L
            case s if s.numRange.exists { case (mn, mx) => mn >= lo && mx <= hi } =>
              name -> 0L
          }
        case (name, t, NotEmptyKind(c)) =>
          colStats(t, c).collect {
            case s if s.allNull => name -> 0L
            // min's first byte above 0x20 ⇒ no value is empty/all-spaces
            case s if s.strMinFirstByte.exists(_ > 0x20) => name -> 0L
          }
        case (name, t, RowFloorKind(n)) =>
          rowCountOf(t).map(rc => name -> (if (rc < n) 1L else 0L))
      }).toMap
    // one visible line per summary: which checks resolved footer-only
    if (footerAnswers.nonEmpty && spark.conf
        .getOption("spark.graft.dq.footer.log").forall(_ != "false"))
      System.err.println(s"[graft.dq] footer-only resolution for " +
        s"${footerAnswers.size} checks: " +
        footerAnswers.keys.toSeq.sorted.mkString(", "))

    // Singular-test reconstructions folded into the same single-pass agg as
    // the table's generic checks, so their (large) model subtree appears in
    // the union plan exactly once (/root/reference/tests/, SURVEY.md §2.12).
    val extraChecks: Map[String, Seq[(String, Column)]] = Map(
      "silver_customers" -> Seq("tests.assert_customer_email_format" ->
        sum(when(!col("email").like("%@%.%"), 1L).otherwise(0L))),
      "gold_customer_summary" -> Seq("tests.assert_positive_revenue" ->
        sum(when(col("lifetime_value") < 0, 1L).otherwise(0L))))

    def tableRows(tc: TableChecks): Option[DataFrame] = {
      // footer-answered not_nulls leave the agg: the branch's ReadSchema
      // narrows to the columns that still need rows
      val scanNotNulls = tc.notNulls
        .filterNot(c => footerAnswers.contains(s"${tc.table}.$c.not_null"))
      val checks: Seq[Column] =
        tc.uniques.map(uniqueViolations) ++
        scanNotNulls.map(notNullViolations) ++
        tc.accepted.map { case (c, vals) => acceptedValuesViolations(c, vals) }.toSeq ++
        extraChecks.getOrElse(tc.table, Seq.empty).map { case (n, c) => c.as(n) }
      if (checks.isEmpty) return None // every check answered from footers
      val agged = dfs(tc.table).agg(checks.head, checks.tail: _*)
      val entries = agged.schema.fieldNames.toSeq.flatMap { n =>
        val name = if (n.startsWith("tests.")) n else s"${tc.table}.$n"
        Seq(lit(name), col(s"`$n`").cast("long"))
      }
      Some(agged.select(explode(map(entries: _*)).as(Seq("check_name", "violations"))))
    }

    def relRows(name: String, child: String, fk: String, parent: String, pk: String) =
      relationships(dfs(child), fk, dfs(parent), pk)
        .agg(count(lit(1)).as("violations"))
        .select(lit(name).as("check_name"), col("violations"))

    // custom generic tests: arbitrary rendered SELECTs of violating rows,
    // so each is its own counted branch (it cannot fold into a table's
    // single-pass conditional agg) — but its refs resolve to the PINNED
    // tables above, so the branch is a scan, not a chain re-derivation
    def customRows(name: String, sql: String): DataFrame =
      SingularTests.violations(spark, dir, name, sql, provided = dfs)
        .agg(count(lit(1)).as("violations"))
        .select(lit(name).as("check_name"), col("violations"))

    // footer answers enter as literal rows — exact values, zero scans
    val footerRows: Option[DataFrame] =
      if (footerAnswers.isEmpty) None
      else Some(spark.createDataFrame(
        java.util.Arrays.asList(footerAnswers.toSeq.sortBy(_._1).map {
          case (n, v) => org.apache.spark.sql.Row(n, v) }: _*),
        org.apache.spark.sql.types.StructType.fromDDL(
          "check_name STRING, violations BIGINT")))

    val parts =
      inventory.flatMap(tableRows) ++
      relationshipChecks.map { case (n, c, fk, p, pk) => relRows(n, c, fk, p, pk) } ++
      customTestSql.collect { case (n, sql) if !footerAnswers.contains(n) =>
        customRows(n, sql) } ++
      footerRows
    (parts.reduce(_ unionByName _), footerAnswers)
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

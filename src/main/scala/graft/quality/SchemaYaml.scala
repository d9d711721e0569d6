package graft.quality

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import scala.jdk.CollectionConverters._

/** dbt `schema.yml` loader — the declared-test surface of a dbt project
  * (`/root/reference/models/bronze/bronze.yml:16-96`, `silver.yml`,
  * `gold.yml`): `unique` / `not_null` / `accepted_values` /
  * `relationships` column tests on models AND source tables, plus the
  * source `freshness` block (`warn_after`/`error_after`). Parsed with
  * SnakeYAML (shipped in Spark's jars) into the exact
  * [[DataQuality.TableChecks]] / relationship-tuple shapes the
  * single-pass summary query and its DuckDB oracle are generated from —
  * so a user's `schema.yml` drops in as-is and BECOMES the check
  * inventory, instead of being hand-ported to Scala.
  *
  * `relationships.to` accepts dbt's two relation forms: `ref('model')`
  * resolves to the model name, `source('schema', 'table')` to the bare
  * table name (the inventory addresses raw feeds that way). Unknown
  * YAML keys (descriptions, databases, meta) are ignored, matching how
  * dbt treats documentation-only properties, so the REFERENCE project's
  * own YAML files load unmodified (SchemaYamlSpec pins that).
  *
  * Driver-side cost: a few KB of YAML parsed once per JVM — the check
  * evaluation itself stays the distributed single-pass aggregate in
  * [[DataQuality.summary]].
  */
object SchemaYaml {

  /** dbt per-test `config:` block — `severity: warn|error` plus the
    * `warn_if`/`error_if` count conditions (dbt defaults: severity error,
    * both conditions `!= 0`). Conditions are validated against the
    * comparator-integer shape dbt documents, so the strings can be
    * spliced into both engines' generated SQL. */
  final case class TestConfig(
    severity: String = "error",
    warnIf: String = "!= 0",
    errorIf: String = "!= 0")

  object TestConfig {
    val default: TestConfig = TestConfig()

    private val ConditionRe = raw"^(!=|<>|>=|<=|=|>|<)\s*\d+$$".r

    def apply(configMap: Map[String, Any]): TestConfig = {
      def cond(key: String, dflt: String): String =
        configMap.get(key).map(String.valueOf(_).trim) match {
          case None => dflt
          case Some(c) =>
            require(ConditionRe.findFirstIn(c).isDefined,
              s"test config $key '$c' is not a <comparator> <integer> condition")
            c
        }
      val sev = configMap.get("severity").map(String.valueOf(_).toLowerCase(
        java.util.Locale.ROOT)).getOrElse("error")
      require(sev == "error" || sev == "warn",
        s"test config severity '$sev' must be 'error' or 'warn'")
      TestConfig(sev, cond("warn_if", "!= 0"), cond("error_if", "!= 0"))
    }
  }

  /** A custom (macro-defined) generic test declared in schema YAML —
    * any `data_tests:` entry that is not one of dbt's four built-ins.
    * `relation` is the dbt relation call (`ref('t')` for a model,
    * `source('s', 't')` for a source table) the test macro's `model`
    * argument renders to; `args` are the entry's extra keyword
    * arguments. Resolution against the macro library (`test_<name>`)
    * happens at evaluation time in [[DataQuality]], where a missing
    * macro fails loudly by name — YAML parsing stays resolution-free,
    * matching dbt's parse-then-compile split. */
  final case class CustomTest(
    table: String,
    column: String,
    test: String,
    relation: String,
    args: Map[String, Any]) {
    /** Model-level tests (empty `column`) name as `table.test`. */
    def checkName: String =
      if (column.isEmpty) s"$table.$test" else s"$table.$column.$test"
  }

  final case class Loaded(
    inventory: Seq[DataQuality.TableChecks],
    relationships: Seq[(String, String, String, String, String)],
    freshnessWarnHours: Option[Int],
    freshnessErrorHours: Option[Int],
    configs: Map[String, TestConfig] = Map.empty,
    freshnessBySource: Map[String, (Option[Int], Option[Int])] = Map.empty,
    customTests: Seq[CustomTest] = Seq.empty)

  private def asMap(o: Any): Map[String, Any] = o match {
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, v) => String.valueOf(k) -> (v: Any) }.toMap
    case _ => Map.empty
  }

  private def asList(o: Any): Seq[Any] = o match {
    case l: java.util.List[_] => l.asScala.toSeq.map(v => v: Any)
    case _ => Seq.empty
  }

  private val RefTo = raw"ref\(\s*'([^']+)'\s*\)".r
  private val SourceTo = raw"source\(\s*'([^']+)'\s*,\s*'([^']+)'\s*\)".r

  private def parentOf(table: String, to: String): String = to.trim match {
    case RefTo(m) => m
    case SourceTo(_, t) => t
    case other => throw new IllegalArgumentException(
      s"$table: relationships.to '$other' is neither ref('m') nor " +
        "source('s', 't')")
  }

  /** Hours from a dbt freshness period spec `{count: N, period: p}`. */
  private def hoursOf(spec: Any): Option[Int] = {
    val m = asMap(spec)
    m.get("count").map { c =>
      val n = String.valueOf(c).toInt
      m.get("period").map(String.valueOf(_)) match {
        case Some("hour") | None => n
        case Some("day") => n * 24
        case Some("minute") =>
          require(n % 60 == 0, s"minute freshness period $n not whole hours")
          n / 60
        case Some(other) =>
          throw new IllegalArgumentException(s"unknown freshness period '$other'")
      }
    }
  }

  /** One table's/model's declared tests folded into the inventory row +
    * its relationship tuples + any non-default per-test configs (keyed by
    * the full check name `table.column.test`) + custom generic tests.
    * `sourceSchema` is set when the entity is a source table (its
    * relation form is `source(schema, table)`, not `ref(table)`). */
  private def checksOf(entity: Map[String, Any],
      sourceSchema: Option[String]): (
      DataQuality.TableChecks, Seq[(String, String, String, String, String)],
      Map[String, TestConfig], Seq[CustomTest]) = {
    val table = String.valueOf(entity("name"))
    val relation = sourceSchema match {
      case Some(s) => s"source('$s', '$table')"
      case None => s"ref('$table')"
    }
    var uniques = Vector.empty[String]
    var notNulls = Vector.empty[String]
    var accepted = Map.empty[String, Seq[String]]
    var rels = Vector.empty[(String, String, String, String, String)]
    var configs = Map.empty[String, TestConfig]
    var customs = Vector.empty[CustomTest]
    // MODEL-LEVEL data_tests (dbt: tests declared on the entity, not a
    // column) — necessarily custom generic tests: the four built-ins are
    // column-scoped by definition, so a built-in name here is a schema
    // error, not a check. The test macro receives `model` (and kwargs)
    // with no column_name; its check name is table.<test>.
    val IdentRe = raw"^\w+$$".r
    val Builtins = Set("unique", "not_null", "accepted_values",
      "relationships")
    def modelLevel(test: String, body: Any): Unit = {
      require(IdentRe.findFirstIn(test).isDefined,
        s"$table: test name '$test' is not an identifier")
      require(!Builtins.contains(test),
        s"$table: built-in test '$test' is column-scoped — declare it " +
          "under a column, not on the model")
      customs :+= CustomTest(table, "", test, relation,
        asMap(body) - "config")
      val cfg = TestConfig(asMap(asMap(body).getOrElse("config", null)))
      if (cfg != TestConfig.default) configs += s"$table.$test" -> cfg
    }
    (asList(entity.getOrElse("tests", null)) ++
      asList(entity.getOrElse("data_tests", null))).foreach {
      case s: String => modelLevel(s, null)
      case m: java.util.Map[_, _] =>
        asMap(m).foreach { case (k, body) => modelLevel(k, body) }
      case other => throw new IllegalArgumentException(
        s"$table: unknown model-level test '$other'")
    }
    asList(entity.getOrElse("columns", null)).map(asMap).foreach { colSpec =>
      val colName = String.valueOf(colSpec("name"))
      // a test's config lives under its map form's `config:` key; only
      // non-default configs are recorded, so an explicit dbt-default
      // block is indistinguishable from none (as in dbt)
      def recordConfig(test: String, body: Any): Unit = {
        val cfg = TestConfig(asMap(asMap(body).getOrElse("config", null)))
        if (cfg != TestConfig.default) configs += s"$table.$colName.$test" -> cfg
      }
      // dbt >= 1.8 renamed the column key to data_tests: (tests: still
      // accepted); a modern schema.yml must not silently load zero checks
      val declared = asList(colSpec.getOrElse("tests", null)) ++
        asList(colSpec.getOrElse("data_tests", null))
      // a custom test name must be a plausible macro identifier — a
      // mistyped BUILT-IN (e.g. 'uniqe') also lands here, and fails
      // loudly later when no test_<name> macro exists
      def customOf(test: String, body: Any): Unit = {
        require(IdentRe.findFirstIn(test).isDefined,
          s"$table.$colName: test name '$test' is not an identifier")
        val args = asMap(body) - "config"
        customs :+= CustomTest(table, colName, test, relation, args)
        recordConfig(test, body)
      }
      declared.foreach {
        case "unique" => uniques :+= colName
        case "not_null" => notNulls :+= colName
        case s: String => customOf(s, null)
        case m: java.util.Map[_, _] =>
          val tm = asMap(m)
          // map-form unique/not_null carry only a config block
          tm.get("unique").foreach { u =>
            uniques :+= colName; recordConfig("unique", u)
          }
          tm.get("not_null").foreach { nn =>
            notNulls :+= colName; recordConfig("not_null", nn)
          }
          tm.get("accepted_values").foreach { av =>
            accepted += colName ->
              asList(asMap(av).getOrElse("values", null)).map(String.valueOf(_))
            recordConfig("accepted_values", av)
          }
          tm.get("relationships").foreach { rel =>
            val rm = asMap(rel)
            val parent = parentOf(table, String.valueOf(rm("to")))
            rels :+= ((s"$table.$colName.relationships", table, colName,
              parent, String.valueOf(rm("field"))))
            recordConfig("relationships", rel)
          }
          (tm.keySet -- Set("unique", "not_null", "accepted_values",
            "relationships")).foreach(k => customOf(k, tm(k)))
        case other => throw new IllegalArgumentException(
          s"$table.$colName: unknown test '$other'")
      }
    }
    (DataQuality.TableChecks(table, uniques, notNulls, accepted), rels,
      configs, customs)
  }

  /** Parse schema YAML documents (in order) into one loaded inventory. */
  def parse(texts: Seq[String]): Loaded = {
    var inventory = Vector.empty[DataQuality.TableChecks]
    var relationships = Vector.empty[(String, String, String, String, String)]
    var freshBySource = Map.empty[String, (Option[Int], Option[Int])]
    var configs = Map.empty[String, TestConfig]
    var customs = Vector.empty[CustomTest]
    // an entity declaring no column tests (descriptions only — a normal
    // dbt pattern) contributes nothing to the inventory: an empty
    // TableChecks row would crash the summary's checks.head
    def record(entity: Map[String, Any],
        sourceSchema: Option[String]): Unit = {
      val (tc, rels, cfgs, cts) = checksOf(entity, sourceSchema)
      if (tc.uniques.nonEmpty || tc.notNulls.nonEmpty || tc.accepted.nonEmpty)
        inventory :+= tc
      relationships ++= rels
      configs ++= cfgs
      customs ++= cts
    }
    texts.foreach { text =>
      val doc = asMap(new org.yaml.snakeyaml.Yaml().load[Any](text))
      asList(doc.getOrElse("sources", null)).map(asMap).foreach { src =>
        // both dbt freshness forms: the classic block directly under the
        // source, and the >=1.7 config-nested form (nested wins if both)
        val classic = asMap(src.getOrElse("freshness", null))
        val nested = asMap(asMap(src.getOrElse("config", null))
          .getOrElse("freshness", null))
        val fresh = if (nested.nonEmpty) nested else classic
        if (fresh.nonEmpty)
          freshBySource += String.valueOf(src.getOrElse("name", "")) ->
            ((fresh.get("warn_after").flatMap(hoursOf),
              fresh.get("error_after").flatMap(hoursOf)))
        val schema = String.valueOf(src.getOrElse("name", ""))
        asList(src.getOrElse("tables", null)).map(asMap)
          .foreach(record(_, Some(schema)))
      }
      asList(doc.getOrElse("models", null)).map(asMap)
        .foreach(record(_, None))
    }
    // the engine's freshness check carries ONE threshold pair; distinct
    // per-source declarations must fail loudly, not last-write-win into
    // evaluating a source against another source's threshold
    val pairs = freshBySource.values.toSeq.distinct
    require(pairs.size <= 1,
      "per-source freshness thresholds differ " +
        s"(${freshBySource.map { case (s, p) => s"$s=$p" }.mkString(", ")}) — " +
        "the single-pass freshness check carries one threshold pair")
    val (warn, error) = pairs.headOption.getOrElse((None, None))
    Loaded(inventory, relationships, warn, error, configs, freshBySource,
      customs)
  }

  /** Medallion read order: a relationship's parent may be declared in a
    * later file, so order only fixes the REPORTING order (bronze →
    * silver → gold, then any other layer alphabetically — dbt itself
    * imposes none). */
  private def layerRank(layer: String): (Int, String) =
    (Seq("bronze", "silver", "gold").indexOf(layer) match {
      case -1 => Int.MaxValue
      case i => i
    }, layer)

  /** Load the YAML schema files under each layer dir of `root`. */
  def loadDir(root: File): Loaded = {
    val files = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory)
      .sortBy(d => layerRank(d.getName))
      .flatMap(layerDir => Option(layerDir.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile &&
          (f.getName.endsWith(".yml") || f.getName.endsWith(".yaml")))
        .sortBy(_.getName))
    require(files.nonEmpty,
      s"no schema YAML found under ${root.getAbsolutePath} — the check " +
        "inventory loads the dbt project's per-layer models/ YAML files " +
        "relative to the working directory; run from the project root " +
        "or point -Dgraft.models.root at the models directory")
    parse(files.toSeq.map(f =>
      new String(Files.readAllBytes(f.toPath), StandardCharsets.UTF_8)))
  }
}

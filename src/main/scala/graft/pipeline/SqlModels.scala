package graft.pipeline

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.adapter.RawSources
import graft.model.{Clock, SurrogateKey}

/** SQL-file model authoring — the reference's user interface
  * (`/root/reference/models/silver/silver_orders.sql:20-26`,
  * `/root/reference/dbt_project.yml:16-31`): a directory tree
  * `models/<layer>/<name>.sql` of SELECT statements carrying
  * `{{ ref() }}` / `{{ source() }}` / `{{ config() }}` /
  * `{{ dbt_utils.generate_surrogate_key() }}` constructs, loaded into
  * [[Registry.Model]]s and executed via `spark.sql` (GraftExtensions
  * already injects the engine's custom functions into SQL). A dbt
  * project's model files drop in without rewriting each model as
  * DataFrame code, and the rendered SQL runs through the same
  * sink/materialization/declared-schema machinery as code-authored
  * models — RegistrySpec pins the nine checked-in files bit-equal to
  * the Scala builders.
  *
  * Render-time substitutions (one pass, no Jinja engine — the constructs
  * the reference exercises, resolved textually):
  *  - `{{ config(...) }}` → parsed for `materialized=` and `tags=`,
  *    stripped from the SQL.
  *  - `{{ ref('m') }}` → the identifier `m`, recorded as a DAG edge; at
  *    build time the upstream's post-materialization DataFrame is
  *    registered under that temp-view name — the engine's ref()
  *    resolution against current warehouse state, exactly how dbt
  *    resolves refs.
  *  - `{{ source('s', 't') }}` → the adapter view `s__t`, registered at
  *    build time from [[RawSources]].
  *  - `{{ dbt_utils.generate_surrogate_key(['a', 'b']) }}` → the exact
  *    macro expansion ([[SurrogateKey]] null-sentinel semantics).
  *  - `{% if is_incremental() %} … {% endif %}` → rendered TWICE through
  *    the shared Jinja engine with `is_incremental` bound per phase —
  *    dbt's two compilations of an incremental model (blocks nest freely
  *    with other `{% if/for %}` blocks); the build runs whichever
  *    variant matches the run ([[Registry.ThisKey]] present ⇔ the target
  *    exists and --full-refresh is off).
  *  - `{{ this }}` → a per-model temp view over the CURRENT target
  *    table, registered at build time from the same ThisKey handoff —
  *    the high-water-mark subquery pattern (`WHERE ts > (SELECT max(ts)
  *    FROM {{ this }})`) works verbatim.
  *  - `config(materialized='incremental'|'snapshot')` routes the model
  *    through [[Registry.Incremental]] / [[Registry.Snapshot]] — the
  *    same merge/append/SCD2 machinery as code-authored models
  *    ([[materializationOf]] documents the accepted keys).
  *  - `current_timestamp()` / `current_date()` → the pinned
  *    [[Clock]] literals — the injectable-clock discipline (SURVEY.md
  *    §2.9 C15/C16) applied at render time, so SQL-authored models stay
  *    deterministic and oracle-comparable like code-authored ones.
  *
  * Scale: rendering is driver-side string work at plan-construction
  * time; the SQL plans Catalyst produces are the same declarative plans
  * the DataFrame builders yield (bit-equality is pinned, and the two
  * forms canonicalize to the same optimized plans for these models), so
  * nothing changes about pushdown, broadcast, or bucketing at 100 TB.
  */
object SqlModels {

  /** Adapter resolution for `{{ source(schema, table) }}` — the engine's
    * sources.yml. */
  val sources: Map[(String, String), (SparkSession, String) => DataFrame] = Map(
    ("raw_ecommerce", "raw_customers") -> (RawSources.rawCustomers _),
    ("raw_ecommerce", "raw_orders") -> (RawSources.rawOrders _),
    ("raw_ecommerce", "raw_payments") -> (RawSources.rawPayments _))

  def sourceViewName(schema: String, table: String): String = s"${schema}__$table"

  final case class Rendered(
    name: String,
    layer: String,
    materialization: Registry.Materialization,
    tags: Seq[String],
    deps: Seq[String],
    srcs: Seq[(String, String)],
    sql: String,
    sqlIncremental: Option[String],
    preHooks: Seq[String] = Seq.empty,
    postHooks: Seq[String] = Seq.empty,
    enabled: Boolean = true,
    alias: Option[String] = None)

  private val ConfigRe = raw"(?s)\{\{\s*config\((.*?)\)\s*\}\}".r
  private val RefRe = raw"\{\{\s*ref\(\s*'([^']+)'\s*\)\s*\}\}".r
  private val SourceRe =
    raw"\{\{\s*source\(\s*'([^']+)'\s*,\s*'([^']+)'\s*\)\s*\}\}".r
  private val SkRe =
    raw"\{\{\s*dbt_utils\.generate_surrogate_key\(\s*\[(.*?)\]\s*\)\s*\}\}".r
  private val NowRe = raw"(?i)current_timestamp\s*\(\s*\)".r
  private val TodayRe = raw"(?i)current_date\s*\(\s*\)".r
  private val ThisRe = raw"\{\{\s*this\s*\}\}".r
  /** `{{ var('name') }}` / `{{ var('name', 'default') }}` — resolved
    * against the loaded [[ProjectYaml]] vars. */
  private val VarRe =
    raw"\{\{\s*var\(\s*'([^']+)'(?:\s*,\s*'([^']*)')?\s*\)\s*\}\}".r

  /** The temp-view name `{{ this }}` renders to for model `name` —
    * per-model so concurrent incremental models in one wave don't race
    * on a shared view. */
  def thisView(name: String): String = s"__this_$name"

  /** dbt's `target` render context — the active profile's identity,
    * resolvable in model Jinja (`{% if target.name == 'prod' %}` sampled
    * dev tables, environment-split schemas). Sourced from system
    * properties (`-Dgraft.target.name=prod`), the engine's stand-in for
    * profiles.yml's active target; defaults mirror a dev profile. */
  def targetContext: Map[String, Any] = Map("target" -> Map(
    "name" -> sys.props.getOrElse("graft.target.name", "dev"),
    "database" -> sys.props.getOrElse("graft.target.database", "analytics")))

  /** The dbt_utils v1.1.1 macro expansion in Spark SQL — single column:
    * `md5(coalesce(cast(c as string), '<sentinel>'))`; multi-column:
    * values '-'-joined after the same coalesce ([[SurrogateKey]]). */
  private[pipeline] def surrogateKeySql(cols: Seq[String]): String = {
    val parts = cols.map(c =>
      s"coalesce(cast($c as string), '${SurrogateKey.NullSentinel}')")
    if (parts.size == 1) s"md5(${parts.head})"
    else s"md5(concat_ws('-', ${parts.mkString(", ")}))"
  }

  /** Character positions inside quoted string literals of a config body.
    * Config KEYS must match outside them: a hook statement like
    * `post_hook="UPDATE audit SET enabled=false"` must not read as the
    * model's own `enabled=` (it did, silently dropping the model). */
  private def quotedSpans(body: String): Seq[(Int, Int)] = {
    val spans = Seq.newBuilder[(Int, Int)]
    var i = 0
    while (i < body.length) {
      val c = body.charAt(i)
      if (c == '\'' || c == '"') {
        val close = body.indexOf(c, i + 1)
        val end = if (close < 0) body.length else close
        spans += ((i, end)); i = end + 1
      } else i += 1
    }
    spans.result()
  }

  /** First match of `re` in `body` whose start lies outside every quoted
    * string literal. */
  private def findOutsideQuotes(body: String,
      re: scala.util.matching.Regex): Option[scala.util.matching.Regex.Match] = {
    val spans = quotedSpans(body)
    re.findAllMatchIn(body)
      .find(m => !spans.exists(s => m.start >= s._1 && m.start <= s._2))
  }

  private def configStr(body: String, key: String): Option[String] =
    findOutsideQuotes(body, (raw"\b" + key + raw"\s*=\s*'([^']+)'").r)
      .map(_.group(1))

  private def configInt(body: String, key: String): Option[Int] =
    findOutsideQuotes(body, (raw"\b" + key + raw"\s*=\s*(\d+)").r)
      .map(_.group(1).toInt)

  private def configBool(body: String, key: String): Option[Boolean] =
    findOutsideQuotes(body, (raw"\b" + key + raw"\s*=\s*(?i)(true|false)").r)
      .map(_.group(1).toLowerCase == "true")

  /** A list whose items are double- OR single-quoted — predicates like
    * `incremental_predicates=["order_date >= '2001-06-01'"]` need the
    * double-quoted form because the condition itself carries quotes. */
  private def configQuotedList(body: String, key: String): Seq[String] =
    findOutsideQuotes(body, (raw"(?s)\b" + key + raw"\s*=\s*\[(.*?)\]").r)
      .map(mm => raw""""([^"]+)"|'([^']+)'""".r.findAllMatchIn(mm.group(1))
        .map(m => Option(m.group(1)).getOrElse(m.group(2))).toSeq)
      .getOrElse(Seq.empty)

  /** dbt string-or-list config (`pre_hook`, `post_hook`): one quoted
    * statement or a list of them, either quote style. */
  private def configStatements(body: String, key: String): Seq[String] = {
    val listed = configQuotedList(body, key)
    if (listed.nonEmpty) listed
    else findOutsideQuotes(body,
      (raw"\b" + key + raw"""\s*=\s*(?:"([^"]+)"|'([^']+)')""").r)
      .map(m => Option(m.group(1)).getOrElse(m.group(2))).toSeq
  }

  private def configList(body: String, key: String): Seq[String] =
    findOutsideQuotes(body, (raw"\b" + key + raw"\s*=\s*\[(.*?)\]").r)
      .map(mm => raw"'([^']+)'".r.findAllMatchIn(mm.group(1))
        .map(_.group(1)).toSeq)
      .getOrElse(Seq.empty)

  private def schemaChangeOf(name: String, body: String): Incremental.OnSchemaChange =
    configStr(body, "on_schema_change").getOrElse("ignore") match {
      case "ignore" => Incremental.Ignore
      case "append_new_columns" => Incremental.AppendNewColumns
      case "sync_all_columns" => Incremental.SyncAllColumns
      case "fail" => Incremental.FailOnChange
      case other => throw new IllegalArgumentException(
        s"$name: unknown on_schema_change '$other'")
    }

  /** A config value that dbt accepts as string-or-list (`unique_key`,
    * `partition_by`): `'a'`, `'a,b'` (a composite key spelled as one
    * string), or `['a', 'b']`. */
  private def configStrOrList(body: String, key: String): Seq[String] = {
    val listed = configList(body, key)
    if (listed.nonEmpty) listed
    else configStr(body, key).toSeq.flatMap(_.split(",")).map(_.trim)
      .filter(_.nonEmpty)
  }

  /** Materialization from the `{{ config(...) }}` body — the four dbt
    * materializations, incremental with `unique_key=` (merge) or the
    * engine's `watermark=` column (insert-only above the target's
    * high-water mark — dbt expresses the same cut inside the
    * `is_incremental()` block; declaring the column lets the sink append
    * just the fresh files instead of rewriting), snapshot with
    * `unique_key=` + `check_cols=[…]` (dbt's `check` strategy — the only
    * one the engine implements, so `strategy=` must be absent or
    * 'check'). */
  private def materializationOf(name: String, body: String): Registry.Materialization =
    configStr(body, "materialized").getOrElse("view") match {
      case "view" => Registry.View
      case "table" => Registry.Table
      case "incremental" =>
        val keys = configStrOrList(body, "unique_key")
        val watermark = configStr(body, "watermark")
        val policy = schemaChangeOf(name, body)
        configStr(body, "incremental_strategy") match {
          case Some("delete+insert") =>
            require(keys.nonEmpty,
              s"$name: delete+insert needs unique_key= (string or list)")
            Registry.Incremental(keys.headOption, watermark.orElse(keys.headOption).get,
              policy, Registry.IncStrategy.DeleteInsert(keys))
          case Some("insert_overwrite") =>
            val parts = configStrOrList(body, "partition_by")
            require(parts.nonEmpty,
              s"$name: insert_overwrite needs partition_by= (string or list)")
            Registry.Incremental(None, parts.head, policy,
              Registry.IncStrategy.InsertOverwrite(parts))
          case Some("microbatch") =>
            val eventTime = configStr(body, "event_time").getOrElse(
              throw new IllegalArgumentException(
                s"$name: microbatch needs event_time="))
            Registry.Incremental(None, eventTime, policy,
              Registry.IncStrategy.Microbatch(
                eventTime,
                configStr(body, "batch_size").getOrElse("day"),
                configInt(body, "lookback").getOrElse(1),
                configStr(body, "begin")))
          case Some("merge") | None =>
            require(keys.nonEmpty || watermark.isDefined,
              s"$name: incremental needs unique_key= (merge) or watermark= " +
                "(insert-only high-water mark)")
            require(keys.size <= 1,
              s"$name: merge takes a single unique_key " +
                "(use incremental_strategy='delete+insert' for composite keys)")
            Registry.Incremental(keys.headOption,
              watermark.orElse(keys.headOption).get, policy,
              predicates = configQuotedList(body, "incremental_predicates"))
          case Some("append") =>
            // the engine's append is high-water-mark gated (at-least-once
            // redelivery safe); dbt's blind insert-every-row append is
            // deliberately not offered — declare the watermark column
            require(watermark.isDefined,
              s"$name: append needs watermark= (the high-water-mark column)")
            Registry.Incremental(None, watermark.get, policy)
          case Some(other) => throw new IllegalArgumentException(
            s"$name: unknown incremental_strategy '$other'")
        }
      case "snapshot" =>
        val key = configStr(body, "unique_key").getOrElse(
          throw new IllegalArgumentException(s"$name: snapshot needs unique_key="))
        val hardDeletes = configBool(body, "invalidate_hard_deletes")
          .getOrElse(false)
        configStr(body, "strategy").getOrElse("check") match {
          case "check" =>
            val checkCols = configList(body, "check_cols")
            require(checkCols.nonEmpty,
              s"$name: snapshot check strategy needs check_cols=[…]")
            Registry.Snapshot(key, checkCols,
              invalidateHardDeletes = hardDeletes)
          case "timestamp" =>
            val at = configStr(body, "updated_at").getOrElse(
              throw new IllegalArgumentException(
                s"$name: snapshot timestamp strategy needs updated_at="))
            Registry.Snapshot(key, Seq.empty, Some(at), hardDeletes)
          case st => throw new IllegalArgumentException(
            s"$name: snapshot strategy '$st' unsupported (check|timestamp)")
        }
      case other => throw new IllegalArgumentException(
        s"$name: unsupported materialization '$other'")
    }

  private[graft] def render(name: String, layer: String, rawText: String,
      macroLib: Macros.Library = Macros.default,
      project: ProjectYaml.Project = ProjectYaml.default): Rendered = {
    // user macros from macros/*.sql expand FIRST, on the raw text (with
    // the target context, so a macro dereferencing target.* works from
    // model SQL exactly as it does from Registry), so a ref()/source()
    // inside a macro body still registers as a DAG edge and the body's
    // SQL flows through every later substitution
    val text = macroLib.expandIn(rawText, targetContext)
    // dbt config precedence: the model file's config() wins; a file
    // without one falls back to its layer's dbt_project.yml defaults
    val layerDefaults = project.layer(layer)
    var materialization: Registry.Materialization =
      layerDefaults.materialized.map(m => materializationOf(name, s"materialized='$m'"))
        .getOrElse(Registry.View)
    var tags = layerDefaults.tags
    var preHooks = Seq.empty[String]
    var postHooks = Seq.empty[String]
    var enabled = true
    var alias: Option[String] = None
    // hook statements get the same render-time substitutions as the model
    // body: {{ this }} → the per-model target view (Registry binds it to
    // the current/landed table around the hook), ref/source → view names,
    // pinned clock, project vars
    def hookSub(h: String): String = {
      var s = RefRe.replaceAllIn(h, m => m.group(1))
      s = SourceRe.replaceAllIn(s, m => sourceViewName(m.group(1), m.group(2)))
      s = ThisRe.replaceAllIn(s, thisView(name))
      s = NowRe.replaceAllIn(s, s"TIMESTAMP_NTZ '${Clock.nowLit}'")
      s = TodayRe.replaceAllIn(s, s"DATE '${Clock.todayLit}'")
      s = VarRe.replaceAllIn(s, m =>
        java.util.regex.Matcher.quoteReplacement(
          project.vars.get(m.group(1)).orElse(Option(m.group(2))).getOrElse(
            throw new IllegalArgumentException(
              s"$name: var('${m.group(1)}') has no project value and no default"))))
      s
    }
    ConfigRe.findFirstMatchIn(text).foreach { m =>
      val body = m.group(1)
      if (configStr(body, "materialized").isDefined)
        materialization = materializationOf(name, body)
      tags = (layerDefaults.tags ++ configList(body, "tags")).distinct
      preHooks = configStatements(body, "pre_hook").map(hookSub)
      postHooks = configStatements(body, "post_hook").map(hookSub)
      enabled = configBool(body, "enabled").getOrElse(true)
      alias = configStr(body, "alias")
    }
    // one body per is_incremental() phase, rendered JINJA-FIRST: the
    // shared engine evaluates {% if/for/set %} blocks with
    // is_incremental bound per phase (so the blocks nest freely inside
    // each other — dbt's two compilations of an incremental model) and
    // {{ this }} bound to the per-model target view; ref()/source()/
    // config()/var()-shaped expressions re-emit verbatim from the engine
    // for the textual substitutions below. Deps/sources are extracted
    // from the RENDERED variants, so a ref() inside a pruned
    // {% if target... %} branch never becomes a phantom DAG edge.
    def renderVariant(incremental: Boolean): String = {
      var sql = ConfigRe.replaceAllIn(text, "")
      if (sql.contains("{%") || sql.contains("{{"))
        sql = Macros.render(sql, targetContext +
          ("is_incremental" -> incremental) + ("this" -> thisView(name)))
      sql
    }
    def substitute(rendered: String): String = {
      var sql = RefRe.replaceAllIn(rendered, m => m.group(1))
      sql = SourceRe.replaceAllIn(sql,
        m => sourceViewName(m.group(1), m.group(2)))
      sql = ThisRe.replaceAllIn(sql, thisView(name))
      sql = SkRe.replaceAllIn(sql, m => java.util.regex.Matcher.quoteReplacement(
        surrogateKeySql(
          raw"'([^']+)'".r.findAllMatchIn(m.group(1)).map(_.group(1)).toSeq)))
      sql = NowRe.replaceAllIn(sql, s"TIMESTAMP_NTZ '${Clock.nowLit}'")
      sql = TodayRe.replaceAllIn(sql, s"DATE '${Clock.todayLit}'")
      sql = VarRe.replaceAllIn(sql, m =>
        java.util.regex.Matcher.quoteReplacement(
          project.vars.get(m.group(1)).orElse(Option(m.group(2))).getOrElse(
            throw new IllegalArgumentException(
              s"$name: var('${m.group(1)}') has no project value and no default"))))
      require(!sql.contains("{{") && !sql.contains("{%"),
        s"$name: unresolved template construct remains:\n" +
          sql.linesIterator.filter(l => l.contains("{{") || l.contains("{%"))
            .mkString("\n"))
      sql.trim
    }
    val hasInc = text.contains("is_incremental()")
    val baseRendered = renderVariant(incremental = false)
    val incRendered =
      if (hasInc) Some(renderVariant(incremental = true)) else None
    val variants = baseRendered +: incRendered.toSeq
    val deps = variants.flatMap(v =>
      RefRe.findAllMatchIn(v).map(_.group(1))).distinct
    val srcs = variants.flatMap(v => SourceRe.findAllMatchIn(v)
      .map(m => (m.group(1), m.group(2)))).distinct
    srcs.foreach(s => require(sources.contains(s),
      s"$name: unknown source ${s._1}.${s._2} — not in the adapter registry"))
    val base = substitute(baseRendered)
    require(!base.contains(thisView(name)),
      s"$name: {{ this }} outside an is_incremental() block — the target " +
        "does not exist on the first run")
    val inc = incRendered.map(substitute)
    inc.foreach(_ => require(
      materialization.isInstanceOf[Registry.Incremental],
      s"$name: is_incremental() blocks require materialized='incremental'"))
    Rendered(name, layer, materialization, tags, deps, srcs, base, inc,
      preHooks, postHooks, enabled, alias)
  }

  /** Load every `models/<layer>/<name>.sql` under `root` into registry
    * models. Table layouts and declared column contracts are looked up by
    * model name from the code registry when present, so a SQL-authored
    * model inherits the same bucketing/partitioning and schema gate as
    * its code twin. */
  def load(root: File,
      macroLib: Macros.Library = Macros.default,
      project: ProjectYaml.Project = ProjectYaml.default): Seq[Registry.Model] = {
    val files = Option(root.listFiles()).getOrElse(Array.empty).filter(_.isDirectory)
      .flatMap(layerDir => Option(layerDir.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && f.getName.endsWith(".sql"))
        .map(f => (layerDir.getName, f)))
      .sortBy(_._2.getName)
    require(files.nonEmpty, s"no models/<layer>/*.sql under $root")
    val loaded = files.toSeq.flatMap { case (layer, f) =>
      val raw = new String(Files.readAllBytes(f.toPath), StandardCharsets.UTF_8)
      // dbt enabled=false: the model leaves the graph BEFORE rendering —
      // it is precisely the escape hatch for not-yet-valid models, so a
      // disabled model must never abort the project load (a ref() to it
      // from an enabled model still fails at run, exactly like dbt)
      if (!enabledInRaw(raw)) None
      else Some(toModel(render(f.getName.stripSuffix(".sql"), layer, raw,
        macroLib, project)))
    }
    requireUniqueRelations(loaded)
    loaded
  }

  /** The `enabled=` flag read straight off the raw text's config() —
    * evaluated before any render so disabling exempts a model from
    * compilation, as in dbt. */
  private def enabledInRaw(rawText: String): Boolean =
    ConfigRe.findFirstMatchIn(rawText)
      .flatMap(m => configBool(m.group(1), "enabled")).getOrElse(true)

  /** dbt fails parsing when two models materialize the same relation —
    * without this, an alias colliding with another model's name silently
    * overwrites its table (and an incremental would merge foreign rows). */
  private def requireUniqueRelations(models: Seq[Registry.Model]): Unit = {
    val dup = models.groupBy(_.tableName).filter(_._2.size > 1)
    require(dup.isEmpty,
      "models materialize the same relation: " + dup.map { case (t, ms) =>
        s"'$t' (${ms.map(_.name).mkString(", ")})" }.mkString("; "))
  }

  private def toModel(r: Rendered): Registry.Model = {
    val codeTwin = Registry.models.find(_.name == r.name)
    Registry.Model(
      r.name, r.layer, r.materialization, r.deps,
      build = (spark, dir, up) => {
        r.srcs.foreach { case (s, t) =>
          sources((s, t))(spark, dir)
            .createOrReplaceTempView(sourceViewName(s, t))
        }
        r.deps.foreach(d => up.get(d).foreach(_.createOrReplaceTempView(d)))
        // incremental run: Registry.materialize handed us the current
        // target under ThisKey — register it as the {{ this }} view and
        // run the is_incremental()=true compilation
        up.get(Registry.ThisKey) match {
          case Some(cur) if r.sqlIncremental.isDefined =>
            cur.createOrReplaceTempView(thisView(r.name))
            spark.sql(r.sqlIncremental.get)
          case _ => spark.sql(r.sql)
        }
      },
      layout = codeTwin.map(_.layout).getOrElse(TableLayout.none),
      declaredSchema = Registry.declaredSchemas.get(r.name),
      tags = r.tags,
      preHooks = r.preHooks,
      postHooks = r.postHooks,
      alias = r.alias)
  }

  private val SnapshotBlockRe =
    (raw"(?s)\{%-?\s*snapshot\s+(\w+)\s*-?%\}" +
      raw"(.*?)\{%-?\s*endsnapshot\s*-?%\}").r

  /** dbt `analyses/` — COMPILE-ONLY SQL (the reference declares the
    * directory, `analyses/.gitkeep`): each file renders through the full
    * model pipeline — macro expansion, the Jinja engine, ref/source/var/
    * pinned-clock substitutions — exactly like a model, but is never
    * materialized and never joins the run DAG; dbt compiles analyses and
    * stops there. Empty files (the reference's own state) load as
    * intent-only and are skipped; an absent directory yields none. */
  def loadAnalyses(root: File,
      macroLib: Macros.Library = Macros.default,
      project: ProjectYaml.Project = ProjectYaml.default): Seq[Rendered] =
    Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".sql")).sortBy(_.getName)
      .toSeq
      .map(f => f -> new String(Files.readAllBytes(f.toPath),
        StandardCharsets.UTF_8))
      .filter(_._2.trim.nonEmpty)
      .map { case (f, raw) =>
        render(f.getName.stripSuffix(".sql"), "analyses", raw, macroLib,
          project)
      }

  /** Compile one rendered analysis into a logical plan over the lazy
    * model chain — plan construction only (no job runs, nothing is
    * written), which is precisely dbt's `compile` contract: every ref
    * must resolve (a malformed one fails loudly by name) and the SQL
    * must analyze. */
  def compileAnalysis(spark: SparkSession, dir: String, r: Rendered,
      extra: Seq[Registry.Model] = Seq.empty): DataFrame = {
    val acc = scala.collection.mutable.Map.empty[String, DataFrame]
    Registry.topoOrderOf(Registry.models ++ extra)
      .foreach(m => acc(m.name) = m.build(spark, dir, acc.toMap))
    r.deps.foreach { d =>
      require(acc.contains(d), s"${r.name}: unknown ref('$d')")
      acc(d).createOrReplaceTempView(d)
    }
    r.srcs.foreach { case (s, t) =>
      sources((s, t))(spark, dir)
        .createOrReplaceTempView(sourceViewName(s, t))
    }
    spark.sql(r.sql)
  }

  /** Load dbt snapshot blocks from a `snapshots/` directory — dbt's
    * native snapshot authoring form: each file carries one or more
    * `snapshot <name>` … `endsnapshot` blocks whose body is a config
    * (`unique_key=`, `strategy=`, `updated_at=`/`check_cols=`,
    * `invalidate_hard_deletes=`) plus a SELECT; the `snapshot`
    * materialization is implied by the block form, exactly as in dbt.
    * Blocks land in the `snapshots` layer (dbt's default
    * target-schema-adjacent placement) and run through the same
    * [[Registry.Snapshot]] SCD2 machinery as config-authored models. An
    * absent directory yields no models (the reference's own `snapshots/`
    * is empty — the declared intent these blocks complete). */
  def loadSnapshots(root: File,
      macroLib: Macros.Library = Macros.default,
      project: ProjectYaml.Project = ProjectYaml.default): Seq[Registry.Model] = {
    val files = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".sql")).sortBy(_.getName)
    val loaded = files.toSeq.flatMap { f =>
      val text = new String(Files.readAllBytes(f.toPath), StandardCharsets.UTF_8)
      val blocks = SnapshotBlockRe.findAllMatchIn(text).toSeq
      require(blocks.nonEmpty,
        s"${f.getName}: no snapshot block found in a snapshots/ file")
      blocks.flatMap { m =>
        val (name, body) = (m.group(1), m.group(2))
        if (!enabledInRaw(body)) None
        else {
          // the block form implies materialized='snapshot' — inject it in
          // front of the block's config so materializationOf routes right
          val withMat =
            if (raw"\bmaterialized\s*=".r.findFirstIn(body).isDefined) body
            else ConfigRe.findFirstIn(body) match {
              case Some(_) => body.replaceFirst(raw"\{\{\s*config\(",
                "{{ config(materialized='snapshot', ")
              case None => throw new IllegalArgumentException(
                s"$name: snapshot block needs a config (unique_key=, strategy=)")
            }
          val r = render(name, "snapshots", withMat, macroLib, project)
          require(r.materialization.isInstanceOf[Registry.Snapshot],
            s"$name: a snapshot block must configure a snapshot materialization")
          Some(r)
        }
      }.map(toModel)
    }
    requireUniqueRelations(loaded)
    loaded
  }
}

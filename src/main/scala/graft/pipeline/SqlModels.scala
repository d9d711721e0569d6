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
    materialized: String,
    tags: Seq[String],
    deps: Seq[String],
    srcs: Seq[(String, String)],
    sql: String)

  private val ConfigRe = raw"(?s)\{\{\s*config\((.*?)\)\s*\}\}".r
  private val RefRe = raw"\{\{\s*ref\(\s*'([^']+)'\s*\)\s*\}\}".r
  private val SourceRe =
    raw"\{\{\s*source\(\s*'([^']+)'\s*,\s*'([^']+)'\s*\)\s*\}\}".r
  private val SkRe =
    raw"\{\{\s*dbt_utils\.generate_surrogate_key\(\s*\[(.*?)\]\s*\)\s*\}\}".r
  private val NowRe = raw"(?i)current_timestamp\s*\(\s*\)".r
  private val TodayRe = raw"(?i)current_date\s*\(\s*\)".r

  /** The dbt_utils v1.1.1 macro expansion in Spark SQL — single column:
    * `md5(coalesce(cast(c as string), '<sentinel>'))`; multi-column:
    * values '-'-joined after the same coalesce ([[SurrogateKey]]). */
  private[pipeline] def surrogateKeySql(cols: Seq[String]): String = {
    val parts = cols.map(c =>
      s"coalesce(cast($c as string), '${SurrogateKey.NullSentinel}')")
    if (parts.size == 1) s"md5(${parts.head})"
    else s"md5(concat_ws('-', ${parts.mkString(", ")}))"
  }

  private[pipeline] def render(name: String, layer: String, text: String): Rendered = {
    var materialized = "view"
    var tags = Seq.empty[String]
    ConfigRe.findFirstMatchIn(text).foreach { m =>
      val body = m.group(1)
      raw"materialized\s*=\s*'([^']+)'".r.findFirstMatchIn(body)
        .foreach(mm => materialized = mm.group(1))
      raw"tags\s*=\s*\[(.*?)\]".r.findFirstMatchIn(body).foreach(mm =>
        tags = raw"'([^']+)'".r.findAllMatchIn(mm.group(1)).map(_.group(1)).toSeq)
    }
    val deps = RefRe.findAllMatchIn(text).map(_.group(1)).toSeq.distinct
    val srcs = SourceRe.findAllMatchIn(text)
      .map(m => (m.group(1), m.group(2))).toSeq.distinct
    srcs.foreach(s => require(sources.contains(s),
      s"$name: unknown source ${s._1}.${s._2} — not in the adapter registry"))
    var sql = ConfigRe.replaceAllIn(text, "")
    sql = RefRe.replaceAllIn(sql, m => m.group(1))
    sql = SourceRe.replaceAllIn(sql,
      m => sourceViewName(m.group(1), m.group(2)))
    sql = SkRe.replaceAllIn(sql, m => java.util.regex.Matcher.quoteReplacement(
      surrogateKeySql(
        raw"'([^']+)'".r.findAllMatchIn(m.group(1)).map(_.group(1)).toSeq)))
    sql = NowRe.replaceAllIn(sql, s"TIMESTAMP_NTZ '${Clock.nowLit}'")
    sql = TodayRe.replaceAllIn(sql, s"DATE '${Clock.todayLit}'")
    require(!sql.contains("{{"),
      s"$name: unresolved template construct remains:\n" +
        sql.linesIterator.filter(_.contains("{{")).mkString("\n"))
    Rendered(name, layer, materialized, tags, deps, srcs, sql.trim)
  }

  private def materializationOf(r: Rendered): Registry.Materialization =
    r.materialized match {
      case "view" => Registry.View
      case "table" => Registry.Table
      case other => throw new IllegalArgumentException(
        s"${r.name}: unsupported materialization '$other' in SQL authoring " +
          "(incremental/snapshot models stay code-authored)")
    }

  /** Load every `models/<layer>/<name>.sql` under `root` into registry
    * models. Table layouts and declared column contracts are looked up by
    * model name from the code registry when present, so a SQL-authored
    * model inherits the same bucketing/partitioning and schema gate as
    * its code twin. */
  def load(root: File): Seq[Registry.Model] = {
    val files = Option(root.listFiles()).getOrElse(Array.empty).filter(_.isDirectory)
      .flatMap(layerDir => Option(layerDir.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && f.getName.endsWith(".sql"))
        .map(f => (layerDir.getName, f)))
      .sortBy(_._2.getName)
    require(files.nonEmpty, s"no models/<layer>/*.sql under $root")
    files.toSeq.map { case (layer, f) =>
      val name = f.getName.stripSuffix(".sql")
      val r = render(name, layer,
        new String(Files.readAllBytes(f.toPath), StandardCharsets.UTF_8))
      val codeTwin = Registry.models.find(_.name == name)
      Registry.Model(
        name, layer, materializationOf(r), r.deps,
        build = (spark, dir, up) => {
          r.srcs.foreach { case (s, t) =>
            sources((s, t))(spark, dir)
              .createOrReplaceTempView(sourceViewName(s, t))
          }
          r.deps.foreach(d => up.get(d).foreach(_.createOrReplaceTempView(d)))
          spark.sql(r.sql)
        },
        layout = codeTwin.map(_.layout).getOrElse(TableLayout.none),
        declaredSchema = Registry.declaredSchemas.get(name),
        tags = r.tags)
    }
  }
}

package graft.pipeline

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import scala.jdk.CollectionConverters._

/** `dbt_project.yml` loader — the project-level configuration the
  * reference declares (`/root/reference/dbt_project.yml:16-31`):
  * per-layer `+materialized` / `+database` / `+tags` defaults under
  * `models.<project>.<layer>`, plus top-level `vars:`. A SQL model file
  * WITHOUT its own `{{ config(...) }}` then materializes by its
  * layer's project default, exactly as dbt resolves config precedence
  * (model file beats project file), and `{{ var('name', 'default') }}`
  * renders from the project vars — so a dbt project's configuration
  * file drops in alongside its model files.
  *
  * Driver-side parse of a few-KB YAML, once per JVM. */
object ProjectYaml {

  final case class LayerDefaults(
    materialized: Option[String],
    database: Option[String],
    tags: Seq[String])

  private val NoDefaults = LayerDefaults(None, None, Seq.empty)

  final case class Project(
    name: String,
    vars: Map[String, String],
    layers: Map[String, LayerDefaults],
    base: LayerDefaults = NoDefaults) {
    /** A layer's effective defaults: its own block over the
      * PROJECT-level `+` defaults (dbt honors `models: <project>:
      * +materialized: table` for every model without a closer config). */
    def layer(l: String): LayerDefaults = {
      val own = layers.getOrElse(l, NoDefaults)
      LayerDefaults(
        own.materialized.orElse(base.materialized),
        own.database.orElse(base.database),
        (base.tags ++ own.tags).distinct)
    }
  }

  /** Absent-file project: no vars, no defaults — the pre-loader
    * behavior (every model must carry its own config). */
  val empty: Project = Project("", Map.empty, Map.empty)

  private def asMap(o: Any): Map[String, Any] = o match {
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, v) => String.valueOf(k) -> (v: Any) }.toMap
    case _ => Map.empty
  }

  private def asList(o: Any): Seq[Any] = o match {
    case l: java.util.List[_] => l.asScala.toSeq.map(v => v: Any)
    case _ => Seq.empty
  }

  /** A var value as the text `{{ var(...) }}` splices into SQL. YAML's
    * scalars mostly stringify as written, but SnakeYAML parses unquoted
    * dates into java.util.Date whose toString is 'Tue Jun 01 …' — dbt
    * renders the ISO form. Lists/maps have no SQL text form: loud error
    * instead of splicing '{a=1}'. */
  private def varText(key: String, v: Any): String = v match {
    case d: java.util.Date =>
      val i = d.toInstant.atZone(java.time.ZoneOffset.UTC)
      if (i.toLocalTime == java.time.LocalTime.MIDNIGHT)
        i.toLocalDate.toString
      else i.toLocalDateTime.toString
    case _: java.util.Map[_, _] | _: java.util.List[_] =>
      throw new IllegalArgumentException(
        s"var '$key': list/map vars have no SQL text rendering")
    case other => String.valueOf(other)
  }

  private def defaultsOf(c: Map[String, Any]): LayerDefaults =
    LayerDefaults(
      c.get("+materialized").map(String.valueOf(_)),
      c.get("+database").map(String.valueOf(_)),
      asList(c.getOrElse("+tags", null)).map(String.valueOf(_)))

  def parse(text: String): Project = {
    val doc = asMap(new org.yaml.snakeyaml.Yaml().load[Any](text))
    val name = doc.get("name").map(String.valueOf(_)).getOrElse("")
    val vars = asMap(doc.getOrElse("vars", null))
      .map { case (k, v) => k -> varText(k, v) }
    // models.<project>: project-wide '+' defaults (scalar entries) and
    // per-layer blocks (map entries: {+materialized, +database, +tags})
    val projCfg = asMap(asMap(doc.getOrElse("models", null)).getOrElse(name, null))
    val layers = projCfg
      .collect { case (layer, cfg: java.util.Map[_, _]) =>
        layer -> defaultsOf(asMap(cfg))
      }
    Project(name, vars, layers, base = defaultsOf(projCfg))
  }

  def load(file: File): Project =
    if (!file.isFile) empty
    else parse(new String(Files.readAllBytes(file.toPath),
      StandardCharsets.UTF_8))

  /** The engine's default project file (same working-directory contract
    * as the models/macros dirs; override with -Dgraft.project.yml). */
  lazy val default: Project = load(new File(
    sys.props.getOrElse("graft.project.yml", "dbt_project.yml")))
}
